"""Materialized views over the gold/silver tables with per-view staleness.

Reference model: one BigQuery MV per analytics product, each carrying its own
``max_staleness`` option (``gold/materialized_views.py:41-52``, configured via
``models/schemas.py:181``) — the engine of record refreshes a view only when
its age exceeds the view's own budget, so cheap hot views stay fresh while
expensive rollups refresh lazily.

Engine analogue: a :class:`ViewRegistry` of named view definitions. Each view
is a callable from the replay handle to a (small) result — typically a
projection / argmax / rollup over ``read_gold()`` or ``read_silver()`` that
executes as a streamed Dataset and collects only the view-sized output. Per
view we persist the result parquet plus a watermark meta under
``<lake>/views/<name>/`` (temp + atomic rename, same commit discipline as the
manifests); ``refresh_due()`` recomputes exactly the views whose watermark
lags the silver epoch by more than their ``max_staleness_epochs``.

Scale note: view RESULTS are the small side (per-repo / per-lang rollups);
their inputs stream through Ray Data. A view whose result is itself huge
belongs in gold as a table, not here — mirroring the reference, where MVs sit
on top of the already-aggregated gold exports.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


@dataclass
class ViewDef:
    name: str
    fn: Callable  # (replay) -> pandas.DataFrame | ray Dataset
    max_staleness_epochs: int = 1  # refresh when silver_epoch - view_epoch > this - 1
    description: str = ""


class ViewRegistry:
    def __init__(self, replay, views: list[ViewDef] | None = None):
        self.replay = replay
        self.views: dict[str, ViewDef] = {}
        for v in views if views is not None else default_views():
            self.register(v)

    def register(self, v: ViewDef) -> None:
        self.views[v.name] = v

    # ------------------------------------------------------------------ paths
    def _dir(self, name: str) -> str:
        return os.path.join(self.replay.root, "views", name)

    def _meta(self, name: str) -> dict:
        mp = os.path.join(self._dir(name), "_meta.json")
        if not os.path.exists(mp):
            return {"epoch": -1}
        return json.load(open(mp))

    # ---------------------------------------------------------------- refresh
    def view_epoch(self, name: str) -> int:
        return int(self._meta(name)["epoch"])

    def staleness(self) -> dict:
        """Per-view lag vs the silver watermark (epochs)."""
        cur = self.replay.silver.latest_manifest().epoch
        return {n: {"view_epoch": self.view_epoch(n),
                    "lag_epochs": cur - self.view_epoch(n),
                    "max_staleness_epochs": v.max_staleness_epochs}
                for n, v in self.views.items()}

    def refresh_due(self, force: bool = False) -> dict:
        """Refresh every view whose lag exceeds its staleness budget (or all,
        when ``force``). Returns {name: 'refreshed' | 'fresh'}.

        A view fn may return a pandas DataFrame (small results — one
        driver-side parquet) or a ray Dataset — then the result is written
        DISTRIBUTED (streamed, multi-file) and never materializes on the
        driver: the scale path for table-cardinality views like the per-repo
        built-ins. Either way the swap is atomic: files land in a versioned
        subdir, the meta pointer flips in one rename, the superseded version
        is removed after."""
        import glob as _glob
        import shutil as _shutil

        cur = self.replay.silver.latest_manifest().epoch
        out = {}
        for name, v in self.views.items():
            ve = self.view_epoch(name)
            lag = cur - ve
            # a view that has never materialized (epoch -1) always refreshes
            if not force and ve >= 0 and lag < v.max_staleness_epochs:
                out[name] = "fresh"
                continue
            res = v.fn(self.replay)
            d = self._dir(name)
            prev = self._meta(name).get("path")
            vdir = os.path.join(d, f"v{cur:010d}")
            _shutil.rmtree(vdir, ignore_errors=True)  # crashed prior attempt
            os.makedirs(vdir, exist_ok=True)
            if isinstance(res, pd.DataFrame):
                pq.write_table(pa.Table.from_pandas(res, preserve_index=False),
                               os.path.join(vdir, "part-0.parquet"))
                rows = len(res)
            else:  # ray Dataset: distributed streamed write, no driver collect
                # materialize ONCE: a schema() probe on the lazy pipeline
                # would execute the whole distributed plan a second time
                res = res.materialize()
                res.write_parquet(vdir)
                parts = _glob.glob(os.path.join(vdir, "*.parquet"))
                if not parts:  # empty result still needs a readable file
                    schema = res.schema()  # free on materialized; None when
                    fields = (pa.schema(zip(schema.names, schema.types))
                              if schema is not None else pa.schema([]))
                    # an empty pipeline lost its schema entirely
                    pq.write_table(pa.Table.from_pylist([], schema=fields),
                                   os.path.join(vdir, "part-0.parquet"))
                    parts = [os.path.join(vdir, "part-0.parquet")]
                rows = sum(pq.read_metadata(f).num_rows for f in parts)
            mp = os.path.join(d, "_meta.json")
            with open(mp + ".tmp", "w") as f:
                json.dump({"epoch": cur, "rows": rows,
                           "path": os.path.basename(vdir)}, f)
            os.replace(mp + ".tmp", mp)
            if prev and prev != os.path.basename(vdir):
                _shutil.rmtree(os.path.join(d, prev), ignore_errors=True)
            legacy = os.path.join(d, "data.parquet")
            if os.path.exists(legacy):
                os.unlink(legacy)
            out[name] = "refreshed"
        return out

    def read(self, name: str) -> pd.DataFrame:
        meta = self._meta(name)
        if "path" not in meta:  # pre-versioned layout
            return pq.read_table(
                os.path.join(self._dir(name), "data.parquet")).to_pandas()
        import glob as _glob

        parts = sorted(_glob.glob(
            os.path.join(self._dir(name), meta["path"], "*.parquet")))
        # promote: a part whose block was all-NULL in a column parquets as
        # type null and must widen to the sibling parts' real type
        return pa.concat_tables([pq.read_table(f) for f in parts],
                                promote_options="default").to_pandas()

    def read_dataset(self, name: str):
        """The view result as a streamed ray Dataset (for big views)."""
        import ray.data as rd

        meta = self._meta(name)
        return rd.read_parquet(os.path.join(self._dir(name),
                                            meta.get("path", "data.parquet")))


#: values-count gate for the extrema-recompute scope: at or under it the
#: affected ``gcols[0]`` values push down as an IN-list predicate (partition
#: + zone-map + row-group prunable — the cheap path on a big lake); past it
#: the scope is a broadcast/partitioned ``semi_join`` against the key
#: Dataset — never an unbounded driver IN-list.
RECOMPUTE_INLIST_LIMIT = 2_000

#: absolute guard for ``IncrementalAggView.read()`` — a state past this
#: group cardinality must be consumed as a Dataset (``read_dataset()``),
#: not a driver frame. Mirrors functions.stats.GROUP_RESULT_DRIVER_LIMIT.
VIEW_READ_DRIVER_LIMIT = 2_000_000


def _merge_frames(state: pd.DataFrame, delta: pd.DataFrame,
                  gcols: list[str], scols: list[str],
                  exts: list[tuple[str, str, int]]):
    """Pure IVM merge kernel: persisted state ∪ signed delta → (merged frame
    with PROVISIONAL extrema in max-space, group keys whose deleted-side
    extremum reached the provisional value and therefore need a recompute).

    No I/O and no driver assumptions — the same kernel runs once over the
    whole state (driver path) or once per hash partition of it inside a Ray
    task (partitioned path); correctness is per-group, and a group lives in
    exactly one hash partition."""
    sum_cols_all = ["n"] + [f"sum_{c}" for c in scols]
    ecols = [a for a, _, _ in exts]
    out_cols = gcols + sum_cols_all + ecols
    if not (len(state) or len(delta)):
        return pd.DataFrame(columns=out_cols), pd.DataFrame(columns=gcols)
    # an EMPTY side may arrive column-less (Ray 2.49 strips zero-row block
    # schemas; plain to_pandas() then yields a (0,0) frame) — rebuild the
    # expected columns so the selections below can't KeyError
    if not len(delta):
        delta = pd.DataFrame(columns=gcols + sum_cols_all
                             + [f"_ins_ext_{a}" for a in ecols]
                             + [f"_del_ext_{a}" for a in ecols])
    if not len(state):
        state = pd.DataFrame(columns=out_cols)
    # exclude empty sides: an all-empty frame's object dtypes would pollute
    # the concat result dtype (and pandas deprecates including them)
    sides = [f[gcols + sum_cols_all] for f in (state, delta) if len(f)]
    merged = (pd.concat(sides, ignore_index=True)
              .groupby(gcols, as_index=False, sort=False).sum())
    need_keys = pd.DataFrame(columns=gcols)
    if ecols:
        # provisional extremum = max(stored, inserted-side) per group, in
        # max-space (min columns were negated on the way in)
        st_ext = state[gcols].copy()
        for a, _, s in exts:
            st_ext[a] = s * state[a].astype("float64")
        d_ext = delta[gcols + [f"_ins_ext_{a}" for a in ecols]] \
            .rename(columns={f"_ins_ext_{a}": a for a in ecols})
        prov = (pd.concat([f for f in (st_ext, d_ext) if len(f)],
                          ignore_index=True)
                .groupby(gcols, as_index=False, sort=False).max())
        merged = merged.merge(prov, on=gcols, how="left")
        dext = delta[gcols + [f"_del_ext_{a}" for a in ecols]]
        merged = merged.merge(dext, on=gcols, how="left")
        live = merged["n"] != 0
        need_rc = pd.Series(False, index=merged.index)
        for a in ecols:
            need_rc |= live & (merged[f"_del_ext_{a}"] >= merged[a])
        need_keys = merged.loc[need_rc, gcols].copy().reset_index(drop=True)
        merged = merged.drop(columns=[f"_del_ext_{a}" for a in ecols])
    merged = merged[merged["n"] != 0]
    merged = (merged[out_cols].reset_index(drop=True) if len(merged)
              else pd.DataFrame(columns=out_cols))
    return merged, need_keys


def _patch_extrema(merged: pd.DataFrame, rc: pd.DataFrame,
                   gcols: list[str],
                   exts: list[tuple[str, str, int]]) -> pd.DataFrame:
    """Overwrite provisional extrema (max-space) with the recomputed true
    values for every group present in ``rc`` — UNCONDITIONALLY on a match:
    a NaN recompute means the group's surviving rows have no non-null value
    and must clear the (deleted) extremum, and a non-need group that got
    scoped in anyway receives the identical true value (harmless)."""
    ecols = [a for a, _, _ in exts]
    merged = merged.merge(rc[gcols + ecols], on=gcols, how="left",
                          suffixes=("", "_rc"), indicator="_rc_hit")
    hit = merged["_rc_hit"] == "both"
    for a in ecols:
        merged.loc[hit, a] = merged.loc[hit, f"{a}_rc"]
    return merged.drop(columns=[f"{a}_rc" for a in ecols] + ["_rc_hit"])


def _finalize_frame(merged: pd.DataFrame, gcols: list[str],
                    exts: list[tuple[str, str, int]],
                    out_cols: list[str]) -> pd.DataFrame:
    """Max-space → true values (min columns negate back), canonical column
    order, deterministic sort."""
    if not len(merged):
        return pd.DataFrame(columns=out_cols)
    merged = merged.copy()
    for a, _, s in exts:
        merged[a] = s * merged[a]
    return merged[out_cols].sort_values(gcols).reset_index(drop=True)


class IncrementalAggView:
    """Incrementally-maintained group-by view over silver's current state —
    classic self-maintainable IVM driven by the CDF (reference analogue: a
    BigQuery MV kept fresh by the readChangeFeed-consuming gold stream,
    ``gold/cdf_processor.py`` + ``gold/materialized_views.py``; here the
    maintenance is LITERAL incremental-view-maintenance algebra instead of a
    re-run query).

    The view is ``SELECT group_cols, COUNT(*) AS n, SUM(c) AS sum_<c>...
    FROM silver-current GROUP BY group_cols``. COUNT and SUM are
    self-maintainable under insert/delete, so a refresh from epoch E to T:

    1. pulls the NET change feed ``table_changes(E, T)`` — already pruned to
       the pids whose fragment sets changed, column-pruned to the view's
       columns, never the payload;
    2. maps each change row to a signed delta (+1 for insert /
       update_postimage, −1 for delete / update_preimage — a key whose group
       didn't change cancels out, a key that MOVED groups transfers);
    3. combiner-first ``hash_agg`` reduces the deltas to one row per TOUCHED
       group;
    4. merges them into the persisted state per HASH PARTITION of the group
       key, dropping groups whose count reaches zero.

    State layout: the persisted state is hash-partitioned on the group
    columns into ``part-<pid>.parquet`` files (``_hash_part``, the same
    stable SipHash the lake's own pid scheme persists — ``hashing.py``
    documents the stability contract), so the state∪delta merge runs as one
    Ray task per TOUCHED partition and untouched partitions carry over as
    hard links — zero reads, zero rewrites. Group cardinality therefore
    never has to fit the driver: small states (≤ ``driver_state_limit``)
    still merge in one driver frame (cheaper than a task round-trip), big
    states route through the partitioned tasks automatically.

    Cost per refresh is O(changed keys + touched-partition state), not
    O(table) — the point of IVM at 100 TB. Persistence is a
    VERSIONED-DIRECTORY swap (state parquet + meta land in ``v<epoch>/``
    and a LATEST pointer flips in one rename): unlike a full-recompute
    view, the state here is ITSELF an input to the next refresh, so data
    and watermark must commit atomically — a crash at any point re-runs
    from the previous version and converges (a data-then-meta two-rename
    scheme would double-apply the delta).

    Null group keys: rows whose group value is NULL are excluded from the
    view (consistently — the combiner, the merge, and the recompute all
    drop them), unlike SQL GROUP BY's NULL group. Filter-or-fill upstream
    if a NULL bucket is needed.
    """

    def __init__(self, replay, name: str, group_cols: list[str],
                 sum_cols: list[str] = (), max_cols: list[str] = (),
                 min_cols: list[str] = (), num_partitions: int = 8,
                 driver_state_limit: int | None = None):
        """``max_cols`` / ``min_cols`` (numeric): extrema are NOT
        self-maintainable — an insert can only improve them (pure delta),
        but deleting the current extremum requires looking at the group's
        surviving rows. The refresh applies the classic hybrid: extremum of
        (stored, inserted) incrementally, and ONLY groups whose deleted-side
        extremum reaches that provisional value recompute — via a
        group-scoped, column-pruned ``read_silver`` (bounded by the affected
        groups' rows, never the table). MIN runs through the same kernel on
        negated values; AVG is sum/n, derivable from the maintained columns.

        ``driver_state_limit``: group-cardinality threshold routing the
        state∪delta merge — at or under it the merge runs in one driver
        frame, past it in per-hash-partition Ray tasks. Default: the
        engine-wide ``GROUP_RESULT_DRIVER_LIMIT``. ``num_partitions`` fixes
        the persisted hash layout at first materialization; later objects
        follow the stored value."""
        from maritime_activity_reports_cdc_ray.functions.stats import \
            GROUP_RESULT_DRIVER_LIMIT

        self.replay = replay
        self.name = name
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.max_cols = list(max_cols)
        self.min_cols = list(min_cols)
        self.num_partitions = int(num_partitions)
        self.driver_state_limit = (GROUP_RESULT_DRIVER_LIMIT
                                   if driver_state_limit is None
                                   else int(driver_state_limit))
        self.dir = os.path.join(replay.root, "views", name)

    # ------------------------------------------------------------------ state
    def _latest(self) -> str | None:
        p = os.path.join(self.dir, "LATEST")
        if not os.path.exists(p):
            return None
        return os.path.join(self.dir, open(p).read().strip())

    def _meta(self) -> dict:
        v = self._latest()
        if v is None:
            return {"epoch": -1}
        return json.load(open(os.path.join(v, "meta.json")))

    def view_epoch(self) -> int:
        return int(self._meta()["epoch"])

    def _cols(self) -> list[str]:
        return (self.group_cols + ["n"] + [f"sum_{c}" for c in self.sum_cols]
                + [f"max_{c}" for c in self.max_cols]
                + [f"min_{c}" for c in self.min_cols])

    def _exts(self) -> list[tuple[str, str, int]]:
        """(alias, source column, sign): MIN reuses the MAX kernel on
        negated values — internal state is always max-space."""
        return ([(f"max_{c}", c, 1) for c in self.max_cols]
                + [(f"min_{c}", c, -1) for c in self.min_cols])

    def _part_files(self, vdir: str) -> list[str]:
        import glob as _glob

        parts = sorted(_glob.glob(os.path.join(vdir, "part-*.parquet")))
        if parts:
            return parts
        # pre-partitioned layout (state written before the hash-partitioned
        # format): one data.parquet per version — read it so an upgraded
        # engine MIGRATES the state instead of silently merging into nothing
        legacy = os.path.join(vdir, "data.parquet")
        return [legacy] if os.path.exists(legacy) else []

    def read(self) -> pd.DataFrame:
        """The whole view state as ONE driver frame, sorted on the group
        columns — guarded: past :data:`VIEW_READ_DRIVER_LIMIT` groups this
        raises instead of silently OOMing the driver (consume with
        :meth:`read_dataset` instead)."""
        cols = self._cols()
        v = self._latest()
        if v is None:
            return pd.DataFrame(columns=cols)
        meta = self._meta()
        if int(meta.get("rows", 0)) > VIEW_READ_DRIVER_LIMIT:
            raise ValueError(
                f"IncrementalAggView[{self.name}].read(): {meta['rows']} "
                f"groups exceed the driver-frame contract "
                f"({VIEW_READ_DRIVER_LIMIT}); use read_dataset() and keep "
                "the consumption distributed")
        return self._read_state().sort_values(
            self.group_cols).reset_index(drop=True)

    def _read_state(self) -> pd.DataFrame:
        """Internal unguarded whole-state read — only the driver merge path
        uses it, and the routing gate (``driver_state_limit``) already
        bounds what reaches that path."""
        cols = self._cols()
        v = self._latest()
        parts = self._part_files(v) if v else []
        if not parts:
            return pd.DataFrame(columns=cols)
        return pa.concat_tables([pq.read_table(f) for f in parts],
                                promote_options="default").to_pandas()[cols]

    def read_dataset(self):
        """The view state as a streamed ray Dataset (scale path)."""
        import ray.data as rd

        v = self._latest()
        parts = self._part_files(v) if v else []
        if not parts:
            return rd.from_pandas(pd.DataFrame(columns=self._cols()))
        return rd.read_parquet(parts)

    # ---------------------------------------------------------------- refresh
    def refresh(self, to_epoch: int | None = None) -> dict:
        """Apply the net change feed since the view's watermark. ``to_epoch``
        pins the refresh to a historical epoch (time-travel refresh — lets a
        test or a backfill step the view forward one epoch at a time)."""
        from maritime_activity_reports_cdc_ray.functions.stats import hash_agg

        cur = self.replay.silver.latest_manifest().epoch
        if to_epoch is not None:
            cur = min(cur, int(to_epoch))
        e = self.view_epoch()
        if cur <= e:
            return {"status": "fresh", "epoch": e, "groups_touched": 0}

        need = list(dict.fromkeys(self.group_cols + self.sum_cols
                                  + self.max_cols + self.min_cols))
        feed = self.replay.table_changes(None if e < 0 else e, cur,
                                         columns=need)

        # plain locals only — a closure over `self` would drag the replay
        # handle (and its background-thread lock) into the task pickles
        gcols, scols = list(self.group_cols), list(self.sum_cols)
        exts = self._exts()

        def signed(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame({c: pd.Series(dtype=t) for c, t in
                                     [(g, object) for g in gcols]
                                     + [("_sgn", "int64")]
                                     + [(c, "int64") for c in scols]
                                     + [(f"_ins_{a}", "float64")
                                        for a, _, _ in exts]
                                     + [(f"_del_{a}", "float64")
                                        for a, _, _ in exts]})
            import numpy as np
            sgn = (df["_change_type"].isin(["insert", "update_postimage"])
                   .astype("int64") * 2 - 1).to_numpy()
            out = df[gcols].copy()
            out["_sgn"] = sgn
            for c in scols:
                # null-safe (SQL SUM skips NULLs): nullable Int64 feeds would
                # otherwise propagate NA through the partial sums
                out[c] = np.nan_to_num(
                    df[c].astype("float64").to_numpy()) * sgn
            for a, c, s in exts:
                v = s * df[c].astype("float64").to_numpy()
                out[f"_ins_{a}"] = np.where(sgn > 0, v, np.nan)
                out[f"_del_{a}"] = np.where(sgn < 0, v, np.nan)
            return out

        aggs = {"n": ("_sgn", "sum")}
        for c in self.sum_cols:
            aggs[f"sum_{c}"] = (c, "sum")
        for a, _, _ in exts:
            aggs[f"_ins_ext_{a}"] = (f"_ins_{a}", "max")
            aggs[f"_del_ext_{a}"] = (f"_del_{a}", "max")
        delta_ds = hash_agg(feed.map_batches(signed, batch_format="pandas"),
                            self.group_cols, aggs,
                            num_partitions=self.num_partitions).materialize()
        n_delta = delta_ds.count()
        meta = self._meta()
        state_rows = int(meta.get("rows", 0))
        # the persisted hash layout is fixed at first materialization; a
        # later object's num_partitions only seeds a FRESH view
        P = int(meta.get("num_partitions", self.num_partitions))
        # a state persisted before the partitioned layout (no
        # num_partitions in meta → single data.parquet) must take the
        # driver path once: it reads the legacy file via the _part_files
        # fallback and WRITES the new hash-partitioned layout (migration);
        # the partitioned path's per-pid file reads would see nothing and
        # silently merge the delta into an empty state
        legacy_state = state_rows > 0 and "num_partitions" not in meta

        # atomic versioned-dir swap: state + watermark commit together (the
        # state feeds the NEXT delta, so a data-then-meta scheme would
        # double-apply on a crash between the renames). A crashed prior
        # attempt's vdir is garbage — clear it before writing.
        import shutil

        vdir = os.path.join(self.dir, f"v{cur:010d}")
        shutil.rmtree(vdir, ignore_errors=True)
        os.makedirs(vdir, exist_ok=True)

        if legacy_state or state_rows + n_delta <= self.driver_state_limit:
            rows = self._refresh_driver(delta_ds, cur, vdir, P)
        else:
            rows = self._refresh_partitioned(delta_ds, cur, vdir, P)

        with open(os.path.join(vdir, "meta.json"), "w") as f:
            json.dump({"epoch": cur, "rows": int(rows),
                       "num_partitions": int(P)}, f)
        prev = self._latest()
        fd, tmp = tempfile.mkstemp(dir=self.dir)
        os.close(fd)
        with open(tmp, "w") as f:
            f.write(os.path.basename(vdir))
        os.replace(tmp, os.path.join(self.dir, "LATEST"))
        if prev and os.path.realpath(prev) != os.path.realpath(vdir):
            # safe under the partitioned path's hard links: unlinking the
            # previous version's names leaves the shared inodes alive
            shutil.rmtree(prev, ignore_errors=True)
        return {"status": "refreshed", "epoch": cur,
                "groups_touched": n_delta}

    def _refresh_driver(self, delta_ds, cur: int, vdir: str, P: int) -> int:
        """Small-state merge: one driver frame (cheaper than task
        round-trips) — reached only under ``driver_state_limit`` groups."""
        from maritime_activity_reports_cdc_ray.functions.kernels import \
            dataset_to_pandas

        gcols, scols, exts = list(self.group_cols), list(self.sum_cols), \
            self._exts()
        delta = dataset_to_pandas(delta_ds)
        if "_part" in delta.columns:
            delta = delta.drop(columns=["_part"])
        state = self._read_state()
        merged, need = _merge_frames(state, delta, gcols, scols, exts)
        if exts and len(need):
            vals = need[gcols[0]].dropna().unique().tolist()
            rc_ds = (self._recompute(cur, vals=vals)
                     if len(vals) <= RECOMPUTE_INLIST_LIMIT
                     else self._recompute(cur, keys=need))
            rc = dataset_to_pandas(rc_ds).drop(columns=["_part"],
                                               errors="ignore")
            if not len(rc):
                # same contract violation the partitioned path reports via
                # its leftover-pending guard: a need-recompute group (n > 0)
                # must have live silver rows
                raise RuntimeError(
                    f"IncrementalAggView[{self.name}]: extrema recompute "
                    f"returned no rows for {len(need)} need-recompute "
                    "groups (IVM count drift)")
            rc = rc.merge(need.drop_duplicates(), on=gcols, how="inner")
            merged = _patch_extrema(merged, rc, gcols, exts)
        fin = _finalize_frame(merged, gcols, exts, self._cols())
        return self._write_parts(fin, vdir, P)

    def _write_parts(self, fin: pd.DataFrame, vdir: str, P: int) -> int:
        import numpy as np

        from maritime_activity_reports_cdc_ray.functions.dedup import \
            _hash_part

        if not len(fin):
            return 0
        pids = _hash_part(fin, self.group_cols, P)
        for pid in np.unique(pids):
            pq.write_table(
                pa.Table.from_pandas(fin[pids == pid], preserve_index=False),
                os.path.join(vdir, f"part-{int(pid):05d}.parquet"))
        return len(fin)

    def _refresh_partitioned(self, delta_ds, cur: int, vdir: str,
                             P: int) -> int:
        """Big-state merge: the state∪delta merge runs as ONE Ray task per
        TOUCHED hash partition (the partition's state file ∪ its delta
        groups — each group lives in exactly one partition), untouched
        partitions carry over as hard links, and the extrema recompute is
        an IN-list- or semi_join-scoped distributed pass patched back per
        partition. Group cardinality never lands on the driver; the driver
        sees only the per-refresh need-recompute KEY COUNT and file names.
        Two-phase per partition: a partition with recompute-pending groups
        parks its merged frame (max-space) under ``_pending/`` and is
        finalized by the patch pass; everything else finalizes in phase one.
        """
        import shutil

        from maritime_activity_reports_cdc_ray.functions.dedup import \
            _hash_part

        gcols, scols, exts = list(self.group_cols), list(self.sum_cols), \
            self._exts()
        out_cols = self._cols()
        prev_dir = self._latest()
        pend_dir = os.path.join(vdir, "_pending")
        os.makedirs(pend_dir, exist_ok=True)

        def add_part(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) and not set(gcols) <= set(df.columns):
                # schema-less empty block (Ray 2.49): keep it sortable on
                # _part, contribute no groups
                return pd.DataFrame({"_part": pd.Series(dtype="int64")})
            df = df.drop(columns=["_part"], errors="ignore")
            return df.assign(_part=_hash_part(df, gcols, P))

        if delta_ds.count() == 0:
            handled: set[int] = set()
        else:
            delta_p = delta_ds.map_batches(
                add_part, batch_format="pandas").materialize()

            def distinct_pids(df: pd.DataFrame) -> pd.DataFrame:
                # NOT hash_distinct: distinct-ing a column literally named
                # _part would collide with its internal partition column
                if "_part" not in df.columns:  # column-less empty block
                    return pd.DataFrame({"pid": pd.Series(dtype="int64")})
                return pd.DataFrame(
                    {"pid": df["_part"].drop_duplicates().astype("int64")})

            # ≤ P × |blocks| rows — a per-batch distinct, driver-safe
            pids_df = delta_p.map_batches(
                distinct_pids, batch_format="pandas").to_pandas()
            handled = (set(pids_df["pid"].astype(int).tolist())
                       if len(pids_df) else set())

            def merge_task(g: pd.DataFrame) -> pd.DataFrame:
                pid = int(g["_part"].iloc[0])
                d = g.drop(columns=["_part"])
                sp = (os.path.join(prev_dir, f"part-{pid:05d}.parquet")
                      if prev_dir else None)
                state = (pq.read_table(sp).to_pandas()
                         if sp and os.path.exists(sp)
                         else pd.DataFrame(columns=out_cols))
                merged, need = _merge_frames(state, d, gcols, scols, exts)
                if exts and len(need):
                    # provisional extrema pending the recompute patch
                    # (max-space; idempotent overwrite under task retry)
                    pq.write_table(
                        pa.Table.from_pandas(merged, preserve_index=False),
                        os.path.join(pend_dir, f"part-{pid:05d}.parquet"))
                else:
                    fin = _finalize_frame(merged, gcols, exts, out_cols)
                    if len(fin):
                        pq.write_table(
                            pa.Table.from_pandas(fin, preserve_index=False),
                            os.path.join(vdir, f"part-{pid:05d}.parquet"))
                # empty need: keep the DELTA's key dtypes so the needs
                # dataset's blocks stay schema-consistent for the join
                return need if len(need) else d[gcols].iloc[0:0]

            needs = (delta_p.groupby("_part")
                     .map_groups(merge_task, batch_format="pandas")
                     .materialize())
            n_need = needs.count()
            if n_need:
                if n_need <= RECOMPUTE_INLIST_LIMIT:
                    vals = needs.to_pandas()[gcols[0]] \
                        .dropna().unique().tolist()
                    rc_ds = self._recompute(cur, vals=vals)
                else:
                    rc_ds = self._recompute(cur, keys=needs)
                # the recompute scope may include BYSTANDER groups (they
                # share gcols[0] with a need group): patching them is a
                # no-op (the recomputed value IS their provisional value —
                # no max-invalidating delete touched them), and a bystander
                # hashing into an already-finalized partition is skipped by
                # the missing-pending guard below — so no key filter needed
                rc_p = rc_ds.map_batches(add_part, batch_format="pandas")

                def patch_task(g: pd.DataFrame) -> pd.DataFrame:
                    pid = int(g["_part"].iloc[0])
                    rc = g.drop(columns=["_part"])
                    pp = os.path.join(pend_dir, f"part-{pid:05d}.parquet")
                    if not os.path.exists(pp):  # retried task: already done
                        return pd.DataFrame({"_pid": [pid]})
                    merged = _patch_extrema(pq.read_table(pp).to_pandas(),
                                            rc, gcols, exts)
                    fin = _finalize_frame(merged, gcols, exts, out_cols)
                    if len(fin):
                        pq.write_table(
                            pa.Table.from_pandas(fin, preserve_index=False),
                            os.path.join(vdir, f"part-{pid:05d}.parquet"))
                    os.unlink(pp)
                    return pd.DataFrame({"_pid": [pid]})

                (rc_p.groupby("_part")
                 .map_groups(patch_task, batch_format="pandas").materialize())

        leftover = os.listdir(pend_dir)
        if leftover:
            raise RuntimeError(
                f"IncrementalAggView[{self.name}]: {len(leftover)} pending "
                "partitions received no recompute rows — a need-recompute "
                "group had no live silver rows (IVM count drift)")
        shutil.rmtree(pend_dir, ignore_errors=True)
        # untouched partitions carry over as hard links: zero reads, zero
        # copies — the refresh cost stays O(touched partitions)
        if prev_dir:
            for f in self._part_files(prev_dir):
                pid = int(os.path.basename(f)[5:10])
                dst = os.path.join(vdir, os.path.basename(f))
                # never clobber a freshly-merged file (defense in depth on
                # top of the handled-pid set: a touched-but-now-empty
                # partition writes nothing and must NOT resurrect its old
                # state, which is what `handled` guards)
                if pid in handled or os.path.exists(dst):
                    continue
                try:
                    os.link(f, dst)
                except OSError:
                    shutil.copy2(f, dst)
        return sum(pq.read_metadata(f).num_rows
                   for f in self._part_files(vdir))

    def _recompute(self, cur: int, vals: list | None = None, keys=None):
        """True extrema (max-space) per group over silver AS OF ``cur`` for
        the recompute scope — pinned to the refresh's epoch: reading LATEST
        would break ``refresh(to_epoch=)`` backfills and race a concurrent
        replay commit (same snapshot discipline as the streaming emission
        floor). Scope: an IN-list predicate on ``group_cols[0]`` (partition
        / zone-map / row-group prunable — the cheap path on a big lake) when
        the affected value set is small, else a gated ``semi_join`` against
        the key Dataset — never an unbounded driver IN-list. Returns a
        Dataset of group_cols + one MAX-SPACE column per extremum alias."""
        from maritime_activity_reports_cdc_ray.functions.stats import \
            hash_agg

        gcols = list(self.group_cols)
        exts = self._exts()
        srcs = list(dict.fromkeys(c for _, c, _ in exts))
        cols = list(dict.fromkeys(gcols + srcs))
        if vals is not None:
            scoped = self.replay.read_silver(
                columns=cols, as_of_epoch=cur,
                predicate=(gcols[0], "in", list(vals)))
        else:
            import ray.data as rd

            from maritime_activity_reports_cdc_ray.functions.join import \
                semi_join

            if isinstance(keys, pd.DataFrame):
                keys = rd.from_pandas(keys)
            scoped = semi_join(
                self.replay.read_silver(columns=cols, as_of_epoch=cur),
                keys, on=gcols[0])

        def to_ms(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) and not set(cols) <= set(df.columns):
                return df  # schema-less empty block: hash_agg's local guard
                # passes it through as no groups
            out = df[gcols].copy()
            for a, c, s in exts:
                out[f"_v_{a}"] = s * df[c].astype("float64")
            return out

        return hash_agg(scoped.map_batches(to_ms, batch_format="pandas"),
                        gcols, {a: (f"_v_{a}", "max") for a, _, _ in exts},
                        num_partitions=self.num_partitions)


# ---------------------------------------------------------------------------
# Built-in views — the A7-A9 analytics products over the code-change domain.
# ---------------------------------------------------------------------------
def _activity_summary(replay):
    """A7: per-repo activity rollup straight off gold (already aggregated —
    the view is a column-pruned streamed projection; gold never touches the
    driver, the result lands as a distributed multi-file parquet)."""
    return replay.read_gold(columns=["repo", "file_count", "total_bytes",
                                     "total_versions", "deleted_count"]) \
        .sort("repo")


def _latest_repo_status(replay):
    """A9/J2-style: latest commit + live file count per repo (gold's
    latest_commit watermark is already the argmax — streamed projection)."""
    return replay.read_gold(
        columns=["repo", "latest_commit", "file_count"]).sort("repo")


def _lang_breakdown(replay):
    """A10-style: global language histogram from gold's per-repo lang_counts.

    Scale shape: a vectorized Arrow ``list_flatten`` explode per batch feeds
    the combiner-first ``hash_agg`` — the exchange carries (lang, partial-n)
    pairs (≤ |langs| per batch), never gold rows; only the lang-cardinality
    result sorts. No driver collect, no per-row Python loop."""
    import pyarrow.compute as pc

    from maritime_activity_reports_cdc_ray.functions.stats import hash_agg

    _SENT = "\x00\x00__null__"  # NULL lang is a REAL group (gold's Arrow
    # group_by emits lang=null entries; hash_agg's pandas groupby would
    # silently drop them — same sentinel contract as rollup_agg)

    def explode(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(t.column("lang_counts"))
        return pa.table({
            "lang": pc.fill_null(pc.struct_field(flat, "lang"), _SENT),
            "n": pc.cast(pc.struct_field(flat, "n"), pa.int64())})

    pairs = replay.read_gold(columns=["lang_counts"]) \
        .map_batches(explode, batch_format="pyarrow")
    agg = hash_agg(pairs, "lang", {"n_files": ("n", "sum")}, num_partitions=8)

    # sort on the SENTINEL (null bucket first, deterministic), restore after
    agg = agg.map_batches(
        lambda df: df[["lang", "n_files"]].astype({"n_files": "int64"}),
        batch_format="pandas").sort("lang")
    return agg.map_batches(
        lambda df: df.assign(lang=df["lang"].where(df["lang"] != _SENT, None)),
        batch_format="pandas")


def default_views() -> list[ViewDef]:
    return [
        ViewDef("repo_activity_summary", _activity_summary, 1,
                "per-repo rollup (refresh every epoch)"),
        ViewDef("latest_repo_status", _latest_repo_status, 1,
                "hot status view (refresh every epoch)"),
        ViewDef("lang_breakdown", _lang_breakdown, 3,
                "slow-moving histogram (staleness budget 3 epochs)"),
    ]
