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
       group (the only data that reaches the driver — group-cardinality, not
       table-cardinality);
    4. outer-merges them into the persisted state, dropping groups whose
       count reaches zero.

    Cost per refresh is O(changed keys), not O(table) — the point of IVM at
    100 TB. Persistence is a VERSIONED-DIRECTORY swap (state parquet + meta
    land in ``v<epoch>/`` and a LATEST pointer flips in one rename): unlike
    a full-recompute view, the state here is ITSELF an input to the next
    refresh, so data and watermark must commit atomically — a crash at any
    point re-runs from the previous version and converges (a data-then-meta
    two-rename scheme would double-apply the delta).

    Null group keys: rows whose group value is NULL are excluded from the
    view (consistently — the combiner, the merge, and the recompute all
    drop them), unlike SQL GROUP BY's NULL group. Filter-or-fill upstream
    if a NULL bucket is needed.
    """

    def __init__(self, replay, name: str, group_cols: list[str],
                 sum_cols: list[str] = (), max_cols: list[str] = (),
                 min_cols: list[str] = (), num_partitions: int = 8):
        """``max_cols`` / ``min_cols`` (numeric): extrema are NOT
        self-maintainable — an insert can only improve them (pure delta),
        but deleting the current extremum requires looking at the group's
        surviving rows. The refresh applies the classic hybrid: extremum of
        (stored, inserted) incrementally, and ONLY groups whose deleted-side
        extremum reaches that provisional value recompute — via a
        group-scoped, column-pruned ``read_silver`` (bounded by the affected
        groups' rows, never the table). MIN runs through the same kernel on
        negated values; AVG is sum/n, derivable from the maintained columns."""
        self.replay = replay
        self.name = name
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.max_cols = list(max_cols)
        self.min_cols = list(min_cols)
        self.num_partitions = int(num_partitions)
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

    def read(self) -> pd.DataFrame:
        cols = self._cols()
        v = self._latest()
        if v is None:
            return pd.DataFrame(columns=cols)
        return pq.read_table(os.path.join(v, "data.parquet")).to_pandas()[cols]

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
        delta = hash_agg(feed.map_batches(signed, batch_format="pandas"),
                         self.group_cols, aggs,
                         num_partitions=self.num_partitions).to_pandas()
        if "_part" in delta.columns:
            delta = delta.drop(columns=["_part"])

        state = self.read()
        sum_cols_all = ["n"] + [f"sum_{c}" for c in self.sum_cols]
        merged = (pd.concat([state[gcols + sum_cols_all],
                             delta[gcols + sum_cols_all]], ignore_index=True)
                  .groupby(gcols, as_index=False, sort=False).sum()
                  if len(state) or len(delta) else state[gcols + sum_cols_all])
        if exts and (len(state) or len(delta)):
            # provisional extremum = max(stored, inserted-side) per group,
            # in max-space (min columns negated on the way in/out)
            st_ext = state[gcols].copy()
            for a, _, s in exts:
                st_ext[a] = s * state[a].astype("float64")
            d_ext = delta[gcols + [f"_ins_ext_{a}" for a, _, _ in exts]] \
                .rename(columns={f"_ins_ext_{a}": a for a, _, _ in exts})
            prov = (pd.concat([st_ext, d_ext], ignore_index=True)
                    .groupby(gcols, as_index=False, sort=False).max())
            merged = merged.merge(prov, on=gcols, how="left")
            # groups whose deleted-side extremum REACHES the provisional
            # value may have lost the true one — recompute exactly those
            # groups from silver (group-scoped predicate read, column-pruned)
            dext = delta[gcols + [f"_del_ext_{a}" for a, _, _ in exts]]
            merged = merged.merge(dext, on=gcols, how="left")
            live = merged["n"] != 0
            need_rc = pd.Series(False, index=merged.index)
            for a, _, _ in exts:
                need_rc |= live & (merged[f"_del_ext_{a}"] >= merged[a])
            if need_rc.any():
                vals = merged.loc[need_rc, gcols[0]].dropna().unique().tolist()
                srcs = list(dict.fromkeys(c for _, c, _ in exts))
                # pinned AS OF the refresh's epoch: reading LATEST would
                # break refresh(to_epoch=) backfills and race a concurrent
                # replay commit (same snapshot discipline as the streaming
                # emission floor)
                scoped = self.replay.read_silver(
                    columns=list(dict.fromkeys(gcols + srcs)),
                    as_of_epoch=cur,
                    predicate=(gcols[0], "in", vals)).to_pandas()
                for a, c, s in exts:
                    scoped[f"_v_{a}"] = s * scoped[c].astype("float64")
                rc = (scoped.groupby(gcols, as_index=False)
                      .agg(**{a: (f"_v_{a}", "max") for a, _, _ in exts}))
                merged = merged.merge(rc, on=gcols, how="left",
                                      suffixes=("", "_rc"))
                for a, _, _ in exts:
                    # unconditional on need_rc: NaN from the recompute means
                    # the group's surviving rows have no non-null value — a
                    # notna() guard would keep the DELETED extremum forever
                    merged.loc[need_rc, a] = merged.loc[need_rc, f"{a}_rc"]
                merged = merged.drop(columns=[f"{a}_rc" for a, _, _ in exts])
            merged = merged.drop(
                columns=[f"_del_ext_{a}" for a, _, _ in exts])
            for a, _, s in exts:  # back to true values (min was negated)
                merged[a] = s * merged[a]
        if len(merged):
            merged = merged[merged["n"] != 0]
        merged = merged[self._cols()] if len(merged) else \
            pd.DataFrame(columns=self._cols())
        merged = merged.sort_values(self.group_cols).reset_index(drop=True)

        # atomic versioned-dir swap: state + watermark commit together (the
        # state feeds the NEXT delta, so a data-then-meta scheme would
        # double-apply on a crash between the renames)
        vdir = os.path.join(self.dir, f"v{cur:010d}")
        os.makedirs(vdir, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(merged, preserve_index=False),
                       os.path.join(vdir, "data.parquet"))
        with open(os.path.join(vdir, "meta.json"), "w") as f:
            json.dump({"epoch": cur, "rows": len(merged)}, f)
        prev = self._latest()
        fd, tmp = tempfile.mkstemp(dir=self.dir)
        os.close(fd)
        with open(tmp, "w") as f:
            f.write(os.path.basename(vdir))
        os.replace(tmp, os.path.join(self.dir, "LATEST"))
        if prev and os.path.realpath(prev) != os.path.realpath(vdir):
            import shutil

            shutil.rmtree(prev, ignore_errors=True)
        return {"status": "refreshed", "epoch": cur,
                "groups_touched": len(delta)}


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
