"""Declarative MERGE: match keys + ordered WHEN branches, compiled onto the
engine's keyed-merge machinery.

Reference surface: the eight Delta ``MERGE INTO`` shapes the pipelines issue
(``bronze/cdc_ingestion.py:169-224`` — delete branch, conditional update,
insert-all; ``gold/cdf_processor.py:206-328`` — counter bumps, conditional
upserts; cache counter ``silver/streaming_processor.py:150-191``). The engine
hard-codes the hot shapes (LWW / SCD2 / tombstone / cache counter); this
module is the USER-EXTENSION surface — any other merge shape is a
:class:`MergeSpec`:

    MergeSpec(
        keys=["custkey"],
        when_matched=[
            MergeBranch("update", condition="s_has_open == 1",
                        set={"bal": "t_bal + s_total", "status": "'OPEN'"}),
            MergeBranch("update", set={"bal": "t_bal + s_total",
                                       "status": "'SETTLED'"}),
        ],
        when_not_matched=[MergeBranch("insert")],
        when_not_matched_by_source=[MergeBranch("delete",
                                                condition="t_bal < 0")],
    )

Semantics follow SQL/Delta MERGE exactly:

- branches are evaluated IN ORDER, first true condition wins per row; a
  ``condition=None`` branch is an unconditional catch-all;
- a matched row no branch accepts passes through unchanged; an unmatched
  source row no insert branch accepts is ignored;
- ``when_not_matched_by_source`` (Delta's extension) sees target rows with no
  source match — update or delete them;
- more than one source row per key is an error (Delta's "multiple source rows
  matched" — a non-deterministic merge is refused, not resolved).

Expressions (``condition`` and ``set`` values) are vectorized
``DataFrame.eval`` strings over a namespace of ``t_<col>`` (target),
``s_<col>`` (source) and the bare key columns; ``set`` keys are target
columns. ``set=None`` means "all same-named source columns" (UPDATE SET * /
INSERT *).

Execution shapes:

- :func:`apply_merge_spec` — the pure per-partition kernel (pandas,
  branch-loop over masks: O(branches) vectorized passes, never per-row);
- :func:`merge_into` — generic Dataset-level merge: both sides hash-partition
  on the keys (one exchange bounded by |target|+|source| rows of the NAMED
  columns only), then one kernel call per partition;
- :class:`SpecTable` — a manifest-backed keyed lake table (same fragment /
  2PC commit discipline as the lookup cache, ``state/cache.py``) whose
  ``merge_epoch`` rewrites ONLY the pids the source touches — unless the spec
  has ``when_not_matched_by_source`` branches, which (as in Delta) force a
  visit to every pid, arranged here by per-pid ping rows so the exchange
  still carries just the source.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

from maritime_activity_reports_cdc_ray.functions.dedup import _hash_part

_MATCHED_ACTIONS = {"update", "delete", "skip"}
_NOT_MATCHED_ACTIONS = {"insert", "skip"}
_NMBS_ACTIONS = {"update", "delete", "skip"}


@dataclass(frozen=True)
class MergeBranch:
    """One WHEN ... THEN ... arm. ``action`` ∈ update / insert / delete /
    skip; ``condition`` a DataFrame.eval expression (None = always);
    ``set`` maps target column → eval expression (None = all same-named
    source columns)."""

    action: str
    condition: str | None = None
    set: dict | None = None


@dataclass(frozen=True)
class MergeSpec:
    keys: tuple
    when_matched: tuple = ()
    when_not_matched: tuple = ()
    when_not_matched_by_source: tuple = ()

    def __init__(self, keys, when_matched=(), when_not_matched=(),
                 when_not_matched_by_source=()):
        object.__setattr__(self, "keys", tuple(keys))
        object.__setattr__(self, "when_matched", tuple(when_matched))
        object.__setattr__(self, "when_not_matched", tuple(when_not_matched))
        object.__setattr__(self, "when_not_matched_by_source",
                           tuple(when_not_matched_by_source))
        assert self.keys, "MergeSpec needs at least one match key"
        for b in self.when_matched:
            assert b.action in _MATCHED_ACTIONS, \
                f"when_matched action {b.action!r} not in {_MATCHED_ACTIONS}"
        for b in self.when_not_matched:
            assert b.action in _NOT_MATCHED_ACTIONS, \
                f"when_not_matched action {b.action!r} not in {_NOT_MATCHED_ACTIONS}"
        for b in self.when_not_matched_by_source:
            assert b.action in _NMBS_ACTIONS, \
                f"when_not_matched_by_source action {b.action!r} not in {_NMBS_ACTIONS}"


def _eval(frame: pd.DataFrame, expr: str):
    """Vectorized expression over the join frame. engine='python' so string
    literals and mixed dtypes work; NaN comparisons are falsy (SQL NULL)."""
    return frame.eval(expr, engine="python")


def _as_series(val, index) -> pd.Series:
    if isinstance(val, pd.Series):
        return val
    return pd.Series([val] * len(index), index=index)


def apply_merge_spec(target: pd.DataFrame, source: pd.DataFrame,
                     spec: MergeSpec) -> tuple[pd.DataFrame, dict]:
    """Pure kernel: MERGE ``source`` into ``target`` under ``spec``.

    Returns ``(new_target, stats)``; ``new_target`` carries exactly the
    target's columns (original dtypes restored where the merge result
    permits). Deterministic: output sorted by the match keys. Raises on
    duplicate keys on either side (a keyed table / deterministic merge
    invariant, matching Delta's multiple-source-rows error)."""
    keys = list(spec.keys)
    tcols = [c for c in target.columns]
    for br in spec.when_not_matched_by_source:
        if br.action == "update" and br.set is None:
            # SQL MERGE requires an explicit SET here: there is no source
            # row to default from — the implicit {c: s_c} assigns would
            # overwrite every non-key column with NULL
            raise ValueError(
                "WHEN NOT MATCHED BY SOURCE ... UPDATE requires an explicit "
                "`set` (no source row exists to default the assignments from)")
    if source.duplicated(subset=keys).any():
        raise ValueError("MERGE source has duplicate match keys "
                         "(non-deterministic merge refused)")
    if target.duplicated(subset=keys).any():
        raise ValueError("MERGE target has duplicate match keys")

    t = target.rename(columns={c: f"t_{c}" for c in target.columns
                               if c not in keys})
    s = source.rename(columns={c: f"s_{c}" for c in source.columns
                               if c not in keys})
    j = t.merge(s, on=keys, how="outer", indicator=True)
    in_t = j["_merge"].isin(["left_only", "both"]).to_numpy()
    in_s = j["_merge"].isin(["right_only", "both"]).to_numpy()
    matched = in_t & in_s

    # output columns start as the (possibly-NaN) target image
    out = pd.DataFrame(index=j.index)
    for k in keys:
        out[k] = j[k]
    for c in tcols:
        if c not in keys:
            out[c] = j[f"t_{c}"] if f"t_{c}" in j.columns else np.nan
    drop = np.zeros(len(j), dtype=bool)
    stats = {"matched_updated": 0, "matched_deleted": 0, "matched_noop": 0,
             "inserted": 0, "source_ignored": 0,
             "target_updated": 0, "target_deleted": 0, "target_noop": 0}

    def run_branches(branches, base_mask, kind):
        remaining = base_mask.copy()
        for br in branches:
            if not remaining.any():
                break
            cond = (_as_series(_eval(j, br.condition), j.index)
                    .fillna(False).astype(bool).to_numpy()
                    if br.condition is not None
                    else np.ones(len(j), dtype=bool))
            sel = remaining & cond
            remaining &= ~sel
            n = int(sel.sum())
            if n == 0:
                continue
            if br.action == "skip":
                if kind == "not_matched":
                    drop[sel] = True  # unmatched source rows never emit
                    stats["source_ignored"] += n
                else:
                    stats[f"{'matched' if kind == 'matched' else 'target'}"
                          f"_noop"] += n
            elif br.action == "delete":
                drop[sel] = True
                stats[f"{'matched' if kind == 'matched' else 'target'}"
                      f"_deleted"] += n
            elif br.action == "insert":
                assigns = (br.set if br.set is not None
                           else {c: f"s_{c}" for c in tcols
                                 if c not in keys and f"s_{c}" in j.columns})
                for c, expr in assigns.items():
                    assert c in out.columns, f"insert sets unknown column {c}"
                    out.loc[sel, c] = _as_series(
                        _eval(j, expr), j.index)[sel]
                stats["inserted"] += n
            else:  # update
                assigns = (br.set if br.set is not None
                           else {c: f"s_{c}" for c in tcols
                                 if c not in keys and f"s_{c}" in j.columns})
                for c, expr in assigns.items():
                    assert c in out.columns, f"update sets unknown column {c}"
                    out.loc[sel, c] = _as_series(
                        _eval(j, expr), j.index)[sel]
                stats[f"{'matched' if kind == 'matched' else 'target'}"
                      f"_updated"] += n
        return remaining

    run_branches(spec.when_matched, matched, "matched")
    left = run_branches(spec.when_not_matched, in_s & ~in_t, "not_matched")
    drop[left] = True  # unmatched source rows with no accepting insert branch
    stats["source_ignored"] += int(left.sum())
    run_branches(spec.when_not_matched_by_source, in_t & ~in_s, "nmbs")

    out = out.loc[~drop, keys + [c for c in tcols if c not in keys]]
    for c in tcols:  # restore target dtypes where the values allow it
        try:
            if (target.dtypes[c] == np.dtype(bool)
                    and out[c].isna().any()):
                # plain astype(bool) silently maps NaN -> True; the masked
                # extension dtype keeps a genuine NULL a NULL
                out[c] = out[c].astype("boolean")
            else:
                out[c] = out[c].astype(target.dtypes[c])
        except (ValueError, TypeError):
            pass
    out = out.sort_values(keys).reset_index(drop=True)[tcols]
    return out, stats


def merge_into(target_ds, source_ds, spec: MergeSpec,
               num_partitions: int = 16):
    """Distributed MERGE of two Datasets: ONE hash exchange on the match keys
    co-locates each key's target and source rows, then the kernel runs once
    per partition. Returns the merged target as a Dataset (target schema).

    Scale shape: shuffle volume = the named columns of both sides; the
    branch expressions run vectorized inside each partition; no driver
    collect anywhere. Duplicate keys are detected per-partition (dupes hash
    together), so the global invariant is enforced without a global pass."""
    keys = list(spec.keys)
    t_schema = target_ds.schema()
    s_schema = source_ds.schema()
    tcols = list(t_schema.names)
    all_cols = tcols + [c for c in s_schema.names if c not in tcols]

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            d = df.copy()
            for c in all_cols:
                if c not in d.columns:
                    d[c] = None
            d = d[all_cols]
            d["_side"] = np.int64(side)
            d["_part"] = _hash_part(d, keys, num_partitions)
            return d
        return fn

    scols = list(s_schema.names)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        tgt = g.loc[g["_side"] == 0, tcols]
        src = g.loc[g["_side"] == 1, scols]
        out, _ = apply_merge_spec(tgt, src, spec)
        return out

    uni = target_ds.map_batches(tag(0), batch_format="pandas").union(
        source_ds.map_batches(tag(1), batch_format="pandas"))
    return uni.groupby("_part").map_groups(kernel, batch_format="pandas")


_META = "_spec_meta.json"


class SpecTable:
    """Manifest-backed keyed table maintained by declarative MERGE epochs —
    the lake-level face of :class:`MergeSpec` (fragment layout, 2PC commit
    and exactly-once epoch discipline shared with ``state/cache.py``)."""

    def __init__(self, root: str):
        from maritime_activity_reports_cdc_ray.state.table import LakeTable

        self.table = LakeTable(root)
        with open(os.path.join(root, _META)) as f:
            meta = json.load(f)
        self.key_cols: list[str] = meta["key_cols"]
        self.num_partitions: int = meta["num_partitions"]

    @staticmethod
    def create(root: str, key_cols: list[str], schema: pa.Schema,
               num_partitions: int = 8) -> "SpecTable":
        from maritime_activity_reports_cdc_ray.state.table import LakeTable

        missing = [c for c in key_cols if c not in schema.names]
        assert not missing, f"schema lacks key columns {missing}"
        LakeTable.create(root, "spec_table", schema, num_partitions)
        mp = os.path.join(root, _META)
        if not os.path.exists(mp):
            with open(mp + ".tmp", "w") as f:
                json.dump({"key_cols": list(key_cols),
                           "num_partitions": num_partitions}, f)
            os.replace(mp + ".tmp", mp)
        return SpecTable(root)

    def merge_epoch(self, source_ds, spec: MergeSpec, epoch: int) -> dict:
        """MERGE one epoch's source into the table. Rewrites only touched
        pids; epochs at or below the committed watermark no-op (exactly-once
        under replay). ``when_not_matched_by_source`` branches visit every
        pid (per-pid ping rows — the exchange still only carries the
        source)."""
        import ray.data as rd

        from maritime_activity_reports_cdc_ray.state.table import (Fragment,
                                                                   LakeTable)

        assert list(spec.keys) == list(self.key_cols), \
            f"spec keys {spec.keys} != table keys {self.key_cols}"
        m = self.table.latest_manifest()
        if epoch <= m.epoch:
            return {"skipped": True, "epoch": m.epoch}

        keys, nparts, root = self.key_cols, self.num_partitions, self.table.root
        frag_by_pid = {f.pid: f.path for f in m.fragments if f.kind == "data"}
        schema = m.schema
        schema_ser = schema.serialize().to_pybytes()
        tcols = list(schema.names)
        src_names = list(source_ds.schema().names)

        def tag(df: pd.DataFrame) -> pd.DataFrame:
            d = df[src_names].copy()
            d["_ping"] = np.int64(0)
            d["_part"] = _hash_part(d, keys, nparts)
            return d

        parts = source_ds.map_batches(tag, batch_format="pandas")
        if spec.when_not_matched_by_source:
            ping = pd.DataFrame({c: pd.Series(
                [None] * nparts, dtype=object) for c in src_names})
            ping["_ping"] = np.int64(1)
            ping["_part"] = np.arange(nparts, dtype=np.int64)
            parts = parts.union(rd.from_pandas(ping))

        def merge_pid(g: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            pid = int(g["_part"].iloc[0])
            # union with the all-None ping frame promotes columns to object;
            # restore the real dtypes before the vectorized expressions run
            src = g.loc[g["_ping"] == 0, src_names].infer_objects()
            lake = LakeTable(root)
            sch = pa.ipc.read_schema(pa.BufferReader(schema_ser))
            old_path = frag_by_pid.get(pid)
            cur = (pq.read_table(lake.abspath(old_path)).to_pandas()
                   if old_path is not None else
                   pa.table({f.name: pa.array([], f.type)
                             for f in sch}).to_pandas())
            out, stats = apply_merge_spec(cur, src, spec)
            changed = any(stats[k] for k in ("matched_updated",
                                             "matched_deleted", "inserted",
                                             "target_updated",
                                             "target_deleted"))
            row = {"pid": pid, "fragment_json": "", "replaced": "",
                   **{k: int(v) for k, v in stats.items()}}
            if changed:  # untouched pids keep their committed fragment
                frag = lake.stage_fragment(
                    pa.Table.from_pandas(out, schema=sch,
                                         preserve_index=False),
                    epoch, pid, 0, "data")
                row["fragment_json"] = json.dumps(frag.__dict__)
                row["replaced"] = old_path or ""
            return pd.DataFrame([row])

        rows = (parts.groupby("_part")
                .map_groups(merge_pid, batch_format="pandas").take_all())
        new_frags = [Fragment(**json.loads(r["fragment_json"]))
                     for r in rows if r["fragment_json"]]
        replaced = {r["replaced"] for r in rows if r["replaced"]}
        agg = {k: sum(int(r[k]) for r in rows)
               for k in ("matched_updated", "matched_deleted", "matched_noop",
                         "inserted", "source_ignored", "target_updated",
                         "target_deleted", "target_noop")}
        self.table.commit_epoch(
            epoch, new_frags, replaced=replaced,
            lineage=[{"epoch": epoch, **agg}], stats_delta=agg)
        return {"skipped": False, "epoch": epoch, **agg}

    def read(self):
        """Table state as a streamed Dataset."""
        import ray.data as rd

        m = self.table.latest_manifest()
        paths = self.table.all_fragment_paths(m, kind="data")
        if not paths:
            return rd.from_arrow(
                pa.table({f.name: pa.array([], f.type) for f in m.schema}))
        return rd.read_parquet(paths, partitioning=None)
