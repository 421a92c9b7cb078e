"""Keyed lookup-cache table with MERGE-style counter upsert (G4 / W6).

Reference semantics: ``silver/streaming_processor.py:150-191`` MERGEs the
distinct enrichment inputs of each micro-batch into
``silver.spatial_enrichment_cache`` (DDL ``silver/table_setup.py:226-272``) —
matched keys bump ``access_count`` and refresh ``last_accessed``; new keys
insert with count 1 and ``first_seen``. We keep the same columns but use the
deterministic epoch number where the reference uses ``current_timestamp()``
(testable, idempotent on replay).

Ray-Data shape (scale notes):

- The update side is distincted FIRST (per-batch local dedup → hash partition
  → per-partition dedup), so shuffle volume is bounded by the number of
  distinct keys in the epoch, not the event count — exactly the reference's
  ``.distinct()`` before MERGE.
- The cache itself is a :class:`LakeTable` partitioned by
  ``pid = hash(key) % num_partitions``; an upsert rewrites only the pids that
  received updates, each in one Ray task that reads that pid's current
  fragment, merges vectorized (pandas indicator merge), and stages the new
  fragment to a deterministic path. The driver commits all staged fragments
  in one atomic manifest swap (2PC — same protocol as silver).
- Lookup from an enrichment stage is a broadcast: the cache is assumed small
  relative to the stream (it is a *cache* of distinct enrichment inputs);
  ``read()`` streams it as a Dataset for anything bigger.

Idempotency: ``upsert_epoch`` with an epoch <= the committed watermark is a
no-op (exactly-once under replay — the counter never double-bumps).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from maritime_activity_reports_cdc_ray.state.table import Fragment, LakeTable

_META = "_cache_meta.json"

_COUNTER_COLS = ("first_seen_epoch", "last_accessed_epoch", "access_count")


# the cache's key→pid routing MUST stay identical release to release (a
# divergent copy would silently re-home keys) — share the one implementation
from maritime_activity_reports_cdc_ray.functions.dedup import _hash_part as _hash_pid


class LookupCache:
    """A small keyed cache table: ``key_cols + payload_cols + first_seen_epoch
    + last_accessed_epoch + access_count``, manifest-backed."""

    def __init__(self, root: str):
        self.table = LakeTable(root)
        with open(os.path.join(root, _META)) as f:
            meta = json.load(f)
        self.key_cols: list[str] = meta["key_cols"]
        self.num_partitions: int = meta["num_partitions"]

    # ------------------------------------------------------------------ create
    @staticmethod
    def create(root: str, key_cols: list[str], schema: pa.Schema,
               num_partitions: int = 8) -> "LookupCache":
        """``schema`` = key + payload fields (counter columns are appended)."""
        names = set(schema.names)
        missing = [c for c in key_cols if c not in names]
        assert not missing, f"schema lacks key columns {missing}"
        fields = list(schema)
        for c in _COUNTER_COLS:
            assert c not in names, f"reserved column {c}"
            fields.append(pa.field(c, pa.int64()))
        LakeTable.create(root, "lookup_cache", pa.schema(fields), num_partitions)
        mp = os.path.join(root, _META)
        if not os.path.exists(mp):
            with open(mp + ".tmp", "w") as f:
                json.dump({"key_cols": list(key_cols),
                           "num_partitions": num_partitions}, f)
            os.replace(mp + ".tmp", mp)
        return LookupCache(root)

    # ------------------------------------------------------------------ upsert
    def upsert_epoch(self, updates_ds, epoch: int) -> dict:
        """MERGE the distinct keys of ``updates_ds`` (a Dataset holding at
        least ``key_cols``; extra payload columns are kept on first insert)
        into the cache. Returns ``{"hits": H, "misses": M}`` for the epoch.
        Epochs at or below the committed watermark are no-ops."""
        m = self.table.latest_manifest()
        if epoch <= m.epoch:
            return {"hits": 0, "misses": 0, "skipped": True}

        key_cols, nparts = self.key_cols, self.num_partitions
        root = self.table.root
        frag_by_pid = {f.pid: f.path for f in m.fragments if f.kind == "data"}
        payload_cols = [n for n in m.schema.names
                        if n not in key_cols and n not in _COUNTER_COLS]
        schema = m.schema

        def local(df: pd.DataFrame) -> pd.DataFrame:
            d = df.drop_duplicates(subset=key_cols)
            d = d[[c for c in (key_cols + payload_cols) if c in d.columns]]
            d["_pid"] = _hash_pid(d, key_cols, nparts)
            return d

        def merge_pid(g: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            pid = int(g["_pid"].iloc[0])
            upd = g.drop(columns=["_pid"]).drop_duplicates(subset=key_cols)
            lake = LakeTable(root)
            old_path = frag_by_pid.get(pid)
            if old_path is not None:
                cur = pq.read_table(lake.abspath(old_path)).to_pandas()
            else:
                cur = pa.table(
                    {f.name: pa.array([], f.type) for f in schema}).to_pandas()
            hit_mask = upd.merge(cur[key_cols], on=key_cols, how="left",
                                 indicator=True)["_merge"].eq("both").to_numpy()
            hit_keys = upd.loc[hit_mask, key_cols]
            # matched → bump the counter, refresh last_accessed
            cur_hit = cur.merge(hit_keys.assign(_h=1), on=key_cols, how="left")
            bump = cur_hit["_h"].notna().to_numpy()
            cur.loc[bump, "access_count"] = cur.loc[bump, "access_count"] + 1
            cur.loc[bump, "last_accessed_epoch"] = np.int64(epoch)
            # not matched → insert with count 1
            ins = upd.loc[~hit_mask].copy()
            for c in payload_cols:
                if c not in ins.columns:
                    ins[c] = None
            ins["first_seen_epoch"] = np.int64(epoch)
            ins["last_accessed_epoch"] = np.int64(epoch)
            ins["access_count"] = np.int64(1)
            out = pd.concat([cur, ins[list(cur.columns)]], ignore_index=True)
            frag = lake.stage_fragment(
                pa.Table.from_pandas(out, schema=schema, preserve_index=False),
                epoch, pid, 0, "data")
            return pd.DataFrame({
                "pid": [pid],
                "hits": [int(hit_mask.sum())],
                "misses": [int((~hit_mask).sum())],
                "fragment_json": [json.dumps(frag.__dict__)],
                "replaced": [old_path or ""],
            })

        res = (updates_ds.map_batches(local, batch_format="pandas")
               .groupby("_pid").map_groups(merge_pid, batch_format="pandas"))
        rows = res.take_all()  # one tiny row per touched pid

        new_frags = [Fragment(**json.loads(r["fragment_json"])) for r in rows]
        replaced = {r["replaced"] for r in rows if r["replaced"]}
        hits = sum(int(r["hits"]) for r in rows)
        misses = sum(int(r["misses"]) for r in rows)
        self.table.commit_epoch(
            epoch, new_frags, replaced=replaced,
            lineage=[{"epoch": epoch, "hits": hits, "misses": misses}],
            stats_delta={"hits": hits, "misses": misses},
        )
        return {"hits": hits, "misses": misses, "skipped": False}

    # ----------------------------------------------------------------- readers
    def read(self):
        """The cache as a Dataset (streams; use for big caches)."""
        import ray.data as rd

        m = self.table.latest_manifest()
        paths = self.table.all_fragment_paths(m, kind="data")
        if not paths:
            return rd.from_arrow(
                pa.table({f.name: pa.array([], f.type) for f in m.schema}))
        return rd.read_parquet(paths, partitioning=None)

    def lookup_frame(self) -> pd.DataFrame:
        """The whole cache as one DataFrame — for ``ray.put`` broadcast into
        an enrichment stage (W6). Only valid because a lookup cache is small
        by construction (distinct enrichment inputs, not the stream)."""
        return self.read().to_pandas()

    def stats(self) -> dict:
        return dict(self.table.latest_manifest().stats)
