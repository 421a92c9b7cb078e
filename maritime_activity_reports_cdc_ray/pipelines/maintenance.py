"""Table maintenance: compaction + health checks.

Reference analogues: ``OPTIMIZE ... ZORDER`` / autoCompact / ``VACUUM``
(``silver/table_setup.py:276-291``, ``utils/spark_utils.py:153-205``) and the
health-check CLI verb (``cli.py`` health-check). Compaction rewrites a
partition's fragment chain (history fragments accumulate one per epoch per
group) into a single sorted fragment, committed as a maintenance manifest swap;
vacuum (LakeTable.vacuum) then drops the unreferenced files. All work is
partition-local — no shuffle."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc


def make_compact_task_fn(root: str, compression: str):
    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from maritime_activity_reports_cdc_ray.state.table import LakeTable

        lake = LakeTable(root)
        rows = []
        for item in batch.to_pylist():
            pid, salt, kind, epoch = int(item["pid"]), int(item["salt"]), item["kind"], int(item["epoch"])
            tabs = [pq.read_table(lake.abspath(p)) for p in item["paths"]]
            t = pa.concat_tables(tabs, promote_options="permissive")
            sort_keys = [("repo", "ascending"), ("path", "ascending")]
            if "commit" in t.column_names:
                sort_keys.append(("commit", "ascending"))
            t = t.combine_chunks().take(pc.sort_indices(t, sort_keys=sort_keys))
            frag = lake.stage_fragment(t, epoch, pid, salt, kind, compression, suffix="c")
            rows.append({"fragments_json": json.dumps([frag.__dict__]),
                         "replaced_json": json.dumps(list(item["paths"]))})
        if not rows:
            return pa.table({"fragments_json": pa.array([], pa.string()),
                             "replaced_json": pa.array([], pa.string())})
        return pa.Table.from_pylist(rows)

    return fn


def compact_table(lake, kinds: tuple = ("history",), compression: str = "zstd") -> dict:
    """Merge multi-fragment chains per (pid, salt, kind) into single sorted
    fragments. Returns counts. Safe to re-run; crash-safe (maintenance commit)."""
    import ray
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.state.table import Fragment

    m = lake.latest_manifest()
    chains: dict = {}
    for f in m.fragments:
        if f.kind in kinds:
            chains.setdefault((f.pid, f.salt, f.kind), []).append(f)
    items = [
        {"pid": pid, "salt": salt, "kind": kind, "epoch": m.epoch,
         "paths": [f.path for f in frs]}
        for (pid, salt, kind), frs in chains.items() if len(frs) > 1
    ]
    if not items:
        return {"compacted_groups": 0, "fragments_removed": 0}
    assert ray.is_initialized()
    res = rd.from_items(items).map_batches(
        make_compact_task_fn(lake.root, compression), batch_format="pyarrow", batch_size=1
    ).take_all()
    new_frags, replaced = [], set()
    for r in res:
        for d in json.loads(r["fragments_json"]):
            new_frags.append(Fragment(**d))
        replaced.update(json.loads(r["replaced_json"]))
    lake.commit_maintenance(new_frags, replaced)
    return {"compacted_groups": len(items), "fragments_removed": len(replaced)}


def health_check(replay) -> dict:
    """Lake health summary from manifests (reference: health-check verb +
    DESCRIBE DETAIL metrics, utils/spark_utils.py:111-150)."""
    import os

    out = {}
    for name, lake in (("bronze", replay.bronze), ("silver", replay.silver), ("gold", replay.gold)):
        m = lake.latest_manifest()
        if m is None:
            out[name] = {"status": "missing"}
            continue
        kinds: dict = {}
        missing = 0
        for f in m.fragments:
            k = kinds.setdefault(f.kind, {"fragments": 0, "rows": 0, "bytes": 0})
            k["fragments"] += 1
            k["rows"] += f.rows
            k["bytes"] += f.bytes
            if not os.path.exists(lake.abspath(f.path)):
                missing += 1
        out[name] = {
            "status": "ok" if missing == 0 else f"MISSING {missing} fragments",
            "epoch": m.epoch, "version": m.version, "kinds": kinds,
            "salted_pids": len(m.salt_map), "stats": m.stats,
        }
    sm, gm = replay.silver.latest_manifest(), replay.gold.latest_manifest()
    out["gold_lag_epochs"] = sm.epoch - gm.epoch if sm and gm else None
    return out
