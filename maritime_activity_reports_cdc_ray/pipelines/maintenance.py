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


def zorder_indices(t: pa.Table, cols: list[str]):
    """Morton/Z-order permutation over ``cols`` (Delta ``OPTIMIZE ZORDER
    BY`` analogue): each column is quantized ORDER-PRESERVINGLY to 16 bits
    (rank among the fragment's distinct values, scaled — works for strings
    and numbers alike and adapts to skew like Delta's range-partitioned
    z-cube), the per-column codes are bit-interleaved into one key, and the
    stable argsort of that key is returned. Rows close in EVERY clustered
    dimension become contiguous, so parquet row-group min/max stats turn
    selective for predicates on ANY of the columns — a lexicographic sort
    only skips on the leading one. Deterministic (rank + stable sort)."""
    import numpy as np

    cols = [c for c in cols if c in t.column_names]
    assert 2 <= len(cols) <= 4, \
        "z-order takes 2-4 columns (4x16 bits = one u64 key); " \
        "fewer -> plain cluster_by sort, more -> pick the query dimensions"
    import pandas as pd

    codes = []
    for c in cols:
        # null-safe dense rank (silver current fragments carry delete
        # sentinels with null lang — np.unique would choke on None < str);
        # nulls take code 0 and cluster together at the z-curve origin
        r = pd.Series(t.column(c).to_pandas()).rank(method="dense")
        k = int(r.max()) if r.notna().any() else 1
        q = (r.fillna(0.0).to_numpy().astype(np.uint64) * np.uint64(65535)
             // np.uint64(max(1, k)))
        codes.append(q)
    key = np.zeros(t.num_rows, np.uint64)
    k = len(codes)
    for b in range(16):
        for j, q in enumerate(codes):
            key |= ((q >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * k + j)
    return np.argsort(key, kind="stable")


def make_compact_task_fn(root: str, compression: str,
                         cluster_by: list[str] | None = None,
                         row_group_size: int | None = None,
                         zorder: bool = False,
                         target_fragment_rows: int | None = None):
    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from maritime_activity_reports_cdc_ray.state.table import LakeTable

        lake = LakeTable(root)
        rows = []
        for item in batch.to_pylist():
            pid, salt, kind, epoch = int(item["pid"]), int(item["salt"]), item["kind"], int(item["epoch"])
            tabs = [pq.read_table(lake.abspath(p)) for p in item["paths"]]
            t = pa.concat_tables(tabs, promote_options="permissive").combine_chunks()
            if (zorder and cluster_by
                    and len([c for c in cluster_by
                             if c in t.column_names]) >= 2):
                idx = pa.array(zorder_indices(t, cluster_by))
            else:
                if cluster_by:
                    sort_keys = [(c, "ascending") for c in cluster_by
                                 if c in t.column_names]
                    # the primary key as tie-break keeps the layout deterministic
                    sort_keys += [(c, "ascending") for c in ("repo", "path", "commit")
                                  if c in t.column_names and c not in cluster_by]
                else:
                    sort_keys = [("repo", "ascending"), ("path", "ascending")]
                    if "commit" in t.column_names:
                        sort_keys.append(("commit", "ascending"))
                idx = pc.sort_indices(t, sort_keys=sort_keys)
            t = t.take(idx)
            n = t.num_rows
            if target_fragment_rows and n > target_fragment_rows \
                    and kind != "current":
                # split the clustered output at range boundaries so each
                # fragment's zone map covers a NARROW slice of the cluster
                # columns — manifest-level data skipping (state/zonemap.py)
                # then prunes whole files, not just row groups. Balanced
                # slice sizes; deterministic suffixes so reruns overwrite.
                k = -(-n // target_fragment_rows)
                bounds = [round(j * n / k) for j in range(k + 1)]
                frags = [
                    lake.stage_fragment(
                        t.slice(b0, b1 - b0), epoch, pid, salt, kind,
                        compression, suffix=f"c{j:03d}",
                        row_group_size=row_group_size)
                    for j, (b0, b1) in enumerate(zip(bounds, bounds[1:]))]
            else:
                frags = [lake.stage_fragment(
                    t, epoch, pid, salt, kind, compression,
                    suffix="c", row_group_size=row_group_size)]
            rows.append({"fragments_json": json.dumps([f.__dict__ for f in frags]),
                         "replaced_json": json.dumps(list(item["paths"]))})
        if not rows:
            return pa.table({"fragments_json": pa.array([], pa.string()),
                             "replaced_json": pa.array([], pa.string())})
        return pa.Table.from_pylist(rows)

    return fn


def compact_table(lake, kinds: tuple = ("history",), compression: str = "zstd",
                  cluster_by: list[str] | None = None,
                  row_group_size: int | None = None,
                  include_single: bool = False, zorder: bool = False,
                  trigger_min_chain: int | None = None,
                  target_fragment_rows: int | None = None) -> dict:
    """Merge multi-fragment chains per (pid, salt, kind) into single sorted
    fragments. Returns counts. Safe to re-run; crash-safe (maintenance commit).

    ``cluster_by`` re-sorts each compacted fragment on the given columns
    (reference analogue: ``OPTIMIZE ... ZORDER BY (cols)``,
    gold/table_setup.py:374-379, utils/spark_utils.py:154-171): rows with
    equal/nearby cluster values become contiguous, so parquet row-group
    min/max statistics turn selective and a later predicate read
    (``read_silver(predicate=...)``) skips whole row groups. Pair with
    ``row_group_size`` (rows per group, e.g. 32_000) to set the skipping
    granularity. ``include_single=True`` also rewrites single-fragment
    chains — needed when re-clustering an already-compacted table.

    ``target_fragment_rows``: split each clustered output at range
    boundaries into fragments of at most this many rows, so per-fragment
    zone maps (state/zonemap.py) cover narrow cluster-column slices and a
    predicate read skips whole FILES from the manifest, not just row
    groups. Not allowed for the ``current`` kind — the merge's fragment
    map and the resalt healer assume exactly one current fragment per
    (pid, salt). Note: split chains read back as multi-fragment chains, so
    set ``trigger_min_chain`` above the split count when combining with
    auto-OPTIMIZE."""
    import ray
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.state.table import Fragment

    if target_fragment_rows is not None:
        if "current" in kinds:
            raise ValueError(
                "target_fragment_rows cannot split 'current' fragments: the "
                "merge fragment map and resalt healer require exactly one "
                "current fragment per (pid, salt). Compact current without "
                "splitting, or split only history/gold/data kinds.")
        if target_fragment_rows < 1:
            raise ValueError("target_fragment_rows must be >= 1")
    if zorder and cluster_by is not None and not 2 <= len(cluster_by) <= 4:
        # validate BEFORE dispatching (mirrors the CLI check) — otherwise
        # zorder_indices' assert fires inside a Ray map task as an opaque
        # remote traceback
        raise ValueError(
            f"zorder takes 2-4 cluster columns, got {len(cluster_by)}: "
            "fewer -> plain cluster_by sort, more -> pick the query "
            "dimensions (4x16 bits = one u64 key)")
    m = lake.latest_manifest()
    chains: dict = {}
    for f in m.fragments:
        if f.kind in kinds:
            chains.setdefault((f.pid, f.salt, f.kind), []).append(f)
    if trigger_min_chain and (
            not chains or max(len(v) for v in chains.values())
            <= trigger_min_chain):
        # threshold gate (the auto-OPTIMIZE knob): nothing exceeds the
        # chain-length trigger — one source of truth with the scan above
        return {"compacted_groups": 0, "fragments_removed": 0}
    min_frags = 0 if include_single else 1
    items = [
        {"pid": pid, "salt": salt, "kind": kind, "epoch": m.epoch,
         "paths": [f.path for f in frs]}
        for (pid, salt, kind), frs in chains.items() if len(frs) > min_frags
    ]
    if not items:
        return {"compacted_groups": 0, "fragments_removed": 0}
    assert ray.is_initialized()
    res = rd.from_items(items).map_batches(
        make_compact_task_fn(lake.root, compression, cluster_by,
                             row_group_size, zorder, target_fragment_rows),
        batch_format="pyarrow", batch_size=1
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


# ---------------------------------------------------------------------------
# bronze retention: content rematerialization
# ---------------------------------------------------------------------------
# Silver stores content POINTERS (content_epoch → bronze epoch; see
# SILVER_CURRENT_SCHEMA), so bronze data epochs can only be dropped after the
# payloads still referenced by live rows are consolidated elsewhere. A
# maintenance epoch id space far above any stream epoch keeps the pointer
# semantics unchanged ("the bronze epoch holding this row's payload").
REMAT_BASE = 1 << 48


def rematerialize_content(replay, retain_epochs: int = 8,
                          compression: str = "zstd") -> dict:
    """Bound bronze growth under the content-pointer design (offline
    maintenance, like compaction): consolidate every payload still referenced
    by a live silver row out of bronze data epochs older than the newest
    ``retain_epochs`` (and out of prior rematerialization epochs) into ONE new
    maintenance epoch, retarget the silver pointers, then drop the old epochs
    from the bronze manifest (``vacuum`` reclaims the files).

    Crash-safe ordering — the lake is consistent after every commit:
      1. write + commit the new maintenance epoch (unreferenced → harmless),
      2. rewrite + commit silver pointers (old epochs still present),
      3. drop old bronze fragments from the manifest.

    Scale shape: the referenced-payload collection is a column-pruned silver
    meta scan inner-joined against the old bronze epochs (the same join a
    content-selecting reader pays, run once per retention cycle); pointer
    rewrites are a task pool over affected silver fragments (metadata-only
    files — content never lived in them)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.dedup import exact_dedup
    from maritime_activity_reports_cdc_ray.functions.join import auto_join
    from maritime_activity_reports_cdc_ray.state.table import Fragment

    bm = replay.bronze.latest_manifest()
    sm = replay.silver.latest_manifest()
    raw = sorted({f.epoch for f in bm.fragments if f.kind == "data" and f.epoch < REMAT_BASE})
    remats = sorted({f.epoch for f in bm.fragments if f.kind == "data" and f.epoch >= REMAT_BASE})
    if len(raw) <= retain_epochs and not remats:
        return {"pruned_epochs": 0, "rematerialized_rows": 0}
    cutoff = raw[-retain_epochs] if len(raw) > retain_epochs else (raw[0] if raw else 0)
    new_epoch = REMAT_BASE + (remats[-1] - REMAT_BASE + 1 if remats else 0)
    old_epochs = {e for e in raw if e < cutoff} | set(remats)
    if not old_epochs:
        return {"pruned_epochs": 0, "rematerialized_rows": 0}
    if not (old_epochs - set(remats[-1:])):
        # steady state: nothing but the single newest consolidation epoch —
        # re-copying it would churn O(all referenced content) per run for
        # zero pruning benefit
        return {"pruned_epochs": 0, "rematerialized_rows": 0}

    def is_old(ce):  # works on scalars and numpy arrays
        return (ce < cutoff) | ((ce >= REMAT_BASE) & (ce < new_epoch))

    # ---- 1. collect still-referenced payloads into the maintenance epoch ----
    cur_paths = replay.silver.all_fragment_paths(sm, kind="current")
    meta = rd.read_parquet(cur_paths, columns=["repo", "path", "commit",
                                               "content_epoch", "is_deleted"])

    def old_live(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        ce = t.column("content_epoch").to_numpy(zero_copy_only=False)
        dead = t.column("is_deleted").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(is_old(ce) & ~dead)).drop_columns(["is_deleted"])

    meta_old = meta.map_batches(old_live, batch_format="pyarrow", zero_copy_batch=True)
    old_files = [replay.bronze.abspath(f.path) for f in bm.fragments
                 if f.kind == "data" and f.epoch in old_epochs]
    outdir = replay.bronze.abspath(f"fragments/epoch={new_epoch}")
    new_frags: list = []
    n_remat = 0
    if old_files:
        cds = rd.read_parquet(old_files, columns=["repo", "path", "commit", "epoch",
                                                  "cdc_sequence_number", "content"])
        cds = exact_dedup(cds, cols=["repo", "path", "commit", "epoch"],
                          order=["cdc_sequence_number"], id_col="epoch")
        cds = cds.map_batches(
            lambda t: t.select(["repo", "path", "commit", "epoch",
                                "cdc_sequence_number", "content"])
                       .rename_columns(["_c_repo", "_c_path", "_c_commit",
                                        "_c_epoch", "cdc_sequence_number", "content"]),
            batch_format="pyarrow", zero_copy_batch=True)
        joined = auto_join(meta_old, cds,
                           on=["repo", "path", "commit", "content_epoch"],
                           right_on=["_c_repo", "_c_path", "_c_commit", "_c_epoch"],
                           how="inner")
        import os as _os
        import shutil as _shutil
        _shutil.rmtree(outdir, ignore_errors=True)
        _os.makedirs(outdir, exist_ok=True)

        def write_remat(t: pa.Table) -> pa.Table:
            import os
            import tempfile

            import pyarrow.compute as _pc

            if t.num_rows == 0:
                return pa.table({"path": pa.array([], pa.string()),
                                 "rows": pa.array([], pa.int64())})
            t = pa.table({
                "repo": t.column("repo").cast(pa.string()),
                "path": t.column("path").cast(pa.string()),
                "commit": t.column("commit").cast(pa.string()),
                "epoch": pa.array(np.full(t.num_rows, new_epoch, dtype=np.int64)),
                "cdc_sequence_number": t.column("cdc_sequence_number").cast(pa.uint64()),
                "content": t.column("content").cast(pa.large_string()),
            })
            # uuid component: seq mins are content-derived and can collide
            # across batches (duplicate content under different keys) — a
            # collision here would silently overwrite another batch's
            # consolidated payloads. The outdir is cleared before the run, so
            # non-deterministic names stay crash-safe.
            import uuid

            seqmin = int(_pc.min(t.column("cdc_sequence_number")).as_py())
            dst = os.path.join(
                outdir,
                f"data-{seqmin:020d}-{t.num_rows}-{uuid.uuid4().hex[:8]}.parquet")
            fd, tmp = tempfile.mkstemp(dir=outdir, suffix=".tmp")
            os.close(fd)
            try:
                pq.write_table(t, tmp, compression=compression)
                os.replace(tmp, dst)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
            return pa.table({"path": pa.array([dst], pa.string()),
                             "rows": pa.array([t.num_rows], pa.int64())})

        import os as _os2
        for r in joined.map_batches(write_remat, batch_format="pyarrow").take_all():
            new_frags.append(Fragment(
                path=_os2.path.relpath(r["path"], replay.bronze.root),
                pid=-1, salt=0, kind="data", epoch=new_epoch,
                rows=int(r["rows"]), bytes=_os2.path.getsize(r["path"])))
            n_remat += int(r["rows"])
        if new_frags:
            replay.bronze.commit_maintenance(new_frags, replaced=set())

    # ---- 2. retarget silver pointers at the maintenance epoch --------------
    affected = []
    for f in sm.fragments:
        if f.kind != "current":
            continue
        md = pq.read_metadata(replay.silver.abspath(f.path))
        names = pq.read_schema(replay.silver.abspath(f.path)).names
        ci = names.index("content_epoch")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            # old pointers live at BOTH ends of the epoch space: raw epochs
            # below cutoff (visible in min) and prior maintenance epochs at
            # REMAT_BASE+ (visible only in max) — test both
            if st is None or st.min < cutoff or st.max >= REMAT_BASE:
                affected.append(f)
                break
    if affected:
        suffix = f"rm{new_epoch - REMAT_BASE}"
        items = [{"path": f.path, "pid": f.pid, "salt": f.salt, "epoch": f.epoch}
                 for f in affected]
        silver_root = replay.silver.root  # closure-capture primitives only

        def rewrite(batch: pa.Table) -> pa.Table:
            from maritime_activity_reports_cdc_ray.state.table import LakeTable

            lake = LakeTable(silver_root)
            rows = []
            for item in batch.to_pylist():
                t = pq.read_table(lake.abspath(item["path"]))
                ce = t.column("content_epoch").to_numpy(zero_copy_only=False)
                ce2 = np.where(is_old(ce), np.int64(new_epoch), ce)
                t = t.set_column(t.column_names.index("content_epoch"),
                                 "content_epoch", pa.array(ce2, pa.int64()))
                frag = lake.stage_fragment(t, int(item["epoch"]), int(item["pid"]),
                                           int(item["salt"]), "current", compression,
                                           suffix=suffix)
                rows.append({"fragments_json": json.dumps([frag.__dict__]),
                             "replaced_json": json.dumps([item["path"]])})
            return pa.Table.from_pylist(rows)

        res = rd.from_items(items).map_batches(rewrite, batch_format="pyarrow",
                                               batch_size=1).take_all()
        s_new, s_repl = [], set()
        for r in res:
            for d in json.loads(r["fragments_json"]):
                s_new.append(Fragment(**d))
            s_repl.update(json.loads(r["replaced_json"]))
        replay.silver.commit_maintenance(s_new, s_repl)

    # ---- 3. drop the old bronze epochs from the manifest --------------------
    prune = {f.path for f in bm.fragments if f.kind == "data" and f.epoch in old_epochs}
    replay.bronze.commit_maintenance([], replaced=prune)
    return {"pruned_epochs": len(old_epochs), "rematerialized_rows": n_remat,
            "remat_epoch": new_epoch, "silver_fragments_rewritten": len(affected)}
