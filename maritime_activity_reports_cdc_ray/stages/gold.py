"""Gold incremental aggregate refresh — per-repo rollups scoped to affected keys.

Reference semantics: G6-G8 per-affected-key aggregate refreshes
(``gold/cdf_processor.py:229-427``) and the vessel-activity MV
(``gold/materialized_views.py:41-136``). The reference drives these with a
*driver loop over collected keys + string-interpolated SQL MERGEs* — an
anti-pattern we replace with a set-oriented refresh (SURVEY.md §2.4): the
changed-repo set from merge lineage scopes which silver partitions are re-read,
and each affected pid's gold fragment is rebuilt in one partition-local task
(silver is partitioned by ``hash(repo)``, so a repo's rows live entirely in one
pid — **no shuffle at all** in the gold refresh).

Gold rows are *recomputed from silver current state*, never incrementally
patched — that makes the refresh idempotent and crash-resumable for free.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from maritime_activity_reports_cdc_ray.schemas import GOLD_SCHEMA

# silver columns the gold rollup needs — prune everything else at the read
GOLD_INPUT_COLUMNS = [
    "repo", "path", "commit", "lang", "content_bytes", "content_sha256",
    "is_deleted", "ever_deleted", "version_count",
]


def aggregate_repos(silver_rows: pa.Table, epoch: int, pid: int) -> pa.Table:
    """Roll up silver current rows (>=1 whole repos) into GOLD_SCHEMA rows.

    Vectorized over sorted segments; the only per-repo Python work is the
    repo_sha256 rollup (sha256 over sorted (path, content_sha256) pairs — the
    whole-repo state check, FIXTURES.md §4).
    """
    if silver_rows.num_rows == 0:
        from maritime_activity_reports_cdc_ray.stages.merge import align_to_schema

        return align_to_schema(pa.table({}), GOLD_SCHEMA)
    silver_rows = silver_rows.combine_chunks()
    order = pc.sort_indices(silver_rows, sort_keys=[("repo", "ascending"), ("path", "ascending")])
    t = silver_rows.take(order).combine_chunks()
    n = t.num_rows
    repo_arr = t.column("repo").chunk(0) if t.column("repo").num_chunks else \
        pa.array([], pa.string())
    nbytes = t.column("content_bytes").to_numpy(zero_copy_only=False)
    deleted = t.column("is_deleted").to_numpy(zero_copy_only=False).astype(bool)
    ever = t.column("ever_deleted").to_numpy(zero_copy_only=False).astype(bool)
    versions = t.column("version_count").to_numpy(zero_copy_only=False).astype(np.int64)

    # segment boundaries without object-dtype conversion: Arrow compares the
    # shifted repo column against itself (C-level), numpy only sees booleans
    first = np.ones(n, dtype=bool)
    if n > 1:
        first[1:] = pc.not_equal(repo_arr.slice(1), repo_arr.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(first)
    seg_id = np.cumsum(first) - 1
    live = ~deleted

    file_count = np.add.reduceat(live.astype(np.int64), starts)
    total_bytes = np.add.reduceat(np.where(live, np.nan_to_num(nbytes.astype(np.float64)), 0.0), starts).astype(np.int64)
    deleted_count = np.add.reduceat(ever.astype(np.int64), starts)
    total_versions = np.add.reduceat(versions, starts)

    n_seg = len(starts)
    repos_all = repo_arr.take(pa.array(starts, pa.int64()))

    # live-row view: latest commit / lang counts / repo sha only read live rows
    lv = np.flatnonzero(live)
    latest = np.full(n_seg, "", dtype=object)
    empty_digest = hashlib.sha256().hexdigest()
    repo_shas = np.full(n_seg, empty_digest, dtype=object)
    lang_child_lang = pa.array([], pa.string())
    lang_child_n = np.empty(0, dtype=np.int64)
    seg_nlang = np.zeros(n_seg, dtype=np.int64)
    if len(lv):
        lv_idx = pa.array(lv, pa.int64())
        seg_live = seg_id[lv]
        # latest commit + lang counts: C-level Arrow group_by over the live
        # rows keyed by segment id — no Python string comparisons
        live_tbl = pa.table({
            "seg": pa.array(seg_live, pa.int64()),
            "commit": t.column("commit").take(lv_idx),
            "lang": t.column("lang").take(lv_idx),
        })
        cm = live_tbl.group_by("seg").aggregate([("commit", "max")])
        latest[cm.column("seg").to_numpy()] = np.asarray(
            cm.column("commit_max").to_numpy(zero_copy_only=False), dtype=object)
        # count mode="all": a NULL lang is a real histogram bucket — the
        # default valid-only count would emit {lang: null, n: 0} for it
        lc = (live_tbl.group_by(["seg", "lang"])
              .aggregate([("lang", "count", pc.CountOptions(mode="all"))])
              .sort_by([("seg", "ascending"), ("lang", "ascending")]))
        lang_child_lang = lc.column("lang").combine_chunks()
        if isinstance(lang_child_lang, pa.ChunkedArray):  # flat Array for StructArray
            lang_child_lang = (lang_child_lang.chunk(0) if lang_child_lang.num_chunks
                               else pa.array([], pa.string()))
        lang_child_n = lc.column("lang_count").to_numpy()
        seg_nlang = np.bincount(lc.column("seg").to_numpy(), minlength=n_seg) \
            .astype(np.int64)
        # repo sha: rows are sorted by (repo, path), so each live run's
        # "p\x00s\n" lines are CONTIGUOUS in the joined column's data buffer —
        # hash a zero-copy memoryview slice per repo instead of building a
        # Python string per row (frompyfunc here cost ~1 µs/row; this is one
        # C-level join + one hash call per repo)
        j1 = pc.binary_join_element_wise(
            t.column("path").take(lv_idx).cast(pa.large_binary()),
            t.column("content_sha256").take(lv_idx).cast(pa.large_binary()),
            pa.scalar(b"\x00", pa.large_binary()))  # "p\x00s"
        joined = pc.binary_join_element_wise(
            j1, pa.array([b""] * len(lv), pa.large_binary()),
            pa.scalar(b"\n", pa.large_binary())).combine_chunks()
        # → "p\x00s\n" per row, byte-identical to the oracle's hash stream;
        # large_binary → int64 offsets, so a >2 GB pid can't overflow them
        if isinstance(joined, pa.ChunkedArray):
            joined = joined.chunk(0)
        offs = np.frombuffer(joined.buffers()[1], dtype=np.int64,
                             count=len(lv) + 1)
        data = memoryview(joined.buffers()[2])
        l_first = np.ones(len(lv), dtype=bool)
        l_first[1:] = seg_live[1:] != seg_live[:-1]
        l_starts = np.flatnonzero(l_first)
        l_ends = np.append(l_starts[1:], len(lv))
        g_seg = seg_live[l_starts]
        sha256 = hashlib.sha256
        for ri, (s, e) in enumerate(zip(l_starts, l_ends)):
            repo_shas[g_seg[ri]] = sha256(data[offs[s]:offs[e]]).hexdigest()

    offsets = np.zeros(n_seg + 1, dtype=np.int32)
    np.cumsum(seg_nlang, out=offsets[1:])
    lang_counts_arr = pa.ListArray.from_arrays(
        pa.array(offsets),
        pa.StructArray.from_arrays(
            [lang_child_lang.cast(pa.string()), pa.array(lang_child_n, pa.int64())],
            names=["lang", "n"]),
    )

    return pa.table(
        {
            "repo": repos_all.cast(pa.string()),
            "file_count": pa.array(file_count, pa.int64()),
            "latest_commit": pa.array(latest, pa.string()),
            "total_bytes": pa.array(total_bytes, pa.int64()),
            "lang_counts": lang_counts_arr.cast(GOLD_SCHEMA.field("lang_counts").type),
            "deleted_count": pa.array(deleted_count, pa.int64()),
            "total_versions": pa.array(total_versions, pa.int64()),
            "repo_sha256": pa.array(repo_shas, pa.string()),
            "last_epoch": pa.array(np.full(n_seg, epoch, dtype=np.int64)),
            "pid": pa.array(np.full(n_seg, pid, dtype=np.int32)),
        },
        schema=GOLD_SCHEMA,
    )


GOLD_RESULT_SCHEMA = pa.schema(
    [
        ("pid", pa.int32()),
        ("repos_refreshed", pa.int64()),
        ("gold_rows", pa.int64()),
        ("fragments_json", pa.string()),
    ]
)


def refresh_pid_items(batch: pa.Table, silver, gold, repos_by_pid: dict, epoch: int,
                      compression: str) -> pa.Table:
    """Process pid work items: read the pid's silver current fragments (column
    -pruned), filter to its affected repos, roll up, merge into the pid's gold
    fragment, stage the replacement. No shuffle; parallelism = affected pids."""
    import json

    import pyarrow.parquet as pq

    rows = []
    for item in batch.to_pylist():
        pid = int(item["pid"])
        silver_paths = list(item["silver_paths"])
        gold_path = item["gold_path"]  # '' if no gold fragment yet
        affected = repos_by_pid[pid]
        parts = [
            pq.read_table(silver.abspath(p), columns=GOLD_INPUT_COLUMNS)
            for p in silver_paths
        ]
        sil = pa.concat_tables(parts) if parts else None
        if sil is not None and sil.num_rows:
            mask = pc.is_in(sil.column("repo"), value_set=pa.array(affected, pa.string()))
            sil = sil.filter(mask)
        new_rows = aggregate_repos(sil, epoch, pid) if sil is not None else None
        if gold_path:
            old = pq.read_table(gold.abspath(gold_path))
            keep = pc.invert(pc.is_in(old.column("repo"), value_set=pa.array(affected, pa.string())))
            old = old.filter(keep)
            merged = pa.concat_tables([old, new_rows]) if new_rows is not None else old
        else:
            merged = new_rows
        if merged is None:
            continue
        merged = merged.take(pc.sort_indices(merged, sort_keys=[("repo", "ascending")]))
        frag = gold.stage_fragment(merged, epoch, pid, 0, "gold", compression)
        rows.append(
            {
                "pid": pid,
                "repos_refreshed": len(affected),
                "gold_rows": merged.num_rows,
                "fragments_json": json.dumps([frag.__dict__]),
            }
        )
    from maritime_activity_reports_cdc_ray.stages.merge import align_to_schema

    if not rows:
        return align_to_schema(pa.table({}), GOLD_RESULT_SCHEMA)
    return pa.Table.from_pylist(rows, schema=GOLD_RESULT_SCHEMA)


def make_gold_task_fn(silver_root: str, gold_root: str, repos_by_pid_ref, epoch: int,
                      compression: str = "zstd"):
    """Task-pool variant (warm workers, no actor startup) — the default for
    per-epoch refreshes; GoldRefresher below is the actor-pool equivalent."""

    def fn(batch: pa.Table) -> pa.Table:
        import ray

        from maritime_activity_reports_cdc_ray.state.table import LakeTable

        repos_by_pid = (
            ray.get(repos_by_pid_ref) if not isinstance(repos_by_pid_ref, dict) else repos_by_pid_ref
        )
        return refresh_pid_items(batch, LakeTable(silver_root), LakeTable(gold_root),
                                 repos_by_pid, epoch, compression)

    return fn


class GoldRefresher:
    """Actor-pool stage over *pid work items* (a tiny control dataset — one row
    per affected partition); state (the broadcast affected-repo map) resolves
    once per actor."""

    def __init__(self, silver_root: str, gold_root: str, repos_by_pid_ref, epoch: int,
                 compression: str = "zstd"):
        import ray

        from maritime_activity_reports_cdc_ray.state.table import LakeTable

        self.silver = LakeTable(silver_root)
        self.gold = LakeTable(gold_root)
        self.repos_by_pid = (
            ray.get(repos_by_pid_ref) if not isinstance(repos_by_pid_ref, dict) else repos_by_pid_ref
        )
        self.epoch = epoch
        self.compression = compression

    def __call__(self, batch: pa.Table) -> pa.Table:
        return refresh_pid_items(batch, self.silver, self.gold, self.repos_by_pid,
                                 self.epoch, self.compression)
