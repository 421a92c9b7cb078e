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
    t = silver_rows.take(order)
    repo = np.asarray(t.column("repo").to_numpy(zero_copy_only=False), dtype=object)
    path = np.asarray(t.column("path").to_numpy(zero_copy_only=False), dtype=object)
    commit = np.asarray(t.column("commit").to_numpy(zero_copy_only=False), dtype=object)
    lang = np.asarray(t.column("lang").to_numpy(zero_copy_only=False), dtype=object)
    sha = np.asarray(t.column("content_sha256").to_numpy(zero_copy_only=False), dtype=object)
    nbytes = t.column("content_bytes").to_numpy(zero_copy_only=False)
    deleted = t.column("is_deleted").to_numpy(zero_copy_only=False).astype(bool)
    ever = t.column("ever_deleted").to_numpy(zero_copy_only=False).astype(bool)
    versions = t.column("version_count").to_numpy(zero_copy_only=False).astype(np.int64)

    n = len(repo)
    first = np.ones(n, dtype=bool)
    first[1:] = repo[1:] != repo[:-1]
    starts = np.flatnonzero(first)
    live = ~deleted

    file_count = np.add.reduceat(live.astype(np.int64), starts)
    total_bytes = np.add.reduceat(np.where(live, np.nan_to_num(nbytes.astype(np.float64)), 0.0), starts).astype(np.int64)
    deleted_count = np.add.reduceat(ever.astype(np.int64), starts)
    total_versions = np.add.reduceat(versions, starts)

    n_seg = len(starts)
    repos_all = repo[starts]

    # live-row view: latest commit / lang counts / repo sha only read live rows
    lv = np.flatnonzero(live)
    latest = np.full(n_seg, "", dtype=object)
    empty_digest = hashlib.sha256().hexdigest()
    repo_shas = np.full(n_seg, empty_digest, dtype=object)
    # per-segment distinct-lang run counts (for list offsets) + children
    lang_child_lang: np.ndarray = np.empty(0, dtype=object)
    lang_child_n: np.ndarray = np.empty(0, dtype=np.int64)
    seg_nlang = np.zeros(n_seg, dtype=np.int64)
    if len(lv):
        l_first = np.ones(len(lv), dtype=bool)
        l_first[1:] = repo[lv][1:] != repo[lv][:-1]
        l_starts = np.flatnonzero(l_first)
        # which global segment each live-run belongs to
        g_seg = np.searchsorted(starts, lv[l_starts], side="right") - 1
        # max commit per live run — np.maximum ufunc compares Python strings
        latest[g_seg] = np.maximum.reduceat(commit[lv], l_starts)
        # lang counts: C-level pandas groupby over (seg, lang), then one
        # list<struct> column built from offsets — no per-repo Python
        seg_of_live = np.cumsum(l_first) - 1
        import pandas as pd

        lc = (pd.DataFrame({"seg": g_seg[seg_of_live], "lang": lang[lv]})
              .groupby(["seg", "lang"], sort=True, as_index=False).size())
        lang_child_lang = lc["lang"].to_numpy()
        lang_child_n = lc["size"].to_numpy(dtype=np.int64)
        seg_nlang = np.bincount(lc["seg"].to_numpy(), minlength=n_seg).astype(np.int64)
        # repo sha: one joined bytes blob per live run, one hash call each
        # (rows sorted by (repo, path) → pairs arrive pre-sorted).
        # NB frompyfunc, not `arr + "\x00"`: numpy (and pandas' numpy-routed
        # broadcast) coerce the separator scalar through a fixed-width U
        # dtype, which silently strips the NUL byte.
        blob = np.frompyfunc(lambda p, s: f"{p}\x00{s}\n", 2, 1)(path[lv], sha[lv])
        l_ends = np.append(l_starts[1:], len(lv))
        for ri, (s, e) in enumerate(zip(l_starts, l_ends)):
            repo_shas[g_seg[ri]] = hashlib.sha256(
                "".join(blob[s:e]).encode()).hexdigest()

    offsets = np.zeros(n_seg + 1, dtype=np.int32)
    np.cumsum(seg_nlang, out=offsets[1:])
    lang_counts_arr = pa.ListArray.from_arrays(
        pa.array(offsets),
        pa.StructArray.from_arrays(
            [pa.array(lang_child_lang, pa.string()), pa.array(lang_child_n, pa.int64())],
            names=["lang", "n"]),
    )

    return pa.table(
        {
            "repo": pa.array(repos_all, pa.string()),
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
