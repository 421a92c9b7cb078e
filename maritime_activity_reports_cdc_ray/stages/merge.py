"""The silver merge-apply: keyed LWW upsert + SCD2 history + tombstone deletes.

Reference semantics reproduced here (see SURVEY.md §2.4):

- G2 idempotent keyed upsert (``silver/cdf_processor.py:255-275``),
- G1/G3 SCD2 close-current/insert-new with change detection
  (``bronze/cdc_ingestion.py:169-224``, ``silver/cdf_processor.py:277-332``),
- W3 latest-record-per-key argmax (``silver/table_setup.py:298-324``) — the
  in-batch per-key max-commit dedup,
- delete branch (``bronze/cdc_ingestion.py:189-193``) generalized to
  tombstone-driven deletes.

Execution shape (north_star): events are hash-repartitioned on
``gid = pid * max_salt + salt`` and streamed through a **stateful actor pool**
(``map_batches(MergeApplier, batch_size=None, batch_format="pyarrow",
zero_copy_batch=True, concurrency=N)``). Each actor receives whole blocks
containing complete gid groups, merges each group against its single live
current fragment (read from the committed manifest — state lives in storage,
so actor memory stays ∝ batch, not table; SURVEY.md §7.4), stages replacement
fragments at deterministic paths, and emits one lineage row per group. The
driver commits the manifest (two-phase commit) after the stage drains.

``apply_events_to_partition`` is the pure, fully-vectorized kernel — unit
-tested against the dict-replay oracle (oracle.py) which is the executable
specification of these semantics.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from maritime_activity_reports_cdc_ray.schemas import LINEAGE_SCHEMA, SILVER_CURRENT_SCHEMA

# columns of the bronze event stream that are engine metadata, not payload —
# anything else present on events is treated as an evolved payload column and
# carried through to silver (additive schema evolution).
_EVENT_META_COLS = {
    "repo", "path", "commit", "lang", "content",
    "cdc_operation", "cdc_sequence_number", "source_system", "epoch",
    "content_sha256", "content_bytes", "data_quality_score", "quality_category",
    "pid", "path_hash", "gid", "gkey", "content_epoch",
}

MERGE_RESULT_SCHEMA = pa.schema(list(LINEAGE_SCHEMA) + [pa.field("fragments_json", pa.string())])


def extra_payload_columns(event_schema: pa.Schema) -> list[pa.Field]:
    return [f for f in event_schema if f.name not in _EVENT_META_COLS]


def silver_schema_for(event_schema: pa.Schema) -> pa.Schema:
    """Silver current schema = base + evolved payload columns of the stream."""
    return pa.schema(list(SILVER_CURRENT_SCHEMA) + extra_payload_columns(event_schema))


def align_to_schema(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project/extend a table to ``schema``: missing columns become nulls
    (additive evolution backfill — reference ``mergeSchema``,
    bronze/cdc_ingestion.py:59); column order normalized."""
    cols = []
    for f in schema:
        if f.name in t.column_names:
            c = t.column(f.name)
            if c.type != f.type:
                c = c.cast(f.type)
            cols.append(c)
        else:
            cols.append(pa.nulls(t.num_rows, f.type))
    return pa.Table.from_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols],
                                schema=schema)


def _np_str(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    return np.asarray(col.to_numpy(zero_copy_only=False), dtype=object)


def _key_concat(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # NB: pandas' object hash table uses C-string semantics — an embedded NUL
    # separator silently truncates keys. Length-prefix instead for unambiguity.
    return np.fromiter((f"{len(x)}\x1f{x}{y}" for x, y in zip(a, b)), dtype=object, count=len(a))


def _seg_shift(values: np.ndarray, first_mask: np.ndarray, fill) -> np.ndarray:
    """Previous row's value within segments; ``fill`` at segment starts."""
    out = np.empty(len(values), dtype=values.dtype if values.dtype != bool else object)
    out[1:] = values[:-1]
    if len(values):
        out[0] = fill
    out[first_mask] = fill
    return out


def apply_events_to_partition(
    current: pa.Table | None,
    events: pa.Table,
    epoch: int,
    silver_schema: pa.Schema,
    detect_changes: bool = False,
) -> tuple[pa.Table | None, pa.Table, dict]:
    """Apply one (pid, salt) group's events to its current fragment.

    Returns ``(new_current, history_rows, stats)``; ``new_current`` is ``None``
    when nothing applied (fragment unchanged). Deterministic: output sorted by
    (repo, path); ties in ``commit`` broken by ``cdc_sequence_number`` (content
    -derived, so identical at any parallelism).

    ``detect_changes`` enables the reference's G3 no-op suppression
    (``silver/cdf_processor.py:296-300``): an otherwise-applicable event whose
    watched state — (alive, content_sha256, lang) — equals the key's running
    state is skipped entirely: no history row, no version bump, and the
    current row (including its commit watermark) stays untouched, exactly like
    a MERGE ``WHEN MATCHED AND <changed>`` whose condition is false. Real CDC
    feeds are full of replayed/no-op updates; without this every one mints a
    spurious SCD2 version. Because a non-tombstone's post-state always equals
    its own signature, "running state" reduces to the previous applied event's
    signature (stored current for the segment head) — one vectorized shift."""
    extra_fields = [f for f in silver_schema if f.name not in {x.name for x in SILVER_CURRENT_SCHEMA}]
    if current is not None:
        current = align_to_schema(current, silver_schema)

    n = events.num_rows
    stats = {"rows_in": n, "rows_applied": 0, "rows_stale": 0, "rows_duplicate": 0,
             "rows_unchanged": 0, "inserted": 0, "updated": 0, "deleted": 0,
             "history_rows": 0}
    empty_hist = align_to_schema(pa.table({}), _history_schema())
    if n == 0:
        return None, empty_hist, stats

    events = events.combine_chunks()
    idx = pc.sort_indices(
        events,
        sort_keys=[("repo", "ascending"), ("path", "ascending"),
                   ("commit", "ascending"), ("cdc_sequence_number", "ascending")],
    )
    ev = events.take(idx)

    repo = _np_str(ev.column("repo"))
    path = _np_str(ev.column("path"))
    commit = _np_str(ev.column("commit"))
    is_tomb = ev.column("cdc_operation").to_numpy(zero_copy_only=False) == "delete"

    new_key = np.ones(n, dtype=bool)
    if n > 1:
        new_key[1:] = (repo[1:] != repo[:-1]) | (path[1:] != path[:-1])
    dup_inbatch = np.zeros(n, dtype=bool)
    if n > 1:
        dup_inbatch[1:] = (~new_key[1:]) & (commit[1:] == commit[:-1])

    # ---- lookup stored current state per event key -------------------------
    ev_key = _key_concat(repo, path)
    if current is not None and current.num_rows:
        cur_repo = _np_str(current.column("repo"))
        cur_path = _np_str(current.column("path"))
        cur_key = _key_concat(cur_repo, cur_path)
        pos = pd.Index(cur_key).get_indexer(ev_key)
        cur_commit = _np_str(current.column("commit"))
        cur_deleted = current.column("is_deleted").to_numpy(zero_copy_only=False).astype(bool)
        cur_ever = current.column("ever_deleted").to_numpy(zero_copy_only=False).astype(bool)
        cur_versions = current.column("version_count").to_numpy(zero_copy_only=False).astype(np.int64)
        cur_lang = _np_str(current.column("lang"))
        cur_sha = _np_str(current.column("content_sha256"))
        cur_valid_from = _np_str(current.column("valid_from_commit"))
    else:
        pos = np.full(n, -1, dtype=np.int64)
        cur_commit = cur_lang = cur_sha = cur_valid_from = np.empty(0, dtype=object)
        cur_deleted = cur_ever = np.empty(0, dtype=bool)
        cur_versions = np.empty(0, dtype=np.int64)

    has_cur = pos >= 0
    safe_pos = np.where(has_cur, pos, 0)
    ev_cur_commit = np.where(has_cur, cur_commit[safe_pos] if len(cur_commit) else "", "")

    stale = (~dup_inbatch) & has_cur & (commit < ev_cur_commit)
    dup_replay = (~dup_inbatch) & has_cur & (commit == ev_cur_commit)
    applied = ~(dup_inbatch | stale | dup_replay)

    stats["rows_stale"] = int(stale.sum())
    stats["rows_duplicate"] = int((dup_inbatch | dup_replay).sum())
    stats["rows_applied"] = int(applied.sum())
    if stats["rows_applied"] == 0:
        return None, empty_hist, stats

    a = np.flatnonzero(applied)

    if detect_changes and len(a):
        n_repo, n_path = repo[a], path[a]
        n_tomb = is_tomb[a]
        n_first = np.ones(len(a), dtype=bool)
        if len(a) > 1:
            n_first[1:] = (n_repo[1:] != n_repo[:-1]) | (n_path[1:] != n_path[:-1])
        n_pos = pos[a]
        n_has = n_pos >= 0
        n_safe = np.where(n_has, n_pos, 0)
        n_sha = _np_str(ev.column("content_sha256"))[a]
        n_lang = _np_str(ev.column("lang"))[a]
        head_alive = n_has & (~cur_deleted[n_safe] if len(cur_deleted) else False)
        head_sha = np.where(n_has, cur_sha[n_safe] if len(cur_sha) else None, None)
        head_lang = np.where(n_has, cur_lang[n_safe] if len(cur_lang) else None, None)
        prev_alive = np.where(n_first, head_alive,
                              _seg_shift(~n_tomb, n_first, False)).astype(bool)
        prev_sha = np.where(n_first, head_sha, _seg_shift(n_sha, n_first, None))
        prev_lang = np.where(n_first, head_lang, _seg_shift(n_lang, n_first, None))
        noop = np.where(n_tomb, ~prev_alive,
                        prev_alive & (n_sha == prev_sha) & (n_lang == prev_lang))
        stats["rows_unchanged"] = int(noop.sum())
        stats["rows_applied"] -= stats["rows_unchanged"]
        if stats["rows_applied"] == 0:
            return None, empty_hist, stats
        a = a[~noop]
    a_repo, a_path, a_commit = repo[a], path[a], commit[a]
    a_tomb = is_tomb[a]
    a_first = np.ones(len(a), dtype=bool)
    if len(a) > 1:
        a_first[1:] = (a_repo[1:] != a_repo[:-1]) | (a_path[1:] != a_path[:-1])
    a_pos = pos[a]
    a_has_cur = a_pos >= 0
    a_safe = np.where(a_has_cur, a_pos, 0)

    # ---- SCD2 history: close the open version before each applied event ----
    cur_open = a_has_cur & (~cur_deleted[a_safe] if len(cur_deleted) else False)
    a_lang = _np_str(ev.column("lang"))[a]
    a_sha = _np_str(ev.column("content_sha256"))[a]
    prev_nontomb = _seg_shift(~a_tomb, a_first, False).astype(bool)
    open_before = np.where(a_first, cur_open, prev_nontomb)
    hist_mask = open_before

    # fields of the version being closed
    def pick(first_vals: np.ndarray, prev_vals: np.ndarray) -> np.ndarray:
        prev = _seg_shift(prev_vals, a_first, None)
        out = np.where(a_first, first_vals, prev)
        return out

    base_commit = np.where(a_has_cur, cur_commit[a_safe] if len(cur_commit) else None, None)
    base_lang = np.where(a_has_cur, cur_lang[a_safe] if len(cur_lang) else None, None)
    base_sha = np.where(a_has_cur, cur_sha[a_safe] if len(cur_sha) else None, None)
    base_vf = np.where(a_has_cur, cur_valid_from[a_safe] if len(cur_valid_from) else None, None)
    h_commit = pick(base_commit, a_commit)[hist_mask]
    h_lang = pick(base_lang, a_lang)[hist_mask]
    h_sha = pick(base_sha, a_sha)[hist_mask]
    h_vf = pick(base_vf, a_commit)[hist_mask]
    h_to = a_commit[hist_mask]
    h_op = np.where(a_tomb[hist_mask], "delete", "update")
    history = pa.table(
        {
            "repo": pa.array(a_repo[hist_mask], pa.string()),
            "path": pa.array(a_path[hist_mask], pa.string()),
            "commit": pa.array(h_commit, pa.string()),
            "lang": pa.array(h_lang, pa.string()),
            "content_sha256": pa.array(h_sha, pa.string()),
            "valid_from_commit": pa.array(h_vf, pa.string()),
            "valid_to_commit": pa.array(h_to, pa.string()),
            "closed_by_op": pa.array(h_op, pa.string()),
            "epoch": pa.array(np.full(int(hist_mask.sum()), epoch, dtype=np.int64)),
        }
    )
    stats["history_rows"] = history.num_rows

    # ---- per-key winners → updated current rows ----------------------------
    seg_starts = np.flatnonzero(a_first)
    seg_ends = np.append(seg_starts[1:], len(a)) - 1  # last applied per key
    w = a[seg_ends]  # winner indices into ev
    w_tomb = is_tomb[w]
    inc_nontomb = np.add.reduceat((~a_tomb).astype(np.int64), seg_starts)
    any_tomb = np.add.reduceat(a_tomb.astype(np.int64), seg_starts) > 0
    k_pos = pos[w]
    k_has_cur = k_pos >= 0
    k_safe = np.where(k_has_cur, k_pos, 0)
    base_versions = np.where(k_has_cur, cur_versions[k_safe] if len(cur_versions) else 0, 0)
    base_ever = np.where(k_has_cur, cur_ever[k_safe] if len(cur_ever) else False, False)

    stats["inserted"] = int((~k_has_cur).sum())
    stats["updated"] = int(k_has_cur.sum())
    stats["deleted"] = int(a_tomb.sum())
    stats["changed_repos"] = sorted(set(a_repo.tolist()))

    wt = ev.take(pa.array(w, pa.int64()))
    tomb_arr = pa.array(w_tomb)

    def null_if_tomb(col: pa.ChunkedArray, typ: pa.DataType):
        col = col.cast(typ) if col.type != typ else col
        return pc.if_else(tomb_arr, pa.scalar(None, typ), col)

    data = {
        "repo": wt.column("repo").cast(pa.string()),
        "path": wt.column("path").cast(pa.string()),
        "commit": wt.column("commit").cast(pa.string()),
        "lang": null_if_tomb(wt.column("lang"), pa.string()),
        # winners are, by construction, events of THIS epoch — their payload
        # lives in this epoch's bronze fragments (see SILVER_CURRENT_SCHEMA)
        "content_epoch": pa.array(np.full(len(w), epoch, dtype=np.int64)),
        "content_sha256": null_if_tomb(wt.column("content_sha256"), pa.string()),
        "content_bytes": pc.if_else(tomb_arr, pa.scalar(0, pa.int64()), wt.column("content_bytes")),
        "is_deleted": tomb_arr,
        "ever_deleted": pa.array(base_ever | any_tomb),
        "version_count": pa.array(base_versions + inc_nontomb, pa.int64()),
        "valid_from_commit": pc.if_else(tomb_arr, pa.scalar("", pa.string()), wt.column("commit").cast(pa.string())),
        "data_quality_score": wt.column("data_quality_score"),
        "last_epoch": pa.array(np.full(len(w), epoch, dtype=np.int64)),
        "path_hash": wt.column("path_hash"),
    }
    for f in extra_fields:
        data[f.name] = null_if_tomb(wt.column(f.name), f.type) if f.name in wt.column_names \
            else pa.nulls(len(w), f.type)
    updated = pa.Table.from_pydict(data, schema=silver_schema)

    # ---- untouched current rows pass through -------------------------------
    if current is not None and current.num_rows:
        touched = pd.Index(pd.unique(ev_key[a])).get_indexer(cur_key) >= 0
        kept = current.filter(pa.array(~touched))
        new_current = pa.concat_tables([kept, updated]).combine_chunks()
    else:
        new_current = updated
    order = pc.sort_indices(new_current, sort_keys=[("repo", "ascending"), ("path", "ascending")])
    new_current = new_current.take(order)
    return new_current, history, stats


def _history_schema() -> pa.Schema:
    from maritime_activity_reports_cdc_ray.schemas import SILVER_HISTORY_SCHEMA

    return SILVER_HISTORY_SCHEMA


def process_gid_groups(batch: pa.Table, lake, frag_map: dict, epoch: int,
                       schema: pa.Schema, max_salt: int, compression: str,
                       detect_changes: bool = False) -> pa.Table:
    """Merge every complete gid group inside ``batch`` against its (pid, salt)
    current fragment; stage replacement fragments; return lineage rows.
    Shared by the actor-pool (MergeApplier) and task (make_merge_task_fn)
    execution shapes."""
    import pyarrow.parquet as pq

    if batch.num_rows == 0:
        return align_to_schema(pa.table({}), MERGE_RESULT_SCHEMA)
    # combine BEFORE take: post-shuffle blocks arrive with hundreds of tiny
    # chunks and pc.take on a many-chunk string column is pathologically slow
    batch = batch.combine_chunks()
    order = pc.sort_indices(batch, sort_keys=[("gid", "ascending")])
    batch = batch.take(order)
    gids = batch.column("gid").to_numpy(zero_copy_only=False)
    bounds = np.flatnonzero(np.diff(gids, prepend=gids[0] - 1))
    bounds = np.append(bounds, len(gids))
    rows = []
    for i in range(len(bounds) - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        gid = int(gids[lo])
        pid, salt = gid // max_salt, gid % max_salt
        group = batch.slice(lo, hi - lo)
        rel = frag_map.get((pid, salt))
        cur = pq.read_table(lake.abspath(rel)) if rel else None
        new_current, history, stats = apply_events_to_partition(
            cur, group, epoch, schema, detect_changes=detect_changes)
        frags = []
        if new_current is not None:
            f = lake.stage_fragment(new_current, epoch, pid, salt, "current", compression)
            frags.append(f.__dict__)
        if history.num_rows:
            f = lake.stage_fragment(history, epoch, pid, salt, "history", compression)
            frags.append(f.__dict__)
        rows.append(
            {
                "epoch": epoch, "pid": pid, "salt": salt,
                **{k: stats[k] for k in ("rows_in", "rows_applied", "rows_stale",
                                         "rows_duplicate", "rows_unchanged",
                                         "inserted", "updated",
                                         "deleted", "history_rows")},
                "current_rows": new_current.num_rows if new_current is not None else -1,
                "bytes_written": sum(f["bytes"] for f in frags),
                "changed_repos": stats.get("changed_repos", []),
                "fragments_json": json.dumps(frags),
            }
        )
    return pa.Table.from_pylist(rows, schema=MERGE_RESULT_SCHEMA)


class MergeApplier:
    """Stateful actor-pool stage: merges hash-partitioned event blocks into the
    silver table's (pid, salt) fragments and emits lineage rows.

    ``__init__`` runs once per actor: resolves the committed manifest's
    (pid, salt) → fragment map from a ``ray.put`` broadcast (shipped once, not
    per batch). ``__call__`` runs per block. This is the at-scale exchange
    shape (hash shuffle + actor pool, north_star); for small epochs the driver
    prefers ``make_merge_task_fn`` — identical semantics but stateless tasks on
    warm workers, avoiding per-execution actor spin-up (see EngineConfig
    ``merge_exchange``).
    """

    def __init__(self, table_root: str, frag_map_ref, epoch: int,
                 silver_schema_ser: bytes, max_salt: int, compression: str = "zstd",
                 detect_changes: bool = False):
        import ray

        from maritime_activity_reports_cdc_ray.state.table import LakeTable

        self.lake = LakeTable(table_root)
        self.frag_map = ray.get(frag_map_ref) if not isinstance(frag_map_ref, dict) else frag_map_ref
        self.epoch = epoch
        self.schema = pa.ipc.read_schema(pa.BufferReader(silver_schema_ser))
        self.max_salt = max_salt
        self.compression = compression
        self.detect_changes = detect_changes

    def __call__(self, batch: pa.Table) -> pa.Table:
        return process_gid_groups(batch, self.lake, self.frag_map, self.epoch,
                                  self.schema, self.max_salt, self.compression,
                                  detect_changes=self.detect_changes)


def make_merge_task_fn(table_root: str, frag_map_ref, epoch: int,
                       silver_schema_ser: bytes, max_salt: int, compression: str,
                       detect_changes: bool = False):
    """Task-pool variant of MergeApplier for ``groupby(gid).map_groups`` /
    map_batches over already-partitioned blocks: same kernel, but a plain
    closure so Ray schedules it on prestarted warm workers (no actor startup).
    The broadcast frag_map is fetched per task from the local object store
    (zero-copy plasma read, sub-ms)."""

    def fn(batch: pa.Table) -> pa.Table:
        import ray

        from maritime_activity_reports_cdc_ray.state.table import LakeTable

        frag_map = ray.get(frag_map_ref) if not isinstance(frag_map_ref, dict) else frag_map_ref
        schema = pa.ipc.read_schema(pa.BufferReader(silver_schema_ser))
        return process_gid_groups(batch, LakeTable(table_root), frag_map, epoch,
                                  schema, max_salt, compression,
                                  detect_changes=detect_changes)

    return fn
