"""pyarrow schema constants for every table the engine owns.

The reference declares fixed SQL DDL per table (``bronze/table_setup.py:38-178``,
``silver/table_setup.py:39-272``, ``gold/table_setup.py:40-360``); ours are
explicit ``pyarrow.Schema`` objects. The change-event input shape is mandated by
/root/repo/BASELINE.json ``input_hint``:
``(repo: string, path: string, commit: string, lang: string, content: string)``.
"""

from __future__ import annotations

import pyarrow as pa

# Tombstone encoding (FIXTURES.md §1): a delete of (repo, path) is a row with
# content == TOMBSTONE and lang == "".
TOMBSTONE = "__TOMBSTONE__"

# ---------------------------------------------------------------------------
# input: the raw change stream
# ---------------------------------------------------------------------------
EVENT_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
    ]
)

# ---------------------------------------------------------------------------
# bronze: append-only stamped + validated change log
# (reference: bronze/table_setup.py:64-80 — payload + CDC metadata columns)
# ---------------------------------------------------------------------------
BRONZE_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
        # CDC metadata (reference: bronze/cdc_ingestion.py:43-48)
        ("cdc_operation", pa.string()),  # "upsert" | "delete"
        ("cdc_sequence_number", pa.uint64()),  # deterministic tie-break
        ("source_system", pa.string()),
        ("epoch", pa.int64()),
        # content identity (the per-row invariant: sha256(content))
        ("content_sha256", pa.string()),
        ("content_bytes", pa.int64()),
        # quality (reference: utils/data_quality.py:20-99)
        ("data_quality_score", pa.float64()),
        ("quality_category", pa.string()),
        # partitioning
        ("pid", pa.int32()),
        ("path_hash", pa.uint64()),
    ]
)

# ---------------------------------------------------------------------------
# silver: current state — one row per (repo, path) key ever seen
# (reference: silver merge targets, silver/cdf_processor.py:255-332; SCD2
#  current-row flags bronze/table_setup.py:113-116)
# ---------------------------------------------------------------------------
SILVER_CURRENT_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),  # last applied commit (incl. tombstone commit)
        ("lang", pa.string()),  # null when deleted
        # Content is NOT stored in silver: bronze (the durable log) already
        # holds every event's payload exactly once, so the current row keeps
        # only a pointer — the epoch whose bronze fragments contain the
        # winning event. Merges therefore never read or write content bytes
        # (~80% of row bytes, measured), and ``read_silver`` reconstructs a
        # virtual ``content`` column by joining (repo, path, commit,
        # content_epoch) against the pointed-to bronze epochs on demand.
        ("content_epoch", pa.int64()),
        ("content_sha256", pa.string()),  # null when deleted
        ("content_bytes", pa.int64()),  # 0 when deleted
        ("is_deleted", pa.bool_()),
        ("ever_deleted", pa.bool_()),
        ("version_count", pa.int64()),  # SCD2 versions created (closed + open)
        ("valid_from_commit", pa.string()),  # commit that created the open version
        ("data_quality_score", pa.float64()),
        ("last_epoch", pa.int64()),
        ("path_hash", pa.uint64()),
    ]
)

# silver history: one row per *closed* SCD2 version
# (reference: close-old-row branch of the SCD2 merges,
#  bronze/cdc_ingestion.py:176-217, silver/cdf_processor.py:277-332).
# Content itself is not duplicated into history (sha only) to bound storage —
# a deliberate divergence from the reference, documented in SURVEY.md §7.4.
SILVER_HISTORY_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),  # the closed version's commit
        ("lang", pa.string()),
        ("content_sha256", pa.string()),
        ("valid_from_commit", pa.string()),
        ("valid_to_commit", pa.string()),  # commit of the event that closed it
        ("closed_by_op", pa.string()),  # "update" | "delete"
        ("epoch", pa.int64()),
    ]
)

# ---------------------------------------------------------------------------
# gold: per-repo aggregate (FIXTURES.md §4; reference analogue G6-G8 / A5-A7,
# gold/cdf_processor.py:229-427, gold/materialized_views.py:41-136)
# ---------------------------------------------------------------------------
GOLD_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("file_count", pa.int64()),  # live (non-deleted) paths
        ("latest_commit", pa.string()),  # max commit over live rows ('' if none)
        ("total_bytes", pa.int64()),  # sum of len(content) over live rows
        ("lang_counts", pa.list_(pa.struct([("lang", pa.string()), ("n", pa.int64())]))),
        ("deleted_count", pa.int64()),  # keys ever tombstoned
        ("total_versions", pa.int64()),  # sum of version_count over all keys
        ("repo_sha256", pa.string()),  # sha256 over sorted (path, content_sha256)
        ("last_epoch", pa.int64()),
        ("pid", pa.int32()),
    ]
)

# lineage record emitted per (pid, salt) merge group per epoch
# (reference analogue: per-stream progress metrics, silver/cdf_processor.py:334-349)
LINEAGE_SCHEMA = pa.schema(
    [
        ("epoch", pa.int64()),
        ("pid", pa.int32()),
        ("salt", pa.int32()),
        ("rows_in", pa.int64()),
        ("rows_applied", pa.int64()),
        ("rows_stale", pa.int64()),
        ("rows_duplicate", pa.int64()),
        ("rows_unchanged", pa.int64()),
        ("inserted", pa.int64()),
        ("updated", pa.int64()),
        ("deleted", pa.int64()),
        ("history_rows", pa.int64()),
        ("current_rows", pa.int64()),
        ("bytes_written", pa.int64()),
        ("changed_repos", pa.list_(pa.string())),
    ]
)
