"""CDC metadata stamping — the bronze ingest map stage.

Reference: ``bronze/cdc_ingestion.py:43-48`` adds ``source_system``,
``cdc_timestamp``, ``cdc_sequence_number`` (``monotonically_increasing_id``) and
op metadata. Ours additionally derives the operation from the tombstone
encoding, computes the content identity (sha256 — the per-row invariant) and
sizes. Pure ``map_batches`` function over zero-copy Arrow batches; the sequence
number is a *deterministic* content-derived tie-break (not arrival order) so
LWW ties resolve identically at any parallelism (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from maritime_activity_reports_cdc_ray.config import EngineConfig
from maritime_activity_reports_cdc_ray.hashing import combine_hashes, hash_strings, sha256_column
from maritime_activity_reports_cdc_ray.schemas import TOMBSTONE


def event_time_from_commit(commit: pa.ChunkedArray | pa.Array,
                           sl: tuple[int, int]) -> pa.Array:
    """Parse the zero-padded event-time digits out of ``commit`` (the
    watermark clock). Non-numeric slices (malformed commits — hard-invalid
    downstream anyway) parse as 0 so the cast never throws."""
    digits = pc.utf8_slice_codeunits(pc.fill_null(commit, ""), sl[0], sl[1])
    ok = pc.match_substring_regex(digits, r"^[0-9]+$")
    return pc.cast(pc.if_else(ok, digits, "0"), pa.int64())


def make_stamper(cfg: EngineConfig, epoch: int):
    source_system = cfg.source_system

    def stamp(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        lang = batch.column("lang")
        content = batch.column("content")
        is_tomb = pc.and_kleene(
            pc.equal(content, pa.scalar(TOMBSTONE, pa.large_string())),
            pc.or_kleene(pc.equal(lang, ""), pc.is_null(lang)),
        )
        is_tomb = pc.fill_null(is_tomb, False)
        op = pc.if_else(is_tomb, "delete", "upsert")

        seq = combine_hashes(
            hash_strings(batch.column("repo")),
            hash_strings(batch.column("path")),
            hash_strings(batch.column("commit")),
        )

        shas = sha256_column(content)
        tomb_np = is_tomb.to_numpy(zero_copy_only=False)
        shas = [None if t else s for s, t in zip(shas, tomb_np)]
        nbytes = pc.binary_length(content).cast(pa.int64())
        nbytes = pc.if_else(is_tomb, pa.scalar(0, pa.int64()), pc.fill_null(nbytes, 0))

        out = batch.append_column("cdc_operation", op.cast(pa.string())) \
            .append_column("cdc_sequence_number", pa.array(seq, pa.uint64())) \
            .append_column("source_system", pa.array(np.repeat(source_system, n), pa.string())) \
            .append_column("epoch", pa.array(np.full(n, epoch, dtype=np.int64))) \
            .append_column("content_sha256", pa.array(shas, pa.string())) \
            .append_column("content_bytes", nbytes)
        if cfg.watermark_delay is not None and "event_time" not in batch.column_names:
            # a source that already ships an int64 event_time column wins;
            # otherwise derive it from the commit's zero-padded digits
            out = out.append_column(
                "event_time",
                event_time_from_commit(batch.column("commit"),
                                       cfg.watermark_commit_slice))
        return out

    return stamp
