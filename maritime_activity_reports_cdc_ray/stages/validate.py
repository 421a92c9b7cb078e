"""Validation + tiered quality scoring — vectorized Arrow compute, no row loops.

Reference semantics: hard validity filters (``bronze/cdc_ingestion.py:141-145``:
null key / out-of-range coords dropped) and the tiered quality scorer
(``utils/data_quality.py:20-99``: boolean flags folded into a score in
{1.0, 0.8, 0.6, 0.4, 0.0} + EXCELLENT/GOOD/FAIR/POOR/INVALID category; IMO
regex ``rlike("^[0-9]{7}$")`` → our commit regex).

Generic translation: hard-invalid = null/empty ``repo``/``path``, malformed
``commit``, null ``content``; soft flags = oversized content, unknown ``lang``.
Hard-invalid rows are dropped (counted); soft issues only lower the score.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from maritime_activity_reports_cdc_ray.config import EngineConfig


def quality_columns(batch: pa.Table, cfg: EngineConfig) -> tuple[pa.Table, "pa.BooleanArray"]:
    """Append data_quality_score + quality_category; return (table, hard_valid mask)."""
    repo, path, commit = batch.column("repo"), batch.column("path"), batch.column("commit")
    content, lang = batch.column("content"), batch.column("lang")
    is_tomb = pc.equal(batch.column("cdc_operation"), "delete")

    def nonempty(col):
        return pc.and_(pc.is_valid(col), pc.not_equal(pc.fill_null(col, ""), ""))

    valid_key = pc.and_(nonempty(repo), nonempty(path))
    valid_commit = pc.match_substring_regex(pc.fill_null(commit, ""), cfg.commit_regex)
    has_content = pc.or_(pc.is_valid(content), is_tomb)
    hard_valid = pc.and_(pc.and_(valid_key, valid_commit), has_content)

    reasonable_size = pc.less_equal(batch.column("content_bytes"), cfg.max_content_bytes)
    lang_ok = pc.or_(pc.is_in(pc.fill_null(lang, ""), value_set=pa.array(cfg.known_langs)), is_tomb)

    soft_fails = pc.add(
        pc.cast(pc.invert(pc.fill_null(reasonable_size, False)), pa.int32()),
        pc.cast(pc.invert(pc.fill_null(lang_ok, False)), pa.int32()),
    )
    # tier ladder (reference: nested CASE/WHEN at utils/data_quality.py:60-99)
    score = pc.if_else(
        pc.invert(hard_valid),
        pa.scalar(0.0),
        pc.if_else(
            pc.equal(soft_fails, 0),
            pa.scalar(1.0),
            pc.if_else(pc.equal(soft_fails, 1), pa.scalar(0.8), pa.scalar(0.6)),
        ),
    )
    category = pc.if_else(
        pc.invert(hard_valid),
        pa.scalar("INVALID"),
        pc.if_else(
            pc.equal(score, 1.0),
            pa.scalar("EXCELLENT"),
            pc.if_else(pc.equal(score, 0.8), pa.scalar("GOOD"), pa.scalar("FAIR")),
        ),
    )
    out = batch.append_column("data_quality_score", score).append_column(
        "quality_category", category.cast(pa.string())
    )
    return out, hard_valid


def reject_reasons(batch: pa.Table, cfg: EngineConfig) -> pa.Array:
    """First-match reject reason per row (for quarantined rows): null_key →
    bad_commit → null_content → low_quality. Vectorized if_else ladder —
    called only on the (small) rejected subset, never the hot path."""
    repo, path, commit = batch.column("repo"), batch.column("path"), batch.column("commit")
    content = batch.column("content")
    is_tomb = pc.equal(batch.column("cdc_operation"), "delete")

    def nonempty(col):
        return pc.and_(pc.is_valid(col), pc.not_equal(pc.fill_null(col, ""), ""))

    bad_key = pc.invert(pc.and_(nonempty(repo), nonempty(path)))
    bad_commit = pc.invert(
        pc.match_substring_regex(pc.fill_null(commit, ""), cfg.commit_regex))
    no_content = pc.invert(pc.or_(pc.is_valid(content), is_tomb))
    return pc.if_else(
        bad_key, pa.scalar("null_key"),
        pc.if_else(bad_commit, pa.scalar("bad_commit"),
                   pc.if_else(no_content, pa.scalar("null_content"),
                              pa.scalar("low_quality")))).cast(pa.string())


class ConstraintViolation(ValueError):
    """A policy='fail' CHECK constraint was violated — raised inside the map
    phase, so the epoch aborts BEFORE any manifest commit and a rerun after
    repair converges exactly-once."""


def _constraint_mask(batch: pa.Table, col: str, op: str, value) -> pa.Array:
    """True where the row SATISFIES the constraint. SQL CHECK null
    semantics: a NULL operand satisfies every op except not_null (matching
    Delta CHECK constraints), so fill_null(True) on comparisons."""
    c = batch.column(col)
    if op == "not_null":
        return pc.is_valid(c)
    if op == "matches":
        return pc.fill_null(
            pc.match_substring_regex(c.cast(pa.string()), value), True)
    if op == "in":
        # pc.is_in returns false (not null) for null inputs — OR with
        # is_null to keep the documented NULL-satisfies semantics
        vs = pa.array(list(value)).cast(c.type)
        return pc.or_(pc.is_in(c, value_set=vs), pc.is_null(c))
    cmp = {"==": pc.equal, "!=": pc.not_equal, ">": pc.greater,
           ">=": pc.greater_equal, "<": pc.less, "<=": pc.less_equal}[op]
    return pc.fill_null(cmp(c, pa.scalar(value).cast(c.type)), True)


def make_validator(cfg: EngineConfig, quarantine_dir: str | None = None,
                   watermark_floor: int | None = None):
    """map_batches fn: score, then drop hard-invalid rows and rows under the
    quality threshold (reference: filter_by_quality, utils/data_quality.py:255-278).

    ``watermark_floor``: the event-time watermark for this epoch (the max
    event time over PREVIOUSLY committed epochs minus
    ``cfg.watermark_delay`` — Spark's ``withWatermark`` update rule, where
    the current trigger's own rows never tighten their own bound). Rows with
    ``event_time < floor`` are dropped as LATE before any quality check.

    With ``quarantine_dir`` set (cfg.quarantine_rejects), dropped rows are
    persisted there as parquet — scored, stamped with ``reject_reason``
    (late rows get reason="late") — the dead-letter table. Crash/rerun-safe
    because the caller clears the epoch's quarantine dir before the map phase
    starts (same discipline as the bronze fragment dir): a remap rewrites,
    never duplicates."""

    def validate(batch: pa.Table) -> pa.Table:
        scored, hard_valid = quality_columns(batch, cfg)
        keep = hard_valid
        if cfg.min_quality_score > 0.0:
            keep = pc.and_(keep, pc.greater_equal(scored.column("data_quality_score"), cfg.min_quality_score))
        qual_keep = keep  # quality-only keep, for reject-reason precedence
        late = None
        if watermark_floor is not None and "event_time" in scored.column_names:
            # null event_time is NOT late (fill_null(False)): the comparison
            # yields null, and a null mask entry would silently drop the row
            # in scored.filter(keep) even when every quality check passed.
            late = pc.fill_null(
                pc.less(scored.column("event_time"), watermark_floor), False)
            keep = pc.and_(keep, pc.invert(late))
        failed_checks: list[tuple[str, pa.Array]] = []  # (name, violated mask)
        for name, col, opn, val, policy in cfg.check_constraints:
            ok = _constraint_mask(scored, col, opn, val)
            if policy == "fail":
                # Delta write-time semantics: only rows that would actually
                # LAND can poison the epoch — a hard-invalid / late / below-
                # threshold row that validation drops anyway must not abort
                bad = pc.sum(pc.cast(
                    pc.and_(pc.invert(ok), pc.fill_null(keep, False)),
                    pa.int64())).as_py() or 0
                if bad:
                    raise ConstraintViolation(
                        f"CHECK constraint '{name}' ({col} {opn} {val!r}) "
                        f"violated by {bad} row(s); epoch aborted before "
                        f"commit")
            else:
                failed_checks.append((name, pc.invert(ok)))
                keep = pc.and_(keep, ok)
        if quarantine_dir is not None:
            rej_mask = pc.invert(pc.fill_null(keep, False))
            rej = scored.filter(rej_mask)
            if rej.num_rows:
                import os
                import uuid

                import pyarrow.parquet as _pq

                reasons = reject_reasons(rej, cfg)
                if failed_checks:
                    # quality reasons take precedence; rows that PASSED the
                    # quality gate but failed a check get "check:<name>"
                    # (first declared constraint wins → apply in reverse)
                    qok = pc.fill_null(qual_keep, False).filter(rej_mask)
                    for cname, viol in reversed(failed_checks):
                        reasons = pc.if_else(
                            pc.and_(qok, pc.fill_null(viol, False)
                                    .filter(rej_mask)),
                            pa.scalar("check:" + cname), reasons
                        ).cast(pa.string())
                if late is not None:
                    reasons = pc.if_else(
                        pc.fill_null(late, False).filter(rej_mask),
                        pa.scalar("late"), reasons).cast(pa.string())
                rej = rej.append_column("reject_reason", reasons)
                os.makedirs(quarantine_dir, exist_ok=True)
                _pq.write_table(
                    rej, os.path.join(quarantine_dir, f"rej-{uuid.uuid4().hex}.parquet"),
                    compression=cfg.write_compression)
        return scored.filter(keep)

    return validate


class MetadataScorer:
    """M4: the metadata-table quality variant of the scorer (reference
    ``utils/data_quality.py`` — the same tier ladder applied to reference/dim
    tables via weighted completeness+validity checks instead of content
    flags; SURVEY.md §2.2 M4).

    ``checks``: list of ``(Rule, weight)`` — each Rule (the declarative ops
    from :mod:`..stages.enrich`) marks a row as passing its check;
    ``score = Σ weight·pass / Σ weight``. Tier ladder: ≥0.9 EXCELLENT,
    ≥0.7 GOOD, ≥0.5 FAIR, else POOR (the content scorer's tiers with the
    INVALID branch folded into POOR — metadata rows are never dropped).

    A ``map_batches``-callable (pandas format); masks compile to one
    vectorized pass per check, no per-row Python.
    """

    def __init__(self, checks, score_col: str = "metadata_quality_score",
                 category_col: str = "metadata_quality_category"):
        from maritime_activity_reports_cdc_ray.stages.enrich import CaseLadder

        self.checks = list(checks)
        self.score_col = score_col
        self.category_col = category_col
        self._ladder = CaseLadder("_", [], None)  # mask evaluator only

    def __call__(self, df):
        import numpy as np

        total = float(sum(w for _r, w in self.checks)) or 1.0
        acc = np.zeros(len(df), dtype=np.float64)
        for rule, w in self.checks:
            acc += float(w) * self._ladder._mask(df, rule).astype(np.float64)
        score = acc / total
        cat = np.select([score >= 0.9, score >= 0.7, score >= 0.5],
                        ["EXCELLENT", "GOOD", "FAIR"], default="POOR")
        out = df.copy()
        out[self.score_col] = score
        out[self.category_col] = cat
        return out
