"""Per-fragment zone maps: manifest-level data skipping.

Delta Lake records per-file column min/max/null-count statistics in its
transaction log and prunes files against query predicates before any I/O
("data skipping"; the reference leans on it implicitly via Delta + its
OPTIMIZE/ZORDER maintenance, gold/table_setup.py:95, utils/table_maintenance).
This engine's analogue: :func:`zmap_of_table` computes a compact
``{col: [min, max, null_count]}`` map when a fragment is staged
(``LakeTable.stage_fragment``), the manifest carries it, and
:func:`prune_fragments_by_stats` drops fragments that provably cannot hold a
matching row — on the DRIVER, before a single parquet footer is opened.

This composes with the two existing pruning layers (hash-key partition
pruning in ``stages.partition.prune_fragments_by_key``; parquet row-group
statistics inside the scanner) and is what makes Z-order compaction
(``pipelines.maintenance.compact_table(zorder=True)``) pay off at the
manifest level: clustered fragments get narrow per-fragment ranges on the
cluster columns, so a predicate read opens only the overlapping files.

Safety contract (pinned by a hypothesis differential test): pruning may only
skip a fragment when NO row in it can satisfy the predicate. Every uncertain
case — missing stats, unknown bound, type mismatch, NaN, tz mismatch — keeps
the fragment; the scanner-level exact filter still returns precisely the
matching rows.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.compute as pc

# String bounds longer than this are not stored verbatim. A truncated MIN
# prefix is still a valid lower bound; a truncated MAX is NOT a valid upper
# bound, so it is stored as None (= unbounded above). Delta does the same,
# except it increments the last code point instead of dropping the bound.
ZMAP_MAX_STR = 64

# Columns whose average value width exceeds this many bytes are payload-like
# (e.g. bronze ``content``) — computing and carrying bounds for them costs
# more than it saves, so they get no zone map at all.
ZMAP_MAX_AVG_WIDTH = 256

# Manifest-size bound: only the first N schema columns are indexed (Delta's
# ``dataSkippingNumIndexedCols``, default 32). At ~40 B/bound a 500k-fragment
# 100 TB manifest stays ~tens of MB instead of growing with schema width.
# Skipping a column is always safe — absence means "cannot skip".
ZMAP_NUM_INDEXED_COLS = 32

# Engine-owned uniform-hash columns: ``path_hash`` is a full-range uint64
# shuffle hash (stages/partition.py), so per-fragment min/max bounds span
# nearly the whole domain and never prune; carrying them is pure manifest
# weight. Partition routing prunes these via the dedicated key layer
# (``stages.partition.prune_fragments_by_key``), not zone maps.
ZMAP_EXCLUDE = frozenset({"path_hash"})


def _temporal_to_int(v) -> int:
    """Canonical int64 microseconds for timestamp/date bounds, so stored
    stats and predicate values compare in one domain regardless of the
    column's unit. tz-aware values normalize to UTC micros (matching what
    ``cast(timestamp('us'))`` → int64 yields for a tz-aware column)."""
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            return int(v.timestamp() * 1_000_000)
        return pa.scalar(v, pa.timestamp("us")).value
    if isinstance(v, datetime.date):
        return pa.scalar(
            datetime.datetime(v.year, v.month, v.day), pa.timestamp("us")).value
    raise TypeError(type(v))


def zmap_of_table(t: pa.Table) -> dict:
    """Compute the zone map for a staged fragment: ``{col: [min, max,
    null_count]}`` with JSON-safe bounds (int/float/bool/str/None).
    Temporal columns store int64 UTC microseconds. Columns that can't be
    safely bounded (nested types, NaN-bearing floats, payload-width strings)
    are omitted — absence always means "cannot skip"."""
    zmap: dict = {}
    n = t.num_rows
    for name in t.column_names[:ZMAP_NUM_INDEXED_COLS]:
        if name in ZMAP_EXCLUDE:
            continue
        col = t.column(name)
        typ = col.type
        temporal = pa.types.is_timestamp(typ) or pa.types.is_date(typ)
        if not (pa.types.is_integer(typ) or pa.types.is_floating(typ)
                or pa.types.is_boolean(typ) or temporal
                or pa.types.is_string(typ) or pa.types.is_large_string(typ)):
            continue
        if (pa.types.is_string(typ) or pa.types.is_large_string(typ)) and n:
            if col.nbytes / n > ZMAP_MAX_AVG_WIDTH:
                continue
        nulls = col.null_count
        if nulls == n:
            zmap[name] = [None, None, nulls]
            continue
        if pa.types.is_floating(typ) and pc.any(pc.is_nan(col)).as_py():
            continue  # NaN breaks ordered bounds; don't claim any
        if temporal:
            col = col.cast(pa.timestamp("us")).cast(pa.int64())
        mm = pc.min_max(col)
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
        if isinstance(mn, str) and len(mn) > ZMAP_MAX_STR:
            mn = mn[:ZMAP_MAX_STR]  # prefix is still <= every value
        if isinstance(mx, str) and len(mx) > ZMAP_MAX_STR:
            mx = None  # a prefix is NOT an upper bound
        zmap[name] = [mn, mx, nulls]
    return zmap


def _norm(v):
    """Normalize a predicate value into the stored-bound domain."""
    if isinstance(v, (datetime.datetime, datetime.date)):
        return _temporal_to_int(v)
    return v


def _may_contain(op: str, val, mn, mx) -> bool:
    """True iff a fragment with bounds [mn, mx] (either side None =
    unknown) may hold a row satisfying ``col <op> val``. Conservative:
    any comparison error keeps the fragment."""
    try:
        if op == "==":
            if mn is not None and val < mn:
                return False
            if mx is not None and val > mx:
                return False
            return True
        if op == "!=":
            # only skippable when every non-null value equals val
            return not (mn is not None and mx is not None and mn == mx == val)
        if op == "<":
            return not (mn is not None and mn >= val)
        if op == "<=":
            return not (mn is not None and mn > val)
        if op == ">":
            return not (mx is not None and mx <= val)
        if op == ">=":
            return not (mx is not None and mx < val)
        if op == "in":
            return any(_may_contain("==", v, mn, mx) for v in val)
        if op == "between":
            lo, hi = val
            if mn is not None and mn > hi:
                return False
            if mx is not None and mx < lo:
                return False
            return True
    except TypeError:
        return True
    return True  # unknown op: never prune here (predicate_expression rejects it)


def prune_fragments_by_stats(fragments, predicate):
    """Drop fragments whose zone map proves the predicate can't match.

    Composes after :func:`stages.partition.prune_fragments_by_key`; a
    compound (AND-list) predicate prunes by every conjunct. Fragments from
    manifests written before zone maps existed (``zmap is None``) and
    columns without stats are always kept. An all-null column skips every
    comparison predicate (SQL semantics: NULL satisfies none of ==, !=, <,
    ..., IN, BETWEEN; None inside an IN list is rejected upstream by
    ``normalize_predicate``)."""
    from maritime_activity_reports_cdc_ray.stages.partition import (
        normalize_predicate)

    out = list(fragments)
    for col, op, raw in normalize_predicate(predicate):
        if raw is None:
            continue  # col == None matches nothing; keep (scanner decides)
        if op == "in":
            val = [_norm(v) for v in raw]
        elif op == "between":
            val = (_norm(raw[0]), _norm(raw[1]))
        else:
            val = _norm(raw)
        kept = []
        for f in out:
            zm = getattr(f, "zmap", None)
            if not zm or col not in zm:
                kept.append(f)
                continue
            mn, mx, nulls = zm[col]
            if f.rows > 0 and nulls >= f.rows:
                continue  # all-null column: no comparison predicate matches
            if _may_contain(op, val, mn, mx):
                kept.append(f)
        out = kept
    return out


def zmap_from_footer(md, schema: pa.Schema) -> dict:
    """Fold a parquet footer's row-group statistics into a zone map — for
    fragments whose bytes were written by Ray tasks (e.g.
    ``LakeTable.overwrite`` of a Dataset) where the driver never held the
    table but already reads the footer for row counts. Columns missing
    statistics in any row group are omitted (= cannot skip)."""
    zmap: dict = {}
    names = list(schema.names)[:ZMAP_NUM_INDEXED_COLS]
    typs = {f.name: f.type for f in schema}
    ok = {n for n in names
          if n not in ZMAP_EXCLUDE
          and (pa.types.is_integer(t := typs[n]) or pa.types.is_floating(t)
              or pa.types.is_boolean(t) or pa.types.is_timestamp(t)
              or pa.types.is_date(t) or pa.types.is_string(t)
              or pa.types.is_large_string(t))}
    acc = {n: [None, None, 0] for n in ok}  # [min, max, nulls]
    max_unknown: set = set()  # one truncated row-group max unbounds the column
    pq_names = [md.row_group(0).column(i).path_in_schema
                for i in range(md.num_columns)] if md.num_row_groups else []
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for i, n in enumerate(pq_names):
            if n not in ok:
                continue
            st = g.column(i).statistics
            if st is None or not st.has_min_max:
                ok.discard(n)
                continue
            mn, mx = st.min, st.max
            try:
                if isinstance(mn, (datetime.datetime, datetime.date)):
                    mn, mx = _temporal_to_int(mn), _temporal_to_int(mx)
                if isinstance(mn, bytes):
                    mn, mx = mn.decode(), mx.decode()
                if isinstance(mn, float) and (mn != mn or mx != mx):
                    ok.discard(n)  # NaN bound
                    continue
                if isinstance(mn, str) and len(mn) > ZMAP_MAX_STR:
                    mn = mn[:ZMAP_MAX_STR]
                if isinstance(mx, str) and len(mx) > ZMAP_MAX_STR:
                    max_unknown.add(n)
            except (UnicodeDecodeError, TypeError):
                ok.discard(n)
                continue
            a = acc[n]
            a[2] += st.null_count if st.has_null_count else 0
            if a[0] is None or mn < a[0]:
                a[0] = mn
            if n not in max_unknown and (a[1] is None or mx > a[1]):
                a[1] = mx
    for n in ok:
        zmap[n] = [acc[n][0], None if n in max_unknown else acc[n][1], acc[n][2]]
    return zmap


def column_stats(manifest, kind: str | None = None) -> dict:
    """ANALYZE-style table-level column statistics folded from the
    manifest's fragment zone maps: ``{col: {"min", "max", "null_count",
    "rows_covered"}}``. ``rows_covered`` < the table's row count means some
    fragments predate zone maps (or skipped the column) and the bounds are
    partial — reported, not hidden."""
    agg: dict = {}
    for f in manifest.fragments:
        if kind is not None and f.kind != kind:
            continue
        zm = getattr(f, "zmap", None)
        if not zm:
            continue
        for c, (mn, mx, nulls) in zm.items():
            s = agg.setdefault(c, {"min": None, "max": None, "null_count": 0,
                                   "rows_covered": 0})
            s["null_count"] += nulls
            s["rows_covered"] += f.rows
            if mn is not None and (s["min"] is None or mn < s["min"]):
                s["min"] = mn
            if mx is not None and (s["max"] is None or mx > s["max"]):
                s["max"] = mx
    return agg
