"""Key partitioning: pid / path_hash assignment for the merge exchange.

``pid = hash64(repo) % P`` — all keys of a repo land in one silver partition, so
(a) the merge is partition-aligned with storage fragments and (b) the gold
per-repo refresh touches only the partitions owning affected repos (no full
scan; SURVEY.md §7.3). Within a pid, ``salt = path_hash % S_pid`` sub-slices a
hot partition (mega-repo skew — north_rule salted sub-partitioning).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from maritime_activity_reports_cdc_ray.hashing import hash_strings


def make_partitioner(num_partitions: int):
    def assign(batch: pa.Table) -> pa.Table:
        rh = hash_strings(batch.column("repo"))
        ph = hash_strings(batch.column("path"))
        pid = (rh % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("pid", pa.array(pid, pa.int32())).append_column(
            "path_hash", pa.array(ph, pa.uint64())
        )

    return assign


def pid_of_repo(repo: str, num_partitions: int) -> int:
    return int(hash_strings(np.array([repo], dtype=object))[0] % np.uint64(num_partitions))


_PREDICATE_OPS = ("==", "!=", "<", "<=", ">", ">=", "in", "between")


def is_predicate_triple(p) -> bool:
    return (isinstance(p, (tuple, list)) and len(p) == 3
            and isinstance(p[0], str) and p[1] in _PREDICATE_OPS)


def normalize_predicate(predicate) -> list:
    """Accept a single ``(col, op, value)`` triple or a list/tuple of triples
    (implicit AND — the Delta/SQL compound-filter analogue) and return the
    conjunct list. Raises on anything else so a malformed predicate fails at
    the API boundary, not inside a Ray task."""
    if predicate is None:
        return []
    if is_predicate_triple(predicate):
        conj = [tuple(predicate)]
    elif isinstance(predicate, (tuple, list)) and predicate \
            and all(is_predicate_triple(p) for p in predicate):
        conj = [tuple(p) for p in predicate]
    else:
        raise ValueError(
            f"predicate must be a (col, op, value) triple with op in "
            f"{_PREDICATE_OPS} or a non-empty list of such triples (AND), "
            f"got {predicate!r}")
    for col, op, val in conj:
        if op == "in" and any(v is None for v in val):
            # Arrow's isin MATCHES nulls when None is in the value set,
            # unlike SQL IN (NULL) — and fragment skipping assumes no
            # comparison matches null. Refuse at the boundary.
            raise ValueError(
                f"IN list for column {col!r} contains None — null "
                "membership is not expressible as a predicate; filter "
                "nulls after the read instead")
    return conj


def predicate_expression(predicate):
    """Compile a ``(col, op, value)`` triple — or a list of triples, ANDed —
    into a ``pyarrow.dataset`` expression. Passed to the parquet scanner it
    gives row-group statistics pruning plus EXACT row filtering — the reader
    returns precisely the matching rows. ``op`` ∈ {==, !=, <, <=, >, >=, in,
    between}; ``in`` takes an iterable, ``between`` an inclusive ``(lo, hi)``
    pair."""
    conj = normalize_predicate(predicate)
    expr = _triple_expression(conj[0])
    for t in conj[1:]:
        expr = expr & _triple_expression(t)
    return expr


def validate_predicate_columns(predicate, available, table: str) -> None:
    """Fail a predicate that references a column the table doesn't have at
    the API boundary, with the available names — otherwise the missing field
    surfaces as an opaque ``ArrowInvalid`` inside a remote scan task.
    ``available`` is the union of the manifest schema and fragment-stored
    columns; callers skip the check when that set is unknown (legacy
    manifests), keeping validation strictly conservative."""
    avail = set(available)
    missing = [c for c, _op, _v in normalize_predicate(predicate)
               if c not in avail]
    if missing:
        raise ValueError(
            f"predicate references column(s) {sorted(set(missing))} not in "
            f"the {table} table; available: {sorted(avail)}")


def _triple_expression(predicate):
    import pyarrow.dataset as pds

    col, op, val = predicate
    f = pds.field(col)
    if op == "==":
        return f == val
    if op == "!=":
        return f != val
    if op == "<":
        return f < val
    if op == "<=":
        return f <= val
    if op == ">":
        return f > val
    if op == ">=":
        return f >= val
    if op == "in":
        return f.isin(list(val))
    if op == "between":
        lo, hi = val
        return (f >= lo) & (f <= hi)
    raise ValueError(f"unsupported predicate op {op!r} (one of {_PREDICATE_OPS})")


def prune_fragments_by_key(fragments, predicate, num_partitions: int,
                           key_col: str = "repo"):
    """Partition pruning (reference analogue: Delta partition filters — the
    silver/gold tables are hash-partitioned on ``repo``, so an equality / IN
    predicate on the key maps straight to its pid via :func:`pid_of_repo`).
    A point read then opens 1/P of the table's fragment files regardless of
    table size. Compound (AND-list) predicates prune by every key-equality
    conjunct. Any other predicate keeps every fragment — the scanner-level
    :func:`predicate_expression` filter still prunes row groups and rows.
    Fragments with ``pid < 0`` (overwrite refreshes, not key-partitioned)
    are never pruned."""
    out = list(fragments)
    for col, op, val in normalize_predicate(predicate):
        if col != key_col or op not in ("==", "in"):
            continue
        vals = [val] if op == "==" else list(val)
        pids = {pid_of_repo(v, num_partitions) for v in vals}
        out = [f for f in out if f.pid in pids or f.pid < 0]
    return out


def make_gid_assigner(num_partitions: int, salt_by_pid: np.ndarray, max_salt: int):
    """Add the shuffle key ``gid = pid * max_salt + (path_hash % S_pid)``.

    ``salt_by_pid`` is the dense int32 array of per-pid salt counts (>=1) from
    the manifest salt map — small (P entries), closure-captured and shipped
    once per task, not per batch.
    """
    salt_by_pid = np.asarray(salt_by_pid, dtype=np.uint64)
    assert int(salt_by_pid.max(initial=1)) <= max_salt

    def assign(batch: pa.Table) -> pa.Table:
        pid = batch.column("pid").to_numpy(zero_copy_only=False).astype(np.int64)
        ph = batch.column("path_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        s = salt_by_pid[pid]
        salt = (ph % s).astype(np.int64)
        gid = pid * max_salt + salt
        # gkey: bijective scramble of gid (odd-multiplier Knuth hash). The
        # sort/task exchange RANGE-partitions its key — on raw gid a hot pid's
        # salted sub-groups are consecutive values and land back in one output
        # block, resurrecting the straggler that salting just split. Grouping
        # by the scrambled key interleaves groups across blocks; the merge fn
        # still keys on the real gid column inside each group.
        gkey = (gid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)).astype(np.int64)
        return batch.append_column("gid", pa.array(gid, pa.int64())) \
                    .append_column("gkey", pa.array(gkey, pa.int64()))

    return assign
