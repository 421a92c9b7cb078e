"""Tiny shared numpy/Arrow kernels used across the operator library."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def group_positions(sorted_keys: np.ndarray):
    """For a SORTED (grouped) key array, return ``(starts, counts, pos)``:
    the start index of each run, each run's length, and every element's
    0-based position within its run. One C-level pass — the shared idiom
    behind token positions, chunk ids and per-group ranks."""
    n = len(sorted_keys)
    if not n:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    starts = np.r_[np.int64(0),
                   np.flatnonzero(sorted_keys[1:] != sorted_keys[:-1]) + 1]
    counts = np.diff(np.r_[starts, np.int64(n)])
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    return starts, counts, pos


def arrow_tokenize(col: pa.Array | pa.ChunkedArray):
    """The house tokenization rule — ``lower().split(' ')`` with empty tokens
    dropped — executed entirely in Arrow (no Python-object string boxing).

    Returns ``(rows, flat)``: an int64 row index per surviving token and the
    flat token StringArray. Bit-identical to the pandas
    ``str.lower().str.split(' ').explode()`` path (same SQL contract:
    ``list_filter(string_split(lower(COALESCE(text,'')), ' '), x -> x <>
    '')``)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.type != pa.string():
        col = col.cast(pa.string())
    la = pc.split_pattern(pc.utf8_lower(pc.fill_null(col, "")), " ")
    flat = la.flatten()
    off = la.offsets.to_numpy()
    rows = np.repeat(np.arange(len(la), dtype=np.int64), np.diff(off))
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not keep.all():
        rows = rows[keep]
        flat = flat.filter(pa.array(keep))
    return rows, flat


def dict_encode_md5(tokens: pa.Array):
    """Dictionary-encode a token array and md5_u64-hash only the UNIQUES
    (token streams are Zipf — the md5 Python loop runs once per distinct
    token, C-level gather scatters the results back). Returns
    ``(hashes_u64, codes, uniq_hashes_u64)``: per-token hash, per-token
    dictionary code (int64) and the per-unique hash table."""
    n = len(tokens)
    if not n:
        z = np.empty(0, dtype=np.uint64)
        return z, np.empty(0, dtype=np.int64), z
    denc = tokens.dictionary_encode()
    codes = denc.indices.to_numpy().astype(np.int64)
    md5 = hashlib.md5
    uh = np.fromiter(
        (int.from_bytes(md5(s.encode("utf-8", "surrogatepass")).digest()[:8],
                        "big") for s in denc.dictionary.to_pylist()),
        dtype=np.uint64, count=len(denc.dictionary))
    return uh[codes], codes, uh


def dataset_to_pandas(ds):
    """``Dataset.to_pandas()`` that survives zero-row datasets.

    Ray 2.49 drops ALL column information when a dataset holds only empty
    blocks — ``to_pandas()`` returns a ``(0, 0)`` frame even though
    ``ds.schema()`` still knows the columns (filtering operators like
    ``adjacent_pairs`` hit this whenever no row qualifies). Rebuild the empty
    frame from the dataset schema instead, so callers can select/sort columns
    of an empty result exactly like a non-empty one."""
    import pandas as pd

    df = ds.to_pandas()
    if len(df.columns):
        return df
    sch = ds.schema()
    if sch is None:
        return df
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        return base.empty_table().to_pandas()
    # PandasBlockSchema: parallel .names / .types (numpy dtypes or classes)
    cols = {}
    for name, typ in zip(base.names, base.types):
        try:
            cols[name] = pd.Series(dtype=typ)
        except (TypeError, ValueError):
            cols[name] = pd.Series(dtype=object)
    return pd.DataFrame(cols)
