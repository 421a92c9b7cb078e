"""Deterministic, vectorized hashing used for partitioning and tie-breaks.

Requirements: stable across processes, sessions and machines (crash-resume and
multi-node alignment of ``pid = hash(repo) % P`` depend on it — Python's builtin
``hash`` is salted per process and therefore unusable). We use pandas'
SipHash-1-3 (``pandas.util.hash_array`` with its fixed default key), which is
vectorized over object arrays and documented-stable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def hash_strings(arr: pa.Array | pa.ChunkedArray | np.ndarray) -> np.ndarray:
    """Stable uint64 hash of a string column (vectorized)."""
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = arr.to_numpy(zero_copy_only=False)
    arr = np.asarray(arr, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def combine_hashes(*cols: np.ndarray) -> np.ndarray:
    """Order-dependent combine of uint64 hash columns (boost-style mix)."""
    out = cols[0].copy()
    for c in cols[1:]:
        out ^= c + np.uint64(0x9E3779B97F4A7C15) + (out << np.uint64(6)) + (out >> np.uint64(2))
    return out


def md5_u64(s: str) -> int:
    """First 8 bytes of md5(s), big-endian, as a Python int in [0, 2^64).

    This is the SQL-reproducible 64-bit string hash used wherever a DuckDB
    oracle must recompute the exact same value:
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT`` in DuckDB equals this."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8", "surrogatepass")).digest()[:8], "big")


# the DuckDB expression template matching md5_u64 (format with the column/expr)
MD5_U64_SQL = "('0x' || substr(md5({expr}), 1, 16))::UBIGINT"


def md5_u64_array(strings) -> np.ndarray:
    """Vectorized md5_u64 over an iterable of strings → uint64 array. Only
    DISTINCT values are hashed (token/shingle streams repeat heavily —
    Zipf): a C-level factorize finds the uniques, the Python md5 loop runs
    once per unique, and a C-level take scatters the results back."""
    arr = np.asarray(strings, dtype=object)
    if not len(arr):
        return np.empty(0, dtype=np.uint64)
    import pandas as pd

    codes, uniques = pd.factorize(arr, use_na_sentinel=False)
    uh = np.empty(len(uniques), dtype=np.uint64)
    md5 = hashlib.md5
    for i, s in enumerate(uniques):
        uh[i] = int.from_bytes(
            md5(s.encode("utf-8", "surrogatepass")).digest()[:8], "big")
    return uh[codes]


def sha256_hex(s: str | bytes) -> str:
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return hashlib.sha256(s).hexdigest()


def sha256_column(arr: pa.Array | pa.ChunkedArray) -> list[str | None]:
    """sha256 hex per row. Python loop by necessity (no vectorized sha256 in
    pyarrow); this is CPU-bound crypto that Ray parallelizes across batches."""
    out: list[str | None] = []
    append = out.append
    for v in arr:
        s = v.as_py()
        if s is None:
            append(None)
        else:
            append(hashlib.sha256(s.encode("utf-8", "surrogatepass")).hexdigest())
    return out
