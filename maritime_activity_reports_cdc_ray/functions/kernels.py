"""Tiny shared numpy kernels used across the operator library."""

from __future__ import annotations

import numpy as np


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
