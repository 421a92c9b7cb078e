"""Deterministic sampling operators for dataset curation.

A training-data pipeline samples constantly (eval splits, ablation subsets,
per-source caps). At 100 TB a sample must be (a) a pure per-batch filter —
no shuffle, no driver state — and (b) reproducible across reruns and engines,
so it is keyed on a content/id hash rather than an RNG. ``md5_hash_sample``
keeps a row iff the first hex digits of ``md5(str(id))`` fall in a keep-set:
rate = len(keep)/16 per digit, exactly reproducible in any SQL engine
(``substr(md5(CAST(id AS VARCHAR)), 1, 1)``), and stable under repartitioning
because it depends on the row alone.
"""

from __future__ import annotations

import hashlib

import pandas as pd


def md5_hash_sample(ds, id_col: str, keep_hex: tuple[str, ...] = ("0", "1")):
    """Deterministic ~len(keep_hex)/16 sample keyed on ``md5(str(id))[0]``.

    Pure per-batch filter (streams, never shuffles); the md5-per-row loop is
    a C hash call like the stamper's sha256 — the reproducibility contract,
    not an accident of implementation.
    """
    keep = frozenset(keep_hex)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        h = df[id_col].astype(str).map(
            lambda s: hashlib.md5(s.encode()).hexdigest()[0])
        return df[h.isin(keep)]

    return ds.map_batches(f, batch_format="pandas")


def stratified_hash_sample(ds, id_col: str, group_col: str,
                           keep_by_group: dict, default_keep: tuple[str, ...] = ()):
    """Per-group deterministic sampling (source caps / language balancing):
    each group gets its own md5-prefix keep-set, so rates differ per stratum
    while staying a pure per-batch filter with the same SQL-reproducible
    hash rule as :func:`md5_hash_sample`. Groups absent from
    ``keep_by_group`` fall back to ``default_keep`` (empty = dropped)."""
    tables = {g: frozenset(k) for g, k in keep_by_group.items()}
    default = frozenset(default_keep)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        h = df[id_col].astype(str).map(
            lambda s: hashlib.md5(s.encode()).hexdigest()[0])
        g = df[group_col]
        keep = h.isin(default) & ~g.isin(list(tables))  # fallback stratum
        for grp, ks in tables.items():  # one vectorized mask per stratum
            keep |= (g == grp) & h.isin(ks)
        return df[keep]

    return ds.map_batches(f, batch_format="pandas")


def temperature_hash_sample(ds, id_col: str, group_col: str):
    """Temperature-balanced down-sampling at α = 0.5 (the multilingual
    rebalancing rule of mBERT/XLM-R-style corpus curation: keep probability
    ∝ N_g^(α-1), so over-represented groups are thinned toward the smallest
    group). With α = 0.5 the per-group keep rate is √(N_min / N_g) — done in
    PURE INTEGER arithmetic so any SQL engine reproduces the selection
    bit-for-bit: keep a row iff ``md5_u64(str(id)) % N_g < isqrt(N_g·N_min)``
    (the keep count per group is exactly its rate times N_g, rounded down to
    the integer square root — no float pow/sqrt whose last ulp could differ
    across libms).

    Shape: one tiny count-per-group pass (per-batch ``value_counts``
    combiner; the driver reduces G rows, never the corpus), then a pure
    per-batch filter with the broadcast {group: (N_g, K_g)} table — no
    shuffle, stable under repartitioning."""
    import math

    import numpy as np

    from maritime_activity_reports_cdc_ray.hashing import md5_u64_array

    counts = (ds.map_batches(
        lambda df: df[group_col].value_counts().rename_axis(group_col)
        .reset_index(name="n"),
        batch_format="pandas",
    ).to_pandas().groupby(group_col)["n"].sum())
    n_min = int(counts.min())
    table = {g: (int(n), math.isqrt(int(n) * n_min)) for g, n in counts.items()}

    def f(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        h = md5_u64_array(df[id_col].astype(str).to_numpy(dtype=object))
        ng = np.empty(len(df), dtype=np.uint64)
        kg = np.empty(len(df), dtype=np.uint64)
        for g, (n, k) in table.items():
            m = (df[group_col] == g).to_numpy()
            ng[m], kg[m] = n, k
        return df[(h % ng) < kg]

    return ds.map_batches(f, batch_format="pandas")


def weighted_priority_sample(ds, id_col: str, weight_col: str, k: int = 20):
    """Deterministic weighted sample WITHOUT replacement: keep the ``k``
    rows with the smallest integer priority ``md5_u64(str(id)) // weight``
    (ties by id). A heavier row divides its uniform 64-bit hash by a larger
    weight, so it wins proportionally more often — the hash-keyed analogue
    of the Efraimidis-Spirakis exponential race, done in PURE INTEGER
    arithmetic so any SQL engine reproduces it bit-for-bit (float ln()/pow()
    orderings can differ in the last ulp across libms; integer division
    cannot).

    Shape: per-batch priority + local smallest-``k`` (top-k is a semilattice,
    so the batch-local head is a correct combiner) — the driver sees at most
    ``k`` rows per block, never the corpus. Non-positive weights are clamped
    to 1."""
    import numpy as np

    from maritime_activity_reports_cdc_ray.hashing import md5_u64_array

    def local_head(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(_q=pd.Series(dtype="uint64"))
        h = md5_u64_array(df[id_col].astype(str).to_numpy(dtype=object))
        w = np.maximum(df[weight_col].to_numpy(), 1).astype(np.uint64)
        df = df.assign(_q=h // w)
        return df.sort_values(["_q", id_col]).head(k)

    out = ds.map_batches(local_head, batch_format="pandas").to_pandas()
    return (out.sort_values(["_q", id_col]).head(k)
            .drop(columns=["_q"]).reset_index(drop=True))


def shuffle_head(ds, id_col: str, k: int = 20):
    """Deterministic corpus shuffle, head-``k``: global training order =
    ascending ``(md5_u64(str(id)), id)`` — the no-RNG analogue of a seeded
    ``random_shuffle`` (reproducible across engines AND resumable: the order
    is a pure function of ids, so a restarted run continues at the same
    permutation). Same combiner shape as weighted_priority_sample: batch-
    local smallest-``k``, driver reduces ≤ k rows per block."""
    from maritime_activity_reports_cdc_ray.hashing import md5_u64_array

    def local_head(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(_q=pd.Series(dtype="uint64"))
        h = md5_u64_array(df[id_col].astype(str).to_numpy(dtype=object))
        df = df.assign(_q=h)
        return df.sort_values(["_q", id_col]).head(k)

    out = ds.map_batches(local_head, batch_format="pandas").to_pandas()
    return (out.sort_values(["_q", id_col]).head(k)
            .drop(columns=["_q"]).reset_index(drop=True))
