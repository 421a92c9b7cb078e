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


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
# ---------------------------------------------------------------------------
# Select the raw documents whose hashed-n-gram distribution looks most like a
# TARGET slice (the paper's "select web data that resembles Wikipedia" move;
# here the target is a column predicate, e.g. lang = 'en'). Per-doc log
# importance weight under two bag-of-hashed-ngrams unigram models:
#
#     log w(doc) = Σ_f c_f · (log p̂_target(f) − log p̂_raw(f))
#
# with add-one smoothing over m hash buckets. All arithmetic is integer
# fixed-point (qlog2_fp, scale 2^20) so a SQL oracle replays every score
# bit-for-bit; selection is the deterministic top-k by (score desc, id asc)
# (the ranking variant of the paper's Gumbel resampling — no RNG, resumable).
#
# Scale shape (the reason this fits a 100 TB corpus): the MODEL is two
# m-length int64 count vectors — O(m), constant in corpus size. Pass 1
# computes per-batch bincount partials and the driver reduces ≤ m small rows
# per block (numbers, never text); pass 2 broadcasts the m-length weight
# table inside the batch fn (16 KB at m=2048) and scores each doc in one
# vectorized scatter-add; selection reuses the batch-local-head combiner
# (top-k is a semilattice), so the driver sees ≤ k rows per block.
# Reference analogue: the tiered quality scorer family
# (utils/data_quality.py) — this is its distribution-matching sibling.


def _dsir_buckets(texts: pd.Series, m: int):
    """(row_ordinal, hash_bucket) pairs for every uni+bigram occurrence.

    Tokenize = ``lower().split(' ')`` with empties dropped (the repo-wide
    WordNgramExploder rule); features = md5_u64 of the token and of
    ``w1 || ' ' || w2`` for adjacent pairs, mod ``m``. Distinct-only md5
    hashing (hashing.md5_u64_array) gives the Zipf benefit on both."""
    import numpy as np

    from maritime_activity_reports_cdc_ray.hashing import md5_u64_array

    s = texts.fillna("").str.lower().str.split(" ").reset_index(drop=True)
    ex = s.explode()
    ex = ex[ex.notna() & (ex != "")]
    rows = ex.index.to_numpy(dtype=np.int64)
    toks = ex.to_numpy(dtype=object)
    hu = md5_u64_array(toks)
    if len(rows) > 1:
        adj = rows[:-1] == rows[1:]
        bigs = (pd.Series(toks[:-1][adj], dtype=object) + " "
                + pd.Series(toks[1:][adj], dtype=object)).to_numpy(dtype=object)
        hb = md5_u64_array(bigs)
        rows_b = rows[:-1][adj]
    else:
        hb = np.empty(0, dtype=np.uint64)
        rows_b = np.empty(0, dtype=np.int64)
    rows_all = np.concatenate([rows, rows_b])
    b_all = (np.concatenate([hu, hb]) % np.uint64(m)).astype(np.int64)
    return rows_all, b_all


def dsir_model(tc, rc, m: int):
    """Fixed-point log-weight table from the two bucket-count vectors:
    ``lw_f = (qlog2(tc_f+1) − qlog2(T+m)) − (qlog2(rc_f+1) − qlog2(R+m))``
    — exact int64; SQL mirror is four ``_ql_sql`` terms."""
    import numpy as np

    from maritime_activity_reports_cdc_ray.functions.text import qlog2_fp

    tc = np.asarray(tc, dtype=np.int64)
    rc = np.asarray(rc, dtype=np.int64)
    t_norm = qlog2_fp(int(tc.sum()) + m)
    r_norm = qlog2_fp(int(rc.sum()) + m)
    return (qlog2_fp(tc + 1) - t_norm) - (qlog2_fp(rc + 1) - r_norm)


def dsir_select(ds, id_col: str = "doc_id", text_col: str = "text",
                target_col: str = "lang", target_value: str = "en",
                m: int = 2048, k: int = 50,
                keep_cols: tuple[str, ...] = ("lang", "n_chars")) -> pd.DataFrame:
    """DSIR selection: the ``k`` docs with the highest fixed-point importance
    score toward the target slice (ties by id). Two streaming passes over a
    shared materialized source; docs with zero features are not candidates
    (they have no score under either model). Returns a ≤ k-row DataFrame
    ``(id, *keep_cols, score_fp)``."""
    import numpy as np

    src = ds.materialize()

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"b": pd.Series(dtype="int64"),
                                 "tc": pd.Series(dtype="int64"),
                                 "rc": pd.Series(dtype="int64")})
        rows, b = _dsir_buckets(df[text_col], m)
        tgt = (df[target_col] == target_value).to_numpy()
        rc = np.bincount(b, minlength=m)
        tc = np.bincount(b[tgt[rows]], minlength=m)
        nz = np.nonzero(rc)[0]
        return pd.DataFrame({"b": nz, "tc": tc[nz], "rc": rc[nz]})

    cnt = src.map_batches(partial_counts, batch_format="pandas").to_pandas()
    tc = np.zeros(m, dtype=np.int64)
    rc = np.zeros(m, dtype=np.int64)
    if len(cnt):
        g = cnt.groupby("b", sort=False).sum()
        tc[g.index.to_numpy()] = g["tc"].to_numpy()
        rc[g.index.to_numpy()] = g["rc"].to_numpy()
    lw = dsir_model(tc, rc, m)  # m×8 B — shipped once per task via closure

    def score_head(df: pd.DataFrame) -> pd.DataFrame:
        cols = [id_col, *keep_cols]
        if not len(df):
            return df[cols].assign(score_fp=pd.Series(dtype="int64"))
        rows, b = _dsir_buckets(df[text_col], m)
        s = np.zeros(len(df), dtype=np.int64)
        np.add.at(s, rows, lw[b])
        nf = np.bincount(rows, minlength=len(df))
        out = df[cols].assign(score_fp=s)
        out = out[nf > 0]
        return out.sort_values(["score_fp", id_col],
                               ascending=[False, True]).head(k)

    out = src.map_batches(score_head, batch_format="pandas").to_pandas()
    return (out.sort_values(["score_fp", id_col], ascending=[False, True])
            .head(k).reset_index(drop=True))
