"""Similarity search over an embedding column (``list<float>``).

- ``knn_brute_force``: exact cosine top-k. The query matrix is broadcast once
  (``ray.put``); each batch computes a float64 matmul against it and emits its
  local top-k candidates (one small row set per batch — the combiner), then a
  single per-query reduce picks the global top-k. The shuffle moves candidate
  rows, never embeddings.
- ``knn_lsh``: the scale path — random-hyperplane LSH buckets; queries probe
  only matching buckets (approximate; recall grows with n_tables).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _fetch_queries(ds, query_ids, id_col: str) -> pd.DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    ids = pa.array(list(query_ids))
    qdf = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column(id_col), value_set=ids)),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()
    if len(qdf) == 0:
        raise ValueError(f"none of query_ids {list(query_ids)!r} present in column {id_col!r}")
    return qdf


def _to_matrix(col) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col], dtype=np.float64)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _batch_topk(df: pd.DataFrame, *, qref, k: int, id_col: str, vec_col: str,
                exclude_self: bool) -> pd.DataFrame:
    """map_batches combiner: local cosine top-k per query against one batch.

    A plain task fn, not an actor: the broadcast query matrix comes out of the
    object store zero-copy via ``ray.get`` per call, so there is no per-query
    actor-pool spin-up cost (~1-2 s each) and the stage runs on warm workers."""
    import ray

    qids, qmat = ray.get(qref) if not isinstance(qref, tuple) else qref
    qmat = _normalize_rows(np.asarray(qmat, dtype=np.float64))
    if not len(df):
        return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                             "neighbor_id": pd.Series(dtype="int64"),
                             "sim": pd.Series(dtype="float64")})
    ids = df[id_col].to_numpy()
    m = _normalize_rows(_to_matrix(df[vec_col]))
    sims = qmat @ m.T  # (nq, nb) float64
    out_q, out_n, out_s = [], [], []
    k = min(k, sims.shape[1])
    for qi, qid in enumerate(qids):
        row = sims[qi]
        if exclude_self:
            row = np.where(ids == qid, -np.inf, row)
        top = np.argpartition(-row, k - 1)[:k] if k < len(row) else np.arange(len(row))
        out_q.extend([qid] * len(top))
        out_n.extend(ids[top])
        out_s.extend(row[top])
    return pd.DataFrame({"query_id": np.asarray(out_q, dtype="int64"),
                         "neighbor_id": np.asarray(out_n, dtype="int64"),
                         "sim": np.asarray(out_s, dtype="float64")})


def knn_brute_force(ds, query_ids: list[int], k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    exclude_self: bool = True, round_decimals: int | None = 6):
    """Exact cosine top-k of each query vector against the whole dataset.

    Returns a Dataset of (query_id, neighbor_id, rank, sim). Ranking ties are
    broken by neighbor_id after optional rounding of sim (rounding makes the
    ranking robust to float summation-order differences vs a SQL oracle)."""
    import ray

    qdf = _fetch_queries(ds, query_ids, id_col)
    qdf = qdf.sort_values(id_col)
    queries = (qdf[id_col].to_numpy(), _to_matrix(qdf[vec_col]))
    qref = ray.put(queries)

    cand = ds.map_batches(
        _batch_topk,
        fn_kwargs={"qref": qref, "k": k, "id_col": id_col, "vec_col": vec_col,
                   "exclude_self": exclude_self},
        batch_format="pandas",
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        if round_decimals is not None:
            g["sim"] = _round_half_away(g["sim"].to_numpy(), round_decimals)
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="mergesort")
        g = g.head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g

    return cand.groupby("query_id").map_groups(final, batch_format="pandas")


_EMPTY_PAIRS = {"id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "sim": pd.Series(dtype="float64")}


def cosine_dupes(ds, threshold: float, id_col: str = "vec_id",
                 vec_col: str = "embedding", round_decimals: int = 6,
                 n_blocks: int = 8):
    """Exact embedding-cosine near-dup pairs: every (id_a < id_b) with
    cosine ≥ threshold.

    Block-partitioned pair scan: the dataset is repartitioned into
    ``n_blocks`` blocks that stay in the object store; one Ray task per
    unordered block pair (i ≤ j) pulls exactly two blocks (zero-copy) and does
    one float64 matmul. Compute is the exact O(n²) floor, but memory per task
    is two blocks and NOTHING is materialized on the driver or broadcast
    whole — the all-pairs structure lives in the task graph, not in a
    replicated matrix. Size ``n_blocks`` so a block (n/n_blocks × d floats)
    fits a worker's heap; task count grows as n_blocks²/2.

    The probabilistic scale path for much larger n is LSH bucketing + exact
    verify (:class:`LshBucketer`, ``functions.dedup.simhash_candidates``)."""
    import ray
    import ray.data as rd

    packed = (ds.select_columns([id_col, vec_col])
              .repartition(n_blocks).materialize())
    refs = packed.to_pandas_refs()

    @ray.remote
    def cross(df_a: pd.DataFrame, df_b: pd.DataFrame, same: bool) -> pd.DataFrame:
        if not len(df_a) or not len(df_b):
            return pd.DataFrame(_EMPTY_PAIRS)
        ids_a = df_a[id_col].to_numpy(dtype="int64")
        ids_b = df_b[id_col].to_numpy(dtype="int64")
        ma = _normalize_rows(_to_matrix(df_a[vec_col]))
        mb = ma if same else _normalize_rows(_to_matrix(df_b[vec_col]))
        sims = ma @ mb.T
        # each unordered pair appears once per (block_i, block_j) task; emit
        # with id_a = min, id_b = max (same-block: strict upper triangle)
        mask = (sims >= threshold) & (ids_a[:, None] != ids_b[None, :])
        if same:
            mask &= ids_a[:, None] < ids_b[None, :]
        r, c = np.nonzero(mask)
        a, b = ids_a[r], ids_b[c]
        sw = a > b
        a, b = np.where(sw, b, a), np.where(sw, a, b)
        sim = sims[r, c]
        if round_decimals is not None:
            sim = _round_half_away(sim, round_decimals)
        return pd.DataFrame({"id_a": a, "id_b": b, "sim": sim})

    outs = [cross.remote(refs[i], refs[j], i == j)
            for i in range(len(refs)) for j in range(i, len(refs))]
    return rd.from_pandas_refs(outs)


def _kmeans(sample: np.ndarray, k: int, iters: int = 10, seed: int = 11) -> np.ndarray:
    """Small Lloyd's k-means on a driver-side sample (the coarse quantizer is
    tiny state — k×d floats — broadcast to every task)."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def knn_ivf(ds, query_ids: list[int], k: int = 10, n_lists: int = 16,
            nprobe: int = 4, sample_rows: int = 2048, seed: int = 11,
            id_col: str = "vec_id", vec_col: str = "embedding",
            centroid_id_stride: int | None = None,
            round_decimals: int | None = 6):
    """IVF-style approximate top-k: a coarse quantizer buckets vectors into
    ``n_lists`` inverted lists; each query scores only its ``nprobe`` nearest
    lists (squared-L2 assignment, smallest-index tie-break).

    Quantizer: k-means on a driver-side sample by default, or — when
    ``centroid_id_stride`` is set — the vectors whose id ≡ 0 (mod stride),
    ordered by id, first ``n_lists`` (a deterministic data-derived quantizer
    a SQL oracle can select with ``WHERE vec_id % stride = 0 ORDER BY vec_id
    LIMIT n_lists``; quantization quality ≈ random-sample centroids).

    Scale shape: one pass assigns list ids (task fn, broadcast centroids);
    per-batch scoring emits local top-k only for (query, list) matches; a
    per-query reduce finishes. Compute ∝ nprobe/n_lists of brute force."""
    import ray

    if centroid_id_stride is not None:
        # bounded seed selection shared with kmeans_fit (and both SQL
        # oracles): the id-window caps the driver collect at n_lists rows
        # even when the corpus has billions of ids
        cent = _stride_centroids(ds, id_col, vec_col,
                                 int(centroid_id_stride), n_lists)
    else:
        sample = ds.limit(sample_rows).to_pandas()
        cent = _kmeans(_to_matrix(sample[vec_col]), n_lists, seed=seed)
    qdf = _fetch_queries(ds, query_ids, id_col).sort_values(id_col)
    qm = _to_matrix(qdf[vec_col])
    # nprobe nearest centroids per query
    qd = ((qm[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd, axis=1)[:, :nprobe]
    wanted: dict[int, list[int]] = {}
    for qi, qid in enumerate(qdf[id_col].to_numpy()):
        for c in probes[qi]:
            wanted.setdefault(int(c), []).append(int(qid))
    ref = ray.put((cent, wanted,
                   dict(zip(qdf[id_col].astype(int),
                            [np.asarray(v, np.float64) for v in qdf[vec_col]]))))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        cent2, wanted2, qvecs = ray.get(ref)
        if not len(df):
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "neighbor_id": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        m = _to_matrix(df[vec_col])
        d = ((m[:, None, :] - cent2[None, :, :]) ** 2).sum(axis=2)
        lists = d.argmin(axis=1)
        ids = df[id_col].to_numpy(dtype="int64")
        mn = _normalize_rows(m)
        out_q, out_n, out_s = [], [], []
        for c in np.unique(lists):
            qids = wanted2.get(int(c))
            if not qids:
                continue
            sel = lists == c
            sub_ids, sub = ids[sel], mn[sel]
            qm2 = np.stack([qvecs[q] for q in qids])
            qm2 = _normalize_rows(qm2)
            sims = qm2 @ sub.T  # (nq, nsub) — one matmul per probed list
            for qi, qid in enumerate(qids):
                keep = sub_ids != qid
                out_q.append(np.full(keep.sum(), qid, dtype="int64"))
                out_n.append(sub_ids[keep])
                out_s.append(sims[qi][keep])
        if not out_q:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "neighbor_id": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        return pd.DataFrame({"query_id": np.concatenate(out_q),
                             "neighbor_id": np.concatenate(out_n),
                             "sim": np.concatenate(out_s).astype("float64")})

    cand = ds.map_batches(score, batch_format="pandas")
    return cand.groupby("query_id").map_groups(
        _make_final(k, round_decimals), batch_format="pandas")


def _make_final(k: int, round_decimals: int | None, dedupe: bool = False):
    """Per-query reduce: optional half-away-from-zero rounding (matches SQL
    ROUND, making ranking robust to float summation-order diffs vs an
    oracle), stable (sim DESC, neighbor_id ASC) sort, top-k, 1-based rank."""

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        if round_decimals is not None:
            g["sim"] = _round_half_away(g["sim"].to_numpy(), round_decimals)
        if dedupe:
            g = g.drop_duplicates("neighbor_id")
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g

    return final


class LshBucketer:
    """Random-hyperplane LSH: vec → one bucket id per table (actor pool; the
    hyperplanes are generated once per actor from the shared seed)."""

    def __init__(self, dim: int, n_planes: int = 8, n_tables: int = 4, seed: int = 13,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, n_planes, dim))
        self.id_col, self.vec_col = id_col, vec_col

    def bucket(self, m: np.ndarray) -> np.ndarray:
        # (T, B) bucket codes per row → (n, T)
        proj = np.einsum("tpd,nd->ntp", self.planes, m) > 0
        codes = (proj.astype(np.uint64) << np.arange(proj.shape[2], dtype=np.uint64)).sum(axis=2)
        return codes

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        """Emit (id, table_id, bucket) rows ONLY — bucket ids, never vectors.
        Downstream stages that need the vectors gather them by id; replicating
        the embedding column ×n_tables through the shuffle is the scale bug
        this stage used to have."""
        m = _to_matrix(df[self.vec_col])
        codes = self.bucket(m)
        n, t = codes.shape
        return pd.DataFrame({
            self.id_col: np.repeat(df[self.id_col].to_numpy(), t),
            "table_id": np.tile(np.arange(t, dtype="int64"), n),
            "bucket": codes.reshape(-1).astype("int64"),
        })


def knn_lsh(ds, query_ids: list[int], k: int = 10, dim: int = 64,
            n_planes: int = 8, n_tables: int = 4, seed: int = 13,
            id_col: str = "vec_id", vec_col: str = "embedding",
            round_decimals: int | None = 6):
    """Approximate top-k: only vectors sharing an LSH bucket with the query are
    scored. Same output shape as knn_brute_force (plus possible misses).

    One streaming pass: each batch computes its own bucket codes (hyperplanes
    ship in the task spec — a few KB), selects rows whose code matches ANY
    wanted (table, bucket) of the broadcast query set via one ``np.isin`` per
    table, and scores them with one matmul per wanted bucket. Vectors are
    never replicated ×n_tables and never leave their batch."""
    import ray

    bucketer = LshBucketer(dim, n_planes, n_tables, seed, id_col, vec_col)
    qdf = _fetch_queries(ds, query_ids, id_col)
    qdf = qdf.sort_values(id_col)
    qm = _to_matrix(qdf[vec_col])
    # int64-wrap the codes: probe() compares via .astype(np.int64), and an
    # unsigned key here would silently miss for codes with the high bit set
    # (n_planes=64) — same signed/unsigned hazard fixed in dedup.Shingler
    qcodes = bucketer.bucket(qm).astype(np.int64)  # (nq, T)
    qids_arr = qdf[id_col].to_numpy(dtype="int64")
    qm_norm = _normalize_rows(qm)
    # per-table: wanted bucket codes (sorted uniques) + per-bucket query rows
    tables = []
    for t in range(qcodes.shape[1]):
        buckets: dict[int, list[int]] = {}
        for qi in range(len(qids_arr)):
            buckets.setdefault(int(qcodes[qi, t]), []).append(qi)
        tables.append(buckets)
    qref = ray.put((tables, qids_arr, qm_norm))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        tables_m, qids2, qmat = ray.get(qref)
        if not len(df):
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "neighbor_id": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        m = _to_matrix(df[vec_col])
        codes = bucketer.bucket(m)  # (n, T)
        ids = df[id_col].to_numpy(dtype="int64")
        mn = _normalize_rows(m)
        out_q, out_n, out_s = [], [], []
        for t, buckets in enumerate(tables_m):
            if not buckets:
                continue
            col = codes[:, t].astype(np.int64)
            hit = np.isin(col, np.fromiter(buckets, dtype=np.int64))
            if not hit.any():
                continue
            hit_idx = np.nonzero(hit)[0]
            for b in np.unique(col[hit_idx]):
                qrows = buckets.get(int(b))
                if not qrows:
                    continue
                sel = hit_idx[col[hit_idx] == b]
                sub_ids, sub = ids[sel], mn[sel]
                sims = qmat[qrows] @ sub.T  # (nq_b, nsel)
                for r, qi in enumerate(qrows):
                    keep = sub_ids != qids2[qi]
                    out_q.append(np.full(keep.sum(), qids2[qi], dtype="int64"))
                    out_n.append(sub_ids[keep])
                    out_s.append(sims[r][keep])
        if not out_q:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "neighbor_id": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        return pd.DataFrame({"query_id": np.concatenate(out_q),
                             "neighbor_id": np.concatenate(out_n),
                             "sim": np.concatenate(out_s).astype("float64")})

    cand = ds.map_batches(probe, batch_format="pandas")
    return cand.groupby("query_id").map_groups(
        _make_final(k, round_decimals, dedupe=True), batch_format="pandas")


def _round_half_away(x, dp: int):
    """Round half-AWAY-from-zero — DuckDB's ROUND(DOUBLE, dp). np.round is
    banker's (half-to-even): np.round(0.1234565, 6) = 0.123456 while SQL
    gives 0.123457, and one flipped value in an oracle-contracted quantity
    cascades (a flipped distance changes a k-means assignment). Every
    SQL-attested float in this module must go through this, never np.round."""
    m = 10.0 ** dp
    y = np.asarray(x, dtype=np.float64) * m
    return np.copysign(np.floor(np.abs(y) + 0.5), y) / m


def _stride_centroids(ds, id_col: str, vec_col: str, stride: int, k: int) -> np.ndarray:
    """The deterministic id-stride seed selection shared by ``knn_ivf`` and
    ``kmeans_fit`` (and contracted by both SQL oracles): vectors with
    ``id % stride == 0 AND id // stride < k``, ordered by id, first ``k``.
    The id-window bound caps the driver collect at ``k`` rows at any corpus
    size — which PRESUPPOSES ids dense from 0 (the repo's id spaces are).
    A sparse tail yielding FEWER than ``k`` seeds proceeds with what exists
    (the SQL oracle's LIMIT sees the same reduced set, so parity holds);
    ZERO seeds (fully offset id space) raises rather than failing obscurely
    downstream."""
    cdf = ds.map_batches(
        lambda df: df[(df[id_col].to_numpy() % stride == 0)
                      & (df[id_col].to_numpy() // stride < k)],
        batch_format="pandas",
    ).to_pandas().sort_values(id_col).head(k)
    if not len(cdf):
        raise ValueError(
            f"id-stride seed selection found no rows with {id_col} % {stride} == 0 "
            f"in [0, {stride * k}) — the deterministic quantizer requires ids "
            f"dense from 0; pass a different stride or use the sampled quantizer")
    return _to_matrix(cdf[vec_col])


def kmeans_fit(ds, k: int = 16, iters: int = 2, id_col: str = "vec_id",
               vec_col: str = "embedding", centroid_id_stride: int = 29,
               round_dp: int = 6):
    """Deterministic distributed Lloyd k-means over an embedding column —
    the clustering primitive of embedding-space curation (SemDeDup-style
    cluster-then-prune, per-cluster sampling quotas).

    Reproducibility contract (what makes a SQL oracle possible): centroids
    init from the vectors with ``id % stride == 0`` (ordered by id, first
    ``k`` — no RNG), every distance is ``ROUND(Σ(v-c)², round_dp)`` with
    smallest-centroid tie-break, and every centroid update rounds each
    coordinate to ``round_dp`` — so cross-engine float summation-order noise
    (~1e-15) is quantized away at each step instead of compounding.

    Scale shape: per iteration ONE streaming pass — centroids broadcast via
    ``ray.put``; each batch emits k partial rows (count, per-dim sums,
    inertia), the classic k-means combiner; the driver reduces k×(dim+2)
    numbers, never rows. iters full scans total — inherent to Lloyd.

    Returns ``(centroids, stats)``: the final centroids and a per-cluster
    DataFrame (cluster, n_vecs, inertia) from the LAST assignment (i.e.
    against the centroids produced by iteration ``iters-1``)."""
    import ray

    stride = int(centroid_id_stride)
    cent = _round_half_away(
        _stride_centroids(ds, id_col, vec_col, stride, k), round_dp)
    kk, dim = cent.shape

    def make_partials(ref):
        def partials(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(ref)
            cols = {"cid": np.arange(kk, dtype=np.int64)}
            if not len(df):
                cols.update({"n": np.zeros(kk, dtype=np.int64),
                             "inertia": np.zeros(kk)})
                for j in range(dim):
                    cols[f"s{j}"] = np.zeros(kk)
                return pd.DataFrame(cols)
            m = _to_matrix(df[vec_col])
            d2 = _round_half_away(
                ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2), round_dp)
            a = d2.argmin(axis=1)  # first min = smallest centroid id
            sums = np.zeros((kk, dim))
            np.add.at(sums, a, m)
            cols["n"] = np.bincount(a, minlength=kk).astype(np.int64)
            cols["inertia"] = np.bincount(a, weights=d2[np.arange(len(a)), a],
                                          minlength=kk)
            for j in range(dim):
                cols[f"s{j}"] = sums[:, j]
            return pd.DataFrame(cols)

        return partials

    last = None
    for _ in range(iters):
        ref = ray.put(cent)
        parts = ds.map_batches(make_partials(ref),
                               batch_format="pandas").to_pandas()
        agg = parts.groupby("cid", sort=True).sum()  # k rows on the driver
        last = agg
        n = agg["n"].to_numpy()
        sums = agg[[f"s{j}" for j in range(dim)]].to_numpy()
        new = cent.copy()
        nz = n > 0
        new[nz] = _round_half_away(sums[nz] / n[nz, None], round_dp)
        cent = new
    stats = pd.DataFrame({
        "cluster": last.index.to_numpy(dtype=np.int64),
        "n_vecs": last["n"].to_numpy(dtype=np.int64),
        "inertia": _round_half_away(last["inertia"].to_numpy(), 2),
    })
    return cent, stats[stats["n_vecs"] > 0].reset_index(drop=True)


def knn_pq(ds, query_ids: list[int], k: int = 10, m: int = 8, ksub: int = 16,
           centroid_id_stride: int = 29, id_col: str = "vec_id",
           vec_col: str = "embedding", round_dp: int = 6):
    """Product-quantization approximate top-k (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search") — the memory-compression scale
    path next to LSH (bucketing) and IVF (list pruning): each vector is stored
    as ``m`` one-byte codes (16× smaller than float64×dim here), and queries
    score candidates from a precomputed per-subspace distance table (ADC)
    without touching the original floats.

    Determinism contract (what makes an exact SQL oracle of the APPROXIMATE
    algorithm possible — same discipline as :func:`kmeans_fit`): the ``ksub``
    codewords of subspace ``s`` are the ``s``-th slices of the id-stride seed
    vectors (``id % stride == 0``, ordered by id, first ``ksub`` — no RNG, no
    training iterations); every subspace distance is ``ROUND(Σ(v-c)²,
    round_dp)`` with smallest-codeword tie-break; the ADC distance is the
    rounded sum of ``m`` table entries. DuckDB replays codebook build, encode,
    and scoring bit-for-bit.

    Scale shape: the codebook (m × ksub × dsub floats — a few KB) and the
    query distance tables broadcast once via ``ray.put``; ONE streaming pass
    encodes each batch and immediately ADC-scores it, emitting only local
    top-k candidate rows (the combiner); a per-query reduce finishes. In a
    stored-index deployment the encode pass writes the (id, code_0..code_m-1)
    table once — 1 byte per subspace per vector — and queries stream over
    codes alone."""
    import ray

    seeds = _stride_centroids(ds, id_col, vec_col, int(centroid_id_stride), ksub)
    dim = seeds.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    ksub = seeds.shape[0]  # a sparse id tail may yield fewer seeds (see
    # _stride_centroids) — the SQL oracle's LIMIT sees the same reduced set
    # codebook[s, j] = subspace-s slice of seed vector j
    codebook = seeds.reshape(ksub, m, dsub).transpose(1, 0, 2).copy()

    qdf = _fetch_queries(ds, query_ids, id_col).sort_values(id_col)
    qids_arr = qdf[id_col].to_numpy(dtype="int64")
    qm = _to_matrix(qdf[vec_col])
    # ADC tables: dt[qi, s, j] = round(Σ (q_sub - codeword)², dp)
    qsub = qm.reshape(len(qm), m, dsub)
    dt = _round_half_away(
        ((qsub[:, :, None, :] - codebook[None, :, :, :]) ** 2).sum(axis=3),
        round_dp)
    ref = ray.put((codebook, qids_arr, dt))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        cb, qids2, dt2 = ray.get(ref)
        if not len(df):
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "neighbor_id": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        ids = df[id_col].to_numpy(dtype="int64")
        mv = _to_matrix(df[vec_col]).reshape(len(df), m, dsub)
        # encode: nearest codeword per subspace (rounded d², argmin = first
        # minimum = smallest codeword index on ties)
        d2 = _round_half_away(
            ((mv[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3),
            round_dp)  # (n, m, ksub)
        codes = d2.argmin(axis=2)  # (n, m) uint8-sized — the stored index
        # ADC: adist[qi, i] = round(Σ_s dt2[qi, s, codes[i, s]], dp)
        sub = np.arange(m)
        gathered = dt2[:, sub[None, :], codes]  # (nq, n, m)
        adist = _round_half_away(gathered.sum(axis=2), round_dp)  # (nq, n)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids2):
            keep = np.nonzero(ids != qid)[0]
            row = adist[qi][keep]
            kk = min(k, len(row))
            if kk == 0:
                continue
            # ADC ties are COMMON (vectors sharing codes have identical
            # distances), so the local combiner must cut its top-k with the
            # same (distance, neighbor_id) order the final reduce and the SQL
            # oracle use — argpartition's arbitrary boundary handling would
            # drop the tied candidate with the smaller id
            top = np.lexsort((ids[keep], row))[:kk]
            out_q.extend([qid] * len(top))
            out_n.extend(ids[keep[top]])
            # negate AFTER rounding: sim DESC == approx distance ASC, so the
            # shared per-query reduce (_make_final) ranks PQ like the others
            out_s.extend(-row[top])
        return pd.DataFrame({"query_id": np.asarray(out_q, dtype="int64"),
                             "neighbor_id": np.asarray(out_n, dtype="int64"),
                             "sim": np.asarray(out_s, dtype="float64")})

    cand = ds.map_batches(score, batch_format="pandas")
    return cand.groupby("query_id").map_groups(
        _make_final(k, None), batch_format="pandas")


def semantic_dedup(ds, threshold: float = 0.95, k: int = 16, iters: int = 2,
                   centroid_id_stride: int = 29, id_col: str = "vec_id",
                   vec_col: str = "embedding", round_decimals: int = 6):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then run the
    EXACT cosine near-dup scan WITHIN each cluster only — O(n²/k) pair work
    instead of O(n²), missing only cross-cluster pairs (rare at high
    thresholds, where near-dups co-locate by construction).

    Shape: one k-means fit (see :func:`kmeans_fit` — combiner partials,
    driver reduces numbers); one assignment pass (broadcast centroids); then
    ``groupby(cluster).map_groups`` with a vectorized per-cluster matmul —
    the shuffle moves (id, vector, cluster) rows once, and each cluster's
    O(c²) scan runs as one numpy call on one worker. Returns (id_a, id_b,
    sim, cluster) pairs with id_a < id_b."""
    import ray

    cent, _ = kmeans_fit(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
                         centroid_id_stride=centroid_id_stride)
    cref = ray.put(cent)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(cluster=pd.Series(dtype="int64"))
        c = ray.get(cref)
        m = _to_matrix(df[vec_col])
        d2 = _round_half_away(
            ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2), 6)
        return df.assign(cluster=d2.argmin(axis=1).astype(np.int64))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "sim": pd.Series(dtype="float64"),
                              "cluster": pd.Series(dtype="int64")})
        if len(g) < 2:
            return empty
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = _normalize_rows(_to_matrix(g[vec_col].to_numpy()[order]))
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        s = sims[ia, ib]
        keep = s >= threshold
        if not keep.any():
            return empty
        s = s[keep]
        if round_decimals is not None:
            s = _round_half_away(s, round_decimals)
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                             "sim": s,
                             "cluster": np.full(int(keep.sum()),
                                                int(g["cluster"].iloc[0]),
                                                dtype=np.int64)})

    assigned = ds.map_batches(assign, batch_format="pandas")
    return assigned.groupby("cluster").map_groups(pairs, batch_format="pandas")

# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (dimensionality reduction)
# ---------------------------------------------------------------------------
def jl_sign_matrix(dim: int, out_dim: int, tag: str = "jl") -> np.ndarray:
    """±1 sign matrix (dim × out_dim) for sparse JL projection (Achlioptas
    2003 — database-friendly random projections). Entries derive from
    ``md5_u64(f"{tag}:{i}:{j}") % 2`` so a DuckDB oracle can rebuild every
    entry with the same ``('0x' || substr(md5(...),1,16))::UBIGINT``
    expression — no literal matrix shipping, no seed-dependent RNG drift."""
    from ..hashing import md5_u64

    s = np.empty((dim, out_dim), dtype=np.float64)
    for i in range(dim):
        for j in range(out_dim):
            s[i, j] = 1.0 if md5_u64(f"{tag}:{i}:{j}") % 2 == 0 else -1.0
    return s


class RandomProjector:
    """JL projection stage: ``x → round(x @ S / sqrt(out_dim), dp)``.

    The sign matrix builds once per construction (a few KB — ships in the
    task spec like LshBucketer's hyperplanes) and each batch is one float64
    matmul. Coordinates are quantized half-away-from-zero at ``round_dp`` so
    float summation-order noise cannot leak past the projection — the same
    cross-engine contract the k-means kernel uses. Projection preserves
    pairwise distances within (1±ε) w.h.p., making the output a drop-in
    cheaper input for ANN / clustering stages at 100 TB scale."""

    def __init__(self, dim: int, out_dim: int = 8, tag: str = "jl",
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 out_col: str = "embedding_jl", keep_cols: tuple = (),
                 round_dp: int = 6):
        import math

        self.s = jl_sign_matrix(dim, out_dim, tag)
        self.denom = math.sqrt(out_dim)  # divide (not mul-by-inverse): IEEE-matches SQL's /sqrt(d)
        self.id_col, self.vec_col, self.out_col = id_col, vec_col, out_col
        self.keep_cols, self.round_dp = tuple(keep_cols), round_dp

    def project(self, m: np.ndarray) -> np.ndarray:
        return _round_half_away((m @ self.s) / self.denom, self.round_dp)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = {self.id_col: df[self.id_col].to_numpy()}
        for c in self.keep_cols:
            out[c] = df[c].to_numpy()
        if len(df):
            p = self.project(_to_matrix(df[self.vec_col]))
            out[self.out_col] = list(p)
        else:
            out[self.out_col] = []
        return pd.DataFrame(out)


def random_projection(ds, dim: int, out_dim: int = 8, tag: str = "jl",
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      out_col: str = "embedding_jl", keep_cols: tuple = (),
                      round_dp: int = 6):
    """Project the embedding column to ``out_dim`` dims (JL sign projection).
    Streaming map_batches — vectors never leave their batch."""
    return ds.map_batches(
        RandomProjector(dim, out_dim, tag, id_col, vec_col, out_col,
                        keep_cols, round_dp),
        batch_format="pandas")


def kmeans_prune(ds, q_pct: int = 10, k: int = 16, iters: int = 2,
                 centroid_id_stride: int = 29, id_col: str = "vec_id",
                 vec_col: str = "embedding", round_dp: int = 6,
                 num_partitions: int = 16, centroids=None):
    """Prototypicality pruning (Sorscher et al. 2022, "Beyond neural scaling
    laws", arXiv:2206.14486 — the SSL-Prune metric; SemDeDup's sibling):
    cluster the embedding space, then flag the ``q_pct``% LEAST prototypical
    vectors per cluster — largest rounded distance-to-centroid, ties broken
    by smaller id — the slice you'd drop first when downsizing a corpus.

    Shape: one :func:`kmeans_fit` (combiner partials, driver reduces k rows);
    ONE assignment pass against the broadcast final centroids; hash partition
    by cluster so per-partition ranks ARE global per-cluster ranks (all of a
    cluster's rows co-locate); per-partition vectorized rank + rollup. The
    driver sees only k rollup rows. Prune count per cluster is the exact
    integer ``(n_c·q_pct + 99) // 100`` — no float quantile boundary.

    Returns a per-cluster DataFrame (cluster, n_pruned, pruned_inertia).

    Pass ``centroids`` (the array kmeans_fit returns) to reuse an existing
    fit instead of re-clustering — the assignment + rank passes are all that
    run then.
    """
    import ray

    from maritime_activity_reports_cdc_ray.functions.dedup import _hash_part

    if centroids is None:
        centroids, _ = kmeans_fit(ds, k=k, iters=iters, id_col=id_col,
                                  vec_col=vec_col,
                                  centroid_id_stride=centroid_id_stride,
                                  round_dp=round_dp)
    cent = np.asarray(centroids)
    cref = ray.put(cent)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "cid": pd.Series(dtype="int64"),
                                 "d2": pd.Series(dtype="float64"),
                                 "_part": pd.Series(dtype="int64")})
        c = ray.get(cref)
        m = _to_matrix(df[vec_col])
        d2 = _round_half_away(
            ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2), round_dp)
        a = d2.argmin(axis=1).astype(np.int64)
        out = pd.DataFrame({id_col: df[id_col].to_numpy(np.int64),
                            "cid": a,
                            "d2": d2[np.arange(len(a)), a]})
        out["_part"] = _hash_part(out, ["cid"], num_partitions)
        return out

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        from maritime_activity_reports_cdc_ray.functions.kernels import (
            group_positions,
        )

        g = g.sort_values(["cid", "d2", id_col],
                          ascending=[True, False, True], kind="mergesort")
        cid = g["cid"].to_numpy()
        _, cnt, rn = group_positions(cid)
        nc = np.repeat(cnt, cnt)
        keep = rn < (nc * q_pct + 99) // 100
        kept = g[keep]
        out = kept.groupby("cid", as_index=False).agg(
            n_pruned=(id_col, "size"), pruned_inertia=("d2", "sum"))
        return pd.DataFrame({"cluster": out["cid"].astype("int64"),
                             "n_pruned": out["n_pruned"].astype("int64"),
                             "pruned_inertia": out["pruned_inertia"]})

    from maritime_activity_reports_cdc_ray.functions.kernels import (
        dataset_to_pandas)

    res = dataset_to_pandas(
        ds.map_batches(assign, batch_format="pandas")
          .groupby("_part").map_groups(prune, batch_format="pandas"))
    if not len(res.columns):  # empty input: zero groups leave no schema at all
        res = pd.DataFrame({"cluster": pd.Series(dtype="int64"),
                            "n_pruned": pd.Series(dtype="int64"),
                            "pruned_inertia": pd.Series(dtype="float64")})
    res["pruned_inertia"] = _round_half_away(
        res["pruned_inertia"].to_numpy(np.float64), 2)
    return res.sort_values("cluster").reset_index(drop=True)
