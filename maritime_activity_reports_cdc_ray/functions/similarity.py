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
            # half-away-from-zero, matching SQL ROUND (numpy rounds half-even)
            m = 10.0 ** round_decimals
            y = g["sim"].to_numpy(dtype=np.float64) * m
            g["sim"] = np.copysign(np.floor(np.abs(y) + 0.5), y) / m
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="mergesort")
        g = g.head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g

    return cand.groupby("query_id").map_groups(final, batch_format="pandas")


def cosine_dupes(ds, threshold: float, id_col: str = "vec_id",
                 vec_col: str = "embedding", round_decimals: int = 6):
    """Exact embedding-cosine near-dup pairs: every (id_a < id_b) with
    cosine ≥ threshold.

    The normalized id/matrix pair is broadcast ONCE via ``ray.put``; each batch
    does one float64 matmul (batch × all) and emits only qualifying pairs —
    the exact baseline. This is O(n²) compute with O(n·d) broadcast state, the
    honest brute-force floor; the scale path is LSH bucketing (share a bucket
    ⟹ candidate, then exact verify — see :class:`LshBucketer` /
    ``functions.dedup.simhash_candidates`` for the same shape)."""
    import ray

    full = ds.select_columns([id_col, vec_col]).to_pandas()
    full = full.sort_values(id_col)
    ids_all = full[id_col].to_numpy(dtype="int64")
    mat_all = _normalize_rows(_to_matrix(full[vec_col]))
    ref = ray.put((ids_all, mat_all))

    def pair_finder(df: pd.DataFrame) -> pd.DataFrame:
        # task fn (warm workers, zero-copy broadcast read) — see _batch_topk
        ids_all2, mat_all2 = ray.get(ref)
        if not len(df):
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        ids_b = df[id_col].to_numpy(dtype="int64")
        mb = _normalize_rows(_to_matrix(df[vec_col]))
        sims = mb @ mat_all2.T  # (nb, N) float64
        mask = (sims >= threshold) & (ids_b[:, None] < ids_all2[None, :])
        r, c = np.nonzero(mask)
        sim = sims[r, c]
        if round_decimals is not None:
            m = 10.0 ** round_decimals
            sim = np.copysign(np.floor(np.abs(sim * m) + 0.5), sim) / m
        return pd.DataFrame({"id_a": ids_b[r], "id_b": ids_all2[c], "sim": sim})

    return ds.map_batches(pair_finder, batch_format="pandas")


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
            id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF-style approximate top-k: a k-means coarse quantizer (trained on a
    driver-side sample, broadcast once) buckets vectors into ``n_lists``
    inverted lists; each query scores only its ``nprobe`` nearest lists.

    Scale shape: one pass assigns list ids (task fn, broadcast centroids);
    per-batch scoring emits local top-k only for (query, list) matches; a
    per-query reduce finishes. Compute ∝ nprobe/n_lists of brute force."""
    import ray

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
        m = _to_matrix(df[vec_col])
        d = ((m[:, None, :] - cent2[None, :, :]) ** 2).sum(axis=2)
        lists = d.argmin(axis=1)
        ids = df[id_col].to_numpy()
        mn = _normalize_rows(m)
        rows = []
        for c in np.unique(lists):
            qids = wanted2.get(int(c))
            if not qids:
                continue
            sel = lists == c
            sub_ids, sub = ids[sel], mn[sel]
            for qid in qids:
                qv = qvecs[qid]
                sims = sub @ (qv / (np.linalg.norm(qv) or 1.0))
                for i, s in zip(sub_ids, sims):
                    if int(i) != qid:
                        rows.append((qid, int(i), float(s)))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim"]) if rows else \
            pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                          "neighbor_id": pd.Series(dtype="int64"),
                          "sim": pd.Series(dtype="float64")})

    cand = ds.map_batches(score, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True],
                          kind="mergesort").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g

    return cand.groupby("query_id").map_groups(final, batch_format="pandas")


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
        m = _to_matrix(df[self.vec_col])
        codes = self.bucket(m)
        n, t = codes.shape
        return pd.DataFrame({
            self.id_col: np.repeat(df[self.id_col].to_numpy(), t),
            "table_id": np.tile(np.arange(t, dtype="int64"), n),
            "bucket": codes.reshape(-1).astype("int64"),
            self.vec_col: [v for v in df[self.vec_col] for _ in range(t)],
        })


def knn_lsh(ds, query_ids: list[int], k: int = 10, dim: int = 64,
            n_planes: int = 8, n_tables: int = 4, seed: int = 13,
            id_col: str = "vec_id", vec_col: str = "embedding"):
    """Approximate top-k: only vectors sharing an LSH bucket with the query are
    scored. Same output shape as knn_brute_force (plus possible misses)."""
    import ray

    bucketer = LshBucketer(dim, n_planes, n_tables, seed, id_col, vec_col)
    # the bucketer instance (a few KB of hyperplanes) ships in the task spec —
    # task pool on warm workers, no per-query actor spin-up
    bucketed = ds.map_batches(bucketer, batch_format="pandas")
    qdf = _fetch_queries(ds, query_ids, id_col)
    qm = _to_matrix(qdf[vec_col])
    qcodes = bucketer.bucket(qm)  # (nq, T)
    wanted = {}  # (table, bucket) -> [qids]
    for qi, qid in enumerate(qdf[id_col].to_numpy()):
        for t in range(qcodes.shape[1]):
            wanted.setdefault((t, int(qcodes[qi, t])), []).append(int(qid))
    qref = ray.put((wanted, dict(zip(qdf[id_col].astype(int), [np.asarray(v, np.float64) for v in qdf[vec_col]]))))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        wanted_m, qvecs = ray.get(qref)
        rows = []
        for (t, b), grp in df.groupby(["table_id", "bucket"]):
            qids = wanted_m.get((int(t), int(b)))
            if not qids:
                continue
            ids = grp[id_col].to_numpy()
            m = _normalize_rows(_to_matrix(grp[vec_col]))
            for qid in qids:
                qv = qvecs[qid]
                qv = qv / (np.linalg.norm(qv) or 1.0)
                sims = m @ qv
                for i, s in zip(ids, sims):
                    if int(i) != qid:
                        rows.append((qid, int(i), float(s)))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim"]) if rows else \
            pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                          "neighbor_id": pd.Series(dtype="int64"),
                          "sim": pd.Series(dtype="float64")})

    cand = bucketed.map_batches(probe, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("neighbor_id")
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g

    return cand.groupby("query_id").map_groups(final, batch_format="pandas")
