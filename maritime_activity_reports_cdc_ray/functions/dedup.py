"""Deduplication operators for training-data pipelines.

- **exact**: content-hash → hash-partitioned groupby → keep first
  (the guide's canonical shape; reference analogue: ``.distinct()`` /
  ``SELECT DISTINCT`` dedup, SURVEY.md §2.7).
- **MinHash + LSH**: shingle → minhash signature (vectorized) → band-bucket
  groupby → candidate pairs → exact Jaccard verify. Signatures/bands are one
  mergeable row per doc — the shuffle moves signatures, never text.
- **SimHash**: 64-bit signature + banded Hamming buckets.
- **n-gram Jaccard**: the exact verifier used on candidate pairs.

Everything is expressed as ``map_batches`` (stateless or actor pools for
hasher state) + ``groupby`` on bucket keys; connected components for dup
*groups* use min-label propagation rounds over a groupby — no driver-side
union-find over big data.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _shingles(text: str, k: int) -> set:
    t = " ".join(text.lower().split())
    if len(t) <= k:
        return {t}
    return {t[i : i + k] for i in range(len(t) - k + 1)}


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = _shingles(a, k), _shingles(b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_dedup(ds, cols: list[str], order: list[str], id_col: str):
    """Keep, per distinct ``cols`` tuple, the first row by ``order`` (+id tie
    -break). Shape: md5 key column → groupby(key) → head(1)."""

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        key = df[cols].astype(str).agg("\x1f".join, axis=1)
        df = df.copy()
        df["_dk"] = key.map(lambda s: hashlib.md5(s.encode()).hexdigest())
        return df

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order + [id_col], kind="mergesort").head(1)

    return (
        ds.map_batches(add_key, batch_format="pandas")
        .groupby("_dk")
        .map_groups(first, batch_format="pandas")
        .drop_columns(["_dk"])
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
class MinHasher:
    """Actor-pool stage: text → minhash signature (num_perm x uint64) using
    tabulated universal hashing; permutation tables built once per actor."""

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 7,
                 text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.num_perm, self.k = num_perm, k
        self.text_col, self.id_col = text_col, id_col
        self.prime = np.uint64((1 << 61) - 1)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.zeros(self.num_perm, dtype=np.uint64)
        base = np.fromiter(
            (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
             for s in sh),
            dtype=np.uint64, count=len(sh),
        )
        # (a*x + b) mod p for all perms x shingles, then min over shingles
        prod = (self.a[:, None] * base[None, :] + self.b[:, None]) % self.prime
        return prod.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in df[self.text_col].fillna("")]
        return pd.DataFrame({self.id_col: df[self.id_col].to_numpy(),
                             "minhash": [s.tolist() for s in sigs]})


def lsh_bands(df: pd.DataFrame, bands: int = 16) -> pd.DataFrame:
    """Explode signatures into (band_id, band_hash, id) rows — the LSH bucket
    key for the groupby."""
    id_col = df.columns[0]
    rows_id, rows_band, rows_hash = [], [], []
    for i, sig in zip(df[id_col].to_numpy(), df["minhash"]):
        sig = np.asarray(sig, dtype=np.uint64)
        r = len(sig) // bands
        for b in range(bands):
            h = hashlib.blake2b(sig[b * r : (b + 1) * r].tobytes(), digest_size=8).hexdigest()
            rows_id.append(i)
            rows_band.append(b)
            rows_hash.append(h)
    return pd.DataFrame({id_col: rows_id, "band_id": rows_band, "band_hash": rows_hash})


def minhash_lsh_candidates(ds, num_perm: int = 64, bands: int = 16, k: int = 5,
                           text_col: str = "text", id_col: str = "doc_id",
                           concurrency=(1, 4)):
    """documents → candidate near-dup pairs (id_a < id_b) via MinHash-LSH.

    Pipeline: map_batches(MinHasher actor pool) → map_batches(band explode) →
    groupby(band bucket) → pairs within bucket → distinct pairs.
    """

    sigs = ds.map_batches(
        MinHasher, fn_constructor_kwargs={"num_perm": num_perm, "k": k,
                                          "text_col": text_col, "id_col": id_col},
        batch_format="pandas", concurrency=concurrency,
    )
    banded = sigs.map_batches(lambda df: lsh_bands(df, bands), batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].unique())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    cand = banded.groupby(["band_id", "band_hash"]).map_groups(pairs, batch_format="pandas")
    # distinct pairs (same pair can surface from several bands) — built-in
    # count() aggregation, NOT per-pair map_groups (vectorized; a python call
    # per pair would dominate wall time at any real candidate volume)
    return cand.groupby(["id_a", "id_b"]).count().drop_columns(["count()"])


def verify_pairs_jaccard(cand_ds, docs_ds, threshold: float = 0.8, k: int = 5,
                         text_col: str = "text", id_col: str = "doc_id"):
    """Exact n-gram-Jaccard verification of candidate pairs. The doc texts are
    broadcast via ray.put (small side — candidates reference few docs) and the
    check runs vectorized per batch of pairs."""
    import ray

    docs = docs_ds.select_columns([id_col, text_col]).to_pandas()
    lookup_ref = ray.put(dict(zip(docs[id_col], docs[text_col])))

    class Verify:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            sims = [
                ngram_jaccard(self.lookup.get(a, ""), self.lookup.get(b, ""), k)
                for a, b in zip(df["id_a"], df["id_b"])
            ]
            df = df.copy()
            df["jaccard"] = sims
            return df[df["jaccard"] >= threshold]

    return cand_ds.map_batches(Verify, batch_format="pandas", concurrency=(1, 2))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
class SimHasher:
    """64-bit SimHash over word tokens (actor-pool stage)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    @staticmethod
    def simhash64(text: str) -> int:
        words = text.lower().split()
        if not words:
            return 0
        hs = np.fromiter(
            (int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
             for w in words),
            dtype=np.uint64, count=len(words),
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            self.id_col: df[self.id_col].to_numpy(),
            "simhash": np.fromiter((self.simhash64(t) for t in df[self.text_col].fillna("")),
                                   dtype=np.uint64, count=len(df)).astype("int64"),
        })


def simhash_candidates(ds, max_hamming: int = 3, bands: int = 4,
                       text_col: str = "text", id_col: str = "doc_id",
                       concurrency=(1, 4)):
    """Near-dup candidates with Hamming distance <= max_hamming, using the
    banded pigeonhole trick: split 64 bits into ``bands`` chunks; any pair
    within distance < bands shares at least one exact chunk → bucket groupby."""
    sigs = ds.map_batches(SimHasher, fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
                          batch_format="pandas", concurrency=concurrency)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        sig = df["simhash"].to_numpy().astype(np.uint64)
        w = 64 // bands
        out = []
        for b in range(bands):
            chunk = (sig >> np.uint64(b * w)) & np.uint64((1 << w) - 1)
            out.append(pd.DataFrame({id_col: df[id_col].to_numpy(),
                                     "simhash": sig.astype("int64"),
                                     "band_id": b, "chunk": chunk.astype("int64")}))
        return pd.concat(out, ignore_index=True)

    banded = sigs.map_batches(explode, batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "hamming": pd.Series(dtype="int64")})
        ia, ib = np.triu_indices(len(ids), k=1)
        x = sh[ia] ^ sh[ib]
        ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
        m = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia][m], "id_b": ids[ib][m], "hamming": ham[m]})

    cand = banded.groupby(["band_id", "chunk"]).map_groups(pairs, batch_format="pandas")
    from ray.data.aggregate import Min

    return cand.groupby(["id_a", "id_b"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# duplicate-group labeling (connected components by min-label propagation)
# ---------------------------------------------------------------------------
def label_components(pairs_df: pd.DataFrame, max_rounds: int = 20) -> pd.DataFrame:
    """(id_a, id_b) edges → (id, component) with component = min id reachable.
    Pure-pandas min-label propagation (the distributed version iterates the
    same relation as a groupby per round; candidate sets here are small)."""
    ids = pd.unique(pd.concat([pairs_df["id_a"], pairs_df["id_b"]], ignore_index=True))
    label = pd.Series(ids, index=ids)
    a = pairs_df["id_a"].to_numpy()
    b = pairs_df["id_b"].to_numpy()
    for _ in range(max_rounds):
        la, lb = label[a].to_numpy(), label[b].to_numpy()
        new = np.minimum(la, lb)
        upd = pd.DataFrame({"id": np.concatenate([a, b]),
                            "lab": np.concatenate([new, new])})
        nl = upd.groupby("id")["lab"].min()
        merged = label.copy()
        merged.loc[nl.index] = np.minimum(label.loc[nl.index].to_numpy(), nl.to_numpy())
        if merged.equals(label):
            break
        label = merged
    return pd.DataFrame({"id": label.index.to_numpy(), "component": label.to_numpy()})
