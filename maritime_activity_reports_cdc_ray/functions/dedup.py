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
import pyarrow as pa
import pyarrow.compute as pc


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
# partition-local aggregation helpers
#
# Ray's sort-based groupby costs ~ms per OUTPUT group (one Python dispatch per
# key), so a distinct/count over 10^5+ keys takes minutes. These helpers hash-
# partition to ``num_partitions`` groups and run ONE vectorized pandas
# aggregation per partition — the shuffle is identical (all-to-all on the hash
# key), only the per-key dispatch is gone. This is the same partial-
# aggregation shape the merge engine uses for the CDC shuffle.
# ---------------------------------------------------------------------------
def _hash_part(df: pd.DataFrame, cols: list[str], num_partitions: int) -> np.ndarray:
    if "_part" in cols:
        # every caller assigns the result to a `_part` column; hashing a
        # column with that name would silently overwrite the VALUES with
        # partition ids (observed: distinct-ing pid sets returned 0..P-1
        # instead of the pids) — fail loudly instead
        raise ValueError(
            "_hash_part: key columns may not be named '_part' (it is the "
            "internal partition column); rename the column first")
    acc = np.zeros(len(df), dtype=np.uint64)
    for c in cols:
        v = df[c].to_numpy()
        if v.dtype.kind not in "iu":
            v = pd.util.hash_array(np.asarray(v))
        acc = acc * np.uint64(1099511628211) + v.astype(np.uint64)
    return (acc % np.uint64(num_partitions)).astype("int64")


def hash_distinct(ds, cols: list[str], num_partitions: int = 16):
    """DISTINCT on ``cols``: per-batch local dedup → hash partition →
    per-partition vectorized dedup (P Python calls total)."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) and not set(cols) <= set(df.columns):
            return df  # schema-less empty block (Ray 2.49): no groups
        d = df[cols].drop_duplicates()
        d = d.copy()
        d["_part"] = _hash_part(d, cols, num_partitions)
        return d

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(cols)[cols]

    return (ds.map_batches(local, batch_format="pandas")
            .groupby("_part").map_groups(combine, batch_format="pandas"))


def hash_count(ds, cols: list[str], num_partitions: int = 16,
               count_col: str = "cnt"):
    """COUNT(*) GROUP BY ``cols`` with per-batch partial counts before the
    shuffle (combiner) and one vectorized reduce per partition."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) and not set(cols) <= set(df.columns):
            return df  # schema-less empty block (Ray 2.49): no groups
        d = df.groupby(cols, as_index=False, sort=False).size() \
            .rename(columns={"size": count_col})
        d["_part"] = _hash_part(d, cols, num_partitions)
        return d

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(cols, as_index=False, sort=False)[count_col].sum()

    return (ds.map_batches(local, batch_format="pandas")
            .groupby("_part").map_groups(combine, batch_format="pandas"))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_dedup(ds, cols: list[str], order: list[str], id_col: str,
                num_partitions: int = 16):
    """Keep, per distinct ``cols`` tuple, the first row by ``order`` (+id tie
    -break). Shape: md5 key column → per-batch local first (combiner) → hash
    partition → ONE vectorized per-partition reduce (P Python calls — never a
    dispatch per key; see the partition-local note above)."""

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        key = df[cols].astype(str).agg("\x1f".join, axis=1)
        df = df.copy()
        df["_dk"] = key.map(lambda s: hashlib.md5(s.encode()).hexdigest())
        return df

    def local_first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_dk"] + order + [id_col], kind="mergesort")
        df = df.groupby("_dk", as_index=False, sort=False).head(1)
        df = df.copy()
        df["_part"] = _hash_part(df, ["_dk"], num_partitions)
        return df

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_dk"] + order + [id_col], kind="mergesort")
        return g.groupby("_dk", as_index=False, sort=False).head(1) \
                .drop(columns=["_dk", "_part"])

    return (ds.map_batches(add_key, batch_format="pandas")
            .map_batches(local_first, batch_format="pandas")
            .groupby("_part").map_groups(combine, batch_format="pandas"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
class MinHasher:
    """Actor-pool stage: text → minhash signature (num_perm x uint64) using
    tabulated universal hashing; permutation tables built once per actor.

    Every arithmetic step is SQL-reproducible so a DuckDB oracle can recompute
    signatures exactly: base shingle hash = ``md5_u64`` (md5 first-8-bytes
    big-endian), then ``((a*x) mod 2^64 + b) mod 2^64 mod (2^61-1)`` per
    permutation (the explicit mod-2^64 steps mirror numpy's uint64 wraparound;
    DuckDB does them in HUGEINT)."""

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 7,
                 text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.num_perm, self.k = num_perm, k
        self.text_col, self.id_col = text_col, id_col
        self.prime = np.uint64((1 << 61) - 1)
        self._hash_cache: dict = {}

    def _base_hashes(self, sh) -> np.ndarray:
        """md5_u64 per shingle, cached per actor (shingles repeat across docs)."""
        cache = self._hash_cache
        md5 = hashlib.md5
        out = np.empty(len(sh), dtype=np.uint64)
        for i, s in enumerate(sh):
            v = cache.get(s)
            if v is None:
                if len(cache) > 2_000_000:  # bound actor-resident state
                    cache.clear()
                v = cache[s] = int.from_bytes(md5(s.encode("utf-8", "surrogatepass")).digest()[:8], "big")
            out[i] = v
        return out

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.zeros(self.num_perm, dtype=np.uint64)
        base = self._base_hashes(list(sh))
        # (a*x + b) mod p for all perms x shingles (uint64 products wrap mod
        # 2^64 — deliberate, mirrored by the SQL oracle), then min over shingles
        prod = (self.a[:, None] * base[None, :] + self.b[:, None]) % self.prime
        return prod.min(axis=1)

    def batch_signatures(self, texts) -> np.ndarray:
        """(n, num_perm) signatures for a whole batch in one vectorized pass:
        shingle sets concatenate, md5 runs once per FACTORIZE-distinct
        shingle (replacing the per-actor hash cache), each permutation is
        computed on the uniques and gathered, per-doc minima fall out of one
        ``np.minimum.reduceat`` per permutation. Same arithmetic as
        :meth:`signature` (pinned by tests + the SQL oracle)."""
        n = len(texts)
        sig = np.zeros((n, self.num_perm), dtype=np.uint64)
        if not n:
            return sig
        sh_lists = [list(_shingles(t if t is not None else "", self.k))
                    for t in texts]
        counts = np.fromiter((len(s) for s in sh_lists), dtype=np.int64, count=n)
        total = int(counts.sum())
        if not total:
            return sig
        all_sh = np.empty(total, dtype=object)
        i = 0
        for lst in sh_lists:
            all_sh[i:i + len(lst)] = lst
            i += len(lst)
        codes, uniques = pd.factorize(all_sh, use_na_sentinel=False)
        md5 = hashlib.md5
        uh = np.fromiter(
            (int.from_bytes(md5(s.encode("utf-8", "surrogatepass")).digest()[:8],
                            "big") for s in uniques),
            dtype=np.uint64, count=len(uniques))
        starts = np.r_[np.int64(0), np.cumsum(counts)[:-1]]
        nonempty = counts > 0
        # pad one neutral element so a trailing empty segment's boundary
        # (== total) stays a valid reduceat index WITHOUT clipping — a clip
        # would silently shorten the PRECEDING segment's reduction
        for p in range(self.num_perm):
            vals = ((self.a[p] * uh + self.b[p]) % self.prime)[codes]
            vals = np.r_[vals, np.uint64(0xFFFFFFFFFFFFFFFF)]
            mins = np.minimum.reduceat(vals, starts)
            sig[:, p] = np.where(nonempty, mins, np.uint64(0))
        return sig

    def __call__(self, batch):
        if isinstance(batch, pa.Table):
            texts = pc.fill_null(batch.column(self.text_col), "").to_pylist()
            sig = self.batch_signatures(texts)
            flat = pa.array(sig.reshape(-1))
            return pa.table({
                self.id_col: batch.column(self.id_col),
                "minhash": pa.FixedSizeListArray.from_arrays(flat, self.num_perm),
            })
        sigs = self.batch_signatures(batch[self.text_col].fillna("").tolist())
        return pd.DataFrame({self.id_col: batch[self.id_col].to_numpy(),
                             "minhash": list(sigs)})


BAND_FOLD_INIT = 1469598103934665603
BAND_FOLD_MUL = 1099511628211


def lsh_bands(batch, bands: int = 16):
    """Explode signatures into (id, band_id, band_hash int64) rows — the LSH
    bucket key. Fully vectorized: each band's r signature lanes are folded
    into one 64-bit multiply-add hash across ALL docs at once (no per-doc
    loop, no hex strings through the shuffle). The fold is pure mod-2^64
    multiply-add (``acc = acc*M + lane``) so a SQL oracle reproduces it in
    HUGEINT arithmetic. Accepts a pyarrow Table whose ``minhash`` column is
    a fixed-size-list (zero-copy reshape of the flat values buffer) or a
    pandas frame of per-row sequences."""
    is_arrow = isinstance(batch, pa.Table)
    if is_arrow:
        id_col = batch.column_names[0]
        n = batch.num_rows
        if not n:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "band_id": pa.array([], pa.int64()),
                             "band_hash": pa.array([], pa.int64())})
        mh = batch.column("minhash").combine_chunks()
        sigs = mh.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False).reshape(n, -1)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    else:
        id_col = batch.columns[0]
        if not len(batch):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "band_id": pd.Series(dtype="int64"),
                                 "band_hash": pd.Series(dtype="int64")})
        sigs = np.asarray([np.asarray(s, dtype=np.uint64)
                           for s in batch["minhash"]], dtype=np.uint64)
        ids = batch[id_col].to_numpy()
        n = len(batch)
    num_perm = sigs.shape[1]
    r = num_perm // bands
    mul = np.uint64(BAND_FOLD_MUL)
    out = np.empty((n, bands), dtype=np.uint64)
    for b in range(bands):
        acc = np.full(n, BAND_FOLD_INIT, dtype=np.uint64)
        for j in range(r):
            acc = acc * mul + sigs[:, b * r + j]  # wraps mod 2^64 — by design
        out[:, b] = acc
    rep_ids = np.repeat(ids, bands)
    band_id = np.tile(np.arange(bands, dtype="int64"), n)
    band_hash = out.reshape(-1).astype("int64")
    if is_arrow:
        return pa.table({id_col: pa.array(rep_ids),
                         "band_id": pa.array(band_id),
                         "band_hash": pa.array(band_hash)})
    return pd.DataFrame({id_col: rep_ids, "band_id": band_id,
                         "band_hash": band_hash})


def minhash_lsh_candidates(ds, num_perm: int = 64, bands: int = 16, k: int = 5,
                           text_col: str = "text", id_col: str = "doc_id",
                           concurrency=None, num_partitions: int = 16,
                           bucket_cap: int = 4096,
                           small_gate_rows: int = 2_000_000):
    """documents → candidate near-dup pairs (id_a < id_b) via MinHash-LSH.

    Pipeline: map_batches(MinHasher) → map_batches(band explode) →
    hash-partition on band_hash → ONE vectorized bucket-scan kernel per
    partition (numpy triu pairs per bucket) → distinct pairs. The hasher
    ships as a ~1 KB instance in the task spec (task pool on warm workers;
    an actor pool here pays spin-up per invocation for state that costs
    microseconds to build).

    Pair generation deliberately avoids BOTH Ray 2.49 slow paths measured in
    this repo: groupby(bucket).map_groups (a Python dispatch per bucket) and
    Dataset.join on duplicate-heavy bucket keys (~15k rows/s). ``bucket_cap``
    bounds the O(c²) blowup of a degenerate hot bucket (e.g. empty docs)."""
    hasher = MinHasher(num_perm=num_perm, k=k, text_col=text_col, id_col=id_col)
    kw = {} if concurrency is None else {"concurrency": int(np.max(concurrency))}
    sigs = ds.map_batches(hasher, batch_format="pyarrow", **kw)
    banded = sigs.map_batches(lambda t: lsh_bands(t, bands),
                              batch_format="pyarrow")

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = (df["band_hash"].to_numpy().astype(np.uint64)
                       % np.uint64(num_partitions)).astype("int64")
        return df

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band_id", "band_hash", id_col], kind="mergesort") \
             .drop_duplicates(["band_id", "band_hash", id_col])
        bid = g["band_id"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g[id_col].to_numpy()
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        change = np.empty(len(g), dtype=bool)
        change[0] = True
        change[1:] = (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])
        starts = np.nonzero(change)[0]
        cnts = np.diff(np.append(starts, len(g)))
        out_a, out_b = [], []
        for s, c in zip(starts, cnts):
            if c < 2:
                continue
            c = min(int(c), bucket_cap)
            bi = ids[s : s + c]
            ia, ib = np.triu_indices(c, k=1)
            out_a.append(bi[ia])
            out_b.append(bi[ib])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(out_a).astype("int64"),
                             "id_b": np.concatenate(out_b).astype("int64")})

    # strategy gate (Spark-AQE style): when the banded signature table is
    # small (rows = n_docs x bands, known from parquet metadata — no extra
    # execution), the two all-to-all exchanges below cost more in barriers
    # than the whole pair generation costs in compute. Collapse to ONE
    # single-task stage (pairing + distinct in numpy); above the gate, the
    # hash-partitioned exchange path is the 100 TB shape.
    try:
        n_docs = ds.count()
    except Exception:
        n_docs = None
    if n_docs is not None and n_docs * bands <= small_gate_rows:
        def pairs_distinct(g: pd.DataFrame):
            p = bucket_pairs(g)
            if not len(p):
                yield p
                return
            a = p["id_a"].to_numpy(dtype=np.int64)
            b = p["id_b"].to_numpy(dtype=np.int64)
            if len(a) and 0 <= a.min() and max(a.max(), b.max()) < (1 << 31):
                pk = np.unique(a * np.int64(1 << 32) + b)
                p = pd.DataFrame({"id_a": (pk >> np.int64(32)),
                                  "id_b": pk & np.int64((1 << 32) - 1)})
            else:
                p = p.drop_duplicates(["id_a", "id_b"])
            # yield in chunks: the generator re-splits the single pairing
            # task's output into many blocks, so downstream stages (the
            # Jaccard verify map) parallelize again with NO extra barrier
            step = max(4096, len(p) // 64 + 1)
            for s in range(0, len(p), step):
                yield p.iloc[s : s + step]

        return (banded.repartition(1)
                .map_batches(pairs_distinct, batch_format="pandas",
                             batch_size=None))

    cand = (banded.map_batches(add_part, batch_format="pandas")
            .groupby("_part").map_groups(
                lambda g: bucket_pairs(g.drop(columns=["_part"])),
                batch_format="pandas"))
    # distinct pairs (same pair can surface from several bands)
    return hash_distinct(cand, ["id_a", "id_b"])


def referenced_docs(cand_ds, docs_ds, id_col: str = "doc_id",
                    text_col: str = "text") -> pd.DataFrame:
    """Semi-join: the docs actually referenced by candidate pairs.

    The candidate id set (≤ 2·|pairs| int64s — tiny next to the corpus) is
    collected, broadcast once via ``ray.put``, and used as a streaming filter
    over the docs Dataset; only the matching (id, text) rows ever reach the
    driver. The returned frame is bounded by the candidate count, NOT the
    corpus size — this is what makes broadcast-side verification scale."""
    import ray

    # per-batch unique then one driver-side np.unique: the driver sees only
    # per-batch distinct ids — the same bounded payload the broadcast below
    # ships anyway — and no exchange runs (a hash_distinct here paid a full
    # sort barrier to dedupe rows the driver was about to collect regardless)
    ids = cand_ds.map_batches(
        lambda df: pd.DataFrame({"_id": pd.unique(
            pd.concat([df["id_a"], df["id_b"]], ignore_index=True))}),
        batch_format="pandas").to_pandas()
    id_arr = (np.unique(ids["_id"].to_numpy(dtype=np.int64))
              if "_id" in ids.columns and len(ids) else np.empty(0, dtype=np.int64))
    id_ref = ray.put(id_arr)

    def keep_referenced(df: pd.DataFrame) -> pd.DataFrame:
        key = id_ref.hex()
        arr = _WORKER_CACHE.get(key)
        if arr is None:
            arr = _cache_put(key, ray.get(id_ref))
        if len(arr) == 0:
            return df.iloc[0:0][[id_col, text_col]]
        v = df[id_col].to_numpy(dtype=np.int64)
        pos = np.minimum(np.searchsorted(arr, v), len(arr) - 1)
        return df.loc[arr[pos] == v, [id_col, text_col]]

    return (docs_ds.select_columns([id_col, text_col])
            .map_batches(keep_referenced, batch_format="pandas").to_pandas())


def verify_pairs_jaccard(cand_ds, docs_ds, threshold: float = 0.8, k: int = 5,
                         text_col: str = "text", id_col: str = "doc_id",
                         broadcast_all_texts: bool = False):
    """Exact n-gram-Jaccard verification of candidate pairs. Only the texts
    REFERENCED by candidates are broadcast (semi-join via ``referenced_docs``
    — payload ∝ candidate count, never corpus size); the check then runs per
    batch of pairs with per-worker shingle-set caching.

    ``broadcast_all_texts=True`` is the caller-gated small-corpus fast path:
    when the whole text column fits a broadcast comfortably (the caller
    checks bytes — e.g. the parquet file size), the candidate Dataset is
    consumed ONCE, so the candidate pipeline and the verify map fuse into a
    single streaming execution (no materialize, no id-extraction pass, no
    second corpus scan). Above the gate the referenced-texts path is the
    100 TB shape."""
    import ray

    if broadcast_all_texts:
        # Pre-hash every doc's sorted shingle array in ONE distributed pass
        # and broadcast the arrays, not the texts. Hashing in the verify UDF
        # itself serializes the whole corpus's md5 work into the single fused
        # pairing+verify task (measured: 5.2 s of the 5.5 s face at sf0.1 —
        # exactly the work the signature stage parallelizes in 0.3 s). The
        # broadcast is ~8 bytes/char; the caller's byte gate bounds it.
        def sh_arrays(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                id_col: df[id_col].to_numpy(),
                "_sh": [np.sort(a) for a in
                        _hash_shingles_batch(df[text_col].fillna(""), k)]})

        # Break operator fusion AND re-split: fused, the verify runs inside
        # the single pairing task (256k candidate pairs ≈ 2.9 s serial at
        # sf0.1), and the pairing task's yielded chunks coalesce into one
        # block anyway (min-block-size merging). Materialize the small pair
        # set (bounded by bucket_cap) and re-split it so verify fans out;
        # with pre-hashed arrays the broadcast is zero-copy per worker, so
        # the fan-out duplicates no hashing work.
        sh = docs_ds.map_batches(sh_arrays, batch_format="pandas").to_pandas()
        lookup_ref = ray.put(dict(zip(sh[id_col], sh["_sh"])))
        prehashed = True
        cand_ds = cand_ds.materialize()
        n_split = min(64, max(1, cand_ds.count() // 4096))
        if n_split > cand_ds.num_blocks():
            cand_ds = cand_ds.repartition(n_split)
    else:
        # the candidate Dataset is consumed twice (id extraction below, then
        # the verify map at the end); without this pin Ray re-executes the
        # entire lazy candidate pipeline — signatures, banding, bucket
        # shuffle — a second time. Pairs are bounded by candidate count
        # (bucket_cap caps the O(c²) tail), and materialize() keeps blocks in
        # the object store, never on the driver, so this stays scale-safe.
        cand_ds = cand_ds.materialize()
        docs = referenced_docs(cand_ds, docs_ds, id_col=id_col, text_col=text_col)
        lookup_ref = ray.put(dict(zip(docs[id_col], docs[text_col])))
        prehashed = False
    _EMPTY_SH = np.empty(0, dtype=np.uint64)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        ck = lookup_ref.hex() + f":harr{k}"
        arrs = _WORKER_CACHE.get(ck)
        if arrs is None:  # doc → sorted distinct shingle-hash array, per worker
            arrs = _cache_put(ck, {})

        def _arr(i) -> np.ndarray:
            if prehashed:
                return lookup.get(i, _EMPTY_SH)
            a = arrs.get(i)
            if a is None:
                a = arrs[i] = np.sort(_hash_shingles(lookup.get(i, ""), k))
            return a

        # Vectorized exact Jaccard over 64-bit shingle hashes (collision
        # probability ~n²/2⁶⁴ per pair — immaterial next to the 1e-6 rounding
        # used downstream). Per-pair Python set intersection costs ~30 µs;
        # grouping the batch by id_a and running ONE searchsorted of A against
        # the concatenation of all its partners makes the inner loop numpy.
        ia = df["id_a"].to_numpy()
        ib = df["id_b"].to_numpy()
        sims = np.empty(len(df), dtype=np.float64)
        order = np.argsort(ia, kind="stable")
        ua, starts = np.unique(ia[order], return_index=True)
        bounds = np.append(starts, len(order))
        for u, s, e in zip(ua, bounds[:-1], bounds[1:]):
            rows = order[s:e]
            A = _arr(u)
            parts = [_arr(x) for x in ib[rows]]
            lens = np.fromiter((len(p) for p in parts), dtype=np.int64,
                               count=len(parts))
            if len(A) == 0:
                sims[rows] = np.where(lens == 0, 1.0, 0.0)
                continue
            cat = (np.concatenate(parts) if len(parts) > 1 else
                   (parts[0] if parts else np.empty(0, dtype=np.uint64)))
            pos = np.minimum(np.searchsorted(A, cat), len(A) - 1)
            hit = (A[pos] == cat).astype(np.int64)
            seg = np.zeros(len(parts), dtype=np.int64)
            if len(cat):
                ends = np.cumsum(lens)
                csum = np.concatenate(([0], np.cumsum(hit)))
                seg = csum[ends] - csum[ends - lens]
            union = len(A) + lens - seg
            sims[rows] = np.where(union > 0, seg / np.maximum(union, 1), 1.0)
        df = df.copy()
        df["jaccard"] = sims
        return df[df["jaccard"] >= threshold]

    return cand_ds.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact n-gram-Jaccard similarity join (prefix filtering)
# ---------------------------------------------------------------------------
# per-worker-process cache for broadcast objects, keyed by ObjectRef hex —
# a task fn deserializes its instance per task, so instance attributes can't
# hold the resolved broadcast; this keeps the ray.get to one per worker.
# Bounded (FIFO evict) so long-lived workers don't leak dead broadcasts
# across successive queries: at most a handful of refs are live per stage.
_WORKER_CACHE: dict = {}
_WORKER_CACHE_MAX = 8


def _cache_put(key, value):
    while len(_WORKER_CACHE) >= _WORKER_CACHE_MAX:
        _WORKER_CACHE.pop(next(iter(_WORKER_CACHE)))
    _WORKER_CACHE[key] = value
    return value
def _hash_shingles(text: str, k: int) -> np.ndarray:
    """Distinct k-gram hashes (uint64) of a doc, unsorted."""
    sh = _shingles(text, k)
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
         for s in sh),
        dtype=np.uint64, count=len(sh))


def _hash_shingles_batch(texts, k: int) -> list[np.ndarray]:
    """Per-doc distinct k-gram hashes for a whole BATCH, factorized: shingles
    repeat heavily across documents (Zipf — shared boilerplate, near-dups),
    so a C-level factorize over the batch's flattened grams runs the blake2b
    loop once per DISTINCT gram and a take scatters the hashes back. Same
    values as mapping :func:`_hash_shingles` per doc, ~|distinct|/|total| of
    the Python-loop cost."""
    per_doc = [_shingles(t, k) for t in texts]
    lens = np.fromiter((len(p) for p in per_doc), dtype=np.int64,
                       count=len(per_doc))
    flat = np.asarray([s for p in per_doc for s in p], dtype=object)
    if not len(flat):
        return [np.empty(0, dtype=np.uint64) for _ in per_doc]
    import pandas as pd

    codes, uniques = pd.factorize(flat, use_na_sentinel=False)
    b2 = hashlib.blake2b
    uh = np.empty(len(uniques), dtype=np.uint64)
    for i, s in enumerate(uniques):
        uh[i] = int.from_bytes(b2(s.encode(), digest_size=8).digest(),
                               "little")
    hs = uh[codes]
    offs = np.concatenate(([0], np.cumsum(lens)))
    return [hs[offs[i]:offs[i + 1]] for i in range(len(per_doc))]


class Shingler:
    """Actor-pool stage: doc → its prefix shingle hashes under a global order.

    Exact set-similarity-join candidate generation (Chaudhuri/Bayardo prefix
    filtering): hash each distinct k-gram to uint64, order by a GLOBAL total
    order, and emit only the first ``n - ceil(t·n) + 1``. Any pair with
    Jaccard ≥ t has overlap ≥ t·max(|A|,|B|) (J = I/(|A|+|B|-I) ≥ t ⟹
    I ≥ t·|A∪B| ≥ t·max), and the prefix lemma (Chaudhuri SSJoin) says two
    sets with overlap ≥ α always share an element within their first
    |X| - α + 1 elements; α = ceil(t·max) ≥ ceil(t·|X|) for BOTH sides, so
    the symmetric t·n prefix has guaranteed recall (unlike MinHash-LSH,
    which is probabilistic). PPJoin's positional filter would prune further;
    we stop at the prefix + size filters.

    The global order is **rarest-first**: (doc-frequency, hash) with frequency
    looked up in a broadcast hot-shingle table (absent ⇒ 0). ANY consistent
    total order preserves exactness; rarest-first shrinks bucket sizes by
    orders of magnitude because globally hot shingles sink to the suffix and
    almost never enter a prefix. Only the hot tail is broadcast, so the state
    stays small at any corpus size."""

    def __init__(self, k: int = 8, threshold: float = 0.5,
                 text_col: str = "text", id_col: str = "doc_id",
                 hot_ref=None):
        self.k, self.t = k, threshold
        self.text_col, self.id_col = text_col, id_col
        self.hot_ref = hot_ref  # broadcast ObjectRef, resolved per worker

    def _hot(self) -> dict:
        if self.hot_ref is None:
            return {}
        key = self.hot_ref.hex()
        d = _WORKER_CACHE.get(key)
        if d is None:
            import ray

            d = _cache_put(key, ray.get(self.hot_ref))
        return d

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_id, out_sh, out_sz, out_pos = [], [], [], []
        hot = self._hot()
        batch_hs = _hash_shingles_batch(df[self.text_col].fillna(""), self.k)
        for i, hs in zip(df[self.id_col].to_numpy(), batch_hs):
            n = len(hs)
            if hot:
                # the broadcast hot table is keyed by SIGNED int64 (the count
                # pass stores hashes as int64) — look up the wrapped value or
                # every hash with the high bit set silently misses and its
                # demotion is lost (measured: 3859-doc prefix buckets at sf0.1)
                freq = np.fromiter(
                    (hot.get(int(h), 0) for h in hs.astype(np.int64)),
                    dtype=np.int64, count=n)
                hs = hs[np.lexsort((hs, freq))]
            else:
                hs = np.sort(hs)
            prefix = n - int(np.ceil(self.t * n)) + 1
            hs = hs[:max(prefix, 1)]
            out_id.extend([i] * len(hs))
            out_sh.extend(hs.astype("int64"))
            out_sz.extend([n] * len(hs))
            # position within the doc's GLOBALLY-ordered shingle list —
            # feeds the PPJoin positional filter at pair generation
            out_pos.extend(range(len(hs)))
        return pd.DataFrame({self.id_col: np.asarray(out_id, dtype="int64"),
                             "sh": np.asarray(out_sh, dtype="int64"),
                             "set_size": np.asarray(out_sz, dtype="int64"),
                             "pos": np.asarray(out_pos, dtype="int64")})


def jaccard_similarity_join(ds, threshold: float = 0.5, k: int = 8,
                            text_col: str = "text", id_col: str = "doc_id",
                            concurrency=None, hot_min: int = 4,
                            num_partitions: int = 32):
    """EXACT all-pairs n-gram-Jaccard join: every pair with Jaccard ≥ t, no
    misses (vs the probabilistic MinHash-LSH path in
    :func:`minhash_lsh_candidates`).

    Pipeline (two passes over the docs, both streaming):
      1. shingle-frequency pass: all hashes → groupby count → hot tail
         (freq ≥ hot_min) collected + broadcast (small by construction).
      2. map_batches(Shingler actor pool, rarest-first order) → **hash
         self-join on the prefix hash** (vectorized pair generation — a
         map_groups here would pay one Python call per bucket) → size filter
         |A| ≥ t·|B| → distinct pairs → exact Jaccard verify on broadcast
         texts. The shuffle moves prefix hashes, never text."""
    import ray

    def all_hashes(df: pd.DataFrame) -> pd.DataFrame:
        hs = [a.astype("int64") for a in
              _hash_shingles_batch(df[text_col].fillna(""), k)]
        return pd.DataFrame({"sh": np.concatenate(hs) if hs else
                             np.array([], dtype="int64")})

    counts = hash_count(ds.map_batches(all_hashes, batch_format="pandas"),
                        ["sh"], num_partitions)
    from maritime_activity_reports_cdc_ray.functions.kernels import \
        dataset_to_pandas

    # dataset_to_pandas: a corpus with NO hot shingles yields only empty
    # blocks, and Ray 2.49's plain to_pandas() would drop the columns
    hot_df = dataset_to_pandas(counts.map_batches(
        lambda df: df[df["cnt"] >= hot_min], batch_format="pandas"))
    hot_ref = ray.put(dict(zip(hot_df["sh"].astype(int), hot_df["cnt"].astype(int))))

    kw = {} if concurrency is None else {"concurrency": int(np.max(concurrency))}
    sigs = ds.map_batches(
        Shingler(k=k, threshold=threshold, text_col=text_col, id_col=id_col,
                 hot_ref=hot_ref),
        batch_format="pandas", **kw,
    )

    # pair generation: hash-partition prefix rows by shingle, then ONE
    # vectorized map_groups call per partition (numpy bucket scan inside).
    # Neither groupby(sh).map_groups (a Python dispatch per bucket — tens of
    # thousands) nor Dataset.join on the bucket key (Ray 2.49's hash join
    # runs ~15k rows/s on duplicate-heavy keys) is acceptable here.
    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["part"] = (df["sh"].to_numpy().astype(np.uint64)
                      % np.uint64(num_partitions)).astype("int64")
        return df

    def gen_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("sh", kind="mergesort")
        sh = g["sh"].to_numpy()
        ids = g[id_col].to_numpy()
        sz = g["set_size"].to_numpy()
        pos = g["pos"].to_numpy()
        _, starts, cnts = np.unique(sh, return_index=True, return_counts=True)
        out_a, out_b = [], []
        out_pa, out_pb, out_sa = [], [], []
        sel = cnts >= 2  # skip singleton buckets WITHOUT a Python iteration
        for s, c in zip(starts[sel], cnts[sel]):
            bi = ids[s : s + c]
            bs = sz[s : s + c]
            bp = pos[s : s + c]
            ia, ib = np.triu_indices(c, k=1)
            sa_, sb_ = bs[ia], bs[ib]
            lo = np.minimum(sa_, sb_)
            hi = np.maximum(sa_, sb_)
            m = lo + 1e-9 >= threshold * hi  # J ≥ t ⟹ min ≥ t·max
            pa_, pb_ = bp[ia][m], bp[ib][m]
            a0, b0 = bi[ia][m], bi[ib][m]
            sa0, sb0 = sa_[m], sb_[m]
            sw = a0 > b0
            out_a.append(np.where(sw, b0, a0))
            out_b.append(np.where(sw, a0, b0))
            # carry only the POSITIONAL-FILTER REMNANTS, not raw positions:
            # ra = |A|-i-1 (elements after the shared one in A), rb likewise,
            # s = |A|+|B| — 3 int32s/row through the exchange instead of 4
            # int64 position/size columns
            out_pa.append(np.where(sw, sb0 - pb_, sa0 - pa_) - 1)
            out_pb.append(np.where(sw, sa0 - pa_, sb0 - pb_) - 1)
            out_sa.append(sa0 + sb0)
        cols = ["id_a", "id_b", "ra", "rb", "s"]
        if not out_a:
            return pd.DataFrame({c: pd.Series(
                dtype="int64" if c in ("id_a", "id_b") else "int32")
                for c in cols})
        # partition-local combiner before the per-pair reduce: a dup cluster
        # shares hundreds of prefix shingles, so the same pair is emitted
        # once per shared shingle — one row per pair carrying the remnants
        # of its earliest-seen shared element (min position == max remnant;
        # the argmins coincide on both sides because shared elements appear
        # in the same relative order under the shared global order)
        a = np.concatenate(out_a).astype(np.int64)
        b = np.concatenate(out_b).astype(np.int64)
        ra = np.concatenate(out_pa).astype(np.int32)
        rb = np.concatenate(out_pb).astype(np.int32)
        s = np.concatenate(out_sa).astype(np.int32)
        if len(a) and 0 <= a.min() and max(a.max(), b.max()) < (1 << 31):
            pk = a * np.int64(1 << 32) + b
            order = np.argsort(pk, kind="mergesort")
            pk_s = pk[order]
            starts = np.flatnonzero(
                np.concatenate(([True], pk_s[1:] != pk_s[:-1])))
            return pd.DataFrame({
                "id_a": (pk_s[starts] >> np.int64(32)),
                "id_b": pk_s[starts] & np.int64((1 << 32) - 1),
                "ra": np.maximum.reduceat(ra[order], starts),
                "rb": np.maximum.reduceat(rb[order], starts),
                "s": s[order][starts]})
        return (pd.DataFrame({"id_a": a, "id_b": b, "ra": ra, "rb": rb,
                              "s": s})
                .groupby(["id_a", "id_b"], as_index=False)
                .agg(ra=("ra", "max"), rb=("rb", "max"), s=("s", "min")))

    from maritime_activity_reports_cdc_ray.functions.stats import hash_agg

    cand = (sigs.map_batches(add_part, batch_format="pandas")
            .groupby("part").map_groups(gen_pairs, batch_format="pandas"))
    agg = hash_agg(cand, ["id_a", "id_b"],
                   {"ra": ("ra", "max"), "rb": ("rb", "max"),
                    "s": ("s", "min")},
                   num_partitions=num_partitions)

    def pos_filter(df: pd.DataFrame) -> pd.DataFrame:
        # PPJoin positional filter (Xiao et al. 2008), exact: both docs'
        # shingle lists follow the SAME global (freq, hash) total order, so
        # the pair's FIRST both-prefix-shared element (global min position
        # (i*, j*) — any earlier shared element would itself sit inside both
        # prefixes, contradiction) bounds the true overlap by
        # 1 + min(|A|-i*-1, |B|-j*-1) = 1 + min(max ra, max rb); J ≥ t needs
        # overlap ≥ t(|A|+|B|)/(1+t). The bound overestimates only — every
        # qualifying pair passes (guaranteed recall preserved); sub-threshold
        # pairs whose shared shingles all sit deep in the prefixes are
        # pruned BEFORE the exact-verify stage (measured at sf0.1: 5.98M →
        # 3.4M candidates, verify ~1.8x faster).
        ub = 1 + np.minimum(df["ra"].to_numpy(), df["rb"].to_numpy())
        s_ = df["s"].to_numpy()
        keep = ub + 1e-9 >= threshold * s_ / (1.0 + threshold)
        return df.loc[keep, ["id_a", "id_b"]]

    uniq = agg.map_batches(pos_filter, batch_format="pandas")
    out = verify_pairs_jaccard(uniq, ds, threshold=threshold, k=k,
                               text_col=text_col, id_col=id_col)

    def rnd(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        y = df["jaccard"].to_numpy(dtype=np.float64) * 1e6
        df["jaccard"] = np.copysign(np.floor(np.abs(y) + 0.5), y) / 1e6
        return df

    return out.map_batches(rnd, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
class SimHasher:
    """64-bit SimHash over word tokens (actor-pool stage).

    Word hash = ``md5_u64`` (SQL-reproducible; cached per actor — natural-
    language vocabularies are tiny relative to token streams), bit votes
    weighted +1/-1 over ALL word occurrences (duplicates count), sign → bit.
    A DuckDB oracle recomputes the exact value with ``regexp_extract_all``
    token split + the same md5-derived hash + per-bit-position sums."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self._cache: dict = {}

    def simhash64(self, text: str) -> int:
        words = text.lower().split()
        if not words:
            return 0
        cache = self._cache
        md5 = hashlib.md5
        hs = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            v = cache.get(w)
            if v is None:
                if len(cache) > 2_000_000:
                    cache.clear()
                v = cache[w] = int.from_bytes(md5(w.encode("utf-8", "surrogatepass")).digest()[:8], "big")
            hs[i] = v
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def batch_simhash(self, text: pa.Array | pa.ChunkedArray) -> np.ndarray:
        """int64 simhash per doc, one vectorized pass for the whole batch:
        Arrow whitespace tokenize (``str.split()`` semantics), md5 once per
        dictionary-distinct word, per-unique 64-bit matrix gathered to
        tokens, per-doc bit votes via one ``np.add.reduceat``. Same
        arithmetic as :meth:`simhash64` (pinned by tests + SQL oracle)."""
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if text.type != pa.string():
            text = text.cast(pa.string())
        la = pc.utf8_split_whitespace(pc.utf8_lower(pc.fill_null(text, "")))
        flat = la.flatten()
        off = la.offsets.to_numpy()
        rows = np.repeat(np.arange(len(la), dtype=np.int64), np.diff(off))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not keep.all():
            rows = rows[keep]
            flat = flat.filter(pa.array(keep))
        n = len(la)
        out = np.zeros(n, dtype=np.uint64)
        if not len(rows):
            return out.astype("int64")
        from maritime_activity_reports_cdc_ray.functions.kernels import dict_encode_md5

        _, codes, uh = dict_encode_md5(flat)
        shifts = np.arange(64, dtype=np.uint64)[None, :]
        bits_u = ((uh[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        bits = bits_u[codes]  # (total_tokens, 64)
        n_tok = np.bincount(rows, minlength=n).astype(np.int64)
        nonempty = n_tok > 0
        starts = np.r_[np.int64(0), np.cumsum(n_tok)[:-1]]
        # zero-row pad: a trailing empty segment's boundary (== len(rows))
        # stays valid for reduceat without corrupting the last real segment
        bits = np.vstack([bits, np.zeros((1, 64), dtype=np.int64)])
        ones = np.add.reduceat(bits, starts, axis=0)  # (n, 64)
        v = 2 * ones - n_tok[:, None]  # vote sum = ones - zeros
        sig = ((v > 0).astype(np.uint64)
               << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
        out[nonempty] = sig[nonempty]
        return out.astype("int64")

    def __call__(self, batch):
        if isinstance(batch, pa.Table):
            return pa.table({
                self.id_col: batch.column(self.id_col),
                "simhash": pa.array(self.batch_simhash(
                    batch.column(self.text_col))),
            })
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "simhash": self.batch_simhash(
                pa.array(batch[self.text_col], pa.string(), from_pandas=True)),
        })


def simhash_candidates(ds, max_hamming: int = 3, bands: int = 4,
                       text_col: str = "text", id_col: str = "doc_id",
                       concurrency=None, driver_sigs_limit: int = 200_000):
    """Near-dup candidates with Hamming distance <= max_hamming, using the
    banded pigeonhole trick: split 64 bits into ``bands`` chunks; any pair
    within distance < bands shares at least one exact chunk → bucket groupby.
    With ``bands > max_hamming`` the candidate set is therefore EXACT (every
    qualifying pair is found — pigeonhole, not probability), which is how the
    driver query runs it (bands=9, max_hamming=8) so a plain all-pairs
    Hamming filter in SQL is a sound oracle. Task-pool signature stage (see
    minhash_lsh_candidates).

    Size gate: signatures are 16 bytes/doc, so up to ``driver_sigs_limit``
    docs the banded pair scan runs as ONE driver-side numpy kernel (the
    hashing stage — the CPU-heavy part — stays distributed; only (id, sig)
    rows are collected). Past the gate, the partitioned path hash-exchanges
    (band, chunk) buckets — two small shuffles whose fixed barrier cost the
    small path exists to avoid. Both paths run the identical bucket kernel
    (path-equivalence pinned by test)."""
    kw = {} if concurrency is None else {"concurrency": int(np.max(concurrency))}
    sigs = ds.map_batches(SimHasher(text_col=text_col, id_col=id_col),
                          batch_format="pyarrow", **kw)

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

    # pair generation: hash-partition (band, chunk) buckets, then ONE
    # vectorized kernel per partition that walks its buckets with numpy —
    # NOT groupby(band,chunk).map_groups, which pays a ~ms Python dispatch
    # per bucket (every doc makes `bands` buckets ⇒ ~bands·n dispatches).
    n_parts = 16

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        key = (df["band_id"].to_numpy().astype(np.uint64) * np.uint64(1099511628211)
               + df["chunk"].to_numpy().astype(np.uint64))
        df["_part"] = (key % np.uint64(n_parts)).astype("int64")
        return df

    def popcount64(x: np.ndarray) -> np.ndarray:
        return np.unpackbits(x.astype(np.uint64).view(np.uint8)) \
            .reshape(len(x), 8 * 8).sum(axis=1).astype(np.int64)

    def bucket_pairs(g: pd.DataFrame, cap: int = 1024) -> pd.DataFrame:
        g = g.sort_values(["band_id", "chunk", id_col], kind="mergesort") \
             .drop_duplicates(["band_id", "chunk", id_col])
        key = (g["band_id"].to_numpy().astype(np.uint64) << np.uint64(56)) \
            | g["chunk"].to_numpy().astype(np.uint64)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        _, starts, cnts = np.unique(key, return_index=True, return_counts=True)
        out_a, out_b, out_h = [], [], []
        for s, c in zip(starts, cnts):
            if c < 2:
                continue
            c = min(int(c), cap)  # hot-bucket cap: O(cap²) bound per bucket
            bi, bs = ids[s : s + c], sh[s : s + c]
            ia, ib = np.triu_indices(c, k=1)
            ham = popcount64(bs[ia] ^ bs[ib])
            m = ham <= max_hamming
            out_a.append(bi[ia][m])
            out_b.append(bi[ib][m])
            out_h.append(ham[m])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "hamming": pd.Series(dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(out_a).astype("int64"),
                             "id_b": np.concatenate(out_b).astype("int64"),
                             "hamming": np.concatenate(out_h)})

    sigs = sigs.materialize()
    if sigs.count() <= driver_sigs_limit:
        import ray.data as rd

        pairs = bucket_pairs(explode(sigs.to_pandas()))
        out = pairs.groupby(["id_a", "id_b"], as_index=False,
                            sort=False)["hamming"].min()
        return rd.from_pandas(out)

    cand = (sigs.map_batches(explode, batch_format="pandas")
            .map_batches(add_part, batch_format="pandas")
            .groupby("_part").map_groups(
                lambda g: bucket_pairs(g.drop(columns=["_part"])),
                batch_format="pandas"))

    # per-pair min hamming via partition-local reduce (see hash_distinct note)
    def local(df: pd.DataFrame) -> pd.DataFrame:
        d = df.groupby(["id_a", "id_b"], as_index=False, sort=False)["hamming"].min()
        d["_part"] = _hash_part(d, ["id_a", "id_b"], 16)
        return d

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["id_a", "id_b"], as_index=False, sort=False)["hamming"].min()

    return (cand.map_batches(local, batch_format="pandas")
            .groupby("_part").map_groups(combine, batch_format="pandas"))


# ---------------------------------------------------------------------------
# duplicate-group labeling (connected components by min-label propagation)
# ---------------------------------------------------------------------------
def label_components(pairs_df: pd.DataFrame, max_rounds: int = 20) -> pd.DataFrame:
    """(id_a, id_b) edges → (id, component) with component = min id reachable.
    Pure-pandas min-label propagation with pointer jumping (each round also
    folds in label(label(i)), so convergence is O(log diameter) rounds, same
    as the distributed variant) for driver-sized pair sets; the distributed
    equivalent is :func:`label_components_distributed`."""
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
        # pointer jumping: label values are node ids, so label-of-label is a
        # positional lookup — path-halving short-cut per round
        merged = pd.Series(
            np.minimum(merged.to_numpy(), merged.loc[merged.to_numpy()].to_numpy()),
            index=merged.index)
        if merged.equals(label):
            break
        label = merged
    return pd.DataFrame({"id": label.index.to_numpy(), "component": label.to_numpy()})


def label_components_distributed(pairs_ds, num_partitions: int = 16,
                                 max_rounds: int = 30,
                                 small_gate_rows: int = 100_000):
    """Distributed connected components over an (id_a, id_b) edge Dataset →
    (id, component) Dataset with component = min id reachable.

    Min-label propagation, one co-partitioned exchange per round — edges and
    labels are hash-partitioned on the SAME key, so the per-round "join"
    (attach each source node's current label to its outgoing edges) is a
    C-level pandas merge inside ONE kernel per partition, never Dataset.join
    (Ray 2.49's hash join is ~15k rows/s on duplicate-heavy keys) and never a
    driver-side union-find. Edges are materialized once in the object store;
    labels (one row per node) are re-materialized per round; the driver sees
    only the changed-count scalar. Rounds needed = component diameter (dup
    groups are near-cliques in practice, so 2-3).

    Strategy gate: an edge set at or under ``small_gate_rows`` is collected
    and labeled with the pandas kernel in one step — each distributed round
    costs two exchanges plus a materialize barrier, which dwarfs the label
    compute for small pair sets (a near-dup pair list is usually orders of
    magnitude smaller than the corpus that produced it).
    """
    import ray.data as rd

    _I64MAX = np.iinfo(np.int64).max

    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() <= small_gate_rows:
        pdf = pairs_ds.to_pandas()
        if not len(pdf):
            return rd.from_pandas(pd.DataFrame({"id": pd.Series(dtype="int64"),
                                                "component": pd.Series(dtype="int64")}))
        return rd.from_pandas(label_components(pdf, max_rounds=max_rounds))

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        a = df["id_a"].to_numpy(dtype=np.int64)
        b = df["id_b"].to_numpy(dtype=np.int64)
        d = pd.DataFrame({"key": np.concatenate([a, b]),
                          "dst": np.concatenate([b, a])})
        d["_part"] = _hash_part(d, ["key"], num_partitions)
        d["is_lab"] = np.int64(0)
        d["lab"] = np.int64(-1)
        return d

    edges = pairs_ds.map_batches(both_dirs, batch_format="pandas").materialize()
    edges = rd.from_pandas_refs(edges.to_pandas_refs())  # lineage cut, see rebase()
    if edges.count() == 0:
        return rd.from_pandas(pd.DataFrame({"id": pd.Series(dtype="int64"),
                                            "component": pd.Series(dtype="int64")}))

    # initial labels: per node, min(self, neighbors) — a hash_agg-style
    # two-stage min (per-batch partial → per-partition reduce)
    def init_local(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"id": df["key"],
                          "lab": np.minimum(df["key"], df["dst"])})
        d = d.groupby("id", as_index=False, sort=False)["lab"].min()
        d["_part"] = _hash_part(d, ["id"], num_partitions)
        return d

    labels = (edges.map_batches(init_local, batch_format="pandas")
              .groupby("_part").map_groups(
                  lambda g: g.groupby(["id", "_part"], as_index=False,
                                      sort=False)["lab"].min(),
                  batch_format="pandas")).materialize()

    def as_msgs(df: pd.DataFrame) -> pd.DataFrame:
        # label rows enter the exchange keyed by their own id
        return pd.DataFrame({"key": df["id"], "dst": df["id"],
                             "_part": df["_part"], "is_lab": np.int64(1),
                             "lab": df["lab"]})

    def jump_edges(df: pd.DataFrame) -> pd.DataFrame:
        # pointer jumping: a synthetic edge lab(i) → i makes i receive
        # lab(lab(i)) this round, shrinking convergence from O(diameter)
        # to O(log diameter) rounds (path-halving short-cut)
        d = df[df["lab"] != df["id"]]
        out = pd.DataFrame({"key": d["lab"], "dst": d["id"]})
        out["_part"] = _hash_part(out, ["key"], num_partitions)
        out["is_lab"] = np.int64(0)
        out["lab"] = np.int64(-1)
        return out

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        labs = g[g["is_lab"] == 1]
        eds = g[g["is_lab"] == 0]
        out = [pd.DataFrame({"id": labs["dst"], "lab": labs["lab"],
                             "old": labs["lab"]})]
        if len(eds):
            m = eds.merge(labs[["key", "lab"]], on="key", how="inner",
                          suffixes=("", "_src"))
            out.append(pd.DataFrame({"id": m["dst"], "lab": m["lab_src"],
                                     "old": np.int64(_I64MAX)}))
        d = pd.concat(out, ignore_index=True)
        d = d.groupby("id", as_index=False, sort=False).min()  # partial
        d["_part"] = _hash_part(d, ["id"], num_partitions)
        return d

    def reduce_labels(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby(["id", "_part"], as_index=False, sort=False).min()
        d["changed"] = (d["lab"] < d["old"]).astype("int64")
        return d[["id", "lab", "_part", "changed"]]

    import ray

    changed_of = ray.remote(lambda df: int(df["changed"].sum()) if "changed" in df else 0)

    # ONE streaming execution per round. Two tricks keep rounds O(1):
    # - HARD lineage cut: materialize() alone is not enough — feeding a
    #   materialized dataset through union+groupby next round copies its
    #   logical plan into the new plan, and the plan (and per-round cost)
    #   grows geometrically (measured: 1.8s → 162s by round 8 on 200 rows).
    #   Rebasing onto the materialized block refs (which stay in the object
    #   store — nothing is collected to the driver) resets the plan.
    # - the convergence check sums the changed column with tiny per-block Ray
    #   tasks over those same refs instead of a second Dataset execution.
    labels = rd.from_pandas_refs(labels.to_pandas_refs())
    for _ in range(max_rounds):
        msgs = labels.map_batches(as_msgs, batch_format="pandas")
        jumps = labels.map_batches(jump_edges, batch_format="pandas")
        exchanged = (msgs.union(jumps, edges)
                     .groupby("_part").map_groups(propagate, batch_format="pandas"))
        # propagate re-keys its partial output by id, so the second exchange
        # groups on the already-correct _part
        refs = (exchanged.groupby("_part")
                .map_groups(reduce_labels, batch_format="pandas")
                .materialize().to_pandas_refs())
        n_changed = sum(ray.get([changed_of.remote(r) for r in refs]))
        # next round's msgs/jumps simply never read the changed column
        labels = rd.from_pandas_refs(refs)
        if not n_changed:
            break

    return labels.map_batches(
        lambda df: df.rename(columns={"lab": "component"})[["id", "component"]],
        batch_format="pandas")


# ---------------------------------------------------------------------------
# training-data decontamination (word-n-gram overlap)
# ---------------------------------------------------------------------------
class WordNgramExploder:
    """Explode each document to its DISTINCT word ``n``-gram hashes (actor-pool
    stage: nothing to load, but the class keeps ``n`` and the hash cache warm
    per actor). Tokenization is ``lower().split(' ')`` with empty tokens
    dropped; documents with fewer than ``n`` tokens contribute ONE gram over
    all their tokens (and zero grams when empty) — each rule mirrored
    bit-for-bit by the SQL oracle. Gram hash = ``md5_u64`` (SQL:
    ``('0x' || substr(md5(g),1,16))::UBIGINT``), emitted int64-wrapped.

    Vectorized: one explode, shifted-array gram construction (no per-row
    Python loop); only the tiny ``< n``-token remainder uses a groupby join.
    Because one document lives wholly in one input row, the per-batch
    ``drop_duplicates`` IS the global per-doc distinct."""

    def __init__(self, n: int = 5, id_col: str = "doc_id", text_col: str = "text"):
        self.n, self.id_col, self.text_col = n, id_col, text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from maritime_activity_reports_cdc_ray.hashing import md5_u64_array

        n = self.n
        s = df[self.text_col].fillna("").str.lower().str.split(" ").reset_index(drop=True)
        ids = df[self.id_col].to_numpy()
        ex = s.explode()
        ex = ex[ex.notna() & (ex != "")]
        rows = ex.index.to_numpy(dtype=np.int64)
        toks = ex.to_numpy(dtype=object)
        out_rows: list[np.ndarray] = []
        out_grams: list[np.ndarray] = []
        if len(rows):
            cnt = np.bincount(rows, minlength=len(df))
            parts = [toks]
            m = len(rows)
            rok = np.ones(m, dtype=bool)
            for j in range(1, n):
                # shift-by-j; slots past the end (including j >= m — a batch
                # with fewer tokens than the gram width) are invalid
                pj = np.full(m, None, dtype=object)
                rj = np.full(m, -1, dtype=np.int64)
                if j < m:
                    pj[: m - j] = toks[j:]
                    rj[: m - j] = rows[j:]
                rok &= rj == rows
                parts.append(pj)
            if rok.any():
                g = parts[0][rok]
                for pj in parts[1:]:
                    g = g + " " + pj[rok]
                out_rows.append(rows[rok])
                out_grams.append(g)
            # documents with 1 <= tokens < n: one whole-doc gram
            short = (cnt > 0) & (cnt < n)
            if short.any():
                sel = short[rows]
                joined = (pd.Series(toks[sel], index=rows[sel])
                          .groupby(level=0).agg(" ".join))
                out_rows.append(joined.index.to_numpy(dtype=np.int64))
                out_grams.append(joined.to_numpy(dtype=object))
        if not out_rows:
            return pd.DataFrame({self.id_col: pd.Series(dtype="int64"),
                                 "h": pd.Series(dtype="int64")})
        r = np.concatenate(out_rows)
        g = np.concatenate(out_grams)
        d = pd.DataFrame({self.id_col: ids[r], "g": g}).drop_duplicates()
        return pd.DataFrame({
            self.id_col: d[self.id_col].to_numpy(),
            "h": md5_u64_array(d["g"].to_numpy(dtype=object)).astype(np.int64),
        })


def ngram_contamination(ds, holdout_mod: int = 97, n: int = 5,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_partitions: int = 16,
                        bloom_m: int | None = None, bloom_k: int = 4):
    """Train/eval decontamination + cross-doc duplication scan: for every
    NON-holdout document WITH AT LEAST ONE GRAM (holdout = ``id %
    holdout_mod == 0``, the eval set; empty/whitespace-only docs produce no
    grams and are absent from the report — trivially uncontaminated, but
    callers composing "keep uncontaminated" filters via semi-join must union
    them back explicitly if they should survive), count how many of its
    distinct word ``n``-grams (a) appear in any holdout document — the
    contamination signal — and (b) appear in >= 2 documents corpus-wide —
    the cross-doc duplication signal.

    Scale shape: grams explode to (doc_id, h) rows and are materialized ONCE
    (object-store blocks, reused by three consumers — never driver-side);
    the holdout gram set is tiny by construction (1/holdout_mod of the
    corpus) and flows through ``auto_join``'s row/byte gates (broadcast when
    small, partitioned hash join past the gates); the gram-frequency side is
    a combiner-first ``hash_count`` and joins back the same gated way. The
    shuffle moves (hash, count) rows, never text.

    When ``bloom_m`` is set, an ``n_bloom_shared`` column is added: the same
    holdout membership answered by a Bloom filter instead of the exact set —
    the SCALE path when even the holdout gram set outgrows the join gates.
    The filter's set-bit indices are built distributively (per-batch partial
    bits → distinct) and the collected state is bounded by ``bloom_m`` BITS
    regardless of corpus size; false positives are possible (never
    negatives), deterministic, and SQL-attested bit-for-bit."""
    import ray

    from maritime_activity_reports_cdc_ray.functions.join import auto_join
    from maritime_activity_reports_cdc_ray.functions.stats import hash_agg

    grams = ds.map_batches(WordNgramExploder(n, id_col, text_col),
                           batch_format="pandas").materialize()

    bits_ref = None
    if bloom_m is not None:
        def hold_bits(df: pd.DataFrame) -> pd.DataFrame:
            sel = df[df[id_col] % holdout_mod == 0]
            if not len(sel):
                return pd.DataFrame({"bit": pd.Series(dtype="int64")})
            pos = bloom_positions(sel["h"].to_numpy().astype(np.uint64),
                                  bloom_m, bloom_k)
            return pd.DataFrame({"bit": np.unique(pos.ravel())})

        bits = (hash_distinct(grams.map_batches(hold_bits, batch_format="pandas"),
                              ["bit"], num_partitions)
                .to_pandas()["bit"].to_numpy(dtype=np.int64))
        bits_ref = ray.put(np.sort(bits))

    hold = hash_distinct(
        grams.map_batches(lambda df: df[df[id_col] % holdout_mod == 0][["h"]],
                          batch_format="pandas"),
        ["h"], num_partitions)
    hold = hold.map_batches(
        lambda df: df.assign(in_hold=np.ones(len(df), dtype=np.int64)),
        batch_format="pandas")
    freq = hash_count(grams, ["h"], num_partitions, count_col="n_docs")

    train = grams.map_batches(lambda df: df[df[id_col] % holdout_mod != 0],
                              batch_format="pandas")
    j = auto_join(train, freq, on=["h"], num_partitions=num_partitions)
    j = auto_join(j, hold, on=["h"], how="left_outer",
                  num_partitions=num_partitions)

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        out = {
            id_col: df[id_col],
            "is_hold": df["in_hold"].fillna(0).astype("int64"),
            "is_dup": (df["n_docs"] >= 2).astype("int64"),
        }
        if bits_ref is not None:
            out["is_bloom"] = bloom_contains(
                ray.get(bits_ref), df["h"].to_numpy().astype(np.uint64),
                bloom_m, bloom_k).astype("int64")
        return pd.DataFrame(out)

    aggs = {
        "n_grams": (id_col, "count"),
        "n_holdout_shared": ("is_hold", "sum"),
        "n_dup_grams": ("is_dup", "sum"),
    }
    if bits_ref is not None:
        aggs["n_bloom_shared"] = ("is_bloom", "sum")
    per_doc = hash_agg(j.map_batches(flags, batch_format="pandas"), id_col,
                       aggs, num_partitions)
    return per_doc


# ---------------------------------------------------------------------------
# Bloom filter (approximate membership)
# ---------------------------------------------------------------------------
BLOOM_M_DEFAULT = 1 << 16  # bits
BLOOM_K_DEFAULT = 4        # hash functions


def bloom_positions(hashes: np.ndarray, m: int = BLOOM_M_DEFAULT,
                    k: int = BLOOM_K_DEFAULT) -> np.ndarray:
    """The k bit positions of each uint64 item hash: position_i =
    (h + i·(h >> 17) + i²) mod m — pure integer arithmetic on the already-
    md5_u64'd item, so a SQL oracle recomputes every bit. Returns an
    (n, k) int64 array."""
    h = hashes.astype(np.uint64)
    i = np.arange(k, dtype=np.uint64)
    pos = (h[:, None] + i[None, :] * (h[:, None] >> np.uint64(17))
           + i[None, :] * i[None, :]) % np.uint64(m)
    return pos.astype(np.int64)


def bloom_build(hashes: np.ndarray, m: int = BLOOM_M_DEFAULT,
                k: int = BLOOM_K_DEFAULT) -> np.ndarray:
    """Sorted unique SET-BIT indices of the Bloom filter over ``hashes`` —
    the mergeable form (union = merge of sorted arrays) and the broadcast
    form (searchsorted membership, no bit twiddling per probe)."""
    if not len(hashes):
        return np.empty(0, dtype=np.int64)
    return np.unique(bloom_positions(np.asarray(hashes), m, k).ravel())


def bloom_contains(bits: np.ndarray, hashes: np.ndarray,
                   m: int = BLOOM_M_DEFAULT, k: int = BLOOM_K_DEFAULT) -> np.ndarray:
    """Vectorized membership probe: True iff ALL k positions of each item
    are set (false positives possible, false negatives never)."""
    if not len(hashes):
        return np.zeros(0, dtype=bool)
    if not len(bits):
        return np.zeros(len(hashes), dtype=bool)
    pos = bloom_positions(np.asarray(hashes), m, k)
    idx = np.minimum(np.searchsorted(bits, pos), len(bits) - 1)
    return (bits[idx] == pos).all(axis=1)


# ---------------------------------------------------------------------------
# cross-document segment-level dedup (CCNet / RefinedWeb line dedup)
# ---------------------------------------------------------------------------
def _doc_segments(texts: pd.Series, seg_tokens: int):
    """Split each text into non-overlapping ``seg_tokens``-token segments.
    Tokenization is the library-wide SQL-reproducible rule —
    ``lower().split(' ')`` with empty tokens dropped. Returns
    ``(row_idx, seg_no, seg_text, seg_ntok)`` numpy arrays, rows ordered by
    (row_idx, seg_no). Fully vectorized up to the per-segment string join."""
    s = texts.fillna("").str.lower().str.split(" ").reset_index(drop=True)
    ex = s.explode()
    ex = ex[ex.notna() & (ex != "")]
    rows = ex.index.to_numpy(dtype=np.int64)
    if not len(rows):
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), np.empty(0, dtype=object), z.copy()
    toks = ex.to_numpy(dtype=object)
    # within-doc token ordinal: rows is non-decreasing (explode preserves
    # input order), so ordinal = position - first position of this row
    starts = np.searchsorted(rows, np.arange(len(s), dtype=np.int64))
    ordinal = np.arange(len(rows), dtype=np.int64) - starts[rows]
    seg = ordinal // seg_tokens
    joined = (pd.Series(toks)
              .groupby([rows, seg], sort=True).agg(" ".join))
    ntok = pd.Series(np.ones(len(rows), dtype=np.int64)) \
        .groupby([rows, seg], sort=True).sum()
    idx = joined.index
    return (idx.get_level_values(0).to_numpy(np.int64),
            idx.get_level_values(1).to_numpy(np.int64),
            joined.to_numpy(dtype=object),
            ntok.to_numpy(dtype=np.int64))


def segment_dedup(ds, seg_tokens: int = 10, max_count: int = 1,
                  id_col: str = "doc_id", text_col: str = "text",
                  num_partitions: int = 16,
                  broadcast_max_hashes: int = 5_000_000):
    """Cross-document duplicate-segment removal — CCNet §4.1 / RefinedWeb
    line-level dedup adapted to newline-free corpora: the dedup unit is a
    non-overlapping ``seg_tokens``-token chunk instead of a line. Any
    segment whose corpus-wide occurrence count exceeds ``max_count`` is
    removed from EVERY document that carries it (boilerplate removal
    semantics; within-doc repeats count toward the total).

    Scale shape: pass A explodes docs to (segment md5_u64 hash) rows — never
    text — and a combiner-first :func:`hash_count` finds duplicated hashes;
    pass B re-derives segments per input block (text never leaves its
    block), drops duplicated occurrences via a broadcast sorted-array
    membership probe, and emits per-doc metrics plus the md5 of the rebuilt
    text. The broadcast dup-hash set is bounded by the corpus's DUPLICATE
    mass, not its size; ``broadcast_max_hashes`` guards worker heaps — past
    it, shard pass B by hash range (R sub-passes each broadcasting 1/R of
    the set) rather than ever shuffling text.

    Returns one row per input doc: ``n_segs``, ``n_dup_segs`` (occurrences
    removed), ``seg_dup_frac``, ``n_tokens_kept``, ``clean_md5`` (md5 hex of
    the space-joined kept segments; md5('') when nothing survives).
    Reference analogue: silver dedupWithinBatch + boilerplate filters
    (reference silver transformations drop repeated payload rows)."""
    import hashlib

    import ray

    from maritime_activity_reports_cdc_ray.hashing import md5_u64_array

    def explode_hashes(df: pd.DataFrame) -> pd.DataFrame:
        _, _, segs, _ = _doc_segments(df[text_col], seg_tokens)
        return pd.DataFrame({"h": md5_u64_array(segs).astype(np.int64)})

    def only_dups(df: pd.DataFrame) -> pd.DataFrame:
        if "cnt" not in df.columns:  # an all-empty corpus yields bare blocks
            return pd.DataFrame({"h": pd.Series(dtype="int64")})
        return df[df["cnt"] > max_count][["h"]]

    counts = hash_count(ds.map_batches(explode_hashes, batch_format="pandas"),
                        ["h"], num_partitions)
    dup_pdf = counts.map_batches(only_dups, batch_format="pandas").to_pandas()
    dup_hashes = (np.sort(dup_pdf["h"].to_numpy(dtype=np.int64))
                  if "h" in dup_pdf.columns else np.empty(0, dtype=np.int64))
    if len(dup_hashes) > broadcast_max_hashes:
        raise ValueError(
            f"duplicate-segment set ({len(dup_hashes)}) exceeds the broadcast "
            f"gate ({broadcast_max_hashes}); shard pass B by hash range")
    dup_ref = ray.put(dup_hashes)

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        dup_sorted = ray.get(dup_ref)
        n = len(df)
        rows, _, segs, ntok = _doc_segments(df[text_col], seg_tokens)
        n_segs = np.bincount(rows, minlength=n) if len(rows) else \
            np.zeros(n, dtype=np.int64)
        if len(rows):
            h = md5_u64_array(segs).astype(np.int64)
            idx = np.searchsorted(dup_sorted, h)
            np.clip(idx, 0, max(len(dup_sorted) - 1, 0), out=idx)
            is_dup = (dup_sorted[idx] == h) if len(dup_sorted) else \
                np.zeros(len(h), dtype=bool)
            n_dup = np.bincount(rows[is_dup], minlength=n)
            kept_tok = np.bincount(rows[~is_dup], minlength=n,
                                   weights=ntok[~is_dup]).astype(np.int64)
            keep = ~is_dup
            clean = pd.Series([""] * n, dtype=object)
            if keep.any():
                j = (pd.Series(segs[keep])
                     .groupby(rows[keep], sort=True).agg(" ".join))
                clean.iloc[j.index.to_numpy()] = j.to_numpy()
        else:
            n_dup = np.zeros(n, dtype=np.int64)
            kept_tok = np.zeros(n, dtype=np.int64)
            clean = pd.Series([""] * n, dtype=object)
        md5s = clean.map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_segs": n_segs.astype("int64"),
            "n_dup_segs": n_dup.astype("int64"),
            "seg_dup_frac": np.where(n_segs > 0,
                                     n_dup / np.maximum(n_segs, 1), 0.0),
            "n_tokens_kept": kept_tok,
            "clean_md5": md5s.to_numpy(dtype=object),
        })

    return ds.map_batches(rebuild, batch_format="pandas")


# ---------------------------------------------------------------------------
# duplicate-span detection (exact substring dedup at window granularity)
# ---------------------------------------------------------------------------
class PositionalNgramExploder:
    """(doc_id, p, h) for every FULL ``w``-token window of every doc —
    the positional sibling of :class:`WordNgramExploder` (same tokenize
    rule, same md5_u64 gram hash), keeping the 1-based start position and
    every occurrence (no per-doc dedup: coverage needs positions). Docs
    with fewer than ``w`` tokens emit nothing."""

    def __init__(self, w: int = 8, id_col: str = "doc_id", text_col: str = "text"):
        self.w, self.id_col, self.text_col = w, id_col, text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from maritime_activity_reports_cdc_ray.functions.kernels import group_positions
        from maritime_activity_reports_cdc_ray.hashing import md5_u64_array

        w = self.w
        empty = pd.DataFrame({self.id_col: pd.Series(dtype="int64"),
                              "p": pd.Series(dtype="int64"),
                              "h": pd.Series(dtype="int64")})
        if not len(df):
            return empty
        s = df[self.text_col].fillna("").str.lower().str.split(" ").reset_index(drop=True)
        ids = df[self.id_col].to_numpy()
        ex = s.explode()
        ex = ex[ex.notna() & (ex != "")]
        rows = ex.index.to_numpy(dtype=np.int64)
        toks = ex.to_numpy(dtype=object)
        m = len(rows)
        if m < w:
            return empty
        # window at flat slot i is valid iff slot i+w-1 is the same doc
        ok = rows[: m - w + 1] == rows[w - 1:]
        if not ok.any():
            return empty
        g = toks[: m - w + 1].copy()
        for j in range(1, w):
            g = g + " "
            g = g + toks[j: m - w + 1 + j]
        _, _, pos = group_positions(rows)
        return pd.DataFrame({
            self.id_col: ids[rows[: m - w + 1][ok]],
            "p": pos[: m - w + 1][ok] + 1,
            "h": md5_u64_array(g[ok]).astype(np.int64),
        })


def dup_span_stats(ds, w: int = 8, id_col: str = "doc_id",
                   text_col: str = "text", num_partitions: int = 16):
    """Exact substring-duplication signal per doc (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better", at word-
    window granularity): a ``w``-token window is DUPLICATED iff its gram
    hash occurs in >= 2 distinct documents; per doc, report how many
    windows are duplicated, how many token positions they cover
    (union of [p, p+w) intervals), and how many maximal spans they merge
    into. Docs with < w tokens or no duplicated windows are absent (callers
    left-join + fill 0).

    Scale shape: the positional gram explode is O(tokens) rows of ints
    (text never leaves the first stage); duplicate detection is
    hash_distinct + combiner-first hash_count over (h, doc); the dup-hash
    set flows back through semi_join's row/byte gates (broadcast small,
    partitioned hash join large); coverage co-locates each doc's few dup
    windows by doc-hash and runs one vectorized diff kernel per partition.
    Since windows are sorted and fixed-width, covered tokens = Σ min(w, Δp)
    and span starts are Δp >= w — no interval unnesting anywhere."""
    from maritime_activity_reports_cdc_ray.functions.join import semi_join

    grams = ds.map_batches(PositionalNgramExploder(w, id_col, text_col),
                           batch_format="pandas").materialize()
    hd = hash_distinct(grams, ["h", id_col], num_partitions)
    freq = hash_count(hd, ["h"], num_partitions, count_col="n_docs")
    dup = freq.map_batches(lambda df: df[df["n_docs"] >= 2][["h"]],
                           batch_format="pandas")
    dg = semi_join(grams, dup, on="h", num_partitions=num_partitions)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[id_col, "p"]].copy()
        d["_part"] = _hash_part(d, [id_col], num_partitions)
        return d

    def coverage(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "p"])
        ids = g[id_col].to_numpy()
        p = g["p"].to_numpy(dtype=np.int64)
        first = np.empty(len(g), dtype=bool)
        first[0] = True
        first[1:] = ids[1:] != ids[:-1]
        dp = np.empty(len(g), dtype=np.int64)
        dp[0] = w
        dp[1:] = p[1:] - p[:-1]
        dp[first] = w  # doc-initial window contributes a full w
        cov = np.minimum(dp, w)
        starts = (dp >= w).astype(np.int64)
        r = pd.DataFrame({id_col: ids, "dup_tokens": cov, "dup_spans": starts})
        out = r.groupby(id_col, as_index=False, sort=False).sum()
        out["dup_windows"] = r.groupby(id_col, sort=False).size().to_numpy()
        return out[[id_col, "dup_windows", "dup_tokens", "dup_spans"]]

    return (dg.map_batches(local, batch_format="pandas")
            .groupby("_part").map_groups(coverage, batch_format="pandas"))
