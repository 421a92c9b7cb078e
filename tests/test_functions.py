"""Operator library tests: window ops, text analysis, dedup, similarity,
multimodal plumbing."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from maritime_activity_reports_cdc_ray.functions import dedup as D
from maritime_activity_reports_cdc_ray.functions import similarity as S
from maritime_activity_reports_cdc_ray.functions import text as T
from maritime_activity_reports_cdc_ray.functions import window as W


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


@pytest.fixture()
def events_df():
    return pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "user_id": [1, 1, 1, 2, 2, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 02:00",
                 "2024-01-01 00:00", "2024-01-01 00:05", "2024-01-01 00:06"]
            ),
            "event_type": ["view", "click", "view", "view", "view", "purchase"],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        }
    )


def test_per_key_lag(ray_session, events_df):
    out = W.per_key_lag(_ds(events_df), "user_id", ["ts", "event_id"],
                        {"value": "prev_value"}).to_pandas()
    u1 = out[out.user_id == 1].sort_values("ts")
    assert u1["prev_value"].tolist()[0] != u1["prev_value"].tolist()[0]  # NaN first
    assert u1["prev_value"].tolist()[1:] == [1.0, 2.0]


def test_latest_per_key(ray_session, events_df):
    out = W.latest_per_key(_ds(events_df), "user_id", ["ts", "event_id"]).to_pandas()
    assert len(out) == 2
    got = dict(zip(out.user_id, out.event_id))
    assert got == {1: 3, 2: 6}


def test_transitions(ray_session, events_df):
    out = W.transitions(_ds(events_df), "user_id", ["ts", "event_id"], "event_type").to_pandas()
    # u1: view(first), click, view → 3 transitions; u2: view(first), purchase → 2
    assert len(out[out.user_id == 1]) == 3
    assert len(out[out.user_id == 2]) == 2


def test_scd2_view(ray_session, events_df):
    out = W.scd2_view(_ds(events_df), "user_id", "ts").to_pandas()
    cur = out[out.is_current]
    assert len(cur) == 2 and set(cur.event_id) == {3, 6}
    closed = out[~out.is_current].sort_values("event_id")
    assert (closed.valid_to.notna()).all()


def test_sessionize(ray_session, events_df):
    out = W.sessionize(_ds(events_df), "user_id", "ts", gap_seconds=1800).to_pandas()
    u1 = out[out.user_id == 1].sort_values("ts")
    assert u1.session_id.tolist() == [1, 1, 2]  # 110-minute gap splits
    u2 = out[out.user_id == 2].sort_values("ts")
    assert u2.session_id.tolist() == [1, 1, 1]


def test_rank_within(ray_session, events_df):
    out = W.rank_within(_ds(events_df), "event_type", "value").to_pandas()
    views = out[out.event_type == "view"].sort_values("rnk")
    assert views.value.tolist() == [5.0, 4.0, 3.0, 1.0]
    assert views.rnk.tolist() == [1, 2, 3, 4]


def test_adjacent_pairs(ray_session, events_df):
    out = W.adjacent_pairs(_ds(events_df), "user_id", ["ts", "event_id"],
                           ["event_type", "value"]).to_pandas()
    assert len(out) == 4  # n-1 rows per user
    row = out[(out.user_id == 2) & (out.event_id == 6)].iloc[0]
    assert row["prev_event_type"] == "view" and row["prev_value"] == 5.0


def test_dataset_to_pandas_keeps_schema_on_empty(ray_session, events_df):
    # Ray 2.49's to_pandas returns a column-less (0, 0) frame for zero-row
    # datasets; the helper rebuilds the frame from the dataset schema
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.kernels import (
        dataset_to_pandas)

    single = events_df.drop_duplicates("user_id")  # every key single-row
    ds = W.adjacent_pairs(_ds(single), "user_id", ["ts", "event_id"],
                          ["event_type"])
    assert ds.to_pandas().shape[1] == 0  # the Ray quirk this guards against
    out = dataset_to_pandas(ds)
    assert len(out) == 0 and "prev_event_type" in out.columns
    assert set(single.columns) <= set(out.columns)
    # non-empty datasets pass through untouched
    full = dataset_to_pandas(rd.from_pandas(events_df))
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), events_df.reset_index(drop=True))


# ---------------------------------------------------------------- text
def test_token_counts_and_fingerprint():
    s = pd.Series(["Hello,  world! The cat.", None, ""])
    assert T.token_count(s).tolist() == [4, 0, 0]
    assert T.bpe_token_count(s).tolist() == [7, 0, 0]
    fp = T.fingerprint_md5(pd.Series(["A  b", "a b"]))
    assert fp[0] == fp[1] == hashlib.md5(b"a b").hexdigest()


def test_quality_score_tiers():
    good = " ".join(["the quick brown fox and a dog run to it for fun, that is"] * 3)
    short = "tiny text"
    df = T.quality_score(pd.DataFrame({"text": [good, short]}))
    assert df["doc_quality_score"].iloc[0] == 1.0
    assert df["doc_quality_score"].iloc[1] < 1.0


def test_lang_id():
    df = pd.DataFrame({"text": [
        "the cat and the dog in a house that is big",
        "der Hund und die Katze ist nicht ein Problem mit den",
    ]})
    out = T.LangId()(df)
    assert out["lang_pred"].tolist() == ["en", "de"]


def test_rolling_fingerprint_stable():
    fp = T.RollingFingerprint()
    df1 = fp(pd.DataFrame({"text": ["some document body here", "x"]}))
    df2 = fp(pd.DataFrame({"text": ["some document body here", "x"]}))
    assert df1["doc_fingerprint"].tolist() == df2["doc_fingerprint"].tolist()
    assert df1["doc_fingerprint"][0] != df1["doc_fingerprint"][1]


# ---------------------------------------------------------------- dedup
@pytest.fixture()
def docs_df():
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    return pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                base,
                base + " indeed",  # near-dup of 0
                "completely different content about databases and query engines and shuffles",
                base,  # exact dup of 0
                "yet another unrelated piece of text regarding maritime vessels at sea",
            ],
        }
    )


def test_exact_dedup(ray_session, docs_df):
    out = D.exact_dedup(_ds(docs_df), ["text"], [], "doc_id").to_pandas()
    assert len(out) == 4 and 3 not in set(out.doc_id)  # doc 3 dropped, doc 0 kept


def test_ngram_jaccard():
    assert D.ngram_jaccard("abcdef", "abcdef") == 1.0
    assert D.ngram_jaccard("abcdef", "uvwxyz") == 0.0


def test_group_count_small_counts_null_keys(ray_session):
    """NULL group keys are real groups in the zero-exchange label rollup
    (review regression: pandas groupby dropna silently dropped them)."""
    from maritime_activity_reports_cdc_ray.functions.stats import group_count_small

    df = pd.DataFrame({"lab": ["a", None, "a", None, "b"]})
    out = group_count_small(_ds(df), "lab", "n")
    got = {(None if pd.isna(k) else k): int(v)
           for k, v in zip(out["lab"], out["n"])}
    assert got == {"a": 2, None: 2, "b": 1}


def test_batch_signature_kernels_equal_per_doc():
    """The batch-vectorized MinHash/SimHash kernels must equal the per-doc
    reference implementations EXACTLY, including empty/whitespace-only docs
    in any batch position (a trailing empty segment once corrupted the
    preceding doc's reduceat window — regression)."""
    import pyarrow as pa

    sh = D.SimHasher()
    mh = D.MinHasher(num_perm=16, k=5)
    batches = [["a a", ""], ["", "a a"], ["x y z", "", "a a", "  "], [""],
               ["abc def ghi jkl", "qq"], ["　", "tab\twide  run"]]
    for b in batches:
        got_s = sh.batch_simhash(pa.array(b, pa.string()))
        want_s = np.array([np.uint64(sh.simhash64(t)) for t in b],
                          dtype=np.uint64).astype(np.int64)
        assert np.array_equal(got_s, want_s), b
        got_m = mh.batch_signatures(b)
        want_m = np.array([mh.signature(t) for t in b])
        assert np.array_equal(got_m, want_m), b


def test_minhash_lsh_finds_near_dups(ray_session, docs_df):
    cand = D.minhash_lsh_candidates(_ds(docs_df), num_perm=64, bands=16, concurrency=2)
    ver = D.verify_pairs_jaccard(cand, _ds(docs_df), threshold=0.7).to_pandas()
    pairs = set(zip(ver.id_a, ver.id_b))
    assert (0, 3) in pairs  # exact dup certainly survives
    assert (0, 1) in pairs or (1, 3) in pairs  # near-dup found
    assert all(p not in pairs for p in [(0, 2), (2, 4)])


def test_referenced_docs_bounded_by_candidates(ray_session, docs_df):
    # the verify-stage broadcast must ship only candidate-referenced texts,
    # never the whole corpus
    cand = _ds(pd.DataFrame({"id_a": [0, 0], "id_b": [1, 3]}))
    ref = D.referenced_docs(cand, _ds(docs_df))
    assert set(ref.doc_id) == {0, 1, 3}          # exactly the referenced ids
    assert len(ref) < len(docs_df)               # strictly less than the corpus
    empty = D.referenced_docs(_ds(pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                                "id_b": pd.Series([], dtype="int64")})),
                              _ds(docs_df))
    assert len(empty) == 0


def test_simhash_candidates(ray_session, docs_df):
    out = D.simhash_candidates(_ds(docs_df), max_hamming=3, concurrency=2).to_pandas()
    pairs = set(zip(out.id_a, out.id_b))
    assert (0, 3) in pairs
    assert out[(out.id_a == 0) & (out.id_b == 3)].hamming.iloc[0] == 0


def test_simhash_driver_path_equals_partitioned(ray_session):
    """The size-gated driver kernel and the partitioned two-shuffle path
    produce identical pair sets (both run the same bucket kernel)."""
    rng = np.random.RandomState(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = pd.DataFrame({
        "doc_id": range(60),
        "text": [" ".join(rng.choice(words, size=12)) for _ in range(60)],
    })
    key = lambda df: (df.astype("int64").sort_values(["id_a", "id_b"])
                      .reset_index(drop=True))
    a = key(D.simhash_candidates(_ds(docs), max_hamming=8, bands=9).to_pandas())
    b = key(D.simhash_candidates(_ds(docs), max_hamming=8, bands=9,
                                 driver_sigs_limit=0).to_pandas())
    assert len(a) > 0 and a.equals(b)


def test_label_components():
    pairs = pd.DataFrame({"id_a": [0, 1, 5], "id_b": [1, 3, 6]})
    lab = D.label_components(pairs).set_index("id")["component"]
    assert lab[0] == lab[1] == lab[3] == 0
    assert lab[5] == lab[6] == 5


def test_label_components_distributed_matches_pandas(ray_session):
    pairs = pd.DataFrame({"id_a": [0, 1, 5, 9, 10], "id_b": [1, 3, 6, 10, 11]})
    out = (D.label_components_distributed(_ds(pairs)).to_pandas()
           .sort_values("id").reset_index(drop=True))
    exp = D.label_components(pairs).sort_values("id").reset_index(drop=True)
    assert out.equals(exp.astype("int64"))
    # a 200-long chain exercises the pointer-jumping short-cut (plain
    # propagation would need 200 rounds; max_rounds is 30)
    chain = pd.DataFrame({"id_a": np.arange(200), "id_b": np.arange(1, 201)})
    out = D.label_components_distributed(_ds(chain)).to_pandas()
    assert (out.component == 0).all()


def test_label_components_distributed_1m_edges(ray_session):
    """1M edges generated AND labeled without ever materializing edges on the
    driver: 100k star blocks of 11 nodes each."""
    import ray.data as rd

    edges = rd.range(1_000_000).map_batches(
        lambda b: pd.DataFrame({"id_a": (b["id"] // 10) * 10,
                                "id_b": b["id"] + 1_000_000}),
        batch_format="pandas")
    lab = D.label_components_distributed(edges, num_partitions=32)
    assert lab.count() == 1_100_000
    comps = lab.map_batches(
        lambda df: pd.DataFrame({"c": df["component"].unique()}),
        batch_format="pandas")
    assert D.hash_distinct(comps, ["c"], 32).count() == 100_000


# ------------------------------------------------------------- similarity
def test_knn_brute_force(ray_session):
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 8))
    vecs[7] = vecs[3] * 2.0  # same direction as 3 → cosine 1.0
    df = pd.DataFrame({"vec_id": np.arange(50, dtype="int64"),
                       "embedding": [v.tolist() for v in vecs]})
    out = S.knn_brute_force(_ds(df), query_ids=[3], k=5).to_pandas()
    top = out.sort_values("rank").iloc[0]
    assert top.neighbor_id == 7 and abs(top.sim - 1.0) < 1e-9
    # oracle check of full top-5 by plain numpy
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = np.round(m @ m[3], 6)
    sims[3] = -np.inf
    order = np.lexsort((np.arange(50), -sims))[:5]
    assert out.sort_values("rank").neighbor_id.tolist() == order.tolist()


def test_knn_lsh_finds_planted_neighbor(ray_session):
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((80, 16))
    vecs[11] = vecs[2] + rng.standard_normal(16) * 1e-3
    df = pd.DataFrame({"vec_id": np.arange(80, dtype="int64"),
                       "embedding": [v.tolist() for v in vecs]})
    out = S.knn_lsh(_ds(df), query_ids=[2], k=5, dim=16, n_tables=6).to_pandas()
    assert 11 in set(out.neighbor_id)


# ------------------------------------------------------------- multimodal
def test_multimodal_decode_plumbing(ray_session):
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions import multimodal as M

    media = M.synthesize_media(20, seed=3)
    ds = rd.from_arrow(media)
    feats = M.decode_features(ds, concurrency=2, batch_size=8).to_pandas()
    assert len(feats) == 20
    assert len(feats.feature.iloc[0]) == 256
    assert abs(sum(feats.feature.iloc[0]) - 1.0) < 1e-9  # normalized histogram
    # determinism
    feats2 = M.decode_features(rd.from_arrow(media), concurrency=2, batch_size=8).to_pandas()
    a = feats.sort_values("media_id").payload_sha256.tolist()
    b = feats2.sort_values("media_id").payload_sha256.tolist()
    assert a == b


def test_multimodal_real_backends_stubbed():
    from maritime_activity_reports_cdc_ray.functions import multimodal as M

    with pytest.raises(NotImplementedError):
        M.ImageDecoder(backend=M.DecodeBackend.PIL)
    with pytest.raises(NotImplementedError):
        M.FrameSampler(backend=M.DecodeBackend.FFMPEG)


def test_jaccard_similarity_join_exact(ray_session, docs_df):
    out = D.jaccard_similarity_join(_ds(docs_df), threshold=0.5, k=8,
                                    concurrency=2, hot_min=2).to_pandas()
    pairs = dict(zip(zip(out.id_a, out.id_b), out.jaccard))
    assert pairs.get((0, 3)) == 1.0  # exact dup
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.5  # near-dup, guaranteed recall
    assert (1, 3) in pairs
    assert all((a, b) not in pairs for a, b in [(0, 2), (2, 4), (0, 4)])


def test_shingler_demotes_hot_shingles_with_high_bit(ray_session):
    """Regression: the hot-frequency table is keyed by SIGNED int64, so the
    Shingler must look hashes up via their int64-wrapped value — a uint64
    lookup silently misses every hash with the high bit set, the demotion is
    lost, and globally-hot shingles flood the prefixes (3859-doc buckets
    measured at sf0.1 before the fix)."""
    rng = np.random.default_rng(7)
    # one shared k-gram whose hash has the HIGH BIT set (negative as int64)
    k = 5
    shared = next(
        s for i in range(10_000)
        for s in [f"Q{i:04d}"]
        if D._hash_shingles(s, k)[0] >= np.uint64(1) << np.uint64(63)
    )
    docs = [shared + "".join(rng.choice(list("abcdefgh"), 40)) for _ in range(30)]
    df = pd.DataFrame({"doc_id": np.arange(30), "text": docs})

    # hot table exactly as jaccard_similarity_join builds it: int64 keys
    h_shared = int(D._hash_shingles(shared, k).astype(np.int64)[0])
    assert h_shared < 0  # the regression only bites on negative int64 keys
    import ray

    hot_ref = ray.put({h_shared: 30})
    sh = D.Shingler(k=k, threshold=0.8, hot_ref=hot_ref)
    out = sh(df)
    # with demotion working the shared hot shingle never enters a ~20% prefix
    assert not np.any(out["sh"].to_numpy() == h_shared)


def test_hash_distinct_and_count(ray_session):
    df = pd.DataFrame({"a": [1, 1, 2, 2, 2, 3], "b": ["x", "x", "y", "y", "z", "x"]})
    d = D.hash_distinct(_ds(df), ["a", "b"], num_partitions=4).to_pandas()
    assert len(d) == 4
    c = D.hash_count(_ds(df), ["a", "b"], num_partitions=4).to_pandas()
    got = dict(zip(zip(c.a, c.b), c.cnt))
    assert got == {(1, "x"): 2, (2, "y"): 2, (2, "z"): 1, (3, "x"): 1}


def test_cosine_dupes_exact(ray_session):
    rng = np.random.default_rng(3)
    m = rng.standard_normal((40, 16))
    m[7] = m[3] + 0.01 * rng.standard_normal(16)  # planted near-dup
    df = pd.DataFrame({"vec_id": np.arange(40, dtype="int64"),
                       "embedding": [v.astype(np.float32).tolist() for v in m]})
    out = S.cosine_dupes(_ds(df), threshold=0.95).to_pandas()
    pairs = set(zip(out.id_a, out.id_b))
    assert (3, 7) in pairs
    # exact: verify against numpy all-pairs ground truth
    mm = np.asarray([np.asarray(v, np.float64) for v in df.embedding])
    mm /= np.linalg.norm(mm, axis=1, keepdims=True)
    sims = mm @ mm.T
    truth = {(i, j) for i in range(40) for j in range(i + 1, 40) if sims[i, j] >= 0.95}
    assert pairs == truth


def test_grouped_percentiles_disc(ray_session):
    from maritime_activity_reports_cdc_ray.functions.stats import grouped_percentiles

    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 5,
                       "v": [4.0, 1.0, 3.0, 2.0, 50.0, 10.0, 30.0, 20.0, 40.0]})
    out = grouped_percentiles(_ds(df), "g", "v", [0.5, 0.9]).to_pandas()
    r = out.set_index("g")
    assert r.loc["a", "p50"] == 2.0  # PERCENTILE_DISC: index ceil(0.5*4)-1 = 1
    assert r.loc["b", "p50"] == 30.0
    assert r.loc["a", "p90"] == 4.0
    assert r.loc["b", "p90"] == 50.0
    assert r.loc["a", "n"] == 4 and r.loc["b", "n"] == 5


def test_knn_ivf_finds_planted_neighbor(ray_session):
    rng = np.random.default_rng(5)
    m = rng.standard_normal((300, 16))
    m[42] = m[0] + 0.01 * rng.standard_normal(16)  # near-dup of query 0
    df = pd.DataFrame({"vec_id": np.arange(300, dtype="int64"),
                       "embedding": [v.astype(np.float32).tolist() for v in m]})
    out = S.knn_ivf(_ds(df), query_ids=[0], k=5, n_lists=8, nprobe=3).to_pandas()
    assert out.iloc[0]["neighbor_id"] == 42  # planted neighbor ranks first
    assert out["rank"].tolist() == list(range(1, len(out) + 1))


def test_auto_join_broadcast_matches_shuffle(ray_session):
    from maritime_activity_reports_cdc_ray.functions import join as J

    big = pd.DataFrame({"k": [1, 2, 2, 3, 5], "x": [10, 20, 21, 30, 50]})
    small = pd.DataFrame({"kk": [1, 2, 3, 4], "y": ["a", "b", "c", "d"]})

    def run(ds):
        return ds.to_pandas().sort_values(["k", "x"]).reset_index(drop=True)

    # broadcast path (small side under the threshold)
    bc = run(J.auto_join(_ds(big), _ds(small), on=["k"], right_on=["kk"],
                         broadcast_limit_rows=100))
    # shuffle path (threshold forces Dataset.join)
    sh = run(J.auto_join(_ds(big), _ds(small), on=["k"], right_on=["kk"],
                         broadcast_limit_rows=0, num_partitions=2))
    exp = big.merge(small, left_on="k", right_on="kk")
    assert len(bc) == len(exp) == len(sh)
    pd.testing.assert_frame_equal(
        bc[["k", "x", "y"]],
        exp.sort_values(["k", "x"]).reset_index(drop=True)[["k", "x", "y"]])
    pd.testing.assert_frame_equal(bc[["k", "x", "y"]],
                                  sh[["k", "x", "y"]].astype(bc[["k", "x", "y"]].dtypes))


def test_broadcast_join_left_and_select(ray_session):
    from maritime_activity_reports_cdc_ray.functions import join as J

    big = pd.DataFrame({"k": [1, 2, 9], "x": [1.0, 2.0, 9.0]})
    small = pd.DataFrame({"k": [1, 2], "y": ["a", "b"]})
    out = J.broadcast_join(_ds(big), small, on=["k"], how="left",
                           select=["k", "y"]).to_pandas().sort_values("k")
    assert out["y"].tolist()[:2] == ["a", "b"] and pd.isna(out["y"].iloc[2])
    assert list(out.columns) == ["k", "y"]


def test_md5_hash_sample_deterministic(ray_session):
    import hashlib

    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.sample import md5_hash_sample

    ds = rd.range(2000).map_batches(
        lambda df: df.rename(columns={"id": "doc_id"}), batch_format="pandas")
    got = sorted(md5_hash_sample(ds, "doc_id", keep_hex=("0", "1"))
                 .to_pandas().doc_id)
    exp = [i for i in range(2000)
           if hashlib.md5(str(i).encode()).hexdigest()[0] in ("0", "1")]
    assert got == exp and 0 < len(got) < 2000
    # rerun → identical sample (no RNG)
    again = sorted(md5_hash_sample(ds, "doc_id", keep_hex=("0", "1"))
                   .to_pandas().doc_id)
    assert again == got


def test_topk_per_group_row_number_semantics(ray_session):
    import pandas as pd
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.window import topk_per_group

    df = pd.DataFrame({
        "g": ["x"] * 4 + ["y"] * 2,
        "v": [5, 5, 3, 9, 1, 1],          # ties broken by id
        "id": [2, 1, 3, 4, 10, 11],
    })
    out = topk_per_group(rd.from_pandas(df), "g", "v", "id", k=2).to_pandas()
    out = out.sort_values(["g", "rn"]).reset_index(drop=True)
    assert list(zip(out.g, out.id, out.rn)) == [
        ("x", 4, 1), ("x", 1, 2),          # 9 first, then tie 5/5 → id 1
        ("y", 10, 1), ("y", 11, 2),
    ]


def test_top_terms_counts_and_tiebreak(ray_session):
    import pandas as pd
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.text import top_terms

    docs = pd.DataFrame({"text": [
        "b b a  a", "c B a", None, "the the the zz",
    ]})
    out = top_terms(rd.from_pandas(docs), "text",
                    stopwords=("the",), limit=3)
    # a:3 (case-folded, double-space empty dropped), b:3, c:1/zz:1 → term asc
    assert list(zip(out.term, out.cnt)) == [("a", 3), ("b", 3), ("c", 1)]


def test_asof_join_backward_ties_and_missing(ray_session):
    import pandas as pd
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.join import asof_join

    left = pd.DataFrame({
        "user": [1, 1, 2, 3],
        "t": [5, 2, 4, 7],
        "lid": [100, 101, 102, 103],
    })
    right = pd.DataFrame({
        "user": [1, 1, 1, 2],
        "t": [2, 2, 4, 9],          # (1,2) duplicated: tie → max rid
        "rid": [7, 9, 8, 5],
        "rv": [0.7, 0.9, 0.8, 0.5],
    })
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    by="user", on="t", tie_cols=["rid"]).to_pandas()
    got = {int(r.lid): (None if pd.isna(r.rid) else int(r.rid)) for r in out.itertuples()}
    assert got == {
        100: 8,    # t=5 → right t=4
        101: 9,    # t=2 → tie at t=2 resolves to max rid
        102: None, # user 2: only right t=9 > 4
        103: None, # user 3: no right rows at all
    }
    assert len(out) == len(left)


def test_range_join_broadcast_overlap_and_left(ray_session):
    import pandas as pd
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.join import range_join_broadcast

    big = pd.DataFrame({"id": [1, 2, 3, 4], "v": [5.0, 15.0, 15.0, 99.0]})
    bands = pd.DataFrame({"band": ["a", "b", "overlap"],
                          "lo": [0.0, 10.0, 12.0], "hi": [10.0, 20.0, 18.0]})
    inner = range_join_broadcast(rd.from_pandas(big), bands, "v", "lo", "hi").to_pandas()
    got = sorted(zip(inner.id, inner.band))
    # v=15 matches BOTH b and overlap (fan-out); v=99 matches nothing
    assert got == [(1, "a"), (2, "b"), (2, "overlap"), (3, "b"), (3, "overlap")]
    left = range_join_broadcast(rd.from_pandas(big), bands, "v", "lo", "hi",
                                how="left").to_pandas()
    assert len(left) == 6
    assert left[left.id == 4].band.isna().all()


def test_window_expand_hopping_tumbling_degenerate(ray_session):
    import pandas as pd
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.window import window_expand_hopping

    df = pd.DataFrame({"ts": [0, 5, 10, 15], "v": [1, 2, 3, 4]})
    # size == hop → tumbling: one copy per row
    tumb = window_expand_hopping(rd.from_pandas(df), "ts", 10, 10).to_pandas()
    assert len(tumb) == 4
    assert sorted(tumb.window_start_us) == [0, 0, 10, 10]
    # size = 2*hop → each row in exactly two windows
    hop = window_expand_hopping(rd.from_pandas(df), "ts", 20, 10).to_pandas()
    assert len(hop) == 8
    r5 = sorted(hop[hop.v == 2].window_start_us)
    assert r5 == [-10, 0]  # ts=5 covered by windows starting at -10 and 0


def test_hll_count_distinct_error_bounds(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.stats import hll_count_distinct

    for n, distinct in ((400, 200), (60_000, 30_000)):
        df = pd.DataFrame({"k": [f"key{i}" for i in np.arange(n) % distinct]})
        est = hll_count_distinct(rd.from_pandas(df), ["k"])
        assert abs(est - distinct) / distinct < 0.05, (n, distinct, est)
    # deterministic: same input → same estimate
    df = pd.DataFrame({"k": [f"x{i}" for i in range(1000)]})
    a = hll_count_distinct(rd.from_pandas(df), ["k"])
    b = hll_count_distinct(rd.from_pandas(df), ["k"])
    assert a == b


def test_resize_images_plumbing(ray_session):
    import numpy as np
    import pytest as _pytest
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.multimodal import (
        ImageResizer,
        decode_features,
        resize_images,
        synthesize_media,
    )

    media = synthesize_media(12, seed=7)
    out = resize_images(rd.from_arrow(media), target_w=16, target_h=8).to_pandas()
    assert len(out) == 12
    assert (out.width == 16).all() and (out.height == 8).all()
    assert out.payload.map(len).eq(16 * 8).all()
    # deterministic: same input → same resized bytes
    again = resize_images(rd.from_arrow(media), target_w=16, target_h=8).to_pandas()
    assert list(out.payload) == list(again.payload)
    # resized media feeds the decode stage (schema-compatible)
    feats = decode_features(resize_images(rd.from_arrow(media), 16, 8)).to_pandas()
    assert len(feats) == 12 and feats.feature.map(len).eq(256).all()
    # real backends are honestly stubbed
    with _pytest.raises(NotImplementedError):
        ImageResizer(backend="pil")


def test_pii_redactor_counts_and_order():
    r = T.PiiRedactor()
    df = pd.DataFrame({"text": [
        "mail a.b%c@mail2.com or x@y.io now",
        "call 555-042-0042 from host 10.3.0.211",
        "no pii here",
        None,
    ]})
    out = r(df)
    assert out["n_email"].tolist() == [2, 0, 0, 0]
    assert out["n_phone"].tolist() == [0, 1, 0, 0]
    assert out["n_ip"].tolist() == [0, 1, 0, 0]
    assert out["text_redacted"].tolist()[:2] == [
        "mail <EMAIL> or <EMAIL> now",
        "call <PHONE> from host <IP>",
    ]
    # order matters: the phone must be scrubbed before the IP pass sees it —
    # a dotted triple-quad would otherwise double-match
    df2 = pd.DataFrame({"text": ["1.2.3.4 then 555-123-4567"]})
    o2 = r(df2)
    assert o2["n_ip"].iloc[0] == 1 and o2["n_phone"].iloc[0] == 1


def test_repetition_metrics_hand_computed():
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a a a b", "x y z w", ""],
    })
    m = T.repetition_metrics(df)
    # doc 0: 4 tokens, 2 distinct, top=3/4, 2-grams: [a a, a a, a b] -> 3 tot,
    # 2 distinct -> dup frac 1/3
    assert m.loc[0, "n_tokens"] == 4 and m.loc[0, "n_distinct"] == 2
    assert m.loc[0, "top_word_frac"] == 0.75
    assert abs(m.loc[0, "dup_2gram_frac"] - 1 / 3) < 1e-12
    assert m.loc[0, "is_repetitive"] == 1
    # doc 1: all distinct
    assert m.loc[1, "top_word_frac"] == 0.25 and m.loc[1, "dup_2gram_frac"] == 0.0
    assert m.loc[1, "is_repetitive"] == 1  # 0.25 > 0.125 top-word threshold
    # doc 2: empty
    assert m.loc[2, "n_tokens"] == 0 and m.loc[2, "is_repetitive"] == 0


def test_word_ngram_exploder_rules():
    ex = D.WordNgramExploder(n=3)
    df = pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": ["a b c d", "a b", "", "a b c a b c"],
    })
    out = ex(df)
    from maritime_activity_reports_cdc_ray.hashing import md5_u64

    def h(s):
        return np.int64(np.uint64(md5_u64(s)))

    by = out.groupby("doc_id")["h"].apply(lambda s: set(s.tolist())).to_dict()
    assert by[10] == {h("a b c"), h("b c d")}
    assert by[11] == {h("a b")}  # < n tokens -> one whole-doc gram
    assert 12 not in by  # empty -> no grams
    assert by[13] == {h("a b c"), h("b c a"), h("c a b")}  # distinct within doc


def test_ngram_contamination_counts(ray_session):
    # doc 0 is holdout (0 % 97 == 0); doc 1 shares a gram with it,
    # doc 2 shares with doc 1 only (dup, not contaminated), doc 3 is unique
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["p q r s t",           # holdout: grams {p q r s t -> 1 gram}
                 "p q r s t u",          # shares 'p q r s t' with holdout
                 "z p q r s t u z2 a b", # shares 'p q r s t'(hold) + 'q r s t u'(doc1)
                 "m n o aa bb cc"],
    })
    out = D.ngram_contamination(_ds(df), holdout_mod=97, n=5).to_pandas()
    out = out.set_index("doc_id")
    assert 0 not in out.index  # holdout excluded from the report
    assert out.loc[1, "n_grams"] == 2
    assert out.loc[1, "n_holdout_shared"] == 1
    assert out.loc[1, "n_dup_grams"] == 2  # both its grams also in doc 2
    assert out.loc[2, "n_holdout_shared"] == 1
    assert out.loc[2, "n_dup_grams"] == 2
    assert out.loc[3, "n_holdout_shared"] == 0 and out.loc[3, "n_dup_grams"] == 0


def test_new_curation_ops_compose_streaming(ray_session, tmp_path):
    """Decontaminate -> repetition-filter -> PII-redact -> partitioned sink,
    all streaming over the documents table; the redacted output must contain
    zero residual PII matches and read back from hive partitions."""
    import re

    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.dedup import ngram_contamination
    from maritime_activity_reports_cdc_ray.functions.join import semi_join
    from maritime_activity_reports_cdc_ray.functions.text import PII_PATTERNS
    from maritime_activity_reports_cdc_ray.sources.writers import write_partitioned

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    # inject PII so the redaction stage has real work
    def inject(df):
        df = df.copy()
        df["text"] = df["text"].fillna("") + np.where(
            df["doc_id"] % 2 == 0,
            " reach me at u" + df["doc_id"].astype(str) + "@x.io or 10.0.0."
            + (df["doc_id"] % 250).astype(str), "")
        return df

    docs = docs.map_batches(inject, batch_format="pandas")
    metrics = ngram_contamination(docs, holdout_mod=97, n=5)
    clean = metrics.map_batches(
        lambda df: df[df["n_holdout_shared"] == 0][["doc_id"]],
        batch_format="pandas")
    kept = semi_join(docs, clean, on="doc_id")

    def rep_filter(df):
        m = T.repetition_metrics(df)
        return df[(m["is_repetitive"] == 0).to_numpy()]

    kept = kept.map_batches(rep_filter, batch_format="pandas")
    red = kept.map_batches(T.PiiRedactor(), batch_format="pandas")
    out_root = str(tmp_path / "curated")
    res = write_partitioned(
        red.map_batches(lambda df: df[["doc_id", "lang", "text_redacted"]],
                        batch_format="pandas"),
        out_root, by="lang")
    assert res["rows"] > 0 and res["partitions_written"] >= 2
    back = rd.read_parquet(out_root).to_pandas()
    assert len(back) == res["rows"]
    for _, rx, _ in PII_PATTERNS:
        assert back["text_redacted"].str.count(re.compile(rx)).sum() == 0
    assert back["text_redacted"].str.contains("<EMAIL>").any()


def test_cms_sketch_estimates_bound_exact(ray_session):
    rng = np.random.default_rng(3)
    terms = np.repeat([f"t{i}" for i in range(50)], np.arange(1, 51))
    df = pd.DataFrame({"term": rng.permutation(terms)})
    from maritime_activity_reports_cdc_ray.functions.stats import cms_estimate, cms_sketch

    regs = cms_sketch(_ds(df), "term", d=4, w=1024).to_pandas()
    exact = df.groupby("term").size()
    est = cms_estimate(regs, exact.index.tolist(), d=4, w=1024)
    # CMS never under-estimates; with 50 terms in 1024 slots it is near-exact
    assert (est >= exact.to_numpy()).all()
    assert (est == exact.to_numpy()).mean() > 0.9
    # total register mass per row == stream length (mergeable integer sums)
    per_row = regs.groupby("row")["cnt"].sum()
    assert (per_row == len(df)).all()


def test_kmeans_fit_recovers_planted_clusters(ray_session):
    rng = np.random.default_rng(5)
    n, dim = 232, 8
    base = np.where(np.arange(n)[:, None] % 2 == 0, 5.0, -5.0)
    vecs = base + rng.normal(0, 0.1, (n, dim))
    df = pd.DataFrame({"vec_id": np.arange(n),
                       "embedding": [v.astype(np.float32) for v in vecs]})
    from maritime_activity_reports_cdc_ray.functions.similarity import kmeans_fit

    # stride picks ids 0 (even cluster) and 29 (odd cluster) as seeds
    cent, stats = kmeans_fit(_ds(df), k=2, iters=2, centroid_id_stride=29)
    assert sorted(stats["n_vecs"].tolist()) == [116, 116]
    # deterministic under re-blocking: 4-block input gives identical stats
    import ray.data as rd

    ds4 = rd.from_pandas(df).repartition(4)
    cent2, stats2 = kmeans_fit(ds4, k=2, iters=2, centroid_id_stride=29)
    pd.testing.assert_frame_equal(stats.reset_index(drop=True),
                                  stats2.reset_index(drop=True))
    assert np.array_equal(cent, cent2)


def test_bloom_filter_no_false_negatives(ray_session):
    rng = np.random.default_rng(11)
    h = rng.integers(0, 2**63, 2000, dtype=np.int64).astype(np.uint64)
    members, probes = h[:1000], h[1000:]
    bits = D.bloom_build(members, m=4096, k=4)
    assert D.bloom_contains(bits, members, m=4096, k=4).all()  # never misses
    fp = D.bloom_contains(bits, probes, m=4096, k=4).mean()
    assert fp < 0.5  # deterministic, bounded (4096 bits, 1000 items, k=4)
    assert not D.bloom_contains(np.empty(0, dtype=np.int64), probes).any()
    # contamination query face: bloom counts bound the exact counts
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["p q r s t", "p q r s t u", "m n o aa bb cc"],
    })
    out = D.ngram_contamination(_ds(df), holdout_mod=97, n=5,
                                bloom_m=4096).to_pandas().set_index("doc_id")
    assert (out["n_bloom_shared"] >= out["n_holdout_shared"]).all()
    assert out.loc[1, "n_bloom_shared"] >= 1  # the truly shared gram is found


def test_histogram_quantile_sketch_bounds_and_merge(ray_session):
    from maritime_activity_reports_cdc_ray.functions.stats import (
        histogram_quantile_sketch,
    )

    rng = np.random.default_rng(7)
    df = pd.DataFrame({"g": np.repeat(["a", "b"], 4000),
                       "v": np.concatenate([rng.uniform(0, 100, 4000),
                                            rng.uniform(200, 500, 4000)])})
    out = histogram_quantile_sketch(_ds(df), "g", "v", lo=0.0, hi=512.0,
                                    n_bins=256, qs=(0.5, 0.9)).set_index("g")
    for g, sub in df.groupby("g"):
        for q in (0.5, 0.9):
            exact = np.quantile(sub["v"], q)
            approx = out.loc[g, f"approx_p{int(q*100)}"]
            assert abs(approx - exact) <= 2.0 + 1e-9  # within one bin width
    # mergeable: any re-blocking yields the identical histogram estimates
    import ray.data as rd

    out8 = histogram_quantile_sketch(rd.from_pandas(df).repartition(8),
                                     "g", "v", lo=0.0, hi=512.0,
                                     n_bins=256, qs=(0.5, 0.9)).set_index("g")
    pd.testing.assert_frame_equal(out.sort_index(), out8.sort_index())


def test_semantic_dedup_finds_planted_dupes(ray_session):
    """SemDeDup composition: planted near-identical vectors land in one
    cluster and are reported; every reported pair is a true cosine dupe
    (subset of the exact all-pairs scan at the same threshold)."""
    rng = np.random.default_rng(9)
    n, dim = 120, 16
    base = rng.normal(0, 1, (n, dim))
    base[60:] = np.where(np.arange(dim) < 8, 6.0, -6.0) + rng.normal(0, 0.5, (60, dim))
    # plant exact near-dupes: 7 pairs of (v, v + tiny noise)
    for i in range(7):
        base[2 * i + 1] = base[2 * i] + rng.normal(0, 1e-3, dim)
    df = pd.DataFrame({"vec_id": np.arange(n),
                       "embedding": [v.astype(np.float32) for v in base]})
    sd = S.semantic_dedup(_ds(df), threshold=0.999, k=4, iters=2,
                          centroid_id_stride=29).to_pandas()
    got = set(zip(sd.id_a.astype(int), sd.id_b.astype(int)))
    assert {(2 * i, 2 * i + 1) for i in range(7)} <= got
    exact = S.cosine_dupes(_ds(df), threshold=0.999).to_pandas()
    allp = set(zip(exact.id_a.astype(int), exact.id_b.astype(int)))
    assert got <= allp  # no false pairs — only cross-cluster misses possible
    # sims are the same rounded cosines the exact path reports
    m = exact.set_index(["id_a", "id_b"])["sim"]
    for (a, b), s in zip(zip(sd.id_a, sd.id_b), sd.sim):
        assert m.loc[(a, b)] == s


def test_segment_dedup_cross_doc(ray_session):
    """CCNet-style segment dedup: any 3-token segment occurring more than
    once corpus-wide is removed from every doc (within-doc repeats count);
    empty docs and short tail segments keep one row per doc."""
    import hashlib

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["a b c d e f",    # 'a b c' shared with doc 1
                 "a b c x y z",
                 "",               # zero segments
                 "q r",            # one short unique segment
                 "m m m m m m"],   # within-doc repeated segment -> cnt 2
    })
    out = (D.segment_dedup(_ds(df), seg_tokens=3).to_pandas()
           .set_index("doc_id").sort_index())
    md5 = lambda t: hashlib.md5(t.encode()).hexdigest()
    assert out.loc[0].tolist() == [2, 1, 0.5, 3, md5("d e f")]
    assert out.loc[1].tolist() == [2, 1, 0.5, 3, md5("x y z")]
    assert out.loc[2].tolist() == [0, 0, 0.0, 0, md5("")]
    assert out.loc[3].tolist() == [1, 0, 0.0, 2, md5("q r")]
    assert out.loc[4].tolist() == [2, 2, 1.0, 0, md5("")]


def test_segment_dedup_broadcast_gate(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "a b c"]})
    with pytest.raises(ValueError, match="broadcast gate"):
        D.segment_dedup(_ds(df), seg_tokens=3, broadcast_max_hashes=0).to_pandas()


def test_doc_freq_and_quantized_tfidf(ray_session):
    """DF counts per-doc-distinct occurrences; idf_q is exact integer math."""
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["x x y", "x z", "z z z"],
    })
    from maritime_activity_reports_cdc_ray.functions.text import (
        doc_freq,
        make_doc_term_exploder,
    )
    terms = _ds(df).map_batches(make_doc_term_exploder(), batch_format="pandas")
    out = doc_freq(terms).to_pandas().set_index("term")["doc_freq"]
    assert out.to_dict() == {"x": 2, "y": 1, "z": 2}
    # idf_q = (N*1e6)//df: N=3 -> x: 1500000, y: 3000000
    assert (3 * 10**6) // out["x"] == 1_500_000
    assert (3 * 10**6) // out["y"] == 3_000_000


def test_postings_head_smallest_k_distinct(ray_session):
    """Inverted-index head: k smallest doc ids per wanted term, one entry per
    doc even when the term repeats in it, unwanted terms dropped."""
    from maritime_activity_reports_cdc_ray.functions.text import (
        make_doc_term_exploder,
        postings_head,
    )

    df = pd.DataFrame({
        "doc_id": [9, 3, 7, 1, 5],
        "text": ["x x y", "x z", "x", "x", "x w"],
    })
    terms = _ds(df).map_batches(make_doc_term_exploder(), batch_format="pandas")
    out = postings_head(terms, ["x", "z", "absent"], k=3)
    got = out.set_index("term")["postings_head"].to_dict()
    # 'x' is in all five docs (twice in doc 9) -> 3 smallest ids, each once
    assert got == {"x": "1,3,5", "z": "3"}


def test_weighted_priority_sample_exact_and_biased(ray_session):
    """Matches the brute-force integer-priority order exactly, and heavier
    rows dominate the head (hash-keyed weighted race)."""
    import hashlib

    from maritime_activity_reports_cdc_ray.functions.sample import (
        weighted_priority_sample,
    )

    n = 400
    df = pd.DataFrame({
        "doc_id": np.arange(n),
        "n_chars": np.where(np.arange(n) % 4 == 0, 5000, 50),  # 25% heavy
    })
    out = weighted_priority_sample(_ds(df), "doc_id", "n_chars", k=30)
    h = df["doc_id"].astype(str).map(
        lambda s: int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big"))
    brute = (df.assign(q=(h.to_numpy().astype(np.uint64)
                          // df["n_chars"].to_numpy().astype(np.uint64)))
             .sort_values(["q", "doc_id"]).head(30))
    assert out["doc_id"].tolist() == brute["doc_id"].tolist()
    # 100x weight -> heavy rows (25% of corpus) should dominate the head
    assert (out["n_chars"] == 5000).mean() > 0.8


def test_knn_pq_recall_and_determinism(ray_session):
    """PQ/ADC ANN: planted structure — clusters far apart in distinct
    subspace patterns — must be recovered (same-cluster vectors rank first),
    and the result is identical across repartitionings (the combiner cut is
    order-independent)."""
    rng = np.random.default_rng(3)
    n, dim = 120, 16
    base = rng.normal(0, 0.05, (n, dim))
    # 4 well-separated cluster centers; vec i belongs to cluster i % 4
    centers = np.eye(4).repeat(4, axis=1) * 10.0  # (4, 16)
    vecs = base + centers[np.arange(n) % 4]
    df = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(vecs)})

    out = S.knn_pq(_ds(df), query_ids=[0, 1], k=10, m=4, ksub=8,
                   centroid_id_stride=7).to_pandas()
    for qid in (0, 1):
        neigh = out[out.query_id == qid]["neighbor_id"].to_numpy()
        assert len(neigh) == 10
        assert qid not in neigh
        # all top-10 from the query's own cluster
        assert (neigh % 4 == qid % 4).all()

    out2 = S.knn_pq(_ds(df).repartition(7), query_ids=[0, 1], k=10, m=4,
                    ksub=8, centroid_id_stride=7).to_pandas()
    key = lambda d: d.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert key(out)[["query_id", "neighbor_id", "rank"]].equals(
        key(out2)[["query_id", "neighbor_id", "rank"]])


def test_temperature_sample_rates(ray_session):
    """α=0.5 rebalancing: per-group keep counts land near √(N_min·N_g) and
    the selection equals the brute-force integer gate exactly."""
    import hashlib
    import math

    from maritime_activity_reports_cdc_ray.functions.sample import (
        temperature_hash_sample,
    )

    df = pd.DataFrame({
        "doc_id": np.arange(2000),
        "lang": np.where(np.arange(2000) % 10 == 0, "rare",
                         np.where(np.arange(2000) % 2 == 0, "mid", "big")),
    })
    out = temperature_hash_sample(_ds(df), "doc_id", "lang").to_pandas()
    counts = df["lang"].value_counts()
    nmin = int(counts.min())
    h = df["doc_id"].astype(str).map(
        lambda s: int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big"))
    keep = pd.Series(False, index=df.index)
    for g, n in counts.items():
        kl = math.isqrt(int(n) * nmin)
        keep |= (df["lang"] == g) & ((h % int(n)) < kl)
    assert sorted(out["doc_id"]) == sorted(df[keep]["doc_id"])
    # rare group kept ~100%, larger groups thinned toward sqrt(nmin/n)
    got = out["lang"].value_counts()
    assert got["rare"] >= 0.9 * nmin
    for g in ("mid", "big"):
        expect = math.isqrt(int(counts[g]) * nmin)
        assert abs(got.get(g, 0) - expect) / expect < 0.35  # hash noise


def test_hashed_classifier_score_and_actor_state():
    """Integer weight sums over hashed token buckets: hand-check one doc;
    empty/missing text scores 0 = 'neg'; weights built once in __init__."""
    import hashlib

    clf = T.HashedLinearClassifier(n_buckets=128)

    def w(tok):
        b = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big") % 128
        return (int.from_bytes(hashlib.md5(f"w:{b}".encode()).digest()[:8],
                               "big") % 2001) - 1000

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["Alpha beta alpha", "", None]})
    out = clf(df)
    assert out["clf_score"].tolist() == [2 * w("alpha") + w("beta"), 0, 0]
    assert out["clf_label"].tolist() == [
        "pos" if 2 * w("alpha") + w("beta") > 0 else "neg", "neg", "neg"]
    assert clf.weights.shape == (128,) and clf.weights.dtype == np.int64


def test_bpe_train_sennrich_example(ray_session):
    """The classic low/lower/newest/widest corpus: merge order is
    es -> est -> est</w> -> lo -> low (Sennrich et al. 2016 §3.2)."""
    from maritime_activity_reports_cdc_ray.functions.text import (
        BpeEncoder,
        bpe_train,
    )

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    m = bpe_train(_ds(pd.DataFrame({"doc_id": [0], "text": [text]})), n_merges=5)
    assert list(zip(m["left"], m["right"])) == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")]
    assert m["pair_count"].tolist() == [9, 9, 9, 7, 7]
    enc = BpeEncoder(m)
    out = enc(pd.DataFrame({"doc_id": [0, 1], "text": ["low newest", "lowest"]}))
    # low -> [low, </w>] = 2; newest -> [n, e, w, est</w>] = 4;
    # lowest -> [low, est</w>] = 2 (every merge applies in rank order)
    assert out["n_tokens_bpe"].tolist() == [2 + 4, 2]
    # sanity: deterministic across a fresh encoder
    assert BpeEncoder(m)(pd.DataFrame({"doc_id": [9], "text": ["low newest"]})
                         )["n_tokens_bpe"].tolist() == [6]


def test_bpe_train_matches_naive_reference(ray_session):
    """Differential: the vocab-weighted distributed trainer equals a naive
    reference that rescans every word occurrence each round."""
    import numpy as np

    from maritime_activity_reports_cdc_ray.functions.text import bpe_train

    rng = np.random.default_rng(7)
    words = ["alpha", "alps", "bet", "beta", "bee", "a", "ab", ""]
    docs = [" ".join(rng.choice(words, size=rng.integers(1, 30)))
            for _ in range(40)]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})

    # naive reference: token stream, no vocab shortcut
    stream = [list(w) + ["</w>"] for d in docs for w in d.lower().split(" ") if w]
    ref = []
    for rank in range(8):
        pc = {}
        for seq in stream:
            for p in zip(seq, seq[1:]):
                pc[p] = pc.get(p, 0) + 1
        if not pc:
            break
        best_c = max(pc.values())
        left, right = min(p for p, c in pc.items() if c == best_c)
        ref.append((rank, left, right, best_c))
        for si, seq in enumerate(stream):
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                    out.append(left + right); i += 2
                else:
                    out.append(seq[i]); i += 1
            stream[si] = out

    got = bpe_train(_ds(df), n_merges=8)
    assert [tuple(r) for r in got.itertuples(index=False)] == ref


def test_bigram_lm_trainer(ray_session):
    """Model shape + determinism: exact top-V tie-break (count desc, unsigned
    hash asc), context totals = row sums of the bigram table, empty corpus."""
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.text import (
        LmPerplexityScorer,
        train_bigram_lm,
    )

    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["a b a b c", "b a b x y"]})
    m = train_bigram_lm(rd.from_pandas(df), vocab_size=3)
    assert m["total"] == 10
    # counts: b=4, a=3, c=1, x=1, y=1 → vocab keeps b, a and the smaller
    # unsigned hash among {c, x, y}
    assert m["vocab"]["c"].tolist()[:2] == [4, 3]
    assert len(m["vocab"]) == 3
    # context totals re-derive from the bigram table
    ctx = dict(zip(m["ctx"]["h1"], m["ctx"]["ctx"]))
    big_sum: dict = {}
    for h1, c in zip(m["big"]["h1"], m["big"]["cnt"]):
        big_sum[h1] = big_sum.get(h1, 0) + int(c)
    assert ctx == big_sum
    # determinism across retrains — and the materialized-train path is
    # byte-identical to the streamed path
    m2 = train_bigram_lm(rd.from_pandas(df), vocab_size=3,
                         materialize_train=True)
    pd.testing.assert_frame_equal(m["vocab"], m2["vocab"])
    pd.testing.assert_frame_equal(
        m["big"].sort_values(["h1", "h2"]).reset_index(drop=True),
        m2["big"].sort_values(["h1", "h2"]).reset_index(drop=True))
    # empty corpus → every doc lands in the 'empty'/zero path
    empty = pd.DataFrame({"doc_id": [1], "text": [""]})
    me = train_bigram_lm(rd.from_pandas(empty), vocab_size=3)
    assert me["total"] == 0
    out = LmPerplexityScorer(me)(empty)
    assert out["lm_band"].tolist() == ["empty"]


def test_c4_clean_rules():
    """Direct rule checks: terminal punctuation, ≥3 words, javascript ban,
    lorem-ipsum / brace page bans, ≥5-sentence page rule."""
    from maritime_activity_reports_cdc_ray.functions.text import c4_clean

    good = "\n".join(["one two three.", "four five six!", "seven eight nine?",
                      'ten eleven twelve."', "a b c d.", "e f g h."])
    df = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5, 6], "text": [
        good,                                  # all lines kept, 6 sentences
        "no terminal here\nalso not here",     # nothing kept
        "too few.\nwords here.",               # < 3 words per line
        good + "\nuses javascript now.",       # js line dropped, page kept
        "lorem ipsum\n" + good,                # page banned
        good.replace("five", "{five}"),        # brace ban
    ]})
    out = c4_clean(df)
    assert out["page_kept"].tolist() == [1, 0, 0, 1, 0, 0]
    assert out["n_kept_lines"].tolist()[0] == 6
    assert out["n_kept_lines"].tolist()[1] == 0
    assert out["n_kept_lines"].tolist()[2] == 0
    # js line dropped from doc 4 but the 6 good lines remain
    assert out["n_kept_lines"].tolist()[3] == 6
    assert out["text_clean"].tolist()[1] == ""
    assert out["text_clean"].tolist()[4] == ""  # banned page → empty output
    assert out["text_clean"].tolist()[0] == good


def test_make_chunker_windows():
    """Overlapping token windows: chunk k covers [k·stride, k·stride+size);
    chunks exist while k·stride < n; empty docs emit nothing."""
    from maritime_activity_reports_cdc_ray.functions.text import make_chunker

    df = pd.DataFrame({"doc_id": [7, 8], "text": ["a b c d e f g h i j k", ""]})
    out = make_chunker(size=4, stride=2)(df)
    assert out["doc_id"].tolist() == [7] * 6
    assert out["chunk_text"].tolist() == [
        "a b c d", "c d e f", "e f g h", "g h i j", "i j k", "k"]
    assert out["n_chunk_tokens"].tolist() == [4, 4, 4, 4, 3, 1]
    # non-overlapping degenerate
    out2 = make_chunker(size=4, stride=4)(df)
    assert out2["chunk_text"].tolist() == ["a b c d", "e f g h", "i j k"]
    import pytest
    with pytest.raises(ValueError):
        make_chunker(size=5, stride=2)


def test_next_fit_pack():
    from maritime_activity_reports_cdc_ray.functions.text import next_fit_pack

    assert next_fit_pack([100, 100, 100, 300, 10, 250, 5], 256).tolist() == \
        [0, 0, 1, 2, 3, 4, 4]
    assert next_fit_pack([], 256).tolist() == []
    assert next_fit_pack([257], 256).tolist() == [0]  # oversized doc: own bin
    assert next_fit_pack([256, 1], 256).tolist() == [0, 1]  # exact fit closes


def test_curate_documents_end_to_end(ray_session):
    """The full curation composition over structured pages: C4 clean →
    lang-ID → quality gate → LM perplexity filter → exact dedup → packing.
    Asserts monotone survival, schema, dedup, and valid per-lang bins."""
    import duckdb
    import ray.data as rd

    import __ray_entry__ as E
    from maritime_activity_reports_cdc_ray.pipelines.curation import (
        curate_documents,
    )

    raw = duckdb.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet'"
    ).df()
    pages = E._c4_synth(raw)  # word soup → realistic multi-line pages
    # engineer exact dups: two extra docs copying page 0's text
    import pandas as pd
    extra = pd.DataFrame({"doc_id": [100001, 100002],
                          "text": [pages["text"].iloc[0]] * 2})
    pages = pd.concat([pages, extra], ignore_index=True)

    kept, stats = curate_documents(
        rd.from_pandas(pages), min_quality_score=0.4,
        lm_t_low_bits=2.0, lm_t_high_bits=50.0)  # generous: nothing 'high'
    df = kept.to_pandas()

    assert stats["rows_in"] == len(pages)
    assert stats["rows_in"] >= stats["rows_quality_kept"] >= stats["rows_final"]
    assert stats["rows_final"] > 0
    assert {"doc_id", "text", "lang_pred", "doc_quality_score",
            "n_tokens", "nll_fp", "lm_band", "pack_bin"} <= set(df.columns)
    # exact dedup held: texts unique, and the copy of page 0 lost to the
    # original (first-by-id wins)
    assert df["text"].is_unique
    assert not {100001, 100002} & set(df["doc_id"])
    assert (df["lm_band"] != "high").all()
    # packing: per lang, bins are 0..max contiguous and never over capacity
    # (except oversized single docs)
    for lang, g in df.groupby("lang_pred"):
        bins = sorted(g["pack_bin"].unique())
        assert bins == list(range(len(bins)))
        per_bin = g.groupby("pack_bin")["n_tokens"].agg(["sum", "size"])
        over = per_bin[per_bin["sum"] > 256]
        assert (over["size"] == 1).all()  # only oversized solo docs overflow


def test_curate_cli_resumable(tmp_path):
    """CLI `curate` verb: runs the full pipeline in a fresh process, writes
    lang-partitioned parquet through the resumable sink; a rerun skips every
    finished partition."""
    import json
    import subprocess
    import sys

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as E

    raw = duckdb.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet' LIMIT 200"
    ).df()
    inp = tmp_path / "pages.parquet"
    pq.write_table(pa.Table.from_pandas(E._c4_synth(raw), preserve_index=False),
                   str(inp))
    out = tmp_path / "curated"
    cmd = [sys.executable, "-m", "maritime_activity_reports_cdc_ray.cli",
           "--num-cpus", "4", "curate", "--input", str(inp), "--out", str(out),
           "--min-quality", "0.4"]
    r1 = json.loads(subprocess.run(cmd, capture_output=True, text=True,
                                   check=True).stdout.strip().splitlines()[-1])
    assert r1["rows_final"] > 0 and r1["partitions_written"] > 0
    r2 = json.loads(subprocess.run(cmd, capture_output=True, text=True,
                                   check=True).stdout.strip().splitlines()[-1])
    assert r2["partitions_written"] == 0
    assert r2["partitions_skipped"] == r1["partitions_written"]
    back = duckdb.sql(f"SELECT COUNT(*) n FROM '{out}/*/*.parquet'").fetchone()[0]
    assert back == r1["rows_final"]


def test_dsir_selects_target_like_docs(ray_session):
    """DSIR selection: docs sharing the target slice's vocabulary outrank
    distribution-distant ones, and the result is identical across
    repartitionings (two streaming passes + top-k combiner are
    order-independent)."""
    from maritime_activity_reports_cdc_ray.functions.sample import dsir_select

    n = 120
    # target slice (lang='en') speaks vocab A; half the raw docs speak A,
    # half speak vocab B — DSIR must pick the A-speakers
    a_doc = "the quick brown fox jumps over the lazy dog again and again"
    b_doc = "zzq wvx qqy plk mnb vcx zxw qpo iuy tre zzq wvx"
    lang = np.where(np.arange(n) % 3 == 0, "en", "xx")
    text = np.where(lang == "en", a_doc,
                    np.where(np.arange(n) % 2 == 0, a_doc, b_doc))
    df = pd.DataFrame({"doc_id": np.arange(n), "text": text, "lang": lang,
                       "n_chars": [len(t) for t in text]})
    out = dsir_select(_ds(df), m=256, k=20, target_value="en")
    assert len(out) == 20
    sel = df.set_index("doc_id").loc[out["doc_id"]]
    assert (sel["text"] == a_doc).all()  # every pick speaks the target vocab

    out2 = dsir_select(_ds(df).repartition(7), m=256, k=20, target_value="en")
    assert out["doc_id"].tolist() == out2["doc_id"].tolist()
    assert out["score_fp"].tolist() == out2["score_fp"].tolist()


def test_dup_span_stats_planted(ray_session):
    """Planted shared run: two docs share a 12-token span (w=8 -> 5
    duplicated windows covering 12 tokens in ONE merged span each); a third
    doc is unique and must be absent. Identical across repartitionings."""
    from maritime_activity_reports_cdc_ray.functions.dedup import dup_span_stats

    shared = "one two three four five six seven eight nine ten eleven twelve"
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [shared + " tail1a tail1b tail1c",
                 "head2a head2b " + shared,
                 "totally different words that repeat nothing at all here ok"],
    })
    out = dup_span_stats(_ds(df), w=8).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 2]
    # 12-token shared run -> 12-8+1 = 5 duplicated windows, 12 covered
    # tokens, merged into one span, in both docs
    assert out["dup_windows"].tolist() == [5, 5]
    assert out["dup_tokens"].tolist() == [12, 12]
    assert out["dup_spans"].tolist() == [1, 1]

    out2 = dup_span_stats(_ds(df).repartition(5), w=8).to_pandas() \
        .sort_values("doc_id")
    assert out.reset_index(drop=True).equals(out2.reset_index(drop=True))


def test_pagerank_fixed_point_both_regimes(ray_session):
    """Weighted damped PageRank vs a naive dict-loop reference in the same
    fixed-point arithmetic; the size-gated driver path and the streaming
    (gate=0) path must agree bit-for-bit; a sink-heavy graph ranks the sink
    highest; an isolated node keeps exactly its teleport mass."""
    from maritime_activity_reports_cdc_ray.functions.graph import pagerank

    edges = pd.DataFrame({
        "s": ["a", "a", "b", "c", "c", "c", "d"],
        "t": ["b", "c", "c", "a", "b", "c2", "c"],
        "w": [1, 2, 3, 1, 1, 1, 5],
    })
    nodes = ["a", "b", "c", "c2", "d", "iso"]
    S, D, IT = 10 ** 12, 85, 3

    def naive():
        cons = edges.groupby(["s", "t"], as_index=False)["w"].sum()
        ow = cons.groupby("s")["w"].sum().to_dict()
        r = {v: S // len(nodes) for v in nodes}
        tele = (S * (100 - D)) // (100 * len(nodes))
        for _ in range(IT):
            c = {}
            for s, t, w in cons.itertuples(index=False):
                c[t] = c.get(t, 0) + r[s] * int(w) // ow[s]
            r = {v: tele + (D * c.get(v, 0)) // 100 for v in nodes}
        return r

    exp = naive()
    got = pagerank(_ds(edges), src="s", dst="t", weight="w", nodes=nodes,
                   iters=IT)
    assert dict(zip(got["node"], got["rank_fp"])) == exp
    # streaming regime (gate forced off) is bit-identical
    got2 = pagerank(_ds(edges).repartition(3), src="s", dst="t", weight="w",
                    nodes=nodes, iters=IT, driver_gate_rows=0)
    assert got.equals(got2.astype(got.dtypes.to_dict()))
    # isolated node holds exactly the teleport mass
    tele = (S * 15) // (100 * len(nodes))
    assert dict(zip(got["node"], got["rank_fp"]))["iso"] == tele


def test_grouped_mode_ties_and_reblocking(ray_session):
    """MODE with forced ties (smallest value wins), singleton keys, and
    identical output across repartitionings (combiner correctness)."""
    from maritime_activity_reports_cdc_ray.functions.stats import grouped_mode

    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2, 2, 3],
        "v": ["b", "b", "a", "a", "z", "y", "solo"],
    })
    out = grouped_mode(_ds(df), "k", "v", out_col="m", count_col="n") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    # k=1: a and b tie at 2 -> 'a' (smallest); k=2: y/z tie -> 'y'
    assert out["m"].tolist() == ["a", "y", "solo"]
    assert out["n"].tolist() == [2, 1, 1]
    out2 = grouped_mode(_ds(df).repartition(5), "k", "v", out_col="m",
                        count_col="n").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert out.equals(out2)


def test_semi_and_anti_join_partition(ray_session):
    """semi_join + anti_join partition the big side exactly; both regimes
    (broadcast filter vs partitioned hash join via gate=0) agree."""
    from maritime_activity_reports_cdc_ray.functions.join import anti_join, semi_join

    big = pd.DataFrame({"k": [1, 2, 3, 4, 5, 6], "x": list("abcdef")})
    keys = pd.DataFrame({"kk": [2, 4, 4, 9]})
    s = semi_join(_ds(big), _ds(keys), on="k", keys_on="kk").to_pandas()
    a = anti_join(_ds(big), _ds(keys), on="k", keys_on="kk").to_pandas()
    assert sorted(s["k"]) == [2, 4]
    assert sorted(a["k"]) == [1, 3, 5, 6]
    assert len(s) + len(a) == len(big)
    a2 = anti_join(_ds(big), _ds(keys), on="k", keys_on="kk",
                   broadcast_limit_rows=0).to_pandas()
    assert sorted(a2["k"].tolist()) == sorted(a["k"].tolist())
    # empty key side: semi keeps nothing, anti keeps everything
    ek = pd.DataFrame({"kk": pd.Series(dtype="int64")})
    assert semi_join(_ds(big), _ds(ek), on="k", keys_on="kk").count() == 0
    assert anti_join(_ds(big), _ds(ek), on="k", keys_on="kk").count() == 6


def test_unigram_tokenizer_train_and_encode(ray_session):
    """Unigram-LM tokenizer (Kudo 2018): a dominant word becomes ONE piece
    (beats its char decomposition on total NLL), unseen words fall back to
    retained single chars, every segmentation round-trips to its word, and
    training is identical across repartitionings."""
    from maritime_activity_reports_cdc_ray.functions.text import (
        UnigramEncoder,
        unigram_train,
    )

    df = pd.DataFrame({
        "doc_id": range(6),
        "text": ["winter winter winter storm", "winter storm warning",
                 "winter winter", "storm warning", "winter", "xyz"],
    })
    pieces = unigram_train(_ds(df), vocab_size=64, max_piece_len=6)
    tbl = dict(zip(pieces["piece"], pieces["cnt"]))
    assert tbl["winter"] >= 7 and "storm" in tbl
    # all single chars retained -> segmentation is total
    enc = UnigramEncoder(pieces)
    assert enc.segment("winter") == ["winter"]
    assert enc.segment("storm") == ["storm"]
    seg = enc.segment("winterstormzq")  # unseen word: round-trips regardless
    assert "".join(seg) == "winterstormzq"
    out = _ds(df).map_batches(UnigramEncoder(pieces), batch_format="pandas",
                              concurrency=2).to_pandas().sort_values("doc_id")
    assert out["n_tokens_unigram"].iloc[0] == 4  # 3x winter + storm
    assert out["n_tokens_unigram"].iloc[5] == len(enc.segment("xyz"))
    # deterministic across re-blocking
    p2 = unigram_train(_ds(df).repartition(4), vocab_size=64, max_piece_len=6)
    assert pieces.equals(p2)


def test_grouped_hll_accuracy_and_mergeability(ray_session):
    """Per-group HLL within 5% of truth on planted cardinalities; the
    include_global row (max-merge of group registers) equals the direct
    global sketch bit-for-bit — the mergeability contract."""
    from maritime_activity_reports_cdc_ray.functions.stats import (
        grouped_hll_count_distinct,
        hll_count_distinct,
    )

    rng = np.random.default_rng(5)
    frames = []
    truth = {"a": 2000, "b": 500, "c": 37}
    for g, n in truth.items():
        ids = rng.choice(n * 3, size=n, replace=False)  # n distinct ids
        frames.append(pd.DataFrame({"g": g,
                                    "uid": np.repeat(ids, 2)}))  # dups too
    df = pd.concat(frames, ignore_index=True).sample(frac=1, random_state=1)
    ds = _ds(df).materialize()
    out = grouped_hll_count_distinct(ds, "g", ["uid"], p=12,
                                     include_global="*")
    by = dict(zip(out["g"], out["approx"]))
    for g, n in truth.items():
        assert abs(by[g] - n) / n < 0.05, (g, by[g], n)
    direct = hll_count_distinct(ds, ["uid"], p=12)
    assert by["*"] == direct  # register max-merge == one global sketch


def test_skew_join_matches_plain_join(ray_session):
    """skew_join (hot keys broadcast, cold keys shuffled) must equal the
    plain join row-for-row on a Zipf-skewed left side, for inner and left;
    with no hot keys it degrades to auto_join."""
    from maritime_activity_reports_cdc_ray.functions.join import auto_join, skew_join

    rng = np.random.default_rng(11)
    n = 4000
    keys = np.where(rng.random(n) < 0.6, 7, rng.integers(0, 40, n))  # key 7 hot
    left = pd.DataFrame({"k": keys.astype("int64"), "x": np.arange(n)})
    right = pd.DataFrame({"k": np.arange(0, 35, dtype="int64"),
                          "name": [f"dim{i}" for i in range(35)]})

    def norm(df):
        return (df.sort_values(["k", "x"]).reset_index(drop=True)
                [["k", "x", "name"]])

    for how, rayhow in (("inner", "inner"), ("left", "left_outer")):
        got = norm(skew_join(_ds(left), _ds(right), on="k", how=how,
                             hot_min_rows=1000).to_pandas())
        exp = norm(auto_join(_ds(left), _ds(right), on=["k"], how=rayhow,
                             broadcast_limit_rows=0).to_pandas())
        assert got["k"].tolist() == exp["k"].tolist(), how
        assert got["name"].fillna("-").tolist() == \
               exp["name"].fillna("-").tolist(), how
    # threshold nothing qualifies for -> pure auto_join path, same rows
    got = norm(skew_join(_ds(left), _ds(right), on="k", how="inner",
                         hot_min_rows=10**9).to_pandas())
    exp = norm(auto_join(_ds(left), _ds(right), on=["k"]).to_pandas())
    assert got.equals(exp)


def test_pagerank_ignores_edges_from_unknown_sources(ray_session):
    """An edge whose src is outside the caller's vertex set is dropped
    consistently in BOTH regimes (the driver fast path used to crash on the
    NaN while the distributed path silently dropped it)."""
    from maritime_activity_reports_cdc_ray.functions.graph import pagerank

    edges = pd.DataFrame({"s": ["a", "ghost"], "t": ["b", "a"],
                          "w": [1, 5]})
    nodes = ["a", "b"]
    got_drv = pagerank(_ds(edges), nodes=nodes, src="s", dst="t", weight="w",
                       iters=2, driver_gate_rows=10**6)
    got_dist = pagerank(_ds(edges), nodes=nodes, src="s", dst="t", weight="w",
                        iters=2, driver_gate_rows=0)
    assert got_drv.sort_values("node").reset_index(drop=True).equals(
        got_dist.sort_values("node").reset_index(drop=True))
    # all-unknown-src edge list: every node keeps exactly teleport mass
    only_ghost = pd.DataFrame({"s": ["ghost"], "t": ["a"], "w": [1]})
    flat = pagerank(_ds(only_ghost), nodes=nodes, src="s", dst="t",
                    weight="w", iters=2, driver_gate_rows=10**6)
    assert flat["rank_fp"].nunique() == 1


def test_hll_supports_low_precision(ray_session):
    """p < 12 (register width > 52 bits) must work — the vectorized rho
    splits the rest into float64-exact 32-bit halves instead of asserting."""
    from maritime_activity_reports_cdc_ray.functions.stats import hll_count_distinct

    df = pd.DataFrame({"u": [f"user-{i}" for i in range(5000)]})
    for p in (8, 10, 14):
        est = hll_count_distinct(_ds(df), ["u"], p=p)
        rse = 1.04 / (2 ** (p / 2)) * 5  # 5 sigma
        assert abs(est - 5000) / 5000 < max(rse, 0.1), (p, est)


def test_wordpiece_train_and_encode(ray_session):
    """WordPiece (BERT trainer semantics): likelihood score count(pair) /
    (count(l)·count(r)) — a rare-but-cohesive pair beats a frequent one —
    continuation '##' folds on merge; encoding is greedy longest-match with
    whole-word [UNK]."""
    from maritime_activity_reports_cdc_ray.functions.text import (
        WordPieceEncoder,
        wordpiece_train,
    )

    # 'qz' appears only inside 'qz' (cohesive: 2/(2*2)); 'ab' is frequent
    # but 'a' and '##b' are everywhere, diluting its score
    text = " ".join(["ab"] * 8 + ["ac"] * 8 + ["db"] * 8 + ["qz"] * 2)
    m = wordpiece_train(_ds(pd.DataFrame({"doc_id": [0], "text": [text]})),
                        n_merges=1)
    minted = m[m["rank"] >= 0]
    assert list(zip(minted["left"], minted["right"])) == [("q", "##z")]
    assert minted["piece"].tolist() == ["qz"]
    # alphabet rows present (rank -1) with corpus counts
    alpha = dict(zip(m[m["rank"] < 0]["piece"], m[m["rank"] < 0]["pair_count"]))
    assert alpha["a"] == 16 and alpha["##b"] == 16 and alpha["q"] == 2

    enc = WordPieceEncoder(m)
    out = enc(pd.DataFrame({"doc_id": [0, 1, 2],
                            "text": ["qz ab", "qzq", "xyz"]}))
    # qz -> [qz] = 1; ab -> [a, ##b] = 2; qzq -> [qz, ##q]? '##q' not in
    # vocab (q never continues) -> whole word [UNK] = 1; xyz -> [UNK] = 1
    assert out["n_tokens_wordpiece"].tolist() == [1 + 2, 1, 1]


def test_wordpiece_matches_naive_reference(ray_session):
    """Differential: the vocab-weighted distributed trainer equals a naive
    per-occurrence reference with the same exact-fraction tie rules; output
    is invariant to re-blocking."""
    import numpy as np

    from maritime_activity_reports_cdc_ray.functions.text import wordpiece_train

    rng = np.random.default_rng(13)
    words = ["alpha", "alps", "bet", "beta", "bee", "a", "ab", ""]
    docs = [" ".join(rng.choice(words, size=rng.integers(1, 30)))
            for _ in range(40)]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})

    stream = [[w[0]] + ["##" + ch for ch in w[1:]]
              for d in docs for w in d.lower().split(" ") if w]
    ref = []
    for rank in range(8):
        pc, tc = {}, {}
        for seq in stream:
            for t in seq:
                tc[t] = tc.get(t, 0) + 1
            for p in zip(seq, seq[1:]):
                pc[p] = pc.get(p, 0) + 1
        if not pc:
            break
        best = None
        for p, a in pc.items():
            b = tc[p[0]] * tc[p[1]]
            if best is None or a * best[1] > best[0] * b \
                    or (a * best[1] == best[0] * b and p < best[2]):
                best = (a, b, p)
        left, right = best[2]
        tok = left + right[2:]
        ref.append((rank, left, right, tok, pc[(left, right)]))
        for si, seq in enumerate(stream):
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                    out.append(tok)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            stream[si] = out

    got = wordpiece_train(_ds(df), n_merges=8)
    minted = got[got["rank"] >= 0]
    assert [tuple(r) for r in minted[["rank", "left", "right", "piece",
                                      "pair_count"]].to_numpy()] == ref
    got2 = wordpiece_train(_ds(df).repartition(7), n_merges=8)
    assert got.equals(got2)


def test_rollup_agg_matches_duckdb(ray_session):
    """GROUP BY ROLLUP replay: all levels (finest, each prefix, grand
    total) with NULLed rolled-up keys, against DuckDB's native ROLLUP."""
    import duckdb

    from maritime_activity_reports_cdc_ray.functions.stats import rollup_agg

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 500),
        "b": rng.choice(["p", "q"], 500),
        "v": rng.integers(0, 100, 500),
    })
    got = rollup_agg(_ds(df), ["a", "b"],
                     {"n": ("v", "count"), "s": ("v", "sum"),
                      "mx": ("v", "max")})
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        SELECT a, b, COUNT(v) AS n, SUM(v) AS s, MAX(v) AS mx
        FROM t GROUP BY ROLLUP(a, b)
        ORDER BY a NULLS LAST, b NULLS LAST""").df()
    key = lambda d: (d.fillna("~").sort_values(["a", "b"])
                     .reset_index(drop=True))
    g, e = key(got), key(exp)
    assert g["a"].tolist() == e["a"].tolist()
    assert g["b"].tolist() == e["b"].tolist()
    assert g["n"].astype("int64").tolist() == e["n"].astype("int64").tolist()
    assert g["s"].astype("int64").tolist() == e["s"].astype("int64").tolist()
    assert g["mx"].astype("int64").tolist() == e["mx"].astype("int64").tolist()
    # re-blocking invariance
    got2 = rollup_agg(_ds(df).repartition(7), ["a", "b"],
                      {"n": ("v", "count"), "s": ("v", "sum"),
                       "mx": ("v", "max")})
    assert key(got).equals(key(got2))


def test_pivot_wide_matches_duckdb(ray_session):
    import duckdb

    from maritime_activity_reports_cdc_ray.functions.stats import pivot_wide

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.choice(["k1", "k2", "k3", "k4"], 400),
        "p": rng.choice(["a", "b", "c"], 400),
        "v": rng.integers(0, 50, 400),
    })
    got = pivot_wide(_ds(df), "k", "p", "v", agg="sum")
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        PIVOT t ON p USING SUM(v) GROUP BY k ORDER BY k""").df()
    assert got["k"].tolist() == exp["k"].tolist()
    for c in ("a", "b", "c"):
        assert got[c].astype("int64").tolist() == \
            exp[c].fillna(0).astype("int64").tolist(), c


def test_rollup_pivot_fuzz_vs_duckdb(ray_session):
    """Randomized differential for rollup_agg/pivot_wide vs DuckDB across
    frames with skewed keys, negative values and NaN values (SUM skips
    NULLs; COUNT is COUNT(*) row semantics)."""
    import duckdb

    from maritime_activity_reports_cdc_ray.functions.stats import (
        pivot_wide,
        rollup_agg,
    )

    rng = np.random.default_rng(21)
    for trial in range(6):
        n = int(rng.integers(1, 300))
        df = pd.DataFrame({
            "a": rng.choice(["x", "y", "z", "w"][: int(rng.integers(1, 5))], n),
            "b": rng.choice(["p", "q", "r"][: int(rng.integers(1, 4))], n),
            "v": rng.integers(-50, 100, n).astype("float64"),
        })
        df.loc[rng.random(n) < 0.15, "v"] = np.nan
        # NULL group keys are real groups (SQL semantics, unlike pandas)
        df.loc[rng.random(n) < 0.1, "b"] = None
        con = duckdb.connect()
        con.register("t", df)

        got = rollup_agg(_ds(df).repartition(int(rng.integers(1, 6))),
                         ["a", "b"],
                         {"n": ("v", "count"), "s": ("v", "sum")})
        exp = con.execute("""
            SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n,
                   COALESCE(SUM(v), 0) AS s
            FROM t GROUP BY ROLLUP(a, b)""").df()
        key = lambda d: (d.assign(a=d["a"].fillna("~"), b=d["b"].fillna("~"),
                                  s=d["s"].fillna(np.inf).astype("float64")
                                  .round(6))
                         .sort_values(["a", "b", "n", "s"])
                         .reset_index(drop=True))
        g, e = key(got), key(exp)
        assert g["a"].tolist() == e["a"].tolist(), trial
        assert g["n"].astype("int64").tolist() == \
            e["n"].astype("int64").tolist(), trial
        gs = g["s"].fillna(np.inf).astype("float64")
        es = e["s"].fillna(np.inf).astype("float64")
        assert np.allclose(gs, es), trial

        # pivot contract excludes NULL pivot values (documented) — compare
        # on the non-null slice both sides
        dfp = df[df["b"].notna()]
        con.register("tp", dfp)
        got_p = pivot_wide(_ds(dfp), "a", "b", "v", agg="sum")
        exp_p = con.execute(
            "PIVOT tp ON b USING SUM(v) GROUP BY a ORDER BY a").df()
        assert got_p["a"].tolist() == exp_p["a"].tolist(), trial
        for c in sorted(set(dfp["b"])):
            assert np.allclose(
                got_p[c].fillna(0).astype("float64"),
                exp_p[c].fillna(0).astype("float64")), (trial, c)


def test_average_hasher_near_dup_buckets(ray_session):
    """aHash (perceptual-hash family) over media payloads: identical
    payloads share a bucket, a heavily skewed payload lands elsewhere, and
    the bit rule is the exact integer form 60*hist[v] > sum(hist[:60])."""
    import pyarrow as pa

    from maritime_activity_reports_cdc_ray.functions.multimodal import AverageHasher

    a = bytes(range(60)) * 10          # uniform low bytes
    b = bytes([3]) * 600               # all mass on byte 3
    t = pa.table({"media_id": pa.array([1, 2, 3], pa.int64()),
                  "payload": pa.array([a, a, b], pa.binary())})
    out = AverageHasher()(t).to_pandas()
    h = dict(zip(out["media_id"], out["ahash"]))
    assert h[1] == h[2]            # identical payloads -> same bucket
    assert h[1] != h[3]
    assert h[3] == 1 << 3          # only bit 3 set: 60*600 > 600, rest 0
    # uniform: 60*c == tot for every v -> strict '>' sets NO bits
    assert h[1] == 0


def test_hash_part_rejects_part_named_key():
    """The internal partition column name is reserved: hashing a key column
    literally named _part would silently overwrite its VALUES with
    partition ids (observed as wrong distinct-pid sets) — loud error."""
    import pandas as pd
    import pytest

    from maritime_activity_reports_cdc_ray.functions.dedup import _hash_part

    with pytest.raises(ValueError, match="_part"):
        _hash_part(pd.DataFrame({"_part": [1, 2]}), ["_part"], 4)


def test_semi_anti_join_tolerate_columnless_empty_blocks(ray_session):
    """Ray 2.49 strips the schema from zero-row pandas blocks; both the
    broadcast filter and the partitioned hash-join fallback must survive a
    key (or big) side containing such blocks."""
    import pandas as pd
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.join import (anti_join,
                                                                  semi_join)

    big = rd.from_pandas([pd.DataFrame({"k": list("aabbcc")}),
                          pd.DataFrame()])
    keys = rd.from_pandas([pd.DataFrame({"k": ["a", "c"]}), pd.DataFrame()])
    # broadcast regime
    assert sorted(semi_join(big, keys, on="k").to_pandas()["k"]) == \
        ["a", "a", "c", "c"]
    assert sorted(anti_join(big, keys, on="k").to_pandas()["k"]) == ["b", "b"]
    # forced partitioned hash-join fallback
    assert sorted(semi_join(big, keys, on="k",
                            broadcast_limit_rows=0).to_pandas()["k"]) == \
        ["a", "a", "c", "c"]
    assert sorted(anti_join(big, keys, on="k",
                            broadcast_limit_rows=0).to_pandas()["k"]) == \
        ["b", "b"]


def test_jaccard_join_positional_filter_recall(ray_session):
    """Randomized brute-force differential for the PPJoin positional filter:
    the candidate pruning (size + prefix + positional) must NEVER drop a
    pair with true Jaccard >= t — the join's guaranteed-recall contract —
    and every reported pair's score must equal the brute-force value."""
    rng = np.random.default_rng(41)
    words = ["w%02d" % i for i in range(40)]
    docs = []
    for i in range(60):
        if i % 7 == 0 and i:  # planted near-dups: mutate a prior doc
            base = docs[i - 1].split()
            j = rng.integers(0, len(base))
            base[j] = str(rng.choice(words))
            docs.append(" ".join(base))
        else:
            docs.append(" ".join(rng.choice(words, rng.integers(5, 25))))
    df = pd.DataFrame({"doc_id": np.arange(60, dtype="int64"), "text": docs})
    for t in (0.5, 0.7):
        out = D.jaccard_similarity_join(_ds(df), threshold=t, k=8,
                                        hot_min=3).to_pandas()
        got = {(int(a), int(b)): j for a, b, j in
               zip(out.id_a, out.id_b, out.jaccard)}
        for a in range(60):
            for b in range(a + 1, 60):
                j = D.ngram_jaccard(docs[a], docs[b], k=8)
                if j >= t + 1e-9:
                    assert (a, b) in got, (t, a, b, j)
                    assert abs(got[(a, b)] - j) < 2e-6, (a, b, j)
                elif (a, b) in got:
                    assert got[(a, b)] >= t - 1e-9
