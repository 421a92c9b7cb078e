"""Differential fuzzing: the newest oracle-attested kernels vs DuckDB itself.

The driver's correctness gate runs on fixed testdata; these tests generate
adversarial inputs (unicode, digits against word boundaries, empty/whitespace
docs, repeated tokens) with hypothesis and assert the ENGINE KERNEL and the
ORACLE SQL agree bit-for-bit on each of them — the drift guard behind the
"exact oracle" claims. Pure pandas + DuckDB: no Ray session needed."""

import duckdb
import numpy as np
import pyarrow as pa
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from maritime_activity_reports_cdc_ray.functions import text as T

# alphabet chosen to stress the engines' disagreement surface: ascii letters,
# digits (phone/ip shapes), pattern metachars, unicode letters next to digits
_ALPHA = "ab z01579.-@%+_é漢\t"
_texts = st.lists(st.text(alphabet=_ALPHA, max_size=60), min_size=1, max_size=8)


def _con(df: pd.DataFrame):
    con = duckdb.connect()
    con.register("documents", df)
    return con


@settings(max_examples=60, deadline=None)
@given(_texts)
def test_pii_redactor_matches_duckdb(texts):
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    out = T.PiiRedactor()(df)
    con = _con(df)
    sql = "SELECT doc_id, COALESCE(text, '') AS s FROM documents"
    prev = "r0"
    parts = [f"WITH r0 AS ({sql})"]
    carried = []
    for i, (name, rx, repl) in enumerate(T.PII_PATTERNS, start=1):
        keep = "".join(f" {c}," for c in carried)
        parts.append(
            f"r{i} AS (SELECT doc_id,{keep} "
            f"len(regexp_extract_all(s, '{rx}')) AS n_{name}, "
            f"regexp_replace(s, '{rx}', '{repl}', 'g') AS s FROM {prev})")
        carried.append(f"n_{name}")
        prev = f"r{i}"
    q = ", ".join(parts) + f" SELECT doc_id, {', '.join(carried)}, s FROM {prev} ORDER BY doc_id"
    oracle = con.execute(q).df()
    for name, _, _ in T.PII_PATTERNS:
        assert out[f"n_{name}"].tolist() == oracle[f"n_{name}"].tolist(), name
    assert out["text_redacted"].tolist() == oracle["s"].tolist()


@settings(max_examples=40, deadline=None)
@given(_texts)
def test_repetition_metrics_match_duckdb(texts):
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    out = T.repetition_metrics(df).sort_values("doc_id").reset_index(drop=True)
    con = _con(df)
    oracle = con.execute("""
        WITH l AS (SELECT doc_id,
                          list_filter(string_split(lower(COALESCE(text, '')), ' '),
                                      x -> x <> '') AS toks
                   FROM documents),
        w AS (SELECT doc_id, unnest(toks) AS tok FROM l),
        c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM w GROUP BY 1, 2),
        m AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                     CAST(COUNT(*) AS BIGINT) AS n_distinct, MAX(cnt) AS mx
              FROM c GROUP BY 1),
        g AS (SELECT doc_id, list_transform(range(1, len(toks)),
                                            i -> toks[i] || ' ' || toks[i + 1]) AS grams
              FROM l),
        gm AS (SELECT doc_id, len(grams) AS tg, len(list_distinct(grams)) AS dg FROM g)
        SELECT d.doc_id, COALESCE(m.n_tokens, 0) AS n_tokens,
               COALESCE(m.n_distinct, 0) AS n_distinct,
               CASE WHEN COALESCE(m.n_tokens, 0) > 0
                    THEN CAST(m.mx AS DOUBLE) / m.n_tokens ELSE 0.0 END AS twf,
               CASE WHEN COALESCE(gm.tg, 0) > 0
                    THEN CAST(gm.tg - gm.dg AS DOUBLE) / gm.tg ELSE 0.0 END AS dgf
        FROM documents d LEFT JOIN m USING (doc_id) LEFT JOIN gm USING (doc_id)
        ORDER BY doc_id
    """).df()
    assert out["n_tokens"].tolist() == oracle["n_tokens"].tolist()
    assert out["n_distinct"].tolist() == oracle["n_distinct"].tolist()
    # raw IEEE divisions of identical integers: bit-equal, no rounding needed
    assert out["top_word_frac"].tolist() == oracle["twf"].tolist()
    assert out["dup_2gram_frac"].tolist() == oracle["dgf"].tolist()


@settings(max_examples=40, deadline=None)
@given(_texts, st.integers(min_value=2, max_value=5))
def test_word_ngram_hashes_match_duckdb(texts, n):
    from maritime_activity_reports_cdc_ray.functions.dedup import WordNgramExploder

    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    out = WordNgramExploder(n=n)(df)
    got = set(zip(out["doc_id"].tolist(),
                  out["h"].to_numpy().astype(np.uint64).tolist()))
    con = _con(df)
    joins = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    oracle = con.execute(f"""
        WITH l AS (SELECT doc_id,
                          list_filter(string_split(lower(COALESCE(text, '')), ' '),
                                      x -> x <> '') AS toks
                   FROM documents),
        g0 AS (SELECT doc_id,
                      CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                           WHEN len(toks) < {n} THEN [array_to_string(toks, ' ')]
                           ELSE list_transform(range(1, len(toks) - {n - 2}),
                                               i -> {joins})
                      END AS grams
               FROM l)
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5(u.gr), 1, 16))::UBIGINT AS h
        FROM g0, unnest(grams) AS u(gr)
    """).fetchall()
    assert got == {(int(d), int(h)) for d, h in oracle}


def _entry_mod():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "_entry_diff", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=-5, max_value=10_000), min_size=1, max_size=400))
def test_hll_estimate_matches_duckdb_replay(ray_session, user_ids):
    """The HLL sketch values themselves (not a bound): engine vs the oracle
    SQL that replays register/rho/harmonic-sum arithmetic GROUP BY'd, on
    random id sets split into two groups — grouped rows AND the
    register-max-merged '*' union row."""
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.stats import (
        grouped_hll_count_distinct,
        hll_count_distinct,
    )

    ids = np.asarray(user_ids, dtype=np.int64)
    df = pd.DataFrame({"user_id": ids,
                       "event_type": np.where(ids % 3 == 0, "a", "b")})
    ds = rd.from_pandas(df)
    approx = hll_count_distinct(ds, ["user_id"], p=12)
    grouped = grouped_hll_count_distinct(ds, "event_type", ["user_id"],
                                         p=12, include_global="*")
    con = duckdb.connect()
    con.register("events", df)
    got = con.execute(_entry_mod()._hll_oracle_sql()).df() \
        .set_index("event_type")
    assert round(approx, 2) == got.loc["*", "approx_users"]
    for g, a in zip(grouped["event_type"], grouped["approx"]):
        assert round(a, 2) == got.loc[g, "approx_users"], g


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(alphabet="abcde", min_size=1, max_size=3),
                min_size=1, max_size=300))
def test_cms_registers_match_duckdb(ray_session, terms):
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.stats import cms_estimate, cms_sketch

    df = pd.DataFrame({"term": terms})
    regs = cms_sketch(rd.from_pandas(df), "term", d=4, w=64).to_pandas()
    uniq = sorted(set(terms))
    est = cms_estimate(regs, uniq, d=4, w=64)
    con = duckdb.connect()
    con.register("t", df)
    oracle = con.execute("""
        WITH tc AS (SELECT term, COUNT(*) AS c FROM t GROUP BY term),
        regs AS (SELECT i.i AS r,
                        ('0x' || substr(md5(i.i || ':' || term), 1, 16))::UBIGINT % 64 AS s,
                        SUM(c) AS v
                 FROM tc CROSS JOIN unnest(range(4)) i(i) GROUP BY 1, 2)
        SELECT tc.term, MIN(r2.v) AS e
        FROM tc CROSS JOIN unnest(range(4)) i(i)
        JOIN regs r2 ON r2.r = i.i
         AND r2.s = ('0x' || substr(md5(i.i || ':' || tc.term), 1, 16))::UBIGINT % 64
        GROUP BY tc.term ORDER BY tc.term
    """).df()
    assert est.tolist() == oracle["e"].astype("int64").tolist()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.floats(min_value=-10, max_value=600, allow_nan=False),
                min_size=1, max_size=300))
def test_histogram_sketch_matches_duckdb(ray_session, values):
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.stats import (
        histogram_quantile_sketch,
    )

    df = pd.DataFrame({"g": "x", "v": np.asarray(values, dtype=np.float64)})
    out = histogram_quantile_sketch(rd.from_pandas(df), "g", "v",
                                    lo=0.0, hi=512.0, n_bins=256, qs=(0.5, 0.9))
    con = duckdb.connect()
    con.register("t", df)
    oracle = con.execute("""
        WITH hist AS (SELECT CAST(LEAST(GREATEST(FLOOR((v - 0.0) / 2.0), 0), 255)
                                  AS BIGINT) AS bin, COUNT(*) AS c
                      FROM t GROUP BY 1),
        tot AS (SELECT SUM(c) AS n FROM hist),
        cum AS (SELECT bin, SUM(c) OVER (ORDER BY bin) AS cc, t.n
                FROM hist, tot t)
        SELECT 0.0 + 2.0 * MIN(CASE WHEN cc >= CEIL(0.5 * n) THEN bin END) AS p50,
               0.0 + 2.0 * MIN(CASE WHEN cc >= CEIL(0.9 * n) THEN bin END) AS p90
        FROM cum
    """).df()
    assert out["approx_p50"].iloc[0] == oracle["p50"].iloc[0]
    assert out["approx_p90"].iloc[0] == oracle["p90"].iloc[0]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=0, max_size=60),
       st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=60))
def test_bloom_positions_match_duckdb(members, probes):
    from maritime_activity_reports_cdc_ray.functions.dedup import (
        bloom_build,
        bloom_contains,
    )

    m_arr = np.asarray(members, dtype=np.uint64)
    p_arr = np.asarray(probes, dtype=np.uint64)
    bits = bloom_build(m_arr, m=4096, k=4)
    got = bloom_contains(bits, p_arr, m=4096, k=4)
    import pyarrow as pa

    con = duckdb.connect()
    # register as arrow uint64 so DuckDB sees UBIGINT directly (the
    # production oracle computes h as UBIGINT from md5 in-SQL)
    con.register("mem", pa.table({"h": pa.array(m_arr, type=pa.uint64())}))
    con.register("pr", pa.table({"h": pa.array(p_arr, type=pa.uint64())}))
    oracle = con.execute("""
        WITH mh AS (SELECT h FROM mem),
        ph AS (SELECT ROW_NUMBER() OVER () AS rn, h FROM pr),
        bloom AS (SELECT DISTINCT
                      ((CAST(mh.h AS HUGEINT) + i.i * CAST((mh.h >> 17) AS HUGEINT)
                        + i.i * i.i) % 4096) AS bit
                  FROM mh CROSS JOIN unnest(range(4)) i(i))
        SELECT ph.rn,
               SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) = 4 AS inb
        FROM ph CROSS JOIN unnest(range(4)) i(i)
        LEFT JOIN bloom b
          ON b.bit = ((CAST(ph.h AS HUGEINT) + i.i * CAST((ph.h >> 17) AS HUGEINT)
                       + i.i * i.i) % 4096)
        GROUP BY ph.rn ORDER BY ph.rn
    """).df()
    assert got.tolist() == oracle["inb"].astype(bool).tolist()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(alphabet="ab 01é.", max_size=40), min_size=1, max_size=6))
def test_rolling_fingerprint_matches_duckdb(texts):
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    rf = T.RollingFingerprint(k=8, w=16)
    out = rf.fingerprints(df)
    got = set(zip(out["doc_id"].tolist(), out["fp"].tolist()))
    con = duckdb.connect()
    con.register("documents", df)
    oracle = con.execute(_entry_mod()._rolling_fp_oracle_sql()).fetchall()
    assert got == {(int(d), int(fp)) for d, fp in oracle}


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=12, max_value=40), st.integers(min_value=0, max_value=10**6))
def test_kmeans_matches_duckdb_replay(ray_session, n_vecs, seed):
    """Both Lloyd iterations replayed in SQL on random embeddings — the
    stress test of the per-step half-away-from-zero quantization contract."""
    import pyarrow as pa
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.similarity import kmeans_fit

    dim, k, stride = 8, 4, 5
    rng = np.random.default_rng(seed)
    vecs = rng.normal(0, 1, (n_vecs, dim)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n_vecs),
                       "embedding": [v for v in vecs]})
    _, stats = kmeans_fit(rd.from_pandas(df), k=k, iters=2,
                          centroid_id_stride=stride)
    con = duckdb.connect()
    con.register("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vecs)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32()))}))
    oracle = con.execute(_entry_mod()._kmeans_oracle_sql(
        k=k, iters=2, dim=dim, stride=stride)).df().sort_values("cluster")
    got = stats.sort_values("cluster").reset_index(drop=True)
    assert got["cluster"].tolist() == oracle["cluster"].tolist()
    assert got["n_vecs"].tolist() == oracle["n_vecs"].tolist()
    assert got["inertia"].tolist() == oracle["inertia"].tolist()


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="ab c.", min_size=0, max_size=30),
                min_size=2, max_size=6))
def test_minhash_and_simhash_pairs_match_duckdb(ray_session, texts):
    """The full MinHash+LSH+verify and SimHash pipelines vs their production
    oracle SQL on random documents."""
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.dedup import (
        minhash_lsh_candidates,
        simhash_candidates,
        verify_pairs_jaccard,
    )

    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    docs = rd.from_pandas(df)
    cand = minhash_lsh_candidates(docs, num_perm=64, bands=16)
    mh = verify_pairs_jaccard(cand, docs, threshold=0.5,
                              broadcast_all_texts=True).to_pandas()
    sh = simhash_candidates(docs, max_hamming=8, bands=9).to_pandas()
    def pairs(frame, score, r6=False):
        if not len(frame):  # empty Ray results surface with no columns
            return set()
        sc = frame[score].to_numpy()
        if r6:
            sc = np.copysign(np.floor(np.abs(sc * 1e6) + 0.5), sc) / 1e6
        return {(int(a), int(b), float(s)) for a, b, s in
                zip(frame["id_a"], frame["id_b"], sc)}

    con = _con(df)
    E = _entry_mod()
    mh_o = con.execute(E._minhash_oracle_sql()).df()
    assert pairs(mh, "jaccard", r6=True) == pairs(mh_o, "jaccard")
    sh_o = con.execute(E._simhash_oracle_sql()).df()
    assert pairs(sh, "hamming") == pairs(sh_o, "hamming")


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="ab c é0.", max_size=40), min_size=1, max_size=8),
       st.integers(min_value=1, max_value=4))
def test_segment_dedup_matches_duckdb(ray_session, texts, seg_tokens):
    """Cross-doc segment dedup (CCNet line-dedup analogue) vs the production
    oracle SQL: segmentation, md5_u64 hash counting, removal rule and the
    kept-segments md5 rebuild, on adversarial docs (repeats, unicode,
    empty/whitespace) and varying segment widths."""
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.dedup import segment_dedup

    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    out = (segment_dedup(rd.from_pandas(df), seg_tokens=seg_tokens)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    out["seg_dup_frac"] = np.copysign(
        np.floor(np.abs(out["seg_dup_frac"]) * 1e6 + 0.5), out["seg_dup_frac"]) / 1e6
    con = _con(df)
    oracle = con.execute(f"""
        WITH l AS (SELECT doc_id,
                          list_filter(string_split(lower(COALESCE(text, '')), ' '),
                                      x -> x <> '') AS toks
                   FROM documents),
        segs AS (SELECT doc_id, i.i AS seg_no,
                        array_to_string(
                            toks[i.i * {seg_tokens} + 1 : i.i * {seg_tokens} + {seg_tokens}],
                            ' ') AS seg
                 FROM l, unnest(range(0, (len(toks) + {seg_tokens - 1}) // {seg_tokens})) i(i)),
        hs AS (SELECT doc_id, seg_no, seg,
                      ('0x' || substr(md5(seg), 1, 16))::UBIGINT AS h,
                      len(list_filter(string_split(seg, ' '), x -> x <> '')) AS ntok
               FROM segs),
        sc AS (SELECT h, COUNT(*) AS cnt FROM hs GROUP BY h),
        sd AS (SELECT hs.doc_id, COUNT(*) AS n_segs,
                      CAST(SUM(CASE WHEN sc.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segs,
                      ROUND(CAST(SUM(CASE WHEN sc.cnt > 1 THEN 1 ELSE 0 END)
                                 AS DOUBLE) / COUNT(*), 6) AS seg_dup_frac,
                      CAST(COALESCE(SUM(CASE WHEN sc.cnt <= 1 THEN ntok END), 0)
                           AS BIGINT) AS n_tokens_kept,
                      md5(COALESCE(string_agg(CASE WHEN sc.cnt <= 1 THEN seg END,
                                              ' ' ORDER BY seg_no), '')) AS clean_md5
               FROM hs JOIN sc USING (h) GROUP BY hs.doc_id)
        SELECT d.doc_id, COALESCE(sd.n_segs, 0) AS n_segs,
               COALESCE(sd.n_dup_segs, 0) AS n_dup_segs,
               COALESCE(sd.seg_dup_frac, 0.0) AS seg_dup_frac,
               COALESCE(sd.n_tokens_kept, 0) AS n_tokens_kept,
               COALESCE(sd.clean_md5, md5('')) AS clean_md5
        FROM documents d LEFT JOIN sd USING (doc_id) ORDER BY doc_id
    """).df()
    for col in ["n_segs", "n_dup_segs", "n_tokens_kept", "clean_md5"]:
        assert out[col].tolist() == oracle[col].tolist(), col
    assert np.allclose(out["seg_dup_frac"], oracle["seg_dup_frac"], atol=0, rtol=0)


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=2, max_value=40), st.integers(min_value=0, max_value=10**6))
def test_window_kernels_match_duckdb(ray_session, n, seed):
    """Every per-key window kernel vs the corresponding DuckDB window
    function on random event logs with duplicate keys, duplicate order
    values (tie stress) and single-row keys. event_id breaks ties wherever
    the kernel contract requires a total order."""
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions import window as W

    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, max(2, n // 4), n),
        "ts": pd.to_datetime(rng.integers(0, 50, n) * 10, unit="s"),
        "value": rng.integers(-3, 4, n).astype("float64"),
        "event_type": rng.choice(["a", "b", "c"], n),
    })
    con = _con(df.rename(columns={"text": "t"}))
    con.unregister("documents"); con.register("events", df)
    ds = rd.from_pandas(df)

    def key(f):  # order-insensitive row-level compare
        return f.sort_values("event_id").reset_index(drop=True)

    # W1 lag
    out = key(W.per_key_lag(ds, "user_id", ["ts", "event_id"],
                            {"value": "prev_value"}).to_pandas())
    ora = key(con.execute("""
        SELECT *, lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS prev_value FROM events""").df())
    assert out["prev_value"].fillna(-9).tolist() == ora["prev_value"].fillna(-9).tolist()

    # W2 transitions (first row of a key counts)
    out = W.transitions(ds, "user_id", ["ts", "event_id"], "event_type") \
        .to_pandas()["event_id"].sort_values().tolist()
    ora = con.execute("""
        SELECT event_id FROM (
            SELECT event_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS p
            FROM events)
        WHERE p IS NULL OR p <> event_type ORDER BY event_id""").df()
    assert out == ora["event_id"].tolist()

    # SCD2 valid_to = lead(order)
    out = key(W.scd2_view(ds, "user_id", "event_id").to_pandas())
    ora = key(con.execute("""
        SELECT event_id, lead(event_id) OVER (PARTITION BY user_id
                                              ORDER BY event_id) AS valid_to
        FROM events""").df())
    assert out["valid_to"].fillna(-9).tolist() == ora["valid_to"].fillna(-9).tolist()

    # sessionize (gap > 15s). Session ids are tie-order invariant.
    out = key(W.sessionize(ds, "user_id", "ts", 15.0).to_pandas())
    ora = key(con.execute("""
        SELECT event_id, SUM(CASE WHEN gap IS NULL OR gap > 15 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
        FROM (SELECT event_id, user_id, ts,
                     date_diff('second',
                               lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id), ts) AS gap
              FROM events)""").df())
    assert out["session_id"].tolist() == ora["sid"].astype("int64").tolist()

    # rank within partition (competition ranking, ties share)
    out = key(W.rank_within(ds, "event_type", "value").to_pandas())
    ora = key(con.execute("""
        SELECT event_id, RANK() OVER (PARTITION BY event_type
                                      ORDER BY value DESC) AS rnk
        FROM events""").df())
    assert out["rnk"].tolist() == ora["rnk"].astype("int64").tolist()

    # top-k per group (row_number with id tie-break)
    out = W.topk_per_group(ds, "event_type", "value", "event_id", k=3) \
        .to_pandas()["event_id"].sort_values().tolist()
    ora = con.execute("""
        SELECT event_id FROM (
            SELECT event_id, ROW_NUMBER() OVER (PARTITION BY event_type
                ORDER BY value DESC, event_id) AS rn FROM events)
        WHERE rn <= 3 ORDER BY event_id""").df()
    assert out == ora["event_id"].tolist()

    # adjacent pairing (rows 2..n per key) — the one kernel here that FILTERS
    # rows, so it can return a zero-row dataset (every key single-row);
    # dataset_to_pandas keeps the schema where Ray's to_pandas drops it
    from maritime_activity_reports_cdc_ray.functions.kernels import (
        dataset_to_pandas)

    out = key(dataset_to_pandas(
        W.adjacent_pairs(ds, "user_id", ["ts", "event_id"], ["event_type"])))
    ora = key(con.execute("""
        SELECT event_id, p FROM (
            SELECT event_id, lag(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS p FROM events)
        WHERE p IS NOT NULL""").df())
    assert out["prev_event_type"].tolist() == ora["p"].tolist()

    # global competition rank (distributed sorted-block offsets)
    out = key(W.global_rank(ds, "value").to_pandas()
              [["event_id", "rnk"]])
    ora = key(con.execute("""
        SELECT event_id, RANK() OVER (ORDER BY value DESC) AS rnk
        FROM events""").df())
    assert out["rnk"].tolist() == ora["rnk"].astype("int64").tolist()

    # running + rolling-frame sums (integer-exact moving window)
    dsi = rd.from_pandas(df.assign(v=df["value"].astype("int64")))
    out = key(W.rolling_agg(dsi, "user_id", ["ts", "event_id"], "v",
                            window_rows=3).to_pandas())
    ora = key(con.execute("""
        SELECT event_id,
               CAST(SUM(CAST(value AS BIGINT)) OVER
                    (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_sum,
               CAST(SUM(CAST(value AS BIGINT)) OVER
                    (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS rolling_sum,
               COUNT(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS rolling_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""").df())
    for c in ("running_sum", "rolling_sum", "rolling_n"):
        assert out[c].tolist() == ora[c].astype("int64").tolist(), c

    # NTILE (remainder spread over the first buckets, ANSI rule)
    for nb in (1, 2, 3, 5):
        out = key(W.ntile_within(ds, "event_type", "value", "event_id",
                                 n=nb).to_pandas())
        ora = key(con.execute(f"""
            SELECT event_id, NTILE({nb}) OVER (PARTITION BY event_type
                ORDER BY value DESC, event_id) AS ntile FROM events""").df())
        assert out["ntile"].tolist() == ora["ntile"].astype("int64").tolist(), nb


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=16, max_value=48), st.integers(min_value=0, max_value=9))
def test_knn_pq_matches_duckdb_replay(ray_session, n_vecs, seed):
    """Product-quantization ANN (codebook build → encode → ADC scoring)
    replayed in SQL on random embeddings — stress of the per-subspace
    rounding contract and the smallest-codeword/neighbor tie-breaks."""
    import pyarrow as pa
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.similarity import knn_pq

    dim, m, ksub, stride = 8, 2, 4, 5
    rng = np.random.default_rng(seed)
    vecs = rng.normal(0, 1, (n_vecs, dim)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n_vecs),
                       "embedding": [v for v in vecs]})
    out = knn_pq(rd.from_pandas(df), query_ids=[0, 1, 2, 3, 4], k=10,
                 m=m, ksub=ksub, centroid_id_stride=stride).to_pandas()
    con = duckdb.connect()
    con.register("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vecs)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32()))}))
    oracle = con.execute(_entry_mod()._knn_pq_oracle_sql(
        m=m, ksub=ksub, dim=dim, stride=stride)).df()
    key = lambda d: d.sort_values(["query_id", "rank"]).reset_index(drop=True)
    got, ora = key(out[["query_id", "neighbor_id", "rank"]]), key(oracle)
    assert got["query_id"].tolist() == ora["query_id"].tolist()
    assert got["neighbor_id"].tolist() == ora["neighbor_id"].tolist()
    assert got["rank"].tolist() == ora["rank"].astype("int64").tolist()


@settings(max_examples=15, deadline=None)
@given(st.lists(st.sampled_from(["en", "de", "fr", "xx"]), min_size=2, max_size=40),
       st.integers(min_value=0, max_value=1000))
def test_temperature_sample_matches_duckdb(ray_session, langs, id0):
    """α=0.5 temperature rebalancing: the integer gate
    md5_u64(id) % N_g < isqrt(N_g·N_min) vs the SQL replay (float sqrt +
    one-step correction), on skewed random group distributions."""
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.sample import (
        temperature_hash_sample,
    )

    df = pd.DataFrame({"doc_id": np.arange(id0, id0 + len(langs)),
                       "lang": langs, "n_chars": np.ones(len(langs), int)})
    out = temperature_hash_sample(rd.from_pandas(df), "doc_id", "lang").to_pandas()
    con = _con(df)
    ora = con.execute("""
        WITH tn AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl
                    FROM documents GROUP BY lang),
        tk AS (SELECT lang, nl, nl * (SELECT MIN(nl) FROM tn) AS x,
                      CAST(FLOOR(SQRT(CAST(nl * (SELECT MIN(nl) FROM tn)
                                           AS DOUBLE))) AS BIGINT) AS k0
               FROM tn),
        tq AS (SELECT lang, nl,
                      CASE WHEN (k0 + 1) * (k0 + 1) <= x THEN k0 + 1
                           WHEN k0 * k0 > x THEN k0 - 1 ELSE k0 END AS kl
               FROM tk)
        SELECT d.doc_id FROM documents d JOIN tq USING (lang)
        WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 16))::UBIGINT
              % CAST(tq.nl AS UBIGINT) < CAST(tq.kl AS UBIGINT)
        ORDER BY doc_id""").df()
    got = sorted(out["doc_id"].tolist()) if len(out) else []
    assert got == ora["doc_id"].tolist()


@settings(max_examples=40, deadline=None)
@given(_texts)
def test_hashed_classifier_matches_duckdb(texts):
    """fasttext-style hashed-bag-of-words linear scorer vs its SQL replay:
    md5 feature hashing, derived integer weights, exact integer score sums."""
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    out = (T.HashedLinearClassifier()(df)
           .sort_values("doc_id").reset_index(drop=True))
    con = _con(df)
    ora = con.execute("""
        WITH l AS (SELECT doc_id,
                          list_filter(string_split(lower(COALESCE(text, '')), ' '),
                                      x -> x <> '') AS toks
                   FROM documents),
        w AS (SELECT doc_id,
                     CAST(('0x' || substr(md5('w:' || CAST(
                         ('0x' || substr(md5(u.tok), 1, 16))::UBIGINT % 128
                     AS VARCHAR)), 1, 16))::UBIGINT % 2001 AS BIGINT) - 1000 AS wt
              FROM l, unnest(toks) AS u(tok))
        SELECT l.doc_id, COALESCE(SUM(w.wt), 0) AS score
        FROM l LEFT JOIN w USING (doc_id) GROUP BY l.doc_id ORDER BY doc_id
    """).df()
    assert out["clf_score"].tolist() == ora["score"].astype("int64").tolist()
    assert (out["clf_label"] == np.where(ora["score"] > 0, "pos", "neg")).all()


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=1, max_value=30), st.integers(min_value=0, max_value=10**6),
       st.floats(min_value=0.001, max_value=1e6))
def test_jl_projection_matches_duckdb(n_vecs, seed, scale):
    """Every quantized JL coordinate replayed in SQL (md5-parity sign matrix,
    /sqrt(d) scaling, 6dp half-away rounding) on random vectors across six
    orders of magnitude — the cross-engine contract of RandomProjector."""
    import pyarrow as pa

    from maritime_activity_reports_cdc_ray.functions.similarity import (
        RandomProjector,
        _to_matrix,
    )

    dim, out_dim = 8, 4
    rng = np.random.default_rng(seed)
    vecs = (rng.normal(0, scale, (n_vecs, dim))).astype(np.float32)
    rp = RandomProjector(dim, out_dim)
    got = rp.project(_to_matrix([v for v in vecs]))

    con = duckdb.connect()
    con.register("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vecs)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32()))}))
    oracle = con.execute(f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        vd AS (SELECT vec_id, i.i AS dim, e[CAST(i.i AS INT) + 1] AS x
               FROM v, unnest(range({dim})) i(i)),
        s AS (SELECT i.i AS dim, j.j AS outd,
                     CASE WHEN ('0x' || substr(md5('jl:' || i.i || ':' || j.j), 1, 16))::UBIGINT % 2 = 0
                          THEN 1.0 ELSE -1.0 END AS sgn
              FROM unnest(range({dim})) i(i), unnest(range({out_dim})) j(j))
        SELECT vd.vec_id, s.outd, ROUND(SUM(vd.x * s.sgn) / sqrt({out_dim}.0), 6) AS px
        FROM vd JOIN s ON s.dim = vd.dim
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    want = oracle["px"].to_numpy().reshape(n_vecs, out_dim)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_qlog2_fp_matches_duckdb():
    """The fixed-point integer log2 kernel vs its SQL mirror across the whole
    magnitude range (1 .. 2^42, incl. exact powers of two and off-by-ones)."""
    ns = [1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 255, 256, 257, 1023, 1024,
          1025, (1 << 20) - 1, 1 << 20, (1 << 20) + 1, (1 << 42) - 1, 1 << 42]
    eng = T.qlog2_fp(np.array(ns, dtype=np.int64))
    con = duckdb.connect()
    expr = ("(length(bin(n))-1)*1048576 + ((n*1048576) >> (length(bin(n))-1))"
            " - 1048576")
    vals = ", ".join(f"({n})" for n in ns)
    ora = con.execute(
        f"SELECT {expr} AS q FROM (VALUES {vals}) t(n)").df()["q"]
    assert eng.tolist() == ora.tolist()


@settings(max_examples=20, deadline=None)
@given(_texts, st.integers(min_value=1, max_value=6),
       st.sampled_from([4, 8, 16]))
def test_lm_perplexity_matches_duckdb(ray_session, texts, vocab_size, gate):
    """The full bigram-LM pipeline (train on the corpus, score every doc) vs
    the production oracle SQL (__ray_entry__._lm_scored_sql — the same string
    the driver runs) on adversarial random corpora and tiny vocabularies."""
    import ray.data as rd

    import __ray_entry__ as E

    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    out = (T.lm_perplexity(rd.from_pandas(df), vocab_size=vocab_size,
                           t_low_bits=2.5, t_high_bits=7.25, concurrency=1,
                           train_hex_gate=gate)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = _con(df)
    sql = E._lm_scored_sql(vocab_size, T.LM_BACKOFF_NLL_FP,
                           T.lm_threshold_fp(2.5), T.lm_threshold_fp(7.25),
                           train_hex_gate=gate)
    ora = con.execute(sql + " ORDER BY doc_id").df()
    assert out["n_tokens"].tolist() == ora["n_tokens"].tolist()
    assert out["nll_fp"].tolist() == ora["nll_fp"].tolist()
    assert out["lm_band"].tolist() == ora["band"].tolist()


@settings(max_examples=30, deadline=None)
@given(_texts, st.integers(min_value=0, max_value=100))
def test_c4_clean_matches_duckdb(texts, id0):
    """The C4 cleaner face (synthetic page structure + every line/page rule)
    vs the production oracle SQL (__ray_entry__._c4_oracle_sql) on random
    word soup and id offsets (which steer the injection patterns)."""
    import __ray_entry__ as E
    from maritime_activity_reports_cdc_ray.functions.text import c4_clean

    df = pd.DataFrame({"doc_id": np.arange(id0, id0 + len(texts)),
                       "text": texts})
    out = c4_clean(E._c4_synth(df)).sort_values("doc_id").reset_index(drop=True)
    import hashlib
    out["out_md5"] = out["text_clean"].map(
        lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
    con = _con(df)
    ora = con.execute(E._c4_oracle_sql() + " ORDER BY doc_id").df()
    for c in ["n_lines", "n_kept_lines", "n_sentences", "page_kept"]:
        assert out[c].tolist() == ora[c].tolist(), c
    assert out["out_md5"].tolist() == ora["out_md5"].tolist()


@settings(max_examples=40, deadline=None)
@given(_texts)
def test_token_entropy_matches_duckdb(texts):
    """token_entropy_fp (fixed-point unigram entropy) vs the SQL formula the
    docs_token_stats oracle embeds."""
    import __ray_entry__ as E

    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    out = T.token_entropy_fp(df)
    con = _con(df)
    ora = con.execute(f"""
        WITH et AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(lower(COALESCE(text, '')), ' '),
                                      x -> x <> '')) AS w
            FROM documents),
        ec AS (SELECT doc_id, w, COUNT(*) AS c FROM et GROUP BY 1, 2),
        en AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM ec GROUP BY 1),
        ed AS (
            SELECT ec.doc_id,
                   CAST(SUM(ec.c * ({E._ql_sql('en.n')} - {E._ql_sql('ec.c')}))
                        AS BIGINT) AS s
            FROM ec JOIN en USING (doc_id) GROUP BY 1)
        SELECT d.doc_id, COALESCE(ed.s, 0) AS s, COALESCE(en.n, 0) AS n
        FROM documents d LEFT JOIN ed USING (doc_id) LEFT JOIN en USING (doc_id)
        ORDER BY d.doc_id""").df()
    assert out["entropy_fp"].tolist() == ora["s"].tolist()
    assert out["n_tokens"].tolist() == ora["n"].tolist()


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=8, max_value=60), st.integers(min_value=0, max_value=9),
       st.integers(min_value=5, max_value=50))
def test_kmeans_prune_matches_duckdb_replay(ray_session, n_vecs, seed, q_pct):
    """Prototypicality pruning vs the SQL window-rank replay on random
    embeddings and prune fractions (tie-breaks: d2 DESC, vec_id ASC; prune
    count = (n_c·q + 99)//100 — exact integers on both sides)."""
    import pyarrow as pa
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.similarity import kmeans_prune

    dim, k, stride = 8, 4, 5
    rng = np.random.default_rng(seed)
    vecs = rng.normal(0, 1, (n_vecs, dim)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n_vecs),
                       "embedding": [v for v in vecs]})
    out = kmeans_prune(rd.from_pandas(df), q_pct=q_pct, k=k, iters=2,
                       centroid_id_stride=stride)
    con = duckdb.connect()
    con.register("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vecs)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32()))}))
    ora = con.execute(_entry_mod()._kmeans_prune_oracle_sql(
        q_pct=q_pct, k=k, iters=2, dim=dim, stride=stride)).df() \
        .sort_values("cluster").reset_index(drop=True)
    assert out["cluster"].tolist() == ora["cluster"].tolist()
    assert out["n_pruned"].tolist() == ora["n_vecs"].tolist()
    assert out["pruned_inertia"].tolist() == ora["inertia"].tolist()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=25),
       st.integers(min_value=1, max_value=60))
def test_next_fit_pack_matches_duckdb_recursion(sizes, cap):
    """The sequential next-fit fold vs the recursive-CTE replay the
    docs_token_stats oracle uses."""
    eng = T.next_fit_pack(np.array(sizes), cap)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"rn": np.arange(1, len(sizes) + 1),
                                    "nt": sizes}))
    ora = con.execute(f"""
        WITH RECURSIVE pk AS (
            SELECT rn, nt AS acc, 0 AS bin FROM t WHERE rn = 1
            UNION ALL
            SELECT t.rn,
                   CASE WHEN p.acc + t.nt > {cap} THEN t.nt ELSE p.acc + t.nt END,
                   CASE WHEN p.acc + t.nt > {cap} THEN p.bin + 1 ELSE p.bin END
            FROM pk p JOIN t ON t.rn = p.rn + 1)
        SELECT bin FROM pk ORDER BY rn""").df()["bin"]
    assert eng.tolist() == ora.tolist()


@settings(max_examples=30, deadline=None)
@given(_texts)
def test_chunk_fingerprints_match_duckdb(texts):
    """make_chunker windows vs the docs_fingerprint chunk-face SQL
    (list_slice rebuild) on adversarial random docs — pure pandas + DuckDB,
    no Ray."""
    import hashlib

    from maritime_activity_reports_cdc_ray.functions.text import make_chunker

    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    c = make_chunker(size=16, stride=8)(df)
    eng = (pd.Series([hashlib.md5(s.encode("utf-8")).hexdigest()
                      for s in c["chunk_text"]])
           .value_counts().sort_index())
    con = _con(df)
    ora = con.execute("""
        WITH d0 AS (
            SELECT doc_id,
                   list_filter(string_split(COALESCE(text, ''), ' '),
                               x -> x <> '') AS ws
            FROM documents),
        ks AS (
            SELECT doc_id, ws, unnest(range(0, (len(ws) + 7) // 8)) AS k
            FROM d0 WHERE len(ws) > 0)
        SELECT md5(array_to_string(
                   list_slice(ws, k * 8 + 1, LEAST(k * 8 + 16, len(ws))),
                   ' ')) AS fp, COUNT(*) AS n
        FROM ks GROUP BY 1 ORDER BY 1""").df()
    assert eng.index.tolist() == ora["fp"].tolist()
    assert eng.tolist() == ora["n"].tolist()


@settings(max_examples=30, deadline=None)
@given(_texts, st.lists(st.booleans(), min_size=1, max_size=8))
def test_dsir_scores_match_duckdb(texts, tflags):
    """DSIR per-doc fixed-point scores (hashed uni+bigram models, add-one
    smoothing, qlog2_fp log-space) vs a DuckDB replay of both models on
    adversarial random docs — m=64 to force bucket collisions. Pure
    pandas + DuckDB, no Ray."""
    from maritime_activity_reports_cdc_ray.functions.sample import (
        _dsir_buckets,
        dsir_model,
    )

    m = 64
    tgt = np.resize(np.array(tflags, dtype=bool), len(texts))
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts,
                       "lang": np.where(tgt, "en", "fr")})
    rows, b = _dsir_buckets(df["text"], m)
    rc = np.bincount(b, minlength=m)
    tc = np.bincount(b[tgt[rows]], minlength=m)
    lw = dsir_model(tc, rc, m)
    s = np.zeros(len(df), dtype=np.int64)
    np.add.at(s, rows, lw[b])
    nf = np.bincount(rows, minlength=len(df))
    eng = (df.assign(score_fp=s)[nf > 0][["doc_id", "score_fp"]]
           .sort_values("doc_id").reset_index(drop=True))

    ql = lambda e: (f"((length(bin({e}))-1)*1048576 + ((({e})*1048576) >> "
                    f"(length(bin({e}))-1)) - 1048576)")
    con = _con(df)
    ora = con.execute(f"""
        WITH d0 AS (
            SELECT doc_id,
                   list_filter(string_split(lower(COALESCE(text, '')), ' '),
                               x -> x <> '') AS ws
            FROM documents),
        feats AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(ng), 1, 16))::UBIGINT
                        % {m} AS BIGINT) AS b
            FROM (
                SELECT doc_id, unnest(ws) AS ng FROM d0
                UNION ALL
                SELECT doc_id, ws[kk] || ' ' || ws[kk + 1] AS ng
                FROM d0, unnest(range(1, len(ws))) AS u(kk))),
        cnt AS (
            SELECT b, CAST(COUNT(*) AS BIGINT) AS rc,
                   CAST(COUNT(*) FILTER (WHERE d.lang = 'en') AS BIGINT) AS tc
            FROM feats f JOIN documents d USING (doc_id) GROUP BY b),
        tot AS (SELECT CAST(SUM(tc) + {m} AS BIGINT) AS tn,
                       CAST(SUM(rc) + {m} AS BIGINT) AS rn FROM cnt),
        model AS (
            SELECT b, ({ql('tc + 1')} - {ql('tn')})
                    - ({ql('rc + 1')} - {ql('rn')}) AS lw
            FROM cnt, tot)
        SELECT doc_id, CAST(SUM(lw) AS BIGINT) AS score_fp
        FROM feats JOIN model USING (b) GROUP BY doc_id ORDER BY doc_id
        """).df()
    assert eng["doc_id"].tolist() == ora["doc_id"].tolist()
    assert eng["score_fp"].tolist() == ora["score_fp"].tolist()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="ab c", min_size=0, max_size=80),
                min_size=2, max_size=10))
def test_dup_span_stats_match_duckdb(texts):
    """Duplicate-span arithmetic (PositionalNgramExploder + the closed-form
    Σ min(w, Δp) coverage) vs the docs_repetition span-CTE SQL on random
    docs over a 3-letter alphabet (tiny vocab → windows collide constantly,
    w=3 so short docs still produce windows). Pure pandas + DuckDB."""
    from maritime_activity_reports_cdc_ray.functions.dedup import (
        PositionalNgramExploder,
    )

    w = 3
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    g = PositionalNgramExploder(w)(df)
    dup = (g.drop_duplicates(["h", "doc_id"]).groupby("h").size()
           .loc[lambda s: s >= 2].index)
    dg = g[g["h"].isin(dup)].sort_values(["doc_id", "p"])
    ids = dg["doc_id"].to_numpy()
    p = dg["p"].to_numpy(dtype=np.int64)
    eng_rows = {}
    if len(dg):
        first = np.empty(len(dg), dtype=bool)
        first[0] = True
        first[1:] = ids[1:] != ids[:-1]
        dp = np.empty(len(dg), dtype=np.int64)
        dp[0] = w
        dp[1:] = p[1:] - p[:-1]
        dp[first] = w
        r = pd.DataFrame({"doc_id": ids,
                          "dup_tokens": np.minimum(dp, w),
                          "dup_spans": (dp >= w).astype(np.int64)})
        agg = r.groupby("doc_id").agg(dup_windows=("doc_id", "size"),
                                      dup_tokens=("dup_tokens", "sum"),
                                      dup_spans=("dup_spans", "sum"))
        eng_rows = {int(i): tuple(v) for i, v in agg.iterrows()}

    con = _con(df)
    ora = con.execute(f"""
        WITH l AS (
            SELECT doc_id,
                   list_filter(string_split(lower(COALESCE(text, '')), ' '),
                               x -> x <> '') AS toks
            FROM documents),
        pg AS (
            SELECT doc_id, CAST(kk AS BIGINT) AS p,
                   ('0x' || substr(md5(array_to_string(
                        toks[kk : kk + {w - 1}], ' ')), 1, 16))::UBIGINT AS h
            FROM l, unnest(range(1, len(toks) - {w - 2})) u(kk)
            WHERE len(toks) >= {w}),
        pdup AS (SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS cd
                                FROM pg GROUP BY h) WHERE cd >= 2),
        pd1 AS (SELECT doc_id, p,
                       p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p) AS dp
                FROM pg JOIN pdup USING (h))
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS dup_windows,
               CAST(SUM(CASE WHEN dp IS NULL THEN {w}
                             ELSE LEAST(dp, {w}) END) AS BIGINT) AS dup_tokens,
               CAST(COUNT(*) FILTER (WHERE dp IS NULL OR dp >= {w})
                    AS BIGINT) AS dup_spans
        FROM pd1 GROUP BY doc_id ORDER BY doc_id""").df()
    ora_rows = {int(r.doc_id): (int(r.dup_windows), int(r.dup_tokens),
                                int(r.dup_spans)) for r in ora.itertuples()}
    assert eng_rows == ora_rows


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=12),
                min_size=1, max_size=40),
       st.integers(min_value=1, max_value=3))
def test_unigram_viterbi_matches_bruteforce(words, max_len):
    """_viterbi_segment vs brute-force enumeration of ALL segmentations
    (min total NLL, ties to the longest last piece / smallest split) on
    random piece tables — the DP's optimality + tie contract."""
    from itertools import combinations

    from maritime_activity_reports_cdc_ray.functions.text import _viterbi_segment

    # deterministic piece table derived from the words themselves
    pieces = {}
    for w in words:
        for a in range(len(w)):
            for b in range(a + 1, min(a + max_len, len(w)) + 1):
                p = w[a:b]
                pieces[p] = 1000 + (hash(p) % 997) * 100 // (len(p) + 1)
    floor = max(pieces.values()) + 1

    def brute(w):
        n = len(w)
        best = None
        for k in range(n):  # k split points
            for cuts in combinations(range(1, n), k):
                bounds = (0,) + cuts + (n,)
                segs = [w[i:j] for i, j in zip(bounds, bounds[1:])]
                if any(len(s) > max_len and s not in pieces for s in segs):
                    continue
                cost = 0
                ok = True
                for s in segs:
                    c = pieces.get(s)
                    if c is None:
                        if len(s) > 1:
                            ok = False
                            break
                        c = floor
                    cost += c
                if not ok:
                    continue
                # tie rule: smaller cost wins; then the DP's backtrack order
                # (longest last piece first) == lexicographically LARGEST
                # reversed-cut tuple... mirror by preferring the candidate
                # the DP would build: compare (cost, cuts-from-the-right)
                key = (cost, tuple(-c for c in reversed(cuts)))
                if best is None or key < best[0]:
                    best = (key, segs)
        return best[1]

    for w in words:
        if len(w) > 9:
            continue  # brute force blowup guard
        got = _viterbi_segment(w, pieces, max_len, floor)
        assert "".join(got) == w
        exp = brute(w)
        assert sum(pieces.get(s, floor) for s in got) == \
               sum(pieces.get(s, floor) for s in exp)


# ---------------------------------------------------------------------------
# Nested-payload replay fuzz: adversarial list/struct payload values through
# stamp → merge → silver vs the dict oracle (oracle.py KeyState.extra).
# ---------------------------------------------------------------------------
_nested_tags = st.one_of(
    st.none(),
    st.lists(st.text(alphabet="abé 中", min_size=0, max_size=4),
             min_size=0, max_size=3))
_nested_meta = st.one_of(
    st.none(),
    st.fixed_dictionaries({
        "author": st.one_of(st.none(),
                            st.text(alphabet="xyz", min_size=0, max_size=4)),
        "stars": st.one_of(st.none(),
                           st.integers(min_value=-5, max_value=10**6)),
    }))
_nested_events = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),   # key id
              st.booleans(),                           # tombstone?
              _nested_tags, _nested_meta),
    min_size=1, max_size=14)


@settings(max_examples=10, deadline=None)
@given(_nested_events, st.integers(min_value=1, max_value=3))
def test_nested_payload_replay_matches_oracle(ray_session, tmp_path_factory,
                                              events, n_epochs):
    """Random nested payloads — None, empty lists, unicode elements, structs
    with null fields — split across epochs, replayed distributed, compared
    per-key against the dict oracle's KeyState.extra."""
    import math

    import pyarrow.parquet as _pq

    from maritime_activity_reports_cdc_ray.config import EngineConfig
    from maritime_activity_reports_cdc_ray.generate import (NESTED_META_TYPE,
                                                            NESTED_TAGS_TYPE)
    from maritime_activity_reports_cdc_ray.oracle import replay_files
    from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay
    from maritime_activity_reports_cdc_ray.schemas import TOMBSTONE

    d = tmp_path_factory.mktemp("nested_fuzz")
    rows = []
    for i, (k, tomb, tags, meta) in enumerate(events):
        commit = f"c{i:012d}"
        if tomb:
            rows.append(("org/r", f"f{k}", commit, "", TOMBSTONE, tags, meta))
        else:
            rows.append(("org/r", f"f{k}", commit, "py",
                         f"body {k} {i}", tags, meta))
    per = max(1, math.ceil(len(rows) / n_epochs))
    files = []
    for e in range(0, len(rows), per):
        chunk = rows[e:e + per]
        t = pa.table({
            "repo": pa.array([r[0] for r in chunk], pa.string()),
            "path": pa.array([r[1] for r in chunk], pa.string()),
            "commit": pa.array([r[2] for r in chunk], pa.string()),
            "lang": pa.array([r[3] for r in chunk], pa.string()),
            "content": pa.array([r[4] for r in chunk], pa.large_string()),
            "tags": pa.array([r[5] for r in chunk], NESTED_TAGS_TYPE),
            "meta": pa.array([r[6] for r in chunk], NESTED_META_TYPE),
        })
        fp = str(d / f"part-{e // per:05d}.parquet")
        _pq.write_table(t, fp)
        files.append(fp)

    oracle = replay_files(files)
    lake = tmp_path_factory.mktemp("nested_fuzz_lake")
    r = CDCReplay(str(lake / "lake"), EngineConfig(num_partitions=2))
    r.setup()
    r.run(str(d))

    exp = oracle.expected_silver()
    batches = list(r.read_silver(columns=["repo", "path", "tags", "meta"])
                   .iter_batches(batch_format="pyarrow", batch_size=None))
    got = pa.concat_tables(batches).to_pylist() if batches else []
    assert len(got) == len(exp)
    for row in got:
        ex = exp[(row["repo"], row["path"])]["extra"] or {}
        assert row["tags"] == ex.get("tags"), row
        assert row["meta"] == ex.get("meta"), row
