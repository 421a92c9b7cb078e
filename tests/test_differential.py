"""Differential fuzzing: the newest oracle-attested kernels vs DuckDB itself.

The driver's correctness gate runs on fixed testdata; these tests generate
adversarial inputs (unicode, digits against word boundaries, empty/whitespace
docs, repeated tokens) with hypothesis and assert the ENGINE KERNEL and the
ORACLE SQL agree bit-for-bit on each of them — the drift guard behind the
"exact oracle" claims. Pure pandas + DuckDB: no Ray session needed."""

import duckdb
import numpy as np
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
