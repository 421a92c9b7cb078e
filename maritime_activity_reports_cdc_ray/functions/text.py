"""Text analysis for large-scale training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All stages are vectorized per batch; the language-ID and fingerprint stages
are callable classes (actor pools) so regexes/tables compile once per actor.
The quality-score shape mirrors the reference's tiered scorer
(``utils/data_quality.py:20-99``) applied to documents instead of AIS rows.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# Stopword tables for the n-gram/stopword language heuristic. Tiny on purpose:
# deterministic, dependency-free, broadcastable.
_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "para", "en", "que"},
}

_WS_RE = re.compile(r"\s+")
_TOKEN_RE = re.compile(r"\S+")
# BPE-ish word/number/punct splitter (GPT-2 style shape, ASCII approximation)
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")


def token_count(texts: pd.Series) -> pd.Series:
    """Whitespace token count (vectorized)."""
    return texts.fillna("").str.count(_TOKEN_RE).astype("int64")


def bpe_token_count(texts: pd.Series) -> pd.Series:
    """BPE-ish token count: words + digits + punctuation marks."""
    return texts.fillna("").str.count(_BPE_RE).astype("int64")


def normalize(texts: pd.Series) -> pd.Series:
    """Lowercase + collapse whitespace — the canonical form used by exact
    fingerprinting."""
    return texts.fillna("").str.lower().str.replace(_WS_RE, " ", regex=True).str.strip()


def fingerprint_md5(texts: pd.Series) -> pd.Series:
    """md5 hex of the normalized text (exact-dup fingerprint; md5 chosen so a
    SQL oracle can reproduce it: DuckDB ``md5(...)``).

    Distinct-only: dedup corpora are Zipf-heavy in repeated texts, so a
    C-level factorize finds the uniques, the md5 loop runs once per unique,
    and a take scatters the digests back (the ``hashing.md5_u64_array``
    trick applied to the hex form)."""
    norm = normalize(texts)
    arr = norm.to_numpy(dtype=object)
    if not len(arr):
        return pd.Series([], dtype=object, index=norm.index)
    codes, uniques = pd.factorize(arr, use_na_sentinel=False)
    md5 = hashlib.md5
    uh = np.empty(len(uniques), dtype=object)
    for i, s in enumerate(uniques):
        uh[i] = md5(s.encode("utf-8")).hexdigest()
    return pd.Series(uh[codes], index=norm.index)


def text_metrics(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Append quality metrics: n_tokens, n_chars_actual, avg_token_len,
    punct_ratio, upper_ratio, stopword_ratio (en)."""
    t = df[col].fillna("")
    n_chars = t.str.len().astype("int64")
    n_tokens = token_count(t)
    # ASCII punctuation class (not [^\w\s]): Python's \w is unicode-aware while
    # RE2/SQL oracles treat \w as ASCII — an explicit class keeps both equal
    n_punct = t.str.count(r"[!-/:-@\[-`{-~]").astype("int64")
    n_upper = t.str.count(r"[A-Z]").astype("int64")
    # stopword hits: explode tokens once → one C-level isin → bincount per
    # row position (the LangId kernel shape; no per-row Python loop)
    words = t.str.lower().str.findall(r"[a-z']+").reset_index(drop=True)
    stop = _STOPWORDS["en"]
    stop_hits = np.zeros(len(t), dtype=np.int64)
    ex = words.explode().dropna()
    if len(ex):
        rows = ex.index.to_numpy(dtype=np.int64)
        hits = ex.isin(stop).to_numpy()
        stop_hits = np.bincount(rows[hits], minlength=len(t)).astype(np.int64)
    df = df.copy()
    df["n_tokens"] = n_tokens
    df["n_chars_actual"] = n_chars
    df["avg_token_len"] = np.where(n_tokens > 0, n_chars / n_tokens, 0.0)
    df["punct_ratio"] = np.where(n_chars > 0, n_punct / n_chars, 0.0)
    df["upper_ratio"] = np.where(n_chars > 0, n_upper / n_chars, 0.0)
    df["stopword_ratio"] = np.where(n_tokens > 0, np.asarray(stop_hits) / n_tokens, 0.0)
    return df


def quality_score(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Tiered document quality score in {1.0, 0.8, 0.6, 0.4, 0.0} + category —
    the documents analogue of the reference's AIS scorer
    (utils/data_quality.py:60-99). Flags: long enough (>=20 tokens), not too
    long (<=100k chars), reasonable punctuation (<30%), has stopwords (>2%)."""
    m = text_metrics(df, col)
    flag_len = m["n_tokens"] >= 20
    flag_max = m["n_chars_actual"] <= 100_000
    flag_punct = m["punct_ratio"] < 0.30
    flag_stop = m["stopword_ratio"] > 0.02
    fails = (~flag_len).astype(int) + (~flag_max).astype(int) + \
        (~flag_punct).astype(int) + (~flag_stop).astype(int)
    score = np.select([fails == 0, fails == 1, fails == 2, fails == 3],
                      [1.0, 0.8, 0.6, 0.4], default=0.0)
    cat = np.select([fails == 0, fails == 1, fails == 2, fails == 3],
                    ["EXCELLENT", "GOOD", "FAIR", "POOR"], default="INVALID")
    m["doc_quality_score"] = score
    m["doc_quality_category"] = cat
    return m


class LangId:
    """Stopword-hit-rate language identifier (actor-pool stage: tables and
    regexes built once per actor in __init__)."""

    def __init__(self):
        self.tables = {k: frozenset(v) for k, v in _STOPWORDS.items()}
        self.word_re = re.compile(r"[a-zà-ÿ']+")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized: explode tokens once, one C-level isin + bincount
        # per language table, numpy argmax (first max wins = the table-order
        # strict-> scan this stage originally ran row-by-row)
        words = (df["text"].fillna("").str.lower()
                 .str.findall(self.word_re).reset_index(drop=True))
        n = len(df)
        langs = list(self.tables)
        counts = np.zeros((n, len(langs)), dtype=np.int64)
        ex = words.explode().dropna()
        if len(ex):
            rows = ex.index.to_numpy(dtype=np.int64)
            for li, lang in enumerate(langs):
                m = ex.isin(self.tables[lang]).to_numpy()
                if m.any():
                    counts[:, li] = np.bincount(rows[m], minlength=n)
        hits = counts.max(axis=1)
        best = counts.argmax(axis=1)
        lens = words.str.len().to_numpy(dtype=np.int64)
        pred = np.where(hits > 0, np.asarray(langs, dtype=object)[best], "unknown")
        conf = np.where(hits > 0, hits / np.maximum(lens, 1), 0.0)
        df = df.copy()
        df["lang_pred"] = pred
        df["lang_conf"] = conf
        return df


ROLLING_BASE = 257  # polynomial base; powers wrap mod 2^64 (mirrored in SQL)


class RollingFingerprint:
    """Winnowing-style rolling-hash fingerprint (actor-pool stage): k-gram
    polynomial hashes over UNICODE CODEPOINTS, keep the minimum hash per
    window of w, fingerprint set = distinct window minima.

    Codepoints (not UTF-8 bytes) so a SQL oracle reproduces every hash with
    character-indexed ``substr``/``unicode``: hash(gram at i) =
    ``sum_j cp[i+j] * 257^(k-1-j) mod 2^64``. Documents shorter than ``k``
    contribute ONE gram over the whole string (empty → hash 0).

    ``__call__`` emits the set's sha1 as a per-doc signature;
    ``fingerprints`` explodes the raw (doc_id, fp int64) set — the
    SQL-checkable form."""

    def __init__(self, k: int = 8, w: int = 16):
        self.k, self.w = k, w
        base = np.uint64(ROLLING_BASE)
        self.pw = base ** np.arange(self.k, dtype=np.uint64)  # wraps mod 2^64 — fine

    def _windows(self, s: str) -> np.ndarray:
        """Distinct window-min hashes (uint64) of one document."""
        k, w = self.k, self.w
        # one C-level UTF-32 encode == the per-char ord() loop, ~20x faster
        # (surrogatepass: lone surrogates keep their ord() codepoint)
        arr = np.frombuffer(s.encode("utf-32-le", "surrogatepass"),
                            dtype=np.uint32).astype(np.uint64)
        if len(arr) < k:
            if not len(arr):
                return np.zeros(1, dtype=np.uint64)
            h = (arr * self.pw[: len(arr)][::-1]).sum()
            return np.asarray([h], dtype=np.uint64)
        strided = np.lib.stride_tricks.sliding_window_view(arr, k)
        hashes = (strided * self.pw[::-1]).sum(axis=1)
        if len(hashes) > w:
            wins = np.lib.stride_tricks.sliding_window_view(hashes, w).min(axis=1)
        else:
            wins = hashes.min(keepdims=True)
        return np.unique(wins)

    def _fingerprint(self, s: str) -> str:
        return hashlib.sha1(self._windows(s).tobytes()).hexdigest()

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # distinct-only (Zipf-duplicate texts): factorize, fingerprint each
        # UNIQUE text once, scatter back — per-row Python only per unique
        df = df.copy()
        arr = df["text"].fillna("").to_numpy(dtype=object)
        if not len(arr):
            df["doc_fingerprint"] = pd.Series([], dtype=object,
                                              index=df.index)
            return df
        codes, uniques = pd.factorize(arr, use_na_sentinel=False)
        uh = np.empty(len(uniques), dtype=object)
        for i, s in enumerate(uniques):
            uh[i] = self._fingerprint(s)
        df["doc_fingerprint"] = uh[codes]
        return df

    def fingerprints(self, df: pd.DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> pd.DataFrame:
        """Exploded (id, fp) rows, fp = window-min hash as int64 (wrapped)."""
        ids, fps = [], []
        for i, t in zip(df[id_col].to_numpy(), df[text_col].fillna("")):
            sel = self._windows(t)
            ids.append(np.full(len(sel), i, dtype=np.int64))
            fps.append(sel.astype(np.int64))
        if not ids:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "fp": pd.Series(dtype="int64")})
        return pd.DataFrame({id_col: np.concatenate(ids),
                             "fp": np.concatenate(fps)})


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
# Default PII patterns. ASCII-only character classes on purpose: Python `re`
# and RE2 (DuckDB's regexp engine — what the SQL oracle runs) agree exactly on
# these, so a redaction is bit-reproducible in SQL. Applied IN ORDER: each
# replacement token is digit-free, so earlier redactions cannot create or
# destroy later matches in an engine-dependent way.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


class PiiRedactor:
    """PII scrubber (actor-pool stage: regexes compile once per actor).

    For each pattern, counts non-overlapping matches then replaces them —
    sequentially, in table order — and emits ``n_<name>`` count columns plus
    ``<col>_redacted``. The curation analogue of the reference's hard
    validity filters (utils/data_quality.py): rows aren't dropped, their
    sensitive spans are rewritten before training-data export."""

    def __init__(self, patterns=PII_PATTERNS):
        # re.ASCII: Python's \b/\d/\w are unicode-aware by default while
        # RE2's (DuckDB's) are ASCII — e.g. Python sees no word boundary
        # between 'é' and '5' but RE2 does. ASCII mode makes the two engines
        # agree on EVERY input, not just ASCII corpora (verified by the
        # hypothesis differential test against DuckDB).
        self.pats = [(name, re.compile(rx, re.ASCII), repl)
                     for name, rx, repl in patterns]

    def __call__(self, df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
        s = df[col].fillna("")
        out = df.copy()
        for name, rx, repl in self.pats:
            out[f"n_{name}"] = s.str.count(rx).astype("int64")
            s = s.str.replace(rx, repl, regex=True)
        out[f"{col}_redacted"] = s
        return out


# ---------------------------------------------------------------------------
# repetition / diversity metrics (Gopher-style quality signals)
# ---------------------------------------------------------------------------
def repetition_metrics(batch, id_col: str = "doc_id",
                       text_col: str = "text",
                       top_word_max: float = 0.125,
                       dup_2gram_max: float = 0.06):
    """Per-doc repetition signals à la Gopher's quality filters (Rae et al.
    2021 §A1.1): most-common-word fraction, duplicate-2-gram fraction,
    distinct-token count — plus an ``is_repetitive`` flag when either
    fraction exceeds its threshold.

    Tokenization is ``lower().split(' ')`` with empty tokens dropped — chosen
    bit-reproducible in SQL (``string_split(lower(text), ' ')``). Arrow-
    native: the tokenize/explode runs as C-level Arrow kernels, token and
    2-gram identity is dictionary CODES (never object strings), per-doc
    stats are lexsort run-length reductions. Accepts a pyarrow Table
    (zero-copy batch, returns a Table) or a pandas frame (returns a frame,
    the unit-test surface)."""
    from maritime_activity_reports_cdc_ray.functions.kernels import arrow_tokenize

    is_arrow = isinstance(batch, pa.Table)
    if is_arrow:
        ids, text = batch.column(id_col), batch.column(text_col)
        n = batch.num_rows
    else:
        ids = pa.array(batch[id_col])
        text = pa.array(batch[text_col], pa.string(), from_pandas=True)
        n = len(batch)
    rows, flat = arrow_tokenize(text)
    codes = flat.dictionary_encode().indices.to_numpy().astype(np.int64) \
        if len(flat) else np.empty(0, dtype=np.int64)
    n_tokens = np.bincount(rows, minlength=n).astype(np.int64) if len(rows) \
        else np.zeros(n, np.int64)

    top = np.zeros(n, dtype=np.int64)
    n_distinct = np.zeros(n, dtype=np.int64)
    if len(rows):
        # (row, code) run-lengths: rows are already sorted (explode order)
        idx = np.lexsort((codes, rows))
        r, c = rows[idx], codes[idx]
        new = np.ones(len(r), dtype=bool)
        new[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.r_[starts, len(r)])
        rr = r[starts]
        n_distinct = np.bincount(rr, minlength=n).astype(np.int64)
        row_new = np.ones(len(rr), dtype=bool)
        row_new[1:] = rr[1:] != rr[:-1]
        rstarts = np.flatnonzero(row_new)
        top[rr[rstarts]] = np.maximum.reduceat(cnt, rstarts)

    tot2 = np.zeros(n, dtype=np.int64)
    dist2 = np.zeros(n, dtype=np.int64)
    if len(rows) > 1:
        adj = rows[1:] == rows[:-1]  # 2-gram stays within one doc
        g1, g2, gr = codes[:-1][adj], codes[1:][adj], rows[:-1][adj]
        tot2 = np.bincount(gr, minlength=n).astype(np.int64)
        if len(gr):
            idx = np.lexsort((g2, g1, gr))
            a, b, r = g1[idx], g2[idx], gr[idx]
            new = np.ones(len(r), dtype=bool)
            new[1:] = (r[1:] != r[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            dist2 = np.bincount(r[new], minlength=n).astype(np.int64)

    top_word_frac = np.where(n_tokens > 0, top / np.maximum(n_tokens, 1), 0.0)
    dup_2gram_frac = np.where(tot2 > 0, (tot2 - dist2) / np.maximum(tot2, 1), 0.0)
    rep = ((top_word_frac > top_word_max)
           | (dup_2gram_frac > dup_2gram_max)).astype("int64")
    if is_arrow:
        return pa.table({
            id_col: ids,
            "n_tokens": pa.array(n_tokens),
            "n_distinct": pa.array(n_distinct),
            "top_word_frac": pa.array(top_word_frac),
            "dup_2gram_frac": pa.array(dup_2gram_frac),
            "is_repetitive": pa.array(rep),
        })
    return pd.DataFrame({
        id_col: batch[id_col].to_numpy(),
        "n_tokens": n_tokens,
        "n_distinct": n_distinct,
        "top_word_frac": top_word_frac,
        "dup_2gram_frac": dup_2gram_frac,
        "is_repetitive": rep,
    })


class HashedLinearClassifier:
    """Model-based quality scoring: a fasttext-style linear classifier over
    hashed bag-of-words features (the CCNet/GPT-3 "quality classifier" stage
    — score each document with a trained linear model, filter on the score).

    Here the weight vector is DETERMINISTIC instead of trained — weight of
    bucket ``b`` is ``(md5_u64("w:" + str(b)) % 2001) - 1000`` — so the whole
    scoring pipeline (tokenize → hash features → linear score → label) is
    attested bit-for-bit by a SQL oracle; a production deployment swaps the
    derived weights for a trained array loaded in ``__init__`` (the actor-pool
    pattern: model state built once per actor, batches scored in
    ``__call__``). Score arithmetic is pure integer (token bucket weights in
    [-1000, 1000] summed exactly), tokenization is the shared
    ``lower().split(' ')`` rule."""

    def __init__(self, n_buckets: int = 128, id_col: str = "doc_id",
                 text_col: str = "text"):
        from maritime_activity_reports_cdc_ray.hashing import md5_u64

        self.n_buckets = n_buckets
        self.id_col, self.text_col = id_col, text_col
        self.weights = np.asarray(
            [(md5_u64(f"w:{b}") % 2001) - 1000 for b in range(n_buckets)],
            dtype=np.int64)

    def __call__(self, batch):
        from maritime_activity_reports_cdc_ray.functions.kernels import (
            arrow_tokenize, dict_encode_md5)

        is_arrow = isinstance(batch, pa.Table)
        if is_arrow:
            ids, text = batch.column(self.id_col), batch.column(self.text_col)
            n = batch.num_rows
        else:
            ids = batch[self.id_col].to_numpy()
            text = pa.array(batch[self.text_col], pa.string(), from_pandas=True)
            n = len(batch)
        rows, flat = arrow_tokenize(text)
        score = np.zeros(n, dtype=np.int64)
        if len(rows):
            h, _, _ = dict_encode_md5(flat)
            w = self.weights[(h % np.uint64(self.n_buckets)).astype(np.int64)]
            # bincount-with-weights is float64 but exact here (|score| ≪ 2^53)
            score = np.bincount(rows, weights=w, minlength=n).astype(np.int64)
        label = np.where(score > 0, "pos", "neg")
        if is_arrow:
            return pa.table({self.id_col: ids,
                             "clf_score": pa.array(score),
                             "clf_label": pa.array(label)})
        return pd.DataFrame({self.id_col: ids, "clf_score": score,
                             "clf_label": label})


def make_term_exploder(text_col: str = "text", stopwords=()):
    """The ONE tokenization rule shared by the vocabulary head and the CMS
    sketch (and contracted by their SQL oracles): ``lower().split(' ')``,
    empty tokens and stopwords dropped — bit-reproducible in SQL
    (``string_split(lower(text), ' ')``). Returns a map_batches fn emitting
    a single ``term`` column."""
    sw = frozenset(stopwords)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("").str.lower().str.split(" ").explode()
        s = s[(s != "") & ~s.isin(sw)]
        return pd.DataFrame({"term": s.astype(str)})

    return explode


def top_terms(ds, text_col: str = "text", stopwords=(), limit: int = 20,
              num_partitions: int = 16, pre_exploded: bool = False):
    """Corpus vocabulary head: global term counts → top ``limit`` by
    (count DESC, term ASC). Tokenization = :func:`make_term_exploder`.

    Shape: per-batch explode + partial counts → hash partition on term → one
    vectorized reduce per partition (each term's TOTAL lands in one
    partition) → per-batch top-``limit`` (a correct combiner over disjoint
    full counts) → tiny driver-side final top-``limit``. The shuffle moves
    (term, partial_count) rows, never text.

    ``pre_exploded=True`` takes ``ds`` as an already-exploded ``term``
    stream (so one explode can feed several consumers)."""
    from maritime_activity_reports_cdc_ray.functions.dedup import hash_count

    terms = ds if pre_exploded else ds.map_batches(
        make_term_exploder(text_col, stopwords), batch_format="pandas")
    counts = hash_count(terms, ["term"], num_partitions)

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cnt", "term"], ascending=[False, True]).head(limit)

    tops = counts.map_batches(local_top, batch_format="pandas").to_pandas()
    return (tops.sort_values(["cnt", "term"], ascending=[False, True])
            .head(limit).reset_index(drop=True))


def make_doc_term_exploder(id_col: str = "doc_id", text_col: str = "text",
                           stopwords=()):
    """Like :func:`make_term_exploder` but keeps the document id — one
    tokenization pass can then feed occurrence counts (corpus TF), the CMS
    sketch AND document-frequency (DF) consumers. Same SQL-reproducible
    rule: ``lower().split(' ')``, empty tokens and stopwords dropped."""
    sw = frozenset(stopwords)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("").str.lower().str.split(" ").reset_index(drop=True)
        ex = s.explode()
        ex = ex[ex.notna() & (ex != "") & ~ex.isin(sw)]
        ids = df[id_col].to_numpy()[ex.index.to_numpy(dtype=np.int64)]
        return pd.DataFrame({id_col: ids, "term": ex.to_numpy(dtype=object)})

    return explode


def doc_freq(terms_ds, id_col: str = "doc_id", num_partitions: int = 16):
    """Document frequency per term over a (doc_id, term) stream: per-batch
    DISTINCT (a document lives wholly in one input row, so the batch-local
    distinct IS the global per-doc distinct) → combiner-first hash count.
    The shuffle moves (term, partial_df) rows, never documents. Feeds
    integer-quantized TF-IDF: idf_q = (N·10^6) // df — integer division
    chosen over ln() because it is exact across engines (numpy and SQL libm
    may differ in the last ulp; integer arithmetic cannot)."""
    from maritime_activity_reports_cdc_ray.functions.dedup import hash_count

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates([id_col, "term"])[["term"]]

    return hash_count(terms_ds.map_batches(distinct, batch_format="pandas"),
                      ["term"], num_partitions, count_col="doc_freq")


def postings_head(terms_ds, terms: list[str], k: int = 5, id_col: str = "doc_id"):
    """Inverted-index head for a bounded term set: the k smallest doc ids
    holding each term, as a comma-joined ascending string.

    Scale shape: the wanted-term set broadcasts in the task spec (bounded —
    a vocabulary head, not the vocabulary); each batch emits at most k
    candidate ids per term it contains (a document lives wholly in one input
    row, so batch-local distinct (term, doc) pairs are globally distinct and
    the k-smallest of per-batch k-smallest unions is exact); the driver
    reduces only len(terms)×k-sized candidates. Building full posting lists
    instead of heads is the same shape with the combiner cap removed and a
    hash-partition reduce in place of the driver fold."""
    wanted = set(terms)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["term"].isin(wanted)].drop_duplicates(["term", id_col])
        if not len(d):
            return pd.DataFrame({"term": pd.Series(dtype=object),
                                 id_col: pd.Series(dtype="int64")})
        return (d.sort_values(id_col).groupby("term", sort=False)
                .head(k)[["term", id_col]])

    cand = terms_ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(cand):
        return pd.DataFrame({"term": pd.Series(dtype=object),
                             "postings_head": pd.Series(dtype=object)})
    head = cand.sort_values(id_col).groupby("term").head(k)
    return (head.sort_values(["term", id_col])
            .groupby("term")[id_col]
            .agg(lambda s: ",".join(str(int(x)) for x in s))
            .reset_index(name="postings_head"))


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016, arXiv:1508.07909)
# ---------------------------------------------------------------------------
def bpe_train(ds, n_merges: int = 10, text_col: str = "text",
              vocab_limit: int = 65536, num_partitions: int = 16):
    """Learn a BPE merge table from the corpus.

    Scale shape: the only corpus-scale stage is ONE distributed
    word-frequency pass (combiner-first :func:`~..dedup.hash_count` — the
    shuffle moves (word, partial_count) rows, never documents). The merge
    loop then runs over the bounded frequency-ranked vocabulary head
    (``vocab_limit`` word types — standard practice: HF tokenizers /
    SentencePiece train over the word-count table, not the corpus; dropped
    tail mass only loses counts a 65k-type head wouldn't have merged
    anyway). Deterministic at any parallelism: best pair = max summed count,
    tie-break lexicographically smallest (left, right).

    Returns a DataFrame (rank, left, right, pair_count) — the merge table,
    ready to drive :class:`BpeEncoder`.
    """
    from maritime_activity_reports_cdc_ray.functions.dedup import hash_count

    def words(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("").str.lower().str.split(" ").explode()
        s = s[s.notna() & (s != "")]
        return pd.DataFrame({"word": s.to_numpy(dtype=object)})

    vocab = (hash_count(ds.map_batches(words, batch_format="pandas"),
                        ["word"], num_partitions)
             .to_pandas().sort_values(["cnt", "word"],
                                      ascending=[False, True],
                                      kind="mergesort")
             .head(vocab_limit))
    seqs = [list(w) + ["</w>"] for w in vocab["word"]]
    cnts = vocab["cnt"].to_numpy(dtype=np.int64)

    merges = []
    for rank in range(n_merges):
        pair_counts: dict = {}
        for seq, c in zip(seqs, cnts):
            for p in zip(seq, seq[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + int(c)
        if not pair_counts:
            break
        best_c = max(pair_counts.values())
        left, right = min(p for p, c in pair_counts.items() if c == best_c)
        merges.append((rank, left, right, best_c))
        tok = left + right
        for si, seq in enumerate(seqs):
            if len(seq) < 2:
                continue
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                    out.append(tok)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[si] = out
    return pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"]) \
        .astype({"rank": "int64", "pair_count": "int64"})


class BpeEncoder:
    """Actor-pool BPE token counter: apply a learned merge table (lowest
    rank first — GPT-2-style greedy) to each word; emit per-doc BPE token
    counts. The merge-rank dict builds once per actor; encoded words cache
    per actor (Zipf reuse makes the cache hit rate high)."""

    def __init__(self, merges: pd.DataFrame, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.ranks = {(l, r): int(k) for k, l, r in
                      zip(merges["rank"], merges["left"], merges["right"])}
        self.id_col, self.text_col = id_col, text_col
        self._cache: dict = {}

    def encode_word(self, w: str) -> int:
        n = self._cache.get(w)
        if n is not None:
            return n
        seq = list(w) + ["</w>"]
        while len(seq) > 1:
            ranked = [(self.ranks.get(p, 1 << 60), i)
                      for i, p in enumerate(zip(seq, seq[1:]))]
            r, i = min(ranked)
            if r >= 1 << 60:
                break
            seq[i:i + 2] = [seq[i] + seq[i + 1]]
        n = self._cache[w] = len(seq)
        return n

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros(len(df), dtype=np.int64)
        for j, t in enumerate(df[self.text_col].fillna("")):
            counts[j] = sum(self.encode_word(w)
                            for w in t.lower().split(" ") if w)
        return pd.DataFrame({self.id_col: df[self.id_col].to_numpy(),
                             "n_tokens_bpe": counts})


def _viterbi_segment(w: str, nll: dict, max_len: int,
                     char_floor_nll: int) -> list[str]:
    """Min-total-NLL segmentation of ``w`` into known pieces (unknown single
    chars cost ``char_floor_nll``). DP over end positions; ties resolve to
    the SMALLEST split point (longest last piece) because updates use strict
    ``<`` scanning j ascending — the one rule both the trainer, the encoder
    and the naive test reference share."""
    n = len(w)
    INF = 1 << 62
    best = [0] + [INF] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] >= INF:
                continue
            c = nll.get(w[j:i])
            if c is None:
                if i - j > 1:
                    continue
                c = char_floor_nll
            if best[j] + c < best[i]:
                best[i] = best[j] + c
                back[i] = j
    out, i = [], n
    while i > 0:
        j = back[i]
        out.append(w[j:i])
        i = j
    return out[::-1]


def unigram_train(ds, text_col: str = "text", vocab_size: int = 4096,
                  max_piece_len: int = 6, seed_factor: int = 4,
                  em_iters: int = 2, vocab_limit: int = 65536,
                  num_partitions: int = 16) -> pd.DataFrame:
    """Unigram-LM tokenizer training (SentencePiece's unigram model, Kudo
    2018, arXiv:1804.10959) — the subword family next to :func:`bpe_train`,
    same scale shape: ONE distributed word-frequency pass (combiner-first
    ``hash_count`` — the shuffle moves (word, count) rows, never documents),
    then seed-candidate counting + Viterbi-EM over the bounded
    frequency-ranked vocabulary head (``vocab_limit`` word types, the
    HF-tokenizers/SentencePiece practice).

    Deterministic at any parallelism, all-integer scoring: a piece's NLL is
    ``qlog2_fp(total) − qlog2_fp(cnt)`` (the LM filter's fixed-point log),
    Viterbi ties resolve to the longest last piece, seed/prune ranks
    tie-break on the piece string. EM: E = best segmentation of every head
    word under current counts; M = recount pieces from those segmentations;
    prune to the ``vocab_size`` best by (count desc, piece) with all single
    chars always retained (segmentation stays total).

    Returns (piece, cnt, nll_fp) — ready to drive :class:`UnigramEncoder`.
    """
    from maritime_activity_reports_cdc_ray.functions.dedup import hash_count

    def words(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("").str.lower().str.split(" ").explode()
        s = s[s.notna() & (s != "")]
        return pd.DataFrame({"word": s.to_numpy(dtype=object)})

    vocab = (hash_count(ds.map_batches(words, batch_format="pandas"),
                        ["word"], num_partitions)
             .to_pandas().sort_values(["cnt", "word"],
                                      ascending=[False, True],
                                      kind="mergesort")
             .head(vocab_limit))
    wlist = list(vocab["word"])
    wcnt = vocab["cnt"].to_numpy(dtype=np.int64)

    # seed candidates: every substring up to max_piece_len, count-weighted
    cand: dict = {}
    for w, c in zip(wlist, wcnt):
        c = int(c)
        for a in range(len(w)):
            for b in range(a + 1, min(a + max_piece_len, len(w)) + 1):
                p = w[a:b]
                cand[p] = cand.get(p, 0) + c
    chars = {p for p in cand if len(p) == 1}
    multi = sorted((p for p in cand if len(p) > 1),
                   key=lambda p: (-cand[p], p))[:seed_factor * vocab_size]
    counts = {p: cand[p] for p in chars}
    counts.update({p: cand[p] for p in multi})

    def em_round(counts: dict) -> dict:
        total = sum(counts.values())
        floor = int(qlog2_fp(np.int64(total))[()])  # cnt=1 ⇒ nll = qlog2(total)
        qt = floor
        nll = {p: qt - int(qlog2_fp(np.int64(c))[()])
               for p, c in counts.items()}
        new: dict = {}
        for w, c in zip(wlist, wcnt):
            for p in _viterbi_segment(w, nll, max_piece_len, floor):
                new[p] = new.get(p, 0) + int(c)
        return new

    for _ in range(em_iters):
        new = em_round(counts)
        keep_chars = {p: new.get(p, counts.get(p, 1)) for p in chars}
        keep_multi = sorted((p for p in new if len(p) > 1),
                            key=lambda p: (-new[p], p))[:vocab_size]
        counts = dict(keep_chars)
        counts.update({p: new[p] for p in keep_multi})

    out = pd.DataFrame({"piece": list(counts), "cnt": list(counts.values())})
    total = int(out["cnt"].sum())
    out["nll_fp"] = (int(qlog2_fp(np.int64(total))[()])
                     - qlog2_fp(out["cnt"].to_numpy())).astype("int64")
    return (out.sort_values(["cnt", "piece"], ascending=[False, True],
                            kind="mergesort")
            .reset_index(drop=True).astype({"cnt": "int64"}))


class UnigramEncoder:
    """Actor-pool unigram token counter: Viterbi-segment each word under the
    learned piece NLLs (same DP + tie rule as training); emit per-doc token
    counts. Piece table builds once per actor; segmented words cache per
    actor (Zipf reuse)."""

    def __init__(self, pieces: pd.DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", max_piece_len: int = 6):
        self.nll = dict(zip(pieces["piece"], pieces["nll_fp"].astype(int)))
        self.floor = int(max(self.nll.values())) if len(self.nll) else 1
        self.max_len = max_piece_len
        self.id_col, self.text_col = id_col, text_col
        self._cache: dict = {}

    def segment(self, w: str) -> list[str]:
        s = self._cache.get(w)
        if s is None:
            s = self._cache[w] = _viterbi_segment(
                w, self.nll, self.max_len, self.floor)
        return s

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros(len(df), dtype=np.int64)
        for j, t in enumerate(df[self.text_col].fillna("")):
            counts[j] = sum(len(self.segment(w))
                            for w in t.lower().split(" ") if w)
        return pd.DataFrame({self.id_col: df[self.id_col].to_numpy(),
                             "n_tokens_unigram": counts})


def wordpiece_train(ds, n_merges: int = 10, text_col: str = "text",
                    vocab_limit: int = 65536, num_partitions: int = 16):
    """Learn a WordPiece vocabulary (Schuster & Nakajima 2012; the BERT
    tokenizer, HF-tokenizers trainer semantics): like BPE, but the merged
    pair maximizes the LIKELIHOOD score ``count(pair) / (count(left) ·
    count(right))`` instead of the raw pair count — rare-but-cohesive pairs
    win over merely-frequent ones. Continuation pieces carry the ``##``
    prefix; merging drops the right side's ``##``.

    Scale shape identical to :func:`bpe_train`: ONE distributed
    word-frequency pass (combiner-first hash_count — the shuffle moves
    (word, partial_count) rows, never documents), then the merge loop runs
    over the bounded frequency-ranked vocabulary head. Deterministic at any
    parallelism: scores compare by exact integer cross-multiplication
    (a/b > c/d ⇔ a·d > c·b — no float boundary), ties break on the
    lexicographically smallest (left, right).

    Returns a DataFrame (rank, left, right, piece, pair_count) — merge
    table + the minted piece per rank, ready to drive
    :class:`WordPieceEncoder` (whose vocab = alphabet pieces + minted
    pieces).
    """
    from maritime_activity_reports_cdc_ray.functions.dedup import hash_count

    def words(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("").str.lower().str.split(" ").explode()
        s = s[s.notna() & (s != "")]
        return pd.DataFrame({"word": s.to_numpy(dtype=object)})

    vocab = (hash_count(ds.map_batches(words, batch_format="pandas"),
                        ["word"], num_partitions)
             .to_pandas().sort_values(["cnt", "word"],
                                      ascending=[False, True],
                                      kind="mergesort")
             .head(vocab_limit))
    seqs = [[w[0]] + ["##" + ch for ch in w[1:]] for w in vocab["word"]]
    cnts = vocab["cnt"].to_numpy(dtype=np.int64)

    # alphabet rows (rank -1): every initial piece belongs to the vocab even
    # if it never merges — without them the encoder would [UNK] any word
    # containing a rare character
    alpha: dict = {}
    for seq, c in zip(seqs, cnts):
        for t in seq:
            alpha[t] = alpha.get(t, 0) + int(c)
    merges = [(-1, "", "", t, c) for t, c in sorted(alpha.items())]
    for rank in range(n_merges):
        pair_counts: dict = {}
        tok_counts: dict = {}
        for seq, c in zip(seqs, cnts):
            for t in seq:
                tok_counts[t] = tok_counts.get(t, 0) + int(c)
            for p in zip(seq, seq[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + int(c)
        if not pair_counts:
            break
        # best score a/b by integer cross-multiplication; tie -> smallest pair
        best = None  # (a, b, pair)
        for p, a in pair_counts.items():
            b = tok_counts[p[0]] * tok_counts[p[1]]
            if best is None or a * best[1] > best[0] * b \
                    or (a * best[1] == best[0] * b and p < best[2]):
                best = (a, b, p)
        left, right = best[2]
        tok = left + right[2:]  # continuation '##' folds into the merge
        merges.append((rank, left, right, tok, pair_counts[(left, right)]))
        for si, seq in enumerate(seqs):
            if len(seq) < 2:
                continue
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                    out.append(tok)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[si] = out
    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "piece", "pair_count"]) \
        .astype({"rank": "int64", "pair_count": "int64"})


class WordPieceEncoder:
    """Actor-pool WordPiece token counter: greedy LONGEST-MATCH-FIRST
    segmentation per word against the learned vocab (BERT's
    WordpieceTokenizer semantics — a word with no matching prefix counts as
    one [UNK]); emits per-doc piece counts. Vocab set builds once per actor;
    segmented words cache per actor (Zipf reuse)."""

    def __init__(self, merges: pd.DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", max_word_chars: int = 100):
        self.vocab = set(merges["piece"])  # alphabet (rank -1) + minted
        self.max_word_chars = max_word_chars
        self.id_col, self.text_col = id_col, text_col
        self._cache: dict = {}

    def encode_word(self, w: str) -> int:
        n = self._cache.get(w)
        if n is not None:
            return n
        if len(w) > self.max_word_chars:
            self._cache[w] = 1  # [UNK]
            return 1
        n, i = 0, 0
        while i < len(w):
            j = len(w)
            piece = None
            while j > i:
                sub = ("##" if i else "") + w[i:j]
                if sub in self.vocab:
                    piece = sub
                    break
                j -= 1
            if piece is None:
                n = 1  # whole word -> [UNK], BERT semantics
                break
            n += 1
            i = j
        self._cache[w] = n
        return n

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros(len(df), dtype=np.int64)
        for j, t in enumerate(df[self.text_col].fillna("")):
            counts[j] = sum(self.encode_word(w)
                            for w in t.lower().split(" ") if w)
        return pd.DataFrame({self.id_col: df[self.id_col].to_numpy(),
                             "n_tokens_wordpiece": counts})


# ---------------------------------------------------------------------------
# Bigram language-model perplexity (CCNet-style LM quality filter;
# Wenzek et al. 2020, arXiv:1911.00359). The KenLM filter re-expressed
# Ray-Data-first: a distributed count pass trains the model (combiner-first
# hash_count — the shuffle moves (hash, count) rows, never text), the model
# broadcasts once per actor, and scoring is one vectorized pass. Reference
# analogue: the tiered quality scorer (utils/data_quality.py:20-99) — this is
# its statistical sibling for web-scale corpora.
#
# All model arithmetic is integer fixed-point so a DuckDB oracle can replay
# the exact NLL of every token: qlog2_fp is an integer log2 with linear
# interpolation between powers of two (scale 2^20), mirrored in SQL via
# bin()/>>; per-doc sums are exact int64; band thresholds compare via integer
# cross-multiplication (never a float boundary).
# ---------------------------------------------------------------------------
LOG2_SCALE = 1 << 20
#: fixed stupid-backoff penalty ≈ -log2(0.4) · 2^20 (engine-defined constant)
LM_BACKOFF_NLL_FP = 1386160


def lm_threshold_fp(bits: float) -> int:
    """Quantize a band threshold (in bits/token) to the model's fixed-point
    scale. Band tests are then exact integer comparisons ``nll_fp_sum <
    threshold_fp · n_tokens`` on both the engine and SQL sides."""
    return int(round(float(bits) * LOG2_SCALE))


def qlog2_fp(n) -> np.ndarray:
    """Fixed-point integer log2 (scale 2^20): ``bl·2^20 + (n·2^20 >> bl)
    - 2^20`` where ``bl = floor(log2 n)``. Exact integer math for n in
    [1, 2^43); ``np.frexp`` extracts bl exactly for integer-valued doubles.
    SQL mirror: ``(length(bin(n))-1)*1048576 + ((n*1048576) >>
    (length(bin(n))-1)) - 1048576``."""
    n = np.asarray(n, dtype=np.int64)
    _, e = np.frexp(n.astype(np.float64))
    bl = (e - 1).astype(np.int64)
    return (bl << np.int64(20)) + ((n << np.int64(20)) >> bl) - np.int64(LOG2_SCALE)


def _lm_tokens(batch, id_col: str, text_col: str):
    """(row_idx, pos_in_doc, md5_u64 hash) for every token. Tokenize =
    ``lower().split(' ')`` with empties dropped (the WordNgramExploder /
    repetition_metrics rule — SQL: ``list_filter(string_split(lower(
    COALESCE(text,'')), ' '), x -> x <> '')``). Arrow-native: tokens never
    box into Python strings (md5 runs once per dictionary-distinct token);
    accepts a pyarrow Table or a pandas frame."""
    from maritime_activity_reports_cdc_ray.functions.kernels import (
        arrow_tokenize, dict_encode_md5, group_positions)

    text = batch.column(text_col) if isinstance(batch, pa.Table) \
        else pa.array(batch[text_col], pa.string(), from_pandas=True)
    rows, flat = arrow_tokenize(text)
    hs, _, _ = dict_encode_md5(flat)
    _, _, pos = group_positions(rows)
    return rows, pos, hs


def _in_sorted(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    if not len(sorted_arr) or not len(vals):
        return np.zeros(len(vals), dtype=bool)
    i = np.minimum(np.searchsorted(sorted_arr, vals), len(sorted_arr) - 1)
    return sorted_arr[i] == vals


def train_bigram_lm(ds, vocab_size: int = 128, num_partitions: int = 16,
                    id_col: str = "doc_id", text_col: str = "text",
                    train_hex_gate: int = 16,
                    materialize_train: bool = False) -> dict:
    """Train a stupid-backoff bigram LM over a Dataset of documents.

    Two distributed passes: (1) unigram counts via combiner-first hash_count
    → exact global top-``vocab_size`` vocabulary (count desc, unsigned hash
    asc tie-break; per-batch partial top-V after the global reduce, so the
    driver sees ≤ V·num_batches rows); (2) adjacent-pair counts restricted to
    in-vocab tokens (candidate rows bounded by V² regardless of corpus size).
    The returned model is O(V²) — broadcastable at any corpus scale.

    ``train_hex_gate`` < 16 trains on a deterministic hash sample of the
    corpus — docs whose ``md5(str(id))`` first hex digit is below the gate
    (the house md5 sampling rule; CCNet trains its KenLM on a reference
    corpus, not the corpus being scored). 16 = train on everything.

    ``materialize_train`` pins the gated training projection in the object
    store so the two count passes share ONE source read instead of re-reading
    parquet each (docs_quality: train 2.4 s → ~1 s at sf0.1). Trade memory
    for read cost — appropriate when the gated sample fits the object store
    (it spills otherwise); leave False to stream both passes from storage."""
    import uuid

    from maritime_activity_reports_cdc_ray.functions.dedup import hash_count

    import pyarrow.compute as pc

    def gate(t: pa.Table) -> pa.Table:
        if train_hex_gate >= 16 or not t.num_rows:
            return t
        from maritime_activity_reports_cdc_ray.hashing import md5_u64_array

        # top 4 bits of md5_u64 == the md5 hexdigest's first hex digit
        ids = pc.cast(t.column(id_col), pa.string()).to_numpy(zero_copy_only=False)
        h = md5_u64_array(np.asarray(ids, dtype=object))
        return t.filter(pa.array((h >> np.uint64(60)) < np.uint64(train_hex_gate)))

    if materialize_train:
        src = ds.map_batches(gate, batch_format="pyarrow").materialize()
        gate = lambda t: t  # noqa: E731 — already gated upstream
    else:
        src = ds

    def tok_batch(t: pa.Table) -> pa.Table:
        _, _, hs = _lm_tokens(gate(t), id_col, text_col)
        return pa.table({"h": pa.array(hs)})

    counts = hash_count(src.map_batches(tok_batch, batch_format="pyarrow"),
                        ["h"], num_partitions)

    def part_top(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["cnt", "h"], ascending=[False, True],
                           kind="mergesort").head(vocab_size).copy()
        d["_bt"] = df["cnt"].sum()
        d["_bid"] = uuid.uuid4().hex
        return d

    parts = counts.map_batches(part_top, batch_format="pandas").to_pandas()
    if len(parts):
        total = int(parts.drop_duplicates("_bid")["_bt"].sum())
        vocab = (parts.sort_values(["cnt", "h"], ascending=[False, True],
                                   kind="mergesort").head(vocab_size)
                 [["h", "cnt"]].rename(columns={"cnt": "c"})
                 .reset_index(drop=True))
    else:
        total = 0
        vocab = pd.DataFrame({"h": np.zeros(0, np.uint64),
                              "c": np.zeros(0, np.int64)})

    varr = np.sort(vocab["h"].to_numpy(np.uint64))

    def big_batch(t: pa.Table) -> pa.Table:
        rows, pos, hs = _lm_tokens(gate(t), id_col, text_col)
        if not len(rows):
            return pa.table({"h1": pa.array(np.zeros(0, np.uint64)),
                             "h2": pa.array(np.zeros(0, np.uint64))})
        adj = pos[1:] > 0  # next token continues the same doc
        h1, h2 = hs[:-1][adj], hs[1:][adj]
        m = _in_sorted(varr, h1) & _in_sorted(varr, h2)
        return pa.table({"h1": pa.array(h1[m]), "h2": pa.array(h2[m])})

    big = hash_count(src.map_batches(big_batch, batch_format="pyarrow"),
                     ["h1", "h2"], num_partitions).to_pandas()
    if not len(big):
        big = pd.DataFrame({"h1": np.zeros(0, np.uint64),
                            "h2": np.zeros(0, np.uint64),
                            "cnt": np.zeros(0, np.int64)})
    ctx = (big.groupby("h1", as_index=False)["cnt"].sum()
           .rename(columns={"cnt": "ctx"}))
    return {"vocab": vocab, "total": total, "big": big, "ctx": ctx,
            "vocab_size": vocab_size, "backoff_fp": LM_BACKOFF_NLL_FP}


class LmPerplexityScorer:
    """Actor-pool scoring stage: pass the model (or a ``ray.put`` ObjectRef —
    resolved ONCE per actor here, never per batch) and score each batch in
    one vectorized pass: explode tokens → two C-level merges (unigram,
    bigram+context) → np.where NLL ladder → bincount per-doc sums.

    Per-token NLL (fixed-point, scale 2^20):
      pos 0          → qlog2(total) - qlog2(c_uni)   (OOV floor c_uni = 1)
      bigram found   → qlog2(ctx(w1)) - qlog2(c(w1,w2))
      else           → backoff_fp + unigram NLL      (stupid backoff)
    Bands compare the exact integer sum against ``t·n_tokens·2^20``."""

    def __init__(self, model, id_col: str = "doc_id", text_col: str = "text",
                 t_low_bits: float = 9.0, t_high_bits: float = 12.0):
        import ray

        if isinstance(model, ray.ObjectRef):
            model = ray.get(model)
        self.uni = model["vocab"]
        self.total = int(model["total"])
        self.big = model["big"]
        self.ctx = model["ctx"]
        self.backoff = int(model["backoff_fp"])
        self.id_col, self.text_col = id_col, text_col
        # thresholds quantize to fixed-point integers once — band compares
        # are integer cross-multiplications on both sides (SQL gets the
        # same constants via lm_threshold_fp)
        self.t_low_fp = lm_threshold_fp(t_low_bits)
        self.t_high_fp = lm_threshold_fp(t_high_bits)

    def __call__(self, batch):
        is_arrow = isinstance(batch, pa.Table)
        n = batch.num_rows if is_arrow else len(batch)
        ids = batch.column(self.id_col) if is_arrow \
            else batch[self.id_col].to_numpy()
        rows, pos, hs = _lm_tokens(batch, self.id_col, self.text_col)
        n_tok = (np.bincount(rows, minlength=n).astype(np.int64)
                 if len(rows) else np.zeros(n, np.int64))
        if len(rows) and self.total > 0:
            tok = pd.DataFrame({"h2": hs.astype(np.uint64)})
            tok = tok.merge(self.uni, left_on="h2", right_on="h",
                            how="left", sort=False)
            c2 = tok["c"].fillna(1).to_numpy(np.int64)
            nll_uni = qlog2_fp(self.total) - qlog2_fp(c2)
            h1 = np.r_[np.zeros(1, np.uint64), hs[:-1].astype(np.uint64)]
            pair = pd.DataFrame({"h1": h1, "h2": hs.astype(np.uint64)})
            pair = pair.merge(self.big, on=["h1", "h2"], how="left", sort=False)
            pair = pair.merge(self.ctx, on="h1", how="left", sort=False)
            cb = pair["cnt"].to_numpy(np.float64)
            cc = pair["ctx"].to_numpy(np.float64)
            hasb = ~np.isnan(cb)
            nll_big = (qlog2_fp(np.where(hasb, cc, 1).astype(np.int64))
                       - qlog2_fp(np.where(hasb, cb, 1).astype(np.int64)))
            nll = np.where(pos == 0, nll_uni,
                           np.where(hasb, nll_big, self.backoff + nll_uni))
            # exact: per-token nll < 2^26, per-doc sums ≪ 2^53
            sums = np.bincount(rows, weights=nll.astype(np.float64),
                               minlength=n).astype(np.int64)
        else:
            sums = np.zeros(n, np.int64)
        lo = np.int64(self.t_low_fp) * n_tok
        hi = np.int64(self.t_high_fp) * n_tok
        band = np.select([n_tok == 0, sums < lo, sums < hi],
                         ["empty", "low", "mid"], default="high")
        if is_arrow:
            return pa.table({self.id_col: ids,
                             "n_tokens": pa.array(n_tok),
                             "nll_fp": pa.array(sums),
                             "lm_band": pa.array(band)})
        return pd.DataFrame({self.id_col: ids,
                             "n_tokens": n_tok, "nll_fp": sums,
                             "lm_band": band})


def lm_perplexity(ds, vocab_size: int = 128, num_partitions: int = 16,
                  id_col: str = "doc_id", text_col: str = "text",
                  t_low_bits: float = 9.0, t_high_bits: float = 12.0,
                  concurrency: int = 4, train_hex_gate: int = 16,
                  materialize_train: bool = False):
    """Train the bigram LM on the corpus (or its hash-gated training sample —
    see train_bigram_lm) and score EVERY document with it (per-doc ``nll_fp``
    exact integer + quality band). The model is O(V²) and ships once per
    actor via ``ray.put``."""
    import ray

    model = train_bigram_lm(ds, vocab_size, num_partitions, id_col, text_col,
                            train_hex_gate=train_hex_gate,
                            materialize_train=materialize_train)
    ref = ray.put(model)
    return ds.map_batches(
        LmPerplexityScorer, fn_constructor_args=(ref,),
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col,
                               "t_low_bits": t_low_bits,
                               "t_high_bits": t_high_bits},
        batch_format="pyarrow", concurrency=concurrency)


# ---------------------------------------------------------------------------
# C4-style page cleaning (Raffel et al. 2020 §2.2 — the classic web-corpus
# boilerplate filter). Line rules: keep lines ending in terminal punctuation,
# with ≥ min_words words, not containing 'javascript'; page rules: drop pages
# containing 'lorem ipsum' or '{', or with fewer than min_sentences terminal
# marks across kept lines. Fully vectorized (one line explode per batch);
# every rule is replayed verbatim by the SQL oracle.
# ---------------------------------------------------------------------------
_C4_TERMINAL_RE = r'[.!?"]$'
_C4_SENT_RE = r'[.!?"]'


def c4_clean(df: pd.DataFrame, id_col: str = "doc_id",
             text_col: str = "text", min_words: int = 3,
             min_sentences: int = 5) -> pd.DataFrame:
    """Per-page C4 cleaning → (id, n_lines, n_kept_lines, n_sentences,
    page_kept, text_clean). ``text_clean`` is the kept lines re-joined with
    NEWLINE ('' when the page is dropped). Word count per line uses the
    house tokenizer rule (split(' '), empties dropped)."""
    n = len(df)
    s = df[text_col].fillna("")
    page_bad = (s.str.contains("lorem ipsum", regex=False)
                | s.str.contains("{", regex=False))
    lines = s.str.split("\n").reset_index(drop=True)
    ex = lines.explode()
    ex = ex[ex.notna()]
    rows = ex.index.to_numpy(dtype=np.int64)
    lv = ex.astype(str)
    n_lines = np.bincount(rows, minlength=n).astype(np.int64) if len(rows) \
        else np.zeros(n, np.int64)
    if len(rows):
        ends = lv.str.contains(_C4_TERMINAL_RE, regex=True).to_numpy()
        n_words = lv.str.count(r"[^ ]+").to_numpy()
        no_js = ~lv.str.contains("javascript", regex=False).to_numpy()
        keep = ends & (n_words >= min_words) & no_js
        n_kept = np.bincount(rows[keep], minlength=n).astype(np.int64)
        sent_per_line = lv.str.count(_C4_SENT_RE).to_numpy()
        n_sent = np.bincount(rows[keep], weights=sent_per_line[keep],
                             minlength=n).astype(np.int64)
        kept_join = (pd.Series(lv.to_numpy()[keep],
                               index=rows[keep]).groupby(level=0)
                     .agg("\n".join) if keep.any() else pd.Series(dtype=object))
        joined = np.full(n, "", dtype=object)
        if len(kept_join):
            joined[kept_join.index.to_numpy()] = kept_join.to_numpy()
    else:
        n_kept = np.zeros(n, np.int64)
        n_sent = np.zeros(n, np.int64)
        joined = np.full(n, "", dtype=object)
    page_kept = (~page_bad.to_numpy()) & (n_sent >= min_sentences)
    return pd.DataFrame({
        id_col: df[id_col].to_numpy(),
        "n_lines": n_lines, "n_kept_lines": n_kept, "n_sentences": n_sent,
        "page_kept": page_kept.astype(np.int64),
        "text_clean": np.where(page_kept, joined, ""),
    })


def token_entropy_fp(df: pd.DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> pd.DataFrame:
    """Per-doc unigram token entropy in fixed-point bits (scale 2^20):
    ``S = Σ_t c_t · (qlog2(n) − qlog2(c_t))`` over the doc's distinct-token
    counts — an exact integer at any summation order (entropy_bits =
    S / (n·2^20)). A compressibility quality signal: low entropy = repetitive
    boilerplate. House tokenizer rule; SQL mirror groups (doc, word)."""
    n = len(df)
    s = df[text_col].fillna("").str.lower().str.split(" ").reset_index(drop=True)
    ex = s.explode()
    ex = ex[ex.notna() & (ex != "")]
    rows = ex.index.to_numpy(dtype=np.int64)
    n_tok = (np.bincount(rows, minlength=n).astype(np.int64)
             if len(rows) else np.zeros(n, np.int64))
    ent = np.zeros(n, np.int64)
    if len(rows):
        # batch-local token identity only — factorize codes, no hashing
        codes, _ = pd.factorize(ex.to_numpy(dtype=object), use_na_sentinel=False)
        fr = pd.DataFrame({"r": rows, "h": codes})
        g = fr.groupby(["r", "h"], sort=False).size().reset_index(name="c")
        r = g["r"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        qn = qlog2_fp(n_tok[r])
        term = (c * (qn - qlog2_fp(c))).astype(np.float64)
        ent = np.bincount(r, weights=term, minlength=n).astype(np.int64)
    return pd.DataFrame({id_col: df[id_col].to_numpy(),
                         "n_tokens": n_tok, "entropy_fp": ent})


def make_chunker(size: int = 16, stride: int = 8, id_col: str = "doc_id",
                 text_col: str = "text"):
    """Document chunking into fixed token windows (RAG / training-window
    prep): chunk ``k`` covers tokens ``[k·stride, k·stride + size)``; chunks
    start while ``k·stride < n_tokens``. ``size`` must be a multiple of
    ``stride`` (each token then belongs to exactly ``size//stride`` chunks —
    vectorized as that many phase passes, no per-row loop). Emits
    (id, chunk_id, chunk_text, n_chunk_tokens) rows."""
    if size % stride:
        raise ValueError("size must be a multiple of stride")
    phases = size // stride

    def chunk(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("").str.split(" ").reset_index(drop=True)
        ex = s.explode()
        ex = ex[ex.notna() & (ex != "")]
        rows = ex.index.to_numpy(dtype=np.int64)
        toks = ex.to_numpy(dtype=object)
        if not len(rows):
            return pd.DataFrame({id_col: np.zeros(0, np.int64),
                                 "chunk_id": np.zeros(0, np.int64),
                                 "chunk_text": np.zeros(0, object),
                                 "n_chunk_tokens": np.zeros(0, np.int64)})
        from maritime_activity_reports_cdc_ray.functions.kernels import (
            group_positions,
        )

        _, _, pos = group_positions(rows)
        ids = df[id_col].to_numpy()
        parts = []
        for j in range(phases):
            k = pos // stride - j
            m = k >= 0
            parts.append(pd.DataFrame({"r": rows[m], "k": k[m],
                                       "p": pos[m], "w": toks[m]}))
        fr = pd.concat(parts, ignore_index=True)
        g = (fr.sort_values(["r", "k", "p"], kind="mergesort")
             .groupby(["r", "k"], sort=True))
        out = g["w"].agg(" ".join).reset_index()
        out["n"] = g.size().to_numpy()
        return pd.DataFrame({id_col: ids[out["r"].to_numpy()],
                             "chunk_id": out["k"].astype("int64"),
                             "chunk_text": out["w"],
                             "n_chunk_tokens": out["n"].astype("int64")})

    return chunk


def next_fit_pack(n_tokens: np.ndarray, capacity: int) -> np.ndarray:
    """Sequence packing (pretraining batch prep): next-fit bin assignment for
    documents in the GIVEN order — a doc goes into the current bin unless it
    would overflow ``capacity``, which opens a new bin (an oversized doc
    occupies a bin alone). Inherently sequential per group — the scale shape
    is partition-local packing (pack within (group, shard); bins never cross
    partitions), exactly how packing shards out in practice. Returns the
    0-based bin id per doc."""
    n_tokens = np.asarray(n_tokens, dtype=np.int64)
    bins = np.empty(len(n_tokens), dtype=np.int64)
    acc = 0
    b = -1
    for i, t in enumerate(n_tokens):
        if b < 0 or acc + t > capacity:
            b += 1
            acc = int(t)
        else:
            acc += int(t)
        bins[i] = b
    return bins
