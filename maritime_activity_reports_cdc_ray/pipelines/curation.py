"""End-to-end corpus curation: the operator library composed into ONE
pipeline a training-data team would actually run over raw documents.

Stages (each individually driver-attested via its own query face; this module
is the composition):

1. C4 boilerplate line filter   (functions/text.c4_clean)
2. Language ID                  (functions/text.LangId)
3. Tiered quality score          (functions/text.quality_score)
4. Bigram-LM perplexity filter  (functions/text.lm_perplexity)
5. Exact dedup on cleaned text  (functions/dedup.exact_dedup)
6. Sequence packing             (functions/text.next_fit_pack)

Scale shape: stages 1-3 are one fused per-batch pass (no materialization
between them); the LM filter adds its two bounded count passes + one scoring
pass; exact dedup is the combiner → hash-partition → per-partition reduce;
packing runs partition-local per language. Nothing collects the corpus to
the driver — the result is a streaming Dataset plus a small stats dict.
"""

from __future__ import annotations

import pandas as pd


class _LmFilter:
    """Actor-pool LM filter stage: the scorer (and its broadcast model)
    builds ONCE per actor in __init__ — never a ray.get per batch."""

    def __init__(self, ref, id_col, t_low_bits, t_high_bits):
        from maritime_activity_reports_cdc_ray.functions.text import (
            LmPerplexityScorer,
        )

        self.id_col = id_col
        self.scorer = LmPerplexityScorer(ref, id_col=id_col, text_col="text",
                                         t_low_bits=t_low_bits,
                                         t_high_bits=t_high_bits)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        scored = self.scorer(df)
        df = df.reset_index(drop=True)
        df["n_tokens"] = scored["n_tokens"].to_numpy()
        df["nll_fp"] = scored["nll_fp"].to_numpy()
        df["lm_band"] = scored["lm_band"].to_numpy()
        return df[(df["lm_band"] != "high") & (df["n_tokens"] > 0)]


def curate_documents(ds, id_col: str = "doc_id", text_col: str = "text",
                     apply_c4: bool = True,
                     min_quality_score: float = 0.6,
                     lm_vocab_size: int = 128,
                     lm_t_low_bits: float = 5.0,
                     lm_t_high_bits: float = 20.0,
                     pack_capacity: int = 256,
                     num_partitions: int = 16):
    """Run the full curation pipeline over a Dataset of raw documents.

    Returns ``(kept, stats)``: ``kept`` is a streaming Dataset of surviving
    documents — (id, text_clean, lang_pred, doc_quality_score, n_tokens,
    nll_fp, lm_band, pack_bin) — and ``stats`` is a small dict of per-stage
    survival counts (each count is one streaming aggregate; the corpus never
    lands on the driver)."""
    import ray

    from maritime_activity_reports_cdc_ray.functions.dedup import exact_dedup
    from maritime_activity_reports_cdc_ray.functions.text import (
        LangId,
        c4_clean,
        next_fit_pack,
        quality_score,
        train_bigram_lm,
    )

    n_in = ds.count()

    # one LangId per pipeline, captured by the closure (pickled with the fn,
    # tables built once) — NOT constructed per batch
    _langid = LangId()

    # -- stages 1-3 fused: clean -> keep pages -> lang + quality annotate
    def clean_annotate(df: pd.DataFrame) -> pd.DataFrame:
        if apply_c4:
            c = c4_clean(df, id_col=id_col, text_col=text_col)
            keep = c["page_kept"].to_numpy() == 1
            out = pd.DataFrame({id_col: c[id_col].to_numpy()[keep],
                                "text": c["text_clean"].to_numpy()[keep]})
        else:
            out = pd.DataFrame({id_col: df[id_col].to_numpy(),
                                "text": df[text_col].fillna("").to_numpy()})
        if not len(out):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "text": pd.Series(dtype=object),
                                 "lang_pred": pd.Series(dtype=object),
                                 "doc_quality_score": pd.Series(dtype="float64")})
        out = _langid(out)[[id_col, "text", "lang_pred"]]
        q = quality_score(out, "text")
        out["doc_quality_score"] = q["doc_quality_score"].to_numpy()
        # vectorized in-batch filter (never a per-row Dataset.filter)
        return out[out["doc_quality_score"] >= min_quality_score]

    quality_kept = ds.map_batches(clean_annotate, batch_format="pandas")
    # pin: downstream needs multiple passes (LM train x2, score, dedup)
    quality_kept = quality_kept.materialize()
    n_quality = quality_kept.count()

    # -- stage 4: bigram-LM perplexity filter (drop the 'high' band)
    model = train_bigram_lm(quality_kept, vocab_size=lm_vocab_size,
                            num_partitions=num_partitions,
                            id_col=id_col, text_col="text")
    ref = ray.put(model)
    lm_kept = quality_kept.map_batches(
        _LmFilter, fn_constructor_args=(ref, id_col, lm_t_low_bits,
                                        lm_t_high_bits),
        batch_format="pandas", concurrency=4)

    # -- stage 5: exact dedup on the cleaned text (first doc by id wins)
    deduped = exact_dedup(lm_kept, cols=["text"], order=[id_col],
                          id_col=id_col, num_partitions=num_partitions)
    deduped = deduped.materialize()
    n_dedup = deduped.count()

    # -- stage 6: sequence packing per language (partition-local fold)
    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        g["pack_bin"] = next_fit_pack(g["n_tokens"].to_numpy(), pack_capacity)
        return g

    kept = deduped.groupby("lang_pred").map_groups(pack, batch_format="pandas")

    stats = {"rows_in": int(n_in), "rows_quality_kept": int(n_quality),
             "rows_final": int(n_dedup)}
    return kept, stats
