"""Bigram language-model fluency scoring — the CCNet-style perplexity gate.

Web-scale pipelines score every document under a small n-gram LM and
filter/bucket by perplexity (CCNet, Gopher, LLaMA data prep).  The
reference has no corpus-LM stage (its quality gates are classifier
thresholds, ptuningfilter.py:33-47); this operator supplies the missing
text-tier gate in pure DataFrame algebra:

  * TRAIN: unigram context counts c(w) and bigram counts c(w₁w₂) over the
    (optionally separate) training corpus — two two-phase hash
    aggregations on token keys; vocabulary size V is a 1-row aggregate.
  * SCORE: every document's consecutive-token bigrams (built as
    ``zip_with`` over two shifted slices — the measured 6.5× HOF shape
    from functions/text.repetition_ratio) are position-exploded, joined to
    the count relations (token-keyed shuffle joins — count relations are
    vocabulary-sized and must NOT be assumed broadcastable at a 10⁸-token
    web vocabulary; AQE picks the strategy from runtime stats), and scored
    with add-α smoothing:

        lp(w₂|w₁) = ln( (c(w₁w₂) + α) / (c(w₁) + α·V) )

  * the per-document sum folds the position-sorted logprob array
    SEQUENTIALLY (collect_list → array_sort → aggregate), so the float
    total is order-independent bitwise — the repo's standard cross-engine
    float-sum contract (CLAUDE.md); the emitted average is
    floor-truncated at 1e-6.

Scale shape: shuffles move (token, count) and (id, pos, 2 tokens) rows —
never text bodies; the per-doc fold state is one document's bigrams.
Determinism: exact counts, IEEE double arithmetic in a pinned order, md5
nowhere needed — the whole operator is oracle-replayable as plain SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from imgfact_spark.functions.text import normalized_tokens
from imgfact_spark.operators.util import ensure_parallelism, snapshot


def _bigrams(t: Column) -> Column:
    """array<struct<w1,w2>> of consecutive token pairs (zip_with over two
    shifted slices — interpreted-HOF-minimal, no explode)."""
    tail = F.greatest(F.size(t) - 1, F.lit(0))
    return F.zip_with(
        F.slice(t, 1, tail),
        F.slice(t, 2, tail),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    alpha: float = 0.1,
    train_df: DataFrame | None = None,
) -> DataFrame:
    """→ (id, n_bigrams, avg_logprob): average add-α-smoothed bigram
    log-probability per document (≈ −ln(perplexity)); higher = more
    corpus-typical.  ``train_df`` defaults to ``df`` (self-scoring, the
    common boilerplate-detection configuration); documents with < 2 tokens
    score (0, 0.0).  ``avg_logprob`` is floor-truncated at 1e-6."""
    toks = snapshot(
        ensure_parallelism(df).select(
            F.col(id_col), normalized_tokens(text_col).alias("_t")
        )
    )
    # a separate train corpus also feeds two aggregation subtrees (uni,
    # big) — snapshot it too or the tokenizing scan runs twice
    toks_train = (
        toks
        if train_df is None
        else snapshot(
            ensure_parallelism(train_df).select(
                normalized_tokens(text_col).alias("_t")
            )
        )
    )

    uni = (
        toks_train.select(F.explode("_t").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").cast("double").alias("_cu"))
    )
    vocab = uni.agg(F.count("*").cast("double").alias("_v"))
    big = (
        toks_train.select(F.explode(_bigrams(F.col("_t"))).alias("b"))
        .groupBy(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .agg(F.count("*").cast("double").alias("_cb"))
    )

    doc_bigrams = toks.select(
        F.col(id_col), F.posexplode(_bigrams(F.col("_t"))).alias("_pos", "b")
    ).select(
        F.col(id_col),
        F.col("_pos"),
        F.col("b.w1").alias("w1"),
        F.col("b.w2").alias("w2"),
    )
    lp = (
        doc_bigrams.join(big, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.col("_pos"),
            F.log(
                (F.coalesce(F.col("_cb"), F.lit(0.0)) + F.lit(alpha))
                / (F.coalesce(F.col("_cu"), F.lit(0.0)) + F.lit(alpha) * F.col("_v"))
            ).alias("_lp"),
        )
    )
    scored = lp.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_lp"))),
                lambda s: s["_lp"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_sum"),
    )
    return (
        toks.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias("n_bigrams"),
            F.when(F.col("n_bigrams").isNull(), F.lit(0.0))
            .otherwise(
                F.floor(
                    F.col("_sum") / F.col("n_bigrams").cast("double") * F.lit(1e6)
                )
                / F.lit(1e6)
            )
            .alias("avg_logprob"),
        )
    )
