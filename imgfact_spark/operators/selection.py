"""Token-budget corpus selection — take the best documents until a token
budget is spent.

Training-data curation routinely fixes a token budget (e.g. "the best 1.5 T
tokens of this 30 T-token crawl") and takes documents in quality order until
the budget is exhausted (RefinedWeb, FineWeb, DCLM ablations).  Semantics:
order documents by (score DESC, id ASC) and keep the maximal prefix whose
running token sum stays ≤ budget.

The naive plan — one global window over the whole corpus — collapses to a
single partition and is exactly the anti-pattern this repo bans.  This
operator is the two-phase scale shape:

1. quantize the score to an integer bucket (``floor(score·10^d)``) and
   aggregate per-bucket token sums — one map-side-combining shuffle to a
   DIMENSION-sized relation (≤ ~10^d·range buckets);
2. a window over that small relation (single partition over buckets — fine,
   it is dimension-sized by construction) yields each bucket's
   strictly-higher-bucket cumulative ``cum_before``;
3. buckets with ``cum_before > budget`` are pruned wholesale (at a 1.5 T /
   30 T selection that drops ~95 % of rows BEFORE any per-row window);
4. surviving rows get an exact within-bucket running sum — a window
   PARTITIONED by bucket (distributed; per-partition size is bounded by
   the bucket granularity the caller picks) ordered by (score DESC, id) —
   and keep ``cum_before + run ≤ budget``.

Because the bucket is monotone in the score, phase-4's per-bucket order
concatenated in bucket order IS the global (score DESC, id) order, so the
result equals the naive global take-while exactly — the DuckDB oracle runs
the naive version and matches bitwise.

Determinism: integer token sums, tie-broken total order — no float
accumulation anywhere.  Reference: the pipeline's gate stack
(dataset_construction/ptuningfilter.py:33-47) thresholds per-row scores;
this is the budgeted-global-prefix generalization a 100 TB curation run
needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from imgfact_spark.functions.text import normalized_tokens
from imgfact_spark.operators.sampling import seeded_key
from imgfact_spark.operators.util import ensure_parallelism, snapshot


def select_by_budget(
    df: DataFrame,
    score_col: str,
    tokens_col: str,
    id_col: str,
    budget: int,
    bucket_decimals: int = 4,
) -> DataFrame:
    """→ input rows of the maximal (score DESC, id ASC) prefix with running
    token sum ≤ ``budget``, plus ``cum_tokens`` (the global running sum,
    bigint).  ``bucket_decimals`` sets the quantization of the bucket
    pre-aggregation (phase 1) — more decimals = smaller boundary buckets =
    smaller phase-4 window partitions; it never changes the result.

    NULL scores have no place in a (score DESC) total order — a NULL
    bucket would silently vanish in the bucket equi-join — so the plan
    carries a per-row fail-stop guard: any NULL ``score_col`` raises at
    execution instead of dropping the row."""
    scale = F.lit(float(10**bucket_decimals))
    score_ok = F.assert_true(
        F.col(score_col).isNotNull(),
        F.lit(
            f"select_by_budget: NULL {score_col!r} — score every row "
            "(or filter NULLs explicitly) before budget selection"
        ),
    )
    docs = df.withColumn(
        "_bucket",
        # assert_true returns NULL on pass; the when() both forces the
        # per-row evaluation and keeps the column expression pure
        F.when(
            score_ok.isNull(), F.floor(F.col(score_col) * scale)
        ).cast("bigint"),
    )
    bucket_stats = docs.groupBy("_bucket").agg(
        F.sum(F.col(tokens_col).cast("bigint")).alias("_tok_sum")
    )
    # dimension-sized by construction; the single-partition window is over
    # at most ~10^d·score-range rows
    w_buckets = (
        Window.orderBy(F.col("_bucket").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_cum = bucket_stats.select(
        "_bucket",
        F.coalesce(F.sum("_tok_sum").over(w_buckets), F.lit(0).cast("bigint")).alias(
            "_cum_before"
        ),
    ).filter(F.col("_cum_before") <= budget)  # == budget still admits
    # zero-token rows of the boundary bucket (exact take-while parity)

    w_in_bucket = (
        Window.partitionBy("_bucket")
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.join(F.broadcast(bucket_cum), "_bucket")
        .withColumn(
            "cum_tokens",
            F.col("_cum_before")
            + F.sum(F.col(tokens_col).cast("bigint")).over(w_in_bucket),
        )
        .filter(F.col("cum_tokens") <= budget)
        .drop("_bucket", "_cum_before")
    )


def _bucketed_bigrams(df: DataFrame, text_col: str, id_col: str, buckets: int):
    """→ (id, bucket, nb): per-document hashed-bigram bucket counts.
    Bucket = 60-bit md5 of (w₁, w₂) mod ``buckets`` — the repo's
    engine-portable hash (sampling.seeded_key), so DuckDB replays it."""
    toks = normalized_tokens(text_col)
    tail = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, tail),
        F.slice(toks, 2, tail),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    return (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("_id"), F.explode(bigrams).alias("bg"))
        .select(
            "_id",
            F.pmod(
                seeded_key("dsir", F.col("bg.w1"), F.col("bg.w2")),
                F.lit(buckets),
            ).alias("_bucket"),
        )
        .groupBy("_id", "_bucket")
        .agg(F.count(F.lit(1)).alias("_nb"))
    )


def dsir_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target: DataFrame,
    buckets: int = 8192,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw document
    by how target-like its hashed-bigram feature distribution is,

        weight(doc) = Σ_b n_b(doc) · [ ln p̂_t(b) − ln p̂_r(b) ],
        p̂(b) = (count(b) + α) / (total + α·B)            (add-α smoothing)

    where p̂_t comes from the (small) target corpus and p̂_r from the raw
    corpus itself.  Downstream, selection samples ∝ exp(weight) — emitting
    the log-weight keeps the operator overflow-free and lets the caller
    pick temperature.

    → (id, n_features bigint, weight double); documents with < 2 tokens get
    (0, 0.0).  ``weight`` is floor-truncated at 1e-6 (display safety; the
    fold itself is order-pinned).

    Scale shape: two corpus scans (raw, target) reduced to (id, bucket)
    and (bucket) count relations — shuffles carry hashed ids and counts,
    never text.  The per-bucket log-ratio relation is exactly B rows
    (broadcast at the default 8 Ki; a 10⁸-bucket configuration flips to an
    AQE shuffle join on the bucket key with no code change).  The per-doc
    sum folds the bucket-sorted contribution array sequentially — the
    repo's cross-engine bitwise float-sum contract.

    Reference parity: the reference ranks candidates with model scorers
    (ptuningfilter.py:33-47); DSIR is the corpus-statistical scorer a
    100 TB pre-filter runs before any model sees a row.
    """
    raw = snapshot(_bucketed_bigrams(df, text_col, id_col, buckets))
    tgt = _bucketed_bigrams(target, text_col, id_col, buckets)

    # The per-bucket count relations are ≤ B rows but each had TWO
    # consumers (the lr join and its own total, which plans as a separate
    # broadcast-subquery job) — un-materialized, the whole upstream corpus
    # pass re-ran per consumer (the target tokenize+hash pass twice, the
    # raw 2.6M-row aggregate twice at bench scale; measured ~1.5 s of the
    # section).  Materialize the B-row relations once; the totals then
    # aggregate the tiny snapshots.  Values identical: integer count sums.
    raw_b = snapshot(raw.groupBy("_bucket").agg(F.sum("_nb").alias("_cr")))
    tgt_b = snapshot(tgt.groupBy("_bucket").agg(F.sum("_nb").alias("_ct")))
    raw_tot = raw_b.agg(F.sum("_cr").alias("_tr"))
    tgt_tot = tgt_b.agg(F.sum("_ct").alias("_tt"))

    a = F.lit(float(alpha))
    ab = F.lit(float(alpha)) * F.lit(buckets)
    lr = (
        raw_b.join(tgt_b, "_bucket", "left")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "_bucket",
            (
                F.log((F.coalesce(F.col("_ct"), F.lit(0)) + a) / (F.col("_tt") + ab))
                - F.log((F.col("_cr") + a) / (F.col("_tr") + ab))
            ).alias("_lr"),
        )
    )

    # the log-ratio relation is exactly B rows — broadcast it onto the
    # (corpus-sized) raw side below the dimension-table bound so the fold
    # join never shuffles the doc-bucket relation; a 10⁸-bucket config
    # still flips to an AQE shuffle join with no code change
    lr_side = F.broadcast(lr) if buckets <= 2_000_000 else lr
    folded = (
        raw.join(lr_side, "_bucket")
        .select("_id", "_bucket", (F.col("_nb") * F.col("_lr")).alias("_c"), "_nb")
        .groupBy("_id")
        .agg(
            F.sum("_nb").alias("n_features"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("_bucket", "_c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_c"],
            ).alias("_w"),
        )
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(folded, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_features"), F.lit(0).cast("bigint")).alias(
                "n_features"
            ),
            F.coalesce(
                F.floor(F.col("_w") * 1e6) / 1e6, F.lit(0.0)
            ).alias("weight"),
        )
    )

