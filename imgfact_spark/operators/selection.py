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
    smaller phase-4 window partitions; it never changes the result."""
    scale = F.lit(float(10**bucket_decimals))
    docs = df.withColumn(
        "_bucket", F.floor(F.col(score_col) * scale).cast("bigint")
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
