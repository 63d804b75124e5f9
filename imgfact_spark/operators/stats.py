"""Corpus profiling statistics — per-group distribution summaries.

A training-data pipeline gates and monitors on distribution shape, not
just means: document-length percentiles per language decide truncation
budgets, outlier cutoffs and tokenizer batch sizing (the reference's
equivalents are ad-hoc driver-side ``Counter``/sort passes, e.g. the
class-count scans in multimodal_naive.py:209-280).

Two paths, one contract:

  * ``exact`` — Spark's native ``percentile`` aggregate: exact type-7
    (linear-interpolation) quantiles, the same definition DuckDB's
    ``quantile_cont`` implements, so results are oracle-comparable
    bit-for-bit after the house 1e-6 floor truncation.  State per group
    is a (value → count) map — right whenever the value domain is
    bounded (lengths, token counts, scores quantized to fixed decimals),
    which covers the profiling columns; the map merges map-side, so the
    shuffle carries one map per group per partition, not rows.
  * ``approx`` — ``percentile_approx`` (GK sketch, bounded state for
    UNBOUNDED domains at a set accuracy) — the 100 TB default when the
    column is continuous; not oracle-exact by construction, pinned by an
    error-bound test instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def length_quantiles(
    df: DataFrame,
    value_col: str,
    by: list[str],
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    method: str = "exact",
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group quantiles of ``value_col`` plus count and mean.

    Returns one row per group: (*by, n, mean, q<NN> per requested
    quantile), quantile columns floor-truncated at 1e-6 (house rule: the
    emitted float is the compared float).
    """
    v = F.col(value_col).cast("double")
    if method == "exact":
        pct = F.percentile(v, F.array(*[F.lit(q) for q in qs]))
    else:
        pct = F.percentile_approx(v, F.array(*[F.lit(q) for q in qs]), accuracy)
    aggs = [
        F.count("*").alias("n"),
        (F.floor(F.avg(v) * 1e6) / 1e6).alias("mean"),
        pct.alias("_qs"),
    ]
    out = df.groupBy(*by).agg(*aggs)
    # full decimal digits, padded to two (q50, q99, q999, q51…) — a
    # truncated-to-two scheme made (0.99, 0.999) silently overwrite each
    # other; distinct quantiles must yield distinct column names
    names = [f"q{str(q)[2:].ljust(2, '0')}" for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(f"quantiles {qs} produce colliding column names {names}")
    for i, name in enumerate(names):
        out = out.withColumn(
            name, F.floor(F.try_element_at("_qs", F.lit(i + 1)) * 1e6) / 1e6
        )
    return out.drop("_qs")


def rolling_anomaly(
    events: DataFrame,
    ts_col: str,
    keys: list[str],
    bucket: str = "hour",
    trailing: int = 24,
    min_history: int = 12,
) -> DataFrame:
    """Trailing-window z-score anomaly signal over an event stream: bucket
    the timestamps, count per (keys, bucket), and score each bucket's
    count against the mean/stddev of its own previous ``trailing`` buckets
    — the standard ops-monitoring / data-drift detector a corpus ingestion
    pipeline runs over crawl volume (a spike = a crawler loop or a dump
    re-ingest; a crater = a dead source).

    Returns (keys…, bucket_us, n, z) with z = (n − μ_prev)/σ_prev floored
    at 1e-4, NULL while history < ``min_history`` buckets or σ ≈ 0.

    Exactness: the window aggregates are integer sums (counts and squared
    counts), so μ and σ² derive from EXACT integers with three fixed
    double ops — ``σ² = (c·Σn² − (Σn)²) / (c·(c−1))`` — making z
    bitwise-reproducible across engines (no float accumulation order
    anywhere).  The catastrophic-cancellation risk of the textbook
    ``Σn²/c − μ²`` float form is gone for the same reason: the numerator
    is computed in integers.

    Scale shape: ONE shuffle on (keys, bucket) for the count (map-side
    partial), then a window shuffle on keys — state per key is the
    bucket series (≤ 8,760 rows/key/year), never raw events.  The frame
    is ROWS over observed buckets (gap-skipping, like a dense rollup
    series); feed :func:`~imgfact_spark.operators.rollup.time_rollup`
    output to score a pre-densified grid instead.
    """

    counts = bucket_counts(events, ts_col, keys, bucket)
    return zscore_over_counts(counts, keys, trailing, min_history)


def bucket_counts(
    events: DataFrame,
    ts_col: str,
    keys: list[str],
    bucket: str = "hour",
    count_col: str = "n",
) -> DataFrame:
    """The counting leg of :func:`rolling_anomaly`: (keys…, bucket_us,
    count) with the bucket as an epoch-microsecond BIGINT — ONE shared
    definition for the batch detector and the streaming monitor
    (streaming.incremental_event_counts), so their bucketing can never
    drift.

    NULL timestamps never bucket: a NULL bucket row would sort
    NULLS-FIRST into Spark's window but NULLS-LAST in a SQL oracle,
    contaminating different trailing windows per engine (same rule as
    temporal.asof_join's NULL-ts exclusion)."""
    b = (
        F.unix_micros(F.date_trunc(bucket, F.col(ts_col)).cast("timestamp"))
        .cast("bigint")
        .alias("bucket_us")
    )
    return (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(*keys, b)
        .agg(F.count("*").alias(count_col))
    )


def zscore_over_counts(
    counts: DataFrame,
    keys: list[str],
    trailing: int = 24,
    min_history: int = 12,
) -> DataFrame:
    """The scoring leg of :func:`rolling_anomaly` over a pre-aggregated
    (keys…, bucket_us, n) relation — shared with the streaming monitor
    (streaming.incremental_event_counts), whose per-batch partial counts
    re-sum to exactly this relation (integer counts are associative)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket_us")
        .rowsBetween(-trailing, -1)
    )
    s = F.sum("n").over(w)
    s2 = F.sum(F.col("n") * F.col("n")).over(w)
    c = F.count("n").over(w)
    varnum = c * s2 - s * s  # exact bigint: no float cancellation
    mean = s.cast("double") / c
    z = (F.col("n").cast("double") - mean) / F.sqrt(
        varnum.cast("double") / (c * (c - 1)).cast("double")
    )
    return counts.select(
        *keys,
        "bucket_us",
        "n",
        F.when(
            (c >= min_history) & (varnum > 0), F.floor(z * 1e4) / 1e4
        ).alias("z"),
    )


def domain_profile(
    df: DataFrame,
    text_col: str,
    domain_col: str,
    quality_col: str | None = None,
) -> DataFrame:
    """Per-domain curation profile — the RefinedWeb/FineWeb-style
    domain-level table a web pipeline gates on before per-document work:

      (domain, n_docs, n_unique_docs, tok_sum, sent_sum[, qsum_e4])

    * ``n_unique_docs`` counts distinct content fingerprints (the
      engine-portable md5 fingerprint — ``n_docs − n_unique_docs`` is the
      domain's exact-dup volume, the strongest single spam signal);
    * ``tok_sum`` / ``sent_sum`` are exact bigint sums of whitespace
      tokens and sentence segments;
    * ``qsum_e4`` (when ``quality_col`` is given) sums the quality score
      as exact 1e-4 integers — order-free, so the mean a consumer derives
      is bit-stable (a float mean would be partition-order dependent).

    One map-side-combining aggregation on the domain key; the distinct
    count is two-phase (partial distinct absorbs per-partition repeats —
    exact-dup pages cluster within crawl partitions).  Head domains ride
    AQE skew split.  Everything is integer-exact → fully oracle-replayable.
    """
    from imgfact_spark.functions.text import (
        portable_fingerprint,
        split_sentences,
        token_count,
    )

    cols = [
        F.col(domain_col).alias("domain"),
        portable_fingerprint(text_col).alias("_fp"),
        token_count(text_col).cast("bigint").alias("_tok"),
        F.size(split_sentences(text_col)).cast("bigint").alias("_sent"),
    ]
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("_fp").alias("n_unique_docs"),
        F.sum("_tok").alias("tok_sum"),
        F.sum("_sent").alias("sent_sum"),
    ]
    if quality_col is not None:
        cols.append(
            F.floor(F.col(quality_col) * 10000).cast("bigint").alias("_q")
        )
        aggs.append(F.sum("_q").alias("qsum_e4"))
    return df.select(*cols).groupBy("domain").agg(*aggs)
