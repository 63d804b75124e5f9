"""Salted two-phase aggregation for skewed keys (SURVEY.md §4, BASELINE.json).

Head entities are power-law skewed (one entity can appear in millions of
candidate triples at 10^12-doc scale).  A plain ``groupBy(key).agg`` puts a
whole hot key in one reducer task; salting splits it across ``n_salts``
partial groups, then merges — Catalyst's partial aggregation already does
map-side combine, but for *algebraic* aggregates over very hot keys the salt
bounds the final-stage partition size too.

Only algebraic merges are offered (count/sum/min/max); holistic aggregates
should use AQE skew handling instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    count_col: str = "count",
    distinct_on: str | None = None,
) -> DataFrame:
    """``groupBy(keys).count()`` (or countDistinct(distinct_on)) with an
    explicit two-phase salted plan.

    Salt is derived from a hash of the non-key content (or a random-ish but
    deterministic row hash) so the same input always produces the same
    partials — no ``F.rand`` (resume/determinism requirement).
    """
    if distinct_on is not None:
        salt = F.pmod(F.xxhash64(F.col(distinct_on)), F.lit(n_salts))
        partial = (
            df.groupBy(*keys, salt.alias("_salt"))
            .agg(F.countDistinct(distinct_on).alias("_partial"))
        )
        # distinct within a salt bucket is globally distinct because the salt
        # is a pure function of the distinct column — buckets are disjoint.
        return partial.groupBy(*keys).agg(F.sum("_partial").cast("long").alias(count_col))
    # plain count is salt-value-agnostic (sums of partials are associative),
    # so derive the salt from the task partition id, NOT row content —
    # hashing data columns here would defeat column pruning (the scan would
    # read every column just to compute the salt).  spark_partition_id is
    # stable for a fixed input layout (unlike monotonically_increasing_id,
    # whose per-row values also encode row order within the partition) and
    # never feeds a non-algebraic reuse: buckets only carry partial counts.
    salt = F.pmod(F.spark_partition_id(), F.lit(n_salts))
    partial = df.groupBy(*keys, salt.alias("_salt")).agg(F.count("*").alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").cast("long").alias(count_col))
