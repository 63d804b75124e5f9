"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Repartition up to the session's default parallelism when the input
    has fewer partitions.

    Small/compact inputs (one parquet file, a freshly-collected dimension)
    arrive as 1-2 partitions; any CPU-heavy per-row operator downstream
    (shingling, hashing, vector math) would then run on one core.  At real
    scale inputs arrive pre-split and this is a no-op.
    """
    sc = df.sparkSession.sparkContext
    target = int(sc.defaultParallelism * min_factor)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def snapshot(df: DataFrame) -> DataFrame:
    """Materialize once and truncate lineage (eager localCheckpoint).

    Used before self-joins so both sides share one computed result instead
    of re-running the (expensive) upstream chain per side.
    """
    return df.localCheckpoint(eager=True)
