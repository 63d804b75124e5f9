"""Positional zip join (SURVEY.md §2.3 J5) and distributed position minting.

The reference aligns the i-th line of ``{split}.source`` with the i-th line
of ``{split}.prefix`` by file order (eval_and_app/prepare_data.py:43-59,
``zip(triples, img_path)``).  Spark row order is undefined, so positional
semantics require explicit indexes.

Two modes:
  * both inputs already carry an index column → plain equi-join (scalable,
    preferred — our ingest materializes ``line_no`` at source);
  * indexes must be minted → distributed partition-offset minting (the
    zipWithIndex shape) over a caller-supplied total ordering (order_by
    REQUIRED — there is no defensible positional join without a defined
    order).

Minting is fully distributed: rows are range-partitioned on the order key,
ranked per range-partition (a window partitioned by the captured
``spark_partition_id``), and shifted by cumulative per-partition counts
computed from a tiny (≤ num_partitions rows) count aggregate — no
single-partition window, no driver collect; the range exchange is reused
between the rank and the count branches of the plan.  Cost: two balanced
exchanges of the data (range + pid clustering) — at any scale each
partition holds ~1/num_partitions of the rows, vs the round-1 global
window that pulled everything through one task.
Positions equal ``row_number() over (order by keys) - 1`` exactly when the
order is total; tied rows receive arbitrary-but-deterministic positions
within their tie group (same caveat as a global row_number).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_position(
    df: DataFrame,
    order_by: list[Column | str],
    pos_col: str = "pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Mint exact global 0-based positions by ``order_by`` without a
    single-partition window (SURVEY.md §7 hard part 3)."""
    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    ranged = df.repartitionByRange(n, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    rank = F.row_number().over(Window.partitionBy("_pid").orderBy(*order))

    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    # Cumulative offsets via a triangular self-join over <= n tiny rows —
    # avoids the unpartitioned window a cumsum would otherwise need.
    a = counts.select(F.col("_pid"))
    b = counts.select(F.col("_pid").alias("_qid"), "_cnt")
    offsets = (
        a.join(F.broadcast(b), F.col("_qid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_cnt"), F.lit(0)).alias("_off"))
    )

    return (
        ranged.withColumn("_rn", rank)
        .join(F.broadcast(offsets), "_pid")
        .withColumn(pos_col, (F.col("_off") + F.col("_rn") - 1).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


def zip_join(
    left: DataFrame,
    right: DataFrame,
    left_order: list[Column | str] | None = None,
    right_order: list[Column | str] | None = None,
    pos_col: str = "pos",
) -> DataFrame:
    """Join i-th row of ``left`` with i-th row of ``right``.

    If an order is given, positions are minted from it; else each side must
    already contain ``pos_col``.
    """
    l = with_position(left, left_order, pos_col) if left_order else left
    r = with_position(right, right_order, pos_col) if right_order else right
    return l.join(r, pos_col, "inner")
