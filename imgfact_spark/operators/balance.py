"""Class-rebalancing oversample (SURVEY.md §2.4 A8).

Reference: replicate each training row ``int(max_class_count / class_count)``
times so every class reaches roughly the majority size
(eval_and_app/p_spo_setup.py:84-89, p_entity_setup.py:126-133,
multimodal_naive.py:134-149).

Spark shape: class counts (one cheap agg, broadcastable), join factor back,
``explode(sequence(1, factor))`` — no driver loop, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def oversample_balance(df: DataFrame, class_col: str) -> DataFrame:
    counts = df.groupBy(class_col).agg(F.count("*").alias("_cnt"))
    max_cnt = counts.agg(F.max("_cnt").alias("_max"))
    factors = counts.crossJoin(F.broadcast(max_cnt)).select(
        class_col,
        F.floor(F.col("_max") / F.col("_cnt")).cast("int").alias("_factor"),
    )
    return (
        df.join(F.broadcast(factors), class_col)
        .withColumn("_rep", F.explode(F.sequence(F.lit(1), F.col("_factor"))))
        .drop("_factor", "_rep")
    )
