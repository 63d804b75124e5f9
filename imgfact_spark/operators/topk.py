"""Per-group top-K selection (SURVEY.md §2.5 W1).

Reference semantics: "rank the images and select topK images for each
triplet" — sort each (s,p,o) group's images by score desc, keep K
(dataset_construction/entity_based_image_filtering/ptuningfilter.py:62-65).

Spark shape: a rank window.  Ties are broken on the extra ``tiebreak``
columns so results are deterministic under any partitioning (reference runs
single-threaded so its sort is stable; Spark's is not unless we say so).

Scale note: ``row_number`` over (keys) is a single shuffle on the group keys;
AQE skew-split does not apply to windows, so for pathological key skew pass
``prefilter_salt`` to cheaply pre-prune with a salted partial top-K before
the exact window (two-phase top-K: per (keys, salt) keep K, then exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    k: int,
    tiebreak: list[str] | None = None,
    rank_col: str = "rank",
    prefilter_salt: int = 0,
) -> DataFrame:
    order = list(order_by) + [F.col(c) for c in (tiebreak or [])]
    if prefilter_salt > 1:
        # phase 1: salted partial top-K — bounds any single task's sort to
        # (group_rows / salt) and cuts shuffle volume to ≤ salt*K per group.
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in (tiebreak or df.columns)]),
            F.lit(prefilter_salt),
        )
        w_pre = Window.partitionBy(*[F.col(c) for c in keys], salt).orderBy(*order)
        df = (
            df.withColumn("_pre_rn", F.row_number().over(w_pre))
            .filter(F.col("_pre_rn") <= k)
            .drop("_pre_rn")
        )
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
