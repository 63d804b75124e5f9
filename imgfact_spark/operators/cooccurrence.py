"""Item co-occurrence association (lift) over a (group, item) relation.

KG-analytics companion operator: given entity mentions per evidence
document (or parts per order, tags per image, ...), rank item PAIRS by
lift — how much more often they co-occur than independence predicts:

    lift(a, b) = P(a, b) / (P(a) · P(b)) = N · c_ab / (c_a · c_b)

This is the association statistic behind relation-discovery passes over
the corpus the reference's pipeline extracts triples from (engine
extension beyond ImgFact's shipped scripts; the per-triplet ratio gate it
generalizes is ``dataset_construction/filter_entity.py``-style counting).

Scale shape (100 TB):
  * the only quadratic step is the within-group self-join; its output is
    ``sum over groups of C(items_in_group, 2)`` — bounded by
    ``max_items_per_group`` (heavy groups are truncated to their
    first-N distinct items, deterministically by item id, and truncation
    is the standard practice for basket mining at web scale).
  * everything else is two-phase hash aggregation on item / pair keys.
  * lift is computed in IEEE double (multiply-then-divide, both operands
    exactly rounded) so the value is bit-identical across engines, then
    floor-truncated at 1e-6 for display; counts stay BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imgfact_spark.operators.util import ensure_parallelism, snapshot


def cooccurrence_lift(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_pair_count: int = 2,
    k: int = 50,
    max_items_per_group: int | None = None,
) -> DataFrame:
    """Top-k item pairs by co-occurrence lift.

    Returns (item_a, item_b, n_both, n_a, n_b, lift_micros) with
    item_a < item_b, ordered by lift desc then pair count desc then the
    pair itself (fully deterministic).  ``lift_micros`` is
    floor(lift * 1e6) as BIGINT — integral output, no float hashing.
    """
    d = (
        ensure_parallelism(df)
        .select(F.col(group_col).alias("_g"), F.col(item_col).alias("_i"))
        .distinct()
    )
    if max_items_per_group is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("_g").orderBy("_i")
        d = (
            d.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_items_per_group)
            .drop("_rn")
        )
    # four consumers below (group count, item counts, both self-join
    # sides): materialize the distinct/truncated relation once instead of
    # re-running the corpus-wide distinct per subtree
    d = snapshot(d)
    n_groups = d.select("_g").distinct().agg(F.count("*").alias("_n_groups"))
    item_counts = d.groupBy("_i").agg(F.count("*").alias("_c"))

    a = d.select(F.col("_g"), F.col("_i").alias("item_a"))
    b = d.select(F.col("_g"), F.col("_i").alias("item_b"))
    pairs = (
        a.join(b, "_g")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= min_pair_count)
    )
    out = (
        # item_counts sizing is data-dependent (a 10^8-entity vocab must
        # NOT broadcast) — leave the strategy to AQE's runtime stats
        pairs.join(
            item_counts.select(F.col("_i").alias("item_a"), F.col("_c").alias("n_a")),
            "item_a",
        )
        .join(
            item_counts.select(F.col("_i").alias("item_b"), F.col("_c").alias("n_b")),
            "item_b",
        )
        .crossJoin(F.broadcast(n_groups))
        .withColumn(
            "lift_micros",
            F.floor(
                F.col("n_both").cast("double")
                * F.col("_n_groups").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
                * F.lit(1000000.0)
            ),
        )
        .select("item_a", "item_b", "n_both", "n_a", "n_b", "lift_micros")
    )
    return out.orderBy(
        F.desc("lift_micros"), F.desc("n_both"), "item_a", "item_b"
    ).limit(k)
