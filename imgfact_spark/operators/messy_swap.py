"""Cluster-aware image swap — the "messy" eval-set generator (J9/O6) and the
per-key diff-image pairing (J8).

Reference J9 (eval_and_app/messy_prepare_data.py:54-73): for each row, swap
its image with that of another row whose relation belongs to a DIFFERENT
semantic cluster; the reference retries random partners up to 100 times and
gives up (keeps its own image) after that.  Re-expressed deterministically
and distributed as a derangement-style pairing:

    1. every row gets an md5-derived order key (seeded, cross-engine
       reproducible — DuckDB computes the identical hex string);
    2. rows are conceptually laid out in one global cyclic sequence by that
       key;
    3. each row takes the image of the nearest FOLLOWING row (cyclically)
       whose cluster differs, scanning at most ``max_scan`` steps — the
       reference's bounded retries; if every row in the scan window shares
       its cluster it keeps its own image (the give-up branch).

Scale: the global sequence is materialized WITHOUT a single-partition
window.  The order-key space is split into ``B`` contiguous hash ranges
(buckets); each bucket is one window partition.  Rows near a bucket's tail
need successors from the next bucket, so the first ``max_scan`` rows of
every bucket are unioned into the PREVIOUS bucket as ghost rows that sort
after all real rows (the head exchange); bucket ``0``'s head feeds bucket
``B-1``, which realizes the cyclic wrap-around.  ``B`` is sized so every
bucket holds at least ``max_scan`` rows (verified with a tiny per-bucket
count aggregate and halved until the invariant holds), making the ghost
construction EXACT: the per-bucket frame ``rowsBetween(1, max_scan)`` sees
precisely the global cyclic successors.  Shuffle cost: one hash-partitioned
window over the data + a ``B*max_scan``-row ghost union — no data
amplification, no global sort.

Reference J8 (app_s_prepare_data.py:42-50): per group, pop an image from a
row whose attribute differs; fallback to any when none differs.  Covered as
a query (entry_queries.j8_theta_diff_partner); the operator form here is
general.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: order keys live in [0, 16**15) — 15 hex chars of md5 fit a signed int64.
_KEY_SPACE = float(16**15)


def order_key(seed: int, *cols) -> F.Column:
    """Seeded md5 hex order key over ``cols`` (strings/ints), identical to
    DuckDB's ``md5(concat_ws(chr(31), '<seed>', cols...))``."""
    parts = [F.lit(str(seed))] + [F.col(c).cast("string") for c in cols]
    return F.md5(F.concat_ws("\x1f", *parts))


def messy_swap(
    df: DataFrame,
    img_col: str = "img_path",
    cluster_col: str = "cluster_id",
    key_cols: list[str] | None = None,
    seed: int = 998244353,
    max_scan: int = 32,
    target_bucket_rows: int = 4096,
) -> DataFrame:
    """Swap each row's ``img_col`` with one from a different ``cluster_col``.

    ``key_cols`` feed the seeded order hash (default: every column).  Use a
    unique key for a total order; equal hashes are tie-broken by
    ``(img_col, cluster_col)`` so the result is always deterministic.

    Exactly equivalent to the single global cyclic window (the DuckDB
    oracle in entry_queries.j9_messy_swap computes that form), but executed
    as ``B`` parallel bucket windows with a head-exchange for boundaries and
    wrap-around — no single-partition Exchange in the plan.
    """
    cols = df.columns
    key_cols = key_cols or cols
    d = df.withColumn("_h", order_key(seed, *key_cols))

    n = d.count()
    if n == 0:
        return df.withColumn(f"{img_col}_orig", F.col(img_col)).select(
            *cols, f"{img_col}_orig"
        )

    # Contiguous hash-range buckets; shrink B until min bucket >= max_scan
    # so the single-next-bucket head exchange is provably sufficient.
    hkey = F.conv(F.substring("_h", 1, 15), 16, 10).cast("bigint")
    B = max(1, min(n // max(target_bucket_rows, 2 * max_scan), 16**4))
    while B > 1:
        probe = d.select(
            F.floor(hkey.cast("double") / _KEY_SPACE * B).cast("int").alias("_b")
        )
        bucket_counts = (
            probe.groupBy("_b").count().agg(F.min("count"), F.count("*")).first()
        )
        min_cnt, n_buckets = bucket_counts[0], bucket_counts[1]
        if min_cnt >= max_scan and n_buckets == B:
            break
        B //= 2
    d = d.withColumn(
        "_b",
        F.floor(hkey.cast("double") / _KEY_SPACE * B).cast("int")
        if B > 1
        else F.lit(0),
    )

    order = [F.col("_ghost"), F.col("_h"), F.col(img_col), F.col(cluster_col)]
    real = d.withColumn("_ghost", F.lit(0))
    rn = F.row_number().over(
        Window.partitionBy("_b").orderBy("_h", img_col, cluster_col)
    )
    ghosts = (
        real.withColumn("_rn", rn)
        .filter(F.col("_rn") <= max_scan)
        .drop("_rn")
        .withColumn("_b", (F.col("_b") - 1 + F.lit(B)) % F.lit(B))
        .withColumn("_ghost", F.lit(1))
    )
    ext = real.unionByName(ghosts)

    w = (
        Window.partitionBy("_b")
        .orderBy(*order)
        .rowsBetween(1, max_scan)
    )
    cands = F.collect_list(F.struct(F.col(cluster_col).alias("cl"),
                                    F.col(img_col).alias("im"))).over(w)
    own_cl = F.col(cluster_col)
    return (
        ext.withColumn("_cands", cands)
        .filter(F.col("_ghost") == 0)
        .withColumn(
            "_swapped",
            # try_element_at: ANSI mode makes plain element_at throw on the
            # empty array (no cross-cluster partner in the scan window).
            F.coalesce(
                F.try_element_at(
                    F.filter("_cands", lambda x: x["cl"] != own_cl), F.lit(1)
                )["im"],
                F.col(img_col),
            ),
        )
        .withColumnRenamed(img_col, f"{img_col}_orig")
        .withColumnRenamed("_swapped", img_col)
        .select(*cols, f"{img_col}_orig")
    )
