"""Deterministic seeded sampling — training-data-pipeline operators.

The reference samples with driver-side seeded shuffles: a global
``random.shuffle`` of the materialized corpus before training
(CPgen.py:85-87), and per-key shuffle-then-take for the image pools
(p_entity_setup.py:117, s_o_prepare_data.py:40).  Neither survives data
that does not fit one process; these operators re-express the same
"seeded, reproducible k-of-n" contract distributively:

  * the shuffle key is a 60-bit integer from the md5 hex prefix of
    (seed, id) — deterministic, engine-portable (same primitive as the
    oracle-checked seeded operators elsewhere in this repo), and
    integer-exact, so rankings never hinge on float ulps;
  * global k-sample = TakeOrdered over that key (no full sort: Spark
    keeps a bounded k-heap per partition and merges — O(n) work,
    O(k) driver memory);
  * stratified k-per-group = the WindowGroupLimit-optimized per-group
    top-K operator (operators/topk.py) ordered by the key — one shuffle
    on the stratum, rank state bounded at k per group;
  * weighted sampling without replacement = the Efraimidis–Spirakis
    A-Res transform (key = u^(1/w), here as -ln(u)/w ascending, u the
    unit-interval value of the md5 integer) — a distributed analogue of
    weighted ``random.sample``, same TakeOrdered shape.

At 100 TB: the only data movement is the stratum shuffle (stratified) or
the per-partition k-heaps (global/weighted) — never a global sort, never
a driver-side materialization of the population.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from imgfact_spark.operators.topk import topk_per_group

_MD5_SPAN = float(1 << 60)


def seeded_key(seed: int | str, *cols: Column | str) -> Column:
    """60-bit non-negative bigint: ('0x'||substr(md5(seed|cols),1,15))::BIGINT
    in DuckDB terms — the repo's engine-portable seeded-randomness primitive."""
    parts = [F.lit(str(seed))] + [
        F.col(c).cast("string") if isinstance(c, str) else c.cast("string")
        for c in cols
    ]
    joined = F.concat_ws("\x1f", *parts)
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("bigint")


def sample_global(
    df: DataFrame, k: int, seed: int | str, id_col: str = "doc_id"
) -> DataFrame:
    """Seeded uniform k-of-n without replacement, reproducible across runs,
    partitionings and engines.  orderBy(key).limit(k) plans as TakeOrdered."""
    key = seeded_key(seed, id_col).alias("sample_key")
    return df.select("*", key).orderBy("sample_key", id_col).limit(k)


def sample_stratified(
    df: DataFrame,
    strata: list[str],
    k: int,
    seed: int | str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Seeded k-per-stratum (the reference's per-entity shuffle-then-take,
    p_entity_setup.py:117) — WindowGroupLimit keeps rank state ≤ k per
    group instead of sorting each stratum."""
    keyed = df.withColumn("sample_key", seeded_key(seed, id_col, *strata))
    return topk_per_group(
        keyed,
        keys=strata,
        order_by=[F.asc("sample_key")],
        k=k,
        tiebreak=[id_col],
        rank_col="sample_rank",
    )


def sample_mixture(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    budget: int,
    seed: int | str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic data-mixture sampling: draw ≈``budget`` rows whose
    source composition follows ``weights`` (the corpus-mixing step of
    web-scale training-data pipelines — re-weighting crawl/books/code/news
    slices to target proportions before packing).

    Per-source keep-rate = min(1, budget·wₛ / nₛ) with nₛ the source's
    population (a ≤|sources|-row aggregate, broadcast back — never a
    driver-side materialization of the population); a row survives iff its
    seeded 60-bit md5 integer < floor(rate · 2⁶⁰).  Expected per-source
    yield is budget·wₛ (exact when the rate caps at 1); membership is a
    pure function of (seed, id, corpus composition) — reproducible across
    runs, partitionings and engines, and STABLE under budget growth: the
    kept set at budget b is a subset of the kept set at any b' > b (the
    threshold only moves up), so growing a training mix never churns
    already-selected documents.  Sources absent from ``weights`` are
    dropped.  The rate arithmetic is plain IEEE-double mul/div/min and the
    comparison is integer — cross-engine exact (CLAUDE.md md5→bigint
    contract).

    Emits the input row plus the engine-stable unit-interval draw
    ``mix_u`` (key / 2⁶⁰).
    """
    spark = df.sparkSession
    wdf = F.broadcast(
        spark.createDataFrame(
            [(s, float(w)) for s, w in sorted(weights.items())],
            schema=f"{source_col} string, _w double",
        )
    )
    counts = df.groupBy(source_col).agg(F.count("*").cast("long").alias("_n"))
    rates = counts.join(wdf, source_col).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(float(budget)) * F.col("_w") / F.col("_n").cast("double"),
        ).alias("_rate"),
    )
    key = seeded_key(seed, id_col)
    return (
        df.join(F.broadcast(rates), source_col)
        .withColumn("_key", key)
        .filter(
            F.col("_key")
            < F.floor(F.col("_rate") * F.lit(_MD5_SPAN)).cast("bigint")
        )
        .withColumn("mix_u", F.col("_key").cast("double") / F.lit(_MD5_SPAN))
        .drop("_rate", "_key")
    )


def sample_weighted(
    df: DataFrame,
    k: int,
    seed: int | str,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Efraimidis–Spirakis A-Res weighted sampling without replacement:
    rank ascending by -ln(u)/w where u ∈ (0,1] derives from the seeded md5
    integer.  Inclusion probability proportional to weight; deterministic
    given (seed, ids, weights).  Rows with non-positive weight are excluded
    (they cannot be drawn).

    Selection ranks on the INTEGER floor(key·1e9) (capped at 9e9 so the
    bigint never overflows under ANSI; capped keys tie and fall to the id
    tie-break — they are the least-likely draws anyway), so the cutoff at
    the k-th row can never hinge on a libm ulp disagreement between engines
    (Spark java.lang.Math.log vs DuckDB libm).  The emitted ``sample_key``
    is that same integer divided by 1e9 — the selection cutoff and the
    emitted value are one engine-stable quantity."""
    u = (seeded_key(seed, id_col) + F.lit(1)).cast("double") / F.lit(_MD5_SPAN)
    raw = -F.log(u) / F.col(weight_col).cast("double")
    skey = F.floor(F.least(raw, F.lit(9.0e9)) * F.lit(1e9))  # bigint, exact
    return (
        df.filter(F.col(weight_col) > 0)
        .select("*", skey.alias("_skey"))
        .orderBy("_skey", id_col)
        .limit(k)
        .select("*", (F.col("_skey") / F.lit(1e9)).alias("sample_key"))
        .drop("_skey")
    )
