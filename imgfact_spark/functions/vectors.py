"""Vector math over ``array<float>`` columns — pure Column expressions.

Used by similarity search (brute-force cosine top-k) and embedding-based
near-dup detection.  ``F.zip_with`` + ``F.aggregate`` keep the arithmetic
JVM-side; for very wide vectors a pandas UDF over numpy is the alternative
(see operators/similarity.py which offers both paths).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either norm is zero."""
    num = dot_product(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def quantize_vec(a: Column | str, levels: int = 127) -> Column:
    """Scalar int8-style quantization: q_i = floor(x_i * levels / max|x|)
    as ``array<int>`` in [-levels-1, levels] plus exact reconstruction via
    :func:`dequantize_vec`.  At 100 TB this is the 4× storage/shuffle
    reduction for embedding columns (float32 → int8-ranged ints; a
    production sink packs them into binary).

    floor (not round) keeps the mapping bitwise-reproducible across engines
    (DuckDB: ``list_transform(v, x -> CAST(FLOOR(x * 127 / maxabs) AS INT))``
    with the same double ops).  Zero vectors quantize to zeros.
    """
    v = _c(a)
    maxabs = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    return F.when(
        maxabs > 0,
        F.transform(v, lambda x: F.floor(x * levels / maxabs).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))


def vec_max_abs(a: Column | str) -> Column:
    return F.aggregate(_c(a), F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))


def dequantize_vec(q: Column | str, maxabs: Column | str, levels: int = 127) -> Column:
    """Inverse of :func:`quantize_vec`: x̂_i = q_i * max|x| / levels."""
    return F.transform(_c(q), lambda x: x.cast("double") * _c(maxabs) / levels)


def mean_pool(df, keys: list[str], vec_col: str, dim: int):
    """Element-wise mean of ``array<float>`` vectors per key group —
    A6 per-key mean pooling (naive_prepare_data.py:133-139) as a grouped-map
    ``applyInPandas`` (one numpy reduction per group).

    The posexplode+avg formulation (entry_queries.a6_vector_mean_pool) is
    the shuffle-lean alternative for very wide vectors; this one keeps
    vectors intact — better when groups are few and wide.
    (GROUPED_AGG pandas UDAFs can't return arrays, hence grouped-map.)
    """
    import numpy as np
    import pandas as pd

    schema = ", ".join(
        f"{k} {dict(df.dtypes)[k]}" for k in keys
    ) + ", mean_vec array<double>"

    def pool(pdf: pd.DataFrame) -> pd.DataFrame:
        vecs = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["mean_vec"] = [vecs.mean(axis=0).tolist()]
        return pd.DataFrame(out)

    return df.groupBy(*keys).applyInPandas(pool, schema=schema)


def avg_l2_norm_udaf(vec_col: Column | str) -> Column:
    """GROUPED_AGG pandas UDAF surface (SURVEY.md §2.11): mean L2 norm of a
    group's vectors — one Arrow batch per group, scalar out."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    def _agg(v):
        if len(v) == 0:
            return 0.0
        mat = np.vstack(v.to_numpy()).astype("float64")
        return float(np.linalg.norm(mat, axis=1).mean())

    # set REAL type objects: `from __future__ import annotations` stringifies
    # inline hints and PySpark's GROUPED_AGG inference can't resolve them
    _agg.__annotations__ = {"v": pd.Series, "return": float}
    agg_udf = F.pandas_udf(_agg, "double")
    return agg_udf(_c(vec_col) if not isinstance(vec_col, str) else F.col(vec_col))
