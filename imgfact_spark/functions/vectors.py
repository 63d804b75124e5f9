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
