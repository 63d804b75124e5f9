"""Positional zip join (SURVEY.md §2.3 J5).

The reference aligns the i-th line of ``{split}.source`` with the i-th line
of ``{split}.prefix`` by file order (eval_and_app/prepare_data.py:43-59,
``zip(triples, img_path)``).  Spark row order is undefined, so positional
semantics require explicit indexes.

Two modes:
  * both inputs already carry an index column → plain equi-join (scalable,
    preferred — our ingest materializes ``line_no`` at source);
  * indexes must be minted → ``zipWithIndex``-free minting via a window over
    a caller-supplied total ordering (order_by REQUIRED — there is no
    defensible positional join without a defined order).

The window-minting path single-partitions for the row_number (exact global
positions), so it is for dimension/fixture-sized inputs; big tables must
ingest positions at the source (FIXTURES.md §8 ``line_no``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_position(df: DataFrame, order_by: list[Column | str], pos_col: str = "pos") -> DataFrame:
    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.orderBy(*order)
    return df.withColumn(pos_col, F.row_number().over(w) - 1)


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
