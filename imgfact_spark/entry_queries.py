"""Registry of driver-checked queries: Spark callable + DuckDB oracle SQL.

Each entry exercises one operator family from SURVEY.md §2 against the
driver's parquet tables (region nation customer supplier part orders
lineitem events documents embeddings).  Column names are aliased identically
on both sides — the driver hash-compares values after sorting columns by
name.

Conventions:
  * every callable: (spark, sf_dir) → DataFrame
  * deterministic output (no F.rand without ORDER-stable oracle equivalent)
  * floats rounded at the sink on BOTH sides to dodge fp drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
