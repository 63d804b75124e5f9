"""Shared registry for the driver-checked query modules.

Every query module registers into THESE dicts via ``_register``; the
package __init__ imports the tier modules in a fixed order (core →
training → streaming → graph — streaming aliases oracles registered by
training) and then applies the curated driver-sample reorder.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


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

