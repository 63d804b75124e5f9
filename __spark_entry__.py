"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the driver may import this file by path; make the package resolvable
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG construction end-to-end on a synthesized interleaved-doc
    table (the BASELINE.json input shape), plus a corpus-quality pass over
    the driver's sf0.001 documents parquet.

    Returns the materialized kg_triples joined to per-relation grounding
    stats — the engine's primary product.
    """
    from imgfact_spark import synth
    from imgfact_spark.io import TableStore
    from imgfact_spark.pipeline.runner import PipelineConfig, run_pipeline
    import tempfile

    # driver-table smoke: corpus quality/langid/dedup must execute too
    from imgfact_spark.functions.text import doc_fingerprint, lang_id, quality_score

    docs_flat = spark.read.parquet(f"{SF0001}/documents.parquet")
    corpus_stats = (
        docs_flat.select(
            lang_id("text").alias("lang"),
            quality_score("text").alias("q"),
            doc_fingerprint("text").alias("fp"),
        )
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.round(F.avg("q"), 4).alias("avg_quality"))
    )
    corpus_stats.collect()  # force execution of the driver-table path

    import shutil

    docs = synth.synth_documents(spark, 500)
    kb = synth.kb_df(spark)
    ents = kb.selectExpr("s as entity").union(kb.selectExpr("o as entity")).distinct()
    r2d = synth.rel2desc_df(spark)
    root = tempfile.mkdtemp(prefix="imgfact_entry_")
    try:
        store = TableStore(root)
        res = run_pipeline(
            spark, docs, r2d, ents, store, PipelineConfig(checkpoint="final"),
            input_fingerprint="synth:42:500",
        )
        g = res.kg_groundings.groupBy("s", "p", "o").agg(
            F.count("*").alias("n_groundings"),
            F.round(F.max("score"), 6).alias("best_score"),
        )
        # eager localCheckpoint materializes the result off the store files
        # so the working tempdir is removed instead of leaking per run
        return (
            res.kg_triples.join(g, ["s", "p", "o"], "left")
            .fillna(0, subset=["n_groundings"])
            .select("s", "p", "o", "n_docs", "n_groundings", "best_score", "subset")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (filled in as
    operators land; each maps the operator onto the driver parquet tables)."""
    from imgfact_spark import entry_queries

    return entry_queries.QUERIES


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same keys/column names."""
    from imgfact_spark import entry_queries

    return entry_queries.ORACLES
