"""Degenerate-input robustness: empty corpora, fact-free docs, empty media."""

from __future__ import annotations

from pyspark.sql import functions as F

from imgfact_spark import synth
from imgfact_spark.io import TableStore
from imgfact_spark.pipeline.runner import PipelineConfig, run_pipeline
from imgfact_spark.synth import DOC_SCHEMA


def _run(spark, docs_df, tmp_path, tag):
    kb = synth.kb_df(spark)
    ents = kb.selectExpr("s as entity").union(kb.selectExpr("o as entity")).distinct()
    r2d = synth.rel2desc_df(spark)
    store = TableStore(str(tmp_path / tag))
    return run_pipeline(
        spark, docs_df, r2d, ents, store,
        PipelineConfig(checkpoint="final"), input_fingerprint=f"degen:{tag}",
    )


def test_empty_corpus(spark, tmp_path):
    docs = spark.createDataFrame([], DOC_SCHEMA)
    res = _run(spark, docs, tmp_path, "empty")
    assert res.kg_triples.count() == 0
    assert res.kg_groundings.count() == 0


def test_fact_free_docs(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (
                "d0",
                [
                    {"kind": "text", "text": "Nothing relevant here.", "media_ref": None, "offset": 0},
                    {"kind": "text", "text": "Still nothing.", "media_ref": None, "offset": 23},
                ],
            ),
            ("d1", [{"kind": "media", "text": None, "media_ref": "img://TL001/noise/none/0.jpg", "offset": 0}]),
        ],
        DOC_SCHEMA,
    )
    res = _run(spark, docs, tmp_path, "factfree")
    assert res.kg_triples.count() == 0


def test_text_only_docs_extract_but_cannot_ground(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (
                "d0",
                [
                    {
                        "kind": "text",
                        "text": "Head 0001 was born in Tail 0001.",
                        "media_ref": None,
                        "offset": 0,
                    }
                ],
            )
        ],
        DOC_SCHEMA,
    )
    res = _run(spark, docs, tmp_path, "textonly")
    # no media anywhere → visual-entity gate drops everything, no crash
    assert res.kg_triples.count() == 0
    assert res.kg_groundings.count() == 0


def test_sample_tuples_partition_invariant(spark):
    from imgfact_spark.pipeline.relation_filter import sample_tuples_per_relation

    rows = [(f"s{i}", f"p{i % 3}", f"o{i}") for i in range(300)]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    a = sorted(map(tuple, sample_tuples_per_relation(df, 10).collect()))
    b = sorted(
        map(tuple, sample_tuples_per_relation(df.repartition(13), 10).collect())
    )
    assert a == b and len(a) == 30
