"""Streaming ingestion tests: incremental exactly-once span ingest."""

from __future__ import annotations

import os

from imgfact_spark import synth
from imgfact_spark.streaming import ingest_spans_incremental, windowed_event_counts


def test_incremental_span_ingest(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)

    # batch 1 arrives
    synth.synth_documents(spark, 50).write.mode("append").parquet(input_dir)
    ingest_spans_incremental(spark, input_dir, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    expected1 = (
        synth.synth_documents(spark, 50)
        .selectExpr("size(spans) n").agg({"n": "sum"}).collect()[0][0]
    )
    assert n1 == expected1

    # batch 2 arrives — only the NEW files are processed (no duplicates)
    synth.synth_documents(spark, 80).filter("doc_id >= 'doc_000000050'").write.mode(
        "append"
    ).parquet(input_dir)
    ingest_spans_incremental(spark, input_dir, out_dir, ckpt)
    n2 = spark.read.parquet(out_dir).count()
    expected2 = (
        synth.synth_documents(spark, 80)
        .filter("doc_id >= 'doc_000000050'")
        .selectExpr("size(spans) n").agg({"n": "sum"}).collect()[0][0]
    )
    assert n2 == expected1 + expected2

    # re-run with nothing new: no change (exactly-once)
    ingest_spans_incremental(spark, input_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == n2

    # span order survives: reassemble one doc and compare
    from imgfact_spark.pipeline.ingest import reassemble_spans

    spans = spark.read.parquet(out_dir)
    back = reassemble_spans(spans).filter("doc_id = 'doc_000000007'").collect()[0]
    orig = (
        synth.synth_documents(spark, 50)
        .filter("doc_id = 'doc_000000007'")
        .collect()[0]
    )
    assert [tuple(s) for s in back["spans"]] == [tuple(s) for s in orig["spans"]]


def test_windowed_event_counts_batch_parity(spark):
    import datetime as dt

    rows = [
        (i, dt.datetime(2026, 1, 1, h, 30), 100 + i, "click", 1.5)
        for i, h in enumerate([0, 0, 1, 1, 1, 3])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {
        (r["window_start"].hour, r["n_events"]) for r in windowed_event_counts(df, "1 hour").collect()
    }
    assert got == {(0, 2), (1, 3), (3, 1)}
