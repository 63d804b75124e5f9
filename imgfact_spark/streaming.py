"""Structured Streaming ingestion for the KG pipeline.

The reference is pure batch (SURVEY.md §2.10) — its only incremental
mechanism is skip-finished-chunks resume.  The Spark-native generalization:
new document files land in a directory (or Kafka/Iceberg CDC in
production), a streaming query explodes them to spans incrementally, and
the batch pipeline stages run on the growing spans table.  Exactly-once is
the sink+checkpoint contract; ``Trigger.AvailableNow`` gives the reference's
"process what's there, then stop" batch-resume behavior with streaming
bookkeeping.

Also provides the generic windowed/watermarked event aggregation over the
driver's ``events`` stream shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imgfact_spark.synth import DOC_SCHEMA


def stream_documents(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source document stream with the authoritative input schema."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )


def ingest_spans_incremental(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    await_termination: bool = True,
):
    """Incrementally explode arriving documents into the spans table.

    AvailableNow: drains everything currently in ``input_dir`` then stops —
    re-running after new files arrive processes ONLY the new files (file
    source tracks progress in the checkpoint), the streaming-native form of
    the reference's skip-finished-chunks loop (inference.py:139-143).
    """
    from imgfact_spark.pipeline.ingest import explode_spans

    docs = stream_documents(spark, input_dir)
    spans = explode_spans(docs)
    q = (
        spans.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per event_type — the
    standard late-data-tolerant streaming aggregation; works identically on
    a batch DataFrame (used by tests and the batch oracle)."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(win.alias("win"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type",
        "n_events",
        "sum_value",
    )
