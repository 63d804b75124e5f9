"""Executor-side checkpoint serving (pipeline/model_serving.py): the
once-per-partition load contract and score parity with both in-engine
scorer paths (reference inference.py:160-176 / ptuningfilter.py:33-47 —
per-worker load_state_dict, batched forward)."""

import os

import pytest
from pyspark.sql import functions as F

from imgfact_spark.pipeline.grounding import (
    score_groundings,
    score_groundings_model_sim,
)
from imgfact_spark.pipeline.model_serving import (
    save_scorer_checkpoint,
    score_groundings_checkpoint,
)


@pytest.fixture()
def gc(spark):
    return (
        spark.range(200)
        .select(
            F.concat(F.lit("s"), (F.col("id") % 13).cast("string")).alias("s"),
            F.concat(F.lit("rel"), (F.col("id") % 5).cast("string")).alias("p"),
            F.concat(F.lit("o"), (F.col("id") % 17).cast("string")).alias("o"),
            F.concat(F.lit("img/"), F.col("id").cast("string")).alias("media_ref"),
        )
        .repartition(4)
    )


def _collect_scores(df):
    return {
        r["media_ref"]: (r["score"], r["score_s"], r["score_o"])
        for r in df.collect()
    }


def test_model_checkpoint_matches_closed_over_planes(spark, gc, tmp_path):
    """mode='model' serving is a pure refactor of score_groundings_model_sim:
    identical weights from the file, bit-identical scores."""
    ckpt = save_scorer_checkpoint(
        str(tmp_path / "m2.npz"), mode="model", width=64, layers=2, seed=42
    )
    served = _collect_scores(score_groundings_checkpoint(gc, ckpt))
    closed = _collect_scores(
        score_groundings_model_sim(gc, width=64, layers=2, seed=42)
    )
    assert served == closed  # exact float equality, not approx


def test_md5_checkpoint_matches_column_path(spark, gc, tmp_path):
    """mode='md5' serving computes the same value as the pure-Column
    det_score_col(hash_mode='md5') scorer — the cross-engine primitive."""
    ckpt = save_scorer_checkpoint(str(tmp_path / "m2md5.npz"), mode="md5")
    served = _collect_scores(score_groundings_checkpoint(gc, ckpt))
    column = _collect_scores(score_groundings(gc, hash_mode="md5"))
    assert served == column


def test_checkpoint_loads_once_per_partition(spark, gc, tmp_path):
    """The load marker count equals the partition count even when Arrow
    splits each partition into many batches — the iterator UDF deserializes
    once per task, then serves every batch."""
    ckpt = save_scorer_checkpoint(str(tmp_path / "m2.npz"), mode="md5")
    marker_dir = tmp_path / "loads"
    marker_dir.mkdir()
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    try:
        out = score_groundings_checkpoint(gc, ckpt, load_marker_dir=str(marker_dir))
        # count() would NOT load the checkpoint at all: Catalyst prunes the
        # unused UDF column (verified — loads stay 0), so materialize rows
        n_rows = len(out.collect())
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    assert n_rows == 200
    n_parts = gc.rdd.getNumPartitions()
    loads = len(os.listdir(marker_dir))
    # 200 rows / 4 partitions at 10 rows/batch = ~5 batches per partition,
    # but exactly one checkpoint load per partition
    assert loads == n_parts
