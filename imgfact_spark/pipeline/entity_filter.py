"""Stage 2: visual-entity gate (M1 analogue).

Reference semantics (entity_filtering/):
  1. evidence gate — an entity is considered only with ≥ min_evidence crawled
     images (dataloading.py:21-22, threshold 10);
  2. classifier gate — the VCC model (BERT+VGG16) labels the entity
     visual/non-visual (inference.py:83-119); we preserve the decision shape
     with the deterministic stand-in scorer (functions/scoring.py) at a
     configurable threshold;
  3. triples survive only if BOTH endpoints are visual — double broadcast
     semi-join (filter_tuples.py:22-24 → SURVEY.md J1).

Evidence counting uses the salted two-phase aggregation (operators/salted.py)
because media evidence concentrates on skewed head entities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imgfact_spark.functions.scoring import det_score_col
from imgfact_spark.operators.salted import salted_count


def entity_evidence(media: DataFrame) -> DataFrame:
    """Distinct media evidence per entity: each media span credits both the
    subject and object of its path-encoded pair.

    → (entity, n_media)
    """
    cred = media.select(F.col("media_s").alias("entity"), "media_ref").unionByName(
        media.select(F.col("media_o").alias("entity"), "media_ref")
    )
    return salted_count(
        cred, keys=["entity"], distinct_on="media_ref", count_col="n_media"
    )


def visual_entities(
    media: DataFrame,
    min_evidence: int = 10,
    vcc_threshold: float = 0.05,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Entities passing both the evidence gate and the classifier gate.

    ``vcc_threshold`` drops the lowest-scoring fraction — the deterministic
    stand-in for the VCC keep/drop decision (inference.py:160-176).
    ``hash_mode="md5"``: cross-engine oracle-checkable scores (unrounded —
    see grounding.pair_score).
    → (entity, n_media, vcc_score)
    """
    ev = entity_evidence(media)
    vcc = det_score_col(F.lit("vcc"), "entity", hash_mode=hash_mode)
    if hash_mode != "md5":
        vcc = F.round(vcc, 6)
    return (
        ev.filter(F.col("n_media") >= min_evidence)
        .withColumn("vcc_score", vcc)
        .filter(F.col("vcc_score") >= vcc_threshold)
    )


def visual_entities_checkpoint(
    media: DataFrame,
    checkpoint_path: str,
    min_evidence: int = 10,
    vcc_threshold: float = 0.05,
    load_marker_dir: "str | None" = None,
) -> DataFrame:
    """:func:`visual_entities` with the VCC classifier served from an
    executor-loaded checkpoint (pipeline/model_serving.py) instead of the
    closed-over stand-in — the path a user bringing real VCC weights swaps
    into (reference inference.py:83-119 loads the BERT+VGG16 state dict per
    DataLoader worker; here the .npz deserializes once per partition).

    md5-mode checkpoints score bit-identically to
    ``visual_entities(hash_mode="md5")`` (parity-pinned), so the gate
    decisions are a pure refactor of where the weights live.
    → (entity, n_media, vcc_score)
    """
    from imgfact_spark.pipeline.model_serving import score_entities_checkpoint

    ev = entity_evidence(media).filter(F.col("n_media") >= min_evidence)
    scored = score_entities_checkpoint(
        ev, checkpoint_path, load_marker_dir=load_marker_dir
    )
    return scored.filter(F.col("vcc_score") >= vcc_threshold)


def filter_visual_triples(
    candidates: DataFrame, visual: DataFrame, broadcast_dim: bool = True
) -> DataFrame:
    """Keep candidate triples whose s AND o are visual entities — the J1
    double left-semi join.

    ``broadcast_dim``: hint the visual-entity set (default — saves the
    fact-side shuffle; AQE alone only converts post-shuffle).  Disable at
    web scale where the gated entity set can exceed the 8 GB broadcast
    ceiling; AQE then handles skewed shuffled semi-joins.  Relation/template
    dims elsewhere are always hinted (≤142 rows by construction)."""
    v = visual.select("entity")
    if broadcast_dim:
        v = F.broadcast(v)
    return candidates.join(
        v.withColumnRenamed("entity", "s"), "s", "left_semi"
    ).join(v.withColumnRenamed("entity", "o"), "o", "left_semi")
