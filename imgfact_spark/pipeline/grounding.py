"""Stage 4: ground candidate triples against co-occurring media spans.

Reference semantics re-expressed (SURVEY.md §2.9 M2/M3, §2.2 P5/P6, §2.4 A12,
§2.5 W1):

  * a triple's grounding candidates are the media spans of the SAME document
    whose path-encoded entity pair matches (s, o) — the reference grounds
    images crawled for exactly that entity pair (directory layout
    README.md:66-84);
  * pair scorer (M2, P-tuned CLIP): score > 0.4
    (ptuningfilter.py:16,40-45);
  * per-entity scorer (M3): both entity scores ≥ 0.87
    (ptuningfilter_ent.py:32,60-65);
  * the two filters' outputs are INTERSECTED (README.md:107-112 → A12);
  * per-triplet rank by score desc, keep top-K (ptuningfilter.py:62-65 → W1)
    with deterministic tiebreak on media_ref.

Scores are the deterministic stand-ins (functions/scoring.py) affinely
calibrated into the score ranges real CLIP produces on pair-crawled images,
so the reference thresholds stay meaningful:
    pair score  = 0.20 + 0.80·u(pair|s|p|o|media_ref)   — ~75% pass 0.4
    entity score = 0.75 + 0.25·u(ent|entity|media_ref)  — ~27% pass both 0.87
Both are pure Column expressions (xxhash64-based); an equivalent pandas-UDF
path exists for plugging real models (det_score_py computes identical u).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from imgfact_spark.functions.scoring import det_score_col
from imgfact_spark.operators.topk import topk_per_group

PAIR_THRESHOLD = 0.4  # ptuningfilter.py:16
ENT_THRESHOLD = 0.87  # ptuningfilter_ent.py:32
DEFAULT_TOPK = 10


def pair_score(
    s: Column | str, p: Column | str, o: Column | str, media_ref: Column | str,
    hash_mode: str = "xxhash64",
) -> Column:
    base = F.lit(0.20) + F.lit(0.80) * det_score_col(
        F.lit("pair"), s, p, o, media_ref, hash_mode=hash_mode
    )
    # md5 (oracle) mode skips the cosmetic round: cross-engine round() is
    # the one operation with midpoint divergence (CLAUDE.md), and the raw
    # affine-of-rational value is already bit-identical in both engines.
    return base if hash_mode == "md5" else F.round(base, 6)


def entity_score(
    entity: Column | str, media_ref: Column | str, hash_mode: str = "xxhash64"
) -> Column:
    base = F.lit(0.75) + F.lit(0.25) * det_score_col(
        F.lit("ent"), entity, media_ref, hash_mode=hash_mode
    )
    return base if hash_mode == "md5" else F.round(base, 6)


def grounding_candidates(candidates: DataFrame, media: DataFrame) -> DataFrame:
    """Join candidate triples to same-doc media spans with a matching
    path-encoded pair.  Equi-join on (doc_id, s, o) — co-partitioned by the
    shuffle on the composite key; skewed docs are rare (docs are small) so
    the skew dimension is the entity pair, handled by AQE."""
    m = media.select(
        "doc_id",
        F.col("media_s").alias("s"),
        F.col("media_o").alias("o"),
        "media_ref",
        "subset",
    )
    return candidates.join(m, ["doc_id", "s", "o"], "inner")


def score_groundings(gc: DataFrame, hash_mode: str = "xxhash64") -> DataFrame:
    return (
        gc.withColumn("score", pair_score("s", "p", "o", "media_ref", hash_mode))
        .withColumn("score_s", entity_score("s", "media_ref", hash_mode))
        .withColumn("score_o", entity_score("o", "media_ref", hash_mode))
    )


def filter_groundings(
    scored: DataFrame,
    pair_threshold: float = PAIR_THRESHOLD,
    ent_threshold: float = ENT_THRESHOLD,
) -> DataFrame:
    """P5 ∧ P6 — the A12 intersection of the pair filter and the per-entity
    filter, expressed as one conjunctive predicate (both filters see the
    same rows, so intersect-on-key ≡ AND)."""
    return scored.filter(
        (F.col("score") > pair_threshold)
        & (F.col("score_s") >= ent_threshold)
        & (F.col("score_o") >= ent_threshold)
    )


def topk_groundings(filtered: DataFrame, k: int = DEFAULT_TOPK) -> DataFrame:
    """Per-(s,p,o) rank by score desc, keep K (W1); deterministic tiebreak."""
    return topk_per_group(
        filtered,
        keys=["s", "p", "o"],
        order_by=[F.desc("score")],
        k=k,
        tiebreak=["media_ref", "doc_id"],
    )


# ---------------------------------------------------------------------------
# Model-simulation scoring path (performance-profile variant)
# ---------------------------------------------------------------------------


def score_groundings_model_sim(
    gc, width: int = 256, layers: int = 4, seed: int = 42
):
    """Scoring through a deterministic numpy "encoder" whose compute profile
    resembles a small vision-text scoring head (batch @ width×width matmul
    stack), instead of the µs hash stand-in.

    The reference's grounding filters run CLIP on every (image, text) pair
    (ptuningfilter.py:33-47) — GFLOPs per row — so the engine's scaling
    behavior under a compute-dominated kernel is the representative one.
    Outputs are deterministic pure functions of (s,p,o,media_ref) — the
    6-decimal round absorbs BLAS batch-shape ulps, making scores stable
    across partitionings/runs — but follow the encoder's score
    distribution, not the calibrated-uniform one; use the default column
    path for oracle-matched decisions.

    Shape: a SCALAR Arrow-batched pandas UDF over only the four key
    columns, returning a struct of the three scores — every other gc
    column stays JVM-side instead of round-tripping through the Python
    worker (the mapInPandas form shipped full rows both ways; measured
    ~2× Arrow traffic on a wide gc).  Per batch ONE vectorized hash per
    score key, sinusoidal expansion to ``width`` dims, ``layers`` tanh
    matmuls (BLAS), logistic readout.  No per-row Python.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    rng = np.random.RandomState(seed)
    planes = [
        (rng.standard_normal((width, width)) / np.sqrt(width)).astype("float64")
        for _ in range(layers)
    ]
    readout = rng.standard_normal(width).astype("float64") / np.sqrt(width)
    freqs = (rng.uniform(0.5, 2.0, width) * 2 * np.pi).astype("float64")

    def encode(keys: "pd.Series") -> "np.ndarray":
        h = pd.util.hash_pandas_object(keys, index=False).to_numpy()
        base = (h % np.uint64(2**31)).astype("float64") / float(2**31)
        x = np.sin(np.outer(base, freqs))
        for w in planes:
            x = np.tanh(x @ w)
        z = x @ readout
        return 1.0 / (1.0 + np.exp(-3.0 * z))

    def _scores(s, p, o, media_ref):
        pair_key = "pair|" + s + "|" + p + "|" + o + "|" + media_ref
        s_key = "ent|" + s + "|" + media_ref
        o_key = "ent|" + o + "|" + media_ref
        return pd.DataFrame(
            {
                "score": np.round(encode(pair_key), 6),
                "score_s": np.round(0.75 + 0.25 * encode(s_key), 6),
                "score_o": np.round(0.75 + 0.25 * encode(o_key), 6),
            }
        )

    # real annotations (module uses `from __future__ import annotations`,
    # which breaks pandas_udf type-hint inference — CLAUDE.md)
    _scores.__annotations__ = {
        "s": pd.Series, "p": pd.Series, "o": pd.Series,
        "media_ref": pd.Series, "return": pd.DataFrame,
    }
    struct = T.StructType(
        [
            T.StructField("score", T.DoubleType()),
            T.StructField("score_s", T.DoubleType()),
            T.StructField("score_o", T.DoubleType()),
        ]
    )
    scores_udf = pandas_udf(_scores, returnType=struct)
    return gc.withColumn(
        "_ms", scores_udf("s", "p", "o", "media_ref")
    ).select(*gc.columns, "_ms.score", "_ms.score_s", "_ms.score_o")
