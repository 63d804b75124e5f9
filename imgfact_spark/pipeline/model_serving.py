"""Executor-side model-checkpoint serving for all four model kernels
(M2/M3 grounding scorers, M1 VCC entity classifier, M4 contrastive ranker).

The reference scores every (image, text) grounding pair with a P-tuned CLIP
checkpoint loaded once per DataLoader worker (ptuningfilter.py:33-47,
inference.py:160-176: ``model.load_state_dict(...)`` then batched forward).
On Spark the same contract is an ITERATOR pandas UDF: the checkpoint file is
deserialized ONCE per partition (per task iterator), then every Arrow batch
of that partition is scored through the loaded weights — no per-row Python,
no per-batch reload, no driver-side broadcast of the weights needed (the
file rides the executor's local disk / DFS cache, exactly how real
multi-GB CLIP weights have to travel; a closed-over numpy array would be
pickled into every task instead).

Two checkpoint flavors share the loading contract:

* ``mode="model"`` — stores the sinusoidal-encoder weights (planes, readout,
  freqs) of :func:`~imgfact_spark.pipeline.grounding.score_groundings_model_sim`;
  scores are bit-identical to that closed-over-planes path (pinned by
  ``tests/test_model_serving.py``), proving the serving path is a pure
  refactor of where the weights live.
* ``mode="md5"`` — stores only the affine calibration head (pair_lo/span,
  ent_lo/span) and computes the md5-mode deterministic score
  (functions/scoring.det_score_col semantics) in the Python worker, making
  the FULL serving path value-hash checkable against DuckDB
  (entry query ``m2_checkpoint_scoring``).
"""

import hashlib
import os
import tempfile
import uuid
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_MOD = 1_000_000

SCORE_STRUCT = T.StructType(
    [
        T.StructField("score", T.DoubleType()),
        T.StructField("score_s", T.DoubleType()),
        T.StructField("score_o", T.DoubleType()),
    ]
)


def save_scorer_checkpoint(
    path: str,
    mode: str = "md5",
    width: int = 256,
    layers: int = 4,
    seed: int = 42,
    pair_lo: float = 0.20,
    pair_span: float = 0.80,
    ent_lo: float = 0.75,
    ent_span: float = 0.25,
) -> str:
    """Serialize a scorer checkpoint to ``path`` (.npz), atomically.

    ``mode="model"`` materializes the SAME weights score_groundings_model_sim
    constructs from its seed (grounding.py:145-151), so the serving path can
    be asserted bit-identical to the closed-over path.
    """
    arrays = {
        "mode": np.array(mode),
        "calib": np.array([pair_lo, pair_span, ent_lo, ent_span], dtype="float64"),
    }
    if mode == "model":
        rng = np.random.RandomState(seed)
        arrays["planes"] = np.stack(
            [
                (rng.standard_normal((width, width)) / np.sqrt(width)).astype("float64")
                for _ in range(layers)
            ]
        )
        arrays["readout"] = rng.standard_normal(width).astype("float64") / np.sqrt(width)
        arrays["freqs"] = (rng.uniform(0.5, 2.0, width) * 2 * np.pi).astype("float64")
    # np.savez appends ".npz" to names lacking the suffix — keep it on the
    # temp name so the atomic replace sees the file savez actually wrote
    tmp = f"{path}.{uuid.uuid4().hex}.tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    return path


def default_checkpoint_path(mode: str = "md5") -> str:
    """Stable write-once location for the deterministic default checkpoint —
    idempotent across driver/oracle invocations (no tempdir leak; the same
    params always produce the same file, so racing writers are safe via the
    atomic replace)."""
    path = os.path.join(tempfile.gettempdir(), f"imgfact_m2_ckpt_{mode}_v1.npz")
    if not os.path.exists(path):
        save_scorer_checkpoint(path, mode=mode)
    return path


def _md5_u(keys: pd.Series) -> pd.Series:
    """md5-mode deterministic unit score — the Python twin of
    functions/scoring.det_score_col(hash_mode='md5'): 60-bit hex-prefix
    integer mod 1e6, over the utf-8 key bytes (non-negative, % == pmod)."""
    return keys.map(
        lambda s: int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % _MOD
    ) / float(_MOD)


class _LoadedScorer:
    """The deserialized checkpoint: scores one (s,p,o,media_ref) batch."""

    def __init__(self, path: str):
        with np.load(path) as z:
            self.mode = str(z["mode"])
            self.pair_lo, self.pair_span, self.ent_lo, self.ent_span = z["calib"]
            if self.mode == "model":
                self.planes = [w for w in z["planes"]]
                self.readout = z["readout"]
                self.freqs = z["freqs"]

    def _encode(self, keys: pd.Series) -> np.ndarray:
        # bit-identical to grounding.score_groundings_model_sim.encode;
        # the hash→sin lift is the shared _encode_base (one definition —
        # the M1/M4 kernels use the same one, so the bit-sensitive lift
        # cannot drift between serving paths)
        x = _encode_base(keys, self.freqs)
        for w in self.planes:
            x = np.tanh(x @ w)
        z = x @ self.readout
        return 1.0 / (1.0 + np.exp(-3.0 * z))

    def score_batch(
        self, s: pd.Series, p: pd.Series, o: pd.Series, media_ref: pd.Series
    ) -> pd.DataFrame:
        pair_key = "pair|" + s + "|" + p + "|" + o + "|" + media_ref
        s_key = "ent|" + s + "|" + media_ref
        o_key = "ent|" + o + "|" + media_ref
        if self.mode == "model":
            return pd.DataFrame(
                {
                    "score": np.round(self._encode(pair_key), 6),
                    "score_s": np.round(0.75 + 0.25 * self._encode(s_key), 6),
                    "score_o": np.round(0.75 + 0.25 * self._encode(o_key), 6),
                }
            )
        return pd.DataFrame(
            {
                "score": self.pair_lo + self.pair_span * _md5_u(pair_key),
                "score_s": self.ent_lo + self.ent_span * _md5_u(s_key),
                "score_o": self.ent_lo + self.ent_span * _md5_u(o_key),
            }
        )


def checkpoint_scores_udf(checkpoint_path: str, load_marker_dir: "str | None" = None):
    """SCALAR_ITER pandas UDF over (s, p, o, media_ref) → score struct.

    The checkpoint loads ONCE per partition (once per task's batch
    iterator), then serves every Arrow batch — the inference.py:160-176
    worker contract.  ``load_marker_dir`` (tests only) drops one marker
    file per load so the once-per-partition invariant is countable.
    Built on the shared :func:`_iter_udf` (one serve-loop definition for
    all four kernels)."""
    return _iter_udf(_LoadedScorer, SCORE_STRUCT, checkpoint_path,
                     load_marker_dir, 4)


def score_groundings_checkpoint(
    gc: DataFrame,
    checkpoint_path: str,
    load_marker_dir: "str | None" = None,
) -> DataFrame:
    """Drop-in for grounding.score_groundings / score_groundings_model_sim
    with the weights served from ``checkpoint_path`` instead of closed-over
    constants.  Only the four key columns cross the Arrow boundary; every
    other gc column stays JVM-side."""
    udf = checkpoint_scores_udf(checkpoint_path, load_marker_dir)
    scored = gc.withColumn("_ms", udf("s", "p", "o", "media_ref"))
    return scored.select(*gc.columns, "_ms.score", "_ms.score_s", "_ms.score_o")


# ---------------------------------------------------------------------------
# M1 (VCC visual-entity classifier) and M4 (contrastive top-5 ranker)
# checkpoint serving — the same .npz-per-partition iterator-UDF contract as
# the M2/M3 grounding scorers above, extended to the reference's other two
# model kernels:
#
# * M1 — entity_filtering/inference.py:83-119: the VCC model (BERT+VGG16)
#   scores each entity's (abstract, image-evidence) bundle and gates it
#   visual/non-visual.  Serving key: "vcc|<entity>" — md5 mode is
#   BIT-IDENTICAL to the deterministic stand-in
#   functions/scoring.det_score_col(lit("vcc"), entity, hash_mode="md5"),
#   so the checkpoint path is a pure refactor of where the weights live
#   and the gate decisions match the stand-in pipeline exactly.
# * M4 — relation_based_image_filtering/CPgen.py:332-380: the contrastive
#   ranker scores each (triple-prompt, image) candidate as
#   dot(CLS_text, CLS_image) and keeps groups whose positive candidate
#   ranks in the top-5 (CPgen.py:367-378).  Serving keys: the text CLS is
#   derived from "cp_txt|s|p|o", the image CLS from "cp_img|media_ref",
#   and mode="model" scores sigmoid(dot(enc_text, enc_img)) — the
#   dot(CLS,CLS) shape with real ndarray weights.  md5 mode folds the
#   joint key to the cross-engine unit score so DuckDB replays every
#   candidate score bit-for-bit.
# ---------------------------------------------------------------------------

VCC_STRUCT = T.StructType([T.StructField("vcc_score", T.DoubleType())])
CP_STRUCT = T.StructType([T.StructField("cp_score", T.DoubleType())])


def save_vcc_checkpoint(
    path: str,
    mode: str = "md5",
    width: int = 256,
    layers: int = 4,
    seed: int = 43,
) -> str:
    """Serialize a VCC entity-classifier checkpoint (.npz), atomically.

    md5 mode stores no weights beyond the mode tag — the served score is
    the deterministic md5 unit score of "vcc|<entity>", bit-identical to
    the stand-in gate, which is what makes the FULL serving path (file →
    per-partition load → batch scoring → threshold) value-hash checkable.
    ``mode="model"`` stores a real sinusoidal-MLP weight set (the M2
    pattern) whose scores the numpy twin :func:`vcc_scores_numpy` replays
    bit-for-bit driver-side.
    """
    arrays = {"kernel": np.array("vcc"), "mode": np.array(mode)}
    if mode == "model":
        rng = np.random.RandomState(seed)
        arrays["planes"] = np.stack(
            [
                (rng.standard_normal((width, width)) / np.sqrt(width)).astype("float64")
                for _ in range(layers)
            ]
        )
        arrays["readout"] = rng.standard_normal(width).astype("float64") / np.sqrt(width)
        arrays["freqs"] = (rng.uniform(0.5, 2.0, width) * 2 * np.pi).astype("float64")
    tmp = f"{path}.{uuid.uuid4().hex}.tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    return path


def save_cp_checkpoint(
    path: str,
    mode: str = "md5",
    width: int = 256,
    layers: int = 2,
    seed: int = 44,
) -> str:
    """Serialize a contrastive-ranker checkpoint (.npz), atomically.

    ``mode="model"`` stores TWO encoder towers (text and image — the
    CPgen.py dual-encoder shape); the served score is
    sigmoid(dot(enc_txt(key), enc_img(key)) / sqrt(width)).  md5 mode
    serves the cross-engine unit score of the joint candidate key.
    """
    arrays = {"kernel": np.array("cp"), "mode": np.array(mode)}
    if mode == "model":
        rng = np.random.RandomState(seed)
        for tower in ("txt", "img"):
            arrays[f"planes_{tower}"] = np.stack(
                [
                    (rng.standard_normal((width, width)) / np.sqrt(width)).astype(
                        "float64"
                    )
                    for _ in range(layers)
                ]
            )
        arrays["freqs"] = (rng.uniform(0.5, 2.0, width) * 2 * np.pi).astype("float64")
    tmp = f"{path}.{uuid.uuid4().hex}.tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    return path


def default_vcc_checkpoint_path(mode: str = "md5") -> str:
    path = os.path.join(tempfile.gettempdir(), f"imgfact_m1_ckpt_{mode}_v1.npz")
    if not os.path.exists(path):
        save_vcc_checkpoint(path, mode=mode)
    return path


def default_cp_checkpoint_path(mode: str = "md5") -> str:
    path = os.path.join(tempfile.gettempdir(), f"imgfact_m4_ckpt_{mode}_v1.npz")
    if not os.path.exists(path):
        save_cp_checkpoint(path, mode=mode)
    return path


def _encode_base(keys: pd.Series, freqs: np.ndarray) -> np.ndarray:
    """Shared key→feature lift: hash → unit scalar → sinusoidal features."""
    h = pd.util.hash_pandas_object(keys, index=False).to_numpy()
    base = (h % np.uint64(2**31)).astype("float64") / float(2**31)
    return np.sin(np.outer(base, freqs))


class _LoadedVcc:
    """Deserialized M1 checkpoint: scores one entity batch."""

    def __init__(self, path: str):
        with np.load(path) as z:
            if str(z["kernel"]) != "vcc":
                raise ValueError(f"not a vcc checkpoint: {path}")
            self.mode = str(z["mode"])
            if self.mode == "model":
                self.planes = [w for w in z["planes"]]
                self.readout = z["readout"]
                self.freqs = z["freqs"]

    def score_batch(self, entity: pd.Series) -> pd.DataFrame:
        key = "vcc|" + entity
        if self.mode == "model":
            x = _encode_base(key, self.freqs)
            for w in self.planes:
                x = np.tanh(x @ w)
            z = x @ self.readout
            score = 1.0 / (1.0 + np.exp(-3.0 * z))
        else:
            score = _md5_u(key)
        return pd.DataFrame({"vcc_score": np.asarray(score, dtype="float64")})


class _LoadedCp:
    """Deserialized M4 checkpoint: scores one candidate batch."""

    def __init__(self, path: str):
        with np.load(path) as z:
            if str(z["kernel"]) != "cp":
                raise ValueError(f"not a cp checkpoint: {path}")
            self.mode = str(z["mode"])
            if self.mode == "model":
                self.planes_txt = [w for w in z["planes_txt"]]
                self.planes_img = [w for w in z["planes_img"]]
                self.freqs = z["freqs"]

    def _tower(self, keys: pd.Series, planes: list) -> np.ndarray:
        x = _encode_base(keys, self.freqs)
        for w in planes:
            x = np.tanh(x @ w)
        return x

    def score_batch(
        self, s: pd.Series, p: pd.Series, o: pd.Series, media_ref: pd.Series
    ) -> pd.DataFrame:
        if self.mode == "model":
            cls_txt = self._tower("cp_txt|" + s + "|" + p + "|" + o, self.planes_txt)
            cls_img = self._tower("cp_img|" + media_ref, self.planes_img)
            dots = np.einsum("ij,ij->i", cls_txt, cls_img) / np.sqrt(
                cls_txt.shape[1]
            )
            score = 1.0 / (1.0 + np.exp(-3.0 * dots))
        else:
            score = _md5_u("cp|" + s + "|" + p + "|" + o + "|" + media_ref)
        return pd.DataFrame({"cp_score": np.asarray(score, dtype="float64")})


def vcc_scores_numpy(entities: "list[str]", checkpoint_path: str) -> np.ndarray:
    """Driver-side numpy twin of the M1 serving UDF (parity tests)."""
    return (
        _LoadedVcc(checkpoint_path)
        .score_batch(pd.Series(entities, dtype="object"))["vcc_score"]
        .to_numpy()
    )


def cp_scores_numpy(
    s: "list[str]", p: "list[str]", o: "list[str]", media_ref: "list[str]",
    checkpoint_path: str,
) -> np.ndarray:
    """Driver-side numpy twin of the M4 serving UDF (parity tests)."""
    ser = lambda v: pd.Series(v, dtype="object")  # noqa: E731
    return (
        _LoadedCp(checkpoint_path)
        .score_batch(ser(s), ser(p), ser(o), ser(media_ref))["cp_score"]
        .to_numpy()
    )


def _iter_udf(loader, struct, checkpoint_path: str, load_marker_dir, n_cols: int):
    """Shared SCALAR_ITER construction: load once per partition iterator,
    then serve every Arrow batch (the inference.py:160-176 worker shape)."""

    def serve(batches):
        kernel = loader(checkpoint_path)  # per-partition init
        if load_marker_dir:
            with open(
                os.path.join(load_marker_dir, f"load-{uuid.uuid4().hex}"), "w"
            ) as f:
                f.write(checkpoint_path)
        for cols in batches:
            if n_cols == 1:
                yield kernel.score_batch(cols)
            else:
                yield kernel.score_batch(*cols)

    # pandas_udf infers SCALAR_ITER from the type hints; a 1-column
    # iterator UDF yields bare Series, a multi-column one yields tuples
    serve.__annotations__ = {
        "batches": Iterator[pd.Series]
        if n_cols == 1
        else Iterator[Tuple[tuple([pd.Series] * n_cols)]],
        "return": Iterator[pd.DataFrame],
    }
    return pandas_udf(serve, returnType=struct)


def score_entities_checkpoint(
    entities: DataFrame,
    checkpoint_path: str,
    entity_col: str = "entity",
    load_marker_dir: "str | None" = None,
) -> DataFrame:
    """M1 serving: append ``vcc_score`` from an executor-loaded checkpoint.

    Drop-in for the stand-in gate's ``det_score_col(lit('vcc'), entity)``
    column (entity_filter.visual_entities) — md5-mode scores are
    bit-identical to the stand-in's md5 mode, pinned by
    tests/test_model_serving.py."""
    udf = _iter_udf(_LoadedVcc, VCC_STRUCT, checkpoint_path, load_marker_dir, 1)
    scored = entities.withColumn("_m1", udf(entity_col))
    return scored.select(*entities.columns, "_m1.vcc_score")


def score_candidates_checkpoint(
    cands: DataFrame,
    checkpoint_path: str,
    load_marker_dir: "str | None" = None,
) -> DataFrame:
    """M4 serving: append ``cp_score`` over (s, p, o, media_ref) candidates
    from an executor-loaded dual-encoder checkpoint.  Only the four key
    columns cross the Arrow boundary."""
    udf = _iter_udf(_LoadedCp, CP_STRUCT, checkpoint_path, load_marker_dir, 4)
    scored = cands.withColumn("_m4", udf("s", "p", "o", "media_ref"))
    return scored.select(*cands.columns, "_m4.cp_score")
