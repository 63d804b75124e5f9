"""Executor-side model-checkpoint serving for the grounding scorers (M2/M3).

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
        # bit-identical to grounding.score_groundings_model_sim.encode
        h = pd.util.hash_pandas_object(keys, index=False).to_numpy()
        base = (h % np.uint64(2**31)).astype("float64") / float(2**31)
        x = np.sin(np.outer(base, self.freqs))
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
    """

    def serve(
        batches: Iterator[Tuple[pd.Series, pd.Series, pd.Series, pd.Series]],
    ) -> Iterator[pd.DataFrame]:
        scorer = _LoadedScorer(checkpoint_path)  # per-partition init
        if load_marker_dir:
            with open(
                os.path.join(load_marker_dir, f"load-{uuid.uuid4().hex}"), "w"
            ) as f:
                f.write(checkpoint_path)
        for s, p, o, media_ref in batches:
            yield scorer.score_batch(s, p, o, media_ref)

    return pandas_udf(serve, returnType=SCORE_STRUCT)


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
