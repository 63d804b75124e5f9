"""Multimodal binary-column plumbing: decode / feature-extract / resize /
frame-sample over opaque ``binary`` media payloads.

The Spark-side architecture is real and tested — schema contract,
Arrow-batched mapInPandas kernels, partition sizing — while the actual
codec calls are STUBBED behind deterministic fakes (this container ships no
image/audio libraries).  Swapping a stub for Pillow/ffmpeg changes ONE
function body; every signature, schema and batch shape stays fixed.

Schema contract:
    media(media_ref string, kind string, payload binary,
          meta struct<width:int, height:int, n_frames:int, sample_rate:int>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def synth_media(
    spark, refs: DataFrame, payload_bytes: int = 256, payload_mode: str = "xxh"
) -> DataFrame:
    """Deterministic fake media table for the given media_ref rows: payload
    = repeatable bytes derived from the ref hash (stands in for real image
    bytes; sized small on purpose).  ``payload_mode="md5"`` derives the
    bytes from the md5 hex digest instead (16-byte blocks) — the
    cross-engine primitive, so DuckDB can re-synthesize the exact payload
    when certifying the md5-mode feature extractor."""
    if payload_mode == "md5":
        payload = F.unhex(F.repeat(F.md5("media_ref"), payload_bytes // 16))
    else:
        payload = F.expr(
            f"repeat(unhex(lpad(hex(abs(xxhash64(media_ref))), 16, '0')), {payload_bytes // 8})"
        ).cast("binary")
    return refs.select(
        "media_ref",
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(224).alias("width"),
            F.lit(224).alias("height"),
            F.lit(1).alias("n_frames"),
            F.lit(0).alias("sample_rate"),
        ).alias("meta"),
    )


def _stub_decode(payload: bytes) -> np.ndarray:
    """STUB decode: real impl = PIL.Image.open(io.BytesIO(payload)).

    Deterministic fake: tile the payload bytes into an 8×8×3 'image'.
    Raises on None payload like a real decoder would on corrupt bytes.
    """
    if payload is None:
        raise ValueError("corrupt media payload")
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = 8 * 8 * 3
    arr = np.resize(arr, need)
    return arr.reshape(8, 8, 3)


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL decoder for binary PPM (P6) images — pure numpy, no library.

    PPM is an actual on-disk image format (netpbm); this decoder proves the
    ``decode_fn`` injection point end-to-end without Pillow in the
    container.  Handles the standard header (magic, whitespace/comments,
    width height, maxval ≤ 255) and returns (height, width, 3) uint8.
    Raises ValueError on anything malformed — the corrupt-payload contract.
    """
    if payload is None:
        raise ValueError("corrupt media payload")
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header tokenizer: fields separated by whitespace, '#' comments to EOL
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly ONE whitespace byte after maxval, per spec
    width, height, maxval = fields
    if width <= 0 or height <= 0:
        # a 0×0 header would decode to a size-0 axis and surface later as
        # an IndexError in the model-input fit — fail the documented way
        raise ValueError(f"invalid PPM dimensions {width}x{height}")
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = width * height * 3
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(height, width, 3)


def _to_model_input(img: np.ndarray) -> np.ndarray:
    """Fit an arbitrary (H, W, 3) decode to the fixed 8×8×3 model input by
    evenly-strided pixel selection (deterministic, dependency-free — the
    production body swaps in a real resample).  An already-8×8×3 image
    passes through byte-identical, so the md5-mode oracle contract over
    the stub decoder is unchanged."""
    if img.shape == (8, 8, 3):
        return img
    h, w = img.shape[:2]
    ri = np.linspace(0, h - 1, 8).round().astype(int)
    ci = np.linspace(0, w - 1, 8).round().astype(int)
    return np.ascontiguousarray(img[np.ix_(ri, ci)])


def extract_features(
    media: DataFrame,
    dim: int = 64,
    hash_mode: "str | None" = None,
    decode_fn=None,
) -> DataFrame:
    """media → (media_ref, features array<float>) via Arrow-batched
    mapInPandas; per-batch vectorized (decode loop is per item — the real
    codec is too — but everything around it is numpy batch ops).

    ``decode_fn`` (bytes → (H, W, 3) uint8 ndarray) is the injected codec;
    default is the deterministic stub.  With Pillow installed the real
    decoder is one line::

        decode_fn=lambda b: np.asarray(
            PIL.Image.open(io.BytesIO(b)).convert("RGB"))

    and the in-repo dependency-free proof is ``decode_fn=decode_ppm`` over
    real P6 payloads (tests/test_multimodal.py exercises the injection
    end-to-end against the same oracle family).  Arbitrary decode sizes
    are fitted to the fixed model input by ``_to_model_input`` (strided
    resample stand-in); an 8×8×3 decode passes through byte-identical.

    The production body swaps the decoder for a real codec and the
    pooling for a model forward (iterator form keeps per-partition model
    init amortized, like the reference's DataLoader workers,
    inference.py:162-163).

    ``hash_mode="md5"`` replaces the matmul head with the cross-engine
    md5-prefix unit score of (decoded-bytes hex, dim index) — same decode,
    same Arrow plumbing, but every feature value is DuckDB-replicable
    (array<double> output), which is what lets the driver value-hash the
    whole binary→decode→feature path.
    """
    elem = T.DoubleType() if hash_mode == "md5" else T.FloatType()
    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType(), False),
            T.StructField("features", T.ArrayType(elem), False),
        ]
    )

    decode = decode_fn if decode_fn is not None else _stub_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init happens HERE (model load in production)
        rng_planes = np.random.RandomState(42).standard_normal((8 * 8 * 3, dim))
        for pdf in it:
            if len(pdf) == 0:
                continue
            imgs = np.stack([_to_model_input(decode(p)) for p in pdf["payload"]])
            if hash_mode == "md5":
                import hashlib

                feats = [
                    np.array(
                        [
                            (
                                int(
                                    hashlib.md5(
                                        f"{img.tobytes().hex()}|{j}".encode()
                                    ).hexdigest()[:15],
                                    16,
                                )
                                % 1_000_000
                            )
                            / 1e6
                            for j in range(dim)
                        ],
                        dtype="float64",
                    )
                    for img in imgs
                ]
            else:
                flat = imgs.reshape(len(pdf), -1).astype("float64") / 255.0
                out = flat @ rng_planes  # stands in for the model forward
                feats = [row.astype("float32") for row in out]
            yield pd.DataFrame(
                {"media_ref": pdf["media_ref"].values, "features": feats}
            )

    return media.select("media_ref", "payload").mapInPandas(batches, out_schema)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: real impl = vips/PIL resize; the fake rewrites meta and
    passes payload through.  Shape of the operation (mapInPandas over
    payload+meta, same schema out) is what production code keeps."""
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.sample_rate").alias("sample_rate"),
        ),
    )


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video rows: explode frame indexes 0..n_frames-1,
    keep every n-th (native explode + filter — no UDF; the DECODE of a kept
    frame is the stubbed part)."""
    return (
        media.select(
            "media_ref",
            "kind",
            "meta",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)))
            ).alias("frame_no"),
        )
        .filter(F.pmod("frame_no", F.lit(every_n)) == 0)
    )
