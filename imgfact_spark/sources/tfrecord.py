"""S6: TFRecord source — land tf.Example records as a parquet stage table.

Reference: relation_based_image_filtering/CPgen.py:49-76 reads TFRecord
files of ``tf.Example`` protos with six string features (pos_sent,
neg_sents, pair, relation, so, fileno) through ``tf.data``.  This module
gives the same data a Spark-native landing path with NO TensorFlow or
protobuf dependency: both wire formats are public and tiny —

  * TFRecord framing: ``uint64le length | masked crc32c(length) |
    payload | masked crc32c(payload)`` per record;
  * ``tf.Example``: protobuf ``Example{ Features{ map<string, Feature> } }``
    where each Feature here is a BytesList — parsed with a minimal
    varint/length-delimited walker.

Scale note: a raw TFRecord file is not splittable without the index
sidecar, so parallelism = number of files (each is read whole via Spark's
``binaryFile`` source and decoded in an Arrow-batched ``mapInPandas``
kernel).  That matches the production shape — TFRecord datasets are
sharded into many ~100 MB files — and the landed parquet is splittable for
everything downstream.  On a cluster with jar management, the
``com.linkedin.sparktfrecord:spark-tfrecord`` connector is the drop-in
upgrade; this module exists so the engine has a dependency-free path.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# ------------------------------------------------------------------ crc32c

_CRC_TABLE = []


def _crc32c_table():
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78  # Castagnoli, reflected
        tbl = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tbl.append(c)
        _CRC_TABLE = tbl
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    tbl = _crc32c_table()
    crc = 0xFFFFFFFF
    for byte in data:
        crc = tbl[(crc ^ byte) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# ------------------------------------------------------- TFRecord framing


def iter_tfrecords(blob: bytes, verify: bool = True):
    """Yield record payloads from a TFRecord byte stream."""
    off, n = 0, len(blob)
    while off < n:
        if off + 12 > n:
            raise ValueError(f"truncated TFRecord header at offset {off}")
        (length,) = struct.unpack_from("<Q", blob, off)
        (len_crc,) = struct.unpack_from("<I", blob, off + 8)
        if verify and _masked_crc(blob[off : off + 8]) != len_crc:
            raise ValueError(f"length crc mismatch at offset {off}")
        start = off + 12
        end = start + length
        if end + 4 > n:
            raise ValueError(f"truncated TFRecord payload at offset {off}")
        payload = blob[start:end]
        (data_crc,) = struct.unpack_from("<I", blob, end)
        if verify and _masked_crc(payload) != data_crc:
            raise ValueError(f"payload crc mismatch at offset {off}")
        yield payload
        off = end + 4


def write_tfrecord_file(path: str, payloads: list[bytes]) -> None:
    """Write raw payloads as a TFRecord file (fixture/export utility)."""
    with open(path, "wb") as f:
        for p in payloads:
            header = struct.pack("<Q", len(p))
            f.write(header)
            f.write(struct.pack("<I", _masked_crc(header)))
            f.write(p)
            f.write(struct.pack("<I", _masked_crc(p)))


# ------------------------------------------------- minimal proto walking


def _read_varint(buf: bytes, off: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[off]
        off += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, off
        shift += 7


def _iter_fields(buf: bytes):
    """Yield (field_no, wire_type, value) over a protobuf message body.
    Only wire types 0 (varint) and 2 (length-delimited) occur in
    Example/Features/Feature/BytesList."""
    off = 0
    while off < len(buf):
        tag, off = _read_varint(buf, off)
        field_no, wire = tag >> 3, tag & 7
        if wire == 0:
            val, off = _read_varint(buf, off)
        elif wire == 2:
            ln, off = _read_varint(buf, off)
            val = buf[off : off + ln]
            off += ln
        elif wire == 5:
            val = buf[off : off + 4]
            off += 4
        elif wire == 1:
            val = buf[off : off + 8]
            off += 8
        else:  # pragma: no cover - groups are long-deprecated
            raise ValueError(f"unsupported wire type {wire}")
        yield field_no, wire, val


def parse_example_bytes_features(record: bytes) -> dict[str, bytes]:
    """tf.Example → {feature_name: first BytesList value}.

    Example.features = field 1; Features.feature (map) = field 1 as
    repeated (key=1, value=2) entries; Feature.bytes_list = field 1;
    BytesList.value = repeated field 1.
    """
    out: dict[str, bytes] = {}
    for fno, _, features in _iter_fields(record):
        if fno != 1:
            continue
        for eno, _, entry in _iter_fields(features):
            if eno != 1:
                continue
            key = val = None
            for kno, _, v in _iter_fields(entry):
                if kno == 1:
                    key = v.decode("utf-8")
                elif kno == 2:
                    for tno, _, kind in _iter_fields(v):
                        if tno == 1:  # bytes_list
                            for vno, _, bv in _iter_fields(kind):
                                if vno == 1 and val is None:
                                    val = bv
            if key is not None and val is not None:
                out[key] = val
    return out


def encode_example(features: dict[str, bytes]) -> bytes:
    """Inverse of parse_example_bytes_features (fixture/export utility)."""

    def _varint(v: int) -> bytes:
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    def _ld(field_no: int, payload: bytes) -> bytes:
        return bytes([(field_no << 3) | 2]) + _varint(len(payload)) + payload

    entries = b""
    for key, val in features.items():
        bytes_list = _ld(1, val)
        feature = _ld(1, bytes_list)
        entry = _ld(1, key.encode("utf-8")) + _ld(2, feature)
        entries += _ld(1, entry)
    return _ld(1, entries)  # Example.features


# ------------------------------------------------------------ Spark tier


def read_tfrecord_examples(
    spark: SparkSession,
    path: str,
    feature_names: list[str],
    verify: bool = True,
) -> DataFrame:
    """Distributed TFRecord→rows: one row per tf.Example with the given
    BytesList features decoded as strings, plus (file, record_no) lineage.

    Parallelism = file count (whole-file reads; see module docstring)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    fields = ", ".join(f"{n} string" for n in feature_names)
    schema = f"file string, record_no long, {fields}"

    def decode(batches):
        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                for i, rec in enumerate(iter_tfrecords(bytes(blob), verify)):
                    feats = parse_example_bytes_features(rec)
                    rows.append(
                        [fpath, i]
                        + [
                            feats.get(n, b"").decode("utf-8", "replace")
                            for n in feature_names
                        ]
                    )
            yield pd.DataFrame(
                rows, columns=["file", "record_no"] + list(feature_names)
            )

    return files.mapInPandas(decode, schema=schema)


CPGEN_FEATURES = ["pos_sent", "neg_sents", "pair", "relation", "so", "fileno"]


def land_tfrecords_to_parquet(
    spark: SparkSession,
    src_glob: str,
    dest: str,
    feature_names: list[str] | None = None,
) -> DataFrame:
    """Land CPgen-style TFRecords (CPgen.py:49-76 feature spec by default)
    as a splittable parquet table; returns the re-read DataFrame."""
    df = read_tfrecord_examples(spark, src_glob, feature_names or CPGEN_FEATURES)
    df.write.mode("overwrite").parquet(dest)
    return spark.read.parquet(dest)
