"""Storage layer: checkpointed stage tables with per-partition lineage.

Production target is Iceberg (``spark.sql.catalog.*`` configured, writes via
``df.writeTo(table).append()`` with a partition spec).  This sandbox has no
Iceberg runtime jar and no network, so the same API falls back to partitioned
parquet + a JSON metadata sidecar; the calling code is identical either way
(BASELINE.json north rule: checkpoint-resumable stages, per-partition lineage).

Resume semantics mirror the reference's skip-finished-chunks loop
(dataset_construction/entity_filtering/inference.py:139-143): a stage whose
commit marker exists and whose input fingerprint matches is skipped and its
table is read back instead of recomputed.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MARKER = "_COMMITTED.json"


@dataclass
class TableStore:
    """A warehouse directory of named stage tables."""

    root: str
    catalog_table_prefix: str | None = None  # set → Iceberg writeTo path
    _spark: SparkSession | None = field(default=None, repr=False)

    def __post_init__(self) -> None:
        os.makedirs(self.root, exist_ok=True)

    # ------------------------------------------------------------------ paths
    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _marker_path(self, name: str) -> str:
        return os.path.join(self.path(name), _MARKER)

    def _heal(self, name: str) -> None:
        """Recover from a crash mid :func:`compact_table` swap.  The swap
        sets the live table aside at ``<src>._old`` before renaming the
        compacted copy (marker already inside it) into place, so a hard
        crash leaves exactly one of two states: (a) live dir missing or
        marker-less while the set-aside copy holds the marker — the swap
        never committed, restore the original; (b) live dir committed and
        the set-aside copy still present — the swap completed, the copy is
        leftover garbage."""
        src = self.path(name)
        old = src + "._old"
        if not os.path.isdir(old):
            return
        if os.path.exists(self._marker_path(name)):
            shutil.rmtree(old, ignore_errors=True)
            return
        if os.path.exists(os.path.join(old, _MARKER)):
            shutil.rmtree(src, ignore_errors=True)
            os.rename(old, src)
            shutil.rmtree(src + "._compact", ignore_errors=True)

    # --------------------------------------------------------------- metadata
    def is_committed(self, name: str, input_fingerprint: str | None = None) -> bool:
        self._heal(name)
        mp = self._marker_path(name)
        if not os.path.exists(mp):
            return False
        if input_fingerprint is None:
            return True
        with open(mp) as f:
            meta = json.load(f)
        return meta.get("input_fingerprint") == input_fingerprint

    def lineage(self, name: str) -> dict:
        self._heal(name)
        with open(self._marker_path(name)) as f:
            return json.load(f)

    # ------------------------------------------------------------------ write
    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        input_fingerprint: str | None = None,
        mode: str = "overwrite",
        stats: bool = True,
    ) -> DataFrame:
        """Write a stage table + commit marker with per-partition row counts.

        With ``catalog_table_prefix`` set (e.g. ``"iceberg.kg"``) the write
        goes through the catalog as an Iceberg table
        (``df.writeTo(...).partitionedBy(...).createOrReplace()``) and
        lineage additionally lands in the sidecar; the parquet fallback
        keeps identical semantics for sandboxes without an Iceberg runtime.
        """
        if self.catalog_table_prefix:
            return self._write_catalog(
                df, name, partition_by, input_fingerprint, stats
            )
        target = self.path(name)
        if partition_by:
            # co-locate each output partition in one task: without this a
            # partitioned write fans out |shuffle partitions| × |values|
            # small files (the classic small-files trap; at scale, also the
            # difference between 30 and 30,000 S3 puts per commit).
            df = df.repartition(*[F.col(c) for c in partition_by])
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)

        spark = df.sparkSession
        # explicit schema: an empty write leaves no data files to infer
        # from, and skipping inference avoids a footer-read job besides
        written = spark.read.schema(df.schema).parquet(target)
        if not stats:
            total, partitions = -1, []
        elif partition_by:
            part_counts = (
                written.groupBy(*partition_by)
                .count()
                .collect()
            )
            partitions = [
                {**{k: r[k] for k in partition_by}, "rows": r["count"]}
                for r in part_counts
            ]
            total = sum(p["rows"] for p in partitions)
        else:
            total = written.count()
            partitions = [{"rows": total}]

        meta = {
            "table": name,
            "rows": total,
            "partition_by": partition_by or [],
            "partitions": partitions,
            "input_fingerprint": input_fingerprint,
            "committed_at": time.time(),
            "schema": written.schema.jsonValue(),
        }
        with open(self._marker_path(name), "w") as f:
            json.dump(meta, f)
        return written

    def _write_catalog(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None,
        input_fingerprint: str | None,
        stats: bool,
    ) -> DataFrame:
        """Iceberg-catalog write path (production; requires the runtime jar
        + a configured ``spark.sql.catalog.*``)."""
        table = f"{self.catalog_table_prefix}.{name}"
        writer = df.writeTo(table)
        if partition_by:
            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()
        spark = df.sparkSession
        written = spark.read.table(table)
        total = written.count() if stats else -1
        meta = {
            "table": name,
            "catalog_table": table,
            "rows": total,
            "partition_by": partition_by or [],
            "partitions": [],
            "input_fingerprint": input_fingerprint,
            "committed_at": time.time(),
            "schema": written.schema.jsonValue(),
        }
        os.makedirs(self.path(name), exist_ok=True)
        with open(self._marker_path(name), "w") as f:
            json.dump(meta, f)
        return written

    # ------------------------------------------------------------------- read
    def read(self, spark: SparkSession, name: str) -> DataFrame:
        if self.catalog_table_prefix:
            return spark.read.table(f"{self.catalog_table_prefix}.{name}")
        self._heal(name)
        mp = self._marker_path(name)
        if os.path.exists(mp):
            # committed schema → no inference, and empty tables read fine
            from pyspark.sql.types import StructType

            with open(mp) as f:
                schema = StructType.fromJson(json.load(f)["schema"])
            return spark.read.schema(schema).parquet(self.path(name))
        return spark.read.parquet(self.path(name))

    def drop(self, name: str) -> None:
        shutil.rmtree(self.path(name), ignore_errors=True)

    # --------------------------------------------------------------- lineage df
    def lineage_df(self, spark: SparkSession) -> DataFrame:
        """All stage commit markers as a DataFrame (the `_lineage` table)."""
        rows = []
        for name in sorted(os.listdir(self.root)):
            mp = self._marker_path(name)
            if os.path.exists(mp):
                with open(mp) as f:
                    meta = json.load(f)
                rows.append(
                    (
                        meta["table"],
                        int(meta["rows"]),
                        json.dumps(meta["partitions"]),
                        meta.get("input_fingerprint"),
                        float(meta["committed_at"]),
                    )
                )
        return spark.createDataFrame(
            rows, "table string, rows long, partitions string, input_fingerprint string, committed_at double"
        )


def stage(
    store: TableStore,
    name: str,
    input_fingerprint: str | None,
    compute,
    spark: SparkSession,
    partition_by: list[str] | None = None,
    stats: bool = True,
) -> DataFrame:
    """Checkpoint-or-compute a pipeline stage.

    ``compute`` is a zero-arg callable returning a DataFrame; it only runs if
    the stage is not already committed for this input fingerprint.
    """
    if store.is_committed(name, input_fingerprint):
        return store.read(spark, name)
    df = compute()
    return store.write(
        df, name, partition_by=partition_by, input_fingerprint=input_fingerprint,
        stats=stats,
    )


def fingerprint_df(df: DataFrame, cols: list[str] | None = None) -> str:
    """Order-insensitive content fingerprint of a DataFrame.

    Combines three order-insensitive aggregates over the row hash: count,
    bit_xor, and a wide-decimal SUM.  xor alone cancels duplicate rows
    pairwise ({A,A,A,B} == {A,B,B,B}); the multiplicity-sensitive sum
    (exact in decimal(38,0), order-independent, ANSI-safe — no overflow
    below ~10^19 rows) breaks that collision class.

    Used as the stage input fingerprint for resume-equivalence: same input →
    same fingerprint regardless of partitioning/order.
    """
    cs = cols or df.columns
    row = (
        df.select(F.xxhash64(*[F.col(c).cast("string") for c in cs]).alias("h"))
        .agg(
            F.expr("bit_xor(h)").alias("x"),
            F.count("*").alias("n"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
        )
        .collect()[0]
    )
    return f"{row['n']}:{row['x']}:{row['s']}"


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Write a bucketed managed table (Hive-style bucketing, S4/§4 scale
    lever): two tables bucketed on the same key with the same bucket count
    join WITHOUT either side shuffling — the co-located join strategy for
    repeatedly-joined big tables (fact↔fact grounding joins at corpus
    scale, where re-shuffling per query dwarfs the one-time bucketed
    write).

    Uses ``bucketBy().sortBy().saveAsTable`` (bucketing requires a managed
    table; the session's warehouse dir is a temp path).  Returns the
    re-read table."""
    spark = df.sparkSession
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)
    return spark.table(table)


def compact_table(
    store: TableStore,
    spark: SparkSession,
    name: str,
    target_file_mb: int = 128,
) -> DataFrame:
    """Rewrite a committed stage table into ~``target_file_mb`` files —
    the small-files repair every long-running lakehouse pipeline needs
    (streaming appends and fine-grained partitioned writes accumulate tiny
    files; at object-store scale each file is a request and a task).

    File count is sized from the CURRENT on-disk bytes; partitioned tables
    keep their partition columns (repartition by them, so each partition
    stays one-task-co-located).  The rewrite goes to a sibling directory
    and is swapped in with a rename; the commit marker (fingerprint,
    lineage) is preserved with a refreshed timestamp.
    """
    import math

    meta = store.lineage(name)
    src = store.path(name)
    part_by = meta.get("partition_by") or []

    total_bytes = 0
    for dirpath, _, files in os.walk(src):
        for fn in files:
            if fn.endswith(".parquet"):
                total_bytes += os.path.getsize(os.path.join(dirpath, fn))
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))

    df = store.read(spark, name)
    if part_by:
        out = df.repartition(*[F.col(c) for c in part_by])
    else:
        out = df.repartition(n_files)
    tmp = src + "._compact"
    shutil.rmtree(tmp, ignore_errors=True)
    writer = out.write.mode("overwrite")
    if part_by:
        writer = writer.partitionBy(*part_by)
    writer.parquet(tmp)

    # the refreshed marker goes INTO the compacted copy before the swap:
    # whichever directory ends up live after a crash carries its own marker,
    # and TableStore._heal resolves the two possible half-swapped states
    # (live dir marker-less/missing → restore ._old; both present → drop
    # the ._old leftover).  Underscore-prefixed files are invisible to the
    # parquet reader, so the marker rides along harmlessly.
    meta["committed_at"] = time.time()
    with open(os.path.join(tmp, _MARKER), "w") as f:
        json.dump(meta, f)

    # atomic swap: never a moment where the committed table is deleted but
    # the compacted copy not yet in place (rmtree-then-rename left a crash
    # window that lost the table while the marker still pointed at it)
    old = src + "._old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(src, old)
    try:
        os.rename(tmp, src)
    except OSError:
        os.rename(old, src)  # roll back: the original table stays live
        raise
    shutil.rmtree(old)
    return store.read(spark, name)
