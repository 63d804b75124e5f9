"""Readers/writers for the reference's own file formats, bit-compatible.

A user of the reference has on disk: DBpedia triple TSVs, crawl manifests
(`record.txt`), entity-abstract TSVs, scored grounding TSVs, the
rel2desc/rel2id dictionaries, and positionally-aligned
``data.source``/``data.prefix`` fixtures.  These readers land each of them
as a typed DataFrame with the same malformed-row semantics the reference
scripts apply (length-check drops), so existing data migrates unmodified.

All formats cited from /root/reference:
  * triples TSV      `s \t p \t o`               — relation_filtering/filter_tuples.py:14-21
  * crawl manifest   `s \t o \t rel \t count`    — entity_based_image_filtering/dataloading.py:14-26
  * abstracts        `entity \t abstract`        — entity_filtering/dataloading.py:34-44
  * scored grounding `p \t s \t o \t file \t score[ \t score2]`
                                                 — ptuningfilter.py:77 / ptuningfilter_ent.py:102
  * rel2desc.txt     `rel \t template \t label` (middle field empty in the
                     shipped fixture; 142 rows) — eval_and_app/prepare_data.py:21-25
  * rel2id.json      `{relation: id}`            — eval_and_app/rel2id.json
  * source/prefix    line-aligned triple ↔ image path
                                                 — eval_and_app/prepare_data.py:43-59
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from imgfact_spark.operators.zip_join import zip_join


def _read_tsv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return (
        spark.read.option("sep", "\t")
        .option("quote", "")
        .schema(schema)
        .csv(path)
    )


def read_triples_tsv(spark: SparkSession, path: str) -> DataFrame:
    """`s \t p \t o`; rows with <3 fields dropped
    (filter_tuples.py:19-21 ``len(line) < 3``)."""
    df = _read_tsv(spark, path, "s string, p string, o string")
    return df.filter(
        F.col("s").isNotNull() & F.col("p").isNotNull() & F.col("o").isNotNull()
    )


def read_crawl_manifest(spark: SparkSession, path: str) -> DataFrame:
    """record.txt: `s \t o \t rel \t img_count`; <4 fields dropped
    (entity_based_image_filtering/dataloading.py:17-20)."""
    df = _read_tsv(spark, path, "s string, o string, p string, img_count int")
    return df.filter(
        F.col("s").isNotNull()
        & F.col("o").isNotNull()
        & F.col("p").isNotNull()
        & F.col("img_count").isNotNull()
    )


def explode_manifest_images(manifest: DataFrame, chunk_dir: str = "") -> DataFrame:
    """S2: explode ``img_count`` → one row per image with the reference's
    path layout `<dir>/<s> <o>/<i>.jpg`
    (entity_based_image_filtering/dataloading.py:21-41)."""
    pair_dir = F.concat_ws(
        " ", F.translate("s", "_", " "), F.translate("o", "_", " ")
    )
    base = F.concat_ws("/", F.lit(chunk_dir), pair_dir) if chunk_dir else pair_dir
    return (
        manifest.filter(F.col("img_count") > 0)
        .select(
            "s",
            "o",
            "p",
            F.explode(F.sequence(F.lit(0), F.col("img_count") - 1)).alias("img_no"),
        )
        .withColumn(
            "pic_path",
            F.concat(base, F.lit("/"), F.col("img_no").cast("string"), F.lit(".jpg")),
        )
    )


def read_entity_abstracts(spark: SparkSession, path: str) -> DataFrame:
    """`entity \t abstract`; <2 fields dropped
    (entity_filtering/dataloading.py:16-18)."""
    df = _read_tsv(spark, path, "entity string, abstract string")
    return df.filter(F.col("entity").isNotNull() & F.col("abstract").isNotNull())


def read_scored_groundings(
    spark: SparkSession, path: str, per_entity: bool = False
) -> DataFrame:
    """Stage-output TSV: 5-col `p s o file score` (ptuningfilter.py:77) or
    the 6-col per-entity variant with two scores (ptuningfilter_ent.py:102)."""
    if per_entity:
        schema = "p string, s string, o string, file string, score_s double, score_o double"
    else:
        schema = "p string, s string, o string, file string, score double"
    return _read_tsv(spark, path, schema).filter(F.col("p").isNotNull())


def read_rel2desc(spark: SparkSession, path: str) -> DataFrame:
    """rel2desc.txt → (p, template, label); exactly the reference's
    three-way tab split (prepare_data.py:21-25).  In the shipped fixture the
    middle field is empty and the sentence template (two ``{}`` slots)
    rides in the third — both columns are surfaced so callers can
    ``coalesce(nullif(template, ''), label)``."""
    return _read_tsv(spark, path, "p string, template string, label string")


def read_rel2id(spark: SparkSession, path: str) -> DataFrame:
    """rel2id.json ({relation: id}) → (p, rel_id)."""
    import json

    with open(path) as f:
        d = json.load(f)
    return spark.createDataFrame(
        [(k, int(v)) for k, v in d.items()], "p string, rel_id int"
    )


def read_aligned_source_prefix(
    spark: SparkSession, source_path: str, prefix_path: str
) -> DataFrame:
    """data.source ↔ data.prefix positional alignment (J5): i-th triple line
    pairs with the i-th image-path line (prepare_data.py:43-59 ``zip``).

    Spark text sources don't preserve line order, so positions are minted
    from a monotonically increasing id per input order via the text reader's
    single-file guarantee: we read each file with ``wholetext=false`` and a
    window over a stable sort of (file offset) is unavailable — therefore
    this reader is for FIXTURE-SIZED files (it collects line numbers via
    zipWithIndex-free local read when small, else requires pre-indexed
    input).  Production data should carry explicit line_no columns
    (FIXTURES.md §8)."""
    import os

    if os.path.getsize(source_path) < 64 * 1024 * 1024:
        with open(source_path) as f:
            src_rows = [
                (i, *line.rstrip("\n").split("\t"))
                for i, line in enumerate(f)
                if line.strip()
            ]
        with open(prefix_path) as f:
            pre_rows = [
                (i, line.rstrip("\n")) for i, line in enumerate(f) if line.strip()
            ]
        src = spark.createDataFrame(
            [r for r in src_rows if len(r) == 4],
            "line_no long, s string, p string, o string",
        )
        pre = spark.createDataFrame(pre_rows, "line_no long, img_path string")
        return src.join(pre, "line_no", "inner").withColumnRenamed("line_no", "pos")
    raise ValueError(
        "large aligned files must be pre-indexed with explicit line_no "
        "(positional semantics cannot be recovered from a distributed scan)"
    )


def write_tsv(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Per-chunk TSV sink (S9-S11: inference.py:177-179,
    ptuningfilter.py:70-78) — tab-separated, no header, optionally
    partitioned (the reference's file-per-chunk layout)."""
    writer = df.write.mode("overwrite").option("sep", "\t")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.csv(path)


def audit_missing_partitions(
    expected_keys: DataFrame, actual: DataFrame, key_cols: list[str]
) -> DataFrame:
    """S1: the chunk-list scan's lostchunk audit
    (entity_filtering/dataloading.py:68-86): expected chunk ids with no data
    present → left-anti join against the scanned table's keys."""
    present = actual.select(*key_cols).distinct()
    return expected_keys.join(present, key_cols, "left_anti")
