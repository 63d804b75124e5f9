"""Fixture-format tests: parse the reference's own file shapes bit-for-bit
(SURVEY.md §5 'Fixture-format tests')."""

from __future__ import annotations

import os

from imgfact_spark.sources import (
    audit_missing_partitions,
    explode_manifest_images,
    read_aligned_source_prefix,
    read_crawl_manifest,
    read_entity_abstracts,
    read_rel2desc,
    read_scored_groundings,
    read_triples_tsv,
    write_tsv,
)


def test_triples_tsv_roundtrip_and_malformed(spark, tmp_path):
    p = tmp_path / "triples.tsv"
    p.write_text(
        "Bryan_Muir\tformerTeam\tTampa_Bay_Lightning\n"
        "short_line\n"
        "A\trel\tB\n"
        "only\ttwo\n"
    )
    df = read_triples_tsv(spark, str(p))
    rows = sorted(map(tuple, df.collect()))
    assert rows == [
        ("A", "rel", "B"),
        ("Bryan_Muir", "formerTeam", "Tampa_Bay_Lightning"),
    ]


def test_crawl_manifest_explode(spark, tmp_path):
    p = tmp_path / "record.txt"
    p.write_text("Bryan_Muir\tTampa_Bay\tformerTeam\t2\nA\tB\trel\t0\nbad\n")
    m = read_crawl_manifest(spark, str(p))
    assert m.count() == 2
    imgs = explode_manifest_images(m).collect()
    paths = sorted(r["pic_path"] for r in imgs)
    assert paths == [
        "Bryan Muir Tampa Bay/0.jpg",
        "Bryan Muir Tampa Bay/1.jpg",
    ]


def test_entity_abstracts(spark, tmp_path):
    p = tmp_path / "abs.tsv"
    p.write_text("EntA\tsome abstract text\nbadline\nEntB\tmore text\n")
    df = read_entity_abstracts(spark, str(p))
    assert df.count() == 2


def test_scored_groundings_both_shapes(spark, tmp_path):
    p5 = tmp_path / "g5.tsv"
    p5.write_text("rel\tS\tO\t3.jpg\t0.87\n")
    g5 = read_scored_groundings(spark, str(p5)).collect()[0]
    assert g5["score"] == 0.87 and g5["file"] == "3.jpg"
    p6 = tmp_path / "g6.tsv"
    p6.write_text("rel\tS\tO\t3.jpg\t0.91\t0.88\n")
    g6 = read_scored_groundings(spark, str(p6), per_entity=True).collect()[0]
    assert g6["score_s"] == 0.91 and g6["score_o"] == 0.88


def test_rel2desc_reference_fixture_shape(spark, tmp_path):
    # exact shape of the shipped fixture: empty middle field, 3 tab fields
    p = tmp_path / "rel2desc.txt"
    p.write_text(
        "fourthCommander\t\t{}'s fourth commander is {}.\n"
        "birthPlace\t\t{} was born in {}.\n"
    )
    df = read_rel2desc(spark, str(p))
    rows = {r["p"]: (r["template"], r["label"]) for r in df.collect()}
    assert rows["fourthCommander"][1] == "{}'s fourth commander is {}."
    assert rows["birthPlace"][1] == "{} was born in {}."


def test_aligned_source_prefix(spark, tmp_path):
    src = tmp_path / "data.source"
    pre = tmp_path / "data.prefix"
    src.write_text("A\trel\tB\nC\trel2\tD\n")
    pre.write_text(
        "Triplelist014/rel/A B/8.jpg\nTriplelist002/rel2/C D/1.jpg\n"
    )
    df = read_aligned_source_prefix(spark, str(src), str(pre))
    rows = {r["pos"]: (r["s"], r["img_path"]) for r in df.collect()}
    assert rows[0] == ("A", "Triplelist014/rel/A B/8.jpg")
    assert rows[1] == ("C", "Triplelist002/rel2/C D/1.jpg")


def test_write_tsv_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "x", "c1"), ("b", "y", "c2")], "k string, v string, chunk string"
    )
    out = str(tmp_path / "out")
    write_tsv(df, out, partition_by=["chunk"])
    assert os.path.isdir(os.path.join(out, "chunk=c1"))
    back = spark.read.option("sep", "\t").csv(out)
    assert back.count() == 2


def test_audit_missing_partitions(spark):
    expected = spark.createDataFrame([("c1",), ("c2",), ("c3",)], "chunk string")
    actual = spark.createDataFrame(
        [("c1", 1), ("c3", 2)], "chunk string, v int"
    )
    missing = audit_missing_partitions(expected, actual, ["chunk"]).collect()
    assert [r["chunk"] for r in missing] == ["c2"]


REF = "/root/reference/eval_and_app"


@__import__("pytest").mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not present"
)
def test_reads_actual_reference_fixtures(spark):
    """The readers ingest the reference repo's own shipped fixtures with the
    documented cardinalities (BASELINE.md): 142 relations, 12,005 aligned
    grounding rows, 21 id-mapped relations."""
    from imgfact_spark.sources import read_rel2id

    r2d = read_rel2desc(spark, f"{REF}/rel2desc.txt")
    assert r2d.count() == 142
    # every row carries a two-slot template in the third field
    assert (
        r2d.filter("label like '%{}%{}%'").count() == 142
    )

    r2i = read_rel2id(spark, f"{REF}/rel2id.json")
    assert r2i.count() == 21

    aligned = read_aligned_source_prefix(
        spark, f"{REF}/data.source", f"{REF}/data.prefix"
    )
    assert aligned.count() == 12005
    # alignment invariant: the image path's pair dir embeds the triple's
    # entities in underscore form (`.../Bryan_Muir Tampa_Bay_Lightning/8.jpg`)
    from pyspark.sql import functions as F

    mismatches = aligned.filter(
        ~F.col("img_path").contains(
            F.concat(F.lit("/"), F.col("s"), F.lit(" "), F.col("o"), F.lit("/"))
        )
    ).count()
    assert mismatches == 0

    triples = read_triples_tsv(spark, f"{REF}/data.source")
    assert triples.count() == 12005


def test_tfrecord_roundtrip_and_landing(spark, tmp_path):
    """S6: write CPgen-shaped tf.Example TFRecords with the pure-Python
    encoder, land them to parquet through the distributed reader, verify
    contents and crc checking."""
    from imgfact_spark.sources.tfrecord import (
        CPGEN_FEATURES,
        encode_example,
        iter_tfrecords,
        land_tfrecords_to_parquet,
        parse_example_bytes_features,
        write_tfrecord_file,
    )

    examples = [
        {
            "pos_sent": f"sentence {i}".encode(),
            "neg_sents": f"neg {i}|neg {i+1}".encode(),
            "pair": f"s{i}\to{i}".encode(),
            "relation": f"rel{i % 3}".encode(),
            "so": f"s{i} o{i}".encode(),
            "fileno": f"{i:03d}".encode(),
        }
        for i in range(25)
    ]
    f1 = str(tmp_path / "part-0.tfrecord")
    f2 = str(tmp_path / "part-1.tfrecord")
    write_tfrecord_file(f1, [encode_example(e) for e in examples[:13]])
    write_tfrecord_file(f2, [encode_example(e) for e in examples[13:]])

    # pure-python roundtrip (no Spark): framing + proto parse
    with open(f1, "rb") as fh:
        payloads = list(iter_tfrecords(fh.read()))
    assert len(payloads) == 13
    assert parse_example_bytes_features(payloads[0]) == examples[0]

    dest = str(tmp_path / "landed")
    landed = land_tfrecords_to_parquet(spark, str(tmp_path / "*.tfrecord"), dest)
    assert landed.count() == 25
    assert set(landed.columns) == {"file", "record_no"} | set(CPGEN_FEATURES)
    got = {r["fileno"]: r["pos_sent"] for r in landed.collect()}
    assert got["007"] == "sentence 7"

    # corruption is detected
    blob = bytearray(open(f1, "rb").read())
    blob[20] ^= 0xFF
    corrupt = str(tmp_path / "bad.tfrecord")
    open(corrupt, "wb").write(bytes(blob))
    import pytest as _pytest

    with _pytest.raises(Exception):
        list(iter_tfrecords(bytes(blob)))


def test_cluster_report_sink(spark, tmp_path):
    """S13: markdown gallery + stats artifact from representatives
    (cluster.py:108-128 shape)."""
    import numpy as np

    from imgfact_spark.operators.clustering import cluster_representatives
    from imgfact_spark.sources.report import write_cluster_report

    base_a, base_b = np.ones(4), np.array([-1.0, -1.0, 1.0, 1.0])
    g = spark.createDataFrame(
        [("A", "r", "B", m, s) for m, s in
         [("i0", 0.9), ("i1", 0.8), ("i2", 0.7)]],
        "s string, p string, o string, media_ref string, score double",
    )
    f = spark.createDataFrame(
        [("i0", [float(x) for x in base_a]),
         ("i1", [float(x) for x in base_a * 1.01]),
         ("i2", [float(x) for x in base_b])],
        "media_ref string, features array<float>",
    )
    kept = cluster_representatives(g, f, eps=0.25)
    paths = write_cluster_report(kept, str(tmp_path / "report"))
    gallery = open(paths["gallery"]).read()
    stats = open(paths["stats"]).read()
    assert "A\tr\tB" in gallery
    assert '<img src="i0" height="100"/>' in gallery
    assert '<img src="i2" height="100"/>' in gallery
    assert '<img src="i1"' not in gallery  # i1 clustered with i0, not kept
    assert "2 1" in stats  # n_clusters=2, deleted=1
    assert "avg_cluster_num: 2.0000 deleted: 1.0000" in stats


def test_jsonl_scan_and_json_sink_roundtrip(spark, tmp_path):
    """S5 (JSONL scan via native spark.read.json) + S14 (JSON dict sink via
    native df.write.json): write → read → contents identical."""
    import json as _json

    src = tmp_path / "in.jsonl"
    rows = [{"k": i, "name": f"e{i}", "score": i / 4.0} for i in range(50)]
    src.write_text("\n".join(_json.dumps(r) for r in rows))

    df = spark.read.json(str(src))
    assert df.count() == 50
    got = {r["k"]: (r["name"], r["score"]) for r in df.collect()}
    assert got[7] == ("e7", 1.75)

    out = str(tmp_path / "out_json")
    df.write.mode("overwrite").json(out)
    back = spark.read.json(out)
    assert sorted(map(tuple, back.select("k", "name", "score").collect())) == sorted(
        (r["k"], r["name"], r["score"]) for r in rows
    )
