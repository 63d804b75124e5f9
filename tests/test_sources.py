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
