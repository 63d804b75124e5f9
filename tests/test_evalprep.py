"""Eval-prep (generate.sh tier) tests over pipeline output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imgfact_spark import evalprep, synth
from imgfact_spark.io import TableStore
from imgfact_spark.pipeline.runner import PipelineConfig, run_pipeline


@pytest.fixture(scope="module")
def kg(spark, tmp_path_factory):
    docs = synth.synth_documents(spark, 250)
    kb = synth.kb_df(spark)
    ents = kb.selectExpr("s as entity").union(kb.selectExpr("o as entity")).distinct()
    r2d = synth.rel2desc_df(spark)
    store = TableStore(str(tmp_path_factory.mktemp("ep")))
    res = run_pipeline(
        spark, docs, r2d, ents, store,
        PipelineConfig(checkpoint="final"), input_fingerprint="ep:250",
    )
    return res, r2d


def test_build_pairs_positions(spark, kg):
    res, _ = kg
    pairs = evalprep.build_pairs(res.kg_groundings)
    n = pairs.count()
    assert n > 0
    stats = pairs.agg(
        F.min("line_no").alias("lo"),
        F.max("line_no").alias("hi"),
        F.countDistinct("line_no").alias("d"),
    ).collect()[0]
    assert stats["lo"] == 0 and stats["hi"] == n - 1 and stats["d"] == n


def test_target_label_ids_dense(spark, kg):
    res, _ = kg
    pairs = evalprep.build_pairs(res.kg_groundings)
    labels = evalprep.target_label_ids(pairs)
    n = labels.count()
    stats = labels.agg(
        F.min("label_id").alias("lo"), F.max("label_id").alias("hi"),
        F.countDistinct("label_id").alias("d"),
    ).collect()[0]
    assert (stats["lo"], stats["hi"], stats["d"]) == (0, n - 1, n)


def test_masked_inputs_both_modes(spark, kg):
    res, r2d = kg
    pairs = evalprep.build_pairs(res.kg_groundings)
    for mode in ("s", "o"):
        mi = evalprep.masked_inputs(pairs, r2d, predict=mode)
        rows = mi.limit(20).collect()
        assert rows
        for r in rows:
            assert evalprep.MASK in r["input_text"]
            other = r["o"] if mode == "s" else r["s"]
            assert other.replace("_", " ") in r["input_text"]
            assert r["label_entity"] == (r["s"] if mode == "s" else r["o"])
            assert "{}" not in r["input_text"]


def test_split_balance_and_vocab_filter(spark, kg):
    res, r2d = kg
    pairs = evalprep.build_pairs(res.kg_groundings)
    sets = evalprep.split_sets(pairs)
    n = pairs.count()
    n_parts = {k: v.count() for k, v in sets.items()}
    assert sum(n_parts.values()) == n
    # disjoint
    assert sets["train"].join(sets["test"], ["s", "p", "o", "img_path"], "inner").count() == 0

    filtered = evalprep.train_vocab_filter(sets["test"], sets["train"], predict="o")
    train_o = {r["o"] for r in sets["train"].select("o").distinct().collect()}
    for r in filtered.select("o").distinct().collect():
        assert r["o"] in train_o

    balanced = evalprep.balance_by_relation(sets["train"])
    counts = [r["c"] for r in balanced.groupBy("p").agg(F.count("*").alias("c")).collect()]
    orig = [
        r["c"] for r in sets["train"].groupBy("p").agg(F.count("*").alias("c")).collect()
    ]
    # every class within 2x of the max after balancing (floor rounding)
    assert max(counts) / max(min(counts), 1) <= 2.5
    assert max(counts) <= 2 * max(orig)


def test_messy_variant_cross_cluster(spark, kg):
    res, _ = kg
    pairs = evalprep.build_pairs(res.kg_groundings)
    rel_cluster = spark.createDataFrame(
        [(p, i % 3) for i, p in enumerate(synth.RELATIONS)], "p string, cluster_id int"
    )
    messy = evalprep.messy_variant(pairs, rel_cluster)
    rows = messy.collect()
    assert len(rows) == pairs.count()
    swapped = sum(1 for r in rows if r["img_path"] != r["img_path_orig"])
    assert swapped > 0
