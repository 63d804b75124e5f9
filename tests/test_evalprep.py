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


def test_diff_image_partner_constraint(spark):
    """J8 pop semantics (without replacement): each group's images are
    PERMUTED — every image given away exactly once — crossing the
    differ-class boundary wherever the pigeonhole allows; lone rows keep
    their own image."""
    rows = [
        ("r1", "a", "x", "i1"), ("r1", "b", "y", "i2"), ("r1", "a", "x", "i3"),
        ("r2", "c", "z", "i4"),  # lone row in its group → self
    ]
    pairs = spark.createDataFrame(rows, "p string, s string, o string, img_path string")
    out = evalprep.diff_image_partner(
        pairs, group_col="p", differ_cols=("s", "o")
    ).collect()
    got = {r["img_path_orig"]: r for r in out}
    assert got["i4"]["img_path"] == "i4"  # no partner
    # bijective within the group: assigned images == original images
    assert sorted(got[i]["img_path"] for i in ("i1", "i2", "i3")) == ["i1", "i2", "i3"]
    # i2 (the lone (b,y) row) must receive an (a,x) image
    assert got["i2"]["img_path"] in ("i1", "i3")
    # the big class (a,x) has m=2 > n/2=1.5 → exactly 2m-n = 1 of its rows
    # is pigeonhole-forced to a same-class image; the other crosses to i2
    ax_targets = {got["i1"]["img_path"], got["i3"]["img_path"]}
    assert "i2" in ax_targets
    assert len(ax_targets & {"i1", "i3"}) == 1


def test_diff_image_partner_bijective_balanced(spark):
    """When no class exceeds half the group, EVERY row crosses classes and
    the assignment is still a permutation."""
    rows = [("g", s, "x", f"i{j}") for j, s in enumerate(["a", "a", "b", "b", "c", "c"])]
    pairs = spark.createDataFrame(rows, "p string, s string, o string, img_path string")
    out = evalprep.diff_image_partner(
        pairs, group_col="p", differ_cols=("s",), img_col="img_path"
    ).collect()
    orig_class = {f"i{j}": s for j, s in enumerate(["a", "a", "b", "b", "c", "c"])}
    assert sorted(r["img_path"] for r in out) == sorted(r["img_path_orig"] for r in out)
    for r in out:
        assert orig_class[r["img_path"]] != r["s"], (
            f"{r['img_path_orig']} got same-class image {r['img_path']}"
        )


def test_build_eval_namespace_full_matrix(spark, kg):
    """All 9 generate.sh products exist with the right shapes (README.md:
    158-160; generate.sh:1-15)."""
    res, _ = kg
    pairs = evalprep.build_pairs(res.kg_groundings)
    r2d = synth.rel2desc_df(spark)
    rel_cluster = spark.createDataFrame(
        [(p, i % 3) for i, p in enumerate(synth.RELATIONS)], "p string, cluster_id int"
    )
    blacklist = (synth.RELATIONS[0],)
    ns = evalprep.build_eval_namespace(
        pairs, r2d, rel_cluster, predict_p_blacklist=blacklist
    )
    assert set(ns) == {
        "predict_s/spo", "predict_s/messy",
        "predict_o/spo", "predict_o/messy", "predict_o/p",
        "predict_p/spo", "predict_p/messy", "predict_p/s", "predict_p/o",
    }
    # masked slots
    assert ns["predict_s/spo"].filter("input_text NOT LIKE '%[MASK]%'").count() == 0
    assert ns["predict_o/spo"].filter("input_text NOT LIKE '%[MASK]%'").count() == 0
    # predict_p drops blacklisted relations and carries dense label ids
    for name in ("predict_p/spo", "predict_p/s", "predict_p/o"):
        df = ns[name]
        assert df.filter(F.col("p").isin(*blacklist)).count() == 0
        assert "label_id" in df.columns
    ids = sorted(r["label_id"] for r in ns["predict_p/s"].select("label_id").distinct().collect())
    assert ids == list(range(len(ids)))  # dense 0..n-1
    # diff-image products keep row count and carry provenance
    assert ns["predict_o/p"].count() == pairs.count()
    assert "img_path_orig" in ns["predict_p/s"].columns


def test_split_sets_degenerate_weights(spark):
    """Cumulative weight 1.0 must not invert the threshold comparison: with
    a zero test weight no row may land in test (the 16-char threshold
    string bug)."""
    rows = [(f"s{i}", "p", f"o{i}", f"img{i}") for i in range(64)]
    pairs = spark.createDataFrame(rows, "s string, p string, o string, img_path string")
    sets = evalprep.split_sets(pairs, weights=(0.8, 0.2, 0.0))
    counts = {k: v.count() for k, v in sets.items()}
    assert counts["test"] == 0
    assert counts["train"] + counts["dev"] == 64
    sets_all_train = evalprep.split_sets(pairs, weights=(1.0, 0.0, 0.0))
    assert sets_all_train["train"].count() == 64
