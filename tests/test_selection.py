"""Token-budget selection: naive-twin equality, bucket-granularity
invariance, budget edges."""

from pyspark.sql import functions as F

from imgfact_spark.operators.selection import select_by_budget


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["id", "score", "toks"])


ROWS = [
    # score ties (same bucket AND same score → id tie-break), boundary
    # buckets, a zero-token doc, scores spanning bucket edges at 1 dp
    ("d01", 0.95, 120),
    ("d02", 0.95, 40),
    ("d03", 0.9301, 10),
    ("d04", 0.93, 300),
    ("d05", 0.77, 55),
    ("d06", 0.7699, 0),
    ("d07", 0.75, 80),
    ("d08", 0.5, 500),
    ("d09", 0.5, 1),
    ("d10", 0.12, 30),
]


def _naive(rows, budget, id_sorted=True):
    out, cum = [], 0
    for rid, score, toks in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += toks
        if cum > budget:
            break
        out.append((rid, cum))
    return sorted(out) if id_sorted else out


def _got(spark, rows, budget, **kw):
    df = select_by_budget(
        _mk(spark, rows), "score", "toks", "id", budget, **kw
    )
    return sorted((r["id"], r["cum_tokens"]) for r in df.collect())


def test_matches_naive_take_while(spark):
    for budget in (0, 5, 160, 170, 171, 525, 606, 607, 1100, 1200):
        assert _got(spark, ROWS, budget) == _naive(ROWS, budget), budget


def test_bucket_granularity_never_changes_result(spark):
    for d in (0, 1, 2, 6):
        assert _got(spark, ROWS, 606, bucket_decimals=d) == _naive(ROWS, 606), d


def test_huge_budget_keeps_everything_with_exact_total(spark):
    got = _got(spark, ROWS, 10**9)
    assert len(got) == len(ROWS)
    assert max(c for _, c in got) == sum(t for _, _, t in ROWS)


def test_naive_breaks_not_skips():
    # pin the take-while semantics the operator implements: a doc that
    # overflows the budget ENDS the prefix even though d06 (0 tokens,
    # lower score) would still "fit" — break, not skip
    assert _naive(ROWS, 169, id_sorted=False) == [("d01", 120), ("d02", 160)]
    # exactly-at-budget is included
    assert _naive(ROWS, 170, id_sorted=False) == [
        ("d01", 120),
        ("d02", 160),
        ("d03", 170),
    ]


def test_null_score_fails_stop_not_silent_drop(spark):
    """A NULL score would vanish in the bucket equi-join — the operator
    must raise at execution, never drop the row silently."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    rows = [("d01", 0.9, 10), ("d02", None, 20), ("d03", 0.5, 30)]
    df = spark.createDataFrame(rows, ["id", "score", "toks"])
    with pytest.raises(SparkRuntimeException, match="select_by_budget"):
        select_by_budget(df, "score", "toks", "id", 1000).collect()


def test_negative_scores_and_bucket_floor(spark):
    rows = [("a", -0.25, 5), ("b", -0.5, 7), ("c", 0.0, 3)]
    assert _got(spark, rows, 15) == _naive(rows, 15)


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

import hashlib
import math
import re

import pytest

from imgfact_spark.operators.selection import dsir_weights

B = 8192
ALPHA = 1.0

EN = [
    ("e1", "the cat sat on the mat"),
    ("e2", "the dog sat on the rug and the cat slept"),
    ("e3", "a cat and a dog sat in the sun"),
]
DE = [
    ("g1", "der hund lief durch den park"),
    ("g2", "die katze schlief auf dem sofa"),
]
EDGE = [
    ("x1", "one"),  # single token → no bigrams → (0, 0.0)
    ("x2", "  \t \n "),  # blank → (0, 0.0)
]
CORPUS = EN + DE + EDGE


def _toks(text):
    return re.sub(r"\s+", " ", text).strip().lower().split(" ")


def _bucket(w1, w2):
    h = hashlib.md5(f"dsir\x1f{w1}\x1f{w2}".encode()).hexdigest()
    return int(h[:15], 16) % B


def _doc_buckets(text):
    t = _toks(text)
    out = {}
    for w1, w2 in zip(t, t[1:]):
        b = _bucket(w1, w2)
        out[b] = out.get(b, 0) + 1
    return out


def _py_dsir(corpus, target):
    raw_b, tgt_b = {}, {}
    per_doc = {}
    for rid, text in corpus:
        d = _doc_buckets(text)
        per_doc[rid] = d
        for b, n in d.items():
            raw_b[b] = raw_b.get(b, 0) + n
    for _, text in target:
        for b, n in _doc_buckets(text).items():
            tgt_b[b] = tgt_b.get(b, 0) + n
    tr, tt = sum(raw_b.values()), sum(tgt_b.values())
    lr = {
        b: math.log((tgt_b.get(b, 0) + ALPHA) / (tt + ALPHA * B))
        - math.log((cr + ALPHA) / (tr + ALPHA * B))
        for b, cr in raw_b.items()
    }
    out = {}
    for rid, d in per_doc.items():
        w = 0.0
        for b in sorted(d):
            w = w + d[b] * lr[b]
        out[rid] = (sum(d.values()), math.floor(w * 1e6) / 1e6)
    return out


def _run_dsir(spark, corpus, target):
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    tgt = spark.createDataFrame(target, ["doc_id", "text"])
    rows = dsir_weights(df, "text", "doc_id", target=tgt).collect()
    return {r["doc_id"]: (r["n_features"], r["weight"]) for r in rows}


def test_dsir_matches_python_twin(spark):
    got = _py_dsir(CORPUS, EN)
    want = _run_dsir(spark, CORPUS, EN)
    assert set(got) == set(want)
    for rid in got:
        assert want[rid][0] == got[rid][0], rid
        assert want[rid][1] == pytest.approx(got[rid][1], rel=1e-9, abs=1e-12), rid


def test_dsir_target_like_docs_score_higher(spark):
    w = _run_dsir(spark, CORPUS, EN)
    en_mean = sum(w[r][1] for r, _ in EN) / len(EN)
    de_mean = sum(w[r][1] for r, _ in DE) / len(DE)
    assert en_mean > de_mean


def test_dsir_featureless_docs_get_zero(spark):
    w = _run_dsir(spark, CORPUS, EN)
    assert w["x1"] == (0, 0.0)
    assert w["x2"] == (0, 0.0)


def test_dsir_partitioning_invariance(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    tgt = df.filter(df.doc_id.startswith("e"))
    one = {
        r["doc_id"]: (r["n_features"], r["weight"])
        for r in dsir_weights(df.coalesce(1), "text", "doc_id", tgt).collect()
    }
    many = {
        r["doc_id"]: (r["n_features"], r["weight"])
        for r in dsir_weights(df.repartition(5), "text", "doc_id", tgt).collect()
    }
    assert one == many
