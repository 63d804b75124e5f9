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


def test_negative_scores_and_bucket_floor(spark):
    rows = [("a", -0.25, 5), ("b", -0.5, 7), ("c", 0.0, 3)]
    assert _got(spark, rows, 15) == _naive(rows, 15)
