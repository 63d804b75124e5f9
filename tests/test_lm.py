"""Bigram-LM fluency scoring vs an independent single-process twin."""

from __future__ import annotations

import math
from collections import Counter

from imgfact_spark.operators.lm import bigram_lm_scores


def _twin(score_rows, train_rows=None, alpha=0.1):
    train_rows = score_rows if train_rows is None else train_rows

    def norm(text):
        return " ".join(text.split()).strip().lower().split(" ")

    uni, big = Counter(), Counter()
    for _, text in train_rows:
        t = norm(text)
        uni.update(t)
        big.update(zip(t, t[1:]))
    v = float(len(uni))
    out = {}
    for i, text in score_rows:
        t = norm(text)
        pairs = list(zip(t, t[1:]))
        if not pairs:
            out[i] = (0, 0.0)
            continue
        s = 0.0
        for p in pairs:  # position order — the pinned fold order
            s += math.log((big.get(p, 0) + alpha) / (uni.get(p[0], 0) + alpha * v))
        out[i] = (len(pairs), math.floor(s / len(pairs) * 1e6) / 1e6)
    return out


def _collect(df):
    return {r.doc_id: (r.n_bigrams, r.avg_logprob) for r in df.collect()}


def test_lm_scores_match_twin(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat again and again"),
        (3, "zyx qwv"),            # unseen-ish bigram
        (4, "single"),             # no bigrams
        (5, ""),                   # blank
        (6, "the  cat\tsat "),     # messy whitespace, shares bigrams with 1
        (7, "mat the on sat cat the"),  # same bag, different order
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _collect(bigram_lm_scores(df, "text", "doc_id"))
    assert got == _twin(rows)
    # (no typical-vs-gibberish assertion here: under SELF-training with a
    # tiny vocab, a rare context's small denominator can outweigh a common
    # bigram's count — the semantic property is pinned on the
    # separate-train corpus below, where it is well-defined)
    assert got[4] == (0, 0.0) and got[5] == (0, 0.0)  # <2-token docs
    # order sensitivity: same token bag, different bigrams, different score
    assert got[7] != got[1]


def test_lm_separate_train_corpus(spark):
    train = [(100, "alpha beta gamma alpha beta")]
    score = [(1, "alpha beta"), (2, "delta epsilon")]  # 2: fully unseen
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    got = _collect(bigram_lm_scores(sdf, "text", "doc_id", train_df=tdf))
    assert got == _twin(score, train)
    assert got[1][1] > got[2][1]  # in-domain text scores higher


def test_lm_partitioning_invariance(spark):
    rows = [(i, f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 7} common tail") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = _collect(bigram_lm_scores(df, "text", "doc_id"))
    b = _collect(bigram_lm_scores(df.repartition(13), "text", "doc_id"))
    assert a == b
