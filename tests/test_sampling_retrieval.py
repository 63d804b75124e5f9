"""Sampling + BM25 operators vs independent python oracles."""

from __future__ import annotations

import hashlib
import math

import pytest

from imgfact_spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_queries,
    tfidf_keywords,
)
from imgfact_spark.operators.sampling import (
    sample_global,
    sample_mixture,
    sample_stratified,
    sample_weighted,
)


def _md5key(seed, *parts) -> int:
    joined = "\x1f".join([str(seed)] + [str(p) for p in parts])
    return int(hashlib.md5(joined.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, f"lang{i % 3}", (i * 37) % 100 + 1,
         " ".join(f"w{(i * 7 + j * 13) % 23}" for j in range(5 + i % 9)))
        for i in range(300)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, weight long, text string"
    )


def test_sample_global_matches_md5_order(corpus):
    got = [r.doc_id for r in sample_global(corpus, 17, seed=5).collect()]
    want = sorted(range(300), key=lambda i: (_md5key(5, i), i))[:17]
    assert got == want


def test_sample_stratified_counts_and_determinism(corpus):
    out = sample_stratified(corpus, ["lang"], k=8, seed=9)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.lang, []).append((r.sample_rank, r.doc_id))
    assert set(per) == {"lang0", "lang1", "lang2"}
    assert all(len(v) == 8 for v in per.values())
    # ranks are 1..k by ascending md5 key — reproduce with hashlib
    for lang, pairs in per.items():
        ids = [i for i in range(300) if f"lang{i % 3}" == lang]
        want = sorted(ids, key=lambda i: (_md5key(9, i, lang), i))[:8]
        assert [d for _, d in sorted(pairs)] == want
    # partitioning invariance
    again = sample_stratified(
        corpus.repartition(13), ["lang"], k=8, seed=9
    ).collect()
    assert sorted((r.lang, r.doc_id, r.sample_rank) for r in again) == sorted(
        (r.lang, r.doc_id, r.sample_rank) for r in rows
    )


def test_sample_weighted_matches_ares_oracle(corpus):
    rows = sample_weighted(corpus, 11, seed=3, weight_col="weight").collect()
    got = [r.doc_id for r in rows]

    def key(i):
        u = (_md5key(3, i) + 1) / float(1 << 60)
        raw = -math.log(u) / ((i * 37) % 100 + 1)
        return math.floor(min(raw, 9.0e9) * 1e9)  # the engine-stable rank key

    want = sorted(range(300), key=lambda i: (key(i), i))[:11]
    assert got == want
    # emitted sample_key IS the selection key (÷1e9) — one quantity
    assert [r.sample_key for r in rows] == [key(i) / 1e9 for i in want]


def test_sample_weighted_prefers_heavy_rows(spark):
    # two weight classes 1 vs 50: the heavy half must dominate the sample
    rows = [(i, 50 if i < 500 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    picked = sample_weighted(df, 100, seed=1, weight_col="w").collect()
    heavy = sum(1 for r in picked if r.doc_id < 500)
    assert heavy > 85


def _mix_twin(rows, weights, budget, seed):
    """Single-process twin of sample_mixture's membership rule."""
    from collections import Counter

    n = Counter(src for _, src in rows)
    span = 1 << 60
    kept = set()
    for i, src in rows:
        if src not in weights:
            continue
        rate = min(1.0, float(budget) * weights[src] / float(n[src]))
        if _md5key(seed, i) < int(rate * span):
            kept.add(i)
    return kept


def test_sample_mixture_matches_twin_and_caps(spark):
    rows = [(i, f"s{i % 4}") for i in range(400)]  # 100 per source
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"s0": 0.1, "s1": 0.3, "s3": 0.6}  # s2 absent → dropped
    got = sample_mixture(df, "source", weights, budget=120, seed=9).collect()
    assert {r.doc_id for r in got} == _mix_twin(rows, weights, 120, 9)
    by_src = {}
    for r in got:
        by_src.setdefault(r.source, 0)
        by_src[r.source] += 1
    assert "s2" not in by_src
    # s3's rate caps at 1 (120·0.6 = 72 < 100 → no cap here; push it)
    got2 = sample_mixture(df, "source", weights, budget=300, seed=9).collect()
    n2 = sum(1 for r in got2 if r.source == "s3")
    assert n2 == 100, "rate ≥ 1 must keep the whole slice"
    # draw values are the engine-stable unit-interval key
    for r in got:
        assert 0.0 <= r.mix_u < 1.0


def test_sample_mixture_monotone_in_budget(spark):
    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = {"s0": 0.5, "s1": 0.3, "s2": 0.2}
    small = {r.doc_id for r in sample_mixture(df, "source", w, 60, seed=4).collect()}
    big = {r.doc_id for r in sample_mixture(df, "source", w, 150, seed=4).collect()}
    assert small <= big, "growing the budget must never evict selected docs"
    assert len(big) > len(small)


def test_bm25_matches_pandas_oracle(corpus):
    q = ["w1", "w5", "w12"]
    got = {r.doc_id: r.score for r in bm25_topk(corpus, q, k=15).collect()}

    rows = corpus.select("doc_id", "text").collect()
    docs = {r.doc_id: r.text.split(" ") for r in rows}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfreq = {
        t: sum(1 for toks in docs.values() if t in toks) for t in q
    }
    k1, b = 1.2, 0.75
    scores = {}
    for d, toks in docs.items():
        s = 0.0
        for t in sorted(q):
            tf = toks.count(t)
            if tf == 0 or dfreq[t] == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s > 0:
            scores[d] = math.floor(s * 1e6) / 1e6
    want = dict(sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:15])
    assert got == pytest.approx(want, abs=2e-6)
    assert set(got) == set(want)


def test_tfidf_keywords_matches_pandas_oracle(corpus):
    from collections import Counter

    got = [
        (r.doc_id, r.term, r.tf, r.dfreq, r.score, r.rank)
        for r in tfidf_keywords(corpus, k=3, min_term_len=2)
        .orderBy("doc_id", "rank")
        .collect()
    ]

    rows = corpus.select("doc_id", "text").collect()
    docs = {
        r.doc_id: [t for t in r.text.lower().split(" ") if len(t) >= 2]
        for r in rows
    }
    n = len(docs)
    dfreq = Counter(t for toks in docs.values() for t in set(toks))
    want = []
    for d in sorted(docs):
        tf = Counter(docs[d])
        scored = sorted(
            (
                (t, c, dfreq[t], math.floor(c * math.log(n / dfreq[t]) * 1e6) / 1e6)
                for t, c in tf.items()
            ),
            key=lambda x: (-x[3], x[0]),
        )[:3]
        want += [(d, t, c, df_, s, i + 1) for i, (t, c, df_, s) in enumerate(scored)]
    assert got == want


def test_tfidf_rare_term_tops_common(spark):
    # a term appearing in one doc must outscore the everywhere-term
    rows = [(0, "rare common filler")] + [
        (i, "common filler extra") for i in range(1, 30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = tfidf_keywords(df, k=1).filter("doc_id = 0").collect()
    assert top[0].term == "rare" and top[0].dfreq == 1


def test_bm25_rare_term_outranks_common(spark):
    # one doc holds the rare term; it must rank first for that query
    rows = [(0, "rare common common")] + [(i, "common common common") for i in range(1, 50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25_topk(df, ["rare", "common"], k=3).collect()
    assert top[0].doc_id == 0


def test_bm25_queries_matches_single_query_operator(corpus, spark):
    """Each query's top-k from the query-relation operator == the literal
    single-query operator run per query (scores and membership)."""
    bags = {1: ["w1", "w5"], 2: ["w12", "w3", "w7"], 3: [" W1 ", "w1", "w20"]}
    qdf = spark.createDataFrame(
        [(qid, terms) for qid, terms in bags.items()],
        "query_id long, terms array<string>",
    )
    multi = bm25_topk_queries(corpus, qdf, k=8)
    got = {}
    for r in multi.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    assert set(got) == set(bags)
    for qid, terms in bags.items():
        want = [
            (i + 1, r.doc_id, r.score)
            for i, r in enumerate(bm25_topk(corpus, terms, k=8).collect())
        ]
        assert sorted(got[qid]) == want, f"query {qid}"


def test_bm25_queries_degenerate(spark, corpus):
    empty_q = spark.createDataFrame([], "query_id long, terms array<string>")
    assert bm25_topk_queries(corpus, empty_q, k=5).count() == 0
    no_hit = spark.createDataFrame(
        [(1, ["zzzz"])], "query_id long, terms array<string>"
    )
    assert bm25_topk_queries(corpus, no_hit, k=5).count() == 0


def test_bm25_normalizes_query_terms(spark):
    # raw entity-cased / padded terms must match the lowercased corpus tokens
    df = spark.createDataFrame(
        [(1, "Spark joins data"), (2, "flink streams data")],
        "doc_id long, text string",
    )
    top = bm25_topk(df, ["Spark"], k=5).collect()
    assert [r.doc_id for r in top] == [1]
    same = bm25_topk(df, [" spark ", "spark", ""], k=5).collect()
    assert [(r.doc_id, r.score) for r in same] == [(r.doc_id, r.score) for r in top]


def test_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "doc_id long, lang string, weight long, text string")
    assert bm25_topk(empty, ["x"], k=5).count() == 0
    assert sample_global(empty, 5, seed=1).count() == 0
    assert sample_stratified(empty, ["lang"], k=5, seed=1).count() == 0
    assert sample_weighted(empty, 5, seed=1, weight_col="weight").count() == 0

    tiny = spark.createDataFrame(
        [(1, "a", 2, "hello world"), (2, "a", 0, "hello there")],
        "doc_id long, lang string, weight long, text string",
    )
    # query with no corpus hits -> empty result, not an error
    assert bm25_topk(tiny, ["zzz"], k=5).count() == 0
    # k larger than the population / stratum -> everything, once
    assert sample_global(tiny, 100, seed=1).count() == 2
    assert sample_stratified(tiny, ["lang"], k=100, seed=1).count() == 2
    # zero-weight rows are never drawn
    picked = sample_weighted(tiny, 100, seed=1, weight_col="weight").collect()
    assert [r.doc_id for r in picked] == [1]


# ------------------------------------------------------- inverted index


def _py_index(rows, segment_size, min_df=1, seed="idx"):
    """Plain-Python twin of inverted_index(hash_mode='md5') — the md5 key
    goes through the SAME _md5key helper as every other sampling twin so
    the engine-portable hash contract lives in one place."""
    from collections import Counter

    tf = Counter()
    for doc, text in rows:
        toks = [t for t in " ".join(text.split()).lower().split(" ") if t]
        for t in toks:
            tf[(t, str(doc))] += 1
    df = Counter(t for t, _ in tf)
    out = {}
    for (term, doc), n in tf.items():
        if df[term] < min_df:
            continue
        nseg = math.ceil(df[term] / segment_size)
        key = _md5key(seed, doc)
        out.setdefault((term, df[term], key % nseg), []).append((doc, n))
    return {
        k: ",".join(f"{d}:{n}" for d, n in sorted(v)) for k, v in out.items()
    }


IDX_ROWS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the dog  ate\tthe cat"),
    ("d3", "  "),  # blank doc: contributes nothing
    ("d4", "cat cat cat"),
    ("d5", "unique token here the"),
]


def test_inverted_index_matches_python_twin(spark):
    from imgfact_spark.operators.retrieval import inverted_index

    df = spark.createDataFrame(IDX_ROWS, ["doc_id", "text"])
    for seg_size in (1, 2, 100):
        got = {
            (r["term"], r["df"], r["segment"]): r["postings"]
            for r in inverted_index(
                df, "text", "doc_id", segment_size=seg_size, hash_mode="md5"
            ).collect()
        }
        assert got == _py_index(IDX_ROWS, seg_size), seg_size


def test_inverted_index_segmentation_invariants(spark):
    from imgfact_spark.operators.retrieval import inverted_index

    df = spark.createDataFrame(IDX_ROWS, ["doc_id", "text"])

    def full(seg_size):
        rows = inverted_index(
            df, "text", "doc_id", segment_size=seg_size, hash_mode="md5"
        ).collect()
        merged = {}
        for r in rows:
            merged.setdefault((r["term"], r["df"]), []).extend(
                r["postings"].split(",")
            )
        return {k: sorted(v) for k, v in merged.items()}, rows

    one, rows1 = full(1)
    big, _ = full(10**6)
    # the UNION of segment postings is segment-size invariant
    assert one == big
    # df equals the total posting count across a term's segments
    for (term, dfreq), postings in one.items():
        assert dfreq == len(postings), term
    # seg_size=1: every segment holds exactly... at most a few hash-
    # colliding docs; 'the' (df=3) must split across >1 segment
    the_segs = {r["segment"] for r in rows1 if r["term"] == "the"}
    assert len(the_segs) > 1


def test_inverted_index_min_df_and_modes(spark):
    from imgfact_spark.operators.retrieval import inverted_index

    df = spark.createDataFrame(IDX_ROWS, ["doc_id", "text"])
    got = inverted_index(df, "text", "doc_id", min_df=2).collect()
    assert {r["term"] for r in got} == {"the", "cat"}
    # production hash mode: same (term, df) totals, different sharding
    m = {}
    for r in got:
        m.setdefault((r["term"], r["df"]), []).extend(r["postings"].split(","))
    md5 = _py_index(IDX_ROWS, 10000, min_df=2)
    assert {k[:2] for k in md5} == set(m)
    with pytest.raises(ValueError):
        inverted_index(df, "text", "doc_id", segment_size=0)
    with pytest.raises(ValueError):
        inverted_index(df, "text", "doc_id", hash_mode="nope")
