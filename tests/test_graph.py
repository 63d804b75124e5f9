"""PageRank operator: hand-computed oracle, mode equivalence, invariances."""

import pytest
from pyspark.sql import functions as F

from imgfact_spark.operators.graph import pagerank


def _py_pagerank(edges, damping=0.85, iterations=3):
    """Plain-Python twin with the SAME src-sorted sequential fold."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    ranks = {v: 1.0 / n for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(iterations):
        incoming = {}
        for u, v in edges:  # already globally sorted → per-dst src-sorted
            incoming.setdefault(v, []).append(ranks[u] / outdeg[u])
        ranks = {}
        for v in nodes:
            s = 0.0
            for c in incoming.get(v, []):
                s = s + c
            ranks[v] = base + damping * s
    return ranks


EDGES = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("d", "c"),  # d is never a dst: rank stays (1-d)/N
]


def test_pagerank_matches_python_twin_bitwise(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    want = _py_pagerank(EDGES)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == want[v], (v, got[v], want[v])


def test_pagerank_fast_mode_close_and_same_order(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    det = {r["node"]: r["rank"] for r in pagerank(df, deterministic=True).collect()}
    fast = {r["node"]: r["rank"] for r in pagerank(df, deterministic=False).collect()}
    assert set(det) == set(fast)
    for v in det:
        assert fast[v] == pytest.approx(det[v], rel=1e-12)
    rank_of = lambda d: sorted(d, key=lambda v: (-d[v], v))  # noqa: E731
    assert rank_of(det) == rank_of(fast)


def test_pagerank_partitioning_invariance(spark):
    df = spark.createDataFrame(EDGES * 3, ["src", "dst"])  # dups collapse
    one = {r["node"]: r["rank"] for r in pagerank(df.coalesce(1)).collect()}
    many = {r["node"]: r["rank"] for r in pagerank(df.repartition(7)).collect()}
    assert one == many


def test_pagerank_mass_and_no_inbound_floor(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    rows = pagerank(df, iterations=2).collect()
    n = len(rows)
    total = sum(r["rank"] for r in rows)
    # dangling mass leaks (documented), so total ∈ ((1-d), 1]
    assert 0.15 < total <= 1.0 + 1e-12
    floor = (1.0 - 0.85) / n
    by_node = {r["node"]: r["rank"] for r in rows}
    assert by_node["d"] == floor  # never a dst
    assert all(r["rank"] >= floor - 1e-15 for r in rows)


def test_pagerank_rejects_zero_iterations(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)


def test_pagerank_hub_gets_top_rank(spark):
    # star: everyone points at h
    edges = [(f"u{i}", "h") for i in range(10)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = pagerank(df).collect()
    top = max(rows, key=lambda r: r["rank"])
    assert top["node"] == "h"
