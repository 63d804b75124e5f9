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


# ------------------------------------------------------------ k-hop BFS


def _py_khop(edges, seeds, k):
    """Plain-Python min-depth BFS twin."""
    adj = {}
    for u, v in set(edges):
        adj.setdefault(u, []).append(v)
    depth = {s: 0 for s in set(seeds)}
    frontier = set(seeds)
    for d in range(1, k + 1):
        nxt = {v for u in frontier for v in adj.get(u, []) if v not in depth}
        for v in nxt:
            depth[v] = d
        frontier = nxt
        if not frontier:
            break
    return depth


KHOP_EDGES = [
    ("a", "b"),
    ("b", "c"),
    ("c", "d"),
    ("d", "a"),  # cycle back — revisits must keep min depth
    ("a", "d"),  # shortcut: d reachable at depth 1 AND 3 → min wins
    ("x", "y"),  # disconnected component
]


def _khop(spark, seeds, k, edges=KHOP_EDGES):
    from imgfact_spark.operators.graph import khop_neighborhood

    e = spark.createDataFrame(edges, ["src", "dst"])
    s = spark.createDataFrame([(v,) for v in seeds], ["node"])
    got = khop_neighborhood(e, s, k)
    return {r["node"]: r["depth"] for r in got.collect()}


def test_khop_matches_python_twin(spark):
    for seeds, k in [(["a"], 0), (["a"], 1), (["a"], 2), (["a"], 3),
                     (["a", "x"], 2), (["c"], 4)]:
        assert _khop(spark, seeds, k) == _py_khop(KHOP_EDGES, seeds, k), (
            seeds, k)


def test_khop_min_depth_over_multiple_paths(spark):
    got = _khop(spark, ["a"], 3)
    assert got["d"] == 1  # via the shortcut, not the depth-3 path
    assert got == {"a": 0, "b": 1, "d": 1, "c": 2}


def test_khop_isolated_seed_and_early_exit(spark):
    # seed absent from the edge relation: depth 0, loop exits on the
    # first empty frontier even though k is much larger
    got = _khop(spark, ["zzz"], 10)
    assert got == {"zzz": 0}


def test_khop_seed_dedup_and_k_validation(spark):
    import pytest as _pytest

    got = _khop(spark, ["a", "a", "b"], 1)
    assert got == {"a": 0, "b": 0, "c": 1, "d": 1}
    with _pytest.raises(ValueError):
        _khop(spark, ["a"], -1)


# ---------------------------------------------------------------------------
# tol convergence early stop
# ---------------------------------------------------------------------------


def test_pagerank_tol_early_stop_equals_fixed_k(spark):
    """A tol-stopped run is bitwise identical to the fixed-K run at the
    recorded stop count, and tol=None keeps today's behavior untouched."""
    e = spark.createDataFrame(EDGES, ["src", "dst"])
    stats: dict = {}
    stopped = pagerank(e, iterations=40, tol=1e-6, stats=stats)
    assert 1 <= stats["iterations_run"] < 40  # genuinely stopped early
    assert stats["final_delta"] is not None
    assert stats["final_delta"] < 1e-6
    fixed = pagerank(e, iterations=stats["iterations_run"])
    got = {r["node"]: r["rank"] for r in stopped.collect()}
    want = {r["node"]: r["rank"] for r in fixed.collect()}
    assert got == want  # bitwise: same steps, barriers are value-neutral


def test_pagerank_tol_none_and_tiny_tol_run_all_iterations(spark):
    """tol below the 1e-9 delta resolution never stops early; the result
    matches the tol-free run bitwise."""
    e = spark.createDataFrame(EDGES, ["src", "dst"])
    stats: dict = {}
    full = pagerank(e, iterations=5)
    tiny = pagerank(e, iterations=5, tol=1e-12, stats=stats)
    assert stats["iterations_run"] == 5
    assert {r["node"]: r["rank"] for r in tiny.collect()} == {
        r["node"]: r["rank"] for r in full.collect()
    }


def test_pagerank_tol_fast_mode_stops_at_barriers_only(spark):
    """Production mode probes convergence only at checkpoint barriers: with
    checkpoint_every=4 the stop count is a multiple of 4 (or the final
    iteration), and the stopped ranks match the fixed-K fast run."""
    e = spark.createDataFrame(EDGES, ["src", "dst"])
    stats: dict = {}
    stopped = pagerank(
        e, iterations=40, tol=1e-6, stats=stats, deterministic=False,
        checkpoint_every=4,
    )
    k = stats["iterations_run"]
    assert k < 40 and k % 4 == 0
    fixed = pagerank(e, iterations=k, deterministic=False, checkpoint_every=4)
    got = {r["node"]: r["rank"] for r in stopped.collect()}
    want = {r["node"]: r["rank"] for r in fixed.collect()}
    assert got.keys() == want.keys()
    for n in got:
        assert got[n] == pytest.approx(want[n], rel=1e-12)
