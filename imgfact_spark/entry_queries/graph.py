"""Graph-analytics queries over the constructed KG: PageRank
(unrolled-CTE oracle) and k-hop neighborhood (bounded recursive CTE)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from imgfact_spark.entry_queries._registry import ORACLES, QUERIES, _register, _t




def _pagerank_oracle(damping: str = "0.85", iterations: int = 3) -> str:
    """Unrolled fixed-K PageRank as plain SQL: per-node contribution sums
    fold a src-sorted list sequentially (list_reduce over list(... ORDER BY
    src)), matching operators/graph.pagerank's deterministic mode bitwise;
    the damping constants are written as the same double subtraction /
    multiplication both engines evaluate in IEEE order."""
    d = f"CAST({damping} AS DOUBLE)"
    stages = []
    prev = "r0"
    for i in range(1, iterations + 1):
        stages.append(
            f"""
    c{i} AS (
        SELECT e.dst AS node,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                                list(r.rank / o.od ORDER BY e.src)),
                   (h, x) -> h + x) AS s
        FROM edges e
        JOIN {prev} r ON r.node = e.src
        JOIN outdeg o ON o.src = e.src
        GROUP BY e.dst
    ),
    r{i} AS (
        SELECT nodes.node,
               (CAST(1.0 AS DOUBLE) - {d}) / (SELECT n FROM nn)
               + {d} * COALESCE(c{i}.s, CAST(0.0 AS DOUBLE)) AS rank
        FROM nodes LEFT JOIN c{i} ON c{i}.node = nodes.node
    )"""
        )
        prev = f"r{i}"
    return f"""
    WITH edges AS (
        SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                        'p' || CAST(l_partkey AS VARCHAR) AS dst
        FROM lineitem
    ),
    nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges
    ),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    outdeg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
    r0 AS (
        SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
        FROM nodes
    ),{",".join(stages)}
    SELECT node, rank FROM {prev}
    """




@_register("kg_pagerank", _pagerank_oracle())
def kg_pagerank(spark, sf_dir):
    """Engine extension: fixed-K PageRank entity-importance ranking over a
    KG-shaped edge relation (supplier→part supply edges stand in for the
    subj→obj triple relation the pipeline materializes; the reference
    serves that store per-entity — imgfact_api/imgfact.py:33-109 — but
    ships no graph analytics over it).  Deterministic mode: src-sorted
    sequential contribution folds, bitwise oracle-replayable."""
    from imgfact_spark.operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    return pagerank(edges, damping=0.85, iterations=3, deterministic=True)




@_register(
    "kg_khop",
    r"""
    WITH RECURSIVE fw AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                      'p' || CAST(l_partkey AS VARCHAR) AS dst
      FROM lineitem
    ),
    edges AS (SELECT src, dst FROM fw UNION SELECT dst, src FROM fw),
    seeds AS (SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
              FROM supplier WHERE s_suppkey <= 5),
    walk(node, depth) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT e.dst, w.depth + 1
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.depth < 2
    )
    SELECT node, CAST(MIN(depth) AS INT) AS depth FROM walk GROUP BY node
    """,
)
def kg_khop(spark, sf_dir):
    """Engine extension: k-hop neighborhood expansion
    (operators/graph.khop_neighborhood) — min-hop BFS depth within k=2
    hops of the 5 seed suppliers over the BIDIRECTIONAL supplier↔part
    supply relation (seed supplier → its parts → co-suppliers of those
    parts), generalizing the reference API's per-entity one-hop retrieval
    (imgfact_api/imgfact.py:33-109).  The DuckDB twin is a bounded
    recursive CTE; depth is partitioning-invariant (min over paths), so
    the query is value-hash exact with no deterministic-mode split."""
    from imgfact_spark.operators.graph import khop_neighborhood

    li = _t(spark, sf_dir, "lineitem")
    fw = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    edges = fw.unionByName(
        fw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 5)
        .select(
            F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node")
        )
    )
    return khop_neighborhood(edges, seeds, k=2)

