"""Fixed-iteration PageRank over the constructed knowledge graph.

Engine extension (SURVEY.md §2.10-style: the reference materializes the
triple store and serves per-entity retrievals — imgfact_api/imgfact.py:33-
109 — but ships no graph analytics over it).  Entity importance ranking is
the canonical downstream consumer of a KG triple table: rank entities by
stationary visit probability over the subj→obj edge relation, then use the
ranks for retrieval ordering, sampling priors, or head-entity skew
diagnostics.

Algorithm: power iteration with damping ``d`` for a fixed ``iterations``
count (fixed-K is the deterministic, oracle-replayable form; convergence
deltas at K≈3 are already below any gating threshold on alias-graph-shaped
inputs).  The dangling-node mass is dropped rather than redistributed —
the standard simplification when ranks feed a *relative* ordering (global
redistribution would add one all-node scalar aggregate per iteration
without changing the order of non-dangling-fed nodes).

    rank₀(v)   = 1/N
    rankₜ₊₁(v) = (1−d)/N + d · Σ_{u→v} rankₜ(u)/outdeg(u)

Scale shape (100 TB KG):

* edges are pre-joined with out-degrees ONCE and snapshotted; every
  iteration reuses that materialization instead of replaying lineage.
* each iteration is two shuffles — ranks⋈edges on ``src`` (node-sized ×
  edge-sized equi-join; AQE picks broadcast only if ranks fit, which at
  10⁹ nodes it won't — the hash-partitioned join co-locates on src) and
  groupBy ``dst`` (map-side partial sums in fast mode).  Nothing is
  node×node; power-law hub entities land on AQE's skew-split path.
* ``localCheckpoint`` truncates lineage per iteration (O(K) plan growth,
  not O(K²) replay — same contract as connected_components.py).

Determinism: in ``deterministic=True`` mode the per-node contribution sum
folds a src-sorted array SEQUENTIALLY (collect_list → array_sort →
aggregate), the repo's standard cross-engine bitwise float-sum contract
(CLAUDE.md) — DuckDB replays it as list_reduce over list(... ORDER BY
src).  ``deterministic=False`` swaps in a native map-side-combining
``F.sum`` for production (same values up to float associativity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imgfact_spark.operators.util import ensure_parallelism, snapshot


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
    deterministic: bool = True,
) -> DataFrame:
    """→ DataFrame(node string, rank double) over distinct (src, dst) edges.

    Every node appearing as src or dst gets a row; nodes with no inbound
    edges rank exactly (1−d)/N.  ``deterministic=True`` pins the float
    fold order (bitwise partitioning-invariant, DuckDB-replayable);
    ``deterministic=False`` uses native sums (faster at scale, values equal
    up to associativity).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = snapshot(
        ensure_parallelism(edges)
        .select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
    )
    nodes = snapshot(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # one 1-row-per-partition count, driver scalar
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    # pre-divide once per iteration input: (src, dst, od) reused K times
    e_w = snapshot(e.join(outdeg, "src").repartition(F.col("src")))

    base = (F.lit(1.0) - F.lit(damping)) / F.lit(n_nodes)
    ranks = nodes.withColumn("rank", F.lit(1.0) / F.lit(n_nodes))
    ranks = ranks.localCheckpoint(eager=True)

    for _ in range(iterations):
        contribs = e_w.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            "dst", "src", (F.col("rank") / F.col("od")).alias("contrib")
        )
        if deterministic:
            incoming = contribs.groupBy("dst").agg(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct("src", "contrib"))
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["contrib"],
                ).alias("s")
            )
        else:
            incoming = contribs.groupBy("dst").agg(F.sum("contrib").alias("s"))
        ranks = (
            nodes.join(incoming.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    base
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
