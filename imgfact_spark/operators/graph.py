"""Graph analytics over the constructed knowledge graph: fixed-iteration
PageRank and k-hop neighborhood expansion.

Engine extension (SURVEY.md §2.10-style: the reference materializes the
triple store and serves per-entity ONE-hop retrievals — imgfact_api/
imgfact.py:33-109 — but ships no graph analytics over it).  Entity
importance ranking is the canonical downstream consumer of a KG triple
table: rank entities by stationary visit probability over the subj→obj
edge relation, then use the ranks for retrieval ordering, sampling
priors, or head-entity skew diagnostics.  K-hop expansion generalizes
the API's per-entity retrieval to bounded-depth subgraph extraction.

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
  edge-sized equi-join, shuffle-hash by explicit hint: the only strategy
  a 10⁹-node rank relation admits, and locally the one with no
  driver-serial broadcast build) and groupBy ``dst`` (map-side partial
  sums in fast mode).  Nothing is node×node; power-law hub entities land
  on AQE's skew-split path.
* ``localCheckpoint`` fires every ``checkpoint_every`` iterations in
  production mode (plan-growth control without per-iteration job
  barriers — each intermediate is referenced exactly once, so fusion
  replays nothing) and every iteration in oracle mode.

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

import threading

from imgfact_spark.operators.util import ensure_parallelism, snapshot

# Refcounted guard for the scoped AQE-coalesce override: a naive
# read/set/restore races under this repo's own concurrent-job patterns
# (two fast-mode pageranks, or pagerank beside runner.py's concurrent
# sinks) — caller B could snapshot the "false" caller A just set and
# "restore" it permanently after A unset it.  First entrant saves the
# real prior value and sets "false"; the last exit restores it.  (The
# conf is still session-global while held — any unrelated query running
# during the window executes without partition coalescing; that is the
# accepted scope of a session-conf tuning, documented at the use site.)
_COALESCE = "spark.sql.adaptive.coalescePartitions.enabled"
_coalesce_lock = threading.Lock()
_coalesce_state: dict = {}  # session id → {"depth": int, "saved": str|None}


def _coalesce_off_enter(sess) -> None:
    with _coalesce_lock:
        st = _coalesce_state.setdefault(id(sess), {"depth": 0, "saved": None})
        if st["depth"] == 0:
            st["saved"] = sess.conf.get(_COALESCE, None)
            sess.conf.set(_COALESCE, "false")
        st["depth"] += 1


def _coalesce_off_exit(sess) -> None:
    with _coalesce_lock:
        st = _coalesce_state[id(sess)]
        st["depth"] -= 1
        if st["depth"] == 0:
            if st["saved"] is None:
                sess.conf.unset(_COALESCE)
            else:
                sess.conf.set(_COALESCE, st["saved"])
            del _coalesce_state[id(sess)]


def _step(
    nodes: DataFrame,
    e_w: DataFrame,
    ranks: DataFrame,
    base,
    damping: float,
    key: str,
    deterministic: bool,
) -> DataFrame:
    """One lazy power-iteration step: contribs join → per-dst sum → rank
    update left join.  Factored out so tests/test_plans.py can pin the
    production join strategy (shuffle-hash on the rank side, never a
    per-iteration driver broadcast build) on the un-materialized plan."""
    rank_side = ranks.withColumnRenamed(key, "src")
    if not deterministic:
        rank_side = rank_side.hint("shuffle_hash")
    contribs = e_w.join(rank_side, "src").select(
        "dst", "src", (F.col("rank") / F.col("od")).alias("contrib")
    )
    if deterministic:
        incoming = contribs.groupBy("dst").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("src", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("s")
        )
    else:
        incoming = contribs.groupBy("dst").agg(F.sum("contrib").alias("s"))
    inc_side = incoming.withColumnRenamed("dst", key)
    if not deterministic:
        inc_side = inc_side.hint("shuffle_hash")
    return (
        nodes.select(F.col("node").alias(key))
        .join(inc_side, key, "left")
        .select(
            key,
            (
                base + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
    deterministic: bool = True,
    checkpoint_every: int = 4,
    tol: "float | None" = None,
    stats: "dict | None" = None,
) -> DataFrame:
    """→ DataFrame(node string, rank double) over distinct (src, dst) edges.

    Every node appearing as src or dst gets a row; nodes with no inbound
    edges rank exactly (1−d)/N.  ``deterministic=True`` pins the float
    fold order (bitwise partitioning-invariant, DuckDB-replayable) and
    checkpoints every iteration — the oracle path.

    ``tol``: optional L1 convergence early stop — at each checkpoint
    barrier (where both the current and previous rank relations are
    already materialized) one node-sized equi-join + aggregate computes
    Σ|rankₜ − rankₜ₋ₓ| and the loop exits once it drops below ``tol``,
    the same cheap-probe-on-materialized-state shape as
    :func:`khop_neighborhood`'s empty-frontier exit.  At 100× scale a
    fixed K either overpays (converged long ago) or under-converges;
    ``tol`` bounds both at one tiny agg per barrier.  The delta is summed
    in EXACT integers, quantized RELATIVE to graph size
    (floor(|Δ|·scale) per node, scale = min(n·1e9, 4e18) — per-node
    deltas are O(1/n), so an absolute floor would read 0 everywhere at
    large n and stop spuriously), making the stop decision
    partitioning-invariant.  Flooring underestimates the true delta by
    at most max(1e-9, n/4e18), so the STOP GUARANTEE is: when the probe
    fires, the true L1 delta is < tol + max(1e-9, n/4e18) — i.e. tol is
    honest to 1e-9 for graphs up to 4·10⁹ nodes and the slack grows
    linearly (and is documented here) beyond.  The integer sum is
    bounded by 2·scale ≤ 8e18 (Σ|Δ| ≤ 2): no overflow at any n.
    Note the delta spans the WHOLE barrier window (x = checkpoint_every
    iterations in production mode), so a stopped run is exactly
    equivalent to ``pagerank(iterations=stats["iterations_run"])`` —
    pinned by tests/test_graph.py.

    ``stats`` (optional dict) is filled with ``iterations_run`` and
    ``final_delta`` (the quantized L1 delta, de-scaled to a float) for
    observability and the fixed-K equivalence tests.

    ``deterministic=False`` is the production path (values equal up to
    float associativity), shaped by a measured driver-gap diagnosis
    (BENCH/SCALING_pagerank.json): a per-stage event-log profile showed
    the per-iteration eager checkpoints and driver-side broadcast builds
    left ~43% of 4-core wall in BETWEEN-stage serial gaps while the
    stages themselves packed perfectly.  Three levers close it:

    * **fixed-width keys** — iterates on xxhash64 node ids; the string
      universe is touched once at each end (names relation built before
      the loop, rejoined after).  A fail-stop collision check
      (count == countDistinct(id) on the names relation, one tiny
      aggregate) makes hashing correct-or-raise, never silently wrong.
    * **fused iterations** — ``localCheckpoint`` fires only every
      ``checkpoint_every`` iterations (plan-growth/lineage control for
      large K), so a K=3 run is ONE AQE query instead of 3 checkpoint
      barriers + 3 result scans: the driver submits a handful of stages
      back-to-back instead of ~36 job-gap-job cycles.
    * **shuffle-hash-hinted rank joins** — at 10⁹ nodes the rank relation
      can never broadcast, so the local plan uses the same shuffle-hash
      strategy a cluster must: no per-iteration driver collect+build
      (which scales with data and is pure serial time), and no
      sort-merge sort penalty either.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")

    # Scoped AQE override, measured r6 (BENCH/SCALING_pagerank r6 A/B):
    # at bench/SF scale the per-iteration shuffles are tiny, and AQE's
    # partition coalescing merges them BELOW the core count — serializing
    # every reducer wave.  Disabling it for this operator's jobs raised
    # 1-core throughput 115.5k→130.1k and 4-core 318.8k→390.4k edges/s
    # (median 1→4-core pair efficiency 0.69→0.765) — faster at BOTH
    # levels, so not ratio-gaming.  At production partition sizes (100s
    # of MB) the coalesce min-size threshold never triggers, so the
    # override is local-scale protection, not a cluster-behavior change.
    # Restored in the finally (the fast-mode name rejoin executes lazily
    # after restore — a plain big join where coalescing is harmless).
    # Entry/exit go through the module refcount guard so concurrent
    # fast-mode calls on one session cannot corrupt the saved value.
    sess = edges.sparkSession
    if not deterministic:
        _coalesce_off_enter(sess)
    try:
        if deterministic:
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
            n_nodes = nodes.count()  # driver scalar (1-row aggregate)
            key = "node"
        else:
            raw = ensure_parallelism(edges).select(
                F.col(src).alias("s"), F.col(dst).alias("d")
            )

            # The two setup materializations are INDEPENDENT jobs — the
            # node-universe build (names + hashed ids + collision stats) and
            # the hashed-edge chain (distinct → outdeg ⨝ → repartition on
            # src).  Submitted concurrently (the concurrent-final-sinks
            # precedent, pipeline/runner.py): at 1 core this interleaves the
            # same work; at N cores each job's shuffle waves fill the cores
            # the other's driver/commit gaps leave idle.
            def _build_names():
                names = snapshot(
                    raw.select(F.col("s").alias("node"))
                    .union(raw.select(F.col("d").alias("node")))
                    .distinct()
                    .select("node", F.xxhash64("node").alias("_nid"))
                )
                id_stats = names.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.countDistinct("_nid").alias("h"),
                ).collect()[0]
                return names, id_stats

            def _build_edges():
                # 16-byte edge rows through the distinct shuffle, not strings
                e = snapshot(
                    raw.select(
                        F.xxhash64("s").alias("src"), F.xxhash64("d").alias("dst")
                    ).distinct()
                )
                outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
                # pre-divide once per iteration: (src, dst, od) reused K times
                return snapshot(e.join(outdeg, "src").repartition(F.col("src")))

            from concurrent.futures import ThreadPoolExecutor

            from pyspark import inheritable_thread_target

            # inheritable_thread_target propagates the caller's thread-local
            # Spark properties (job group/tags, scheduler pool) into the pool
            # threads under pinned-thread mode — a cancelJobGroup()/
            # cancelJobsWithTag() from a timeout harness must reach the setup
            # jobs too.  The session-parameterized form also inherits job tags
            # (the bare form warns and drops them).
            _inherit = inheritable_thread_target(edges.sparkSession)
            with ThreadPoolExecutor(max_workers=2) as pool:
                f_names = pool.submit(_inherit(_build_names))
                f_edges = pool.submit(_inherit(_build_edges))
                names, id_stats = f_names.result()
                e_w = f_edges.result()
            if id_stats["n"] != id_stats["h"]:
                raise ValueError(
                    "pagerank: xxhash64 node-id collision detected "
                    f"({id_stats['n']} nodes, {id_stats['h']} distinct ids) — "
                    "rerun with deterministic=True (string keys)"
                )
            n_nodes = id_stats["n"]
            nodes = names.select(F.col("_nid").alias("node"))
            key = "_nid"

        if deterministic:
            outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
            # pre-divide once per iteration input: (src, dst, od) reused K times
            e_w = snapshot(e.join(outdeg, "src").repartition(F.col("src")))

        base = (F.lit(1.0) - F.lit(damping)) / F.lit(n_nodes)
        ranks = nodes.select(F.col("node").alias(key)).withColumn(
            "rank", F.lit(1.0) / F.lit(n_nodes)
        )
        ranks = ranks.localCheckpoint(eager=True)

        prev = ranks  # last materialized barrier state (tol probes only)
        iterations_run = iterations
        final_delta = None
        # Graph-size-relative quantization: per-node term floor(|Δ|·scale)
        # with scale = min(n·1e9, 4·10¹⁸).  Per-node deltas are O(1/n), so
        # an ABSOLUTE floor (the first cut used 1e-9) would quantize every
        # term to 0 once n ≳ 1e9 — spurious convergence exactly at the
        # scale the operator targets.  Flooring UNDERESTIMATES: the total
        # slack is < n/scale = max(1e-9, n/4e18), so the honest stop
        # guarantee is "true L1 delta < tol + max(1e-9, n/4e18)" — tol
        # requests at or above 1e-9 are meaningful for every n ≤ 4·10⁹
        # and degrade gracefully (documented) beyond.  Overflow-safe:
        # Σ|Δ| ≤ 2 (two sub-probability vectors), so the integer sum is
        # ≤ 2·scale ≤ 8·10¹⁸ < bigint max at EVERY n.
        delta_scale = min(1e9 * n_nodes, 4.0e18)
        for it in range(iterations):
            ranks = _step(nodes, e_w, ranks, base, damping, key, deterministic)
            # lineage/plan-size control: barrier only where plan growth says so
            # (deterministic mode keeps the every-iteration barrier: the oracle
            # path values reproducibility of each intermediate over fusion)
            last = it + 1 == iterations
            if deterministic or last or (it + 1) % checkpoint_every == 0:
                ranks = ranks.localCheckpoint(eager=True)
                # the delta is ALSO computed at the final barrier when the
                # caller asked for stats, so a tol-requesting caller always
                # gets stats["final_delta"] even when iterations <= the
                # checkpoint window made every earlier probe unreachable
                # (r6 ADVICE item).  At the final barrier the probe is
                # observability only (no stop decision left), so it is
                # skipped when stats is None — no extra job for plain
                # callers.  As documented above, the delta spans the WHOLE
                # barrier window (up to checkpoint_every iterations; at
                # the first-and-only barrier, since initialization).
                if tol is not None and (not last or stats is not None):
                    # both sides materialized → one node-sized join + tiny agg;
                    # integer-exact terms make the stop partitioning-invariant
                    prev_side = prev.withColumnsRenamed({"rank": "_rank_prev"})
                    if not deterministic:
                        prev_side = prev_side.hint("shuffle_hash")
                    delta_int = (
                        ranks.join(prev_side, key)
                        .agg(
                            F.sum(
                                F.floor(
                                    F.abs(F.col("rank") - F.col("_rank_prev"))
                                    * F.lit(delta_scale)
                                ).cast("bigint")
                            ).alias("d")
                        )
                        .collect()[0]["d"]
                    )
                    final_delta = delta_int / delta_scale
                    if delta_int < tol * delta_scale:
                        iterations_run = it + 1
                        break
                prev = ranks
        if stats is not None:
            stats["iterations_run"] = iterations_run
            stats["final_delta"] = final_delta
        if deterministic:
            return ranks
        return names.join(ranks.withColumnRenamed(key, "_nid"), "_nid").select(
            "node", "rank"
        )

    finally:
        if not deterministic:
            _coalesce_off_exit(sess)


def khop_neighborhood(
    edges: DataFrame,
    seeds: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """→ DataFrame(node, depth int): every node within ``k`` directed hops
    of any seed, with depth = the MINIMUM hop count (seeds themselves at
    depth 0, including seeds absent from the edge relation).

    Generalizes the reference API's per-entity one-hop retrieval
    (imgfact_api/imgfact.py:33-109) to bounded-depth subgraph extraction —
    the "context neighborhood" query of KG-grounded retrieval.

    Scale shape (100 TB KG): the edge relation is deduplicated and
    snapshotted ONCE, hash-partitioned on ``src``; each BFS round is one
    frontier⋈edges equi-join (the frontier is node-sized and shuffle-hash
    hinted — the edge side never moves, and a 10⁹-node frontier could
    never broadcast) followed by an anti-join against the visited set.
    Unlike :func:`pagerank`, rounds are NOT fused: ``visited`` is
    referenced twice per round (anti-join + union), so an un-materialized
    chain would replay the whole prefix exponentially — each round
    snapshots the node-sized visited relation, never the edges.  Rounds
    whose frontier is empty terminate the loop early (one count on an
    already-materialized relation).  Depth is partitioning-invariant by
    construction (min-hop BFS), so there is no deterministic/fast split.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    visited = (
        seeds.select(F.col(seed_col).cast("string").alias("node"))
        .distinct()
        .withColumn("depth", F.lit(0))
        .localCheckpoint(eager=True)
    )
    if k == 0:
        return visited
    e = snapshot(
        ensure_parallelism(edges)
        .select(
            F.col(src).cast("string").alias("src"),
            F.col(dst).cast("string").alias("dst"),
        )
        .distinct()
        .repartition(F.col("src"))
    )
    frontier = visited.select("node")
    for depth in range(1, k + 1):
        nxt = (
            e.join(
                frontier.withColumnRenamed("node", "src").hint("shuffle_hash"),
                "src",
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("depth", F.lit(depth))
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = visited.filter(F.col("depth") == depth).select("node")
        if frontier.limit(1).count() == 0:  # materialized → cheap probe
            break
    return visited
