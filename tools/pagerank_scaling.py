"""Paired same-window 1->4-core scaling for the PageRank operator
(operators/graph.pagerank), MARGINAL estimator.

The iterative-shuffle shape (K rounds of join + groupBy with
localCheckpoint barriers) is a scaling profile the other SCALING_* files
don't cover: per-iteration fixed costs (checkpoint job submit, plan) are
K× the one-shot operators', so the marginal estimator matters even more
here — small/big runs in one warm JVM, t(big) − t(small) cancels the
per-job fixed cost and measures the marginal edges (methodology:
tools/marginal_harness.py, BENCH/BASELINE.md).

Corpus: deterministic synthetic edge lists (xxhash64-derived endpoints,
dst quadratically skewed toward low ids to plant hub nodes — the
power-law shape AQE's skew handling must survive).  small = 2M rows,
big = 8M rows; node universe scales with edges.  Production fold
(deterministic=False); identity = (n_nodes, n_distinct_edges) asserted
equal across every rep at both levels.

Usage:
  PYTHONPATH=. python tools/pagerank_scaling.py --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMALL_ROWS, BIG_ROWS = 2_000_000, 8_000_000


def _corpus_path(rows: int) -> str:
    return f"/tmp/pagerank_scaling_edges_{rows}.parquet"


def _build_corpus(spark, rows: int) -> None:
    from pyspark.sql import functions as F

    n_nodes = rows // 10
    base = spark.range(rows).select(
        F.pmod(F.xxhash64(F.col("id"), F.lit("src")), F.lit(n_nodes)).alias("s"),
        # quadratic skew: dst mass concentrates on low ids (hub nodes)
        F.floor(
            F.pow(
                F.pmod(F.xxhash64(F.col("id"), F.lit("dst")), F.lit(1_000_000))
                / 1_000_000.0,
                F.lit(2.0),
            )
            * n_nodes
        )
        .cast("bigint")
        .alias("d"),
    )
    base.select(
        F.concat(F.lit("n"), F.col("s").cast("string")).alias("src"),
        F.concat(F.lit("n"), F.col("d").cast("string")).alias("dst"),
    ).repartition(32).write.mode("overwrite").parquet(_corpus_path(rows))


def worker(cpus: int) -> None:
    from pyspark.sql import functions as F

    from imgfact_spark.operators.graph import pagerank
    from imgfact_spark.session import get_spark

    # fixed task granularity across levels (the asof-profile lesson: letting
    # shuffle partitions scale with cores conflates spill behavior with
    # parallel efficiency — BENCH/BASELINE.md)
    extra = json.loads(os.environ.get("SPARK_GRAFT_EXTRA_CONF", "{}"))
    spark = get_spark(
        "pagerank-scaling", cpus=cpus, shuffle_partitions=12, extra_conf=extra
    )

    def run(path: str) -> tuple[float, list[int]]:
        edges = spark.read.parquet(path)
        t0 = time.time()
        ranks = pagerank(edges, iterations=3, deterministic=False)
        # the consuming aggregate is INSIDE the timed window: in fast mode
        # pagerank() returns the node-name rejoin LAZY (only the hashed-id
        # iterations ran in the eager checkpoints), and that data-
        # proportional join is part of what every consumer pays — leaving
        # it outside would truncate the operator cost (round-5 review
        # finding).  The count + order-free signature double as the
        # identity check.
        row = ranks.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("node")).alias("sig"),
        ).collect()[0]
        dt = time.time() - t0
        return dt, [row["n"], int(row["sig"])]

    run(_corpus_path(SMALL_ROWS))  # untimed JVM/JIT/page-cache warm-up
    t_small, id_small = run(_corpus_path(SMALL_ROWS))
    t_big, id_big = run(_corpus_path(BIG_ROWS))
    print(
        json.dumps(
            {
                "secs": round(t_big - t_small, 2),
                "t_small": round(t_small, 2),
                "t_big": round(t_big, 2),
                "identity": [id_small, id_big],
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--levels", default="1,4")
    ap.add_argument("--worker", type=int, metavar="CPUS")
    ap.add_argument("--out", default="SCALING_pagerank.json")
    args = ap.parse_args()
    if args.worker:
        worker(args.worker)
        return

    missing = [
        r for r in (SMALL_ROWS, BIG_ROWS) if not os.path.exists(_corpus_path(r))
    ]
    if missing:
        from imgfact_spark.session import get_spark

        spark = get_spark("pagerank-scaling-build", cpus=16)
        for r in missing:
            _build_corpus(spark, r)
        spark.stop()

    from tools.marginal_harness import paired_marginal

    paired_marginal(
        tool_file=__file__,
        levels=[int(x) for x in args.levels.split(",")],
        reps=args.reps,
        operator="pagerank(iterations=3, deterministic=False)",
        marginal_docs=BIG_ROWS - SMALL_ROWS,
        out_json=args.out,
    )


if __name__ == "__main__":
    main()
