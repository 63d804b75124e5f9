"""Paired same-window 1->4-core scaling for the as-of join
(operators/temporal.asof_join), MARGINAL estimator via
tools/marginal_harness.py.

The as-of join is the one shuffle shape the other scaling files don't
cover: a single hash exchange on the key followed by a per-key SORT and a
running last() window (the kg profiles are agg/join-heavy, dup_passages
is an explode+countDistinct gram join, packing is a range-exchange prefix
sum).  Corpus: the sf0.1 events table replicated with disjoint
(event_id, user_id) ranges — small = 10 copies (1M events), big = 40
copies (4M events); probes = clicks, references = views, keyed by user
(~6k users at 40x — thousands of rows per key, a realistic per-key
time-series load for the sort).

Usage:
  PYTHONPATH=. python tools/temporal_scaling.py --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import time

from tools.marginal_harness import paired_marginal

# the as-of join runs ~800k events/s at 1 core, an order cheaper than the
# gram join — at 10/40 copies the 1-core marginal window was ~4 s and the
# pairs came out super-linear (fixed-cost artifact, not evidence); these
# defaults put the 1-core window at ~25-30 s
SMALL_COPIES = int(os.environ.get("ASOF_SMALL_COPIES", "20"))
BIG_COPIES = int(os.environ.get("ASOF_BIG_COPIES", "180"))


def _corpus_path(copies: int) -> str:
    return f"/tmp/asof_scaling_events_{copies}x.parquet"


def _build_corpus(spark, sf_dir: str, copies: int) -> None:
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    parts = [
        ev.select(
            (F.col("event_id") + i * 100_000_000).alias("event_id"),
            (F.col("user_id") + i * 1_000_000).alias("user_id"),
            "ts",
            "event_type",
            "value",
        )
        for i in range(copies)
    ]
    full = parts[0]
    for p in parts[1:]:
        full = full.unionByName(p)
    full.repartition(max(16, copies)).write.mode("overwrite").parquet(
        _corpus_path(copies)
    )


def worker(cpus: int) -> None:
    from pyspark.sql import functions as F

    from imgfact_spark.operators.temporal import asof_join
    from imgfact_spark.session import get_spark

    # FIXED partition count at both levels (3x the larger level): the
    # default cpus-scaled granularity gives local[1] a few huge sort
    # partitions that spill while local[4] sorts many small ones in
    # memory — super-linear pairs (measured 1.05-1.37) that say "smaller
    # sorts are cheaper", not "the operator parallelizes".  Identical
    # physical work at both levels isolates parallel efficiency.
    # 36 = 3x the larger level x 3 waves: fine enough that one slow task
    # costs 1/36 of the work, not 1/12
    spark = get_spark("asof-scaling", cpus=cpus, shuffle_partitions=36)

    def run(path: str) -> tuple[float, list]:
        t0 = time.time()
        ev = spark.read.parquet(path)
        clicks = ev.filter("event_type = 'click'").select(
            "event_id", "user_id", "ts"
        )
        views = ev.filter("event_type = 'view'").select(
            "user_id",
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("v_id"),
            F.col("value").alias("v_value"),
        )
        out = asof_join(
            clicks, views, on=["user_id"], probe_ts="ts", ref_ts="v_ts",
            ref_payload=["v_id", "v_value"], tiebreak="v_id",
        )
        row = out.agg(
            F.count("*").alias("n"),
            F.count("asof_v_id").alias("matched"),
            F.bit_xor(F.coalesce("asof_v_id", F.lit(0))).alias("sig"),
        ).collect()[0]
        return time.time() - t0, [int(row["n"]), int(row["matched"]), int(row["sig"])]

    run(_corpus_path(SMALL_COPIES))  # untimed JVM/JIT/page-cache warm-up
    t_small, _ = run(_corpus_path(SMALL_COPIES))
    t_big, ident = run(_corpus_path(BIG_COPIES))
    print(
        json.dumps(
            {
                "secs": round(t_big - t_small, 2),
                "t_small": round(t_small, 2),
                "t_big": round(t_big, 2),
                "identity": ident,
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--levels", default="1,4")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--worker", type=int, metavar="CPUS")
    args = ap.parse_args()
    if args.worker:
        worker(args.worker)
        return

    missing = [
        c for c in (SMALL_COPIES, BIG_COPIES) if not os.path.exists(_corpus_path(c))
    ]
    if missing:
        from imgfact_spark.session import get_spark

        spark = get_spark("asof-scaling-build", cpus=16)
        for c in missing:
            _build_corpus(spark, args.sf_dir, c)
        spark.stop()

    paired_marginal(
        tool_file=__file__,
        levels=[int(x) for x in args.levels.split(",")],
        reps=args.reps,
        operator="asof_join(clicks -> latest view per user) incl. scan+filters",
        marginal_docs=(BIG_COPIES - SMALL_COPIES) * 100_000,
        out_json="SCALING_asof.json",
    )


if __name__ == "__main__":
    main()
