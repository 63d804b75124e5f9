"""Paired same-window 1->4-core scaling for the duplicate-passage
operator (operators/dedup.duplicate_passage_stats), MARGINAL estimator.

The operator's per-doc cost is ~10x smaller than the KG pipeline's, so
at any corpus size that finishes quickly the fixed JVM/plan/setup cost
(~10 s) dominates a total-wall ratio (measured: 500k docs -> t1 23 s of
which ~10 s is startup; median pair efficiency 0.31 — a fixed-cost
artifact, not a scaling property).  As established for the KG profiles
(CLAUDE.md, BENCH/BASELINE.md), the headline estimator for
data-proportional scaling is therefore the MARGINAL cost: one warm JVM
per level runs the small corpus (timed) then the big corpus (timed);
t(big) - t(small) cancels every fixed cost and measures the marginal
3M docs.  Same-window AB/BA pairing across levels as in
tools/scaling_bench.py.

Corpus: the sf0.1 driver documents table replicated with disjoint
doc_id ranges and a per-copy text perturbation (so replicas are not
cross-copy exact duplicates); small = 10 copies (1M docs), big = 40
copies (4M docs), written once and reused.

Usage:
  PYTHONPATH=. python tools/dup_scaling.py --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMALL_COPIES, BIG_COPIES = 10, 40


def _corpus_path(copies: int) -> str:
    return f"/tmp/dup_scaling_corpus_{copies}x.parquet"


def _build_corpus(spark, sf_dir: str, copies: int) -> None:
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = [
        d.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            F.concat_ws(" ", F.lit(f"copy{i}"), "text").alias("text"),
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

    from imgfact_spark.operators.dedup import duplicate_passage_stats
    from imgfact_spark.session import get_spark

    spark = get_spark("dup-scaling", cpus=cpus)

    def run(path: str) -> tuple[float, int]:
        t0 = time.time()
        out = duplicate_passage_stats(
            spark.read.parquet(path), "text", "doc_id", k=5, min_df=2
        )
        n = out.filter(F.col("dup_tokens") > 0).count()
        return time.time() - t0, n

    run(_corpus_path(SMALL_COPIES))  # untimed JVM/JIT/page-cache warm-up
    t_small, n_small = run(_corpus_path(SMALL_COPIES))
    t_big, n_big = run(_corpus_path(BIG_COPIES))
    print(
        json.dumps(
            {
                "secs": round(t_big - t_small, 2),
                "t_small": round(t_small, 2),
                "t_big": round(t_big, 2),
                # ABSOLUTE counts for the identity check (a delta would
                # let offsetting small/big differences cancel)
                "identity": [n_small, n_big],
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

        spark = get_spark("dup-scaling-build", cpus=16)
        for c in missing:
            _build_corpus(spark, args.sf_dir, c)
        spark.stop()

    from tools.marginal_harness import paired_marginal

    paired_marginal(
        tool_file=__file__,
        levels=[int(x) for x in args.levels.split(",")],
        reps=args.reps,
        operator="duplicate_passage_stats(k=5, min_df=2)",
        marginal_docs=(BIG_COPIES - SMALL_COPIES) * 100_000,
        out_json="SCALING_dup_passages.json",
    )


if __name__ == "__main__":
    main()
