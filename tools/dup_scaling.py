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
import subprocess
import sys
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
                # ABSOLUTE counts for the identity check (a delta would let
                # offsetting small/big differences cancel)
                "dup_docs": [n_small, n_big],
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

    levels = [int(x) for x in args.levels.split(",")]
    assert len(levels) == 2 and levels[1] == 4 * levels[0]
    if not all(
        os.path.exists(_corpus_path(c)) for c in (SMALL_COPIES, BIG_COPIES)
    ):
        from imgfact_spark.session import get_spark

        spark = get_spark("dup-scaling-build", cpus=16)
        for c in (SMALL_COPIES, BIG_COPIES):
            if not os.path.exists(_corpus_path(c)):
                _build_corpus(spark, args.sf_dir, c)
        spark.stop()

    def run_level(n: int) -> dict:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(n)],
            capture_output=True,
            text=True,
            cwd=REPO,
            env={
                **os.environ,
                "PYTHONPATH": REPO,
                "OMP_NUM_THREADS": "1",
                "OPENBLAS_NUM_THREADS": "1",
                "MKL_NUM_THREADS": "1",
            },
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if out.returncode != 0 or not lines:
            sys.stderr.write(out.stderr)
            raise RuntimeError(
                f"worker local[{n}] failed (exit {out.returncode}); stderr above"
            )
        return json.loads(lines[-1])

    n, n4 = levels
    pairs = []
    best = {n: None, n4: None}
    dup_counts = []  # one (level-n, level-4n) observation PER REP
    for rep in range(args.reps):
        if rep % 2 == 0:
            r_n, r_4n = run_level(n), run_level(n4)
        else:
            r_4n, r_n = run_level(n4), run_level(n)
        print(f"rep {rep}: local[{n}] {r_n} | local[{n4}] {r_4n}", file=sys.stderr)
        pairs.append(
            {
                "t_n": r_n["secs"],
                "t_4n": r_4n["secs"],
                "efficiency": round(r_n["secs"] / (4 * r_4n["secs"]), 3),
            }
        )
        for lvl, r in ((n, r_n), (n4, r_4n)):
            best[lvl] = r["secs"] if best[lvl] is None else min(best[lvl], r["secs"])
        dup_counts.append((tuple(r_n["dup_docs"]), tuple(r_4n["dup_docs"])))
    # identity of the (small, big) ABSOLUTE counts must hold in EVERY rep
    # at BOTH levels, not just the last one
    assert len(set(dup_counts)) == 1 and dup_counts[0][0] == dup_counts[0][1], (
        f"output identity violated across reps/levels: {dup_counts}"
    )
    marg_docs = (BIG_COPIES - SMALL_COPIES) * 100_000
    effs = sorted(p["efficiency"] for p in pairs)
    m = len(effs) // 2
    summary = {
        "operator": "duplicate_passage_stats(k=5, min_df=2)",
        "estimator": f"marginal: t({BIG_COPIES * 100_000}) - t({SMALL_COPIES * 100_000}) docs, warm JVM",
        "marginal_docs": marg_docs,
        "reps_per_level": args.reps,
        "levels": {str(lvl): {"marginal_secs": best[lvl]} for lvl in levels},
        "docs_per_sec": {
            str(lvl): round(marg_docs / best[lvl], 1) for lvl in levels
        },
        "same_window_pairs": pairs,
        "median_pair_efficiency": round(
            effs[m] if len(effs) % 2 else (effs[m - 1] + effs[m]) / 2, 3
        ),
        "target": 0.8,
    }
    summary["pass"] = summary["median_pair_efficiency"] >= 0.8
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH", "SCALING_dup_passages.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
