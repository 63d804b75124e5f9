"""Paired same-window 1->4-core scaling for the sequence-packing operator
(operators/packing.pack_sequences), MARGINAL estimator.

Same methodology and corpora as tools/dup_scaling.py (that module's
docstring carries the fixed-cost rationale): one warm JVM per level runs
the small corpus (timed) then the big corpus (timed); the level cost is
t(big) - t(small), cancelling all fixed JVM/plan/setup cost.  Defaults
are 1M -> 9M docs (PACK_SMALL_COPIES/PACK_BIG_COPIES x 100k): packing is
~4x cheaper per doc than the dup-passage gram join, so the 4M-doc delta
used there gives ~12 s marginal windows with +/-40% pair noise — the 8M
delta lifts the 1-core window to ~30 s and the dispersion collapses
(measured; BENCH/BASELINE.md).  The timed
job is the full packing pipeline a real run executes: tokenize + count in
the scan, exact distributed prefix sum (range exchange + per-partition
windows + broadcast offsets), fragment fan-out, and a global aggregate
over the fragments.

Usage:
  PYTHONPATH=. python tools/pack_scaling.py --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# packing is ~4x cheaper per doc than the dup-passage operator, so the
# marginal window needs a larger doc delta to rise above same-window noise
SMALL_COPIES = int(os.environ.get("PACK_SMALL_COPIES", "10"))
BIG_COPIES = int(os.environ.get("PACK_BIG_COPIES", "90"))


def _corpus_path(copies: int) -> str:
    # shared with tools/dup_scaling.py (same replicated sf0.1 corpus)
    return f"/tmp/dup_scaling_corpus_{copies}x.parquet"


def worker(cpus: int) -> None:
    from pyspark.sql import functions as F

    from imgfact_spark.functions.text import token_count
    from imgfact_spark.operators.packing import pack_sequences
    from imgfact_spark.operators.sampling import seeded_key
    from imgfact_spark.session import get_spark

    spark = get_spark("pack-scaling", cpus=cpus)

    def run(path: str) -> tuple[float, int]:
        t0 = time.time()
        toks = spark.read.parquet(path).select(
            "doc_id", token_count("text").alias("n_tokens")
        )
        frags = pack_sequences(
            toks, "doc_id", "n_tokens", seq_len=2048,
            order_by=[seeded_key(13, "doc_id"), F.col("doc_id")],
        )
        row = frags.agg(
            (F.max("seq_id") + 1).alias("n_seqs"),
            F.sum("frag_tokens").alias("n_tokens"),
        ).collect()[0]
        return time.time() - t0, int(row["n_seqs"])

    run(_corpus_path(SMALL_COPIES))  # untimed JVM/JIT/page-cache warm-up
    t_small, _ = run(_corpus_path(SMALL_COPIES))
    t_big, n_seqs = run(_corpus_path(BIG_COPIES))
    print(
        json.dumps(
            {
                "secs": round(t_big - t_small, 2),
                "t_small": round(t_small, 2),
                "t_big": round(t_big, 2),
                "identity": [n_seqs],
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

    missing = [c for c in (SMALL_COPIES, BIG_COPIES) if not os.path.exists(_corpus_path(c))]
    if missing:
        from imgfact_spark.session import get_spark
        from tools.dup_scaling import _build_corpus

        spark = get_spark("pack-scaling-build", cpus=16)
        for c in missing:
            _build_corpus(spark, args.sf_dir, c)
        spark.stop()

    from tools.marginal_harness import paired_marginal

    paired_marginal(
        tool_file=__file__,
        levels=[int(x) for x in args.levels.split(",")],
        reps=args.reps,
        operator="pack_sequences(seq_len=2048) incl. tokenize+count scan",
        marginal_docs=(BIG_COPIES - SMALL_COPIES) * 100_000,
        out_json="SCALING_packing.json",
    )


if __name__ == "__main__":
    main()
