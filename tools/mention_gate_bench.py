"""Measure the detect_mentions JVM literal-prescan alternatives at the
reference's real template count (142 relations).

The gate (extract.py:detect_mentions) keeps a text row only if it contains
at least one template's constant segment, BEFORE anything crosses the Arrow
boundary.  Candidates:

  * contains-chain (current): ``contains(l1) | contains(l2) | …`` —
    N vectorized substring scans per row.
  * rlike-alternation: one ``rlike('l1|l2|…')`` with regex-quoted
    literals — a single Java-regex pass, but java.util.regex tries the
    alternatives sequentially at every position (NFA backtracking, not an
    Aho-Corasick automaton), so one pass ≠ O(text) work.

Usage:
    PYTHONPATH=. python tools/mention_gate_bench.py [--rows 2000000]
        [--templates 142] [--reps 3] [--cpus 8]

Prints per-variant min/median wall seconds for the same filter+count over
the same input; output identity is asserted.
"""

from __future__ import annotations

import argparse
import json
import re
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--templates", type=int, default=142)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from imgfact_spark.session import get_spark

    spark = get_spark(
        app_name="mention_gate_bench", cpus=args.cpus,
        shuffle_partitions=args.cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # literal pool shaped like real rel2desc constant segments: medium-length
    # phrases with shared stems (realistic worst case for alternation)
    stems = ["was born in", "works for", "is married to", "died in",
             "graduated from", "plays for", "is located in", "belongs to"]
    literals = [
        f" {stems[i % len(stems)]} the {i:03d}th " for i in range(args.templates)
    ]
    # ~3% of rows contain some literal; the rest are non-factual filler
    hit = F.pmod(F.col("id"), F.lit(33)) == 0
    lit_pick = F.element_at(
        F.array(*[F.lit(l) for l in literals]),
        (F.pmod(F.col("id"), F.lit(len(literals))) + 1).cast("int"),
    )
    filler = F.concat(
        F.lit("entity "), F.col("id").cast("string"),
        F.lit(" mentioned nothing factual at all but rambles on about the "),
        F.col("id").cast("string"), F.lit(" weather and sports results today"),
    )
    text = F.when(hit, F.concat(F.lit("subj"), lit_pick, F.lit("obj."))).otherwise(filler)
    docs = (
        spark.range(args.rows, numPartitions=args.cpus * 3)
        .select(F.col("id"), text.alias("text"))
        .persist()
    )
    docs.count()  # materialize input once, outside the timed region

    def contains_chain(col):
        gate = col.contains(literals[0])
        for l in literals[1:]:
            gate = gate | col.contains(l)
        return gate

    def rlike_alt(col):
        # Java-regex-quote each literal via \Q…\E (robust against any char)
        pat = "|".join("\\Q" + l + "\\E" for l in literals)
        return col.rlike(pat)

    variants = {
        "contains_chain": contains_chain,
        "rlike_alternation": rlike_alt,
    }
    counts = {}
    walls = {}
    for name, fn in variants.items():
        times = []
        for _ in range(args.reps + 1):  # rep 0 = untimed warm-up
            t0 = time.time()
            counts[name] = docs.filter(fn(F.col("text"))).count()
            times.append(round(time.time() - t0, 3))
        walls[name] = {"reps": times[1:], "min": min(times[1:]),
                       "warm": times[0]}
    assert len(set(counts.values())) == 1, f"variant outputs differ: {counts}"
    expect = args.rows // 33 + (1 if args.rows % 33 else 0)
    print(json.dumps({
        "rows": args.rows, "templates": args.templates,
        "matched_rows": counts["contains_chain"], "expected": expect,
        "walls": walls,
        "speedup_rlike_vs_chain": round(
            walls["contains_chain"]["min"] / walls["rlike_alternation"]["min"], 3
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
