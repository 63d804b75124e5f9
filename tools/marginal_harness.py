"""Shared paired-marginal scaling harness (the methodology of
tools/dup_scaling.py / pack_scaling.py, factored once).

Measures data-proportional 1->4-core scaling for an operator whose
per-doc cost is too small for total-wall ratios at feasible sizes: one
warm JVM per level runs the small corpus (timed) then the big corpus
(timed); the level's cost is t(big) - t(small), cancelling every fixed
JVM/plan/setup cost (full rationale: dup_scaling.py docstring and
BENCH/BASELINE.md).  AB/BA same-window pairing across levels; output
identity asserted for EVERY rep at BOTH levels on absolute counts.

A profile tool supplies: a worker(cpus) that prints one JSON line
{"secs": marginal, "t_small":…, "t_big":…, "identity": <scalar or list>}
and corpus paths (built on demand via a builder hook).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(tool_file: str, cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(tool_file), "--worker", str(cpus)],
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
            f"worker local[{cpus}] failed (exit {out.returncode}); stderr above"
        )
    return json.loads(lines[-1])


def paired_marginal(
    tool_file: str,
    levels: list[int],
    reps: int,
    operator: str,
    marginal_docs: int,
    out_json: str,
    target: float = 0.8,
) -> dict:
    """AB/BA-paired runs at two parallelism levels; writes BENCH/<out_json>
    and returns the summary dict."""
    assert len(levels) == 2 and levels[1] == 4 * levels[0]
    n, n4 = levels
    pairs = []
    best = {n: None, n4: None}
    idents = []  # one (level-n, level-4n) identity observation PER REP
    for rep in range(reps):
        if rep % 2 == 0:
            r_n, r_4n = run_level(tool_file, n), run_level(tool_file, n4)
        else:
            r_4n, r_n = run_level(tool_file, n4), run_level(tool_file, n)
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
        idents.append((json.dumps(r_n["identity"]), json.dumps(r_4n["identity"])))
    assert len({i for pair in idents for i in pair}) == 1, (
        f"output identity violated across reps/levels: {idents}"
    )
    effs = sorted(p["efficiency"] for p in pairs)
    m = len(effs) // 2
    summary = {
        "operator": operator,
        "estimator": "marginal: t(big) - t(small) docs, warm JVM (AB/BA pairs)",
        "marginal_docs": marginal_docs,
        "reps_per_level": reps,
        "levels": {str(lvl): {"marginal_secs": best[lvl]} for lvl in levels},
        "docs_per_sec": {
            str(lvl): round(marginal_docs / best[lvl], 1) for lvl in levels
        },
        "identity": json.loads(idents[0][0]),
        "same_window_pairs": pairs,
        "median_pair_efficiency": round(
            effs[m] if len(effs) % 2 else (effs[m - 1] + effs[m]) / 2, 3
        ),
        "target": target,
    }
    summary["pass"] = summary["median_pair_efficiency"] >= target
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH", out_json), "w") as f:
        json.dump(summary, f, indent=1)
    return summary
