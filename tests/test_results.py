"""select_results vs a direct Python re-implementation of the reference's
result_v2.py scoring (better_metrics + good_metric walk)."""

from __future__ import annotations

import itertools

from imgfact_spark.results import INPUTS, METRIC_COLS, select_results


def _better(task, x, y):
    """result_v2.py:32-44 verbatim semantics."""
    if task == "predict_p":
        idx = [(0, "<"), (4, "<"), (5, "<"), (6, "<")]
    else:
        idx = [(0, "<"), (1, "<"), (2, "<"), (3, ">")]
    cnt = sum(
        1
        for i, op in idx
        if (x[i] < y[i] if op == "<" else x[i] > y[i])
    )
    return cnt >= 2


def _reference_good(task, rows, models=("naive", "vilt")):
    """result_v2.py:48-70: per-settings good_metric (as passed-check count)."""
    by = {}
    for r in rows:
        by.setdefault(r["settings"], {}).setdefault(r["model"], {})[
            r["sub_task"]
        ] = [r[m] for m in METRIC_COLS]
    middle = INPUTS[task][1:-1]
    out = {}
    for settings, d in by.items():
        passed = 0
        text = d["text"]["spo"]
        for model in models:
            if _better(task, d[model]["messy"], text):
                passed += 1
            for st in middle:
                if _better(task, text, d[model][st]):
                    passed += 1
            for st in middle:
                if _better(task, d[model][st], d[model]["spo"]):
                    passed += 1
        out[settings] = passed
    return out


def _metric_rows(task, seed_mult):
    rows = []
    vals = itertools.count(1)
    for settings in ("lr1", "lr2", "lr3"):
        for model in ("text", "naive", "vilt"):
            for st in INPUTS[task]:
                base = (next(vals) * seed_mult) % 97
                rows.append(
                    {
                        "task": task,
                        "settings": settings,
                        "model": model,
                        "sub_task": st,
                        "hit1": base / 97,
                        "hit5": (base * 3 % 97) / 97,
                        "mrr": (base * 7 % 97) / 97,
                        "mr": (base * 11 % 97) / 97 * 50,
                        "f1": (base * 13 % 97) / 97,
                        "rec": (base * 17 % 97) / 97,
                        "prec": (base * 19 % 97) / 97,
                    }
                )
    return rows


def test_select_results_matches_reference_walk(spark):
    for task, seed_mult in (("predict_s", 29), ("predict_p", 41)):
        rows = _metric_rows(task, seed_mult)
        df = spark.createDataFrame(rows)
        want = _reference_good(task, rows)
        got = select_results(df, task=task, threshold=0).collect()
        got_good = {r["settings"]: r["good_metric"] for r in got}
        assert got_good == want, f"{task}: {got_good} != {want}"
        # selected surface: text-spo baseline + every model × sub_task
        per_settings = {}
        for r in got:
            per_settings.setdefault(r["settings"], []).append(
                (r["model"], r["sub_task"])
            )
        for combos in per_settings.values():
            assert ("text", "spo") in combos
            assert sorted(combos) == sorted(
                [("text", "spo")]
                + [
                    (m, st)
                    for m in ("naive", "vilt")
                    for st in INPUTS[task]
                ]
            )


def test_select_results_threshold_gates(spark):
    task = "predict_s"
    rows = _metric_rows(task, 29)
    df = spark.createDataFrame(rows)
    want = _reference_good(task, rows)
    hi = max(want.values())
    got = select_results(df, task=task, threshold=hi).collect()
    assert {r["settings"] for r in got} == {
        s for s, g in want.items() if g >= hi
    }


def test_collate_results_flat_dump(spark):
    """v1 collation (result.py:56-79): all rows, deterministic order,
    underscore-joined key."""
    from imgfact_spark.results import METRIC_COLS, collate_results

    rows = [
        ("predict_s", "s1", "vilt", "spo") + tuple(float(i) / 10 for i in range(7)),
        ("predict_o", "s1", "text", "messy") + tuple(float(i) / 5 for i in range(7)),
    ]
    m = spark.createDataFrame(
        rows,
        "task string, settings string, model string, sub_task string, "
        + ", ".join(f"{c} double" for c in METRIC_COLS),
    )
    got = collate_results(m).collect()
    assert [r.result_key for r in got] == [
        "predict_o_messy_s1_text",
        "predict_s_spo_s1_vilt",
    ]
    assert got[0].hit5 == 0.2
