"""Eval-results collation + selection — the reference's final results-table
step re-expressed over a metrics DataFrame.

Reference (eval_and_app/result_v2.py:1-80): walks per-task result files,
parses the 7-metric line (hit@1, hit@5, mrr, mr, f1, rec, prec), scores each
``settings`` (optimizer_lr) combination by how many of its expected metric
orderings hold — messy < text-spo, text-spo < entity-context, entity-context
< spo, per multimodal model — and emits the selected result rows.  Here the
parsed metrics are a DataFrame ``(task, settings, model, sub_task, hit1,
hit5, mrr, mr, f1, rec, prec)`` (the file-walking/line-parsing is the
ingest layer's job); the ordering checks are self-joins on the settings key
and the score is one aggregation.  Every stage is keyed by ``settings`` —
a results table is dimension-sized, so at scale these are broadcast joins
over a relation of a few thousand rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: sub_task layout per task: [messy, <entity-context...>, spo]
#: (result_v2.py:26-30)
INPUTS = {
    "predict_s": ("messy", "p", "o", "spo"),
    "predict_p": ("messy", "s", "o", "spo"),
    "predict_o": ("messy", "s", "p", "spo"),
}

METRIC_COLS = ("hit1", "hit5", "mrr", "mr", "f1", "rec", "prec")


def better_metrics_col(task: str, x: str, y: str) -> Column:
    """True when alias ``y``'s row beats alias ``x``'s on ≥2 of the task's
    headline metrics (result_v2.py:32-44: predict_p compares hit1/f1/rec/
    prec; other tasks hit1/hit5/mrr and inverted mr)."""
    if task == "predict_p":
        terms = [
            F.col(f"{x}.hit1") < F.col(f"{y}.hit1"),
            F.col(f"{x}.f1") < F.col(f"{y}.f1"),
            F.col(f"{x}.rec") < F.col(f"{y}.rec"),
            F.col(f"{x}.prec") < F.col(f"{y}.prec"),
        ]
    else:
        terms = [
            F.col(f"{x}.hit1") < F.col(f"{y}.hit1"),
            F.col(f"{x}.hit5") < F.col(f"{y}.hit5"),
            F.col(f"{x}.mrr") < F.col(f"{y}.mrr"),
            F.col(f"{x}.mr") > F.col(f"{y}.mr"),
        ]
    cnt = sum((t.cast("int") for t in terms), F.lit(0))
    return cnt >= 2


def select_results(
    metrics: DataFrame,
    task: str = "predict_s",
    models: tuple[str, ...] = ("naive", "vilt"),
    threshold: int = 0,
) -> DataFrame:
    """Score each ``settings`` by its passed ordering checks and return the
    selected result rows with ``good_metric`` attached
    (result_v2.py:48-80).

    Checks per multimodal model (each passed check +1, max =
    ``len(models) * (1 + 2·|entity sub_tasks|)``):
      * messy < text-spo          (multimodal noise hurts)
      * text-spo < entity-context (images help over text alone)
      * entity-context < spo      (full-triple grounding helps most)

    Output: one row per selected (settings, model, sub_task) — the text
    spo baseline plus every (model × sub_task) combination — with the 7
    metrics and the settings' good_metric.
    """
    sub = INPUTS[task]
    middle = sub[1:-1]
    m = metrics.filter(F.col("task") == task)
    text = m.filter((F.col("model") == "text") & (F.col("sub_task") == "spo"))

    def _check(x_df: DataFrame, y_df: DataFrame, on_model: bool) -> DataFrame:
        cond = F.col("x.settings") == F.col("y.settings")
        if on_model:
            cond = cond & (F.col("x.model") == F.col("y.model"))
        return (
            x_df.alias("x")
            .join(y_df.alias("y"), cond)
            .select(
                F.col("x.settings").alias("settings"),
                better_metrics_col(task, "x", "y").cast("int").alias("passed"),
            )
        )

    mm = m.filter(F.col("model").isin(*models))
    checks = (
        # messy < text-spo
        _check(mm.filter(F.col("sub_task") == "messy"), text, on_model=False)
        # text-spo < entity-context
        .unionByName(
            _check(text, mm.filter(F.col("sub_task").isin(*middle)), on_model=False)
        )
        # entity-context < spo
        .unionByName(
            _check(
                mm.filter(F.col("sub_task").isin(*middle)),
                mm.filter(F.col("sub_task") == "spo"),
                on_model=True,
            )
        )
    )
    good = checks.groupBy("settings").agg(
        F.sum("passed").alias("good_metric")
    )
    selected = good.filter(F.col("good_metric") >= threshold)

    out_rows = m.filter(
        ((F.col("model") == "text") & (F.col("sub_task") == "spo"))
        | F.col("model").isin(*models)
    )
    return out_rows.join(F.broadcast(selected), "settings").select(
        "task", "settings", "model", "sub_task", *METRIC_COLS, "good_metric"
    )


def collate_results(metrics: DataFrame) -> DataFrame:
    """The v1 flat collation (result.py:56-79): emit every parsed result
    row keyed ``task sub_task settings model`` in deterministic order —
    the reference's SelectedResults.txt dump before v2's ordering-check
    selection was added.  One sorted projection of the metrics relation;
    no selection, no joins."""
    return metrics.select(
        F.concat_ws(
            "_", "task", "sub_task", "settings", "model"
        ).alias("result_key"),
        "task", "sub_task", "settings", "model", *METRIC_COLS,
    ).orderBy("task", "sub_task", "settings", "model")
