"""Hypertable-style multi-granularity time rollup (continuous-aggregate
shape): one pass over an event stream produces per-hour, per-day and
all-time aggregates per key — the materialized-rollup layer every
event-analytics store (TimescaleDB continuous aggregates, Druid rollup
tables) keeps in front of raw events.

Spark shape: bucket the timestamp once per granularity in the scan
projection, then ``groupingSets`` over (keys × hierarchical bucket
prefixes) — Catalyst plans this as ONE Expand + hash aggregate: each
input row expands to |sets| rows map-side and partial aggregation
collapses them before the single shuffle, so shuffle volume ∝ distinct
group cells (bounded by the bucket grid), never ∝ input rows × sets.
For very deep hierarchies (minute→hour→day→month) reaggregating each
level from the next-finer one halves the expand factor, but for the
2-3-level case the single Expand is the cheaper plan (one job, one
shuffle).

Determinism: value sums are integer cents (``floor(value·100)`` — exact,
associative, order-independent; float SUM order differs across engines);
timestamps leave as epoch microseconds (the module's timestamp-free
driver-compare contract).

Reference parity note: the reference pipeline is timestamp-free (static
crawl; SURVEY.md §2.10) — this is an engine extension, same tier as the
temporal joins (operators/temporal.py), certified by a DuckDB
GROUP BY ROLLUP oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# coarse → fine; each granularity must nest inside the previous one so the
# hierarchical prefixes of a ROLLUP are the meaningful aggregation levels.
# 'week' is deliberately absent: ISO weeks do not nest in months or years
# (a Jan 29–Feb 4 week would split into two (month, week) cells, breaking
# the prefix invariant) — run a separate week-keyed rollup instead.
_GRAIN_ORDER = ["year", "month", "day", "hour", "minute"]


def time_rollup(
    events: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    granularities: tuple[str, ...] = ("day", "hour"),
) -> DataFrame:
    """Multi-granularity rollup: for every key and every hierarchical
    prefix of ``granularities`` (plus the all-time total), emit
    ``(keys…, <g>_us buckets…, gran, n_events, sum_cents)``.

    ``gran`` labels the finest bucket present in the row ('hour', 'day',
    …, or 'all'); coarser rows carry NULL in the unused bucket columns
    (standard ROLLUP output).  Buckets are epoch-microsecond BIGINTs of
    ``date_trunc``; sums are integer cents.
    """
    grans = list(granularities)
    order = {g: i for i, g in enumerate(_GRAIN_ORDER)}
    unknown = [g for g in grans if g not in order]
    if unknown:
        raise ValueError(
            f"unknown granularities {unknown}; supported (nesting): {_GRAIN_ORDER}"
        )
    if len(set(grans)) != len(grans):
        raise ValueError(f"duplicate granularities: {grans}")
    if sorted(grans, key=lambda g: order[g]) != grans:
        raise ValueError(f"granularities must be coarse->fine: {grans}")
    bucket_names = [f"{g}_us" for g in grans]
    pre = events.select(
        *keys,
        *[
            F.unix_micros(
                F.date_trunc(g, F.col(ts_col)).cast("timestamp")
            ).cast("bigint").alias(n)
            for g, n in zip(grans, bucket_names)
        ],
        F.floor(F.col(value_col) * 100).cast("bigint").alias("_cents"),
    )
    # hierarchical prefixes: (), (day_us), (day_us, hour_us), ... == ROLLUP
    sets = [
        [F.col(c) for c in keys + bucket_names[:i]]
        for i in range(len(grans) + 1)
    ]
    gran = F.lit("all")
    for g, n in zip(grans, bucket_names):  # coarse->fine: finest wins
        gran = F.when(F.grouping(n) == 0, F.lit(g)).otherwise(gran)
    return (
        pre.groupingSets(sets, *[F.col(c) for c in keys + bucket_names])
        .agg(
            gran.alias("gran"),
            F.count("*").alias("n_events"),
            F.sum("_cents").alias("sum_cents"),
        )
        .select(*keys, *bucket_names, "gran", "n_events", "sum_cents")
    )
