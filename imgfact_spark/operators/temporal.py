"""Temporal joins Spark lacks as built-ins: as-of join and binned range
join — the two canonical custom operators of event-time analytics (and of
evidence-timeline construction over a crawled corpus: "which snapshot of
the entity page was current when this document was fetched").

The reference is timestamp-free (its corpus is a static crawl); these are
engine extensions re-expressed from the standard distributed designs:

**as-of join** (each probe row ↦ the latest reference row at-or-before
its timestamp, per key): implemented as the union-and-carry-forward
window — tag both inputs, union, and per key take
``last(ref_payload, ignorenulls=True)`` over a ROWS window ordered by
(ts, side, tiebreak).  ONE shuffle on the key, no inequality join, no
per-probe scan of the reference; the reference payload rides in a single
struct so every output column comes from the SAME matched row (per-column
``last`` could mix rows when payloads contain nulls).  References sort
before probes at equal timestamps (backward-inclusive semantics, DuckDB
ASOF-compatible); ties among references resolve to the greatest
``tiebreak`` — deterministic under any partitioning.

**binned range join** (point-in-interval, per key): equi-join on
(key, time_bin) after mapping each point to its bin and exploding each
interval over the bins it covers — the standard binned-range-join
rewrite; a point lives in exactly one bin, so each qualifying
(point, interval) pair meets exactly once and needs no post-dedup.
Shuffle ∝ points + interval-rows × (span/bin_width + 1); pick
``bin_width`` near the typical interval span so the explode factor stays
~2 while the join stays an equi-join (never a CartesianProduct /
broadcast-nested-loop, which an inequality join would plan).

Both are pure-JVM column plans; timestamps are compared in exact
microseconds.

Reference parity note: the reference pipeline is timestamp-free — its
only ordering is positional file alignment (eval_and_app/
prepare_data.py:43-59 ``zip(triples, img_path)``, re-expressed in
operators/zip_join.py) and its incrementality is skip-finished-chunks
resume (SURVEY.md §2.10) — so these are engine extensions with no
reference twin, certified by quadratic-oracle driver queries instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    on: list[str],
    probe_ts: str,
    ref_ts: str,
    ref_payload: list[str],
    tiebreak: str | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``probe`` row, plus ``ref_payload`` columns
    (and ``ref_ts``) from the latest ``ref`` row with
    ``ref_ts <= probe_ts`` on the same ``on`` key — NULLs when no such row
    exists (or when it is older than ``tolerance_seconds``).  ``tiebreak``
    orders ties among reference rows at one timestamp (greatest wins);
    required for a deterministic result when such ties are possible.

    NULL timestamps: reference rows with NULL ``ref_ts`` are excluded (a
    NULL would sort NULLS-FIRST and be carried into every match); probes
    with NULL ``probe_ts`` come back unmatched."""
    reserved = {"_ts", "_side", "_ref", "_m"}
    clash = reserved & (set(probe.columns) | set(ref.columns))
    if clash:
        raise ValueError(f"asof_join reserves column names {sorted(clash)}")
    ref = ref.filter(F.col(ref_ts).isNotNull())
    payload_cols = [F.col(c) for c in [ref_ts, *ref_payload]]
    if tiebreak is not None and tiebreak not in (ref_ts, *ref_payload):
        payload_cols.append(F.col(tiebreak))
    r = ref.select(
        *[F.col(k) for k in on],
        F.col(ref_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*payload_cols).alias("_ref"),
    )
    tie = (
        F.col("_ref")[tiebreak] if tiebreak is not None else F.lit(0)
    )
    p = probe.select(
        "*",
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_ref"].dataType).alias("_ref"),
    )
    unioned = p.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side", tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_ref", ignorenulls=True).over(w)
    out = unioned.withColumn("_m", matched).filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        in_tol = F.col("_m")[ref_ts] >= F.col("_ts") - F.expr(
            f"INTERVAL {int(tolerance_seconds)} SECONDS"
        )
        out = out.withColumn("_m", F.when(in_tol, F.col("_m")))
    return out.select(
        *[F.col(c) for c in probe.columns],
        F.col("_m")[ref_ts].alias(f"asof_{ref_ts}"),
        *[F.col("_m")[c].alias(f"asof_{c}") for c in ref_payload],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_width_seconds: int = 300,
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """Inner point-in-interval join (``start_ts <= point_ts <= end_ts``,
    inclusive, per ``on`` key) as an equi-join on (key, time bin).  Output
    columns: all of ``points`` then all non-key ``intervals`` columns.

    Guards: empty intervals (end < start) match nothing; an interval
    spanning more than ``max_bins_per_interval`` bins FAILS the job with a
    clear message instead of materializing a multi-GB sequence array from
    one corrupt sentinel timestamp — widen ``bin_width_seconds`` or clean
    the intervals."""
    if set(points.columns) & set(intervals.columns) - set(on):
        raise ValueError(
            "range_join: points/intervals non-key column names must be "
            f"disjoint, both have "
            f"{sorted(set(points.columns) & set(intervals.columns) - set(on))}"
        )
    if "_bin" in points.columns or "_bin" in intervals.columns:
        raise ValueError("range_join reserves the column name '_bin'")
    width_us = int(bin_width_seconds) * 1_000_000

    def _bin_of(c: str) -> Column:
        # unix_micros rejects TIMESTAMP_NTZ (the parquet default here);
        # the cast only shifts both sides by the same session-tz offset,
        # and binning needs internal consistency, not absolute alignment
        return F.floor(
            F.unix_micros(F.col(c).cast("timestamp")) / width_us
        ).cast("long")

    sb, eb = _bin_of(start_ts), _bin_of(end_ts)
    n_bins = eb - sb + 1
    bins = (
        F.when(n_bins < 1, F.array().cast("array<long>"))
        .when(n_bins <= max_bins_per_interval, F.sequence(sb, eb))
        .otherwise(
            F.array(
                F.assert_true(
                    F.lit(False),
                    F.concat(
                        F.lit("range_join: interval spans "),
                        n_bins.cast("string"),
                        F.lit(
                            f" bins > max_bins_per_interval="
                            f"{max_bins_per_interval}; widen "
                            "bin_width_seconds or clean the intervals"
                        ),
                    ),
                ).cast("long")
            )
        )
    )
    p = points.withColumn("_bin", _bin_of(point_ts))
    i = intervals.withColumn("_bin", F.explode(bins))
    joined = p.join(i, [*on, "_bin"]).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    keep = [F.col(c) for c in points.columns] + [
        F.col(c) for c in intervals.columns if c not in on
    ]
    return joined.select(*keep)
