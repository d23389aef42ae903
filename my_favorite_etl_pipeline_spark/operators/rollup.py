"""Hypertable-style continuous aggregate (rollup + raw tail).

The pattern behind TimescaleDB continuous aggregates / druid rollups,
re-expressed Spark-first: keep an hourly pre-aggregated table for history
and answer queries by combining it with a re-aggregation of only the raw
tail (events newer than the rollup watermark). At 100 TB the historical
scan shrinks by the rollup factor (≈ raw-rows per hour-bucket), and the
rollup table itself is appended incrementally per batch window — the same
incremental-window machinery as operators.incremental.

The combine step works because count/sum are decomposable aggregates:
SUM(tail ∪ rollup.sums) == SUM(raw). (avg is derived as sum/count at the
end; never roll up averages.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLLUP_COLS = ("bucket_start", "event_type", "n_events", "sum_value")


def hourly_rollup(events: DataFrame) -> DataFrame:
    """The materialized form: one row per (hour, event_type) with
    decomposable partial aggregates (count + sum, never avg)."""
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket_start"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


def rollup_with_tail(
    rollup: DataFrame,
    raw_tail: DataFrame,
) -> DataFrame:
    """Combine a pre-aggregated history with a freshly-aggregated tail.

    Both sides share the ROLLUP_COLS shape; the union re-aggregates so a
    bucket straddling the watermark merges correctly. Returns the same
    schema as :func:`hourly_rollup` over the full data, plus avg derived
    at the end.
    """
    combined = rollup.select(*ROLLUP_COLS).unionByName(
        hourly_rollup(raw_tail).select(*ROLLUP_COLS)
    )
    return (
        combined.groupBy("bucket_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
        .withColumn("avg_value", F.col("sum_value") / F.col("n_events"))
    )
