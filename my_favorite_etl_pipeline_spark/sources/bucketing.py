"""Bucketed table layout — co-located joins without a shuffle (100 TB
posture; SURVEY §2.8 scale notes).

Two fact tables bucketed by the same key into the same bucket count join
WITHOUT an exchange: each task reads bucket i of both sides. At 100 TB this
turns the nightly fact-fact join from the dominant shuffle into pure
map-side work, paid for once at write time. ``sortBy`` within buckets
additionally removes the sort from sort-merge joins.

Bucketing requires the session catalog (``saveAsTable``) — bucket metadata
lives in the metastore, not in parquet footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; Catalyst elides both exchanges.

    Callers verify the layout paid off with ``assert_no_shuffle_join``.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the join plan still contains an Exchange (bucketing regressed)."""
    df.collect()  # finalize AQE plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(f"bucketed join still shuffles:\n{plan}")
