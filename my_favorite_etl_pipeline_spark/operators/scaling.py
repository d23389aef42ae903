"""Partition-shape guards for CPU-bound operators.

A parquet scan parallelizes at row-group granularity; a small or
single-row-group file yields ONE task, which serializes any per-row-expensive
operator (minhash signatures, dot products, Arrow-batched Python) on one
core no matter how many the cluster has. These guards only ever *increase*
parallelism — a 100 TB table already scans as thousands of partitions and
passes through untouched — so the extra round-robin exchange exists exactly
when the compute it unlocks pays for it.

Scan-dominated queries (plain filter+agg) deliberately do NOT use this: the
repartition would shuffle every row, while their partial aggregation already
collapses the data before the one small shuffle they have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin upsize when the plan yields fewer partitions than cores."""
    spark = df.sparkSession
    n = n or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
