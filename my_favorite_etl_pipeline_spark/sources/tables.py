"""Parquet table sources (SURVEY.md §2.1 S1).

The reference ships a 17-field projection and an ``$or`` window predicate
into MongoDB's ``find()`` (reference dag_mgo_pg_schedule_etl_qc.py:94-133) so
the server filters before transfer. Here the same property is free: these
loaders return lazy DataFrames and Catalyst pushes ``.select``/``.filter``
into the parquet scan (check ``PushedFilters``/``ReadSchema`` in
``.explain``). Never materialize at read time.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@lru_cache(maxsize=256)
def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — one footer read, cached.

    Spark (4.x) rejects nanosecond parquet timestamps outright
    ([PARQUET_TYPE_ILLEGAL]); we detect them driver-side from the footer and
    repair after scan. Metadata-only: never touches row data.
    """
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa

        schema = pq.read_schema(path)
        return tuple(
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        )
    except Exception:
        return ()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one fixture table. Columns/filters prune at the scan.

    Nanosecond-timestamp columns are read as raw int64 (legacy conf) and
    rebuilt as microsecond timestamps via integer division — the same
    ns→µs truncation DuckDB applies, so oracle comparisons stay exact.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = f"{sf_dir}/{name}.parquet"
    ns_cols = _nanos_timestamp_cols(path)
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros(CAST(`{c}` DIV 1000 AS BIGINT))"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the fixture tables to ``spark.sql`` by their bare names."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
