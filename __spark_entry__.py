"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``my_favorite_etl_pipeline_spark`` package; this
module just adapts its registry to the driver's entry-point shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import my_favorite_etl_pipeline_spark as engine


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference pipeline's
    signature incremental-window extract + aggregate (SURVEY.md §7 Step 1)."""
    engine.tune_session(spark)
    from pyspark.sql import functions as F

    from my_favorite_etl_pipeline_spark.operators.incremental import incremental_extract
    from my_favorite_etl_pipeline_spark.sources.tables import load

    events = load(spark, "/root/testdata/sf0.001", "events")
    window = incremental_extract(events, ["ts"], "2024-01-08 00:00:00", "2024-01-15 00:00:00")
    return (
        window.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("event_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    base = engine.queries()

    def _tuned(fn):
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            engine.tune_session(spark)
            return fn(spark, sf_dir)

        wrapper.__doc__ = fn.__doc__
        return wrapper

    return {name: _tuned(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (where SQL-expressible)."""
    return engine.oracle_sql()
