"""Continuous-aggregate rollup: merge must equal a full-scan aggregate,
including buckets that straddle the rollup watermark."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from my_favorite_etl_pipeline_spark.operators.rollup import hourly_rollup, rollup_with_tail

TS = dt.datetime


def _events(spark):
    rows = [
        Row(event_id=1, ts=TS(2024, 1, 1, 10, 5), event_type="view", value=1.0),
        Row(event_id=2, ts=TS(2024, 1, 1, 10, 40), event_type="view", value=2.0),
        # bucket 11:00 straddles the cutoff at 11:30:
        Row(event_id=3, ts=TS(2024, 1, 1, 11, 10), event_type="view", value=3.0),   # history
        Row(event_id=4, ts=TS(2024, 1, 1, 11, 50), event_type="view", value=4.0),   # tail
        Row(event_id=5, ts=TS(2024, 1, 1, 12, 10), event_type="click", value=5.0),  # tail
    ]
    return spark.createDataFrame(rows)


def test_rollup_plus_tail_equals_full_scan(spark):
    ev = _events(spark)
    cutoff = TS(2024, 1, 1, 11, 30)
    merged = rollup_with_tail(
        hourly_rollup(ev.filter(F.col("ts") < cutoff)),
        ev.filter(F.col("ts") >= cutoff),
    )
    direct = hourly_rollup(ev).withColumn("avg_value", F.col("sum_value") / F.col("n_events"))
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    # the straddling 11:00 bucket merged both halves
    row = merged.filter(F.col("bucket_start") == TS(2024, 1, 1, 11)).collect()[0]
    assert row.n_events == 2 and row.sum_value == 7.0
