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


def test_gapfill_interpolate_matches_python_floor_division(spark):
    """gapfill_interpolate_hourly (r10): every gap row must equal the exact
    Python floor-division interpolation between its observed neighbors;
    observed rows pass through untouched; each user's series starts and
    ends on an observed hour (bounds come FROM observations)."""
    import my_favorite_etl_pipeline_spark as engine

    sf = "/root/testdata/sf0.001"
    rows = engine.queries()["gapfill_interpolate_hourly"](spark, sf).collect()
    from my_favorite_etl_pipeline_spark.sources.tables import load

    exact = {
        (r.user_id, r.h): r.vc
        for r in load(spark, sf, "events")
        .filter(F.col("user_id") <= 20)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.expr("CAST(ROUND(SUM(value) * 100) AS BIGINT)").alias("vc"))
        .collect()
    }
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user, "no rows"
    n_gaps = 0
    for uid, series in by_user.items():
        series.sort(key=lambda r: r.bucket)
        assert not series[0].was_gap and not series[-1].was_gap
        obs = [
            (int(r.bucket.timestamp()), exact[(uid, r.bucket)])
            for r in series
            if not r.was_gap
        ]
        for r in series:
            if not r.was_gap:
                assert r.v_interp_cents == exact[(uid, r.bucket)]
                continue
            n_gaps += 1
            t = int(r.bucket.timestamp())
            pt, pv = max((o for o in obs if o[0] < t), key=lambda o: o[0])
            nt, nv = min((o for o in obs if o[0] > t), key=lambda o: o[0])
            want = pv + ((nv - pv) * (t - pt)) // (nt - pt)  # Python floors
            assert r.v_interp_cents == want, (uid, r.bucket, r.v_interp_cents, want)
    assert n_gaps > 0, "fixture produced no gaps — test is vacuous"
