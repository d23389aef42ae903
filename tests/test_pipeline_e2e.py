"""End-to-end pipeline + streaming/batch parity (SURVEY §5.2).

Synthesizes a Mongo-shaped nested batch, runs the full reference-parity
chain twice with the same run_id (idempotency), then an overlapping window
(upsert semantics). Also checks the streaming tumbling agg equals its batch
equivalent.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from my_favorite_etl_pipeline_spark.functions.normalize import (
    coerce_timestamps,
    flatten_struct,
    normalize_columns,
    stringify_id,
    structs_to_json,
    with_lineage,
)
from my_favorite_etl_pipeline_spark.operators.incremental import incremental_extract
from my_favorite_etl_pipeline_spark.operators.merge import merge_upsert


def _mongo_batch(spark):
    """Documents shaped like the reference's collection (nested *by structs)."""
    return spark.createDataFrame(
        [
            Row(
                _id=1001,
                name="doc-a",
                status="open",
                createdAt="2024-01-10 01:00:00",
                updatedAt="2024-01-10 02:00:00",
                createdby=Row(id="u1", name="ann", role="admin", client="c1"),
                requestparams=Row(k="v"),
            ),
            Row(
                _id=1002,
                name="doc-b",
                status="closed",
                createdAt="2024-01-10 03:00:00",
                updatedAt="garbage-not-a-date",
                createdby=Row(id="u2", name="bo", role="user", client="c2"),
                requestparams=None,
            ),
        ]
    )


def _transform(df, run_id):
    out = normalize_columns(df)
    out = stringify_id(out)
    out = coerce_timestamps(out, ["createdat", "updatedat"])
    out = flatten_struct(out, "createdby", ["id", "name", "role", "client"])
    out = structs_to_json(out, ["createdby", "requestparams"])
    return with_lineage(out, run_id)


def test_full_chain_and_idempotent_merge(spark):
    batch = _transform(
        incremental_extract(
            coerce_timestamps(normalize_columns(_mongo_batch(spark)), ["createdat", "updatedat"]),
            ["createdat", "updatedat"],
            "2024-01-10 00:00:00",
            "2024-01-11 00:00:00",
        ),
        run_id="run-1",
    )
    rows = {r["_id"]: r for r in batch.collect()}
    assert set(rows) == {"1001", "1002"}
    assert rows["1002"].updatedat is None  # coerced, not raised
    assert rows["1001"].createdby_id == "u1"

    mart = batch  # first load
    # same batch again (retry) → merge is a fixpoint
    merged = merge_upsert(mart, batch, "_id", ["status", "updatedat", "requestparams"])
    assert merged.count() == 2
    assert merged.exceptAll(mart).count() == 0

    # overlapping second window with a changed status for 1001
    changed = batch.withColumn(
        "status", F.when(F.col("_id") == "1001", "resolved").otherwise(F.col("status"))
    )
    out = {r["_id"]: r for r in merge_upsert(mart, changed, "_id", ["status"]).collect()}
    assert out["1001"].status == "resolved"
    assert out["1001"].name == "doc-a"  # non-update col kept
    assert out["1002"].status == "closed"


def test_stream_batch_parity(spark, sf_dir):
    from my_favorite_etl_pipeline_spark.sources.tables import load
    from my_favorite_etl_pipeline_spark.streaming.windows import tumbling_hourly_counts

    streamed = tumbling_hourly_counts(spark, sf_dir)
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
