"""Bucketed co-located joins: the shuffle must disappear."""

import pytest
from pyspark.sql import Row

from my_favorite_etl_pipeline_spark.sources.bucketing import (
    assert_no_shuffle_join,
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    facts = spark.createDataFrame(
        [Row(k=i % 100, v=float(i)) for i in range(2000)], "k int, v double"
    )
    dims = spark.createDataFrame(
        [Row(k=i, name=f"n{i}") for i in range(100)], "k int, name string"
    )
    write_bucketed(facts, "bt_facts", ["k"], n_buckets=4, sort_cols=["k"])
    write_bucketed(dims, "bt_dims", ["k"], n_buckets=4, sort_cols=["k"])
    yield "bt_facts", "bt_dims"
    spark.sql("DROP TABLE IF EXISTS bt_facts")
    spark.sql("DROP TABLE IF EXISTS bt_dims")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "k")
        assert_no_shuffle_join(joined)  # bucket layout replaces the exchange
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: same join off plain DataFrames exchanges at least one side."""
    left, _ = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = spark.table(left).join(
            spark.createDataFrame([Row(k=i, name=f"n{i}") for i in range(100)]), "k"
        )
        with pytest.raises(AssertionError, match="still shuffles"):
            assert_no_shuffle_join(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
