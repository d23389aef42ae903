"""S2/S3 — sinks, format round-trips, idempotent DDL (SURVEY §2.1)."""

import pytest
from pyspark.sql import Row

from my_favorite_etl_pipeline_spark.sources.io import (
    create_table_if_not_exists,
    jdbc_writer_options,
    read_table,
    write_table,
)


def _df(spark):
    return spark.createDataFrame(
        [Row(k=1, name="a", price=1.5), Row(k=2, name="b", price=2.5)]
    )


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip_formats(spark, tmp_path, fmt):
    df = _df(spark)
    path = str(tmp_path / f"t_{fmt}")
    write_table(df, path, fmt=fmt, mode="overwrite")
    back = read_table(spark, path, fmt=fmt).select("k", "name", "price")
    got = sorted((r.k, r.name, float(r.price)) for r in back.collect())
    assert got == [(1, "a", 1.5), (2, "b", 2.5)]


def test_partitioned_write_layout(spark, tmp_path):
    path = str(tmp_path / "part_out")
    write_table(_df(spark), path, mode="overwrite", partition_by=["name"])
    import os

    assert sorted(d for d in os.listdir(path) if d.startswith("name=")) == ["name=a", "name=b"]
    # partition-pruned read returns only that partition's rows
    pruned = read_table(spark, path).filter("name = 'a'")
    assert [r.k for r in pruned.collect()] == [1]


def test_append_mode(spark, tmp_path):
    path = str(tmp_path / "append_out")
    write_table(_df(spark), path, mode="overwrite")
    write_table(_df(spark), path, mode="append")
    assert read_table(spark, path).count() == 4


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(_df(spark), str(tmp_path / "x"), fmt="avro")


def test_compact_table(spark, tmp_path):
    from my_favorite_etl_pipeline_spark.sources.io import compact_table

    path = str(tmp_path / "many_files")
    big = spark.range(1000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS price")
    big.repartition(8).write.parquet(path)  # 8 tiny files
    import os

    before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert before == 8
    compact_table(spark, path, target_file_mb=128)
    after = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert after == 1  # tiny table → one file
    assert read_table(spark, path).count() == 1000  # content survived the swap


def test_schema_evolution_merge(spark, tmp_path):
    """mergeSchema read across files written with different schemas — the
    dynamic-source side of the F3 funnel; align_to_schema fixes the sink."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolving")
    spark.createDataFrame([Row(k=1, a="x")]).write.parquet(path)
    spark.createDataFrame([Row(k=2, a="y", b=3.5)]).write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"k", "a", "b"}
    rows = {r.k: r.b for r in merged.collect()}
    assert rows[1] is None and rows[2] == 3.5  # old file's missing col → NULL


def test_malformed_json_record_modes(spark, tmp_path):
    """Ingestion robustness (the J3 'coerce' discipline at the source):
    PERMISSIVE quarantines bad rows into _corrupt_record, DROPMALFORMED
    silently drops them, FAILFAST raises — all three declared, not coded."""
    p = tmp_path / "raw.jsonl"
    p.write_text('{"k": 1, "v": "a"}\n{not json at all}\n{"k": 2, "v": "b"}\n')
    schema = "k INT, v STRING, _corrupt_record STRING"

    permissive = spark.read.schema(schema).json(str(p)).cache()
    try:
        assert permissive.count() == 3
        bad = permissive.filter("_corrupt_record IS NOT NULL").collect()
        assert len(bad) == 1 and bad[0]._corrupt_record == "{not json at all}"
    finally:
        permissive.unpersist()

    dropped = spark.read.schema("k INT, v STRING").option("mode", "DROPMALFORMED").json(str(p))
    assert sorted(r.k for r in dropped.collect()) == [1, 2]

    import pytest as _pytest

    with _pytest.raises(Exception, match="[Mm]alformed"):
        spark.read.schema("k INT, v STRING").option("mode", "FAILFAST").json(str(p)).collect()


def test_jdbc_options_builder():
    opts = jdbc_writer_options("jdbc:postgresql://h/db", "staging.t", batchsize=500)
    assert opts["dbtable"] == "staging.t"
    assert opts["batchsize"] == "500"  # execute_values page-size analogue
    assert opts["isolationLevel"] == "READ_COMMITTED"


def test_jdbc_live_round_trip_embedded_derby(spark, tmp_path):
    """S2 JDBC executes for real, not just as an options builder: write via
    ``df.write.format("jdbc")`` into an embedded Apache Derby database (the
    driver jars ship inside Spark for the Hive metastore) and read it back
    through the JDBC source. Embedded Derby lives in the one local JVM, so
    this exercises the exact write path the reference's execute_values loop
    maps to (dag:246-276) without needing a network database; against a real
    PostgreSQL only the URL and driver class change."""
    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    df = spark.createDataFrame(
        [("1", "a", 10.5), ("2", "b", None)], "`_id` string, name string, score double"
    )
    opts = jdbc_writer_options(
        url, "app.mart_rows", batchsize=500, driver="org.apache.derby.iapi.jdbc.AutoloadedDriver"
    )
    # Derby has no isolationLevel string mapping issue, but keep the default
    df.write.format("jdbc").options(**opts).mode("overwrite").save()
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "app.mart_rows")
        .option("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
        .load()
    )
    got = {r["_id"]: (r["NAME"] if "NAME" in back.columns else r["name"], r[2]) for r in back.collect()}
    assert set(got) == {"1", "2"}
    assert got["1"][1] == 10.5 and got["2"][1] is None
    # append mode accumulates — the staging-insert arm (M1 over JDBC)
    df.write.format("jdbc").options(**opts).mode("append").save()
    assert (
        spark.read.format("jdbc").option("url", url)
        .option("dbtable", "app.mart_rows")
        .option("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
        .load().count()
    ) == 4


def test_create_table_if_not_exists_idempotent(spark, tmp_path):
    loc = str(tmp_path / "mart_tbl")
    ddl = "_id STRING, updatedat TIMESTAMP, batch_run_id STRING"
    create_table_if_not_exists(spark, "mart_tbl_test", ddl, location=loc)
    create_table_if_not_exists(spark, "mart_tbl_test", ddl, location=loc)  # no-op rerun
    cols = [f.name for f in spark.table("mart_tbl_test").schema.fields]
    assert cols == ["_id", "updatedat", "batch_run_id"]
    spark.sql("DROP TABLE mart_tbl_test")
