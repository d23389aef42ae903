"""Sinks and format surface (SURVEY.md §2.1 S2/S3).

The reference lands rows with psycopg2 ``execute_values`` batched INSERTs
(dag_mgo_pg_schedule_etl_qc.py:246-276) and idempotent DDL
(dag:211-268). Spark-first:

- append/overwrite writers for parquet/csv/json/orc — the parquet writer is
  the production path (columnar, statistics, partition layout); csv/json are
  interchange formats.
- ``jdbc_writer_options`` maps the reference's ``execute_values`` page-size
  batching onto the Spark JDBC sink's ``batchsize`` (dag:275-276 analogue);
  kept as an options builder because no database runs in the harness.
- ``create_table_if_not_exists`` is the S3 DDL analogue over the session
  catalog (CREATE TABLE IF NOT EXISTS ... USING parquet).

Scale notes: every writer takes ``partition_by`` — the reference's run-id
tagging (dag:266) becomes partition layout so downstream scoped reads and
deletes are partition-pruned metadata ops (see operators.merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SUPPORTED_FORMATS = ("parquet", "csv", "json", "orc")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "append",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """S2 — format-dispatched batch sink.

    csv gets headers by default (lossy on nested types — callers serialize
    structs via functions.normalize.structs_to_json first, exactly like the
    reference flattens before its INSERT).
    """
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {SUPPORTED_FORMATS}")
    w = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        w = w.option("header", "true")
    for k, v in options.items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", **options: str):
    """Scan-side twin of :func:`write_table`; csv re-infers with header."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {SUPPORTED_FORMATS}")
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", "true").option("inferSchema", "true")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)


def compact_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_file_mb: int = 128,
) -> int:
    """Small-file compaction — the streaming-sink janitor.

    Micro-batch sinks accrete tiny files (one per trigger per partition);
    scan cost then scales with file COUNT, not bytes. Rewrite the table at
    ``target_file_mb`` per file and return the new file count.

    Swap is a rename CHAIN (old aside → tmp in → delete old), so the window
    where ``path`` is absent is one ``rename`` syscall, not the full delete
    — and a crash leaves either the old or the new table recoverable on
    disk, never neither. A posix rename is atomic per call but the chain as
    a whole is not a transaction; true concurrent-reader isolation needs a
    manifest-committing table format (Delta/Iceberg), which is where this
    delegates at 100 TB. This helper runs per-partition (compact
    yesterday's partition), never whole-table.
    """
    import shutil
    from pathlib import Path

    df = read_table(spark, path, fmt=fmt)
    total_bytes = sum(f.stat().st_size for f in Path(path).rglob("*") if f.is_file())
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    tmp = f"{path}__compacting"
    old = f"{path}__replaced"
    df.repartition(n_files).write.format(fmt).mode("overwrite").save(tmp)
    shutil.rmtree(old, ignore_errors=True)  # leftover from a prior crash
    Path(path).rename(old)
    try:
        Path(tmp).rename(path)
    except OSError:
        Path(old).rename(path)  # roll back: old table returns intact
        raise
    shutil.rmtree(old)
    return n_files


def jdbc_writer_options(
    url: str,
    table: str,
    batchsize: int = 1000,
    isolation_level: str = "READ_COMMITTED",
    **extra: str,
) -> dict[str, str]:
    """S2 (JDBC flavor) — options for ``df.write.format("jdbc")``.

    ``batchsize`` is the ``execute_values`` page-size analogue (dag:275-276):
    rows per round-trip statement. Usage::

        df.write.format("jdbc").options(**jdbc_writer_options(url, tbl)) \\
          .mode("append").save()

    Kept as a builder (not a call) because the harness has no database; the
    driver-facing write path is parquet.
    """
    return {
        "url": url,
        "dbtable": table,
        "batchsize": str(batchsize),
        "isolationLevel": isolation_level,
        **extra,
    }


def create_table_if_not_exists(
    spark: SparkSession,
    name: str,
    ddl_columns: str,
    fmt: str = "parquet",
    location: str | None = None,
    partition_by: str | None = None,
) -> None:
    """S3 — idempotent DDL (dag:211-244, 247-268).

    ``ddl_columns`` is the column list as SQL text (e.g. ``"_id STRING,
    updatedat TIMESTAMP"``). Re-running is a no-op — the reference's
    CREATE IF NOT EXISTS contract.
    """
    loc = f" LOCATION '{location}'" if location else ""
    part = f" PARTITIONED BY ({partition_by})" if partition_by else ""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {name} ({ddl_columns}) USING {fmt}{part}{loc}")
