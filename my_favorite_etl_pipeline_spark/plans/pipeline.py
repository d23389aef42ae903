"""Reference-parity pipeline queries (SURVEY.md §2.1-§2.7).

Each query re-expresses one operator cluster of the reference DAG
(/root/reference/dag_mgo_pg_schedule_etl_qc.py, cited ``dag:NNN``) over the
driver fixture tables, with a DuckDB oracle. ``events`` plays the Mongo
collection: ``ts`` ≙ ``createdAt``, a derived ``updated_at`` ≙ ``updatedAt``,
``props`` ≙ ``requestParams``, ``event_id`` ≙ ``_id``.

Oracle-parity rules (see registry docstring): identical aliases both sides,
ROUND(x, 4) on floating aggregates, BIGINT casts on DuckDB count-ish sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from ..functions.normalize import (
    align_to_schema,
    coerce_timestamps,
    flatten_struct,
    normalize_columns,
    stringify_id,
    structs_to_json,
    with_lineage,
)
from ..operators.dq import DQSuite
from ..operators.incremental import in_window, incremental_extract
from ..operators.merge import merge_upsert
from ..registry import register
from ..sources.tables import load

WIN_START = "2024-01-08 00:00:00"
WIN_END = "2024-01-15 00:00:00"

# derived "updatedAt": ts shifted by the JSON props field k (hours) — gives the
# $or predicate a genuinely second timestamp column, like dag:124-129's
# createdAt/updatedAt pair.
_UPDATED_AT = "ts + make_dt_interval(0, CAST(get_json_object(props, '$.k') AS INT), 0, 0)"
_UPDATED_AT_DUCK = "ts + to_hours(CAST(json_extract_string(props, '$.k') AS BIGINT))"


def _events_with_updated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").withColumn("updated_at", F.expr(_UPDATED_AT))


@register(
    "incremental_extract",
    oracle=f"""
    WITH src AS (
      SELECT event_id, ts, {_UPDATED_AT_DUCK} AS updated_at, event_type, value
      FROM events
    )
    SELECT * FROM src
    WHERE (ts >= TIMESTAMP '{WIN_START}' AND ts < TIMESTAMP '{WIN_END}')
       OR (updated_at >= TIMESTAMP '{WIN_START}' AND updated_at < TIMESTAMP '{WIN_END}')
    """,
)
def q_incremental_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2 — half-open $or change-capture window (dag:124-129).

    'Created or modified in this window': the OR of two range predicates
    still reaches the parquet scan as a pushed filter.
    """
    df = _events_with_updated(spark, sf_dir)
    out = incremental_extract(df, ["ts", "updated_at"], WIN_START, WIN_END)
    return out.select("event_id", "ts", "updated_at", "event_type", "value")


@register(
    "transform_chain",
    oracle="""
    SELECT
      CAST(event_id AS VARCHAR) AS event_id_str,
      date_trunc('second', ts) AS ts_sec,
      CAST(json_extract_string(props, '$.k') AS INT) AS k,
      try_strptime(event_type, '%Y-%m-%d %H:%M:%S') AS coerced_ts,
      to_json(struct_pack(event_type := event_type,
                          k := CAST(json_extract_string(props, '$.k') AS INT))) AS packed_json,
      'run-2024-01-15T00' AS batch_run_id
    FROM events
    """,
)
def q_transform_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+P3+P4+J1+J2+J3 — the reference transform task as one projection.

    Name normalization (dag:62-69), id stringify (dag:165), JSON field
    extraction (dag:296-307), lossy timestamp coercion (dag:176-180),
    struct→JSON serialization (dag:71-74), lineage column (dag:184).
    All one Project node — zero UDFs, zero shuffles.
    """
    df = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return df.select(
        F.col("event_id").cast("string").alias("event_id_str"),  # P4
        F.date_trunc("second", F.col("ts")).alias("ts_sec"),
        k.alias("k"),  # J2
        F.try_to_timestamp(F.col("event_type")).alias("coerced_ts"),  # J3 → NULL
        F.to_json(F.struct(F.col("event_type"), k.alias("k"))).alias("packed_json"),  # J1
        F.lit("run-2024-01-15T00").alias("batch_run_id"),  # P3
    )


@register(
    "merge_upsert",
    oracle=f"""
    WITH mart AS (
      SELECT * FROM events WHERE event_id % 3 <> 0
    ), batch AS (
      SELECT event_id, ts, user_id, event_type, value * 2 AS value,
             '{{"k": -1}}' AS props
      FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
    )
    SELECT
      COALESCE(m.event_id, b.event_id) AS event_id,
      CASE WHEN m.event_id IS NULL THEN b.ts ELSE m.ts END AS ts,
      CASE WHEN m.event_id IS NULL THEN b.user_id ELSE m.user_id END AS user_id,
      CASE WHEN m.event_id IS NULL THEN b.event_type ELSE m.event_type END AS event_type,
      CASE WHEN b.event_id IS NOT NULL THEN b.value ELSE m.value END AS value,
      CASE WHEN b.event_id IS NOT NULL THEN b.props ELSE m.props END AS props
    FROM mart m FULL OUTER JOIN batch b ON m.event_id = b.event_id
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2+JN1+JN2 — keyed upsert with PARTIAL update (dag:278-316).

    The reference's ON CONFLICT arm updates only 4 of 26 columns
    (dag:311-315); here ``value`` and ``props`` update, while ``ts``,
    ``user_id``, ``event_type`` keep mart values — the per-column coalesce
    the survey's watch-list warns about. One full-outer sort-merge join.
    """
    events = load(spark, sf_dir, "events")
    mart = events.filter(F.col("event_id") % 3 != 0)
    batch = events.filter(F.col("ts") >= F.lit("2024-01-20 00:00:00").cast("timestamp")).select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        (F.col("value") * 2).alias("value"),
        F.lit('{"k": -1}').alias("props"),
    )
    return merge_upsert(mart, batch, key="event_id", update_cols=["value", "props"])


@register(
    "dq_gate",
    oracle=f"""
    WITH src AS (
      SELECT *, json_extract_string(props, '$.k') AS k_str FROM events
    )
    SELECT
      CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_id,
      CAST(COUNT(event_id) - COUNT(DISTINCT event_id) AS BIGINT) AS dup_event_id,
      CAST(SUM(CASE WHEN event_type IS NOT NULL
                     AND NOT regexp_matches(event_type, '^[a-z]+$')
               THEN 1 ELSE 0 END) AS BIGINT) AS regex_event_type,
      CAST(SUM(CASE WHEN k_str IS NOT NULL AND TRY_CAST(k_str AS INT) IS NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS badtype_k_str,
      CAST(CASE WHEN MAX(ts) IS NULL OR MAX(ts) < TIMESTAMP '2024-01-25 00:00:00'
           THEN 1 ELSE 0 END AS BIGINT) AS stale_ts
    FROM src
    """,
)
def q_dq_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 — the five Soda check classes (dag:369) as ONE aggregation.

    Completeness, uniqueness, regex, type-validity, freshness — compiled to
    conditional sums; a single pass with map-side partial agg, returning one
    scalar row. Zero violations expected on the clean fixture.
    """
    df = load(spark, sf_dir, "events").withColumn(
        "k_str", F.get_json_object("props", "$.k")
    )
    suite = (
        DQSuite()
        .add_not_null("event_id")
        .add_unique("event_id")
        .add_regex("event_type", "^[a-z]+$")
        .add_type_valid("k_str", "int")
        .add_freshness("ts", "2024-01-25 00:00:00")
    )
    return df.agg(*suite.violation_columns())


@register(
    "reconciliation",
    oracle=f"""
    SELECT
      CAST(COUNT(CASE WHEN ts >= TIMESTAMP '{WIN_START}' AND ts < TIMESTAMP '{WIN_END}'
                 THEN 1 END) AS BIGINT) AS src_count,
      CAST(COUNT(DISTINCT CASE WHEN ts >= TIMESTAMP '{WIN_START}' AND ts < TIMESTAMP '{WIN_END}'
                 THEN event_id END) AS BIGINT) AS dst_count,
      CAST(CASE WHEN COUNT(CASE WHEN ts >= TIMESTAMP '{WIN_START}' AND ts < TIMESTAMP '{WIN_END}' THEN 1 END)
              = COUNT(DISTINCT CASE WHEN ts >= TIMESTAMP '{WIN_START}' AND ts < TIMESTAMP '{WIN_END}' THEN event_id END)
           THEN 1 ELSE 0 END AS INT) AS matched
    FROM events
    """,
)
def q_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2+A3 — source-vs-sink count reconciliation (dag:375-422).

    Source side: windowed count (A1 ≙ Mongo count_documents); sink side:
    per-run distinct-key count (A2 ≙ the mart's per-run count); equality is
    the gate (A3). Both sides in one aggregation pass here.
    """
    df = load(spark, sf_dir, "events")
    w = in_window("ts", WIN_START, WIN_END)
    src = F.count(F.when(w, 1)).alias("src_count")
    dst = F.count_distinct(F.when(w, F.col("event_id"))).alias("dst_count")
    return df.agg(src, dst).withColumn(
        "matched", (F.col("src_count") == F.col("dst_count")).cast("int")
    )


# Mart schema for the nested chain — the dag:212-243 shape: each *by struct
# flattened to 4 scalar columns, requestparams kept as JSON text, plus a
# lineage column and a column absent at source (approvedat → typed NULL).
_NESTED_MART = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("createdby_id", T.StringType()),
        T.StructField("createdby_name", T.StringType()),
        T.StructField("createdby_role", T.StringType()),
        T.StructField("createdby_client", T.StringType()),
        T.StructField("statuschangedby_id", T.StringType()),
        T.StructField("statuschangedby_name", T.StringType()),
        T.StructField("statuschangedby_role", T.StringType()),
        T.StructField("statuschangedby_client", T.StringType()),
        T.StructField("updatedby_id", T.StringType()),
        T.StructField("updatedby_name", T.StringType()),
        T.StructField("updatedby_role", T.StringType()),
        T.StructField("updatedby_client", T.StringType()),
        T.StructField("requestparams", T.StringType()),
        T.StructField("statuschangedat", T.TimestampType()),
        T.StructField("approvedat", T.TimestampType()),
        T.StructField("batch_run_id", T.StringType()),
    ]
)


def _nested_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo-shaped documents with REAL StructType nesting (dag:71-74).

    The driver fixtures are flat TPC-H-ish tables, so the BSON document shape
    is synthesized deterministically from ``customer`` inside the query:
    camelCase keys, three nested ``*By`` subdocuments, a ``requestParams``
    struct, and an ISO-string timestamp — the exact dynamic-source shape the
    transform chain exists to normalize. No randomness: every field is a pure
    function of customer columns, so the DuckDB oracle recomputes the
    flattened result independently from the same base table.
    """
    c = load(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("_id"),
        F.struct(
            (F.col("c_custkey") % 97).alias("id"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("role"),
            F.substring("c_name", 1, 8).alias("client"),
        ).alias("createdBy"),
        F.struct(
            F.col("c_nationkey").alias("id"),
            F.upper("c_mktsegment").alias("name"),
            F.lower("c_mktsegment").alias("role"),
            (F.col("c_nationkey") % 7).alias("client"),
        ).alias("statusChangedBy"),
        F.struct(
            (F.col("c_custkey") % 89).alias("id"),
            F.reverse(F.col("c_name")).alias("name"),
            F.col("c_mktsegment").alias("role"),
            (F.col("c_custkey") % 13).alias("client"),
        ).alias("updatedBy"),
        F.struct(
            F.col("c_mktsegment").alias("channel"),
            (F.col("c_custkey") % 5).alias("priority"),
        ).alias("requestParams"),
        F.date_format(
            F.expr(
                "TIMESTAMP '2024-01-01 00:00:00'"
                " + make_dt_interval(0, CAST(c_custkey % 240 AS INT), 0, 0)"
            ),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("statusChangedAt"),
    )


@register(
    "nested_transform_chain",
    oracle="""
    SELECT
      CAST(c_custkey AS VARCHAR) AS "_id",
      CAST(c_custkey % 97 AS VARCHAR) AS createdby_id,
      c_name AS createdby_name,
      c_mktsegment AS createdby_role,
      substring(c_name, 1, 8) AS createdby_client,
      CAST(c_nationkey AS VARCHAR) AS statuschangedby_id,
      upper(c_mktsegment) AS statuschangedby_name,
      lower(c_mktsegment) AS statuschangedby_role,
      CAST(c_nationkey % 7 AS VARCHAR) AS statuschangedby_client,
      CAST(c_custkey % 89 AS VARCHAR) AS updatedby_id,
      reverse(c_name) AS updatedby_name,
      c_mktsegment AS updatedby_role,
      CAST(c_custkey % 13 AS VARCHAR) AS updatedby_client,
      to_json(struct_pack(channel := c_mktsegment, priority := c_custkey % 5))
        AS requestparams,
      TIMESTAMP '2024-01-01 00:00:00' + to_hours(c_custkey % 240) AS statuschangedat,
      CAST(NULL AS TIMESTAMP) AS approvedat,
      'run-2024-01-15T00' AS batch_run_id
    FROM customer
    """,
)
def q_nested_transform_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J2+J3+F3+P2+P3+P4 on GENUINELY nested structs (dag:71-74, 296-307).

    The full reference chain over Mongo-shaped documents: column-name
    normalization (camelCase → snake), ObjectId stringify, three
    struct→4-scalar flattenings (the dag:228-241 mart shape), struct→JSON
    for ``requestparams``, lossy ISO-string timestamp coercion, lineage
    column, and the dynamic→fixed schema funnel (absent ``approvedat`` →
    typed NULL). The whole chain collapses to ONE Project over the scan —
    zero shuffles, zero UDFs; nested-field access is columnar.
    """
    out = normalize_columns(_nested_docs(spark, sf_dir))
    out = stringify_id(out)
    for col in ("createdby", "statuschangedby", "updatedby"):
        out = flatten_struct(out, col, ["id", "name", "role", "client"])
    out = structs_to_json(out, cols=["requestparams"])
    out = coerce_timestamps(out, ["statuschangedat", "approvedat"])
    out = with_lineage(out, "run-2024-01-15T00")
    return align_to_schema(out, _NESTED_MART)


@register(
    "typed_struct_props_chain",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket
    FROM events
    """,
)
def q_typed_struct_props_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 typed twin (SURVEY §1.2/§4.1) — ``from_json`` → STRUCT instead of
    per-path ``get_json_object`` string probing: the "keep structs typed
    end-to-end" variant of the props extraction (reference keeps
    ``requestparams`` as JSONB, dag:226). The declared schema is WIDER than
    what's consumed (``extra`` is never referenced) — Catalyst's JSON
    expression optimization prunes the parse schema down to the referenced
    fields and column pruning carries only (event_id, event_type, props)
    into the parquet scan; tests/test_transform.py asserts both on the
    optimized/executed plans. One Project over the scan, zero shuffles;
    parsing happens ONCE per row even with several fields consumed, where
    N ``get_json_object`` calls parse N times.
    """
    ev = load(spark, sf_dir, "events")
    # parse consumed through ONE field reference, derived columns built from
    # the aliased field — referencing the struct twice would block project
    # collapse (from_json is not duplicable-cheap) and hide the
    # GetStructField(JsonToStructs) pattern the pruning rule rewrites
    parsed = ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.from_json("props", "struct<k:int, extra:string>").getField("k").alias("k_val"),
    )
    return parsed.select(
        "event_id", "event_type", "k_val", (F.col("k_val") % 10).alias("k_bucket")
    )


@register(
    "variant_props_chain",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket
    FROM events
    """,
)
def q_variant_props_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 VARIANT twin (SURVEY §1.2) — the Spark 4 ``VariantType`` path for
    semi-structured props: ``try_parse_json`` → binary variant →
    ``variant_get`` typed extraction. Same results as
    ``typed_struct_props_chain`` but schema-ON-READ: no declared struct, so
    heterogeneous/evolving JSON shapes (the reference's JSONB posture,
    dag:226) need no migration — and parquet-stored variants shred into
    columnar subfields at 100 TB. ``try_`` variant of the parse matches the
    pipeline's "coerce, don't throw" semantics (malformed JSON → NULL row
    values, not a failed batch).
    """
    ev = load(spark, sf_dir, "events")
    kv = F.expr("variant_get(try_parse_json(props), '$.k', 'int')")
    parsed = ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        kv.alias("k_val"),
    )
    return parsed.select(
        "event_id", "event_type", "k_val", (F.col("k_val") % 10).alias("k_bucket")
    )


@register(
    "sorted_extract",
    oracle="""
    SELECT event_id, ts, event_type
    FROM events
    ORDER BY ts ASC, event_id ASC
    LIMIT 100
    """,
)
def q_sorted_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 — multi-key total sort with deterministic tiebreak (dag:132).

    ``orderBy(ts, event_id)`` + limit: Catalyst plans TakeOrderedAndProject
    (per-partition top-k + merge), NOT a global sort — the at-scale shape.
    """
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .limit(100)
    )


@register(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(ROUND(MIN(o_totalprice), 2) AS VARCHAR),
           CAST(ROUND(MAX(o_totalprice), 2) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
           CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR)
    FROM orders
    ORDER BY column_name
    """,
)
def q_profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1+ — column profiling, the generalized form of the reference's Soda
    checks (dag:338-357 runs row_count/missing/duplicate per mart column):
    one row per profiled column with row/null/distinct counts and
    stringified min/max — the stats a DQ gate or a CBO would ingest.

    ONE pass over the table: all per-column aggregates run in a single
    HashAggregate (count/min/max are cheap; the distincts expand to an
    Expand + two-phase agg, still one scan), then a tiny literal unpivot.
    At 100 TB swap COUNT(DISTINCT) for approx_count_distinct — same shape,
    constant memory; exact kept here so DuckDB can verify values.
    """
    orders = load(spark, sf_dir, "orders")
    # min/max run on the NATIVE type (string-typed min would order "9999"
    # above "14999"); the formatter stringifies the aggregated result, the
    # same order of operations as the oracle's CAST(MIN(..) AS VARCHAR)
    spec = [
        ("o_orderkey", lambda c: c.cast("string")),
        ("o_orderstatus", lambda c: c),
        ("o_totalprice", lambda c: F.round(c, 2).cast("string")),
        ("o_orderdate", lambda c: c.cast("string")),
    ]
    aggs = []
    for name, fmt in spec:
        aggs += [
            F.count(F.lit(1)).alias(f"{name}__rows"),
            (F.count(F.lit(1)) - F.count(name)).alias(f"{name}__nulls"),
            F.countDistinct(name).alias(f"{name}__distinct"),
            fmt(F.min(name)).alias(f"{name}__min"),
            fmt(F.max(name)).alias(f"{name}__max"),
        ]
    one = orders.agg(*aggs)
    rows = None
    for name, _fmt in spec:
        r = one.select(
            F.lit(name).alias("column_name"),
            F.col(f"{name}__rows").cast("long").alias("n_rows"),
            F.col(f"{name}__nulls").cast("long").alias("n_nulls"),
            F.col(f"{name}__distinct").cast("long").alias("n_distinct"),
            F.col(f"{name}__min").alias("min_value"),
            F.col(f"{name}__max").alias("max_value"),
        )
        rows = r if rows is None else rows.union(r)
    return rows.orderBy("column_name")


# ---------------------------------------------------------------------------
# mart_snapshot_diff — M4's time travel as a driver-visible changelog

_DIFF_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """The CDC changelog between two snapshots sharing the diff schema:
    one full-outer key join, every key classified added/deleted/updated on
    the tracked columns. Pure plan construction — no actions, no mart —
    so the census can audit the diff join's physical shape directly
    (ADVICE r12: the join is the 100 TB cost of this operator, and it must
    not be excluded from the zero-cartesian gate)."""
    a, b = old.alias("a"), new.alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    return joined.select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("a.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("deleted"))
        .otherwise(F.lit("updated"))
        .alias("change"),
        F.col("a.o_orderstatus").alias("old_status"),
        F.col("b.o_orderstatus").alias("new_status"),
        F.col("a.o_orderpriority").alias("old_priority"),
        F.col("b.o_orderpriority").alias("new_priority"),
    ).filter(
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
        | (F.col("a.o_orderpriority") != F.col("b.o_orderpriority"))
    )


def _diff_version_defs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The v1/v2 logical version DEFINITIONS (shared by the physical entry
    and the census substitute, so the two cannot drift)."""
    orders = load(spark, sf_dir, "orders").select(*_DIFF_COLS)
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    upd = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        F.lit("0-DIFF").alias("o_orderpriority"),
    )
    return v1, upd


def _diff_v2(v1: DataFrame, upd: DataFrame) -> DataFrame:
    """v2's definition from any v1 frame (logical, or the committed
    read-back): one merge_upsert batch then the scoped delete. One body
    for the census substitute AND the physical entry so the censused plan
    cannot drift from the plan the driver runs (self-review r13)."""
    merged = merge_upsert(
        v1, upd, key="o_orderkey", update_cols=["o_orderstatus", "o_orderpriority"]
    )
    return merged.filter(F.col("o_orderkey") % 7 != 1)


def mart_snapshot_diff_plan_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Census substitute for ``mart_snapshot_diff``: the IDENTICAL diff
    plan built over the logical version definitions instead of committed
    mart snapshots (committing runs jobs; planning must not). The physical
    entry's only divergence is that v1/v2 arrive as mart parquet scans —
    same join keys, same shape class."""
    v1, upd = _diff_version_defs(spark, sf_dir)
    return snapshot_diff(v1, _diff_v2(v1, upd)).orderBy("o_orderkey")


@register(
    "mart_snapshot_diff",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_orderstatus, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    u AS (
      SELECT o_orderkey, 'U' AS st, '0-DIFF' AS pr
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    v2 AS (
      SELECT COALESCE(m.o_orderkey, u.o_orderkey) AS o_orderkey,
             CASE WHEN u.o_orderkey IS NOT NULL THEN u.st
                  ELSE m.o_orderstatus END AS o_orderstatus,
             CASE WHEN u.o_orderkey IS NOT NULL THEN u.pr
                  ELSE m.o_orderpriority END AS o_orderpriority
      FROM v1 m FULL OUTER JOIN u ON m.o_orderkey = u.o_orderkey
      WHERE COALESCE(m.o_orderkey, u.o_orderkey) % 7 <> 1
    )
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'deleted'
                ELSE 'updated' END AS change,
           a.o_orderstatus AS old_status, b.o_orderstatus AS new_status,
           a.o_orderpriority AS old_priority, b.o_orderpriority AS new_priority
    FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.o_orderstatus <> b.o_orderstatus
       OR a.o_orderpriority <> b.o_orderpriority
    ORDER BY o_orderkey
    """,
)
def q_mart_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4+ (r12) — snapshot DIFF over the VersionedMart's time travel: the
    CDC changelog between two committed versions, computed by reading BOTH
    snapshots back through ``read(version=...)`` and classifying every key
    as added / deleted / updated (on the tracked update columns). This is
    the "what did last night's run change" audit a lakehouse table's
    history view answers (Delta CDF / Iceberg changelog) — here exercised
    against the mart's own manifest-committed versions, so the entry
    drives commit → time travel → diff end-to-end on the oracle path
    rather than in tests only.

    Construction (deterministic, batch-arrival independent): v1 = even
    order keys; one merge_upsert batch (keys % 3 = 0 → status 'U',
    priority '0-DIFF') then a scoped delete (keys % 7 = 1) commits as v2.
    The oracle replays both version DEFINITIONS in SQL — the diff of two
    committed physical snapshots must equal the diff of their logical
    definitions, which is exactly the atomicity+time-travel contract M4
    claims (a torn or misresolved version would break the equality).

    Plan at 100 TB: two snapshot scans + ONE full-outer key join, the
    same shuffle class as the merge that produced v2; output is
    changed-keys-sized. With Delta/Iceberg swapped in (see merge_upsert's
    swap-in note) this query becomes the format's native changelog read
    and the join disappears into file-level change metadata.
    """
    import shutil
    import tempfile

    from ..sources.mart import VersionedMart

    root = tempfile.mkdtemp(prefix="mfe_diff_")
    try:
        vm = VersionedMart(f"{root}/mart")
        v1, upd = _diff_version_defs(spark, sf_dir)
        # keep=2 retains v1 through v2's post-commit vacuum — the diff
        # needs both snapshots time-travel-readable
        vm.commit(v1, "v1", keep=2)
        vm.commit(_diff_v2(vm.read(spark), upd), "v2", keep=2)

        diff = snapshot_diff(
            vm.read(spark, version="v1"), vm.read(spark, version="v2")
        )
        # the changelog must leave the temp root before cleanup (the
        # stream_merge_into_mart precedent); changed-keys-sized here
        return diff.orderBy("o_orderkey").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
