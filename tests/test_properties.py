"""Property-based tests (SURVEY §5.2): JSON roundtrip and merge idempotence.

hypothesis drives the INPUT GENERATION only; each property creates small
DataFrames, so examples are capped to keep Spark-job count sane.
"""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# printable, no surrogates, modest size — valid Spark/JSON strings
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")), min_size=0, max_size=20
)


@settings(**SETTINGS)
@given(st.lists(st.tuples(TEXT, TEXT, TEXT, TEXT), min_size=1, max_size=5))
def test_struct_to_json_roundtrip(spark, vals):
    """to_json → get_json_object recovers every struct field (J1/J2 inverse)."""
    df = spark.createDataFrame(
        [Row(s=Row(id=a, name=b, role=c, client=d)) for a, b, c, d in vals],
        "s struct<id:string,name:string,role:string,client:string>",
    )
    out = df.select(
        F.col("s.id").alias("direct"),
        F.get_json_object(F.to_json("s"), "$.id").alias("via_json"),
    ).collect()
    for r in out:
        # get_json_object returns NULL for JSON null; empty string survives
        assert r.via_json == r.direct


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(-100, 100), st.integers(-100, 100)),
        min_size=1,
        max_size=8,
    )
)
def test_merge_idempotent_property(spark, rows):
    """merge(merge(M,B),B) == merge(M,B) for arbitrary key overlap."""
    from my_favorite_etl_pipeline_spark.operators.merge import latest_per_key, merge_upsert

    schema = "k int, a int, b int"
    mart = spark.createDataFrame([Row(k=9, a=0, b=0)], schema)
    batch = latest_per_key(
        spark.createDataFrame([Row(k=k, a=a, b=b) for k, a, b in rows], schema), "k", ["a"]
    )
    once = merge_upsert(mart, batch, "k", ["a"])
    twice = merge_upsert(once, batch, "k", ["a"])
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


ASCII = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=20)


@settings(**SETTINGS)
@given(st.lists(ASCII, min_size=1, max_size=6))
def test_fingerprint_equals_normalized_equality(spark, texts):
    """fingerprint(x) == fingerprint(y)  ⟺  normalize(x) == normalize(y).

    ASCII-restricted: Python's strip()/lower() and Spark's trim()/lower()
    agree there; Unicode whitespace/case-mapping edge cases differ between
    the two runtimes and are not part of the operator's contract.
    """
    from my_favorite_etl_pipeline_spark.functions.text import fingerprint

    df = spark.createDataFrame([Row(t=t) for t in texts], "t string")
    rows = df.select("t", fingerprint("t").alias("f")).collect()
    for r1 in rows:
        for r2 in rows:
            same_norm = r1.t.strip().lower() == r2.t.strip().lower()
            assert (r1.f == r2.f) == same_norm
