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


@settings(**SETTINGS)
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=3, max_size=12),
        min_size=2,
        max_size=8,
    )
)
def test_prefix_filter_complete_vs_bruteforce(spark, token_lists):
    """PPJoin completeness property: prefix_filter_pairs candidates must be
    a SUPERSET of every pair with Jaccard >= t (here t=0.5, small-vocab
    docs make collisions and near-dups likely)."""
    from my_favorite_etl_pipeline_spark.operators.dedup import prefix_filter_pairs
    from my_favorite_etl_pipeline_spark.functions.text import shingles

    rows = [Row(doc_id=i, text=" ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows)
    cand = {
        (r.id_a, r.id_b)
        for r in prefix_filter_pairs(df, "doc_id", "text", threshold=0.5).collect()
    }
    sh = {r.doc_id: set(r.s) for r in df.select("doc_id", shingles("text").alias("s")).collect()}
    ids = sorted(sh)
    for i in ids:
        for j in ids:
            if i >= j or not (sh[i] | sh[j]):
                continue
            jac = len(sh[i] & sh[j]) / len(sh[i] | sh[j])
            if jac >= 0.5:
                assert (i, j) in cand, (i, j, jac)


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)), min_size=0, max_size=30
    )
)
def test_star_cc_equals_propagation_property(spark, edge_list):
    """Both CC algorithms must produce the identical component map on any
    graph (self-loops and duplicate edges included)."""
    from my_favorite_etl_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    v = spark.range(26).withColumnRenamed("id", "doc_id")
    if edge_list:
        e = spark.createDataFrame(edge_list, "src: long, dst: long")
    else:
        e = spark.createDataFrame([], "src: long, dst: long")
    a = {(r.node, r.comp) for r in connected_components(e, vertices=v, max_iter=40).collect()}
    b = {(r.node, r.comp) for r in connected_components_star(e, vertices=v).collect()}
    assert a == b


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein (full DP) for the funnel property."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


# lowercase ASCII letters + space: the count-filter alphabet's home turf,
# and codepoints == bytes so the cross-engine contract regime is exercised
ASCII_TEXT = st.text(alphabet="abcdefghi etaoinsrhldcum", min_size=0, max_size=24)


@settings(**SETTINGS)
@given(st.lists(ASCII_TEXT, min_size=2, max_size=8, unique=True))
def test_edit_distance_funnel_complete_vs_bruteforce(spark, texts):
    """The banded funnel (length-band blocking + Ukkonen count filter +
    threshold verify) must return EXACTLY the brute-force all-pairs
    answer on arbitrary ASCII inputs — no pair lost to a band boundary or
    an over-tight count bound, no spurious pair admitted."""
    from my_favorite_etl_pipeline_spark.operators.dedup import edit_distance_pairs

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows)
    got = {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in edit_distance_pairs(df, "doc_id", "text", tau=3, band=4).collect()
    }
    expected = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            d = _lev(texts[i], texts[j])
            if d <= 3:
                expected[(i, j)] = d
    assert got == expected


@settings(**SETTINGS)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**53 - 1), min_size=1, max_size=16
    )
)
def test_int_isqrt_exact_property(spark, values):
    """int_isqrt must equal math.isqrt for ANY nonnegative BIGINT < 2^53 —
    the keystone exactness claim under the graph family's integer norm
    contract (FLOOR(SQRT(double)) ± 1 correction)."""
    import math

    from my_favorite_etl_pipeline_spark.operators.similarity import int_isqrt

    df = spark.createDataFrame([Row(x=v) for v in values])
    got = {r.x: r.s for r in df.select("x", int_isqrt(F.col("x")).alias("s")).collect()}
    assert got == {v: math.isqrt(v) for v in values}
