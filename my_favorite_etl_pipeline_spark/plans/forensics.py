"""[EXT] round 11 — driver-divergence FORENSICS (VERDICT r10 items 1 & 4).

CORRECTNESS_r9 and _r10 each carried hash-red rows for the graph-ANN /
trained-classifier families that pass every local harness (full sf0.01 and
sf0.1 oracle sweeps, partitioning determinism, pytest) — a divergence that
exists only in the driver's environment and has survived two rounds of
hypothesis-fixing (4-dp float rounding r9→r10, memo races r10). This module
stops guessing and makes the driver itself report WHERE the trajectory
diverges, two ways:

1. **Trajectory stage entries** — thin, oracle-checked sub-queries exposing
   intermediate state of the two red pipelines: the classifier's feature
   table checksum and epoch-1/epoch-8 weight prefixes, and the kNN graph's
   cell assignment, seed-edge scores, and round-1 working list. Whatever
   pattern CORRECTNESS_r11 returns converts an unobservable environment
   difference into a located defect (features red ⇒ tokenization/hashing;
   epoch-1 green + final red ⇒ late-epoch; seeds red ⇒ scoring; round-1
   red ⇒ iteration).

2. **Engine-behavior probes** — queries whose VALUE fingerprints a specific
   engine behavior both sides must share: input-data checksums, portable-md5
   bucketing, whitespace tokenization, ROUND half-case semantics, float
   summation ORDER (a cancellation residual that changes wildly under
   pairwise vs sequential summation), and the RETIRED r9/r10 float-cosine
   contract replayed verbatim. Each probe passes trivially when the
   driver's engines behave like the local ones and flips red on exactly
   one behavioral difference — e.g. a driver DuckDB whose LIST_SUM is not
   left-to-right sequential reddens ``oracle_probe_float_sum_order`` and
   ``oracle_probe_float_cosine_x1e4`` while every integer-contract entry
   stays green, confirming the r10 suspect that local checks could not
   reach (the driver's DuckDB build is unobservable from here).

These entries are diagnostic instrumentation, not operator surface; they are
deliberately tiny (single-row checksums or model-sized prefixes) and cost
≈ nothing at any scale — every aggregate is one corpus pass with a bounded
output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..registry import register
from ..sources.tables import load
from .llm_ext5 import _duck_md5_32, _spark_md5_32

# ---------------------------------------------------------------------------
# 1a. classifier trajectory: feature-space checksum + weight-prefix entries


def _qc_checksum_oracle() -> str:
    from .llm_ext10 import _qc_prefix_sql

    return f"""
    {_qc_prefix_sql()}
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fx) AS n_feat_rows,
           (SELECT CAST(SUM(doc_id * b) AS BIGINT) FROM fx) AS xb_checksum,
           (SELECT CAST(SUM(b * b) AS BIGINT) FROM fx) AS b2_checksum,
           (SELECT CAST(SUM(y) AS BIGINT) FROM lab) AS y_sum,
           (SELECT CAST(n AS BIGINT) FROM nn) AS n_docs
    """


@register("qc_features_checksum", oracle=_qc_checksum_oracle())
def q_qc_features_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forensic (r11, VERDICT r10 item 1) — checksums of the trained
    classifier's INPUTS: the hashed binary feature table fx(doc_id, b),
    the weak labels, and the corpus size, exactly as
    ``quality_classifier_train_gd`` consumes them. Red here ⇒ the
    divergence is upstream of the GD update rule entirely (tokenization,
    md5 bucketing, or label parsing differ in the driver env); green here
    with a red final-weights row ⇒ the divergence is inside the epoch
    iteration. One corpus pass, single-row output."""
    from .llm_ext10 import _qc_features

    fx, lab, n = _qc_features(spark, sf_dir)
    agg = fx.agg(
        F.count(F.lit(1)).cast("long").alias("n_feat_rows"),
        F.sum(F.col("doc_id") * F.col("b")).cast("long").alias("xb_checksum"),
        F.sum(F.col("b") * F.col("b")).cast("long").alias("b2_checksum"),
    )
    ysum = lab.agg(F.sum("y").cast("long").alias("y_sum"))
    return agg.crossJoin(ysum).withColumn("n_docs", F.lit(n).cast("long"))


def _qc_weights_prefix_oracle(epochs: int) -> str:
    from .llm_ext10 import _qc_epoch_cte, _qc_prefix_sql

    body = "".join(_qc_epoch_cte(e) for e in range(1, epochs + 1))
    return f"""
    {_qc_prefix_sql()}{body}
    SELECT b AS bucket, w AS weight_x1e6 FROM w{epochs} ORDER BY bucket
    """


def _qc_weights_prefix(spark: SparkSession, sf_dir: str, epochs: int) -> DataFrame:
    from .llm_ext10 import _qc_trained_weights

    w = _qc_trained_weights(spark, sf_dir, epochs=epochs)
    return spark.createDataFrame(
        [(b, wb) for b, wb in enumerate(w)], "bucket long, weight_x1e6 long"
    ).orderBy("bucket")


@register("qc_train_epoch1_weights", oracle=_qc_weights_prefix_oracle(1))
def q_qc_train_epoch1_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forensic (r11) — the trained quality classifier's weights after
    EPOCH 1 ONLY (the exact ``_qc_epoch_cte(1)`` prefix the 16-epoch
    trajectory replays). Combined with qc_features_checksum and the
    epoch-8 twin this bisects WHERE the two-round driver-red/local-green
    divergence of ``quality_classifier_train_gd`` first appears."""
    return _qc_weights_prefix(spark, sf_dir, 1)


@register("qc_train_epoch8_weights", oracle=_qc_weights_prefix_oracle(8))
def q_qc_train_epoch8_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forensic (r11) — the classifier weight trajectory at the epoch-8
    midpoint: the binary-search partner of qc_train_epoch1_weights (if
    epoch 1 is driver-green and epoch 8 red, the flip is in epochs 2-8;
    if 8 is green and 16 red, in 9-16 — one round instead of four)."""
    return _qc_weights_prefix(spark, sf_dir, 8)


# ---------------------------------------------------------------------------
# 1b. graph trajectory: assignment, seed scores, round-1 working list


def _knn_assign_oracle() -> str:
    from .llm_ext4 import _semdedup_assign_cte

    return f"""
    {_semdedup_assign_cte(1)}
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM assign ORDER BY vec_id
    """


@register("knn_assign_cells", oracle=_knn_assign_oracle())
def q_knn_assign_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forensic (r11) — the graph family's nearest-centroid CELL
    ASSIGNMENT (the shared SemDeDup/kNN prefix, and the one stage still
    scored in rounded float cosine — candidate-set membership only, never
    a hashed score). Red here ⇒ the kmeans float path itself diverges in
    the driver env and every downstream graph row inherits it; green here
    with red downstream ⇒ the divergence enters at scoring or iteration."""
    from ..operators.similarity import nearest_centroid

    emb = load(spark, sf_dir, "embeddings")
    return (
        nearest_centroid(emb, k=8)
        .select("vec_id", F.col("cluster").cast("long"))
        .orderBy("vec_id")
    )


def _knn_seed_oracle() -> str:
    from .llm_ext7 import _knn_refined_cte

    return f"""
    {_knn_refined_cte(0)}
    SELECT src_id, nbr_id, cos_sim FROM sesc ORDER BY src_id, nbr_id
    """


@register("knn_seed_edges", oracle=_knn_seed_oracle())
def q_knn_seed_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forensic (r11) — the NN-Descent SEED edges with their scores: the
    deterministic pseudo-random (portable-md5) cross-cell edges that
    widen the base graph before any refinement round, under the r11
    pure-integer quantized-cosine contract. This was the family's
    least-stable value class under the retired float contract (seeds are
    the only cross-cell scores). Red here ⇒ seeding/scoring; green here
    with red rounds ⇒ iteration."""
    from .llm_ext7 import _knn_seed_scores

    _, _, sesc = _knn_seed_scores(spark, sf_dir)
    return sesc.select("src_id", "nbr_id", "cos_sim").orderBy("src_id", "nbr_id")


def _knn_round1_oracle() -> str:
    from .llm_ext7 import _knn_refined_cte

    return f"""
    {_knn_refined_cte(1)}
    SELECT src_id, nbr_id, cos_sim FROM wk1 ORDER BY src_id, nbr_id
    """


@register("knn_nn_descent_round1", oracle=_knn_round1_oracle())
def q_knn_nn_descent_round1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forensic (r11) — the FULL W-wide working list after NN-Descent
    round 1 (not the top-K readout: the whole intermediate state the
    remaining rounds consume). Completes the graph trajectory bisect:
    assignment → seeds → round 1 → final graph → search."""
    from .llm_ext7 import _knn_refined_work

    _, work = _knn_refined_work(spark, sf_dir, n_rounds=1)
    return work.select("src_id", "nbr_id", "cos_sim").orderBy("src_id", "nbr_id")


# ---------------------------------------------------------------------------
# 2. engine-behavior probes


@register(
    "oracle_probe_data_fingerprint",
    oracle=f"""
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
           (SELECT CAST(SUM(LENGTH(text)) AS BIGINT) FROM documents) AS text_chars,
           (SELECT CAST(SUM(({_duck_md5_32("text")}) % 65536) AS BIGINT)
            FROM documents) AS text_md5_sum,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS n_vecs,
           (SELECT CAST(SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 10000000) AS BIGINT)) AS BIGINT)
            FROM embeddings) AS v1_q_sum,
           (SELECT CAST(SUM(CAST(FLOOR(CAST(embedding[64] AS DOUBLE) * 10000000) AS BIGINT)) AS BIGINT)
            FROM embeddings) AS v64_q_sum
    """,
)
def q_oracle_probe_data_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe (r11) — checksums of the INPUT tables themselves (documents
    text bytes + portable md5; embeddings first/last quantized
    components). Red here ⇒ the two engines are not reading the same
    bytes in the driver env (parquet reader or data difference) and every
    other red row is downstream noise; green ⇒ inputs are identical and
    divergence is computational."""
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    d = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("text_chars"),
        F.sum(_spark_md5_32(F.col("text")) % 65536).cast("long").alias("text_md5_sum"),
    )
    e = emb.agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum(F.floor(F.col("embedding")[0].cast("double") * 10000000).cast("long"))
        .cast("long")
        .alias("v1_q_sum"),
        F.sum(F.floor(F.col("embedding")[63].cast("double") * 10000000).cast("long"))
        .cast("long")
        .alias("v64_q_sum"),
    )
    return d.crossJoin(e)


@register(
    "oracle_probe_tokenize_md5",
    oracle=f"""
    WITH u AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) FILTER (WHERE tok = '') AS BIGINT) AS n_empty,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct,
           CAST(SUM(LENGTH(tok)) AS BIGINT) AS tok_chars,
           CAST(SUM(({_duck_md5_32("tok")}) % 512) AS BIGINT) AS bucket_sum
    FROM u
    """,
)
def q_oracle_probe_tokenize_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe (r11) — the classifier feature path's two engine-sensitive
    primitives in isolation: whitespace tokenization (Spark ``split`` vs
    DuckDB ``string_split`` — empty-token and trailing-separator
    semantics) and portable-md5 bucketing (the {512}-bucket feature
    hash). qc_features_checksum red + THIS green would localize the
    divergence to the bigram construction between them."""
    docs = load(spark, sf_dir, "documents")
    u = docs.select("doc_id", F.explode(TX.tokens("text")).alias("tok"))
    return u.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum((F.col("tok") == "").cast("long")).cast("long").alias("n_empty"),
        F.countDistinct("tok").cast("long").alias("n_distinct"),
        F.sum(F.length("tok")).cast("long").alias("tok_chars"),
        F.sum(_spark_md5_32(F.col("tok")) % 512).cast("long").alias("bucket_sum"),
    )


# --- r12: the HUGEINT smoking gun (VERDICT r11 item 2) -----------------
# The r11 judge traced the three-round graph/GD hash-red family to DuckDB's
# silent BIGINT→HUGEINT promotion in oracle OUTPUT columns (equal values,
# different driver-side rendering; the local harness is type-blind). This
# pair converts that inference into one driver-confirmed CORRECTNESS row:
# both entries compute the IDENTICAL trivial value (COUNT of documents,
# once as an un-CAST SUM(1) that DuckDB types HUGEINT, once CAST BIGINT).
# passthrough red + cast green ⇒ root cause proven; both green ⇒ the
# driver harness renders HUGEINT like BIGINT and the diagnosis is wrong.


@register(
    "oracle_probe_hugeint_passthrough",
    # SUM(1) deliberately un-CAST: DuckDB types it HUGEINT (allowlisted in
    # tests/test_oracle_types.py — every other oracle must lint clean).
    oracle="SELECT SUM(1) AS n_docs_sum FROM documents",
)
def q_oracle_probe_hugeint_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe (r12) — raw HUGEINT passthrough: Spark's SUM(1) is BIGINT,
    DuckDB's is HUGEINT, the VALUE (document count) is trivially equal.
    Red here with the CAST twin green = the r9–r11 divergence class caught
    in a single row."""
    docs = load(spark, sf_dir, "documents")
    return docs.agg(F.sum(F.lit(1)).alias("n_docs_sum"))


@register(
    "oracle_probe_hugeint_cast",
    oracle="SELECT CAST(SUM(1) AS BIGINT) AS n_docs_sum FROM documents",
)
def q_oracle_probe_hugeint_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe (r12) — the CAST twin of oracle_probe_hugeint_passthrough:
    byte-identical computation, output column explicitly BIGINT. Green here
    is the control arm of the one-row root-cause experiment."""
    docs = load(spark, sf_dir, "documents")
    return docs.agg(F.sum(F.lit(1)).alias("n_docs_sum"))


# Exact binary halves (x.5 is exact in a double) fingerprint the rounding
# MODE; the 4-dp values fingerprint binary-vs-shortest-decimal rounding on
# non-exact doubles. Only values where local Spark and local DuckDB agree
# can register — the probe's job is to flip if the DRIVER's engines round
# differently than the local pair that validated every green round so far.
_ROUND_PROBES: tuple[tuple[str, float, int], ...] = (
    ("half_2_5", 2.5, 0),
    ("half_4_5", 4.5, 0),
    ("half_neg_2_5", -2.5, 0),
    ("half_0_5", 0.5, 0),
    ("half_1_5", 1.5, 0),
    ("dp4_0_00005", 0.00005, 4),
    ("dp4_0_12345", 0.12345, 4),
    ("dp4_0_06665", 0.06665, 4),
)


@register(
    "oracle_probe_round_half",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(
        f"('{name}', ROUND(CAST({val!r} AS DOUBLE), {nd}))"
        for name, val, nd in _ROUND_PROBES
    )
    + ") AS t(probe, rounded) ORDER BY probe",
)
def q_oracle_probe_round_half(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe (r11) — ROUND semantics on exact binary halves (rounding
    MODE: away-from-zero vs half-even) and on x.xxxx5-class 4-dp values
    (binary-double rounding in DuckDB vs shortest-decimal BigDecimal
    HALF_UP in Spark — the exact disagreement class the registry header
    documents). Every value here agrees between the LOCAL engine pair;
    a driver-side red means the driver's DuckDB (or Spark) rounds
    differently, which would silently move every ROUND-bearing float
    oracle in the registry."""
    rows = [(name, float(val)) for name, val, _ in _ROUND_PROBES]
    df = spark.createDataFrame(rows, "probe string, raw double")
    rounded = F.when(
        F.col("probe").startswith("dp4"), F.round(F.col("raw"), 4)
    ).otherwise(F.round(F.col("raw"), 0))
    return df.select("probe", rounded.alias("rounded")).orderBy("probe")


@register(
    "oracle_probe_float_sum_order",
    oracle="""
    WITH e AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    c AS (SELECT vec_id,
                 LIST_CONCAT(LIST_CONCAT(LIST_CONCAT(v, [1e9]),
                                         LIST_TRANSFORM(v, x -> -x)), [-1e9]) AS w
          FROM e)
    SELECT vec_id, CAST(FLOOR(LIST_SUM(w) * 1e9) AS BIGINT) AS resid_x1e9
    FROM c ORDER BY vec_id
    """,
)
def q_oracle_probe_float_sum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe (r11) — float summation ORDER fingerprint: sequentially
    summing ``[v₀..v₆₃, 10⁹, −v₀..−v₆₃, −10⁹]`` leaves a cancellation
    residual (~10⁻⁷) determined ENTIRELY by the order and grouping of the
    additions — measured locally it reproduces bit-for-bit across DuckDB
    LIST_SUM, Spark ``aggregate``, and a Python left fold, and changes by
    orders of magnitude under pairwise/blocked summation. Every float
    oracle in the registry leans on DuckDB LIST_SUM being left-to-right
    sequential; a driver red HERE while integer entries stay green is the
    r10 suspect ("a different DuckDB build... LIST_SUM float summation is
    the one suspect my checks could not rule out") caught in the act."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    w = F.concat(
        v,
        F.array(F.lit(1e9)),
        F.transform(v, lambda x: -x),
        F.array(F.lit(-1e9)),
    )
    resid = F.aggregate(w, F.lit(0.0), lambda s, x: s + x)
    return emb.select(
        "vec_id", F.floor(resid * 1e9).cast("long").alias("resid_x1e9")
    ).orderBy("vec_id")


@register(
    "oracle_probe_float_cosine_x1e4",
    oracle="""
    WITH n AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v,
                      SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
               FROM embeddings)
    SELECT a.vec_id,
           CAST(ROUND(LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> a.v[i] * b.v[i]))
                 / (a.nrm * b.nrm) * 10000) AS BIGINT) AS cos_x1e4
    FROM n a JOIN n b ON b.vec_id = a.vec_id + 1
    ORDER BY a.vec_id
    """,
)
def q_oracle_probe_float_cosine_x1e4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe (r11) — the RETIRED r9/r10 graph-family score contract
    (``ROUND(double_cosine · 10⁴)``: float dot, two float sqrt norms, one
    float multiply) replayed verbatim over every consecutive-id vector
    pair. The r11 graph family no longer computes ANY of this — so if the
    r9/r10 reds were float-cosine divergence, THIS row goes red on the
    driver while the whole integer-contract family stays green: a
    root-cause confirmation the fix alone could never deliver."""
    from ..operators.similarity import dot, norm

    emb = load(spark, sf_dir, "embeddings")
    n = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
        norm(F.col("embedding")).alias("nrm"),
    )
    a = n.select(
        F.col("vec_id"), F.col("v").alias("av"), F.col("nrm").alias("an")
    )
    b = n.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    return (
        a.join(b, "vec_id")
        .select(
            "vec_id",
            F.round(dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")) * 10000)
            .cast("long")
            .alias("cos_x1e4"),
        )
        .orderBy("vec_id")
    )


@register(
    "oracle_probe_duckdb_version",
    oracle="SELECT CAST(version() AS VARCHAR) AS duckdb_version",
)
def q_oracle_probe_duckdb_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe (r12, registered for the r13 window if the HUGEINT pair
    comes back ambiguous) — the one driver-environment axis no local
    check can reach: the driver's DuckDB BUILD. The Spark side returns
    the LOCAL wheel's version string, the oracle returns the DRIVER's
    ``version()`` — so the row hashes green iff the two DuckDB builds
    are the same version, and a red here (rows+schema matching, hash
    differing) READS OUT as "the driver runs a different DuckDB than
    the one every local oracle was validated against". Single row,
    costs nothing."""
    import duckdb

    return spark.createDataFrame(
        [(f"v{duckdb.__version__}",)], "duckdb_version string"
    )
