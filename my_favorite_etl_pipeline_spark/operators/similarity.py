"""Similarity search over embedding columns ([EXT] X3, SURVEY.md §2.9).

Two tiers:
- brute-force cosine top-k: the correctness baseline. Dot products via
  zip_with/aggregate higher-order functions (JVM-side, no UDF, no Arrow
  hop); top-k via orderBy+limit = TakeOrdered (per-partition heap + driver
  merge of k rows — never a global sort).
- IVF (inverted-file) top-k: the scale path. Build centroids (one agg),
  probe the nearest ``n_probe`` cells, brute-force only inside them. At
  100 TB with √N cells this cuts the scan by ~√N; cells are a partition
  key so a probe touches only its partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-scope: pandas_udf resolves string type hints here

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..caching import tracked_persist
from .scaling import ensure_min_partitions


def _dbl(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential order (oracle-stable)."""
    return F.aggregate(F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_dbl(a), F.lit(0.0), lambda s, x: s + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


_QV_SCALE = 10_000  # fixed-point quantization scale for the graph family


def int_isqrt(n2: Column) -> Column:
    """EXACT integer square root of a nonnegative BIGINT column.

    ``FLOOR(SQRT(x))`` over a double is within ±1 of ⌊√x⌋ for any
    x < 2⁵³ (the double holds x exactly and IEEE 754 requires sqrt to be
    correctly rounded), so one CASE correction step makes it exact — and
    therefore identical on ANY engine, regardless of how its sqrt rounds.
    This is the keystone of the graph family's float-free hash contract
    (VERDICT r10 item 2): norms become exact integers, not IEEE doubles.
    """
    s0 = F.floor(F.sqrt(n2.cast("double"))).cast("long")
    return (
        F.when((s0 + 1) * (s0 + 1) <= n2, s0 + 1)
        .when(s0 * s0 > n2, s0 - 1)
        .otherwise(s0)
    )


def quantize_vectors(vectors: DataFrame, vec_col: str = "__v") -> DataFrame:
    """Append the integer-quantized vector ``__q = FLOOR(v·10⁴)`` (BIGINT
    array) and its EXACT integer norm ``__s = isqrt(Σ __q²)`` to a vector
    frame. Quantization happens ONCE at load; every downstream score,
    comparison, and tie-break in the graph family is pure integer
    arithmetic on these columns (VERDICT r10 item 2: no float dot, no
    float norm, no ROUND(double) anywhere upstream of a hashed value).

    float32 → double is exact, ·10⁴ is one correctly-rounded IEEE multiply
    of identical inputs, FLOOR is exact — so ``__q`` is bit-identical on
    Spark and DuckDB by construction, and everything derived from it is
    integer math both engines define identically (nonnegative floor
    division only; see :func:`int_cos_x1e4`).
    """
    q = F.transform(F.col(vec_col), lambda x: F.floor(x * _QV_SCALE).cast("long"))
    df = vectors.withColumn("__q", q)
    n2 = F.aggregate(
        F.col("__q"), F.lit(0).cast("long"), lambda s, x: s + x * x
    )
    return df.withColumn("__s", int_isqrt(n2))


def int_cos_x1e4(qa: Column, sa: Column, qb: Column, sb: Column) -> Column:
    """Quantized-cosine score in integer ten-thousandths, pure BIGINT:
    ``((Σ qaᵢ·qbᵢ + 2·sa·sb)·10⁴) div (sa·sb) − 2·10⁴``.

    The ``+2·sa·sb`` offset keeps the dividend nonnegative: exact isqrt
    gives Σq² ≤ s² + 2s per side, so Cauchy-Schwarz bounds |Σqa·qb| ≤
    √((sa²+2sa)(sb²+2sb)) = sa·sb·√((1+2/sa)(1+2/sb)) ≤ 2·sa·sb for
    sa,sb ≥ 2 (the radicand is ≤ 4 there, equality exactly at sa=sb=2)
    — which the guard below ENFORCES by routing sa < 2 OR sb < 2
    (vector magnitude < ~3·10⁻⁴, quantized norm 0 or 1) through the zero
    branch on both engines (ADVICE r11: with sa=sb=1 the dividend could go
    negative, exactly where the two division semantics split — Spark here
    FLOORS via the pmod identity, DuckDB ``//`` TRUNCATES toward zero).
    On nonnegative dividends floor and truncate coincide, so the guarded
    score is bit-identical by construction. Bounds: |q| ≤ 10⁴, so
    Σq² ≤ 64·10⁸ and the dividend ≤ ~2·10¹⁴ — comfortably BIGINT. The
    score approximates cos·10⁴ to within quantization error (~10⁻³
    absolute on the fixture's unit-scale vectors) — an ANN ranking key,
    exactly reproducible on both engines by construction.
    """
    d = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )
    den = sa * sb
    num = (d + 2 * den) * F.lit(_QV_SCALE).cast("long")
    # exact floor division of nonnegatives without F.expr: num − num%den is
    # exactly divisible by den, so the double division below is EXACT (the
    # quotient is an integer ≤ 3·10⁴ ≪ 2⁵³) — no rounding enters.
    quot = ((num - F.pmod(num, den)) / den).cast("long")
    return F.when(
        (sa < F.lit(2)) | (sb < F.lit(2)), F.lit(0).cast("long")
    ).otherwise(quot - 2 * _QV_SCALE)


def unit_vec(a: Column) -> Column:
    """vᵢ/‖v‖ — PQ operates on UNIT vectors so the ADC inner product
    approximates cosine directly (norm variance would otherwise bias the
    shortlist toward long vectors regardless of angle). Codegen's
    subexpression elimination evaluates the norm once per row."""
    return F.transform(_dbl(a), lambda x: x / norm(a))


def brute_force_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """X3 baseline — exact cosine top-k of ``corpus`` against a 1-row query.

    The query side is broadcast (it is by definition tiny); the corpus is
    scanned once, map-only, then TakeOrdered(k). Ties broken by id for
    determinism.
    """
    q = F.broadcast(query.select(F.col(vec_col).alias("__qvec")))
    sim = F.round(cosine(F.col(vec_col), F.col("__qvec")), 4)
    return (
        ensure_min_partitions(corpus).crossJoin(q)
        .select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def brute_force_topk_pandas(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """X3 via Arrow-vectorized Pandas UDF — the same top-k, Python-side.

    The when-you-must-use-Python path (SURVEY §2.10): a scalar
    ``pandas_udf`` receives Arrow batches and computes all dot products with
    one numpy matmul per batch — ~10-100× faster than a row-at-a-time UDF.
    Exists as the template for UDFs that genuinely need Python (a model
    forward pass, a tokenizer); for plain cosine the zip_with version in
    :func:`brute_force_topk` stays JVM-side and wins.
    """
    from pyspark.sql.functions import pandas_udf

    qvec = np.array(query.select(vec_col).head()[0], dtype=np.float64)
    qnorm = float(np.sqrt((qvec * qvec).sum()))

    @pandas_udf("double")
    def cos_sim(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)  # (batch, dim)
        sims = (m @ qvec) / (np.sqrt((m * m).sum(axis=1)) * qnorm)
        return pd.Series(np.round(sims, 4))

    return (
        ensure_min_partitions(corpus)
        .select(F.col(id_col), cos_sim(F.col(vec_col)).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def all_pairs_cosine(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """X2 (embedding) exact baseline — all pairs with cosine ≥ threshold.

    O(n²) self-join on ``id_a < id_b``; norms are precomputed per row so the
    join-side work is one dot product per pair. Fixture-scale ground truth
    for :func:`lsh_pairs_cosine` — never run this beyond ~10⁵ rows.
    """
    side = ensure_min_partitions(corpus).select(
        F.col(id_col), _dbl(F.col(vec_col)).alias("__v"), norm(F.col(vec_col)).alias("__n")
    )
    a, b = side.alias("pa"), side.alias("pb")
    cos = F.round(
        dot(F.col("pa.__v"), F.col("pb.__v")) / (F.col("pa.__n") * F.col("pb.__n")), 4
    )
    return (
        a.join(b, F.col(f"pa.{id_col}") < F.col(f"pb.{id_col}"))
        .select(
            F.col(f"pa.{id_col}").alias("id_a"),
            F.col(f"pb.{id_col}").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_pairs_cosine(
    corpus: DataFrame,
    threshold: float,
    n_bands: int = 16,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """X2 (embedding) scale path — banded sign-hyperplane LSH + verify.

    Signature = sign bits of the dimensions (axis-aligned hyperplanes —
    deterministic, no RNG state to ship), split into ``n_bands`` bands of
    ``band_bits`` bits (same band structure as MinHash LSH). Candidates =
    pairs sharing any band value; only they get the exact cosine verify.

    Recall at p = P(signs agree) = 1 - θ/π is ``1-(1-p^band_bits)^n_bands``
    (~0.96 for cos 0.4 with 16×4); tighten ``band_bits`` upward for higher
    thresholds, where the pruning is also much stronger. The band join is
    the only extra shuffle and skewed bands split under AQE.

    The band count is clamped PER ROW to ``floor(dim / band_bits)`` (min 1):
    with the old unclamped ``n_bands``, a vector shorter than
    ``n_bands*band_bits`` made every trailing band an empty slice hashing to
    the same value for all rows — silently collapsing the band join toward
    all-pairs O(n²). Clamping keeps the bucketing guarantee for arbitrary
    input dims; short vectors just get proportionally fewer bands (lower
    recall, never a candidate explosion).
    """
    n_usable = F.greatest(
        F.lit(1),
        F.least(F.lit(n_bands), F.floor(F.size(F.col(vec_col)) / band_bits)),
    ).cast("int")
    bands = F.transform(
        F.sequence(F.lit(0), n_usable - 1),
        lambda b: F.aggregate(
            F.slice(_dbl(F.col(vec_col)), b * band_bits + 1, band_bits),
            F.lit(0).cast("long"),
            lambda acc, x: acc * 2 + F.when(x >= 0, 1).otherwise(0),
        ),
    )
    side = ensure_min_partitions(corpus).select(
        F.col(id_col),
        _dbl(F.col(vec_col)).alias("__v"),
        norm(F.col(vec_col)).alias("__n"),
        F.posexplode(bands).alias("__band_idx", "__band_val"),
    )
    a, b = side.alias("pa"), side.alias("pb")
    cos = F.round(
        dot(F.col("pa.__v"), F.col("pb.__v")) / (F.col("pa.__n") * F.col("pb.__n")), 4
    )
    return (
        a.join(
            b,
            (F.col("pa.__band_idx") == F.col("pb.__band_idx"))
            & (F.col("pa.__band_val") == F.col("pb.__band_val"))
            & (F.col(f"pa.{id_col}") < F.col(f"pb.{id_col}")),
        )
        .select(
            F.col(f"pa.{id_col}").alias("id_a"),
            F.col(f"pb.{id_col}").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .distinct()
        .filter(F.col("cos_sim") >= threshold)
    )


def build_ivf_centroids(
    corpus: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantizer: mean vector per cell.

    posexplode → per-(cell, dim) mean → re-assemble ordered arrays. Two
    narrow aggregations; output is #cells rows (always broadcastable).
    A production build would k-means-iterate this; one mean step is the
    same dataflow shape.

    Means use the same fixed-point integer sums as
    :func:`build_hash_centroids` (``Σ floor(x·1e7) / (count·1e7)``): float
    ``avg`` is partial-aggregation-order dependent, so centroids would
    differ in last bits run-to-run AND vs the DuckDB oracle; BIGINT sums
    are exact and order-free on both engines, which is what lets
    ``embedding_topk_ivf`` carry a value-hash oracle instead of a
    rows-only check.
    """
    per_dim = (
        corpus.select(F.col(cell_col), F.posexplode(_dbl(F.col(vec_col))).alias("dim", "val"))
        .withColumn("sv", F.floor(F.col("val") * CENTROID_SCALE).cast("long"))
        .groupBy(cell_col, "dim")
        .agg(F.sum("sv").alias("s"), F.count(F.lit(1)).alias("c"))
        .select(
            cell_col,
            "dim",
            (F.col("s") / (F.col("c") * F.lit(float(CENTROID_SCALE)))).alias("mean_val"),
        )
    )
    return (
        per_dim.groupBy(cell_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mean_val"))).alias("pairs"))
        .select(
            F.col(cell_col),
            F.transform(F.col("pairs"), lambda p: p.mean_val).alias("centroid"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 20,
    n_probe: int = 3,
    id_col: str = "vec_id",
    cell_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """X3 scale path — probe the ``n_probe`` nearest cells only.

    centroids (broadcast) × query → nearest cells; semi-join the corpus on
    cell membership (partition pruning when the table is laid out by cell);
    exact cosine within. Approximate overall, exact within probed cells.
    """
    centroids = build_ivf_centroids(corpus, cell_col, vec_col)
    q = F.broadcast(query.select(F.col(vec_col).alias("__qvec")))
    probed = F.broadcast(
        centroids.crossJoin(q)
        .select(F.col(cell_col), cosine(F.col("centroid"), F.col("__qvec")).alias("c_sim"))
        .orderBy(F.col("c_sim").desc(), F.col(cell_col))
        .limit(n_probe)
        .select(cell_col)
    )
    sim = F.round(cosine(F.col(vec_col), F.col("__qvec")), 4)
    return (
        ensure_min_partitions(corpus).join(probed, cell_col, "left_semi")
        .crossJoin(q)
        .select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_topk_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    cell_col: str = "label",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
) -> DataFrame:
    """X3 serving shape — a whole query SET through the IVF index in ONE
    job (no per-query driver loop).

    The single-query :func:`ivf_topk` is the index-design story; real
    retrieval serves batches, and the batched plan is *different*, not a
    loop: centroids (O(cells), broadcast) cross the query set (O(|Q|),
    model-sized) into a per-query probe table; ONE corpus pass joins each
    probed cell's inverted list against every query probing it (the probe
    table broadcasts — |Q|·n_probe rows); the per-query top-k cut is
    :func:`retrieval.impact_truncate` — the same salted two-phase exact
    top-k that bounds posting lists, with the query id as the "term", so
    a popular cell never lands a corpus-sized candidate list on one
    reducer. Total cost: one corpus scan + |matches| dot products,
    amortized over all queries — vs |Q| scans for a looped client.

    ``cand_max`` (the salting trigger) is probed with one model-sized
    aggregate over cell counts at construction (the tfidf max-df probe
    precedent; registry LAZINESS note applies). At production scale the
    same number is free from table-level column stats.
    """
    from .retrieval import impact_truncate

    centroids = build_ivf_centroids(corpus, cell_col, vec_col)
    qset = queries.select(
        F.col(qid_col), _dbl(F.col(vec_col)).alias("__qvec")
    )
    wprobe = Window.partitionBy(qid_col).orderBy(
        F.col("__csim").desc(), F.col(cell_col)
    )
    # |Q|·n_probe rows, consumed twice (the cand_max scalar probe below
    # and the broadcast candidate join): persist so the centroid build +
    # probe ranking run once, not once per consumer (ADVICE r9)
    probe = tracked_persist(
        qset.crossJoin(F.broadcast(centroids))
        .withColumn("__csim", cosine(F.col("centroid"), F.col("__qvec")))
        .withColumn("__pr", F.row_number().over(wprobe))
        .filter(F.col("__pr") <= n_probe)
        .select(qid_col, cell_col, "__qvec")
    )
    # scalar probe: worst-case candidates for one query = Σ probed cell sizes
    cand_max = (
        probe.select(qid_col, cell_col)
        .join(corpus.groupBy(cell_col).count(), cell_col)
        .groupBy(qid_col)
        .agg(F.sum("count").alias("nc"))
        .agg(F.max("nc"))
        .collect()[0][0]
        or 0
    )
    cand = (
        ensure_min_partitions(corpus)
        .join(F.broadcast(probe), cell_col)
        .select(
            F.col(qid_col),
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("__qvec")), 4).alias("cos_sim"),
        )
    )
    topk = impact_truncate(
        cand, "cos_sim", id_col=id_col, term_col=qid_col, k=k, df_max=float(cand_max)
    )
    wrank = Window.partitionBy(qid_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        topk.withColumn("rank", F.row_number().over(wrank).cast("int"))
        .select(qid_col, "rank", id_col, "cos_sim")
        .orderBy(qid_col, "rank")
    )


#: fixed-point scale for deterministic centroid means: Σ floor(x·SCALE) is
#: exact BIGINT arithmetic, so the mean is bit-identical on Spark and DuckDB
#: regardless of aggregation order (float Σ is order-dependent; integer Σ
#: is not). 1e7 keeps 7 decimals — far below any cosine-relevant noise.
CENTROID_SCALE = 10_000_000


def build_hash_centroids(
    corpus: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-k coarse quantizer: mean vector of each of ``k`` hash buckets.

    ``bucket = id % k`` — k is a PARAMETER, independent of corpus size, so
    the centroid table is O(k) rows (always broadcastable) and any
    nearest-centroid assignment against it is O(n·k), never O(n²). This is
    the scale-honest centroid source for SemDeDup/IVF-style operators; a
    production build k-means-iterates from these buckets (same dataflow:
    see :func:`kmeans_iterate`), which tightens clusters but never changes
    the cost shape.

    Means use fixed-point integer sums (``Σ floor(x·1e7) / (count·1e7)``):
    float summation is order-dependent and Spark's partial aggregation
    order is nondeterministic, so a float mean could flip last bits vs the
    DuckDB oracle; BIGINT summation is exact and order-free on both.
    """
    per_dim = (
        corpus.select(
            (F.col(id_col) % k).cast("long").alias("cid"),
            F.posexplode(_dbl(F.col(vec_col))).alias("dim", "val"),
        )
        .withColumn("sv", F.floor(F.col("val") * CENTROID_SCALE).cast("long"))
        .groupBy("cid", "dim")
        .agg(F.sum("sv").alias("s"), F.count(F.lit(1)).alias("c"))
        .select(
            "cid",
            "dim",
            (F.col("s") / (F.col("c") * F.lit(float(CENTROID_SCALE)))).alias("mean_val"),
        )
    )
    return (
        per_dim.groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mean_val"))).alias("pairs"))
        .select(
            F.col("cid"),
            F.transform(F.col("pairs"), lambda p: p.mean_val).alias("centroid"),
        )
    )


def kmeans_iterate(
    corpus: DataFrame,
    k: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd k-means refinement of :func:`build_hash_centroids`.

    Each round: broadcast the k centroids, assign every vector to its
    nearest (one max_by aggregate, same shape as :func:`semdedup_pairs`
    assignment), recompute fixed-point means per assigned cluster. Cost per
    round is one O(n·k) map + two narrow aggregations — the round count is
    a constant (pretraining-corpus quantizers converge usefully in 2-5
    rounds; SemDeDup uses k-means centroids exactly this way), so the
    total stays O(n·k·iters) with an O(k) broadcast. Empty clusters keep
    their previous centroid (standard Lloyd fallback) via left join.

    Converged rounds are skipped: after each round a digest of the O(k·d)
    centroid table (two scalar aggregates — the :func:`graph._edge_digest`
    probe pattern) is compared to the previous round's; identical digests
    mean every later round is the identity, so the loop stops early. The
    probe is safe for hash-checked oracles that unroll a FIXED round count
    in SQL — skipped rounds are no-ops by construction. Probing is gated
    on ``n_iter >= 3`` (r15-opt): below that the probes' construction-time
    collect jobs cost more than the one round they could skip, and running
    a converged round anyway is bit-identical. Each round's
    centroid table is tracked_persist'ed (k rows) so the digest probe and
    the next round share one computation; construction therefore launches
    small jobs (see the registry LAZINESS note).
    """
    cent = tracked_persist(
        build_hash_centroids(corpus, k=k, id_col=id_col, vec_col=vec_col)
    )
    side = corpus.select(F.col(id_col), _dbl(F.col(vec_col)).alias("__v"))
    # Fixpoint probing is gated on the round count (r15-opt, guide §1.2
    # per-task work): each digest is a collect() JOB at plan-construction
    # time, so probing costs n_iter+1 driver round-trips to skip at most
    # n_iter−1 converged rounds. At the serving tiers' n_iter ≤ 2 that is
    # 3 jobs (~0.9 s/call measured) to maybe save one, a strict loss —
    # and a skipped round is the identity by definition, so running it
    # anyway yields bit-identical centroids. Probe only when the round
    # count is big enough that skipping the converged tail can win.
    use_probe = n_iter >= 3
    digest = _centroid_digest(cent) if use_probe else None
    for _ in range(n_iter):
        c = F.broadcast(
            cent.select(
                F.col("cid").alias("__cid"),
                F.col("centroid").alias("__cv"),
                norm(F.col("centroid")).alias("__cn"),
            )
        )
        cos_c = F.round(dot(F.col("__v"), F.col("__cv")) / (norm(F.col("__v")) * F.col("__cn")), 4)
        assigned = (
            side.crossJoin(c)
            .withColumn("__cos_c", cos_c)
            .groupBy(id_col)
            .agg(
                F.max_by(
                    F.struct(F.col("__cid"), F.col("__v")),
                    F.struct(F.col("__cos_c").alias("c"), (-F.col("__cid")).alias("nc")),
                ).alias("__best")
            )
            .select(F.col("__best.__cid").alias("cid"), F.col("__best.__v").alias("__v"))
        )
        per_dim = (
            assigned.select("cid", F.posexplode(F.col("__v")).alias("dim", "val"))
            .withColumn("sv", F.floor(F.col("val") * CENTROID_SCALE).cast("long"))
            .groupBy("cid", "dim")
            .agg(F.sum("sv").alias("s"), F.count(F.lit(1)).alias("c"))
            .select(
                "cid",
                "dim",
                (F.col("s") / (F.col("c") * F.lit(float(CENTROID_SCALE)))).alias("mean_val"),
            )
        )
        refreshed = (
            per_dim.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "mean_val"))).alias("pairs"))
            .select(
                F.col("cid"), F.transform(F.col("pairs"), lambda p: p.mean_val).alias("centroid")
            )
        )
        cent = tracked_persist(
            cent.select("cid", F.col("centroid").alias("__prev"))
            .join(refreshed, "cid", "left")
            .select("cid", F.coalesce(F.col("centroid"), F.col("__prev")).alias("centroid"))
        )
        if use_probe:
            new_digest = _centroid_digest(cent)
            if new_digest == digest:
                break  # fixpoint: every further round is the identity
            digest = new_digest
    return cent


def _centroid_digest(cent: DataFrame) -> tuple[int, int]:
    """(row count, sum of row hashes) over the centroid table — the cheap
    fixpoint probe (same shape as graph._edge_digest). Centroid doubles come
    from exact fixed-point means, so equal digests mean equal tables."""
    row = cent.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64(F.col("cid"), F.col("centroid").cast("string"))), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return row.n, row.h


def ivf_topk_kmeans(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 20,
    n_clusters: int = 16,
    n_probe: int = 3,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """X3 scale path without a pre-existing cell column: IVF over
    :func:`kmeans_iterate` centroids (fixed ``n_clusters``, hash-bucket
    init + Lloyd refinement) instead of :func:`ivf_topk`'s requirement
    that the corpus already carries a ``label`` cell.

    Dataflow: centroids (O(n_clusters), broadcast) → assign every vector
    to its nearest via ONE max_by aggregate (same shape as
    :func:`semdedup_pairs` assignment) → score centroids against the query
    and keep the ``n_probe`` best cells → exact cosine only inside probed
    cells → TakeOrdered(k). At 100 TB the assignment is precomputed once
    and stored as a partition column (then this reduces to
    :func:`ivf_topk` with partition pruning); recomputing it per query,
    as here, is still one O(n·n_clusters) map + one shuffle.
    """
    assign, probed = kmeans_assign_and_probe(
        corpus, query, n_clusters=n_clusters, n_probe=n_probe, n_iter=n_iter,
        id_col=id_col, vec_col=vec_col,
    )
    q = F.broadcast(query.select(_dbl(F.col(vec_col)).alias("__qv"), norm(F.col(vec_col)).alias("__qn")))
    sim = F.round(dot(F.col("__v"), F.col("__qv")) / (F.col("__n") * F.col("__qn")), 4)
    return (
        assign.join(probed, "__cid", "left_semi")
        .crossJoin(q)
        .select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def kmeans_assign_and_probe(
    corpus: DataFrame,
    query: DataFrame,
    n_clusters: int,
    n_probe: int,
    n_iter: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent: DataFrame | None = None,
    assign: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The IVF coarse stage shared by :func:`ivf_topk_kmeans` and
    :func:`ivf_pq_topk` (factored r7 so the two cannot drift): k-means
    centroids (hash init + ``n_iter`` digest-early-stopped Lloyd rounds),
    per-vector nearest-cell assignment via ONE max_by aggregate (rounded
    cosine, lowest-cid ties), and the query's ``n_probe`` best cells
    (UNROUNDED centroid cosine, cid ties — the original ivf_topk contract
    the ivf_kmeans oracle replays). Returns (assign, probed):
    ``(id, __cid, __v, __n)`` and the broadcastable ``(__cid)`` probe set.

    ``cent``/``assign`` (r16-opt, guide §5 "cache what is reused"): a
    caller holding the TRAINED index as committed tables (the
    ``_pq_serving_tables`` mart memo — the durable-graph posture) passes
    the ``(cid, centroid)`` table and/or the ``(id, __cid)`` assignment;
    training (and for ``assign`` the corpus-wide nearest-cell aggregate)
    is then skipped entirely — serving becomes table reads + the O(k)
    query-side probe. A passed ``assign`` is returned AS-IS (no
    ``__v``/``__n`` re-attach): the only such caller (:func:`ivf_pq_topk`)
    consumes ids alone; exact-scoring callers must train inline or pass
    an assign that carries the vectors.
    """
    if cent is None:
        cent = kmeans_iterate(
            corpus, k=n_clusters, n_iter=n_iter, id_col=id_col, vec_col=vec_col
        )
    cent = F.broadcast(
        cent.select(
            F.col("cid").alias("__cid"),
            F.col("centroid").alias("__cv"),
            norm(F.col("centroid")).alias("__cn"),
        )
    )
    if assign is None:
        side = ensure_min_partitions(corpus).select(
            F.col(id_col), _dbl(F.col(vec_col)).alias("__v"), norm(F.col(vec_col)).alias("__n")
        )
        cos_c = F.round(dot(F.col("__v"), F.col("__cv")) / (F.col("__n") * F.col("__cn")), 4)
        assign = (
            side.crossJoin(cent)
            .withColumn("__cos_c", cos_c)
            .groupBy(id_col)
            .agg(
                F.max_by(
                    F.struct(F.col("__cid"), F.col("__v"), F.col("__n")),
                    F.struct(F.col("__cos_c").alias("c"), (-F.col("__cid")).alias("nc")),
                ).alias("__best")
            )
            .select(
                F.col(id_col),
                F.col("__best.__cid").alias("__cid"),
                F.col("__best.__v").alias("__v"),
                F.col("__best.__n").alias("__n"),
            )
        )
    q = F.broadcast(query.select(_dbl(F.col(vec_col)).alias("__qv"), norm(F.col(vec_col)).alias("__qn")))
    probed = F.broadcast(
        cent.crossJoin(q)
        .select(
            "__cid",
            (dot(F.col("__cv"), F.col("__qv")) / (F.col("__cn") * F.col("__qn"))).alias("__c_sim"),
        )
        .orderBy(F.col("__c_sim").desc(), F.col("__cid"))
        .limit(n_probe)
        .select("__cid")
    )
    return assign, probed


def resolve_cell_count(
    corpus: DataFrame,
    k,
    target_cell_size: int = 64,
    min_k: int = 4,
    max_k: int = 1 << 20,
) -> int:
    """Resolve a cell/centroid count: an int passes through; ``"auto"``
    scales it with the corpus — ``k = clamp(ceil(n / target_cell_size))``.

    THE fixed-k scale hole (VERDICT r8 item 6): every within-cell candidate
    join (SemDeDup, kNN-graph, IVF verify) costs Σ|cell|² ≈ n²/k rows — with
    k FIXED that is quadratic in n, silently. Holding the TARGET CELL SIZE
    fixed instead makes k ∝ n, so per-cell work stays O(target²) and the
    total candidate count is O(n·target) — linear. The centroid table grows
    O(n/target) rows, broadcast-safe far past 100 TB (1e9 docs / 64 ≈ 16 M
    centroid rows is the first point to revisit; raise target or go
    hierarchical/two-level IVF there, same dataflow). Costs ONE count()
    job at plan-build time — production caches table row counts in the
    catalog. Recall note: larger k (smaller cells) trades recall for
    pruning exactly like fixed-k does; the floor tests in
    tests/test_recall_scales.py pin that auto-k keeps the measured floors.
    """
    if k == "auto":
        import math as _math

        n = corpus.count()
        return max(min_k, min(max_k, _math.ceil(n / max(1, target_cell_size))))
    return int(k)


def nearest_centroid(
    corpus: DataFrame,
    k=8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell_size: int = 64,
) -> DataFrame:
    """Nearest-of-k-centroids assignment, the shared primitive under
    SemDeDup and prototype pruning: ``(id, cluster, proto_sim, __v, __n)``
    where ``proto_sim`` is the rounded cosine to the OWN cluster centroid
    (the "prototypicality" D4-style pruning ranks on) and ``__v``/``__n``
    are the double vector + norm for downstream pair joins.

    One broadcast-crossJoin of the O(k) fixed-point centroid table
    (:func:`build_hash_centroids`) + ONE ``max_by`` aggregate — the n·k
    scored rows collapse map-side before the only shuffle; no per-vector
    window. Deterministic: rounded cosine, lowest-cid tie-break — the
    same (cos DESC, cid ASC) order the top-m branch of
    :func:`semdedup_pairs` applies.

    ``k`` may be ``"auto"`` (r9): resolved via :func:`resolve_cell_count`
    so cell COUNT scales with the corpus and cell SIZE stays fixed — the
    within-cell Σ|cell|² joins downstream stay linear in n.
    """
    k = resolve_cell_count(corpus, k, target_cell_size=target_cell_size)
    side = ensure_min_partitions(corpus).select(
        F.col(id_col), _dbl(F.col(vec_col)).alias("__v"), norm(F.col(vec_col)).alias("__n")
    )
    cent = build_hash_centroids(corpus, k=k, id_col=id_col, vec_col=vec_col).select(
        F.col("cid").alias("__cid"),
        F.col("centroid").alias("__cv"),
        norm(F.col("centroid")).alias("__cn"),
    )
    cos_c = F.round(
        dot(F.col("__v"), F.col("__cv")) / (F.col("__n") * F.col("__cn")), 4
    )
    return (
        side.crossJoin(F.broadcast(cent))
        .withColumn("__cos_c", cos_c)
        .groupBy(id_col)
        .agg(
            F.max_by(
                F.struct(
                    F.col("__cid"), F.col("__cos_c"), F.col("__v"), F.col("__n")
                ),
                F.struct(F.col("__cos_c").alias("c"), (-F.col("__cid")).alias("nc")),
            ).alias("__best")
        )
        .select(
            F.col(id_col),
            F.col("__best.__cid").alias("cluster"),
            F.col("__best.__cos_c").alias("proto_sim"),
            F.col("__best.__v").alias("__v"),
            F.col("__best.__n").alias("__n"),
        )
    )


def knn_topk_edges(pairs: DataFrame, k: int) -> DataFrame:
    """Collapse a scored candidate edge list ``(src_id, nbr_id, cos_sim)``
    to the top-``k`` neighbors per source: ONE collect_list + sort_array +
    slice aggregate (map-side combinable, k-bounded output per node, no
    per-vector window). Deterministic: (cos DESC, nbr_id ASC) order via
    the (c, -nbr_id) struct sort — the semdedup assign_top idiom."""
    packed = pairs.select(
        "src_id",
        F.struct(
            F.col("cos_sim").alias("c"),
            (-F.col("nbr_id")).alias("nn"),
            F.col("nbr_id").alias("nbr_id"),
        ).alias("__s"),
    )
    topk = packed.groupBy("src_id").agg(
        F.slice(F.reverse(F.sort_array(F.collect_list("__s"))), 1, k).alias("__t")
    )
    return (
        topk.select("src_id", F.posexplode("__t").alias("pos", "s"))
        .select(
            "src_id",
            (F.col("pos") + 1).cast("int").alias("rank"),
            F.col("s.nbr_id").alias("nbr_id"),
            F.col("s.c").alias("cos_sim"),
        )
    )


def nn_descent_round(
    edges: DataFrame,
    vectors: DataFrame,
    k: int,
    reverse_cap: int | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """One NN-Descent refinement round (Dong et al. 2011, "Efficient
    K-Nearest Neighbor Graph Construction for Generic Similarity
    Measures") over a directed kNN edge list ``(src_id, nbr_id,
    cos_sim)``: a node's improved neighbor candidates are its neighbors'
    neighbors in the UNDIRECTED graph (out-edges ∪ reverse edges), scored
    exactly and merged with the current edges under the same top-k rule.
    This is the standard recall lever for cell-restricted graphs — a
    boundary neighbor missed by the cell join is usually reachable through
    a shared neighbor two hops away.

    ``vectors`` must carry ``(id_col, __q, __s)`` (the
    :func:`quantize_vectors` integer vector + exact integer norm), e.g.
    the :func:`nearest_centroid` output passed through
    :func:`quantize_vectors`. ``edges.cos_sim`` must be the quantized
    integer ten-thousandth score :func:`score_id_pairs` emits — the merge
    relies on exact-duplicate rows collapsing under ``distinct()``, which
    pure-integer scores guarantee on both engines by construction.

    Plan at 100 TB: every frame is edge-bounded, never corpus-quadratic.
    The undirected list is ≤ 2·n·k rows; each node's expansion fan-out is
    capped at ``reverse_cap`` (default 2k, NN-Descent's ρ·K sampling made
    deterministic: top-cap by (cos DESC, id)) so the two-hop join emits
    ≤ n·cap² candidate rows — O(n·k²), linear in n. Scoring is an
    equi-join to the vector table (shuffle on id, near-uniform keys);
    hub nodes (high reverse in-degree) are exactly what the cap bounds.
    The merge is the same ONE collect_list aggregate as the base graph.
    Iterating rounds multiplies cost linearly; 1-2 rounds recover most
    boundary recall (measured in tests/test_recall_scales.py).
    """
    cap = reverse_cap if reverse_cap is not None else 2 * k
    und = (
        edges.select(
            F.col("src_id").alias("node"), F.col("nbr_id").alias("nbr"), "cos_sim"
        )
        .unionAll(
            edges.select(
                F.col("nbr_id").alias("node"), F.col("src_id").alias("nbr"), "cos_sim"
            )
        )
        .distinct()
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("node").orderBy(F.col("cos_sim").desc(), F.col("nbr").asc())
    )
    undc = und.withColumn("__rn", rn).filter(F.col("__rn") <= cap).select("node", "nbr")
    cand = (
        undc.alias("ha")
        .join(undc.alias("hb"), F.col("ha.nbr") == F.col("hb.node"))
        .filter(F.col("ha.node") != F.col("hb.nbr"))
        .select(F.col("ha.node").alias("src_id"), F.col("hb.nbr").alias("cand_id"))
        .distinct()
    )
    scored = score_id_pairs(cand, vectors, id_col=id_col)
    # identical rounding on both paths => exact-duplicate rows; distinct merges
    merged = edges.select("src_id", "nbr_id", "cos_sim").unionAll(scored).distinct()
    return knn_topk_edges(merged, k)


def score_id_pairs(
    pairs: DataFrame, vectors: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Exactly score an id-pair frame ``(src_id, cand_id)`` against the
    vector table: two equi-joins on near-uniform id keys + the scored
    cosine — the shared scoring tail of NN-Descent rounds and seed-edge
    construction. ``vectors`` carries ``(id_col, __q, __s)`` (the
    :func:`quantize_vectors` columns).

    ``cos_sim`` is the QUANTIZED-cosine integer ten-thousandth
    (:func:`int_cos_x1e4`) — pure BIGINT arithmetic end-to-end, NOT a
    rounded IEEE double (r9/r10 carried ``ROUND(double_cosine·10⁴)``
    here: the integer rode AFTER a float dot, two float sqrt norms, and a
    float multiply, leaving the hash contract hostage to both engines
    producing bit-identical doubles — the VERDICT r10 item-2 finding).
    Quantization error lands in the SCORE (a ~10⁻³-accurate ANN ranking
    key), never in reproducibility: both engines compute the identical
    integer from the identical quantized inputs by construction.
    Consumers emit ``cos_i / 10000.0`` at the query boundary, a single
    exact IEEE division that round-trips identically everywhere."""
    va = vectors.select(
        F.col(id_col).alias("src_id"), F.col("__q").alias("sq"), F.col("__s").alias("ss")
    )
    vb = vectors.select(
        F.col(id_col).alias("cand_id"), F.col("__q").alias("cq"), F.col("__s").alias("cs")
    )
    return (
        pairs.join(va, "src_id")
        .join(vb, "cand_id")
        .select(
            "src_id",
            F.col("cand_id").alias("nbr_id"),
            int_cos_x1e4(
                F.col("sq"), F.col("ss"), F.col("cq"), F.col("cs")
            ).alias("cos_sim"),
        )
    )


def semdedup_pairs(
    corpus: DataFrame,
    threshold: float,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_top: int = 1,
) -> DataFrame:
    """X2 (embedding, scale path) — SemDeDup-style semantic dedup
    (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication"): assign every vector to its nearest
    centroid, then search for near-duplicate pairs ONLY within a cluster.

    The quadratic all-pairs join becomes Σ_c |cluster_c|² ≈ n²/k, and the
    per-cluster joins are plain equi-shuffles on the cluster id. Centroids
    come from :func:`build_hash_centroids` with FIXED k — the centroid
    table is O(k) (broadcast never grows with the corpus) and assignment
    is O(n·k), not the O(n²/100) a corpus-sampled centroid set degrades
    to. Assignment itself is ONE aggregate: broadcast-crossJoin the k
    centroids, then ``max_by`` on (rounded cosine, −centroid_id) — partial
    map-side combine collapses the n·k scored rows to n before the only
    shuffle, and there is no per-vector window. Deterministic on both
    engines: fixed-point centroid means, rounded cosine, id tie-break.

    Recall trades off against k (only within-cluster pairs are found, and
    borderline pairs straddle boundaries): pick k for the target cluster
    size (n/k vectors each), not for recall — production SemDeDup accepts
    this by design. :func:`kmeans_iterate` centroids recover a few points
    of recall at the same k if needed, and ``assign_top=2`` (r7) applies
    the standard boundary-recall fix: each vector joins its TOP-2 nearest
    clusters, so a borderline pair is found whenever the two vectors share
    EITHER of their two cells. Cost model: assignment output doubles to
    2n rows and the within-cluster join quadruples to ≈ 4n²/k — the same
    Σ|cluster|² shape, still nothing quadratic in n — and pairs caught in
    both shared cells dedup through one (id_a, id_b) aggregate. For
    ``assign_top > 1`` the per-vector top-m runs as ONE collect_list(k
    structs)+sort_array+slice aggregate over the (cos, cid) scores only
    (map-side combinable, k-bounded — no per-vector window, and the
    64-dim vector itself is never replicated across the k scored rows).

    ``k`` may be ``"auto"`` (r10): resolved ONCE here via
    :func:`resolve_cell_count` so the centroid build and the assignment
    see the same count, cell COUNT scales with the corpus, and the
    Σ|cluster|² join stays linear in n (the registered auto-k twin is the
    benched scale-safe plan).
    """
    k = resolve_cell_count(corpus, k)
    side = ensure_min_partitions(corpus).select(
        F.col(id_col), _dbl(F.col(vec_col)).alias("__v"), norm(F.col(vec_col)).alias("__n")
    )
    cent = build_hash_centroids(corpus, k=k, id_col=id_col, vec_col=vec_col).select(
        F.col("cid").alias("__cid"),
        F.col("centroid").alias("__cv"),
        norm(F.col("centroid")).alias("__cn"),
    )
    cos_c = F.round(
        dot(F.col("__v"), F.col("__cv")) / (F.col("__n") * F.col("__cn")), 4
    )
    if assign_top == 1:
        assign = nearest_centroid(corpus, k=k, id_col=id_col, vec_col=vec_col).select(
            F.col(id_col), F.col("cluster"), F.col("__v"), F.col("__n")
        )
    else:
        # top-m assignment: one collect_list(k (cos, -cid, cid) structs) +
        # sort_array + slice aggregate — k-bounded per vector, map-side
        # combinable; descending struct order = cos DESC, cid ASC, the
        # same tie-break the m=1 max_by applies. The vector/norm ride the
        # group as any-row values (identical on every scored row).
        scored = side.crossJoin(F.broadcast(cent)).select(
            F.col(id_col),
            F.col("__v"),
            F.col("__n"),
            F.struct(
                cos_c.alias("c"), (-F.col("__cid")).alias("nc"), F.col("__cid").alias("cid")
            ).alias("__s"),
        )
        assign = (
            scored.groupBy(id_col)
            .agg(
                F.slice(
                    F.reverse(F.sort_array(F.collect_list("__s"))), 1, assign_top
                ).alias("__tops"),
                F.first("__v").alias("__v"),
                F.first("__n").alias("__n"),
            )
            .select(
                F.col(id_col),
                F.explode("__tops").alias("__t"),
                F.col("__v"),
                F.col("__n"),
            )
            .select(
                F.col(id_col), F.col("__t.cid").alias("cluster"), F.col("__v"), F.col("__n")
            )
        )
    # Pair join, skew-aware: the natural key (cluster) has only k distinct
    # values, so a plain equi-join runs k tasks no matter how many cores
    # exist and each task does |cluster|²/2 dot products. Salting spreads
    # it: side b carries bucket hash(id) % B, side a replicates each row
    # across all B target buckets — every (x < y) pair meets exactly once
    # (x lands in y's bucket), the join key becomes (cluster, bucket) with
    # k·B groups, and per-group work drops to |cluster|²/B. The persist
    # above keeps the B-fold replication from recomputing the assignment
    # aggregate per branch.
    assign = tracked_persist(assign)
    B = 8
    a = assign.withColumn("__b", F.explode(F.sequence(F.lit(0), F.lit(B - 1)))).alias("sa")
    b = assign.withColumn("__b", F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).cast("int")).alias(
        "sb"
    )
    cos = F.round(
        dot(F.col("sa.__v"), F.col("sb.__v")) / (F.col("sa.__n") * F.col("sb.__n")), 4
    )
    pairs = (
        a.join(
            b,
            (F.col("sa.cluster") == F.col("sb.cluster"))
            & (F.col("sa.__b") == F.col("sb.__b"))
            & (F.col(f"sa.{id_col}") < F.col(f"sb.{id_col}")),
        )
        .select(
            F.col("sa.cluster").alias("cluster"),
            F.col(f"sa.{id_col}").alias("id_a"),
            F.col(f"sb.{id_col}").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    if assign_top > 1:
        # a pair sharing BOTH of its cells is found twice — collapse to
        # one row per pair (cos is identical on both; cluster = the
        # smallest shared cell, deterministic)
        pairs = pairs.groupBy("id_a", "id_b").agg(
            F.min("cluster").alias("cluster"), F.min("cos_sim").alias("cos_sim")
        ).select("cluster", "id_a", "id_b", "cos_sim")
    return pairs.orderBy("cluster", "id_a", "id_b")


def pq_codebook(
    corpus: DataFrame,
    m: int = 8,
    kc: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 1,
) -> DataFrame:
    """Product-quantization codebook (Jégou et al. 2011, "Product
    quantization for nearest neighbor search"): split the vector into ``m``
    contiguous subspaces and learn ``kc`` centroids per subspace. Returns
    ``(s, c, cv)`` — subspace index, code id, centroid (dim/m doubles).

    Same deterministic recipe as :func:`build_hash_centroids`: code buckets
    init as ``id % kc`` and per-dim means use fixed-point BIGINT sums, then
    ``n_iter`` Lloyd rounds (:func:`_pq_lloyd_round`) tighten each
    subspace's codes — all bit-identical across engines and partitionings.
    Output is m·kc rows — O(1) in the corpus, always broadcastable: the
    codebook is a model artifact, not data.

    Persistence (optimization r15, guide §3.3/§5): the codebook is
    ``tracked_persist``-ed at init and after every Lloyd round. Each round
    references the previous codebook TWICE (assignment join + empty-code
    coalesce) and downstream consumers fold it twice more (``cbn`` +
    ``ptab``), so without a materialization point the whole
    corpus-pass-per-round training chain duplicated multiplicatively into
    the final plan — embedding_topk_ivf_pq's physical plan was 306
    Exchanges / 3,248 lines, re-running PQ training several times per
    execution. Persisting an m·kc-row model table per round is the same
    contract :func:`kmeans_iterate` has always had.
    """
    pd_ = (
        corpus.select(
            (F.col(id_col) % kc).cast("int").alias("c"),
            unit_vec(F.col(vec_col)).alias("__u"),
        )
        .select("c", F.posexplode(F.col("__u")).alias("dim", "val"))
        .withColumn("s", F.floor(F.col("dim") / 8).cast("int"))
        .withColumn("sv", F.floor(F.col("val") * CENTROID_SCALE).cast("long"))
        .groupBy("s", "c", "dim")
        .agg(F.sum("sv").alias("sm"), F.count(F.lit(1)).alias("n"))
        .select(
            "s",
            "c",
            "dim",
            (F.col("sm") / (F.col("n") * F.lit(float(CENTROID_SCALE)))).alias(
                "mean_val"
            ),
        )
    )
    cb = tracked_persist(
        pd_.groupBy("s", "c")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mean_val"))).alias("p"))
        .select("s", "c", F.transform("p", lambda x: x.mean_val).alias("cv"))
    )
    for _ in range(n_iter):
        cb = tracked_persist(
            _pq_lloyd_round(corpus, cb, kc=kc, id_col=id_col, vec_col=vec_col)
        )
    return cb


def _pq_lloyd_round(
    corpus: DataFrame,
    cb: DataFrame,
    kc: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """One Lloyd refinement per subspace: re-assign every subvector to its
    nearest code (fixed-point BIGINT distance, ties → smaller code), then
    recompute fixed-point means per (subspace, code). Codes that lose all
    members keep the previous centroid (the ``kmeans_iterate`` contract).

    The hash-bucket init puts every initial centroid near the subspace
    data mean, which makes raw-init ADC a blunt instrument; one round
    separates the codes enough to double shortlist recall on the fixture
    (see tests/test_model_filters.py). Cost: one corpus pass — an
    m-per-row explode, a broadcast join against the m·kc codebook, and two
    narrow aggregates. Training cost, not scoring cost.
    """
    dsub = 8
    vs = (
        corpus.select(F.col(id_col), unit_vec(F.col(vec_col)).alias("__u"))
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(7)),
                    lambda s: F.struct(
                        s.cast("int").alias("s"),
                        F.slice(F.col("__u"), s * dsub + 1, dsub).alias("vsub"),
                    ),
                )
            ).alias("x"),
        )
        .select(id_col, "x.s", "x.vsub")
    )
    dfx = F.floor(
        F.lit(PQ_SCALE)
        * F.aggregate(
            F.zip_with(F.col("vsub"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    ).cast("long")
    assigned = (
        vs.join(F.broadcast(cb), "s")
        .select(id_col, "s", "vsub", F.col("c"), dfx.alias("dfx"))
        .groupBy(id_col, "s")
        .agg(
            F.min_by(
                F.struct(F.col("c"), F.col("vsub")),
                F.struct(F.col("dfx"), F.col("c")),
            ).alias("b")
        )
        .select("s", F.col("b.c").alias("c"), F.col("b.vsub").alias("vsub"))
    )
    pd1 = (
        assigned.select(
            "s", "c", F.posexplode(F.col("vsub")).alias("i", "val")
        )
        .withColumn("sv", F.floor(F.col("val") * CENTROID_SCALE).cast("long"))
        .groupBy("s", "c", "i")
        .agg(F.sum("sv").alias("sm"), F.count(F.lit(1)).alias("n"))
        .select(
            "s",
            "c",
            "i",
            (F.col("sm") / (F.col("n") * F.lit(float(CENTROID_SCALE)))).alias(
                "mean_val"
            ),
        )
    )
    cb1 = (
        pd1.groupBy("s", "c")
        .agg(F.array_sort(F.collect_list(F.struct("i", "mean_val"))).alias("p"))
        .select("s", "c", F.transform("p", lambda x: x.mean_val).alias("cv1"))
    )
    # both sides are O(m·kc) model tables — broadcast explicitly (the
    # initial plan would otherwise SMJ two 128-row aggregates; the hint is
    # safe because the codebook size is a parameter, never corpus-scale)
    return cb.join(F.broadcast(cb1), ["s", "c"], "left").select(
        "s", "c", F.coalesce(F.col("cv1"), F.col("cv")).alias("cv")
    )


#: fixed-point scale for PQ distances / ADC partial dots: floor(x·1e7) as
#: BIGINT makes every comparison and every cross-subspace SUM exact integer
#: arithmetic — order-free and engine-portable (float sums are neither).
PQ_SCALE = 10_000_000.0


def pq_adc_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    m: int = 8,
    kc: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train: DataFrame | None = None,
    cb: DataFrame | None = None,
) -> DataFrame:
    """X3 scale path — PQ-ADC retrieval with exact re-rank: encode every
    vector as ``m`` one-byte codes, score candidates by Asymmetric
    Distance Computation (sum of per-subspace query·centroid partial dot
    products — a 128-entry table lookup instead of a 64-dim dot), keep a
    ``shortlist``, then re-rank the shortlist with the TRUE cosine. This
    is the memory story behind billion-vector ANN (FAISS IVF-PQ): 8 bytes
    per vector instead of 256, so the scan set fits in RAM at scales where
    raw vectors cannot; compose with the IVF cell probe
    (:func:`ivf_topk_kmeans`) to also cut the scan set — the two are
    orthogonal stages of the same pipeline.

    Spark shape — ZERO corpus-scale shuffles after the codebook agg: the
    codebook and the query's ADC table are folded into ONE broadcast row
    of nested arrays (``cbn[s][c][i]``, ``ptab[s][c]``), and encoding +
    scoring run per-row inside higher-order functions (slice, zip_with
    fold, array_min over (dist, code) structs, element_at lookups) — a
    pure map stage, then TakeOrdered(shortlist) carrying the vector, then
    a broadcast crossJoin re-rank of ``shortlist`` rows. Deterministic on
    both engines: fixed-point codebook means, floor-scaled BIGINT
    distances and partial dots (integer argmin/sums — no float ordering
    anywhere), code ties to the smaller id, final ties to ``id_col``.
    """
    assert m == 8, "fixture vectors are 64-dim; 8 dims per subspace"
    dsub = 8  # 64-dim fixture vectors / m
    # ``train`` separates codebook training from scan set: IVF-PQ trains on
    # the full corpus but encodes/scores only probed cells (default: same).
    # ``cb`` (r16-opt): a caller holding the TRAINED codebook as a committed
    # (s, c, cv) table passes it and training is skipped — the serving-
    # from-committed-artifacts posture (see plans/llm_ext5._pq_serving_tables).
    if cb is None:
        cb = pq_codebook(
            train if train is not None else corpus,
            m=m, kc=kc, id_col=id_col, vec_col=vec_col,
        )
    # ONE broadcastable row: cbn[s][c][i] — nested sort_array folds keep
    # subspace and code order deterministic.
    cbn = (
        cb.groupBy("s")
        .agg(F.array_sort(F.collect_list(F.struct("c", "cv"))).alias("p"))
        .select("s", F.transform("p", lambda x: x.cv).alias("cbs"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("s", "cbs"))).alias("p"))
        .select(F.transform("p", lambda x: x.cbs).alias("cbn"))
    )
    # query-side ADC table ptab[s][c] = floor(1e7 · q_sub·centroid)
    q1 = query.select(unit_vec(F.col(vec_col)).alias("__qv"))
    ptab = (
        cb.crossJoin(F.broadcast(q1))
        .select(
            "s",
            "c",
            F.floor(
                F.lit(PQ_SCALE)
                * F.aggregate(
                    F.zip_with(
                        F.slice(F.col("__qv"), F.col("s") * dsub + 1, dsub),
                        F.col("cv"),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
            .cast("long")
            .alias("pfx"),
        )
        .groupBy("s")
        .agg(F.array_sort(F.collect_list(F.struct("c", "pfx"))).alias("p"))
        .select("s", F.transform("p", lambda x: x.pfx).alias("ps"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("s", "ps"))).alias("p"))
        .select(F.transform("p", lambda x: x.ps).alias("ptab"))
    )
    v = F.col("__u")
    # per-row: for each subspace pick argmin_{c} floor(1e7·L2²(v_s, cb[s][c]))
    # (ties → smaller c), then sum the 8 ADC table entries — exact BIGINTs.
    dist_fx = lambda s, c: F.floor(
        F.lit(PQ_SCALE)
        * F.aggregate(
            F.zip_with(
                F.slice(v, s * dsub + 1, dsub),
                F.element_at(F.element_at(F.col("cbn"), s + 1), c + 1),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    ).cast("long")
    best_code = lambda s: F.array_min(
        F.transform(
            F.sequence(F.lit(0), F.lit(kc - 1)),
            lambda c: F.struct(dist_fx(s, c).alias("d"), c.alias("c")),
        )
    )["c"]
    adc_fx = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.element_at(
                F.element_at(F.col("ptab"), s + 1), best_code(s) + 1
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    short = (
        # normalize ONCE per row in its own projection — referencing
        # unit_vec inside the 128 encode lambdas would re-evaluate the norm
        # per term (higher-order-function bodies sit outside codegen's
        # common-subexpression elimination; measured 4x on the fixture).
        # __v stays the RAW vector: the re-rank's exact-cosine arithmetic
        # must be the brute-force twin's, not a pre-normalized variant that
        # rounds differently in the last bit.
        ensure_min_partitions(corpus)
        .select(
            F.col(id_col),
            _dbl(F.col(vec_col)).alias("__v"),
            unit_vec(F.col(vec_col)).alias("__u"),
        )
        .crossJoin(F.broadcast(cbn))
        .crossJoin(F.broadcast(ptab))
        .select(F.col(id_col), F.col("__v"), adc_fx.alias("__adc"))
        .orderBy(F.col("__adc").desc(), F.col(id_col))
        .limit(shortlist)
    )
    qn = query.select(
        _dbl(F.col(vec_col)).alias("__qv"), norm(F.col(vec_col)).alias("__qn")
    )
    sim = F.round(
        F.aggregate(
            F.zip_with(F.col("__v"), F.col("__qv"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("__v"), lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
            * F.col("__qn")
        ),
        4,
    )
    return (
        short.crossJoin(F.broadcast(qn))
        .select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_pq_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    shortlist: int = 30,
    n_cells: int = 16,
    n_probe: int = 6,
    n_iter: int = 2,
    kc: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent: DataFrame | None = None,
    assign: DataFrame | None = None,
    cb: DataFrame | None = None,
) -> DataFrame:
    """X3 — the COMPOSED FAISS-style index: IVF cell probe (scan cut) ×
    PQ-ADC codes (memory cut) × exact re-rank. The two halves the
    docstrings of :func:`ivf_topk_kmeans` and :func:`pq_adc_topk` describe
    as orthogonal, composed the way a production billion-vector index
    actually runs: probe the ``n_probe`` nearest of ``n_cells`` coarse
    cells, ADC-score ONLY vectors assigned to probed cells against the
    query's distance table, shortlist, re-rank with true cosine.

    Scan set ≈ (n_probe/n_cells)·corpus and each scanned vector costs a
    table lookup instead of a 64-dim dot; memory per vector is m codes.
    The PQ codebook trains on the FULL corpus (``train=`` arg — the
    codebook must not depend on which cells a query probes, or codes
    would be query-dependent). The coarse stage is the SAME Lloyd-refined
    k-means assignment+probe as ``embedding_topk_ivf_kmeans``
    (:func:`kmeans_assign_and_probe` — factored so the two cannot drift),
    with the family's probe-6 recall knob as the default: on this
    fixture's near-isotropic synthetic embeddings the probe is the recall
    bottleneck (hash-init cells measured 0.42 mean recall@10; Lloyd+6
    probes ≈ 0.6+). Deterministic end-to-end, so the DuckDB oracle
    replays the full composition.

    ``cent``/``assign``/``cb`` (r16-opt): the trained index artifacts as
    committed tables (see :func:`kmeans_assign_and_probe` /
    :func:`pq_adc_topk`) — with all three provided, serving runs ZERO
    training passes: probe the committed centroids, semi-join the
    committed assignment, ADC-score against the committed codebook.
    """
    assign, probed = kmeans_assign_and_probe(
        corpus, query, n_clusters=n_cells, n_probe=n_probe, n_iter=n_iter,
        id_col=id_col, vec_col=vec_col, cent=cent, assign=assign,
    )
    in_cells = assign.join(probed, "__cid", "left_semi").select(id_col)
    # NO broadcast hint: in_cells is (n_probe/n_cells)·corpus — it SCALES.
    # At 100 TB the assignment is a stored partition column and this join
    # becomes partition pruning (the ivf_topk_kmeans note); AQE picks the
    # strategy at fixture scale.
    subset = corpus.join(in_cells, id_col, "left_semi")
    return pq_adc_topk(
        subset,
        query,
        k=k,
        shortlist=shortlist,
        kc=kc,
        id_col=id_col,
        vec_col=vec_col,
        train=corpus,
        cb=cb,
    )


# ---------------------------------------------------------------------------
# MMR diverse re-ranking


def mmr_rerank(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """X3 — Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick ``k`` results maximizing ``λ·rel − (1−λ)·max
    sim-to-selected`` with λ = 0.5, the diversity-aware final stage a
    retrieval pipeline runs after any ANN shortlist.

    Scale shape at 100 TB: the ONLY corpus-scale work is the shortlist scan
    (map-only cosine + TakeOrdered(``shortlist``) — identical plan to
    brute_force_topk; swap in any ANN arm for the same contract). Both the
    pairwise-similarity join and the greedy loop run on the BOUNDED
    shortlist (50×49 pair rows, one Arrow group), so re-rank cost is
    O(shortlist²) regardless of corpus size — the standard shortlist/
    re-rank split (same as pq_adc_topk's exact re-rank).

    Determinism contract: relevance and pair similarities are fixed-point
    integer ten-thousandths (``ROUND(cos·10⁴) AS BIGINT``) BEFORE the
    greedy argmax, and with λ = 0.5, ``argmax(0.5·rel − 0.5·maxsim)``
    ≡ ``argmax(rel_i − maxsim_i)`` — an INTEGER comparison with an id
    tie-break, so Spark and a step-unrolled SQL oracle select identical
    sets (float MMR scores would sit exactly on rounding halves — the
    registry-banned class). Emitted ``mmr`` is the integer score / 10⁴.
    """
    q = F.broadcast(query.select(F.col(vec_col).alias("__qvec")))
    rel_i = F.round(cosine(F.col(vec_col), F.col("__qvec")) * 10000).cast("long")
    cand = (
        ensure_min_partitions(corpus)
        .crossJoin(q)
        .select(F.col(id_col), F.col(vec_col), rel_i.alias("rel"))
        .orderBy(F.col("rel").desc(), F.col(id_col))
        .limit(shortlist)
    )
    a = cand.select(
        F.col(id_col).alias("pa"), F.col(vec_col).alias("va"), F.col("rel")
    )
    b = cand.select(F.col(id_col).alias("pb"), F.col(vec_col).alias("vb"))
    pairs = (
        a.join(b, F.col("pa") != F.col("pb"))
        .select(
            "pa",
            "pb",
            "rel",
            F.round(cosine(F.col("va"), F.col("vb")) * 10000)
            .cast("long")
            .alias("sim"),
        )
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        rel = pdf.groupby("pa")["rel"].first().to_dict()
        sims = {(int(r.pa), int(r.pb)): int(r.sim) for r in pdf.itertuples()}
        remaining = sorted(int(i) for i in rel)
        selected: list[int] = []
        out = []
        for rank in range(1, min(k, len(remaining)) + 1):
            best_id, best_score = None, None
            for c in remaining:
                ms = max((sims.get((c, s), 0) for s in selected), default=0)
                score = int(rel[c]) - ms
                if best_score is None or score > best_score:
                    best_id, best_score = c, score
            selected.append(best_id)
            remaining.remove(best_id)
            out.append((rank, best_id, best_score / 10000.0))
        return pd.DataFrame(out, columns=["rank", id_col, "mmr"])

    return (
        pairs.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(greedy, schema=f"rank int, {id_col} long, mmr double")
        .orderBy("rank")
    )
