"""[EXT] curation round 15 — containment dedup, contrastive pair
mining, retrieval-quality audits, weighted sampling, and DQ breadth
(SURVEY.md §2.9 X2/X3+/X4+, §2 Q/DQ).

Entries: ``containment_overlap_pairs``, ``hard_negative_pairs``,
``lsh_recall_report``, ``ann_ranking_report``, ``benford_amount_audit``,
``weighted_sample_es_topn``, ``fk_orphan_audit`` (and
``stream_containment_screen`` lives with the streaming registrations).

- ``containment_overlap_pairs`` — Broder (1997) distinguishes
  RESEMBLANCE (Jaccard — what every registered near-dup funnel
  thresholds) from CONTAINMENT C(A,B) = |A∩B|/|A|: a short document
  quoted wholesale inside a long one scores high containment but LOW
  Jaccard (the union is dominated by B), so the resemblance funnels
  never surface it. This entry emits the ordered doc-inside-doc
  evidence pairs the quote/boilerplate-excision stage of a curation run
  reads — the asymmetric complement of ``ssjoin_prefix_filter``.

- ``hard_negative_pairs`` — ANCE/DPR-style contrastive-pair curation
  (Xiong et al. 2021; Karpukhin et al. 2020): for each panel query, the
  top-k cosine-nearest documents that are NOT near-duplicates — nearest
  non-dup neighbors are exactly the "hard negatives" a retrieval/
  embedding trainer mines from the corpus; near-dups would be false
  negatives (they ARE the query, lexically) and must be excluded, which
  composes the registered near-dup evidence instead of restating it.

Both reuse the repo's shared machinery: the shingle/posting idiom and
the ``ceil_frac`` exact rational ceiling (operators/dedup.py), and the
fixed-point integer cosine of the embedding family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import tracked_persist
from ..registry import register
from ..sources.tables import load

#: containment threshold as an EXACT rational (4/5 = 0.8): the qualify
#: compare is c·DEN >= NUM·n_a in integers on both engines — no float
#: ever touches the boundary (the _FUZZ_T unrounded-ratio precedent).
_CONT_NUM, _CONT_DEN = 4, 5

# The shared 3-gram shingle CTE text (llm_ext._DUCK_SHINGLES restated
# via import — oracles must be self-contained strings, so the import
# happens at oracle-build time and the TEXT is embedded).


def _containment_oracle() -> str:
    """EXACT all-pairs containment via the inverted-index equi-join (the
    ssjoin/fuzzy-decon oracle shape — any pair with c >= 1 shares a
    shingle, so posting collisions enumerate every candidate); the
    funnel's prefix cut is recall-lossless by theorem, so the plain join
    must agree."""
    from .llm_ext import _DUCK_SHINGLES

    return f"""
    WITH {_DUCK_SHINGLES},
    sizes AS (SELECT doc_id, LEN(s) AS n FROM sh),
    ex AS (SELECT doc_id, UNNEST(s) AS shingle FROM sh),
    inter AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb, CAST(COUNT(*) AS BIGINT) AS c
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT ida AS doc_id, idb AS container_id,
           CAST(sa.n AS BIGINT) AS n_shingles, c AS n_shared,
           CAST(c * 10000 // sa.n AS BIGINT) AS containment_bp
    FROM inter JOIN sizes sa ON sa.doc_id = ida
    WHERE c * {_CONT_DEN} >= sa.n * {_CONT_NUM}
    ORDER BY doc_id, container_id
    """


@register("containment_overlap_pairs", oracle=_containment_oracle())
def q_containment_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 (r15) — ordered CONTAINMENT pairs: every (doc, container) with
    |A∩B|/|A| >= {_CONT_NUM}/{_CONT_DEN} over 3-gram shingles, A != B —
    Broder's containment coefficient, the doc-inside-doc direction the
    Jaccard funnels are blind to (a fully-quoted short doc against a long
    host reads J ≈ |A|/|B| ≈ 0 but C = 1). Emits (doc_id, container_id,
    n_shingles, n_shared, containment_bp) with the ratio in exact basis
    points; the threshold compares c·{_CONT_DEN} >= n·{_CONT_NUM} in
    integers so the boundary is engine-identical.

    Candidate funnel — the ASYMMETRIC prefix theorem: if C(A,B) >= t
    then at most n_a − ceil(t·n_a) of A's shingles miss B, so among A's
    first n_a − ceil(t·n_a) + 1 shingles under ANY fixed global order at
    least one lands in B. Ordering rarest-first (corpus df ascending,
    the PPJoin discipline) and equi-joining ONLY A's prefix against B's
    full posting list yields a candidate superset at 100% recall —
    recall by THEOREM, like ``ssjoin_prefix_filter``, with
    ``ceil_frac`` keeping the ceiling exact where float ceil loses a
    slot. Candidates verify exactly via array_intersect on the full
    shingle arrays.

    Plan at 100 TB: one shingle pass (persisted — it feeds the
    frequency agg, the ranked re-agg, and the verify), one vocab-sized
    frequency agg, the prefix×posting equi-join (hash-partitioned on
    the shingle; prefix slots hold the RAREST shingles so hot-shingle
    buckets never enter from the A side), and a candidate-sized verify
    join. No all-pairs product anywhere; every shuffle an equi-key.
    """
    from ..operators.dedup import containment_pairs

    return containment_pairs(
        load(spark, sf_dir, "documents"), num=_CONT_NUM, den=_CONT_DEN
    ).orderBy("doc_id", "container_id")


# ---------------------------------------------------------------------------
# hard_negative_pairs — contrastive-pair curation over the embedding corpus

_HN_K = 10  # negatives mined per query
_HN_QMOD, _HN_QREM = 100, 3  # deterministic query panel: vec_id % 100 = 3
_HN_DUP_T = 4000  # near-dup cut in integer-cosine x1e4 units (0.4)


def _hard_negative_oracle() -> str:
    """Panel×corpus integer-cosine scoring (the matryoshka instrument
    shape) split at the SAME integer near-dup boundary on both engines;
    ``_int_cos_sql`` is llm_ext7's shared guarded pure-integer score, so
    the whole mining decision value-hash-replays in SQL."""
    from .llm_ext7 import _int_cos_sql

    return f"""
    WITH qv AS MATERIALIZED (
      SELECT vec_id, q,
             CASE WHEN (s0 + 1) * (s0 + 1) <= n2 THEN s0 + 1
                  WHEN s0 * s0 > n2 THEN s0 - 1 ELSE s0 END AS s
      FROM (
        SELECT vec_id, q, n2,
               CAST(FLOOR(SQRT(CAST(n2 AS DOUBLE))) AS BIGINT) AS s0
        FROM (
          SELECT vec_id, q,
                 CAST(LIST_SUM(LIST_TRANSFORM(q, x -> x * x)) AS BIGINT) AS n2
          FROM (
            SELECT vec_id,
                   LIST_TRANSFORM(embedding, x ->
                     CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
            FROM embeddings)))
    ),
    scored AS MATERIALIZED (
      SELECT p.vec_id AS query_id, c.vec_id AS cand_id,
             {_int_cos_sql("p.q", "p.s", "c.q", "c.s")} AS cos_x1e4
      FROM qv p JOIN qv c ON c.vec_id <> p.vec_id
      WHERE p.vec_id % {_HN_QMOD} = {_HN_QREM}
    ),
    negs AS (
      SELECT query_id, cand_id, cos_x1e4,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_x1e4 DESC, cand_id) AS rnk
      FROM scored WHERE cos_x1e4 < {_HN_DUP_T}
    ),
    dups AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_dups_excluded
      FROM scored WHERE cos_x1e4 >= {_HN_DUP_T} GROUP BY query_id
    )
    SELECT n.query_id, n.cand_id AS negative_id, CAST(n.rnk AS INT) AS rank,
           CAST(n.cos_x1e4 AS BIGINT) AS score_x1e4,
           COALESCE(d.n_dups_excluded, 0) AS n_dups_excluded
    FROM negs n LEFT JOIN dups d ON d.query_id = n.query_id
    WHERE n.rnk <= {_HN_K}
    ORDER BY n.query_id, rank
    """


@register("hard_negative_pairs", oracle=_hard_negative_oracle())
def q_hard_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+ (r15) — HARD-NEGATIVE mining for contrastive training
    (ANCE, Xiong et al. 2021; DPR, Karpukhin et al. 2020): per
    deterministic panel query (vec_id % {_HN_QMOD} = {_HN_QREM}), the
    top-{_HN_K} cosine-NEAREST candidates BELOW the near-duplicate cut —
    nearest non-duplicates are exactly the negatives that teach a
    retriever its decision boundary, while anything above the cut is a
    probable FALSE negative (it IS the query, near-verbatim) and is
    excluded and counted. Emits (query_id, negative_id, rank,
    score_x1e4, n_dups_excluded) — the per-query exclusion count is the
    false-negative-risk audit column a trainer monitors.

    The dup boundary lives in the SAME integer-cosine metric as the
    score itself ({_HN_DUP_T} x1e4 units, the 0.4 embedding near-dup
    regime), so the split is one integer compare with no float boundary
    (the fuzzy-decon unrounded-threshold discipline).

    Plan at 100 TB: the panel is corpus-fraction-thin and BROADCAST;
    scoring is ONE map-only pass over the corpus (no corpus-side
    shuffle), then per-query top-k over |panel|·k rows and a model-sized
    exclusion agg — the matryoshka instrument shape. Production swaps
    the exact scorer for the IVF/PQ/graph serving family and keeps the
    same split-and-rank tail; the exact arm is the instrument that
    validates that swap (`ivf_recall_report`'s contract).
    """
    from pyspark.sql import Window

    from ..operators.similarity import _dbl, int_cos_x1e4, quantize_vectors

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _dbl(F.col("embedding")).alias("__v")
    )
    qv = quantize_vectors(emb).select("vec_id", "__q", "__s")
    queries = qv.filter(
        F.col("vec_id") % _HN_QMOD == F.lit(_HN_QREM)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("__q").alias("qq"),
        F.col("__s").alias("qs"),
    )
    # persisted: the scored frame feeds the rank window AND the
    # exclusion agg (no shuffle between them — ReuseExchange cannot
    # deduplicate a map-only scoring pass; the matryoshka precedent)
    scored = tracked_persist(
        qv.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            int_cos_x1e4(
                F.col("qq"), F.col("qs"), F.col("__q"), F.col("__s")
            ).alias("cos_x1e4"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_x1e4").desc(), F.col("cand_id")
    )
    negs = (
        scored.filter(F.col("cos_x1e4") < _HN_DUP_T)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _HN_K)
    )
    dups = (
        scored.filter(F.col("cos_x1e4") >= _HN_DUP_T)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dups_excluded"))
    )
    return (
        negs.join(dups, "query_id", "left")
        .select(
            "query_id",
            F.col("cand_id").alias("negative_id"),
            F.col("rank").cast("int").alias("rank"),
            F.col("cos_x1e4").cast("long").alias("score_x1e4"),
            F.coalesce("n_dups_excluded", F.lit(0)).cast("long").alias(
                "n_dups_excluded"
            ),
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# lsh_recall_report — measured banding recall, the MinHash family's audit

_LSH_PERMS = 32  # portable twin of operators.dedup.MINHASH_PERMS
_LSH_BAND_ROWS = 2  # 16 bands x 2 rows — the registered banding geometry
_LSH_RPT_NUM, _LSH_RPT_DEN = 1, 2  # J >= 1/2, minhash_near_dups' threshold


def _lsh_recall_oracle() -> str:
    """Replays the ENTIRE report in SQL: md5-permutation minhash
    signatures (the portable-simhash precedent — production uses
    xxhash64, the audit twin pays ~2x hash cost for replayability),
    tuple-banding candidates, the exact inverted-index pair table, and
    the per-band + union coverage rollup."""
    from .llm_ext import _DUCK_SHINGLES

    n_bands = _LSH_PERMS // _LSH_BAND_ROWS
    md5_32 = (
        "CAST(LIST_SUM(LIST_TRANSFORM(range(8), h -> "
        "CAST(strpos('0123456789abcdef', substr(md5(g || '#' || CAST(i AS VARCHAR)), h + 1, 1)) - 1 "
        "AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (7 - h))))) AS BIGINT)"
    )
    return f"""
    WITH {_DUCK_SHINGLES},
    sizes AS (SELECT doc_id, LEN(s) AS n FROM sh),
    ex AS (SELECT doc_id, UNNEST(s) AS shingle FROM sh),
    inter AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb, CAST(COUNT(*) AS BIGINT) AS c
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT ida, idb FROM inter
      JOIN sizes sa ON sa.doc_id = ida JOIN sizes sb ON sb.doc_id = idb
      WHERE ({_LSH_RPT_DEN} + {_LSH_RPT_NUM}) * c >= {_LSH_RPT_NUM} * (sa.n + sb.n)
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM exact),
    mh AS (
      SELECT doc_id,
             LIST_TRANSFORM(range({_LSH_PERMS}), i ->
               LIST_MIN(LIST_TRANSFORM(s, g -> {md5_32}))) AS sig
      FROM sh
    ),
    bands AS (
      SELECT doc_id, CAST(b AS INT) AS band_idx,
             sig[{_LSH_BAND_ROWS} * b + 1] AS v1,
             sig[{_LSH_BAND_ROWS} * b + 2] AS v2
      FROM mh, UNNEST(range({n_bands})) AS u(b)
    ),
    cand AS (
      SELECT a.band_idx, a.doc_id AS ida, b.doc_id AS idb
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.v1 = b.v1 AND a.v2 = b.v2
       AND a.doc_id < b.doc_id
    ),
    per_band AS (
      SELECT band_idx, CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
             CAST(COUNT(*) FILTER (WHERE e.ida IS NOT NULL) AS BIGINT)
               AS n_qualifying_hit
      FROM cand c LEFT JOIN exact e ON e.ida = c.ida AND e.idb = c.idb
      GROUP BY band_idx
    ),
    uni AS (
      SELECT CAST(-1 AS INT) AS band_idx,
             CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
             CAST(COUNT(*) FILTER (WHERE e.ida IS NOT NULL) AS BIGINT)
               AS n_qualifying_hit
      FROM (SELECT DISTINCT ida, idb FROM cand) c
      LEFT JOIN exact e ON e.ida = c.ida AND e.idb = c.idb
    ),
    grid AS (SELECT CAST(b AS INT) AS band_idx
             FROM UNNEST(range({n_bands})) AS u(b)
             UNION ALL SELECT CAST(-1 AS INT))
    SELECT g.band_idx,
           CAST(COALESCE(r.n_candidate_pairs, 0) AS BIGINT) AS n_candidate_pairs,
           CAST(COALESCE(r.n_qualifying_hit, 0) AS BIGINT) AS n_qualifying_hit,
           (SELECT t FROM tot) AS n_qualifying_total,
           CASE WHEN (SELECT t FROM tot) > 0
                THEN CAST(COALESCE(r.n_qualifying_hit, 0) * 10000
                          // (SELECT t FROM tot) AS BIGINT)
           END AS recall_bp
    FROM grid g
    LEFT JOIN (SELECT * FROM per_band UNION ALL SELECT * FROM uni) r
      ON r.band_idx = g.band_idx
    ORDER BY g.band_idx
    """


@register("lsh_recall_report", oracle=_lsh_recall_oracle())
def q_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+ (r15) — the MEASURED recall of MinHash LSH banding against
    the exact qualifying pair set (J >= {_LSH_RPT_NUM}/{_LSH_RPT_DEN},
    the registered near-dup threshold): per band, candidate pairs
    produced and how many are truly qualifying; the band_idx = -1 row is
    the union over all bands — its recall_bp IS the banding's measured
    recall, the number `minhash_near_dups` relies on probabilistically
    (P(miss | J >= 0.9) ≈ 3e-12 in theory; THIS entry turns the theory
    into a driver-checkable measurement, `ivf_recall_report`'s contract
    for the lexical family). Emits (band_idx, n_candidate_pairs,
    n_qualifying_hit, n_qualifying_total, recall_bp).

    Portability: the audit twin runs md5-derived permutations (the
    simhash_portable precedent — production banding stays xxhash64; the
    ~2x hash cost is the documented price of a value-hash-replayable
    oracle), and bands join on the raw VALUE TUPLE instead of a second
    hash — one fewer hash layer, identical bucketing semantics.

    Plan at 100 TB: signatures are one map-only pass (minhash is
    array_min per permutation, no explode); banding self-joins on
    (band_idx, v1, v2) equi-keys — bucket collisions only, never
    all-pairs; the exact pair table is the inverted-index equi-join. In
    production the exact arm runs on a SAMPLED slice (the instrument
    pattern); the banding arm is the production shape itself.
    """
    from ..functions.text import shingles
    from ..operators.scaling import ensure_min_partitions

    n_bands = _LSH_PERMS // _LSH_BAND_ROWS
    docs = ensure_min_partitions(load(spark, sf_dir, "documents"))
    sh = tracked_persist(
        docs.select("doc_id", shingles(F.col("text")).alias("sh"))
    )
    # exact qualifying pairs via the inverted-index equi-join
    tok = sh.select("doc_id", F.explode("sh").alias("t"))
    sizes = sh.select("doc_id", F.size("sh").alias("n"))
    inter = (
        tok.alias("a")
        .join(
            tok.alias("b"),
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("ida"), F.col("b.doc_id").alias("idb")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    exact = tracked_persist(
        inter.join(sizes.withColumnRenamed("doc_id", "ida"), "ida")
        .withColumnRenamed("n", "na")
        .join(
            sizes.withColumnRenamed("doc_id", "idb").withColumnRenamed(
                "n", "nb"
            ),
            "idb",
        )
        .filter(
            (_LSH_RPT_DEN + _LSH_RPT_NUM) * F.col("c")
            >= _LSH_RPT_NUM * (F.col("na") + F.col("nb"))
        )
        .select("ida", "idb", F.lit(True).alias("__q"))
    )
    tot = exact.agg(F.count(F.lit(1)).cast("long").alias("t"))
    # portable md5 minhash signatures (project the array COLUMN first —
    # the sibling-projection lesson)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(_LSH_PERMS - 1)),
        lambda i: F.array_min(
            F.transform(
                F.col("sh"),
                lambda g: F.conv(
                    F.substring(
                        F.md5(F.concat_ws("#", g, i.cast("string"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long"),
            )
        ),
    )
    mh = sh.select("doc_id", sig.alias("sig"))
    bands = mh.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    F.element_at(
                        F.col("sig"), (_LSH_BAND_ROWS * b + 1).cast("int")
                    ).alias("v1"),
                    F.element_at(
                        F.col("sig"), (_LSH_BAND_ROWS * b + 2).cast("int")
                    ).alias("v2"),
                ),
            )
        ).alias("band_idx", "bv"),
    ).select("doc_id", F.col("band_idx").cast("int"), "bv.v1", "bv.v2")
    cand = tracked_persist(
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.v1") == F.col("b.v1"))
            & (F.col("a.v2") == F.col("b.v2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.band_idx").alias("band_idx"),
            F.col("a.doc_id").alias("ida"),
            F.col("b.doc_id").alias("idb"),
        )
    )
    per_band = (
        cand.join(exact, ["ida", "idb"], "left")
        .groupBy("band_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
            F.count("__q").cast("long").alias("n_qualifying_hit"),
        )
    )
    uni = (
        cand.select("ida", "idb")
        .distinct()
        .join(exact, ["ida", "idb"], "left")
        .agg(
            F.lit(-1).cast("int").alias("band_idx"),
            F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
            F.count("__q").cast("long").alias("n_qualifying_hit"),
        )
    )
    grid = spark.range(n_bands).select(
        F.col("id").cast("int").alias("band_idx")
    ).unionAll(
        spark.range(1).select(F.lit(-1).cast("int").alias("band_idx"))
    )
    return (
        grid.join(per_band.unionByName(uni), "band_idx", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "band_idx",
            F.coalesce("n_candidate_pairs", F.lit(0)).cast("long").alias(
                "n_candidate_pairs"
            ),
            F.coalesce("n_qualifying_hit", F.lit(0)).cast("long").alias(
                "n_qualifying_hit"
            ),
            F.col("t").alias("n_qualifying_total"),
            F.when(
                F.col("t") > 0,
                F.expr(
                    "CAST(COALESCE(n_qualifying_hit, 0) * 10000 DIV t AS BIGINT)"
                ),
            ).alias("recall_bp"),
        )
        .orderBy("band_idx")
    )


# ---------------------------------------------------------------------------
# ann_ranking_report — MRR + integer nDCG for the IVF serving arm

_ARR_K = 10  # panel depth, matches ivf_recall_report/_IVR_K

#: log2 discount grid in integer micro-units, generated ONCE here and
#: embedded as literals in BOTH engines (Spark array literal + SQL VALUES)
#: — the only transcendental in the metric becomes a shared constant, so
#: the whole ranking readout is exact integer arithmetic downstream.
import math as _math

_ARR_DISC = tuple(
    round(1_000_000 / _math.log2(1 + r)) for r in range(1, _ARR_K + 1)
)


def _ann_ranking_oracle() -> str:
    """Shares the serving pipeline's own CTE prefix (llm_ext8
    ``IVF_BATCH_CTES`` — the ivf_recall_report discipline) and replays
    rank-join → gain×discount sums in SQL off the literal grid."""
    from .llm_ext8 import IVF_BATCH_CTES

    disc_rows = ", ".join(f"({r + 1}, {d})" for r, d in enumerate(_ARR_DISC))
    return f"""
    WITH {IVF_BATCH_CTES},
    iv AS (
      SELECT query_id, vec_id, rn AS rs FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, vec_id) AS rn
        FROM cand) WHERE rn <= {_ARR_K}
    ),
    exs AS (
      SELECT q.query_id, e.vec_id,
             ROUND(LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> e.v[i] * q.qv[i]))
               / (SQRT(LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> e.v[i] * e.v[i]))) * q.qn),
             4) AS cos_sim
      FROM e CROSS JOIN qs q
    ),
    ex AS (
      SELECT query_id, vec_id, rn AS re FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, vec_id) AS rn
        FROM exs) WHERE rn <= {_ARR_K}
    ),
    disc AS (SELECT * FROM (VALUES {disc_rows}) AS t(r, d)),
    ideal AS (
      SELECT ex.query_id,
             CAST(SUM(({_ARR_K} - ex.re + 1) * disc.d) AS BIGINT) AS idcg
      FROM ex JOIN disc ON disc.r = ex.re GROUP BY ex.query_id
    ),
    hits AS (
      SELECT iv.query_id,
             CAST(MIN(iv.rs) AS INT) AS first_hit_rank,
             CAST(SUM(({_ARR_K} - ex.re + 1) * disc.d) AS BIGINT) AS dcg
      FROM iv JOIN ex ON ex.query_id = iv.query_id AND ex.vec_id = iv.vec_id
      JOIN disc ON disc.r = iv.rs
      GROUP BY iv.query_id
    )
    SELECT i.query_id, h.first_hit_rank,
           CAST(COALESCE(1000000 // h.first_hit_rank, 0) AS BIGINT) AS mrr_x1e6,
           CAST(COALESCE(h.dcg, 0) AS BIGINT) AS dcg_micro,
           CAST(COALESCE(h.dcg, 0) * 10000 // i.idcg AS BIGINT) AS ndcg_bp
    FROM ideal i LEFT JOIN hits h ON h.query_id = i.query_id
    ORDER BY i.query_id
    """


@register("ann_ranking_report", oracle=_ann_ranking_oracle())
def q_ann_ranking_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+ (r15) — RANKING quality of the IVF serving arm, completing
    `ivf_recall_report` (set overlap is blind to ORDER — an index that
    returns the right ten neighbors ranked backwards reads recall 1.0):
    per panel query, MRR (reciprocal rank of the first truly-relevant
    served item) and nDCG@{_ARR_K} with graded gains (exact rank re →
    gain {_ARR_K}−re+1) and the log2 discount as a LITERAL integer
    micro-unit grid generated once and embedded in both engines — the
    metric's only transcendental becomes a shared constant, everything
    downstream exact integer sums and floor divisions. Emits (query_id,
    first_hit_rank, mrr_x1e6, dcg_micro, ndcg_bp); first_hit_rank NULL
    and mrr 0 when no served item is in the exact top-{_ARR_K}.

    Plan at 100 TB: the served arm is the serving entry's own plan
    (broadcast probe table, one corpus pass); the exact arm is the
    instrument (broadcast panel × corpus map pass + top-k window, run
    over a sampled panel in production). The metric tail is |panel|·k
    rows of joins against a {_ARR_K}-row literal grid.
    """
    from pyspark.sql import Window

    from ..operators.similarity import (
        cosine,
        ensure_min_partitions,
        ivf_topk_batch,
    )

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    iv = ivf_topk_batch(emb, queries, k=_ARR_K, n_probe=3).select(
        "query_id", "vec_id", F.col("rank").alias("rs")
    )
    qpanel = F.broadcast(
        queries.select("query_id", F.col("embedding").alias("__qvec"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    ex = (
        ensure_min_partitions(emb)
        .crossJoin(qpanel)
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("__qvec")), 4).alias(
                "cos_sim"
            ),
        )
        .withColumn("re", F.row_number().over(wq))
        .filter(F.col("re") <= _ARR_K)
        .select("query_id", "vec_id", "re")
    )
    ex = tracked_persist(ex)  # feeds the ideal agg AND the hit join
    disc = F.array(*[F.lit(d) for d in _ARR_DISC])
    gain = F.lit(_ARR_K) - F.col("re") + 1
    ideal = ex.groupBy("query_id").agg(
        F.sum(gain * F.element_at(disc, F.col("re")))
        .cast("long")
        .alias("idcg")
    )
    hits = (
        iv.join(ex, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(
            F.min("rs").cast("int").alias("first_hit_rank"),
            F.sum(gain * F.element_at(disc, F.col("rs")))
            .cast("long")
            .alias("dcg"),
        )
    )
    return (
        ideal.join(hits, "query_id", "left")
        .select(
            "query_id",
            "first_hit_rank",
            F.coalesce(
                F.expr("CAST(1000000 DIV first_hit_rank AS BIGINT)"), F.lit(0)
            ).alias("mrr_x1e6"),
            F.coalesce("dcg", F.lit(0)).cast("long").alias("dcg_micro"),
            F.expr("CAST(COALESCE(dcg, 0) * 10000 DIV idcg AS BIGINT)").alias(
                "ndcg_bp"
            ),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# benford_amount_audit — first-digit distribution DQ screen

#: Benford expected proportions log10(1 + 1/d) in integer ppm, generated
#: once and embedded as literals in BOTH engines (the _ARR_DISC trick).
_BENFORD_EXP_PPM = tuple(
    round(1_000_000 * _math.log10(1 + 1 / d)) for d in range(1, 10)
)


def _benford_oracle() -> str:
    rows = ", ".join(f"({d + 1}, {p})" for d, p in enumerate(_BENFORD_EXP_PPM))
    return f"""
    WITH amounts AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
            FROM amounts GROUP BY digit),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS t FROM obs),
    exp AS (SELECT * FROM (VALUES {rows}) AS v(digit, exp_ppm))
    SELECT e.digit,
           CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
           CAST(COALESCE(o.n_obs, 0) * 1000000 // (SELECT t FROM tot)
                AS BIGINT) AS obs_ppm,
           CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
           CAST(COALESCE(o.n_obs, 0) * 1000000 // (SELECT t FROM tot)
                - e.exp_ppm AS BIGINT) AS dev_ppm
    FROM exp e LEFT JOIN obs o ON o.digit = e.digit
    ORDER BY e.digit
    """


@register("benford_amount_audit", oracle=_benford_oracle())
def q_benford_amount_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ+ (r15) — BENFORD first-significant-digit audit over order
    amounts (Benford 1938; Nigrini's fraud/DQ screen): the leading-digit
    distribution of naturally-occurring multi-magnitude amounts follows
    log10(1 + 1/d); synthetic, capped, or fabricated amounts deviate
    hard. Emits per digit 1-9: observed count, observed ppm, expected
    ppm (the law as a LITERAL integer grid generated once for both
    engines — the discount-grid trick), and the signed deviation. The
    audit MEASURES; thresholds belong to the consuming DQ policy (on
    this fixture's band-uniform TPC-H-ish prices the deviation reads
    large BY DESIGN — exactly what the screen exists to surface).

    Plan at 100 TB: first digit is a map-only string projection of the
    floored amount (integer formatting is engine-identical; values < 1
    excluded by contract), then ONE 9-row hash agg — map-side
    combinable, model-sized everything after.
    """
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("int")
    obs = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    tot = obs.agg(F.sum("n_obs").cast("long").alias("t"))
    grid = spark.createDataFrame(
        [(d + 1, p) for d, p in enumerate(_BENFORD_EXP_PPM)],
        "digit int, exp_ppm long",
    )
    return (
        grid.join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            F.expr(
                "CAST(COALESCE(n_obs, 0) * 1000000 DIV t AS BIGINT)"
            ).alias("obs_ppm"),
            F.col("exp_ppm").cast("long"),
            F.expr(
                "CAST(COALESCE(n_obs, 0) * 1000000 DIV t - exp_ppm AS BIGINT)"
            ).alias("dev_ppm"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# weighted_sample_es_topn — quality-weighted corpus subsampling

_ES_TOP = 100  # sample size
_ES_SEED = 7  # draw seed — the md5 replayable-randomness idiom


def _es_sample_oracle() -> str:
    """Rides the SHARED CCNet scoring chain (llm_ext5._CCNET_CTES — one
    scoring definition across its consumers) and replays the seeded
    ES key exactly: u from the portable md5 idiom, key = ln(u)·s rounded
    4dp with the doc_id tie-break (the Gumbel sampler's precedent)."""
    from .llm_ext5 import _CCNET_CTES, _duck_md5_32

    u32 = _duck_md5_32(
        f"'es-sample|' || CAST(doc_id AS VARCHAR) || '|{_ES_SEED}'"
    )
    return f"""
    WITH {_CCNET_CTES},
    keyed AS (
      SELECT doc_id, s AS unigram_nlp,
             ROUND(ln((({u32}) + 0.5) / 4294967296.0) * s, 4) AS es_key
      FROM dl
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id) AS INT)
             AS rank,
           doc_id, unigram_nlp, es_key
    FROM keyed
    ORDER BY es_key DESC, doc_id
    LIMIT {_ES_TOP}
    """


@register("weighted_sample_es_topn", oracle=_es_sample_oracle())
def q_weighted_sample_es_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ (r15) — WEIGHTED sampling without replacement (Efraimidis &
    Spirakis 2006, A-Res): keep the {_ES_TOP} documents with the largest
    u_i^(1/w_i) — equivalently rank on ln(u_i)/w_i — which draws a
    without-replacement sample with inclusion probability ∝ w_i in ONE
    distributed pass, no sequential draws. The quality-weighted
    subsampling move of a data-mixing stage: here w_i = 1/s_i, the
    inverse of the SHARED CCNet unigram-NLP surprise score (one scoring
    definition across five entries — low-perplexity docs are sampled
    more), so the ranking key is ln(u_i)·s_i. Completes the sampling
    family: uniform md5 order (leakage split), per-source quotas,
    deterministic DSIR top-N, seeded Gumbel-top-k (∝ importance), and
    now inclusion-∝-weight WITHOUT replacement.

    Portability: u_i derives from the portable md5 idiom on
    (doc_id, seed={_ES_SEED}), the key rounds to 4dp with the doc_id
    tie-break (measure-zero boundary argument, the Gumbel/impact_truncate
    idiom), so the draw is seeded, replayable, and engine-portable.

    Plan at 100 TB: the scoring frame is the shared one-corpus-pass
    CCNet chain; the key is one map-only hash + ln + multiply per doc;
    the global top-N runs as TakeOrdered on one-row-per-doc — no sort,
    no new shuffle.
    """
    from .llm_ext5 import _spark_md5_32, ccnet_bucketed

    docw = ccnet_bucketed(spark, sf_dir).select("doc_id", "unigram_nlp")
    u = (
        _spark_md5_32(
            F.concat_ws(
                "|", F.lit("es-sample"), F.col("doc_id"), F.lit(_ES_SEED)
            )
        )
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    keyed = docw.select(
        "doc_id",
        "unigram_nlp",
        F.round(F.log(u) * F.col("unigram_nlp"), 4).alias("es_key"),
    )
    from pyspark.sql import Window

    rk = Window.orderBy(F.col("es_key").desc(), F.col("doc_id"))
    return (
        keyed.withColumn("rank", F.row_number().over(rk).cast("int"))
        .filter(F.col("rank") <= _ES_TOP)
        .select("rank", "doc_id", "unigram_nlp", "es_key")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# fk_orphan_audit — cross-table referential-integrity audit matrix

#: every FK edge of the star schema: (child, fk_col, parent, pk_col)
_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def _fk_audit_oracle() -> str:
    arms = "\n      UNION ALL ".join(
        f"""SELECT '{c}' AS child_table, '{ck}' AS fk_col,
             '{p}' AS parent_table,
             CAST(COUNT(*) AS BIGINT) AS n_child_rows,
             CAST(COUNT(*) FILTER (WHERE {ck} IS NOT NULL
               AND {ck} NOT IN (SELECT {pk} FROM {p})) AS BIGINT) AS n_orphans
      FROM {c}"""
        for c, ck, p, pk in _FK_EDGES
    )
    return f"""
    SELECT child_table, fk_col, parent_table, n_child_rows, n_orphans,
           CAST(n_orphans * 1000000 // n_child_rows AS BIGINT) AS orphan_ppm
    FROM ({arms})
    ORDER BY child_table, fk_col
    """


@register("fk_orphan_audit", oracle=_fk_audit_oracle())
def q_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ+ (r15) — the cross-TABLE referential-integrity audit the
    per-table DQSuite classes (null/unique/regex/type/range) cannot
    express: for EVERY foreign-key edge of the star schema, the child
    row count, orphan count (non-null FK with no parent), and orphan
    rate in ppm — one row per edge, the constraint-audit matrix a
    warehouse load publishes next to its DQ gate. On this fixture every
    edge reads 0 BY CONSTRUCTION (the generator is referentially
    intact); the detection arm is pinned on a constructed corpus in
    tests (the dup-id fixture discipline).

    Plan at 100 TB: each edge is ONE left-anti-shaped aggregate — the
    orphan count folds into a conditional count over an existence join;
    dims (nation/region) broadcast by size, the big edges
    (lineitem→orders/part/supplier) are plain equi-shuffles AQE handles;
    the union tail is |edges| rows.
    """
    from ..operators.dq import fk_orphan_counts

    frames = [
        fk_orphan_counts(
            load(spark, sf_dir, c), ck, load(spark, sf_dir, p), pk, c, p
        )
        for c, ck, p, pk in _FK_EDGES
    ]
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out.orderBy("child_table", "fk_col")


# ---------------------------------------------------------------------------
# containment_dedup_drops — the drop decision over the containment pairs


def _containment_drops_oracle() -> str:
    """Rollup over the SAME exact pair table as the pairs entry (shared
    inverted-index CTE text) — best container by (containment DESC,
    container_id), plus the container count as evidence strength."""
    from .llm_ext import _DUCK_SHINGLES

    return f"""
    WITH {_DUCK_SHINGLES},
    sizes AS (SELECT doc_id, LEN(s) AS n FROM sh),
    ex AS (SELECT doc_id, UNNEST(s) AS shingle FROM sh),
    inter AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb, CAST(COUNT(*) AS BIGINT) AS c
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ),
    p AS (
      SELECT ida, idb, c, CAST(c * 10000 // sa.n AS BIGINT) AS cbp
      FROM inter JOIN sizes sa ON sa.doc_id = ida
      WHERE c * {_CONT_DEN} >= sa.n * {_CONT_NUM}
    )
    SELECT ida AS doc_id,
           CAST(MIN(idb) FILTER (WHERE (cbp, -idb) = mx) AS BIGINT)
             AS best_container,
           CAST(MAX(cbp) AS BIGINT) AS containment_bp,
           CAST(COUNT(*) AS BIGINT) AS n_containers
    FROM (SELECT ida, idb, cbp,
                 MAX((cbp, -idb)) OVER (PARTITION BY ida) AS mx
          FROM p)
    GROUP BY ida
    ORDER BY doc_id
    """


@register("containment_dedup_drops", oracle=_containment_drops_oracle())
def q_containment_dedup_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 (r15) — the DROP DECISION over the containment evidence: every
    document that is >= {_CONT_NUM}/{_CONT_DEN}-contained in at least one
    OTHER document contributes (almost) nothing beyond its container, so
    a curation run drops it and keeps the host — the quote/boilerplate
    consumer of ``containment_overlap_pairs`` (same funnel, same shared
    pair semantics; the oracle rides the identical pair CTE text). Emits
    per dropped doc: (doc_id, best_container, containment_bp,
    n_containers) — best container by (containment DESC, lowest id), the
    container count as evidence strength. The keep set is the complement;
    the funnel's exact-dedup stage already collapsed IDENTICAL texts, so
    these drops are the strictly-subset/quoted remainder.

    Plan at 100 TB: the pairs funnel's plan (prefix candidates + verify)
    plus one per-doc hash agg — nothing new shuffles; the max-by rollup
    rides the candidate-sized frame.
    """
    from ..operators.dedup import containment_pairs

    pairs = containment_pairs(
        load(spark, sf_dir, "documents"), num=_CONT_NUM, den=_CONT_DEN
    )
    return (
        pairs.groupBy("doc_id")
        .agg(
            F.min_by(
                F.col("container_id"),
                F.struct(
                    (-F.col("containment_bp")).alias("nc"),
                    F.col("container_id").alias("i"),
                ),
            )
            .cast("long")
            .alias("best_container"),
            F.max("containment_bp").cast("long").alias("containment_bp"),
            F.count(F.lit(1)).cast("long").alias("n_containers"),
        )
        .orderBy("doc_id")
    )
