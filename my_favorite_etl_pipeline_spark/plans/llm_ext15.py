"""[EXT] curation round 15 — containment dedup and contrastive pair
mining (SURVEY.md §2.9 X2/X3+).

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
