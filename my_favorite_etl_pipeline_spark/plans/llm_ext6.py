"""[EXT] curation round 6 — corpus analytics and embedding preprocessing
(SURVEY.md §2.9 X3/X4; no reference citation exists — the citation is
BASELINE.json's LLM-data mandate).

Four operators rounding out the training-data surface:

- ``keyword_extract_tfidf_top3`` — per-document top-k salient terms by
  tf·idf, on the SAME shared posting pipeline as the tfidf/BM25 scorers
  (operators/retrieval.py): one more consumer of ``term_postings``, zero
  new tokenization passes.
- ``distinct_ngram_diversity``   — per-language distinct-n ratios
  (distinct-2 / distinct-3, Li et al. 2016): the corpus-health diversity
  metric low values of which flag template/boilerplate collapse.
- ``tokenizer_fertility_by_lang`` — chars-per-token fertility per
  language for both tokenizers (whitespace and the BPE-ish regex) — the
  standard "how expensive is this language under this tokenizer" audit.
- ``embedding_pca_project``      — distributed PCA (operators/projection):
  ONE integer-quantized moment pass → driver-side d×d eigh → map-only
  broadcast projection. Rows-only (no SQL eigendecomposition exists);
  invariants pinned in tests/test_projection.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..registry import register
from ..sources.tables import load

# ---------------------------------------------------------------------------
# keyword_extract_tfidf_top3


@register(
    "keyword_extract_tfidf_top3",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                  FROM documents),
    tf AS (SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS c
           FROM toks GROUP BY doc_id, w),
    dl AS (SELECT doc_id, SUM(c) AS len FROM tf GROUP BY doc_id),
    df AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS dfc FROM tf GROUP BY w),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
    wts AS (
      SELECT tf.doc_id, tf.w, (c / len) * ln(nd / dfc) AS wt
      FROM tf JOIN dl USING (doc_id) JOIN df USING (w) CROSS JOIN n
      WHERE dfc < nd
    ),
    rk AS (
      SELECT doc_id, w, wt,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY ROUND(wt, 4) DESC, w
             ) AS rn
      FROM wts
    )
    SELECT doc_id, w AS term, CAST(rn AS INT) AS rank,
           ROUND(wt, 4) AS tfidf_w
    FROM rk WHERE rn <= 3
    """,
)
def keyword_extract_tfidf_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — per-document keyword extraction: the top-3 terms by tf·idf
    (metadata enrichment / topic tagging, the per-doc dual of the per-query
    retrieval scorers).

    Plan at 100 TB: the posting pipeline is SHARED with tfidf/BM25
    (``term_postings``: tokenize → persisted tf → dl/df hash aggs), so a
    pipeline computing keywords alongside retrieval scores tokenizes ONCE.
    The only op this query adds is a per-DOC top-k window — partitioned by
    doc_id, which is near-uniform (docs have bounded vocabulary), so no
    skew pre-pass is needed, unlike the per-TERM window in impact_truncate
    where Zipf makes hot partitions. Ranking is on ROUND(wt,4) with a term
    tie-break so both engines cut the identical set.
    """
    from ..operators.retrieval import term_postings

    docs = load(spark, sf_dir, "documents")
    tf, dl, df_ = term_postings(docs)
    nd = docs.agg(F.count(F.lit(1)).cast("double").alias("nd"))
    wts = (
        tf.join(dl, "doc_id")
        .join(df_, "w")
        .crossJoin(F.broadcast(nd))
        .filter(F.col("dfc") < F.col("nd"))
        .select(
            "doc_id", "w", ((F.col("c") / F.col("len")) * F.log(F.col("nd") / F.col("dfc"))).alias("wt")
        )
    )
    wdoc = Window.partitionBy("doc_id").orderBy(F.round("wt", 4).desc(), "w")
    return (
        wts.withColumn("rn", F.row_number().over(wdoc))
        .filter(F.col("rn") <= 3)
        .select(
            "doc_id",
            F.col("w").alias("term"),
            F.col("rn").cast("int").alias("rank"),
            F.round("wt", 4).alias("tfidf_w"),
        )
    )


# ---------------------------------------------------------------------------
# distinct_ngram_diversity


@register(
    "distinct_ngram_diversity",
    oracle="""
    WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t
                  FROM documents),
    grams AS (
      SELECT lang,
             unnest(list_transform(range(len(t) - 1),
                                   i -> t[i+1] || ' ' || t[i+2])) AS g2,
             NULL AS g3
      FROM toks WHERE len(t) >= 2
      UNION ALL
      SELECT lang, NULL,
             unnest(list_transform(range(len(t) - 2),
                                   i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
      FROM toks WHERE len(t) >= 3
    )
    SELECT lang,
           CAST(COUNT(g2) AS BIGINT) AS total_bigrams,
           CAST(COUNT(DISTINCT g2) AS BIGINT) AS distinct_bigrams,
           (CAST(COUNT(DISTINCT g2) AS BIGINT) * 10000
              // CAST(COUNT(g2) AS BIGINT)) / 10000.0 AS distinct2_ratio,
           CAST(COUNT(g3) AS BIGINT) AS total_trigrams,
           CAST(COUNT(DISTINCT g3) AS BIGINT) AS distinct_trigrams,
           (CAST(COUNT(DISTINCT g3) AS BIGINT) * 10000
              // CAST(COUNT(g3) AS BIGINT)) / 10000.0 AS distinct3_ratio
    FROM grams GROUP BY lang
    """,
)
def distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — corpus diversity audit: per-language distinct-2 / distinct-3
    ratios (share of n-gram occurrences that are unique; Li et al. 2016's
    distinct-n). A collapsing/templated corpus shows the drop here before
    any per-doc filter fires.

    Plan at 100 TB: gram construction is an in-row array transform (no
    explode until the agg input), then ONE hash aggregate per n keyed on
    lang with map-side partial distinct. count_distinct on a Zipf gram
    space is the expensive half; the mergeable-sketch twin
    (approx_count_distinct / hll_sketch_merge family) is the rollup-scale
    variant when exactness isn't required. Ratios are fixed-point
    (int·10⁴ DIV) — engine-portable, no float division at halves.
    """
    docs = load(spark, sf_dir, "documents")
    g2 = docs.select("lang", F.explode(TX.ngrams("text", 2)).alias("g"))
    g3 = docs.select("lang", F.explode(TX.ngrams("text", 3)).alias("g"))
    a2 = g2.groupBy("lang").agg(
        F.count("g").alias("total_bigrams"),
        F.count_distinct("g").alias("distinct_bigrams"),
    )
    a3 = g3.groupBy("lang").agg(
        F.count("g").alias("total_trigrams"),
        F.count_distinct("g").alias("distinct_trigrams"),
    )
    # FULL outer join, not inner: a lang whose docs all have <3 tokens has
    # bigrams but no trigram rows; the oracle's single GROUP BY still emits
    # it (trigram counts 0, ratio NULL — DuckDB `// 0` and Spark `DIV 0`
    # both yield NULL). Coalesce counts to 0 so the sides agree.
    joined = a2.join(a3, "lang", "full_outer").select(
        "lang",
        F.coalesce("total_bigrams", F.lit(0)).alias("total_bigrams"),
        F.coalesce("distinct_bigrams", F.lit(0)).alias("distinct_bigrams"),
        F.coalesce("total_trigrams", F.lit(0)).alias("total_trigrams"),
        F.coalesce("distinct_trigrams", F.lit(0)).alias("distinct_trigrams"),
    )
    return joined.select(
        "lang",
        "total_bigrams",
        "distinct_bigrams",
        (F.expr("distinct_bigrams * 10000 DIV total_bigrams") / F.lit(10000.0)).alias(
            "distinct2_ratio"
        ),
        "total_trigrams",
        "distinct_trigrams",
        (F.expr("distinct_trigrams * 10000 DIV total_trigrams") / F.lit(10000.0)).alias(
            "distinct3_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# tokenizer_fertility_by_lang


@register(
    "tokenizer_fertility_by_lang",
    oracle=r"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
           CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           CAST(SUM(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
             AS bpe_tokens,
           (CAST(SUM(LENGTH(text)) AS BIGINT) * 10000
              // CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT)) / 10000.0
             AS ws_fertility,
           (CAST(SUM(LENGTH(text)) AS BIGINT) * 10000
              // CAST(SUM(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)) / 10000.0
             AS bpe_fertility
    FROM documents GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — tokenizer-fertility audit: chars-per-token by language for the
    whitespace and BPE-ish tokenizers (the multilingual-budget table every
    tokenizer change re-publishes: high-fertility languages pay more
    sequence length per character).

    Plan at 100 TB: pure map + ONE lang-keyed hash aggregate of integer
    sums; tokenization counts stay in-row (size over split /
    regexp_extract_all, whole-stage codegen — same JVM-side discipline as
    bpe_ish_token_counts). Fertility ratios are fixed-point int·10⁴ DIV.
    """
    docs = load(spark, sf_dir, "documents")
    agg = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.sum(TX.token_count("text")).alias("ws_tokens"),
        F.sum(F.size(TX.bpe_ish_tokens("text"))).alias("bpe_tokens"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "total_chars",
        "ws_tokens",
        "bpe_tokens",
        (F.expr("total_chars * 10000 DIV ws_tokens") / F.lit(10000.0)).alias("ws_fertility"),
        (F.expr("total_chars * 10000 DIV bpe_tokens") / F.lit(10000.0)).alias("bpe_fertility"),
    )


# ---------------------------------------------------------------------------
# embedding_pca_project


@register("embedding_pca_project")  # rows-only: no SQL eigendecomposition
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — distributed PCA projection of the embedding column onto its top
    4 principal components (the preprocessing rung SemDeDup/D4-style
    pipelines run before clustering; Abbas et al. 2023 §3).

    Rows-only for a fundamental reason: the oracle would need an
    eigendecomposition, which ANSI SQL / DuckDB cannot express. The value
    contract is pinned instead by tests/test_projection.py: components
    orthonormal, eigenvalues descending, per-component projection variance
    ≈ eigenvalue, and the integer-moment accumulation makes the whole
    chain bit-deterministic under re-partitioning (the 32-vs-7 harness
    covers it like every other rows-only query).

    Plan at 100 TB (operators/projection.py): ONE moment pass (Arrow-batch
    partials, element-wise int64 merge, O(d²) driver collect), driver-side
    64×64 eigh, then a MAP-ONLY broadcast-literal dot-product projection in
    whole-stage codegen — train-once/apply-many, no shuffle in the apply
    path.
    """
    from ..operators.projection import pca_components, project

    embs = load(spark, sf_dir, "embeddings")
    comps, _ = pca_components(embs, dim=64, n_components=4)
    return (
        project(embs, comps)
        .select("vec_id", "pc1", "pc2", "pc3", "pc4")
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# mmr_diverse_topk — oracle is the 10-step greedy UNROLLED into plain CTEs
# (recursion-free ANSI SQL: each step is one argmax over the remaining
# candidates given the union of the previous selections; all scores are
# integer ten-thousandths so the argmax is an integer comparison).

_MMR_K = 10


def _mmr_oracle(k: int = _MMR_K, shortlist: int = 50) -> str:
    cos = (
        "LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> {a}[i] * {b}[i]))"
        " / ({na} * {nb})"
    )
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each step
    # references the previous selection twice (NOT IN + the MAX subquery),
    # so inlining would expand the chain EXPONENTIALLY (observed as fd
    # exhaustion re-opening the parquet thousands of times)
    steps = [
        "s1 AS MATERIALIZED (SELECT vec_id, rel AS mmr_i FROM cand ORDER BY rel DESC, vec_id LIMIT 1)",
        "sel1 AS MATERIALIZED (SELECT vec_id FROM s1)",
    ]
    for i in range(2, k + 1):
        steps.append(
            f"""s{i} AS MATERIALIZED (
      SELECT c.vec_id,
             c.rel - (SELECT MAX(p.sim) FROM pairs p
                      JOIN sel{i - 1} s ON p.pb = s.vec_id
                      WHERE p.pa = c.vec_id) AS mmr_i
      FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
      ORDER BY mmr_i DESC, c.vec_id LIMIT 1
    )"""
        )
        steps.append(
            f"sel{i} AS MATERIALIZED (SELECT vec_id FROM sel{i - 1} UNION ALL SELECT vec_id FROM s{i})"
        )
    union = "\n      UNION ALL ".join(
        f"SELECT {i} AS rank, vec_id, mmr_i FROM s{i}" for i in range(1, k + 1)
    )
    _steps_sql = ",\n    ".join(steps)
    return f"""
    WITH e AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT v AS qv, SQRT(LIST_SUM(LIST_TRANSFORM(v, x -> x * x))) AS qn
          FROM e WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, e.v,
             SQRT(LIST_SUM(LIST_TRANSFORM(e.v, x -> x * x))) AS nrm,
             CAST(ROUND(({cos.format(a='e.v', b='q.qv', na='SQRT(LIST_SUM(LIST_TRANSFORM(e.v, x -> x * x)))', nb='q.qn')}) * 10000) AS BIGINT) AS rel
      FROM e CROSS JOIN q
      WHERE e.vec_id <> 0
    ),
    cand AS MATERIALIZED (SELECT vec_id, v, nrm, rel FROM scored
             ORDER BY rel DESC, vec_id LIMIT {shortlist}),
    pairs AS MATERIALIZED (
      SELECT a.vec_id AS pa, b.vec_id AS pb,
             CAST(ROUND(({cos.format(a='a.v', b='b.v', na='a.nrm', nb='b.nrm')}) * 10000) AS BIGINT) AS sim
      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ),
    {_steps_sql}
    SELECT CAST(rank AS INT) AS rank, CAST(vec_id AS BIGINT) AS vec_id,
           mmr_i / 10000.0 AS mmr
    FROM ({union})
    ORDER BY rank
    """


@register("mmr_diverse_topk", oracle=_mmr_oracle())
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — MMR diversity-aware re-ranking (Carbonell & Goldstein 1998):
    top-10 for query vec_id=0 selected greedily by λ=0.5 relevance-vs-
    redundancy trade-off over a 50-deep cosine shortlist — the final stage
    of a retrieval pipeline that must not return 10 near-duplicates (see
    operators.similarity.mmr_rerank for the shortlist/re-rank scale
    contract and the integer-score determinism argument; the oracle
    replays the greedy EXACTLY as ten unrolled argmax CTEs).
    """
    from ..operators import similarity as SIM

    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    # the query vector is itself a corpus row: exclude it from the
    # candidates, else pick 1 is the query and every later MMR score
    # degenerates to rel − sim(c, query) = 0
    return SIM.mmr_rerank(
        emb.filter(F.col("vec_id") != 0), query, k=_MMR_K, shortlist=50
    )


# ---------------------------------------------------------------------------
# rrf_hybrid_fusion_topk


@register(
    "rrf_hybrid_fusion_topk",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                  FROM documents),
    tf AS MATERIALIZED (SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS c
          FROM toks GROUP BY 1, 2),
    dl AS MATERIALIZED (SELECT doc_id, SUM(c) AS len FROM tf GROUP BY 1),
    st AS (SELECT AVG(len) AS avgdl, CAST(COUNT(*) AS DOUBLE) AS n FROM dl),
    dfc AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS DOUBLE) AS dfc
           FROM tf GROUP BY 1),
    -- tfidf-cosine arm (identical math to tfidf_topk_similar_docs)
    wts AS (
      SELECT tf.doc_id, tf.w, (c / len) * ln(st.n / dfc.dfc) AS wt
      FROM tf JOIN dl USING (doc_id) JOIN dfc USING (w) CROSS JOIN st
      WHERE dfc.dfc < st.n
    ),
    nrm AS (SELECT doc_id, sqrt(SUM(wt * wt)) AS nv FROM wts GROUP BY doc_id),
    unit AS MATERIALIZED (
      SELECT w.doc_id, w.w, wt / nv AS u
      FROM wts w JOIN nrm USING (doc_id) WHERE nv > 0
    ),
    cand_t AS (
      SELECT doc_id, w, u FROM (
        SELECT doc_id, w, u,
               ROW_NUMBER() OVER (
                 PARTITION BY w ORDER BY ROUND(u, 4) DESC, doc_id) AS pn
        FROM unit) WHERE pn <= 256
    ),
    sims AS (
      SELECT a.doc_id AS query_id, b.doc_id AS doc_id,
             ROUND(SUM(a.u * b.u), 4) AS sim
      FROM unit a JOIN cand_t b ON a.w = b.w AND a.doc_id <> b.doc_id
      WHERE a.doc_id % 100 = 0
      GROUP BY 1, 2
    ),
    rank_t AS MATERIALIZED (
      SELECT query_id, doc_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, doc_id) AS rt
      FROM sims QUALIFY rt <= 20
    ),
    -- BM25 arm (identical math to bm25_topk_docs)
    post AS (
      SELECT tf.doc_id, tf.w,
             LN(1 + (st.n - dfc.dfc + 0.5) / (dfc.dfc + 0.5))
               * tf.c * 2.2
               / (tf.c + 1.2 * (0.25 + 0.75 * dl.len / st.avgdl)) AS wt
      FROM tf JOIN dl USING (doc_id) JOIN dfc USING (w) CROSS JOIN st
    ),
    cand_b AS (
      SELECT doc_id, w, wt FROM (
        SELECT doc_id, w, wt,
               ROW_NUMBER() OVER (
                 PARTITION BY w ORDER BY ROUND(wt, 4) DESC, doc_id) AS pn
        FROM post) WHERE pn <= 256
    ),
    q AS (SELECT DISTINCT doc_id AS query_id, w FROM toks
          WHERE doc_id % 100 = 0),
    sc AS (
      SELECT q.query_id, p.doc_id, ROUND(SUM(p.wt), 4) AS score
      FROM q JOIN cand_b p ON q.w = p.w AND p.doc_id <> q.query_id
      GROUP BY 1, 2
    ),
    rank_b AS MATERIALIZED (
      SELECT query_id, doc_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rb
      FROM sc QUALIFY rb <= 20
    ),
    fused AS (
      SELECT COALESCE(t.query_id, b.query_id) AS query_id,
             COALESCE(t.doc_id, b.doc_id) AS doc_id,
             COALESCE(CAST(ROUND(1000000.0 / (60 + t.rt)) AS BIGINT), 0)
               + COALESCE(CAST(ROUND(1000000.0 / (60 + b.rb)) AS BIGINT), 0)
               AS rrf_i
      FROM rank_t t FULL OUTER JOIN rank_b b
        ON t.query_id = b.query_id AND t.doc_id = b.doc_id
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(rn AS INT) AS rank,
           rrf_i / 1000000.0 AS rrf
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY rrf_i DESC, doc_id) AS rn
          FROM fused)
    WHERE rn <= 5 ORDER BY query_id, rank
    """,
)
def rrf_hybrid_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 (sparse, r8) — hybrid retrieval via Reciprocal Rank Fusion
    (Cormack et al. 2009): fuse the tf·idf-cosine and Okapi-BM25 rankings
    for the same query set (``doc_id % 100 = 0``, top-20 each arm) by
    ``Σ 1/(60 + rank)`` and keep the top-5 fused results — the standard
    way production search combines heterogeneous scorers without score
    calibration (ranks are scale-free; Elasticsearch/OpenSearch ship
    exactly this).

    Plan at 100 TB: BOTH arms ride the shared posting pipeline
    (``term_postings``: ONE tokenize, the persisted tf feeding six
    consumers here) with impact-truncated candidates and the df-probe
    salted top-k for hot terms (operators/retrieval.py) — so the fusion
    costs two per-term windows + two bounded rank joins more than either
    arm alone, never a second corpus scan. The fusion itself joins two
    (|queries| × 20)-row rank tables — query-keyed equi-join, trivially
    bounded. RRF contributions are integer micro-units
    (``ROUND(10⁶/(60+r)) AS BIGINT``; r ≤ 20 ⇒ no value lands on a
    rounding half), so the fused ordering is an integer comparison with a
    doc-id tie-break both engines replay identically.
    """
    from ..caching import tracked_persist
    from ..operators.retrieval import impact_truncate, term_postings

    K1, B = 1.2, 0.75
    docs = load(spark, sf_dir, "documents")
    tf, dl, dfc = term_postings(docs)
    st = dl.agg(
        F.avg("len").alias("avgdl"), F.count(F.lit(1)).cast("double").alias("n")
    )
    df_max = dfc.agg(F.max("dfc")).collect()[0][0] or 0.0

    # tfidf-cosine arm (math of tfidf_topk_similar_docs, % 100 query set)
    wts = (
        tf.join(dl, "doc_id")
        .join(dfc, "w")
        .crossJoin(F.broadcast(st))
        .filter(F.col("dfc") < F.col("n"))
        .select(
            "doc_id",
            "w",
            ((F.col("c") / F.col("len")) * F.log(F.col("n") / F.col("dfc"))).alias("wt"),
        )
    )
    nrm = wts.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nv"))
    # unit feeds TWO consumers (query side + truncated candidate side) —
    # persist it exactly as tfidf_topk_similar_docs does for the same frame
    # (r15-opt: without it the wts/nrm join chain re-ran per consumer; the
    # before-plan was 146 Exchanges / 1,739 lines)
    unit = tracked_persist(
        wts.join(nrm, "doc_id")
        .filter(F.col("nv") > 0)
        .select("doc_id", "w", (F.col("wt") / F.col("nv")).alias("u"))
    )
    cand_t = impact_truncate(unit, "u", df_max=df_max)
    a = unit.filter(F.col("doc_id") % 100 == 0).alias("a")
    sims = (
        a.join(
            cand_t.alias("b"),
            (F.col("a.w") == F.col("b.w")) & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("query_id"), F.col("b.doc_id").alias("doc_id"))
        .agg(F.round(F.sum(F.col("a.u") * F.col("b.u")), 4).alias("sim"))
    )
    wt_rank = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("doc_id"))
    rank_t = (
        sims.withColumn("rt", F.row_number().over(wt_rank))
        .filter(F.col("rt") <= 20)
        .select("query_id", "doc_id", "rt")
    )

    # BM25 arm (math of bm25_topk_docs)
    bwt = (
        F.log(F.lit(1.0) + (F.col("n") - F.col("dfc") + 0.5) / (F.col("dfc") + 0.5))
        * F.col("c")
        * (K1 + 1)
        / (F.col("c") + K1 * ((1 - B) + B * F.col("len") / F.col("avgdl")))
    )
    post = (
        tf.join(dl, "doc_id")
        .join(dfc, "w")
        .crossJoin(F.broadcast(st))
        .select("doc_id", "w", bwt.alias("wt"))
    )
    cand_b = impact_truncate(post, "wt", df_max=df_max)
    q = tf.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), F.col("w").alias("qw")
    )
    sc = (
        q.join(cand_b, (F.col("qw") == cand_b.w) & (F.col("query_id") != cand_b.doc_id))
        .groupBy("query_id", F.col("doc_id"))
        .agg(F.round(F.sum("wt"), 4).alias("score"))
    )
    wb_rank = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    rank_b = (
        sc.withColumn("rb", F.row_number().over(wb_rank))
        .filter(F.col("rb") <= 20)
        .select("query_id", "doc_id", "rb")
    )

    # fusion: integer micro-unit RRF, full-outer on (query, doc)
    rrf_part = lambda r: F.coalesce(  # noqa: E731
        F.round(F.lit(1000000.0) / (60 + r)).cast("long"), F.lit(0)
    )
    fused = (
        rank_t.join(rank_b, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            (rrf_part(F.col("rt")) + rrf_part(F.col("rb"))).alias("rrf_i"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("rrf_i").desc(), F.col("doc_id"))
    from ..caching import presentation_sort

    return presentation_sort(
        fused.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= 5)
        .select(
            "query_id",
            "doc_id",
            F.col("rn").cast("int").alias("rank"),
            (F.col("rrf_i") / F.lit(1000000.0)).alias("rrf"),
        ),
        "query_id",
        "rank",
    )
