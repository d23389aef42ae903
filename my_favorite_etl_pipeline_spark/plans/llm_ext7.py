"""[EXT] curation round 7 — scale-path decontamination and importance
resampling (SURVEY.md §2.9 X4; no reference citation exists — the citation
is BASELINE.json's LLM-data mandate).

- ``decontaminate_bloom_13gram`` — the 100 TB shape of benchmark
  decontamination: a DataFrame-native Bloom filter over the benchmark's
  13-gram set (a ~16 K-row (word, bits) bit table built with ONE bit_or
  aggregate) broadcast against the training side as a probe join, then an
  EXACT gram semi-join verify on the tiny survivor set. False negatives
  are impossible by construction (every true hit sets all its probe bits),
  so the final answer is exact and shares ``contamination_13gram``'s
  oracle — the bloom stage only prunes what the verify join must touch.
  This is the production fallback for when the eval suite's gram set is
  too large to broadcast whole but its Bloom table (KBs) is not.
- ``dsir_importance_resample`` — Data Selection via Importance Resampling
  (Xie et al. 2023): fit two bag-of-hashed-ngrams multinomials (target =
  the benchmark-designated high-quality slice, raw = the rest), score
  every raw document with its log importance ratio
  Σ_f c_f·(ln p_target(f) − ln p_raw(f)) under Laplace smoothing, and
  keep the top-N. The bucket-weight table is O(B) rows and broadcasts;
  scoring is one equi-join + one hash aggregate — the paper's recipe with
  every step an operation that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..registry import register
from ..sources.tables import load
from .llm_ext3 import _BENCH_PRED_SQL, _DUCK_NGRAMS, _bench_pred
from .llm_ext5 import _duck_md5_32, _spark_md5_32

# ---------------------------------------------------------------------------
# decontaminate_bloom_13gram

_BLOOM_BITS = 1 << 20  # m: 2^20 bits = 16384 64-bit words ≈ 128 KiB
_BLOOM_K = 5  # probes per gram


def _bloom_probes(g: F.Column) -> list[F.Column]:
    """K bit positions in [0, m) per gram — seeded xxhash64 (NON-portable
    on purpose: the bloom never influences the final answer, so the fastest
    JVM hash wins; portability lives in the exact verify stage)."""
    return [
        F.pmod(F.xxhash64(F.lit(i), g), F.lit(_BLOOM_BITS)) for i in range(_BLOOM_K)
    ]


def bench_gram_bloom(bench_grams: DataFrame, gram_col: str = "g") -> DataFrame:
    """Build the (word, bits) Bloom bit table over ``bench_grams`` with ONE
    bit_or hash aggregate — at most m/64 rows regardless of input size."""
    pos = bench_grams.select(
        F.explode(F.array(*_bloom_probes(F.col(gram_col)))).alias("p")
    )
    return (
        pos.select(
            F.shiftright(F.col("p"), 6).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )


def bloom_probe_candidates(
    grams: DataFrame, bloom: DataFrame, gram_col: str = "g"
) -> DataFrame:
    """Rows of ``grams`` whose gram passes ALL K probes against ``bloom``
    (word-indexed broadcast join; an absent word row fails the probe via
    the inner join). Superset of the true member rows — never a subset."""
    probes = F.array(
        *[
            F.struct(
                F.shiftright(p, 6).alias("word"),
                (p % 64).cast("int").alias("bit"),
            )
            for p in _bloom_probes(F.col(gram_col))
        ]
    )
    keys = [c for c in grams.columns]
    exploded = grams.select(*keys, F.explode(probes).alias("pr")).select(
        *keys,
        F.col("pr.word").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), pr.bit)").alias("m"),
    )
    return (
        exploded.join(F.broadcast(bloom), "word")
        .filter(F.col("bits").bitwiseAND(F.col("m")) == F.col("m"))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__npass"))
        .filter(F.col("__npass") == _BLOOM_K)
        .drop("__npass")
    )


@register(
    "decontaminate_bloom_13gram",
    # Same oracle as contamination_13gram — deliberately: the bloom is a
    # lossless prefilter (no false negatives; false positives die in the
    # exact verify join), so the two independent algorithms must produce
    # the identical flag list, and the shared oracle IS that guarantee
    # under test (the ssjoin_prefix_filter / minhash precedent).
    oracle=f"""
    WITH {_DUCK_NGRAMS.format(n=13)},
    sh AS (SELECT doc_id, list_distinct(g) AS s FROM grams),
    u AS (SELECT doc_id, unnest(s) AS g FROM sh),
    b AS (SELECT doc_id AS bench_id, g FROM u WHERE {_BENCH_PRED_SQL}),
    t AS (SELECT doc_id, g FROM u WHERE NOT ({_BENCH_PRED_SQL}))
    SELECT t.doc_id,
           CAST(COUNT(DISTINCT t.g) AS BIGINT) AS n_grams_hit,
           CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
    FROM t JOIN b ON t.g = b.g
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
)
def q_decontaminate_bloom_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ (r8) — benchmark decontamination through a Bloom prefilter:
    build the bit table over the benchmark's distinct 13-grams, probe every
    training gram against the broadcast table (5 seeded-xxhash64 bits,
    all-must-pass), then exact-verify only the survivors with the plain
    gram equi-join. Output contract identical to ``contamination_13gram``.

    Plan at 100 TB: ``contamination_13gram`` relies on AQE broadcasting
    the exploded benchmark gram set — fine for MMLU-sized suites, dead
    once the held-out side reaches tens of GB. The bloom table is m/64
    rows (16 K here, ~128 KiB) NO MATTER how many grams feed it, so the
    broadcast never grows; the training side is filtered down to the
    true-hit rate + the tuned false-positive rate before anything heavier
    runs, and the exact verify join's left side is survivor-sized. Both
    aggregates (bit_or build, all-probes-pass count) are map-side-combined
    hash aggs on bounded keyspaces.
    """
    docs = load(spark, sf_dir, "documents")
    sh = docs.select("doc_id", TX.shingles(F.col("text"), n=13).alias("sh"))
    g = sh.select("doc_id", F.explode("sh").alias("g"))
    bench = g.filter(_bench_pred()).select(F.col("doc_id").alias("bench_id"), "g")
    train = g.filter(~_bench_pred())
    bloom = bench_gram_bloom(bench.select("g").distinct())
    cand = bloom_probe_candidates(train, bloom)
    return (
        cand.join(bench, "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").alias("n_grams_hit"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# dsir_importance_resample

_DSIR_B = 4096  # hashed-feature buckets
_DSIR_TOP = 100  # resample size


@register(
    "dsir_importance_resample",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    f AS (
      SELECT doc_id,
             list_concat(t, CASE WHEN len(t) >= 2
               THEN list_transform(range(len(t) - 1), i -> t[i+1] || '_' || t[i+2])
               ELSE [] END) AS fs
      FROM toks
    ),
    fb AS (
      SELECT doc_id, ({_BENCH_PRED_SQL}) AS is_t,
             ({_duck_md5_32('x')}) % {_DSIR_B} AS b
      FROM (SELECT doc_id, UNNEST(fs) AS x FROM f)
    ),
    counts AS (
      SELECT b,
             COUNT(*) FILTER (WHERE is_t) AS ct,
             COUNT(*) FILTER (WHERE NOT is_t) AS cr
      FROM fb GROUP BY b
    ),
    tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM counts),
    w AS (
      SELECT b, LN((ct + 1.0) / (tt + {_DSIR_B}.0))
               - LN((cr + 1.0) / (tr + {_DSIR_B}.0)) AS lw
      FROM counts CROSS JOIN tot
    ),
    docw AS (
      SELECT doc_id, ROUND(SUM(c * lw), 4) AS dsir_logw
      FROM (SELECT doc_id, b, COUNT(*) AS c FROM fb WHERE NOT is_t
            GROUP BY doc_id, b)
      JOIN w USING (b) GROUP BY doc_id
    )
    SELECT CAST(rnk AS INT) AS rank, doc_id, dsir_logw FROM (
      SELECT doc_id, dsir_logw,
             ROW_NUMBER() OVER (ORDER BY dsir_logw DESC, doc_id) AS rnk
      FROM docw
    ) WHERE rnk <= {_DSIR_TOP} ORDER BY rank
    """,
)
def q_dsir_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ (r8) — DSIR data selection (Xie et al. 2023): hashed
    unigram+bigram bag-of-ngrams multinomials fit on the target slice (the
    benchmark-designated ~1/16, standing in for the Wikipedia/books-style
    target distribution) and the raw remainder; each raw document scores
    Σ_f c_f·(ln p̂_target(f) − ln p̂_raw(f)) with Laplace smoothing over
    {_DSIR_B} buckets; the top-{_DSIR_TOP} by (ROUNDED score, doc_id) are
    selected. Rank on the ROUNDED weight with the id tie-break so both
    engines cut the identical set (the impact_truncate idiom).

    Plan at 100 TB: the feature explode is map-only; the two multinomials
    are ONE hash aggregate over a {_DSIR_B}-key space (map-side combine
    absorbs the explode volume); the bucket-weight table is {_DSIR_B} rows
    and broadcasts into the per-doc scoring join; per-doc scores are one
    more hash agg. The final top-N is the only global ordering and runs on
    one row per raw document — TakeOrdered, no full sort. DSIR's actual
    sampling uses Gumbel noise on these same weights; the deterministic
    top-N here is the testable core (noise is a map-only ``-ln(-ln(u))``
    column away, with u from the portable md5 idiom).
    """
    docs = load(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat(F.get(toks, i), F.lit("_"), F.get(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    fb = docs.select(
        "doc_id",
        _bench_pred().alias("is_t"),
        F.explode(F.concat(toks, bigrams)).alias("x"),
    ).select(
        "doc_id", "is_t", (_spark_md5_32(F.col("x")) % _DSIR_B).alias("b")
    )
    counts = fb.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("is_t"), 1).otherwise(0)).alias("cr"),
    )
    tot = counts.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    w = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("ct") + 1.0) / (F.col("tt") + float(_DSIR_B)))
            - F.log((F.col("cr") + 1.0) / (F.col("tr") + float(_DSIR_B)))
        ).alias("lw"),
    )
    docw = (
        fb.filter(~F.col("is_t"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("c") * F.col("lw")), 4).alias("dsir_logw"))
    )
    rk = Window.orderBy(F.col("dsir_logw").desc(), F.col("doc_id"))
    return (
        docw.withColumn("rank", F.row_number().over(rk).cast("int"))
        .filter(F.col("rank") <= _DSIR_TOP)
        .select("rank", "doc_id", "dsir_logw")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# knn_graph_topk

_KNN_K = 3  # neighbors per node


def _knn_oracle() -> str:
    from .llm_ext4 import _semdedup_assign_cte

    return f"""
    {_semdedup_assign_cte(1)},
    p AS (
      SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
             ROUND(LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> a.v[i] * b.v[i]))
                   / (a.nrm * b.nrm), 4) AS cos_sim
      FROM assign a JOIN assign b
        ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
    ),
    r AS (SELECT src_id, nbr_id, cos_sim,
                 ROW_NUMBER() OVER (PARTITION BY src_id
                                    ORDER BY cos_sim DESC, nbr_id) AS rnk
          FROM p)
    SELECT src_id, CAST(rnk AS INT) AS rank, nbr_id, cos_sim
    FROM r WHERE rnk <= {_KNN_K} ORDER BY src_id, rank
    """


@register("knn_graph_topk", oracle=_knn_oracle())
def q_knn_graph_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+ (r8) — approximate k-NN graph construction: the top-{_KNN_K}
    directed neighbor edges per vector, candidates restricted to the
    vector's nearest-centroid cell (the SemDeDup assignment, shared
    machinery AND shared oracle CTE — llm_ext4._semdedup_assign_cte, so
    the two families cannot drift). The k-NN graph is the input every
    graph-based corpus tool wants: NN-Descent refinement, graph-clustering
    topic discovery, connected-component semantic dedup, HNSW layer
    seeding.

    Plan at 100 TB: assignment is the O(n·k_cells) broadcast + max_by
    aggregate; the candidate join is the within-cell Σ|cell|² equi-shuffle
    (never all-pairs); per-source top-{_KNN_K} runs as ONE
    collect_list+sort_array+slice aggregate — map-side combinable,
    {_KNN_K}-bounded output per node, no per-vector window (the semdedup
    assign_top idiom). Boundary neighbors (in a different cell) are the
    recall tradeoff — production refines with one or two NN-Descent
    rounds over the edge list, each round the same bounded join shape.
    """
    from ..operators.similarity import dot, nearest_centroid

    emb = load(spark, sf_dir, "embeddings")
    assign = nearest_centroid(emb, k=8)
    a = assign.select(
        F.col("vec_id").alias("src_id"),
        F.col("cluster"),
        F.col("__v").alias("av"),
        F.col("__n").alias("an"),
    )
    b = assign.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("cluster"),
        F.col("__v").alias("bv"),
        F.col("__n").alias("bn"),
    )
    cos = F.round(dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 4)
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("src_id") != F.col("nbr_id"))
        .select(
            "src_id",
            F.struct(
                cos.alias("c"), (-F.col("nbr_id")).alias("nn"), F.col("nbr_id").alias("nbr_id")
            ).alias("__s"),
        )
    )
    topk = pairs.groupBy("src_id").agg(
        F.slice(F.reverse(F.sort_array(F.collect_list("__s"))), 1, _KNN_K).alias("__t")
    )
    return (
        topk.select("src_id", F.posexplode("__t").alias("pos", "s"))
        .select(
            "src_id",
            (F.col("pos") + 1).cast("int").alias("rank"),
            F.col("s.nbr_id").alias("nbr_id"),
            F.col("s.c").alias("cos_sim"),
        )
        .orderBy("src_id", "rank")
    )
