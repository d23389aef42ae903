"""[EXT] curation round 5 — model-based filtering and leakage-aware
assembly (SURVEY.md §2.9 X3/X4; no reference citation exists — the
citation is BASELINE.json's LLM-data mandate).

Five operators a production pretraining pipeline runs between raw curation
and packing, each with an exact DuckDB oracle:

- ``quality_classifier_linear``  — fastText-shaped hashed-feature linear
  scorer (the DCLM / FineWeb-Edu "model-based quality filter" rung).
  Map-only, zero shuffle: scoring a trained linear model is
  embarrassingly parallel and must stay inside whole-stage codegen.
- ``perplexity_buckets_ccnet``   — CCNet's head/middle/tail split: per-
  language terciles of an LM perplexity proxy, thresholds computed on a
  compacted score histogram (never a corpus-scale per-language sort).
- ``prototype_prune_d4``         — SSL-prototypes/D4-style diversity
  pruning (Sorscher et al. 2022; Tirumala et al. 2023): drop the most
  prototypical fraction of every embedding cluster.
- ``leakage_safe_split``         — train/val/test assignment hashed on the
  near-dup COMPONENT representative, so every member of a duplicate
  cluster lands in the same split (the leakage guard a random per-doc
  split violates).
- ``embedding_topk_ivf_pq``      — product-quantization ADC retrieval with
  exact re-rank (the FAISS IVF-PQ shape that makes billion-vector search
  tractable), deterministic end-to-end so the oracle replays it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..registry import REGISTRY, register
from ..sources.tables import load

# ---------------------------------------------------------------------------
# shared portable-hash idioms (md5 halves — bit-identical in every engine;
# same rationale as operators.dedup.simhash_bits_portable)

#: DuckDB: first 8 hex chars of md5(expr) parsed to a BIGINT in [0, 2^32).
#: (DuckDB has no CONV; hex digits via strpos arithmetic, the _DUCK_SIMHASH
#: idiom from llm_ext.py.)
def _duck_md5_32(expr: str) -> str:
    return (
        "LIST_SUM(LIST_TRANSFORM(range(8), i -> "
        f"CAST(strpos('0123456789abcdef', substr(md5({expr}), i + 1, 1)) - 1 "
        "AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (7 - i)))))"
    )


def _spark_md5_32(col: F.Column) -> F.Column:
    """Spark twin of :func:`_duck_md5_32` (CONV exists here)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# quality_classifier_linear

@register(
    "quality_classifier_linear",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    f AS (
      SELECT doc_id,
             list_concat(t, CASE WHEN len(t) >= 2
               THEN list_transform(range(len(t) - 1), i -> t[i+1] || '_' || t[i+2])
               ELSE [] END) AS feats
      FROM toks
    ),
    hw AS (
      SELECT doc_id, len(feats) AS n,
             CAST(LIST_SUM(LIST_TRANSFORM(feats, x ->
               ({_duck_md5_32('x')}) % 20001 - 10000)) AS BIGINT) AS wsum
      FROM f
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_feats,
           ROUND(1.0 / (1.0 + exp(-(CAST(wsum AS DOUBLE) / (n * 10000.0)))), 4)
             AS quality_score,
           wsum >= 0 AS keep
    FROM hw ORDER BY doc_id
    """,
)
def q_quality_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 (r7) — fastText-shaped model-based quality filter: hashed
    unigram+bigram bag-of-features, one weight per feature, mean weight
    through a sigmoid, keep iff score >= 0.5. This is the dataflow of the
    DCLM / FineWeb-Edu classifier rung — the step that upgraded every 2024+
    corpus over heuristic-only filtering.

    Weights here are derived deterministically from the feature's own md5
    (w = h%20001 - 10000, i.e. uniform in [-1, 1] at 1e-4 steps) — a
    documented stand-in for trained parameters: a real deployment either
    broadcast-joins a learned weight table on the same hashed key or bakes
    the weight array into the expression; EITHER way the plan below is
    unchanged. The keep flag compares the exact integer weight SUM against
    0 (sigmoid is monotone), so the gate never rides on float rounding.

    Plan at 100 TB: the entire scorer is ONE map-only projection — token
    split, bigram construction, hashing, weighting, and the sequential-fold
    sum all run per-row inside whole-stage codegen. No explode, no shuffle,
    no UDF: model scoring at corpus scale must not cost an exchange, and
    this one costs zero.
    """
    w_of = (
        lambda c: _spark_md5_32(c) % 20001 - 10000
    )  # uniform [-1e4, 1e4] ∩ Z, exact integer arithmetic on both engines
    docs = load(spark, sf_dir, "documents")
    t = TX.tokens("text")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.concat(F.get(t, i), F.lit("_"), F.get(t, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(t, bigrams)
    wsum = F.aggregate(
        F.transform(feats, w_of), F.lit(0).cast("long"), lambda s, x: s + x
    )
    return (
        docs.select(
            "doc_id",
            F.size(feats).cast("long").alias("n_feats"),
            wsum.alias("__wsum"),
        )
        .select(
            "doc_id",
            "n_feats",
            F.round(
                1.0
                / (
                    1.0
                    + F.exp(
                        -(
                            F.col("__wsum").cast("double")
                            / (F.col("n_feats") * F.lit(10000.0))
                        )
                    )
                ),
                4,
            ).alias("quality_score"),
            (F.col("__wsum") >= 0).alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# perplexity_buckets_ccnet

@register(
    "perplexity_buckets_ccnet",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                  FROM documents),
    freq AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS c FROM toks GROUP BY w),
    tot AS (SELECT SUM(c) AS t FROM freq),
    sc AS (SELECT doc_id, ROUND(AVG(-ln(c / t)), 4) AS s
           FROM toks JOIN freq USING (w) CROSS JOIN tot GROUP BY doc_id),
    dl AS (SELECT d.doc_id, d.lang, sc.s
           FROM documents d JOIN sc ON d.doc_id = sc.doc_id),
    hist AS (SELECT lang, s, COUNT(*) AS c FROM dl GROUP BY 1, 2),
    cum AS (SELECT lang, s,
                   SUM(c) OVER (PARTITION BY lang ORDER BY s) AS cle
            FROM hist),
    nl AS (SELECT lang, COUNT(*) AS n FROM dl GROUP BY 1),
    th AS (SELECT cum.lang,
                  MIN(CASE WHEN cle * 3 >= n THEN s END) AS t1,
                  MIN(CASE WHEN cle * 3 >= 2 * n THEN s END) AS t2
           FROM cum JOIN nl USING (lang) GROUP BY 1)
    SELECT dl.doc_id, dl.lang, dl.s AS unigram_nlp,
           CASE WHEN dl.s <= th.t1 THEN 'head'
                WHEN dl.s <= th.t2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM dl JOIN th USING (lang) ORDER BY dl.doc_id
    """,
)
def q_perplexity_buckets_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 (r7) — CCNet's head/middle/tail split (Wenzek et al. 2020): rank
    each document's LM-perplexity proxy WITHIN its language and cut the
    distribution into terciles; "head" (lowest perplexity) is the
    pretraining keep set, "tail" the discard set. Composes the
    ``unigram_logprob_scores`` scorer with per-language quantiles.

    Scale note — why no NTILE: a per-language rank window sorts the whole
    corpus with |languages| parallelism (one task per language at any
    cluster size). Scores are rounded to 4 decimals, so instead the
    terciles come from a compacted (lang, score) HISTOGRAM: corpus-scale
    work is one map + one hash agg; the cumulative window and threshold
    extraction run on the histogram, bounded by |langs|·|distinct rounded
    scores| ≪ corpus. Tie policy is by-threshold, not by-count: every doc
    with the same rounded score lands in the same bucket (deterministic on
    both engines; a row_number tiebreak would be order-stable too but
    keeps the corpus-scale sort this shape exists to avoid).
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(TX.tokens("text")).alias("w"))
    freq = toks.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("c"))
    tot = freq.agg(F.sum("c").alias("t"))
    sc = (
        toks.join(freq, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.round(F.avg(-F.log(F.col("c") / F.col("t"))), 4).alias("s"))
    )
    dl = docs.select("doc_id", "lang").join(sc, "doc_id")
    hist = dl.groupBy("lang", "s").agg(F.count(F.lit(1)).alias("c"))
    cum = hist.withColumn(
        "cle", F.sum("c").over(Window.partitionBy("lang").orderBy("s"))
    )
    nl = dl.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    th = (
        cum.join(nl, "lang")
        .groupBy("lang")
        .agg(
            F.min(F.when(F.col("cle") * 3 >= F.col("n"), F.col("s"))).alias("t1"),
            F.min(F.when(F.col("cle") * 3 >= 2 * F.col("n"), F.col("s"))).alias("t2"),
        )
    )
    return (
        dl.join(F.broadcast(th), "lang")
        .select(
            "doc_id",
            "lang",
            F.col("s").alias("unigram_nlp"),
            F.when(F.col("s") <= F.col("t1"), F.lit("head"))
            .when(F.col("s") <= F.col("t2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("ppl_bucket"),
        )
        .orderBy("doc_id")
    )
