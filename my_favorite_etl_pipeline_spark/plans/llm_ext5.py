"""[EXT] curation round 5 — model-based filtering and leakage-aware
assembly (SURVEY.md §2.9 X3/X4; no reference citation exists — the
citation is BASELINE.json's LLM-data mandate).

Seven operators a production pretraining pipeline runs between raw
curation and packing, each with an exact DuckDB oracle:

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
- ``embedding_topk_pq_adc``      — product-quantization ADC retrieval with
  exact re-rank (the memory half of FAISS IVF-PQ billion-vector search),
  deterministic end-to-end so the oracle replays it.
- ``curation_funnel_report``     — MOVED to ``llm_ext14`` (r15): the
  funnel now composes the registered r14 entries (fuzzy decon /
  community cap / coverage core), which load after this module.
- ``embedding_topk_ivf_pq``      — the COMPOSED index: IVF cell probe ×
  PQ-ADC × exact re-rank, the way a production billion-vector index
  actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import tracked_persist
from ..functions import text as TX
from ..registry import REGISTRY, register
from ..session import shuffle_partitions_tag
from ..sources.tables import load

# ---------------------------------------------------------------------------
# shared portable-hash idioms (md5 halves — bit-identical in every engine;
# same rationale as operators.dedup.simhash_bits_portable)

#: DuckDB: first 8 hex chars of md5(expr) parsed to a BIGINT in [0, 2^32).
#: (DuckDB has no CONV; hex digits via strpos arithmetic, the _DUCK_SIMHASH
#: idiom from llm_ext.py.)
def _duck_md5_32(expr: str) -> str:
    # The outer CAST is load-bearing (r12): DuckDB silently promotes
    # LIST_SUM(BIGINT[]) to HUGEINT, and the HUGEINT type then infects every
    # arithmetic expression and UNION ALL branch downstream — invisible to a
    # value-level comparison but rendered differently by the driver's
    # harness (the r9–r11 graph/GD-family hash-red root cause, VERDICT r11
    # "What's wrong" item 1). Values always fit: the md5 half is < 2^32.
    return (
        "CAST(LIST_SUM(LIST_TRANSFORM(range(8), i -> "
        f"CAST(strpos('0123456789abcdef', substr(md5({expr}), i + 1, 1)) - 1 "
        "AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (7 - i))))) AS BIGINT)"
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
    this one costs zero. ``ensure_min_partitions`` guards the fixture's
    one-file parquet (a 1-partition scan serializes the whole CPU-bound
    map; measured 10 s → 0.6 s at sf0.1 on 32 cores — an explode+agg
    variant was ALSO measured and loses once parallelism is equal, 0.73 s,
    while costing the shuffle this shape exists to avoid).
    """
    from ..operators.scaling import ensure_min_partitions

    w_of = (
        lambda c: _spark_md5_32(c) % 20001 - 10000
    )  # uniform [-1e4, 1e4] ∩ Z, exact integer arithmetic on both engines
    docs = ensure_min_partitions(load(spark, sf_dir, "documents"))
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

# Shared CTE chain: per-doc unigram-NLP scores + per-lang tercile
# thresholds. Factored (late r12) so epoch_repeat_plan (llm_ext12) replays
# the IDENTICAL bucket assignment — one text, two consumers, no drift.
_CCNET_CTES = """
    toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
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
           FROM cum JOIN nl USING (lang) GROUP BY 1),
    bucketed AS (
      SELECT dl.doc_id, dl.lang, dl.s AS unigram_nlp,
             CASE WHEN dl.s <= th.t1 THEN 'head'
                  WHEN dl.s <= th.t2 THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
      FROM dl JOIN th USING (lang)
    )"""


def ccnet_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNORDERED shared bucket frame (doc_id, lang, unigram_nlp,
    ppl_bucket) — the Spark twin of the shared ``_CCNET_CTES`` text.
    Composing consumers (epoch_repeat_plan) join on this frame; only the
    registered presentation query pays the final sort (a composed join
    would immediately destroy the ordering a sort here produced)."""
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
    return dl.join(F.broadcast(th), "lang").select(
        "doc_id",
        "lang",
        F.col("s").alias("unigram_nlp"),
        F.when(F.col("s") <= F.col("t1"), F.lit("head"))
        .when(F.col("s") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )


@register(
    "perplexity_buckets_ccnet",
    oracle=f"""
    WITH {_CCNET_CTES}
    SELECT doc_id, lang, unigram_nlp, ppl_bucket
    FROM bucketed ORDER BY doc_id
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
    return ccnet_bucketed(spark, sf_dir).orderBy("doc_id")


# ---------------------------------------------------------------------------
# prototype_prune_d4

@register(
    "prototype_prune_d4",
    oracle="""
    WITH e AS (SELECT vec_id,
                      LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    en AS (SELECT vec_id, v,
                  SQRT(LIST_SUM(LIST_TRANSFORM(v, x -> x * x))) AS nrm
           FROM e),
    dims AS (SELECT UNNEST(range(64)) AS dim),
    pd AS (SELECT e.vec_id % 8 AS cid, d.dim,
                  CAST(SUM(CAST(FLOOR(e.v[d.dim + 1] * 10000000) AS BIGINT)) AS DOUBLE)
                    / (COUNT(*) * 10000000.0) AS mean_val
           FROM e CROSS JOIN dims d GROUP BY 1, 2),
    cent AS (SELECT cid, LIST(mean_val ORDER BY dim) AS centroid
             FROM pd GROUP BY cid),
    cn AS (SELECT cid, centroid,
                  SQRT(LIST_SUM(LIST_TRANSFORM(centroid, x -> x * x))) AS cnrm
           FROM cent),
    scored AS (
      SELECT en.vec_id, c.cid,
             ROUND(LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> en.v[i] * c.centroid[i]))
               / (en.nrm * c.cnrm), 4) AS cos_c
      FROM en CROSS JOIN cn c
    ),
    assign AS (
      SELECT vec_id, cid AS cluster, cos_c AS proto_sim FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY cos_c DESC, cid) AS rn
        FROM scored) WHERE rn = 1
    ),
    hist AS (SELECT cluster, proto_sim AS s, COUNT(*) AS c
             FROM assign GROUP BY 1, 2),
    cum AS (SELECT cluster, s,
                   SUM(c) OVER (PARTITION BY cluster ORDER BY s DESC) AS cge
            FROM hist),
    nc AS (SELECT cluster, COUNT(*) AS n FROM assign GROUP BY 1),
    th AS (SELECT cum.cluster, MIN(CASE WHEN cge * 4 <= n THEN s END) AS tc
           FROM cum JOIN nc USING (cluster) GROUP BY 1)
    SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster, a.proto_sim
    FROM assign a JOIN th USING (cluster)
    WHERE th.tc IS NULL OR a.proto_sim < th.tc
    ORDER BY a.vec_id
    """,
)
def q_prototype_prune_d4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+/X3 (r7) — SSL-prototypes/D4-style diversity pruning (Sorscher
    et al. 2022 "Beyond neural scaling laws"; Tirumala et al. 2023 "D4"):
    cluster the embedding space, rank every vector by similarity to its
    OWN cluster centroid ("prototypicality"), and DROP the most
    prototypical ~25% of each cluster — the redundancy-heavy core that
    contributes least to data diversity. The keep set (what a pretraining
    run reads) is returned.

    Scale design mirrors ``perplexity_buckets_ccnet``: the per-cluster
    25th-from-the-top cut comes from a compacted (cluster, rounded-sim)
    HISTOGRAM with a descending cumulative count — corpus-scale work is
    the O(n·k) assignment (:func:`nearest_centroid`: one broadcast
    crossJoin + one max_by aggregate) plus one hash agg; no per-cluster
    rank window ever sorts the corpus with k-way parallelism. Tie policy
    is by-threshold (all vectors at the cut score survive together), so
    the drop fraction is ≤ 25% exactly: floor(n/4) ≥ #dropped on every
    cluster, enforced in tests/test_model_filters.py.
    """
    from ..operators.similarity import nearest_centroid

    emb = load(spark, sf_dir, "embeddings")
    assign = nearest_centroid(emb, k=8).select("vec_id", "cluster", "proto_sim")
    hist = assign.groupBy("cluster", "proto_sim").agg(F.count(F.lit(1)).alias("c"))
    cum = hist.withColumn(
        "cge",
        F.sum("c").over(Window.partitionBy("cluster").orderBy(F.desc("proto_sim"))),
    )
    nc = assign.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
    th = (
        cum.join(nc, "cluster")
        .groupBy("cluster")
        .agg(
            F.min(
                F.when(F.col("cge") * 4 <= F.col("n"), F.col("proto_sim"))
            ).alias("tc")
        )
    )
    return (
        assign.join(F.broadcast(th), "cluster")
        .filter(F.col("tc").isNull() | (F.col("proto_sim") < F.col("tc")))
        .select("vec_id", F.col("cluster").cast("long").alias("cluster"), "proto_sim")
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# leakage_safe_split

# Restated from llm_ext2 (same reason as there and in llm_ext4: each oracle
# must be a self-contained SQL string the driver can run verbatim).
_DUCK_SHINGLES_5 = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3
               THEN list_transform(range(len(t) - 2),
                                   i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
               ELSE [] END) AS s
      FROM toks
    )
"""


@register(
    "leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE {_DUCK_SHINGLES_5},
    sizes AS (SELECT doc_id, LEN(s) AS n FROM sh),
    ex AS (SELECT doc_id, UNNEST(s) AS shingle FROM sh),
    inter AS (
      SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS c
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    p AS (
      SELECT u, v FROM inter
      JOIN sizes sa ON inter.u = sa.doc_id
      JOIN sizes sb ON inter.v = sb.doc_id
      WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.9
    ),
    edges AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
    reach(node, root) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node
    ),
    comp AS (SELECT node, MIN(root) AS component FROM reach GROUP BY node),
    mixed AS (
      SELECT node, component,
             ({_duck_md5_32('CAST(component AS VARCHAR)')}) % 10 AS mix
      FROM comp
    )
    SELECT CAST(node AS BIGINT) AS doc_id,
           CAST(component AS BIGINT) AS component,
           CASE WHEN mix <= 7 THEN 'train'
                WHEN mix = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM mixed ORDER BY doc_id
    """,
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ (r7) — leakage-safe train/val/test assignment: hash the NEAR-DUP
    COMPONENT representative, not the document id, so every member of a
    duplicate cluster lands in the same split. A per-doc random/hash split
    leaks training text into eval whenever near-duplicates straddle the
    cut — the exact failure mode decontamination exists to prevent, created
    by the splitter itself. Composes the registered
    ``dedup_cluster_components`` clustering (prefix-filtered >= 0.9-Jaccard
    edges -> min-label components) with md5 split mixing; 80/10/10.

    Plan at 100 TB: everything is the clustering's cost (see
    dedup_cluster_components / SCALE.md §cluster); the split itself adds
    one map-only projection. The md5 mix decorrelates the split from the
    id space (component ids are min-ids, dense in doc_id, so ``comp % 10``
    would inherit any id-assignment pattern; a hash does not).

    PERSIST/REUSE (VERDICT r7 plan-audit note): this harness entry
    recomputes the component table inline so the oracle can replay the
    whole chain in one SQL string. A production pipeline materializes
    ``dedup_cluster_components`` ONCE (it already feeds dedup itself,
    decontamination grouping, and this split) and every consumer reads the
    parquet — the split is then a pure map over (doc_id, component) with
    zero clustering cost. Within one session the same effect comes from
    ``tracked_persist`` on the component frame before fanning out.
    """
    comp = REGISTRY["dedup_cluster_components"].fn(spark, sf_dir)
    mix = _spark_md5_32(F.col("component").cast("string")) % 10
    return comp.select(
        "doc_id",
        "component",
        F.when(mix <= 7, F.lit("train"))
        .when(mix == 8, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# shared PQ/IVF serving index — trained once per (corpus, partitioning),
# committed through VersionedMart, served as table reads (r16-opt,
# VERDICT r15 item 4; the _knn_refined_tables durable-graph precedent)

_PQ_SERVE_MEMO: dict[tuple[str, str], str] = {}  # key -> mart root dir
_PQ_SERVE_ROOT: list[str] = []
_PQ_SERVE_LOCK = __import__("threading").Lock()


def _pq_serve_root() -> str:
    # per-PROCESS private temp root, atexit-reaped — the _knn_graph_root
    # pattern (concurrent processes never overwrite each other's parquet)
    if not _PQ_SERVE_ROOT:
        import atexit
        import shutil
        import tempfile

        root = tempfile.mkdtemp(prefix="mfe_pq_index_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _PQ_SERVE_ROOT.append(root)
    return _PQ_SERVE_ROOT[0]


def _pq_serving_tables(spark: SparkSession, sf_dir: str):
    """``(cent, assign, cb)`` read back from :class:`VersionedMart`
    commits — the trained ANN index artifacts shared by the PQ serving
    entries: the 16-row Lloyd-refined coarse centroid table, the narrow
    ``(vec_id, __cid)`` cell assignment (the "assignment is a stored
    partition column at 100 TB" posture of ivf_topk_kmeans's docstring,
    made literal), and the 8×64-row PQ codebook. Built ONCE per
    (sf_dir, shuffle partitioning) per process by the exact training
    functions the inline path runs (kmeans_iterate / pq_codebook through
    kmeans_assign_and_probe — no forked arithmetic, so commits are
    bit-identical to inline training), committed via the mart's
    write-new-version-then-atomic-manifest-swap, and served as parquet
    scans thereafter. r15 measured the in-bench gap this closes:
    embedding_topk_ivf_pq 4.0 s in-tier vs 2.8 s solo — FULL-tier cache
    pressure kept re-materializing the training chain; committed tables
    cannot be evicted. The memo keys on (sf_dir, shuffle.partitions) so
    the partitioning-determinism harness rebuilds per partitioning
    (values identical either way — fixed-point training arithmetic).
    """
    import hashlib
    import os

    from ..caching import materialized_scope
    from ..operators.similarity import (
        kmeans_assign_and_probe,
        kmeans_iterate,
        pq_codebook,
    )
    from ..sources.mart import VersionedMart

    parts = shuffle_partitions_tag(spark)
    key = (os.path.abspath(sf_dir), parts)
    with _PQ_SERVE_LOCK:
        base = _PQ_SERVE_MEMO.get(key)
        if base is None:
            digest = hashlib.sha256(f"{key[0]}\x00{parts}".encode()).hexdigest()[:16]
            base = os.path.join(_pq_serve_root(), digest)
            cm = VersionedMart(os.path.join(base, "centroids"))
            am = VersionedMart(os.path.join(base, "assign"))
            bm = VersionedMart(os.path.join(base, "codebook"))
            if (
                cm.current_version() is None
                or am.current_version() is None
                or bm.current_version() is None
            ):
                emb = load(spark, sf_dir, "embeddings")
                # scope the training persists: the commits materialize the
                # parquet, the scope releases the block-store entries
                with materialized_scope():
                    cent = kmeans_iterate(emb, k=16, n_iter=2)
                    assign_full, _ = kmeans_assign_and_probe(
                        emb, emb.limit(1), n_clusters=16, n_probe=1,
                        n_iter=2, cent=cent,
                    )
                    cb = pq_codebook(emb, m=8, kc=64, n_iter=1)
                    cm.commit(cent.select("cid", "centroid"), "v1")
                    am.commit(assign_full.select("vec_id", "__cid"), "v1")
                    bm.commit(cb.select("s", "c", "cv"), "v1")
            _PQ_SERVE_MEMO[key] = base
    return (
        VersionedMart(os.path.join(base, "centroids")).read(spark),
        VersionedMart(os.path.join(base, "assign")).read(spark),
        VersionedMart(os.path.join(base, "codebook")).read(spark),
    )


# ---------------------------------------------------------------------------
# embedding_topk_pq_adc

@register(
    "embedding_topk_pq_adc",
    oracle="""
    WITH e AS (SELECT vec_id,
                      LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    eu AS (SELECT vec_id,
                  LIST_TRANSFORM(v, x ->
                    x / SQRT(LIST_SUM(LIST_TRANSFORM(v, y -> y * y)))) AS u
           FROM e),
    dims AS (SELECT UNNEST(range(64)) AS dim),
    pd AS (SELECT CAST(eu.vec_id % 64 AS INT) AS c,
                  CAST(d.dim // 8 AS INT) AS s, d.dim,
                  CAST(SUM(CAST(FLOOR(eu.u[d.dim + 1] * 10000000) AS BIGINT)) AS DOUBLE)
                    / (COUNT(*) * 10000000.0) AS mean_val
           FROM eu CROSS JOIN dims d GROUP BY 1, 2, 3),
    cb0 AS (SELECT s, c, LIST(mean_val ORDER BY dim) AS cv
            FROM pd GROUP BY s, c),
    sub AS (SELECT CAST(UNNEST(range(8)) AS INT) AS s),
    vs AS (SELECT eu.vec_id, sub.s,
                  list_slice(eu.u, sub.s * 8 + 1, sub.s * 8 + 8) AS vsub
           FROM eu CROSS JOIN sub),
    a0 AS (
      SELECT vs.vec_id, vs.s, cb0.c,
             CAST(FLOOR(10000000.0 * LIST_SUM(LIST_TRANSFORM(range(1, 9),
               i -> (vs.vsub[i] - cb0.cv[i]) * (vs.vsub[i] - cb0.cv[i]))))
             AS BIGINT) AS dfx
      FROM vs JOIN cb0 ON vs.s = cb0.s
    ),
    asg AS (SELECT vec_id, s, c FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                           ORDER BY dfx, c) AS rn
              FROM a0) WHERE rn = 1),
    pd1 AS (
      SELECT a.s, a.c, d.i,
             CAST(SUM(CAST(FLOOR(v.vsub[d.i + 1] * 10000000) AS BIGINT)) AS DOUBLE)
               / (COUNT(*) * 10000000.0) AS mean_val
      FROM asg a JOIN vs v ON a.vec_id = v.vec_id AND a.s = v.s
      CROSS JOIN (SELECT CAST(UNNEST(range(8)) AS INT) AS i) d
      GROUP BY 1, 2, 3
    ),
    cb1n AS (SELECT s, c, LIST(mean_val ORDER BY i) AS cv1 FROM pd1 GROUP BY s, c),
    cb AS (SELECT cb0.s, cb0.c, COALESCE(cb1n.cv1, cb0.cv) AS cv
           FROM cb0 LEFT JOIN cb1n ON cb0.s = cb1n.s AND cb0.c = cb1n.c),
    enc0 AS (
      SELECT vs.vec_id, vs.s, cb.c,
             CAST(FLOOR(10000000.0 * LIST_SUM(LIST_TRANSFORM(range(1, 9),
               i -> (vs.vsub[i] - cb.cv[i]) * (vs.vsub[i] - cb.cv[i]))))
             AS BIGINT) AS dfx
      FROM vs JOIN cb ON vs.s = cb.s
    ),
    enc AS (SELECT vec_id, s, c FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                           ORDER BY dfx, c) AS rn
              FROM enc0) WHERE rn = 1),
    qv AS (SELECT s, vsub FROM vs WHERE vec_id = 0),
    qtab AS (
      SELECT cb.s, cb.c,
             CAST(FLOOR(10000000.0 * LIST_SUM(LIST_TRANSFORM(range(1, 9),
               i -> q.vsub[i] * cb.cv[i]))) AS BIGINT) AS pfx
      FROM cb JOIN qv q ON cb.s = q.s
    ),
    sc AS (SELECT enc.vec_id, SUM(pfx) AS adc
           FROM enc JOIN qtab ON enc.s = qtab.s AND enc.c = qtab.c
           GROUP BY 1),
    short AS (SELECT vec_id FROM sc ORDER BY adc DESC, vec_id LIMIT 50),
    qf AS (SELECT v AS qvec, SQRT(LIST_SUM(LIST_TRANSFORM(v, x -> x * x))) AS qn
           FROM e WHERE vec_id = 0)
    SELECT vec_id, cos_sim FROM (
      SELECT e.vec_id,
             ROUND(LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> e.v[i] * qf.qvec[i]))
               / (SQRT(LIST_SUM(LIST_TRANSFORM(e.v, x -> x * x))) * qf.qn),
             4) AS cos_sim
      FROM e JOIN short USING (vec_id) CROSS JOIN qf
    ) ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
)
def q_embedding_topk_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 (r7) — product-quantization ADC retrieval with exact re-rank
    (Jégou et al. 2011): 8 subspaces × 64 codes (48 bits/vector — an
    honest ~8-vectors-per-code regime on the 500-vector fixture;
    production uses 256 codes = the FAISS byte-per-subspace default),
    asymmetric-distance shortlist of 50, true-cosine re-rank to top-10.
    Mean recall@10 on the fixture: 0.64 at 16 codes, 0.82 at 64, 0.96 at
    256 — floor-pinned in tests/test_model_filters.py. The memory half of
    billion-scale ANN (8 B/vector instead of 256 B); the IVF cell probe
    (``embedding_topk_ivf_kmeans``) is the orthogonal scan-cut half — a
    production index composes both. Codebook + query ADC table ride as ONE
    broadcast row of nested arrays; encoding and scoring are a pure map
    stage (zero corpus-scale shuffles), then TakeOrdered(50) and a
    broadcast re-rank. Every comparison is fixed-point BIGINT (floor-scaled
    distances and partial dots), so the oracle replays the identical
    algorithm — recall vs the brute-force twin is additionally floor-pinned
    in tests/test_model_filters.py.
    """
    from ..operators.similarity import pq_adc_topk

    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    # serve from the committed codebook (r16-opt): training runs once per
    # (corpus, partitioning) in _pq_serving_tables, not once per query call
    _, _, cb = _pq_serving_tables(spark, sf_dir)
    return pq_adc_topk(emb, query, k=10, shortlist=50, kc=64, cb=cb)


# ---------------------------------------------------------------------------
# embedding_topk_ivf_pq (the composed index)

# The coarse stage replays the embedding_topk_ivf_kmeans oracle verbatim
# (same generated Lloyd rounds — imported so the two cannot drift); the
# PQ stage replays embedding_topk_pq_adc with p_-prefixed CTEs (the Lloyd
# generator also emits pd{i}/c{i} names) restricted to probed cells.
from .llm_ext import _IVF_KMEANS_ITERS, _lloyd_rounds_sql  # noqa: E402

_IVF_PQ_ORACLE = f"""
    WITH e AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    en AS (SELECT vec_id, v, SQRT(LIST_SUM(LIST_TRANSFORM(v, x -> x * x))) AS n FROM e),
    q AS (SELECT v AS qv, SQRT(LIST_SUM(LIST_TRANSFORM(v, x -> x * x))) AS qn
          FROM e WHERE vec_id = 0),
    dims AS (SELECT UNNEST(range(64)) AS dim),
    pd0 AS (
      SELECT vec_id % 16 AS cid, d.dim,
             CAST(SUM(CAST(FLOOR(v[d.dim + 1] * 10000000) AS BIGINT)) AS DOUBLE)
               / (COUNT(*) * 10000000.0) AS mean_val
      FROM e CROSS JOIN dims d GROUP BY 1, 2
    ),
    c0 AS (SELECT cid, LIST(mean_val ORDER BY dim) AS centroid FROM pd0 GROUP BY cid),
    {_lloyd_rounds_sql(_IVF_KMEANS_ITERS)},
    af AS (
      SELECT vec_id, cid FROM (
        SELECT en.vec_id, c.cid,
               ROUND(LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> en.v[i] * c.centroid[i]))
                 / (en.n * SQRT(LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> c.centroid[i] * c.centroid[i])))),
               4) AS cc
        FROM en CROSS JOIN c{_IVF_KMEANS_ITERS} c
      ) QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid ASC) = 1
    ),
    probed AS (
      SELECT cid FROM (
        SELECT c.cid,
               LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> c.centroid[i] * q.qv[i]))
                 / (SQRT(LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> c.centroid[i] * c.centroid[i])))
                    * q.qn) AS cs
        FROM c{_IVF_KMEANS_ITERS} c CROSS JOIN q
      ) ORDER BY cs DESC, cid LIMIT 6
    ),
    sel AS (SELECT af.vec_id FROM af JOIN probed p ON af.cid = p.cid),
    eu AS (SELECT vec_id,
                  LIST_TRANSFORM(v, x ->
                    x / SQRT(LIST_SUM(LIST_TRANSFORM(v, y -> y * y)))) AS u
           FROM e),
    p_pd AS (SELECT CAST(eu.vec_id % 64 AS INT) AS c,
                    CAST(d.dim // 8 AS INT) AS s, d.dim,
                    CAST(SUM(CAST(FLOOR(eu.u[d.dim + 1] * 10000000) AS BIGINT)) AS DOUBLE)
                      / (COUNT(*) * 10000000.0) AS mean_val
             FROM eu CROSS JOIN dims d GROUP BY 1, 2, 3),
    p_cb0 AS (SELECT s, c, LIST(mean_val ORDER BY dim) AS cv
              FROM p_pd GROUP BY s, c),
    p_sub AS (SELECT CAST(UNNEST(range(8)) AS INT) AS s),
    p_vs AS (SELECT eu.vec_id, p_sub.s,
                    list_slice(eu.u, p_sub.s * 8 + 1, p_sub.s * 8 + 8) AS vsub
             FROM eu CROSS JOIN p_sub),
    p_a0 AS (
      SELECT p_vs.vec_id, p_vs.s, p_cb0.c,
             CAST(FLOOR(10000000.0 * LIST_SUM(LIST_TRANSFORM(range(1, 9),
               i -> (p_vs.vsub[i] - p_cb0.cv[i]) * (p_vs.vsub[i] - p_cb0.cv[i]))))
             AS BIGINT) AS dfx
      FROM p_vs JOIN p_cb0 ON p_vs.s = p_cb0.s
    ),
    p_asg AS (SELECT vec_id, s, c FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                             ORDER BY dfx, c) AS rn
                FROM p_a0) WHERE rn = 1),
    p_pd1 AS (
      SELECT a.s, a.c, d.i,
             CAST(SUM(CAST(FLOOR(v.vsub[d.i + 1] * 10000000) AS BIGINT)) AS DOUBLE)
               / (COUNT(*) * 10000000.0) AS mean_val
      FROM p_asg a JOIN p_vs v ON a.vec_id = v.vec_id AND a.s = v.s
      CROSS JOIN (SELECT CAST(UNNEST(range(8)) AS INT) AS i) d
      GROUP BY 1, 2, 3
    ),
    p_cb1n AS (SELECT s, c, LIST(mean_val ORDER BY i) AS cv1 FROM p_pd1 GROUP BY s, c),
    p_cb AS (SELECT p_cb0.s, p_cb0.c, COALESCE(p_cb1n.cv1, p_cb0.cv) AS cv
             FROM p_cb0 LEFT JOIN p_cb1n ON p_cb0.s = p_cb1n.s AND p_cb0.c = p_cb1n.c),
    p_enc0 AS (
      SELECT p_vs.vec_id, p_vs.s, p_cb.c,
             CAST(FLOOR(10000000.0 * LIST_SUM(LIST_TRANSFORM(range(1, 9),
               i -> (p_vs.vsub[i] - p_cb.cv[i]) * (p_vs.vsub[i] - p_cb.cv[i]))))
             AS BIGINT) AS dfx
      FROM p_vs JOIN sel USING (vec_id) JOIN p_cb ON p_vs.s = p_cb.s
    ),
    p_enc AS (SELECT vec_id, s, c FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                             ORDER BY dfx, c) AS rn
                FROM p_enc0) WHERE rn = 1),
    p_qv AS (SELECT s, vsub FROM p_vs WHERE vec_id = 0),
    p_qtab AS (
      SELECT p_cb.s, p_cb.c,
             CAST(FLOOR(10000000.0 * LIST_SUM(LIST_TRANSFORM(range(1, 9),
               i -> pq.vsub[i] * p_cb.cv[i]))) AS BIGINT) AS pfx
      FROM p_cb JOIN p_qv pq ON p_cb.s = pq.s
    ),
    p_sc AS (SELECT p_enc.vec_id, SUM(pfx) AS adc
             FROM p_enc JOIN p_qtab ON p_enc.s = p_qtab.s AND p_enc.c = p_qtab.c
             GROUP BY 1),
    p_short AS (SELECT vec_id FROM p_sc ORDER BY adc DESC, vec_id LIMIT 30)
    SELECT vec_id, cos_sim FROM (
      SELECT e.vec_id,
             ROUND(LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> e.v[i] * q.qv[i]))
               / (SQRT(LIST_SUM(LIST_TRANSFORM(e.v, x -> x * x))) * q.qn),
             4) AS cos_sim
      FROM e JOIN p_short USING (vec_id) CROSS JOIN q
    ) ORDER BY cos_sim DESC, vec_id LIMIT 10
    """


@register(
    "embedding_topk_ivf_pq",
    oracle=_IVF_PQ_ORACLE,
)
def q_embedding_topk_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 (r7) — the composed FAISS-style index: 6-of-16-cell IVF probe
    over the family's Lloyd-refined k-means centroids × PQ-ADC (8×64
    codes, codebook trained on the FULL corpus so codes are
    query-independent) × exact-cosine re-rank of a 30-deep shortlist.
    Scan ≈ 6/16 of the corpus, each scanned vector costs 8 table lookups,
    memory is 8 codes/vector — multiplicative savings, the reason
    billion-vector indexes exist. The coarse stage is the SAME
    assignment+probe as ``embedding_topk_ivf_kmeans`` (factored helper +
    imported oracle CTEs, so the twins cannot drift); probe-6 is the
    family's recall knob — hash-init 3-probe cells measured 0.42 mean
    recall@10 on the near-isotropic fixture, Lloyd + 6 probes ≈ 0.6+.
    Deterministic end-to-end; recall floor vs brute force pinned in
    tests/test_model_filters.py.
    """
    from ..operators.similarity import ivf_pq_topk

    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    # serve from the committed index (r16-opt): coarse centroids, cell
    # assignment, and PQ codebook are mart-committed tables; this call
    # runs ZERO training passes — probe + semi-join + ADC map + re-rank
    cent, assign, cb = _pq_serving_tables(spark, sf_dir)
    return ivf_pq_topk(emb, query, k=10, shortlist=30, cent=cent, assign=assign, cb=cb)


# ---------------------------------------------------------------------------
# documents_dataset_card

@register(
    "documents_dataset_card",
    oracle="""
    WITH base AS (SELECT lang, source,
                         len(string_split(text, ' ')) AS ntok,
                         md5(text) AS fp
                  FROM documents),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM base),
    gs AS (
      SELECT CASE WHEN lang IS NOT NULL THEN 'lang'
                  WHEN source IS NOT NULL THEN 'source'
                  ELSE 'total' END AS section,
             COALESCE(lang, source, 'ALL') AS key,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(ntok) AS BIGINT) AS n_tokens
      FROM base GROUP BY GROUPING SETS ((lang), (source), ())
    ),
    dup AS (SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS extra
            FROM (SELECT COUNT(*) AS c FROM base GROUP BY fp))
    SELECT section, key, n_docs, n_tokens,
           ROUND(n_docs / tot.nd, 4) AS doc_share
    FROM gs CROSS JOIN tot
    UNION ALL
    SELECT 'dedup', 'exact_dup_docs', dup.extra, CAST(0 AS BIGINT),
           ROUND(dup.extra / tot.nd, 4)
    FROM dup CROSS JOIN tot
    ORDER BY section, key
    """,
)
def q_documents_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ (r7) — the dataset-card table: total/per-language/per-source
    document and token counts with shares, plus the exact-duplicate count —
    the summary block every corpus release (HF dataset card, corpus paper
    §data) publishes. One GROUPING SETS pass over the corpus (Spark
    expands the sets with a single Expand node — one shuffle for all three
    groupings) plus the fingerprint dup aggregate; through the SQL entry
    point, locking GROUPING SETS onto the documents surface the way
    ``grouping_sets_revenue`` locks it onto lineitem.
    """
    from ..sources.tables import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        WITH base AS (SELECT lang, source,
                             size(split(text, ' ')) AS ntok,
                             md5(text) AS fp
                      FROM documents),
        tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM base),
        gs AS (
          SELECT CASE WHEN lang IS NOT NULL THEN 'lang'
                      WHEN source IS NOT NULL THEN 'source'
                      ELSE 'total' END AS section,
                 COALESCE(lang, source, 'ALL') AS key,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(ntok) AS BIGINT) AS n_tokens
          FROM base GROUP BY GROUPING SETS ((lang), (source), ())
        ),
        dup AS (SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS extra
                FROM (SELECT COUNT(*) AS c FROM base GROUP BY fp))
        SELECT section, key, n_docs, n_tokens,
               ROUND(n_docs / tot.nd, 4) AS doc_share
        FROM gs CROSS JOIN tot
        UNION ALL
        SELECT 'dedup', 'exact_dup_docs', dup.extra, CAST(0 AS BIGINT),
               ROUND(dup.extra / tot.nd, 4)
        FROM dup CROSS JOIN tot
        ORDER BY section, key
        """
    )
