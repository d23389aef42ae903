"""[EXT] Training-data curation ops round 2 (SURVEY.md §2.9 X4+): the
dataset-assembly steps that sit between cleaning (llm_ext.py) and the
trainer — deterministic splits, class-balanced sampling, and sequence
packing. All pure-DataFrame (zero Python UDFs), all oracle-checked.

Scale notes are per-op; the common theme is that every decision is a pure
function of the row's own key (hash) or of a per-shard window, so each op
is a single map or a single bounded shuffle at 100 TB — never a global
sort or a driver-side pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators.graph import connected_components
from ..caching import tracked_persist
from ..registry import register
from ..sources.tables import load

# DuckDB-side distinct 3-gram shingle CTE (mirrors functions.text.shingles;
# same fragment as llm_ext._DUCK_SHINGLES, restated here because this oracle
# embeds it under WITH RECURSIVE).
_DUCK_SHINGLES = """
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


def hash_split(
    key: F.Column, train: float = 0.8, val: float = 0.1, salt: str = ""
) -> F.Column:
    """Deterministic train/val/test assignment from a hash of the row key.

    Buckets on the first two hex chars of md5(salt || key) — 256 buckets,
    compared lexicographically so the SAME expression runs on any engine
    (no hex→int parsing). Pure per-row map: no shuffle, no RNG state, stable
    under repartitioning/retries — the property `sample(fraction=...)`
    does NOT give you, which is why it exists as an operator.
    """
    bucket = F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 2)
    t_thr = f"{int(train * 256):02x}"
    v_thr = f"{int((train + val) * 256):02x}"
    return (
        F.when(bucket < t_thr, "train").when(bucket < v_thr, "val").otherwise("test")
    )


@register(
    "dataset_split_hash",
    oracle="""
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM (
      SELECT doc_id, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ) GROUP BY split
    """,
)
def dataset_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ — deterministic 80/10/10 train/val/test split by key hash,
    summarized per split. The assignment itself is a narrow map (zero
    shuffle); only this summary aggregates. 0xcc/256=0.796875, 0xe6/256=0.898.
    """
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", hash_split(F.col("doc_id"), 0.8, 0.1))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@register(
    "stratified_sample_per_lang",
    oracle="""
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 50
    ORDER BY lang, doc_id
    """,
)
def stratified_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ — class-balanced downsampling: exactly min(50, |stratum|) docs per
    language, chosen by ranking on a salted key hash (a deterministic
    per-stratum reservoir — same sample on every run, every partitioning).

    One shuffle on `lang`. At 100 TB the rank-then-filter survives because
    each stratum sorts only its own partition; a skewed mega-stratum is the
    one risk — mitigate by pre-filtering with an approximate per-stratum
    hash threshold before the exact rank (operators/skew.py pattern).
    """
    docs = load(spark, sf_dir, "documents")
    rank_key = F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(rank_key, "doc_id")
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 50)
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    )


@register(
    "quality_filter_above_median",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang,
             CAST(LEN(LIST_DISTINCT(string_split(text, ' '))) AS DOUBLE)
             / LEN(string_split(text, ' ')) AS score
      FROM documents
    ), m AS (
      SELECT lang,
             PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY score) AS med
      FROM s GROUP BY lang
    )
    SELECT s.doc_id, s.lang, ROUND(s.score, 4) AS score
    FROM s JOIN m ON s.lang = m.lang
    WHERE s.score > m.med
    ORDER BY s.doc_id
    """,
)
def quality_filter_above_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ — adaptive quality cut: keep docs whose lexical-diversity score
    beats their OWN language's median — a per-stratum data-dependent
    threshold, not a global constant (zh and en score distributions differ,
    so one global cut over/under-prunes some language).

    Medians shrink to one row per lang via percentile_approx — the
    Greenwald-Khanna sketch aggregate: constant memory per group at ANY
    group size, mergeable map-side, no per-group sort. This is the operator
    default precisely because it survives 100 TB; at fixture scale (groups
    ≪ accuracy=10k) the sketch stores every value and returns the exact
    discrete median, which is what the oracle's PERCENTILE_DISC pins —
    both sides name an actual element of the group, so the comparison
    stays bit-exact. The 1-row-per-lang result broadcasts back; the big
    side is touched twice but shuffled zero times for the threshold.
    """
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", TX.distinct_token_ratio("text").alias("score")
    )
    meds = scored.groupBy("lang").agg(F.percentile_approx("score", 0.5, 10000).alias("med"))
    return (
        scored.join(F.broadcast(meds), "lang")
        .filter(F.col("score") > F.col("med"))
        .select("doc_id", "lang", F.round("score", 4).alias("score"))
        .orderBy("doc_id")
    )


@register(
    "dedup_cluster_components",
    # edge generation via the inverted-index equi-join: identical >= 0.9
    # pair set to the O(n²) inequality join (any qualifying pair shares a
    # shingle), but it parallelizes in DuckDB — the nested-loop form is
    # what made this oracle "30 minutes at sf0.1" and excluded it from the
    # round sweeps through r4
    oracle=f"""
    WITH RECURSIVE {_DUCK_SHINGLES},
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
    )
    SELECT CAST(node AS BIGINT) AS doc_id,
           CAST(MIN(root) AS BIGINT) AS component
    FROM reach GROUP BY node ORDER BY doc_id
    """,
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+ — near-dup CLUSTERING: ≥0.9-Jaccard pairs become an edge list,
    connected components merge transitive chains (A~B, B~C ⇒ one group even
    if A≁C), component id = min doc_id = the canonical doc to keep. Every
    doc gets a component (singletons = themselves).

    The oracle computes the same fixpoint as a DuckDB recursive CTE
    (min reachable id per node) — an independent algorithm, so agreement
    checks the iteration's convergence, not just its arithmetic. Edge
    generation is the prefix-filtered set-similarity join (EXACT — 100%
    recall at the threshold, so the all-pairs oracle still matches) plus
    an exact-Jaccard verify on the candidates only: the scale path, not
    the fixture-only all-pairs baseline ``ngram_jaccard_pairs`` keeps.
    """
    docs = load(spark, sf_dir, "documents")
    pairs = near_dup_pairs_90(docs)
    comp = connected_components(pairs, vertices=docs.select("doc_id"))
    return comp.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("comp").cast("long").alias("component"),
    ).orderBy("doc_id")


def near_dup_pairs_90(docs: DataFrame) -> DataFrame:
    """``(src, dst)`` ≥0.9-Jaccard near-dup pairs via the prefix-filtered
    set-similarity join + exact verify — the edge generation of
    ``dedup_cluster_components``, factored (r11) so the canonical-selection
    composition ``dedup_canonical_pagerank`` consumes the identical graph."""
    from ..operators.dedup import prefix_filter_pairs

    cand = prefix_filter_pairs(docs, "doc_id", "text", threshold=0.9)
    # hashed shingle arrays (r16-opt) — the jaccard_verify contract: int64
    # intersect/union, sizes exact absent an in-pair xxhash64 collision
    sh = tracked_persist(  # self-joined below: shingle once, not twice
        docs.select(
            "doc_id",
            F.transform(TX.shingles(F.col("text")), lambda x: F.xxhash64(x)).alias("sh"),
        )
    )
    a, b = sh.alias("a"), sh.alias("b")
    jac = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))) / F.size(
        F.array_union(F.col("a.sh"), F.col("b.sh"))
    )
    return (
        cand.join(a, cand.id_a == F.col("a.doc_id"))
        .join(b, cand.id_b == F.col("b.doc_id"))
        .filter(jac >= 0.9)
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )


# Deterministic 1-in-10 doc subset for the SAMPLED cluster twins: the full
# recursive-CTE oracle is all-pairs over |documents| and grinds for 30+ min
# at sf0.1 (5 000 docs) — these twins restrict BOTH engine and oracle to
# doc_id % 10 == 0 so the local sf0.1 sweep can hash-check the cluster
# family end-to-end (r4 verdict item 4). The Spark side is the identical
# operator composition; only the input set shrinks.
_DUCK_SHINGLES_SAMPLED = """
    sdocs AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM sdocs),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3
               THEN list_transform(range(len(t) - 2),
                                   i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
               ELSE [] END) AS s
      FROM toks
    )
"""

_CLUSTER_SAMPLED_ORACLE = f"""
    WITH RECURSIVE {_DUCK_SHINGLES_SAMPLED},
    p AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(LEN(list_intersect(a.s, b.s)) AS DOUBLE)
            / LEN(list_distinct(list_concat(a.s, b.s))) >= 0.9
    ),
    edges AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
    reach(node, root) AS (
      SELECT doc_id, doc_id FROM sdocs
      UNION
      SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node
    )
    SELECT CAST(node AS BIGINT) AS doc_id,
           CAST(MIN(root) AS BIGINT) AS component
    FROM reach GROUP BY node ORDER BY doc_id
    """


def _sampled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)


@register("dedup_cluster_components_sampled", oracle=_CLUSTER_SAMPLED_ORACLE)
def q_dedup_cluster_components_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+ sweep twin of ``dedup_cluster_components`` on the deterministic
    doc_id %% 10 subset — same exact prefix-filter + verify + min-label CC
    composition, but the recursive-CTE oracle stays tractable at sf0.1, so
    the scale sweep hash-checks this family instead of skipping it."""
    from ..operators.dedup import prefix_filter_pairs

    docs = _sampled_docs(spark, sf_dir)
    cand = prefix_filter_pairs(docs, "doc_id", "text", threshold=0.9)
    sh = docs.select("doc_id", TX.shingles(F.col("text")).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    jac = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))) / F.size(
        F.array_union(F.col("a.sh"), F.col("b.sh"))
    )
    pairs = (
        cand.join(a, cand.id_a == F.col("a.doc_id"))
        .join(b, cand.id_b == F.col("b.doc_id"))
        .filter(jac >= 0.9)
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    comp = connected_components(pairs, vertices=docs.select("doc_id"))
    return comp.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("comp").cast("long").alias("component"),
    ).orderBy("doc_id")


@register("dedup_cluster_components_star_sampled", oracle=_CLUSTER_SAMPLED_ORACLE)
def q_dedup_cluster_components_star_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep twin of ``dedup_cluster_components_star`` (large/small-star
    contraction) on the doc_id %% 10 subset — triangulates BOTH iterative
    CC algorithms against the recursive CTE at sf0.1."""
    from ..operators.dedup import jaccard_verify, prefix_filter_pairs
    from ..operators.graph import connected_components_star

    docs = _sampled_docs(spark, sf_dir)
    cand = prefix_filter_pairs(docs, "doc_id", "text", threshold=0.9)
    pairs = jaccard_verify(docs, cand, "doc_id", "text", threshold=0.9).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = connected_components_star(pairs, vertices=docs.select("doc_id"))
    return comp.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("comp").cast("long").alias("component"),
    ).orderBy("doc_id")


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH d AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), s AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) AS scale
      FROM d
    )
    SELECT vec_id, ROUND(scale, 6) AS scale,
           md5(array_to_string(
             list_transform(e, x -> CAST(ROUND(x / NULLIF(scale, 0) * 127) AS INT)),
             ',')) AS q_digest,
           CAST(list_sum(
             list_transform(e, x -> CAST(ROUND(x / NULLIF(scale, 0) * 127) AS INT))
           ) AS BIGINT) AS q_sum
    FROM s ORDER BY vec_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+ — symmetric per-vector int8 quantization (scale = max |x|,
    q = round(x/scale·127)): 4× smaller vectors for the ANN index, the
    standard storage layout at 100 TB. Pure higher-order array functions —
    map-only plan, zero shuffle, whole-stage codegen.

    The oracle compares an md5 digest of the quantized array (plus its sum)
    instead of the raw list so the check is representation-independent;
    floats are widened to double on both sides so the rounding arithmetic
    is bit-identical.
    """
    emb = load(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(e, F.abs))
    quant = F.transform(e, lambda x: F.round(x / F.nullif(scale, F.lit(0)) * 127).cast("int"))
    return (
        emb.select(
            "vec_id",
            F.round(scale, 6).alias("scale"),
            F.md5(F.array_join(quant, ",")).alias("q_digest"),
            F.aggregate(quant, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("q_sum"),
        )
        .orderBy("vec_id")
    )


@register(
    "dedup_incremental_batch",
    oracle="""
    WITH corpus AS (
      SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 5 <> 0
    ), batch AS (
      SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 5 = 0
    )
    SELECT b.doc_id, CAST(c.fp IS NOT NULL AS BOOLEAN) AS is_dup
    FROM batch b LEFT JOIN corpus c ON b.fp = c.fp
    ORDER BY b.doc_id
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1+ — incremental dedup: flag arriving docs whose exact fingerprint
    already exists in the standing corpus (the per-batch production path —
    never re-cluster the whole corpus, just probe it). Fingerprints shrink
    the corpus side to one md5 per distinct text before the join; at 100 TB
    the probe becomes a bloom-filter pre-pass (sources/bucketing + runtime
    bloom config) with this exact join as the verifier.

    The corpus/batch split is simulated by doc_id modulo on the one
    documents fixture.
    """
    docs = load(spark, sf_dir, "documents")
    corpus = (
        docs.filter(F.col("doc_id") % 5 != 0)
        .select(F.md5("text").alias("fp"))
        .distinct()
        .withColumn("seen", F.lit(True))
    )
    batch = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.md5("text").alias("fp")
    )
    return (
        batch.join(corpus, "fp", "left")
        .select("doc_id", F.coalesce("seen", F.lit(False)).alias("is_dup"))
        .orderBy("doc_id")
    )


@register(
    "corpus_mix_temperature",
    oracle="""
    WITH caps AS (
      SELECT source, CAST(CEIL(SQRT(COUNT(*)) * 4) AS BIGINT) AS cap
      FROM documents GROUP BY source
    ), ranked AS (
      SELECT d.doc_id, d.source, c.cap,
             ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY md5('mix:' || CAST(d.doc_id AS VARCHAR)), d.doc_id
             ) AS rn
      FROM documents d JOIN caps c ON d.source = c.source
    )
    SELECT doc_id, source FROM ranked WHERE rn <= cap
    ORDER BY source, doc_id
    """,
)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ — temperature-flattened corpus mixing: resample each source to
    ~4·sqrt(n) docs (temperature α=0.5), so over-represented sources shrink
    relatively and small sources keep most of their data — the standard
    rebalancing step before training-mix assembly. Selection is the same
    deterministic salted-hash rank as stratified_sample_per_lang, so the
    mix is reproducible under any partitioning.

    Caps are a per-source count aggregate (tiny) broadcast back; the rank
    is one shuffle on source.
    """
    docs = load(spark, sf_dir, "documents")
    caps = docs.groupBy("source").agg(
        F.ceil(F.sqrt(F.count(F.lit(1))) * 4).cast("long").alias("cap")
    )
    rank_key = F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(rank_key, "doc_id")
    return (
        docs.join(F.broadcast(caps), "source")
        .select("doc_id", "source", F.row_number().over(w).alias("rn"), "cap")
        .filter(F.col("rn") <= F.col("cap"))
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    )


def _packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared packing plan: (source, doc_id, text, n_tokens, seq_id)."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    toks = docs.select(
        "source", "doc_id", "text", TX.token_count("text").cast("long").alias("n_tokens")
    )
    return toks.withColumn(
        "seq_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 1024.0).cast("long"),
    )


#: shared packing CTE text — ONE definition of the first-fit 1024-token
#: rule for every packing oracle (pack_sequences_1024 / _materialize /
#: pack_efficiency_report here, pack_docs_histogram in llm_ext12), the
#: twin of the Spark-side ``_packed`` helper. The _CCNET_CTES lesson
#: (llm_ext5): a packing-rule change edits exactly two places — this
#: string and ``_packed`` — instead of five hand-synchronized copies.
_PACK_CTES = """
    toks AS (
      SELECT source, doc_id, text,
             CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), cum AS (
      SELECT source, doc_id, text, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
                         - n_tokens) / 1024.0) AS BIGINT) AS seq_id
      FROM toks
    )"""


@register(
    "pack_sequences_1024",
    oracle=f"""
    WITH {_PACK_CTES}
    SELECT source, doc_id, n_tokens, seq_id
    FROM cum ORDER BY source, doc_id
    """,
)
def pack_sequences_1024(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ — sequence packing: concatenate whole documents into ~1024-token
    training sequences. seq_id = floor(cumulative-tokens-before-this-doc /
    budget): first-fit-in-order packing, each doc assigned exactly once, a
    doc straddling a boundary opens the next sequence.

    The cumulative sum is windowed PER SOURCE SHARD, never globally — a
    global ORDER BY would funnel 100 TB through one task. Each shard packs
    independently (one shuffle on `source`); shard-internal order is the
    stable doc_id, so output is deterministic. Downstream the trainer does
    groupBy(source, seq_id) + concat_ws to materialize sequences
    (see pack_sequences_materialize).
    """
    return _packed(spark, sf_dir).select(
        "source", "doc_id", "n_tokens", "seq_id"
    ).orderBy("source", "doc_id")


@register(
    "pack_sequences_materialize",
    oracle=f"""
    WITH {_PACK_CTES}
    SELECT source, seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
           string_agg(text, ' ' ORDER BY doc_id) AS seq_text
    FROM cum GROUP BY source, seq_id ORDER BY source, seq_id
    """,
)
def pack_sequences_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ — materialize the packed bins: one output row per training
    sequence, docs concatenated IN doc_id ORDER. Spark has no ordered
    string_agg, so the order is pinned by collecting (doc_id, text) structs,
    sort_array on the struct (lexicographic = doc_id first), then
    concat_ws over the projected texts — deterministic regardless of
    partitioning. The groupBy key (source, seq_id) rides the same shuffle
    layout the packing window produced.
    """
    packed = _packed(spark, sf_dir)
    return (
        packed.groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s.text,
                ),
            ).alias("seq_text"),
        )
        .orderBy("source", "seq_id")
    )


@register(
    "training_shard_assignment",
    oracle="""
    WITH k AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR) || ':shuffle:42') AS key
      FROM documents
    ),
    s AS (
      SELECT doc_id, key,
             CAST((strpos('0123456789abcdef', substr(key, 1, 1)) - 1) % 8 AS INT)
               AS shard
      FROM k
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY key, doc_id)
                AS BIGINT) AS pos
    FROM s
    """,
)
def training_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] assembly — global training-order shuffle into N shards: the
    "shuffle the corpus once, write shards, stream them in order" step
    every pretraining run does between assembly and the data loader.

    Deterministic seeded permutation with NO global sort: the shuffle key
    is md5(doc_id || seed); the shard is a hash bucket of the key (so
    shard membership needs no coordination — map-only), and the order
    WITHIN a shard is a window partitioned by shard, which parallelizes
    one-reducer-per-shard. Contrast with ntile()/row_number() over a
    global ORDER BY — the naive spec — which funnels the corpus through a
    single reducer. At 100 TB: repartition(shard) + sortWithinPartitions
    (key) + partitioned write — identical dataflow, shards = write tasks.

    Seed fixed at 42 so the oracle replays the permutation; 8 shards so
    every shard is non-trivially populated at sf0.001.
    """
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shuffle:42"))).alias(
            "__key"
        ),
    ).withColumn(
        "shard",
        ((F.expr("locate(substr(__key, 1, 1), '0123456789abcdef')") - 1) % 8).cast(
            "int"
        ),
    )
    w = Window.partitionBy("shard").orderBy("__key", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


@register(
    "pack_efficiency_report",
    oracle=f"""
    WITH {_PACK_CTES}, seqs AS (
      SELECT source, seq_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
      FROM cum GROUP BY source, seq_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_seqs,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(seq_tokens) AS BIGINT) AS total_tokens,
           CAST((SUM(seq_tokens) * 10000) // (COUNT(*) * 1024) AS BIGINT)
             AS fill_x1e4,
           CAST(MAX(seq_tokens) AS BIGINT) AS max_seq_tokens,
           CAST(MIN(seq_tokens) AS BIGINT) AS min_seq_tokens,
           CAST(COUNT(*) FILTER (WHERE seq_tokens > 1024) AS BIGINT)
             AS n_overfull
    FROM seqs GROUP BY source ORDER BY source
    """,
)
def q_pack_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ (r12) — the PACKING-EFFICIENCY audit: per source shard, how
    well the first-fit-in-order 1024-token packing fills its bins — bin
    count, docs, total tokens, mean fill as an exact fixed-point ratio
    ``(Σ tokens · 10⁴) // (bins · 1024)``, min/max bin load, and the
    count of overfull bins (a doc straddling the boundary opens the next
    bin, so a bin can exceed the budget — the trainer's truncation-vs-
    padding tradeoff made visible). This is the report a pipeline owner
    reads BEFORE a training run: fill → padding waste, overfull → how
    much truncation the straddle policy costs, per-source skew → shard
    imbalance.

    Plan at 100 TB: one more hash aggregate over the SHARED ``_packed``
    plan (same per-source window shuffle the packing itself rides — no
    global sort, the registered packing contract), then a |sources|-row
    readout. Everything is exact integer arithmetic; the fill ratio uses
    the shift-free nonnegative floor division both engines agree on.
    """
    packed = _packed(spark, sf_dir)
    seqs = packed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
    )
    return (
        seqs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_seqs"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("seq_tokens").cast("long").alias("total_tokens"),
            F.expr("CAST((SUM(seq_tokens) * 10000) DIV (COUNT(*) * 1024) AS BIGINT)")
            .alias("fill_x1e4"),
            F.max("seq_tokens").cast("long").alias("max_seq_tokens"),
            F.min("seq_tokens").cast("long").alias("min_seq_tokens"),
            F.sum((F.col("seq_tokens") > 1024).cast("long"))
            .cast("long")
            .alias("n_overfull"),
        )
        .orderBy("source")
    )
