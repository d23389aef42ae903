"""[EXT] curation round 4 — corpus-assembly operators a production
pretraining-data pipeline runs between dedup and packing (SURVEY.md §2.9
X4/X1; no reference citation exists — the citation is BASELINE.json's
LLM-data mandate).

Three operators, each with an exact DuckDB oracle:

- ``quota_sample_per_source``  — per-domain document caps (the "no source
  may dominate the mixture" rule every corpus spec has). Deterministic
  hash-priority sampling, salted two-phase top-K so a hot domain cannot
  hot-spot one reducer.
- ``dedup_keep_best``          — near-dup clustering composed with
  canonical selection: keep the highest-quality member of each cluster
  (here: most characters), not the arbitrary min-id.
- ``dedup_normalized_text``    — exact dedup AFTER text normalization
  (casefold + whitespace collapse): catches trivially-reformatted copies
  that byte-exact fingerprints miss, at map-only cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators.graph import connected_components
from ..caching import tracked_persist
from ..registry import register
from ..sources.tables import load

# restated from llm_ext2 (same reason as there: each oracle must be a
# self-contained SQL string the driver can run verbatim)
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

# small enough to BIND on the fixtures (20 sources × 25 docs at sf0.01), so
# the truncation boundary itself is oracle-checked, not just the pass-through
_QUOTA = 10


@register(
    "quota_sample_per_source",
    oracle=f"""
    WITH pri AS (
      SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS pri
      FROM documents
    ),
    r AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY pri, doc_id) AS rn
      FROM pri
    )
    SELECT source, CAST(doc_id AS BIGINT) AS doc_id
    FROM r WHERE rn <= {_QUOTA}
    ORDER BY source, doc_id
    """,
)
def q_quota_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ — per-source document quota (domain caps): keep at most N docs
    per source, chosen by a DETERMINISTIC hash priority (md5 of the doc id),
    so the sample is reproducible across runs/engines and unbiased by
    ingestion order — the standard "cap crawl-dump domination" rule in
    corpus mixing specs.

    Scale shape: sources are FEW and HOT by construction (a per-key window
    over `source` is exactly the skewed-window case), so the top-K is the
    salted two-phase pattern — phase 1 ranks within (source, salt) buckets
    and keeps K per bucket, phase 2 ranks the surviving ≤ K·32 rows per
    source. No reducer ever sorts a whole domain; both phases are exact
    (every global top-K row is in its bucket's top-K).
    """
    docs = load(spark, sf_dir, "documents")
    pri = docs.select(
        "source", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("pri")
    )
    rank_cols = [F.col("pri"), F.col("doc_id")]
    wlocal = Window.partitionBy(
        "source", F.pmod(F.xxhash64("doc_id"), F.lit(32))
    ).orderBy(*rank_cols)
    wglob = Window.partitionBy("source").orderBy(*rank_cols)
    return (
        pri.withColumn("ln", F.row_number().over(wlocal))
        .filter(F.col("ln") <= _QUOTA)
        .withColumn("rn", F.row_number().over(wglob))
        .filter(F.col("rn") <= _QUOTA)
        .select("source", F.col("doc_id").cast("long").alias("doc_id"))
        .orderBy("source", "doc_id")
    )


@register(
    "dedup_keep_best",
    # inverted-index edge generation — identical pair set, parallelizable
    # (see dedup_cluster_components in llm_ext2.py)
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
    ),
    comp AS (SELECT node AS doc_id, MIN(root) AS component FROM reach GROUP BY node),
    ranked AS (
      SELECT c.component, d.doc_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, d.doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY c.component) AS n_docs
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT CAST(component AS BIGINT) AS component,
           CAST(doc_id AS BIGINT) AS kept_doc_id,
           CAST(n_chars AS BIGINT) AS kept_chars,
           CAST(n_docs AS BIGINT) AS n_docs
    FROM ranked WHERE rn = 1 ORDER BY component
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+ — near-dup clustering composed with CANONICAL SELECTION: inside
    each ≥0.9-Jaccard component keep the doc with the most characters
    (tie-break min doc_id), not the arbitrary min-id member. This is what
    production dedup actually ships — dropping the truncated mirror and
    keeping the full article — and it exercises the cluster → join-back →
    per-cluster argmax composition end to end.

    Plan: exact prefix-filtered pair generation (equi-shuffles only, 100%
    recall at the threshold) → one-job-per-round connected components →
    broadcast-size join back to documents → per-component row_number.
    Cluster sizes are near-dup groups (tiny), so the final window has no
    skew; the heavy lifting stays in the pair join, which is bounded by the
    prefix filter.
    """
    from ..operators.dedup import prefix_filter_pairs

    docs = load(spark, sf_dir, "documents")
    cand = prefix_filter_pairs(docs, "doc_id", "text", threshold=0.9)
    sh = tracked_persist(  # self-joined below: shingle once, not twice
        docs.select("doc_id", TX.shingles(F.col("text")).alias("sh"))
    )
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
    w = Window.partitionBy("component").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        comp.select(F.col("node").alias("doc_id"), F.col("comp").alias("component"))
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_docs", F.count(F.lit(1)).over(Window.partitionBy("component")))
        .filter(F.col("rn") == 1)
        .select(
            F.col("component").cast("long").alias("component"),
            F.col("doc_id").cast("long").alias("kept_doc_id"),
            F.col("n_chars").cast("long").alias("kept_chars"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
        .orderBy("component")
    )


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


@register(
    "dedup_keep_best_sampled",
    oracle=f"""
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
    ),
    comp AS (SELECT node AS doc_id, MIN(root) AS component FROM reach GROUP BY node),
    ranked AS (
      SELECT c.component, d.doc_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, d.doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY c.component) AS n_docs
      FROM comp c JOIN sdocs d ON d.doc_id = c.doc_id
    )
    SELECT CAST(component AS BIGINT) AS component,
           CAST(doc_id AS BIGINT) AS kept_doc_id,
           CAST(n_chars AS BIGINT) AS kept_chars,
           CAST(n_docs AS BIGINT) AS n_docs
    FROM ranked WHERE rn = 1 ORDER BY component
    """,
)
def q_dedup_keep_best_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep twin of ``dedup_keep_best`` on the deterministic doc_id %% 10
    subset (see llm_ext2's sampled cluster twins): the recursive-CTE +
    per-component argmax oracle stays tractable at sf0.1, so the scale
    sweep hash-checks cluster→canonical selection instead of skipping it."""
    from ..operators.dedup import prefix_filter_pairs

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
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
    w = Window.partitionBy("component").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        comp.select(F.col("node").alias("doc_id"), F.col("comp").alias("component"))
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_docs", F.count(F.lit(1)).over(Window.partitionBy("component")))
        .filter(F.col("rn") == 1)
        .select(
            F.col("component").cast("long").alias("component"),
            F.col("doc_id").cast("long").alias("kept_doc_id"),
            F.col("n_chars").cast("long").alias("kept_chars"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
        .orderBy("component")
    )


@register(
    "dedup_normalized_text",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_id
    FROM documents
    GROUP BY 1
    ORDER BY fp
    """,
)
def q_dedup_normalized_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1+ — exact dedup after TEXT NORMALIZATION (casefold + whitespace
    collapse + trim): the cheapest rung of the dedup ladder above byte-exact
    hashing — catches re-wrapped/re-cased copies at map-only cost before the
    expensive MinHash tiers run. One hash aggregate, partial map-side
    combine, no data movement beyond the fingerprint groupBy.
    """
    docs = load(spark, sf_dir, "documents")
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " ")))
    return (
        docs.groupBy(fp.alias("fp"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("canonical_id"),
        )
        .orderBy("fp")
    )


#: SQL twin of operators.similarity.resolve_cell_count(k="auto",
#: target_cell_size=64): the oracle derives the cell count from the SAME
#: rule the engine resolves, so auto-k queries replay without a Python-side
#: count leaking into the oracle text.
AUTO_K_SQL = (
    "(SELECT GREATEST(4, LEAST(1048576, CAST(CEIL(COUNT(*) / 64.0) AS BIGINT)))"
    " FROM embeddings)"
)


def _semdedup_assign_cte(assign_top: int, k_sql: str = "8", keyword: str = "WITH") -> str:
    """The shared CTE prefix — fixed-point hash centroids + top-m
    nearest-centroid assignment (mirrors operators.similarity
    build_hash_centroids / nearest_centroid). Factored (r8) so the
    SemDeDup pair oracles AND the kNN-graph oracle (llm_ext7) replay ONE
    assignment text and cannot drift. ``k_sql`` is the cell-count
    expression — a literal for the fixed-k flagships, ``AUTO_K_SQL`` for
    the auto-k twins (r10). ``keyword`` lets a composition that appends a
    recursive CTE open the block with ``WITH RECURSIVE`` (ADVICE r11: a
    parameter instead of substring surgery on generated SQL)."""
    return f"""
    {keyword} n AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v,
             SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    dims AS (
      SELECT vec_id % {k_sql} AS cid, d.dim AS dim,
             CAST(FLOOR(v[d.dim] * 10000000.0) AS BIGINT) AS sv
      FROM n, (SELECT UNNEST(range(1, 65)) AS dim) d
    ),
    cstat AS (SELECT cid, dim, SUM(sv) AS s, COUNT(*) AS c FROM dims GROUP BY cid, dim),
    cvec AS (
      SELECT cid, LIST(s / (c * 10000000.0) ORDER BY dim) AS cv
      FROM cstat GROUP BY cid
    ),
    cent AS (SELECT cid, cv, SQRT(LIST_SUM(LIST_TRANSFORM(cv, x -> x * x))) AS cn FROM cvec),
    scored AS (
      SELECT n.vec_id, n.v, n.nrm, c.cid,
             ROUND(LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> n.v[i] * c.cv[i]))
                   / (n.nrm * c.cn), 4) AS cos_c
      FROM n CROSS JOIN cent c
    ),
    assign AS MATERIALIZED (
      SELECT vec_id, v, nrm, cid AS cluster
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY cos_c DESC, cid) AS rn
            FROM scored)
      WHERE rn <= {assign_top}
    )"""


def _semdedup_oracle(assign_top: int, k_sql: str = "8") -> str:
    """SemDeDup oracle, parameterized by the per-vector assignment count
    (r7): top-1 is classic SemDeDup; top-2 is the boundary-recall variant.
    The pair aggregate (GROUP BY pair, MIN over identical values) is an
    identity at top-1 and the duplicate-cell collapse at top-2, so ONE
    template serves both and cannot drift. ``k_sql``: see
    ``_semdedup_assign_cte``."""
    return f"""
    {_semdedup_assign_cte(assign_top, k_sql)},
    p AS (
      SELECT MIN(a.cluster) AS cluster, a.vec_id AS id_a, b.vec_id AS id_b,
             MIN(ROUND(LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> a.v[i] * b.v[i]))
                   / (a.nrm * b.nrm), 4)) AS cos_sim
      FROM assign a JOIN assign b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    )
    SELECT cluster, id_a, id_b, cos_sim FROM p
    WHERE cos_sim >= 0.4
    ORDER BY cluster, id_a, id_b
    """


@register(
    "semdedup_cluster_pairs",
    oracle=_semdedup_oracle(1),
)
def q_semdedup_cluster_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+ — SemDeDup (Abbas et al. 2023): semantic near-dup pairs found
    WITHIN nearest-centroid clusters only, the shape that replaces the
    O(n²) all-pairs cosine join with Σ|cluster|² ≈ n²/k work. Centroids
    are FIXED-k hash-bucket means (k=8, fixed-point integer sums so both
    engines compute bit-identical centroids regardless of aggregation
    order) — the centroid table is O(k) and never grows with the corpus,
    and assignment is one broadcast + one max_by aggregate (no per-vector
    window). The exact all-pairs twin (embedding_cosine_near_dups) is the
    recall ground truth (see tests/test_dedup_similarity.py).
    """
    from ..operators.similarity import semdedup_pairs

    emb = load(spark, sf_dir, "embeddings")
    return semdedup_pairs(emb, threshold=0.4, k=8)


@register(
    "semdedup_cluster_pairs_top2",
    oracle=_semdedup_oracle(2),
)
def q_semdedup_cluster_pairs_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+ — SemDeDup with TOP-2-centroid assignment (r7): the standard
    boundary-recall fix — each vector joins its two nearest cells, so a
    borderline pair straddling one boundary is still found when the two
    vectors share EITHER cell. Assignment is one collect_list(k)+sort+
    slice aggregate (k-bounded, map-side combinable, no per-vector
    window); the within-cell join stays the salted Σ|cluster|² shape at
    ≈ 4× the top-1 cost; pairs found in both shared cells collapse
    through one (id_a, id_b) aggregate. Same generated oracle as
    ``semdedup_cluster_pairs`` with ``rn <= 2`` — the two entries cannot
    drift. Recall vs the exact all-pairs twin is measured at two scales
    in tests/test_recall_scales.py.
    """
    from ..operators.similarity import semdedup_pairs

    emb = load(spark, sf_dir, "embeddings")
    return semdedup_pairs(emb, threshold=0.4, k=8, assign_top=2)


@register(
    "semdedup_cluster_pairs_auto_k",
    oracle=_semdedup_oracle(1, k_sql=AUTO_K_SQL),
)
def q_semdedup_cluster_pairs_auto_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+ (r10) — SemDeDup with the AUTO cell count, the scale-safe plan
    (VERDICT r9 item 5): ``k = max(4, ceil(n / 64))`` from
    ``resolve_cell_count``, so cell COUNT grows with the corpus and cell
    SIZE stays pinned at the 64-vector target — the within-cell Σ|cell|²
    candidate join is O(n·64), linear in n, where the k=8 flagship (kept
    for oracle-replay continuity and as the recall baseline) silently goes
    quadratic past fixture scale. The oracle derives the SAME count in SQL
    (``AUTO_K_SQL``), so the twin replays end-to-end with no Python count
    in the oracle text. The linearity bound itself is pinned across a 10×
    corpus growth in tests/test_recall_scales.py
    (test_auto_cell_count_bounds_candidates_across_scales).
    """
    from ..operators.similarity import semdedup_pairs

    emb = load(spark, sf_dir, "embeddings")
    return semdedup_pairs(emb, threshold=0.4, k="auto")


@register(
    "exact_span_dedup_20tok",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g0 AS (SELECT doc_id, UNNEST(range(len(t) - 19)) AS pos, t
           FROM toks WHERE len(t) >= 20),
    g AS (SELECT doc_id, pos,
                 ARRAY_TO_STRING(list_slice(t, pos + 1, pos + 20), ' ') AS gram
          FROM g0),
    m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
    r AS (SELECT doc_a, doc_b, pa, pb, pa - pb AS diff,
                 pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                         ORDER BY pa) AS grp
          FROM m)
    SELECT doc_a, doc_b,
           CAST(MIN(pa) AS BIGINT) AS a_start,
           CAST(MIN(pb) AS BIGINT) AS b_start,
           CAST(MAX(pa) - MIN(pa) + 20 AS BIGINT) AS span_tokens
    FROM r GROUP BY doc_a, doc_b, diff, grp
    """,
)
def q_exact_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 — exact-substring span dedup (Lee et al. 2021): every maximal
    exact token span of >= 20 tokens shared between two documents, with
    0-based start offsets on both sides. The operator the "remove exact
    duplicate spans corpus-wide" pretraining step needs — distinct from
    contamination_13gram (train-vs-benchmark overlap FLAG) in that it
    returns the aligned spans themselves, merged to maximal length via
    gaps-and-islands, ready for span excision. 20 tokens here because the
    fixture's docs have a 56-token median (Lee et al. use 50 BPE tokens;
    the width is a parameter of :func:`exact_span_matches`). Since r6 the
    self-join key is xxhash64(gram) with a verify against the token arrays
    (8-byte shuffle key, zero gram strings shuffled) — the oracle's
    gram-string join replays the identical RESULT because collisions are
    filtered exactly.
    """
    from ..operators.dedup import exact_span_matches

    return exact_span_matches(load(spark, sf_dir, "documents"), min_tokens=20)


@register(
    "dedup_excise_spans_20tok",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g0 AS (SELECT doc_id, UNNEST(range(len(t) - 19)) AS pos, t
           FROM toks WHERE len(t) >= 20),
    g AS (SELECT doc_id, pos,
                 ARRAY_TO_STRING(list_slice(t, pos + 1, pos + 20), ' ') AS gram
          FROM g0),
    m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
    r AS (SELECT doc_a, doc_b, pa, pb, pa - pb AS diff,
                 pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                         ORDER BY pa) AS grp
          FROM m),
    spans AS (
      SELECT doc_a, doc_b, MIN(pa) AS a_start, MIN(pb) AS b_start,
             MAX(pa) - MIN(pa) + 20 AS span_tokens
      FROM r GROUP BY doc_a, doc_b, diff, grp
    ),
    removed AS (
      SELECT DISTINCT doc_id, pos FROM (
        SELECT doc_b AS doc_id,
               UNNEST(generate_series(b_start, b_start + span_tokens - 1)) AS pos
        FROM spans)
    ),
    tp AS (
      SELECT doc_id, pos, t[pos + 1] AS tok FROM (
        SELECT doc_id, UNNEST(range(len(t))) AS pos, t FROM toks)
    ),
    j AS (
      SELECT tp.doc_id, tp.pos, tp.tok, rm.pos IS NOT NULL AS cut
      FROM tp LEFT JOIN removed rm
        ON tp.doc_id = rm.doc_id AND tp.pos = rm.pos
    )
    SELECT doc_id,
           COALESCE(ARRAY_TO_STRING(LIST(tok ORDER BY pos) FILTER (WHERE NOT cut), ' '),
                    '') AS clean_text,
           CAST(COUNT(*) FILTER (WHERE cut) AS BIGINT) AS n_removed_tokens
    FROM j GROUP BY doc_id
    """,
)
def q_dedup_excise_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 — the excision step of Lee et al. 2021 substring dedup: for
    every duplicated >= 20-token gram the lowest-id document keeps its
    copy, every other occurrence has the covered range cut out
    (overlapping losses deduplicated by position), and every document
    comes back with its surviving text reassembled in order plus the
    removed-token count. Runs the CANONICAL-representative path
    (:func:`span_removal_positions`, r6): per gram one groupBy emits the
    O(df) non-keeper occurrences — never the O(df²) pair set — so viral
    boilerplate (one gram in 10⁶ docs) cannot blow up the plan. The oracle
    derives the same removal set pairwise (equivalence proven in
    span_removal_positions' docstring and pinned by
    tests/test_dedup_spans.py); span DETECTION is checked by
    exact_span_dedup_20tok, this checks REMOVAL semantics."""
    from ..operators.dedup import excise_span_duplicates

    return excise_span_duplicates(load(spark, sf_dir, "documents"), min_tokens=20)
