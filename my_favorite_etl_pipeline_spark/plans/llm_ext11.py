"""[EXT] curation round 11 — semantic decontamination, token-budget
selection, and centrality-based canonical dedup (SURVEY.md §2.9 X2/X4; no
reference citation exists — the citation is BASELINE.json's LLM-data
mandate).

Three operators a production training-data pipeline runs between dedup and
assembly, each built on machinery this repo already oracle-checks:

- ``semantic_decontaminate_topk`` — EMBEDDING-level train/eval
  contamination (the semantic sibling of the 13-gram exact checks): for
  every train document, the nearest held-out document by quantized-integer
  cosine within its centroid cell; flagged when similarity crosses the
  near-dup threshold. N-gram decontamination misses paraphrases; modern
  curation (e.g. the FineWeb/DCLM-style eval-overlap audits) adds exactly
  this embedding pass.
- ``token_budget_select`` — corpus selection under a TOKEN BUDGET: rank
  documents by an integer quality-per-token key and keep the prefix that
  fits 1/4 of the corpus token mass. This is the "we can only train on X
  tokens, which documents?" step; the engine-side plan is the two-phase
  histogram walk (NO global sort — the exact_percentiles_two_phase
  precedent) while the oracle replays the definition as one window cumsum.
- ``dedup_canonical_pagerank`` — near-dup cluster canonicalization by
  GRAPH CENTRALITY: connected components over the ≥0.9-Jaccard near-dup
  graph (the dedup_cluster_components machinery) pick their keeper as the
  member with the highest kNN-graph PageRank (the knn_graph_pagerank
  trajectory) instead of lowest-id — "keep the most central exemplar,
  drop satellites", the cluster-representative selection the dedup
  literature actually prescribes. Composes two independently
  oracle-checked trajectories into one drop-list.

Determinism contract (registry header): every ranked/hashed value is
integer (quantized cosine, integer ratio keys, integer PageRank
micro-units); ties break on ids; floor divisions ride nonnegative
operands only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import tracked_persist
from ..functions import text as TX
from ..registry import register
from ..sources.tables import load
from .llm_ext4 import _semdedup_assign_cte
from .llm_ext7 import _QASSIGN_CTE, _int_cos_sql

# ---------------------------------------------------------------------------
# semantic_decontaminate_topk

_SD_TAU = 3000  # flag threshold, integer ten-thousandths. 0.30 flags 36
# of 458 train docs at sf0.01 on the random fixture (0.4, the semdedup
# pair threshold, flags only 2 — too thin to discriminate hash drift);
# a production run with real embeddings sets ~0.95

# held-out predicate on vec_id — numerically identical to llm_ext3's
# _BENCH_PRED_SQL on doc_id (the tables share the id space), so the
# n-gram and semantic decontamination passes audit the SAME eval slice
_SD_EVAL_SQL = "substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '0'"


def _sd_eval_pred() -> F.Column:
    return F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1) == "0"


@register(
    "semantic_decontaminate_topk",
    oracle=f"""
    {_semdedup_assign_cte(1)},
    {_QASSIGN_CTE},
    ev AS (SELECT * FROM qassign WHERE {_SD_EVAL_SQL}),
    tr AS (SELECT * FROM qassign WHERE NOT ({_SD_EVAL_SQL})),
    sc AS (
      SELECT t.vec_id AS doc_id, e.vec_id AS eval_id,
             {_int_cos_sql("t.q", "t.s", "e.q", "e.s")} AS cos_x1e4
      FROM tr t JOIN ev e ON t.cluster = e.cluster
    ),
    best AS (
      SELECT doc_id, eval_id, cos_x1e4,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY cos_x1e4 DESC, eval_id) AS rn
      FROM sc
    )
    SELECT doc_id, eval_id AS nearest_eval_id, cos_x1e4
    FROM best WHERE rn = 1 AND cos_x1e4 >= {_SD_TAU} ORDER BY doc_id
    """,
)
def q_semantic_decontaminate_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ (r11) — SEMANTIC decontamination: for every train document,
    its nearest held-out (benchmark-designated) document by cosine within
    its centroid cell; emitted when similarity ≥ {_SD_TAU}/10⁴. The
    embedding-level sibling of ``contamination_13gram`` /
    ``decontaminate_bloom_13gram`` over the SAME eval slice (shared md5
    id predicate): exact n-gram checks miss paraphrased or re-templated
    eval leakage, which lands exactly here. Scores are the r11
    pure-integer quantized cosine (int_cos_x1e4) — the first NEW operator
    born onto the graph family's float-free hash contract.

    Plan at 100 TB: the eval side of a real audit is tiny (an eval suite,
    ≤ 10⁵ docs) and broadcasts whole; here both sides ride the shared
    nearest-centroid cells so the candidate join is the within-cell
    equi-shuffle (Σ|cell|·|eval∩cell| rows, LINEAR in n via the auto-k
    cell sizing the family already pins), never all-pairs. Per-train
    argmax is ONE max_by hash aggregate — no per-row window. Threshold +
    id tie-break keep both engines cutting the identical flag list.
    """
    from ..operators.similarity import (
        int_cos_x1e4,
        nearest_centroid,
        quantize_vectors,
    )

    emb = load(spark, sf_dir, "embeddings")
    qa = quantize_vectors(nearest_centroid(emb, k=8))
    ev = qa.filter(_sd_eval_pred()).select(
        F.col("cluster"),
        F.col("vec_id").alias("eval_id"),
        F.col("__q").alias("eq"),
        F.col("__s").alias("es"),
    )
    tr = qa.filter(~_sd_eval_pred()).select(
        F.col("cluster"),
        F.col("vec_id").alias("doc_id"),
        F.col("__q").alias("tq"),
        F.col("__s").alias("ts"),
    )
    sc = tr.join(ev, "cluster").select(
        "doc_id",
        "eval_id",
        int_cos_x1e4(F.col("tq"), F.col("ts"), F.col("eq"), F.col("es")).alias(
            "cos_x1e4"
        ),
    )
    best = sc.groupBy("doc_id").agg(
        F.max_by(
            F.struct(F.col("eval_id"), F.col("cos_x1e4")),
            F.struct(F.col("cos_x1e4").alias("c"), (-F.col("eval_id")).alias("ne")),
        ).alias("b")
    )
    return (
        best.select(
            "doc_id",
            F.col("b.eval_id").alias("nearest_eval_id"),
            F.col("b.cos_x1e4").alias("cos_x1e4"),
        )
        .filter(F.col("cos_x1e4") >= _SD_TAU)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# token_budget_select

_TB_DIV = 4  # budget = total corpus tokens // _TB_DIV


@register(
    "token_budget_select",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sc AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
             (CAST(len(list_distinct(t)) AS BIGINT) * 1000000) // len(t) AS ratio
      FROM toks
    ),
    b AS (SELECT SUM(n_tokens) // {_TB_DIV} AS budget FROM sc),
    cum AS (
      SELECT doc_id, n_tokens, ratio,
             SUM(n_tokens) OVER (ORDER BY ratio DESC, doc_id) AS c
      FROM sc
    )
    SELECT doc_id, n_tokens, CAST(ratio AS BIGINT) AS ratio_x1e6,
           CAST(c AS BIGINT) AS cum_tokens
    FROM cum CROSS JOIN b WHERE c <= budget ORDER BY doc_id
    """,
)
def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ (r11) — corpus selection under a TOKEN BUDGET: keep the
    highest-quality prefix of the corpus that fits 1/{_TB_DIV} of its
    token mass, quality keyed by the integer lexical-diversity ratio
    (distinct_tokens·10⁶ div tokens — the quality_filter_above_median
    metric made an exact integer). Kept set = every document whose
    inclusive running token total over the (ratio DESC, doc_id) order
    stays within budget — the "train on X tokens, which documents?" step
    between filtering and assembly.

    Plan at 100 TB (the oracle replays the DEFINITION as one global
    window cumsum; the engine runs the NO-GLOBAL-SORT two-phase shape,
    exact_percentiles_two_phase precedent): phase 1 aggregates per-ratio
    token sums (≤ 10⁶+1 keys — model-sized, one hash agg) and the driver
    walks them descending to find the boundary ratio and every
    fully-kept ratio's prefix offset; phase 2 windows ONLY within ratio
    partitions (near-uniform keys; no global order anywhere) and adds
    the broadcast offsets back. Values are identical by construction:
    the global cumsum decomposes exactly into (offset of ratios above) +
    (within-ratio cumsum). Everything integer; ties break on doc_id.
    """
    docs = load(spark, sf_dir, "documents")
    t = TX.tokens("text")
    sc = tracked_persist(
        docs.select(
            "doc_id",
            F.size(t).cast("long").alias("n_tokens"),
            F.expr(
                "(CAST(size(array_distinct(split(text, ' '))) AS BIGINT) * 1000000)"
                " DIV size(split(text, ' '))"
            ).alias("ratio"),
        )
    )
    # phase 1: model-sized per-ratio histogram → driver walk
    hist = sorted(
        (
            (r.ratio, r.toks)
            for r in sc.groupBy("ratio").agg(F.sum("n_tokens").alias("toks")).collect()
        ),
        key=lambda x: -x[0],
    )
    budget = sum(v for _, v in hist) // _TB_DIV
    offsets = []  # (ratio, tokens consumed by strictly-higher ratios)
    cum = 0
    for ratio, toks in hist:
        offsets.append((ratio, cum))
        if cum + toks > budget:
            break  # boundary ratio: partially kept via the cum filter;
            # every ratio past it never enters `offsets`, so the inner
            # join below drops those docs wholesale (cannot fit)
        cum += toks
    off = spark.createDataFrame(offsets, "ratio long, offset long")
    # phase 2: within-ratio cumsum only (no global sort), offsets added back
    w = Window.partitionBy("ratio").orderBy("doc_id")
    kept = (
        sc.join(F.broadcast(off), "ratio")
        .withColumn("cum_tokens", F.sum("n_tokens").over(w) + F.col("offset"))
        .filter(F.col("cum_tokens") <= F.lit(budget))
    )
    return kept.select(
        "doc_id",
        "n_tokens",
        F.col("ratio").alias("ratio_x1e6"),
        "cum_tokens",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# dedup_canonical_pagerank


def _canonical_oracle() -> str:
    from .llm_ext import _DUCK_SHINGLES
    from .llm_ext7 import _PR_ROUNDS, _pagerank_cte

    # one WITH block: the pagerank trajectory opens it with the RECURSIVE
    # keyword the reachability fixpoint needs (threaded parameter, ADVICE
    # r11), then the near-dup edge CTEs append after it (jp, not p — the
    # graph prefix already binds p)
    pr_cte = _pagerank_cte(recursive=True)
    return f"""
    {pr_cte},
    {_DUCK_SHINGLES},
    sizes AS (SELECT doc_id, LEN(s) AS n FROM sh),
    ex AS (SELECT doc_id, UNNEST(s) AS shingle FROM sh),
    inter AS (
      SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS c
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jp AS (
      SELECT u, v FROM inter
      JOIN sizes sa ON inter.u = sa.doc_id
      JOIN sizes sb ON inter.v = sb.doc_id
      WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.9
    ),
    uedges AS (SELECT u, v FROM jp UNION SELECT v, u FROM jp),
    reach(node, root) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.v, r.root FROM reach r JOIN uedges e ON e.u = r.node
    ),
    comp AS (SELECT node AS doc_id, MIN(root) AS component FROM reach GROUP BY node),
    members AS (
      SELECT c.component, c.doc_id, COALESCE(p.s, 0) AS s
      FROM comp c LEFT JOIN pr{_PR_ROUNDS} p ON p.node = c.doc_id
    ),
    ranked AS (
      SELECT component, doc_id, s,
             ROW_NUMBER() OVER (PARTITION BY component
                                ORDER BY s DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY component) AS n_members
      FROM members
    )
    SELECT CAST(component AS BIGINT) AS component,
           CAST(doc_id AS BIGINT) AS keep_id,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(s AS BIGINT) AS keep_pagerank_x1e6
    FROM ranked WHERE rn = 1 AND n_members >= 2 ORDER BY component
    """


@register("dedup_canonical_pagerank", oracle=_canonical_oracle())
def q_dedup_canonical_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+ (r11) — near-dup cluster CANONICALIZATION by graph centrality:
    connected components over the ≥0.9-Jaccard near-dup graph (the
    dedup_cluster_components machinery, shared edge generation) choose
    their keeper as the member with the highest kNN-graph PageRank
    (knn_graph_pagerank's exact-integer trajectory, shared helper) — ties
    and embedding-less members fall back to lowest-id, PageRank scores
    being ≥ 150 000 for every scored node. Emits one row per multi-member
    cluster: (component, keep_id, n_members, keep_pagerank_x1e6) — the
    "keep the most central exemplar, drop satellites" selection the dedup
    literature prescribes for cluster representatives, and the first
    entry composing TWO independently oracle-checked trajectories
    (reachability fixpoint + power iteration) in one hash contract.

    Plan at 100 TB: both inputs are existing scale-audited paths (the
    prefix-filtered ssjoin edge list + Pregel-style PageRank); this adds
    ONE id equi-join (components × scores, near-uniform keys) and one
    per-component max_by hash aggregate — output is cluster-sized, no new
    shuffle shape, no collect.
    """
    from ..operators.graph import connected_components
    from .llm_ext2 import near_dup_pairs_90
    from .llm_ext7 import pagerank_scores

    docs = load(spark, sf_dir, "documents")
    comp = connected_components(
        near_dup_pairs_90(docs), vertices=docs.select("doc_id")
    )
    pr = pagerank_scores(spark, sf_dir)
    members = comp.join(pr, comp.node == pr.vec_id, "left").select(
        F.col("comp").alias("component"),
        F.col("node").alias("doc_id"),
        F.coalesce(F.col("pagerank_x1e6"), F.lit(0)).cast("long").alias("s"),
    )
    best = members.groupBy("component").agg(
        F.max_by(
            F.struct(F.col("doc_id"), F.col("s")),
            F.struct(F.col("s").alias("c"), (-F.col("doc_id")).alias("nd")),
        ).alias("b"),
        F.count(F.lit(1)).alias("n_members"),
    )
    return (
        best.filter(F.col("n_members") >= 2)
        .select(
            F.col("component").cast("long"),
            F.col("b.doc_id").alias("keep_id"),
            F.col("n_members").cast("long"),
            F.col("b.s").alias("keep_pagerank_x1e6"),
        )
        .orderBy("component")
    )
