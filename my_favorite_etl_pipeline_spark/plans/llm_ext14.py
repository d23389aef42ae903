"""[EXT] curation round 14/15 — the funnel audit extended to the FULL
current stack (SURVEY.md §2.9 X4+; VERDICT r14 item 6).

``curation_funnel_report`` moved here from ``llm_ext5`` (this module
loads AFTER ``llm_ext13``, so it can compose the r14 entries' REGISTERED
definitions without import cycles) and grew three survival levels:

raw → Gopher → classifier → exact dedup → exact decontamination
    → FUZZY decontamination (GPT-3 appendix C, the registered
      ``fuzzy_decontaminate_minhash`` drop list)
    → COMMUNITY CAP (the registered ``community_capped_select`` keeper
      set — LPA communities over the kNN graph, top-K per community by
      the shared CCNet score)
    → COVERAGE CORE (the registered ``greedy_gram_coverage_select``
      picks — the submodular diverse-core readout).

Composition discipline (the r14 review's own rule): the three new
stages reuse the REGISTERED frames on both engines — the Spark arm
calls the registered query callables from the REGISTRY, and the oracle
embeds the registered oracle SQL strings verbatim as nested-``WITH``
subqueries (their CTE names scope locally, so ``toks``/``sh`` collide
with nothing). The funnel therefore CANNOT drift from the entries it
audits; any change to a composed entry changes the funnel identically
on both engines.

Plus three r15 breadth operators:

- ``knn_graph_kcore``        — k-core peel over the shared undirected
  base-kNN graph (llm_ext13's ``_und_ctes``/``_und_frame`` — one graph,
  three consumers): the graph-DENSITY tier between degree (too local)
  and LPA communities (partition, not density) — dense cores are the
  boilerplate/spam signature near-dup curation inspects.
- ``gram_novelty_scores``    — per-document novelty: the share of a
  document's distinct 13-grams that are corpus-UNIQUE (df = 1), over
  the coverage trainer's shared gram table (``_DG_CTES``/``_dg_frame``)
  — the memorization-risk/duplication readout per document.
- ``unimax_language_budget`` — UniMax (Chung et al. 2022) epoch-capped
  language allocation as a CLOSED-FORM exact-integer water-fill: sort
  languages by capacity, cap the small ones, split the rest evenly —
  no iteration, every value a BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import tracked_persist
from ..functions import text as TX
from ..registry import REGISTRY, register
from ..sources.tables import load
from .llm_ext5 import _duck_md5_32, _spark_md5_32

# The benchmark-subset predicate, restated from llm_ext3 (oracles must be
# self-contained SQL strings). Moved here with the funnel from llm_ext5.
_BENCH_SQL_5 = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'"

#: funnel stage names, in survival-level order — ONE list consumed by both
#: the oracle generator and the Spark arm so a rename/insertion cannot
#: drift between engines (mid-r15 review)
_FUNNEL_STAGES = [
    "raw",
    "gopher",
    "classifier",
    "exact_dedup",
    "decontaminated",
    "fuzzy_decontaminated",
    "community_capped",
    "coverage_core",
]


def _funnel_oracle() -> str:
    """The r7 five-stage funnel oracle extended with the three r14
    stages, each embedded as the REGISTERED oracle text (REGISTRY
    lookup — one definition, two consumers; llm_ext14 loads after
    llm_ext13 so the lookups are guaranteed to resolve)."""
    fz = REGISTRY["fuzzy_decontaminate_minhash"].oracle
    ck = REGISTRY["community_capped_select"].oracle
    cr = REGISTRY["greedy_gram_coverage_select"].oracle
    stages = _FUNNEL_STAGES
    rows = "\n      UNION ALL ".join(
        f"""SELECT {i}, '{n}',
             CAST(COUNT(*) FILTER (WHERE lv >= {i}) AS BIGINT),
             CAST(COALESCE(SUM(ntok) FILTER (WHERE lv >= {i}), 0) AS BIGINT) FROM lvl"""
        for i, n in enumerate(stages[1:], start=1)
    )
    return f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE NOT ({_BENCH_SQL_5})),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM d),
    m AS (
      SELECT doc_id, t, CAST(len(t) AS BIGINT) AS ntok,
             ROUND(list_sum(list_transform(t, w -> CAST(len(w) AS DOUBLE)))
                   / len(t), 4) AS mwl,
             len(list_filter(t,
               w -> w IN ('a','the','and','of','to','in'))) AS nstop,
             ROUND(CAST(len(list_filter(t, w -> regexp_matches(w, '[A-Za-z]')))
                   AS DOUBLE) / len(t), 4) AS af
      FROM toks
    ),
    g AS (SELECT doc_id, t, ntok,
                 (ntok BETWEEN 50 AND 100000) AND (mwl BETWEEN 3 AND 10)
                 AND (nstop >= 2) AND (af >= 0.8) AS gp
          FROM m),
    feats AS (
      SELECT doc_id,
             list_concat(t, CASE WHEN len(t) >= 2
               THEN list_transform(range(len(t) - 1), i -> t[i+1] || '_' || t[i+2])
               ELSE [] END) AS fs
      FROM toks
    ),
    clf AS (SELECT doc_id,
                   CAST(LIST_SUM(LIST_TRANSFORM(fs, x ->
                     ({_duck_md5_32('x')}) % 20001 - 10000)) AS BIGINT) >= 0 AS cp
            FROM feats),
    fp AS (SELECT doc_id, md5(text) AS fp FROM d),
    surv2 AS (SELECT g.doc_id, fp.fp
              FROM g JOIN clf USING (doc_id) JOIN fp USING (doc_id)
              WHERE g.gp AND clf.cp),
    first AS (SELECT MIN(doc_id) AS doc_id FROM surv2 GROUP BY fp),
    bgr AS (
      SELECT DISTINCT array_to_string(t[pos + 1:pos + 13], ' ') AS gram
      FROM (SELECT t, UNNEST(range(len(t) - 12)) AS pos
            FROM (SELECT string_split(text, ' ') AS t FROM documents
                  WHERE {_BENCH_SQL_5})
            WHERE len(t) >= 13)
    ),
    cont AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id, array_to_string(t[pos + 1:pos + 13], ' ') AS gram
        FROM (SELECT doc_id, t, UNNEST(range(len(t) - 12)) AS pos
              FROM toks WHERE len(t) >= 13)
      ) WHERE gram IN (SELECT gram FROM bgr)
    ),
    fz AS (SELECT DISTINCT doc_id FROM ({fz})),
    ck AS (SELECT DISTINCT doc_id FROM ({ck})),
    cr AS (SELECT DISTINCT doc_id FROM ({cr})),
    lvl AS (
      SELECT g.doc_id, g.ntok,
             CASE WHEN NOT g.gp THEN 0
                  WHEN NOT clf.cp THEN 1
                  WHEN f.doc_id IS NULL THEN 2
                  WHEN c.doc_id IS NOT NULL THEN 3
                  WHEN z.doc_id IS NOT NULL THEN 4
                  WHEN k.doc_id IS NULL THEN 5
                  WHEN r.doc_id IS NULL THEN 6
                  ELSE 7 END AS lv
      FROM g JOIN clf USING (doc_id)
      LEFT JOIN first f ON g.doc_id = f.doc_id
      LEFT JOIN cont c ON g.doc_id = c.doc_id
      LEFT JOIN fz z ON g.doc_id = z.doc_id
      LEFT JOIN ck k ON g.doc_id = k.doc_id
      LEFT JOIN cr r ON g.doc_id = r.doc_id
    )
    SELECT stage_idx, stage, n_docs, n_tokens FROM (
      SELECT 0 AS stage_idx, 'raw' AS stage,
             CAST(COUNT(*) FILTER (WHERE lv >= 0) AS BIGINT) AS n_docs,
             CAST(COALESCE(SUM(ntok) FILTER (WHERE lv >= 0), 0) AS BIGINT) AS n_tokens
      FROM lvl
      UNION ALL {rows}
    ) ORDER BY stage_idx
    """


@register("curation_funnel_report", oracle=_funnel_oracle())
def q_curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ (r7, extended r15) — the curation-funnel audit table:
    per-stage surviving document and token counts through raw → Gopher
    rules → model-based classifier → exact dedup (keep-first among
    survivors) → benchmark decontamination → FUZZY decontamination →
    community cap → coverage core. Every corpus release publishes this
    table (it is how filter regressions and over-aggressive rules get
    caught); here it is ONE query composing seven already-oracled
    operator families over the non-benchmark corpus side.

    The three r15 stages intersect the funnel survivors with the
    REGISTERED frames (REGISTRY callables — no restatement): documents
    fuzzy-matched to the benchmark drop out at stage 5; stage 6 keeps
    survivors inside ``community_capped_select``'s per-community top-K;
    stage 7 keeps the ``greedy_gram_coverage_select`` picks — the final
    row reads "of the diverse core, this much survives the whole
    funnel". Construction runs the composed entries' own jobs (the
    registry LAZINESS contract: greedy's driver-walked rounds, the
    fuzzy probe).

    Plan at 100 TB: the Gopher/classifier gates are map-only
    expressions; dedup adds one fingerprint hash agg over stage-2
    survivors; decontamination adds the distinct-ref-gram semi-join
    (benchmark side broadcasts); the three new stages join against a
    drop list bounded by the eval suite, a keeper set bounded by
    |communities|·K, and a pick set of 5 — all broadcast-sized. The
    funnel itself is ONE aggregate over the per-doc survival level —
    eight FILTERed sums, no per-stage rescans — and the eight report
    rows explode from that single row.
    """
    from .llm_ext3 import _bench_pred

    docs_all = load(spark, sf_dir, "documents")
    docs = docs_all.filter(~_bench_pred())
    toks = TX.tokens("text")
    ntok = F.size(toks).cast("long")
    mwl = F.round(
        F.aggregate(toks, F.lit(0.0), lambda a, w: a + F.length(w).cast("double"))
        / F.size(toks),
        4,
    )
    nstop = F.size(
        F.filter(toks, lambda w: w.isin("a", "the", "and", "of", "to", "in"))
    )
    af = F.round(
        F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / F.size(toks),
        4,
    )
    gp = (
        ntok.between(50, 100000)
        & mwl.between(3, 10)
        & (nstop >= 2)
        & (af >= 0.8)
    )
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat(F.get(toks, i), F.lit("_"), F.get(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    wsum = F.aggregate(
        F.transform(
            F.concat(toks, bigrams), lambda c: _spark_md5_32(c) % 20001 - 10000
        ),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )
    grams13 = F.when(
        F.size(toks) >= 13,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 13),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 13)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # Two consumers read `base` (the dedup groupBy and the final level
    # join); without a materialization point Spark re-runs the whole
    # Gopher + classifier expression tree — the funnel's dominant cost —
    # once per consumer (VERDICT r7 item 4). tracked_persist keeps it one
    # scan; the harness's materialized_scope releases it after the action.
    base = tracked_persist(
        docs.select(
            "doc_id",
            ntok.alias("ntok"),
            gp.alias("gp"),
            (wsum >= 0).alias("cp"),
            F.md5("text").alias("fp"),
        )
    )
    first = (
        base.filter(F.col("gp") & F.col("cp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(True).alias("isfirst"))
    )
    bench_grams = (
        docs_all.filter(_bench_pred())
        .select(F.explode(grams13).alias("gram"))
        .distinct()
    )
    cont = (
        docs.select("doc_id", F.explode(grams13).alias("gram"))
        .join(bench_grams, "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .select("doc_id", F.lit(True).alias("contam"))
    )
    # the three REGISTERED r14 frames — one definition per rule on each
    # engine (the oracle embeds the same entries' SQL); all three are
    # broadcast-sized (eval-suite drop list / |communities|·K keepers /
    # 5 picks)
    fuzzy_drop = (
        REGISTRY["fuzzy_decontaminate_minhash"]
        .fn(spark, sf_dir)
        .select("doc_id", F.lit(True).alias("fz"))
    )
    cap_keep = (
        REGISTRY["community_capped_select"]
        .fn(spark, sf_dir)
        .select("doc_id")
        .distinct()
        .select("doc_id", F.lit(True).alias("ck"))
    )
    core_pick = (
        REGISTRY["greedy_gram_coverage_select"]
        .fn(spark, sf_dir)
        .select("doc_id")
        .distinct()
        .select("doc_id", F.lit(True).alias("cr"))
    )
    lv = (
        F.when(~F.col("gp"), 0)
        .when(~F.col("cp"), 1)
        .when(F.col("isfirst").isNull(), 2)
        .when(F.col("contam").isNotNull(), 3)
        .when(F.col("fz").isNotNull(), 4)
        .when(F.col("ck").isNull(), 5)
        .when(F.col("cr").isNull(), 6)
        .otherwise(7)
    )
    lvl = (
        base.join(first, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .join(F.broadcast(fuzzy_drop), "doc_id", "left")
        .join(F.broadcast(cap_keep), "doc_id", "left")
        .join(F.broadcast(core_pick), "doc_id", "left")
        .select("doc_id", "ntok", lv.alias("lv"))
    )
    n_stages = len(_FUNNEL_STAGES)
    stats = lvl.agg(
        *[
            F.sum((F.col("lv") >= i).cast("long")).alias(f"d{i}")
            for i in range(n_stages)
        ],
        *[
            F.coalesce(
                F.sum(F.when(F.col("lv") >= i, F.col("ntok")).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias(f"t{i}")
            for i in range(n_stages)
        ],
    )
    names = _FUNNEL_STAGES
    return (
        stats.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("stage_idx"),
                            F.lit(n).alias("stage"),
                            F.col(f"d{i}").alias("n_docs"),
                            F.col(f"t{i}").alias("n_tokens"),
                        )
                        for i, n in enumerate(names)
                    ]
                )
            ).alias("r")
        )
        .select("r.*")
        .orderBy("stage_idx")
    )


# ---------------------------------------------------------------------------
# knn_graph_kcore — the graph-density tier over the shared undirected graph

_KCORE_K = 4  # minimum surviving degree (measured: the base graph's
# undirected degrees sit at 3–9 with median 4, so K=4 peels ~45% in
# round 1 and leaves a small dense core — both arms fire at every SF;
# K=3 peels nothing (min degree 3), K=5 empties the graph)
_KCORE_ROUNDS = 3  # peel rounds (a knob; one join + agg each)


def _kcore_oracle() -> str:
    """Replays every peel round as generated CTEs over the SHARED
    undirected-graph text (llm_ext13._und_ctes — the same ``und`` LPA
    propagates over): alive set ``a{i}`` = nodes of ``a{i-1}`` whose
    degree WITHIN ``a{i-1}`` is >= K. Pure integer counts and ids."""
    from .llm_ext13 import _und_ctes

    rounds = "".join(
        f""",
    d{i} AS (
      SELECT u.node, CAST(COUNT(*) AS BIGINT) AS c
      FROM und u
      JOIN a{i - 1} x ON u.node = x.node
      JOIN a{i - 1} y ON u.nbr = y.node
      GROUP BY u.node
    ),
    a{i} AS (SELECT node FROM d{i} WHERE c >= {_KCORE_K})"""
        for i in range(1, _KCORE_ROUNDS + 1)
    )
    survive = "".join(
        f"""
             WHEN n.node NOT IN (SELECT node FROM a{i}) THEN {i - 1}"""
        for i in range(1, _KCORE_ROUNDS + 1)
    )
    # _und_ctes opens with the shared _knn_base_cte, which already emits
    # the WITH keyword (the _lpa_cte_chain convention)
    return f"""
    {_und_ctes()},
    a0 AS (SELECT vec_id AS node FROM qassign),
    deg AS (
      SELECT a.node, CAST(COUNT(u.nbr) AS BIGINT) AS d
      FROM a0 a LEFT JOIN und u ON u.node = a.node GROUP BY a.node
    ){rounds}
    SELECT n.node AS vec_id, deg.d AS degree,
           CAST(CASE{survive}
             ELSE {_KCORE_ROUNDS} END AS INT) AS rounds_survived,
           n.node IN (SELECT node FROM a{_KCORE_ROUNDS}) AS in_core
    FROM a0 n JOIN deg ON deg.node = n.node
    ORDER BY vec_id
    """


@register("knn_graph_kcore", oracle=_kcore_oracle())
def q_knn_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+ (r15) — k-core PEEL over the undirected base kNN graph
    (Seidman 1983; Batagelj & Zaversnik 2003): iteratively remove nodes
    with fewer than {_KCORE_K} surviving neighbors. The graph family's
    DENSITY tier — degree is too local (a hub of singletons reads
    dense), LPA partitions without measuring density; the k-core is the
    standard "mutually-dense region" readout, and over a NEAR-DUP graph
    dense cores are exactly the boilerplate/template/spam signature a
    curation run inspects before sampling (the near-dup analog of the
    Gopher repetition rules). Emits (vec_id, degree, rounds_survived,
    in_core) after {_KCORE_ROUNDS} peel rounds — the peel trajectory, so
    a reader sees HOW a node left, not just whether.

    Determinism contract: degrees are integer counts over integer-id
    edges; the alive sets are pure set operations — nothing to round,
    nothing order-dependent, so every round replays exactly in the
    oracle's generated CTEs (the LPA/PageRank trajectory precedent).

    Plan at 100 TB: the SHARED undirected edge table (one definition
    with LPA — `_und_frame`, persisted once) plus, per round, ONE
    self-equi-join of edges against the alive set on both endpoints +
    one per-node hash agg — the Pregel peel; alive sets stay
    distributed, zero driver state, rounds a fixed knob. Full coreness
    (peel to convergence) would wrap the same round body in an
    until-fixed-point loop with localCheckpoint truncation.
    """
    from .llm_ext13 import _und_frame

    assign, und = _und_frame(spark, sf_dir)
    nodes = assign.select(F.col("vec_id").alias("node"))
    deg = (
        nodes.join(und, "node", "left")
        .groupBy("node")
        .agg(F.count("nbr").cast("long").alias("degree"))
    )
    alive = nodes
    flags = []
    for i in range(1, _KCORE_ROUNDS + 1):
        d = (
            und.join(alive.withColumnRenamed("node", "nbr"), "nbr")
            .join(alive, "node")
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # each alive set feeds the NEXT round's two joins AND its own
        # survival flag below: persist per round (the lpa_labels per-round
        # pattern) so round i's join lineage runs once, not once per later
        # consumer — O(rounds), not O(rounds²), as the knob grows
        alive = tracked_persist(d.filter(F.col("c") >= _KCORE_K).select("node"))
        flags.append(alive.select("node", F.lit(True).alias(f"__a{i}")))
    out = deg
    for i, fl in enumerate(flags, start=1):
        out = out.join(fl, "node", "left")
    surv = F.lit(_KCORE_ROUNDS)
    for i in range(_KCORE_ROUNDS, 0, -1):
        surv = F.when(F.col(f"__a{i}").isNull(), i - 1).otherwise(surv)
    return out.select(
        F.col("node").alias("vec_id"),
        "degree",
        surv.cast("int").alias("rounds_survived"),
        F.col(f"__a{_KCORE_ROUNDS}").isNotNull().alias("in_core"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# gram_novelty_scores — per-document corpus-uniqueness readout


def _novelty_oracle() -> str:
    """One gram-df aggregate over the SHARED coverage gram table
    (llm_ext13._DG_CTES — the trainer's own definition) and a per-doc
    rollup; the ratio is 10000-scaled integer floor division so both
    engines emit identical BIGINTs."""
    from .llm_ext13 import _DG_CTES

    return f"""
    WITH {_DG_CTES},
    df AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM dg GROUP BY g)
    SELECT dg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(*) FILTER (WHERE df.c = 1) AS BIGINT) AS n_unique,
           CAST(COUNT(*) FILTER (WHERE df.c = 1) * 10000
                // COUNT(*) AS BIGINT) AS novelty_bp
    FROM dg JOIN df USING (g)
    GROUP BY dg.doc_id
    ORDER BY doc_id
    """


@register("gram_novelty_scores", oracle=_novelty_oracle())
def q_gram_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ (r15) — per-document GRAM NOVELTY: of a document's distinct
    13-token grams, the share that appear NOWHERE else in the corpus
    (document frequency 1), as exact basis points. The per-document
    inverse of the coverage/dedup families: coverage selection maximizes
    new grams across picks, the dedup funnels remove low-novelty PAIRS —
    this scores every document individually, the memorization-risk /
    near-duplication readout a curation run ranks by (a 0-novelty
    document is entirely reconstructible from the rest of the corpus;
    Lee et al. 2022's motivation at document grain). Emits (doc_id,
    n_grams, n_unique, novelty_bp) for every document with >= 1 gram.

    Shared-definition discipline: the gram table IS the coverage
    trainer's (`_dg_frame` / `_DG_CTES` — one definition per engine), so
    this readout and the greedy selection can never disagree about what
    a gram is.

    Plan at 100 TB: one (doc, gram) distinct table (the trainer's own
    build), one gram-keyed hash agg for df, one equi-join back, one
    per-doc hash agg — all map-side-combinable, nothing quadratic,
    output corpus-sized. The 10000-scaled floor division keeps the
    ratio integer-exact on both engines (the epochs_bp/score_x1e12
    precedent).
    """
    from .llm_ext13 import _dg_frame

    dg = tracked_persist(_dg_frame(load(spark, sf_dir, "documents")))
    df_ = dg.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("c"))
    return (
        dg.join(df_, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("c") == 1).cast("long")).alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_unique",
            F.expr("n_unique * 10000 DIV n_grams").alias("novelty_bp"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# unimax_language_budget — UniMax epoch-capped language allocation

_UMX_EPOCHS = 2  # per-language epoch cap (UniMax's N)
# budget = total corpus tokens * 3 // 2 — scale-free (proportions, not
# magnitudes, decide the allocation shape), sized so the fixture
# exercises BOTH arms: small languages hit their 2-epoch cap, the
# largest shares the remainder.
_UMX_B_NUM, _UMX_B_DEN = 3, 2
# Loud-overflow bound (the wordpiece/doremi discipline): epochs_bp
# multiplies alloc by 10^4 in int64.
_UMX_ALLOC_MAX = (2**63 - 1) // 10_000


@register(
    "unimax_language_budget",
    oracle=f"""
    WITH lt AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS t
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(t) AS BIGINT) AS tt,
                   CAST(COUNT(*) AS BIGINT) AS n FROM lt),
    c AS (
      SELECT lang, n_docs, t, {_UMX_EPOCHS} * t AS cap,
             ROW_NUMBER() OVER (ORDER BY {_UMX_EPOCHS} * t, lang) AS rn
      FROM lt
    ),
    lv AS (
      SELECT rn, lang, n_docs, t, cap,
             ((SELECT tt * {_UMX_B_NUM} // {_UMX_B_DEN} FROM tot)
              - COALESCE(SUM(cap) OVER (ORDER BY rn
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
             // ((SELECT n FROM tot) - rn + 1) AS level
      FROM c
    ),
    rs AS (SELECT COALESCE(MIN(rn), (SELECT n FROM tot) + 1) AS r
           FROM lv WHERE cap > level)
    SELECT lang, n_docs, t AS lang_tokens, cap AS cap_tokens,
           -- CAST is load-bearing: level inherits HUGEINT from the
           -- SUM-fed budget expression (the r12 promotion class the
           -- oracle-type lint exists for); values always fit BIGINT
           CAST(CASE WHEN rn < (SELECT r FROM rs) THEN cap
                ELSE (SELECT level FROM lv WHERE rn = (SELECT r FROM rs))
           END AS BIGINT) AS alloc_tokens,
           CAST(CASE WHEN rn < (SELECT r FROM rs) THEN cap
                ELSE (SELECT level FROM lv WHERE rn = (SELECT r FROM rs))
           END * 10000 // t AS BIGINT) AS epochs_bp
    FROM lv ORDER BY lang
    """,
)
def q_unimax_language_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ (r15) — UniMax language-budget allocation (Chung et al.
    2022): spread a total training-token budget as UNIFORMLY as possible
    across languages, capping every language at {_UMX_EPOCHS} epochs of
    its own corpus — the multilingual mixture rule that beats
    temperature sampling's head-overfit/tail-starve tradeoff (the
    registered `corpus_mix_temperature` is the baseline it replaces).
    Emits per language: (lang, n_docs, lang_tokens, cap_tokens,
    alloc_tokens, epochs_bp).

    The water-fill is CLOSED-FORM, not iterative: sort languages by
    capacity cap_l = {_UMX_EPOCHS}·tokens_l ascending; at rank r the
    even share of what remains is level_r = (B − Σ_(j<r) cap_j) DIV
    (n − r + 1); the first rank r* with cap_r* > level_r* splits the
    list — every smaller language is capped, every language from r* on
    gets exactly level_r* (caps ascend, so none of them can cap). All
    floor-division BIGINT arithmetic — the whole allocation
    value-hash-replays in SQL with zero rounds. Budget B =
    {_UMX_B_NUM}/{_UMX_B_DEN} of total corpus tokens (scale-free;
    proportions decide the shape, so the fixture exercises both arms at
    every SF).

    Plan at 100 TB: ONE corpus pass (the per-language token hash agg —
    map-side combinable) and then |languages|-row work: a window cumsum
    and three scalar subqueries on a model-sized frame. Nothing
    iterative, no driver state at all — the allocation is a plan, not a
    loop (contrast DoReMi's inherently-sequential MW rounds).
    """
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    # lt is THE corpus pass (per-language token hash agg) and feeds tot,
    # the rank frame, and the final select: persist it so the plan scans
    # the corpus once, as the docstring claims (mid-r15 review)
    lt = tracked_persist(
        docs.groupBy("lang").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(TX.tokens("text"))).cast("long").alias("t"),
        )
    )
    tot = lt.agg(
        F.sum("t").cast("long").alias("tt"), F.count(F.lit(1)).cast("long").alias("n")
    )
    c = lt.withColumn("cap", F.lit(_UMX_EPOCHS) * F.col("t")).withColumn(
        "rn", F.row_number().over(Window.orderBy("cap", "lang"))
    )
    wcum = (
        Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, -1)
    )
    lv = (
        c.crossJoin(F.broadcast(tot))
        .withColumn("cum_prev", F.coalesce(F.sum("cap").over(wcum), F.lit(0)))
        .withColumn(
            "level",
            F.expr(
                f"(tt * {_UMX_B_NUM} DIV {_UMX_B_DEN} - cum_prev) DIV (n - rn + 1)"
            ),
        )
    )
    rs = lv.agg(
        F.coalesce(
            F.min(F.when(F.col("cap") > F.col("level"), F.col("rn"))),
            (F.max("n") + 1).cast("int"),
        ).alias("rstar")
    )
    # ALWAYS exactly one row: an aggregate, not a filter-join — in the
    # all-languages-capped case (budget >= sum of caps) rstar = n+1
    # matches no rank, a filter-join would go EMPTY, and the crossJoin
    # below would annihilate the whole result while the oracle keeps
    # every language capped. Here final_level is a never-read NULL
    # instead (every rn < rstar takes the cap branch), so both engines
    # emit one capped row per language (mid-r15 review; fixture-pinned
    # in tests/test_llm_ext14.py)
    final_level = (
        lv.crossJoin(F.broadcast(rs))
        .agg(
            F.max(
                F.when(F.col("rn") == F.col("rstar"), F.col("level"))
            ).alias("final_level")
        )
    )
    alloc = F.when(F.col("rn") < F.col("rstar"), F.col("cap")).otherwise(
        F.col("final_level")
    )
    guarded_bp = F.expr(
        f"IF(alloc_tokens <= {_UMX_ALLOC_MAX}, alloc_tokens * 10000 DIV t, "
        f"raise_error('unimax_language_budget: allocation exceeds the int64 "
        f"fixed-point bound - rescale token counts'))"
    )
    return (
        lv.crossJoin(F.broadcast(rs))
        .crossJoin(F.broadcast(final_level))
        .select(
            "lang",
            "n_docs",
            F.col("t").alias("lang_tokens"),
            F.col("cap").alias("cap_tokens"),
            alloc.alias("alloc_tokens"),
            "t",
        )
        .withColumn("epochs_bp", guarded_bp)
        .select(
            "lang", "n_docs", "lang_tokens", "cap_tokens", "alloc_tokens", "epochs_bp"
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# knn_graph_triangles — local clustering coefficient over the shared graph


def _triangles_oracle() -> str:
    """Wedge join + closing-edge join over the SHARED undirected graph
    CTE (llm_ext13._und_ctes — one graph definition, four consumers);
    the coefficient is 2·tri·10⁴ DIV deg·(deg−1) so both engines emit
    identical BIGINTs, NULL where deg < 2 leaves it undefined."""
    from .llm_ext13 import _und_ctes

    return f"""
    {_und_ctes()},
    deg AS (
      SELECT a.vec_id AS node, CAST(COUNT(u.nbr) AS BIGINT) AS d
      FROM qassign a LEFT JOIN und u ON u.node = a.vec_id GROUP BY a.vec_id
    ),
    tr AS (
      SELECT e1.node, CAST(COUNT(*) AS BIGINT) AS t
      FROM und e1
      JOIN und e2 ON e2.node = e1.node AND e1.nbr < e2.nbr
      JOIN und e3 ON e3.node = e1.nbr AND e3.nbr = e2.nbr
      GROUP BY e1.node
    )
    SELECT deg.node AS vec_id, deg.d AS degree,
           CAST(COALESCE(tr.t, 0) AS BIGINT) AS triangles,
           CASE WHEN deg.d >= 2
                THEN CAST(COALESCE(tr.t, 0) * 20000 // (deg.d * (deg.d - 1))
                          AS BIGINT)
           END AS clustering_bp
    FROM deg LEFT JOIN tr ON tr.node = deg.node
    ORDER BY vec_id
    """


@register("knn_graph_triangles", oracle=_triangles_oracle())
def q_knn_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+ (r15) — per-node TRIANGLE count and local clustering
    coefficient (Watts & Strogatz 1998) over the shared undirected base
    kNN graph. Completes the graph family's density ladder: degree
    (volume), k-core (mutually-dense region membership — a SET), and now
    the clustering coefficient (HOW interlocked a node's neighborhood
    is — a per-node RATIO). Over a near-dup graph, high-coefficient
    nodes sit inside template/boilerplate cliques even when their degree
    is modest — the k-core flags the region, the coefficient ranks
    within it. Emits (vec_id, degree, triangles, clustering_bp) for
    every vector; clustering_bp = 2·tri·10⁴ DIV (deg·(deg−1)) in exact
    basis points, NULL where deg < 2 leaves the coefficient undefined
    (the correlation entry's zero-variance NULL precedent).

    Determinism contract: triangles are integer counts over integer-id
    edges; the coefficient is integer floor division — nothing floats,
    the whole readout value-hash-replays in the oracle's SQL.

    Plan at 100 TB: the SHARED persisted edge table (one definition with
    LPA and the k-core — ``_und_frame``), then ONE equi-self-join on the
    wedge apex (per-node volume ≤ C(2K, 2), K the kNN fan-out — bounded
    per node, linear in n) and ONE (v, w) equi-join against the edge
    table to close each wedge, both hash joins on integer keys; one
    per-node hash agg. No driver state, nothing quadratic in n.
    """
    from .llm_ext13 import _und_frame

    assign, und = _und_frame(spark, sf_dir)
    nodes = assign.select(F.col("vec_id").alias("node"))
    deg = (
        nodes.join(und, "node", "left")
        .groupBy("node")
        .agg(F.count("nbr").cast("long").alias("degree"))
    )
    e1 = und.select(F.col("node").alias("u"), F.col("nbr").alias("v"))
    e2 = und.select(F.col("node").alias("u"), F.col("nbr").alias("w"))
    wedges = e1.join(e2, "u").filter(F.col("v") < F.col("w"))
    closing = und.select(F.col("node").alias("v"), F.col("nbr").alias("w"))
    tri = (
        wedges.join(closing, ["v", "w"])
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .withColumnRenamed("u", "node")
    )
    out = deg.join(tri, "node", "left").select(
        "node",
        "degree",
        F.coalesce("t", F.lit(0)).cast("long").alias("triangles"),
    )
    cb = F.when(
        F.col("degree") >= 2,
        F.expr("triangles * 20000 DIV (degree * (degree - 1))"),
    ).cast("long")
    return out.select(
        F.col("node").alias("vec_id"),
        "degree",
        "triangles",
        cb.alias("clustering_bp"),
    ).orderBy("vec_id")
