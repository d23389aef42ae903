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


def _funnel_oracle() -> str:
    """The r7 five-stage funnel oracle extended with the three r14
    stages, each embedded as the REGISTERED oracle text (REGISTRY
    lookup — one definition, two consumers; llm_ext14 loads after
    llm_ext13 so the lookups are guaranteed to resolve)."""
    fz = REGISTRY["fuzzy_decontaminate_minhash"].oracle
    ck = REGISTRY["community_capped_select"].oracle
    cr = REGISTRY["greedy_gram_coverage_select"].oracle
    stages = [
        "raw",
        "gopher",
        "classifier",
        "exact_dedup",
        "decontaminated",
        "fuzzy_decontaminated",
        "community_capped",
        "coverage_core",
    ]
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
    n_stages = 8
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
    names = [
        "raw",
        "gopher",
        "classifier",
        "exact_dedup",
        "decontaminated",
        "fuzzy_decontaminated",
        "community_capped",
        "coverage_core",
    ]
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
