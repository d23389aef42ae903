"""[EXT] curation round 9 — corpus-mixture auditing, batched ANN serving
and distributed tokenizer training (SURVEY.md §2.9 X3/X4; no reference
citation exists — the citation is BASELINE.json's LLM-data mandate).

- ``corpus_js_divergence_by_source`` — the data-mixing audit: per-source
  Jensen-Shannon divergence between each source's hashed-unigram
  distribution and the whole-corpus mixture. This is the statistic a
  mixture-weight tuner (DoReMi-style reweighting, GPT-3-style manual
  mixture design) reads before deciding how hard to up/down-sample a
  source; the hashed {B}-bucket representation is the DSIR precedent —
  a FIXED-size distribution per source regardless of vocabulary size.
- ``embedding_topk_ivf_batch`` — the SERVING shape of IVF retrieval:
  many queries through the index in ONE job (query-set ⋈ probed cells ⋈
  inverted lists), not a per-query driver loop. Completes the
  embedding_topk_* family: every prior entry answers one query; real
  retrieval serves batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import similarity as SIM
from ..registry import register
from ..sources.tables import load
from .llm_ext5 import _duck_md5_32, _spark_md5_32

# ---------------------------------------------------------------------------
# corpus_js_divergence_by_source

_JS_B = 4096  # hashed-unigram buckets (the DSIR precedent)


@register(
    "corpus_js_divergence_by_source",
    oracle=f"""
    WITH fb AS (
      SELECT source, ({_duck_md5_32("w")}) % {_JS_B} AS b
      FROM (SELECT source, UNNEST(string_split(text, ' ')) AS w FROM documents)
    ),
    sc AS (SELECT source, b, COUNT(*) AS c FROM fb GROUP BY source, b),
    cb AS (SELECT b, SUM(c) AS cc FROM sc GROUP BY b),
    ns AS (SELECT source, SUM(c) AS nst FROM sc GROUP BY source),
    nt AS (SELECT SUM(c) AS n FROM sc),
    grid AS (
      SELECT s.source, s.nst, g.b
      FROM ns s CROSS JOIN (SELECT UNNEST(range({_JS_B})) AS b) g
    ),
    pq AS (
      SELECT grid.source, grid.nst,
             (COALESCE(sc.c, 0) + 1.0) / (grid.nst + {_JS_B}.0) AS p,
             (COALESCE(cb.cc, 0) + 1.0) / (nt.n + {_JS_B}.0) AS q
      FROM grid
      LEFT JOIN sc ON sc.source = grid.source AND sc.b = grid.b
      LEFT JOIN cb ON cb.b = grid.b
      CROSS JOIN nt
    )
    SELECT source, CAST(nst AS BIGINT) AS n_tokens,
           ROUND(SUM(0.5 * (p * LN(2.0 * p / (p + q))
                            + q * LN(2.0 * q / (p + q)))), 4) AS js_div
    FROM pq GROUP BY source, nst ORDER BY source
    """,
)
def q_corpus_js_divergence_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ (r9) — per-source Jensen-Shannon divergence vs the corpus
    mixture over hashed-unigram multinomials: the statistic a data-mixing
    stage (GPT-3-style manual mixture weights, DoReMi-style reweighting)
    reads to rank how "off-mixture" each source is. Each source's token
    distribution is hashed into {_JS_B} buckets (the DSIR idiom — fixed
    model size regardless of vocabulary), Laplace-smoothed against the
    full bucket space, and scored JS(p_s ‖ q) ∈ [0, ln 2] against the
    whole-corpus distribution q.

    Plan at 100 TB: the token explode is map-only and collapses into ONE
    (source, bucket) hash aggregate with map-side combine — at most
    |sources|×{_JS_B} rows survive, MODEL-sized regardless of corpus
    size. The corpus distribution is a second {_JS_B}-row agg over that
    table (not a second corpus pass). The smoothing grid is
    |sources|×{_JS_B} rows built from a `range`, never from data. All
    joins on the grid are broadcasts of model-sized tables; no corpus-
    sized shuffle exists past the first aggregate. Cross-engine floats:
    the per-bucket log terms sum in different orders on the two engines
    (~1e-13 dust) and the result rounds to 4dp — the measure-zero
    rounding-half argument of the DSIR/logprob precedents.
    """
    docs = load(spark, sf_dir, "documents")
    fb = docs.select(
        "source", F.explode(TX.tokens("text")).alias("w")
    ).select("source", (_spark_md5_32(F.col("w")) % _JS_B).alias("b"))
    sc = fb.groupBy("source", "b").agg(F.count(F.lit(1)).alias("c"))
    cb = sc.groupBy("b").agg(F.sum("c").alias("cc"))
    ns = sc.groupBy("source").agg(F.sum("c").alias("nst"))
    nt = sc.agg(F.sum("c").alias("n"))
    grid = ns.crossJoin(F.broadcast(spark.range(_JS_B).select(F.col("id").alias("b"))))
    pq = (
        grid.join(F.broadcast(sc), ["source", "b"], "left")
        .join(F.broadcast(cb), "b", "left")
        .crossJoin(F.broadcast(nt))
        .select(
            "source",
            "nst",
            ((F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (F.col("nst") + float(_JS_B))).alias("p"),
            ((F.coalesce(F.col("cc"), F.lit(0)) + 1.0) / (F.col("n") + float(_JS_B))).alias("q"),
        )
    )
    two = F.lit(2.0)
    return (
        pq.groupBy("source", "nst")
        .agg(
            F.round(
                F.sum(
                    0.5
                    * (
                        F.col("p") * F.log(two * F.col("p") / (F.col("p") + F.col("q")))
                        + F.col("q") * F.log(two * F.col("q") / (F.col("p") + F.col("q")))
                    )
                ),
                4,
            ).alias("js_div")
        )
        .select("source", F.col("nst").cast("long").alias("n_tokens"), "js_div")
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# embedding_topk_ivf_batch

_IVB_K = 10  # results per query
_IVB_PROBE = 3  # probed cells per query (matches embedding_topk_ivf)


@register(
    "embedding_topk_ivf_batch",
    oracle=f"""
    WITH e AS (SELECT vec_id, label,
                      LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    qs AS (SELECT vec_id AS query_id, v AS qv,
                  SQRT(LIST_SUM(LIST_TRANSFORM(v, x -> x * x))) AS qn
           FROM e WHERE vec_id % 100 = 0),
    dims AS (SELECT UNNEST(range(64)) AS dim),
    per_dim AS (
      SELECT e.label, d.dim,
             CAST(SUM(CAST(FLOOR(e.v[d.dim + 1] * 10000000) AS BIGINT)) AS DOUBLE)
               / (COUNT(*) * 10000000.0) AS mean_val
      FROM e CROSS JOIN dims d
      GROUP BY e.label, d.dim
    ),
    cent AS (SELECT label, LIST(mean_val ORDER BY dim) AS centroid
             FROM per_dim GROUP BY label),
    probe AS (
      SELECT query_id, label FROM (
        SELECT q.query_id, c.label,
               LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> c.centroid[i] * q.qv[i]))
                 / (SQRT(LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> c.centroid[i] * c.centroid[i])))
                    * q.qn) AS c_sim
        FROM cent c CROSS JOIN qs q
      ) QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY c_sim DESC, label) <= {_IVB_PROBE}
    ),
    cand AS (
      SELECT q.query_id, e.vec_id,
             ROUND(LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> e.v[i] * q.qv[i]))
               / (SQRT(LIST_SUM(LIST_TRANSFORM(range(1, 65), i -> e.v[i] * e.v[i]))) * q.qn),
             4) AS cos_sim
      FROM probe p
      JOIN e ON e.label = p.label
      JOIN qs q ON q.query_id = p.query_id
    )
    SELECT query_id, CAST(rn AS INT) AS rank, vec_id, cos_sim FROM (
      SELECT query_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rn
      FROM cand
    ) WHERE rn <= {_IVB_K} ORDER BY query_id, rank
    """,
)
def q_embedding_topk_ivf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+ (r9) — the SERVING shape of IVF retrieval: every query with
    vec_id % 100 == 0 (a size-tracking batch: 5 at sf0.01, 20 at sf0.1)
    through the label-cell IVF index in ONE job, top-{_IVB_K} per query.
    Same index and probe count as `embedding_topk_ivf`; what changes is
    the plan — a per-query probe TABLE instead of a per-query driver
    loop, so the corpus is scanned once for the whole batch.

    Plan at 100 TB: see :func:`operators.similarity.ivf_topk_batch` —
    centroids and the |Q|×{_IVB_PROBE}-row probe table broadcast; one
    corpus pass joins each probed cell's list against every query probing
    it; the per-query top-k cut is the salted two-phase exact top-k
    shared with posting truncation (impact_truncate), so a hot cell never
    lands a corpus-sized candidate list on one reducer. Deterministic:
    fixed-point centroid means, sequential-fold cosines, 4dp-rounded
    candidate scores with id tie-breaks — both engines cut the identical
    top-{_IVB_K}.
    """
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivf_topk_batch(emb, queries, k=_IVB_K, n_probe=_IVB_PROBE)


# ---------------------------------------------------------------------------
# bpe_train_merges — distributed BPE tokenizer training

_BPE_ROUNDS = 10

# Symbol sequences ride ONE string per word with DOUBLE-space separators:
# "  h  i  </w>  ". A merge of (a, b) is then the literal (non-regex)
# replacement ' a  b ' -> ' ab ': each match consumes ONE space from each
# boundary, leaving one for the neighbor, so immediately-adjacent
# occurrences ("a b a b", and runs "o o o o" for a==b) still match —
# left-to-right non-overlapping scanning on both engines reproduces
# exactly the classic greedy BPE merge pass. (A single-space encoding
# breaks here: the first match eats the boundary space the second needs.)


def _bpe_round_cte(r: int) -> str:
    """One BPE round as DuckDB CTEs: pair-count w{r-1}, pick best{r} by
    (count DESC, lhs, rhs), apply the merge into w{r}. ``word`` rides
    along untouched so the encode oracle can map words to their final
    segmentations off the same shared prefix."""
    prev = f"w{r - 1}"
    return f""",
    px{r} AS (
      SELECT t, cnt, UNNEST(range(len(t) - 1)) AS i
      FROM (SELECT string_split(trim(seq), '  ') AS t, cnt FROM {prev})
    ),
    best{r} AS MATERIALIZED (
      SELECT a, b, CAST(c AS BIGINT) AS c FROM (
        SELECT t[i + 1] AS a, t[i + 2] AS b, SUM(cnt) AS c
        FROM px{r} GROUP BY 1, 2
      ) ORDER BY c DESC, a, b LIMIT 1
    ),
    w{r} AS MATERIALIZED (
      SELECT w.word, REPLACE(w.seq, ' ' || b.a || '  ' || b.b || ' ',
                                    ' ' || b.a || b.b || ' ') AS seq, w.cnt
      FROM {prev} w CROSS JOIN best{r} b
    )"""


def _bpe_cte_prefix() -> str:
    """Shared oracle prefix through ``w{_BPE_ROUNDS}`` — word-frequency
    vocab, char-level init, and all training rounds. Consumed by the
    trainer oracle (merge-table selection) AND the encode oracle (word →
    segmentation map), so the tokenizer that encodes is provably the
    tokenizer that was trained (the _knn_refined_cte precedent)."""
    rounds = "".join(_bpe_round_cte(r) for r in range(1, _BPE_ROUNDS + 1))
    return f"""
    WITH wc AS (
      SELECT word, COUNT(*) AS cnt FROM (
        SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY word
    ),
    w0 AS MATERIALIZED (
      SELECT word, '  ' || array_to_string(
               list_transform(range(length(word)),
                              i -> substr(word, CAST(i + 1 AS INT), 1)),
               '  ') || '  </w>  ' AS seq, cnt
      FROM wc
    ){rounds}"""


def _bpe_oracle() -> str:
    final = " UNION ALL ".join(
        f"SELECT {r} AS r, a, b, c FROM best{r}" for r in range(1, _BPE_ROUNDS + 1)
    )
    return f"""
    {_bpe_cte_prefix()}
    SELECT CAST(r AS INT) AS merge_rank, a AS lhs, b AS rhs, c AS pair_count
    FROM ({final}) ORDER BY merge_rank
    """


@register("bpe_train_merges", oracle=_bpe_oracle())
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ (r9) — distributed BPE tokenizer TRAINING (Sennrich et al.
    2016): learn the first {_BPE_ROUNDS} merge rules from the corpus. The
    engine so far tokenizes with a fixed regex (`bpe_ish_tokens`) and
    audits fertility; this operator closes the loop — it trains the merge
    table a real tokenizer would ship. Each round counts adjacent symbol
    pairs (weighted by word frequency), picks the argmax by (count DESC,
    lhs, rhs), and applies the merge; output is the ranked merge table
    with the pair count at selection time.

    Plan at 100 TB: the ONLY corpus-sized pass is the word-frequency hash
    aggregate (map-side combine absorbs the token explode) — exactly how
    production BPE trainers (subword-nmt, HuggingFace) scale: training
    runs on the (word, count) VOCAB table, corpus-size-independent. Each
    round is one vocab-sized pair-count hash agg + a 1-row TakeOrdered
    collect (parameter-sized, the k-centroids precedent) + a map-only
    literal string replace; round count is a constant. The double-space
    merge encoding (module comment) makes the merge a literal REPLACE on
    both engines, so the oracle replays every round as generated
    MATERIALIZED CTEs (the NN-Descent/Lloyd precedent) and the driver
    hash-checks the full training trajectory, not just the final table.
    Determinism: integer pair counts, binary-collation (count, lhs, rhs)
    tie-break — both engines select identical merges every round.
    """
    merges, _ = _bpe_learn(spark, sf_dir)
    return spark.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, pair_count long"
    )


def _bpe_learn(
    spark: SparkSession, sf_dir: str
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run the {_BPE_ROUNDS}-round BPE training loop; return the learned
    ``(rank, lhs, rhs, count)`` merge table AND the final vocab frame
    ``(word, seq, cnt)`` with every merge applied — the word →
    segmentation map the encode pass joins against (production tokenizers
    memoize exactly this table)."""
    from ..caching import tracked_persist

    docs = load(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(TX.tokens("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    chars = F.transform(
        F.sequence(F.lit(0), F.length("word") - 1),
        lambda i: F.col("word").substr(i + 1, F.lit(1)),
    )
    cur = tracked_persist(
        wc.select(
            "word",
            F.concat(F.lit("  "), F.array_join(chars, "  "), F.lit("  </w>  ")).alias(
                "seq"
            ),
            "cnt",
        )
    )
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, _BPE_ROUNDS + 1):
        toks = F.split(F.trim(F.col("seq")), "  ")
        pairs = cur.select(
            F.explode(
                F.when(
                    F.size(toks) >= 2,
                    F.transform(
                        F.sequence(F.lit(0), F.size(toks) - 2),
                        lambda i: F.struct(
                            F.get(toks, i).alias("a"), F.get(toks, i + 1).alias("b")
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
            "cnt",
        )
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
            .collect()[0]
        )
        merges.append((r, best.a, best.b, int(best.c)))
        cur = cur.withColumn(
            "seq",
            F.replace(
                F.col("seq"),
                F.lit(f" {best.a}  {best.b} "),
                F.lit(f" {best.a}{best.b} "),
            ),
        )
    return merges, cur


@register(
    "bpe_encode_fertility",
    oracle=f"""
    {_bpe_cte_prefix()},
    enc AS (
      SELECT word, len(string_split(trim(seq), '  ')) AS nt
      FROM w{_BPE_ROUNDS}
    ),
    inst AS (
      SELECT lang, word FROM (
        SELECT lang, UNNEST(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> ''
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(nt) AS BIGINT) AS n_tokens,
           CAST((SUM(nt) * 10000) // COUNT(*) AS BIGINT) AS fert_x10000
    FROM inst JOIN enc USING (word)
    GROUP BY lang ORDER BY lang
    """,
)
def q_bpe_encode_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+ (r9) — BPE ENCODE, the serving half of `bpe_train_merges`:
    apply the trained merge table to the corpus and report per-language
    fertility (trained-BPE tokens per word, ×10⁴ fixed-point; token
    counts INCLUDE the `</w>` marker). Where `tokenizer_fertility_by_lang`
    audits two FIXED tokenizers, this audits the tokenizer the engine
    itself just trained — train and encode share one merge table by
    construction (Spark: same `_bpe_learn` frame; oracle: same generated
    CTE prefix).

    Plan at 100 TB: encoding does NOT re-segment every token instance —
    the merge chain applies once to the (word, count) VOCAB table (the
    segmentation-memo trick real tokenizers use), and the corpus-sized
    side is one (lang, word) hash agg joined against that broadcastable
    word → token-count map. Integer counts and int·10⁴ DIV fertility —
    no float anywhere, both engines agree exactly.
    """
    _, vocab = _bpe_learn(spark, sf_dir)
    enc = vocab.select(
        "word", F.size(F.split(F.trim(F.col("seq")), "  ")).alias("nt")
    )
    docs = load(spark, sf_dir, "documents")
    inst = (
        docs.select("lang", F.explode(TX.tokens("text")).alias("word"))
        .filter(F.col("word") != "")
    )
    return (
        inst.join(F.broadcast(enc), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
        .select(
            "lang",
            "n_words",
            "n_tokens",
            F.expr("CAST((n_tokens * 10000) DIV n_words AS BIGINT)").alias(
                "fert_x10000"
            ),
        )
        .orderBy("lang")
    )
