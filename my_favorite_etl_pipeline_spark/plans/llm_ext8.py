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
- ``bigram_kn_logprob_scores`` — interpolated Kneser-Ney bigram scoring
  (Kneser & Ney 1995; Chen & Goodman 1999), the smoothing the CCNet-style
  LM-quality ladder actually uses: continuation probability replaces the
  Laplace pseudo-count of ``bigram_logprob_scores``, so frequent-but-
  context-bound words ("Francisco") stop inflating unseen-context scores.
- ``source_overlap_matrix`` — the cross-source containment matrix: the
  fraction of each source's docs with a >=0.9-Jaccard near-dup in each
  other source (diagonal = internal dup rate), riding the exact PPJoin
  prefix-filter evidence — the corpus-governance statistic a mixture
  designer reads before weighting sources.
- ``psi_drift_by_window`` — the temporal twin of the JS mixture audit:
  Population Stability Index of each event type's value distribution,
  current vs reference time window — the standard production drift gate
  between a training snapshot and the serving stream.
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

#: shared oracle prefix through ``cand`` (the batch panel's probed
#: candidate scores) — consumed by the serving entry below AND the r14
#: ``ivf_recall_report`` (llm_ext13), so the recall audit measures
#: definitionally the SAME index/probe/scoring pipeline it reports on.
IVF_BATCH_CTES = f"""e AS (SELECT vec_id, label,
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
    )"""


@register(
    "embedding_topk_ivf_batch",
    oracle=f"""
    WITH {IVF_BATCH_CTES}
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


def _px_cte(r: int) -> str:
    """Adjacent symbol-pair positions of round ``r`` over ``w{r-1}`` —
    the round plumbing SHARED by the count-scored (BPE) and
    likelihood-scored (WordPiece, llm_ext13) trainers."""
    return f"""px{r} AS (
      SELECT t, cnt, UNNEST(range(len(t) - 1)) AS i
      FROM (SELECT string_split(trim(seq), '  ') AS t, cnt FROM w{r - 1})
    )"""


def _merge_w_cte(r: int) -> str:
    """Apply round ``r``'s winning merge (``best{r}``) into ``w{r}`` via
    the double-space literal REPLACE (module comment) — the OTHER shared
    half of the round plumbing. ``word`` rides along untouched so the
    encode oracle can map words to their final segmentations."""
    return f"""w{r} AS MATERIALIZED (
      SELECT w.word, REPLACE(w.seq, ' ' || b.a || '  ' || b.b || ' ',
                                    ' ' || b.a || b.b || ' ') AS seq, w.cnt
      FROM w{r - 1} w CROSS JOIN best{r} b
    )"""


def _bpe_round_cte(r: int) -> str:
    """One BPE round: shared pair plumbing + the COUNT argmax (the one
    CTE where the two trainers differ) + the shared merge pass."""
    return f""",
    {_px_cte(r)},
    best{r} AS MATERIALIZED (
      SELECT a, b, CAST(c AS BIGINT) AS c FROM (
        SELECT t[i + 1] AS a, t[i + 2] AS b, SUM(cnt) AS c
        FROM px{r} GROUP BY 1, 2
      ) ORDER BY c DESC, a, b LIMIT 1
    ),
    {_merge_w_cte(r)}"""


#: Word-frequency vocab + char-level init — the shared opening of EVERY
#: merge-based tokenizer trainer (BPE here; the WordPiece-scored twin in
#: llm_ext13 consumes the same text, so the two trainers provably start
#: from the identical symbol table).
_BPE_INIT_CTES = """
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
    )"""


def _bpe_cte_prefix() -> str:
    """Shared oracle prefix through ``w{_BPE_ROUNDS}`` — word-frequency
    vocab, char-level init, and all training rounds. Consumed by the
    trainer oracle (merge-table selection) AND the encode oracle (word →
    segmentation map), so the tokenizer that encodes is provably the
    tokenizer that was trained (the _knn_refined_cte precedent)."""
    rounds = "".join(_bpe_round_cte(r) for r in range(1, _BPE_ROUNDS + 1))
    return f"{_BPE_INIT_CTES}{rounds}"


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


def bpe_init_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted ``(word, seq, cnt)`` char-level init vocab — the
    Spark twin of ``_BPE_INIT_CTES``, shared by the BPE trainer and the
    WordPiece-scored trainer (llm_ext13) so both start from the identical
    symbol table."""
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
    return tracked_persist(
        wc.select(
            "word",
            F.concat(F.lit("  "), F.array_join(chars, "  "), F.lit("  </w>  ")).alias(
                "seq"
            ),
            "cnt",
        )
    )


def _bpe_learn(
    spark: SparkSession, sf_dir: str
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run the {_BPE_ROUNDS}-round BPE training loop; return the learned
    ``(rank, lhs, rhs, count)`` merge table AND the final vocab frame
    ``(word, seq, cnt)`` with every merge applied — the word →
    segmentation map the encode pass joins against (production tokenizers
    memoize exactly this table)."""
    cur = bpe_init_vocab(spark, sf_dir)
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, _BPE_ROUNDS + 1):
        best = (
            symbol_pair_counts(cur)
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
            .collect()[0]
        )
        merges.append((r, best.a, best.b, int(best.c)))
        cur = apply_merge(cur, best.a, best.b)
    return merges, cur


def symbol_pair_counts(cur: DataFrame) -> DataFrame:
    """Weighted adjacent symbol-pair counts ``(a, b, c)`` over the vocab
    frame — the Spark twin of ``_px_cte`` + its pair aggregate, shared by
    the BPE and WordPiece (llm_ext13) trainers."""
    toks = F.split(F.trim(F.col("seq")), "  ")
    return (
        cur.select(
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
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").alias("c"))
    )


def apply_merge(cur: DataFrame, a: str, b: str) -> DataFrame:
    """The double-space literal-REPLACE merge pass — the Spark twin of
    ``_merge_w_cte``, shared by both trainers."""
    return cur.withColumn(
        "seq",
        F.replace(F.col("seq"), F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")),
    )


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


# ---------------------------------------------------------------------------
# bigram_kn_logprob_scores

_KN_D = 0.75  # absolute discount; 3/4 is exactly representable in binary


@register(
    "bigram_kn_logprob_scores",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (SELECT doc_id, t[i + 1] AS w1, t[i + 2] AS w2
           FROM (SELECT doc_id, t, UNNEST(range(len(t) - 1)) AS i
                 FROM toks WHERE len(t) >= 2)),
    c2 AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, SUM(c) AS cu, CAST(COUNT(*) AS DOUBLE) AS fanout
           FROM c2 GROUP BY 1),
    cont AS (SELECT w2, CAST(COUNT(*) AS DOUBLE) AS cc FROM c2 GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS tt FROM c2)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(-ln((c - {_KN_D}) / cu
                         + {_KN_D} * fanout / cu * (cc / tt))), 4)
             AS avg_neg_logprob_kn
    FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) JOIN cont ON bg.w2 = cont.w2
    CROSS JOIN tot
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_bigram_kn_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 (r9) — interpolated Kneser-Ney bigram scoring: per document the
    average -ln of p_KN(w2|w1) = (c(w1,w2) - D)/c(w1) + D·N1+(w1,·)/c(w1)
    · p_cont(w2), with continuation probability p_cont(w2) = N1+(·,w2) /
    N1+(·,·) and absolute discount D = 0.75 (Kneser & Ney 1995; Chen &
    Goodman 1999 eq. 20). The smoothing upgrade over the Laplace
    ``bigram_logprob_scores``: a word that is frequent but only ever
    follows ONE context ("Francisco") gets a LOW continuation probability
    instead of a high unigram pseudo-count, which is exactly the error
    mode that makes Laplace-smoothed LM filters over-score boilerplate.
    Every scored bigram appears in the corpus model (the corpus scores
    itself, as in the other rungs of the ladder), so c ≥ 1 ⇒ c - D ≥ 0.25
    and the max(·,0) branch of the general formula is provably dead —
    both engines compute the same single expression.

    Plan at 100 TB: one bigram explode (map-only, in-row `sequence` +
    `transform` — no pre-agg shuffle wider than the explode) → THREE
    model-sized hash aggs, each over the previous model table, not the
    corpus: c2 on (w1,w2) is the only corpus-fed agg; c1 (totals +
    fanout N1+(w1,·)) and cont (N1+(·,w2)) aggregate the bigram-TYPE
    table; tt is a 1-row broadcast. Scoring joins the corpus bigram
    stream against vocabulary-scale tables — AQE broadcasts them — then
    one per-doc agg. Cross-engine floats: c, cu, fanout, cc, tt are all
    exact small integers widened to double; D = 0.75 is exact binary; the
    per-doc mean rounds to 4dp under the measure-zero rounding-half
    argument shared with the other logprob scorers.
    """
    docs = load(spark, sf_dir, "documents")
    ta = docs.select("doc_id", TX.tokens("text").alias("t")).filter(F.size("t") >= 2)
    bg = ta.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.struct(
                    F.get("t", i).alias("w1"), F.get("t", i + 1).alias("w2")
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("double").alias("c"))
    c1 = c2.groupBy("w1").agg(
        F.sum("c").alias("cu"), F.count(F.lit(1)).cast("double").alias("fanout")
    )
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).cast("double").alias("cc"))
    tot = c2.agg(F.count(F.lit(1)).cast("double").alias("tt"))
    d = F.lit(_KN_D)
    p_kn = (F.col("c") - d) / F.col("cu") + d * F.col("fanout") / F.col("cu") * (
        F.col("cc") / F.col("tt")
    )
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg(-F.log(p_kn)), 4).alias("avg_neg_logprob_kn"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# psi_drift_by_window

_PSI_B = 10  # value-histogram buckets: [0,50), [50,100), ... [450,inf)
_PSI_SPLIT = "2024-01-16 00:00:00"  # reference window < split <= current


# Shared by the batch query and its Structured-Streaming twin
# (stream_psi_drift_monitor): the streaming arm is a different ALGORITHM
# (stateful streaming histogram + static reference) for the same answer,
# so both register the same oracle — the Bloom/exact-decontamination
# precedent.
PSI_ORACLE_SQL = f"""
    WITH eb AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 0 ELSE 1 END AS wnd,
             LEAST(GREATEST(CAST(ROUND(value * 100) AS BIGINT), 0) // 5000,
                   {_PSI_B - 1}) AS b
      FROM events
    ),
    sc AS (SELECT event_type, wnd, b, COUNT(*) AS c FROM eb GROUP BY 1, 2, 3),
    ns AS (SELECT event_type, wnd, SUM(c) AS n FROM sc GROUP BY 1, 2),
    grid AS (
      SELECT t.event_type, g.b
      FROM (SELECT DISTINCT event_type FROM sc) t
      CROSS JOIN (SELECT UNNEST(range({_PSI_B})) AS b) g
    ),
    pq AS (
      SELECT grid.event_type,
             COALESCE(nr.n, 0) AS n_ref, COALESCE(nu.n, 0) AS n_cur,
             (COALESCE(sr.c, 0) + 1.0) / (COALESCE(nr.n, 0) + {_PSI_B}.0) AS q,
             (COALESCE(su.c, 0) + 1.0) / (COALESCE(nu.n, 0) + {_PSI_B}.0) AS p
      FROM grid
      LEFT JOIN sc sr ON sr.event_type = grid.event_type
                     AND sr.b = grid.b AND sr.wnd = 0
      LEFT JOIN sc su ON su.event_type = grid.event_type
                     AND su.b = grid.b AND su.wnd = 1
      LEFT JOIN ns nr ON nr.event_type = grid.event_type AND nr.wnd = 0
      LEFT JOIN ns nu ON nu.event_type = grid.event_type AND nu.wnd = 1
    )
    SELECT event_type,
           CAST(MAX(n_ref) AS BIGINT) AS n_ref,
           CAST(MAX(n_cur) AS BIGINT) AS n_cur,
           ROUND(SUM((p - q) * LN(p / q)), 4) AS psi
    FROM pq GROUP BY event_type ORDER BY event_type
    """


@register("psi_drift_by_window", oracle=PSI_ORACLE_SQL)
def q_psi_drift_by_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+/DQ (r9) — Population Stability Index per event type between a
    fixed reference window (ts < {split}) and the current window: PSI =
    Σ_buckets (p_cur - p_ref)·ln(p_cur/p_ref) over a fixed 10-bucket value
    histogram, Laplace-smoothed so empty buckets stay finite. The
    temporal twin of ``corpus_js_divergence_by_source`` (that audits the
    SOURCE axis of the mixture; this audits the TIME axis) and the
    standard production gate between a training-data snapshot and the
    live stream — PSI > 0.2 is the conventional "retrain/investigate"
    threshold.

    Plan at 100 TB: the bucket id is a map-only integer projection —
    ROUND(value·100) to exact integer cents, then integer DIV — so the
    whole corpus collapses into ONE (event_type, window, bucket) hash
    aggregate with map-side combine: at most |types|×2×{B} rows survive,
    model-sized regardless of corpus size. Window totals are a second agg
    over THAT table; the smoothing grid is built from `range`, never from
    data; every grid join is a broadcast. Nothing corpus-sized shuffles
    past the first aggregate, and the scan prunes to (ts, event_type,
    value). Cross-engine notes: integer-cents bucketing sidesteps the
    double-truncation trap (6.55·100 = 654.99… must ROUND, not CAST);
    values carry 2 decimals so value·100 never lands near .5 and the
    round is engine-identical; the PSI sum rounds to 4dp under the
    measure-zero argument. A type absent from one window is scored
    against the uniform smoothed distribution (COALESCE 0 totals) rather
    than dropped — drift of a brand-new event type should read as large,
    not invisible.
    """
    events = load(spark, sf_dir, "events")
    eb = events.select(
        "event_type",
        F.when(F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("wnd"),
        psi_value_bucket().alias("b"),
    )
    sc = eb.groupBy("event_type", "wnd", "b").agg(F.count(F.lit(1)).alias("c"))
    return psi_assemble(spark, sc)


def psi_value_bucket() -> "F.Column":
    """The PSI value-histogram bucket id as a map-only integer projection:
    ROUND(value·100) to exact cents, then integer DIV — shared by the
    batch query and its streaming twin so both arms bucket identically.
    Cents clamp at 0 first: Spark DIV truncates toward zero while DuckDB
    ``//`` floors, so a negative value would bucket as 0 vs −1 across
    engines (ADVICE r9); clamping makes any negative value bucket 0 on
    both arms instead of silently relying on the fixture's value ≥ 0."""
    return F.least(
        F.expr("GREATEST(CAST(ROUND(value * 100) AS BIGINT), 0) DIV 5000"),
        F.lit(_PSI_B - 1),
    )


def psi_assemble(spark: SparkSession, sc: DataFrame) -> DataFrame:
    """PSI per event type from a (event_type, wnd∈{0,1}, b, c) count frame
    — the model-sized tail shared by ``psi_drift_by_window`` (one batch
    agg feeds it) and ``stream_psi_drift_monitor`` (the current-window
    half of the frame comes out of a Structured Streaming stateful agg).
    Everything here is |types|×2×buckets-sized; every join broadcasts."""
    ns = sc.groupBy("event_type", "wnd").agg(F.sum("c").alias("n"))
    grid = (
        sc.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(spark.range(_PSI_B).select(F.col("id").alias("b"))))
    )
    sr = sc.filter(F.col("wnd") == 0).select("event_type", "b", F.col("c").alias("cr"))
    su = sc.filter(F.col("wnd") == 1).select("event_type", "b", F.col("c").alias("cc_"))
    nr = ns.filter(F.col("wnd") == 0).select("event_type", F.col("n").alias("nrn"))
    nu = ns.filter(F.col("wnd") == 1).select("event_type", F.col("n").alias("nun"))
    bb = float(_PSI_B)
    pq = (
        grid.join(F.broadcast(sr), ["event_type", "b"], "left")
        .join(F.broadcast(su), ["event_type", "b"], "left")
        .join(F.broadcast(nr), "event_type", "left")
        .join(F.broadcast(nu), "event_type", "left")
        .select(
            "event_type",
            F.coalesce(F.col("nrn"), F.lit(0)).alias("n_ref"),
            F.coalesce(F.col("nun"), F.lit(0)).alias("n_cur"),
            ((F.coalesce(F.col("cr"), F.lit(0)) + 1.0)
             / (F.coalesce(F.col("nrn"), F.lit(0)) + bb)).alias("q"),
            ((F.coalesce(F.col("cc_"), F.lit(0)) + 1.0)
             / (F.coalesce(F.col("nun"), F.lit(0)) + bb)).alias("p"),
        )
    )
    return (
        pq.groupBy("event_type")
        .agg(
            F.max("n_ref").cast("long").alias("n_ref"),
            F.max("n_cur").cast("long").alias("n_cur"),
            F.round(
                F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 4
            ).alias("psi"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# source_overlap_matrix

_SOM_T = 0.9  # near-dup Jaccard threshold (the ssjoin/minhash contract)


@register(
    "source_overlap_matrix",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3
               THEN list_transform(range(len(t) - 2),
                                   i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
               ELSE [] END) AS s
      FROM toks
    ),
    sizes AS (SELECT doc_id, LEN(s) AS n FROM sh),
    ex AS (SELECT doc_id, UNNEST(s) AS shingle FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT inter.id_a, inter.id_b
      FROM inter
      JOIN sizes sa ON inter.id_a = sa.doc_id
      JOIN sizes sb ON inter.id_b = sb.doc_id
      WHERE ROUND(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 4) >= {_SOM_T}
    ),
    dir AS (SELECT id_a AS d, id_b AS o FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
    ds AS (SELECT doc_id, source FROM documents),
    e AS (SELECT a.source AS src_a, b.source AS src_b, dir.d
          FROM dir JOIN ds a ON dir.d = a.doc_id
                   JOIN ds b ON dir.o = b.doc_id),
    ov AS (SELECT src_a, src_b, COUNT(DISTINCT d) AS n_overlap
           FROM e GROUP BY 1, 2),
    nn AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
    SELECT g_a.source AS src_a, g_b.source AS src_b,
           CAST(g_a.n_docs AS BIGINT) AS n_docs_a,
           CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
           CAST((COALESCE(ov.n_overlap, 0) * 10000) // g_a.n_docs AS BIGINT)
             AS share_x10000
    FROM nn g_a CROSS JOIN nn g_b
    LEFT JOIN ov ON ov.src_a = g_a.source AND ov.src_b = g_b.source
    ORDER BY src_a, src_b
    """,
)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X4+ (late r9) — the source-overlap containment matrix: for every
    ordered source pair (A, B), the fraction of A's documents that have at
    least one ≥{_SOM_T}-Jaccard near-duplicate in B (diagonal = A's
    internal near-dup rate). The corpus-governance statistic behind "how
    much of crawl X is already inside curated set Y" — what a mixture
    designer reads BEFORE weighting sources (double-counted content
    silently up-weights itself) and the aggregate view auditors ask of
    cross-source contamination. Full |sources|² grid with explicit zeros:
    an absent row and a measured-zero row must not be confusable.

    Plan at 100 TB: near-dup evidence comes from the PPJoin prefix-filter
    candidate equi-join + exact verify shared with
    ``ssjoin_prefix_filter`` — 100% recall by theorem, every step an
    equi-shuffle, NO all-pairs anywhere. The matrix tail is model-sized:
    directed-edge union (2×|pairs|), two doc→source equi-joins against a
    projection AQE broadcasts, one (src_a, src_b) distinct-count agg —
    at most |sources|² rows survive. The share is fixed-point integer
    DIV by ten-thousandths (the fertility precedent): a double ratio of
    two small integers lands on exact rounding halves far too often to
    survive cross-engine ROUND.
    """
    from ..operators.dedup import jaccard_verify, prefix_filter_pairs

    docs = load(spark, sf_dir, "documents")
    cand = prefix_filter_pairs(docs, "doc_id", "text", threshold=_SOM_T)
    pairs = jaccard_verify(docs, cand, "doc_id", "text", threshold=_SOM_T).select(
        "id_a", "id_b"
    )
    direct = pairs.select(
        F.col("id_a").alias("d"), F.col("id_b").alias("o")
    ).unionByName(pairs.select(F.col("id_b").alias("d"), F.col("id_a").alias("o")))
    ds = docs.select("doc_id", "source")
    e = (
        direct.join(ds.select(F.col("doc_id").alias("d"), F.col("source").alias("src_a")), "d")
        .join(ds.select(F.col("doc_id").alias("o"), F.col("source").alias("src_b")), "o")
    )
    ov = e.groupBy("src_a", "src_b").agg(F.count_distinct("d").alias("n_overlap"))
    nn = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    grid = nn.select(F.col("source").alias("src_a"), F.col("n_docs").alias("n_docs_a")).crossJoin(
        F.broadcast(nn.select(F.col("source").alias("src_b")))
    )
    return (
        grid.join(F.broadcast(ov), ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            F.col("n_docs_a").cast("long").alias("n_docs_a"),
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
            F.expr(
                "CAST((COALESCE(n_overlap, 0) * 10000) DIV n_docs_a AS BIGINT)"
            ).alias("share_x10000"),
        )
        .orderBy("src_a", "src_b")
    )
