"""Engine-side invariants for the r9 operators (plans/llm_ext8.py):
BPE training must emit a structurally valid merge table with the greedy
argmax contract; the batched IVF serving path must agree with the
single-query index it batches; the JS mixture audit must respect the
divergence bounds and cover every source.
"""

import math

from pyspark.sql import functions as F

from my_favorite_etl_pipeline_spark.registry import REGISTRY


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bpe_merges_structurally_valid(spark, sf_dir):
    """Every merge must be buildable from symbols available at its rank
    (single chars, </w>, or outputs of EARLIER merges), and the greedy
    argmax makes selected pair counts non-increasing by rank: round r's
    new pairs inherit counts <= the merged pair's, and every other count
    only shrinks, so a later round can never beat an earlier max."""
    rows = REGISTRY["bpe_train_merges"].fn(spark, sf_dir).collect()
    assert [r.merge_rank for r in rows] == list(range(1, len(rows) + 1))
    built: set[str] = set()

    def available(s: str) -> bool:
        return s == "</w>" or len(s) == 1 or s in built

    prev = None
    for r in rows:
        assert available(r.lhs) and available(r.rhs), (r.lhs, r.rhs)
        built.add(r.lhs + r.rhs)
        assert r.pair_count > 0
        if prev is not None:
            assert r.pair_count <= prev
        prev = r.pair_count


def test_bpe_merges_deterministic(spark, sf_dir):
    a = [tuple(r) for r in REGISTRY["bpe_train_merges"].fn(spark, sf_dir).collect()]
    b = [tuple(r) for r in REGISTRY["bpe_train_merges"].fn(spark, sf_dir).collect()]
    assert a == b


def test_bpe_encode_consistent_with_training(spark, sf_dir):
    """Encoding with the trained merges must (a) never split a word into
    more pieces than characters+marker (char level is the starting
    point), (b) strictly beat the char-level baseline once any merge
    fires, and (c) give every word at least one token."""
    rows = REGISTRY["bpe_encode_fertility"].fn(spark, sf_dir).collect()
    from my_favorite_etl_pipeline_spark.functions import text as TX
    from my_favorite_etl_pipeline_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    base = {
        r.lang: (r.n_words, r.n_chars_plus_marker)
        for r in docs.select(
            "lang", F.explode(TX.tokens("text")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("word") + 1).alias("n_chars_plus_marker"),
        )
        .collect()
    }
    assert {r.lang for r in rows} == set(base)
    for r in rows:
        n_words, char_tokens = base[r.lang]
        assert r.n_words == n_words
        assert n_words <= r.n_tokens < char_tokens
        assert r.fert_x10000 == (r.n_tokens * 10000) // r.n_words


def test_ivf_batch_agrees_with_single_query_index(spark, sf_dir):
    """The batch plan must reproduce the single-query index's answers:
    for query vec_id=0 (shared with embedding_topk_ivf, same label cells,
    same probe count), the batch's top-10 equals the single-query top-20's
    first 10 rows."""
    single = [
        (r.vec_id, r.cos_sim)
        for r in REGISTRY["embedding_topk_ivf"].fn(spark, sf_dir).collect()[:10]
    ]
    batch = REGISTRY["embedding_topk_ivf_batch"].fn(spark, sf_dir).collect()
    q0 = [(r.vec_id, r.cos_sim) for r in batch if r.query_id == 0]
    assert q0 == single
    # every query answered, each with exactly k ranked rows 1..10
    by_q: dict[int, list[int]] = {}
    for r in batch:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, 11)) for v in by_q.values())
    assert len(by_q) >= 5


def test_ivf_batch_probe_table_broadcasts(spark, sf_dir):
    """The per-query probe table and candidate join must broadcast — one
    corpus pass for the whole batch, no shuffle join against the corpus."""
    df = REGISTRY["embedding_topk_ivf_batch"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_js_divergence_bounds_and_coverage(spark, sf_dir):
    """JS divergence lies in [0, ln 2]; every source in the fixture gets a
    row; token counts reconcile with the corpus total."""
    rows = REGISTRY["corpus_js_divergence_by_source"].fn(spark, sf_dir).collect()
    from my_favorite_etl_pipeline_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources
    assert all(0.0 <= r.js_div <= math.log(2.0) + 1e-9 for r in rows)
    total = docs.select(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n")
    ).collect()[0].n
    assert sum(r.n_tokens for r in rows) == total


def test_kn_logprob_beats_laplace_on_seen_bigrams(spark, sf_dir):
    """Kneser-Ney invariants: every doc of >=2 tokens is scored; the
    per-doc score is a positive mean of -ln p with p in (0, 1); bigram
    counts reconcile with token counts; and the KN scores genuinely
    differ from the Laplace rung (same docs, different model)."""
    rows = REGISTRY["bigram_kn_logprob_scores"].fn(spark, sf_dir).collect()
    from my_favorite_etl_pipeline_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    exp = {
        r.doc_id: r.nb
        for r in docs.select(
            "doc_id", (F.size(F.split("text", " ")) - 1).alias("nb")
        )
        .filter(F.col("nb") >= 1)
        .collect()
    }
    got = {r.doc_id: r.n_bigrams for r in rows}
    assert got == exp
    assert all(r.avg_neg_logprob_kn > 0.0 for r in rows)
    lap = {
        r.doc_id: r.avg_neg_logprob
        for r in REGISTRY["bigram_logprob_scores"].fn(spark, sf_dir).collect()
    }
    diffs = sum(
        1 for r in rows if abs(r.avg_neg_logprob_kn - lap[r.doc_id]) > 1e-4
    )
    assert diffs > len(rows) // 2, "KN collapsed onto the Laplace model"


def test_kn_probability_mass_bounded(spark, sf_dir):
    """For each observed context w1, the summed KN probability over its
    OBSERVED continuations must stay < 1 (the discount reserves mass for
    unseen continuations) — the defining property the smoothing exists
    for, checked directly on the model tables."""
    from my_favorite_etl_pipeline_spark.functions import text as TX
    from my_favorite_etl_pipeline_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    ta = docs.select(TX.tokens("text").alias("t")).filter(F.size("t") >= 2)
    bg = ta.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.struct(
                    F.get("t", i).alias("w1"), F.get("t", i + 1).alias("w2")
                ),
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("double").alias("c"))
    c1 = c2.groupBy("w1").agg(
        F.sum("c").alias("cu"), F.count(F.lit(1)).cast("double").alias("fanout")
    )
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).cast("double").alias("cc"))
    tt = float(c2.count())
    d = 0.75
    mass = (
        c2.join(c1, "w1")
        .join(cont, "w2")
        .groupBy("w1")
        .agg(
            F.sum(
                (F.col("c") - d) / F.col("cu")
                + d * F.col("fanout") / F.col("cu") * (F.col("cc") / tt)
            ).alias("m")
        )
        .agg(F.max("m").alias("mx"), F.min("m").alias("mn"))
        .collect()[0]
    )
    assert 0.0 < mass.mn and mass.mx < 1.0 + 1e-9


def test_psi_drift_invariants(spark, sf_dir):
    """PSI is non-negative (each term (p-q)ln(p/q) >= 0); every event
    type gets a row; window totals reconcile with the event count; and
    identical windows give PSI exactly 0 (self-drift sanity via the
    formula on equal distributions)."""
    rows = REGISTRY["psi_drift_by_window"].fn(spark, sf_dir).collect()
    from my_favorite_etl_pipeline_spark.sources.tables import load

    events = load(spark, sf_dir, "events")
    n_types = events.select("event_type").distinct().count()
    assert len(rows) == n_types
    assert all(r.psi >= 0.0 for r in rows)
    total = events.count()
    assert sum(r.n_ref + r.n_cur for r in rows) == total
    # the fixture's generator is time-stationary: a 10-bucket histogram
    # over ~1-2k events per type should not register alarm-level drift
    assert all(r.psi < 0.2 for r in rows)


def test_psi_bucket_projection_is_single_agg(spark, sf_dir):
    """The corpus-sized work must collapse into ONE hash aggregate over
    the map-only bucket projection — no corpus-sized join or second scan
    of events past the first agg (grid joins are broadcasts)."""
    df = REGISTRY["psi_drift_by_window"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan


def test_source_overlap_matrix_consistency(spark, sf_dir):
    """The containment matrix must be a full |sources|^2 grid; overlap
    counts are bounded by the source size; the directed edge evidence is
    symmetric in EXISTENCE (A overlaps B iff B overlaps A, though the
    shares differ); and every (n_overlap > 0) cell is backed by at least
    one >=0.9 pair from the exact ssjoin contract."""
    rows = REGISTRY["source_overlap_matrix"].fn(spark, sf_dir).collect()
    from my_favorite_etl_pipeline_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources * n_sources
    by = {(r.src_a, r.src_b): r for r in rows}
    for r in rows:
        assert 0 <= r.n_overlap <= r.n_docs_a
        assert r.share_x10000 == (r.n_overlap * 10000) // r.n_docs_a
        assert (r.n_overlap > 0) == (by[(r.src_b, r.src_a)].n_overlap > 0)
    assert sum(r.n_overlap for r in rows) > 0, "fixture has no near-dups?"
