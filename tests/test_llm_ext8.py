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
