"""Ground-truth tests for the r11 curation operators (plans/llm_ext11.py):
semantic decontamination, token-budget selection, and PageRank-canonical
dedup. Each test recomputes the operator's contract from the raw fixture
with an INDEPENDENT method (pure Python / a second registered query), the
pattern the image-dHash and audio-envelope ops established."""

from __future__ import annotations

import math
import os

import pyarrow.parquet as pq
import pytest

import my_favorite_etl_pipeline_spark as engine
from tests.conftest import SF_DIR


def _tokens(text: str) -> list[str]:
    return text.split(" ")


def test_token_budget_select_matches_pure_python(spark):
    """The kept set and every cum_tokens value must equal the definition:
    inclusive running token total over (ratio DESC, doc_id) order, cut at
    total//4 — recomputed in pure Python from the parquet."""
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pylist()
    scored = []
    for d in docs:
        t = _tokens(d["text"])
        ratio = (len(set(t)) * 1_000_000) // len(t)
        scored.append((d["doc_id"], len(t), ratio))
    budget = sum(n for _, n, _ in scored) // 4
    expected = {}
    cum = 0
    for doc_id, n, ratio in sorted(scored, key=lambda x: (-x[2], x[0])):
        cum += n
        if cum > budget:
            break  # prefix rule: once over budget nothing later can fit
        expected[doc_id] = (n, ratio, cum)
    got = {
        r.doc_id: (r.n_tokens, r.ratio_x1e6, r.cum_tokens)
        for r in engine.queries()["token_budget_select"](spark, SF_DIR).collect()
    }
    assert got == expected
    assert 0 < len(expected) < len(scored)  # non-vacuous: a real cut happened


def test_semantic_decontaminate_flags_are_correct(spark):
    """Every flagged row: train-side doc, eval-side neighbor, integer
    quantized cosine ≥ τ — and the score itself replays in pure Python
    (floor-quantized vectors, exact isqrt, nonneg floor division)."""
    import hashlib

    rows = engine.queries()["semantic_decontaminate_topk"](spark, SF_DIR).collect()
    assert rows, "threshold must be non-vacuous on the fixture"
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in pq.read_table(os.path.join(SF_DIR, "embeddings.parquet")).to_pylist()
    }

    def is_eval(i: int) -> bool:
        return hashlib.md5(str(i).encode()).hexdigest()[0] == "0"

    def int_cos(a, b):
        qa = [math.floor(x * 10_000) for x in a]
        qb = [math.floor(x * 10_000) for x in b]
        d = sum(x * y for x, y in zip(qa, qb))
        sa = math.isqrt(sum(x * x for x in qa))
        sb = math.isqrt(sum(x * x for x in qb))
        den = sa * sb
        return 0 if den == 0 else ((d + 2 * den) * 10_000) // den - 20_000

    for r in rows:
        assert not is_eval(r.doc_id), "flagged docs must be train-side"
        assert is_eval(r.nearest_eval_id), "neighbor must be eval-side"
        assert r.cos_x1e4 >= 3000
        assert r.cos_x1e4 == int_cos(emb[r.doc_id], emb[r.nearest_eval_id])


def test_dedup_canonical_pagerank_composition(spark):
    """Every emitted keeper must (a) belong to its own component per the
    independently-checked dedup_cluster_components query, (b) carry the
    max PageRank among the component's members per the independently-
    checked knn_graph_pagerank query (ties + unscored members -> lowest
    id), and (c) only multi-member components appear."""
    qs = engine.queries()
    cards = qs["dedup_canonical_pagerank"](spark, SF_DIR).collect()
    assert cards, "fixture has near-dup clusters"
    comp = {}
    for r in qs["dedup_cluster_components"](spark, SF_DIR).collect():
        comp.setdefault(r.component, []).append(r.doc_id)
    pr = {
        r.vec_id: r.pagerank_x1e6
        for r in qs["knn_graph_pagerank"](spark, SF_DIR).collect()
    }
    multi = {c: m for c, m in comp.items() if len(m) >= 2}
    assert {r.component for r in cards} == set(multi)
    for r in cards:
        members = multi[r.component]
        assert r.n_members == len(members)
        best = min(members, key=lambda i: (-pr.get(i, 0), i))
        assert r.keep_id == best
        assert r.keep_pagerank_x1e6 == pr.get(best, 0)


def test_token_budget_select_plan_has_no_global_sort(spark):
    """The SCALE.md claim, pinned: the selection logic runs with ZERO
    single-partition exchanges — the cumsum window partitions on the
    ratio key (hashpartitioning + partition-local sort) and the only
    range partitioning is the final presentation orderBy."""
    import re

    df = engine.queries()["token_budget_select"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    # tolerant match (ADVICE r11): the cumsum window must hash-partition on
    # the ratio key, but the exact rendering ("hashpartitioning(ratio#12L,
    # 32)") is Spark-version-dependent formatting — accept any
    # hashpartitioning whose first key is the ratio column.
    assert re.search(r"hashpartitioning\(\s*ratio", plan), plan[:2000]


def test_token_budget_ratio_is_integer_exact(spark):
    """ratio_x1e6 = (distinct·10⁶) div total must replay exactly (the
    portable integer key both engines rank on)."""
    got = engine.queries()["token_budget_select"](spark, SF_DIR).collect()
    docs = {
        d["doc_id"]: d["text"]
        for d in pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pylist()
    }
    for r in got[:50]:
        t = _tokens(docs[r.doc_id])
        assert r.ratio_x1e6 == (len(set(t)) * 1_000_000) // len(t)
        assert r.n_tokens == len(t)
