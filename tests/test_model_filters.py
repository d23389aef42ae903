"""X4+ — curation round 5: model-based quality filter and CCNet
perplexity buckets (plans/llm_ext5.py). Planted docs verify the scorer's
arithmetic and the tercile thresholds."""

import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from my_favorite_etl_pipeline_spark.registry import REGISTRY


def _w(feat: str) -> int:
    """Python twin of the hashed weight: md5 first 8 hex chars % 20001 - 1e4."""
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % 20001 - 10000


def test_quality_classifier_matches_hand_hash(spark, tmp_path, sf_dir):
    out = {
        r.doc_id: r
        for r in REGISTRY["quality_classifier_linear"].fn(spark, sf_dir).collect()
    }
    import duckdb

    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' LIMIT 5"
        ).fetchall()
    )
    assert texts, "fixture should have documents"
    for doc_id, text in texts.items():
        toks = text.split(" ")
        feats = toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
        wsum = sum(_w(x) for x in feats)
        row = out[doc_id]
        assert row.n_feats == len(feats)
        assert row.keep == (wsum >= 0)
        expect = 1.0 / (1.0 + math.exp(-(wsum / (len(feats) * 10000.0))))
        assert abs(row.quality_score - expect) < 5e-5


def test_quality_classifier_keep_is_integer_exact(spark, sf_dir):
    # keep must be wsum >= 0 (integer gate), i.e. exactly score >= 0.5 up
    # to the monotone sigmoid — no row may contradict the rounded score.
    rows = REGISTRY["quality_classifier_linear"].fn(spark, sf_dir).collect()
    for r in rows:
        if r.quality_score > 0.5001:
            assert r.keep
        if r.quality_score < 0.4999:
            assert not r.keep


def test_ppl_buckets_tercile_counts_and_order(spark, sf_dir):
    df = REGISTRY["perplexity_buckets_ccnet"].fn(spark, sf_dir)
    rows = df.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        n = len(rs)
        heads = [r for r in rs if r.ppl_bucket == "head"]
        tails = [r for r in rs if r.ppl_bucket == "tail"]
        # by-threshold terciles: head >= n/3 (ties included), tail may be
        # smaller but the ordering invariant is strict:
        assert len(heads) * 3 >= n
        if heads and tails:
            assert max(r.unigram_nlp for r in heads) < min(
                r.unigram_nlp for r in tails
            )
        # same rounded score => same bucket
        seen = {}
        for r in rs:
            assert seen.setdefault(r.unigram_nlp, r.ppl_bucket) == r.ppl_bucket


def test_ppl_buckets_head_is_common_token_doc(spark):
    # planted corpus, one lang: a doc of corpus-common tokens must score
    # lower (head) than a doc of singleton tokens (tail).
    common = " ".join(["the"] * 30)
    rare = " ".join(f"zq{i}" for i in range(30))
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=common, lang="en", source="s", n_chars=1) for i in range(4)]
        + [Row(doc_id=9, text=rare, lang="en", source="s", n_chars=1)]
    )
    import tempfile, os

    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in REGISTRY["perplexity_buckets_ccnet"].fn(spark, d).collect()}
    assert out[0].ppl_bucket == "head"
    assert out[9].ppl_bucket == "tail"
    assert out[0].unigram_nlp < out[9].unigram_nlp
