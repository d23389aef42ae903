"""X4/X5 — text-analysis functions and multimodal plumbing ([EXT])."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from my_favorite_etl_pipeline_spark.functions.text import (
    bpe_ish_tokens,
    fingerprint,
    shingles,
    token_count,
)
from my_favorite_etl_pipeline_spark.operators.multimodal import (
    decode_image_stub,
    documents_as_media,
    extract_features,
)


def test_shingles(spark):
    df = spark.createDataFrame([Row(t="a b c d"), Row(t="a b"), Row(t="x x x x x")])
    out = [r.s for r in df.select(shingles(F.col("t")).alias("s")).collect()]
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == []  # shorter than n → empty, not error
    assert out[2] == ["x x x"]  # distinct


def test_token_counts(spark):
    df = spark.createDataFrame([Row(t="hello world, it's 42 degrees!")])
    row = df.select(
        token_count("t").alias("ws"), F.size(bpe_ish_tokens("t")).alias("bpe")
    ).collect()[0]
    assert row.ws == 5
    # hello | world | , | it | ' | s | 42 | degrees | !
    assert row.bpe == 9


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame([Row(t="  Hello World "), Row(t="hello world")])
    a, b = [r.f for r in df.select(fingerprint("t").alias("f")).collect()]
    assert a == b and len(a) == 32


def test_scrub_pii(spark):
    from my_favorite_etl_pipeline_spark.functions.text import scrub_pii

    df = spark.createDataFrame(
        [
            Row(t="mail me at john.doe+x@corp.example.org today"),
            Row(t="call +1 (555) 123-4567 or visit https://a.b/c?d=1 now"),
            Row(t="nothing sensitive here"),
        ]
    )
    out = [r.c for r in df.select(scrub_pii("t").alias("c")).collect()]
    assert out[0] == "mail me at <EMAIL> today"
    assert out[1] == "call <PHONE> or visit <URL> now"
    assert out[2] == "nothing sensitive here"


def test_decode_stub_deterministic():
    w, h, n = decode_image_stub(b"x" * 100)
    assert (w, h, n) == (16 + 100 % 64, 16 + (100 // 64) % 64, 1 + 100 % 4)
    with pytest.raises(NotImplementedError):
        decode_image_stub(None)


def test_resize_media(spark, sf_dir):
    from my_favorite_etl_pipeline_spark.operators.multimodal import resize_media
    from my_favorite_etl_pipeline_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").limit(10)
    out = resize_media(documents_as_media(docs), target_w=8, target_h=8).collect()
    assert len(out) == 10
    for r in out:
        assert (r.width, r.height) == (8, 8)
        assert len(r.payload) <= 64  # resized payload bounded by target dims


def test_sample_frames_fanout(spark, sf_dir):
    from my_favorite_etl_pipeline_spark.operators.multimodal import sample_frames
    from my_favorite_etl_pipeline_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").limit(5)
    media = documents_as_media(docs)
    frames = sample_frames(media, n_frames=4).collect()
    assert len(frames) == 20  # 5 media × 4 frames: 1:N fan-out
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_media.values())


def test_multimodal_pipeline(spark, sf_dir):
    from my_favorite_etl_pipeline_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").limit(20)
    media = documents_as_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    src = {r.doc_id: len(r.text.encode()) for r in docs.collect()}
    for r in rows:
        assert r.byte_len == src[r.media_id]
        assert r.width == 16 + r.byte_len % 64
