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
    decode_image,
    decode_png_gray,
    documents_as_media,
    encode_png_gray,
    extract_features,
    png_encoded_len,
    split_png_frames,
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


def test_png_codec_roundtrip():
    """encode → decode recovers dimensions AND pixel values exactly."""
    px = lambda x, y: (7 * x + 13 * y) % 256
    buf = encode_png_gray(5, 3, px)
    assert len(buf) == png_encoded_len(5, 3)
    assert decode_image(buf) == (5, 3, 1)
    w, h, pixels = decode_png_gray(buf)
    assert (w, h) == (5, 3)
    assert list(pixels) == [px(x, y) for y in range(3) for x in range(5)]


def test_decode_real_headers():
    import struct

    # GIF89a logical screen 320×200
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    assert decode_image(gif) == (320, 200, 1)
    # BMP with BITMAPINFOHEADER, top-down (negative height)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 64, -48) + b"\x00" * 10
    assert decode_image(bmp) == (64, 48, 1)
    with pytest.raises(ValueError):
        decode_image(b"not an image at all")
    with pytest.raises(ValueError):
        decode_image(None)


def test_concatenated_png_frames():
    f1 = encode_png_gray(4, 4, lambda x, y: x)
    f2 = encode_png_gray(4, 4, lambda x, y: y)
    container = f1 + f2 + f1
    assert decode_image(container) == (4, 4, 3)
    frames = split_png_frames(container)
    assert frames == [f1, f2, f1]
    # each frame independently decodable
    assert all(decode_image(f) == (4, 4, 1) for f in frames)


def test_resize_media_real(spark, sf_dir):
    from my_favorite_etl_pipeline_spark.operators.multimodal import resize_media
    from my_favorite_etl_pipeline_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").limit(10)
    # resize operates on single-frame PNGs
    media = documents_as_media(docs, max_frames=1)
    out = resize_media(media, target_w=8, target_h=8).collect()
    assert len(out) == 10
    for r in out:
        assert (r.width, r.height) == (8, 8)
        # the output is itself a real PNG with the target dimensions
        assert decode_image(bytes(r.payload)) == (8, 8, 1)


def test_sample_frames_fanout(spark, sf_dir):
    from my_favorite_etl_pipeline_spark.operators.multimodal import sample_frames
    from my_favorite_etl_pipeline_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").limit(6)
    media = documents_as_media(docs)  # 1 + doc_id % 3 frames per container
    frames = sample_frames(media, n_frames=4).collect()
    expected = {r.doc_id: 1 + r.doc_id % 3 for r in docs.collect()}
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
        # every sampled frame is a complete, decodable PNG
        assert decode_image(bytes(r.frame_payload))[2] == 1
    assert {k: len(v) for k, v in by_media.items()} == expected
    assert all(sorted(v) == list(range(len(v))) for v in by_media.values())


def test_multimodal_pipeline(spark, sf_dir):
    from my_favorite_etl_pipeline_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").limit(20)
    media = documents_as_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        w, h, n = 1 + r.media_id % 16, 1 + (r.media_id // 16) % 16, 1 + r.media_id % 3
        assert (r.width, r.height, r.n_frames) == (w, h, n)
        assert r.byte_len == n * png_encoded_len(w, h)


def test_audio_envelope_near_dups_ground_truth(spark):
    """audio_envelope_near_dups (r10): the full report at sf0.001 must equal
    a pure-Python recompute from the documents_as_audio sample formula —
    fingerprints, banded candidate generation, Hamming verify, and the
    per-item (count, nearest-neighbor) aggregation."""
    import itertools

    import my_favorite_etl_pipeline_spark as engine

    rows = engine.queries()["audio_envelope_near_dups"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    n_docs = 500
    fps = {}
    for d in range(n_docs):
        n, ch = 100 + d % 50, 1 + d % 2
        m = n * ch
        samples = [(d * 31 + 7 * i) % 256 for i in range(m)]
        e = [
            sum(abs(x - 128) for x in samples[(s * m) // 64 : ((s + 1) * m) // 64])
            for s in range(64)
        ]
        v = 0
        for s in range(63):
            if e[s + 1] > e[s]:
                v |= 1 << s
        if 8 <= bin(v).count("1") <= 55:
            fps[d] = ((ch, 8000 * (1 + d % 3)), v)
    pairs = {}
    for (d1, (k1, v1)), (d2, (k2, v2)) in itertools.combinations(fps.items(), 2):
        if k1 != k2:
            continue
        if not any(((v1 >> (b * 16)) & 0xFFFF) == ((v2 >> (b * 16)) & 0xFFFF) for b in range(4)):
            continue  # banding must not see this pair
        ham = bin(v1 ^ v2).count("1")
        if ham <= 3:
            pairs[(d1, d2)] = ham
    assert pairs, "fixture produced no near-dup pairs — test is vacuous"
    want = {}
    for d in fps:
        nbrs = sorted(
            (h, (b if a == d else a))
            for (a, b), h in pairs.items()
            if d in (a, b)
        )
        want[d] = (
            len(nbrs),
            nbrs[0][1] if nbrs else -1,
            nbrs[0][0] if nbrs else 99,
        )
    assert len(rows) == len(fps)
    for r in rows:
        assert (r.n_near_dups, r.nn_id, r.nn_ham) == want[r.media_id], r


def test_image_dhash_report_consistency(spark):
    """image_dhash_near_dups (r10): report invariants — directed near-dup
    degrees sum even (pairs are symmetric), nearest-neighbor fields are
    coherent on both the matched and unmatched arms."""
    import my_favorite_etl_pipeline_spark as engine

    rows = engine.queries()["image_dhash_near_dups"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    assert sum(r.n_near_dups for r in rows) % 2 == 0
    for r in rows:
        if r.n_near_dups:
            assert 0 <= r.nn_ham <= 4 and r.nn_id >= 0 and r.nn_id != r.media_id
        else:
            assert (r.nn_id, r.nn_ham) == (-1, 99)
