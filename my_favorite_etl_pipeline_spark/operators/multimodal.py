"""Multimodal column plumbing ([EXT] X5, SURVEY.md §2.9).

Images/audio/video ride through the engine as opaque ``binary`` payloads
plus typed metadata; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so Python touches data in columnar batches, never row by
row. The decode itself is STUBBED (no image/audio libs in this container):
``decode_image_stub`` derives deterministic fake dimensions/features from
the bytes, and the real-library call site is marked. Everything around the
stub — schema, batch iteration, partition behavior, projection pruning —
is real and tested.

Scale notes: payload columns are projected as late as possible (Catalyst
prunes them from any plan stage that doesn't need them); feature extraction
is embarrassingly parallel map-only work, so the only knob that matters is
input split size (``spark.sql.files.maxPartitionBytes``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .scaling import ensure_min_partitions

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("byte_len", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder — deterministic fake (width, height, n_frames).

    Real implementation would be e.g.::

        from PIL import Image          # not installed in this container
        img = Image.open(io.BytesIO(payload)); return (*img.size, 1)

    The fake derives stable values from the byte length so oracle checks
    can reproduce them arithmetically.
    """
    if payload is None:
        raise NotImplementedError("real decode requires an image library")
    n = len(payload)
    return 16 + n % 64, 16 + (n // 64) % 64, 1 + n % 4


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    One Python worker per partition, pandas batches in/out; the payload
    column never survives past this operator (project-early discipline).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return ensure_min_partitions(media.select("media_id", "payload")).mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)


def resize_stub(payload: bytes, target_w: int, target_h: int) -> bytes:
    """STUB resize — deterministic byte-level downsample standing in for::

        from PIL import Image      # not installed in this container
        Image.open(io.BytesIO(payload)).resize((target_w, target_h))

    Keeps every ``len(payload) // (target_w*target_h)``-th byte so output
    size is exactly ``target_w*target_h`` (or the input, if smaller) —
    enough structure for tests to verify the batching plumbing end to end.
    """
    if payload is None:
        raise NotImplementedError("real resize requires an image library")
    n_out = target_w * target_h
    if len(payload) <= n_out:
        return payload
    step = len(payload) / n_out
    return bytes(payload[int(i * step)] for i in range(n_out))


def resize_media(media: DataFrame, target_w: int = 32, target_h: int = 32) -> DataFrame:
    """X5 — batched media resize via mapInPandas (decode→resize→re-encode
    shape; stubbed decode). Map-only: no shuffle, scales with input splits."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [resize_stub(p, target_w, target_h) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return ensure_min_partitions(media.select("media_id", "payload")).mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """X5 — frame sampling: one input row fans out to ≤ ``n_frames`` rows
    (video → frame grid). mapInPandas is the fan-out-capable shape (a
    pandas_udf must stay 1:1); frames of a payload stay in one partition.

    The STUB splits the payload into equal byte slices standing in for
    decoded video frames (real impl: pyav/ffmpeg frame extraction).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    raise NotImplementedError("real frame-sampling requires a video library")
                k = min(n_frames, max(1, len(payload)))
                step = len(payload) // k
                for i in range(k):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(payload[i * step : (i + 1) * step]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_payload": frames})

    return ensure_min_partitions(media.select("media_id", "payload")).mapInPandas(run, FRAME_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Fixture adapter: treat document text bytes as opaque media payloads.

    Gives the multimodal path real (deterministic) binary data to chew on
    without shipping binary fixtures.
    """
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.length(F.col("text")).cast("int").alias("byte_len"),
    )
