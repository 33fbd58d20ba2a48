"""Multimodal (binary) column plumbing.

The reference stores opaque vectors + payloads in Lance; the analogous
LLM-pipeline need is image/audio/video blobs as ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` (the
only sane shape for per-blob Python decode at scale: each task pulls
columnar batches, runs the decoder over the batch, emits a typed
batch — no per-row serialization).

Real image/audio decoders are NOT installed in this container
(SURVEY.md §6): ``decode_stub`` is a deterministic fake behind the
same signature — the Spark-side plumbing (schema, batching,
partitioning) is real and oracle-checked via byte-level metadata.
"""

from __future__ import annotations

from collections.abc import Iterator
from struct import error as struct_error

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id long, n_bytes long, head_hex string, feature array<double>"


def to_binary_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in blob table: utf-8 bytes of the text as the binary
    payload (the container has no media files; the column type,
    not the codec, is what the pipeline exercises)."""
    return docs.select("doc_id", F.encode(F.col(text_col), "utf-8").alias("content"))


def decode_stub(content: bytes) -> list[float]:
    """Deterministic fake 'decoder' (real one would be PIL/ffmpeg —
    unavailable here; raise-on-import is the other honest option but a
    deterministic fake keeps the distributed plumbing testable)."""
    n = len(content)
    return [float(n), float(content[0] if n else 0), float(sum(content[:16]) % 997)]


RESIZE_SCHEMA = "doc_id long, width int, height int, n_bytes long, thumb binary"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_offset long, frame binary"


def resize_stub(content: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: a real impl decodes with PIL and
    re-encodes; the fake keeps a deterministic byte slice so the
    distributed plumbing (schema, batch shape, output size bound) is
    testable without image libs (SURVEY §6)."""
    budget = max(width * height // 64, 1)
    return (content * (budget // max(len(content), 1) + 1))[:budget]


def resize_images(blobs: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """mapInPandas 'resize' pass: one Arrow batch in, one typed batch
    out with bounded thumb bytes per row."""
    from lance_flink_spark.session import ship_package

    ship_package(blobs.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    # REAL resize for PPM/PNG/baseline-JPEG blobs; stub
                    # for formats that would need ffmpeg (per-blob
                    # dispatch)
                    "thumb": pdf["content"].map(
                        lambda b: resize_ppm(b, width, height)
                        if bytes(b[:2]) == b"P6"
                        else resize_png(bytes(b), width, height)
                        if bytes(b[:8]) == _PNG_MAGIC
                        else resize_jpeg(bytes(b), width, height)
                        if bytes(b[:3]) == _JPEG_MAGIC
                        else resize_stub(b, width, height)
                    ),
                }
            )

    return blobs.mapInPandas(batches, schema=RESIZE_SCHEMA)


def sample_frames(blobs: DataFrame, every_n_bytes: int = 256, max_frames: int = 4) -> DataFrame:
    """mapInPandas 'video frame sampling' pass. MP4 blobs get REAL
    keyframe sampling: the ISO-BMFF sample tables (functions/mp4.py)
    locate every sync sample's byte range in mdat, and the first
    ``max_frames`` keyframes are emitted at their true offsets. Other
    blobs fall back to fixed-stride slices. One input row fans out to
    multiple typed output rows — the batch-shape case decode pipelines
    hit."""
    from lance_flink_spark.session import ship_package

    ship_package(blobs.sparkSession)

    def mp4_keyframes(content: bytes) -> list[tuple[int, int]]:
        from lance_flink_spark.functions.mp4 import mp4_samples

        keys = [s for s in mp4_samples(bytes(content)) if s["sync"]]
        return [(s["offset"], s["size"]) for s in keys[:max_frames]]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if bytes(content[4:8]) == b"ftyp":
                    try:
                        spans = mp4_keyframes(content)
                    except (ValueError, struct_error):
                        spans = []  # corrupt container → stride fallback
                else:
                    spans = []
                if not spans:
                    spans = [
                        (i * every_n_bytes, 32)
                        for i in range(
                            min(max_frames, max(len(content) // every_n_bytes, 1))
                        )
                    ]
                for i, (off, size) in enumerate(spans):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_offset"].append(off)
                    rows["frame"].append(bytes(content[off : off + min(size, 32)]))
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(batches, schema=FRAMES_SCHEMA)


def extract_metadata(blobs: DataFrame) -> DataFrame:
    """mapInPandas pass: per-blob byte length, head bytes (hex of the
    first 4 utf-8 characters, matching the SQL oracle), and the stub
    feature vector. One Arrow round-trip, batch-at-a-time."""
    from lance_flink_spark.session import ship_package

    ship_package(blobs.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": content.map(len).astype("int64"),
                    "head_hex": content.map(
                        lambda b: b.decode("utf-8", errors="ignore")[:4].encode("utf-8").hex()
                    ),
                    "feature": content.map(decode_stub),
                }
            )

    return blobs.mapInPandas(batches, schema=META_SCHEMA)


# ---------- REAL codecs for container-decodable formats ----------
#
# PIL/ffmpeg are absent here (SURVEY §6), but these real formats need
# nothing beyond numpy/stdlib: PPM (P6) images, PNG (zlib inflate +
# the four scanline filters — see decode_png below), baseline AND
# progressive JPEG (Huffman + dequant + numpy IDCT — see decode_jpeg
# below), PCM WAV audio, and MP4 container demux (functions/mp4.py).
# The stubs above remain only for codec bitstreams that genuinely
# require external decoders (H.264/AV1 sample payloads); these paths
# are REAL decode/resize/feature implementations with the same
# mapInPandas batch shape.

import io as _io
import wave as _wave

import numpy as np


def encode_ppm(arr: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_ppm(content: bytes) -> "np.ndarray":
    """Binary PPM (P6) → (h, w, 3) uint8. Pure numpy/stdlib parse."""
    if not content.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace separated,
    # comments (#...) allowed between tokens
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while content[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(content[start:pos]))
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    pos += 1  # single whitespace after maxval
    raw = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3)


def resize_ppm(content: bytes, width: int, height: int) -> bytes:
    """REAL image resize for PPM blobs: nearest-neighbor index map
    (the deterministic choice — mean-pooling differs per rounding
    mode), re-encoded as PPM."""
    img = decode_ppm(content)
    h, w, _ = img.shape
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_ppm(img[yi][:, xi])


def image_features(content: bytes) -> list[float]:
    """REAL image features for PPM blobs: per-channel means + stddev
    of the grayscale."""
    img = decode_ppm(content).astype(np.float64)
    gray = img.mean(axis=2)
    return [
        float(img[..., 0].mean()),
        float(img[..., 1].mean()),
        float(img[..., 2].mean()),
        float(gray.std()),
    ]


def audio_features(content: bytes) -> list[float]:
    """REAL audio features for PCM WAV blobs (stdlib wave + numpy):
    duration (s), RMS amplitude (normalized), zero-crossing rate, and
    spectral centroid (Hz, rFFT magnitude-weighted)."""
    with _wave.open(_io.BytesIO(content), "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        raw = f.readframes(n)
    if width != 2:
        raise ValueError(f"unsupported sample width {width}")
    x = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32768.0
    if x.size == 0:
        return [0.0, 0.0, 0.0, 0.0]
    rms = float(np.sqrt((x * x).mean()))
    zcr = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean())
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(x.size, d=1.0 / sr)
    centroid = float((freqs * mag).sum() / max(mag.sum(), 1e-12))
    return [x.size / sr, rms, zcr, centroid]


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (8-bit only; palette type 3 would
# need a PLTE lookup — not emitted by our encoder, rejected cleanly)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(content: bytes) -> "np.ndarray":
    """REAL PNG decode — stdlib ``zlib`` inflate + the four scanline
    filters (Sub/Up/Average/Paeth) over numpy rows; no PIL.

    Supports non-interlaced 8-bit gray / gray+alpha / RGB / RGBA
    (color types 0/4/2/6) — the shapes a training pipeline actually
    stores. Returns (h, w, channels) uint8."""
    import struct
    import zlib

    if content[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or interlace != 0 or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG shape (depth={depth} color={color} interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).astype(np.int64)
        if ftype == 0:  # None
            recon = line
        elif ftype == 1:  # Sub: recon[x] = raw[x] + recon[x-ch]
            # per channel this is a cumulative sum mod 256 — vectorized
            recon = line.reshape(w, ch).cumsum(axis=0).reshape(stride) % 256
        elif ftype == 2:  # Up
            recon = (line + prev) % 256
        elif ftype == 3:  # Average — sequential in x (left operand)
            recon = line.copy()
            for x in range(stride):
                left = recon[x - ch] if x >= ch else 0
                recon[x] = (line[x] + (left + prev[x]) // 2) % 256
        elif ftype == 4:  # Paeth — sequential in x
            recon = line.copy()
            for x in range(stride):
                a = recon[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                recon[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = recon
        prev = recon.astype(np.int64)
    return out.reshape(h, w, ch)


def encode_png(arr: "np.ndarray", filter_type: int = 0) -> bytes:
    """(h, w[, ch]) uint8 → PNG. Applies the given scanline filter to
    every row (0=None is the fast path; 1-4 exist so tests can pin
    each defilter branch against a round-trip)."""
    import struct
    import zlib

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    a = arr.astype(np.int64)
    stride = w * ch
    flat = a.reshape(h, stride)
    lines = []
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        recon = flat[y]
        if filter_type == 0:
            raw = recon
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, dtype=np.int64), recon[:-ch]])
            raw = (recon - left) % 256
        elif filter_type == 2:
            raw = (recon - prev) % 256
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, dtype=np.int64), recon[:-ch]])
            raw = (recon - (left + prev) // 2) % 256
        elif filter_type == 4:
            raw = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                pa_ = recon[x - ch] if x >= ch else 0
                pb_ = prev[x]
                pc_ = prev[x - ch] if x >= ch else 0
                p = pa_ + pb_ - pc_
                da, db, dc = abs(p - pa_), abs(p - pb_), abs(p - pc_)
                pred = pa_ if (da <= db and da <= dc) else (pb_ if db <= dc else pc_)
                raw[x] = (recon[x] - pred) % 256
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines.append(bytes([filter_type]) + bytes(raw.astype(np.uint8)))
        prev = recon

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def resize_png(content: bytes, width: int, height: int) -> bytes:
    """REAL PNG resize: decode → nearest-neighbor index map (same
    deterministic policy as resize_ppm) → re-encode (filter 0)."""
    img = decode_png(content)
    h, w, _ = img.shape
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_png(img[yi][:, xi])


def png_features(content: bytes) -> list[float]:
    """REAL PNG features: per-channel means padded to 3 (gray repeats)
    + grayscale stddev — same output contract as image_features."""
    img = decode_png(content).astype(np.float64)
    rgb = img[..., :3] if img.shape[2] >= 3 else np.repeat(img[..., :1], 3, axis=2)
    gray = rgb.mean(axis=2)
    return [
        float(rgb[..., 0].mean()),
        float(rgb[..., 1].mean()),
        float(rgb[..., 2].mean()),
        float(gray.std()),
    ]


def decode_auto(content: bytes) -> list[float]:
    """Magic-sniffing feature decoder: REAL paths for PPM ('P6'), PNG
    (8-byte signature), baseline JPEG (FFD8FF), WAV ('RIFF'), and MP4
    containers ('ftyp' at offset 4 — box demux, functions/mp4.py);
    deterministic stub only for blobs that genuinely need external
    codecs (H.264/AV1 sample payloads, unrecognized formats)."""
    if content[:2] == b"P6":
        return image_features(content)
    if content[:8] == _PNG_MAGIC:
        return png_features(content)
    if content[:3] == _JPEG_MAGIC:
        try:
            return jpeg_features(content)
        except ValueError:
            return decode_stub(content)  # truncated/garbage after magic
    if content[:4] == b"RIFF":
        return audio_features(content)
    if content[4:8] == b"ftyp":
        from lance_flink_spark.functions.mp4 import mp4_features

        try:
            return mp4_features(content)
        except (ValueError, struct_error):
            return decode_stub(content)  # fragmented/corrupt container
    return decode_stub(content)


def extract_features(blobs: DataFrame) -> DataFrame:
    """mapInPandas feature pass with REAL decode for PPM/WAV blobs
    (decode_auto): same batch shape as extract_metadata, format
    dispatch per blob inside the Arrow batch."""
    from lance_flink_spark.session import ship_package

    ship_package(blobs.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": content.map(len).astype("int64"),
                    "head_hex": content.map(lambda b: bytes(b[:4]).hex()),
                    "feature": content.map(decode_auto),
                }
            )

    return blobs.mapInPandas(batches, schema=META_SCHEMA)


# ---------- REAL baseline JPEG codec (stdlib + numpy, no PIL) ----------
#
# Baseline (non-progressive) JFIF needs nothing beyond what this
# container has: marker parsing, canonical Huffman tables, dequant,
# an 8x8 IDCT (one numpy matmul pair per block batch), and YCbCr->RGB.
# The encoder exists so tests can synthesize real compressed input
# without PIL; both use the spec's Annex-K quant tables and the
# standard Huffman tables. MP4 *containers* are demuxed for real
# (functions/mp4.py); the remaining documented stub surface (SURVEY §6)
# is codec-bitstream decode (H.264/AV1 sample payloads) — that
# genuinely needs external codecs, not just arithmetic.

_JPEG_MAGIC = b"\xff\xd8\xff"

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 quantization tables (luminance, chrominance), natural order
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Standard Huffman tables (Annex K.3): (bits[1..16], huffval)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> "np.ndarray":
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    C[0, :] = 1.0 / np.sqrt(8.0)
    return C


_DCT_M = _dct_matrix()


def _huff_codes(bits, vals):
    """Canonical Huffman: [(code, length)] aligned with vals."""
    out, code = [], 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((code, length))
            code += 1
        code <<= 1
    assert len(out) == len(vals)
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)

    def write_marker(self, marker: int) -> None:
        """Byte-align (1-padded) and emit a raw marker (RSTn) — markers
        are never byte-stuffed."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, marker])


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base quant table (1..100)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((q * s + 50) / 100), 1, 255)


def _jpeg_prepare(arr: "np.ndarray", quality: int, subsampling: str):
    """Shared encode front half (baseline + progressive): color
    transform, sampling factors, MCU geometry, IJG-scaled quant
    tables, edge-padded + box-downsampled level-shifted planes."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ncomp = arr.shape
    if ncomp == 3:
        r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    elif ncomp == 1:
        planes = [arr[..., 0].astype(np.float64)]
    else:
        raise ValueError(f"unsupported channel count {ncomp}")

    if subsampling == "444" or ncomp == 1:
        factors = [(1, 1)] * ncomp
    elif subsampling == "420":
        factors = [(2, 2), (1, 1), (1, 1)]
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    hp, wp = mcuy * vmax * 8, mcux * hmax * 8

    qtabs = [_quality_scale(_QUANT_LUMA, quality)]
    if ncomp == 3:
        qtabs.append(_quality_scale(_QUANT_CHROMA, quality))

    # pad full-res (edge replicate), then per-component box-downsample
    comps_px = []
    for ci, p in enumerate(planes):
        pp = np.empty((hp, wp))
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]
        pp[:, w:] = pp[:, w - 1 : w]
        ry, rx = vmax // factors[ci][1], hmax // factors[ci][0]
        if ry > 1 or rx > 1:
            pp = pp.reshape(hp // ry, ry, wp // rx, rx).mean(axis=(1, 3))
        comps_px.append(pp - 128.0)
    return h, w, ncomp, factors, hmax, vmax, mcux, mcuy, qtabs, comps_px


def encode_jpeg(
    arr: "np.ndarray",
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) RGB or (h, w, 1)/(h, w) gray uint8 → baseline JFIF
    bytes (standard Huffman tables, IJG quality scaling).

    ``subsampling``: "444" (one block per component per MCU) or "420"
    (2x2 luma blocks + box-averaged Cb/Cr per MCU — what cameras and
    PIL emit by default, so the decoder's interleaved-MCU + chroma
    upsample path gets real input). ``restart_interval`` > 0 emits a
    DRI segment and RSTn markers every N MCUs (the resync points long
    scans carry)."""
    import struct

    h, w, ncomp, factors, hmax, vmax, mcux, mcuy, qtabs, comps_px = _jpeg_prepare(
        arr, quality, subsampling
    )

    # canonical code lookup per (class, table)
    def table(bits, vals):
        return dict(zip(vals, _huff_codes(bits, vals)))

    dc_t = [table(_DC_LUMA_BITS, _DC_LUMA_VALS), table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_t = [table(_AC_LUMA_BITS, _AC_LUMA_VALS), table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    bw = _BitWriter()
    pred = [0] * ncomp

    def emit_block(block, ti, ci):
        coef = _DCT_M @ block @ _DCT_M.T
        q = np.round(coef.ravel() / qtabs[ti].reshape(8, 8).ravel()).astype(int)
        zz = q[_ZIGZAG]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        cat = _category(diff)
        code, length = dc_t[ti][cat]
        bw.write(code, length)
        if cat:
            v = diff if diff > 0 else diff + (1 << cat) - 1
            bw.write(v, cat)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_t[ti][0xF0]  # ZRL
                bw.write(code, length)
                run -= 16
            cat = _category(v)
            code, length = ac_t[ti][(run << 4) | cat]
            bw.write(code, length)
            vv = v if v > 0 else v + (1 << cat) - 1
            bw.write(vv, cat)
            run = 0
        if run:
            code, length = ac_t[ti][0x00]  # EOB
            bw.write(code, length)

    mcu_count, rst_n = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                bw.write_marker(0xD0 + rst_n)
                rst_n = (rst_n + 1) % 8
                pred[:] = [0] * ncomp
            for ci in range(ncomp):
                ti = 0 if ci == 0 else 1
                hf, vf = factors[ci]
                for v in range(vf):
                    for u in range(hf):
                        by = (my * vf + v) * 8
                        bx = (mx * hf + u) * 8
                        emit_block(
                            comps_px[ci][by : by + 8, bx : bx + 8], ti, ci
                        )
            mcu_count += 1
    scan = bw.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = [b"\xff\xd8", seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")]
    for i, qt in enumerate(qtabs):
        out.append(seg(0xDB, bytes([i]) + bytes(qt.astype(np.uint8).ravel()[_ZIGZAG])))
    comps = b"".join(
        bytes([i + 1, (factors[i][0] << 4) | factors[i][1], 0 if i == 0 else 1])
        for i in range(ncomp)
    )
    out.append(seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + comps))
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        if ncomp == 1 and tid == 1:
            continue
        out.append(seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)))
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([ncomp]) + b"".join(
        bytes([i + 1, 0x00 if i == 0 else 0x11]) for i in range(ncomp)
    ) + b"\x00\x3f\x00"
    out.append(seg(0xDA, sos))
    out.append(scan)
    out.append(b"\xff\xd9")
    return b"".join(out)


# "Flat" AC Huffman table for progressive scans: all 256 symbols (2 at
# 8 bits, 254 at 9) so the EOBn run-length symbols (r<<4, r=1..14) —
# absent from the Annex-K baseline tables — are codable. Legal
# canonical table (Kraft sum 0.504, no all-ones code), deliberately
# size-suboptimal: the writer exists to synthesize test input.
_AC_FLAT_BITS = [0, 0, 0, 0, 0, 0, 0, 2, 254, 0, 0, 0, 0, 0, 0, 0]
_AC_FLAT_VALS = list(range(256))


def encode_jpeg_progressive(
    arr: "np.ndarray", quality: int = 90, subsampling: str = "444"
) -> bytes:
    """(h, w, 3) RGB or (h, w, 1)/(h, w) gray uint8 → PROGRESSIVE
    (SOF2) JFIF bytes, exercising both spectral selection and
    successive approximation (the libjpeg default script shape):

      1. DC all comps       Ss=0  Se=0   Ah=0 Al=1   (interleaved)
      2. AC luma   band 1-5 Ss=1  Se=5   Ah=0 Al=2
      3. AC luma  band 6-63 Ss=6  Se=63  Ah=0 Al=2
      4. AC chroma     1-63 Ss=1  Se=63  Ah=0 Al=1   (per component)
      5. DC refine          Ss=0  Se=0   Ah=1 Al=0   (raw bits)
      6. AC luma refine     Ss=1  Se=63  Ah=2 Al=1
      7. AC luma refine     Ss=1  Se=63  Ah=1 Al=0
      8. AC chroma refine   Ss=1  Se=63  Ah=1 Al=0   (per component)

    Quantized coefficients are identical to encode_jpeg's, so
    decode_jpeg(progressive) must reproduce decode_jpeg(baseline)
    bit-for-bit — the round-trip exactness the tests pin."""
    import struct

    h, w, ncomp, factors, hmax, vmax, mcux, mcuy, qtabs, comps_px = _jpeg_prepare(
        arr, quality, subsampling
    )

    # quantized zigzag coefficients per component, padded MCU grid
    coefs = []
    for ci in range(ncomp):
        hf, vf = factors[ci]
        nby, nbx = mcuy * vf, mcux * hf
        px = comps_px[ci]
        blocks = px.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        fdct = np.einsum("ij,yxjk,lk->yxil", _DCT_M, blocks, _DCT_M)
        ti = 0 if ci == 0 else 1
        q = np.round(fdct.reshape(nby, nbx, 64) / qtabs[ti]).astype(np.int64)
        coefs.append(q[..., _ZIGZAG])

    def true_dims(ci):
        hf, vf = factors[ci]
        sy = -(-h * vf // vmax)
        sx = -(-w * hf // hmax)
        return -(-sy // 8), -(-sx // 8)

    def table(bits, vals):
        return dict(zip(vals, _huff_codes(bits, vals)))

    dc_t = [table(_DC_LUMA_BITS, _DC_LUMA_VALS), table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_flat = table(_AC_FLAT_BITS, _AC_FLAT_VALS)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def sos(scan_comps, ss, se, ah, al):
        body = bytes([len(scan_comps)])
        for ci in scan_comps:
            td = 0 if ci == 0 else 1
            body += bytes([ci + 1, (td << 4) | 0])  # AC always table 0 (flat)
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def dc_scan(al):
        """Interleaved first DC scan at point transform al."""
        bw = _BitWriter()
        pred = [0] * ncomp
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    hf, vf = factors[ci]
                    for v in range(vf):
                        for u in range(hf):
                            dc = int(coefs[ci][my * vf + v, mx * hf + u, 0])
                            shifted = dc >> al  # arithmetic shift, T.81 G.1.2.1
                            diff = shifted - pred[ci]
                            pred[ci] = shifted
                            cat = _category(diff)
                            code, length = dc_t[0 if ci == 0 else 1][cat]
                            bw.write(code, length)
                            if cat:
                                bw.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
        return bw.flush()

    def dc_refine_scan(al):
        bw = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    hf, vf = factors[ci]
                    for v in range(vf):
                        for u in range(hf):
                            dc = int(coefs[ci][my * vf + v, mx * hf + u, 0])
                            bw.write((dc >> al) & 1, 1)
        return bw.flush()

    def ac_first_scan(ci, ss, se, al):
        """Single-component spectral band, EOB-run coding (G.1.2.2)."""
        bw = _BitWriter()
        eobrun = 0

        def flush_eobrun():
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                code, length = ac_flat[nbits << 4]
                bw.write(code, length)
                if nbits:
                    bw.write(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0

        cby, cbx = true_dims(ci)
        for n in range(cby * cbx):
            zz = coefs[ci][n // cbx, n % cbx]
            tv = [
                (int(v) >> al) if v >= 0 else -((-int(v)) >> al)
                for v in zz[ss : se + 1]
            ]
            nz = [i for i, t in enumerate(tv) if t]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eobrun()
                continue
            flush_eobrun()
            run = 0
            for t in tv[: nz[-1] + 1]:
                if t == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_flat[0xF0]
                    bw.write(code, length)
                    run -= 16
                cat = _category(t)
                code, length = ac_flat[(run << 4) | cat]
                bw.write(code, length)
                bw.write(t if t > 0 else t + (1 << cat) - 1, cat)
                run = 0
            if nz[-1] < se - ss:
                eobrun = 1  # this block's own EOB opens a fresh run
        flush_eobrun()
        return bw.flush()

    def ac_refine_scan(ci, ss, se, ah, al):
        """Single-component successive-approximation refinement with
        buffered correction bits (G.1.2.3 / jcphuff shape)."""
        bw = _BitWriter()
        eobrun = 0
        be: list[int] = []  # correction bits pending under the EOB run

        def flush_eobrun():
            nonlocal eobrun, be
            if eobrun:
                nbits = eobrun.bit_length() - 1
                code, length = ac_flat[nbits << 4]
                bw.write(code, length)
                if nbits:
                    bw.write(eobrun & ((1 << nbits) - 1), nbits)
            for b in be:
                bw.write(b, 1)
            eobrun, be = 0, []

        cby, cbx = true_dims(ci)
        for n in range(cby * cbx):
            zz = coefs[ci][n // cbx, n % cbx]
            absv = [abs(int(v)) >> al for v in zz[ss : se + 1]]
            last_new = max((i for i, t in enumerate(absv) if t == 1), default=-1)
            run = 0
            br_bits: list[int] = []  # bits pending within this block
            for i, t in enumerate(absv):
                if t == 0:
                    run += 1
                    continue
                while run > 15 and i <= last_new:
                    flush_eobrun()
                    code, length = ac_flat[0xF0]
                    bw.write(code, length)
                    run -= 16
                    for b in br_bits:
                        bw.write(b, 1)
                    br_bits = []
                if t > 1:  # history-significant: correction bit only
                    br_bits.append(t & 1)
                    continue
                flush_eobrun()
                code, length = ac_flat[(run << 4) | 1]
                bw.write(code, length)
                bw.write(1 if zz[ss + i] > 0 else 0, 1)
                for b in br_bits:
                    bw.write(b, 1)
                br_bits = []
                run = 0
            if run > 0 or br_bits:
                eobrun += 1
                be.extend(br_bits)
                if eobrun == 0x7FFF:
                    flush_eobrun()
        flush_eobrun()
        return bw.flush()

    out = [b"\xff\xd8", seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")]
    for i, qt in enumerate(qtabs):
        out.append(seg(0xDB, bytes([i]) + bytes(qt.astype(np.uint8).ravel()[_ZIGZAG])))
    comps = b"".join(
        bytes([i + 1, (factors[i][0] << 4) | factors[i][1], 0 if i == 0 else 1])
        for i in range(ncomp)
    )
    out.append(seg(0xC2, struct.pack(">BHHB", 8, h, w, ncomp) + comps))
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 0, _AC_FLAT_BITS, _AC_FLAT_VALS),
    ):
        if ncomp == 1 and tid == 1:
            continue
        out.append(seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)))

    all_comps = list(range(ncomp))
    out += [sos(all_comps, 0, 0, 0, 1), dc_scan(1)]
    out += [sos([0], 1, 5, 0, 2), ac_first_scan(0, 1, 5, 2)]
    out += [sos([0], 6, 63, 0, 2), ac_first_scan(0, 6, 63, 2)]
    for ci in range(1, ncomp):
        out += [sos([ci], 1, 63, 0, 1), ac_first_scan(ci, 1, 63, 1)]
    out += [sos(all_comps, 0, 0, 1, 0), dc_refine_scan(0)]
    out += [sos([0], 1, 63, 2, 1), ac_refine_scan(0, 1, 63, 2, 1)]
    out += [sos([0], 1, 63, 1, 0), ac_refine_scan(0, 1, 63, 1, 0)]
    for ci in range(1, ncomp):
        out += [sos([ci], 1, 63, 1, 0), ac_refine_scan(ci, 1, 63, 1, 0)]
    out.append(b"\xff\xd9")
    return b"".join(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    self.pos -= 1  # a marker: stop feeding
                    return
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:  # past the end: spec says pad with 1s
            self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_and_skip_rst(self) -> None:
        self.acc, self.nbits = 0, 0
        while self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            nxt = self.data[self.pos + 1]
            if 0xD0 <= nxt <= 0xD7:
                self.pos += 2
                return
            break


def _build_decode_table(bits, vals):
    """(length, code) → symbol for canonical Huffman decode."""
    return {
        (length, code): v
        for v, (code, length) in zip(vals, _huff_codes(bits, vals))
    }


def _huff_decode(br: "_BitReader", table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(content: bytes) -> "np.ndarray":
    """REAL JPEG decode, baseline (SOF0) AND progressive (SOF2):
    marker parse, Huffman + dequant + numpy IDCT, nearest-neighbor
    chroma upsample, YCbCr→RGB. Progressive streams accumulate
    coefficients across spectral-selection / successive-approximation
    scans (ITU T.81 §G.2) and reconstruct once at EOI. Returns
    (h, w, 3) or (h, w, 1) uint8."""
    import struct

    if content[:3] != _JPEG_MAGIC:
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    progressive = False
    state: dict | None = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("bad marker sync")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        payload = content[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                prec, tid = payload[p] >> 4, payload[p] & 0xF
                n = 64 * (2 if prec else 1)
                raw = payload[p + 1 : p + 1 + n]
                tab = (
                    np.frombuffer(raw, dtype=">u2").astype(np.float64)
                    if prec
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                )
                nat = np.empty(64)
                nat[_ZIGZAG] = tab  # stored in zigzag order
                qtabs[tid] = nat
                p += 1 + n
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                htabs[(cls, tid)] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            comps = []
            for i in range(nc):
                cid, sf, qid = payload[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0xF, "q": qid})
            frame = {"h": h, "w": w, "comps": comps}
            progressive = marker == 0xC2
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            sel = {}
            scan_comps = []
            for i in range(ns):
                cid, tt = payload[1 + 2 * i : 3 + 2 * i]
                sel[cid] = (tt >> 4, tt & 0xF)
                scan_comps.append(cid)
            if not progressive:
                return _decode_scan(
                    content, pos, frame, sel, qtabs, htabs, restart_interval
                )
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            if state is None:
                state = _progressive_state(frame)
            pos = _decode_progressive_scan(
                content, pos, frame, state, scan_comps, sel, htabs,
                ss, se, ahal >> 4, ahal & 0xF, restart_interval,
            )
    if progressive and state is not None:
        return _reconstruct_progressive(frame, state, qtabs)
    raise ValueError("no scan found")


def _progressive_state(frame) -> dict:
    """Per-component zigzag-order coefficient arrays, padded to the
    interleaved MCU grid (the DC scans' geometry); non-interleaved
    scans address the [0:cby, 0:cbx] true-dimension subgrid."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    coefs = {}
    for c in comps:
        coefs[c["id"]] = np.zeros(
            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
        )
    return {"coefs": coefs, "mcux": mcux, "mcuy": mcuy, "hmax": hmax, "vmax": vmax}


def _comp_block_dims(frame, state, c) -> tuple[int, int]:
    """True (not MCU-padded) block grid of one component — the
    iteration space of non-interleaved scans (T.81 A.2.2)."""
    sy = -(-frame["h"] * c["v"] // state["vmax"])
    sx = -(-frame["w"] * c["h"] // state["hmax"])
    return -(-sy // 8), -(-sx // 8)


def _decode_progressive_scan(
    content, pos, frame, state, scan_comps, sel, htabs,
    ss, se, ah, al, restart_interval,
) -> int:
    """One progressive SOS (T.81 G.2): DC first/refine (interleaved or
    single-component), AC first/refine (always single-component,
    spectral band ss..se, successive-approximation shift al).
    Coefficients land in ``state``; returns the offset of the next
    marker."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    br = _BitReader(content[pos:])
    eobrun = 0
    pred = {cid: 0 for cid in scan_comps}

    def refine_nonzero(block, k, se, p1, m1) -> None:
        """EOBRUN tail: correction bit for every nonzero coefficient
        left in the band (jdphuff decode_mcu_AC_refine tail loop)."""
        while k <= se:
            c = int(block[k])
            if c != 0 and br.read(1) and (c & p1) == 0:
                block[k] = c + (p1 if c >= 0 else m1)
            k += 1

    def dc_first(block, cid) -> None:
        cat = _huff_decode(br, htabs[(0, sel[cid][0])])
        diff = _extend(br.read(cat), cat) if cat else 0
        pred[cid] += diff
        block[0] = pred[cid] << al

    def dc_refine(block) -> None:
        if br.read(1):
            block[0] = int(block[0]) | (1 << al)

    def ac_first(block, ac_tab) -> None:
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _huff_decode(br, ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read(r)
                return
            k += r
            if k > se:
                raise ValueError("AC band overflow")
            block[k] = _extend(br.read(s), s) << al
            k += 1

    def ac_refine(block, ac_tab) -> None:
        nonlocal eobrun
        p1, m1 = 1 << al, -(1 << al)
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _huff_decode(br, ac_tab)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r < 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += br.read(r)
                        break
                    # r == 15: ZRL — skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("AC refinement size must be 1")
                    val = p1 if br.read(1) else m1
                while k <= se:
                    c = int(block[k])
                    if c != 0:
                        if br.read(1) and (c & p1) == 0:
                            block[k] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    block[k] = val
                k += 1
        if eobrun > 0:
            refine_nonzero(block, k, se, p1, m1)
            eobrun -= 1

    def maybe_restart(count) -> bool:
        nonlocal eobrun
        if restart_interval and count and count % restart_interval == 0:
            br.align_and_skip_rst()
            for cid in pred:
                pred[cid] = 0
            eobrun = 0
            return True
        return False

    if ss == 0:
        if se != 0:
            raise ValueError("invalid progressive scan: DC scan needs Se=0")
        if len(scan_comps) > 1:  # interleaved DC over the MCU grid
            n = 0
            for my in range(state["mcuy"]):
                for mx in range(state["mcux"]):
                    maybe_restart(n)
                    for cid in scan_comps:
                        c = by_id[cid]
                        arr = state["coefs"][cid]
                        for v in range(c["v"]):
                            for u in range(c["h"]):
                                blk = arr[my * c["v"] + v, mx * c["h"] + u]
                                dc_first(blk, cid) if ah == 0 else dc_refine(blk)
                    n += 1
        else:
            cid = scan_comps[0]
            cby, cbx = _comp_block_dims(frame, state, by_id[cid])
            arr = state["coefs"][cid]
            for n in range(cby * cbx):
                maybe_restart(n)
                blk = arr[n // cbx, n % cbx]
                dc_first(blk, cid) if ah == 0 else dc_refine(blk)
    else:
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scans are single-component")
        cid = scan_comps[0]
        ac_tab = htabs[(1, sel[cid][1])]
        cby, cbx = _comp_block_dims(frame, state, by_id[cid])
        arr = state["coefs"][cid]
        for n in range(cby * cbx):
            maybe_restart(n)
            blk = arr[n // cbx, n % cbx]
            ac_first(blk, ac_tab) if ah == 0 else ac_refine(blk, ac_tab)

    # locate the next marker after this scan's entropy data
    p = pos + br.pos
    while p + 1 < len(content):
        if content[p] == 0xFF and content[p + 1] not in (0x00,) and not (
            0xD0 <= content[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return len(content)


def _reconstruct_progressive(frame, state, qtabs) -> "np.ndarray":
    """Final pass: dequantize the accumulated coefficient grids,
    batched IDCT (one einsum per component), shared upsample/crop/
    color tail."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    planes = []
    for c in comps:
        zz = state["coefs"][c["id"]].astype(np.float64)
        nby, nbx = zz.shape[:2]
        nat = np.zeros_like(zz)
        nat[..., _ZIGZAG] = zz
        blocks = (nat * qtabs[c["q"]]).reshape(nby, nbx, 8, 8)
        pix = np.einsum("ji,yxjk,kl->yxil", _DCT_M, blocks, _DCT_M) + 128.0
        planes.append(pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8))
    return _finish_image(comps, planes, h, w, state["hmax"], state["vmax"])


def _decode_scan(content, pos, frame, sel, qtabs, htabs, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    ]
    br = _BitReader(content[pos:])
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_and_skip_rst()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct, act = sel[c["id"]]
                dc_tab = htabs[(0, dct)]
                ac_tab = htabs[(1, act)]
                q = qtabs[c["q"]]
                for v in range(c["v"]):
                    for u in range(c["h"]):
                        zz = np.zeros(64)
                        cat = _huff_decode(br, dc_tab)
                        diff = _extend(br.read(cat), cat) if cat else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read(s), s)
                            k += 1
                        nat = np.empty(64)
                        nat[_ZIGZAG] = zz
                        block = (nat * q).reshape(8, 8)
                        pix = _DCT_M.T @ block @ _DCT_M + 128.0
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + u) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    return _finish_image(comps, planes, h, w, hmax, vmax)


def _finish_image(comps, planes, h, w, hmax, vmax) -> "np.ndarray":
    """Shared decode tail (baseline + progressive): nearest-neighbor
    chroma upsample, crop to frame dims, YCbCr→RGB."""
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def resize_jpeg(content: bytes, width: int, height: int) -> bytes:
    """REAL JPEG resize: decode → nearest-neighbor index map (same
    policy as resize_ppm/png) → re-encode baseline."""
    img = decode_jpeg(content)
    h, w = img.shape[:2]
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_jpeg(img[yi][:, xi])


def jpeg_features(content: bytes) -> list[float]:
    """REAL JPEG features — same contract as image_features/png_features
    (per-channel means padded to 3, grayscale stddev)."""
    img = decode_jpeg(content).astype(np.float64)
    rgb = img[..., :3] if img.shape[2] >= 3 else np.repeat(img[..., :1], 3, axis=2)
    gray = rgb.mean(axis=2)
    return [
        float(rgb[..., 0].mean()),
        float(rgb[..., 1].mean()),
        float(rgb[..., 2].mean()),
        float(gray.std()),
    ]


def decode_image_auto(content: bytes) -> "np.ndarray":
    """Magic-sniffing PIXEL decoder (the array-returning counterpart
    of :func:`decode_auto`): PPM ('P6'), PNG (8-byte signature),
    baseline/progressive JPEG (FFD8FF) → (h, w, channels) uint8.
    Non-image blobs refuse — a perceptual hash over audio bytes would
    be a silent lie."""
    if content[:2] == b"P6":
        return decode_ppm(content)
    if content[:8] == _PNG_MAGIC:
        return decode_png(content)
    if content[:3] == _JPEG_MAGIC:
        return decode_jpeg(content)
    raise ValueError("not a decodable image (PPM/PNG/JPEG)")


def dhash64(content: bytes) -> int:
    """Perceptual DIFFERENCE hash over any decodable image blob:
    grayscale → nearest-neighbor resample to 9 wide x 8 high → one bit
    per horizontally adjacent pair (left brighter than right) — 64
    bits, returned SIGNED so it rides Spark's BIGINT. Identical
    pixels hash equal regardless of container bytes (PNG filter
    choice, PPM vs PNG); small crops/recompressions flip few bits, so
    hamming distance ranks near-duplicates. Public construction:
    dHash (Krawetz)."""
    img = decode_image_auto(content).astype(np.float64)
    gray = img.mean(axis=2) if img.ndim == 3 else img
    h, w = gray.shape
    yi = (np.arange(8) * h // 8).clip(0, h - 1)
    xi = (np.arange(9) * w // 9).clip(0, w - 1)
    g = gray[yi][:, xi]
    bits = (g[:, :-1] > g[:, 1:]).flatten()
    # packbits is MSB-first per byte, matching the shift-accumulate
    # order bit for bit
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return val - (1 << 64) if val >= (1 << 63) else val


def hamming64(a: int, b: int) -> int:
    """Bit distance between two signed-64 dhash values."""
    return int(bin(((a ^ b) + (1 << 64)) % (1 << 64)).count("1"))


def audio_fp64(content: bytes) -> int:
    """Spectral FINGERPRINT for PCM WAV blobs: mono mean → 16 equal
    time windows → rFFT magnitude per window → the 4-bit dominant
    band (16 equal frequency bands up to Nyquist) per window = 64
    bits, SIGNED for Spark's BIGINT. Amplitude-invariant (band argmax
    of magnitudes) and robust to small phase shifts (window-level
    spectra), so re-levelled or slightly clipped copies of the same
    recording fingerprint equal while different tones differ — the
    audio counterpart of :func:`dhash64`. Public construction:
    Shazam-style dominant-band landmarks, reduced to one band per
    window."""
    with _wave.open(_io.BytesIO(content), "rb") as f:
        n = f.getnframes()
        width = f.getsampwidth()
        ch = f.getnchannels()
        raw = f.readframes(n)
    if width != 2:
        raise ValueError(f"unsupported sample width {width}")
    x = np.frombuffer(raw, dtype=np.int16).astype(np.float64)
    if ch > 1:
        x = x[: (x.size // ch) * ch].reshape(-1, ch).mean(axis=1)
    if x.size < 32:
        raise ValueError("audio too short to fingerprint")
    # one batched rFFT over all 16 windows + contiguous band-slice
    # sums: bit-identical to the per-window loop (pinned by
    # tests/test_multimodal_codecs.py) at ~1/8 the per-blob Python
    # cost — this runs once per blob inside a mapInPandas pass
    win = x.size // 16
    mag = np.abs(np.fft.rfft(x[: win * 16].reshape(16, win), axis=1))
    mag[:, 0] = 0.0  # DC carries level, not pitch
    # collapse the spectrum into 16 equal bands (np.array_split
    # boundaries); argmax band is the window's 4-bit symbol
    nf = mag.shape[1]
    q, r = divmod(nf, 16)
    idx = np.cumsum([0] + [(q + 1) if i < r else q for i in range(16)])
    sums = np.empty((16, 16))
    for b in range(16):
        sums[:, b] = mag[:, idx[b] : idx[b + 1]].sum(axis=1)
    val = 0
    for sym in sums.argmax(axis=1):
        val = (val << 4) | int(sym)
    return val - (1 << 64) if val >= (1 << 63) else val
