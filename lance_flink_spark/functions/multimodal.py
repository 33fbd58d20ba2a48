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
                    # REAL resize for PPM/PNG blobs; stub for formats
                    # that would need PIL/ffmpeg (per-blob dispatch)
                    "thumb": pdf["content"].map(
                        lambda b: resize_ppm(b, width, height)
                        if bytes(b[:2]) == b"P6"
                        else resize_png(bytes(b), width, height)
                        if bytes(b[:8]) == _PNG_MAGIC
                        else resize_stub(b, width, height)
                    ),
                }
            )

    return blobs.mapInPandas(batches, schema=RESIZE_SCHEMA)


def sample_frames(blobs: DataFrame, every_n_bytes: int = 256, max_frames: int = 4) -> DataFrame:
    """mapInPandas 'video frame sampling' pass: emits up to max_frames
    fixed-stride slices per blob (a real impl seeks keyframes with
    ffmpeg). One input row fans out to multiple typed output rows —
    the batch-shape case decode pipelines hit."""
    from lance_flink_spark.session import ship_package

    ship_package(blobs.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                for i in range(min(max_frames, max(len(content) // every_n_bytes, 1))):
                    off = i * every_n_bytes
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_offset"].append(off)
                    rows["frame"].append(content[off : off + 32])
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
# PIL/ffmpeg are absent here (SURVEY §6), but three real formats need
# nothing beyond numpy/stdlib: PPM (P6) images, PNG (zlib inflate +
# the four scanline filters — see decode_png below), and PCM WAV
# audio. The stubs above remain only for formats that genuinely
# require external codecs (JPEG/MP4); these paths are REAL
# decode/resize/feature implementations with the same mapInPandas
# batch shape.

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
    (8-byte signature), and WAV ('RIFF'); deterministic stub for the
    formats that genuinely need external codecs (JPEG/MP4)."""
    if content[:2] == b"P6":
        return image_features(content)
    if content[:8] == _PNG_MAGIC:
        return png_features(content)
    if content[:4] == b"RIFF":
        return audio_features(content)
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
