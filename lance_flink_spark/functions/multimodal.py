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
                    "thumb": pdf["content"].map(lambda b: resize_stub(b, width, height)),
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
