"""MP4 (ISO BMFF) container demux — functions/mp4.py.

Same pattern as the PNG/JPEG codec tests: the module's own writer
synthesizes valid containers (no ffmpeg in this box), the parser is
the production path, and the distributed tests pin the magic-byte
dispatch through extract_features / sample_frames.

Parity target: the reference stores video as opaque Lance blobs and
leaves demux to the application (LanceSource.java reads fragments as
bytes); the box walk here is the standard ISO 14496-12 stts/stsz/
stsc/stco sample-table resolution.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import Row

from lance_flink_spark.functions.mp4 import (
    encode_mp4,
    mp4_features,
    mp4_metadata,
    mp4_samples,
    parse_boxes,
)
from lance_flink_spark.functions.multimodal import (
    decode_auto,
    decode_stub,
    extract_features,
    sample_frames,
)

SAMPLES = [b"frame-zero-payload", b"f1", b"frame-two--x", b"z" * 40]


def _video(**kw) -> bytes:
    return encode_mp4(SAMPLES, timescale=1000, sample_delta=40, **kw)


def test_box_walk_top_level():
    data = _video()
    tops = [fourcc for fourcc, *_ in parse_boxes(data)]
    assert tops == [b"ftyp", b"mdat", b"moov"]
    # box sizes must tile the file exactly (parse_boxes raises on overrun)
    assert sum(p1 - p0 + hdr for _, p0, p1, hdr in parse_boxes(data)) == len(data)


def test_metadata_roundtrip():
    meta = mp4_metadata(_video(width=320, height=240))
    assert meta["brand"] == "isom"
    assert meta["duration_s"] == pytest.approx(0.160)  # 4 samples * 40/1000
    (trk,) = meta["tracks"]
    assert (trk["width"], trk["height"]) == (320, 240)
    assert trk["handler"] == "vide"
    assert trk["codec"] == "raw "
    assert trk["n_samples"] == len(SAMPLES)
    assert trk["timescale"] == 1000


def test_samples_locate_exact_payload_bytes():
    data = _video()
    samples = mp4_samples(data)
    assert len(samples) == len(SAMPLES)
    for s, payload, i in zip(samples, SAMPLES, range(len(SAMPLES))):
        assert data[s["offset"] : s["offset"] + s["size"]] == payload
        assert s["time_s"] == pytest.approx(i * 0.040)
        assert s["sync"] is True  # no stss box => every sample is sync


def test_stss_marks_keyframes():
    data = encode_mp4(SAMPLES, sync_samples=[1, 3])
    flags = [s["sync"] for s in mp4_samples(data)]
    assert flags == [True, False, True, False]


def test_audio_track_shape():
    data = encode_mp4([b"pcm0", b"pcm1"], handler=b"soun", codec=b"sowt",
                      timescale=8000, sample_delta=4000)
    meta = mp4_metadata(data)
    (trk,) = meta["tracks"]
    assert trk["handler"] == "soun"
    assert trk["codec"] == "sowt"
    assert meta["duration_s"] == pytest.approx(1.0)


def test_features_and_decode_auto_dispatch():
    data = _video(width=64, height=48)
    feats = mp4_features(data)
    assert feats == [pytest.approx(0.160), 1.0, 64.0, 48.0, 4.0]
    # decode_auto sniffs 'ftyp' at offset 4 and takes the demux path
    assert decode_auto(data) == feats


def test_decode_auto_corrupt_container_falls_back_to_stub():
    # valid magic, truncated moov → demux raises → stub, never a crash
    data = bytearray(_video())
    bad = bytes(data[: len(data) - 30])
    assert decode_auto(bad) == decode_stub(bad)
    # size field overrunning the file is also caught
    evil = struct.pack(">I4s", 1 << 30, b"ftyp") + b"isom"
    assert decode_auto(evil) == decode_stub(evil)


def test_distributed_feature_extraction_takes_mp4_path(spark):
    data = _video(width=128, height=96)
    blobs = spark.createDataFrame(
        [
            Row(doc_id=1, content=bytearray(data)),
            Row(doc_id=2, content=bytearray(b"not a video")),
        ],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in extract_features(blobs).collect()}
    assert rows[1]["feature"] == pytest.approx(mp4_features(data))
    assert len(rows[2]["feature"]) == 3  # stub path


def test_distributed_frame_sampling_uses_real_keyframes(spark):
    data = encode_mp4(SAMPLES, sync_samples=[1, 3])
    keys = [s for s in mp4_samples(data) if s["sync"]]
    blobs = spark.createDataFrame(
        [Row(doc_id=7, content=bytearray(data))], "doc_id long, content binary"
    )
    out = sorted(sample_frames(blobs, max_frames=4).collect(),
                 key=lambda r: r["frame_idx"])
    assert len(out) == 2  # only the stss keyframes, not byte strides
    for r, s in zip(out, keys):
        assert r["frame_offset"] == s["offset"]
        expected = data[s["offset"] : s["offset"] + min(s["size"], 32)]
        assert bytes(r["frame"]) == expected


def test_distributed_frame_sampling_stride_fallback_for_non_mp4(spark):
    blob = b"x" * 1024
    blobs = spark.createDataFrame(
        [Row(doc_id=9, content=bytearray(blob))], "doc_id long, content binary"
    )
    out = sample_frames(blobs, every_n_bytes=256, max_frames=4).collect()
    assert sorted(r["frame_offset"] for r in out) == [0, 256, 512, 768]
