"""REAL multimodal codecs (functions/multimodal.py): PPM decode/resize
and WAV feature extraction need only numpy/stdlib — pinned against
local references; the stub remains only for PIL/ffmpeg formats."""

import io
import wave

import numpy as np
import pytest
from pyspark.sql import Row

from lance_flink_spark.functions.multimodal import (
    audio_features,
    decode_ppm,
    encode_ppm,
    extract_features,
    image_features,
    resize_images,
    resize_ppm,
)


def _ppm(w, h, seed):
    rng = np.random.default_rng(seed)
    return encode_ppm(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))


def _wav(freq, sr=8000, seconds=0.5):
    t = np.arange(int(sr * seconds)) / sr
    x = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(x.tobytes())
    return buf.getvalue()


def test_ppm_roundtrip_and_resize():
    img = np.arange(12 * 8 * 3, dtype=np.uint8).reshape(8, 12, 3)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # comments in the header parse
    hdr = b"P6\n# a comment\n12 8\n255\n" + img.tobytes()
    assert (decode_ppm(hdr) == img).all()
    small = decode_ppm(resize_ppm(encode_ppm(img), 6, 4))
    assert small.shape == (4, 6, 3)
    # nearest-neighbor: every output pixel exists in the input
    assert (small == img[::2][:, ::2]).all()


def test_audio_features_physical_sanity():
    d, rms, zcr, centroid = audio_features(_wav(440))
    assert abs(d - 0.5) < 1e-6
    assert abs(rms - 0.5 / np.sqrt(2)) < 0.01  # sine RMS = A/sqrt(2)
    # 440 Hz sine crosses zero ~880 times/s → zcr ≈ 880/8000
    assert abs(zcr - 880 / 8000) < 0.01
    assert abs(centroid - 440) < 15  # centroid of a pure tone ≈ f0
    # a higher tone moves the centroid up
    assert audio_features(_wav(1200))[3] > centroid + 500


def test_distributed_feature_extraction_dispatches_by_magic(spark):
    blobs = spark.createDataFrame(
        [
            Row(doc_id=1, content=bytearray(_ppm(16, 10, 1))),
            Row(doc_id=2, content=bytearray(_wav(440))),
            Row(doc_id=3, content=bytearray(b"plain text payload")),
        ],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in extract_features(blobs).collect()}
    assert rows[1]["feature"] == pytest.approx(image_features(_ppm(16, 10, 1)))
    assert rows[2]["feature"] == pytest.approx(audio_features(_wav(440)))
    assert len(rows[3]["feature"]) == 3  # stub path for unknown formats
    assert rows[1]["head_hex"] == _ppm(16, 10, 1)[:4].hex()


def test_distributed_resize_real_for_ppm(spark):
    ppm = _ppm(32, 32, 7)
    blobs = spark.createDataFrame(
        [Row(doc_id=1, content=bytearray(ppm)),
         Row(doc_id=2, content=bytearray(b"not an image"))],
        "doc_id long, content binary",
    )
    out = {r["doc_id"]: r for r in resize_images(blobs, 8, 8).collect()}
    thumb = decode_ppm(bytes(out[1]["thumb"]))
    assert thumb.shape == (8, 8, 3)
    assert (thumb == decode_ppm(resize_ppm(ppm, 8, 8))).all()
    # non-image blobs still take the stub path (bounded bytes)
    assert len(out[2]["thumb"]) == 8 * 8 // 64


def _png(w, h, seed, ch=3, filter_type=0):
    from lance_flink_spark.functions.multimodal import encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return encode_png(rng.integers(0, 256, size=shape, dtype=np.uint8), filter_type)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_every_filter_and_colortype(ch, filter_type):
    """decode_png inverts all four scanline filters exactly for gray,
    gray+alpha, RGB, and RGBA — pixel-exact round trip."""
    from lance_flink_spark.functions.multimodal import decode_png, encode_png

    rng = np.random.default_rng(ch * 10 + filter_type)
    img = rng.integers(0, 256, size=(9, 7, ch), dtype=np.uint8)
    out = decode_png(encode_png(img, filter_type))
    assert out.shape == (9, 7, ch)
    assert (out == img).all()


def test_png_known_pixels():
    """A hand-built 2x2 RGB PNG decodes to exactly the pixels put in."""
    from lance_flink_spark.functions.multimodal import decode_png, encode_png

    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
    )
    assert (decode_png(encode_png(img)) == img).all()


def test_png_rejects_unsupported_shapes():
    from lance_flink_spark.functions.multimodal import decode_png

    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\njunk")
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_png_resize_and_features():
    from lance_flink_spark.functions.multimodal import (
        decode_png,
        encode_png,
        png_features,
        resize_png,
    )

    img = np.arange(16 * 12 * 3, dtype=np.uint8).reshape(12, 16, 3)
    small = decode_png(resize_png(encode_png(img), 8, 6))
    assert small.shape == (6, 8, 3)
    assert (small == img[::2][:, ::2]).all()  # same NN policy as PPM
    r, g, b, std = png_features(encode_png(img))
    assert r == pytest.approx(img[..., 0].mean())
    assert std == pytest.approx(img.astype(np.float64).mean(axis=2).std())


def test_distributed_decode_auto_takes_png_path(spark):
    """decode_auto inside mapInPandas: PNG blobs get REAL features
    (equal to the local reference), not the stub."""
    from lance_flink_spark.functions.multimodal import png_features

    png = _png(16, 10, 3, ch=3, filter_type=4)  # Paeth-filtered input
    blobs = spark.createDataFrame(
        [Row(doc_id=1, content=bytearray(png)),
         Row(doc_id=2, content=bytearray(b"opaque"))],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in extract_features(blobs).collect()}
    assert rows[1]["feature"] == pytest.approx(png_features(png))
    assert len(rows[2]["feature"]) == 3  # stub path


def test_distributed_resize_real_for_png(spark):
    from lance_flink_spark.functions.multimodal import decode_png, resize_png

    png = _png(32, 24, 9)
    blobs = spark.createDataFrame(
        [Row(doc_id=1, content=bytearray(png))], "doc_id long, content binary"
    )
    out = resize_images(blobs, 8, 8).collect()[0]
    assert (decode_png(bytes(out["thumb"])) == decode_png(resize_png(png, 8, 8))).all()


# ---------- baseline JPEG (Huffman + dequant + numpy IDCT) ----------


def _smooth_rgb(h, w):
    """Low-frequency test image: JPEG quantization error stays small."""
    y, x = np.mgrid[0:h, 0:w]
    r = (128 + 100 * np.sin(x / 11.0)).clip(0, 255)
    g = (128 + 100 * np.cos(y / 13.0)).clip(0, 255)
    b = ((x * 2 + y) / (h + w) * 200).clip(0, 255)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(8, 8), (24, 40), (17, 23)])  # non-multiple-of-8 too
def test_jpeg_roundtrip_rgb(h, w):
    from lance_flink_spark.functions.multimodal import decode_jpeg, encode_jpeg

    img = _smooth_rgb(h, w)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == (h, w, 3)
    err = np.abs(dec.astype(np.float64) - img.astype(np.float64))
    assert err.mean() < 3.0 and err.max() <= 35  # IDCT/quant tolerance


def test_jpeg_roundtrip_gray():
    from lance_flink_spark.functions.multimodal import decode_jpeg, encode_jpeg

    y, x = np.mgrid[0:20, 0:30]
    g = (128 + 90 * np.sin((x + y) / 9.0)).clip(0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == (20, 30, 1)
    err = np.abs(dec[..., 0].astype(np.float64) - g.astype(np.float64))
    assert err.mean() < 3.0


def test_jpeg_flat_image_is_near_exact():
    """A constant block has only a DC coefficient — decode must land
    within quantization-of-DC distance of the input."""
    from lance_flink_spark.functions.multimodal import decode_jpeg, encode_jpeg

    img = np.full((16, 16, 3), 77, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert np.abs(dec.astype(int) - 77).max() <= 3


def test_jpeg_quality_monotone():
    """Lower quality -> fewer bytes (coarser quant tables)."""
    from lance_flink_spark.functions.multimodal import encode_jpeg

    img = _smooth_rgb(48, 48)
    assert len(encode_jpeg(img, quality=30)) < len(encode_jpeg(img, quality=95))


def test_jpeg_rejects_progressive_and_garbage():
    from lance_flink_spark.functions.multimodal import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01\x02")
    # flip the emitted SOF0 marker to SOF2 (progressive): must raise,
    # and decode_auto must fall back to the stub rather than crash
    enc = bytearray(encode_jpeg(_smooth_rgb(8, 8)))
    sof = bytes(enc).find(b"\xff\xc0")
    assert sof > 0
    enc[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(enc))
    from lance_flink_spark.functions.multimodal import decode_auto, decode_stub

    assert decode_auto(bytes(enc)) == decode_stub(bytes(enc))


def test_jpeg_features_match_decode():
    from lance_flink_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
        jpeg_features,
    )

    enc = encode_jpeg(_smooth_rgb(32, 32), quality=90)
    img = decode_jpeg(enc).astype(np.float64)
    r, g, b, std = jpeg_features(enc)
    assert r == pytest.approx(img[..., 0].mean())
    assert std == pytest.approx(img.mean(axis=2).std())


def test_distributed_decode_auto_takes_jpeg_path(spark):
    """decode_auto inside mapInPandas: JPEG blobs get REAL features."""
    from lance_flink_spark.functions.multimodal import encode_jpeg, jpeg_features

    jpg = encode_jpeg(_smooth_rgb(24, 16), quality=90)
    blobs = spark.createDataFrame(
        [Row(doc_id=1, content=bytearray(jpg)),
         Row(doc_id=2, content=bytearray(b"opaque"))],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in extract_features(blobs).collect()}
    assert rows[1]["feature"] == pytest.approx(jpeg_features(jpg))
    assert len(rows[2]["feature"]) == 3  # stub path


def test_distributed_resize_real_for_jpeg(spark):
    from lance_flink_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
        resize_jpeg,
    )

    jpg = encode_jpeg(_smooth_rgb(32, 24), quality=90)
    blobs = spark.createDataFrame(
        [Row(doc_id=1, content=bytearray(jpg))], "doc_id long, content binary"
    )
    out = resize_images(blobs, 8, 8).collect()[0]
    assert (
        decode_jpeg(bytes(out["thumb"])) == decode_jpeg(resize_jpeg(jpg, 8, 8))
    ).all()


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("ri", [0, 3])
def test_jpeg_subsampling_and_restart_variants(sub, ri):
    """4:2:0 (interleaved multi-block MCUs + chroma upsample on
    decode) and restart markers (byte-align + DC reset) round-trip;
    chroma subsampling costs some color accuracy but never structure."""
    from lance_flink_spark.functions.multimodal import decode_jpeg, encode_jpeg

    img = _smooth_rgb(33, 46)  # non-multiple-of-16: exercises padding
    enc = encode_jpeg(img, quality=92, subsampling=sub, restart_interval=ri)
    dec = decode_jpeg(enc)
    assert dec.shape == (33, 46, 3)
    err = np.abs(dec.astype(np.float64) - img.astype(np.float64))
    assert err.mean() < (1.5 if sub == "444" else 5.0)
    if ri:
        assert b"\xff\xdd" in enc  # DRI segment present
        assert b"\xff\xd0" in enc  # at least one RST0


def test_jpeg_420_is_smaller_than_444():
    from lance_flink_spark.functions.multimodal import encode_jpeg

    img = _smooth_rgb(64, 64)
    assert len(encode_jpeg(img, subsampling="420")) < len(
        encode_jpeg(img, subsampling="444")
    )


class TestProgressiveJpeg:
    """Progressive (SOF2) decode: spectral selection + successive
    approximation (T.81 G.2). The progressive writer emits the same
    quantized coefficients as the baseline encoder, so the progressive
    decode must reproduce the baseline decode BIT-FOR-BIT."""

    @pytest.mark.parametrize("h,w", [(8, 8), (24, 40), (17, 23)])
    def test_progressive_equals_baseline_rgb(self, h, w):
        from lance_flink_spark.functions.multimodal import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        img = _smooth_rgb(h, w)
        base = decode_jpeg(encode_jpeg(img, quality=90))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=90))
        assert prog.shape == base.shape
        assert np.array_equal(prog, base)

    def test_progressive_equals_baseline_gray(self):
        from lance_flink_spark.functions.multimodal import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        img = _smooth_rgb(21, 19)[:, :, :1]
        base = decode_jpeg(encode_jpeg(img, quality=85))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=85))
        assert np.array_equal(prog, base)

    def test_progressive_equals_baseline_420_subsampling(self):
        from lance_flink_spark.functions.multimodal import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        img = _smooth_rgb(33, 46)  # non-multiple-of-16: padded MCU grid
        base = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=90, subsampling="420"))
        assert np.array_equal(prog, base)

    def test_progressive_quality_sweep_noisy_image(self):
        # noise exercises long runs, ZRL, EOB runs, and refinement
        # correction bits much harder than the smooth gradient
        from lance_flink_spark.functions.multimodal import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        for q in (30, 60, 95):
            base = decode_jpeg(encode_jpeg(img, quality=q))
            prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
            assert np.array_equal(prog, base), f"quality={q}"

    def test_decode_auto_takes_progressive_path(self):
        from lance_flink_spark.functions.multimodal import (
            decode_auto,
            encode_jpeg_progressive,
            jpeg_features,
        )

        blob = encode_jpeg_progressive(_smooth_rgb(16, 16))
        assert decode_auto(blob) == pytest.approx(jpeg_features(blob))
        assert len(decode_auto(blob)) == 4  # real image features, not stub

    def test_distributed_feature_extraction_progressive(self, spark):
        from lance_flink_spark.functions.multimodal import (
            encode_jpeg_progressive,
            extract_features,
            jpeg_features,
        )

        blob = encode_jpeg_progressive(_smooth_rgb(24, 24))
        blobs = spark.createDataFrame(
            [Row(doc_id=1, content=bytearray(blob))], "doc_id long, content binary"
        )
        rows = extract_features(blobs).collect()
        assert rows[0]["feature"] == pytest.approx(jpeg_features(blob))


def test_dhash_pixel_invariance_and_distance():
    """dHash is a function of PIXELS: the same image as PPM and as PNG
    under all four scanline filters hashes identically; a lightly
    perturbed image lands within a few bits; a different gradient is
    far."""
    import numpy as np

    from lance_flink_spark.functions.multimodal import (
        dhash64,
        encode_png,
        encode_ppm,
        hamming64,
    )

    x = np.arange(16)[None, :]
    y = np.arange(16)[:, None]
    g = (x * 13 + y * 7) % 251
    arr = np.stack([g, g, g], axis=2).astype(np.uint8)
    hashes = {dhash64(encode_ppm(arr))}
    for ft in range(4):
        hashes.add(dhash64(encode_png(arr, filter_type=ft)))
    assert len(hashes) == 1
    base = hashes.pop()
    near = arr.copy()
    near[0:2, 0:4] = 255  # a small hot block (downsample-visible)
    d_near = hamming64(base, dhash64(encode_ppm(near)))
    assert 0 < d_near <= 6
    g2 = (x * 29 + y * 31 + 97) % 251
    far = np.stack([g2, g2, g2], axis=2).astype(np.uint8)
    assert hamming64(base, dhash64(encode_ppm(far))) > 10
    # non-image bytes refuse instead of hashing garbage
    import pytest

    with pytest.raises(ValueError, match="decodable image"):
        dhash64(b"RIFF....WAVE")


def test_image_near_dup_pairs_banding(spark):
    """Banded dHash LSH: near-identical images pair up (pigeonhole —
    hamming <= bands-1 always shares an intact band), distinct
    gradients don't, and the hamming column is exact (JVM bit_count)."""
    import numpy as np

    from lance_flink_spark.functions.multimodal import encode_ppm
    from lance_flink_spark.operators.dedup import image_near_dup_pairs

    x = np.arange(16)[None, :]
    y = np.arange(16)[:, None]

    def img(slope, hot=False):
        g = (x * slope + y * 7) % 251
        arr = np.stack([g, g, g], axis=2).astype(np.uint8)
        if hot:
            arr[0:2, 0:4] = 255
        return bytes(encode_ppm(arr))

    rows = [
        (1, img(13)),
        (2, img(13, hot=True)),     # near-dup of 1
        (3, img(13)),               # exact dup of 1
        (4, img(101)),              # different image
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup_pairs(df, max_hamming=6).collect()
    }
    assert (1, 3) in got and got[(1, 3)] == 0
    assert (1, 2) in got and 0 < got[(1, 2)] <= 6
    assert (2, 3) in got
    assert not any(4 in pair for pair in got)


def test_audio_fp_invariance(spark):
    """audio_fp64 is a function of PITCH content: amplitude and phase
    variants of one tone fingerprint equal, different band-centered
    tones differ, stereo downmixes, and non-PCM refuses."""
    import io
    import wave

    import numpy as np
    import pytest

    from lance_flink_spark.functions.multimodal import audio_fp64
    from lance_flink_spark.operators.dedup import audio_fp_dedup

    sr = 4000
    t = np.arange(sr // 4) / sr

    def blob(freq, amp=0.3, phase=0.0, ch=1):
        x = (amp * np.sin(2 * np.pi * freq * t + phase) * 32000).astype(
            np.int16
        )
        if ch == 2:
            x = np.repeat(x, 2)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(ch)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(x.tobytes())
        return buf.getvalue()

    base = audio_fp64(blob(64 + 128 * 3))
    assert audio_fp64(blob(64 + 128 * 3, amp=0.5, phase=0.7)) == base
    assert audio_fp64(blob(64 + 128 * 3, ch=2)) == base  # stereo downmix
    assert audio_fp64(blob(64 + 128 * 7)) != base
    with pytest.raises(Exception):
        audio_fp64(b"not audio at all")
    # the operator groups amplitude variants of each tone
    rows = [
        (1, blob(64 + 128 * 2, amp=0.2)),
        (2, blob(64 + 128 * 2, amp=0.4)),
        (3, blob(64 + 128 * 5, amp=0.2)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = sorted(
        (r["keep_id"], r["n_copies"])
        for r in audio_fp_dedup(df).collect()
    )
    assert got == [(1, 2), (3, 1)]


def test_audio_fp_matches_per_window_reference():
    """The batched-rFFT fingerprint (r15) is BIT-identical to the
    original per-window loop — one flipped symbol would regroup a
    dedup, so the equivalence is pinned over fixture-shaped tones,
    noise, and lengths not divisible by 16 (incl. the empty-band
    n=32 edge where array_split pads with empty bands)."""
    import numpy as np

    from lance_flink_spark.functions.multimodal import audio_fp64

    def reference(x: np.ndarray) -> int:
        val = 0
        win = x.size // 16
        for w in range(16):
            seg = x[w * win : (w + 1) * win]
            mag = np.abs(np.fft.rfft(seg))
            mag[0] = 0.0
            bands = np.array_split(mag, 16)
            sym = int(np.argmax([b.sum() for b in bands]))
            val = (val << 4) | sym
        return val - (1 << 64) if val >= (1 << 63) else val

    def wav(x16: np.ndarray) -> bytes:
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(4000)
            f.writeframes(x16.tobytes())
        return buf.getvalue()

    rng = np.random.default_rng(7)
    sr = 4000
    t = np.arange(sr // 4) / sr
    cases = [
        (0.2 + 0.05 * (d % 7))
        * np.sin(2 * np.pi * (64.0 + 128.0 * (d % 13)) * t + 0.1 * (d % 11))
        * 32000
        for d in range(60)
    ]
    for n in (1000, 999, 1024, 555, 32, 47):
        cases += [rng.integers(-32768, 32767, size=n) for _ in range(10)]
    for x in cases:
        x16 = np.asarray(x).astype(np.int16)
        assert audio_fp64(wav(x16)) == reference(x16.astype(np.float64))


def test_audio_near_dup_pairs_windowed_lsh(spark):
    """Windowed-symbol LSH over audio fingerprints: a clip whose tail
    re-pitches (a few windows differ) pairs with its original, exact
    duplicates pair at 0 mismatches, and unrelated tones don't pair."""
    import io
    import wave

    import numpy as np

    from lance_flink_spark.operators.dedup import audio_near_dup_pairs

    sr = 4000
    n = sr // 4

    def blob(freq, tail_freq=None, amp=0.3):
        t = np.arange(n) / sr
        x = amp * np.sin(2 * np.pi * freq * t)
        if tail_freq is not None:
            cut = int(n * 0.8)  # last ~3 of 16 windows re-pitch
            t2 = np.arange(n - cut) / sr
            x[cut:] = amp * np.sin(2 * np.pi * tail_freq * t2)
        pcm = (x * 32000).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(pcm.tobytes())
        return buf.getvalue()

    f0, f1, f2 = 64 + 128 * 2, 64 + 128 * 9, 64 + 128 * 14
    rows = [
        (1, blob(f0)),
        (2, blob(f0, amp=0.5)),          # exact perceptual dup of 1
        (3, blob(f0, tail_freq=f1)),      # near-dup: tail re-pitched
        (4, blob(f2)),                    # unrelated tone
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        (r["id_a"], r["id_b"]): r["n_mismatch"]
        for r in audio_near_dup_pairs(df, max_mismatch=5).collect()
    }
    assert got.get((1, 2)) == 0
    assert (1, 3) in got and 0 < got[(1, 3)] <= 5
    assert (2, 3) in got
    assert not any(4 in p for p in got)
