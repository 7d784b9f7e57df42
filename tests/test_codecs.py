"""Real codec paths: pure-numpy BMP, stdlib WAV, and their Spark operators."""

import numpy as np
import pytest

from global_seismic_data_pipeline_spark.operators import codecs, multimodal


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 7) % 256, (y * 11) % 256, (x + y) % 256], axis=-1
    ).astype(np.uint8)


def test_bmp_round_trip_padded_width():
    # w=5 -> 15-byte rows padded to 16: exercises the stride math
    px = _gradient(4, 5)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(px)), px)


def test_bmp_round_trip_aligned_width():
    px = _gradient(3, 8)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(px)), px)


def test_sniff_magic_bytes():
    assert codecs.sniff(codecs.encode_bmp(_gradient(2, 2))) == "bmp"
    assert codecs.sniff(codecs.encode_wav(np.zeros(4, dtype=np.int16))) == "wav"
    assert codecs.sniff(b"\x89PNG\r\n\x1a\nxxxx") == "png"
    assert codecs.sniff(b"\xff\xd8\xff\xe0") == "jpeg"
    assert codecs.sniff(b"hello world") is None


def test_decode_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"not a bitmap at all, far too short pad pad pad pad pad")


def test_resize_nearest_identity_and_downsample():
    px = _gradient(4, 4)
    assert np.array_equal(codecs.resize_nearest(px, 4, 4), px)
    half = codecs.resize_nearest(px, 2, 2)
    # pixel-center mapping: dst 0 -> src floor(0.5*2)=1, dst 1 -> src 3
    assert np.array_equal(half, px[[1, 3]][:, [1, 3]])


def test_wav_round_trip():
    t = np.arange(800)
    sine = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype(np.int16)
    samples, rate = codecs.decode_wav(codecs.encode_wav(sine, 8000))
    assert rate == 8000
    assert np.array_equal(samples, sine)


@pytest.fixture(scope="module")
def bmp_df(spark):
    rows = [(i, bytearray(codecs.encode_bmp(_gradient(6 + i, 5 + i)))) for i in range(3)]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_extract_metadata_real_bmp(spark, bmp_df):
    out = {r.doc_id: r for r in multimodal.extract_metadata(bmp_df, fake=False).collect()}
    for i in range(3):
        assert (out[i].width, out[i].height) == (5 + i, 6 + i)
        assert out[i].header_byte == ord("B")


def test_resize_images_real_bmp(spark, bmp_df):
    out = {r.doc_id: r for r in
           multimodal.resize_images(bmp_df, width=3, height=2).collect()}
    for i in range(3):
        got = codecs.decode_bmp(bytes(out[i].payload))
        want = codecs.resize_nearest(_gradient(6 + i, 5 + i), 3, 2)
        assert np.array_equal(got, want)
        assert out[i].out_width == 3 and out[i].out_height == 2


def test_sample_frames_real_concatenated_bmp(spark):
    frames = [codecs.encode_bmp(_gradient(2, 2 + k)) for k in range(5)]
    container = b"".join(frames)
    df = spark.createDataFrame(
        [(1, bytearray(container)), (2, bytearray(frames[0]))],
        "doc_id long, payload binary",
    )
    out = multimodal.sample_frames(df, max_frames=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 4  # 5 frames capped at 4
    for r in by_doc[1]:
        assert bytes(r.frame) == frames[r.frame_idx]
        assert codecs.decode_bmp(bytes(r.frame)).shape == (2, 2 + r.frame_idx, 3)
    assert len(by_doc[2]) == 1


def test_extract_audio_features_real_wav(spark):
    loud = (np.sin(2 * np.pi * np.arange(1600) * 440 / 16000) * 20000).astype(np.int16)
    quiet = (loud // 10).astype(np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(codecs.encode_wav(loud))),
         (2, bytearray(codecs.encode_wav(quiet)))],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in multimodal.extract_audio_features(df).collect()}
    assert out[1].sample_rate == 16000 and out[1].num_samples == 1600
    assert out[1].duration_s == pytest.approx(0.1)
    assert out[1].rms == pytest.approx(20000 / np.sqrt(2), rel=0.01)
    assert out[1].peak == 20000
    assert out[2].rms < out[1].rms / 5


def test_jpeg_metadata_real_codec(spark):
    # baseline JPEG now has a real decoder (operators/jpegcodec.py):
    # extract_metadata reports true pixel dimensions
    from global_seismic_data_pipeline_spark.operators import jpegcodec

    img = np.tile(
        np.arange(48, dtype=np.uint8).reshape(1, 48, 1) * 5, (32, 1, 3)
    )
    df = spark.createDataFrame(
        [(1, bytearray(jpegcodec.encode_jpeg(img, quality=90)))],
        "doc_id long, payload binary",
    )
    row = multimodal.extract_metadata(df, fake=False).collect()[0]
    assert (row.width, row.height) == (48, 32)


def test_malformed_jpeg_still_raises(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff\xe0" + b"\0" * 64))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception):
        multimodal.extract_metadata(df, fake=False).collect()


# ---------------------------------------------------------------------------
# PNG codec


def _rand_rgb(h, w, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_round_trip():
    px = _rand_rgb(13, 9)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(px)), px)


def _filtered_png(px: np.ndarray, ftype: int) -> bytes:
    """Hand-assemble a PNG whose every scanline uses filter ``ftype`` —
    exercises each defilter path against an independent forward filter."""
    import struct
    import zlib

    h, w = px.shape[:2]
    flat = px.reshape(h, w * 3).astype(np.int64)
    ch = 3
    lines = bytearray()
    for y in range(h):
        row = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * ch, dtype=np.int64)
        stored = np.zeros(w * ch, dtype=np.int64)
        for x in range(w * ch):
            left = row[x - ch] if x >= ch else 0
            ul = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = prev[x]
            elif ftype == 3:
                pred = (left + prev[x]) // 2
            else:
                p = left + prev[x] - ul
                pa, pb, pc = abs(p - left), abs(p - prev[x]), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (prev[x] if pb <= pc else ul)
            stored[x] = (row[x] - pred) % 256
        lines += bytes([ftype]) + bytes(stored.astype(np.uint8))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    from global_seismic_data_pipeline_spark.operators.codecs import _png_chunk, _PNG_SIG

    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_all_filter_types_decode(ftype):
    px = _rand_rgb(7, 5, seed=ftype + 10)
    assert np.array_equal(codecs.decode_png(_filtered_png(px, ftype)), px)


def test_png_gray_and_rgba():
    import struct
    import zlib

    from global_seismic_data_pipeline_spark.operators.codecs import _png_chunk, _PNG_SIG

    # 2x2 grayscale: replicated into RGB
    g = np.array([[0, 255], [17, 200]], dtype=np.uint8)
    lines = b"".join(b"\x00" + bytes(g[y]) for y in range(2))
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(lines))
        + _png_chunk(b"IEND", b"")
    )
    out = codecs.decode_png(png)
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out[:, :, 0], g) and np.array_equal(out[:, :, 2], g)

    # 1x2 RGBA: alpha dropped
    rgba = bytes([1, 2, 3, 255, 9, 8, 7, 0])
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" + rgba))
        + _png_chunk(b"IEND", b"")
    )
    out = codecs.decode_png(png)
    assert np.array_equal(out, np.array([[[1, 2, 3], [9, 8, 7]]], dtype=np.uint8))


def test_png_rejects_bad_inputs():
    with pytest.raises(ValueError):
        codecs.decode_png(b"not a png at all")
    px = _rand_rgb(4, 4)
    with pytest.raises(ValueError):
        codecs.decode_png(codecs.encode_png(px)[:40])  # truncated


def test_extract_metadata_and_resize_real_png(spark):
    px1, px2 = _rand_rgb(8, 6, seed=1), _rand_rgb(5, 11, seed=2)
    df = spark.createDataFrame(
        [(1, bytearray(codecs.encode_png(px1))),
         (2, bytearray(codecs.encode_png(px2)))],
        "doc_id long, payload binary",
    )
    meta = {r.doc_id: r for r in multimodal.extract_metadata(df, fake=False).collect()}
    assert (meta[1].width, meta[1].height) == (6, 8)
    assert (meta[2].width, meta[2].height) == (11, 5)

    out = {
        r.doc_id: r
        for r in multimodal.resize_images(df, width=4, height=3).collect()
    }
    for doc_id, src in ((1, px1), (2, px2)):
        resized = codecs.decode_png(bytes(out[doc_id].payload))  # stays PNG
        assert resized.shape == (3, 4, 3)
        assert np.array_equal(resized, codecs.resize_nearest(src, 4, 3))


def test_resize_mixed_bmp_png_keeps_format(spark):
    px = _rand_rgb(6, 6, seed=7)
    df = spark.createDataFrame(
        [(1, bytearray(codecs.encode_bmp(px))),
         (2, bytearray(codecs.encode_png(px)))],
        "doc_id long, payload binary",
    )
    out = {
        r.doc_id: bytes(r.payload)
        for r in multimodal.resize_images(df, width=3, height=3).collect()
    }
    assert codecs.sniff(out[1]) == "bmp" and codecs.sniff(out[2]) == "png"
    assert np.array_equal(codecs.decode_bmp(out[1]), codecs.decode_png(out[2]))


def _rand_img(rng, h=40, w=48):
    return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_phash_invariant_to_format_and_brightness():
    """The same picture re-encoded (BMP→PNG) or uniformly brightened
    hashes identically; an unrelated picture is far away."""
    rng = np.random.RandomState(11)
    base = _rand_img(rng)
    other = _rand_img(rng)
    h_base = multimodal.phash64(base)
    h_png = multimodal.phash64(
        codecs.decode_image(codecs.encode_image("png", base))[1]
    )
    bright = np.clip(base.astype(np.int64) + 8, 0, 255).astype(np.uint8)
    h_bright = multimodal.phash64(bright)
    h_other = multimodal.phash64(other)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(h_base, h_png) == 0          # lossless re-encode
    assert ham(h_base, h_bright) <= 2       # DC-only shift
    assert ham(h_base, h_other) > 12        # unrelated content


def test_phash_robust_to_resize():
    """A downscaled copy of the image stays within the near-dup band
    (low-frequency structure survives resampling)."""
    rng = np.random.RandomState(5)
    # smooth image (random low-res upsampled) — pHash targets natural
    # images, not per-pixel noise
    small = rng.randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
    img = codecs.resize_nearest(small, 96, 80)
    shrunk = codecs.resize_nearest(img, 48, 40)
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(multimodal.phash64(img), multimodal.phash64(shrunk)) <= 3


def test_phash_near_dup_pairs_spark(spark):
    """End-to-end: payloads → mapInPandas pHash → banded Hamming join.
    Cross-format duplicates collide; unrelated images do not."""
    rng = np.random.RandomState(7)
    imgs = {1: _rand_img(rng), 3: _rand_img(rng), 4: _rand_img(rng)}
    payloads = [
        (1, bytearray(codecs.encode_image("bmp", imgs[1]))),
        (2, bytearray(codecs.encode_image("png", imgs[1]))),  # dup of 1
        (3, bytearray(codecs.encode_image("bmp", imgs[3]))),
        (4, bytearray(codecs.encode_image("png", imgs[4]))),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    hashes = multimodal.phash_images(df)
    pairs = multimodal.phash_near_dup_pairs(hashes).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}
    assert pairs[0].hamming == 0
