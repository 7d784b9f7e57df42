"""Baseline JPEG codec: round trips, spec-table checks, Spark wiring."""

from __future__ import annotations

import numpy as np
import pytest

from global_seismic_data_pipeline_spark.operators import codecs
from global_seismic_data_pipeline_spark.operators import jpegcodec as J


def _gradient(h=40, w=56):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            x * 255 / (w - 1),
            y * 255 / (h - 1),
            (x + y) * 255 / (w + h - 2),
        ],
        axis=-1,
    ).round().astype(np.uint8)


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-12))


# --- component checks against independent references -----------------------


def test_dct_matrix_matches_direct_formula_and_is_orthonormal():
    # independent O(N^4) evaluation of the T.81 FDCT definition
    block = np.arange(64, dtype=float).reshape(8, 8) - 30.0
    ref = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = sum(
                block[y, x]
                * np.cos((2 * x + 1) * v * np.pi / 16)
                * np.cos((2 * y + 1) * u * np.pi / 16)
                for x in range(8)
                for y in range(8)
            )
            ref[u, v] = 0.25 * cu * cv * s
    t = J.dct_matrix()
    assert np.allclose(t @ block @ t.T, ref, atol=1e-9)
    assert np.allclose(t @ t.T, np.eye(8), atol=1e-12)


def test_canonical_huffman_matches_published_spec_codes():
    # DC luma (T.81 Annex K.3.1): category -> code, well-known values
    dc = J._canonical_codes(*J.DC_LUMA_SPEC)
    assert dc[0] == (0b00, 2)
    assert dc[1] == (0b010, 3)
    assert dc[5] == (0b110, 3)
    assert dc[6] == (0b1110, 4)
    assert dc[11] == (0b111111110, 9)
    # AC luma: EOB = 1010 (4 bits), ZRL = 11111111001 (11 bits)
    ac = J._canonical_codes(*J.AC_LUMA_SPEC)
    assert ac[0x00] == (0b1010, 4)
    assert ac[0xF0] == (0b11111111001, 11)
    # prefix-free: no code is a prefix of a longer one
    codes = sorted(ac.values(), key=lambda cl: cl[1])
    for i, (c1, l1) in enumerate(codes):
        for c2, l2 in codes[i + 1 :]:
            if l2 > l1:
                assert (c2 >> (l2 - l1)) != c1


def test_zigzag_is_a_permutation_and_self_inverse():
    assert sorted(J.ZIGZAG.tolist()) == list(range(64))
    assert (J.ZIGZAG[J.UNZIGZAG] == np.arange(64)).all()


# --- round trips ------------------------------------------------------------


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_roundtrip_gradient(subsampling):
    img = _gradient()
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=95, subsampling=subsampling))
    assert dec.shape == img.shape
    assert _psnr(img, dec) > (45 if subsampling == "444" else 38)


def test_roundtrip_flat_image_exact():
    img = np.full((17, 23, 3), 200, np.uint8)  # non-multiple-of-8 dims
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=90))
    assert (dec == img).all()


def test_roundtrip_noise_bounded_error():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 8 and err.max() < 48


def test_roundtrip_single_pixel_and_odd_sizes():
    for shape in [(1, 1, 3), (3, 9, 3), (8, 8, 3), (9, 1, 3)]:
        img = (np.indices(shape[:2]).sum(axis=0) * 20 % 256).astype(np.uint8)
        img = np.stack([img, img // 2, 255 - img], axis=-1)
        for ss in ("444", "420"):
            dec = J.decode_jpeg(J.encode_jpeg(img, quality=95, subsampling=ss))
            assert dec.shape == img.shape


def test_quality_knob_trades_size_for_error():
    img = _gradient(64, 64)
    lo = J.encode_jpeg(img, quality=30)
    hi = J.encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    assert _psnr(img, J.decode_jpeg(hi)) > _psnr(img, J.decode_jpeg(lo))


# --- progressive (SOF2) ------------------------------------------------------


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_progressive_roundtrip_pixel_exact_vs_baseline(subsampling):
    """The progressive encoder reorders the SAME quantized coefficients
    the baseline encoder writes, so the two decodes must agree
    PIXEL-EXACTLY — any drift in the scan procedures (EOB runs, point
    transforms, refinement bits) shows up as a differing pixel."""
    img = _gradient(41, 53)  # non-multiple-of-8, exercises edge blocks
    enc_p = J.encode_jpeg_progressive(
        img, quality=90, subsampling=subsampling
    )
    assert b"\xff\xc2" in enc_p  # really SOF2
    dec_p = J.decode_jpeg(enc_p)
    dec_b = J.decode_jpeg(J.encode_jpeg(
        img, quality=90, subsampling=subsampling
    ))
    assert (dec_p == dec_b).all()
    assert _psnr(img, dec_p) > (40 if subsampling == "444" else 35)


def test_progressive_noise_multibit_successive_approximation():
    """dc_al=2 / ac_al=2: three DC scans + three AC scan waves per
    component — deep successive approximation over dense coefficients
    (noise) still reconstructs bit-identically to baseline."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    dec_p = J.decode_jpeg(J.encode_jpeg_progressive(
        img, quality=85, dc_al=2, ac_al=2
    ))
    dec_b = J.decode_jpeg(J.encode_jpeg(img, quality=85))
    assert (dec_p == dec_b).all()


def test_progressive_spectral_selection_only():
    """dc_al=0 / ac_al=0: no successive approximation, pure spectral
    selection — the minimal legal progressive script."""
    img = _gradient(16, 16)
    dec_p = J.decode_jpeg(J.encode_jpeg_progressive(
        img, quality=95, dc_al=0, ac_al=0
    ))
    dec_b = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    assert (dec_p == dec_b).all()


def test_progressive_flat_image_long_eob_runs():
    """A flat image's AC scans are one long EOB run spanning every
    block (EOBRUN > 1 paths on both sides) and its refinement scans are
    pure end-of-band corrections; decode stays exact."""
    img = np.full((33, 47, 3), 181, np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg_progressive(img, quality=90))
    assert (dec == img).all()


# --- guards -----------------------------------------------------------------


def test_progressive_malformed_dc_scan_rejected():
    """A SOF2 stream whose first scan claims the full baseline band
    (Ss=0, Se=63) is malformed — progressive DC scans must have Se=0."""
    enc = bytearray(J.encode_jpeg(_gradient(16, 16)))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 without fixing the scans
    with pytest.raises(ValueError, match="Se != 0"):
        J.decode_jpeg(bytes(enc))


def test_non_jpeg_rejected():
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x00\x01\x02\x03")


# --- integration with the codec dispatch and Spark operators ----------------


def test_decode_image_dispatches_jpeg():
    img = _gradient(24, 24)
    kind, px = codecs.decode_image(J.encode_jpeg(img, quality=95))
    assert kind == "jpeg"
    assert px.shape == img.shape
    assert _psnr(img, px) > 40


def test_resize_images_real_jpeg_payloads(spark):
    from global_seismic_data_pipeline_spark.operators import multimodal

    payloads = [
        (1, bytearray(J.encode_jpeg(_gradient(32, 48), quality=90))),
        (2, bytearray(J.encode_jpeg(_gradient(20, 20), quality=90, subsampling="420"))),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    out = multimodal.resize_images(df, width=16, height=12, fake=False).collect()
    assert len(out) == 2
    for r in out:
        kind, px = codecs.decode_image(bytes(r["payload"]))
        assert kind == "jpeg"
        assert px.shape == (12, 16, 3)
