"""libwebp ctypes bridge: lossy-VP8 decode, fixture contracts, and —
most valuable — EXTERNAL conformance for the from-scratch VP8L codec:
libwebp must decode our encoder's streams bit-identically, and our
decoder must read libwebp's own lossless encoder output (which exercises
predictor/color transforms, meta prefix-code groups and real LZ77 —
paths our fixture encoder never emits).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from query_skyline_qos_flink_spark.operators import libwebp_bridge as B
from query_skyline_qos_flink_spark.operators import webp as W
from query_skyline_qos_flink_spark.operators.multimodal import (
    _md5_block_pixels,
    _synth_webp_twin,
    decode_image,
    synth_image_payload,
)

pytestmark = pytest.mark.skipif(
    not B.available(), reason="libwebp shared library not present"
)


def _expand(px):
    x = np.asarray(px, np.uint8)
    if x.ndim == 2:
        x = np.stack([x, x, x], axis=-1)
    if x.shape[2] == 3:
        x = np.concatenate([x, np.full(x.shape[:2] + (1,), 255, np.uint8)], axis=2)
    return x


def _ahash_bits(arr, grid=8) -> int:
    h, w = arr.shape[:2]
    grey = arr.astype(np.float64).mean(axis=2)
    by, bx = max(h // grid, 1), max(w // grid, 1)
    hh, ww = (h // by) * by, (w // bx) * bx
    blocks = grey[:hh, :ww].reshape(hh // by, by, ww // bx, bx).mean(axis=(1, 3))
    bits = (blocks[:grid, :grid] >= blocks.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


def _expected_bits(key: int, flip=None) -> int:
    bits = int(hashlib.md5(f"img{key}".encode()).hexdigest()[:16], 16)
    if flip is not None:
        bits ^= 1 << (63 - flip)
    return bits


# ---------------------------------------------------------------------------
# lossy decode path
# ---------------------------------------------------------------------------


def test_lossy_roundtrip_shape_and_values():
    img = np.zeros((32, 48, 3), np.uint8)
    img[:16] = 200
    img[16:] = 60
    payload = B.encode_webp_lossy(img, quality=90.0)
    assert payload[:4] == b"RIFF" and payload[12:16] == b"VP8 "
    h, w, c, arr = B.decode_webp_rgba(payload)
    assert (h, w, c) == (32, 48, 4)
    assert np.all(arr[..., 3] == 255)
    # flat halves reconstruct within a few grey levels at q90
    assert abs(float(arr[:16, :, :3].mean()) - 200) < 4
    assert abs(float(arr[16:, :, :3].mean()) - 60) < 4


def test_decode_webp_dispatches_lossy_to_bridge():
    payload = B.encode_webp_lossy(_md5_block_pixels(6, None, on=255, off=0))
    h, w, c, arr = W.decode_webp(payload)
    assert (h, w, c) == (64, 64, 4)
    h2, w2, c2, arr2 = decode_image(payload)
    assert np.array_equal(arr, arr2)


def test_lossy_decode_deterministic():
    payload = B.encode_webp_lossy(_md5_block_pixels(10, 3, on=255, off=0), 90.0)
    digests = {
        hashlib.md5(B.decode_webp_rgba(payload)[3].tobytes()).hexdigest()
        for _ in range(3)
    }
    assert len(digests) == 1


# ---------------------------------------------------------------------------
# fixture contracts: lossy classes keep the exact md5 aHash bits
# ---------------------------------------------------------------------------


def test_lossy_fixture_ahash_bits_exact_sweep():
    """The rotating fixtures' whole closed-form-oracle premise: lossy-VP8
    quantization of the 8px block pattern never crosses the global-mean
    threshold, so aHash recovers EXACTLY the md5 bits — base images and
    Hamming-1 twins, across qualities."""
    for q in (75.0, 90.0, 95.0):
        for key in range(0, 120, 2):
            for flip in (None, (key * 7) % 64):
                pix = _md5_block_pixels(key, flip, on=255, off=0)
                h, w, c, arr = W.decode_webp(B.encode_webp_lossy(pix, q))
                assert _ahash_bits(arr) == _expected_bits(key, flip), (q, key, flip)


def test_synth_image_payload_lossy_class():
    """key % 6 == 4 emits a lossy VP8 stream whose decode still recovers
    the exact md5 aHash bits (the dedup-clustering contract)."""
    for key in (4, 10, 16, 22, 28, 46):
        payload = synth_image_payload(key)
        assert payload[12:16] == b"VP8 ", key
        _, _, _, arr = decode_image(payload)
        assert _ahash_bits(arr) == _expected_bits(key)


def test_twin_fixture_lossy_class_hamming_one():
    """Neardup pair class 4 ((key // 2) % 5): lossy base + lossy flipped
    twin differ in exactly the flipped aHash bit."""
    for key in (8, 18, 28, 58):  # (key // 2) % 5 == 4
        flip = (key * 7) % 64
        base = _synth_webp_twin(key, None, lossy=True)
        twin = _synth_webp_twin(key, flip, lossy=True)
        assert base[12:16] == b"VP8 " and twin[12:16] == b"VP8 "
        _, _, _, a = decode_image(base)
        _, _, _, b = decode_image(twin)
        ha, hb = _ahash_bits(a), _ahash_bits(b)
        assert bin(ha ^ hb).count("1") == 1
        assert ha == _expected_bits(key) and hb == _expected_bits(key, flip)


# ---------------------------------------------------------------------------
# external conformance for the from-scratch VP8L codec
# ---------------------------------------------------------------------------


def test_libwebp_decodes_our_vp8l_streams_bit_exact():
    """Our VP8L ENCODER vs the reference decoder: libwebp must reproduce
    the input pixels exactly from our streams, across the encoder's whole
    feature matrix (palette densities, subtract-green, color cache off,
    LZ77 runs, noise)."""
    rng = np.random.default_rng(11)
    pal200 = rng.integers(0, 256, (200, 3)).astype(np.uint8)
    cases = [
        (rng.integers(0, 256, (23, 41, 3)).astype(np.uint8), {}),
        (rng.integers(0, 256, (16, 16, 4)).astype(np.uint8), {}),
        (rng.integers(0, 256, (19, 29, 3)).astype(np.uint8), {"use_cache": False}),
        (
            rng.integers(0, 256, (19, 29, 3)).astype(np.uint8),
            {"use_subtract_green": True, "use_palette": False},
        ),
        ((rng.integers(0, 2, (19, 29)) * 255).astype(np.uint8), {}),
        ((rng.integers(0, 13, (19, 29)) * 19).astype(np.uint8), {}),
        (pal200[rng.integers(0, 200, (19, 29))], {"use_palette": True}),
        (np.full((10, 33, 3), 201, np.uint8), {}),
    ]
    for px, kw in cases:
        payload = W.encode_webp(px, **kw)
        h, w, c, arr = B.decode_webp_rgba(payload)
        exp = _expand(px)
        assert (h, w) == exp.shape[:2], kw
        assert np.array_equal(arr, exp), kw


def test_our_decoder_reads_libwebp_lossless_streams_bit_exact():
    """Our VP8L DECODER vs the reference encoder: libwebp's lossless
    encoder uses predictor/color transforms, meta prefix-code groups and
    real LZ77 — decoder paths our own encoder never emits; previously
    they were only covered by hand-built streams."""
    rng = np.random.default_rng(12)
    smooth = np.add.outer(
        np.arange(48) * 3, np.arange(64) * 2
    ).astype(np.uint8)  # gradient -> predictor transform territory
    cases = [
        np.stack([smooth, smooth[::-1], smooth[:, ::-1]], axis=-1),
        rng.integers(0, 256, (33, 57, 3)).astype(np.uint8),
        # alpha drawn from [1, 255]: libwebp's simple lossless API runs
        # with exact=0, which ZEROES the RGB of fully-transparent pixels
        # — a deliberate encoder-side rewrite, not a decode bug
        np.concatenate(
            [
                rng.integers(0, 256, (40, 40, 3)),
                rng.integers(1, 256, (40, 40, 1)),
            ],
            axis=2,
        ).astype(np.uint8),
        (rng.integers(0, 5, (64, 64)) * 60).astype(np.uint8),
        np.tile(rng.integers(0, 256, (8, 8, 3)).astype(np.uint8), (8, 8, 1)),
    ]
    # 160x160 structured "photo": large enough that libwebp enables its
    # heavier stream features (entropy-image prefix groups, cross-color,
    # color cache) that the small cases above may not trigger
    y, x = np.mgrid[0:160, 0:160]
    base = np.sin(x / 9.0) * 60 + np.cos(y / 13.0) * 50 + 128
    tex = rng.integers(-12, 13, (160, 160))
    cases.append(
        np.stack(
            [
                np.clip(base + tex, 0, 255),
                np.clip(base[::-1] + tex, 0, 255),
                np.clip((x + y) // 2 % 256 + tex, 0, 255),
            ],
            axis=-1,
        ).astype(np.uint8)
    )
    for px in cases:
        payload = B.encode_webp_lossless(px)
        assert payload[12:16] == b"VP8L"
        h, w, c, arr = W.decode_webp(payload)
        exp = _expand(px)
        assert (h, w) == exp.shape[:2]
        assert np.array_equal(arr, exp)
