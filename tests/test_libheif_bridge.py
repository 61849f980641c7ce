"""AVIF/HEIF pixel decode through the system libheif
(``operators/libheif_bridge.py``) — the round-16 bridge that moves the
AVIF still-image PIXEL layer out of the mdat-codec-bitstream seam, the
same way the lossy-VP8 path rides libwebp.

Environment-gated like the libwebp bridge: when libheif is absent every
test here skips and the fixture rotation's class 3 falls back to PNG
(asserted available-independent below where possible)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from query_skyline_qos_flink_spark.operators import libheif_bridge
from query_skyline_qos_flink_spark.operators.multimodal import (
    _md5_block_pixels,
    decode_image,
    synth_image_payload,
)

pytestmark = pytest.mark.skipif(
    not libheif_bridge.available(), reason="libheif shared library not present"
)


def _ahash_bits(arr) -> int:
    grey = arr.astype(np.float64).mean(axis=2) if arr.ndim == 3 else arr.astype(np.float64)
    blocks = grey.reshape(8, 8, 8, 8).mean(axis=(1, 3))
    v = 0
    for b in (blocks >= blocks.mean()).flatten():
        v = (v << 1) | int(b)
    return v


def test_avif_lossless_roundtrip_exact_on_block_pattern():
    """AV1 lossless is exact for the R=G=B block-constant fixture
    pattern — the property the fixture class relies on."""
    pix = _md5_block_pixels(7, None, on=255, off=0)
    data = libheif_bridge.encode_avif(pix, lossless=True)
    assert data[4:12] == b"ftypavif"
    h, w, c, out = libheif_bridge.decode_heif(data)
    assert (h, w, c) == (64, 64, 3)
    assert np.array_equal(out[..., 0], pix)
    assert np.array_equal(out[..., 0], out[..., 1]) and np.array_equal(
        out[..., 1], out[..., 2]
    )


def test_decode_image_dispatches_ftyp():
    pix = _md5_block_pixels(11, None, on=255, off=0)
    data = libheif_bridge.encode_avif(pix, lossless=True)
    h, w, c, out = decode_image(data)
    assert (h, w, c) == (64, 64, 3)
    assert np.array_equal(out[..., 0], pix)


def test_fixture_class3_is_avif_with_exact_ahash():
    """synth_image_payload's class key % 6 == 3 emits AVIF (with libheif
    present) and the aHash still equals the md5-derived bits — the
    closed-form contract of x_image_ahash_dedup."""
    for key in (3, 9, 21):
        p = synth_image_payload(key)
        assert p[4:12] == b"ftypavif"
        _h, _w, _c, arr = decode_image(p)
        assert _ahash_bits(arr) == int(
            hashlib.md5(f"img{key}".encode()).hexdigest()[:16], 16
        )


def test_container_walker_agrees_with_bridge_dims():
    """Cross-layer conformance: our own from-scratch HEIF container
    walker (operators/mp4.py, oracle-gated r15) must report the same
    primary-item dimensions the library actually decodes."""
    from query_skyline_qos_flink_spark.operators.mp4 import parse_heif_meta

    pix = _md5_block_pixels(13, None, on=255, off=0)
    data = libheif_bridge.encode_avif(pix, lossless=True)
    meta = parse_heif_meta(data)
    h, w, _c, _out = libheif_bridge.decode_heif(data)
    got = (meta.get("width"), meta.get("height")) if isinstance(meta, dict) else (
        getattr(meta, "width", None), getattr(meta, "height", None)
    )
    assert got == (w, h)


def test_lossy_quality_path_and_errors():
    pix = _md5_block_pixels(5, None, on=255, off=0)
    lossy = libheif_bridge.encode_avif(pix, lossless=False, quality=60)
    h, w, c, out = libheif_bridge.decode_heif(lossy)
    assert (h, w, c) == (64, 64, 3)
    # block-constant content survives quantization far inside the
    # global-mean threshold
    assert _ahash_bits(out) == int(hashlib.md5(b"img5").hexdigest()[:16], 16)
    with pytest.raises(ValueError, match="libheif"):
        libheif_bridge.decode_heif(b"\x00\x00\x00\x1cftypavif" + b"\x00" * 10)
