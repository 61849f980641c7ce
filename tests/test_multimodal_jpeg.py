"""Real baseline JPEG codec: encoder/decoder round-trips, dispatch, and
the closed-form synth-fixture contract behind x_jpeg_ahash_dedup.

The encoder emits standard Annex-K tables, so the decoder here is reading
a genuinely standard baseline stream (canonical Huffman, zigzag, FDCT),
not a private format.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from query_skyline_qos_flink_spark.operators.multimodal import (
    AHASH_GRID,
    decode_image,
    decode_jpeg,
    encode_jpeg,
    image_ahash,
    synth_jpeg_payload,
)


def _smooth(h, w, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    return (
        (np.sin(x / (5 + seed % 7)) + np.cos(y / (7 + seed % 5))) * 40 + 128
    ).astype(np.uint8)


def test_grey_blocky_roundtrip_exact():
    """8x8-aligned constant blocks survive with error <= 1 grey level
    (DC-only spectrum, quant step 16 -> max error 16/(2*8))."""
    pix = np.kron(
        np.array([[64, 192], [192, 64]], dtype=np.uint8),
        np.ones((8, 8), dtype=np.uint8),
    )
    h, w, c, arr = decode_jpeg(encode_jpeg(pix))
    assert (h, w, c) == (16, 16, 1)
    assert np.abs(arr[..., 0].astype(int) - pix.astype(int)).max() <= 1


def test_grey_smooth_roundtrip_close():
    g = _smooth(64, 64)
    h, w, c, arr = decode_jpeg(encode_jpeg(g))
    assert (h, w, c) == (64, 64, 1)
    err = np.abs(arr[..., 0].astype(int) - g.astype(int))
    assert err.max() <= 12 and err.mean() < 3.0


def test_rgb_roundtrip_close():
    g = _smooth(48, 40)
    rgb = np.stack([g, g[::-1], _smooth(48, 40, seed=3)], axis=-1).astype(np.uint8)
    h, w, c, arr = decode_jpeg(encode_jpeg(rgb))
    assert (h, w, c) == (48, 40, 3)
    err = np.abs(arr.astype(int) - rgb.astype(int))
    assert err.max() <= 20 and err.mean() < 4.0


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_any_size_roundtrip_property(h, w, seed):
    """Arbitrary (non-multiple-of-8) sizes: correct shape, bounded error
    on smooth content, deterministic decode."""
    g = _smooth(h, w, seed)
    payload = encode_jpeg(g)
    hh, ww, c, arr = decode_jpeg(payload)
    assert (hh, ww, c) == (h, w, 1)
    assert np.abs(arr[..., 0].astype(int) - g.astype(int)).max() <= 15
    hh2, ww2, c2, arr2 = decode_jpeg(payload)
    assert np.array_equal(arr, arr2)


def test_decode_image_dispatches_jpeg():
    g = _smooth(16, 16)
    h, w, c, arr = decode_image(encode_jpeg(g))
    assert (h, w, c) == (16, 16, 1)


def test_rejects_bad_and_truncated():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    payload = encode_jpeg(_smooth(24, 24))
    for cut in (4, 30, 60, 120, len(payload) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(payload[:cut])


def test_rejects_doctored_progressive_sof():
    """Progressive streams ARE decoded now, but a doctored SOF0->SOF2 flip
    leaves a spec-invalid scan header (a progressive DC scan must have
    Se=0, yet the baseline SOS says Se=63) — reject, don't misdecode."""
    payload = bytearray(encode_jpeg(_smooth(16, 16)))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(payload))


def test_420_roundtrip_close_and_declares_subsampling():
    """4:2:0 chroma subsampling (the dominant real-crawl encoding): the
    stream must declare luma sampling 0x22, and smooth color content must
    survive the subsample + nearest-upsample round trip."""
    g = _smooth(48, 40)
    rgb = np.stack([g, g[::-1], _smooth(48, 40, seed=3)], axis=-1).astype(np.uint8)
    payload = encode_jpeg(rgb, subsample="420")
    sof = payload.find(b"\xff\xc0")
    assert payload[sof + 11] == 0x22  # first component: hi=2, vi=2
    p444 = encode_jpeg(rgb)
    assert len(payload) < len(p444)  # chroma blocks actually dropped
    h, w, c, arr = decode_jpeg(payload)
    assert (h, w, c) == (48, 40, 3)
    err = np.abs(arr.astype(int) - rgb.astype(int))
    assert err.max() <= 40 and err.mean() < 6.0  # chroma edges pay the subsample


def test_420_constant_chroma_matches_444_exactly():
    """R=G=B content has constant (128) chroma — invariant under 2x2
    box subsampling — so the 4:2:0 decode must be pixel-identical to the
    4:4:4 decode (the property the synth fixture contract relies on)."""
    g = _smooth(33, 31)  # odd dims: exercises chroma edge padding
    rgb = np.stack([g, g, g], axis=-1)
    a444 = decode_jpeg(encode_jpeg(rgb))[3]
    a420 = decode_jpeg(encode_jpeg(rgb, subsample="420"))[3]
    assert np.array_equal(a444, a420)


def test_progressive_decodes_identical_to_baseline():
    """Progressive (SOF2) streams carry the SAME quantized coefficients
    split across DC/AC first + successive-approximation refinement scans,
    so the decode must be BIT-IDENTICAL to the baseline encoding of the
    same image — across grey / 4:4:4 / 4:2:0."""
    g = _smooth(48, 40)
    rgb = np.stack([g, g[::-1], _smooth(48, 40, seed=3)], axis=-1).astype(np.uint8)
    for pix, kw in [
        (g, {}),
        (rgb, {}),
        (rgb, {"subsample": "420"}),
    ]:
        base = decode_jpeg(encode_jpeg(pix, **kw))[3]
        prog_payload = encode_jpeg(pix, progressive=True, **kw)
        assert prog_payload.find(b"\xff\xc2") > 0  # SOF2
        assert prog_payload.count(b"\xff\xda") >= 4  # multi-scan
        prog = decode_jpeg(prog_payload)[3]
        assert np.array_equal(base, prog)


@settings(max_examples=12, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_progressive_equals_baseline_property(h, w, seed):
    """Noise content (worst case for EOB runs, ZRL folding, and
    refinement correction bits) at arbitrary sizes: progressive and
    baseline encodings of the same pixels decode identically, for both
    subsampling modes."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    for ss in ("444", "420"):
        base = decode_jpeg(encode_jpeg(px, subsample=ss))[3]
        prog = decode_jpeg(encode_jpeg(px, subsample=ss, progressive=True))[3]
        assert np.array_equal(base, prog), (h, w, seed, ss)


def test_422_and_restart_intervals_decode_identical():
    """4:2:2 subsampling and DRI/RSTn restart intervals (baseline MCU
    units AND progressive block units, incl. EOB-run flushes at the
    boundary and the stuffed-0xFF-pad-before-RSTn case) must not change
    a single pixel relative to the restart-free encoding."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (29, 37, 3)).astype(np.uint8)
    for ss in ("444", "422", "420"):
        base = decode_jpeg(encode_jpeg(px, subsample=ss))[3]
        for prog in (False, True):
            for ri in (1, 3, 7):
                got = decode_jpeg(
                    encode_jpeg(px, subsample=ss, progressive=prog, restart_interval=ri)
                )[3]
                assert np.array_equal(base, got), (ss, prog, ri)
    # 4:2:2 declares hi=2, vi=1 and is exact on constant-chroma content
    g = _smooth(33, 31)
    rgb = np.stack([g, g, g], axis=-1)
    p422 = encode_jpeg(rgb, subsample="422")
    assert p422[p422.find(b"\xff\xc0") + 11] == 0x21
    assert np.array_equal(decode_jpeg(encode_jpeg(rgb))[3], decode_jpeg(p422)[3])


def test_synth_payload_rotates_encodings():
    """The fixture contract behind x_jpeg_ahash_dedup: key % 5 == 1 emits
    a baseline 4:2:0 color stream, key % 5 == 3 a progressive 4:2:0
    color stream, key % 5 == 2 a 12-bit extended-sequential (SOF1)
    greyscale stream, key % 5 == 4 an ARITHMETIC-coded (SOF9) 4:2:0
    color stream (round-16 seam closure), the rest 8-bit greyscale
    baseline — and every variant still decodes to the md5 block pattern
    (asserted by test_synth_payload_bits_closed_form, whose key sweep
    covers all variants)."""
    p_grey = synth_jpeg_payload(0)
    p_420 = synth_jpeg_payload(1)
    p_12 = synth_jpeg_payload(2)
    p_prog = synth_jpeg_payload(3)
    p_arith = synth_jpeg_payload(4)
    assert p_grey.find(b"\xff\xc0") > 0 and p_grey[p_grey.find(b"\xff\xc0") + 9] == 1
    sof = p_420.find(b"\xff\xc0")
    assert sof > 0 and p_420[sof + 9] == 3 and p_420[sof + 11] == 0x22
    sof12 = p_12.find(b"\xff\xc1")
    assert sof12 > 0 and p_12[sof12 + 4] == 12  # SOF1, precision byte 12
    assert p_12.find(b"\xff\xdb") > 0 and p_12[p_12.find(b"\xff\xdb") + 4] == 0x10
    assert p_prog.find(b"\xff\xc2") > 0 and p_prog.count(b"\xff\xda") >= 4
    # key 4 is even -> progressive SOF10; key 9 odd -> sequential SOF9
    sof10 = p_arith.find(b"\xff\xca")
    assert sof10 > 0 and p_arith[sof10 + 9] == 3 and p_arith[sof10 + 11] == 0x22
    assert p_arith.find(b"\xff\xcc") > 0  # DAC conditioning segment
    assert p_arith.find(b"\xff\xc4") < 0  # no Huffman tables
    assert synth_jpeg_payload(9).find(b"\xff\xc9") > 0


def test_synth_payload_bits_closed_form():
    """The x_jpeg_ahash_dedup contract: the aHash bit pattern of the
    synth JPEG equals the md5-derived bits for every key class."""
    for key in range(0, 40, 7):
        p = synth_jpeg_payload(key)
        h, w, c, arr = decode_jpeg(p)
        grey = arr.astype(np.float64).mean(axis=2)
        blocks = grey.reshape(AHASH_GRID, 8, AHASH_GRID, 8).mean(axis=(1, 3))
        v = 0
        for b in (blocks >= blocks.mean()).flatten():
            v = (v << 1) | int(b)
        assert v == int(hashlib.md5(f"img{key}".encode()).hexdigest()[:16], 16)


def test_image_ahash_spark_path_jpeg(spark):
    """End-to-end Spark path: synth JPEG payloads -> Arrow -> decode ->
    aHash groups ids by key class."""
    import pandas as pd

    from query_skyline_qos_flink_spark.operators.multimodal import attach_synth_payload

    df = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(12))}))
    pay = attach_synth_payload(df, "jpeg", key_mod=4)
    out = image_ahash(pay).toPandas()
    groups = out.groupby("ahash").doc_id.apply(lambda s: sorted(s)).to_dict()
    assert sorted(map(tuple, groups.values())) == [
        (0, 4, 8), (1, 5, 9), (2, 6, 10), (3, 7, 11),
    ]


def test_standalone_markers_in_header_are_skipped():
    """TEM (FF 01) and stray RSTn markers carry NO length segment; the
    parser must resume exactly 2 bytes past them (a spec-valid stream may
    interleave them between header segments)."""
    g = _smooth(16, 16)
    clean = decode_jpeg(encode_jpeg(g))[3]
    for marker in (b"\xff\x01", b"\xff\xd0"):
        payload = encode_jpeg(g)
        spliced = payload[:2] + marker + payload[2:]  # right after SOI
        h, w, c, arr = decode_jpeg(spliced)
        assert (h, w, c) == (16, 16, 1)
        assert np.array_equal(arr, clean)


def test_multiscan_color_rejected_not_silently_grey():
    """A baseline color file with each component in its own scan (ns <
    frame components) must raise, not silently return luma as greyscale."""
    rgb = np.stack([_smooth(16, 16), _smooth(16, 16, 2), _smooth(16, 16, 3)], axis=-1)
    payload = encode_jpeg(rgb.astype(np.uint8))
    idx = payload.find(b"\xff\xda")
    assert idx >= 0
    ln = int.from_bytes(payload[idx + 2 : idx + 4], "big")
    assert payload[idx + 4] == 3  # interleaved 3-component scan header
    # rewrite the SOS header to name only the first component (ns=1)
    comp0 = payload[idx + 5 : idx + 7]
    tail = payload[idx + 2 + ln - 3 : idx + 2 + ln]  # Ss/Se/Ah-Al bytes
    new_sos = b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01" + comp0 + tail
    doctored = payload[:idx] + new_sos + payload[idx + 2 + ln :]
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(doctored)


def test_encoder_input_shapes():
    g = _smooth(16, 16)
    single = g[..., None]  # (h, w, 1) treated as greyscale
    assert encode_jpeg(single) == encode_jpeg(g)
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8, 2), dtype=np.uint8))


def test_12bit_grey_dc_pattern_exact():
    """12-bit extended-sequential (SOF1): DC-only block pattern on the
    <<4 grid decodes EXACTLY back to the 8-bit pattern through the
    documented >>4 downshift."""
    from query_skyline_qos_flink_spark.operators.multimodal import _md5_block_pixels

    pix8 = _md5_block_pixels(9, None, on=192, off=64)
    p = encode_jpeg(pix8.astype(np.uint16) << 4, precision=12)
    assert b"\xff\xc1" in p
    h, w, c, arr = decode_jpeg(p)
    assert (h, w, c) == (64, 64, 1)
    assert np.array_equal(arr[..., 0], pix8)


def test_12bit_color_matches_8bit_error_envelope():
    """Same content encoded at 8-bit and at 12-bit (<<4) must decode to
    near-identical uint8 images — the x16-scaled quant tables keep the
    12-bit path's loss envelope at the 8-bit level."""
    rng = np.random.default_rng(6)
    col8 = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    _, _, _, a8 = decode_jpeg(encode_jpeg(col8))
    _, _, _, a12 = decode_jpeg(
        encode_jpeg(col8.astype(np.uint16) << 4, precision=12)
    )
    assert np.abs(a12.astype(int) - a8.astype(int)).max() <= 2


def test_12bit_input_and_marker_validation():
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg(np.zeros((8, 8), np.uint8), precision=10)
    with pytest.raises(ValueError, match="0, 4095"):
        encode_jpeg(np.full((8, 8), 5000, np.uint16), precision=12)
    with pytest.raises(ValueError, match="progressive"):
        encode_jpeg(np.zeros((8, 8), np.uint16), precision=12, progressive=True)
    # SOF0 is 8-bit-only per T.81: a 12-bit stream relabeled SOF0 raises
    good = encode_jpeg(np.full((8, 8), 1024, np.uint16), precision=12)
    bad = bytearray(good)
    bad[good.index(b"\xff\xc1") + 1] = 0xC0
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(bytes(bad))


def test_jpeg_precision_sniffer():
    """decode_image routes 12-bit streams away from the 8-bit-only Pillow
    backend; the sniffer must read the SOF precision byte through APPn /
    DQT / DHT / DRI segments and default to 8 on anything odd."""
    from query_skyline_qos_flink_spark.operators.multimodal import _jpeg_precision

    g8 = encode_jpeg(_smooth(16, 16))
    g12 = encode_jpeg(
        (_smooth(16, 16).astype(np.uint16) << 4), precision=12
    )
    prog = encode_jpeg(_smooth(16, 16), progressive=True)
    assert _jpeg_precision(g8) == 8
    assert _jpeg_precision(g12) == 12
    assert _jpeg_precision(prog) == 8
    assert _jpeg_precision(b"\xff\xd8\xff") == 8  # truncated -> default
