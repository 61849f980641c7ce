"""Arithmetic-coded JPEG (SOF9) — from-scratch T.81 Annex D/F entropy
codec (``operators/jpeg_arith.py``), conformance-tested against the
system libjpeg(-turbo).

Round-16 seam closure: the shared-library rescan found libjpeg-turbo
2.1.5 with the arithmetic coders compiled in, which re-opened the
"arithmetic-coded JPEG" external-decoder seam with an in-sandbox
conformance target.  The bridge is ``tools/jpeg_shim.c`` compiled at
test time (subprocess-isolated because libjpeg's fatal-error model can
``exit()``); tests gate on gcc + jpeglib.h the same way the libwebp
bridge gates on its shared library.

The decisive checks are ENTROPY-EXACTNESS twins, not pixel tolerances:
a Huffman and an arithmetic encoding of the SAME coefficients must
decode to IDENTICAL pixels under any single decoder (both entropy
layers are lossless), so any coefficient-level slip in the arithmetic
layer breaks equality outright — no IDCT-rounding wiggle room.
"""

from __future__ import annotations

import ctypes.util
import os
import shutil
import subprocess

import numpy as np
import pytest

from query_skyline_qos_flink_spark.operators import jpeg_arith
from query_skyline_qos_flink_spark.operators.multimodal import (
    decode_jpeg,
    encode_jpeg,
    image_ahash,  # noqa: F401  (fixture-class integration below)
    synth_jpeg_payload,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _libjpeg_path() -> str | None:
    for cand in ("/usr/lib/x86_64-linux-gnu/libjpeg.so.62", ctypes.util.find_library("jpeg")):
        if cand and os.path.exists(cand if cand.startswith("/") else f"/usr/lib/{cand}"):
            return cand
    return None


shim_possible = (
    shutil.which("gcc") is not None
    and os.path.exists("/usr/include/jpeglib.h")
)
needs_shim = pytest.mark.skipif(
    not shim_possible, reason="no gcc + jpeglib.h for the conformance shim"
)


@pytest.fixture(scope="module")
def shim(tmp_path_factory):
    exe = tmp_path_factory.mktemp("jshim") / "jpeg_shim"
    src = os.path.join(_REPO, "tools", "jpeg_shim.c")
    subprocess.run(
        ["gcc", "-O2", "-o", str(exe), src, "-ljpeg"], check=True, capture_output=True
    )

    def encode(raw: np.ndarray, quality: int = 90, arith: bool = True,
               prog: bool = False, tmp=tmp_path_factory.mktemp("jio")) -> bytes:
        h, w = raw.shape[:2]
        c = 1 if raw.ndim == 2 else raw.shape[2]
        (tmp / "in.raw").write_bytes(raw.tobytes())
        subprocess.run(
            [str(exe), "encode", str(tmp / "in.raw"), str(tmp / "out.jpg"),
             str(w), str(h), str(c), str(quality), str(int(arith)), str(int(prog))],
            check=True, capture_output=True,
        )
        return (tmp / "out.jpg").read_bytes()

    def decode(jpg: bytes, tmp=tmp_path_factory.mktemp("jio2")):
        (tmp / "in.jpg").write_bytes(jpg)
        r = subprocess.run(
            [str(exe), "decode", str(tmp / "in.jpg"), str(tmp / "out.raw")],
            check=True, capture_output=True, text=True,
        )
        w, h, c = (int(x) for x in r.stdout.split())
        arr = np.frombuffer((tmp / "out.raw").read_bytes(), dtype=np.uint8)
        return arr.reshape(h, w, c)

    return encode, decode


def test_qe_table_matches_the_standard_via_libjpeg():
    """Cross-check our transcription of ITU-T T.81 Table D.3 against the
    system library's exported ``jpeg_aritab`` (same standard data,
    independent transcription) — a slipped Qe/NMPS/NLPS entry would
    corrupt adaptation paths and is invisible to short roundtrips."""
    path = _libjpeg_path()
    if path is None:
        pytest.skip("libjpeg shared library not present")
    lib = ctypes.CDLL(path)
    tab = ctypes.cast(lib.jpeg_aritab, ctypes.POINTER(ctypes.c_int64))
    for i, (qe, nmps, nlps, sw) in enumerate(jpeg_arith._QE):
        v = tab[i] & 0xFFFFFFFF
        assert (v >> 16) == qe, f"Qe mismatch at state {i}"
        assert ((v >> 8) & 0xFF) == nmps, f"NMPS mismatch at state {i}"
        assert (v & 0x7F) == nlps, f"NLPS mismatch at state {i}"
        assert ((v >> 7) & 1) == sw, f"SWITCH mismatch at state {i}"


def test_coder_roundtrip_property():
    """Hypothesis: ANY decision sequence over ANY bin assignment
    roundtrips exactly — the coder pair is inverse by construction,
    including carry/stuffing/flush edge cases the seeded trials may
    miss."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 1), st.integers(0, 7)),
            min_size=0,
            max_size=600,
        )
    )
    def roundtrip(seq):
        enc = jpeg_arith.ArithEncoder()
        st_e = jpeg_arith._new_stats(8)
        for b, i in seq:
            enc.code(st_e, i, b)
        data = enc.flush() + b"\xff\xd9"
        dec = jpeg_arith.ArithDecoder(data, 0)
        st_d = jpeg_arith._new_stats(8)
        assert [dec.decode(st_d, i) for _b, i in seq] == [b for b, _i in seq]

    roundtrip()


def test_coder_roundtrip_random_bits():
    """The bare QM coder: random decision sequences over shared adapting
    bins roundtrip exactly (encoder and decoder walk identical state)."""
    rng = np.random.default_rng(5)
    for trial in range(8):
        bits = rng.integers(0, 2, int(rng.integers(1, 4000))).tolist()
        bins = rng.integers(0, 16, len(bits)).tolist()
        enc = jpeg_arith.ArithEncoder()
        st_e = jpeg_arith._new_stats(16)
        for b, i in zip(bits, bins):
            enc.code(st_e, i, int(b))
        seg = enc.flush() + b"\xff\xd9"
        dec = jpeg_arith.ArithDecoder(seg, 0)
        st_d = jpeg_arith._new_stats(16)
        got = [dec.decode(st_d, i) for i in bins]
        assert got == bits, f"trial {trial}"


def test_roundtrip_twins_match_huffman():
    """Arithmetic and Huffman encodes of the same pixels carry identical
    quantized coefficients, so OUR decoder must produce IDENTICAL pixels
    for both — bit-exactness of the entropy layer, no IDCT tolerance."""
    rng = np.random.default_rng(7)
    grey = rng.integers(0, 256, (80, 56), dtype=np.uint8)
    rgb = rng.integers(0, 256, (48, 72, 3), dtype=np.uint8)
    cases = [
        (encode_jpeg(grey, arithmetic=True), encode_jpeg(grey)),
        (encode_jpeg(rgb, arithmetic=True), encode_jpeg(rgb)),
        (
            encode_jpeg(rgb, subsample="420", arithmetic=True, restart_interval=3),
            encode_jpeg(rgb, subsample="420", restart_interval=3),
        ),
        (
            encode_jpeg(rgb, subsample="422", arithmetic=True),
            encode_jpeg(rgb, subsample="422"),
        ),
    ]
    for i, (a, h) in enumerate(cases):
        _, _, _, pa = decode_jpeg(a)
        _, _, _, ph = decode_jpeg(h)
        assert np.array_equal(pa, ph), f"case {i}"
        assert a.find(b"\xff\xc9") > 0 and a.find(b"\xff\xc4") < 0


def test_roundtrip_12bit():
    g12 = (np.random.default_rng(9).integers(0, 256, (32, 40)).astype(np.uint16)) << 4
    _, _, _, pa = decode_jpeg(encode_jpeg(g12, precision=12, arithmetic=True))
    _, _, _, ph = decode_jpeg(encode_jpeg(g12, precision=12))
    assert np.array_equal(pa, ph)


def test_stress_roundtrip_odd_sizes():
    """Many seeds and odd geometries drive the carry/stuffing edge cases
    (stacked 0xFF bytes, carry propagation, flush tails)."""
    for seed in range(12):
        rng = np.random.default_rng(seed)
        h, w = int(rng.integers(8, 90)), int(rng.integers(8, 90))
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        _, _, _, pa = decode_jpeg(encode_jpeg(g, arithmetic=True))
        _, _, _, ph = decode_jpeg(encode_jpeg(g))
        assert np.array_equal(pa, ph), f"seed {seed} ({h}x{w})"


@needs_shim
def test_our_decoder_reads_libjpeg_arithmetic(shim):
    """Entropy-exactness against the system encoder: libjpeg's Huffman
    and arithmetic encodes of the same raw input carry identical
    coefficients, so OUR decoder must read them to identical pixels."""
    encode, _decode = shim
    rng = np.random.default_rng(11)
    grey = np.ascontiguousarray(rng.integers(0, 256, (80, 56), dtype=np.uint8))
    rgb = np.ascontiguousarray(rng.integers(0, 256, (40, 64, 3), dtype=np.uint8))
    for raw in (grey, rgb):
        _, _, _, ph = decode_jpeg(encode(raw, arith=False))
        _, _, _, pa = decode_jpeg(encode(raw, arith=True))
        assert np.array_equal(ph, pa)


@needs_shim
def test_libjpeg_reads_our_arithmetic(shim):
    """The mirror direction: our Huffman and arithmetic twins must be
    identical under LIBJPEG's decoder."""
    _encode, decode = shim
    rng = np.random.default_rng(13)
    grey = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    rgb = rng.integers(0, 256, (48, 72, 3), dtype=np.uint8)
    for ours_a, ours_h in (
        (encode_jpeg(grey, arithmetic=True), encode_jpeg(grey)),
        (
            encode_jpeg(rgb, subsample="420", arithmetic=True, restart_interval=4),
            encode_jpeg(rgb, subsample="420", restart_interval=4),
        ),
    ):
        assert np.array_equal(decode(ours_a), decode(ours_h))


@needs_shim
def test_arithmetic_compresses_tighter_than_huffman(shim):
    """The reason the encoding exists: on non-trivial content the QM
    coder beats the fixed Huffman tables (here by >= 5%)."""
    rng = np.random.default_rng(17)
    g = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    a, h = encode_jpeg(g, arithmetic=True), encode_jpeg(g)
    assert len(a) < 0.95 * len(h)


def test_progressive_arithmetic_roundtrip_twins():
    """SOF10 (progressive arithmetic, Annex G.2 models): our arithmetic
    and Huffman progressive twins carry identical coefficients, so OUR
    decoder must read them to identical pixels — covers DC first/refine,
    AC first (point-transformed sequential model) and the G.2.3 AC
    correction-bit model across the default 10-scan script."""
    rng = np.random.default_rng(23)
    grey = rng.integers(0, 256, (80, 56), dtype=np.uint8)
    rgb = rng.integers(0, 256, (48, 72, 3), dtype=np.uint8)
    cases = [
        (
            encode_jpeg(grey, progressive=True, arithmetic=True),
            encode_jpeg(grey, progressive=True),
        ),
        (
            encode_jpeg(rgb, subsample="420", progressive=True, arithmetic=True),
            encode_jpeg(rgb, subsample="420", progressive=True),
        ),
        (
            encode_jpeg(rgb, subsample="420", progressive=True, arithmetic=True,
                        restart_interval=3),
            encode_jpeg(rgb, subsample="420", progressive=True, restart_interval=3),
        ),
    ]
    for i, (a, h) in enumerate(cases):
        assert a.find(b"\xff\xca") > 0 and a.find(b"\xff\xc4") < 0
        _, _, _, pa = decode_jpeg(a)
        _, _, _, ph = decode_jpeg(h)
        assert np.array_equal(pa, ph), f"case {i}"


@needs_shim
def test_progressive_arithmetic_libjpeg_both_directions(shim):
    """SOF10 conformance: our decoder reads libjpeg's progressive-
    arithmetic output entropy-exactly, and libjpeg reads ours."""
    encode, decode = shim
    rng = np.random.default_rng(31)
    rgb = np.ascontiguousarray(rng.integers(0, 256, (40, 64, 3), dtype=np.uint8))
    # theirs -> ours
    _, _, _, ph = decode_jpeg(encode(rgb, arith=False, prog=True))
    _, _, _, pa = decode_jpeg(encode(rgb, arith=True, prog=True))
    assert np.array_equal(ph, pa)
    # ours -> theirs
    ours_a = encode_jpeg(rgb, subsample="420", progressive=True, arithmetic=True)
    ours_h = encode_jpeg(rgb, subsample="420", progressive=True)
    assert np.array_equal(decode(ours_a), decode(ours_h))


def test_misaligned_restart_raises():
    rgb = np.random.default_rng(19).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    buf = bytearray(encode_jpeg(rgb, arithmetic=True, restart_interval=2))
    # corrupt the first RST marker into a non-restart marker byte
    for i in range(len(buf) - 1):
        if buf[i] == 0xFF and 0xD0 <= buf[i + 1] <= 0xD7:
            buf[i + 1] = 0xD9
            break
    else:
        pytest.fail("no restart marker found")
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bytes(buf))


def test_dac_validation():
    a = bytearray(encode_jpeg(np.zeros((16, 16), dtype=np.uint8), arithmetic=True))
    i = bytes(a).find(b"\xff\xcc")
    assert i > 0
    # payload: [00, (U<<4)|L, 10, Kx] after the FF CC + 2 length bytes
    a[i + 7] = 0x00  # AC Kx = 0: out of the 1..63 range
    with pytest.raises(ValueError, match="Kx"):
        decode_jpeg(bytes(a))


@pytest.mark.parametrize("key,marker", [(9, b"\xff\xc9"), (4, b"\xff\xca")])
def test_fixture_class4_is_arithmetic_and_decodes(key, marker):
    """The rotating ahash fixture's new class: key % 5 == 4 emits
    sequential SOF9 (odd keys) or progressive SOF10 (even keys) and
    still reconstructs the md5 block pattern (the closed-form oracle
    contract of x_jpeg_ahash_dedup)."""
    import hashlib

    p = synth_jpeg_payload(key)
    assert p.find(marker) > 0 and p.find(b"\xff\xc4") < 0
    h, w, c, arr = decode_jpeg(p)
    assert (h, w, c) == (64, 64, 3)
    grey = arr.astype(np.float64).mean(axis=2)
    blocks = grey.reshape(8, 8, 8, 8).mean(axis=(1, 3))
    v = 0
    for b in (blocks >= blocks.mean()).flatten():
        v = (v << 1) | int(b)
    assert v == int(hashlib.md5(f"img{key}".encode()).hexdigest()[:16], 16)
