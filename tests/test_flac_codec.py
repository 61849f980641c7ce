"""From-scratch FLAC codec: bit-exact round trips, spec-constant pins,
and hand-built streams for the decoder-only paths the fixture encoder
never emits (VERBATIM and LPC subframes, stereo decorrelation modes,
multi-partition residuals, Rice2, wasted bits), plus the CRC gates.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from query_skyline_qos_flink_spark.operators import flac as FL


def _roundtrip(samples, sr=8000):
    nch, got_sr, arr = FL.decode_flac(FL.encode_flac(samples, sr))
    exp = np.asarray(samples, dtype=np.int64)
    if exp.ndim == 1:
        exp = exp[:, None]
    assert got_sr == sr
    assert arr.shape == exp.shape
    assert np.array_equal(arr, exp)


# ---------------------------------------------------------------------------
# CRC pins: published check values (CRC-8/ATM "123456789" -> 0xF4,
# CRC-16/BUYPASS -> 0xFEE8) — the FLAC polynomials with init 0
# ---------------------------------------------------------------------------


def test_crc_pins():
    assert FL.crc8(b"123456789") == 0xF4
    assert FL.crc16(b"123456789") == 0xFEE8
    assert FL.crc8(b"") == 0 and FL.crc16(b"") == 0


def test_fixed_predictor_coefficients_are_binomial():
    for order, coefs in FL._FIXED_COEFS.items():
        want = [
            (-1) ** j * _binom(order, j + 1) for j in range(order)
        ]
        assert coefs == want, order


def _binom(n, k):
    import math

    return math.comb(n, k)


# ---------------------------------------------------------------------------
# round trips (lossless: no tolerance anywhere)
# ---------------------------------------------------------------------------


def test_roundtrip_shapes():
    rng = np.random.default_rng(5)
    _roundtrip(np.tile([2000, -2000], 680).astype(np.int16))
    _roundtrip(rng.integers(-30000, 30000, 9999).astype(np.int16))
    _roundtrip(np.full(5000, -321, np.int16))
    _roundtrip(rng.integers(-1000, 1000, (5000, 2)).astype(np.int16))
    _roundtrip(np.arange(-4000, 4000, 3).astype(np.int16), sr=44100)
    _roundtrip(np.array([5], np.int16))
    _roundtrip(np.zeros(0, np.int16))
    _roundtrip(np.array([[-32768, 32767]] * 10, np.int16))  # extremes
    # > one block with a partial tail block
    _roundtrip(rng.integers(-100, 100, 4096 * 2 + 37).astype(np.int16))


def test_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(st.integers(-32768, 32767), min_size=0, max_size=600),
        st.sampled_from([1, 2]),
        st.sampled_from([8000, 16000, 48000]),
    )
    def run(vals, nch, sr):
        n = len(vals) - len(vals) % nch
        arr = np.array(vals[:n], np.int16).reshape(-1, nch)
        _roundtrip(arr, sr=sr)

    run()


def test_multibyte_coded_frame_numbers_roundtrip():
    """> 127 frames forces the UTF-8-style multi-byte number path on
    both sides.  130 frames of 32 samples via a tiny block size is too
    slow; instead exercise _write/_read_coded_number directly across
    every byte-length class."""
    for val in (0, 127, 128, 2047, 2048, 65535, 1 << 20, 1 << 25, 1 << 30,
                (1 << 36) - 1):
        out = bytearray()
        FL._write_coded_number(out, val)
        br = FL._BitReader(bytes(out))
        assert FL._read_coded_number(br) == val, val


# ---------------------------------------------------------------------------
# hand-built streams: decoder-only paths
# ---------------------------------------------------------------------------


def _stream(subframe_bits, blocksize, nch=1, bps=16, ch_code=None, n=None):
    """Wrap hand-written subframe payload bits into a full one-frame FLAC
    stream with correct STREAMINFO, header codes and CRCs."""
    si = FL._BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n if n is not None else blocksize, 36)
    body = si.bytes() + bytes(16)
    out = bytearray(b"fLaC")
    out.append(0x80)
    out += len(body).to_bytes(3, "big")
    out += body
    hdr = FL._BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 1)
    hdr.write(0, 1)
    hdr.write(7, 4)  # 16-bit blocksize-1 follows
    hdr.write(13, 4)  # 16-bit Hz follows
    hdr.write(ch_code if ch_code is not None else nch - 1, 4)
    hdr.write(4 if bps == 16 else {8: 1, 12: 2, 17: 0}.get(bps, 0), 3)
    hdr.write(0, 1)
    hdr.align()
    hb = bytearray(hdr.bytes())
    hb.append(0)  # frame number 0
    hb += struct.pack(">H", blocksize - 1)
    hb += struct.pack(">H", 8000)
    hb.append(FL.crc8(bytes(hb)))
    fw = FL._BitWriter()
    for write_one in subframe_bits:
        write_one(fw)
    fw.align()
    frame = bytes(hb) + fw.bytes()
    return bytes(out) + frame + struct.pack(">H", FL.crc16(frame))


def test_verbatim_subframe_decodes_exactly():
    vals = [7, -8, 32767, -32768, 0, 1]

    def sub(bw):
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for v in vals:
            bw.write(v, 16)

    nch, sr, arr = FL.decode_flac(_stream([sub], len(vals)))
    assert arr[:, 0].tolist() == vals


def test_lpc_subframe_hand_derived():
    """Order-2 LPC, coefs [3, -1], shift 1: pred_i = (3*x[i-1] - x[i-2])
    >> 1 (arithmetic).  Residuals chosen by hand; expected samples
    derived independently here."""
    warm = [10, 20]
    res = [1, -2, 3]

    def sub(bw):
        bw.write(0, 1)
        bw.write(33, 6)  # LPC order 2 (type 32 + order - 1)
        bw.write(0, 1)  # no wasted bits
        for v in warm:
            bw.write(v, 16)
        bw.write(4, 4)  # precision 5 bits (prec-1 = 4)
        bw.write(1, 5)  # shift 1
        bw.write(3, 5)  # coef[0] = 3
        bw.write(-1, 5)  # coef[1] = -1
        # residual: rice param 3, partition order 0
        bw.write(0, 2)
        bw.write(0, 4)
        bw.write(3, 4)
        for r in res:
            z = (-r << 1) - 1 if r < 0 else r << 1
            bw.write_unary(z >> 3)
            bw.write(z, 3)

    nch, sr, arr = FL.decode_flac(_stream([sub], len(warm) + len(res)))
    exp = list(warm)
    for r in res:
        exp.append(r + ((3 * exp[-1] - exp[-2]) >> 1))
    assert arr[:, 0].tolist() == exp


def _constant_sub(value, bits=16):
    def sub(bw):
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(value, bits)

    return sub


def test_stereo_decorrelation_modes():
    n = 4
    left_vals, right_vals = 1000, 900
    side = left_vals - right_vals
    # left/side (code 8): channel 0 = left, channel 1 = side (bps+1)
    nch, sr, arr = FL.decode_flac(
        _stream([_constant_sub(left_vals), _constant_sub(side, 17)],
                n, nch=2, ch_code=8)
    )
    assert arr[:, 0].tolist() == [left_vals] * n
    assert arr[:, 1].tolist() == [right_vals] * n
    # right/side (code 9): channel 0 = side (bps+1), channel 1 = right
    nch, sr, arr = FL.decode_flac(
        _stream([_constant_sub(side, 17), _constant_sub(right_vals)],
                n, nch=2, ch_code=9)
    )
    assert arr[:, 0].tolist() == [left_vals] * n
    assert arr[:, 1].tolist() == [right_vals] * n
    # mid/side (code 10): mid = (l + r) >> 1, side = l - r; the dropped
    # low bit of the sum is recovered from side's parity
    mid = (left_vals + right_vals) >> 1
    nch, sr, arr = FL.decode_flac(
        _stream([_constant_sub(mid), _constant_sub(side, 17)],
                n, nch=2, ch_code=10)
    )
    assert arr[:, 0].tolist() == [left_vals] * n
    assert arr[:, 1].tolist() == [right_vals] * n


def test_mid_side_odd_sum_recovers_exactly():
    l, r = 101, 100  # sum 201: mid drops a bit, side parity restores it
    mid, side = (l + r) >> 1, l - r
    nch, sr, arr = FL.decode_flac(
        _stream([_constant_sub(mid), _constant_sub(side, 17)],
                2, nch=2, ch_code=10)
    )
    assert arr[0].tolist() == [l, r]


def test_wasted_bits_shift_back():
    """wasted-bits flag + unary count 2 -> samples decode at bps-2 then
    shift left by 2."""
    vals = [3, -2, 5, 0]

    def sub(bw):
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(1, 1)  # wasted flag
        bw.write_unary(1)  # unary 1 -> wasted = 2
        for v in vals:
            bw.write(v, 14)  # bps - wasted

    nch, sr, arr = FL.decode_flac(_stream([sub], len(vals)))
    assert arr[:, 0].tolist() == [v << 2 for v in vals]


def test_rice2_and_partitions_and_escape():
    """Rice2 (5-bit params), partition order 1 (two partitions), second
    partition escaped to raw 7-bit."""
    order = 0
    p1 = [1, -1, 2, -2]
    p2 = [50, -60, 33, -7]

    def sub(bw):
        bw.write(0, 1)
        bw.write(8 + order, 6)  # FIXED order 0
        bw.write(0, 1)
        bw.write(1, 2)  # Rice2
        bw.write(1, 4)  # partition order 1
        bw.write(2, 5)  # partition 1: param 2
        for r in p1:
            z = (-r << 1) - 1 if r < 0 else r << 1
            bw.write_unary(z >> 2)
            bw.write(z, 2)
        bw.write(31, 5)  # partition 2: escape
        bw.write(7, 5)  # raw 7-bit
        for r in p2:
            bw.write(r, 7)

    nch, sr, arr = FL.decode_flac(_stream([sub], len(p1) + len(p2)))
    assert arr[:, 0].tolist() == p1 + p2


def test_crc_mismatches_raise():
    payload = bytearray(FL.encode_flac(np.arange(100, dtype=np.int16), 8000))
    payload[-1] ^= 0xFF  # frame CRC-16
    with pytest.raises(ValueError, match="CRC"):
        FL.decode_flac(bytes(payload))
    payload = bytearray(FL.encode_flac(np.arange(100, dtype=np.int16), 8000))
    # header CRC-8 byte sits right before subframe data; flip a header bit
    hdr_at = payload.index(b"\xff\xf8"[0:1], 42)
    payload[hdr_at + 2] ^= 0x01
    with pytest.raises(ValueError):
        FL.decode_flac(bytes(payload))


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        FL.decode_flac(b"not flac at all")
    good = FL.encode_flac(np.arange(500, dtype=np.int16), 8000)
    for cut in (2, 10, 40, len(good) - 3):
        with pytest.raises(ValueError):
            FL.decode_flac(good[:cut])


def test_decode_audio_dispatches_flac():
    from query_skyline_qos_flink_spark.operators.multimodal import decode_audio

    sig = np.tile([1234, -1234], 500).astype(np.int16)
    nch, sr, nf, dur, peak = decode_audio(FL.encode_flac(sig, 8000))
    assert (nch, sr, nf, dur, peak) == (1, 8000, 1000, 125, 1234)


def test_decode_audio_malformed_flac_raises_wave_error():
    import wave

    from query_skyline_qos_flink_spark.operators.multimodal import decode_audio

    with pytest.raises(wave.Error):
        decode_audio(b"fLaC" + b"\x00" * 10)


def test_md5_uses_two_bytes_per_sample_above_8_bits():
    """RFC 9639: the STREAMINFO MD5 hashes ceil(bps/8)-byte little-endian
    samples — a 12-bit stream hashes 2-byte samples (r12 review: the
    1-byte truncation failed standard verifying decoders)."""
    import hashlib as _h

    arr = np.array([1000, -1000, 2047, -2048], np.int16)
    p = FL.encode_flac(arr, 8000, bps=12)
    want = _h.md5(arr.astype("<i2").tobytes()).digest()
    # STREAMINFO: 4 magic + 4 block header + 18 fixed bytes, then MD5
    assert p[4 + 4 + 18 : 4 + 4 + 34] == want
    nch, sr, got = FL.decode_flac(p)
    assert np.array_equal(got[:, 0], arr)


def test_high_sample_rates_use_table_or_x10_codes():
    """88.2/96k have dedicated table codes; 176400+10 is neither in the
    table nor 16-bit-representable but IS x10-encodable; a rate no code
    can express raises a clear ValueError, not struct.error."""
    arr = np.arange(100, dtype=np.int16)
    for sr in (88200, 96000, 176400, 192000, 655350, 72000, 44100):
        nch, got_sr, a = FL.decode_flac(FL.encode_flac(arr, sr))
        assert got_sr == sr, sr
    with pytest.raises(ValueError, match="sample rate"):
        FL.encode_flac(arr, 655351)
    with pytest.raises(ValueError, match="sample rate"):
        FL.encode_flac(arr, 0)


def test_coded_number_36_bit_cap_enforced():
    out = bytearray()
    FL._write_coded_number(out, (1 << 36) - 1)
    br = FL._BitReader(bytes(out))
    assert FL._read_coded_number(br) == (1 << 36) - 1
    with pytest.raises(ValueError, match="36"):
        FL._write_coded_number(bytearray(), 1 << 36)


def test_nonstandard_bps_roundtrip_and_limits():
    """bps without an exact frame-header code (e.g. 10) rides the
    from-STREAMINFO code 0 and still round-trips exactly."""
    arr = np.array([511, -512, 100, -1], np.int16)
    nch, sr, got = FL.decode_flac(FL.encode_flac(arr, 8000, bps=10))
    assert np.array_equal(got[:, 0], arr)
    with pytest.raises(ValueError, match="4-16"):
        FL.encode_flac(arr, 8000, bps=24)
