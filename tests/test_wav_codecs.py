"""From-scratch compressed-WAV codecs: G.711 mu-law / A-law tables and
round trips, IMA ADPCM blocks, the RIFF reader, and the closed-form
quantized-peak contract behind x_audio_features.

The G.711 tables are pinned against the classic CCITT values (mu-law
0x00 -> -32124, 0xFF -> 0; A-law 0x55 -> -8, 0xD5 -> +8), so the decoder
here reads genuinely standard telephony streams, not a private format.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from query_skyline_qos_flink_spark.operators.multimodal import (
    _g711_decode,
    _g711_encode,
    _g711_tables,
    _ima_adpcm_decode_block,
    _ima_adpcm_encode,
    decode_audio,
    decode_wav_samples,
    synth_wav_payload,
)

# the literals baked into the x_audio_features oracle (per amp class)
_MULAW_PEAKS = {2000: 1980, 3000: 3004, 4000: 4092, 5000: 5116,
                6000: 5884, 7000: 6908, 8000: 7932}
_ALAW_PEAKS = {2000: 2016, 3000: 3008, 4000: 4032, 5000: 4992,
               6000: 6016, 7000: 7040, 8000: 8064}


def test_g711_tables_match_canonical_values():
    mu, al = _g711_tables()
    assert mu[0x00] == -32124 and mu[0x80] == 32124  # extremes
    assert mu[0xFF] == 0 and mu[0x7F] == 0  # the two mu-law zeros
    assert al[0x55] == -8 and al[0xD5] == 8  # A-law silence codes
    assert al[0x2A] == -32256 and al[0xAA] == 32256  # A-law extremes
    # both laws are sign-symmetric: code ^ 0x80 negates
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(mu[codes], -mu[codes ^ 0x80])
    assert np.array_equal(al[codes], -al[codes ^ 0x80])


def test_g711_encode_is_nearest_level_inverse():
    """encode(decode(c)) maps every code back to a code with the SAME
    linear value, and decode(encode(x)) is the nearest table level."""
    for law in ("mulaw", "alaw"):
        mu, al = _g711_tables()
        table = (mu if law == "mulaw" else al).astype(np.int64)
        codes = np.frombuffer(
            _g711_encode(table.astype(np.int16), law), dtype=np.uint8
        )
        assert np.array_equal(table[codes], table)  # value-identical
        rng = np.random.default_rng(7)
        xs = rng.integers(-32768, 32768, 500).astype(np.int64)
        q = table[np.frombuffer(_g711_encode(xs.astype(np.int16), law), dtype=np.uint8)]
        best = np.abs(xs[:, None] - table[None, :]).min(axis=1)
        assert np.array_equal(np.abs(xs - q), best)


def test_oracle_peak_literals_pin_the_tables():
    """The x_audio_features oracle states the G.711-quantized peak per
    (law, amp) class as literals — recompute them from the codec and
    check both the dict here and the registered SQL string."""
    from query_skyline_qos_flink_spark.plans import corpus
    import query_skyline_qos_flink_spark.plans.pipeline  # noqa: F401  (registers)

    sql = corpus.REGISTRY["x_audio_features"].oracle
    for law, expect in (("mulaw", _MULAW_PEAKS), ("alaw", _ALAW_PEAKS)):
        for amp, want in expect.items():
            s = np.array([amp, -amp], dtype=np.int16)
            got = int(np.abs(_g711_decode(_g711_encode(s, law), law).astype(np.int64)).max())
            assert got == want, (law, amp, got)
            assert str(want) in sql, (law, amp, want)


def test_synth_wav_variants_decode_closed_form():
    """decode_audio over every (codec x amp/frames) variant shape
    reproduces the oracle's closed-form features exactly — PCM and FLAC
    lossless (peak == amp), G.711 at the pinned quantized levels."""
    for key in range(28):
        nch, sr, nf, dur, peak = decode_audio(synth_wav_payload(key))
        amp = 2000 + (key % 7) * 1000
        want_peak = (
            _MULAW_PEAKS[amp] if key % 4 == 1
            else _ALAW_PEAKS[amp] if key % 4 == 2
            else amp  # PCM (0) and FLAC (3) are exact
        )
        assert (nch, sr, nf, dur) == (1, 8000, 800 + (key % 5) * 160, (800 + (key % 5) * 160) // 8)
        assert peak == want_peak, (key, peak, want_peak)
        if key % 4 == 3:
            assert synth_wav_payload(key)[:4] == b"fLaC"


def test_riff_reader_pcm_parity_with_stdlib():
    rng = np.random.default_rng(3)
    samples = rng.integers(-30000, 30000, 777).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(16000)
        wv.writeframes(samples.tobytes())
    nch, sr, arr = decode_wav_samples(buf.getvalue())
    assert (nch, sr) == (1, 16000)
    assert np.array_equal(arr[:, 0], samples)


def test_adpcm_constant_nibbles_hand_derived():
    """Independent truth: at step index 0 (step=7) a zero nibble adds
    diff = 7 >> 3 = 0, so an all-zero-nibble stereo block decodes to the
    two channel predictors verbatim — 9 frames each (1 header + 8)."""
    block = (
        struct.pack("<hBB", 1000, 0, 0)
        + struct.pack("<hBB", -500, 0, 0)
        + bytes(8)  # one 4-byte nibble group per channel
    )
    arr = _ima_adpcm_decode_block(block, 2)
    assert arr.shape == (9, 2)
    assert np.array_equal(arr[:, 0], np.full(9, 1000))
    assert np.array_equal(arr[:, 1], np.full(9, -500))


def test_adpcm_single_step_hand_derived():
    """Nibble 7 at step index 0: diff = 0 + 7 + 3 + 1 = 11, index moves
    +8; nibble 0xF subtracts the same magnitude."""
    block = struct.pack("<hBB", 100, 0, 0) + bytes([0x07, 0, 0, 0])
    arr = _ima_adpcm_decode_block(block, 1)
    assert arr[0, 0] == 100 and arr[1, 0] == 111
    block = struct.pack("<hBB", 100, 0, 0) + bytes([0x0F, 0, 0, 0])
    arr = _ima_adpcm_decode_block(block, 1)
    assert arr[1, 0] == 100 - 11


def test_adpcm_roundtrip_tracks_signal():
    """Encoder -> decoder round trip: frame 0 is exact (block header),
    the adaptive quantizer tracks a smooth signal to small error, and
    the full pipeline runs through the RIFF reader."""
    t = np.arange(2000)
    sig = (3000 * np.sin(t / 30) + 1500 * np.sin(t / 7)).astype(np.int16)
    data, balign = _ima_adpcm_encode(sig, block_frames=505)
    fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 8000 * balign // 505, balign, 4)
    fact = struct.pack("<I", len(sig))
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    nch, sr, arr = decode_wav_samples(payload)
    assert (nch, sr) == (1, 8000)
    assert arr.shape == (len(sig), 1)
    dec = arr[:, 0].astype(np.int64)
    assert dec[0] == sig[0]  # header frame is verbatim
    err = np.abs(dec - sig.astype(np.int64))
    # adaptive-step quantization: tight on this smooth band-limited signal
    assert np.median(err) <= 64 and err.mean() <= 256, (np.median(err), err.mean())

    # and decode_audio routes it through the same reader
    nch2, sr2, nf2, dur2, peak2 = decode_audio(payload)
    assert (nch2, sr2, nf2) == (1, 8000, len(sig))
    assert peak2 == int(np.abs(dec).max())


def test_decode_audio_error_contract():
    """Payloads no decoder recognizes raise wave.Error (the exception the
    Spark-side filters key on) — both non-RIFF garbage and RIFF files
    with an unsupported format tag."""
    with pytest.raises(wave.Error):
        decode_audio(b"\x00\x01\x02\x03not audio")
    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 2, 16)  # bogus tag
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", 4) + bytes(4)
    with pytest.raises(wave.Error):
        decode_audio(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_riff_reader_8bit_pcm_ragged_data_trims_to_whole_frames():
    """A stereo 8-bit PCM data chunk with a trailing partial frame (odd
    byte count) must trim to whole frames like the 16-bit / G.711 paths,
    not die in numpy's generic reshape error (r11 ADVICE)."""
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 16000, 2, 8)
    data = bytes([128, 128, 255, 0, 200])  # 2 whole frames + 1 stray byte
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + b"\x00"  # word-align the odd-sized chunk
    )
    nch, sr, arr = decode_wav_samples(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (nch, sr) == (2, 8000)
    assert arr.shape == (2, 2)
    assert np.array_equal(arr, np.array([[0, 0], [32512, -32768]], dtype=np.int16))
