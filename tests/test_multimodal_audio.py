"""Real WAV codec through the multimodal Spark plumbing."""

from __future__ import annotations

import io
import math
import struct
import wave

from query_skyline_qos_flink_spark.operators.multimodal import (
    decode_audio,
    extract_audio_meta,
)


def _make_wav(
    n_frames: int, sample_rate: int = 8000, n_channels: int = 1, amp: int = 12000
) -> bytes:
    """In-memory 16-bit PCM sine-wave WAV."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        frames = b"".join(
            struct.pack(
                "<" + "h" * n_channels,
                *([int(amp * math.sin(2 * math.pi * 440 * i / sample_rate))] * n_channels),
            )
            for i in range(n_frames)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_decode_audio_wav_roundtrip():
    wav = _make_wav(4000, sample_rate=8000, n_channels=2, amp=10000)
    nch, sr, nf, dur_ms, peak = decode_audio(wav)
    assert (nch, sr, nf, dur_ms) == (2, 8000, 4000, 500)
    assert 9000 <= peak <= 10000  # sine peak, sampling may miss the crest


def test_decode_audio_silence_peak_zero():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\x00\x00" * 100)
    assert decode_audio(buf.getvalue())[4] == 0


def test_extract_audio_meta_spark_path(spark):
    rows = [
        (1, _make_wav(8000, sample_rate=8000)),  # 1s mono
        (2, _make_wav(2205, sample_rate=22050, n_channels=2)),  # 100ms stereo
        (3, _make_wav(0, sample_rate=8000)),  # empty payload edge
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r.doc_id: r for r in extract_audio_meta(df).collect()}
    assert got[1].n_channels == 1 and got[1].sample_rate == 8000
    assert got[1].n_frames == 8000 and got[1].duration_ms == 1000
    assert got[2].n_channels == 2 and got[2].duration_ms == 100
    assert got[3].n_frames == 0 and got[3].peak_amplitude == 0


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    n_frames=st.integers(min_value=0, max_value=5000),
    sr=st.sampled_from([8000, 16000, 22050, 44100]),
    nch=st.integers(min_value=1, max_value=2),
)
def test_decode_audio_roundtrip_property(n_frames, sr, nch):
    wav = _make_wav(n_frames, sample_rate=sr, n_channels=nch)
    got_nch, got_sr, got_nf, got_ms, peak = decode_audio(wav)
    assert (got_nch, got_sr, got_nf) == (nch, sr, n_frames)
    assert got_ms == n_frames * 1000 // sr
    assert 0 <= peak <= 32767
