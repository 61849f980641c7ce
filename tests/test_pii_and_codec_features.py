"""PII scrub + real-codec feature operators (round-6 additions).

The corpus-level oracle parity for ``x_pii_scrub`` / ``x_blocklist_filter``
/ ``x_image_ahash_dedup`` / ``x_audio_features`` runs in
``tests/test_corpus.py``; these tests pin the operator-level contracts the
oracles rely on: scrub order, aHash bit-exactness through the real PNG
codec, Hamming locality for perturbed images, and WAV feature exactness.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from query_skyline_qos_flink_spark.operators import multimodal as mm
from query_skyline_qos_flink_spark.operators import text


def test_pii_scrub_counts_and_order(spark):
    rows = [
        (1, "mail a.user@example.com then call (555) 123-4567 ok"),
        (2, "ssn 123-45-6789 from 10.0.42.1 and 555-867-5309"),
        (3, "no pii here, just 123 and 4.5"),
        (4, "two mails x@y.com z@w.org and ip 1.2.3.4"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in text.pii_scrub(df).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ssn"], out[1]["n_ip"]) == (1, 1, 0, 0)
    assert out[1]["scrubbed"] == "mail <EMAIL> then call <PHONE> ok"
    assert (out[2]["n_ssn"], out[2]["n_ip"], out[2]["n_phone"]) == (1, 1, 1)
    assert out[2]["scrubbed"] == "ssn <SSN> from <IP> and <PHONE>"
    assert (out[3]["n_email"], out[3]["n_phone"], out[3]["n_ssn"], out[3]["n_ip"]) == (0, 0, 0, 0)
    assert out[3]["scrubbed"] == rows[2][1]
    assert out[4]["n_email"] == 2 and out[4]["n_ip"] == 1


def test_pii_ssn_not_eaten_by_phone():
    """SSN (3-2-4) and phone (3-3-4) digit shapes must not cross-match —
    the contract that makes the fixed scrub order safe."""
    import re

    ssn, phone = text.PII_PATTERNS["ssn"], text.PII_PATTERNS["phone"]
    assert re.search(ssn, "123-45-6789")
    assert not re.search(phone, "123-45-6789")
    assert re.search(phone, "555-867-5309")
    assert not re.search(ssn, "555-867-5309")
    # phone must not fire inside an IPv4
    assert not re.search(phone, "192.168.1.1")


def test_synth_png_ahash_recovers_md5_bits():
    """aHash through the REAL decoder equals the md5-derived block bits
    for every payload class — the invariant x_image_ahash_dedup's
    closed-form oracle rests on — and all 50 classes are distinct."""
    seen = set()
    for k in range(50):
        h, w, c, arr = mm.decode_image(mm.synth_png_payload(k))
        assert (h, w) == (64, 64)
        grey = arr.astype(np.float64).mean(axis=2)
        blocks = grey.reshape(8, 8, 8, 8).mean(axis=(1, 3))
        bits = (blocks >= blocks.mean()).flatten()
        v = 0
        for b in bits:
            v = (v << 1) | int(b)
        assert v == int(hashlib.md5(f"img{k}".encode()).hexdigest()[:16], 16)
        seen.add(v)
    assert len(seen) == 50


def test_image_ahash_hamming_locality(spark):
    """Identical images collide exactly; a single flipped block moves the
    hash by a small Hamming distance (the near-dup property)."""
    import io
    import struct
    import zlib

    def flip_one_block(payload: bytes) -> bytes:
        h, w, c, arr = mm.decode_image(payload)
        pix = arr[:, :, 0].copy()
        pix[0:8, 0:8] = 255 - pix[0:8, 0:8]  # invert block (0,0)

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        raw = b"".join(b"\x00" + pix[y].tobytes() for y in range(h))
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b"")
        )

    base = mm.synth_png_payload(7)
    rows = [(1, base), (2, base), (3, flip_one_block(base))]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r["doc_id"]: r["ahash"] for r in mm.image_ahash(df).collect()}
    assert got[1] == got[2]  # exact dup -> exact collision
    ham = bin((got[1] ^ got[3]) & ((1 << 64) - 1)).count("1")
    assert 1 <= ham <= 4  # one block flipped -> tiny Hamming distance


def test_synth_wav_features_exact(spark):
    from tests.test_wav_codecs import _ALAW_PEAKS, _MULAW_PEAKS

    d = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    pay = mm.attach_synth_payload(d, "wav")
    got = {r["doc_id"]: r for r in mm.extract_audio_meta(pay).collect()}
    for k in range(40):
        nf = 800 + (k % 5) * 160
        amp = 2000 + (k % 7) * 1000
        # the fixture rotates encodings: PCM and FLAC peaks are exact
        # (lossless), the G.711 variants land on the nearest mu-law /
        # A-law level (the same literals the x_audio_features oracle
        # states)
        want_peak = (
            _MULAW_PEAKS[amp] if k % 4 == 1
            else _ALAW_PEAKS[amp] if k % 4 == 2
            else amp
        )
        r = got[k]
        assert (r["n_channels"], r["sample_rate"]) == (1, 8000)
        assert r["n_frames"] == nf
        assert r["duration_ms"] == nf // 8
        assert r["peak_amplitude"] == want_peak


def test_attach_synth_payload_key_mod_shares_bytes(spark):
    d = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    rows = mm.attach_synth_payload(d, "png", key_mod=5).collect()
    by_id = {r["doc_id"]: bytes(r["payload"]) for r in rows}
    assert by_id[0] == by_id[5] and by_id[3] == by_id[8]
    assert by_id[0] != by_id[1]


def test_hamming_neardup_pairs_generic(spark):
    """The chunk-pigeonhole blocking must find every pair within the
    Hamming bound and none outside it, for an arbitrary 64-bit column."""
    from query_skyline_qos_flink_spark.operators.dedup import hamming_neardup_pairs

    base = 0x0123456789ABCDEF
    rows = [
        (1, base),
        (2, base ^ 0b111),          # hamming 3 -> pair
        (3, base ^ (0xF << 56)),    # hamming 4 -> no pair
        (4, -1),                    # far from everything
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, sig bigint")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_neardup_pairs(df, hash_col="sig", max_hamming=3).collect()
    }
    assert got == {(1, 2): 3}


def test_image_neardup_twins_found(spark):
    """Twin payloads (one inverted block) land exactly one Hamming-1 pair
    per even/odd id pair through the REAL decode + aHash + blocking path."""
    from query_skyline_qos_flink_spark.operators.dedup import hamming_neardup_pairs

    d = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    hashed = mm.image_ahash(mm.attach_synth_payload_twins(d))
    pairs = hamming_neardup_pairs(hashed, hash_col="ahash", max_hamming=3).collect()
    got = sorted((r["id_a"], r["id_b"], r["hamming"]) for r in pairs)
    assert got == [(2 * m, 2 * m + 1, 1) for m in range(6)]


def test_dedup_spans_first_occurrence(spark):
    """Corpus-wide span dedup keeps exactly the first (doc, idx) holder of
    each span and reassembles surviving spans in order."""
    k = 3
    rows = [
        (1, "a b c d e f"),          # spans: "a b c", "d e f"
        (2, "a b c x y z"),          # loses "a b c" (doc 1 saw it), keeps "x y z"
        (3, "d e f a b c"),          # loses both
        (4, ""),                     # no spans at all
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in text.dedup_spans(df, span_tokens=k).collect()}
    assert (got[1]["n_spans"], got[1]["n_kept"], got[1]["clean"]) == (2, 2, "a b c d e f")
    assert (got[2]["n_spans"], got[2]["n_kept"], got[2]["clean"]) == (2, 1, "x y z")
    assert (got[3]["n_spans"], got[3]["n_kept"], got[3]["clean"]) == (2, 0, "")
    assert (got[4]["n_spans"], got[4]["n_kept"], got[4]["clean"]) == (0, 0, "")


def test_dedup_spans_partial_tail_span(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id bigint, text string")
    r = text.dedup_spans(df, span_tokens=3).collect()[0]
    assert (r["n_spans"], r["n_kept"], r["clean"]) == (2, 2, "a b c d")


def test_weighted_mix_rates(spark):
    """Whole-part duplication + fractional md5-bucket keep, per group."""
    from query_skyline_qos_flink_spark.operators.sampling import split_bucket, weighted_mix

    rows = [(i, "a" if i < 100 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = weighted_mix(df, {"a": 2.5, "b": 0.0}).collect()
    by_doc: dict[int, int] = {}
    for r in out:
        assert r["source"] == "a"  # b dropped entirely
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + 1
        assert r["copy_idx"] >= 1
    assert set(by_doc.values()) <= {2, 3}  # 2 copies always, 3rd for ~half
    assert len(by_doc) == 100  # whole part >= 1 keeps every 'a' doc
    # the 3-copy set is exactly the bucket<5000 set (deterministic)
    buckets = {
        r["doc_id"]: r["b"]
        for r in df.where("source = 'a'")
        .select("doc_id", split_bucket(F.col("doc_id")).alias("b"))
        .collect()
    }
    for doc, n in by_doc.items():
        assert n == (3 if buckets[doc] < 5000 else 2)


def test_weighted_mix_default_rate(spark):
    from query_skyline_qos_flink_spark.operators.sampling import weighted_mix

    df = spark.createDataFrame([(i, "x") for i in range(50)], "doc_id bigint, source string")
    out = weighted_mix(df, {}, default_rate=1.0).collect()
    assert len(out) == 50 and all(r["copy_idx"] == 1 for r in out)


def test_pii_scrub_custom_patterns(spark):
    df = spark.createDataFrame([(1, "key AKIA1234 end")], "doc_id bigint, text string")
    out = text.pii_scrub(df, patterns={"key": "AKIA[0-9]{4}"}).collect()[0]
    assert out["n_key"] == 1 and out["scrubbed"] == "key <KEY> end"


# ---------------------------------------------------------------------------
# Hypothesis cross-validation: Spark (Java regex / SQL exprs) vs pure
# Python references on random inputs — catches dialect drift the fixed
# fixtures can't.
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

# printable-ASCII text with PII-ish fragments spliced in
_pii_fragments = st.sampled_from(
    [
        "a@b.co", "123-45-6789", "(555) 123-4567", "555-867-5309",
        "10.0.0.1", "999.1.2.3", "x 12-34 y", "user.name+tag@host.org",
        "1.2.3", "12345678901234", "call me", "",
    ]
)
_text_strategy = st.lists(
    st.one_of(
        _pii_fragments,
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=12),
    ),
    max_size=8,
).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(st.lists(_text_strategy, min_size=1, max_size=8))
def test_pii_scrub_matches_python_re(spark, texts):
    """Counts and the scrubbed string must equal a pure Python ``re``
    replay of the same patterns in the same order."""
    import re

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in text.pii_scrub(df).collect()}
    for i, t in enumerate(texts):
        want_counts = {
            label: len(re.findall(p, t)) for label, p in text.PII_PATTERNS.items()
        }
        scrub = t
        for label, p in text.PII_PATTERNS.items():
            scrub = re.sub(p, f"<{label.upper()}>", scrub)
        r = got[i]
        for label, n in want_counts.items():
            assert r[f"n_{label}"] == n, (t, label)
        assert r["scrubbed"] == scrub, t


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcde"), max_size=12).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_dedup_spans_matches_python_reference(spark, texts, k):
    """Span chunking, corpus-wide first-occurrence and reassembly must
    equal a direct Python replay."""
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in text.dedup_spans(df, span_tokens=k).collect()}

    seen: dict[str, tuple[int, int]] = {}
    spans_by_doc: dict[int, list[str]] = {}
    for i, t in enumerate(texts):
        toks = [x for x in t.split() if x]
        spans = [" ".join(toks[j : j + k]) for j in range(0, len(toks), k)]
        spans_by_doc[i] = spans
        for j, s in enumerate(spans):
            seen.setdefault(s, (i, j))
    for i in spans_by_doc:
        kept = [
            s for j, s in enumerate(spans_by_doc[i]) if seen[s] == (i, j)
        ]
        r = got[i]
        assert r["n_spans"] == len(spans_by_doc[i]), texts
        assert r["n_kept"] == len(kept), texts
        assert r["clean"] == " ".join(kept), texts


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=60),
    st.sampled_from([0.0, 0.25, 0.5, 1.0, 1.5, 2.75]),
)
def test_weighted_mix_totals_match_bucket_formula(spark, n, rate):
    """Emitted copy counts must equal floor(rate) + fractional-bucket keep
    computed from the same md5 arithmetic in Python."""
    import hashlib
    import math

    from query_skyline_qos_flink_spark.operators.sampling import weighted_mix

    df = spark.createDataFrame([(i, "s") for i in range(n)], "doc_id bigint, source string")
    out = weighted_mix(df, {"s": rate}).groupBy("doc_id").count().collect()
    got = {r["doc_id"]: r["count"] for r in out}
    for i in range(n):
        bucket = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10_000
        want = math.floor(rate) + (1 if bucket < int((rate - math.floor(rate)) * 10_000) else 0)
        assert got.get(i, 0) == want, (i, rate)
