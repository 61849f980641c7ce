"""Hypothesis roundtrip properties for the container framing layers.

The hand-written edge tests (tests/test_container_codecs.py,
test_warc_source.py) pin known boundaries — 255-lacing, exact multiples,
continuation, empty packets; these properties sweep the space between
them: ANY packet list must page-encode and reassemble identically under
ANY segment budget, and ANY record list must WARC-roundtrip under both
packagings.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from query_skyline_qos_flink_spark.operators import ogg
from query_skyline_qos_flink_spark.sources import warc

_packet = st.binary(min_size=0, max_size=700)


@settings(max_examples=60, deadline=None)
@given(
    pages=st.lists(
        st.tuples(
            st.lists(_packet, min_size=0, max_size=4),
            st.integers(min_value=0, max_value=2**40),
        ),
        min_size=1,
        max_size=4,
    ),
    max_segs=st.integers(min_value=1, max_value=255),
)
def test_ogg_page_roundtrip_property(pages, max_segs):
    raw = ogg.write_ogg(pages, max_segs_per_page=max_segs)
    parsed = ogg.parse_ogg_pages(raw)  # CRC + framing verified per page
    assert parsed[0]["header_type"] & 0x02
    assert parsed[-1]["header_type"] & 0x04
    assert [p["seq"] for p in parsed] == list(range(len(parsed)))
    want = [pk for packets, _g in pages for pk in packets]
    assert ogg.reassemble_packets(parsed) == want
    # the final logical page's granule survives on the final physical page
    assert parsed[-1]["granule"] == pages[-1][1]


@settings(max_examples=40, deadline=None)
@given(
    recs=st.lists(
        st.tuples(
            st.sampled_from(["response", "request", "metadata"]),
            st.binary(min_size=0, max_size=300),
        ),
        min_size=1,
        max_size=6,
    ),
    gz=st.booleans(),
)
def test_warc_roundtrip_property(recs, gz):
    blob = b"".join(
        warc.write_warc_record(t, body, record_id=f"<urn:p:{i}>", gzip_member=gz)
        for i, (t, body) in enumerate(recs)
    )
    parsed = warc.parse_warc_records(blob)
    assert [(r["warc_type"], r["body"]) for r in parsed] == recs
    assert [r["record_id"] for r in parsed] == [f"<urn:p:{i}>" for i in range(len(recs))]
    offs = [r["offset"] for r in parsed]
    assert offs == sorted(set(offs)) and offs[0] == 0


@settings(max_examples=80, deadline=None)
@given(n=st.integers(min_value=0, max_value=2**55 - 2))
def test_ebml_size_varint_roundtrip_property(n):
    from query_skyline_qos_flink_spark.operators import webm

    enc = webm._vint_size(n)
    val, nxt = webm._read_vint(enc, 0, len(enc), keep_marker=False)
    assert val == n and nxt == len(enc)
    # minimal width: one byte narrower cannot represent n
    width = len(enc)
    assert width == 1 or n >= (1 << (7 * (width - 1))) - 1


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    spp=st.sampled_from([1, 3, 4]),
    rps=st.integers(min_value=1, max_value=14),
    le=st.booleans(),
    seed=st.integers(min_value=0, max_value=255),
)
def test_tiff_roundtrip_property(h, w, spp, rps, le, seed):
    import numpy as np

    from query_skyline_qos_flink_spark.operators import multimodal as mm

    arr = ((np.arange(h * w * spp) * 31 + seed) % 256).astype(np.uint8).reshape(
        h, w, spp
    )
    b = mm.encode_tiff(arr, little_endian=le, rows_per_strip=rps)
    gh, gw, gc, out = mm.decode_tiff(b)
    assert (gh, gw, gc) == (h, w, spp) and (out == arr).all()


@settings(max_examples=40, deadline=None)
@given(
    n_tracks=st.integers(min_value=1, max_value=3),
    timescale=st.sampled_from([600, 1000, 90000]),
    trex_default=st.integers(min_value=0, max_value=5000),
    frags=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=3),  # track_id (clamped)
                st.one_of(
                    st.integers(min_value=0, max_value=50),  # default count
                    st.lists(
                        st.integers(min_value=0, max_value=100_000),
                        min_size=1,
                        max_size=6,
                    ),  # explicit durations
                ),
            ),
            min_size=1,
            max_size=2,
        ),
        min_size=1,
        max_size=3,
    ),
)
def test_fmp4_duration_property(n_tracks, timescale, trex_default, frags):
    """Fragmented-MP4 duration is the exact per-track sum of trun sample
    durations (explicit, tfhd-default, or trex-default), floored to ms
    in the mdhd timescale — for ANY fragment layout."""
    from query_skyline_qos_flink_spark.operators import mp4

    frags = [
        [(min(tid, n_tracks), samples) for tid, samples in frag] for frag in frags
    ]
    b = mp4.write_fmp4(n_tracks, timescale, frags, trex_default=trex_default)
    totals = {tid: 0 for tid in range(1, n_tracks + 1)}
    for frag in frags:
        for tid, samples in frag:
            if isinstance(samples, int):
                totals[tid] += samples * trex_default
            else:
                totals[tid] += sum(samples)
    want = max(t * 1000 // timescale for t in totals.values())
    m = mp4.parse_mp4_meta(b)
    assert m["duration_ms"] == want
    assert m["n_fragments"] == len(frags)
