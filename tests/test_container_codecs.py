"""MP3 / Ogg container layer (operators/mpeg_audio.py, operators/ogg.py).

Writer/parser pairs are independent code paths over the public framing
specs; these tests pin frame-length arithmetic against hand-computed
values, exercise every strictness rejection, check the Ogg CRC against an
independent bit-serial twin, and prove the synth fixture's closed-form
oracle over its ENTIRE folded key space (the x_multimodal_meta gate in
miniature, no Spark session needed).
"""

from __future__ import annotations

import numpy as np
import pytest

from query_skyline_qos_flink_spark.operators import mpeg_audio as ma
from query_skyline_qos_flink_spark.operators import multimodal as mm
from query_skyline_qos_flink_spark.operators import ogg


# ---------------------------------------------------------------- MP3 ----


def test_frame_length_hand_computed():
    # V1 L3 128 kbps @ 44100: floor(144*128000/44100) = 417 (+1 padded)
    h = ma.parse_frame_header(bytes((0xFF, 0xFB, 0x90, 0xC0)))
    assert (h["version"], h["layer"], h["bitrate_kbps"]) == ("1", 3, 128)
    assert h["frame_length"] == 417 and h["samples_per_frame"] == 1152
    padded = ma.parse_frame_header(bytes((0xFF, 0xFB, 0x92, 0xC0)))
    assert padded["frame_length"] == 418
    # MPEG2.5 L3 8 kbps @ 8000: 72*8000/8000 = 72 bytes, 576 samples
    h25 = ma.parse_frame_header(bytes((0xFF, 0xE3, 0x18, 0xC0)))
    assert (h25["version"], h25["sample_rate"]) == ("2.5", 8000)
    assert h25["frame_length"] == 72 and h25["samples_per_frame"] == 576
    # V1 L1 stereo 384 samples: (12*bitrate/sr + pad)*4
    h1 = ma.parse_frame_header(bytes((0xFF, 0xFF, 0x90, 0x00)))
    assert h1["layer"] == 1 and h1["samples_per_frame"] == 384
    assert h1["frame_length"] == (12 * h1["bitrate_kbps"] * 1000 // 44100) * 4


@pytest.mark.parametrize(
    "bad",
    [
        bytes((0xFE, 0xFB, 0x90, 0xC0)),  # lost sync
        bytes((0xFF, 0xEB, 0x90, 0xC0)),  # reserved version bits (01)
        bytes((0xFF, 0xF9, 0x90, 0xC0)),  # reserved layer bits (00)
        bytes((0xFF, 0xFB, 0x00, 0xC0)),  # free-format bitrate
        bytes((0xFF, 0xFB, 0xF0, 0xC0)),  # invalid bitrate index 15
        bytes((0xFF, 0xFB, 0x9C, 0xC0)),  # reserved sample-rate index
        bytes((0xFF, 0xFB, 0x90)),  # truncated header
    ],
)
def test_frame_header_rejections(bad):
    with pytest.raises(ValueError):
        ma.parse_frame_header(bad)


@pytest.mark.parametrize("sr", [44100, 48000, 32000, 22050, 16000, 11025, 8000])
@pytest.mark.parametrize("ch", [1, 2])
def test_mp3_write_parse_roundtrip(sr, ch):
    br = 64 if sr >= 32000 else 32
    b = ma.write_mp3(11, sr, br, ch, xing=sr % 3 == 0, id3_content=64)
    m = ma.parse_mp3_meta(b)
    spf = 1152 if sr >= 32000 else 576
    assert m["n_frames"] == 11 and m["sample_rate"] == sr
    assert m["n_channels"] == ch and m["bitrate_kbps"] == br
    assert m["duration_ms"] == 11 * spf * 1000 // sr
    assert m["has_id3v2"] and m["has_xing"] == (sr % 3 == 0) and not m["vbr"]
    s = ma.decode_mp3_samples(b)
    assert s.shape == (11 * spf, ch) and s.dtype == np.int16 and not s.any()


def test_mp3_id3_and_trailing_strictness():
    b = ma.write_mp3(5)
    assert ma.parse_mp3_meta(b + b"TAG" + bytes(125))["n_frames"] == 5
    # round-12 ADVICE: 'TAG' landing MID-FRAME at exactly end-128 is
    # audio data, not an ID3v1 trailer — the untrimmed walk must win
    # (before the fix this was fail-closed rejected as a truncated frame)
    midframe = bytearray(b)
    assert len(b) > 200  # the last frame's stuffing covers end-128
    midframe[-128:-125] = b"TAG"
    assert ma.parse_mp3_meta(bytes(midframe))["n_frames"] == 5
    # ...and a REAL ID3v1 trailer whose tag body itself contains frame
    # sync bytes still trims (the untrimmed walk fails first)
    tagged = b + b"TAG" + b"\xff\xfb" * 62 + b"\x00"
    assert ma.parse_mp3_meta(tagged)["n_frames"] == 5
    with pytest.raises(ValueError, match="sync|truncated"):
        ma.parse_mp3_meta(b + b"garbage!")
    with pytest.raises(ValueError, match="truncated"):
        ma.parse_mp3_meta(b[:-3])
    with pytest.raises(ValueError, match="syncsafe"):
        ma.parse_mp3_meta(b"ID3" + bytes((3, 0, 0, 0, 0, 0, 0x80)) + b)
    with pytest.raises(ValueError, match="extends past"):
        ma.parse_mp3_meta(b"ID3" + bytes((3, 0, 0, 0x7F, 0x7F, 0x7F, 0x7F)) + b)
    # ID3v2 footer flag adds 10 bytes to the skip
    tag = bytearray(ma.write_id3v2(20))
    tag[5] |= 0x10
    assert ma.parse_mp3_meta(bytes(tag) + bytes(10) + b)["n_frames"] == 5


def test_mp3_early_corruption_not_retried_as_tag_trim(monkeypatch):
    """round-13 ADVICE: when the untrimmed walk fails BEFORE end-128,
    the failure is genuine corruption the ID3v1 trailer cannot explain —
    re-raise it directly (single walk, original offset) instead of
    paying a second trimmed walk whose error could misattribute the
    location."""
    b = ma.write_mp3(5)
    corrupt = bytearray(b + b"TAG" + bytes(125))
    frame_len = ma.parse_frame_header(b, 0)["frame_length"]
    corrupt[frame_len] = 0x00  # kill frame 2's sync byte, far before end-128
    calls = []
    real = ma.parse_frame_header

    def counting(buf, off=0):
        calls.append(off)
        return real(buf, off)

    monkeypatch.setattr(ma, "parse_frame_header", counting)
    with pytest.raises(ValueError, match=f"at byte {frame_len}"):
        ma.parse_mp3_meta(bytes(corrupt))
    # one walk only: offsets strictly increasing, no restart at 0
    assert calls == sorted(set(calls)), "trimmed retry re-walked from the start"
    # ...while a failure AT the trailer boundary still retries trimmed
    calls.clear()
    assert ma.parse_mp3_meta(b + b"TAG" + bytes(125))["n_frames"] == 5
    assert calls.count(0) == 2  # untrimmed walk + the legitimate trimmed retry


def test_mp3_xing_crosscheck_and_param_change():
    b = bytearray(ma.write_mp3(6, xing=True))
    meta = ma.parse_mp3_meta(bytes(b))
    assert meta["has_xing"] and meta["n_frames"] == 6
    # tamper the Xing frame count -> walk disagrees -> reject
    xo = 4 + 17 + 8  # header + V1-mono side info + 'Info'+flags
    b[xo : xo + 4] = (7).to_bytes(4, "big")
    with pytest.raises(ValueError, match="Xing frame count"):
        ma.parse_mp3_meta(bytes(b))
    # mid-stream sample-rate change
    with pytest.raises(ValueError, match="parameters changed"):
        ma.parse_mp3_meta(ma.write_mp3(2, 44100) + ma.write_mp3(2, 48000))


def test_mp3_crc_protected_frames_parse_and_decode():
    """protection bit 0 (CRC-16 present) shifts the side info by 2 bytes;
    the walk, Xing offset and silence decode must all honor it.  The CRC
    value itself is skipped, not verified — a wrong local CRC model would
    reject valid real-world files, the one thing a strict sniffer must
    never do."""
    plain = ma.write_mp3(4)
    hdr = bytearray(plain[:4])
    hdr[1] &= 0xFE  # protection_bit = 0 -> CRC present
    flen = ma.parse_frame_header(bytes(hdr))["frame_length"]
    assert flen == len(plain) // 4  # frame length excludes nothing: CRC is inside
    frame = bytes(hdr) + b"\xAB\xCD" + bytes(flen - 6)  # crc + side + stuffing
    m = ma.parse_mp3_meta(frame * 4)
    assert m["n_frames"] == 4 and m["sample_rate"] == 44100
    s = ma.decode_mp3_samples(frame * 4)
    assert s.shape == (4 * 1152, 1) and not s.any()


def test_mp3_spectral_data_is_the_declared_seam():
    b = bytearray(ma.write_mp3(3))
    # set a bit inside granule 0's part2_3_length (side-info bit 18+)
    b[4 + 2] |= 0x20
    with pytest.raises(NotImplementedError, match="decode_fn seam"):
        ma.decode_mp3_samples(bytes(b))
    # layer II: header parses and walks, sample decode is behind the seam
    h = bytes((0xFF, 0xFD, 0x90, 0xC0))  # V1 L2 160 kbps @ 44100
    frame = h + bytes(ma.parse_frame_header(h)["frame_length"] - 4)
    assert ma.parse_mp3_meta(frame * 4)["n_frames"] == 4
    with pytest.raises(NotImplementedError, match="layer I/II"):
        ma.decode_mp3_samples(frame * 4)


# ---------------------------------------------------------------- Ogg ----


def test_ogg_crc_table_matches_bitserial_twin():
    for n in (0, 1, 7, 26, 255, 1024):
        d = bytes((i * 131 + n * 17) % 256 for i in range(n))
        assert ogg.ogg_crc(d) == ogg.ogg_crc_bitserial(d)


def test_ogg_page_roundtrip_lacing_edges():
    pkts = [b"", b"x" * 255, b"y" * 510, b"tail"]  # empty + exact multiples
    raw = ogg.write_ogg([(pkts, 123456789)])
    pages = ogg.parse_ogg_pages(raw)
    assert pages[0]["header_type"] & 0x02 and pages[-1]["header_type"] & 0x04
    assert pages[-1]["granule"] == 123456789
    assert ogg.reassemble_packets(pages) == pkts


def test_ogg_continuation_across_pages():
    big = bytes(i % 251 for i in range(600))
    raw = ogg.write_ogg([([b"head"], 0), ([big, b"z"], 77)], max_segs_per_page=2)
    pages = ogg.parse_ogg_pages(raw)
    assert len(pages) == 3  # head page + 600B split over two pages
    assert pages[2]["header_type"] & 0x01  # continuation flag
    assert pages[1]["granule"] == -1  # completes no packet
    assert ogg.reassemble_packets(pages) == [b"head", big, b"z"]


def test_ogg_strictness_rejections():
    raw = bytearray(ogg.write_ogg([([b"p1"], 5)]))
    flipped = bytearray(raw)
    flipped[-1] ^= 1
    with pytest.raises(ValueError, match="CRC"):
        ogg.parse_ogg_pages(bytes(flipped))
    with pytest.raises(ValueError, match="page sync"):
        ogg.parse_ogg_pages(b"NotOggS" + bytes(raw))
    with pytest.raises(ValueError, match="truncated"):
        ogg.parse_ogg_pages(bytes(raw[:-1]))
    vers = bytearray(raw)
    vers[4] = 1
    vers[22:26] = ogg.ogg_crc(bytes(vers[:22]) + bytes(4) + bytes(vers[26:])).to_bytes(4, "little")
    with pytest.raises(ValueError, match="version"):
        ogg.parse_ogg_pages(bytes(vers))
    # a stream that ends mid-packet must not reassemble
    open_pkt = ogg.write_ogg([([bytes(600)], 9)], max_segs_per_page=2)
    first_page_end = 27 + 2 + 510
    with pytest.raises(ValueError, match="mid-packet"):
        ogg.reassemble_packets(ogg.parse_ogg_pages(open_pkt[:first_page_end]))


def test_vorbis_and_opus_ident_meta():
    ident = ogg.write_vorbis_ident(2, 44100, 160000)
    raw = ogg.write_ogg([([ident], 0), ([b"c", b"s"], 0), ([b"d"], 88200)])
    m = ogg.parse_ogg_meta(raw)
    assert m == {
        "codec": "vorbis", "n_channels": 2, "sample_rate": 44100,
        "n_pages": 3, "duration_ms": 2000, "bitrate_kbps": 160,
    }
    head = ogg.write_opus_head(1, 312, 8000)
    raw2 = ogg.write_ogg([([head], 0), ([b"OpusTags"], 0), ([b"d"], 312 + 24000)])
    m2 = ogg.parse_ogg_meta(raw2)
    assert m2["codec"] == "opus" and m2["sample_rate"] == 48000
    assert m2["duration_ms"] == 500 and m2["bitrate_kbps"] == 0
    with pytest.raises(ValueError, match="unrecognized first packet"):
        ogg.parse_ogg_meta(ogg.write_ogg([([b"\x01theora?"], 0)]))
    # two concatenated single-page streams = two serials under one walk
    two = ogg.write_ogg([([ident], 0)], serial=1) + ogg.write_ogg([([ident], 0)], serial=2)
    with pytest.raises(ValueError, match="multiplexed"):
        ogg.parse_ogg_meta(two)


# ---------------------------------------------------------------- MP4 ----


from query_skyline_qos_flink_spark.operators import mp4  # noqa: E402


@pytest.mark.parametrize("mvhd_v1", [False, True])
@pytest.mark.parametrize("nt", [1, 2, 3, 5])
def test_mp4_write_parse_roundtrip(nt, mvhd_v1):
    ts = 90000 if mvhd_v1 else 600
    b = mp4.write_mp4(nt, ts, ts * 3 + 17, first_video=nt % 2 == 0, mvhd_v1=mvhd_v1)
    m = mp4.parse_mp4_meta(b)
    nv = sum(1 for i in range(nt) if (i % 2 == 0) == (nt % 2 == 0))
    assert m["brand"] == "isom" and m["n_tracks"] == nt
    assert (m["n_video"], m["n_audio"]) == (nv, nt - nv)
    assert m["timescale"] == ts and m["duration_ms"] == (ts * 3 + 17) * 1000 // ts


def test_mp4_strictness_and_unknown_box_skip():
    b = mp4.write_mp4(2, 1000, 5000)
    with pytest.raises(ValueError):
        mp4.parse_mp4_meta(b[:-5])  # truncated trailing box
    with pytest.raises(ValueError, match="missing ftyp"):
        mp4.parse_mp4_meta(b[20:])  # clean strip of the 20-byte ftyp box
    with pytest.raises(ValueError):
        mp4.parse_mp4_meta(b[:30])  # moov gone
    # oversized inner box: size field escapes its container
    evil = bytearray(b)
    moov_at = b.find(b"moov") - 4
    evil[moov_at : moov_at + 4] = (len(b) + 50).to_bytes(4, "big")
    with pytest.raises(ValueError, match="out of bounds"):
        mp4.parse_mp4_meta(bytes(evil))
    # unknown top-level and unknown moov-child boxes are skipped by size
    # (the format's own forward-compat rule), incl. a largesize escape
    free = (12).to_bytes(4, "big") + b"free" + bytes(4)
    large = (1).to_bytes(4, "big") + b"skip" + (20).to_bytes(8, "big") + bytes(4)
    assert mp4.parse_mp4_meta(b + free + large)["n_tracks"] == 2


def test_mp4_fragmented_duration():
    """fMP4/DASH: moov durations are 0 and media arrives in moof+mdat
    fragments; duration is the exact per-track trun sum (explicit
    per-sample durations, tfhd defaults, and trex defaults all
    exercised), in the track's mdhd timescale."""
    f = mp4.write_fmp4(2, 1000, [
        [(1, [100, 200, 300]), (2, 4)],   # track1 explicit 600; track2 4x250
        [(1, 2)],                          # track1 2x250 via tfhd default
    ], trex_default=250)
    m = mp4.parse_mp4_meta(f)
    assert m["n_fragments"] == 2 and m["n_tracks"] == 2
    assert m["duration_ms"] == 1100  # max(track1: 600+500, track2: 1000)
    # unfragmented files keep reporting the mvhd duration and 0 fragments
    assert mp4.parse_mp4_meta(mp4.write_mp4(1, 600, 1234))["n_fragments"] == 0

    # a trun with neither per-sample durations nor any default raises
    # (strip the mvex box so the trex default disappears)
    import struct

    g = mp4.write_fmp4(2, 1000, [[(2, 3)]], trex_default=7)
    # rebuild without mvex: find moov, re-emit its children minus mvex
    moov_at = g.find(b"moov") - 4
    moov_size = struct.unpack_from(">I", g, moov_at)[0]
    moov_body = g[moov_at + 8 : moov_at + moov_size]
    out, off = b"", 0
    while off < len(moov_body):
        bs = struct.unpack_from(">I", moov_body, off)[0]
        if moov_body[off + 4 : off + 8] != b"mvex":
            out += moov_body[off : off + bs]
        off += bs
    rebuilt = (
        g[:moov_at]
        + struct.pack(">I", 8 + len(out)) + b"moov" + out
        + g[moov_at + moov_size :]
    )
    # track_id 2 is odd->even here: id 2 has no tfhd default in the
    # writer, so with mvex gone there is no duration source at all
    with pytest.raises(ValueError, match="no per-sample durations|no tfhd/trex"):
        mp4.parse_mp4_meta(rebuilt)
    # a moof referencing an unknown track raises
    h = bytearray(mp4.write_fmp4(1, 1000, [[(1, [50])]]))
    tfhd_at = h.find(b"tfhd")
    struct.pack_into(">I", h, tfhd_at + 8, 99)  # track_ID field
    with pytest.raises(ValueError, match="unknown track_ID"):
        mp4.parse_mp4_meta(bytes(h))
    # duration-is-empty traf contributes nothing
    e = bytearray(mp4.write_fmp4(1, 1000, [[(1, [500])]]))
    tfhd_at = e.find(b"tfhd")
    flags = int.from_bytes(e[tfhd_at + 5 : tfhd_at + 8], "big") | 0x010000
    e[tfhd_at + 5 : tfhd_at + 8] = flags.to_bytes(3, "big")
    assert mp4.parse_mp4_meta(bytes(e))["duration_ms"] == 0
    # a defaults-only trun with a corrupt astronomical count hits the
    # sanity bound instead of silently reporting a ~34-year duration
    c = bytearray(mp4.write_fmp4(1, 1000, [[(1, 3)]], trex_default=250))
    trun_at = c.find(b"trun")
    struct.pack_into(">I", c, trun_at + 8, 0xFFFFFFFF)
    with pytest.raises(ValueError, match="sanity bound"):
        mp4.parse_mp4_meta(bytes(c))


# --------------------------------------------------------------- WebM ----


from query_skyline_qos_flink_spark.operators import webm  # noqa: E402


@pytest.mark.parametrize("unknown_size", [False, True])
@pytest.mark.parametrize("nt", [1, 2, 3, 4])
def test_webm_write_parse_roundtrip(nt, unknown_size):
    b = webm.write_webm(nt, 2500 + nt * 7, first_video=nt % 2 == 0,
                        unknown_segment_size=unknown_size)
    m = webm.parse_webm_meta(b)
    nv = sum(1 for i in range(nt) if (i % 2 == 0) == (nt % 2 == 0))
    assert m["doctype"] == "webm" and m["n_tracks"] == nt
    assert (m["n_video"], m["n_audio"]) == (nv, nt - nv)
    assert m["duration_ms"] == 2500 + nt * 7 and m["timescale_ns"] == 1_000_000


def test_webm_strictness_and_unknown_element_skip():
    b = webm.write_webm(2, 100)
    with pytest.raises(ValueError):
        webm.parse_webm_meta(b[:-3])  # element overruns its parent
    with pytest.raises(ValueError, match="missing EBML header"):
        webm.parse_webm_meta(b[12:])  # clean strip of the 12-byte header elem
    with pytest.raises(ValueError):
        webm.parse_webm_meta(b[10:])  # mid-element cut: still rejected
    with pytest.raises(ValueError, match="invalid varint"):
        webm.parse_webm_meta(b"\x00\x01\x02")
    # a Void (0xEC) element after the Segment is skipped by size
    void = bytes([0xEC, 0x84]) + bytes(4)
    assert webm.parse_webm_meta(b + void)["n_tracks"] == 2
    # the all-ones SIZE escape at width 1 must read as unknown, not 127
    # (exercised structurally by the unknown-size Segment roundtrip above)


# ------------------------------------------------- fixture closed form ----


def test_container_fixture_closed_form_full_key_space():
    """Every key of the folded fixture space parses back to exactly the
    integer formulas the x_multimodal_meta oracle states."""
    for key in range(2520):
        got = mm.sniff_container_meta(mm.synth_container_payload(key))
        c, k = key % 6, key // 6
        if c == 5:
            brand = "avif" if k % 2 == 0 else "heic"
            want = (brand, 0, 0, 1 + k % 3, 0, 0,
                    64 + (k % 5) * 16, 48 + (k % 7) * 12)
            assert got == want, (key, got, want)
            continue
        if c == 0:
            sr = (44100, 48000, 32000)[k % 3]
            n = 8 + k % 7
            want = ("mp3", 1 + k % 2, sr, n, n * 1152 * 1000 // sr,
                    (64, 96, 128, 160)[k % 4], 0, 0)
        elif c == 1:
            ch = 1 + (k // 2) % 2
            if k % 2 == 0:
                rate = (8000, 16000, 44100, 48000)[k % 4]
                s = 2000 + (k % 5) * 800
                want = ("ogg-vorbis", ch, rate,
                        3 + k % 3 + (1 if k % 4 == 2 else 0),
                        s * 1000 // rate, 64 + (k % 5) * 16, 0, 0)
            else:
                want = ("ogg-opus", ch, 48000, 3, 20 * (20 + k % 10), 0, 0, 0)
        elif c == 2:
            n = 800 + ((4 * k) % 5) * 160
            want = ("wav", 1, 8000, n, n // 8, 128, 0, 0)
        elif c == 3:
            nt = 1 + k % 3
            fv = (k // 2) % 2 == 0
            n_audio = nt // 2 if fv else (nt + 1) // 2
            ts = 600 if k % 2 == 0 else 90000
            dur = ((2 + k % 5) * ts + k % 7) * 1000 // ts
            want = ("mp4", n_audio, ts, nt, dur, 0, 0, 0)
        else:
            nt = 1 + k % 3
            fv = (k // 2) % 2 == 0
            n_audio = nt // 2 if fv else (nt + 1) // 2
            want = ("webm", n_audio, 1_000_000, nt, 1500 + (k % 7) * 500, 0, 0, 0)
        assert got == want, (key, got, want)


def test_sniff_unknown_magic_raises():
    with pytest.raises(ValueError, match="unrecognized magic"):
        mm.sniff_container_meta(b"\x89PNG\r\n\x1a\n not audio")


# -------------------------------------------- review-pass regressions ----


def test_ogg_rejects_chained_and_gapped_streams():
    """Round-12 review: same-serial chained streams and dropped pages pass
    CRC/lacing but break the 0..n-1 page sequence — both must raise, not
    sniff as valid-but-shorter audio."""
    ident = ogg.write_vorbis_ident(1, 48000, 0)
    one = ogg.write_ogg([([ident], 0), ([b"d"], 48000)], serial=7)
    with pytest.raises(ValueError, match="sequence"):
        ogg.parse_ogg_meta(one + one)  # chained: seq restarts at 0
    three = ogg.write_ogg([([ident], 0), ([b"c"], 0), ([b"d"], 48000)], serial=7)
    pages = ogg.parse_ogg_pages(three)
    # drop the middle page (packet-aligned, CRC-intact)
    start1 = three.find(b"OggS", 4)
    start2 = three.find(b"OggS", start1 + 4)
    with pytest.raises(ValueError, match="sequence"):
        ogg.parse_ogg_meta(three[:start1] + three[start2:])
    assert [p["seq"] for p in pages] == [0, 1, 2]


def test_ogg_spill_page_granule_when_it_completes_a_packet():
    """Round-12 review: a spilled page whose FIRST lacing closes an
    earlier packet completes that packet, so it must carry the granule,
    not -1 (RFC 3533)."""
    raw = ogg.write_ogg([([b"a" * 10, b"x" * 600], 100)], max_segs_per_page=2)
    pages = ogg.parse_ogg_pages(raw)
    # lacing [10,255],[255,90]: page 0 completes packet 'a'
    assert pages[0]["granule"] == 100
    assert ogg.reassemble_packets(pages) == [b"a" * 10, b"x" * 600]


def test_mp4_empty_mvhd_payload_is_valueerror():
    b = mp4.write_mp4(1, 1000, 5000)
    moov_payload = b.find(b"moov") + 4
    evil = bytearray(b)
    # shrink mvhd to an 8-byte (empty-payload) box and pad its old body
    # with a free box so moov still tiles
    old_size = int.from_bytes(b[moov_payload : moov_payload + 4], "big")
    evil[moov_payload : moov_payload + 4] = (8).to_bytes(4, "big")
    fill = old_size - 8
    evil[moov_payload + 8 : moov_payload + old_size] = (
        fill.to_bytes(4, "big") + b"free" + bytes(fill - 8)
    )
    with pytest.raises(ValueError, match="truncated full-box|truncated mvhd"):
        mp4.parse_mp4_meta(bytes(evil))


def test_sniff_flac_identity_and_g711_bitrate():
    """Round-12 review: FLAC must route as 'flac' (bitrate 0, VBR), and a
    G.711 WAV must report its true 64 kbps byte-rate, not a PCM16 one."""
    flac_payload = mm.synth_wav_payload(3)  # variant 3 = FLAC
    got = mm.sniff_container_meta(flac_payload)
    assert got[0] == "flac" and got[5] == 0
    assert got[1:5] == (1, 8000, 800 + (3 % 5) * 160, (800 + 480) // 8)
    mulaw = mm.synth_wav_payload(5)  # variant 1 = G.711 mu-law, 8-bit
    got2 = mm.sniff_container_meta(mulaw)
    assert got2[0] == "wav" and got2[5] == 64


# ------------------------------------------------------ tag metadata ----


@pytest.mark.parametrize("version", [3, 4])
def test_id3v2_text_frames_roundtrip(version):
    tags = {"TIT2": "Ünïcode Title", "TPE1": "Artist/灰", "TLAN": "deu"}
    blob = ma.write_id3v2_tags(tags, version=version) + ma.write_mp3(3)
    assert ma.parse_id3v2_tags(blob) == tags
    # the framed mp3 stream still walks cleanly behind the tag
    assert ma.parse_mp3_meta(blob)["n_frames"] == 3
    # no tag -> empty dict, not an error
    assert ma.parse_id3v2_tags(ma.write_mp3(1)) == {}


def test_id3v2_tag_strictness():
    blob = bytearray(ma.write_id3v2_tags({"TIT2": "x"}, version=3))
    blob[14] = 0xFF  # frame size high byte -> overruns the tag
    with pytest.raises(ValueError, match="overruns the tag"):
        ma.parse_id3v2_tags(bytes(blob))
    enc = bytearray(ma.write_id3v2_tags({"TIT2": "x"}, version=4))
    enc[20] = 9  # unknown text encoding byte
    with pytest.raises(ValueError, match="unknown text encoding"):
        ma.parse_id3v2_tags(bytes(enc))


@pytest.mark.parametrize("opus", [False, True])
def test_vorbis_comments_roundtrip(opus):
    tags = {"TITLE": "Süße Träume", "ARTIST": "a=b weird", "LANGUAGE": "de"}
    pkt = ogg.write_vorbis_comments(tags, vendor="vend", opus=opus)
    vendor, got = ogg.parse_vorbis_comments(pkt)
    assert vendor == "vend" and got == tags  # keys already upper
    # lowercase keys normalize up; values keep '=' after the first
    pkt2 = ogg.write_vorbis_comments({"title": "x=y"}, opus=opus)
    assert ogg.parse_vorbis_comments(pkt2)[1] == {"TITLE": "x=y"}
    with pytest.raises(ValueError, match="bad packet magic"):
        ogg.parse_vorbis_comments(b"\x04vorbis junk")
    with pytest.raises(ValueError, match="overruns the packet"):
        ogg.parse_vorbis_comments(pkt[: len(pkt) - 3])


# ------------------------------------------- second-review regressions ----


def test_webm_unknown_size_only_on_segment_cluster():
    """Round-12 review: an unknown-size Info would swallow Tracks and
    misreport a 2-track file as trackless — only Segment/Cluster may
    omit their size (Matroska unknownsizeallowed)."""
    import struct

    b = webm.write_webm(2, 100)
    info_at = b.find(bytes.fromhex("1549A966"))
    evil = bytearray(b)
    # Info's 1-byte size varint sits right after its 4-byte id
    assert evil[info_at + 4] & 0x80
    evil[info_at + 4 : info_at + 5] = b"\x01" + b"\xff" * 7
    with pytest.raises(ValueError, match="unknown-size escape"):
        webm.parse_webm_meta(bytes(evil))


def test_webm_duration_scales_before_truncating():
    """Round-12 review: a fractional tick is a real sub-timescale span —
    int(ticks) before scaling dropped it whole (2.5 ticks at 1 s/tick
    read as 2000 ms instead of 2500)."""
    import struct

    # 1-byte TimestampScale can't hold 1e9, so build the Info element by
    # hand: TimestampScale = 1e9 ns (1 s ticks), Duration = 2.5 ticks
    info = webm._elem(webm._TIMESTAMP_SCALE, (1_000_000_000).to_bytes(4, "big"))
    info += webm._elem(webm._DURATION, struct.pack(">d", 2.5))
    head = webm._elem(webm._EBML, webm._elem(webm._DOCTYPE, b"webm"))
    seg = webm._elem(webm._SEGMENT, webm._elem(webm._INFO, info))
    m = webm.parse_webm_meta(head + seg)
    assert m["timescale_ns"] == 1_000_000_000
    assert m["duration_ms"] == 2500  # was 2000 with truncate-then-scale


def test_vorbis_comment_framing_bit_and_trailing():
    """Round-12 review: a Vorbis comment packet without its framing bit
    (truncation) or with trailing bytes must raise; OpusTags keeps its
    RFC-sanctioned ignorable binary suffix."""
    pkt = ogg.write_vorbis_comments({"TITLE": "t"})
    with pytest.raises(ValueError, match="framing bit"):
        ogg.parse_vorbis_comments(pkt[:-1])
    with pytest.raises(ValueError, match="trailing bytes"):
        ogg.parse_vorbis_comments(pkt + b"x")
    opus = ogg.write_vorbis_comments({"TITLE": "t"}, opus=True)
    assert ogg.parse_vorbis_comments(opus + b"\x00ignorable")[1] == {"TITLE": "t"}


def test_id3v2_unsync_extended_header_and_version_gate():
    """Round-12 review: tag-level unsynchronisation, extended headers and
    the v2.2 layout must not be walked with the v2.3/2.4 layout."""
    # v2.3 tag-level unsync: a UTF-16 frame is full of 0xFF bytes; apply
    # the spec transform to the assembled body and set the tag flag
    inner = ma.write_id3v2_tags({"TIT2": "ABC"}, version=3)
    body = inner[10:]
    unsynced = body.replace(b"\xff", b"\xff\x00")
    tag = b"ID3" + bytes((3, 0, 0x80)) + ma._syncsafe(len(unsynced)) + unsynced
    assert ma.parse_id3v2_tags(tag) == {"TIT2": "ABC"}
    # v2.4 per-frame unsync flag
    payload = b"\x03" + "café".encode("utf-8")
    unsynced_p = payload.replace(b"\xff", b"\xff\x00")
    frame = b"TIT2" + ma._syncsafe(len(unsynced_p)) + b"\x00\x02" + unsynced_p
    tag4 = b"ID3" + bytes((4, 0, 0)) + ma._syncsafe(len(frame)) + frame
    assert ma.parse_id3v2_tags(tag4) == {"TIT2": "café"}
    # v2.3 extended header (size excludes its own 4 size bytes)
    ext = (6).to_bytes(4, "big") + bytes(6)
    frames = ma.write_id3v2_tags({"TALB": "A"}, version=3)[10:]
    tag3e = b"ID3" + bytes((3, 0, 0x40)) + ma._syncsafe(len(ext + frames)) + ext + frames
    assert ma.parse_id3v2_tags(tag3e) == {"TALB": "A"}
    # v2.4 extended header (syncsafe size INCLUDES itself)
    ext4 = ma._syncsafe(6) + bytes((1, 0))
    tag4e = b"ID3" + bytes((4, 0, 0x40)) + ma._syncsafe(len(ext4 + frame)) + ext4 + frame
    assert ma.parse_id3v2_tags(tag4e) == {"TIT2": "café"}
    # v2.2: clear unsupported-version error, not a misleading overrun
    tag22 = b"ID3" + bytes((2, 0, 0)) + ma._syncsafe(11) + b"TT2" + bytes(8)
    with pytest.raises(ValueError, match="unsupported tag version"):
        ma.parse_id3v2_tags(tag22)


# ------------------------------------------------------- AVI / TIFF ----


from query_skyline_qos_flink_spark.operators import avi  # noqa: E402


@pytest.mark.parametrize(
    "streams", [("vids",), ("vids", "auds"), ("auds",), ("vids", "auds", "auds")]
)
def test_avi_write_parse_roundtrip(streams):
    b = avi.write_avi(250, 40000, streams, width=320, height=240)
    m = avi.parse_avi_meta(b)
    assert m["total_frames"] == 250 and m["usec_per_frame"] == 40000
    assert m["n_streams"] == len(streams)
    assert m["n_video"] == streams.count("vids")
    assert m["n_audio"] == streams.count("auds")
    assert m["duration_ms"] == 10000
    assert (m["width"], m["height"]) == (320, 240)


def test_avi_strictness_and_sniff():
    b = avi.write_avi(10, streams=("vids", "auds"))
    with pytest.raises(ValueError):
        avi.parse_avi_meta(b[:-3])  # RIFF size overruns
    with pytest.raises(ValueError, match="not a RIFF-AVI"):
        avi.parse_avi_meta(b"RIFX" + b[4:])
    with pytest.raises(ValueError, match="missing hdrl/avih"):
        avi.parse_avi_meta(b.replace(b"avih", b"xxxx"))
    # declared vs walked stream count cross-check
    with pytest.raises(ValueError, match="declares"):
        avi.parse_avi_meta(avi.write_avi(5, streams=("vids",)).replace(
            b"\x01\x00\x00\x00" + b"\x00" * 4 + b"\x40\x00\x00\x00",  # nStreams=1
            b"\x02\x00\x00\x00" + b"\x00" * 4 + b"\x40\x00\x00\x00",
        ))
    # sniff dispatch: AVI wins over the generic RIFF/WAV branch
    got = mm.sniff_container_meta(b)
    assert got == ("avi", 1, 1_000_000 // 33333, 10, 33333 * 10 // 1000, 0, 0, 0)


@pytest.mark.parametrize("le", [True, False])
@pytest.mark.parametrize("spp", [1, 3, 4])
@pytest.mark.parametrize("rps", [None, 3])
def test_tiff_roundtrip(le, spp, rps):
    h, w = 7, 5
    arr = np.arange(h * w * spp, dtype=np.uint8).reshape(h, w, spp)
    b = mm.encode_tiff(arr, little_endian=le, rows_per_strip=rps)
    gh, gw, gc, out = mm.decode_tiff(b)
    assert (gh, gw, gc) == (h, w, spp)
    assert (out == arr).all()
    # and through the generic image dispatch
    gh2, gw2, gc2, out2 = mm.decode_image(b)
    assert (out2 == arr).all() and (gh2, gw2, gc2) == (h, w, spp)


def test_tiff_strictness():
    arr = np.zeros((4, 4), dtype=np.uint8)
    b = bytearray(mm.encode_tiff(arr))
    with pytest.raises(ValueError, match="bad byte-order"):
        mm.decode_tiff(b"XX*\x00" + bytes(b[4:]))
    # compression tag -> declared external-decoder seam
    comp_b = mm.encode_tiff(arr)
    at = comp_b.find((259).to_bytes(2, "little"))
    evil = bytearray(comp_b)
    evil[at + 8] = 5  # Compression = LZW
    with pytest.raises(ValueError, match="external-decoder seam"):
        mm.decode_tiff(bytes(evil))
    with pytest.raises(ValueError):
        mm.decode_tiff(comp_b[:30])  # truncated IFD / strips


def test_third_review_regressions():
    """Round-12 third-review findings: TIFF error-type contract,
    WhiteIsZero, palette seam, AVI zero-strl cross-check, RIFF/ftyp
    sniff-ordering collision guard."""
    import struct

    # (1) malformed TIFFs surface as ValueError, never struct/Index/ZeroDiv
    for bad in (b"II*\x00", b"II*\x00\x08\x00"):
        with pytest.raises(ValueError):
            mm.decode_tiff(bad)
    base = mm.encode_tiff(np.zeros((4, 4), dtype=np.uint8), rows_per_strip=2)
    rps_at = base.find((278).to_bytes(2, "little"))
    zero_rps = bytearray(base)
    zero_rps[rps_at + 8 : rps_at + 12] = bytes(4)
    with pytest.raises(ValueError, match="zero RowsPerStrip"):
        mm.decode_tiff(bytes(zero_rps))
    # (2) WhiteIsZero inverts; palette photometric is the declared seam
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    wz = bytearray(mm.encode_tiff(arr))
    ph_at = wz.find((262).to_bytes(2, "little"))
    wz[ph_at + 8] = 0
    gh, gw, gc, out = mm.decode_tiff(bytes(wz))
    assert (out == (255 - arr)).all()
    pal = bytearray(mm.encode_tiff(arr))
    pal[ph_at + 8] = 3
    with pytest.raises(ValueError, match="external-decoder seam"):
        mm.decode_tiff(bytes(pal))
    # (3) AVI declaring streams with NO strl headers must not parse
    hdrl_only = avi._list(b"hdrl", avi._chunk(b"avih", struct.pack(
        "<10I", 33333, 0, 0, 0, 10, 0, 3, 0, 64, 48) + bytes(16)))
    body = b"AVI " + hdrl_only + avi._list(b"movi", b"")
    no_strl = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="declares 3 streams, hdrl carries 0"):
        avi.parse_avi_meta(no_strl)
    # (4) a RIFF payload whose size field spells 'ftyp' still routes RIFF
    collision = bytearray(avi.write_avi(5))
    assert mm.sniff_container_meta(bytes(collision))[0] == "avi"
    collision[4:8] = b"ftyp"  # corrupt size -> RIFF branch must own it
    with pytest.raises(ValueError, match="avi:"):
        mm.sniff_container_meta(bytes(collision))


def test_heif_meta_roundtrip_matrix():
    """AVIF/HEIC still-image metadata (ISO 23008-12): brand x ipma
    index-width x item-id-width matrix; the primary item's dimensions
    resolve through the ipma ASSOCIATION (non-primary items carry
    different ispe boxes, so a first-ispe grabber fails)."""
    from query_skyline_qos_flink_spark.operators import mp4

    for brand in ("avif", "heic", "mif1"):
        for wide in (False, True):
            for v1 in (False, True):
                b = mp4.write_heif(
                    brand, 1920, 1080, n_items=3, primary=2,
                    wide_ipma=wide, v1_ids=v1,
                )
                m = mp4.parse_heif_meta(b)
                assert (m["brand"], m["primary_item"], m["n_items"]) == (brand, 2, 3)
                assert (m["width"], m["height"]) == (1920, 1080)
                assert m["item_type"] == ("av01" if brand == "avif" else "hvc1")


def test_heif_meta_strictness():
    from query_skyline_qos_flink_spark.operators import mp4

    good = mp4.write_heif("avif", 64, 48, n_items=2, primary=1)
    assert mp4.parse_heif_meta(good)["width"] == 64
    # a movie brand is not an image
    with pytest.raises(ValueError, match="not a HEIF image brand"):
        mp4.parse_heif_meta(mp4.write_mp4(n_tracks=1, timescale=600, duration_units=600))
    # surgical removals: drop whole sub-boxes (shrinking the enclosing
    # meta box size so the walk still tiles) and expect named failures
    import struct as _s

    def drop(box):
        at = good.find(box)
        assert at > 0
        size = int.from_bytes(good[at - 4 : at], "big")
        start = at - 4
        cut = bytearray(good[:start] + good[start + size :])
        meta_at = cut.find(b"meta") - 4
        meta_size = int.from_bytes(cut[meta_at : meta_at + 4], "big")
        _s.pack_into(">I", cut, meta_at, meta_size - size)
        if box == b"ipma":  # iprp encloses ipma: shrink it too
            iprp_at = cut.find(b"iprp") - 4
            iprp_size = int.from_bytes(cut[iprp_at : iprp_at + 4], "big")
            _s.pack_into(">I", cut, iprp_at, iprp_size - size)
        return bytes(cut)

    with pytest.raises(ValueError, match="missing pitm"):
        mp4.parse_heif_meta(drop(b"pitm"))
    with pytest.raises(ValueError, match="missing iinf"):
        mp4.parse_heif_meta(drop(b"iinf"))
    with pytest.raises(ValueError, match="missing ipco/ipma"):
        mp4.parse_heif_meta(drop(b"ipma"))
    # item-count mismatch
    bad = bytearray(good)
    iinf_at = bad.find(b"iinf")
    _s.pack_into(">H", bad, iinf_at + 8, 7)  # declare 7 items, hold 2
    with pytest.raises(ValueError, match="declares 7 items"):
        mp4.parse_heif_meta(bytes(bad))
    # primary item missing from the table
    bad = bytearray(good)
    pitm_at = bad.find(b"pitm")
    _s.pack_into(">H", bad, pitm_at + 8, 99)
    with pytest.raises(ValueError, match="primary item 99"):
        mp4.parse_heif_meta(bytes(bad))
    # truncated ispe body
    bad = bytearray(good)
    ispe_at = bad.find(b"ispe")
    _s.pack_into(">I", bad, ispe_at - 4, 12)  # shrink box below 8-byte dims
    with pytest.raises(ValueError, match="mp4: box|truncated ispe|tile"):
        mp4.parse_heif_meta(bytes(bad))


def test_heif_meta_dims_property():
    from hypothesis import given, settings, strategies as st

    from query_skyline_qos_flink_spark.operators import mp4

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=2**31 - 1),
        h=st.integers(min_value=1, max_value=2**31 - 1),
        n=st.integers(min_value=1, max_value=6),
        wide=st.booleans(),
        v1=st.booleans(),
    )
    def run(w, h, n, wide, v1):
        primary = 1 + (w + h) % n
        b = mp4.write_heif("avif", w, h, n_items=n, primary=primary,
                           wide_ipma=wide, v1_ids=v1)
        m = mp4.parse_heif_meta(b)
        assert (m["width"], m["height"], m["n_items"], m["primary_item"]) == (
            w, h, n, primary,
        )

    run()


def test_sniff_routes_heif_images():
    """sniff_container_meta must route HEIF brands to the item walk, not
    mis-parse them as trackless movies; A/V columns carry image zeros."""
    from query_skyline_qos_flink_spark.operators import mp4

    b = mp4.write_heif("avif", 320, 200, n_items=2)
    assert mm.sniff_container_meta(b) == ("avif", 0, 0, 2, 0, 0, 320, 200)
    b = mp4.write_heif("heic", 64, 64)
    assert mm.sniff_container_meta(b)[0] == "heic"
    # a real movie still routes to the mp4 walk
    mv = mp4.write_mp4(n_tracks=2, timescale=600, duration_units=1200)
    assert mm.sniff_container_meta(mv)[0] == "mp4"


def test_heif_ipma_bounds_and_sequence_brands():
    """Round-14 review (3rd pass): crafted ipma counts must raise
    ValueError (never IndexError after an unbounded spin), and the
    SEQUENCE brands (avis/hevc, track-based per ISO 23008-12 §7) must
    not be routed into the still-image item walk."""
    import struct as _s

    from query_skyline_qos_flink_spark.operators import mp4

    good = bytearray(mp4.write_heif("avif", 64, 48, n_items=2))
    ipma_at = good.find(b"ipma")
    _s.pack_into(">I", good, ipma_at + 8, 0x00FFFFFF)  # entry_count bomb
    with pytest.raises(ValueError, match="ipma declares"):
        mp4.parse_heif_meta(bytes(good))
    # sequence brands are not still images...
    assert "avis" not in mp4.HEIF_BRANDS and "hevc" not in mp4.HEIF_BRANDS
    with pytest.raises(ValueError, match="not a HEIF image brand"):
        mp4.parse_heif_meta(b"\x00\x00\x00\x14ftypavis\x00\x00\x00\x00mif1")
    # ...and the sniff sends an avis MOVIE to the track walk, not the
    # item walk (an animated AVIF is moov-based and has no meta box)
    seq = bytearray(mp4.write_mp4(n_tracks=1, timescale=600, duration_units=600))
    at = seq.find(b"ftyp") + 4
    seq[at : at + 4] = b"avis"
    assert mm.sniff_container_meta(bytes(seq))[0] == "mp4"
