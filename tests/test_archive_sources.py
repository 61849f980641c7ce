"""Archive sources (sources/archives.py): strict ZIP/ustar walks + scan.

Writer/parser pairs over the public PKWARE APPNOTE / POSIX ustar
layouts; the Spark test drives the binaryFile → mapInPandas member
explosion end to end.
"""

from __future__ import annotations

import os
import zlib

import pytest
from hypothesis import given, settings, strategies as st

from query_skyline_qos_flink_spark.sources import archives as ar

_MEMBERS = [("a.txt", b"hello"), ("dir/b.bin", bytes(range(256)) * 5), ("empty", b"")]


@pytest.mark.parametrize("deflate", [True, False])
def test_zip_roundtrip(deflate):
    z = ar.write_zip(_MEMBERS, deflate=deflate)
    got = ar.parse_zip_members(z)
    assert [(m["name"], m["body"]) for m in got] == _MEMBERS
    assert all(m["method"] == (8 if deflate else 0) for m in got)
    assert [m["offset"] for m in got] == sorted(m["offset"] for m in got)


def test_zip_strictness():
    z = ar.write_zip(_MEMBERS)
    # appended garbage breaks EOCD consistency: no record reaches the end
    with pytest.raises(ValueError, match="no consistent end-of-central"):
        ar.parse_zip_members(z + b"xx")
    with pytest.raises(ValueError):
        ar.parse_zip_members(z[:-5])  # EOCD cut
    with pytest.raises(ValueError, match="no consistent end-of-central"):
        ar.parse_zip_members(b"PK\x03\x04 not a full zip")
    # an archive COMMENT containing the EOCD signature must not mis-anchor
    commented = bytearray(z)
    comment = b"see PK\x05\x06 in docs"
    commented[-2:] = len(comment).to_bytes(2, "little")
    commented += comment
    got = ar.parse_zip_members(bytes(commented))
    assert [(m["name"], m["body"]) for m in got] == _MEMBERS
    # flip one deflate byte -> corrupt stream or CRC mismatch, never silence
    data_at = z.find(b"a.txt") + 5
    bad = bytearray(z)
    bad[data_at] ^= 0xFF
    with pytest.raises(
        ValueError, match="corrupt deflate|CRC mismatch|size mismatch|truncated"
    ):
        ar.parse_zip_members(bytes(bad))
    # stored member with tampered body -> CRC mismatch
    s = bytearray(ar.write_zip([("x", b"payload")], deflate=False))
    s[s.find(b"payload")] ^= 1
    with pytest.raises(ValueError, match="CRC mismatch"):
        ar.parse_zip_members(bytes(s))


def test_tar_roundtrip_and_strictness():
    t = ar.write_tar(_MEMBERS)
    got = ar.parse_tar_members(t)
    assert [(m["name"], m["body"]) for m in got] == _MEMBERS
    bad = bytearray(t)
    bad[10] ^= 1  # inside the first header's name field
    with pytest.raises(ValueError, match="checksum mismatch"):
        ar.parse_tar_members(bytes(bad))
    with pytest.raises(ValueError):
        ar.parse_tar_members(t[:-700])  # terminator cut
    # a pax extension header is a declared seam, not a mis-walk
    pax = bytearray(ar.write_tar([("f", b"d")]))
    pax[156] = ord("x")
    # recompute the checksum so ONLY the typeflag rule fires
    pax[148:156] = b" " * 8
    pax[148:156] = f"{sum(pax[:512]):06o}\x00 ".encode()
    with pytest.raises(ValueError, match="declared seam"):
        ar.parse_tar_members(bytes(pax))


@settings(max_examples=40, deadline=None)
@given(
    members=st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(min_codepoint=97, max_codepoint=122),
                min_size=1,
                max_size=20,
            ),
            st.binary(min_size=0, max_size=600),
        ),
        min_size=0,
        max_size=5,
    ),
    deflate=st.booleans(),
)
def test_archive_roundtrip_property(members, deflate):
    z = ar.parse_zip_members(ar.write_zip(members, deflate=deflate))
    assert [(m["name"], m["body"]) for m in z] == members
    t = ar.parse_tar_members(ar.write_tar(members))
    assert [(m["name"], m["body"]) for m in t] == members


def test_read_zip_and_tar_spark(spark, tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "x.zip"), "wb") as f:
        f.write(ar.write_zip(_MEMBERS))
    with open(os.path.join(d, "y.tar"), "wb") as f:
        f.write(ar.write_tar([("t1", b"tar body")]))
    zrows = ar.read_zip(spark, d).collect()
    assert sorted((r["member"], bytes(r["body"])) for r in zrows) == sorted(_MEMBERS)
    trows = ar.read_tar(spark, d).collect()
    assert [(r["member"], bytes(r["body"])) for r in trows] == [("t1", b"tar body")]


def test_fourth_review_regressions():
    """Round-12 fourth-review findings: EOCD ambiguity fail-closed,
    bounded inflate, csize junk rejection, cd_size consumption check,
    tar trailing-garbage/concatenation rejection, bounds-safe errors."""
    import struct

    real = ar.write_zip(_MEMBERS)
    # (1) a comment embedding a CONSISTENT fake archive must be ambiguous
    fake = ar.write_zip([("evil.txt", b"evil body")])
    base_off = len(real) + 2  # fake's absolute position after the length patch
    patched = bytearray(fake)
    eocd_at = patched.rfind(b"PK\x05\x06")
    cd_off = struct.unpack_from("<I", patched, eocd_at + 16)[0]
    struct.pack_into("<I", patched, eocd_at + 16, cd_off + base_off)
    cd_at = fake.find(b"PK\x01\x02")
    lho = struct.unpack_from("<I", patched, cd_at + 42)[0]
    struct.pack_into("<I", patched, cd_at + 42, lho + base_off)
    evil = bytearray(real)
    evil[-2:] = len(patched).to_bytes(2, "little")
    evil += patched
    with pytest.raises(ValueError, match="ambiguous end-of-central"):
        ar.parse_zip_members(bytes(evil))
    # (2) zip bomb: huge declared+real inflation is cut off at size+1,
    # and a LYING size field (smaller than the true inflate) raises
    # instead of materializing the whole stream
    bomb_body = bytes(50_000_000)  # 50 MB of zeros -> tiny deflate
    z = bytearray(ar.write_zip([("bomb", bomb_body)]))
    for spot in (z.find(b"PK\x03\x04") + 22, z.find(b"PK\x01\x02") + 24):
        struct.pack_into("<I", z, spot, 100)  # claim size=100
    with pytest.raises(ValueError, match="inflates past its declared size"):
        ar.parse_zip_members(bytes(z))
    # (3) junk inside the csize span after the deflate stream end
    one = bytearray(ar.write_zip([("m", b"payload")]))
    lho_at = one.find(b"PK\x03\x04")
    data_at = lho_at + 30 + 1  # name 'm'
    csize = struct.unpack_from("<I", one, lho_at + 18)[0]
    junked = one[: data_at + csize] + b"JUNK" + one[data_at + csize :]
    for spot in (lho_at + 18, junked.find(b"PK\x01\x02") + 20):
        struct.pack_into("<I", junked, spot, csize + 4)
    # fix EOCD cd_off for the 4 inserted bytes
    e_at = bytes(junked).rfind(b"PK\x05\x06")
    cd_off2 = struct.unpack_from("<I", junked, e_at + 16)[0]
    struct.pack_into("<I", junked, e_at + 16, cd_off2 + 4)
    with pytest.raises(ValueError, match="trailing bytes inside its csize"):
        ar.parse_zip_members(bytes(junked))
    # (4) cd_size consumption mismatch
    short = bytearray(real)
    e_at = short.rfind(b"PK\x05\x06")
    cd_size = struct.unpack_from("<I", short, e_at + 12)[0]
    struct.pack_into("<I", short, e_at + 12, cd_size + 2)
    # keep consistency: comment still ends the file, cd still fits
    with pytest.raises(ValueError, match="consumed|overruns"):
        ar.parse_zip_members(bytes(short))
    # (5) tar: concatenated archives / trailing garbage raise
    t = ar.write_tar([("a", b"1")])
    with pytest.raises(ValueError, match="after the terminator"):
        ar.parse_tar_members(t + ar.write_tar([("b", b"2")]))
    with pytest.raises(ValueError, match="after the terminator"):
        ar.parse_tar_members(t + b"GARBAGE")
    # (6) a crafted lho near EOF stays a ValueError, not struct.error
    tail_sig = bytearray(real)
    cd_at2 = tail_sig.find(b"PK\x01\x02")
    struct.pack_into("<I", tail_sig, cd_at2 + 42, len(tail_sig) - 6)
    tail_sig[-6:-2] = b"PK\x03\x04"
    # (the EOCD comment-length consistency breaks -> either error is fine,
    # but it must be ValueError)
    with pytest.raises(ValueError):
        ar.parse_zip_members(bytes(tail_sig))
