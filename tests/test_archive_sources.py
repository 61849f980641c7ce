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
    with pytest.raises(ValueError, match="corrupt deflate|CRC mismatch|size mismatch"):
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
