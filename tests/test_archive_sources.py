"""Archive sources (sources/archives.py): strict ZIP/ustar walks + scan.

Writer/parser pairs over the public PKWARE APPNOTE / POSIX ustar
layouts; the Spark test drives the binaryFile → mapInPandas member
explosion end to end.
"""

from __future__ import annotations

import os
import struct
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


def test_tar_typeflags():
    """'7' (contiguous) is a regular file per POSIX; the data-bearing GNU
    formats this walk does NOT reassemble (multi-volume 'M', dumpdir
    'D') fail fast at a declared seam instead of silently dropping
    member content (sparse 'S' reassembles as of round 16 —
    tests/test_tar_sparse.py — so a malformed one raises its own
    diagnostic, never a silent drop); plain metadata types (dir,
    symlink) stay skipped."""
    hdr7 = ar._tar_block(b"contig", 4, ord("7"))
    blocks = bytes(hdr7) + ar._pad512(b"data") + bytes(1024)
    got = ar.parse_tar_members(blocks)
    assert [(m["name"], m["body"]) for m in got] == [("contig", b"data")]
    for flag in (b"M", b"D"):
        hdr = ar._tar_block(b"gnuthing", 4, flag[0])
        with pytest.raises(ValueError, match="declared seam"):
            ar.parse_tar_members(bytes(hdr) + ar._pad512(b"data") + bytes(1024))
    # an 'S' member without the old-GNU magic is malformed, not a seam —
    # but it still RAISES rather than returning corrupt content
    hdr = ar._tar_block(b"gnuthing", 4, ord("S"))
    with pytest.raises(ValueError, match="old-GNU magic"):
        ar.parse_tar_members(bytes(hdr) + ar._pad512(b"data") + bytes(1024))
    # pax-format sparse with a malformed record set (realsize but no
    # map) must also raise, never yield the packed run as content
    recs = ar.pax_record("GNU.sparse.realsize", "100000") + ar.pax_record("size", "4")
    blocks = (
        bytes(ar._tar_block(b"pax_x", len(recs), ord("x")))
        + ar._pad512(recs)
        + bytes(ar._tar_block(b"sparse_file", 4, 0x30))
        + ar._pad512(b"data")
        + bytes(1024)
    )
    with pytest.raises(ValueError, match="GNU.sparse"):
        ar.parse_tar_members(blocks)
    # a directory entry is metadata: skipped, not raised
    d = ar._tar_block(b"somedir/", 0, ord("5"))
    got = ar.parse_tar_members(
        bytes(d) + bytes(ar._tar_block(b"f", 2, 0x30)) + ar._pad512(b"ok") + bytes(1024)
    )
    assert [(m["name"], m["body"]) for m in got] == [("f", b"ok")]


_LONG = "deep/" + "n" * 140 + "/leaf.txt"


@pytest.mark.parametrize("mode", ["pax", "gnu"])
def test_tar_long_names_roundtrip(mode):
    members = [("short", b"s"), (_LONG, b"L" * 700), ("z", b"")]
    t = ar.write_tar(members, long_names=mode)
    got = ar.parse_tar_members(t)
    assert [(m["name"], m["body"]) for m in got] == members
    # strict-ustar mode still refuses long names
    with pytest.raises(ValueError, match="longer than the ustar field"):
        ar.write_tar([(_LONG, b"x")], long_names="error")


def test_tar_stdlib_cross_conformance(tmp_path):
    """Our pax/GNU output must be readable by stdlib tarfile, and stdlib
    tarfile's pax/GNU/ustar output (incl. the 155-byte prefix split) must
    be readable by our strict walk — an independent conformance target."""
    import io
    import tarfile

    for mode in ("pax", "gnu"):
        t = ar.write_tar([("short", b"s"), (_LONG, b"L" * 700)], long_names=mode)
        tf = tarfile.open(fileobj=io.BytesIO(t))
        assert tf.getnames() == ["short", _LONG]
        assert tf.extractfile(_LONG).read() == b"L" * 700
    prefix_name = "p" * 120 + "/" + "q" * 80  # forces the ustar prefix split
    for fmt, name in (
        (tarfile.PAX_FORMAT, _LONG),
        (tarfile.GNU_FORMAT, _LONG),
        (tarfile.USTAR_FORMAT, prefix_name),
    ):
        buf = io.BytesIO()
        tf = tarfile.open(fileobj=buf, mode="w", format=fmt)
        for n, b in (("plain", b"1"), (name, b"2" * 600)):
            ti = tarfile.TarInfo(n)
            ti.size = len(b)
            tf.addfile(ti, io.BytesIO(b))
        tf.close()
        got = ar.parse_tar_members(buf.getvalue())
        assert [(m["name"], m["body"]) for m in got] == [
            ("plain", b"1"), (name, b"2" * 600)
        ]


def test_tar_pax_semantics():
    """pax record overrides: x > L > g > header; size override; base-256
    numeric fields; strict malformed-record rejection."""
    # hand-build: global 'g' path + a file -> global wins over header name
    g_recs = ar.pax_record("path", "global/name.txt")
    blocks = (
        bytes(ar._tar_block(b"pax_global", len(g_recs), ord("g")))
        + ar._pad512(g_recs)
        + bytes(ar._tar_block(b"hdrname", 4, 0x30))
        + ar._pad512(b"body")
        + bytes(1024)
    )
    got = ar.parse_tar_members(blocks)
    assert [(m["name"], m["body"]) for m in got] == [("global/name.txt", b"body")]

    # per-file 'x' path beats a pending GNU 'L' longname, which beats 'g'
    x_recs = ar.pax_record("path", "x/wins.txt")
    blocks = (
        bytes(ar._tar_block(b"pax_global", len(g_recs), ord("g")))
        + ar._pad512(g_recs)
        + bytes(ar._tar_block(b"././@LongLink", 7, ord("L")))
        + ar._pad512(b"Lname\x00\x00")
        + bytes(ar._tar_block(b"pax_x", len(x_recs), ord("x")))
        + ar._pad512(x_recs)
        + bytes(ar._tar_block(b"hdrname", 2, 0x30))
        + ar._pad512(b"xy")
        + bytes(1024)
    )
    got = ar.parse_tar_members(blocks)
    assert got[0]["name"] == "x/wins.txt"
    # ...and the overrides are consumed: a second file reverts to 'g'
    # pax size override: header says 0, the record carries the truth
    s_recs = ar.pax_record("size", "6")
    blocks = (
        bytes(ar._tar_block(b"pax_x", len(s_recs), ord("x")))
        + ar._pad512(s_recs)
        + bytes(ar._tar_block(b"f", 0, 0x30))
        + ar._pad512(b"sixchr")
        + bytes(1024)
    )
    # NOTE: data run is sized by the pax record, not the zeroed header
    got = ar.parse_tar_members(blocks)
    assert got[0]["body"] == b"sixchr" and got[0]["size"] == 6

    # GNU base-256 size field
    hdr = ar._tar_block(b"big", 5, 0x30)
    hdr[124:136] = b"\x80" + bytes(10) + bytes([5])
    hdr[148:156] = b" " * 8
    hdr[148:156] = f"{sum(hdr):06o}\x00 ".encode()
    got = ar.parse_tar_members(bytes(hdr) + ar._pad512(b"12345") + bytes(1024))
    assert got[0]["body"] == b"12345"

    # malformed pax records raise, never mis-walk
    for bad in (b"7 a=b\n", b"xx path=p\n", b"9 path_p!\n", b"999 a=b\n"):
        blocks = (
            bytes(ar._tar_block(b"pax_x", len(bad), ord("x")))
            + ar._pad512(bad)
            + bytes(ar._tar_block(b"f", 0, 0x30))
            + bytes(1024)
        )
        with pytest.raises(ValueError, match="pax record"):
            ar.parse_tar_members(blocks)
    # dangling extension header before the terminator
    x = ar.pax_record("path", "dangling")
    blocks = bytes(ar._tar_block(b"pax_x", len(x), ord("x"))) + ar._pad512(x) + bytes(1024)
    with pytest.raises(ValueError, match="dangling"):
        ar.parse_tar_members(blocks)
    # consecutive 'x' headers without a file between them
    blocks = (
        bytes(ar._tar_block(b"pax_x", len(x), ord("x")))
        + ar._pad512(x)
        + bytes(ar._tar_block(b"pax_x", len(x), ord("x")))
        + ar._pad512(x)
        + bytes(ar._tar_block(b"f", 0, 0x30))
        + bytes(1024)
    )
    with pytest.raises(ValueError, match="consecutive pax"):
        ar.parse_tar_members(blocks)


def test_zip_bzip2_and_lzma_members():
    """APPNOTE methods 12 (bzip2) and 14 (LZMA, version/propsize header
    + raw LZMA1 props): stdlib zipfile output is the independent
    conformance source; corrupt streams and bombs still raise."""
    import io
    import struct
    import zipfile

    M = [("a.txt", b"hello world" * 100), ("b.bin", bytes(range(256)) * 20), ("e", b"")]
    for comp, want_method in ((zipfile.ZIP_BZIP2, 12), (zipfile.ZIP_LZMA, 14)):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", comp) as z:
            for n, body in M:
                z.writestr(n, body)
        got = ar.parse_zip_members(buf.getvalue())
        assert [(m["name"], m["body"]) for m in got] == M
        assert {m["method"] for m in got} == {want_method}
        # flip a byte inside the first member's stream -> corrupt/CRC raise
        bad = bytearray(buf.getvalue())
        data_at = bad.find(b"a.txt") + 5 + (9 if want_method == 14 else 4)
        bad[data_at] ^= 0xFF
        with pytest.raises(ValueError, match="corrupt|CRC|size mismatch|truncated"):
            ar.parse_zip_members(bytes(bad))
        # lie about the size -> bounded decompress raises, never inflates
        lied = bytearray(buf.getvalue())
        lho_at = lied.find(b"PK\x03\x04")
        cd_at = lied.find(b"PK\x01\x02")
        for spot in (lho_at + 22, cd_at + 24):
            struct.pack_into("<I", lied, spot, 3)
        with pytest.raises(ValueError, match="past its declared size"):
            ar.parse_zip_members(bytes(lied))
    # a bad LZMA properties header raises cleanly
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_LZMA) as z:
        z.writestr("x", b"payload")
    broken = bytearray(buf.getvalue())
    broken[broken.find(b"x") + 1 + 2] = 99  # props_size low byte inside member
    with pytest.raises(ValueError, match="LZMA properties|corrupt"):
        ar.parse_zip_members(bytes(broken))


def test_tar_compressed_envelopes(spark, tmp_path):
    """.tar.gz/.tar.bz2/.tar.xz sniffed by magic: stdlib-written
    compressed tars parse, concatenated gzip members are one logical
    stream per the gzip spec, bombs hit the ceiling, truncation and
    trailing garbage raise."""
    import bz2
    import gzip
    import lzma

    t = ar.write_tar(_MEMBERS)
    for comp in (gzip.compress, bz2.compress, lzma.compress):
        got = ar.parse_tar_any(comp(t))
        assert [(m["name"], m["body"]) for m in got] == _MEMBERS
    # plain bytes pass straight through
    assert [(m["name"], m["body"]) for m in ar.parse_tar_any(t)] == _MEMBERS
    # zstd decodes through the libzstd bridge (round 14); a magic-only
    # prefix over tar bytes is a CORRUPT frame, not a ustar mis-walk
    import query_skyline_qos_flink_spark.sources.native_codecs as nc

    if nc.zstd_available():
        with pytest.raises(ValueError, match="tar.zst: corrupt"):
            ar.parse_tar_any(b"\x28\xb5\x2f\xfd" + t)
        got = ar.parse_tar_any(nc.zstd_compress(t))
        assert [(m["name"], m["body"]) for m in got] == _MEMBERS
    else:
        with pytest.raises(ValueError, match="libzstd"):
            ar.parse_tar_any(b"\x28\xb5\x2f\xfd" + t)
    # concatenated gzip members decode as ONE stream (pigz/bgzf shape)
    half = len(t) // 2
    two = gzip.compress(t[:half]) + gzip.compress(t[half:])
    assert [(m["name"], m["body"]) for m in ar.parse_tar_any(two)] == _MEMBERS
    # xz stream padding (4-byte NUL multiples) is legal
    assert [
        (m["name"], m["body"]) for m in ar.parse_tar_any(lzma.compress(t) + bytes(8))
    ] == _MEMBERS
    with pytest.raises(ValueError, match="stream padding"):
        ar.parse_tar_any(lzma.compress(t) + bytes(6))
    # trailing garbage after the stream raises
    for comp in (gzip.compress, bz2.compress, lzma.compress):
        with pytest.raises(ValueError, match="trailing bytes|corrupt"):
            ar.parse_tar_any(comp(t) + b"JUNKJUNK")
    # truncation raises
    for comp in (gzip.compress, bz2.compress, lzma.compress):
        with pytest.raises(ValueError, match="truncated|corrupt"):
            ar.parse_tar_any(comp(t)[:-5])
    # a zero bomb hits the ceiling, not memory
    import query_skyline_qos_flink_spark.sources.archives as armod

    old = armod.MAX_TAR_BYTES
    armod.MAX_TAR_BYTES = 1_000_000
    try:
        with pytest.raises(ValueError, match="ceiling"):
            ar.parse_tar_any(gzip.compress(bytes(50_000_000)))
    finally:
        armod.MAX_TAR_BYTES = old
    # Spark scan picks up compressed spellings through the default glob
    d = str(tmp_path)
    with open(os.path.join(d, "a.tar"), "wb") as f:
        f.write(ar.write_tar([("p", b"plain")]))
    with open(os.path.join(d, "b.tar.gz"), "wb") as f:
        f.write(gzip.compress(ar.write_tar([("g", b"gzipped")])))
    with open(os.path.join(d, "c.tar.xz"), "wb") as f:
        f.write(lzma.compress(ar.write_tar([("x", b"xzed")])))
    rows = ar.read_tar(spark, d).collect()
    assert sorted((r["member"], bytes(r["body"])) for r in rows) == [
        ("g", b"gzipped"), ("p", b"plain"), ("x", b"xzed")
    ]


def test_zip64_roundtrip_and_strictness():
    """Forced-zip64 fixtures exercise the EOCD64/locator + 0x0001 extra
    walk; stdlib zipfile is the independent conformance target."""
    import io
    import struct
    import zipfile

    z = ar.write_zip(_MEMBERS, zip64=True)
    got = ar.parse_zip_members(z)
    assert [(m["name"], m["body"]) for m in got] == _MEMBERS
    zf = zipfile.ZipFile(io.BytesIO(z))
    assert [(i.filename, zf.read(i)) for i in zf.infolist()] == _MEMBERS

    # masked EOCD without a locator -> raise
    plain = bytearray(ar.write_zip(_MEMBERS))
    e_at = plain.rfind(b"PK\x05\x06")
    struct.pack_into("<H", plain, e_at + 10, 0xFFFF)  # mask total count
    with pytest.raises(ValueError, match="no EOCD64 locator"):
        ar.parse_zip_members(bytes(plain))

    # corrupt the locator's EOCD64 offset -> record missing
    zb = bytearray(z)
    loc_at = zb.rfind(b"PK\x06\x07")
    struct.pack_into("<Q", zb, loc_at + 8, 7)
    with pytest.raises(ValueError, match="EOCD64 record missing"):
        ar.parse_zip_members(bytes(zb))

    # EOCD64 count disagreeing with an unmasked EOCD count -> raise
    zb = bytearray(z)
    z64_at = zb.rfind(b"PK\x06\x06")
    struct.pack_into("<Q", zb, z64_at + 24, 99)  # EOCD64 n_here
    with pytest.raises(ValueError, match="disagrees|split"):
        ar.parse_zip_members(bytes(zb))

    # zip64 extra holding the wrong byte count -> raise
    zb = bytearray(z)
    cd_at = zb.find(b"PK\x01\x02")
    name_len = struct.unpack_from("<H", zb, cd_at + 28)[0]
    struct.pack_into("<H", zb, cd_at + 46 + name_len + 2, 16)  # extra len 24->16
    with pytest.raises(ValueError, match="zip64 extra|extra field"):
        ar.parse_zip_members(bytes(zb))


@settings(max_examples=25, deadline=None)
@given(
    members=st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(min_codepoint=97, max_codepoint=122),
                min_size=1,
                max_size=160,
            ),
            st.binary(min_size=0, max_size=300),
            st.sampled_from(["pax", "gnu"]),  # per-member carriage mode
        ),
        min_size=1,
        max_size=5,
    ),
    splits=st.lists(st.integers(min_value=1, max_value=10_000), max_size=3),
)
def test_tar_mixed_modes_and_gzip_splits_property(members, splits):
    """A single tar may mix pax and GNU long-name carriage member by
    member (real archives do), and a .tar.gz may split its stream into
    gzip members at ARBITRARY byte boundaries (pigz/bgzf do) — both must
    walk identically to the plain archive."""
    import gzip

    blob = bytearray()
    for i, (name, body, mode) in enumerate(members):
        nb = name.encode()
        if len(nb) > 100:
            if mode == "pax":
                recs = ar.pax_record("path", name)
                blob += ar._tar_block(f"PaxHeaders.0/{i}".encode(), len(recs), ord("x"))
                blob += ar._pad512(recs)
            else:
                blob += ar._tar_block(b"././@LongLink", len(nb) + 1, ord("L"))
                blob += ar._pad512(nb + b"\x00")
            nb = nb[:100]
        blob += ar._tar_block(nb, len(body), 0x30)
        blob += ar._pad512(body)
    blob += bytes(1024)
    t = bytes(blob)
    want = [(n, b) for n, b, _ in members]
    assert [(m["name"], m["body"]) for m in ar.parse_tar_members(t)] == want

    # split the stream at the hypothesis-chosen cut points -> one gzip
    # member per piece; the walk must see ONE logical stream
    cuts = sorted({min(c, len(t) - 1) for c in splits})
    pieces, prev = [], 0
    for c in cuts:
        if c > prev:
            pieces.append(t[prev:c])
            prev = c
    pieces.append(t[prev:])
    gz = b"".join(gzip.compress(p) for p in pieces)
    assert [(m["name"], m["body"]) for m in ar.parse_tar_any(gz)] == want


def test_zip_name_encoding_cp437_vs_efs():
    """APPNOTE APPENDIX D: names decode CP437 unless the EFS flag
    (general-purpose bit 11) declares UTF-8.  Round-trip a non-ASCII
    EFS name through our writer (which sets the flag) and hand-build a
    flag-0 entry with a high CP437 byte."""
    import io
    import struct
    import zipfile

    name = "ünïcode/naïve-é.txt"
    z = ar.write_zip([(name, b"x")])
    got = ar.parse_zip_members(z)
    assert got[0]["name"] == name
    # stdlib zipfile agrees on our EFS output
    assert zipfile.ZipFile(io.BytesIO(z)).namelist() == [name]
    # stdlib-written non-ASCII (sets EFS itself) parses identically
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        out.writestr(name, b"y")
    assert ar.parse_zip_members(buf.getvalue())[0]["name"] == name

    # flag-0 entry with byte 0x82: CP437 'é', NOT utf-8
    legacy = bytearray(ar.write_zip([("e?.txt", b"z")], deflate=False))
    raw_name = b"e\x82.txt"
    for sig, name_off, flag_off in ((b"PK\x03\x04", 30, 6), (b"PK\x01\x02", 46, 8)):
        at = legacy.find(sig)
        struct.pack_into("<H", legacy, at + flag_off, 0)  # clear EFS
        legacy[at + name_off : at + name_off + len(raw_name)] = raw_name
    got = ar.parse_zip_members(bytes(legacy))
    assert got[0]["name"] == "eé.txt"
    # stdlib zipfile decodes the same way
    assert zipfile.ZipFile(io.BytesIO(bytes(legacy))).namelist() == ["eé.txt"]


def test_round13_review_regressions(monkeypatch):
    """Round-13 review findings: honest-declaration zip bombs hit the
    absolute ceilings, masked EOCD disk fields require the EOCD64
    locator, and the whole extra area stays validated when a zip64
    record is present."""
    import struct

    # (1) a bomb that DECLARES its true huge size passes the declared-
    # size inflate bound — the absolute member/archive ceilings must fire
    monkeypatch.setattr(ar, "MAX_ZIP_MEMBER_BYTES", 1_000_000)
    with pytest.raises(ValueError, match="member ceiling"):
        ar.parse_zip_members(ar.write_zip([("bomb", bytes(50_000_000))]))
    monkeypatch.setattr(ar, "MAX_ZIP_MEMBER_BYTES", 1 << 30)
    monkeypatch.setattr(ar, "MAX_ZIP_TOTAL_BYTES", 1_500_000)
    many = ar.write_zip([(f"m{i}", bytes(400_000)) for i in range(8)])
    with pytest.raises(ValueError, match="per-archive ceiling"):
        ar.parse_zip_members(many)
    monkeypatch.setattr(ar, "MAX_ZIP_TOTAL_BYTES", 4 << 30)

    # (2) EOCD disk fields masked to 0xFFFF are zip64 markers: without a
    # locator the walk must fail closed, not parse as single-disk
    z = bytearray(ar.write_zip(_MEMBERS))
    e_at = z.rfind(b"PK\x05\x06")
    struct.pack_into("<HH", z, e_at + 4, 0xFFFF, 0xFFFF)
    with pytest.raises(ValueError, match="no EOCD64 locator"):
        ar.parse_zip_members(bytes(z))

    # (3) garbage AFTER the zip64 extra record is rejected the same as
    # garbage before it (order independence of the strict extra walk)
    z64 = bytearray(ar.write_zip([("m", b"body")], zip64=True))
    cd_at = z64.find(b"PK\x01\x02")
    name_len = struct.unpack_from("<H", z64, cd_at + 28)[0]
    extra_at = cd_at + 46 + name_len
    extra_len = struct.unpack_from("<H", z64, cd_at + 30)[0]
    # append 3 junk bytes to the extra area (and grow the declared lens)
    insert_at = extra_at + extra_len
    junked = z64[:insert_at] + b"JNK" + z64[insert_at:]
    struct.pack_into("<H", junked, cd_at + 30, extra_len + 3)
    e_at = junked.rfind(b"PK\x05\x06")
    z64_at = junked.rfind(b"PK\x06\x06")
    loc_at = junked.rfind(b"PK\x06\x07")
    # CD grew by 3: fix EOCD64 cd_size and locator offset
    struct.pack_into("<Q", junked, z64_at + 40, struct.unpack_from("<Q", junked, z64_at + 40)[0] + 3)
    struct.pack_into("<Q", junked, loc_at + 8, struct.unpack_from("<Q", junked, loc_at + 8)[0] + 3)
    struct.pack_into("<I", junked, e_at + 12, struct.unpack_from("<I", junked, e_at + 12)[0] + 3)
    with pytest.raises(ValueError, match="trailing junk in the extra area"):
        ar.parse_zip_members(bytes(junked))

    # duplicate zip64 extras are rejected
    dup = z64[:insert_at] + z64[extra_at:insert_at] + z64[insert_at:]
    grow = extra_len
    struct.pack_into("<H", dup, cd_at + 30, extra_len + grow)
    z64_at = dup.rfind(b"PK\x06\x06")
    loc_at = dup.rfind(b"PK\x06\x07")
    struct.pack_into("<Q", dup, z64_at + 40, struct.unpack_from("<Q", dup, z64_at + 40)[0] + grow)
    struct.pack_into("<Q", dup, loc_at + 8, struct.unpack_from("<Q", dup, loc_at + 8)[0] + grow)
    e_at2 = dup.rfind(b"PK\x05\x06")
    struct.pack_into("<I", dup, e_at2 + 12, struct.unpack_from("<I", dup, e_at2 + 12)[0] + grow)
    with pytest.raises(ValueError, match="duplicate zip64 extra"):
        ar.parse_zip_members(bytes(dup))

    # (4) the fixture writer refuses >= 4 GiB bodies cleanly (no
    # struct.error) — checked via a zero-copy fake len is impractical;
    # assert the guard exists by the documented message on a small lie
    with pytest.raises(ValueError, match="local-header zip64"):
        class FakeBytes(bytes):
            def __len__(self):
                return 0xFFFFFFFF
        ar.write_zip([("big", FakeBytes(b"x"))])


def test_zip64_many_members():
    """>65535 members overflows the EOCD count field: the writer emits
    the EOCD64 pair automatically and the walk recovers every member."""
    import io
    import zipfile

    big = [(f"m{i:06d}", b"x") for i in range(65_600)]
    z = ar.write_zip(big, deflate=False)
    assert b"PK\x06\x06" in z and b"PK\x06\x07" in z
    got = ar.parse_zip_members(z)
    assert len(got) == 65_600
    assert got[0]["name"] == "m000000" and got[-1]["name"] == "m065599"
    assert all(m["body"] == b"x" for m in got[:3])
    # stdlib conformance on the auto-zip64 output
    assert len(zipfile.ZipFile(io.BytesIO(z)).infolist()) == 65_600


@settings(max_examples=40, deadline=None)
@given(
    members=st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(min_codepoint=97, max_codepoint=122),
                min_size=1,
                max_size=160,  # past the 100-byte ustar field: pax/GNU path
            ),
            st.binary(min_size=0, max_size=600),
        ),
        min_size=0,
        max_size=5,
    ),
    deflate=st.booleans(),
    zip64=st.booleans(),
    long_names=st.sampled_from(["pax", "gnu"]),
)
def test_archive_roundtrip_property(members, deflate, zip64, long_names):
    z = ar.parse_zip_members(ar.write_zip(members, deflate=deflate, zip64=zip64))
    assert [(m["name"], m["body"]) for m in z] == members
    t = ar.parse_tar_members(ar.write_tar(members, long_names=long_names))
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


def test_round14_advice_regressions():
    """Round-13 ADVICE items: old-GNU prefix gating, zip64 locator
    false-positive, and full-prefix zip64 extras."""
    # (1) old-GNU magic ('ustar  ') stores atime/ctime at the POSIX
    # prefix offset — octal digits there must NOT be joined into names
    hdr = ar._tar_block(b"plain.txt", 4, 0x30)
    hdr[257:265] = b"ustar  \x00"
    hdr[345:357] = b"13737496104 "[:12]
    hdr[148:156] = b" " * 8
    hdr[148:156] = f"{sum(hdr):06o}\x00 ".encode()
    got = ar.parse_tar_members(bytes(hdr) + ar._pad512(b"data") + bytes(1024))
    assert [m["name"] for m in got] == ["plain.txt"]
    # ...while the exact POSIX magic still honors a real prefix
    hdr2 = ar._tar_block(b"leaf.txt", 4, 0x30)
    hdr2[345:351] = b"prefix"
    hdr2[148:156] = b" " * 8
    hdr2[148:156] = f"{sum(hdr2):06o}\x00 ".encode()
    got2 = ar.parse_tar_members(bytes(hdr2) + ar._pad512(b"data") + bytes(1024))
    assert [m["name"] for m in got2] == ["prefix/leaf.txt"]
    # (2) a non-zip64 archive with the EOCD64-locator signature in the
    # slack bytes before the EOCD (e.g. the tail of a file comment) must
    # not be routed into the zip64 path: no masked field vouches for it
    # and the bogus locator offset points at no EOCD64 record
    z = ar.write_zip([("a.txt", b"hello"), ("b.txt", b"world")])
    eocd_at = z.rfind(b"PK\x05\x06")
    fake = z[:eocd_at] + b"PK\x06\x07" + b"\xee" * 16 + z[eocd_at:]
    assert [m["name"] for m in ar.parse_zip_members(fake)] == ["a.txt", "b.txt"]
    # ...but masked EOCD fields still fail closed on a broken locator
    masked = bytearray(fake)
    struct.pack_into("<I", masked, len(masked) - 6, 0xFFFFFFFF)  # mask cd_off
    with pytest.raises(ValueError, match="zip"):
        ar.parse_zip_members(bytes(masked))
    # ...and a PLAUSIBLE locator (single-disk fields) with a corrupt
    # offset is genuine zip64 corruption, not a comment coincidence
    plaus = z[:eocd_at] + b"PK\x06\x07" + struct.pack("<IQI", 0, 7, 1) + z[eocd_at:]
    with pytest.raises(ValueError, match="EOCD64 record missing"):
        ar.parse_zip_members(plaus)
    # (3) spec-violating writers emit a fixed-order PREFIX of all four
    # zip64 fields regardless of masking; read the masked ones in place
    full = struct.pack("<HH", 1, 28) + struct.pack("<QQQI", 111, 222, 333, 0)
    assert ar._zip64_extra(full, ["lho"], "m") == {"lho": 333}
    assert ar._zip64_extra(full, ["size", "csize", "lho"], "m") == {
        "size": 111, "csize": 222, "lho": 333,
    }
    # a prefix too short to cover the masked field still raises
    with pytest.raises(ValueError, match="zip64 extra holds 16"):
        ar._zip64_extra(struct.pack("<HH", 1, 16) + bytes(16), ["lho"], "m")
    with pytest.raises(ValueError, match="zip64 extra holds 12"):
        ar._zip64_extra(struct.pack("<HH", 1, 12) + bytes(12), ["lho"], "m")


def test_zip_zstd_and_xz_members():
    """APPNOTE methods 93 (zstd, one frame) and 95 (XZ): roundtrip via
    the writer twin, declared-size bomb bound, corrupt-stream error
    naming the member."""
    import lzma

    import query_skyline_qos_flink_spark.sources.native_codecs as nc

    members = [("a.txt", b"zstd member " * 100), ("b/c.bin", bytes(range(256)) * 3), ("e", b"")]
    if nc.zstd_available():
        z = ar.write_zip(members, method=93)
        got = ar.parse_zip_members(z)
        assert [(m["name"], m["body"]) for m in got] == members
        assert all(m["method"] == 93 for m in got)
        # corrupt payload byte -> member-named codec error, never silence
        zb = bytearray(ar.write_zip([("x", b"hello " * 50)], method=93))
        zb[40] ^= 0xFF
        with pytest.raises(ValueError, match="zip: member 'x'"):
            ar.parse_zip_members(bytes(zb))
        # a member whose frame inflates past its declared size raises
        honest = ar.write_zip([("y", b"Q" * 10_000)], method=93)
        shrunk = bytearray(honest)
        cd_at = shrunk.rfind(b"PK\x01\x02")
        struct.pack_into("<I", shrunk, cd_at + 24, 100)  # declared size 100
        with pytest.raises(ValueError, match="ceiling|size|CRC"):
            ar.parse_zip_members(bytes(shrunk))
    z = ar.write_zip(members, method=95)
    got = ar.parse_zip_members(z)
    assert [(m["name"], m["body"]) for m in got] == members
    assert all(m["method"] == 95 for m in got)
    # truncated xz stream
    raw = lzma.compress(b"body " * 100, format=lzma.FORMAT_XZ)
    with pytest.raises(ValueError, match="corrupt stream|truncated"):
        ar._decompress_member(raw[:-5], 500, 95, "t")
    # unsupported methods still refuse loudly
    with pytest.raises(ValueError, match="unsupported"):
        ar.write_zip([("q", b"x")], method=42)
