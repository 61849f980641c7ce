"""GNU sparse tar members — round-16 closure of the declared seam.

All four wire formats reassemble to the member's REAL content (holes
zero-filled): old-GNU typeflag ``S`` (4 inline map slots + chained
512-byte extension blocks of 21), and the pax formats 0.0 (repeated
``GNU.sparse.offset``/``numbytes`` records), 0.1 (``GNU.sparse.map``)
and 1.0 (decimal map at the front of the data run).

Conformance target: the system GNU tar (1.34 here) producing each
format from an actual holey file — gated on the binary being GNU tar,
with hand-built fixtures covering the error paths and the bomb ceiling
independent of the environment."""

from __future__ import annotations

import io
import shutil
import struct
import subprocess

import pytest

from query_skyline_qos_flink_spark.sources import archives
from query_skyline_qos_flink_spark.sources.archives import (
    MAX_SPARSE_MEMBER_BYTES,
    parse_tar_members,
)


def _gnu_tar_available() -> bool:
    exe = shutil.which("tar")
    if not exe:
        return False
    try:
        out = subprocess.run([exe, "--version"], capture_output=True, text=True)
        return "GNU tar" in out.stdout
    except OSError:
        return False


needs_gnu_tar = pytest.mark.skipif(
    not _gnu_tar_available(), reason="GNU tar binary not present"
)

_FORMATS = [
    ("gnu", ["--format=gnu"]),
    ("pax10", ["--format=posix"]),
    ("pax00", ["--format=posix", "--pax-option=sparse-version=0.0"]),
    ("pax01", ["--format=posix", "--pax-option=sparse-version=0.1"]),
]


def _make_sparse(path, runs, total):
    with open(path, "wb") as f:
        for off, payload in runs:
            f.seek(off)
            f.write(payload)
        f.truncate(total)
    want = bytearray(total)
    for off, payload in runs:
        want[off : off + len(payload)] = payload
    return bytes(want)


@needs_gnu_tar
@pytest.mark.parametrize("fmt,flags", _FORMATS)
def test_real_gnu_tar_sparse_roundtrip(tmp_path, fmt, flags):
    runs = [(100_000, b"A" * 5000), (600_000, b"B" * 3000)]
    want = _make_sparse(tmp_path / "sparse.bin", runs, 1_000_000)
    out = tmp_path / f"{fmt}.tar"
    subprocess.run(
        ["tar", "-S", "-c", "-f", str(out), *flags, "-C", str(tmp_path), "sparse.bin"],
        check=True,
        capture_output=True,
    )
    members = parse_tar_members(out.read_bytes())
    assert len(members) == 1
    m = members[0]
    assert m["name"].endswith("sparse.bin")  # pax forms carry GNU.sparse.name
    assert m["size"] == 1_000_000
    assert bytes(m["body"]) == want


@needs_gnu_tar
@pytest.mark.parametrize("fmt,flags", _FORMATS)
def test_many_fragments_forces_extension_maps(tmp_path, fmt, flags):
    """> 4 data runs overflow the old-GNU inline map into chained
    extension blocks (and stress every pax map form the same way)."""
    runs = [(i * 37_000, bytes([65 + i % 26]) * (700 + i * 13)) for i in range(12)]
    want = _make_sparse(tmp_path / "holey.bin", runs, 600_000)
    out = tmp_path / f"{fmt}-many.tar"
    subprocess.run(
        ["tar", "-S", "-c", "-f", str(out), *flags, "-C", str(tmp_path), "holey.bin"],
        check=True,
        capture_output=True,
    )
    members = parse_tar_members(out.read_bytes())
    assert len(members) == 1
    assert members[0]["size"] == 600_000
    assert bytes(members[0]["body"]) == want


@needs_gnu_tar
def test_sparse_member_alongside_plain_members(tmp_path):
    (tmp_path / "plain.txt").write_bytes(b"hello plain\n")
    want = _make_sparse(tmp_path / "sp.bin", [(8192, b"Z" * 100)], 50_000)
    out = tmp_path / "mixed.tar"
    subprocess.run(
        ["tar", "-S", "-c", "-f", str(out), "--format=gnu", "-C", str(tmp_path),
         "plain.txt", "sp.bin"],
        check=True,
        capture_output=True,
    )
    members = {m["name"].rsplit("/", 1)[-1]: m for m in parse_tar_members(out.read_bytes())}
    assert bytes(members["plain.txt"]["body"]) == b"hello plain\n"
    assert bytes(members["sp.bin"]["body"]) == want


@pytest.mark.parametrize("mode", ["gnu", "pax10"])
def test_writer_sparse_roundtrip_property(mode):
    """Hypothesis: arbitrary member bodies (incl. NULs, empty, >512-block
    spans) roundtrip byte-exactly through the sparse writer + reader."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.binary(min_size=0, max_size=3000), min_size=1, max_size=4))
    def roundtrip(bodies):
        members = [(f"m{i}.bin", b) for i, b in enumerate(bodies)]
        blob = archives.write_tar(members, sparse=mode)
        got = [(m["name"], bytes(m["body"])) for m in parse_tar_members(blob)]
        assert got == members

    roundtrip()


# ---- hand-built fixtures: error paths + ceiling, environment-free ----


def _old_gnu_header(name: bytes, size: int, entries, realsize: int,
                    isext: int = 0) -> bytearray:
    hdr = bytearray(512)
    hdr[: len(name)] = name
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"
    hdr[116:124] = b"0000000\x00"
    hdr[124:136] = f"{size:011o}\x00".encode()
    hdr[136:148] = b"00000000000\x00"
    hdr[156] = ord("S")
    hdr[257:265] = b"ustar  \x00"
    at = 386
    for off, n in entries[:4]:
        hdr[at : at + 12] = f"{off:011o}\x00".encode()
        hdr[at + 12 : at + 24] = f"{n:011o}\x00".encode()
        at += 24
    hdr[482] = isext
    hdr[483:495] = f"{realsize:011o}\x00".encode()
    chk = sum(hdr) - sum(hdr[148:156]) + 8 * 0x20
    hdr[148:156] = f"{chk:06o}\x00 ".encode()
    return hdr


def _pad512(b: bytes) -> bytes:
    return b + bytes(-len(b) % 512)


def test_hand_built_old_gnu_sparse_roundtrip():
    frag = b"x" * 600
    tar = bytes(
        _pad512(bytes(_old_gnu_header(b"s.bin", len(frag), [(1000, 600)], 4000)) + frag)
    ) + bytes(1024)
    (m,) = parse_tar_members(tar)
    assert m["size"] == 4000
    body = bytes(m["body"])
    assert body[1000:1600] == frag and not any(body[:1000]) and not any(body[1600:])


def test_sparse_realsize_over_ceiling_raises():
    frag = b"x" * 512
    tar = bytes(
        _pad512(
            bytes(
                _old_gnu_header(
                    b"bomb.bin", len(frag), [(0, 512)], MAX_SPARSE_MEMBER_BYTES + 1
                )
            )
            + frag
        )
    ) + bytes(1024)
    with pytest.raises(ValueError, match="ceiling"):
        parse_tar_members(tar)


def test_sparse_map_entry_out_of_bounds_raises():
    frag = b"x" * 512
    tar = bytes(
        _pad512(bytes(_old_gnu_header(b"oob.bin", len(frag), [(3900, 512)], 4000)) + frag)
    ) + bytes(1024)
    with pytest.raises(ValueError, match="outside"):
        parse_tar_members(tar)


def test_sparse_packed_data_shorter_than_map_raises():
    frag = b"x" * 100
    hdr = _old_gnu_header(b"short.bin", len(frag), [(0, 600)], 4000)
    tar = bytes(_pad512(bytes(hdr) + frag)) + bytes(1024)
    with pytest.raises(ValueError, match="shorter than its map"):
        parse_tar_members(tar)


def test_multivolume_still_fails_fast():
    hdr = _old_gnu_header(b"mv.bin", 0, [], 0)
    hdr[156] = ord("M")
    chk = sum(hdr) - sum(hdr[148:156]) + 8 * 0x20
    hdr[148:156] = f"{chk:06o}\x00 ".encode()
    tar = bytes(hdr) + bytes(1024)
    with pytest.raises(ValueError, match="declared seam"):
        parse_tar_members(tar)


@pytest.mark.parametrize("mode", ["gnu", "pax10"])
def test_writer_sparse_modes_roundtrip(mode):
    """write_tar's fixture sparse modes (the x_archive_extract gate path):
    reassembly equals the exact member bytes, long names included."""
    deep = "p" * 120
    members = [
        (f"corpus/{deep}/a.txt", b"alpha body \x00 with a NUL"),
        ("b.txt", b""),
        ("c.txt", b"x"),
        ("d.txt", bytes(range(256)) * 7),
    ]
    blob = archives.write_tar(members, long_names="pax", sparse=mode)
    got = {m["name"]: bytes(m["body"]) for m in parse_tar_members(blob)}
    assert got == {name: body for name, body in members}


@pytest.mark.parametrize("mode", ["gnu", "pax10"])
def test_writer_sparse_readable_by_gnu_tar(tmp_path, mode):
    """The writer's sparse streams are spec-valid: the system GNU tar
    must extract them to the same bytes."""
    if not _gnu_tar_available():
        pytest.skip("GNU tar binary not present")
    members = [("f1.bin", b"hello sparse world" * 100), ("f2.bin", b"tiny")]
    blob = archives.write_tar(members, sparse=mode)
    tarf = tmp_path / "w.tar"
    tarf.write_bytes(blob)
    outdir = tmp_path / "x"
    outdir.mkdir()
    subprocess.run(
        ["tar", "-x", "-f", str(tarf), "-C", str(outdir)],
        check=True,
        capture_output=True,
    )
    for name, body in members:
        assert (outdir / name).read_bytes() == body


def test_pax_sparse_00_map_mismatch_raises():
    recs = b""
    for kv in (
        "GNU.sparse.numblocks=2",
        "GNU.sparse.offset=0",
        "GNU.sparse.numbytes=512",
        "GNU.sparse.size=4096",
    ):
        body = f" {kv}\n"
        ln = len(body) + 1
        while len(str(ln)) + len(body) != ln:
            ln = len(str(ln)) + len(body)
        recs += f"{ln}{body}".encode()
    xhdr = _old_gnu_header(b"x", len(recs), [], 0)
    xhdr[156] = ord("x")
    xhdr[257:265] = b"ustar\x0000"
    chk = sum(xhdr) - sum(xhdr[148:156]) + 8 * 0x20
    xhdr[148:156] = f"{chk:06o}\x00 ".encode()
    frag = b"y" * 512
    fhdr = _old_gnu_header(b"f.bin", len(frag), [], 0)
    fhdr[156] = ord("0")
    fhdr[257:265] = b"ustar\x0000"
    chk = sum(fhdr) - sum(fhdr[148:156]) + 8 * 0x20
    fhdr[148:156] = f"{chk:06o}\x00 ".encode()
    tar = bytes(_pad512(bytes(xhdr) + recs)) + bytes(_pad512(bytes(fhdr) + frag)) + bytes(1024)
    with pytest.raises(ValueError, match="numblocks"):
        parse_tar_members(tar)
