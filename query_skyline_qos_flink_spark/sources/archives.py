"""Archive sources — strict ZIP and ustar walks with the WARC scan shape.

Training-data drops ship as archives at least as often as loose files;
these readers give them the same crawl-grade contract as
``sources/warc.py``: a strict, fail-fast member walk (a corrupt archive
must never silently yield fewer members) and a ``binaryFile`` →
``mapInPandas`` Spark scan whose parallel unit is the archive file.

ZIP is walked from the END-of-central-directory record per the public
PKWARE APPNOTE layout — the central directory is the archive's source of
truth (local headers can lie; appended garbage hides members from
stream-order readers) — with each entry's local header cross-checked and
stored/deflated payloads decompressed via stdlib ``zlib``.  TAR is the
POSIX ustar layout: 512-byte blocks, octal fields, and the HEADER
CHECKSUM verified per block (the spec's own integrity hook that lenient
readers skip).  Zip64 and pax/GNU long-name extensions raise cleanly at
a declared seam rather than mis-walking.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

_EOCD_SIG = b"PK\x05\x06"
_CD_SIG = b"PK\x01\x02"
_LOCAL_SIG = b"PK\x03\x04"


def parse_zip_members(b: bytes) -> list[dict]:
    """Central-directory walk: returns ``name method size csize crc32
    offset body`` per member, with the CRC of every decompressed body
    verified.  Raises on a missing/ambiguous EOCD, entry-count or
    signature mismatches, zip64 markers, and unsupported methods."""
    # scan for EVERY EOCD candidate whose comment length reaches exactly
    # the end of the payload — an archive comment may itself contain the
    # signature bytes, and a crafted consistent fake near the end would
    # otherwise hijack the whole member walk (round-12 review: fail
    # closed on ambiguity rather than trust proximity to EOF)
    candidates = []
    at = len(b)
    while True:
        at = b.rfind(_EOCD_SIG, 0, at)
        if at < 0:
            break
        if at + 22 <= len(b):
            cand = struct.unpack_from("<HHHHIIH", b, at + 4)
            if at + 22 + cand[6] == len(b):
                candidates.append((at, cand))
    if not candidates:
        raise ValueError("zip: no consistent end-of-central-directory record")
    if len(candidates) > 1:
        raise ValueError(
            "zip: ambiguous end-of-central-directory (multiple consistent "
            "records — comment-embedded fake or corrupt archive)"
        )
    at, fields = candidates[0]
    (n_disk, cd_start_disk, n_here, n_total, cd_size, cd_off, _comment_len) = fields
    if n_disk or cd_start_disk:
        raise ValueError("zip: multi-disk archives are not supported")
    if n_here != n_total or 0xFFFF in (n_here, n_total) or 0xFFFFFFFF in (cd_size, cd_off):
        raise ValueError("zip: zip64 (or split) archive is a declared seam")
    if cd_off + cd_size > at:
        raise ValueError("zip: central directory overruns the EOCD")
    members, off = [], cd_off
    for _ in range(n_total):
        if off + 46 > len(b):
            raise ValueError(f"zip: truncated central-directory entry at byte {off}")
        if b[off : off + 4] != _CD_SIG:
            raise ValueError(f"zip: bad central-directory signature at byte {off}")
        (
            _ver_made, _ver_need, flags, method, _time, _date, crc, csize, size,
            name_len, extra_len, comment_len2, _disk, _iattr, _eattr, lho,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", b, off + 4)
        if off + 46 + name_len > len(b):
            raise ValueError(f"zip: central-directory name out of bounds at byte {off}")
        name = b[off + 46 : off + 46 + name_len].decode("utf-8", "surrogateescape")
        off += 46 + name_len + extra_len + comment_len2
        if flags & 0x1:
            raise ValueError(f"zip: member {name!r} is encrypted")
        if method not in (0, 8):
            raise ValueError(f"zip: member {name!r} method {method} unsupported")
        if lho + 30 > len(b) or b[lho : lho + 4] != _LOCAL_SIG:
            raise ValueError(f"zip: member {name!r} local header missing")
        lname_len, lextra_len = struct.unpack_from("<HH", b, lho + 26)
        data_at = lho + 30 + lname_len + lextra_len
        if data_at + csize > len(b):
            raise ValueError(f"zip: member {name!r} data out of bounds")
        raw = b[data_at : data_at + csize]
        if method == 8:
            # bounded inflate (round-12 review: a zip bomb must raise,
            # never materialize unbounded output before the size check)
            d = zlib.decompressobj(wbits=-15)
            try:
                body = d.decompress(raw, size + 1)
            except zlib.error as exc:
                raise ValueError(f"zip: member {name!r} corrupt deflate: {exc}") from None
            if len(body) > size:
                raise ValueError(
                    f"zip: member {name!r} inflates past its declared size"
                )
            if not d.eof:
                raise ValueError(f"zip: member {name!r} deflate stream truncated")
            if d.unused_data:
                raise ValueError(
                    f"zip: member {name!r} trailing bytes inside its csize span"
                )
        else:
            body = raw
        if len(body) != size:
            raise ValueError(f"zip: member {name!r} size mismatch")
        if zlib.crc32(body) & 0xFFFFFFFF != crc:
            raise ValueError(f"zip: member {name!r} CRC mismatch")
        members.append(
            {
                "name": name, "method": method, "size": size,
                "csize": csize, "crc32": crc, "offset": lho, "body": body,
            }
        )
    if off != cd_off + cd_size:
        raise ValueError(
            f"zip: central directory consumed {off - cd_off} bytes but the "
            f"EOCD declares {cd_size}"
        )
    return members


def write_zip(members: list[tuple[str, bytes]], deflate: bool = True) -> bytes:
    """Spec-shaped ZIP writer (the fixture twin of
    :func:`parse_zip_members`)."""
    out, cd = bytearray(), bytearray()
    for name, body in members:
        nb = name.encode("utf-8")
        crc = zlib.crc32(body) & 0xFFFFFFFF
        if deflate:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            raw = co.compress(body) + co.flush()
            method = 8
        else:
            raw, method = body, 0
        lho = len(out)
        out += _LOCAL_SIG + struct.pack(
            "<HHHHHIIIHH", 20, 0, method, 0, 0, crc, len(raw), len(body), len(nb), 0
        )
        out += nb + raw
        cd += _CD_SIG + struct.pack(
            "<HHHHHHIIIHHHHHII", 20, 20, 0, method, 0, 0, crc, len(raw),
            len(body), len(nb), 0, 0, 0, 0, 0, lho,
        )
        cd += nb
    cd_off = len(out)
    out += cd
    out += _EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, len(members), len(members), len(cd), cd_off, 0
    )
    return bytes(out)


def _tar_octal(field: bytes) -> int:
    s = field.split(b"\x00")[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError:
        raise ValueError(f"tar: bad octal field {field!r}") from None


def parse_tar_members(b: bytes) -> list[dict]:
    """POSIX ustar walk: 512-byte blocks, octal size fields, per-header
    CHECKSUM verification, regular files and directories; pax/GNU
    long-name typeflags raise at a declared seam.  The two-zero-block
    terminator is required (a tar that just stops is truncated), and
    only zero padding may follow it — trailing garbage (or a second
    concatenated archive, which would otherwise silently lose ALL its
    members) raises."""
    members, off = [], 0
    octal = _tar_octal
    while True:
        if off + 512 > len(b):
            raise ValueError("tar: truncated header block")
        hdr = b[off : off + 512]
        if hdr == bytes(512):
            if b[off + 512 : off + 1024] != bytes(512):
                raise ValueError("tar: missing second terminator block")
            if any(b[off + 1024 :]):
                raise ValueError(
                    "tar: non-zero bytes after the terminator (trailing "
                    "garbage or a concatenated archive)"
                )
            break

        stored = octal(hdr[148:156])
        summed = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != summed:
            raise ValueError(f"tar: header checksum mismatch at byte {off}")
        name = hdr[:100].split(b"\x00")[0].decode("utf-8", "surrogateescape")
        typeflag = hdr[156:157]
        if typeflag in (b"x", b"g", b"L", b"K"):
            raise ValueError(
                f"tar: pax/GNU extension typeflag {typeflag!r} is a declared seam"
            )
        size = octal(hdr[124:136])
        data_at = off + 512
        if data_at + size > len(b):
            raise ValueError(f"tar: member {name!r} data out of bounds")
        if typeflag in (b"0", b"\x00"):
            members.append(
                {"name": name, "size": size, "offset": off,
                 "body": b[data_at : data_at + size]}
            )
        off = data_at + (size + 511) // 512 * 512
    return members


def write_tar(members: list[tuple[str, bytes]]) -> bytes:
    """ustar writer (fixture twin of :func:`parse_tar_members`)."""
    out = bytearray()
    for name, body in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise ValueError("tar: name longer than the ustar field")
        hdr = bytearray(512)
        hdr[0 : len(nb)] = nb
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = f"{len(body):011o}\x00".encode()
        hdr[136:148] = b"00000000000\x00"
        hdr[156] = 0x30  # regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        hdr[148:156] = b" " * 8
        checksum = sum(hdr)
        hdr[148:156] = f"{checksum:06o}\x00 ".encode()
        out += hdr + body + bytes((512 - len(body) % 512) % 512)
    out += bytes(1024)
    return bytes(out)


ARCHIVE_SCHEMA = (
    "path string, member string, offset bigint, size bigint, body binary"
)


def _read_archive(spark, path: str, pattern: str, parse):
    import pandas as pd

    from .warc import _scan_files  # one binaryFile scan shared repo-wide

    files = _scan_files(spark, path, pattern)

    def explode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                # one output frame per archive so member bodies never
                # accumulate across files within the Arrow batch
                rows = [
                    (row["path"], m["name"], m["offset"], m["size"], m["body"])
                    for m in parse(bytes(row["content"]))
                ]
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["path", "member", "offset", "size", "body"]
                    )

    return files.mapInPandas(explode, schema=ARCHIVE_SCHEMA)


def read_zip(spark, path: str, pattern: str = "*.zip"):
    """ZIP archive scan → one row per member (see module docstring)."""
    return _read_archive(spark, path, pattern, parse_zip_members)


def read_tar(spark, path: str, pattern: str = "*.tar"):
    """ustar archive scan → one row per regular-file member."""
    return _read_archive(spark, path, pattern, parse_tar_members)
