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
stored/deflate/bzip2/LZMA payloads decompressed via stdlib, and zip64
archives (>= 65535 members or >= 4 GiB offsets — routine at crawl
scale) resolved through the EOCD64 record/locator and per-entry 0x0001
extra fields.  TAR is the POSIX ustar layout: 512-byte blocks, octal
(or GNU base-256) fields, and the HEADER CHECKSUM verified per block
(the spec's own integrity hook that lenient readers skip) — plus the
pax (``x``/``g``) and old-GNU (``L``/``K``) long-name extensions that
modern ``tar`` emits by default.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from . import native_codecs

_EOCD_SIG = b"PK\x05\x06"
_EOCD64_SIG = b"PK\x06\x06"
_EOCD64_LOC_SIG = b"PK\x06\x07"
_CD_SIG = b"PK\x01\x02"
_LOCAL_SIG = b"PK\x03\x04"

# Decompression ceilings (round-13 review): the bounded inflate trusts
# the DECLARED member size, but that field is attacker-controlled too —
# a bomb that declares its true huge size (trivial with zip64 + LZMA's
# ~10000x ratios) would otherwise materialize it.  Same bounds rationale
# as sources/warc.py: far above any legitimate corpus-drop member.
MAX_ZIP_MEMBER_BYTES = 1 << 30  # 1 GiB declared size per member
MAX_ZIP_TOTAL_BYTES = 4 << 30  # 4 GiB decompressed per archive


def _zip64_extra(extra: bytes, need: list[str], name: str) -> dict[str, int]:
    """Walk the extra-field area for the 0x0001 zip64 record and pull the
    values for the masked central-directory fields, in the spec's fixed
    order (size, csize, lho, disk).  Strict: the ENTIRE extra area must
    be a well-formed (id, len, data) sequence — not just the prefix up
    to the zip64 record — exactly one zip64 record may appear, and it
    must hold exactly the masked fields."""
    width = {"size": 8, "csize": 8, "lho": 8, "disk": 4}
    vals: dict[str, int] | None = None
    at = 0
    while at + 4 <= len(extra):
        fid, flen = struct.unpack_from("<HH", extra, at)
        at += 4
        if at + flen > len(extra):
            raise ValueError(f"zip: member {name!r} extra field overruns its area")
        if fid == 0x0001:
            if vals is not None:
                raise ValueError(f"zip: member {name!r} duplicate zip64 extra")
            want = sum(width[k] for k in need)
            if flen == want:
                # spec layout: exactly the masked fields, packed in order
                vals, vat = {}, at
                for k in need:
                    if width[k] == 8:
                        vals[k] = struct.unpack_from("<Q", extra, vat)[0]
                    else:
                        vals[k] = struct.unpack_from("<I", extra, vat)[0]
                    vat += width[k]
            else:
                # widespread spec violation stdlib zipfile tolerates:
                # writers that emit a fixed-order PREFIX of all four
                # zip64 fields regardless of masking.  Accept when the
                # prefix covers every masked field, reading only those.
                full_off = {"size": 0, "csize": 8, "lho": 16, "disk": 24}
                if flen in (8, 16, 24, 28) and all(
                    full_off[k] + width[k] <= flen for k in need
                ):
                    vals = {
                        k: struct.unpack_from(
                            "<Q" if width[k] == 8 else "<I", extra, at + full_off[k]
                        )[0]
                        for k in need
                    }
                else:
                    raise ValueError(
                        f"zip: member {name!r} zip64 extra holds {flen} bytes "
                        f"but the masked fields need {want}"
                    )
        at += flen
    if at != len(extra):
        raise ValueError(f"zip: member {name!r} trailing junk in the extra area")
    if vals is None:
        raise ValueError(f"zip: member {name!r} masks fields but has no zip64 extra")
    return vals


def _decompress_member(raw: bytes, size: int, method: int, name: str) -> bytes:
    """Decompress one ZIP member body, bounded by its declared size
    (round-12 review: a zip bomb must raise, never materialize unbounded
    output before the size check).  Methods per APPNOTE 4.4.5: 0 stored,
    8 deflate, 12 bzip2, 14 LZMA (version/propsize header + raw LZMA1
    properties byte and dict size, APPNOTE 5.8), 93 zstd (one frame,
    APPNOTE 6.3.8+ — modern 7-Zip/libarchive emit it), 95 XZ."""
    if method == 0:
        return raw
    if method == 93:
        if not native_codecs.zstd_available():
            raise ValueError(
                f"zip: member {name!r} is zstd-compressed (method 93) and "
                "the libzstd shared library is not available"
            )
        try:
            return native_codecs.zstd_decompress_bounded(
                raw, size, what=f"zip: member {name!r}"
            )
        except ValueError as exc:
            msg = str(exc)
            if not msg.startswith("zip: member"):
                msg = f"zip: member {name!r} corrupt zstd stream: {msg}"
            raise ValueError(msg) from None
    if method == 8:
        d = zlib.decompressobj(wbits=-15)
    elif method == 12:
        import bz2

        d = bz2.BZ2Decompressor()
    elif method == 95:
        import lzma

        d = lzma.LZMADecompressor(format=lzma.FORMAT_XZ)
    else:  # method == 14
        import lzma

        if len(raw) < 9:
            raise ValueError(f"zip: member {name!r} LZMA header truncated")
        _version, props_size = struct.unpack_from("<HH", raw, 0)
        if props_size != 5 or 4 + props_size > len(raw):
            raise ValueError(
                f"zip: member {name!r} LZMA properties size {props_size} != 5"
            )
        pb_lp_lc, dict_size = raw[4], struct.unpack_from("<I", raw, 5)[0]
        if pb_lp_lc >= 9 * 5 * 5:
            raise ValueError(f"zip: member {name!r} bad LZMA properties byte")
        lc, rest = pb_lp_lc % 9, pb_lp_lc // 9
        lp, pb = rest % 5, rest // 5
        # the dictionary buffer is allocated up front: clamp a crafted
        # multi-GiB dict_size to what the declared output can ever
        # reference (back-references never reach past the output size)
        d = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[{
                "id": lzma.FILTER_LZMA1,
                "lc": lc, "lp": lp, "pb": pb,
                "dict_size": max(4096, min(dict_size, max(size, 4096))),
            }],
        )
        raw = raw[9:]
    try:
        body = d.decompress(raw, size + 1)
        # a no-EOS LZMA stream (flag bit 1 unset) ends exactly at the
        # declared size; further calls would block on needs_input
        while len(body) <= size and not getattr(d, "eof", True) and not getattr(
            d, "needs_input", True
        ):
            body += d.decompress(b"", size + 1 - len(body))
    except Exception as exc:
        raise ValueError(f"zip: member {name!r} corrupt stream: {exc}") from None
    if len(body) > size:
        raise ValueError(f"zip: member {name!r} inflates past its declared size")
    if method == 8:
        if not d.eof:
            raise ValueError(f"zip: member {name!r} deflate stream truncated")
        if d.unused_data:
            raise ValueError(
                f"zip: member {name!r} trailing bytes inside its csize span"
            )
    elif method in (12, 95):
        if not d.eof:
            raise ValueError(
                f"zip: member {name!r} "
                f"{'bzip2' if method == 12 else 'xz'} stream truncated"
            )
        if d.unused_data:
            raise ValueError(
                f"zip: member {name!r} trailing bytes inside its csize span"
            )
    else:
        # LZMA: with EOS, eof is set and unused_data must be empty; a
        # no-EOS stream simply ends at size (the size-mismatch check
        # below the call is the integrity hook, plus the CRC)
        if d.eof and d.unused_data:
            raise ValueError(
                f"zip: member {name!r} trailing bytes inside its csize span"
            )
    return body


def iter_zip_members(b: bytes) -> Iterator[dict]:
    """Central-directory walk: yields ``name method size csize crc32
    offset body`` per member, with the CRC of every decompressed body
    verified.  Raises on a missing/ambiguous EOCD, entry-count or
    signature mismatches, inconsistent zip64 records, and unsupported
    methods.  Streaming form (round-15 memory-shape probe): one member's
    decompressed body is live at a time; the central-directory-consumed
    strictness check runs at exhaustion."""
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
    if (n_disk not in (0, 0xFFFF)) or (cd_start_disk not in (0, 0xFFFF)):
        raise ValueError("zip: multi-disk archives are not supported")
    # zip64: masked EOCD fields (or a locator abutting the EOCD) hand the
    # real values to the EOCD64 record.  The locator MUST directly
    # precede the EOCD and the EOCD64 record must abut its locator —
    # strict layout per APPNOTE 4.3.14/4.3.15, which also keeps the
    # comment-consistency scan above authoritative.
    cd_end_bound = at
    # a masked DISK field is a zip64 marker too (round-13 review: a
    # stripped multi-disk zip64 part must fail closed, not walk as a
    # complete single-disk archive)
    masked = (
        0xFFFF in (n_here, n_total, n_disk, cd_start_disk)
        or 0xFFFFFFFF in (cd_size, cd_off)
    )
    has_loc = at >= 20 and b[at - 20 : at - 16] == _EOCD64_LOC_SIG
    if has_loc and not masked:
        # a valid non-zip64 archive whose bytes before the EOCD (e.g.
        # the last central-directory file comment) happen to end with
        # the locator signature must not be routed into the zip64 path.
        # With no masked field vouching for zip64, commit only when the
        # 16 bytes after the signature look like a locator at all —
        # single-disk fields, or an offset that lands on a real EOCD64
        # record.  A GENUINELY corrupt locator (plausible fields, bad
        # offset) still fails closed below.
        loc_disk, probe_off, n_disks = struct.unpack_from("<IQI", b, at - 16)
        plausible = loc_disk == 0 and n_disks == 1
        points_at_record = (
            probe_off + 4 <= at - 20 and b[probe_off : probe_off + 4] == _EOCD64_SIG
        )
        if not plausible and not points_at_record:
            has_loc = False
    if masked or has_loc:
        if not has_loc:
            raise ValueError("zip: zip64 markers in the EOCD but no EOCD64 locator")
        loc_disk, z64_off, n_disks = struct.unpack_from("<IQI", b, at - 16)
        if loc_disk or n_disks != 1:
            raise ValueError("zip: multi-disk zip64 archives are not supported")
        if z64_off + 56 > at - 20 or b[z64_off : z64_off + 4] != _EOCD64_SIG:
            raise ValueError("zip: EOCD64 record missing at the locator offset")
        (
            reclen, _zver_made, _zver_need, z_disk, z_cd_disk,
            z_here, z_total, z_cd_size, z_cd_off,
        ) = struct.unpack_from("<QHHIIQQQQ", b, z64_off + 4)
        if reclen < 44:
            raise ValueError("zip: EOCD64 record shorter than its fixed fields")
        if z64_off + 12 + reclen != at - 20:
            raise ValueError("zip: EOCD64 record does not abut its locator")
        if z_disk or z_cd_disk:
            raise ValueError("zip: multi-disk zip64 archives are not supported")
        # unmasked EOCD fields must agree with the EOCD64 record
        for small, mask, big, label in (
            (n_here, 0xFFFF, z_here, "entry count"),
            (n_total, 0xFFFF, z_total, "total entry count"),
            (cd_size, 0xFFFFFFFF, z_cd_size, "directory size"),
            (cd_off, 0xFFFFFFFF, z_cd_off, "directory offset"),
        ):
            if small != mask and small != big:
                raise ValueError(f"zip: EOCD {label} disagrees with the EOCD64 record")
        n_here, n_total, cd_size, cd_off = z_here, z_total, z_cd_size, z_cd_off
        cd_end_bound = z64_off
    if n_here != n_total:
        raise ValueError("zip: split archives are not supported")
    if cd_off + cd_size > cd_end_bound:
        raise ValueError("zip: central directory overruns the EOCD")
    off = cd_off
    total_out = 0
    for _ in range(n_total):
        if off + 46 > len(b):
            raise ValueError(f"zip: truncated central-directory entry at byte {off}")
        if b[off : off + 4] != _CD_SIG:
            raise ValueError(f"zip: bad central-directory signature at byte {off}")
        (
            _ver_made, _ver_need, flags, method, _time, _date, crc, csize, size,
            name_len, extra_len, comment_len2, disk, _iattr, _eattr, lho,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", b, off + 4)
        if off + 46 + name_len + extra_len > len(b):
            raise ValueError(f"zip: central-directory entry out of bounds at byte {off}")
        # APPNOTE APPENDIX D: names are CP437 unless general-purpose bit
        # 11 (the EFS flag) declares UTF-8 — matching stdlib zipfile
        name_raw = b[off + 46 : off + 46 + name_len]
        if flags & 0x800:
            name = name_raw.decode("utf-8", "surrogateescape")
        else:
            name = name_raw.decode("cp437")
        # zip64 per-entry: masked fields live in the 0x0001 extra record,
        # in the spec's fixed order, only the masked ones present
        need = []
        if size == 0xFFFFFFFF:
            need.append("size")
        if csize == 0xFFFFFFFF:
            need.append("csize")
        if lho == 0xFFFFFFFF:
            need.append("lho")
        if disk == 0xFFFF:
            need.append("disk")
        if need:
            extra = b[off + 46 + name_len : off + 46 + name_len + extra_len]
            vals = _zip64_extra(extra, need, name)
            size = vals.get("size", size)
            csize = vals.get("csize", csize)
            lho = vals.get("lho", lho)
            disk = vals.get("disk", disk)
        if disk:
            raise ValueError(f"zip: member {name!r} on a non-zero disk")
        off += 46 + name_len + extra_len + comment_len2
        if flags & 0x1:
            raise ValueError(f"zip: member {name!r} is encrypted")
        if method not in (0, 8, 12, 14, 93, 95):
            raise ValueError(f"zip: member {name!r} method {method} unsupported")
        if lho + 30 > len(b) or b[lho : lho + 4] != _LOCAL_SIG:
            raise ValueError(f"zip: member {name!r} local header missing")
        lname_len, lextra_len = struct.unpack_from("<HH", b, lho + 26)
        data_at = lho + 30 + lname_len + lextra_len
        if data_at + csize > len(b):
            raise ValueError(f"zip: member {name!r} data out of bounds")
        # absolute ceilings (round-13 review): the declared size bounds
        # the inflate below, but it is attacker-controlled — an honest-
        # declaration bomb must hit these, not executor memory
        if size > MAX_ZIP_MEMBER_BYTES:
            raise ValueError(
                f"zip: member {name!r} declares {size} bytes, past the "
                f"{MAX_ZIP_MEMBER_BYTES}-byte member ceiling"
            )
        total_out += size
        if total_out > MAX_ZIP_TOTAL_BYTES:
            raise ValueError(
                f"zip: archive inflates past the {MAX_ZIP_TOTAL_BYTES}-byte "
                "per-archive ceiling"
            )
        raw = b[data_at : data_at + csize]
        body = _decompress_member(raw, size, method, name)
        if len(body) != size:
            raise ValueError(f"zip: member {name!r} size mismatch")
        if zlib.crc32(body) & 0xFFFFFFFF != crc:
            raise ValueError(f"zip: member {name!r} CRC mismatch")
        yield {
            "name": name, "method": method, "size": size,
            "csize": csize, "crc32": crc, "offset": lho, "body": body,
        }
    if off != cd_off + cd_size:
        raise ValueError(
            f"zip: central directory consumed {off - cd_off} bytes but the "
            f"EOCD declares {cd_size}"
        )


def parse_zip_members(b: bytes) -> list[dict]:
    """List form of :func:`iter_zip_members` (tests / small archives —
    atomic: raises before returning anything on a malformed archive)."""
    return list(iter_zip_members(b))


def write_zip(
    members: list[tuple[str, bytes]],
    deflate: bool = True,
    zip64: bool = False,
    method: int | None = None,
) -> bytes:
    """Spec-shaped ZIP writer (the fixture twin of
    :func:`parse_zip_members`).

    ``zip64=True`` forces the zip64 format everywhere — masked
    size/csize/offset fields with 0x0001 extra records per entry plus the
    EOCD64 record and locator — which is spec-legal at any size and lets
    a small fixture exercise the 64-bit walk.  The EOCD64/locator pair is
    also emitted automatically whenever a count or offset overflows its
    EOCD field (>= 65535 members, >= 4 GiB offsets).  A single >= 4 GiB
    member BODY would additionally need local-header zip64 extras this
    in-memory fixture writer cannot meaningfully test, so it raises
    cleanly instead."""
    out, cd = bytearray(), bytearray()
    for name, body in members:
        nb = name.encode("utf-8")
        if len(body) >= 0xFFFFFFFF:
            raise ValueError(
                "write_zip: >= 4 GiB member bodies need local-header zip64 "
                "extras, which this fixture writer does not emit"
            )
        crc = zlib.crc32(body) & 0xFFFFFFFF
        m = method if method is not None else (8 if deflate else 0)
        if m == 8:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            raw = co.compress(body) + co.flush()
        elif m == 93:  # zstd, APPNOTE 6.3.8+ (modern 7-Zip/libarchive emit it)
            raw = native_codecs.zstd_compress(body)
        elif m == 95:  # XZ
            import lzma

            raw = lzma.compress(body, format=lzma.FORMAT_XZ)
        elif m == 0:
            raw = body
        else:
            raise ValueError(f"write_zip: unsupported method {m}")
        if len(raw) >= 0xFFFFFFFF:  # deflate can EXPAND past the body guard
            raise ValueError(
                "write_zip: >= 4 GiB member bodies need local-header zip64 "
                "extras, which this fixture writer does not emit"
            )
        lho = len(out)
        out += _LOCAL_SIG + struct.pack(
            "<HHHHHIIIHH", 20, 0x800, m, 0, 0, crc, len(raw), len(body),
            len(nb), 0,  # 0x800: names are UTF-8 (EFS flag, APPENDIX D)
        )
        out += nb + raw
        if zip64 or len(raw) >= 0xFFFFFFFF or len(body) >= 0xFFFFFFFF or lho >= 0xFFFFFFFF:
            extra = struct.pack("<HHQQQ", 0x0001, 24, len(body), len(raw), lho)
            cd += _CD_SIG + struct.pack(
                "<HHHHHHIIIHHHHHII", 45, 45, 0x800, m, 0, 0, crc,
                0xFFFFFFFF, 0xFFFFFFFF, len(nb), len(extra), 0, 0, 0, 0,
                0xFFFFFFFF,
            )
            cd += nb + extra
        else:
            cd += _CD_SIG + struct.pack(
                "<HHHHHHIIIHHHHHII", 20, 20, 0x800, m, 0, 0, crc, len(raw),
                len(body), len(nb), 0, 0, 0, 0, 0, lho,
            )
            cd += nb
    cd_off = len(out)
    out += cd
    n = len(members)
    if zip64 or n >= 0xFFFF or cd_off >= 0xFFFFFFFF or len(cd) >= 0xFFFFFFFF:
        z64_off = len(out)
        out += _EOCD64_SIG + struct.pack(
            "<QHHIIQQQQ", 44, 45, 45, 0, 0, n, n, len(cd), cd_off
        )
        out += _EOCD64_LOC_SIG + struct.pack("<IQI", 0, z64_off, 1)
        out += _EOCD_SIG + struct.pack(
            "<HHHHIIH", 0, 0, min(n, 0xFFFF), min(n, 0xFFFF),
            min(len(cd), 0xFFFFFFFF), min(cd_off, 0xFFFFFFFF), 0,
        )
    else:
        out += _EOCD_SIG + struct.pack(
            "<HHHHIIH", 0, 0, n, n, len(cd), cd_off, 0
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


def _tar_num(field: bytes) -> int:
    """Numeric header field: octal per POSIX, or GNU base-256 (high bit
    of the first byte set, remaining bits a big-endian binary value) for
    values the octal field cannot hold (>= 8 GiB sizes)."""
    if field and field[0] & 0x80:
        val = field[0] & 0x7F
        for byte in field[1:]:
            val = (val << 8) | byte
        return val
    return _tar_octal(field)


def _pax_record_pairs(data: bytes, at_byte: int) -> list[tuple[str, str]]:
    """Strict pax extended-header record parse per POSIX.1-2001:
    ``"%d %s=%s\\n" % (length, keyword, value)`` where *length* counts
    the ENTIRE record including its own digits, the space, and the
    trailing newline.  Returns the records IN ORDER with repeats kept —
    the GNU sparse 0.0 format encodes its map as repeated
    ``GNU.sparse.offset``/``numbytes`` keys, which a dict would swallow.
    Any malformed record raises."""
    recs: list[tuple[str, str]] = []
    at = 0
    while at < len(data):
        sp = data.find(b" ", at, at + 20)
        if sp < 0 or not data[at:sp].isdigit():
            raise ValueError(f"tar: bad pax record length at byte {at_byte + at}")
        reclen = int(data[at:sp])
        if reclen < sp - at + 3 or at + reclen > len(data):
            raise ValueError(
                f"tar: pax record length {reclen} out of bounds at byte "
                f"{at_byte + at}"
            )
        if data[at + reclen - 1 : at + reclen] != b"\n":
            raise ValueError(
                f"tar: pax record missing trailing newline at byte {at_byte + at}"
            )
        body = data[sp + 1 : at + reclen - 1]
        eq = body.find(b"=")
        if eq < 0:
            raise ValueError(f"tar: pax record without '=' at byte {at_byte + at}")
        try:
            key = body[:eq].decode("utf-8")
        except UnicodeDecodeError:
            raise ValueError(
                f"tar: pax keyword is not UTF-8 at byte {at_byte + at}"
            ) from None
        recs.append((key, body[eq + 1 :].decode("utf-8", "surrogateescape")))
        at += reclen
    return recs


def _pax_records(data: bytes, at_byte: int) -> dict[str, str]:
    """Dict view of :func:`_pax_record_pairs` — later records override
    earlier ones (the spec's stated precedence)."""
    return dict(_pax_record_pairs(data, at_byte))


def _gnu_longdata(data: bytes, size: int, flag: bytes, off: int) -> str:
    """GNU 'L'/'K' payload: the long name, NUL-terminated; anything after
    the first NUL must be zero padding."""
    if size < 1:
        raise ValueError(f"tar: empty GNU {flag!r} long-name block at byte {off}")
    raw = data[:size]
    nul = raw.find(b"\x00")
    if nul < 0:
        nul = size  # GNU tar always NUL-terminates, but accept a full field
    elif any(raw[nul:]):
        raise ValueError(
            f"tar: junk after the NUL in GNU {flag!r} long name at byte {off}"
        )
    return raw[:nul].decode("utf-8", "surrogateescape")


# Sparse reconstruction ceiling: a sparse member IS a declared-size
# bomb vector (a 4 KiB data run can declare a terabyte hole), so the
# reconstructed real size hits the same per-member bound the zip reader
# enforces, never executor memory.
MAX_SPARSE_MEMBER_BYTES = 1 << 30


def _sparse_expand(frag, entries, realsize: int, name: str) -> bytearray:
    """Reassemble a sparse member: place each packed data fragment at its
    mapped offset in a zero-filled buffer of the member's real size.

    Fragment CONSUMPTION is per-fragment whole 512-byte blocks — the
    defining implementation's reader semantics, established empirically
    against GNU tar 1.34 (its extractor sources fragment i+1 from the
    block boundary after fragment i).  GNU's own maps are always
    filesystem-extent-granular (every entry a 512 multiple), so block
    and contiguous reads coincide on every GNU-produced archive; the
    distinction only bites foreign producers, and mirroring the GNU
    reader is the interoperable choice.  Strict: entries in-bounds,
    inter-fragment block padding zero, nothing non-zero past the map
    (a zero-length trailing entry — GNU's explicit end-of-file-hole
    marker — is fine)."""
    if realsize > MAX_SPARSE_MEMBER_BYTES:
        raise ValueError(
            f"tar: sparse member {name!r} declares {realsize} real bytes, "
            f"over the {MAX_SPARSE_MEMBER_BYTES}-byte member ceiling"
        )
    out = bytearray(realsize)
    pos = 0
    for o, n in entries:
        if o < 0 or n < 0 or o + n > realsize:
            raise ValueError(
                f"tar: sparse map entry ({o}, {n}) outside member {name!r} "
                f"real size {realsize}"
            )
        if pos + n > len(frag):
            raise ValueError(
                f"tar: sparse member {name!r} packed data shorter than its map"
            )
        out[o : o + n] = frag[pos : pos + n]
        step = -(-n // 512) * 512
        if any(frag[pos + n : min(pos + step, len(frag))]):
            raise ValueError(
                f"tar: sparse member {name!r} has non-zero fragment padding"
            )
        pos += step
    if any(frag[min(pos, len(frag)) :]):
        raise ValueError(
            f"tar: sparse member {name!r} has non-zero packed data past its map"
        )
    return out


def _old_gnu_sparse(b, off: int, hdr, size: int, name: str):
    """Old-GNU sparse member (typeflag 'S'): 4 map entries inline at
    header offset 386, ``isextended`` at 482 chaining 512-byte
    extension blocks of 21 entries each (NOT checksummed headers —
    they sit between the header and the packed data), real size at
    483.  Returns ``(body, realsize, data_at)`` with ``body`` the
    reconstructed real content."""
    if hdr[257:265] != b"ustar  \x00":
        raise ValueError(
            f"tar: sparse member {name!r} without the old-GNU magic"
        )
    entries: list[tuple[int, int]] = []

    def take(raw) -> bool:
        """Parse 24-byte map slots; False when the terminator slot hit."""
        for at in range(0, len(raw) - 23, 24):
            if raw[at] == 0:  # empty slot terminates the map
                return False
            entries.append(
                (_tar_num(raw[at : at + 12]), _tar_num(raw[at + 12 : at + 24]))
            )
        return True

    more = take(hdr[386:482]) and hdr[482] != 0
    realsize = _tar_num(hdr[483:495])
    data_at = off + 512
    while more:
        if data_at + 512 > len(b):
            raise ValueError(
                f"tar: sparse member {name!r} extension block out of bounds"
            )
        blk = b[data_at : data_at + 512]
        data_at += 512
        more = take(blk[:504]) and blk[504] != 0
    if data_at + size > len(b):
        raise ValueError(f"tar: sparse member {name!r} data out of bounds")
    body = _sparse_expand(b[data_at : data_at + size], entries, realsize, name)
    return body, realsize, data_at


def _pax_sparse_member(eff: dict, pairs, data, name: str):
    """PAX-format GNU sparse member (typeflag '0' + ``GNU.sparse.*``
    records): all three wire formats —

    * **1.0** (``GNU.sparse.major=1``): the map rides at the FRONT of
      the data run as newline-terminated decimals (count, then
      offset/size pairs), padded to a 512 boundary; real size in
      ``GNU.sparse.realsize``;
    * **0.1**: comma-separated ``GNU.sparse.map``;
    * **0.0**: repeated ``GNU.sparse.offset``/``numbytes`` record pairs
      (order-preserved via :func:`_pax_record_pairs`).

    Returns ``(body, realsize, real_name)`` — ``GNU.sparse.name``
    carries the true member name (the header name is mangled, e.g.
    ``GNUSparseFile.<pid>/<name>``)."""
    real_name = eff.get("GNU.sparse.name", name)

    def intrec(key: str) -> int:
        val = eff.get(key, "")
        if not val.isdigit():
            raise ValueError(
                f"tar: sparse member {real_name!r}: bad {key} record {val!r}"
            )
        return int(val)

    if eff.get("GNU.sparse.major") == "1":
        if eff.get("GNU.sparse.minor") not in (None, "0"):
            raise ValueError(
                f"tar: sparse member {real_name!r}: unknown GNU.sparse "
                f"version 1.{eff.get('GNU.sparse.minor')}"
            )
        realsize = intrec("GNU.sparse.realsize")
        at = 0

        def rdnum() -> int:
            nonlocal at
            nl = data.find(b"\n", at, at + 21)
            if nl < 0 or not data[at:nl].isdigit():
                raise ValueError(
                    f"tar: sparse member {real_name!r}: malformed 1.0 map"
                )
            v = int(data[at:nl])
            at = nl + 1
            return v

        count = rdnum()
        if count > (len(data) + 1) // 4:  # each entry needs >= 4 bytes
            raise ValueError(
                f"tar: sparse member {real_name!r}: 1.0 map count {count} "
                "larger than the data run could hold"
            )
        entries = [(rdnum(), rdnum()) for _ in range(count)]
        frag_at = (at + 511) // 512 * 512
        if any(data[at:frag_at]):
            raise ValueError(
                f"tar: sparse member {real_name!r}: non-zero 1.0 map padding"
            )
        frag = data[frag_at:]
    else:
        if "GNU.sparse.map" in eff:  # 0.1
            parts = eff["GNU.sparse.map"].split(",")
            if len(parts) % 2:
                raise ValueError(
                    f"tar: sparse member {real_name!r}: odd 0.1 map length"
                )
            if not all(p.isdigit() for p in parts):
                raise ValueError(
                    f"tar: sparse member {real_name!r}: non-numeric 0.1 map"
                )
            entries = [
                (int(parts[i]), int(parts[i + 1])) for i in range(0, len(parts), 2)
            ]
        else:  # 0.0: repeated offset/numbytes pairs, in record order
            numblocks = intrec("GNU.sparse.numblocks")
            entries = []
            pend_off: int | None = None
            for key, val in pairs:
                if key == "GNU.sparse.offset":
                    if pend_off is not None or not val.isdigit():
                        raise ValueError(
                            f"tar: sparse member {real_name!r}: malformed 0.0 map"
                        )
                    pend_off = int(val)
                elif key == "GNU.sparse.numbytes":
                    if pend_off is None or not val.isdigit():
                        raise ValueError(
                            f"tar: sparse member {real_name!r}: malformed 0.0 map"
                        )
                    entries.append((pend_off, int(val)))
                    pend_off = None
            if pend_off is not None or len(entries) != numblocks:
                raise ValueError(
                    f"tar: sparse member {real_name!r}: 0.0 map has "
                    f"{len(entries)} entries, numblocks says {numblocks}"
                )
        realsize = intrec("GNU.sparse.size")
        frag = data
    body = _sparse_expand(frag, entries, realsize, real_name)
    return body, realsize, real_name


def iter_tar_members(b: bytes | bytearray) -> Iterator[dict]:
    """POSIX ustar + pax walk: 512-byte blocks, octal (or GNU base-256)
    size fields, per-header CHECKSUM verification.  Long names arrive
    three ways and all are honored with the POSIX precedence
    (pax ``x`` path > GNU ``L`` longname > pax ``g`` global path >
    ustar prefix+name): pax extended headers (typeflag ``x`` per-file /
    ``g`` global, strict ``"len key=value\\n"`` records), GNU longname /
    longlink blocks (``L``/``K``), and the ustar 155-byte prefix field.
    A pax ``size`` record overrides the header size for the following
    member's data run.  GNU SPARSE members reassemble to their real
    content (round 16): old-GNU typeflag ``S`` (inline + chained
    extension map blocks) and all three pax formats (0.0 repeated
    records, 0.1 ``GNU.sparse.map``, 1.0 map-in-data), real size
    capped by ``MAX_SPARSE_MEMBER_BYTES`` — a sparse map is a
    declared-size bomb vector.  The two-zero-block terminator is required (a tar
    that just stops is truncated), only zero padding may follow it —
    trailing garbage (or a second concatenated archive, which would
    otherwise silently lose ALL its members) raises — and an extension
    header with no following file header is a dangling error, never
    silently dropped."""
    off = 0
    g_over: dict[str, str] = {}  # pax 'g' globals, persist until overridden
    x_over: dict[str, str] | None = None  # pax 'x', applies to next file only
    x_pairs: list[tuple[str, str]] = []  # ordered 'x' records (sparse 0.0 map)
    longname: str | None = None  # GNU 'L', next file only
    longlink: str | None = None  # GNU 'K', next file only
    while True:
        if off + 512 > len(b):
            raise ValueError("tar: truncated header block")
        hdr = b[off : off + 512]
        if hdr == bytes(512):
            if x_over is not None or longname is not None or longlink is not None:
                raise ValueError(
                    "tar: dangling pax/GNU extension header before the terminator"
                )
            if b[off + 512 : off + 1024] != bytes(512):
                raise ValueError("tar: missing second terminator block")
            if any(b[off + 1024 :]):
                raise ValueError(
                    "tar: non-zero bytes after the terminator (trailing "
                    "garbage or a concatenated archive)"
                )
            break

        stored = _tar_octal(hdr[148:156])
        summed = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != summed:
            raise ValueError(f"tar: header checksum mismatch at byte {off}")
        typeflag = hdr[156:157]
        size = _tar_num(hdr[124:136])
        data_at = off + 512
        if data_at + size > len(b):
            raise ValueError(f"tar: member data out of bounds at byte {off}")
        data = b[data_at : data_at + size]

        if typeflag in (b"M", b"D"):
            # data-bearing GNU formats this walk does not reassemble:
            # multi-volume continuations ('M', the member's data lives
            # across files) and dump directories ('D').  Silently
            # skipping them would drop member CONTENT — fail fast at a
            # declared seam instead.  (Sparse 'S' members reassemble
            # below as of round 16.)
            raise ValueError(
                f"tar: GNU typeflag {typeflag!r} (multi-volume/"
                "dumpdir) is a declared seam"
            )
        if typeflag in (b"x", b"g"):
            pairs = _pax_record_pairs(data, data_at)
            if typeflag == b"g":
                g_over.update(dict(pairs))
            else:
                if x_over is not None:
                    raise ValueError(f"tar: consecutive pax 'x' headers at byte {off}")
                x_over = dict(pairs)
                x_pairs = pairs
        elif typeflag in (b"L", b"K"):
            val = _gnu_longdata(data, size, typeflag, data_at)
            if typeflag == b"L":
                if longname is not None:
                    raise ValueError(
                        f"tar: consecutive GNU 'L' longname blocks at byte {off}"
                    )
                longname = val
            else:
                if longlink is not None:
                    raise ValueError(
                        f"tar: consecutive GNU 'K' longlink blocks at byte {off}"
                    )
                longlink = val
        else:
            name = hdr[:100].split(b"\x00")[0].decode("utf-8", "surrogateescape")
            # ustar prefix field: a 155-byte path prefix joined with '/'.
            # Gated on the exact POSIX magic+version — old-GNU headers
            # ('ustar  ') store atime/ctime at offset 345, and honoring
            # the prefix there would silently prepend octal digits to
            # member names (e.g. tar --incremental output)
            if hdr[257:263] == b"ustar\x00":
                prefix = hdr[345:500].split(b"\x00")[0].decode(
                    "utf-8", "surrogateescape"
                )
                if prefix:
                    name = f"{prefix}/{name}"
            if "path" in g_over:
                name = g_over["path"]
            if longname is not None:
                name = longname
            if x_over is not None and "path" in x_over:
                name = x_over["path"]
            eff = dict(g_over)
            if x_over is not None:
                eff.update(x_over)
            if typeflag == b"S":
                # old-GNU sparse: reassemble the real content (round 16)
                body, realsize, sp_data_at = _old_gnu_sparse(b, off, hdr, size, name)
                yield {"name": name, "size": realsize, "offset": off, "body": body}
                x_over, longname, longlink = None, None, None
                x_pairs = []
                off = sp_data_at + (size + 511) // 512 * 512
                continue
            if any(k.startswith("GNU.sparse.") for k in eff):
                # pax-format sparse member: typeflag '0' with
                # GNU.sparse.* records; the data run holds packed
                # fragments (1.0: prefixed by the map) — reassemble
                # the real content (round 16)
                if "size" in eff and eff["size"].isdigit():
                    size = int(eff["size"])
                    if data_at + size > len(b):
                        raise ValueError(
                            f"tar: member {name!r} pax-size data out of bounds"
                        )
                    data = b[data_at : data_at + size]
                body, realsize, real_name = _pax_sparse_member(
                    eff, x_pairs, data, name
                )
                yield {
                    "name": real_name,
                    "size": realsize,
                    "offset": off,
                    "body": body,
                }
                x_over, longname, longlink = None, None, None
                x_pairs = []
                off = data_at + (size + 511) // 512 * 512
                continue
            if "size" in eff:
                if not eff["size"].isdigit():
                    raise ValueError(
                        f"tar: non-numeric pax size record {eff['size']!r}"
                    )
                size = int(eff["size"])
                if data_at + size > len(b):
                    raise ValueError(
                        f"tar: member {name!r} pax-size data out of bounds"
                    )
                data = b[data_at : data_at + size]
            # '7' (contiguous file) is a regular file per POSIX: "most
            # implementations should treat this type as a regular file"
            if typeflag in (b"0", b"\x00", b"7"):
                yield {"name": name, "size": size, "offset": off, "body": data}
            x_over, longname, longlink = None, None, None
            x_pairs = []
        off = data_at + (size + 511) // 512 * 512


def parse_tar_members(b: bytes | bytearray) -> list[dict]:
    """List form of :func:`iter_tar_members` (tests / small archives —
    atomic: raises before returning anything on a malformed archive).

    Member ``body`` values mirror the input buffer type: ``bytes`` for
    plain tars, ``bytearray`` slices when the envelope came through
    :func:`maybe_decompress_tar` — consumers needing hashable bodies
    must ``bytes()`` them."""
    return list(iter_tar_members(b))


def _tar_block(name: bytes, size: int, typeflag: int) -> bytearray:
    hdr = bytearray(512)
    hdr[0 : len(name)] = name
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"
    hdr[116:124] = b"0000000\x00"
    hdr[124:136] = f"{size:011o}\x00".encode()
    hdr[136:148] = b"00000000000\x00"
    hdr[156] = typeflag
    hdr[257:263] = b"ustar\x00"
    hdr[263:265] = b"00"
    hdr[148:156] = b" " * 8
    hdr[148:156] = f"{sum(hdr):06o}\x00 ".encode()
    return hdr


def _pad512(body: bytes) -> bytes:
    return body + bytes((512 - len(body) % 512) % 512)


def pax_record(key: str, value: str) -> bytes:
    """One POSIX.1-2001 extended-header record; the length prefix counts
    itself, so the digit width is found by fixpoint."""
    body = f" {key}={value}\n".encode("utf-8")
    digits = 1
    while len(str(len(body) + digits)) > digits:
        digits += 1
    return str(len(body) + digits).encode() + body


def write_tar(
    members: list[tuple[str, bytes]],
    long_names: str = "pax",
    sparse: str | None = None,
) -> bytes:
    """ustar/pax writer (fixture twin of :func:`parse_tar_members`).

    Names longer than the 100-byte ustar field are carried per
    ``long_names``: ``"pax"`` (POSIX.1-2001 ``x`` extended header with a
    ``path`` record — what GNU/BSD tar emit by default), ``"gnu"``
    (old-GNU ``L`` longname block), or ``"error"`` (raise, the pre-pax
    strict-ustar behavior).

    ``sparse`` writes every member in a GNU SPARSE representation whose
    reassembly equals the body exactly (fragments split mid-body, no
    holes — spec-valid and what the reader must reproduce byte-for-byte):
    ``"gnu"`` = old-GNU typeflag ``S`` inline map, ``"pax10"`` = pax
    1.0 with the decimal map leading the data run.  Fixture use: it
    puts the round-16 sparse reassembly path under the oracle-gated
    archive queries without external tooling."""
    if long_names not in ("pax", "gnu", "error"):
        raise ValueError(f"tar: unknown long_names mode {long_names!r}")
    if sparse not in (None, "gnu", "pax10"):
        raise ValueError(f"tar: unknown sparse mode {sparse!r}")
    out = bytearray()
    for i, (name, body) in enumerate(members):
        nb = name.encode("utf-8")
        if len(nb) > 100 and sparse != "pax10":
            # (pax-1.0 sparse members skip this: GNU.sparse.name carries
            # the full name inside the ONE x-header below — a second
            # consecutive 'x' block would be malformed)
            if long_names == "error":
                raise ValueError("tar: name longer than the ustar field")
            if long_names == "pax":
                recs = pax_record("path", name)
                out += _tar_block(f"PaxHeaders.0/{i}".encode(), len(recs), ord("x"))
                out += _pad512(recs)
            else:
                out += _tar_block(b"././@LongLink", len(nb) + 1, ord("L"))
                out += _pad512(nb + b"\x00")
            nb = nb[:100]
        if sparse is None:
            out += _tar_block(nb, len(body), 0x30)
            out += _pad512(body)
            continue
        # non-final fragments must be 512 multiples: GNU's reader sources
        # each fragment from a block boundary (see _sparse_expand)
        split = (len(body) // 2 // 512) * 512
        entries = (
            [(0, split), (split, len(body) - split)] if split else [(0, len(body))]
        )
        if sparse == "gnu":
            hdr = _tar_block(nb, len(body), ord("S"))
            hdr[257:265] = b"ustar  \x00"  # old-GNU magic for 'S'
            at = 386
            for o, n in entries:
                hdr[at : at + 12] = f"{o:011o}\x00".encode()
                hdr[at + 12 : at + 24] = f"{n:011o}\x00".encode()
                at += 24
            hdr[483:495] = f"{len(body):011o}\x00".encode()
            hdr[148:156] = b" " * 8
            hdr[148:156] = f"{sum(hdr):06o}\x00 ".encode()
            out += hdr
            out += _pad512(body)
        else:  # pax 1.0
            map_txt = f"{len(entries)}\n".encode() + b"".join(
                f"{o}\n{n}\n".encode() for o, n in entries
            )
            run = _pad512(map_txt) + body
            recs = (
                pax_record("GNU.sparse.major", "1")
                + pax_record("GNU.sparse.minor", "0")
                + pax_record("GNU.sparse.name", name)
                + pax_record("GNU.sparse.realsize", str(len(body)))
                + pax_record("size", str(len(run)))
            )
            out += _tar_block(f"PaxHeaders.0/sp{i}".encode(), len(recs), ord("x"))
            out += _pad512(recs)
            out += _tar_block(b"GNUSparseFile.0/" + nb[:84], len(run), 0x30)
            out += _pad512(run)
    out += bytes(1024)
    return bytes(out)


ARCHIVE_SCHEMA = (
    "path string, member string, offset bigint, size bigint, body binary"
)

# Compressed-tar ceilings: like .warc.gz (see sources/warc.py), a
# compressed tar declares no trustworthy output size up front, so a
# bomb must hit a ceiling instead of executor memory.  4 GiB matches
# the WARC per-file bound; a legitimate shard archive sits far below.
MAX_TAR_BYTES = 4 << 30
_INFLATE_CHUNK = 1 << 20


def _sniff_tar_codec(b: bytes):
    """Return ``(kind, make_decompressor)`` for a compressed-tar
    envelope, or ``(None, None)`` for plain bytes."""
    if b[:2] == b"\x1f\x8b":
        return "gz", lambda: zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
    if b[:3] == b"BZh":
        import bz2

        return "bz2", bz2.BZ2Decompressor
    if b[:6] == b"\xfd7zXZ\x00":
        import lzma

        return "xz", lambda: lzma.LZMADecompressor(format=lzma.FORMAT_XZ)
    probe = b[:4]
    if native_codecs._is_skippable_magic(probe):
        # the 16 skippable-frame magics are SHARED between the zstd and
        # lz4 frame specs, so a leading skippable frame says nothing
        # about the codec (round-14 review: dispatching it to zstd
        # rejected valid skippable-prefixed .tar.lz4) — walk past the
        # skippables and dispatch on the first REGULAR frame magic
        pos = 0
        while (
            len(b) - pos >= 8
            and native_codecs._is_skippable_magic(b[pos : pos + 4])
        ):
            nxt = pos + 8 + int.from_bytes(b[pos + 4 : pos + 8], "little")
            if nxt > len(b):
                break  # truncated skippable: let the chosen codec report it
            pos = nxt
        nxt4 = b[pos : pos + 4]
        # a skippable prefix followed by neither codec's magic (e.g. a
        # download truncated inside the regular frame's magic) must NOT
        # fall through to the plain-ustar walk and die on a misleading
        # header error — keep the zstd dispatch so the codec reports
        # the actual truncation/garbage (round-14 review, 2nd pass)
        if nxt4 == native_codecs.LZ4_MAGIC or nxt4 == native_codecs.ZSTD_MAGIC:
            probe = nxt4
    if probe == native_codecs.ZSTD_MAGIC or native_codecs._is_skippable_magic(probe):
        # no stdlib zstd codec on 3.11 (compression.zstd arrives in
        # 3.14) — decode via the libzstd ctypes bridge; without the
        # library the seam raise stays (availability is environmental).
        # A skippable-only payload defaults here: both codecs decode it
        # to the same empty output.
        if not native_codecs.zstd_available():
            raise ValueError(
                "tar.zst: zstd requires the libzstd shared library "
                "(no stdlib codec; library not found)"
            )
        return "zst", native_codecs.ZstdDecompressor
    if probe == native_codecs.LZ4_MAGIC:
        if not native_codecs.lz4_available():
            raise ValueError(
                "tar.lz4: lz4 requires the liblz4 shared library "
                "(no stdlib codec; library not found)"
            )
        return "lz4", native_codecs.Lz4Decompressor
    if b[:4] == native_codecs.LZ4_LEGACY_MAGIC:
        # the pre-frame-format `lz4c` container: no length/checksum
        # framing, liblz4's frame API refuses it — fail fast with the
        # real reason instead of a ustar checksum mis-walk
        raise ValueError("tar.lz4: legacy lz4c framing is not supported")
    return None, None


def maybe_decompress_tar(b: bytes) -> bytes | bytearray:
    """Transparent .tar.gz / .tar.bz2 / .tar.xz / .tar.zst / .tar.lz4
    envelope removal, sniffed by magic (gzip ``1f 8b``, bzip2 ``BZh``,
    xz ``fd 37 7a 58 5a 00``, zstd ``28 b5 2f fd``, lz4 frame
    ``04 22 4d 18``) — the three stdlib compressions plus zstd/lz4 via
    the libzstd/liblz4 ctypes bridges (:mod:`.native_codecs`);
    ``.tar.zst`` is the default packaging for modern ML corpus drops.

    Inflation is chunked against ``MAX_TAR_BYTES`` (a compressed tar
    declares no trustworthy output size, so a bomb must hit a ceiling,
    not executor memory — same rule as the .warc.gz guard).
    Concatenated streams are decoded per each format's own spec (all
    three define the concatenation as one logical stream; gzip's pigz/
    bgzf and xz's stream padding make this routine in the wild), but
    non-stream trailing garbage raises.  A truncated stream raises.

    Returns a ``bytearray`` for decompressed envelopes (round-15 memory
    shape: accumulating chunks into one growing buffer peaks at ~1.1x
    the output where the old parts-list + join held 2x at return; the
    tar walk is bytes/bytearray-agnostic) and the input ``bytes``
    unchanged for plain tars."""
    kind, make = _sniff_tar_codec(b)
    if kind is None:
        return b
    magic = {
        "gz": b"\x1f\x8b",
        "bz2": b"BZh",
        "xz": b"\xfd7zXZ\x00",
        "zst": native_codecs.ZSTD_MAGIC,
        "lz4": native_codecs.LZ4_MAGIC,
    }[kind]
    mv = memoryview(b)
    n = len(b)
    buf = bytearray()
    total = 0
    pos = 0
    while True:  # one iteration per concatenated stream
        d = make()
        while True:  # bounded chunks within the stream; INPUT is fed in
            # bounded memoryview slices too (round-13 review: re-slicing
            # the remaining tail per output chunk was O(n^2) memcpy)
            if kind == "gz":
                feed = d.unconsumed_tail
                if not feed:
                    feed = mv[pos : pos + _INFLATE_CHUNK]
                    pos += len(feed)
            elif d.needs_input:
                feed = mv[pos : pos + _INFLATE_CHUNK]
                pos += len(feed)
            else:
                feed = b""
            try:
                chunk = d.decompress(feed, _INFLATE_CHUNK)
            except Exception as exc:
                raise ValueError(
                    f"tar.{kind}: corrupt compressed stream: {exc}"
                ) from exc
            total += len(chunk)
            if total > MAX_TAR_BYTES:
                raise ValueError(
                    f"tar.{kind}: inflates past the {MAX_TAR_BYTES}-byte ceiling"
                )
            buf += chunk
            if d.eof:
                break
            if kind == "gz":
                if not d.unconsumed_tail and pos >= n:
                    raise ValueError("tar.gz: truncated gzip stream")
            elif d.needs_input and pos >= n:
                raise ValueError(f"tar.{kind}: truncated compressed stream")
        pos -= len(d.unused_data)  # rewind to the true end of this stream
        if pos >= n:
            return buf
        if kind == "xz" and not any(mv[pos:]):
            # xz stream padding: NUL bytes in 4-byte multiples
            if (n - pos) % 4:
                raise ValueError("tar.xz: stream padding not a multiple of 4")
            return buf
        nxt = bytes(mv[pos : pos + max(len(magic), 4)])
        if kind == "zst":  # skippable frames count as concatenated members
            ok = native_codecs.is_zstd_magic(nxt)
        elif kind == "lz4":
            ok = native_codecs.is_lz4_magic(nxt)
        else:
            ok = nxt.startswith(magic)
        if not ok:
            raise ValueError(
                f"tar.{kind}: trailing bytes after the compressed stream "
                "(garbage, not a concatenated member)"
            )


def iter_tar_any(b: bytes) -> Iterator[dict]:
    """:func:`iter_tar_members` with the compressed-envelope sniff."""
    return iter_tar_members(maybe_decompress_tar(b))


def parse_tar_any(b: bytes) -> list[dict]:
    """:func:`parse_tar_members` with the compressed-envelope sniff."""
    return parse_tar_members(maybe_decompress_tar(b))


def _read_archive(spark, path: str, pattern: str, parse):
    from .warc import _frames, _scan_files  # one binaryFile scan repo-wide

    files = _scan_files(spark, path, pattern)

    def explode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                # bounded frames flushed within the archive (warc._frames):
                # member bodies never accumulate across files nor to a
                # whole archive's size — with the iterator parsers, peak
                # per task is the decompressed envelope + one frame
                yield from _frames(
                    (
                        (row["path"], m["name"], m["offset"], m["size"], m["body"])
                        for m in parse(bytes(row["content"]))
                    ),
                    ["path", "member", "offset", "size", "body"],
                )

    return files.mapInPandas(explode, schema=ARCHIVE_SCHEMA)


def read_zip(spark, path: str, pattern: str = "*.zip"):
    """ZIP archive scan → one row per member (see module docstring)."""
    return _read_archive(spark, path, pattern, iter_zip_members)


def read_tar(spark, path: str, pattern: str = "*.tar*"):
    """ustar/pax archive scan → one row per regular-file member; plain,
    ``.tar.gz``, ``.tar.bz2`` and ``.tar.xz`` envelopes are sniffed by
    magic (pass ``pattern="*.tgz"`` for that spelling)."""
    return _read_archive(spark, path, pattern, iter_tar_any)
