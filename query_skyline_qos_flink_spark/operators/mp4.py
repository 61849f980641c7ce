"""MP4 / ISO-BMFF container layer — box walk, movie/track metadata.

Beyond-the-reference multimodal surface (SURVEY.md §6), video edition:
the ISO base-media box structure as publicly specified (ISO/IEC 14496-12;
the same layout every public parser documents) — ``[size u32][type 4cc]``
boxes, 64-bit ``largesize`` escape, version-dependent ``mvhd``/``mdhd``
layouts — walked to the fields a 100 TB crawl pipeline shards and routes
video on: brand, track count and handler kinds, movie timescale, and
timescale-exact duration.  Sample data (codec bitstreams inside
``mdat``) is the same declared ``decode_fn`` seam as the audio spectral
layers (operators/mpeg_audio.py, operators/ogg.py).

Strictness contract: boxes must tile their container exactly and every
read stays in bounds, or the parser raises.  UNKNOWN box types are
skipped by size — that is the format's own forward-compatibility rule
(every real file carries boxes no parser knows), not laxity; but a
``moov`` without ``mvhd``, or a size field pointing outside the payload,
is corruption and fails fast.
"""

from __future__ import annotations

import struct


def _walk_boxes(b: bytes, start: int, end: int):
    """Yield ``(type, payload_start, payload_end)`` for each box in
    ``b[start:end]``; raises on overflow or a non-tiling layout."""
    off = start
    while off < end:
        if off + 8 > end:
            raise ValueError(f"mp4: truncated box header at byte {off}")
        size = struct.unpack_from(">I", b, off)[0]
        btype = b[off + 4 : off + 8]
        payload = off + 8
        if size == 1:
            if off + 16 > end:
                raise ValueError(f"mp4: truncated largesize at byte {off}")
            size = struct.unpack_from(">Q", b, off + 8)[0]
            payload = off + 16
        elif size == 0:  # box extends to the end of the enclosing scope
            size = end - off
        if size < payload - off or off + size > end:
            raise ValueError(f"mp4: box size out of bounds at byte {off}")
        yield btype, payload, off + size
        off += size
    if off != end:  # unreachable given the bounds check, kept for clarity
        raise ValueError("mp4: boxes do not tile their container")


def _find(b: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _walk_boxes(b, start, end):
        if t == btype:
            return s, e
    return None


def _fullbox(b: bytes, s: int, e: int):
    """(version, body_offset) of a full box spanning ``[s, e)``."""
    if s + 4 > e:
        raise ValueError("mp4: truncated full-box version/flags")
    return b[s], s + 4


def _parse_mvhd(b: bytes, s: int, e: int) -> tuple[int, int]:
    ver, o = _fullbox(b, s, e)
    if ver == 1:
        if o + 28 > e:
            raise ValueError("mp4: truncated mvhd v1")
        timescale = struct.unpack_from(">I", b, o + 16)[0]
        duration = struct.unpack_from(">Q", b, o + 20)[0]
    elif ver == 0:
        if o + 16 > e:
            raise ValueError("mp4: truncated mvhd v0")
        timescale = struct.unpack_from(">I", b, o + 8)[0]
        duration = struct.unpack_from(">I", b, o + 12)[0]
    else:
        raise ValueError(f"mp4: unknown mvhd version {ver}")
    if timescale == 0:
        raise ValueError("mp4: mvhd timescale must be positive")
    return timescale, duration


def parse_mp4_meta(b: bytes) -> dict:
    """Top-level walk: ``ftyp`` brand + ``moov`` movie header + per-track
    handler kinds.  Returns ``brand n_tracks n_video n_audio timescale
    duration_ms``."""
    brand, moov = None, None
    for t, s, e in _walk_boxes(b, 0, len(b)):
        if t == b"ftyp":
            if e - s < 8:
                raise ValueError("mp4: truncated ftyp")
            brand = b[s : s + 4].decode("latin-1")
        elif t == b"moov":
            moov = (s, e)
    if brand is None:
        raise ValueError("mp4: missing ftyp box")
    if moov is None:
        raise ValueError("mp4: missing moov box")
    mvhd = _find(b, *moov, b"mvhd")
    if mvhd is None:
        raise ValueError("mp4: moov without mvhd")
    timescale, duration = _parse_mvhd(b, *mvhd)
    n_tracks = n_video = n_audio = 0
    for t, s, e in _walk_boxes(b, *moov):
        if t != b"trak":
            continue
        n_tracks += 1
        mdia = _find(b, s, e, b"mdia")
        if mdia is None:
            raise ValueError("mp4: trak without mdia")
        hdlr = _find(b, *mdia, b"hdlr")
        if hdlr is None:
            raise ValueError("mp4: mdia without hdlr")
        hs, he = hdlr
        if he - hs < 12:
            raise ValueError("mp4: truncated hdlr")
        kind = b[hs + 8 : hs + 12]
        if kind == b"vide":
            n_video += 1
        elif kind == b"soun":
            n_audio += 1
    if n_tracks == 0:
        raise ValueError("mp4: moov without tracks")
    return {
        "brand": brand,
        "n_tracks": n_tracks,
        "n_video": n_video,
        "n_audio": n_audio,
        "timescale": timescale,
        "duration_ms": duration * 1000 // timescale,
    }


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def write_mp4(
    n_tracks: int,
    timescale: int,
    duration_units: int,
    first_video: bool = True,
    mvhd_v1: bool = False,
) -> bytes:
    """Minimal deterministic ISO-BMFF fixture: ``ftyp isom`` + ``moov``
    (mvhd v0/v1 + alternating vide/soun tracks, each with the
    mdia/hdlr chain the parser requires) + an empty ``mdat``."""
    if n_tracks < 1:
        raise ValueError("mp4: at least one track")
    ftyp = _box(b"ftyp", b"isomiso2" + struct.pack(">I", 512))
    if mvhd_v1:
        body = bytes((1, 0, 0, 0)) + struct.pack(
            ">QQIQ", 0, 0, timescale, duration_units
        ) + bytes(80)
    else:
        body = bytes(4) + struct.pack(">IIII", 0, 0, timescale, duration_units) + bytes(76)
    mvhd = _box(b"mvhd", body)
    traks = []
    for i in range(n_tracks):
        vide = (i % 2 == 0) == first_video
        kind = b"vide" if vide else b"soun"
        hdlr = _box(b"hdlr", bytes(4) + bytes(4) + kind + bytes(12) + b"t\x00")
        mdhd = _box(b"mdhd", bytes(4) + struct.pack(">IIII", 0, 0, timescale, duration_units))
        mdia = _box(b"mdia", mdhd + hdlr)
        tkhd = _box(b"tkhd", bytes(4) + struct.pack(">IIII", 0, 0, i + 1, 0) + bytes(64))
        traks.append(_box(b"trak", tkhd + mdia))
    moov = _box(b"moov", mvhd + b"".join(traks))
    return ftyp + moov + _box(b"mdat", b"")
