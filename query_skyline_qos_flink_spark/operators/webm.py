"""WebM / Matroska (EBML) container layer — element walk, segment metadata.

Beyond-the-reference multimodal surface (SURVEY.md §6): the EBML element
structure as publicly specified (RFC 8794 + the Matroska/WebM element
registry) — variable-length element IDs and sizes, the unknown-size
escape for Segment, Info (TimestampScale, float Duration) and Tracks
(TrackEntry/TrackType) — walked to the routing metadata a crawl pipeline
shards WebM video on.  Cluster/Block data (VP8/VP9/AV1, Opus/Vorbis
bitstreams) is the same declared ``decode_fn`` seam as the other
containers (operators/mpeg_audio.py, ogg.py, mp4.py).

Strictness contract: varints must be well-formed and in bounds, elements
must tile their parent, and Info must carry a Duration — otherwise raise.
UNKNOWN element IDs are skipped by their declared size (EBML's own
forward-compatibility rule, like ISO-BMFF box skipping), not laxity.
"""

from __future__ import annotations

import struct

_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83


def _read_vint(b: bytes, off: int, end: int, keep_marker: bool):
    """(value, next_off) of an EBML varint at ``off``; element IDs keep
    the length-marker bit, sizes strip it.  Returns size ``None`` for
    the all-ones 'unknown size' escape (sizes only)."""
    if off >= end:
        raise ValueError(f"ebml: truncated varint at byte {off}")
    first = b[off]
    if first == 0:
        raise ValueError(f"ebml: invalid varint lead byte 0x00 at byte {off}")
    length = 8 - first.bit_length() + 1
    if off + length > end:
        raise ValueError(f"ebml: truncated {length}-byte varint at byte {off}")
    raw = int.from_bytes(b[off : off + length], "big")
    if keep_marker:
        return raw, off + length
    value = raw - (1 << (7 * length))  # strip the marker bit
    if value == (1 << (7 * length)) - 1:
        return None, off + length  # unknown size
    return value, off + length


# Unknown-size is legal only for elements the spec marks unknownsizeallowed
# (Segment and Cluster in Matroska/WebM); anywhere else it would silently
# swallow the siblings of a malformed element, so it raises instead.
_UNKNOWN_SIZE_OK = frozenset({0x18538067, 0x1F43B675})  # Segment, Cluster


def _walk_elements(b: bytes, start: int, end: int):
    """Yield ``(element_id, payload_start, payload_end)``; an unknown-size
    Segment/Cluster extends to ``end``, any other unknown-size element
    raises."""
    off = start
    while off < end:
        eid, off = _read_vint(b, off, end, keep_marker=True)
        size, off = _read_vint(b, off, end, keep_marker=False)
        if size is None:
            if eid not in _UNKNOWN_SIZE_OK:
                raise ValueError(
                    f"ebml: unknown-size escape on element 0x{eid:X} "
                    "(only Segment/Cluster may omit their size)"
                )
            yield eid, off, end
            return  # unknown size swallows the rest of the scope
        if off + size > end:
            raise ValueError(f"ebml: element 0x{eid:X} overruns its parent")
        yield eid, off, off + size
        off += size


def _find(b: bytes, start: int, end: int, eid: int):
    for i, s, e in _walk_elements(b, start, end):
        if i == eid:
            return s, e
    return None


def _uint(b: bytes, s: int, e: int) -> int:
    if e - s > 8:
        raise ValueError("ebml: uint wider than 8 bytes")
    return int.from_bytes(b[s:e], "big")


def _float(b: bytes, s: int, e: int) -> float:
    if e - s == 4:
        return struct.unpack(">f", b[s:e])[0]
    if e - s == 8:
        return struct.unpack(">d", b[s:e])[0]
    raise ValueError(f"ebml: float element of width {e - s}")


def parse_webm_meta(b: bytes) -> dict:
    """EBML header + Segment walk: returns ``doctype timescale_ns
    duration_ms n_tracks n_video n_audio``.  ``duration_ms`` is exact
    integer arithmetic over the stored float Duration (Matroska stores
    Duration in TimestampScale ticks)."""
    head = _find(b, 0, len(b), _EBML)
    if head is None:
        raise ValueError("webm: missing EBML header")
    dt = _find(b, *head, _DOCTYPE)
    doctype = b[dt[0] : dt[1]].decode("latin-1") if dt else "matroska"
    seg = _find(b, 0, len(b), _SEGMENT)
    if seg is None:
        raise ValueError("webm: missing Segment")
    info = _find(b, *seg, _INFO)
    if info is None:
        raise ValueError("webm: Segment without Info")
    ts = _find(b, *info, _TIMESTAMP_SCALE)
    timescale = _uint(b, *ts) if ts else 1_000_000  # spec default, ns
    if timescale == 0:
        raise ValueError("webm: zero TimestampScale")
    dur = _find(b, *info, _DURATION)
    if dur is None:
        raise ValueError("webm: Info without Duration")
    duration_ticks = _float(b, *dur)
    if not duration_ticks >= 0:  # also rejects NaN
        raise ValueError("webm: negative or NaN Duration")
    n_tracks = n_video = n_audio = 0
    tracks = _find(b, *seg, _TRACKS)
    if tracks is not None:
        for eid, s, e in _walk_elements(b, *tracks):
            if eid != _TRACK_ENTRY:
                continue
            n_tracks += 1
            tt = _find(b, s, e, _TRACK_TYPE)
            kind = _uint(b, *tt) if tt else 0
            if kind == 1:
                n_video += 1
            elif kind == 2:
                n_audio += 1
    return {
        "doctype": doctype,
        "timescale_ns": timescale,
        # scale BEFORE truncating: with a coarse timescale (1e9 ns = 1 s
        # ticks) a fractional tick is a real sub-second duration that
        # int(ticks) would drop whole
        "duration_ms": int(duration_ticks * timescale) // 1_000_000,
        "n_tracks": n_tracks,
        "n_video": n_video,
        "n_audio": n_audio,
    }


def _vint_size(n: int) -> bytes:
    """Encode ``n`` as a minimal-width EBML size varint."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            return (n | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("ebml: size too large")


def _elem(eid: int, payload: bytes) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big") + _vint_size(len(payload)) + payload


def write_webm(
    n_tracks: int,
    duration_ms: int,
    first_video: bool = True,
    doctype: str = "webm",
    unknown_segment_size: bool = False,
) -> bytes:
    """Minimal deterministic WebM fixture: EBML header (DocType) +
    Segment(Info(TimestampScale 1e6 ns, float64 Duration) + Tracks of
    alternating video/audio TrackEntries).  ``unknown_segment_size``
    writes the Segment with the all-ones size escape (how live-muxed
    real-world WebM ships) to exercise that parser path."""
    head = _elem(_EBML, _elem(_DOCTYPE, doctype.encode()))
    info = _elem(
        _INFO,
        _elem(_TIMESTAMP_SCALE, (1_000_000).to_bytes(3, "big"))
        + _elem(_DURATION, struct.pack(">d", float(duration_ms))),
    )
    entries = b"".join(
        _elem(
            _TRACK_ENTRY,
            _elem(_TRACK_TYPE, bytes([1 if (i % 2 == 0) == first_video else 2])),
        )
        for i in range(n_tracks)
    )
    body = info + _elem(_TRACKS, entries)
    if unknown_segment_size:
        seg = _SEGMENT.to_bytes(4, "big") + b"\x01" + b"\xff" * 7 + body
    else:
        seg = _elem(_SEGMENT, body)
    return head + seg
