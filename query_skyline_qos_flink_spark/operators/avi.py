"""AVI container layer — RIFF walk, main/stream header metadata.

Beyond-the-reference multimodal surface (SURVEY.md §6): the RIFF-AVI
layout as publicly specified (the classic ``avih``/``strl`` structure
from the Microsoft AVI RIFF reference) — the third RIFF form in the
engine after WAVE (operators/multimodal.py) and WebP.  Extracted fields
are the crawl-routing set: frame timing, total frames, stream kinds,
dimensions, frame-exact duration.  Codec payloads inside ``movi`` are
the usual declared ``decode_fn`` seam.

Strictness contract: the RIFF size must cover its chunks, chunks must
tile (with RIFF's even-byte padding), and ``hdrl``/``avih`` must be
present — otherwise raise.  Unknown chunk ids skip by size (RIFF's own
forward-compat rule).
"""

from __future__ import annotations

import struct


def _walk_chunks(b: bytes, start: int, end: int):
    """Yield ``(fourcc, payload_start, payload_end)``; chunks are padded
    to even sizes per RIFF."""
    off = start
    while off < end:
        if off + 8 > end:
            raise ValueError(f"avi: truncated chunk header at byte {off}")
        cid = b[off : off + 4]
        size = struct.unpack_from("<I", b, off + 4)[0]
        if off + 8 + size > end:
            raise ValueError(f"avi: chunk {cid!r} overruns its parent")
        yield cid, off + 8, off + 8 + size
        off += 8 + size + (size & 1)


def _list_type(b: bytes, s: int, e: int) -> bytes:
    if e - s < 4:
        raise ValueError("avi: truncated LIST type")
    return b[s : s + 4]


def parse_avi_meta(b: bytes) -> dict:
    """``usec_per_frame total_frames n_streams n_video n_audio width
    height duration_ms`` from the ``hdrl`` headers."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF-AVI payload")
    size = struct.unpack_from("<I", b, 4)[0]
    if 8 + size > len(b):
        raise ValueError("avi: RIFF size overruns the payload")
    avih = None
    n_streams_seen = n_video = n_audio = 0
    for cid, s, e in _walk_chunks(b, 12, 8 + size):
        if cid != b"LIST" or _list_type(b, s, e) != b"hdrl":
            continue
        for hid, hs, he in _walk_chunks(b, s + 4, e):
            if hid == b"avih":
                if he - hs < 40:
                    raise ValueError("avi: avih too short")
                avih = struct.unpack_from("<10I", b, hs)
            elif hid == b"LIST" and _list_type(b, hs, he) == b"strl":
                n_streams_seen += 1
                for sid, ss, se in _walk_chunks(b, hs + 4, he):
                    if sid == b"strh":
                        if se - ss < 4:
                            raise ValueError("avi: strh too short")
                        fcc = b[ss : ss + 4]
                        if fcc == b"vids":
                            n_video += 1
                        elif fcc == b"auds":
                            n_audio += 1
                        break
        break  # hdrl is the first LIST; one is enough
    if avih is None:
        raise ValueError("avi: missing hdrl/avih")
    uspf, total_frames, declared_streams = avih[0], avih[4], avih[6]
    if uspf == 0:
        raise ValueError("avi: zero MicroSecPerFrame")
    # unconditional (round-12 review: the old `if n_streams_seen` guard
    # skipped the check exactly when the discrepancy was largest — a
    # declared-N-streams file with NO strl headers parsed as valid)
    if declared_streams != n_streams_seen:
        raise ValueError(
            f"avi: avih declares {declared_streams} streams, hdrl carries "
            f"{n_streams_seen}"
        )
    return {
        "usec_per_frame": uspf,
        "total_frames": total_frames,
        "n_streams": declared_streams,
        "n_video": n_video,
        "n_audio": n_audio,
        "width": avih[8],
        "height": avih[9],
        "duration_ms": uspf * total_frames // 1000,
    }


def _chunk(cid: bytes, payload: bytes) -> bytes:
    return cid + struct.pack("<I", len(payload)) + payload + (b"\x00" if len(payload) & 1 else b"")


def _list(ltype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", ltype + payload)


def write_avi(
    n_frames: int,
    usec_per_frame: int = 33333,
    streams: tuple[str, ...] = ("vids",),
    width: int = 64,
    height: int = 48,
) -> bytes:
    """Minimal deterministic AVI fixture: hdrl(avih + one strl per
    stream) + an empty movi list."""
    avih = struct.pack(
        "<10I", usec_per_frame, 0, 0, 0, n_frames, 0, len(streams), 0,
        width, height,
    ) + bytes(16)
    strls = b"".join(
        _list(b"strl", _chunk(b"strh", s.encode("latin-1") + bytes(52)))
        for s in streams
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strls)
    movi = _list(b"movi", b"")
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
