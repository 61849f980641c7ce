"""MPEG audio (MP3) container layer — frame walk, ID3, Xing, silence decode.

The reference engine has no codecs at all; this module is part of the
"beyond the reference" multimodal surface (SURVEY.md §6): the metadata a
100 TB crawl pipeline shards, filters and routes audio on — exact frame
count, duration, bitrate, channel layout — extracted WITHOUT decoding
samples, plus a fail-fast writer/reader pair used by the deterministic
fixtures.

Everything here derives from the public MPEG-1/2 audio framing layout
(ISO/IEC 11172-3 / 13818-3 as documented in countless public decoders):
header bit layout, bitrate/sample-rate tables, frame-length arithmetic,
side-info sizes, the Xing/Info VBR header, and ID3v1/v2 tag framing.

Scope boundary (declared, deliberate): the spectral layer — Huffman
tables, requantization, IMDCT, synthesis window — is the `decode_fn`
integration seam (COVERAGE.md "Beyond the reference").  Those ISO tables
are data, not derivable structure, and this sandbox has no conformance
target to validate a re-keying against (no mpg123/libmad/ffmpeg), so a
from-scratch spectral path could only ever be self-consistent.  The one
spectral case that IS exactly decodable from structure alone is digital
silence (``part2_3_length == 0``: zero spectral bits per granule), which
:func:`decode_mp3_samples` handles bit-exactly; anything with actual
spectral data raises with a pointer at the seam instead of guessing.

Strictness contract (same as the image codecs): a payload either parses
completely — every frame header consistent, every frame's bytes present —
or raises ``ValueError``.  Crawl-grade sniffing must never misreport a
truncated or corrupt file as shorter-but-valid audio.
"""

from __future__ import annotations

# bitrate tables, kbps, index 1..14 (0 = free-format, 15 = invalid)
_BITRATES = {
    ("1", 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("1", 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("1", 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("2", 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("2", 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    ("2", 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_SAMPLE_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}
# header version bits -> version key ('01' is reserved)
_VERSION_BITS = {0b11: "1", 0b10: "2", 0b00: "2.5"}
_LAYER_BITS = {0b01: 3, 0b10: 2, 0b11: 1}


def _samples_per_frame(version: str, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version == "1" else 576  # layer III LSF halves the frame


def _frame_length(version: str, layer: int, bitrate_kbps: int, sr: int, padding: int) -> int:
    bps = bitrate_kbps * 1000
    if layer == 1:
        return (12 * bps // sr + padding) * 4
    if layer == 2 or version == "1":
        return 144 * bps // sr + padding
    return 72 * bps // sr + padding  # layer III, MPEG-2/2.5


def _side_info_size(version: str, n_channels: int) -> int:
    if version == "1":
        return 17 if n_channels == 1 else 32
    return 9 if n_channels == 1 else 17


def parse_frame_header(b: bytes, off: int = 0) -> dict:
    """Parse one 4-byte MPEG audio frame header at ``off``; raises
    ``ValueError`` on anything that is not a valid, non-free-format
    header (free-format has no computable frame length and crawl
    sniffing treats it as corrupt)."""
    if len(b) < off + 4:
        raise ValueError("mpeg audio: truncated frame header")
    b0, b1, b2, b3 = b[off], b[off + 1], b[off + 2], b[off + 3]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError(f"mpeg audio: lost frame sync at byte {off}")
    vbits, lbits = (b1 >> 3) & 0x3, (b1 >> 1) & 0x3
    if vbits not in _VERSION_BITS or lbits not in _LAYER_BITS:
        raise ValueError("mpeg audio: reserved version/layer bits")
    version, layer = _VERSION_BITS[vbits], _LAYER_BITS[lbits]
    crc_present = (b1 & 0x1) == 0
    br_idx, sr_idx, padding = b2 >> 4, (b2 >> 2) & 0x3, (b2 >> 1) & 0x1
    if br_idx in (0, 15):
        raise ValueError("mpeg audio: free-format or invalid bitrate index")
    if sr_idx == 3:
        raise ValueError("mpeg audio: reserved sample-rate index")
    table_key = (version if version != "2.5" else "2", layer)
    bitrate = _BITRATES[table_key][br_idx - 1]
    sr = _SAMPLE_RATES[version][sr_idx]
    mode = (b3 >> 6) & 0x3
    n_channels = 1 if mode == 0b11 else 2
    return {
        "version": version,
        "layer": layer,
        "bitrate_kbps": bitrate,
        "sample_rate": sr,
        "padding": padding,
        "mode": mode,
        "n_channels": n_channels,
        "crc_present": crc_present,
        "frame_length": _frame_length(version, layer, bitrate, sr, padding),
        "samples_per_frame": _samples_per_frame(version, layer),
    }


def _syncsafe(n: int) -> bytes:
    if not 0 <= n < 1 << 28:
        raise ValueError("id3v2: size out of syncsafe range")
    return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))


def skip_id3v2(b: bytes) -> int:
    """Return the offset of the first byte after a leading ID3v2 tag
    (0 when there is none)."""
    if len(b) < 10 or b[:3] != b"ID3":
        return 0
    if any(x & 0x80 for x in b[6:10]):
        raise ValueError("id3v2: non-syncsafe size byte")
    size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
    total = 10 + size + (10 if b[5] & 0x10 else 0)  # optional footer
    if total > len(b):
        raise ValueError("id3v2: tag extends past end of payload")
    return total


def write_id3v2(content_size: int) -> bytes:
    """Minimal ID3v2.3 tag of ``content_size`` zero bytes (fixture side:
    the parser only honors the framing, never the frames)."""
    return b"ID3" + bytes((3, 0, 0)) + _syncsafe(content_size) + bytes(content_size)


_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def write_id3v2_tags(frames: dict[str, str], version: int = 3) -> bytes:
    """ID3v2.3/2.4 tag carrying UTF-capable text frames (v2.3 encodes
    UTF-16 with BOM, v2.4 UTF-8 — each version's native Unicode form)."""
    if version not in (3, 4):
        raise ValueError("id3v2: only v2.3/v2.4 are written")
    body = bytearray()
    for fid, text in frames.items():
        if len(fid) != 4 or not fid.startswith("T"):
            raise ValueError(f"id3v2: not a text frame id {fid!r}")
        if version == 4:
            payload = b"\x03" + text.encode("utf-8")
            size = _syncsafe(len(payload))
        else:
            payload = b"\x01" + text.encode("utf-16")  # BOM included
            size = len(payload).to_bytes(4, "big")
        body += fid.encode("latin-1") + size + b"\x00\x00" + payload
    return b"ID3" + bytes((version, 0, 0)) + _syncsafe(len(body)) + bytes(body)


def _de_unsync(data: bytes) -> bytes:
    """Reverse ID3v2 unsynchronisation: every 0xFF 0x00 becomes 0xFF."""
    return data.replace(b"\xff\x00", b"\xff")


def parse_id3v2_tags(b: bytes) -> dict[str, str]:
    """Text frames (``T***``) of a leading ID3v2.3/2.4 tag as
    ``{frame_id: text}``.  Handles v2.4 syncsafe vs v2.3 raw frame
    sizes, tag-level unsynchronisation (v2.3 de-unsyncs the whole body;
    in v2.4 the tag flag means every frame is unsynchronised), the
    per-frame v2.4 unsync format flag (0x02), and the extended header
    of both versions; all four declared text encodings decode; padding
    ends the walk; a frame overrunning the tag raises.  Non-text frames
    (APIC etc.) are skipped by size.  Returns ``{}`` when no tag is
    present; raises on versions other than 2.3/2.4 rather than walking
    them with the wrong layout (v2.2 uses 3-byte ids/sizes)."""
    total = skip_id3v2(b)
    if total == 0:
        return {}
    version, tag_flags = b[3], b[5]
    if version not in (3, 4):
        raise ValueError(
            f"id3v2.{version}: unsupported tag version (only 2.3/2.4 parse; "
            "2.2 uses 3-byte frame ids/sizes)"
        )
    tag_unsync = bool(tag_flags & 0x80)
    body = b[10 : total - (10 if tag_flags & 0x10 else 0)]
    if version == 3 and tag_unsync:
        # v2.3 applies unsynchronisation to the assembled tag as a whole
        body = _de_unsync(body)
    off = 0
    if tag_flags & 0x40:  # extended header
        if version == 4:
            if len(body) < 4 or any(x & 0x80 for x in body[:4]):
                raise ValueError("id3v2.4: bad extended-header size")
            ext = (body[0] << 21) | (body[1] << 14) | (body[2] << 7) | body[3]
            off = ext  # v2.4 size INCLUDES the size field itself
        else:
            if len(body) < 4:
                raise ValueError("id3v2.3: truncated extended header")
            off = 4 + int.from_bytes(body[:4], "big")  # size EXCLUDES itself
        if off > len(body):
            raise ValueError("id3v2: extended header overruns the tag")
    out: dict[str, str] = {}
    while off + 10 <= len(body):
        fid = body[off : off + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        if version == 4:
            if any(x & 0x80 for x in body[off + 4 : off + 8]):
                raise ValueError("id3v2.4: non-syncsafe frame size")
            size = (
                (body[off + 4] << 21) | (body[off + 5] << 14)
                | (body[off + 6] << 7) | body[off + 7]
            )
        else:
            size = int.from_bytes(body[off + 4 : off + 8], "big")
        frame_flags = body[off + 9]
        payload_at = off + 10
        if payload_at + size > len(body):
            raise ValueError(f"id3v2: frame {fid!r} overruns the tag")
        if fid.startswith(b"T") and size >= 1:
            payload = body[payload_at : payload_at + size]
            if version == 4 and (tag_unsync or frame_flags & 0x02):
                payload = _de_unsync(payload)
            enc = payload[0]
            codec = _ID3_ENCODINGS.get(enc)
            if codec is None:
                raise ValueError(f"id3v2: unknown text encoding {enc}")
            try:
                text = payload[1:].decode(codec)
            except UnicodeDecodeError as exc:
                raise ValueError(f"id3v2: undecodable {fid!r} frame: {exc}") from None
            out[fid.decode("latin-1")] = text.rstrip("\x00")
        off = payload_at + size
    return out


_XING_TAGS = (b"Xing", b"Info")


def _xing_offset(hdr: dict) -> int:
    return 4 + (2 if hdr["crc_present"] else 0) + _side_info_size(
        hdr["version"], hdr["n_channels"]
    )


def write_mp3(
    n_frames: int,
    sample_rate: int = 44100,
    bitrate_kbps: int = 128,
    n_channels: int = 1,
    xing: bool = False,
    id3_content: int = 0,
) -> bytes:
    """Deterministic CBR Layer III stream of ``n_frames`` SILENCE frames.

    Every granule carries ``part2_3_length == 0`` (an all-zero side-info
    block is a legal encoding of digital silence: no scalefactor bits, no
    Huffman bits, the spectrum is zero), so any conformant decoder emits
    exact zeros — the closed-form decode the fixtures pin.  ``xing``
    prepends the canonical CBR metadata frame ('Info' tag + frame/byte
    counts), which players exclude from the audio frame count, exactly as
    the parser here does."""
    for v, rates in _SAMPLE_RATES.items():
        if sample_rate in rates:
            version, sr_idx = v, rates.index(sample_rate)
            break
    else:
        raise ValueError(f"mp3: unsupported sample rate {sample_rate}")
    table = _BITRATES[(version if version != "2.5" else "2", 3)]
    if bitrate_kbps not in table:
        raise ValueError(f"mp3: bitrate {bitrate_kbps} not in the layer-III table")
    br_idx = table.index(bitrate_kbps) + 1
    vbits = {"1": 0b11, "2": 0b10, "2.5": 0b00}[version]
    mode = 0b11 if n_channels == 1 else 0b00
    hdr = bytes(
        (
            0xFF,
            0xE0 | (vbits << 3) | (0b01 << 1) | 0x1,  # layer III, no CRC
            (br_idx << 4) | (sr_idx << 2),  # padding 0, private 0
            mode << 6,
        )
    )
    flen = _frame_length(version, 3, bitrate_kbps, sample_rate, 0)
    side = _side_info_size(version, n_channels)
    if flen < 4 + side:
        raise ValueError("mp3: bitrate too low to hold the side info")
    silence = hdr + bytes(flen - 4)  # all-zero side info + stuffing
    out = bytearray()
    if id3_content:
        out += write_id3v2(id3_content)
    if xing:
        frame = bytearray(silence)
        o = 4 + side
        tag = b"Info" + (0x3).to_bytes(4, "big")  # flags: frames + bytes
        tag += n_frames.to_bytes(4, "big")
        tag += ((n_frames + 1) * flen).to_bytes(4, "big")
        if o + len(tag) > flen:
            raise ValueError("mp3: frame too small for the Xing header")
        frame[o : o + len(tag)] = tag
        out += frame
    out += silence * n_frames
    return bytes(out)


class _FrameWalkError(ValueError):
    """A frame-walk failure that knows WHERE it failed, so the ID3v1
    trim retry can tell tag-boundary failures from genuine corruption
    earlier in the stream (round-13 ADVICE: the trimmed retry's error
    must not mask the original failure location)."""

    def __init__(self, msg: str, offset: int):
        super().__init__(msg)
        self.offset = offset


def _walk(b: bytes):
    """Shared frame walk for meta and decode (one copy of the tag-trim
    and consistency rules): returns ``(meta, audio_frames)`` where
    ``audio_frames`` is the list of ``(offset, header)`` EXCLUDING a
    leading Xing/Info metadata frame."""
    start = skip_id3v2(b)
    has_id3v2 = start > 0

    def walk_to(end: int) -> list:
        if start >= end:
            raise ValueError("mp3: no frames after tags")
        frames, off = [], start
        first = None
        while off < end:
            try:
                hdr = parse_frame_header(b, off)
            except ValueError as exc:
                raise _FrameWalkError(str(exc), off) from None
            if first is None:
                first = hdr
            elif (hdr["version"], hdr["layer"], hdr["sample_rate"], hdr["n_channels"]) != (
                first["version"], first["layer"], first["sample_rate"], first["n_channels"]
            ):
                raise _FrameWalkError(
                    f"mp3: stream parameters changed at byte {off}", off
                )
            if off + hdr["frame_length"] > end:
                raise _FrameWalkError(f"mp3: truncated frame at byte {off}", off)
            frames.append((off, hdr))
            off += hdr["frame_length"]
        return frames

    end = len(b)
    if end - start >= 128 and b[end - 128 : end - 125] == b"TAG":
        # 'TAG' at end-128 is USUALLY an ID3v1 trailer, but those three
        # bytes can also fall mid-frame of valid audio — trimming
        # unconditionally would then fail-closed reject a legitimate
        # stream as truncated (round-12 ADVICE).  Walk untrimmed first;
        # retry trimmed ONLY when the failure sits at/after the trailer
        # boundary — a failure before end-128 is genuine corruption the
        # tag cannot explain, and the trimmed retry's error would
        # misreport its location (round-13 ADVICE).
        try:
            frames = walk_to(end)
        except _FrameWalkError as exc:
            if exc.offset < end - 128:
                raise
            end -= 128
            frames = walk_to(end)
    else:
        frames = walk_to(end)
    first = frames[0][1]
    # Xing/Info detection on the first frame
    has_xing, vbr, xing_frames = False, False, None
    f0_off, f0 = frames[0]
    xo = f0_off + _xing_offset(f0)
    if f0["layer"] == 3 and xo + 8 <= f0_off + f0["frame_length"]:
        tag = b[xo : xo + 4]
        if tag in _XING_TAGS:
            has_xing, vbr = True, tag == b"Xing"
            flags = int.from_bytes(b[xo + 4 : xo + 8], "big")
            if flags & 0x1:
                if xo + 12 > f0_off + f0["frame_length"]:
                    raise ValueError("mp3: Xing frame-count field truncated")
                xing_frames = int.from_bytes(b[xo + 8 : xo + 12], "big")
    audio = frames[1:] if has_xing else frames
    if not audio:
        raise ValueError("mp3: metadata frame with no audio frames")
    if xing_frames is not None and xing_frames != len(audio):
        raise ValueError(
            f"mp3: Xing frame count {xing_frames} != walked {len(audio)}"
        )
    spf = first["samples_per_frame"]
    meta = {
        "version": first["version"],
        "layer": first["layer"],
        "sample_rate": first["sample_rate"],
        "n_channels": first["n_channels"],
        "bitrate_kbps": audio[0][1]["bitrate_kbps"],
        "n_frames": len(audio),
        "duration_ms": len(audio) * spf * 1000 // first["sample_rate"],
        "vbr": vbr,
        "has_id3v2": has_id3v2,
        "has_xing": has_xing,
    }
    return meta, audio


def parse_mp3_meta(b: bytes) -> dict:
    """Walk every frame of an MP3 payload and return its exact metadata:

    ``version layer sample_rate n_channels bitrate_kbps n_frames
    duration_ms vbr has_id3v2 has_xing``

    ``n_frames``/``duration_ms`` count AUDIO frames only (a leading
    Xing/Info metadata frame is excluded, and its frame-count field is
    cross-checked against the walk when present).  ``bitrate_kbps`` is
    the header bitrate of the first audio frame.  A trailing 128-byte
    ID3v1 tag is tolerated; any other trailing or interleaved garbage,
    truncation, or mid-stream version/layer/sample-rate change raises."""
    return _walk(b)[0]


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data, self.pos = data, 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


def _granule_spectral_bits(b: bytes, off: int, hdr: dict) -> list[int]:
    """part2_3_length of every (granule, channel) in the frame at ``off``."""
    side_off = off + 4 + (2 if hdr["crc_present"] else 0)
    side = _BitReader(b[side_off : side_off + _side_info_size(hdr["version"], hdr["n_channels"])])
    nch, lsf = hdr["n_channels"], hdr["version"] != "1"
    side.read(8 if lsf else 9)  # main_data_begin
    side.read((1 if nch == 1 else 2) if lsf else (5 if nch == 1 else 3))
    if not lsf:
        side.read(4 * nch)  # scfsi
    out = []
    for _gr in range(1 if lsf else 2):
        for _ch in range(nch):
            p23 = side.read(12)
            out.append(p23)
            side.read(9 + 8 + (9 if lsf else 4))  # big_values, gain, scalefac_compress
            if side.read(1):  # window switching
                side.read(2 + 1 + 10 + 9)
            else:
                side.read(15 + 4 + 3)
            side.read(2 if lsf else 3)  # (preflag,) scalefac_scale, count1table
    return out


def decode_mp3_samples(b: bytes):
    """Decode an MP3 payload's samples — exactly as far as the framing
    layer can go without the ISO spectral tables.

    Digital silence (every granule ``part2_3_length == 0``) decodes
    bit-exactly to zeros, shape ``(n_frames * samples_per_frame,
    n_channels)`` int16.  Any frame with spectral bits raises
    ``NotImplementedError`` naming the seam — never a guessed waveform."""
    import numpy as np

    meta, audio = _walk(b)
    if meta["layer"] != 3:
        raise NotImplementedError(
            "mpeg audio: layer I/II subband decode is behind the decode_fn "
            "seam (COVERAGE.md 'Beyond the reference')"
        )
    for off, hdr in audio:
        if any(_granule_spectral_bits(b, off, hdr)):
            raise NotImplementedError(
                "mp3: spectral data present — Huffman/IMDCT/synthesis is "
                "the declared decode_fn seam (no conformance target in "
                "this sandbox to validate the ISO tables against)"
            )
    spf = _samples_per_frame(meta["version"], 3)
    return np.zeros((meta["n_frames"] * spf, meta["n_channels"]), dtype=np.int16)
