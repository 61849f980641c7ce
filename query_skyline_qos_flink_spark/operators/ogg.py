"""Ogg container layer — page framing, CRC, packet reassembly, ident headers.

Beyond-the-reference multimodal surface (the reference engine has no
codecs; SURVEY.md §6): the page/packet layer of the Ogg container as
publicly specified (RFC 3533), the Vorbis identification header (packet
``\\x01vorbis``, Vorbis I spec §4.2.2) and the OpusHead header (RFC 7845
§5.1).  This is the layer a 100 TB crawl pipeline needs to shard, filter
and measure audio without decoding it: codec identity, channel count,
sample rate, page count, and sample-exact duration from the terminal
granule position.

The audio DATA packets (Vorbis floor/residue decode, Opus SILK/CELT) are
the declared ``decode_fn`` seam, exactly like MP3's spectral layer
(operators/mpeg_audio.py) — note Vorbis carries its Huffman codebooks in
the stream setup header, so a from-scratch decode is structurally possible
without ISO tables, but remains out of scope while the sandbox has no
conformance target to validate against.

Strictness contract: every page's capture pattern, version byte and CRC
must check out and packet lacing must terminate cleanly, or the parser
raises — a corrupt crawl object must never sniff as valid-but-shorter.

CRC: the RFC 3533 page checksum — polynomial 0x04C11DB7, init 0, no bit
reflection, no final xor, computed over the page with the CRC field
zeroed.  ``tests/test_ogg.py`` pins the table-driven implementation
against an independent bit-serial twin.
"""

from __future__ import annotations

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
    _CRC_TABLE.append(_r & 0xFFFFFFFF)


def ogg_crc(data: bytes, crc: int = 0) -> int:
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ byte]
    return crc


def ogg_crc_bitserial(data: bytes) -> int:
    """Independent bit-at-a-time twin of :func:`ogg_crc` (test oracle)."""
    crc = 0
    for byte in data:
        for bit in range(7, -1, -1):
            top = (crc >> 31) & 1
            crc = (crc << 1) & 0xFFFFFFFF
            if top ^ ((byte >> bit) & 1):
                crc ^= 0x04C11DB7
    return crc


def _page(
    header_type: int,
    granule: int,
    serial: int,
    seq: int,
    segments: list[bytes],
    lacing: list[int],
) -> bytes:
    body = b"".join(segments)
    head = bytearray()
    head += b"OggS\x00"
    head.append(header_type)
    head += (granule & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little", signed=False)
    head += serial.to_bytes(4, "little")
    head += seq.to_bytes(4, "little")
    head += bytes(4)  # CRC placeholder
    head.append(len(lacing))
    head += bytes(lacing)
    crc = ogg_crc(bytes(head) + body)
    head[22:26] = crc.to_bytes(4, "little")
    return bytes(head) + body


def write_ogg(
    pages: list[tuple[list[bytes], int]],
    serial: int = 0x5041474F,
    max_segs_per_page: int = 255,
) -> bytes:
    """Serialize ``pages`` — a list of ``(packets, granule_position)`` —
    into an Ogg stream.  The first page is flagged BOS, the last EOS.  A
    packet whose lacing exceeds ``max_segs_per_page`` segments spills
    onto continuation pages (header type 0x01, granule -1 for pages that
    end no packet), which is how the fixtures exercise the reassembly
    path deterministically."""
    out, seq = bytearray(), 0
    n_pages_meta = len(pages)
    for pi, (packets, granule) in enumerate(pages):
        # lace all packets of this logical page
        lacing: list[int] = []
        segs: list[bytes] = []
        for pk in packets:
            off = 0
            while True:
                seg = pk[off : off + 255]
                segs.append(seg)
                lacing.append(len(seg))
                off += len(seg)
                if len(seg) < 255:
                    break
                if off >= len(pk):  # exact multiple of 255: zero terminator
                    segs.append(b"")
                    lacing.append(0)
                    break
        # split into physical pages of at most max_segs_per_page segments
        chunks = [
            (lacing[i : i + max_segs_per_page], segs[i : i + max_segs_per_page])
            for i in range(0, len(lacing), max_segs_per_page)
        ] or [([], [])]
        prev_open = False
        for ci, (lc, sg) in enumerate(chunks):
            htype = 0
            # the continuation flag means a PACKET spans the page break —
            # true only when the previous chunk's last lacing was 255
            # (hypothesis-found: two 0-length packets at max_segs=1 split
            # into two pages, but the second continues nothing)
            if ci > 0 and prev_open:
                htype |= 0x01
            if lc:
                prev_open = lc[-1] == 255
            if pi == 0 and ci == 0:
                htype |= 0x02  # BOS
            if pi == n_pages_meta - 1 and ci == len(chunks) - 1:
                htype |= 0x04  # EOS
            # RFC 3533: a page that completes no packet stores granule -1;
            # ANY sub-255 lacing value means some packet ended on this page
            ends_packet = any(lv < 255 for lv in lc)
            g = granule if (ci == len(chunks) - 1 or ends_packet) else -1
            out += _page(htype, g, serial, seq, sg, lc)
            seq += 1
    return bytes(out)


def write_vorbis_ident(
    n_channels: int, sample_rate: int, bitrate_nominal: int = 0
) -> bytes:
    """Vorbis I identification header packet (spec §4.2.2)."""
    p = bytearray(b"\x01vorbis")
    p += (0).to_bytes(4, "little")  # vorbis_version
    p.append(n_channels)
    p += sample_rate.to_bytes(4, "little")
    p += (0).to_bytes(4, "little", signed=False)  # bitrate_maximum
    p += bitrate_nominal.to_bytes(4, "little", signed=True)
    p += (0).to_bytes(4, "little", signed=False)  # bitrate_minimum
    p.append((11 << 4) | 8)  # blocksize_1 = 2^11, blocksize_0 = 2^8
    p.append(0x01)  # framing flag
    return bytes(p)


def write_opus_head(
    n_channels: int, pre_skip: int, input_sample_rate: int
) -> bytes:
    """OpusHead identification header (RFC 7845 §5.1, mapping family 0)."""
    p = bytearray(b"OpusHead")
    p.append(1)  # version
    p.append(n_channels)
    p += pre_skip.to_bytes(2, "little")
    p += input_sample_rate.to_bytes(4, "little")
    p += (0).to_bytes(2, "little")  # output gain
    p.append(0)  # channel mapping family 0
    return bytes(p)


def write_vorbis_comments(
    tags: dict[str, str], vendor: str = "spark-graft", opus: bool = False
) -> bytes:
    """A VorbisComment packet (Vorbis I §5 / used verbatim by Opus as
    ``OpusTags``, RFC 7845 §5.2): length-prefixed vendor string +
    ``KEY=value`` entries, all little-endian u32 lengths, UTF-8."""
    head = b"OpusTags" if opus else b"\x03vorbis"
    out = bytearray(head)
    v = vendor.encode("utf-8")
    out += len(v).to_bytes(4, "little") + v
    out += len(tags).to_bytes(4, "little")
    for k, val in tags.items():
        entry = f"{k}={val}".encode("utf-8")
        out += len(entry).to_bytes(4, "little") + entry
    if not opus:
        out += b"\x01"  # framing bit
    return bytes(out)


def parse_vorbis_comments(packet: bytes) -> tuple[str, dict[str, str]]:
    """``(vendor, {KEY: value})`` from a VorbisComment / OpusTags packet.
    Keys are case-insensitive per spec and normalized to upper case; an
    entry without ``=`` or a length overrunning the packet raises.
    Vorbis packets must end with the set framing bit and nothing after it
    (Vorbis I §5: a missing framing bit means a truncated/corrupt
    packet); OpusTags MAY carry arbitrary binary after the entries —
    RFC 7845 §5.2 explicitly reserves that suffix — so it is ignored."""
    if packet.startswith(b"\x03vorbis"):
        off, opus = 7, False
    elif packet.startswith(b"OpusTags"):
        off, opus = 8, True
    else:
        raise ValueError("vorbis-comment: bad packet magic")

    def u32(o: int) -> int:
        if o + 4 > len(packet):
            raise ValueError("vorbis-comment: truncated length field")
        return int.from_bytes(packet[o : o + 4], "little")

    vlen = u32(off)
    off += 4
    if off + vlen > len(packet):
        raise ValueError("vorbis-comment: vendor overruns the packet")
    vendor = packet[off : off + vlen].decode("utf-8")
    off += vlen
    count = u32(off)
    off += 4
    tags: dict[str, str] = {}
    for _ in range(count):
        elen = u32(off)
        off += 4
        if off + elen > len(packet):
            raise ValueError("vorbis-comment: entry overruns the packet")
        entry = packet[off : off + elen].decode("utf-8")
        off += elen
        if "=" not in entry:
            raise ValueError(f"vorbis-comment: entry without '=': {entry[:40]!r}")
        k, val = entry.split("=", 1)
        tags[k.upper()] = val
    if not opus:
        if off >= len(packet) or not packet[off] & 0x01:
            raise ValueError("vorbis-comment: missing framing bit")
        if off + 1 != len(packet):
            raise ValueError("vorbis-comment: trailing bytes after framing bit")
    return vendor, tags


def parse_ogg_pages(b: bytes) -> list[dict]:
    """Strict page walk: returns per-page dicts with ``header_type
    granule serial seq lacing body``; raises on bad magic, version,
    CRC, or truncation."""
    pages, off = [], 0
    while off < len(b):
        if b[off : off + 4] != b"OggS":
            raise ValueError(f"ogg: lost page sync at byte {off}")
        if off + 27 > len(b):
            raise ValueError("ogg: truncated page header")
        if b[off + 4] != 0:
            raise ValueError("ogg: unknown stream structure version")
        nsegs = b[off + 26]
        hdr_end = off + 27 + nsegs
        if hdr_end > len(b):
            raise ValueError("ogg: truncated segment table")
        lacing = list(b[off + 27 : hdr_end])
        body_len = sum(lacing)
        if hdr_end + body_len > len(b):
            raise ValueError("ogg: truncated page body")
        page = b[off : hdr_end + body_len]
        stored = int.from_bytes(page[22:26], "little")
        if ogg_crc(page[:22] + bytes(4) + page[26:]) != stored:
            raise ValueError(f"ogg: CRC mismatch on page at byte {off}")
        pages.append(
            {
                "header_type": page[5],
                "granule": int.from_bytes(page[6:14], "little", signed=True),
                "serial": int.from_bytes(page[14:18], "little"),
                "seq": int.from_bytes(page[18:22], "little"),
                "lacing": lacing,
                "body": page[27 + nsegs :],
            }
        )
        off = hdr_end + body_len
    if not pages:
        raise ValueError("ogg: empty payload")
    return pages


def reassemble_packets(pages: list[dict]) -> list[bytes]:
    """Join lacing segments back into packets across page boundaries.
    A packet left open by the final page raises (truncated stream)."""
    packets, cur = [], bytearray()
    for i, pg in enumerate(pages):
        if i > 0 and bool(pg["header_type"] & 0x01) != bool(len(cur)):
            raise ValueError(f"ogg: continuation flag mismatch on page {i}")
        off = 0
        for lv in pg["lacing"]:
            cur += pg["body"][off : off + lv]
            off += lv
            if lv < 255:
                packets.append(bytes(cur))
                cur.clear()
    if cur:
        raise ValueError("ogg: stream ends mid-packet")
    return packets


def parse_ogg_meta(b: bytes) -> dict:
    """Codec-identifying metadata for a single-stream Ogg payload:

    ``codec n_channels sample_rate n_pages duration_ms bitrate_kbps``

    Vorbis: sample-exact duration from the terminal granule (PCM sample
    count).  Opus: granule is in 48 kHz samples and pre-skip is
    subtracted per RFC 7845 — ``sample_rate`` reports the canonical
    48000 (the OpusHead input rate is informational)."""
    pages = parse_ogg_pages(b)
    if len({p["serial"] for p in pages}) != 1:
        raise ValueError("ogg: multiplexed streams not supported here")
    if not pages[0]["header_type"] & 0x02 or not pages[-1]["header_type"] & 0x04:
        raise ValueError("ogg: missing BOS/EOS flags")
    # page sequence must be 0..n-1: catches dropped pages AND same-serial
    # chained streams (both pass CRC/lacing but misreport duration/pages)
    for i, pg in enumerate(pages):
        if pg["seq"] != i:
            raise ValueError(
                f"ogg: page sequence broken at index {i} (seq {pg['seq']})"
            )
    first = reassemble_packets(pages[:1])
    if not first:
        raise ValueError("ogg: BOS page carries no complete packet")
    ident = first[0]
    granule = pages[-1]["granule"]
    if ident.startswith(b"\x01vorbis"):
        if len(ident) < 30 or ident[29] != 0x01:
            raise ValueError("ogg: malformed vorbis identification header")
        rate = int.from_bytes(ident[12:16], "little")
        nominal = int.from_bytes(ident[20:24], "little", signed=True)
        if rate <= 0:
            raise ValueError("ogg: vorbis sample rate must be positive")
        return {
            "codec": "vorbis",
            "n_channels": ident[11],
            "sample_rate": rate,
            "n_pages": len(pages),
            "duration_ms": max(granule, 0) * 1000 // rate,
            "bitrate_kbps": max(nominal, 0) // 1000,
        }
    if ident.startswith(b"OpusHead"):
        if len(ident) < 19 or ident[8] not in (1, 15):
            raise ValueError("ogg: malformed OpusHead")
        pre_skip = int.from_bytes(ident[10:12], "little")
        samples = max(granule - pre_skip, 0)
        return {
            "codec": "opus",
            "n_channels": ident[9],
            "sample_rate": 48000,
            "n_pages": len(pages),
            "duration_ms": samples * 1000 // 48000,
            "bitrate_kbps": 0,
        }
    raise ValueError("ogg: unrecognized first packet (not vorbis/opus)")
