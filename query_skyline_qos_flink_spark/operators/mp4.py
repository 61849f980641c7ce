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


def _parse_header_box(b: bytes, s: int, e: int, name: str) -> tuple[int, int]:
    """``(timescale, duration)`` of an mvhd/mdhd — the two boxes share
    the identical version-dependent layout."""
    ver, o = _fullbox(b, s, e)
    if ver == 1:
        if o + 28 > e:
            raise ValueError(f"mp4: truncated {name} v1")
        timescale = struct.unpack_from(">I", b, o + 16)[0]
        duration = struct.unpack_from(">Q", b, o + 20)[0]
    elif ver == 0:
        if o + 16 > e:
            raise ValueError(f"mp4: truncated {name} v0")
        timescale = struct.unpack_from(">I", b, o + 8)[0]
        duration = struct.unpack_from(">I", b, o + 12)[0]
    else:
        raise ValueError(f"mp4: unknown {name} version {ver}")
    if timescale == 0:
        raise ValueError(f"mp4: {name} timescale must be positive")
    return timescale, duration


def _parse_mvhd(b: bytes, s: int, e: int) -> tuple[int, int]:
    return _parse_header_box(b, s, e, "mvhd")


def _parse_mdhd(b: bytes, s: int, e: int) -> tuple[int, int]:
    return _parse_header_box(b, s, e, "mdhd")


# Sanity bound on a defaults-only trun's sample_count: the samples live
# in mdat so the count itself costs no box bytes, and without it a
# corrupt 0xFFFFFFFF count silently yields a ~34-year duration where the
# explicit-duration path fails fast.  Real muxers emit <10k samples per
# trun; 2^24 is far beyond any legitimate fragment.
MAX_TRUN_SAMPLES = 1 << 24


def _track_id(b: bytes, ts: int, te: int) -> int:
    """track_ID from a trak's tkhd (version-dependent offset)."""
    tkhd = _find(b, ts, te, b"tkhd")
    if tkhd is None:
        raise ValueError("mp4: trak without tkhd")
    s, e = tkhd
    ver, o = _fullbox(b, s, e)
    at = o + (16 if ver == 1 else 8)
    if at + 4 > e:
        raise ValueError("mp4: truncated tkhd")
    return struct.unpack_from(">I", b, at)[0]


def _tfhd_fields(b: bytes, s: int, e: int) -> tuple[int, int | None, bool]:
    """(track_ID, default_sample_duration or None, duration_is_empty)
    from a traf's tfhd, per the 14496-12 flag-ordered optional fields."""
    if s + 8 > e:
        raise ValueError("mp4: truncated tfhd")
    flags = int.from_bytes(b[s + 1 : s + 4], "big")
    track_id = struct.unpack_from(">I", b, s + 4)[0]
    at = s + 8
    if flags & 0x000001:  # base_data_offset (u64)
        at += 8
    if flags & 0x000002:  # sample_description_index
        at += 4
    default_dur = None
    if flags & 0x000008:
        if at + 4 > e:
            raise ValueError("mp4: truncated tfhd default_sample_duration")
        default_dur = struct.unpack_from(">I", b, at)[0]
    return track_id, default_dur, bool(flags & 0x010000)


def _trun_duration(
    b: bytes, s: int, e: int, default_dur: int | None, where: int
) -> int:
    """Total duration (media timescale units) of one trun box."""
    if s + 8 > e:
        raise ValueError(f"mp4: truncated trun at byte {where}")
    flags = int.from_bytes(b[s + 1 : s + 4], "big")
    count = struct.unpack_from(">I", b, s + 4)[0]
    if count > MAX_TRUN_SAMPLES:
        raise ValueError(
            f"mp4: trun at byte {where} declares {count} samples, past the "
            f"{MAX_TRUN_SAMPLES} sanity bound"
        )
    at = s + 8
    if flags & 0x000001:  # data_offset
        at += 4
    if flags & 0x000004:  # first_sample_flags
        at += 4
    per_sample = (
        (4 if flags & 0x000100 else 0)  # duration
        + (4 if flags & 0x000200 else 0)  # size
        + (4 if flags & 0x000400 else 0)  # flags
        + (4 if flags & 0x000800 else 0)  # composition offset
    )
    if at + count * per_sample > e:
        raise ValueError(f"mp4: trun samples out of bounds at byte {where}")
    if flags & 0x000100:
        total = 0
        for i in range(count):
            total += struct.unpack_from(">I", b, at + i * per_sample)[0]
        return total
    if default_dur is None:
        raise ValueError(
            f"mp4: trun at byte {where} has no per-sample durations and "
            "no tfhd/trex default_sample_duration"
        )
    return count * default_dur


def parse_mp4_meta(b: bytes) -> dict:
    """Top-level walk: ``ftyp`` brand + ``moov`` movie header + per-track
    handler kinds.  Returns ``brand n_tracks n_video n_audio timescale
    duration_ms n_fragments``.

    Fragmented files (fMP4/DASH/CMAF: ``moov`` carries ``mvex``/``trex``
    defaults and zero durations, media arrives in ``moof``+``mdat``
    fragments) are summed exactly: per track, every ``trun``'s sample
    durations (explicit, or the ``tfhd``/``trex`` default) accumulate in
    the track's ``mdhd`` media timescale, and ``duration_ms`` is the
    longest track's total.  An unfragmented file reports the ``mvhd``
    movie duration as before."""
    brand, moov = None, None
    moofs = []
    for t, s, e in _walk_boxes(b, 0, len(b)):
        if t == b"ftyp":
            if e - s < 8:
                raise ValueError("mp4: truncated ftyp")
            brand = b[s : s + 4].decode("latin-1")
        elif t == b"moov":
            moov = (s, e)
        elif t == b"moof":
            moofs.append((s, e))
    if brand is None:
        raise ValueError("mp4: missing ftyp box")
    if moov is None:
        raise ValueError("mp4: missing moov box")
    mvhd = _find(b, *moov, b"mvhd")
    if mvhd is None:
        raise ValueError("mp4: moov without mvhd")
    timescale, duration = _parse_mvhd(b, *mvhd)
    n_tracks = n_video = n_audio = 0
    media = {}  # track_id -> (mdhd_timescale, mdhd_duration)
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
        mdhd = _find(b, *mdia, b"mdhd")
        if mdhd is None:
            raise ValueError("mp4: mdia without mdhd")
        media[_track_id(b, s, e)] = _parse_mdhd(b, *mdhd)
    if n_tracks == 0:
        raise ValueError("mp4: moov without tracks")
    if len(media) != n_tracks:
        raise ValueError("mp4: duplicate track_IDs across traks")

    if moofs:
        # trex defaults live under moov/mvex, one per track
        trex_dur: dict[int, int] = {}
        mvex = _find(b, *moov, b"mvex")
        if mvex is not None:
            for t, s, e in _walk_boxes(b, *mvex):
                if t != b"trex":
                    continue
                _ver, o = _fullbox(b, s, e)
                if o + 16 > e:
                    raise ValueError("mp4: truncated trex")
                tid = struct.unpack_from(">I", b, o)[0]
                trex_dur[tid] = struct.unpack_from(">I", b, o + 8)[0]
        frag_units: dict[int, int] = {}
        for ms, me in moofs:
            for t, s, e in _walk_boxes(b, ms, me):
                if t != b"traf":
                    continue
                # one pass over the traf's children: tfhd + trun ranges
                tfhd, truns = None, []
                for tt, ts_, te_ in _walk_boxes(b, s, e):
                    if tt == b"tfhd":
                        tfhd = (ts_, te_)
                    elif tt == b"trun":
                        truns.append((ts_, te_))
                if tfhd is None:
                    raise ValueError("mp4: traf without tfhd")
                tid, default_dur, empty = _tfhd_fields(b, *tfhd)
                if tid not in media:
                    raise ValueError(
                        f"mp4: moof references unknown track_ID {tid}"
                    )
                if empty:
                    continue
                if default_dur is None:
                    default_dur = trex_dur.get(tid)
                for ts_, te_ in truns:
                    frag_units[tid] = frag_units.get(tid, 0) + _trun_duration(
                        b, ts_, te_, default_dur, ts_
                    )
        duration_ms = 0
        for tid, (mts, mdur) in media.items():
            total = mdur + frag_units.get(tid, 0)
            duration_ms = max(duration_ms, total * 1000 // mts)
    else:
        duration_ms = duration * 1000 // timescale
    return {
        "brand": brand,
        "n_tracks": n_tracks,
        "n_video": n_video,
        "n_audio": n_audio,
        "timescale": timescale,
        "duration_ms": duration_ms,
        "n_fragments": len(moofs),
    }


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _fixture_trak(
    i: int, timescale: int, duration_units: int, first_video: bool
) -> bytes:
    """One alternating vide/soun fixture trak (shared by both writers)."""
    vide = (i % 2 == 0) == first_video
    kind = b"vide" if vide else b"soun"
    hdlr = _box(b"hdlr", bytes(4) + bytes(4) + kind + bytes(12) + b"t\x00")
    mdhd = _box(
        b"mdhd", bytes(4) + struct.pack(">IIII", 0, 0, timescale, duration_units)
    )
    mdia = _box(b"mdia", mdhd + hdlr)
    tkhd = _box(b"tkhd", bytes(4) + struct.pack(">IIII", 0, 0, i + 1, 0) + bytes(64))
    return _box(b"trak", tkhd + mdia)


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
    traks = [
        _fixture_trak(i, timescale, duration_units, first_video)
        for i in range(n_tracks)
    ]
    moov = _box(b"moov", mvhd + b"".join(traks))
    return ftyp + moov + _box(b"mdat", b"")


def write_fmp4(
    n_tracks: int,
    timescale: int,
    fragments: list[list[tuple[int, list[int] | int]]],
    trex_default: int = 0,
    first_video: bool = True,
) -> bytes:
    """Fragmented-MP4 fixture twin of the ``moof`` walk in
    :func:`parse_mp4_meta`: an init ``moov`` (mvhd/mdhd durations 0,
    ``mvex``/``trex`` defaults) followed by one ``moof``+``mdat`` pair
    per fragment.  Each fragment is a list of ``(track_id, samples)``
    where ``samples`` is a list of explicit per-sample durations (trun
    flag 0x100) or an int count that leans on the trex/tfhd default;
    odd track_ids additionally carry the default in ``tfhd`` to exercise
    that source too."""
    if n_tracks < 1:
        raise ValueError("mp4: at least one track")
    ftyp = _box(b"ftyp", b"iso5mp42" + struct.pack(">I", 512))
    mvhd = _box(
        b"mvhd", bytes(4) + struct.pack(">IIII", 0, 0, timescale, 0) + bytes(76)
    )
    traks, trexes = [], []
    for i in range(n_tracks):
        traks.append(_fixture_trak(i, timescale, 0, first_video))
        trexes.append(
            _box(b"trex", bytes(4) + struct.pack(">IIIII", i + 1, 1, trex_default, 0, 0))
        )
    mvex = _box(b"mvex", b"".join(trexes))
    out = ftyp + _box(b"moov", mvhd + b"".join(traks) + mvex)
    for seq, frag in enumerate(fragments, 1):
        trafs = b""
        for track_id, samples in frag:
            tfhd_flags, tfhd_body = 0x020000, struct.pack(">I", track_id)
            if track_id % 2 == 1 and isinstance(samples, int):
                # odd tracks carry the default in tfhd (flag 0x8)
                tfhd_flags |= 0x000008
                tfhd_body += struct.pack(">I", trex_default)
            tfhd = _box(
                b"tfhd", bytes((0,)) + tfhd_flags.to_bytes(3, "big") + tfhd_body
            )
            if isinstance(samples, int):
                trun = _box(
                    b"trun",
                    bytes(4) + struct.pack(">I", samples),
                )
            else:
                trun = _box(
                    b"trun",
                    bytes((0,)) + (0x000100).to_bytes(3, "big")
                    + struct.pack(">I", len(samples))
                    + b"".join(struct.pack(">I", d) for d in samples),
                )
            trafs += _box(b"traf", tfhd + trun)
        mfhd = _box(b"mfhd", bytes(4) + struct.pack(">I", seq))
        out += _box(b"moof", mfhd + trafs) + _box(b"mdat", b"\x00" * 8)
    return out


# ---------------------------------------------------------------------------
# HEIF still images (ISO 23008-12): AVIF / HEIC metadata
# ---------------------------------------------------------------------------

#: ftyp brands that mark an ISO-BMFF STILL IMAGE (HEIF family) rather
#: than a movie: AV1-coded (avif), HEVC-coded (heic/heix/heim/heis),
#: and the codec-agnostic structural brand mif1.  The SEQUENCE brands
#: (avis, hevc/hevx, msf1) are deliberately absent: image sequences are
#: track-based (moov) per ISO 23008-12 §7 and need not carry an item
#: table at all — they belong to :func:`parse_mp4_meta`'s movie walk
#: (round-14 review: routing them here killed valid animated AVIFs on
#: a missing-meta error).
HEIF_BRANDS = ("avif", "heic", "heix", "heim", "heis", "mif1")


def parse_heif_meta(b: bytes) -> dict:
    """Metadata walk for HEIF-family still images (AVIF/HEIC) — the
    image twin of :func:`parse_mp4_meta`: ``ftyp`` brand, ``meta`` item
    table (``pitm`` primary item, ``iinf``/``infe`` item types), and
    the PRIMARY item's pixel dimensions resolved through the property
    association table (``iprp``/``ipco``/``ipma`` → ``ispe``), per
    ISO 23008-12.  Returns ``brand primary_item item_type n_items
    width height``.  Strict: a missing/malformed item table or an
    unresolvable primary ispe raises — sample DECODE (AV1/HEVC) lives
    in ``operators/libheif_bridge.py`` (system-library bridge, round
    16), not here; this walker stays dependency-free.
    """
    brand = None
    meta_span = None
    for t, s, e in _walk_boxes(b, 0, len(b)):
        if t == b"ftyp":
            if e - s < 4:
                raise ValueError("heif: truncated ftyp")
            brand = b[s : s + 4].decode("latin-1")
        elif t == b"meta":
            _ver, o = _fullbox(b, s, e)
            meta_span = (o, e)
    if brand is None:
        raise ValueError("heif: missing ftyp box")
    if brand not in HEIF_BRANDS:
        raise ValueError(f"heif: {brand!r} is not a HEIF image brand")
    if meta_span is None:
        raise ValueError("heif: missing meta box")
    ms, me = meta_span

    pitm = _find(b, ms, me, b"pitm")
    if pitm is None:
        raise ValueError("heif: missing pitm (primary item)")
    ver, o = _fullbox(b, *pitm)
    if ver == 0:
        if o + 2 > pitm[1]:
            raise ValueError("heif: truncated pitm")
        primary = struct.unpack_from(">H", b, o)[0]
    else:
        if o + 4 > pitm[1]:
            raise ValueError("heif: truncated pitm")
        primary = struct.unpack_from(">I", b, o)[0]

    iinf = _find(b, ms, me, b"iinf")
    if iinf is None:
        raise ValueError("heif: missing iinf (item table)")
    ver, o = _fullbox(b, *iinf)
    cnt_w = 2 if ver == 0 else 4
    if o + cnt_w > iinf[1]:
        raise ValueError("heif: truncated iinf entry count")
    if ver == 0:
        n_items = struct.unpack_from(">H", b, o)[0]
        o += 2
    else:
        n_items = struct.unpack_from(">I", b, o)[0]
        o += 4
    item_types: dict[int, str] = {}
    seen = 0
    for t, s, e in _walk_boxes(b, o, iinf[1]):
        if t != b"infe":
            raise ValueError(f"heif: unexpected {t!r} inside iinf")
        iv, io = _fullbox(b, s, e)
        if iv < 2:
            raise ValueError("heif: infe version < 2 not used by HEIF")
        id_w = 2 if iv == 2 else 4
        if io + id_w + 2 > e:
            raise ValueError("heif: truncated infe item id")
        if iv == 2:
            iid = struct.unpack_from(">H", b, io)[0]
            io += 2
        else:
            iid = struct.unpack_from(">I", b, io)[0]
            io += 4
        io += 2  # item_protection_index
        if io + 4 > e:
            raise ValueError("heif: truncated infe item_type")
        item_types[iid] = b[io : io + 4].decode("latin-1")
        seen += 1
    if seen != n_items:
        raise ValueError(f"heif: iinf declares {n_items} items, holds {seen}")
    if primary not in item_types:
        raise ValueError(f"heif: primary item {primary} not in the item table")

    iprp = _find(b, ms, me, b"iprp")
    if iprp is None:
        raise ValueError("heif: missing iprp (item properties)")
    ipco = _find(b, iprp[0], iprp[1], b"ipco")
    ipma = _find(b, iprp[0], iprp[1], b"ipma")
    if ipco is None or ipma is None:
        raise ValueError("heif: missing ipco/ipma")
    props = list(_walk_boxes(b, *ipco))  # 1-based indexing per spec

    ver, o = _fullbox(b, *ipma)
    flags = int.from_bytes(b[ipma[0] + 1 : ipma[0] + 4], "big")
    wide = flags & 1  # 15-bit property indices
    ipma_end = ipma[1]
    # every read below is bounds-checked against the BOX end (the module
    # contract: malformed input raises ValueError, never escapes as
    # IndexError/struct.error after an unbounded spin — round-14 review);
    # each entry costs >= 3 bytes, so a crafted count fails immediately
    if o + 4 > ipma_end:
        raise ValueError("heif: truncated ipma entry count")
    n_entries = struct.unpack_from(">I", b, o)[0]
    o += 4
    if n_entries * 3 > ipma_end - o:
        raise ValueError(
            f"heif: ipma declares {n_entries} entries, box holds "
            f"{ipma_end - o} bytes"
        )
    assoc: dict[int, list[int]] = {}
    for _ in range(n_entries):
        id_w = 2 if ver < 1 else 4
        if o + id_w + 1 > ipma_end:
            raise ValueError("heif: truncated ipma entry")
        if ver < 1:
            iid = struct.unpack_from(">H", b, o)[0]
        else:
            iid = struct.unpack_from(">I", b, o)[0]
        o += id_w
        cnt = b[o]
        o += 1
        idx_w = 2 if wide else 1
        if o + cnt * idx_w > ipma_end:
            raise ValueError("heif: ipma associations overrun the box")
        idxs = []
        for _ in range(cnt):
            if wide:
                idxs.append(struct.unpack_from(">H", b, o)[0] & 0x7FFF)
            else:
                idxs.append(b[o] & 0x7F)
            o += idx_w
        assoc[iid] = idxs

    width = height = None
    for idx in assoc.get(primary, []):
        if not 1 <= idx <= len(props):
            raise ValueError(f"heif: ipma property index {idx} out of range")
        t, s, e = props[idx - 1]
        if t == b"ispe":
            _v, io = _fullbox(b, s, e)
            if io + 8 > e:
                raise ValueError("heif: truncated ispe")
            width, height = struct.unpack_from(">II", b, io)
            break
    if width is None:
        raise ValueError("heif: primary item has no ispe association")
    return {
        "brand": brand,
        "primary_item": primary,
        "item_type": item_types[primary],
        "n_items": n_items,
        "width": width,
        "height": height,
    }


def write_heif(
    brand: str = "avif",
    width: int = 640,
    height: int = 480,
    n_items: int = 1,
    primary: int = 1,
    wide_ipma: bool = False,
    v1_ids: bool = False,
) -> bytes:
    """HEIF shell writer (fixture twin of :func:`parse_heif_meta`): the
    item/property tables with per-item ``ispe`` boxes — every non-primary
    item gets DIFFERENT dimensions, so a parser that grabs the first
    ispe instead of resolving the ``ipma`` association is caught.
    ``wide_ipma`` exercises 15-bit property indices (flags&1), ``v1_ids``
    the 32-bit item-id forms of pitm/infe/ipma.  Sample data is an
    opaque mdat stub — decode is out of scope."""
    item_type = {"avif": b"av01"}.get(brand, b"hvc1")
    full0 = bytes(4)
    ftyp = _box(b"ftyp", brand.encode("latin-1") + bytes(4) + b"mif1")
    hdlr = _box(b"hdlr", full0 + bytes(4) + b"pict" + bytes(12) + b"\x00")
    if v1_ids:
        pitm = _box(b"pitm", b"\x01" + bytes(3) + struct.pack(">I", primary))
    else:
        pitm = _box(b"pitm", full0 + struct.pack(">H", primary))
    infes = b""
    for i in range(1, n_items + 1):
        if v1_ids:
            body = b"\x03" + bytes(3) + struct.pack(">I", i) + bytes(2)
        else:
            body = b"\x02" + bytes(3) + struct.pack(">H", i) + bytes(2)
        infes += _box(b"infe", body + item_type + b"\x00")
    if v1_ids:
        iinf = _box(b"iinf", b"\x01" + bytes(3) + struct.pack(">I", n_items) + infes)
    else:
        iinf = _box(b"iinf", full0 + struct.pack(">H", n_items) + infes)
    # one ispe per item: property i belongs to item i
    ipco = b""
    for i in range(1, n_items + 1):
        w, h = (width, height) if i == primary else (16 * i, 9 * i)
        ipco += _box(b"ispe", full0 + struct.pack(">II", w, h))
    ipco = _box(b"ipco", ipco)
    ver = 1 if v1_ids else 0
    flags = 1 if wide_ipma else 0
    ipma_body = bytes([ver]) + flags.to_bytes(3, "big")
    ipma_body += struct.pack(">I", n_items)
    for i in range(1, n_items + 1):
        ipma_body += struct.pack(">I", i) if v1_ids else struct.pack(">H", i)
        ipma_body += b"\x01"  # one association
        if wide_ipma:
            ipma_body += struct.pack(">H", 0x8000 | i)  # essential bit set
        else:
            ipma_body += bytes([0x80 | i])
    iprp = _box(b"iprp", ipco + _box(b"ipma", ipma_body))
    meta = _box(b"meta", full0 + hdlr + pitm + iinf + iprp)
    return ftyp + meta + _box(b"mdat", b"\x00" * 16)
