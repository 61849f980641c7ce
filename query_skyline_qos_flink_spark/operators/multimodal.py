"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque ``binary``
column that flows through Arrow record batches into ``mapInPandas`` workers;
decode / feature-extract / resize / frame-sample are per-batch Python
functions over those bytes.  Spark never interprets the payload — schema,
partitioning, batch shape and UDF signatures are the real, tested plumbing.

Codec status — three REAL stdlib-only codecs, no external deps:
:func:`decode_audio` for PCM WAV (stdlib ``wave``); :func:`decode_image`
for 8-bit PNG — all five color types including palette (PLTE),
non-interlaced and Adam7 interlaced (``zlib``/``struct`` + vectorized
numpy unfiltering); :func:`decode_gif` for multi-frame GIF87a/89a
(hand-rolled LZW, global/local color tables, sub-rect compositing,
transparency, interlacing).  They back :func:`extract_audio_meta` /
:func:`extract_image_meta` / :func:`extract_gif_frame_colors`.
JPEG/WebP/mp3/ogg (pillow / ffmpeg) are NOT available in this
environment: pass your own ``decode_fn`` at the clearly-marked
integration points.  :func:`fake_decode_meta` remains as a deterministic
stand-in computed purely from the bytes (length/md5 arithmetic) so the
duckdb oracle can validate the full Spark-side path end to end on
arbitrary payloads.
"""

from __future__ import annotations

import hashlib
import os as _os
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


# ---------------------------------------------------------------------------
# Optional fast codec backends (the declared integration points)
# ---------------------------------------------------------------------------
#
# The from-scratch codecs below make every media query self-contained and
# oracle-gated, but a Python-loop entropy decoder is ~100x slower per core
# than a C codec.  When Pillow (images) or soundfile (audio) is importable,
# the decode seam dispatches to it; the from-scratch codec stays the
# fallback and the correctness reference.  Selection:
#
#   SPARK_GRAFT_IMAGE_BACKEND = auto | builtin | pillow
#
# ``auto`` (default) uses Pillow only for 8-bit-depth PNG, whose decode
# is bit-exact by spec — outputs are hash-identical under either backend
# (tests/test_codec_backends.py).  JPEG and GIF stay on the from-scratch
# codecs even under ``auto``: libjpeg's fixed-point IDCT may legally
# differ by ±1 LSB from the exact float IDCT, and Pillow's GIF plugin
# differs on background fill and disposal-2 restores, so swapping either
# mid-corpus would change frame/perceptual hashes; set ``pillow`` to
# force them (e.g. a 100 TB run that standardizes on libjpeg-turbo
# throughout).  Non-8-bit PNG depths, BMP and ICO always decode
# builtin.


def _image_backend() -> str:
    mode = _os.environ.get("SPARK_GRAFT_IMAGE_BACKEND", "auto").lower()
    if mode not in ("auto", "builtin", "pillow"):
        raise ValueError(f"SPARK_GRAFT_IMAGE_BACKEND must be auto|builtin|pillow, got {mode}")
    if mode == "builtin":
        return "builtin"
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        if mode == "pillow":
            raise ImportError(
                "SPARK_GRAFT_IMAGE_BACKEND=pillow but Pillow is not importable"
            ) from None
        return "builtin"
    return mode  # 'auto' (lossless only) or 'pillow' (everything)


def _decode_image_pillow(payload: bytes) -> tuple[int, int, int, "object"]:
    """Pillow decode normalized to the from-scratch channel conventions:
    palette resolves to RGB, greyscale stays single-channel, alpha kept."""
    import io

    import numpy as np
    from PIL import Image

    im = Image.open(io.BytesIO(payload))
    im.load()
    if im.mode == "P":
        im = im.convert("RGB")
    elif im.mode not in ("L", "LA", "RGB", "RGBA"):
        # raise-don't-degrade: a lossy convert('RGB') here would feed
        # clamped garbage into perceptual hashes.  Non-8-bit PNG depths
        # never reach this path (decode_image sniffs the IHDR depth and
        # keeps them on the builtin decoder); anything else landing in
        # an exotic Pillow mode errors cleanly.
        raise ValueError(
            f"unsupported image mode {im.mode!r} "
            "(8-bit L/LA/RGB/RGBA/palette only)"
        )
    arr = np.asarray(im, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    return h, w, c, arr


def _decode_gif_pillow(payload: bytes) -> tuple[int, int, int, "object"]:
    import io

    import numpy as np
    from PIL import Image, ImageSequence

    im = Image.open(io.BytesIO(payload))
    frames = [
        np.asarray(f.convert("RGB"), dtype=np.uint8)
        for f in ImageSequence.Iterator(im)
    ]
    arr = np.stack(frames)
    n, h, w, _ = arr.shape
    return n, h, w, arr

META_SCHEMA = (
    "n_bytes bigint, content_md5 string, fake_width bigint, fake_height bigint, "
    "fake_frames bigint"
)


def attach_binary(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes of a text
    column in the fixtures; in production this is the raw image/audio
    bytes read from object storage)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


# Adam7 interlace passes: (x0, y0, dx, dy) per the PNG spec §8.2
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _unfilter(raw_arr, bpp: int):
    """Reverse PNG row filters on one (sub-)image: ``raw_arr`` is
    (h, stride+1) uint8 with the filter byte in column 0; returns the
    reconstructed (h, stride) scanlines.

    Numpy-vectorized: Sub is a per-channel-lane cumulative sum mod 256;
    Up is elementwise uint8 add (wraparound is the mod); Average/Paeth
    are inherently sequential in x (out[x] needs out[x-1]) so they loop
    over PIXELS with int32 channel-vector ops."""
    import numpy as np

    h, stride = raw_arr.shape[0], raw_arr.shape[1] - 1
    ftypes = raw_arr[:, 0]
    rows = raw_arr[:, 1:]
    bad = [int(t) for t in np.unique(ftypes) if t > 4]
    if bad:
        raise ValueError(f"bad PNG filter type {bad[0]}")
    if not ftypes.any():
        # all-rows-filter-0 fast path (what the in-repo encoders emit):
        # the unfiltered scanlines ARE the pixels
        return rows.copy()
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype, r = int(ftypes[y]), rows[y]
        if ftype == 0:
            out[y] = r
        elif ftype == 1:  # Sub
            out[y] = np.cumsum(r.reshape(-1, bpp), axis=0, dtype=np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            out[y] = r + prev  # uint8 wraparound == mod 256
        elif ftype == 3:  # Average
            rr = r.reshape(-1, bpp).astype(np.int32)
            pv = prev.reshape(-1, bpp).astype(np.int32)
            o = np.empty_like(rr)
            left = np.zeros(bpp, dtype=np.int32)
            for x in range(rr.shape[0]):
                left = (rr[x] + ((left + pv[x]) >> 1)) & 0xFF
                o[x] = left
            out[y] = o.astype(np.uint8).reshape(-1)
        else:  # Paeth
            rr = r.reshape(-1, bpp).astype(np.int32)
            pv = prev.reshape(-1, bpp).astype(np.int32)
            o = np.empty_like(rr)
            left = np.zeros(bpp, dtype=np.int32)
            upleft = np.zeros(bpp, dtype=np.int32)
            for x in range(rr.shape[0]):
                up = pv[x]
                p = left + up - upleft
                pa = np.abs(p - left)
                pb = np.abs(p - up)
                pc = np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                )
                left = (rr[x] + pred) & 0xFF
                o[x] = left
                upleft = up
            out[y] = o.astype(np.uint8).reshape(-1)
        prev = out[y]
    return out


def decode_bmp(payload: bytes) -> tuple[int, int, int, "object"]:
    """REAL codec for uncompressed Windows BMP (BITMAPINFOHEADER and the
    V4/V5 extensions, which share its leading fields): returns
    (height, width, channels, ndarray[h, w, c] uint8).

    Supports 1/4/8-bit palette images (BGRA quad color table, sub-8
    indices packed MSB-first), 24-bit BGR and 32-bit BGRA/BGRX (the
    fourth byte is returned as alpha verbatim), bottom-up and top-down
    (negative height) row orders, and the 4-byte row stride padding.
    RLE and BITFIELDS compressions raise ``ValueError`` — rare in data
    payloads, a declared external-decoder seam."""
    import struct as _struct

    import numpy as np

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    (data_off,) = _struct.unpack_from("<I", payload, 10)
    (hdr_size,) = _struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError("BMP: OS/2 core headers unsupported")
    w, h_signed = _struct.unpack_from("<ii", payload, 18)
    planes, bpp = _struct.unpack_from("<HH", payload, 26)
    (compression,) = _struct.unpack_from("<I", payload, 30)
    (clr_used,) = _struct.unpack_from("<I", payload, 46)
    if compression != 0:
        raise ValueError(f"BMP compression {compression} unsupported (RLE/bitfields)")
    if bpp not in (1, 4, 8, 24, 32):
        raise ValueError(f"BMP bit depth {bpp} unsupported")
    if w <= 0 or h_signed == 0:
        raise ValueError("BMP dimensions out of range")
    h = abs(h_signed)
    top_down = h_signed < 0
    stride = (w * bpp + 31) // 32 * 4
    px = payload[data_off : data_off + stride * h]
    if len(px) != stride * h:
        raise ValueError("BMP pixel data truncated")
    rows = np.frombuffer(px, dtype=np.uint8).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp in (1, 4, 8):
        n_colors = clr_used or (1 << bpp)
        pal_off = 14 + hdr_size
        quads = payload[pal_off : pal_off + 4 * n_colors]
        if len(quads) != 4 * n_colors:
            raise ValueError("BMP color table truncated")
        pal = np.frombuffer(quads, dtype=np.uint8).reshape(-1, 4)[:, :3][:, ::-1]
        if bpp == 8:
            idx = rows[:, :w]
        else:
            bits = np.unpackbits(rows, axis=1)[:, : w * bpp]
            if bpp == 1:
                idx = bits
            else:
                idx = (
                    bits.reshape(h, w, 4)
                    * (1 << np.arange(3, -1, -1, dtype=np.uint8))
                ).sum(axis=2).astype(np.uint8)
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("BMP palette index out of range")
        return h, w, 3, np.ascontiguousarray(pal[idx])
    nch = bpp // 8
    arr = rows[:, : w * nch].reshape(h, w, nch)
    if nch == 3:
        out = arr[..., ::-1]  # BGR -> RGB
    else:
        out = arr[..., [2, 1, 0, 3]]  # BGRA -> RGBA
    return h, w, nch, np.ascontiguousarray(out)


def decode_tiff(payload: bytes) -> tuple[int, int, int, "object"]:
    """REAL codec for baseline uncompressed TIFF (TIFF 6.0 §2-8, the
    scanned-document / raw-export shape crawls carry): both byte orders
    (``II``/``MM``), IFD0, Compression=1, chunky planar config, 8 bits
    per sample, 1/3/4 samples per pixel (grey / RGB / RGBA), any
    strip layout (RowsPerStrip + StripOffsets/StripByteCounts, SHORT or
    LONG).  Returns (height, width, channels, ndarray[h, w, c] uint8).
    LZW/PackBits/JPEG-in-TIFF compression, tiles, planar=2 and other
    bit depths raise — a declared external-decoder seam."""
    import struct as _struct

    import numpy as np

    if payload[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("tiff: bad byte-order/magic header")
    bo = "<" if payload[:2] == b"II" else ">"

    # every read is bounds-checked so a corrupt crawl object surfaces as
    # the documented ValueError, never struct.error/IndexError escaping a
    # mapInPandas task (round-12 review; same policy as the PNG/RIFF
    # paths' zlib.error/struct.error wrapping)
    def u16(o):
        if o + 2 > len(payload):
            raise ValueError(f"tiff: truncated read at byte {o}")
        return _struct.unpack_from(bo + "H", payload, o)[0]

    def u32(o):
        if o + 4 > len(payload):
            raise ValueError(f"tiff: truncated read at byte {o}")
        return _struct.unpack_from(bo + "I", payload, o)[0]

    ifd = u32(4)
    if ifd + 2 > len(payload):
        raise ValueError("tiff: IFD offset out of bounds")
    n = u16(ifd)
    if ifd + 2 + 12 * n > len(payload):
        raise ValueError("tiff: truncated IFD")
    _TYPE_SIZE = {1: 1, 3: 2, 4: 4}

    def values(off) -> list[int]:
        typ, cnt = u16(off + 2), u32(off + 4)
        sz = _TYPE_SIZE.get(typ)
        if sz is None:
            raise ValueError(f"tiff: unsupported field type {typ}")
        at = off + 8 if sz * cnt <= 4 else u32(off + 8)
        if at + sz * cnt > len(payload):
            raise ValueError("tiff: field values out of bounds")
        rd = {1: lambda o: payload[o], 3: u16, 4: u32}[typ]
        return [rd(at + i * sz) for i in range(cnt)]

    tags = {}
    for i in range(n):
        off = ifd + 2 + 12 * i
        tags[u16(off)] = off
    def need(t, name):
        vals = values(tags[t]) if t in tags else None
        if not vals:  # absent OR a degenerate count=0 field
            raise ValueError(f"tiff: missing required tag {name}")
        return vals

    def opt1(t, default):
        if t not in tags:
            return default
        vals = values(tags[t])
        if not vals:
            raise ValueError(f"tiff: tag {t} present with count 0")
        return vals[0]

    w = need(256, "ImageWidth")[0]
    h = need(257, "ImageLength")[0]
    if w == 0 or h == 0:
        raise ValueError("tiff: zero-pixel image")
    comp = opt1(259, 1)
    if comp != 1:
        raise ValueError(
            f"tiff: compression {comp} is behind the external-decoder seam "
            "(only baseline uncompressed decodes natively)"
        )
    spp = opt1(277, 1)
    if spp not in (1, 3, 4):
        raise ValueError(f"tiff: unsupported SamplesPerPixel {spp}")
    bps = values(tags[258]) if 258 in tags else [1]
    if any(x != 8 for x in bps):
        raise ValueError(f"tiff: only 8 bits/sample decodes natively (got {bps})")
    if opt1(284, 1) != 1:
        raise ValueError("tiff: planar configuration 2 is not supported")
    # PhotometricInterpretation (round-12 review): 0 WhiteIsZero inverts,
    # 1 BlackIsZero / 2 RGB pass through, 3 palette and beyond are the
    # external-decoder seam — decoding indices as gray would be a silent
    # wrong answer, the one thing the policy forbids
    photometric = opt1(262, 1 if spp == 1 else 2)
    if photometric not in (0, 1, 2):
        raise ValueError(
            f"tiff: photometric {photometric} (palette/CMYK/YCbCr) is "
            "behind the external-decoder seam"
        )
    rows_per_strip = opt1(278, h)
    if rows_per_strip == 0:
        raise ValueError("tiff: zero RowsPerStrip")
    offsets = need(273, "StripOffsets")
    counts = need(279, "StripByteCounts")
    if len(offsets) != len(counts):
        raise ValueError("tiff: StripOffsets/StripByteCounts length mismatch")
    expected_strips = -(-h // rows_per_strip) if h else 0
    if len(offsets) != expected_strips:
        raise ValueError(
            f"tiff: {len(offsets)} strips but {expected_strips} expected "
            f"for {h} rows at {rows_per_strip} rows/strip"
        )
    data = bytearray()
    for row0, (o, c) in enumerate(zip(offsets, counts)):
        if o + c > len(payload):
            raise ValueError("tiff: strip out of bounds")
        rows_here = min(rows_per_strip, h - row0 * rows_per_strip)
        if c != rows_here * w * spp:
            raise ValueError("tiff: strip byte count disagrees with geometry")
        data += payload[o : o + c]
    arr = np.frombuffer(bytes(data), dtype=np.uint8).reshape(h, w, spp)
    if photometric == 0:  # WhiteIsZero: baseline-required inversion
        arr = 255 - arr
    return h, w, spp, np.ascontiguousarray(arr)


def encode_tiff(
    arr, little_endian: bool = True, rows_per_strip: int | None = None
) -> bytes:
    """Baseline uncompressed TIFF writer (the :func:`decode_tiff` twin
    for fixtures/round-trips): chunky, 8 bits/sample, strip layout
    controlled by ``rows_per_strip``."""
    import struct as _struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, spp = a.shape
    if spp not in (1, 3, 4):
        raise ValueError("tiff: 1/3/4 channels only")
    rps = rows_per_strip or h
    bo = "<" if little_endian else ">"
    strips = [a[r : r + rps].tobytes() for r in range(0, h, rps)]
    entries = []  # (tag, type, count, value_or_bytes)
    # data layout: header(8) + IFD + value spillover + strips
    def entry(tag, typ, vals):
        entries.append((tag, typ, vals))

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [8] * spp)
    entry(259, 3, [1])
    entry(262, 3, [1 if spp == 1 else 2])  # PhotometricInterpretation
    entry(277, 3, [spp])
    entry(278, 4, [rps])
    entry(273, 4, None)  # resolved to the strip offsets below
    entry(279, 4, [len(s) for s in strips])
    entries.sort(key=lambda e: e[0])
    n = len(entries)
    ifd_at = 8
    spill_at = ifd_at + 2 + 12 * n + 4
    _TS = {3: 2, 4: 4}
    # spill size depends only on value COUNTS (273's count = n strips),
    # so the whole layout is known before any bytes are emitted — one
    # emission pass, no placeholder/patch coupling (round-12 review)
    count_of = lambda vals: len(strips) if vals is None else len(vals)
    spill_len = sum(
        _TS[typ] * count_of(vals)
        for _tag, typ, vals in entries
        if _TS[typ] * count_of(vals) > 4
    )
    strips_at = spill_at + spill_len
    offs, pos = [], strips_at
    for s in strips:
        offs.append(pos)
        pos += len(s)
    out = bytearray()
    out += (b"II*\x00" if little_endian else b"MM\x00*")
    out += _struct.pack(bo + "I", ifd_at)
    out += _struct.pack(bo + "H", n)
    spill = bytearray()
    for tag, typ, vals in entries:
        if vals is None:
            vals = offs
        fmt = "H" if typ == 3 else "I"
        out += _struct.pack(bo + "HHI", tag, typ, len(vals))
        packed = b"".join(_struct.pack(bo + fmt, v) for v in vals)
        if len(packed) <= 4:
            out += packed + bytes(4 - len(packed))
        else:
            out += _struct.pack(bo + "I", spill_at + len(spill))
            spill += packed
    out += _struct.pack(bo + "I", 0)  # next-IFD pointer
    out += spill
    for s in strips:
        out += s
    return bytes(out)


def decode_ico(payload: bytes) -> tuple[int, int, int, "object"]:
    """REAL codec for ICO/CUR favicons: returns the LARGEST image's
    (height, width, channels, ndarray) — the favicon-crawl convention.

    Each directory entry is either a full PNG stream (decoded via
    :func:`decode_image`) or a headerless BMP DIB whose height field
    counts BOTH the XOR color image and the 1-bit AND transparency mask
    (halved here; for <32-bpp entries the AND mask is applied as alpha).
    Built entirely on :func:`decode_bmp` by synthesizing the missing
    BITMAPFILEHEADER."""
    import struct as _struct

    import numpy as np

    if len(payload) < 6 or payload[:4] not in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        raise ValueError("not an ICO/CUR payload")
    (count,) = _struct.unpack_from("<H", payload, 4)
    if count == 0:
        raise ValueError("ICO has no images")
    best = None
    best_key = None
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(payload):
            raise ValueError("ICO directory truncated")
        bw, bh = payload[off], payload[off + 1]
        w = bw or 256  # 0 means 256
        h = bh or 256
        (bits,) = _struct.unpack_from("<H", payload, off + 6)
        size, img_off = _struct.unpack_from("<II", payload, off + 8)
        # area first, bit depth as the tie-break (the icon-loader
        # convention: a 48x48 set lists 4/8/32-bpp variants — pick the
        # richest, r12 third review)
        key = (w * h, bits)
        if best_key is None or key > best_key:
            best, best_key = (w, h, img_off, size), key
    w, h, img_off, size = best
    img = payload[img_off : img_off + size]
    if len(img) != size:
        raise ValueError("ICO image data truncated")
    if img[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_image(img)
    # headerless DIB: height counts XOR + AND mask rows — halve it and
    # re-wrap with a synthetic BITMAPFILEHEADER for decode_bmp
    if len(img) < 40:
        raise ValueError("ICO DIB truncated")
    (hdr_size,) = _struct.unpack_from("<I", img, 0)
    dib_w, dib_h2 = _struct.unpack_from("<ii", img, 4)
    _planes, bpp = _struct.unpack_from("<HH", img, 12)
    dib_h = dib_h2 // 2 if dib_h2 > 0 else -((-dib_h2) // 2)
    fixed = bytearray(img)
    _struct.pack_into("<i", fixed, 8, dib_h)
    (clr_used,) = _struct.unpack_from("<I", img, 32)
    if clr_used > 256 or hdr_size > len(img):
        # ValueError, not a struct.error from an overflowed synthetic
        # file header (r12 third review — the r11 RIFF contract)
        raise ValueError("ICO DIB color table / header size out of range")
    n_colors = clr_used or ((1 << bpp) if bpp <= 8 else 0)
    xor_stride = (dib_w * bpp + 31) // 32 * 4
    data_off = 14 + hdr_size + 4 * n_colors
    bmp = (
        b"BM"
        + _struct.pack("<IHHI", 14 + len(fixed), 0, 0, data_off)
        + bytes(fixed)
    )
    hh, ww, cc, arr = decode_bmp(bmp)
    # the 1-bit AND mask follows the XOR rows: set bit = transparent.
    # It applies to every sub-32-bpp entry AND to legacy 32-bpp BGRX
    # icons whose alpha bytes are all zero (the pre-Vista renderer
    # convention: all-zero alpha means "use the AND mask" — without
    # this the icon decodes fully transparent, r12 third review)
    and_off = hdr_size + 4 * n_colors + xor_stride * abs(dib_h)
    and_stride = (dib_w + 31) // 32 * 4
    need = and_stride * abs(dib_h)
    if cc == 4 and int(arr[..., 3].max(initial=0)) == 0 and len(img) >= and_off + need:
        arr = arr[..., :3]
        cc = 3
    if cc == 3 and len(img) >= and_off + need:
        rows = np.frombuffer(
            img[and_off : and_off + need], dtype=np.uint8
        ).reshape(abs(dib_h), and_stride)
        if dib_h2 > 0:
            rows = rows[::-1]
        mask = np.unpackbits(rows, axis=1)[:, :dib_w]
        alpha = np.where(mask == 1, 0, 255).astype(np.uint8)
        arr = np.concatenate([arr[..., :3], alpha[..., None]], axis=2)
        cc = 4
    return hh, ww, cc, arr


def _jpeg_sof(payload: bytes) -> tuple[int, int]:
    """(SOF marker, sample precision) from the first SOF segment
    ((0xC0, 8) on any parse trouble — the caller's decoder will raise
    the real error)."""
    import struct as _struct

    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return 0xC0, 8
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return marker, payload[pos + 4] if pos + 4 < len(payload) else 8
        if pos + 4 > len(payload):
            return 0xC0, 8
        (ln,) = _struct.unpack(">H", payload[pos + 2 : pos + 4])
        pos += 2 + ln
    return 0xC0, 8


def _jpeg_precision(payload: bytes) -> int:
    """Sample precision from the first SOF marker (8 on any parse
    trouble)."""
    return _jpeg_sof(payload)[1]


def decode_image(payload: bytes) -> tuple[int, int, int, "object"]:
    """REAL codec for PNG (stdlib ``zlib``/``struct`` — no external
    libs): returns (height, width, channels, ndarray[h, w, c] uint8).

    Supports every spec-valid (depth, color type) combination — depths
    1/2/4 (packed, MSB-first; greyscale scales to 8-bit, palette
    indices resolve through PLTE), 8, and 16 (reduced to 8 bits via the
    standard high-byte take) across color types 0 greyscale, 2 RGB,
    3 palette (a tRNS alpha table is ignored), 4 grey+alpha, 6 RGBA —
    both non-interlaced and Adam7 interlaced.  JPEG payloads (FFD8 magic) dispatch to
    :func:`decode_jpeg` — baseline AND progressive, any chroma
    subsampling.  WebP dispatches to :func:`..webp.decode_webp` —
    lossless VP8L natively, lossy VP8 through the system libwebp
    (``operators/libwebp_bridge.py``) when that library is present.
    BMP payloads (BM magic) dispatch to :func:`decode_bmp`
    (uncompressed 1/4/8-bit palette + 24/32-bit); TIFF (II*/MM* magic)
    to :func:`decode_tiff` (baseline uncompressed, both byte orders,
    any strip layout); ICO/CUR favicons to
    :func:`decode_ico` (largest entry, PNG or headerless DIB + AND
    mask).  Arithmetic-coded JPEG (SOF9) decodes natively through the
    T.81 QM coder (``operators/jpeg_arith.py``, round-16 seam closure);
    RLE/bitfields BMP and compressed/tiled TIFF still need an
    external decoder (e.g.
    pillow) — pass your own ``decode_fn`` for those.  Raises
    ``ValueError`` on unrecognized or unsupported payloads.

    When Pillow is importable the PNG branch dispatches to it (bit-exact,
    C-speed); see ``SPARK_GRAFT_IMAGE_BACKEND`` at the top of this module
    for the JPEG policy."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    backend = _image_backend()
    if payload[:2] == b"\xff\xd8":
        # explicit opt-in only (IDCT LSB drift) — but Pillow's JPEG
        # plugin is 8-bit-only, so 12-bit (SOF precision 12) streams
        # stay on the builtin decoder even under the pillow backend
        # (r12 review: the 12-bit fixture class crashed pillow-backend
        # deployments mid-task)
        # 12-bit and arithmetic-coded (SOF9/SOF10) streams stay on the
        # builtin decoder even under the pillow backend: Pillow's JPEG
        # plugin is 8-bit Huffman-only
        sof_marker, sof_prec = _jpeg_sof(payload)
        if backend == "pillow" and sof_prec == 8 and sof_marker not in (0xC9, 0xCA):
            return _decode_image_pillow(payload)
        return decode_jpeg(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .webp import decode_webp  # lossless VP8L from scratch

        return decode_webp(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff(payload)
    if payload[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        return decode_ico(payload)
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        # AVIF/HEIC still image: the pixel layer is an AV1/HEVC
        # bitstream — decoded through the system libheif when present
        # (operators/libheif_bridge.py, the lossy-VP8/libwebp pattern);
        # the container METADATA layer parses without it (mp4.py)
        from . import libheif_bridge

        if libheif_bridge.available():
            return libheif_bridge.decode_heif(payload)
        raise ValueError(
            "HEIF/AVIF pixel decode needs the system libheif "
            "(container metadata parses via operators/mp4.py)"
        )
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError(
            "not a PNG, JPEG, WebP, BMP, TIFF, ICO or HEIF (bad signature)"
        )
    # IHDR is mandatory-first (PNG §11.2.2): byte 24 is the bit depth.
    # Pillow's PNG modes for depth 1 ('1') and 16 ('I'/'I;16') fall
    # outside the normalized L/LA/RGB/RGBA contract, so non-8-bit
    # depths stay on the builtin decoder under every backend — the
    # same cross-environment-determinism policy as 12-bit JPEG (r12
    # review: identical payloads must never decode in one executor and
    # raise in another depending on an installed library).
    if backend != "builtin" and len(payload) > 24 and payload[24] == 8:
        return _decode_image_pillow(payload)
    pos, w = 8, None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(payload):
        (ln,) = _struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = _struct.unpack(">IIBBBBB", data)
            if depth not in (1, 2, 4, 8, 16) or interlace > 1:
                raise ValueError(f"unsupported PNG: depth={depth} interlace={interlace}")
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {ctype}")
            # spec-valid depth/type combinations (PNG §11.2.2)
            if depth < 8 and ctype not in (0, 3):
                raise ValueError(f"PNG depth {depth} invalid for color type {ctype}")
            if depth == 16 and ctype == 3:
                raise ValueError("PNG 16-bit palette is not a valid combination")
        elif tag == b"PLTE":
            if len(data) % 3:
                raise ValueError("PNG PLTE length not a multiple of 3")
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    try:
        raw = _zlib.decompress(bytes(idat))
    except _zlib.error as exc:
        # contract: ValueError on malformed payloads — a leaking
        # zlib.error would kill the Spark task instead of erroring
        # cleanly (same class as the r11 struct.error fix in the RIFF
        # reader; surfaced by the r12 missing-IDAT test)
        raise ValueError(f"PNG IDAT stream corrupt: {exc}") from None
    # PNG filtering operates on BYTES: bpp (the filter's left-neighbor
    # distance) is the byte width of one pixel, floored at 1 for the
    # packed sub-8-bit depths (PNG §7.2)
    bits_pp = channels * depth
    bpp = max(1, bits_pp // 8)

    def _rows_to_samples(rows_2d, width):
        """(rows, stride) unfiltered bytes -> (rows, width, channels)
        uint8 samples: unpack sub-8-bit (MSB-first), take the high byte
        of 16-bit (the standard 8-bit reduction, like the 12-bit JPEG
        path's >>4), pass 8-bit through."""
        rows = rows_2d.shape[0]
        if depth == 8:
            return rows_2d.reshape(rows, width, channels)
        if depth == 16:
            return rows_2d.reshape(rows, width, channels, 2)[..., 0]
        bits = np.unpackbits(rows_2d, axis=1)[:, : width * depth]
        if depth == 1:
            s = bits
        else:
            s = (
                bits.reshape(rows, width, depth)
                * (1 << np.arange(depth - 1, -1, -1, dtype=np.uint8))
            ).sum(axis=2).astype(np.uint8)
        return s.reshape(rows, width, 1)

    if interlace == 0:
        stride = -(-w * bits_pp // 8)
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG data length mismatch")
        raw_arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
        out = _rows_to_samples(_unfilter(raw_arr, bpp), w)
    else:
        # Adam7: seven independently-filtered sub-images, scattered back
        # onto the full grid by each pass's (origin, step) lattice
        out = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = -(-pw * bits_pp // 8)
            need = ph * (pstride + 1)
            if off + need > len(raw):
                raise ValueError("PNG interlaced data length mismatch")
            block = np.frombuffer(raw[off : off + need], dtype=np.uint8).reshape(
                ph, pstride + 1
            )
            off += need
            sub = _rows_to_samples(_unfilter(block, bpp), pw)
            out[y0::dy, x0::dx] = sub
        if off != len(raw):
            raise ValueError("PNG interlaced data length mismatch")
    if ctype == 0 and depth < 8:
        out = out * np.uint8(255 // ((1 << depth) - 1))  # 1/2/4-bit grey scale-up
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idx = out.reshape(h, w)
        if int(idx.max(initial=0)) >= len(palette):
            # out-of-range indices decode as BLACK, matching Pillow's
            # zero-padded 256-entry palette: the 8-bit pillow dispatch
            # means a strict raise here would make the same payload
            # decode in a Pillow executor and fail in a bare one —
            # cross-environment determinism wins (r12 third review;
            # the first-pass fix raised, trading an IndexError crash
            # for an environment-dependent ValueError)
            pad = np.zeros((256, 3), dtype=np.uint8)
            pad[: len(palette)] = palette
            palette = pad
        out = palette[idx]
        channels = 3
    return h, w, channels, out


IMAGE_META_SCHEMA = (
    "height bigint, width bigint, n_channels bigint, n_pixels bigint, mean_luma double"
)


def extract_image_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode_fn: Callable[[bytes], tuple] = decode_image,
) -> DataFrame:
    """Image twin of :func:`extract_audio_meta`, default-wired to the REAL
    stdlib PNG decoder: (height, width, channels, pixel count, mean pixel
    value) per payload, batch-wise through Arrow."""
    id_field = df.schema[id_col]
    schema = f"{id_col} {id_field.dataType.simpleString()}, {IMAGE_META_SCHEMA}"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for p in pdf[payload_col]:
                h, w, c, arr = decode_fn(bytes(p))
                rows.append((h, w, c, h * w, float(arr.mean())))
            out = pd.DataFrame(
                rows, columns=["height", "width", "n_channels", "n_pixels", "mean_luma"]
            )
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    # NULL payloads are excluded (engine policy, like NULL skyline dims)
    return df.where(F.col(payload_col).isNotNull()).select(id_col, payload_col).mapInPandas(fn, schema=schema)


AUDIO_META_SCHEMA = (
    "n_channels bigint, sample_rate bigint, n_frames bigint, duration_ms bigint, "
    "peak_amplitude bigint"
)


def decode_audio(payload: bytes) -> tuple[int, int, int, int, int]:
    """REAL codec for WAV (no external libs): returns (n_channels,
    sample_rate, n_frames, duration_ms, peak_amplitude).

    PCM WAV uses the stdlib ``wave`` path (exact and allocation-bound);
    G.711 mu-law / A-law and IMA ADPCM WAVs — the compressed tags
    ``wave`` rejects — expand through the from-scratch
    :func:`decode_wav_samples` RIFF reader; FLAC through the
    from-scratch :mod:`.flac` codec (lossless, fully self-describing —
    no soundfile needed).  Remaining compressed formats (mp3/ogg)
    dispatch to ``soundfile`` when it is importable — otherwise pass
    your own ``decode_fn``.  Raises ``wave.Error`` on payloads no
    installed backend recognizes."""
    import io
    import struct as _struct
    import wave

    try:
        wav = wave.open(io.BytesIO(payload), "rb")
    except wave.Error as wave_err:
        if payload[:4] == b"fLaC":
            import numpy as np

            from .flac import decode_flac

            try:
                nch, sr, samples = decode_flac(payload)
            except ValueError:
                # stream shape the from-scratch decoder rejects (e.g. a
                # CRC mismatch libFLAC would tolerate-and-log): fall
                # THROUGH to soundfile below rather than giving up —
                # same r11-regression lesson as the RIFF branch under
                # this one (an early re-raise here would mask an
                # installed backend that can decode it)
                pass
            else:
                nf = samples.shape[0]
                peak = int(np.abs(samples.astype(np.int64)).max()) if nf else 0
                return nch, sr, nf, nf * 1000 // sr if sr else 0, peak
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            import numpy as np

            try:
                nch, sr, samples = decode_wav_samples(payload)
            except ValueError:
                # tag/structure the from-scratch reader doesn't cover
                # (IEEE-float, EXTENSIBLE, GSM, truncated fmt, ...): fall
                # THROUGH to soundfile below rather than giving up — an
                # installed backend may still decode it (r11 review: the
                # early re-raise here regressed soundfile-decodable WAVs)
                pass
            else:
                nf = samples.shape[0]
                peak = int(np.abs(samples.astype(np.int64)).max()) if nf else 0
                return nch, sr, nf, nf * 1000 // sr if sr else 0, peak
        try:
            import soundfile as _sf
        except ImportError:
            raise wave_err from None  # no fallback decoder installed
        import numpy as np

        try:
            data, sr = _sf.read(io.BytesIO(payload), dtype="int16", always_2d=True)
        except Exception:
            # contract: wave.Error when NO installed backend recognizes
            # the payload — callers filter on wave.Error, and a leaking
            # LibsndfileError would kill the task instead
            raise wave_err from None
        nf, nch = data.shape
        peak = int(np.abs(data.astype(np.int64)).max()) if nf else 0
        return nch, sr, nf, nf * 1000 // sr if sr else 0, peak
    with wav as w:
        nch = w.getnchannels()
        sr = w.getframerate()
        nf = w.getnframes()
        sw = w.getsampwidth()
        raw = w.readframes(nf)
    if sw == 2:
        samples = _struct.unpack(f"<{len(raw) // 2}h", raw)
        peak = max((abs(s) for s in samples), default=0)
    elif sw == 1:  # 8-bit WAV is unsigned, centered at 128
        peak = max((abs(b - 128) for b in raw), default=0)
    else:  # 24/32-bit: bytes-level max as a cheap envelope proxy
        peak = max(raw, default=0)
    duration_ms = nf * 1000 // sr if sr else 0
    return nch, sr, nf, duration_ms, peak


def extract_audio_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode_fn: Callable[[bytes], tuple] = decode_audio,
) -> DataFrame:
    """Audio twin of :func:`extract_media_meta`, default-wired to the REAL
    stdlib WAV decoder: binary payloads flow through Arrow into
    ``mapInPandas`` batches, one metadata row out per payload."""
    id_field = df.schema[id_col]
    schema = f"{id_col} {id_field.dataType.simpleString()}, {AUDIO_META_SCHEMA}"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            metas = [decode_fn(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(
                metas,
                columns=[
                    "n_channels",
                    "sample_rate",
                    "n_frames",
                    "duration_ms",
                    "peak_amplitude",
                ],
            )
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    # NULL payloads are excluded (engine policy, like NULL skyline dims)
    return df.where(F.col(payload_col).isNotNull()).select(id_col, payload_col).mapInPandas(fn, schema=schema)


def fake_decode_meta(payload: bytes) -> tuple[int, str, int, int, int]:
    """Deterministic stand-in 'decode': metadata derived only from bytes."""
    n = len(payload)
    md5 = hashlib.md5(payload).hexdigest()
    return n, md5, n % 640, (n * 7) % 480, n % 16 + 1


def extract_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode_fn: Callable[[bytes], tuple] = fake_decode_meta,
) -> DataFrame:
    """Per-payload metadata via mapInPandas (Arrow binary batches).

    ``decode_fn`` is the integration point for real codecs; the default is
    the deterministic fake so the plumbing is testable without media libs.
    """
    id_field = df.schema[id_col]
    schema = f"{id_col} {id_field.dataType.simpleString()}, {META_SCHEMA}"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            metas = [decode_fn(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(
                metas,
                columns=["n_bytes", "content_md5", "fake_width", "fake_height", "fake_frames"],
            )
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    # NULL payloads are excluded (engine policy, like NULL skyline dims)
    return df.where(F.col(payload_col).isNotNull()).select(id_col, payload_col).mapInPandas(fn, schema=schema)


def fake_frame_digest(payload: bytes, frame_idx: int) -> str:
    """Deterministic stand-in for 'decode frame i and fingerprint it'."""
    return hashlib.md5(payload + b":" + str(frame_idx).encode()).hexdigest()


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    n_frames_col: str = "fake_frames",
    id_col: str = "doc_id",
    max_frames: int = 4,
    frame_fn: Callable[[bytes, int], str] = fake_frame_digest,
) -> DataFrame:
    """Video-style frame sampling plumbing: explode each payload into up to
    ``max_frames`` evenly-strided frames (``idx_j = j * n_frames div
    n_samples``, integer arithmetic -> SQL-replicable), one output row per
    frame, processed batch-wise in ``mapInPandas``.

    ``frame_fn`` is the real-decoder integration point (ffmpeg frame
    extraction in production); the default hashes payload+index so the
    Spark-side fan-out — the part that matters for partitioning and
    shuffle volume — is testable and oracle-checkable without codecs.
    Output grows ×``min(max_frames, n_frames)`` per row; at scale, cap
    partition input sizes via ``spark.sql.files.maxPartitionBytes`` so the
    exploded Arrow batches stay within executor memory."""
    id_field = df.schema[id_col]
    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        "frame_idx bigint, frame_md5 string"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, idxs, digests = [], [], []
            for rid, payload, nf in zip(
                pdf[id_col], pdf[payload_col], pdf[n_frames_col]
            ):
                b = bytes(payload)
                ns = min(max_frames, int(nf))
                for j in range(ns):
                    fi = j * int(nf) // ns
                    ids.append(rid)
                    idxs.append(fi)
                    digests.append(frame_fn(b, fi))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_md5": digests}
            )

    # NULL payloads are excluded (engine policy, like NULL skyline dims)
    return df.where(F.col(payload_col).isNotNull()).select(id_col, payload_col, n_frames_col).mapInPandas(fn, schema=schema)


# ---------------------------------------------------------------------------
# Deterministic synthetic payloads (REAL codec fixtures, closed-form truth)
# ---------------------------------------------------------------------------
#
# The parquet fixtures carry no media columns, so corpus queries that must
# exercise the REAL PNG/WAV codecs synthesize payloads from integer keys
# with closed-form ground truth: every derived feature (hash bits, frame
# counts, peak amplitude) is an integer function of the key that a SQL
# oracle can recompute WITHOUT decoding — which turns the full
# encode -> Arrow -> decode -> feature path into a hash-checkable query
# instead of a rows-only one.

AHASH_GRID = 8  # 8x8 blocks -> 64-bit average-hash

# Payloads are pure functions of (key, args) and key_mod folds many rows
# onto few classes, so each distinct payload is encoded once per Python
# worker instead of once per row (np.kron + zlib per row is the hot loop).
from functools import lru_cache as _lru_cache  # noqa: E402


def _md5_block_pixels(key: int, flip_block: int | None, on: int, off: int,
                      block_px: int = 8):
    """The 64-bit md5 block pattern EVERY synth image fixture shares:
    block i is ``on`` iff bit i of ``md5("img{key}")`` is set, else
    ``off``; ``flip_block`` inverts one bit — the Hamming-1 near-dup
    twin.  One home so the PNG / JPEG / twin fixtures can never silently
    diverge on the pattern contract."""
    import numpy as np

    bits = int(hashlib.md5(f"img{key}".encode()).hexdigest()[:16], 16)
    if flip_block is not None:
        bits ^= 1 << (63 - flip_block)
    blocks = np.array(
        [(bits >> (63 - i)) & 1 for i in range(AHASH_GRID * AHASH_GRID)], dtype=np.uint8
    ).reshape(AHASH_GRID, AHASH_GRID)
    return np.kron(
        blocks * (on - off) + off, np.ones((block_px, block_px), dtype=np.uint8)
    )


@_lru_cache(maxsize=4096)
def synth_png_payload(key: int, block_px: int = 8, flip_block: int | None = None) -> bytes:
    """64×64 greyscale PNG whose 8×8 block pattern encodes 64 bits derived
    from ``md5("img{key}")`` — block (i, j) is white iff bit ``i*8+j`` is
    set.  By construction :func:`image_ahash` of this image recovers
    exactly those 64 bits (white=255 ≥ mean > black=0 whenever both colors
    occur; md5 bits are never all-zero/all-one for the keys we use, which
    tests pin).  ``flip_block`` inverts one block — a Hamming-1
    perturbation of the class image, for near-dup fixtures."""
    import struct as _struct
    import zlib as _zlib

    pix = _md5_block_pixels(key, flip_block, on=255, off=0, block_px=block_px)
    h, w = pix.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            _struct.pack(">I", len(data))
            + tag
            + data
            + _struct.pack(">I", _zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit greyscale
    raw = b"".join(b"\x00" + pix[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


@_lru_cache(maxsize=4096)
def synth_wav_payload(key: int, sample_rate: int = 8000) -> bytes:
    """Mono audio payload with closed-form truth: ``n_frames = 800 +
    (key % 5) * 160`` alternating ±``amp`` square-wave samples where
    ``amp = 2000 + (key % 7) * 1000``; ``duration_ms = n_frames // 8``
    (sr 8000).

    The ENCODING rotates by key class so the oracle-gated audio query
    drives every real decode path: ``key % 4 == 1`` emits a G.711
    mu-law WAV (format tag 7), ``key % 4 == 2`` an A-law WAV (tag 6),
    ``key % 4 == 3`` a FLAC stream (from-scratch :mod:`.flac` codec —
    LOSSLESS, so its peak is exactly ``amp`` like PCM), the rest PCM16
    WAV.  G.711 is LOSSY — the decoded peak is the nearest G.711 level
    of ``amp`` — but the quantization is a fixed 256-entry table, so the
    peak stays closed-form: the oracle states the quantized level per
    (law, amp) class as a literal (computed from the same canonical
    tables, pinned by tests)."""
    import io
    import struct as _struct
    import wave

    import numpy as np

    n_frames = 800 + (key % 5) * 160
    amp = 2000 + (key % 7) * 1000
    samples = np.full(n_frames, amp, dtype=np.int16)
    samples[1::2] = -amp
    variant = key % 4
    if variant == 3:
        from .flac import encode_flac

        return encode_flac(samples, sample_rate)
    if variant in (1, 2):
        law = "mulaw" if variant == 1 else "alaw"
        tag = 7 if variant == 1 else 6
        data = _g711_encode(samples, law)
        fmt = _struct.pack("<HHIIHH", tag, 1, sample_rate, sample_rate, 1, 8)
        fact = _struct.pack("<I", n_frames)
        body = (
            b"WAVE"
            + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
            + b"fact" + _struct.pack("<I", len(fact)) + fact
            + b"data" + _struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b"")
        )
        return b"RIFF" + _struct.pack("<I", len(body)) + body
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(samples.tobytes())
    return buf.getvalue()


@_lru_cache(maxsize=4096)
def synth_container_payload(key: int) -> bytes:
    """A/V+image CONTAINER fixture with closed-form truth — the
    crawl-side sniff-and-route shape: ``key % 6`` rotates the container
    family and every metadata field is an integer function of
    ``k = key // 6`` so the x_multimodal_meta oracle states them
    without parsing anything.

    * class 0 — MP3 (operators/mpeg_audio.py): CBR Layer III silence,
      sample rate ``[44100,48000,32000][k%3]`` (all MPEG-1), ``1 + k%2``
      channels, bitrate ``[64,96,128,160][k%4]`` kbps, ``8 + k%7`` audio
      frames; odd ``k`` prepends the CBR 'Info' (Xing) metadata frame,
      ``k%5 == 0`` a leading ID3v2 tag of ``50 + k%37`` content bytes.
    * class 1 — Ogg (operators/ogg.py): even ``k`` Vorbis (ident header
      rate ``[8000,16000,44100,48000][k%4]``, nominal bitrate
      ``64 + (k%5)*16`` kbps, terminal granule ``2000 + (k%5)*800``
      samples, ``1 + k%3`` data pages; ``k%4 == 2`` makes the first data
      packet 600 bytes laced at 2 segments/page to force a continued
      page), odd ``k`` Opus (OpusHead, pre-skip 312, ``20 + k%10``
      20 ms frames at the canonical 48 kHz).
    * class 2 — PCM16 WAV: :func:`synth_wav_payload` with key ``4*k``
      (forces the PCM variant of its ``%4`` codec rotation).
    * class 3 — MP4 (operators/mp4.py): ``1 + k%3`` alternating
      vide/soun tracks (video-first iff ``(k//2)%2 == 0``), movie
      timescale 600 (even ``k``, mvhd v0) or 90000 (odd ``k``, mvhd v1),
      duration ``(2 + k%5) * timescale + k%7`` units.  ``k%4 == 3``
      ships the FRAGMENTED form (init moov + 2 moof fragments mixing
      explicit trun durations with trex/tfhd defaults) whose per-track
      total equals the same closed form — (1+k%5)·ts + k%7 explicit
      plus 2·(ts//2) defaulted = (2+k%5)·ts + k%7 — so the oracle is
      layout-invariant while the moof walk rides the gate.
    * class 4 — WebM (operators/webm.py): ``1 + k%3`` alternating
      video/audio TrackEntries (video-first iff ``(k//2)%2 == 0``),
      Duration ``1500 + (k%7)*500`` ms at the default 1e6 ns
      TimestampScale; odd ``k`` writes the Segment with the all-ones
      unknown-size escape (the live-muxed real-world shape).
    * class 5 — HEIF still image (operators/mp4.py, round-15): brand
      ``avif`` (even ``k``) / ``heic`` (odd), ``1 + k%3`` items with
      primary ``1 + k % (1 + k%3)`` — the primary ROTATES so the gate
      certifies the ipma association walk, while the primary item's
      ispe dims stay the closed form ``width 64 + (k%5)*16`` /
      ``height 48 + (k%7)*12`` regardless of which item is primary
      (non-primary items carry decoy dims).  ``k%4 == 2`` uses 15-bit
      ipma property indices, ``k%3 == 1`` the 32-bit v1 item-id forms —
      structural rotation the oracle never sees.

    Every output-relevant period divides ``lcm(2,3,4,5,7,10) = 420``, so
    callers fold ids with ``key_mod = 6 * 420 = 2520`` and the lru_cache
    covers the whole payload space."""
    c, k = key % 6, key // 6
    if c == 5:
        from . import mp4

        n_items = 1 + k % 3
        return mp4.write_heif(
            brand="avif" if k % 2 == 0 else "heic",
            width=64 + (k % 5) * 16,
            height=48 + (k % 7) * 12,
            n_items=n_items,
            primary=1 + k % n_items,
            wide_ipma=k % 4 == 2,
            v1_ids=k % 3 == 1,
        )
    if c == 0:
        from . import mpeg_audio

        return mpeg_audio.write_mp3(
            n_frames=8 + k % 7,
            sample_rate=(44100, 48000, 32000)[k % 3],
            bitrate_kbps=(64, 96, 128, 160)[k % 4],
            n_channels=1 + k % 2,
            xing=k % 2 == 1,
            id3_content=(50 + k % 37) if k % 5 == 0 else 0,
        )
    if c == 1:
        from . import ogg

        ch = 1 + (k // 2) % 2
        if k % 2 == 0:
            rate = (8000, 16000, 44100, 48000)[k % 4]
            samples = 2000 + (k % 5) * 800
            ident = ogg.write_vorbis_ident(ch, rate, (64 + (k % 5) * 16) * 1000)
            n_data = 1 + k % 3
            data = [
                bytes(((k + i * 31 + j) % 256) for j in range(40))
                for i in range(n_data)
            ]
            if k % 4 == 2:  # force the packet-continuation path
                data[0] = bytes(((k + j) % 256) for j in range(600))
            pages = [([ident], 0), ([b"\x03vorbis-comment-stub", b"\x05setup-stub"], 0)]
            for i, d in enumerate(data):
                last = i == n_data - 1
                pages.append(([d], samples if last else samples * (i + 1) // n_data))
            return ogg.write_ogg(pages, max_segs_per_page=2 if k % 4 == 2 else 255)
        head = ogg.write_opus_head(ch, 312, 16000)
        granule = 312 + 960 * (20 + k % 10)
        return ogg.write_ogg(
            [([head], 0), ([b"OpusTags-stub"], 0), ([bytes(20)], granule)]
        )
    if c == 2:
        return synth_wav_payload(4 * k)
    if c == 3:
        from . import mp4

        ts = 600 if k % 2 == 0 else 90000
        if k % 4 == 3:
            # fragmented (fMP4/DASH) variant: init moov with zero
            # durations + two moof fragments per track — frag 1 carries
            # explicit per-sample durations, frag 2 leans on the
            # trex/tfhd default, so all three duration sources rotate
            # through the gate; per-track total is
            # (1 + k%5)*ts + k%7 + (1 + k%2)*(ts//2)
            n = 1 + k % 3
            return mp4.write_fmp4(
                n_tracks=n,
                timescale=ts,
                fragments=[
                    [(tid, [(1 + k % 5) * ts, k % 7]) for tid in range(1, n + 1)],
                    [(tid, 1 + k % 2) for tid in range(1, n + 1)],
                ],
                trex_default=ts // 2,
                first_video=(k // 2) % 2 == 0,
            )
        return mp4.write_mp4(
            n_tracks=1 + k % 3,
            timescale=ts,
            duration_units=(2 + k % 5) * ts + k % 7,
            first_video=(k // 2) % 2 == 0,
            mvhd_v1=k % 2 == 1,
        )
    from . import webm

    return webm.write_webm(
        n_tracks=1 + k % 3,
        duration_ms=1500 + (k % 7) * 500,
        first_video=(k // 2) % 2 == 0,
        unknown_segment_size=k % 2 == 1,
    )


CONTAINER_META_SCHEMA = (
    "container string, n_channels bigint, sample_rate bigint, "
    "n_units bigint, duration_ms bigint, bitrate_kbps bigint, "
    "width bigint, height bigint"
)


def sniff_container_meta(payload: bytes) -> tuple:
    """Magic-byte dispatch to the real container parsers: MP3 frame walk
    (ID3-aware), Ogg page walk (Vorbis/Opus ident), ISO-BMFF box walk,
    RIFF/FLAC via :func:`decode_audio`.  The shared columns carry each
    container's natural semantics (documented per family): ``n_units`` is
    MP3 audio frames / Ogg pages / WAV+FLAC sample frames / MP4 tracks;
    for MP4 ``n_channels`` is the audio-track count and ``sample_rate``
    the movie timescale; ``bitrate_kbps`` is the fmt byte-rate for WAV
    and 0 for the VBR containers (FLAC/MP4); ``width``/``height`` are
    the primary item's pixel dims for still-image families (HEIF/AVIF,
    resolved ispe-through-ipma) and 0 for every A/V container.  Unknown
    magic raises (crawl sniffing must route or fail, never guess)."""
    # the ftyp probe sits at offset 4, where RIFF stores its little-endian
    # size — a ~1.88 GB RIFF file (size 0x70797466 = 'ftyp') would collide,
    # so RIFF magic at offset 0 wins the dispatch (round-12 review)
    if payload[:4] != b"RIFF" and payload[4:8] == b"ftyp":
        from . import mp4

        brand = payload[8:12].decode("latin-1", "replace")
        if brand in mp4.HEIF_BRANDS:
            # ISO-BMFF STILL IMAGE (AVIF/HEIC): route to the HEIF item
            # walk — parse_mp4_meta would mis-report it as a trackless
            # movie.  A/V columns carry image-shaped zeros (a caller
            # filtering audio by n_channels > 0 naturally excludes
            # images); n_units is the item count, and width/height are
            # the PRIMARY item's ispe dims resolved through ipma.
            h = mp4.parse_heif_meta(payload)
            return (h["brand"], 0, 0, h["n_items"], 0, 0, h["width"], h["height"])
        m = mp4.parse_mp4_meta(payload)
        return (
            "mp4", m["n_audio"], m["timescale"],
            m["n_tracks"], m["duration_ms"], 0, 0, 0,
        )
    if payload[:4] == b"\x1aE\xdf\xa3":  # EBML header magic
        from . import webm

        m = webm.parse_webm_meta(payload)
        return (
            m["doctype"], m["n_audio"], m["timescale_ns"],
            m["n_tracks"], m["duration_ms"], 0, 0, 0,
        )
    if payload[:4] == b"OggS":
        from . import ogg

        m = ogg.parse_ogg_meta(payload)
        return (
            f"ogg-{m['codec']}", m["n_channels"], m["sample_rate"],
            m["n_pages"], m["duration_ms"], m["bitrate_kbps"], 0, 0,
        )
    if payload[:3] == b"ID3" or (
        len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
    ):
        from . import mpeg_audio

        m = mpeg_audio.parse_mp3_meta(payload)
        return (
            "mp3", m["n_channels"], m["sample_rate"],
            m["n_frames"], m["duration_ms"], m["bitrate_kbps"], 0, 0,
        )
    if payload[:4] == b"fLaC":
        ch, rate, n_frames, duration_ms, _peak = decode_audio(payload)
        # lossless VBR: no fixed stream bitrate to report
        return ("flac", ch, rate, n_frames, duration_ms, 0, 0, 0)
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from . import avi

        m = avi.parse_avi_meta(payload)
        # sample_rate carries the integer video fps (1e6/usec-per-frame,
        # floored) — the AVI analog of a timescale
        return (
            "avi", m["n_audio"], 1_000_000 // m["usec_per_frame"],
            m["total_frames"], m["duration_ms"], 0, 0, 0,
        )
    if payload[:4] == b"RIFF":
        ch, rate, n_frames, duration_ms, _peak = decode_audio(payload)
        # true stream bitrate from the fmt chunk's byte-rate field (exact
        # for PCM and G.711; what a router budgets transfer on)
        byte_rate = _riff_fmt_byte_rate(payload)
        return ("wav", ch, rate, n_frames, duration_ms, byte_rate * 8 // 1000, 0, 0)
    raise ValueError("container sniff: unrecognized magic bytes")


def _riff_fmt_byte_rate(payload: bytes) -> int:
    """avg-bytes-per-second from the RIFF fmt chunk (offset 8 within it)."""
    import struct as _struct

    off, end = 12, len(payload)  # past 'RIFF'<size>'WAVE'
    while off + 8 <= end:
        cid = payload[off : off + 4]
        size = _struct.unpack_from("<I", payload, off + 4)[0]
        if cid == b"fmt ":
            if size < 16 or off + 8 + 16 > end:
                raise ValueError("wav: truncated fmt chunk")
            return _struct.unpack_from("<I", payload, off + 16)[0]
        off += 8 + size + (size & 1)
    raise ValueError("wav: missing fmt chunk")


def extract_container_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    sniff_fn: Callable[[bytes], tuple] = sniff_container_meta,
) -> DataFrame:
    """Container-metadata extraction over Arrow ``mapInPandas`` batches —
    the same distributed shape as :func:`extract_media_meta`, with the
    REAL mp3/ogg/wav container layer instead of the fake decode."""
    id_field = df.schema[id_col]
    schema = f"{id_col} {id_field.dataType.simpleString()}, {CONTAINER_META_SCHEMA}"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            metas = [sniff_fn(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(
                metas,
                columns=[
                    "container", "n_channels", "sample_rate",
                    "n_units", "duration_ms", "bitrate_kbps",
                    "width", "height",
                ],
            )
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return (
        df.where(F.col(payload_col).isNotNull())
        .select(id_col, payload_col)
        .mapInPandas(fn, schema=schema)
    )


# ---------------------------------------------------------------------------
# REAL compressed-WAV codecs (numpy + struct, no external libs)
# ---------------------------------------------------------------------------
#
# The stdlib ``wave`` module reads only PCM; real-world audio corpora are
# full of G.711 mu-law / A-law (telephony, format tags 7 / 6) and IMA
# ADPCM (format tag 0x11) WAV files.  These decoders parse the RIFF
# container directly and expand to int16 — G.711 is a vectorized 256-entry
# table lookup, IMA ADPCM the standard step/index predictor loop.  FLAC
# decodes through the from-scratch :mod:`.flac` codec; the remaining
# compressed formats (mp3/ogg) are ``soundfile`` integration points in
# :func:`decode_audio`.


def _g711_tables():
    """(mu-law, A-law) decode tables: 256 int16 values each, from the
    canonical CCITT G.711 expansion formulas (mu-law 0x00 -> -32124,
    0xFF -> 0; A-law 0x55 -> -8, 0xD5 -> +8 — the classic table values)."""
    import numpy as np

    mu = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        mu[b] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    al = np.empty(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        al[b] = t if (a & 0x80) else -t
    return mu, al


_G711_MULAW, _G711_ALAW = None, None


def _g711_decode(data: bytes, law: str):
    """Vectorized G.711 expansion: one byte per sample -> int16."""
    import numpy as np

    global _G711_MULAW, _G711_ALAW
    if _G711_MULAW is None:
        _G711_MULAW, _G711_ALAW = _g711_tables()
    table = _G711_MULAW if law == "mulaw" else _G711_ALAW
    return table[np.frombuffer(data, dtype=np.uint8)]


def _g711_encode(samples, law: str) -> bytes:
    """Nearest-level G.711 compression (fixture-side; exact inverse of
    the decode table by construction — no sign-convention drift)."""
    import numpy as np

    global _G711_MULAW, _G711_ALAW
    if _G711_MULAW is None:
        _G711_MULAW, _G711_ALAW = _g711_tables()
    table = (_G711_MULAW if law == "mulaw" else _G711_ALAW).astype(np.int32)
    s = np.asarray(samples, dtype=np.int32)
    # 256 levels only: brute-force nearest level, lowest code on ties
    codes = np.abs(s[:, None] - table[None, :]).argmin(axis=1).astype(np.uint8)
    return codes.tobytes()


_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_adpcm_decode_block(data: bytes, nch: int):
    """One IMA ADPCM block -> int16 array (frames, nch).  Per channel: a
    4-byte header (predictor int16 LE, step index, reserved) counting as
    frame 0, then 4-byte nibble groups interleaved across channels."""
    import struct as _struct

    import numpy as np

    preds, idxs = [], []
    for c in range(nch):
        p, i, _r = _struct.unpack_from("<hBB", data, c * 4)
        preds.append(p)
        idxs.append(min(max(i, 0), 88))
    body = data[4 * nch :]
    # nibbles per channel, in decode order (low nibble first within a byte)
    per_ch: list[list[int]] = [[] for _ in range(nch)]
    for gi in range(0, len(body), 4 * nch):
        for c in range(nch):
            for b in body[gi + c * 4 : gi + c * 4 + 4]:
                per_ch[c].append(b & 0x0F)
                per_ch[c].append(b >> 4)
    nfr = 1 + (len(per_ch[0]) if per_ch[0] else 0)
    out = np.empty((nfr, nch), dtype=np.int16)
    for c in range(nch):
        pred, idx = preds[c], idxs[c]
        out[0, c] = pred
        for fi, n in enumerate(per_ch[c], start=1):
            step = _IMA_STEPS[idx]
            diff = step >> 3
            if n & 4:
                diff += step
            if n & 2:
                diff += step >> 1
            if n & 1:
                diff += step >> 2
            pred = pred - diff if n & 8 else pred + diff
            pred = min(max(pred, -32768), 32767)
            idx = min(max(idx + _IMA_INDEX[n & 7], 0), 88)
            out[fi, c] = pred
        if len(per_ch[c]) != len(per_ch[0]):
            raise ValueError("ADPCM block: ragged channel nibble counts")
    return out


def _ima_adpcm_encode(samples, block_frames: int = 505) -> tuple[bytes, int]:
    """Mono IMA ADPCM compression (fixture-side, standard quantizer).
    Returns (data bytes, block_align)."""
    import struct as _struct

    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    if block_frames % 2 == 0:
        block_frames += 1  # 1 header frame + even nibble count
    block_align = 4 + (block_frames - 1) // 2
    out = bytearray()
    idx = 0
    for bs in range(0, len(s), block_frames):
        blk = s[bs : bs + block_frames]
        pred = int(blk[0])
        out += _struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for x in blk[1:]:
            step = _IMA_STEPS[idx]
            delta = int(x) - pred
            n = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                n |= 4
                delta -= step
            if delta >= step >> 1:
                n |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                n |= 1
            # reconstruct exactly as the decoder will
            diff = step >> 3
            if n & 4:
                diff += step
            if n & 2:
                diff += step >> 1
            if n & 1:
                diff += step >> 2
            pred = pred - diff if n & 8 else pred + diff
            pred = min(max(pred, -32768), 32767)
            idx = min(max(idx + _IMA_INDEX[n & 7], 0), 88)
            nibbles.append(n)
        if len(nibbles) % 2:
            nibbles.append(0)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
        # pad the final short block to block_align
        pad = block_align - (4 + len(nibbles) // 2)
        out += bytes(pad)
    return bytes(out), block_align


def decode_wav_samples(payload: bytes):
    """From-scratch RIFF/WAVE reader for the compressed format tags the
    stdlib ``wave`` module rejects — G.711 mu-law (7), A-law (6), IMA
    ADPCM (0x11) — plus 8/16-bit PCM (1) for completeness.  Returns
    ``(n_channels, sample_rate, int16 ndarray (frames, channels))``."""
    import struct as _struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    n_frames_fact = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = _struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + sz]
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if len(body) < 16:
                # a legacy 14-byte WAVEFORMAT (no bits field) or truncated
                # chunk: ValueError, NOT a leaking struct.error — callers
                # key their fallback/skip logic on the documented errors
                # (r11 review: struct.error escaped decode_audio and would
                # kill the Spark task instead of erroring cleanly)
                raise ValueError(f"WAV fmt chunk too short ({len(body)} bytes)")
            tag, nch, rate, _br, balign, bits = _struct.unpack_from("<HHIIHH", body, 0)
            fmt = (tag, nch, rate, balign, bits)
        elif cid == b"fact" and len(body) >= 4:
            (n_frames_fact,) = _struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, nch, rate, balign, bits = fmt
    if nch < 1:
        raise ValueError("WAV: zero channels")
    if tag == 1:  # PCM
        if bits == 16:
            arr = np.frombuffer(data[: len(data) // (2 * nch) * 2 * nch], dtype="<i2")
        elif bits == 8:
            # trim to whole frames like the 16-bit / G.711 paths: a
            # ragged data chunk must raise the documented WAV error from
            # reshape's caller, not numpy's generic one (r11 ADVICE)
            arr = (
                np.frombuffer(
                    data[: len(data) // nch * nch], dtype=np.uint8
                ).astype(np.int16)
                - 128
            ) << 8
        else:
            raise ValueError(f"WAV PCM bits {bits} unsupported here")
        return nch, rate, arr.reshape(-1, nch)
    if tag in (6, 7):  # G.711: one byte per sample
        law = "alaw" if tag == 6 else "mulaw"
        arr = _g711_decode(data[: len(data) // nch * nch], law)
        out = arr.reshape(-1, nch)
        if n_frames_fact is not None:
            out = out[:n_frames_fact]
        return nch, rate, out
    if tag == 0x11:  # IMA ADPCM
        if balign < 4 * nch:
            raise ValueError("ADPCM block align too small")
        blocks = []
        for bs in range(0, len(data) // balign * balign, balign):
            blocks.append(_ima_adpcm_decode_block(data[bs : bs + balign], nch))
        if not blocks:
            raise ValueError("ADPCM: no complete block")
        out = np.concatenate(blocks, axis=0)
        if n_frames_fact is not None:
            out = out[:n_frames_fact]
        return nch, rate, out
    raise ValueError(f"WAV format tag {tag} unsupported (mp3/ogg need soundfile)")


def _fanout_ids(df: DataFrame, id_col: str) -> DataFrame:
    """Spread an id-only projection across cores before a per-row-expensive
    synthesis ``mapInPandas``: small fixture tables often arrive as ONE
    input split (sf0.1 documents is a single 584 KB parquet file), which
    serializes the from-scratch encodes onto a single python worker — the
    round-14 bench's 23 s `x_image_neardup_pairs` rep-1 was exactly this
    shape (12.4 s synth + ~10 s decode, one task, 31 idle cores).  The
    exchange carries only the 8-byte ids, so it is safe at any scale; a
    table that already has >= defaultParallelism splits is left alone."""
    out = df.select(id_col)
    target = out.sparkSession.sparkContext.defaultParallelism
    try:
        if out.rdd.getNumPartitions() < target:
            out = out.repartition(target)
    except Exception:  # pragma: no cover - plan not RDD-convertible
        pass
    return out


def attach_synth_payload(
    df: DataFrame,
    kind: str,
    id_col: str = "doc_id",
    key_mod: int | None = None,
) -> DataFrame:
    """Attach a REAL synthetic media payload per row via ``mapInPandas``
    (Arrow binary batches — the same wire shape as payloads read from
    object storage).  ``key_mod`` folds ids into ``id % key_mod`` classes
    so distinct rows share identical payloads (duplicate-detection
    fixtures)."""
    gen = {
        "png": synth_png_payload,
        "image": synth_image_payload,  # PNG / lossless-WebP rotation
        "wav": synth_wav_payload,
        "gif": synth_gif_payload,
        "jpeg": synth_jpeg_payload,
        "container": synth_container_payload,
    }[kind]
    id_field = df.schema[id_col]
    schema = f"{id_col} {id_field.dataType.simpleString()}, payload binary"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            keys = pdf[id_col].astype("int64")
            if key_mod is not None:
                keys = keys % key_mod
            yield pd.DataFrame(
                {id_col: pdf[id_col], "payload": [gen(int(k)) for k in keys]}
            )

    return _fanout_ids(df, id_col).mapInPandas(fn, schema=schema)


def attach_synth_payload_twins(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Near-dup image fixture: even ids carry the class image (key = id);
    each odd id carries its even predecessor's image with block
    ``(key * 7) % 64`` inverted — a known Hamming-1 perturbation — so the
    ground-truth near-dup pairs are exactly (2m, 2m+1) with distance 1,
    closed-form for a SQL oracle.

    The CODEC rotates by pair class (``(key // 2) % 5``): 1 -> baseline
    4:2:0-subsampled color JPEG, 3 -> progressive 4:2:0 color JPEG,
    2 -> lossless WebP (VP8L), 4 -> LOSSY-VP8 WebP (system libwebp,
    quality 90; VP8L fallback when absent), else PNG — every
    perceptual-hash bit is exact under all five (the pattern is
    block-aligned, DC-only, constant-chroma; the lossy classes quantize
    inside a ~190-grey-level threshold margin, sweep-pinned in tests),
    so the neardup contract is codec-independent and the oracle stays
    closed-form while the query exercises every decode path."""
    id_field = df.schema[id_col]
    schema = f"{id_col} {id_field.dataType.simpleString()}, payload binary"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = []
            for i in pdf[id_col].astype("int64"):
                key = int(i) - (int(i) % 2)
                flip = (key * 7) % 64 if i % 2 else None
                cls = (key // 2) % 5
                if cls in (1, 3):
                    payloads.append(_synth_jpeg_twin(key, cls, flip))
                elif cls in (2, 4):
                    # WebP twins — lossless VP8L (2) / lossy VP8 (4):
                    # identical md5 aHash bits either way (see
                    # synth_image_payload), so the Hamming-1 contract holds
                    payloads.append(_synth_webp_twin(key, flip, lossy=cls == 4))
                else:
                    payloads.append(synth_png_payload(key, flip_block=flip))
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return _fanout_ids(df, id_col).mapInPandas(fn, schema=schema)


@_lru_cache(maxsize=4096)
def synth_image_payload(key: int, flip_block: int | None = None) -> bytes:
    """Rotating-codec image fixture for the perceptual-hash queries:
    ``key % 6 == 2`` emits the md5 block pattern as a LOSSLESS WebP
    (VP8L; 2 colors -> color-indexing transform with 8-pixel bundling),
    ``key % 6 == 4`` as a LOSSY-VP8 WebP (system libwebp, quality 90 —
    falling back to VP8L when the library is absent), ``key % 6 == 3``
    as an AVIF still (system libheif + AV1 lossless, round-16 bridge —
    exact for the R=G=B block-constant pattern; falling back to PNG
    when the library is absent), ``key % 6 == 5``
    as a 24-bit uncompressed BMP, everything else as the PNG of
    :func:`synth_png_payload`.  The aHash bit pattern is identical
    under every class: WebP decodes to RGBA whose channel mean is a
    strictly monotone map of the grey value ({0, 255} -> {63.75, 255}),
    BMP expands grey to exact R=G=B, both colors always occur, and the
    pattern is 16px-macroblock-aligned with ~190-grey-level block
    separation, so lossy ringing never crosses the global-mean
    threshold (pinned for a key sweep at qualities 75/90/95 in
    tests/test_libwebp_bridge.py) — the global-mean threshold always
    recovers exactly the md5 bits."""
    cls = key % 6
    if cls == 2:
        from .webp import encode_webp

        pix = _md5_block_pixels(key, flip_block, on=255, off=0)
        return encode_webp(pix)
    if cls == 3:
        from . import libheif_bridge

        if libheif_bridge.available():
            pix = _md5_block_pixels(key, flip_block, on=255, off=0)
            return libheif_bridge.encode_avif(pix, lossless=True)
        return synth_png_payload(key, flip_block=flip_block)
    if cls == 4:
        from . import libwebp_bridge
        from .webp import encode_webp

        pix = _md5_block_pixels(key, flip_block, on=255, off=0)
        if libwebp_bridge.available():
            return libwebp_bridge.encode_webp_lossy(pix, quality=90.0)
        return encode_webp(pix)  # lossless fallback: identical aHash bits
    if cls == 5:
        return _synth_bmp_payload(key, flip_block)
    return synth_png_payload(key, flip_block=flip_block)


def _synth_bmp_payload(key: int, flip_block: int | None) -> bytes:
    """24-bit uncompressed BMP of the md5 block pattern (grey as exact
    R=G=B, bottom-up rows, stride-padded) — the BMP leg of the rotating
    fixture; :func:`decode_bmp` recovers the exact pattern."""
    import struct as _struct

    pix = _md5_block_pixels(key, flip_block, on=255, off=0)
    h, w = pix.shape
    stride = (w * 24 + 31) // 32 * 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = b"".join(bytes([v, v, v]) for v in pix[y])
        rows.append(row + bytes(stride - len(row)))
    body = b"".join(rows)
    data_off = 14 + 40
    hdr = b"BM" + _struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    dib = _struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return hdr + dib + body


@_lru_cache(maxsize=4096)
def _synth_webp_twin(key: int, flip_block: int | None, lossy: bool = False) -> bytes:
    """WebP twin for the neardup fixture (0/255 md5 pattern): lossless
    VP8L by default; ``lossy=True`` emits a lossy-VP8 stream through the
    system libwebp (quality 90), falling back to VP8L when the library
    is absent — the aHash contract is identical either way."""
    from .webp import encode_webp

    pix = _md5_block_pixels(key, flip_block, on=255, off=0)
    if lossy:
        from . import libwebp_bridge

        if libwebp_bridge.available():
            return libwebp_bridge.encode_webp_lossy(pix, quality=90.0)
    return encode_webp(pix)


@_lru_cache(maxsize=4096)
def _synth_jpeg_twin(key: int, cls: int, flip_block: int | None) -> bytes:
    """4:2:0 color JPEG twin for the neardup fixture: same md5 block
    pattern as ``synth_png_payload(key)`` (values 192/64), baseline for
    ``cls == 1``, progressive for ``cls == 3``."""
    import numpy as np

    pix = _md5_block_pixels(key, flip_block, on=192, off=64)
    rgb = np.stack([pix, pix, pix], axis=-1)
    return encode_jpeg(rgb, subsample="420", progressive=cls == 3)


def _ahash_uncached(payload: bytes, grid: int, decode_fn) -> tuple[int, int, int]:
    """One payload's (ahash, width, height) — the kernel behind
    :func:`image_ahash`'s content-addressed memoization."""
    import numpy as np

    h, w, _c, arr = decode_fn(payload)
    grey = arr.astype(np.float64).mean(axis=2)
    by, bx = max(h // grid, 1), max(w // grid, 1)
    hh, ww = (h // by) * by, (w // bx) * bx
    blocks = (
        grey[:hh, :ww]
        .reshape(hh // by, by, ww // bx, bx)
        .mean(axis=(1, 3))[:grid, :grid]
    )
    bits = (blocks >= blocks.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return np.uint64(v).astype(np.int64).item(), w, h


def image_ahash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode_fn: Callable[[bytes], tuple] = decode_image,
    grid: int = AHASH_GRID,
) -> DataFrame:
    """Perceptual average-hash (aHash) per image payload: decode, collapse
    to greyscale, block-average down to ``grid``×``grid``, threshold each
    block against the global mean -> one 64-bit signature (bigint, two's
    complement).  Near-duplicate images land within a small Hamming
    distance; identical images collide exactly, so ``groupBy(ahash)`` is
    the image-dedup analog of exact text dedup.

    mapInPandas over Arrow binary batches; one scan, no shuffle — the
    downstream groupBy shuffles only (id, hash) pairs."""
    id_field = df.schema[id_col]
    schema = f"{id_col} {id_field.dataType.simpleString()}, ahash bigint, width bigint, height bigint"
    # content-addressed memoization: identical payloads hash identically,
    # and duplicate payloads are the NORM in dedup-shaped workloads.  The
    # cache is TASK-scoped (built inside fn, so it spans every batch of
    # one partition but dies with the task): after the round-robin
    # fan-out every partition sees every duplicate class, so a
    # batch-local cache re-decoded each class once per BATCH; task scope
    # collapses that to once per task while every invocation still pays
    # its own decodes (no cross-run or cross-rep memo — a worker-level
    # LRU would make repeated benchmarks read hot).
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[bytes, tuple[int, int, int]] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for p in pdf[payload_col]:
                bp = bytes(p)
                row = cache.get(bp)
                if row is None:
                    row = _ahash_uncached(bp, grid, decode_fn)
                    if len(cache) >= 4096:  # bounded: evict oldest insert
                        cache.pop(next(iter(cache)))
                    cache[bp] = row
                rows.append(row)
            out = pd.DataFrame(rows, columns=["ahash", "width", "height"])
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    # NULL payloads are excluded (engine policy, like NULL skyline dims)
    return df.where(F.col(payload_col).isNotNull()).select(id_col, payload_col).mapInPandas(fn, schema=schema)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode_fn: Callable[[bytes], tuple] = decode_image,
) -> DataFrame:
    """Deterministic area (box-average) resize per image payload — the
    standard training-pipeline preprocessing step (images normalized to a
    fixed model resolution) as Spark-side plumbing: decode inside Arrow
    batches, greyscale-collapse, integer box mean, and emit
    ``(id, out_w, out_h, pix_wsum)`` where ``pix_wsum`` is the
    position-weighted checksum ``sum(pix[y][x] * (y*out_w + x + 1))`` —
    order-sensitive, so it pins every resized pixel's VALUE and POSITION
    without shipping the bitmap (callers that need the pixels re-run the
    same kernel with a bitmap schema).

    When the input dims divide evenly by the output dims the box mean is
    the exact truncating-integer mean (``sum // box_area``) — fully
    engine-exact, which is what the closed-form oracle gates; ragged
    ratios fall back to edge-cropped boxes (``in_dim // out_dim`` each),
    the same convention as :func:`image_ahash`'s block grid.

    mapInPandas over Arrow binary batches; one scan, no shuffle; distinct
    payloads decode once per batch (the dedup-workload cache)."""
    import numpy as np

    id_field = df.schema[id_col]
    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        "out_w bigint, out_h bigint, pix_wsum bigint"
    )
    weights = np.arange(1, out_w * out_h + 1, dtype=np.int64)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            cache: dict[bytes, int] = {}
            for p in pdf[payload_col]:
                bp = bytes(p)
                wsum = cache.get(bp)
                if wsum is None:
                    h, w, c, arr = decode_fn(bp)
                    if h < out_h or w < out_w:
                        # upscale would silently emit a checksum with the
                        # wrong stride and false output dims — refuse
                        raise ValueError(
                            f"resize_images: upscale not supported "
                            f"({w}x{h} -> {out_w}x{out_h})"
                        )
                    grey = arr.astype(np.int64).sum(axis=2) // c
                    by, bx = max(h // out_h, 1), max(w // out_w, 1)
                    hh, ww = min(h, out_h * by), min(w, out_w * bx)
                    resized = (
                        grey[:hh, :ww]
                        .reshape(hh // by, by, ww // bx, bx)
                        .sum(axis=(1, 3))[:out_h, :out_w]
                        // (by * bx)
                    )
                    wsum = int(np.dot(resized.flatten(), weights[: resized.size]))
                    cache[bp] = wsum
                rows.append(wsum)
            out = pd.DataFrame({"pix_wsum": rows})
            out.insert(0, id_col, pdf[id_col].to_numpy())
            out.insert(1, "out_w", out_w)
            out.insert(2, "out_h", out_h)
            yield out

    # NULL payloads are excluded (engine policy, like NULL skyline dims)
    return (
        df.where(F.col(payload_col).isNotNull())
        .select(id_col, payload_col)
        .mapInPandas(fn, schema=schema)
    )


# ---------------------------------------------------------------------------
# REAL GIF codec (stdlib-only LZW) — multi-frame / animation payloads
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code: int) -> bytes:
    """GIF-flavor LZW: LSB-first bit packing, CLEAR/END codes, table grows
    to 12 bits then freezes until the next CLEAR."""
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    table: list[bytes] = []
    code_size = min_code + 1
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code + 1
                prev = None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("corrupt GIF LZW stream (code beyond table)")
                entry = table[code]
            else:
                if code < len(table):
                    entry = table[code]
                elif code == len(table):  # the KwKwK case
                    entry = prev + prev[:1]
                else:
                    raise ValueError("corrupt GIF LZW stream (code beyond table)")
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
            out += entry
            prev = entry
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, int, "object"]:
    """REAL codec for GIF87a/89a (stdlib-only LZW): returns
    (n_frames, height, width, ndarray[n, h, w, 3] uint8).

    Supports global and local color tables, per-frame sub-rectangles
    composited onto the running canvas with ALL disposal methods (0/1
    none/keep, 2 restore-to-background — the frame rect refills with
    the logical screen's background color — and 3 restore-to-previous),
    GIF89a transparency (transparent pixels leave the canvas
    unchanged), and interlaced frames.  Raises ``ValueError`` on
    non-GIF or corrupt streams.

    Stays on the builtin decoder under the default ``auto`` backend —
    the same policy as JPEG: Pillow's GIF plugin differs on background
    fill (it leaves undrawn canvas at palette index 0 rather than the
    logical screen's background color) and on disposal-2 restores, so a
    silent swap would make frame statistics environment-dependent.
    ``SPARK_GRAFT_IMAGE_BACKEND=pillow`` opts in explicitly."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if _image_backend() == "pillow":
        return _decode_gif_pillow(payload)
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    bg_rgb = None
    if gct is not None and payload[11] < len(gct):
        bg_rgb = gct[payload[11]]
        canvas[:] = bg_rgb
    frames: list["np.ndarray"] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + length-prefixed sub-blocks
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control: transparency + disposal
                ln = payload[pos]
                gce = payload[pos + 1 : pos + 1 + ln]
                if len(gce) < 4:
                    raise ValueError("corrupt GIF graphic-control extension")
                transparent = gce[3] if (gce[0] & 0x01) else None
                disposal = (gce[0] >> 2) & 0x07
            while True:
                ln = payload[pos]
                pos += 1 + ln
                if ln == 0:
                    break
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        x0 = int.from_bytes(payload[pos : pos + 2], "little")
        y0 = int.from_bytes(payload[pos + 2 : pos + 4], "little")
        iw = int.from_bytes(payload[pos + 4 : pos + 6], "little")
        ih = int.from_bytes(payload[pos + 6 : pos + 8], "little")
        iflags = payload[pos + 8]
        pos += 9
        table = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame has no color table")
        min_code = payload[pos]
        pos += 1
        lzw = bytearray()
        while True:
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            lzw += payload[pos : pos + ln]
            pos += ln
        idx = np.frombuffer(_lzw_decode(bytes(lzw), min_code), dtype=np.uint8)
        if idx.size != iw * ih:
            raise ValueError("GIF frame pixel count mismatch")
        idx = idx.reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows stored 0::8, 4::8, 2::4, 1::2
            de = np.empty_like(idx)
            order = np.concatenate(
                [np.arange(0, ih, 8), np.arange(4, ih, 8),
                 np.arange(2, ih, 4), np.arange(1, ih, 2)]
            )
            de[order] = idx
            idx = de
        patch = table[idx]
        region = canvas[y0 : y0 + ih, x0 : x0 + iw]
        prev = region.copy() if disposal == 3 else None
        if transparent is not None:
            mask = idx != transparent
            region[mask] = patch[mask]
        else:
            region[:] = patch
        frames.append(canvas.copy())
        if disposal == 2:
            # restore-to-background: the frame RECT refills with the
            # logical screen background (black when no GCT entry)
            region[:] = bg_rgb if bg_rgb is not None else 0
        elif disposal == 3:
            region[:] = prev  # restore-to-previous
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no frames")
    return len(frames), h, w, np.stack(frames)


def gif_frame_mean(payload: bytes, frame_idx: int) -> tuple[int, int, int]:
    """Exact per-channel integer pixel sums folded to the mean color of one
    decoded GIF frame — integer-exact, so closed-form oracles can check
    the full decode path on synthetic solid-color frames."""
    n, h, w, frames = decode_gif(payload)
    f = frames[frame_idx].astype("int64")
    tot = h * w
    return tuple(int(f[:, :, c].sum()) // tot for c in range(3))


def _lzw_encode_simple(indices: bytes, min_code: int) -> bytes:
    """Valid-but-naive GIF LZW: a CLEAR before every pixel code keeps the
    table empty and the code width fixed — the classic 'uncompressed GIF'
    trick.  Fixture-generator quality: ~2x the payload of real LZW, zero
    algorithmic risk."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    acc = nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for i in indices:
        emit(i)
        emit(clear)
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


@_lru_cache(maxsize=4096)
def synth_gif_payload(key: int, size: int = 16) -> bytes:
    """Animated-image fixture with closed-form truth: ``(key % 4) + 1``
    solid-color frames of ``size``×``size`` pixels; frame ``i``'s RGB is
    the first three bytes of ``md5("gif{key}:{i}")`` — so the mean color
    of each REAL-decoded frame equals a hex-parse a SQL oracle can
    recompute without decoding.

    The CONTAINER rotates by key class: ``key % 5 == 3`` emits an
    animated WebP (VP8X + ANIM/ANMF around lossless VP8L frames — mean
    colors identical, every frame opaque and full-canvas), the rest an
    animated GIF — so the oracle-gated frames query drives both
    multi-frame decode paths."""
    import numpy as np

    n_frames = (key % 4) + 1
    if key % 5 == 3:
        from .webp import encode_webp_anim

        frames = []
        for i in range(n_frames):
            digest = hashlib.md5(f"gif{key}:{i}".encode()).hexdigest()
            rgb = [int(digest[c : c + 2], 16) for c in (0, 2, 4)]
            frames.append(np.full((size, size, 3), rgb, dtype=np.uint8))
        return encode_webp_anim(frames)
    palette = np.zeros((4, 3), dtype=np.uint8)
    for i in range(n_frames):
        digest = hashlib.md5(f"gif{key}:{i}".encode()).hexdigest()
        palette[i] = [int(digest[c : c + 2], 16) for c in (0, 2, 4)]
    out = bytearray(b"GIF89a")
    out += size.to_bytes(2, "little") * 2
    out.append(0x80 | 0x01)  # GCT, 4 entries
    out += b"\x00\x00"
    out += palette.tobytes()
    for i in range(n_frames):
        out.append(0x2C)
        out += (0).to_bytes(2, "little") * 2
        out += size.to_bytes(2, "little") * 2
        out.append(0x00)
        out.append(2)  # LZW min code size
        data = _lzw_encode_simple(bytes([i]) * (size * size), 2)
        for j in range(0, len(data), 255):
            chunk = data[j : j + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def decode_frames(payload: bytes) -> tuple[int, int, int, "object"]:
    """Multi-frame decode dispatcher: GIF87a/89a through
    :func:`decode_gif`, WebP (animated or still) through
    :func:`..webp.decode_webp_frames` — one ``(n, h, w, frames[n,h,w,3])``
    contract either way."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .webp import decode_webp_frames

        return decode_webp_frames(payload)
    return decode_gif(payload)


def extract_gif_frame_colors(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode_fn: Callable[[bytes], tuple] = decode_frames,
) -> DataFrame:
    """One row per decoded animation frame with its exact integer mean
    color — the video-analysis fan-out over the REAL multi-frame codecs
    (GIF and animated WebP via :func:`decode_frames`): decode once per
    payload inside mapInPandas, emit (id, frame_idx, r, g, b).  Only
    per-frame statistics cross the Arrow boundary; pixels never leave the
    worker."""
    import numpy as np

    id_field = df.schema[id_col]
    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, frame_idx bigint, "
        "r bigint, g bigint, b bigint"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, idxs, rs, gs, bs = [], [], [], [], []
            # duplicate payloads are the NORM in dedup-shaped workloads:
            # decode each distinct payload once per batch (bounded memory —
            # the cache dies with the batch)
            cache: dict[bytes, list[tuple[int, int, int]]] = {}
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                bp = bytes(p)
                stats = cache.get(bp)
                if stats is None:
                    n, h, w, frames = decode_fn(bp)
                    tot = h * w
                    sums = frames.astype(np.int64).sum(axis=(1, 2))  # (n, 3)
                    stats = [
                        tuple(int(sums[i, c]) // tot for c in range(3))
                        for i in range(n)
                    ]
                    cache[bp] = stats
                for i, (r, g, b) in enumerate(stats):
                    ids.append(rid)
                    idxs.append(i)
                    rs.append(r)
                    gs.append(g)
                    bs.append(b)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "r": rs, "g": gs, "b": bs}
            )

    # NULL payloads are excluded (engine policy, like NULL skyline dims)
    return df.where(F.col(payload_col).isNotNull()).select(id_col, payload_col).mapInPandas(fn, schema=schema)


# ---------------------------------------------------------------------------
# REAL JPEG codec (numpy + struct, no external libs)
# ---------------------------------------------------------------------------
#
# Huffman DCT (ITU T.81): baseline/extended (SOF0/1) greyscale and
# YCbCr with ARBITRARY sampling factors (4:4:4, 4:2:0, 4:2:2, ... — the
# dominant real-crawl encodings), PROGRESSIVE (SOF2) streams with
# spectral selection + successive approximation (DC/AC first and
# refinement scans, EOBn run codes), and 12-BIT extended-sequential
# precision (16-bit DQT, 2048 level shift, >>4 downshift to the uint8
# contract), plus ARITHMETIC entropy coding — sequential SOF9 AND
# progressive SOF10 (Annex G.2 models) — through the T.81 Annex D/F QM
# coder (operators/jpeg_arith.py, conformance-tested entropy-exact
# against the system libjpeg in both directions, round 16).  Lossless
# and hierarchical SOFs raise
# ValueError (external-decoder integration points).  The encoder uses the Annex K
# quantization + Huffman tables (plus a spec-valid static AC table
# carrying the progressive-only EOBn symbols), so any standard decoder
# reads its output; the decoder builds canonical Huffman tables from
# whatever DHT declares, so it reads standard files, not just ours.
# Restart markers (DRI/RSTn) are honored.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K quantization tables, natural (row-major) order
_JPEG_QL = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_QC = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K Huffman table specs: (bits[1..16], values)
_HUFF_DC_L = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_C = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HUFF_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


# Progressive AC scans need EOBn symbols (r<<4, r=1..14) that the baseline
# Annex K AC tables do not define (libjpeg ships optimized per-file tables
# in progressive mode).  This static table assigns every progressive AC
# symbol — EOB0..EOB14, ZRL, and all (run, size 1..10) pairs — a 9-bit
# canonical code: 176 symbols < 2^9 - 1, so the all-ones code stays
# unused and the table is spec-valid; the decoder reads it from DHT like
# any other table.
_HUFF_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0],
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)],
)
# 12-bit-precision tables (Annex K only covers 8-bit sample statistics):
# flat canonical codes over the FULL 12-bit symbol alphabets — DC
# categories 0..15 as 16 five-bit codes (of 32; the reserved all-ones
# code stays unused), AC run/size with sizes 1..14 as 240 nine-bit codes
# (of 512).  Spec-valid like the flat progressive table above; the
# encoder trades compression for unconditional coverage, which is the
# right fixture-side trade.
_HUFF_DC_12 = (
    [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    list(range(16)),
)
_HUFF_AC_12 = (
    [0, 0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0],
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 15)],
)


def _dct_matrix():
    import numpy as np

    n = np.arange(8, dtype=np.float64)
    k = n.reshape(8, 1)
    d = np.cos((2 * n[None, :] + 1) * k * np.pi / 16.0) * 0.5
    d[0, :] /= np.sqrt(2.0)
    # orthonormal: rows are the JPEG FDCT basis (F = D @ f @ D.T)
    return d


def _huff_encode_table(bits, vals):
    """value -> (code, length) per the canonical assignment (T.81 C.2)."""
    out = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals):
    """(length, code) -> value, same canonical assignment."""
    out = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return out


class _JpegBitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)

    def restart(self, n: int) -> None:
        """Byte-align (1-padding) and emit the RSTn marker — markers sit
        OUTSIDE the entropy stream, so no byte stuffing applies."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, 0xD0 + (n & 7)])


def _magnitude(v: int) -> tuple[int, int]:
    """(category size, appended bits) for a DC diff / AC level (F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _jpeg_quantized_components(pix, subsample: str, precision: int = 8):
    """Forward path shared by the baseline and progressive encoders:
    color-convert, (optionally) subsample chroma, pad each component to
    its MCU grid, FDCT + quantize.  Returns ``(h, w, grey, comps)`` with
    ``comps`` a list of ``(hi, vi, tq, coef)`` where ``coef`` is the
    ``(blocks_y, blocks_x, 64)`` int64 zigzag-order quantized-coefficient
    array (MCU-padded).

    ``precision`` 12 takes uint16 samples in [0, 4095], level-shifts by
    2048 and quantizes with the Annex-K tables scaled x16 (the standard
    practice for 12-bit: coefficient magnitudes grow 16x, so the scaled
    tables keep 8-bit-like quality; they need a 16-bit DQT)."""
    import numpy as np

    if precision == 8:
        pix = np.asarray(pix, dtype=np.uint8)
    elif precision == 12:
        pix = np.asarray(pix)
        if pix.dtype.kind not in "iu" or (pix.size and (pix.min() < 0 or pix.max() > 4095)):
            raise ValueError("12-bit JPEG input must be integers in [0, 4095]")
        pix = pix.astype(np.uint16)
    else:
        raise ValueError("encode_jpeg precision must be 8 or 12")
    if pix.ndim == 3 and pix.shape[2] == 1:
        pix = pix[..., 0]  # single-channel (h, w, 1) is greyscale
    if pix.ndim == 3 and pix.shape[2] != 3:
        raise ValueError(f"encode_jpeg: expected (h, w), (h, w, 1) or (h, w, 3), got {pix.shape}")
    if subsample not in ("444", "422", "420"):
        raise ValueError(
            f"encode_jpeg: subsample must be '444', '422' or '420', got {subsample!r}"
        )
    grey = pix.ndim == 2
    h, w = pix.shape[:2]
    center = 128.0 if precision == 8 else 2048.0
    if grey:
        planes = [pix.astype(np.float64)]
    else:
        rgb = pix.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + center,
            0.5 * r - 0.418688 * g - 0.081312 * b + center,
        ]
    # sampling factors: 4:2:0 gives luma (2, 2) against chroma (1, 1);
    # 4:2:2 halves chroma horizontally only — luma (2, 1)
    sub = subsample if not grey else "444"
    y_samp = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[sub]
    samps = [y_samp, (1, 1), (1, 1)]
    hmax = max(s[0] for s in samps[: len(planes)])
    vmax = max(s[1] for s in samps[: len(planes)])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    if sub != "444":
        # chroma = fh x fv box mean of the (edge-padded) full-res plane
        fh, fv = y_samp
        eh = -(-h // fv) * fv
        ew = -(-w // fh) * fh
        for ci in (1, 2):
            p = np.empty((eh, ew), dtype=np.float64)
            p[:h, :w] = planes[ci]
            p[h:, :w] = p[h - 1 : h, :w]
            p[:, w:] = p[:, w - 1 : w]
            planes[ci] = p.reshape(eh // fv, fv, ew // fh, fh).mean(axis=(1, 3))

    d = _dct_matrix()
    qscale = 1.0 if precision == 8 else 16.0
    ql = np.array(_JPEG_QL, dtype=np.float64).reshape(8, 8) * qscale
    qc = np.array(_JPEG_QC, dtype=np.float64).reshape(8, 8) * qscale
    comps = []
    for ci, plane in enumerate(planes):
        hi, vi = samps[ci]
        tq = 0 if ci == 0 else 1
        by, bx = mcuy * vi, mcux * hi
        ph, pw = plane.shape
        p = np.empty((by * 8, bx * 8), dtype=np.float64)
        p[:ph, :pw] = plane
        p[ph:, :pw] = p[ph - 1 : ph, :pw]  # edge-replicate padding
        p[:, pw:] = p[:, pw - 1 : pw]
        blocks = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8) - center
        coef = np.einsum("ij,njk,kl->nil", d, blocks, d.T)
        qz = np.round(coef / (ql if tq == 0 else qc)).astype(np.int64)
        comps.append((hi, vi, tq, qz.reshape(by, bx, 64)[..., _ZIGZAG]))
    return h, w, grey, comps


def _emit_ac_band(wtr, enc_ac_t, zz, lo: int, hi: int) -> None:
    """Run/size coding of the AC band ``zz[lo..hi]`` for the BASELINE
    scan (always called with the full band 1..63; progressive first
    scans inline their own loop in :func:`_encode_progressive_scans`
    because they add the point transform and EOBn run coding)."""
    run = 0
    last_nz = lo - 1
    for i in range(hi, lo - 1, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(lo, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = enc_ac_t[0xF0]  # ZRL
            wtr.write(code, ln)
            run -= 16
        s, bits = _magnitude(int(zz[i]))
        code, ln = enc_ac_t[(run << 4) | s]
        wtr.write(code, ln)
        wtr.write(bits, s)
        run = 0
    if last_nz < hi:
        code, ln = enc_ac_t[0x00]  # EOB
        wtr.write(code, ln)


def _encode_baseline_entropy(comps, restart_interval: int = 0,
                             precision: int = 8) -> bytes:
    """Interleaved single-scan baseline entropy coding over the MCU grid
    (general sampling factors: each MCU carries hi x vi blocks per
    component in raster order).  ``restart_interval`` > 0 emits RSTn
    markers (cycling 0-7) every that many MCUs, resetting DC predictors.
    12-bit precision swaps in the flat full-alphabet tables (one table
    pair for both luma and chroma)."""
    if precision == 12:
        enc_dc = [_huff_encode_table(*_HUFF_DC_12)] * 2
        enc_ac = [_huff_encode_table(*_HUFF_AC_12)] * 2
    else:
        enc_dc = [_huff_encode_table(*_HUFF_DC_L), _huff_encode_table(*_HUFF_DC_C)]
        enc_ac = [_huff_encode_table(*_HUFF_AC_L), _huff_encode_table(*_HUFF_AC_C)]
    wtr = _JpegBitWriter()
    pred = [0] * len(comps)
    mcuy = comps[0][3].shape[0] // comps[0][1]
    mcux = comps[0][3].shape[1] // comps[0][0]
    mcu_i, rst = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                wtr.restart(rst)
                rst += 1
                pred = [0] * len(comps)
            mcu_i += 1
            for ci, (hi, vi, tq, coef) in enumerate(comps):
                for v in range(vi):
                    for hh in range(hi):
                        zz = coef[my * vi + v, mx * hi + hh]
                        s, bits = _magnitude(int(zz[0]) - pred[ci])
                        pred[ci] = int(zz[0])
                        code, ln = enc_dc[tq][s]
                        wtr.write(code, ln)
                        if s:
                            wtr.write(bits, s)
                        _emit_ac_band(wtr, enc_ac[tq], zz, 1, 63)
    return wtr.flush()


def _encode_arith_entropy(comps, restart_interval: int = 0) -> bytes:
    """Interleaved single-scan SEQUENTIAL ARITHMETIC (SOF9) entropy
    coding over the MCU grid — the same traversal as
    :func:`_encode_baseline_entropy` with the T.81 Annex D QM coder
    (operators/jpeg_arith.py) in place of Huffman.  Conditioning table
    ids follow the quant-table assignment (0 = luma, 1 = chroma) with
    the default L/U/Kx conditioning; a restart flushes the coder, emits
    RSTn and restarts with zeroed statistics, per the standard."""
    from .jpeg_arith import (
        ACModel,
        ArithEncoder,
        DCModel,
        _FIXED_BIN,
        encode_ac_block,
        encode_dc_diff,
    )

    def fresh():
        return (
            ArithEncoder(),
            {tq: DCModel() for _hi, _vi, tq, _c in comps},
            {tq: ACModel() for _hi, _vi, tq, _c in comps},
            bytearray([_FIXED_BIN]),
        )

    enc, dcm, acm, fixed = fresh()
    out = bytearray()
    pred = [0] * len(comps)
    dc_ctx = [0] * len(comps)
    mcuy = comps[0][3].shape[0] // comps[0][1]
    mcux = comps[0][3].shape[1] // comps[0][0]
    mcu_i, rst = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                enc, dcm, acm, fixed = fresh()
                pred = [0] * len(comps)
                dc_ctx = [0] * len(comps)
            mcu_i += 1
            for ci, (hi, vi, tq, coef) in enumerate(comps):
                for v in range(vi):
                    for hh in range(hi):
                        zz = coef[my * vi + v, mx * hi + hh]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        dc_ctx[ci] = encode_dc_diff(enc, dcm[tq], dc_ctx[ci], diff)
                        encode_ac_block(enc, acm[tq], fixed, zz)
    out += enc.flush()
    return bytes(out)


def _prog_scan_script(grey: bool, n_comps: int):
    """libjpeg's default ``jpeg_simple_progression`` scan script, shared
    by the Huffman (SOF2) and arithmetic (SOF10) progressive encoders."""
    if grey or n_comps == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return [
        ([0, 1, 2], 0, 0, 0, 1),
        ([0], 1, 5, 0, 2), ([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0), ([0], 1, 63, 1, 0),
    ]


def _encode_arith_progressive_scans(comps, grey: bool, h: int, w: int,
                                    restart_interval: int = 0):
    """Progressive ARITHMETIC (SOF10) entropy coding over the same
    default scan script as the Huffman progressive encoder, with the
    Annex G.2 models (operators/jpeg_arith.py): DC first = sequential
    DC model over point-transformed diffs, DC refinement = one
    fixed-state bit per block, AC first = sequential AC model on
    ``|v| >> Al`` magnitudes, AC refinement = the G.2.3 correction-bit
    model.  Statistics are fresh per scan and per restart, per the
    standard.  Returns ``(sos_header_payload, entropy_bytes)`` pairs."""
    from .jpeg_arith import (
        ACModel,
        ArithEncoder,
        DCModel,
        _FIXED_BIN,
        encode_ac_block,
        encode_ac_refine,
        encode_dc_diff,
    )

    mcuy = comps[0][3].shape[0] // comps[0][1]
    mcux = comps[0][3].shape[1] // comps[0][0]
    hmax = max(c[0] for c in comps)
    vmax = max(c[1] for c in comps)

    def sos_payload(comp_ids, ss, se, ah, al):
        b = bytes([len(comp_ids)])
        for cid in comp_ids:
            t = 0 if cid == 0 else 1
            b += bytes([cid + 1, (t << 4) | t])
        return b + bytes([ss, se, (ah << 4) | al])

    def ni_grid(ci):
        hi, vi = comps[ci][0], comps[ci][1]
        return _ni_block_grid(h, w, hi, vi, hmax, vmax)

    def fresh():
        return (
            ArithEncoder(),
            {tq: DCModel() for _hi, _vi, tq, _c in comps},
            {tq: ACModel() for _hi, _vi, tq, _c in comps},
            bytearray([_FIXED_BIN]),
        )

    def dc_scan(out, cis, ah, al):
        enc, dcm, acm, fixed = fresh()
        pred = {ci: 0 for ci in cis}
        dc_ctx = {ci: 0 for ci in cis}
        mcu_i, rst = 0, 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                    out += enc.flush()
                    out += bytes([0xFF, 0xD0 + (rst & 7)])
                    rst += 1
                    enc, dcm, acm, fixed = fresh()
                    pred = {ci: 0 for ci in cis}
                    dc_ctx = {ci: 0 for ci in cis}
                mcu_i += 1
                for ci in cis:
                    hi, vi, tq, coef = comps[ci]
                    for v in range(vi):
                        for hh in range(hi):
                            dc = int(coef[my * vi + v, mx * hi + hh, 0])
                            if ah == 0:  # DC first at point transform al
                                dv = dc >> al
                                dc_ctx[ci] = encode_dc_diff(
                                    enc, dcm[tq], dc_ctx[ci], dv - pred[ci]
                                )
                                pred[ci] = dv
                            else:  # DC refinement: fixed-state bit
                                enc.code(fixed, 0, (dc >> al) & 1)
        out += enc.flush()

    def ac_scan(out, ci, ss, se, ah, al):
        enc, _dcm, acm, fixed = fresh()
        _hi, _vi, tq, coef = comps[ci]
        nby, nbx = ni_grid(ci)
        blk_i, rst = 0, 0
        for byi in range(nby):
            for bxi in range(nbx):
                if restart_interval and blk_i and blk_i % restart_interval == 0:
                    out += enc.flush()
                    out += bytes([0xFF, 0xD0 + (rst & 7)])
                    rst += 1
                    enc, _dcm2, acm, fixed = fresh()
                blk_i += 1
                zz = coef[byi, bxi]
                if ah == 0:
                    encode_ac_block(enc, acm[tq], fixed, zz, ss, se, al)
                else:
                    encode_ac_refine(enc, acm[tq], fixed, zz, ss, se, al)
        out += enc.flush()

    scans = []
    for cis, ss, se, ah, al in _prog_scan_script(grey, len(comps)):
        body = bytearray()
        if ss == 0:
            dc_scan(body, cis, ah, al)
        else:
            ac_scan(body, cis[0], ss, se, ah, al)
        scans.append((sos_payload(cis, ss, se, ah, al), bytes(body)))
    return scans


def _encode_progressive_scans(comps, grey: bool, h: int, w: int,
                              restart_interval: int = 0):
    """Progressive (SOF2) entropy coding following libjpeg's DEFAULT
    ``jpeg_simple_progression`` scan script — the structure of virtually
    every real-world progressive JPEG: an interleaved DC-first scan at
    Al=1, per-component AC first scans with SPECTRAL band splits (luma
    1-5 then 6-63 at Al=2, chroma 1-63 at Al=1), multi-level AC
    refinement (luma 2->1->0, chroma 1->0) with EOBn run codes and
    buffered correction bits, and a DC refinement scan.  Returns a list
    of ``(sos_header_payload, entropy_bytes)``.

    Mirrors ITU T.81 G.1.2: the DC point transform is an arithmetic
    shift; AC first scans code ``|coef| >> Al`` magnitudes (truncation
    toward zero) with EOBn run codes; a refinement scan from Ah=Al+1
    emits one correction bit (``(|coef| >> Al) & 1``) per
    already-visible coefficient and run/size codes for the newly-visible
    ones (``|coef| >> Al == 1``), per libjpeg encode_mcu_AC_refine."""
    enc_dc = [_huff_encode_table(*_HUFF_DC_L), _huff_encode_table(*_HUFF_DC_C)]
    prog_ac = _huff_encode_table(*_HUFF_AC_PROG)
    mcuy = comps[0][3].shape[0] // comps[0][1]
    mcux = comps[0][3].shape[1] // comps[0][0]
    hmax = max(c[0] for c in comps)
    vmax = max(c[1] for c in comps)

    def sos_payload(comp_ids, ss, se, ah, al):
        b = bytes([len(comp_ids)])
        for cid in comp_ids:
            t = 0 if cid == 0 else 1
            b += bytes([cid + 1, (t << 4) | t])
        return b + bytes([ss, se, (ah << 4) | al])

    def ni_grid(ci):
        # non-interleaved block grid EXCLUDES MCU padding (T.81 A.2.2)
        hi, vi = comps[ci][0], comps[ci][1]
        return _ni_block_grid(h, w, hi, vi, hmax, vmax)

    def flush_eobrun(wtr, eobrun, pend):
        if eobrun > 0:
            nb = eobrun.bit_length() - 1
            code, ln = prog_ac[nb << 4]
            wtr.write(code, ln)
            if nb:
                wtr.write(eobrun - (1 << nb), nb)
        for bit in pend:
            wtr.write(bit, 1)
        return 0, []

    def dc_first(wtr, cis, al):
        pred = {ci: 0 for ci in cis}
        mcu_i, rst = 0, 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                    wtr.restart(rst)
                    rst += 1
                    pred = {ci: 0 for ci in cis}
                mcu_i += 1
                for ci in cis:
                    hi, vi, tq, coef = comps[ci]
                    for v in range(vi):
                        for hh in range(hi):
                            dc = int(coef[my * vi + v, mx * hi + hh, 0]) >> al
                            s, bits = _magnitude(dc - pred[ci])
                            pred[ci] = dc
                            code, ln = enc_dc[tq][s]
                            wtr.write(code, ln)
                            if s:
                                wtr.write(bits, s)

    def dc_refine(wtr, cis, al):
        mcu_i, rst = 0, 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                    wtr.restart(rst)
                    rst += 1
                mcu_i += 1
                for ci in cis:
                    hi, vi, _tq, coef = comps[ci]
                    for v in range(vi):
                        for hh in range(hi):
                            wtr.write(
                                (int(coef[my * vi + v, mx * hi + hh, 0]) >> al) & 1, 1
                            )

    def ac_first(wtr, ci, ss, se, al):
        # no correction bits exist in a first scan, so flush_eobrun is
        # always called with an empty pending list here
        coef = comps[ci][3]
        nby, nbx = ni_grid(ci)
        eobrun = 0
        blk_i, rst = 0, 0
        for byi in range(nby):
            for bxi in range(nbx):
                if restart_interval and blk_i and blk_i % restart_interval == 0:
                    eobrun, _ = flush_eobrun(wtr, eobrun, [])  # runs cannot cross RSTn
                    wtr.restart(rst)
                    rst += 1
                blk_i += 1
                zz = coef[byi, bxi]
                # AC point transform truncates toward ZERO (T.81 G.1.2.2)
                band = {
                    k: (abs(int(zz[k])) >> al) * (1 if int(zz[k]) >= 0 else -1)
                    for k in range(ss, se + 1)
                }
                if not any(band.values()):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        eobrun, _ = flush_eobrun(wtr, eobrun, [])
                    continue
                eobrun, _ = flush_eobrun(wtr, eobrun, [])
                run = 0
                last_nz = max(k for k, v in band.items() if v)
                for k in range(ss, last_nz + 1):
                    if band[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = prog_ac[0xF0]
                        wtr.write(code, ln)
                        run -= 16
                    s, bits = _magnitude(band[k])
                    code, ln = prog_ac[(run << 4) | s]
                    wtr.write(code, ln)
                    wtr.write(bits, s)
                    run = 0
                if last_nz < se:
                    eobrun += 1  # trailing EOB joins the run
        flush_eobrun(wtr, eobrun, [])

    def ac_refine(wtr, ci, ss, se, al):
        # T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine, generalized to any
        # Al: visible-at-this-level t = |coef| >> Al; newly nonzero iff
        # t == 1; EOB = last newly-nonzero index; already-visible
        # coefficients (t > 1) — including those past EOB — contribute
        # one buffered correction bit each, flushed after the next
        # Huffman code (ZRL, run/size, or the closing EOBn)
        coef = comps[ci][3]
        nby, nbx = ni_grid(ci)
        eobrun, pend = 0, []
        blk_i, rst = 0, 0
        for byi in range(nby):
            for bxi in range(nbx):
                if restart_interval and blk_i and blk_i % restart_interval == 0:
                    # EOB runs and buffered correction bits cannot cross RSTn
                    eobrun, pend = flush_eobrun(wtr, eobrun, pend)
                    wtr.restart(rst)
                    rst += 1
                blk_i += 1
                zz = coef[byi, bxi]
                tval = {k: abs(int(zz[k])) >> al for k in range(ss, se + 1)}
                eob = ss - 1
                for k in range(ss, se + 1):
                    if tval[k] == 1:
                        eob = k
                run = 0
                br: list[int] = []
                for k in range(ss, se + 1):
                    t = tval[k]
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and k <= eob:
                        eobrun, pend = flush_eobrun(wtr, eobrun, pend)
                        code, ln = prog_ac[0xF0]
                        wtr.write(code, ln)
                        run -= 16
                        for bit in br:
                            wtr.write(bit, 1)
                        br = []
                    if t > 1:
                        br.append(t & 1)
                        continue
                    # t == 1: newly visible — run/size + sign
                    eobrun, pend = flush_eobrun(wtr, eobrun, pend)
                    code, ln = prog_ac[(run << 4) | 1]
                    wtr.write(code, ln)
                    wtr.write(1 if int(zz[k]) > 0 else 0, 1)
                    for bit in br:
                        wtr.write(bit, 1)
                    br = []
                    run = 0
                if run > 0 or br:
                    eobrun += 1
                    pend.extend(br)
                    if eobrun == 0x7FFF:
                        eobrun, pend = flush_eobrun(wtr, eobrun, pend)
        flush_eobrun(wtr, eobrun, pend)

    script = _prog_scan_script(grey, len(comps))
    scans = []
    for cis, ss, se, ah, al in script:
        wtr = _JpegBitWriter()
        if ss == 0 and ah == 0:
            dc_first(wtr, cis, al)
        elif ss == 0:
            dc_refine(wtr, cis, al)
        elif ah == 0:
            ac_first(wtr, cis[0], ss, se, al)
        else:
            ac_refine(wtr, cis[0], ss, se, al)
        scans.append((sos_payload(cis, ss, se, ah, al), wtr.flush()))
    return scans


def encode_jpeg(pix, subsample: str = "444", progressive: bool = False,
                restart_interval: int = 0, precision: int = 8,
                arithmetic: bool = False) -> bytes:
    """REAL JPEG encoder: 8-bit greyscale ``(h, w)`` or RGB ``(h, w, 3)``
    ndarray -> JFIF bytes (Annex K quant + Huffman tables).

    ``subsample``: ``"444"`` (no subsampling), ``"422"`` (2x1 horizontal
    chroma subsampling) or ``"420"`` (2x2, the dominant real-crawl
    encoding); ignored for greyscale.  ``progressive``: emit an SOF2
    stream following libjpeg's default 10-scan progression instead of a
    single baseline SOF0 scan.  ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that many MCUs (baseline and
    progressive DC scans) / blocks (progressive AC scans).
    ``precision`` 12 takes uint16 samples in [0, 4095] and emits an
    EXTENDED SEQUENTIAL (SOF1) stream — 16-bit quant tables (Annex-K
    x16), flat full-alphabet Huffman tables — the 12-bit form T.81
    actually allows (true baseline SOF0 is 8-bit-only; 12-bit
    progressive is out of scope here and raises).  Standard decoders
    read every form; the synth fixtures below use them so every decode
    path is exercised end-to-end."""
    import struct as _struct

    if precision not in (8, 12):
        raise ValueError("encode_jpeg precision must be 8 or 12")
    if precision == 12 and progressive:
        raise ValueError("12-bit progressive JPEG not supported here")
    h, w, grey, comps = _jpeg_quantized_components(pix, subsample, precision)

    def seg(marker: int, payload: bytes) -> bytes:
        return _struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if precision == 12:
        # Pq=1: 16-bit big-endian entries
        out += seg(
            0xFFDB,
            b"\x10" + b"".join(
                _struct.pack(">H", _JPEG_QL[_ZIGZAG[i]] * 16) for i in range(64)
            ),
        )
        if not grey:
            out += seg(
                0xFFDB,
                b"\x11" + b"".join(
                    _struct.pack(">H", _JPEG_QC[_ZIGZAG[i]] * 16) for i in range(64)
                ),
            )
    else:
        out += seg(0xFFDB, b"\x00" + bytes(_JPEG_QL[_ZIGZAG[i]] for i in range(64)))
        if not grey:
            out += seg(0xFFDB, b"\x01" + bytes(_JPEG_QC[_ZIGZAG[i]] for i in range(64)))
    nc = len(comps)
    sof = _struct.pack(">BHHB", precision, h, w, nc)
    for ci, (hi, vi, tq, _coef) in enumerate(comps):
        sof += bytes([ci + 1, (hi << 4) | vi, tq])
    if arithmetic:
        # sequential SOF9 (8- or 12-bit) / progressive SOF10
        sof_marker = 0xFFCA if progressive else 0xFFC9
    elif progressive:
        sof_marker = 0xFFC2
    elif precision == 12:
        sof_marker = 0xFFC1  # extended sequential
    else:
        sof_marker = 0xFFC0
    out += seg(sof_marker, sof)

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    if arithmetic:
        # DAC: default conditioning, stated explicitly (L=0,U=1; Kx=5)
        from .jpeg_arith import DEFAULT_AC_KX, DEFAULT_DC_L, DEFAULT_DC_U

        dac = bytes([0x00, (DEFAULT_DC_U << 4) | DEFAULT_DC_L, 0x10, DEFAULT_AC_KX])
        if not grey:
            dac += bytes([0x01, (DEFAULT_DC_U << 4) | DEFAULT_DC_L, 0x11, DEFAULT_AC_KX])
        out += seg(0xFFCC, dac)
    elif precision == 12:
        out += dht(0, 0, _HUFF_DC_12) + dht(1, 0, _HUFF_AC_12)
        if not grey:
            out += dht(0, 1, _HUFF_DC_12) + dht(1, 1, _HUFF_AC_12)
    else:
        ac_spec = _HUFF_AC_PROG if progressive else _HUFF_AC_L
        out += dht(0, 0, _HUFF_DC_L) + dht(1, 0, ac_spec)
        if not grey:
            out += dht(0, 1, _HUFF_DC_C) + dht(
                1, 1, _HUFF_AC_PROG if progressive else _HUFF_AC_C
            )
    if restart_interval:
        out += seg(0xFFDD, _struct.pack(">H", restart_interval))
    if progressive:
        scan_fn = (
            _encode_arith_progressive_scans if arithmetic else _encode_progressive_scans
        )
        for sos_payload, entropy in scan_fn(comps, grey, h, w, restart_interval):
            out += seg(0xFFDA, sos_payload)
            out += entropy
    else:
        sos = bytes([nc])
        for ci, (_hi, _vi, tq, _coef) in enumerate(comps):
            sos += bytes([ci + 1, (tq << 4) | tq])
        sos += b"\x00\x3f\x00"
        out += seg(0xFFDA, sos)
        if arithmetic:
            out += _encode_arith_entropy(comps, restart_interval)
        else:
            out += _encode_baseline_entropy(comps, restart_interval, precision)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """Entropy-segment bit reader: un-stuffs FF00, pauses at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy data truncated")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt & 0x07)
            else:
                raise ValueError("JPEG entropy data truncated at marker")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def skip_restart(self) -> None:
        self.acc = 0
        self.nbits = 0
        d = self.data
        # the byte-align padding before RSTn can itself be a stuffed 0xFF
        # (all-ones pad -> FF 00 in the stream), so scan forward to the
        # next real marker rather than requiring RSTn at the cursor
        p = self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and d[p + 1] != 0x00):
            p += 1
        if p + 1 < len(d) and 0xD0 <= d[p + 1] <= 0xD7:
            self.pos = p + 2

    def huff(self, table) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bits(1)
            v = table.get((ln, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")

    def next_marker_pos(self) -> int:
        """Byte position of the first marker at/after the read cursor —
        where the parse loop resumes after an entropy-coded scan."""
        d, p = self.data, self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and d[p + 1] != 0x00:
                return p
            p += 1
        return len(d)


class _RestartMarker(Exception):
    def __init__(self, n: int):
        self.n = n


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def _ni_block_grid(h, w, hi, vi, hmax, vmax):
    """Non-interleaved block grid ``(ni_by, ni_bx)`` for one component:
    ns=1 scans exclude MCU padding blocks (T.81 A.2.2/A.2.3).  The ONE
    home of this formula — the decoder geometry and both progressive
    encoders (Huffman and arithmetic) all call it, so it cannot drift."""
    return (
        -(-(-(-(h * vi) // vmax)) // 8),
        -(-(-(-(w * hi) // hmax)) // 8),
    )


def _jpeg_geometry(h, w, comps):
    """Frame geometry: (hmax, vmax, mcux, mcuy, per-comp dict) where each
    comp carries its MCU-padded block grid (interleaved scans) and its
    non-interleaved block grid (ns=1 scans exclude MCU padding blocks,
    T.81 A.2.2/A.2.3)."""
    hmax = max(hi for _cid, hi, _vi, _tq in comps)
    vmax = max(vi for _cid, _hi, vi, _tq in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    geo = []
    for _cid, hi, vi, _tq in comps:
        ni_by, ni_bx = _ni_block_grid(h, w, hi, vi, hmax, vmax)
        geo.append({
            "hi": hi, "vi": vi,
            "pad_bx": mcux * hi, "pad_by": mcuy * vi,
            "ni_bx": ni_bx, "ni_by": ni_by,
        })
    return hmax, vmax, mcux, mcuy, geo


def _scan_units(geo, mcux, mcuy, scan_cis):
    """Yield restart units (lists of ``(ci, by, bx)`` block coords) in
    scan order: a single-component scan is non-interleaved (one block per
    unit over the component's own grid); a multi-component scan
    interleaves hi x vi blocks per component per MCU."""
    if len(scan_cis) == 1:
        ci = scan_cis[0]
        g = geo[ci]
        for by in range(g["ni_by"]):
            for bx in range(g["ni_bx"]):
                yield [(ci, by, bx)]
        return
    for my in range(mcuy):
        for mx in range(mcux):
            unit = []
            for ci in scan_cis:
                g = geo[ci]
                for v in range(g["vi"]):
                    for hh in range(g["hi"]):
                        unit.append((ci, my * g["vi"] + v, mx * g["hi"] + hh))
            yield unit


def _decode_block_baseline(rdr, hdc, hac, pred, out):
    """One baseline block: DC diff + full AC band into ``out`` (zigzag
    order, quantized); returns the new DC predictor."""
    s = rdr.huff(hdc)
    pred += _extend(rdr.bits(s), s) if s else 0
    out[0] = pred
    i = 1
    while i < 64:
        rs = rdr.huff(hac)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                i += 16  # ZRL
                continue
            break  # EOB
        i += r
        if i > 63:
            raise ValueError("JPEG AC index overflow")
        out[i] = _extend(rdr.bits(s), s)
        i += 1
    return pred


def _decode_ac_first(rdr, hac, out, ss, se, al, eobrun):
    """Progressive AC first scan for one block (T.81 G.2.2): places
    ``value << Al`` coefficients, honours EOBn run codes."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rdr.huff(hac)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += rdr.bits(r)
                return eobrun
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC index overflow")
        out[k] = _extend(rdr.bits(s), s) << al
        k += 1
    return 0


def _decode_ac_refine(rdr, hac, out, ss, se, al, eobrun):
    """Progressive AC refinement for one block (T.81 G.1.2.3 decode /
    libjpeg decode_mcu_AC_refine): one correction bit per already-nonzero
    coefficient passed, run/size codes place newly-nonzero +-(1 << Al)."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rdr.huff(hac)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rdr.bits(r)
                    break
                val = 0  # ZRL: advance 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("JPEG refinement scan: size != 1")
                val = p1 if rdr.bits(1) else m1
            while k <= se:
                c = int(out[k])
                if c != 0:
                    if rdr.bits(1) and (c & p1) == 0:
                        out[k] = c + (p1 if c >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= se:
                out[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(out[k])
            if c != 0:
                if rdr.bits(1) and (c & p1) == 0:
                    out[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_arith_scan(payload, pos, coefs, units, td_ta, pred,
                       dc_cond, ac_cond, restart_interval, total_units,
                       ss=0, se=63, ah=0, al=0, progressive=False):
    """Arithmetic scan body — sequential (SOF9) or progressive (SOF10):
    walk the scan's units with the T.81 Annex F entropy layer
    (operators/jpeg_arith.py), honoring restart markers (each restart
    re-initializes the coder and zeroes every statistics area, DC
    predictor and DC context, per the standard; statistics are likewise
    fresh per scan).  Progressive scan types follow Annex G.2: DC first
    = the sequential DC model over point-transformed diffs, DC
    refinement = one fixed-state bit per block, AC first = the
    sequential AC model storing ``<< al``, AC refinement = the G.2.3
    correction-bit model.  Returns the terminating marker position."""
    from .jpeg_arith import (
        ACModel,
        ArithDecoder,
        DCModel,
        DEFAULT_AC_KX,
        DEFAULT_DC_L,
        DEFAULT_DC_U,
        _FIXED_BIN,
        decode_ac_block,
        decode_ac_refine,
        decode_dc_diff,
    )

    def fresh_models():
        dcm = {
            td: DCModel(*dc_cond.get(td, (DEFAULT_DC_L, DEFAULT_DC_U)))
            for td, _ta in td_ta.values()
        }
        acm = {ta: ACModel(ac_cond.get(ta, DEFAULT_AC_KX)) for _td, ta in td_ta.values()}
        return dcm, acm, bytearray([_FIXED_BIN])

    dec = ArithDecoder(payload, pos)
    dcm, acm, fixed = fresh_models()
    dc_ctx = {ci: 0 for ci in pred}
    unit_i = 0
    for unit in units:
        for ci, by, bx in unit:
            out = coefs[ci][by, bx]
            td, ta = td_ta[ci]
            if not progressive:
                diff, dc_ctx[ci] = decode_dc_diff(dec, dcm[td], dc_ctx[ci])
                pred[ci] += diff
                out[0] = pred[ci]
                decode_ac_block(dec, acm[ta], fixed, out)
            elif ss == 0 and ah == 0:  # DC first
                diff, dc_ctx[ci] = decode_dc_diff(dec, dcm[td], dc_ctx[ci])
                pred[ci] += diff
                out[0] = pred[ci] << al
            elif ss == 0:  # DC refinement: one fixed-state bit
                if dec.decode(fixed, 0):
                    out[0] = int(out[0]) | (1 << al)
            elif ah == 0:  # AC first
                decode_ac_block(dec, acm[ta], fixed, out, ss, se, al)
            else:  # AC refinement
                decode_ac_refine(dec, acm[ta], fixed, out, ss, se, al)
        unit_i += 1
        if restart_interval and unit_i % restart_interval == 0 and unit_i < total_units:
            mp = dec.marker_pos
            if (
                mp + 1 >= len(payload)
                or payload[mp] != 0xFF
                or not 0xD0 <= payload[mp + 1] <= 0xD7
            ):
                raise ValueError("arithmetic JPEG: expected restart marker")
            dec = ArithDecoder(payload, mp + 2)
            dcm, acm, fixed = fresh_models()
            for ci in pred:
                pred[ci] = 0
                dc_ctx[ci] = 0
    return dec.marker_pos


def decode_jpeg(payload: bytes) -> tuple[int, int, int, "object"]:
    """REAL JPEG decoder (numpy + struct): returns (height, width,
    channels, ndarray[h, w, c] uint8).

    Handles baseline/extended (SOF0/1) greyscale and YCbCr with ARBITRARY
    sampling factors (4:4:4, 4:2:0, 4:2:2, 4:4:0, ...; chroma is
    nearest-neighbor upsampled) and PROGRESSIVE (SOF2) streams —
    spectral selection, successive approximation (DC + AC refinement
    scans, EOBn run codes), canonical Huffman tables from DHT, restart
    markers — at 8- OR 12-bit sample precision (12-bit: 16-bit DQT
    entries, 2048 level shift; output is downshifted to the uint8
    contract, samples >> 4) — plus ARITHMETIC streams, both sequential
    (SOF9) and progressive (SOF10, Annex G.2 models), through the T.81
    QM coder (``operators/jpeg_arith.py``).  Lossless and hierarchical
    SOFs raise ValueError (external-decoder integration points)."""
    import struct as _struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qt: dict[int, "object"] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    precision = 8
    progressive = False
    arith = False
    # DAC conditioning (T.81 B.2.4.3); defaults apply when absent
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    restart_interval = 0
    coefs = None
    geom = None
    scans_done = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        while payload[pos + 1] == 0xFF:  # fill bytes before a marker
            pos += 1
            if pos + 4 > len(payload):
                raise ValueError("JPEG truncated in marker fill")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone markers (TEM, stray RSTn) carry no length segment
            pos += 2
            continue
        (ln,) = _struct.unpack(">H", payload[pos + 2 : pos + 4])
        data = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(data):
                pq, tq = data[off] >> 4, data[off] & 0x0F
                if pq not in (0, 1):
                    raise ValueError("JPEG DQT precision out of range")
                step = 1 + pq  # Pq=1: 16-bit big-endian entries (12-bit streams)
                if off + 1 + 64 * step > len(data):
                    raise ValueError("JPEG DQT segment truncated")
                tbl = np.zeros(64, dtype=np.float64)
                for i in range(64):
                    v = data[off + 1 + i * step]
                    if pq:
                        v = (v << 8) | data[off + 2 + i * step]
                    tbl[_ZIGZAG[i]] = v
                qt[tq] = tbl
                off += 1 + 64 * step
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(data):
                cls, tid = data[off] >> 4, data[off] & 0x0F
                bits = list(data[off + 1 : off + 17])
                nv = sum(bits)
                if len(bits) < 16 or off + 17 + nv > len(data):
                    raise ValueError("JPEG DHT segment truncated")
                vals = list(data[off + 17 : off + 17 + nv])
                huff[(cls, tid)] = _huff_decode_table(bits, vals)
                off += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # SOF0/1 baseline/extended, SOF2 progressive, SOF9/10
            # arithmetic sequential/progressive (round-16 seam closure,
            # operators/jpeg_arith.py)
            prec, h, w, nc = _struct.unpack(">BHHB", data[:6])
            if prec not in (8, 12):
                raise ValueError("only 8- and 12-bit JPEG supported")
            if prec == 12 and marker == 0xC0:
                raise ValueError("baseline SOF0 is 8-bit-only (T.81)")
            precision = prec
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            comps = []
            for ci in range(nc):
                cid, samp, tq = data[6 + ci * 3 : 9 + ci * 3]
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("JPEG sampling factors out of range")
                comps.append((cid, hi, vi, tq))
            frame = (h, w, comps)
            geom = _jpeg_geometry(h, w, comps)
            coefs = None
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG SOF (lossless/hierarchical); sequential "
                "and progressive arithmetic (SOF9/SOF10) are supported"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            off = 0
            while off + 2 <= len(data):
                tc, tb = data[off] >> 4, data[off] & 0x0F
                cs = data[off + 1]
                if tc == 0:
                    l_val, u_val = cs & 0x0F, cs >> 4
                    if not (0 <= l_val <= u_val <= 15):
                        raise ValueError("JPEG DAC: DC conditioning out of range")
                    dc_cond[tb] = (l_val, u_val)
                else:
                    if not (1 <= cs <= 63):
                        raise ValueError("JPEG DAC: AC Kx out of range")
                    ac_cond[tb] = cs
                off += 2
        elif marker == 0xDD:  # DRI
            (restart_interval,) = _struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            h, w, comps = frame
            hmax, vmax, mcux, mcuy, geo = geom
            if coefs is None:
                coefs = [
                    np.zeros((g["pad_by"], g["pad_bx"], 64), dtype=np.int32)
                    for g in geo
                ]
            ns = data[0]
            scan = []  # (ci, td, ta)
            for si in range(ns):
                cs, tt = data[1 + si * 2 : 3 + si * 2]
                for ci, (cid, _hi, _vi, _tq) in enumerate(comps):
                    if cid == cs:
                        scan.append((ci, tt >> 4, tt & 0x0F))
                        break
                else:
                    raise ValueError("JPEG scan names unknown component")
            ss, se, aa = data[1 + ns * 2 : 4 + ns * 2]
            ah, al = aa >> 4, aa & 0x0F
            if not progressive:
                if ns != len(comps):
                    # a spec-valid baseline file may put each component in
                    # its own scan (non-interleaved); decoding only the
                    # first scan would silently return luma-only data
                    raise ValueError(
                        "non-interleaved (multi-scan) JPEG unsupported: scan has "
                        f"{ns} of {len(comps)} frame components"
                    )
                ss, se, ah, al = 0, 63, 0, 0
            else:
                if ss == 0 and se != 0:
                    raise ValueError("progressive JPEG: DC scan must have Se=0")
                if ss > 0 and ns != 1:
                    raise ValueError("progressive JPEG: AC scan must be single-component")
                if ss > se or se > 63:
                    raise ValueError("progressive JPEG: bad spectral band")
            scan_cis = [ci for ci, _td, _ta in scan]
            td_ta = {ci: (td, ta) for ci, td, ta in scan}
            pred = {ci: 0 for ci in scan_cis}
            eobrun = 0
            unit_i = 0
            units = _scan_units(geo, mcux, mcuy, scan_cis)
            total_units = (
                geo[scan_cis[0]]["ni_by"] * geo[scan_cis[0]]["ni_bx"]
                if len(scan_cis) == 1
                else mcux * mcuy
            )
            if arith:
                pos = _decode_arith_scan(
                    payload, pos, coefs, units, td_ta, pred,
                    dc_cond, ac_cond, restart_interval, total_units,
                    ss, se, ah, al, progressive,
                )
                scans_done += 1
                if not progressive:
                    break  # sequential: the single interleaved scan is all
                continue  # progressive: on to the next scan's markers
            rdr = _JpegBitReader(payload, pos)
            for unit in units:
                try:
                    for ci, by, bx in unit:
                        out = coefs[ci][by, bx]
                        td, ta = td_ta[ci]
                        if not progressive:
                            pred[ci] = _decode_block_baseline(
                                rdr, huff[(0, td)], huff[(1, ta)], pred[ci], out
                            )
                        elif ss == 0 and ah == 0:  # DC first
                            s = rdr.huff(huff[(0, td)])
                            pred[ci] += _extend(rdr.bits(s), s) if s else 0
                            out[0] = pred[ci] << al
                        elif ss == 0:  # DC refinement: one bit per block
                            if rdr.bits(1):
                                out[0] = int(out[0]) | (1 << al)
                        elif ah == 0:  # AC first
                            eobrun = _decode_ac_first(
                                rdr, huff[(1, ta)], out, ss, se, al, eobrun
                            )
                        else:  # AC refinement
                            eobrun = _decode_ac_refine(
                                rdr, huff[(1, ta)], out, ss, se, al, eobrun
                            )
                except _RestartMarker:
                    raise ValueError("JPEG restart marker misaligned with interval")
                unit_i += 1
                if (
                    restart_interval
                    and unit_i % restart_interval == 0
                    and unit_i < total_units
                ):
                    rdr.skip_restart()
                    pred = {ci: 0 for ci in scan_cis}
                    eobrun = 0
            scans_done += 1
            pos = rdr.next_marker_pos()
            if not progressive:
                break  # baseline: single interleaved scan holds everything
        # APPn / COM / DNL / others: skipped via the generic length field
    if frame is None or scans_done == 0:
        raise ValueError("JPEG missing SOS scan")

    # reconstruct: dequantize + IDCT all blocks per component, assemble,
    # crop MCU padding, nearest-neighbor upsample subsampled chroma
    h, w, comps = frame
    hmax, vmax, _mcux, _mcuy, geo = geom
    d = _dct_matrix()
    center = 128.0 if precision == 8 else 2048.0
    maxval = 255.0 if precision == 8 else 4095.0
    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        if tq not in qt:
            raise ValueError("JPEG scan references missing quant table")
        C = coefs[ci]
        by, bx = C.shape[:2]
        nat = np.zeros((by, bx, 64), dtype=np.float64)
        nat[..., _ZIGZAG] = C
        blocks = (nat * qt[tq]).reshape(-1, 8, 8)
        px = np.einsum("ij,njk,kl->nil", d.T, blocks, d) + center
        plane = px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        ch = -(-(h * vi) // vmax)
        cw = -(-(w * hi) // hmax)
        plane = np.clip(plane[:ch, :cw], 0.0, maxval)
        if (ch, cw) != (h, w):
            yi = (np.arange(h) * vi) // vmax
            xi = (np.arange(w) * hi) // hmax
            plane = plane[yi][:, xi]
        planes.append(plane)
    if len(planes) == 1:
        out = planes[0][..., None]
    elif len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - center)
        g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
        b = y + 1.772 * (cb - center)
        out = np.clip(np.stack([r, g, b], axis=-1), 0.0, maxval)
    else:
        raise ValueError("JPEG: only 1 or 3 components supported")
    samples = (out + 0.5).astype(np.int32)
    if precision == 12:
        # uint8 contract: 12-bit samples downshift losslessly by 4 bits
        # (12-bit fixtures bake values on the <<4 grid, so round trips
        # through the shift stay exact)
        samples = np.minimum(samples, 4095) >> 4
    return h, w, out.shape[2], np.minimum(samples, 255).astype(np.uint8)


@_lru_cache(maxsize=4096)
def synth_jpeg_payload(key: int, block_px: int = 8, flip_block: int | None = None) -> bytes:
    """64×64 JPEG whose 8×8 block pattern encodes the same 64 md5 bits as
    :func:`synth_png_payload` (values 192/64 instead of 255/0).

    The ENCODING rotates by key class so the oracle-gated ahash queries
    drive every decode path the codec supports: ``key % 5 == 1`` is a
    4:2:0-subsampled baseline COLOR file, ``key % 5 == 3`` a 4:2:0
    PROGRESSIVE color file, ``key % 5 == 2`` a 12-BIT extended-
    sequential (SOF1) greyscale file with the pattern on the ``<<4``
    grid (decodes back to uint8 via the documented ``>> 4`` downshift —
    exactly the pattern, since DC-only blocks on that grid quantize
    losslessly), ``key % 5 == 4`` a 4:2:0 ARITHMETIC-coded color file —
    sequential SOF9 for odd keys, progressive SOF10 for even (round-16
    seam closure, operators/jpeg_arith.py — the T.81 QM coder
    conformance-tested against the system libjpeg), the
    rest 8-bit greyscale baseline.  The color variants
    carry R=G=B, so Y equals the pattern exactly and both chroma planes
    are the constant 128 (DC-only, exactly representable, and invariant
    under subsampling) — every variant reconstructs within ±1 grey
    level of the pattern.  Every pattern block is a constant,
    JPEG-block-aligned 8×8 square, so only DC coefficients survive the
    FDCT and the worst reconstruction error is quant/16 <= 1 grey level
    — the aHash block means stay within ±1 of {64, 192}, far from the
    global-mean threshold, so :func:`image_ahash` provably recovers the
    md5 bits and a SQL oracle states the clustering closed-form WITHOUT
    decoding, whichever encoding the key lands on."""
    import numpy as np

    pix = _md5_block_pixels(key, flip_block, on=192, off=64, block_px=block_px)
    variant = key % 5
    if variant in (1, 3, 4):
        rgb = np.stack([pix, pix, pix], axis=-1)
        return encode_jpeg(
            rgb,
            subsample="420",
            progressive=variant == 3 or (variant == 4 and key % 2 == 0),
            arithmetic=variant == 4,
        )
    if variant == 2:
        return encode_jpeg(pix.astype(np.uint16) << 4, precision=12)
    return encode_jpeg(pix)
