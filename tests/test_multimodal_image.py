"""Real PNG codec: round-trip against the stdlib encoder + Spark path."""

from __future__ import annotations

import numpy as np
import pytest

from query_skyline_qos_flink_spark.operators.multimodal import (
    decode_image,
    extract_image_meta,
)
from tools.rasterpng import Canvas


def _png_rgb(w: int, h: int, pattern: int = 0) -> tuple[bytes, np.ndarray]:
    c = Canvas(w, h)
    for y in range(h):
        for x in range(w):
            c.set(x, y, ((x * 7 + pattern) % 256, (y * 11) % 256, (x * y + pattern) % 256))
    arr = np.frombuffer(bytes(c.buf), dtype=np.uint8).reshape(h, w, 3)
    return c.to_png(), arr


def test_decode_image_roundtrip():
    png, want = _png_rgb(13, 9)
    h, w, ch, arr = decode_image(png)
    assert (h, w, ch) == (9, 13, 3)
    assert np.array_equal(arr, want)


def test_decode_image_filtered_rows():
    """Re-encode with explicit per-row filters 1-4 and check the unfilter
    paths reconstruct identical pixels."""
    import struct
    import zlib

    rng = np.random.default_rng(7)
    h, w, ch = 6, 8, 3
    pix = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        ftype = y % 5  # exercise None/Sub/Up/Average/Paeth
        row = pix[y].astype(np.int32)
        enc = row.copy()
        if ftype == 1:
            enc[ch:] = (row[ch:] - row[:-ch]) % 256
        elif ftype == 2:
            enc = (row - prev) % 256
        elif ftype == 3:
            for i in range(w * ch):
                a = row[i - ch] if i >= ch else 0
                enc[i] = (row[i] - ((a + prev[i]) >> 1)) % 256
        elif ftype == 4:
            for i in range(w * ch):
                a = int(row[i - ch]) if i >= ch else 0
                b = int(prev[i])
                cc = int(prev[i - ch]) if i >= ch else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[i] = (row[i] - pred) % 256
        raw.append(ftype)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    hh, ww, cc2, arr = decode_image(png)
    assert (hh, ww, cc2) == (h, w, ch)
    assert np.array_equal(arr.reshape(h, w * ch), pix)


def test_decode_image_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_image(b"not a png")
    import struct

    def ihdr_png(depth, ctype):
        return (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, 0))
            + _chunk(b"IEND", b"")
        )

    # spec-invalid (depth, color type) combinations
    with pytest.raises(ValueError, match="invalid for color type"):
        decode_image(ihdr_png(4, 2))  # sub-8 RGB
    with pytest.raises(ValueError, match="palette"):
        decode_image(ihdr_png(16, 3))  # 16-bit palette
    with pytest.raises(ValueError, match="depth"):
        decode_image(ihdr_png(3, 0))  # depth not in {1,2,4,8,16}
    # valid header but missing IDAT still raises
    with pytest.raises(ValueError):
        decode_image(ihdr_png(16, 2))


def test_extract_image_meta_spark_path(spark):
    png1, arr1 = _png_rgb(16, 4)
    png2, arr2 = _png_rgb(5, 5, pattern=3)
    df = spark.createDataFrame(
        [(1, png1), (2, png2)], "doc_id bigint, payload binary"
    )
    got = {r.doc_id: r for r in extract_image_meta(df).collect()}
    assert (got[1].height, got[1].width, got[1].n_channels) == (4, 16, 3)
    assert got[1].n_pixels == 64
    assert abs(got[1].mean_luma - float(arr1.mean())) < 1e-9
    assert (got[2].height, got[2].width) == (5, 5)
    assert abs(got[2].mean_luma - float(arr2.mean())) < 1e-9


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_decode_image_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    c = Canvas(w, h)
    c.buf = bytearray(pix.tobytes())
    hh, ww, cc, arr = decode_image(c.to_png())
    assert (hh, ww, cc) == (h, w, 3)
    assert np.array_equal(arr, pix)


def test_decode_image_throughput_512():
    """Unfiltering must be vectorized: a 512x512 RGB PNG with per-row
    Sub/Up filters (the paths the former per-byte Python loops crawled
    through at ~2s/image) must decode in well under 0.2 s — a >=10x
    bound over the per-byte implementation."""
    import struct
    import time
    import zlib

    rng = np.random.default_rng(42)
    h, w, ch = 512, 512, 3
    pix = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        ftype = y % 3  # None / Sub / Up
        row = pix[y].astype(np.int32)
        enc = row.copy()
        if ftype == 1:
            enc[ch:] = (row[ch:] - row[:-ch]) % 256
        elif ftype == 2:
            enc = (row - prev) % 256
        raw.append(ftype)
        raw.extend((enc % 256).astype(np.uint8).tobytes())
        prev = row

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    t0 = time.time()
    hh, ww, cc, arr = decode_image(png)
    dt = time.time() - t0
    assert (hh, ww, cc) == (h, w, ch)
    assert np.array_equal(arr.reshape(h, w * ch), pix)
    assert dt < 0.2, f"decode took {dt:.3f}s — unfiltering is not vectorized"


def _chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def test_decode_image_palette():
    """Color type 3: indices resolve through PLTE to RGB."""
    import struct
    import zlib

    rng = np.random.default_rng(11)
    h, w, ncol = 9, 7, 5
    palette = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
    idx = rng.integers(0, ncol, size=(h, w), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", palette.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    hh, ww, cc, arr = decode_image(png)
    assert (hh, ww, cc) == (h, w, 3)
    assert np.array_equal(arr, palette[idx])


def test_decode_image_palette_missing_plte_raises():
    import struct
    import zlib

    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" + b"\x00\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        decode_image(png)


_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _encode_adam7(pix: np.ndarray) -> bytes:
    """Minimal Adam7 interlaced encoder (filter 0 rows) for round-trips."""
    import struct
    import zlib

    h, w, c = pix.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = pix[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for y in range(sub.shape[0]):
            raw += b"\x00" + sub[y].tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1))
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("h,w,c", [(16, 16, 3), (13, 11, 1), (9, 5, 4), (3, 2, 2)])
def test_decode_image_adam7_roundtrip(h, w, c):
    """Adam7 scatter must reconstruct the exact pixel grid for odd sizes
    (passes with empty sub-images) and every channel count."""
    rng = np.random.default_rng(h * 100 + w * 10 + c)
    pix = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    hh, ww, cc, arr = decode_image(_encode_adam7(pix))
    assert (hh, ww, cc) == (h, w, c)
    assert np.array_equal(arr, pix)


def test_decode_image_adam7_filtered_subimages():
    """Each Adam7 sub-image carries its own row filters; use Sub/Up inside
    a pass and check reconstruction."""
    import struct
    import zlib

    rng = np.random.default_rng(23)
    h, w, c = 8, 8, 3
    pix = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = pix[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        prev = np.zeros(sub.shape[1] * c, dtype=np.uint8)
        for y in range(sub.shape[0]):
            line = sub[y].reshape(-1)
            if y % 2 == 0:  # Sub filter
                enc = np.diff(line.reshape(-1, c), axis=0, prepend=np.zeros((1, c), np.uint8))
                raw += b"\x01" + (enc % 256).astype(np.uint8).tobytes()
            else:  # Up filter
                raw += b"\x02" + ((line - prev) % 256).astype(np.uint8).tobytes()
            prev = line
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    hh, ww, cc, arr = decode_image(png)
    assert np.array_equal(arr, pix)


def _png(w, h, depth, ctype, raw_rows: bytes, plte: bytes | None = None,
         interlace: int = 0) -> bytes:
    import struct
    import zlib

    out = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    )
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw_rows)) + _chunk(b"IEND", b"")


def _pack_bits(samples_row: np.ndarray, depth: int) -> bytes:
    """MSB-first sub-8-bit packing of one row of samples."""
    bits = []
    for v in samples_row:
        bits.extend((int(v) >> (depth - 1 - i)) & 1 for i in range(depth))
    bits += [0] * (-len(bits) % 8)
    return np.packbits(np.array(bits, dtype=np.uint8)).tobytes()


def test_decode_image_sub8_grey_depths():
    """1/2/4-bit greyscale: packed MSB-first, scaled to 8-bit with the
    exact 255/(2^d-1) factor; includes a Sub-filtered row (bpp=1 byte
    lane on PACKED bytes, per spec)."""
    rng = np.random.default_rng(3)
    for depth in (1, 2, 4):
        h, w = 5, 11
        maxv = (1 << depth) - 1
        samples = rng.integers(0, maxv + 1, (h, w), dtype=np.uint8)
        rows = b"".join(b"\x00" + _pack_bits(samples[y], depth) for y in range(h))
        hh, ww, cc, arr = decode_image(_png(w, h, depth, 0, rows))
        assert (hh, ww, cc) == (h, w, 1)
        assert np.array_equal(arr[..., 0], samples * (255 // maxv)), depth
        # Sub filter on packed bytes: reconstructed[i] = raw[i] + recon[i-1]
        packed = _pack_bits(samples[0], depth)
        deltas = bytes(
            (packed[i] - (packed[i - 1] if i else 0)) & 0xFF
            for i in range(len(packed))
        )
        one = _png(w, 1, depth, 0, b"\x01" + deltas)
        _, _, _, arr1 = decode_image(one)
        assert np.array_equal(arr1[0, :, 0], samples[0] * (255 // maxv)), depth


def test_decode_image_sub8_palette():
    """4-bit palette: two indices per byte resolve through PLTE."""
    rng = np.random.default_rng(5)
    palette = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    h, w = 4, 7
    idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
    rows = b"".join(b"\x00" + _pack_bits(idx[y], 4) for y in range(h))
    hh, ww, cc, arr = decode_image(_png(w, h, 4, 3, rows, plte=palette.tobytes()))
    assert (hh, ww, cc) == (h, w, 3)
    assert np.array_equal(arr, palette[idx])


def test_decode_image_16bit_grey_and_rgb():
    """16-bit samples reduce to 8 bits by the standard high-byte take;
    the low byte must not leak into neighbors through the filter lanes
    (bpp = 2 per channel)."""
    import struct

    rng = np.random.default_rng(7)
    h, w = 6, 5
    g16 = rng.integers(0, 65536, (h, w), dtype=np.uint16)
    rows = b"".join(
        b"\x00" + b"".join(struct.pack(">H", int(v)) for v in g16[y])
        for y in range(h)
    )
    hh, ww, cc, arr = decode_image(_png(w, h, 16, 0, rows))
    assert (hh, ww, cc) == (h, w, 1)
    assert np.array_equal(arr[..., 0], (g16 >> 8).astype(np.uint8))
    rgb16 = rng.integers(0, 65536, (h, w, 3), dtype=np.uint16)
    rows = b"".join(
        b"\x00" + b"".join(struct.pack(">H", int(v)) for v in rgb16[y].reshape(-1))
        for y in range(h)
    )
    hh, ww, cc, arr = decode_image(_png(w, h, 16, 2, rows))
    assert (hh, ww, cc) == (h, w, 3)
    assert np.array_equal(arr, (rgb16 >> 8).astype(np.uint8))


def test_decode_image_sub8_adam7():
    """1-bit Adam7: each pass packs its own sub-image rows independently."""
    from query_skyline_qos_flink_spark.operators.multimodal import _ADAM7

    rng = np.random.default_rng(9)
    h = w = 9  # exercises every pass incl. ragged tails
    img = rng.integers(0, 2, (h, w), dtype=np.uint8)
    raw = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        raw += b"".join(b"\x00" + _pack_bits(sub[y], 1) for y in range(sub.shape[0]))
    hh, ww, cc, arr = decode_image(_png(w, h, 1, 0, raw, interlace=1))
    assert (hh, ww, cc) == (h, w, 1)
    assert np.array_equal(arr[..., 0], img * 255)


def _bmp(pix: np.ndarray, bpp: int, top_down=False, palette=None) -> bytes:
    """Hand-built uncompressed BMP writer for decoder tests."""
    import struct

    h, w = pix.shape[:2]
    stride = (w * bpp + 31) // 32 * 4
    rows = []
    for y in range(h):
        if bpp == 24:
            row = pix[y, :, ::-1].tobytes()
        elif bpp == 32:
            row = pix[y][:, [2, 1, 0, 3]].tobytes()
        elif bpp == 8:
            row = pix[y].tobytes()
        else:  # 1 / 4-bit indices
            bits = []
            for v in pix[y]:
                bits.extend((int(v) >> (bpp - 1 - i)) & 1 for i in range(bpp))
            bits += [0] * (-len(bits) % 8)
            row = np.packbits(np.array(bits, np.uint8)).tobytes()
        rows.append(row + bytes(stride - len(row)))
    body = b"".join(rows if top_down else rows[::-1])
    pal_bytes = b""
    n_colors = 0
    if palette is not None:
        n_colors = len(palette)
        pal_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    data_off = 14 + 40 + len(pal_bytes)
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, bpp, 0,
        len(body), 2835, 2835, n_colors, 0
    )
    return hdr + dib + pal_bytes + body


def test_decode_image_bmp_24_and_32():
    from query_skyline_qos_flink_spark.operators.multimodal import decode_bmp

    rng = np.random.default_rng(13)
    rgb = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    for td in (False, True):
        h, w, c, arr = decode_bmp(_bmp(rgb, 24, top_down=td))
        assert (h, w, c) == (5, 7, 3) and np.array_equal(arr, rgb), td
    rgba = rng.integers(0, 256, (4, 3, 4), dtype=np.uint8)
    h, w, c, arr = decode_bmp(_bmp(rgba, 32))
    assert (h, w, c) == (4, 3, 4) and np.array_equal(arr, rgba)
    # decode_image dispatches on the BM magic
    h, w, c, arr = decode_image(_bmp(rgb, 24))
    assert np.array_equal(arr, rgb)


def test_decode_image_bmp_palette_depths():
    from query_skyline_qos_flink_spark.operators.multimodal import decode_bmp

    rng = np.random.default_rng(17)
    for bpp, ncol in ((1, 2), (4, 16), (8, 200)):
        palette = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, (6, 9), dtype=np.uint8)
        h, w, c, arr = decode_bmp(_bmp(idx, bpp, palette=palette))
        assert (h, w, c) == (6, 9, 3)
        assert np.array_equal(arr, palette[idx]), bpp


def test_decode_image_bmp_validation():
    from query_skyline_qos_flink_spark.operators.multimodal import decode_bmp

    rng = np.random.default_rng(19)
    good = _bmp(rng.integers(0, 256, (4, 4, 3), dtype=np.uint8), 24)
    with pytest.raises(ValueError):
        decode_bmp(b"BMxx")
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-5])
    rle = bytearray(good)
    rle[30] = 1  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(rle))


def test_synth_image_payload_bmp_class():
    """key % 6 == 5 emits a 24-bit BMP whose decode recovers exactly the
    md5 aHash bits (the rotating-fixture contract)."""
    import hashlib

    from query_skyline_qos_flink_spark.operators.multimodal import (
        AHASH_GRID,
        synth_image_payload,
    )

    for key in (5, 11, 17, 23, 47):
        payload = synth_image_payload(key)
        assert payload[:2] == b"BM", key
        h, w, c, arr = decode_image(payload)
        assert (h, w, c) == (64, 64, 3)
        grey = arr.astype(np.float64).mean(axis=2)
        blocks = grey.reshape(AHASH_GRID, 8, AHASH_GRID, 8).mean(axis=(1, 3))
        v = 0
        for b in (blocks >= blocks.mean()).flatten():
            v = (v << 1) | int(b)
        assert v == int(hashlib.md5(f"img{key}".encode()).hexdigest()[:16], 16)


def test_decode_image_palette_index_out_of_range_decodes_black():
    """A 2-bit palette PNG with a 2-entry PLTE and index 3 decodes the
    out-of-range pixel as BLACK — Pillow's zero-padded-palette leniency,
    adopted for cross-environment determinism (a builtin-only raise
    would make the same payload decode under Pillow and fail without
    it; the naive palette[idx] was a task-killing IndexError)."""
    palette = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    idx = np.array([[0, 1, 3]], np.uint8)  # 3 >= len(PLTE)
    rows = b"\x00" + _pack_bits(idx[0], 2)
    h, w, c, arr = decode_image(_png(3, 1, 2, 3, rows, plte=palette.tobytes()))
    assert (h, w, c) == (1, 3, 3)
    assert arr[0].tolist() == [[1, 2, 3], [4, 5, 6], [0, 0, 0]]


def _ico(entries: list[bytes], sizes: list[tuple[int, int]]) -> bytes:
    import struct

    out = bytearray(b"\x00\x00\x01\x00") + struct.pack("<H", len(entries))
    off = 6 + 16 * len(entries)
    for (w, h), img in zip(sizes, entries):
        out += bytes([w % 256, h % 256, 0, 0])
        out += struct.pack("<HHII", 1, 32, len(img), off)
        off += len(img)
    for img in entries:
        out += img
    return bytes(out)


def _ico_dib(pix_rgba: np.ndarray, mask: np.ndarray | None = None) -> bytes:
    """Headerless 32-bpp ICO DIB (doubled height) with an AND mask."""
    import struct

    h, w = pix_rgba.shape[:2]
    dib = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0, 0, 0, 0, 0, 0)
    rows = b"".join(pix_rgba[y][:, [2, 1, 0, 3]].tobytes() for y in range(h - 1, -1, -1))
    if mask is None:
        mask = np.zeros((h, w), np.uint8)
    and_stride = (w + 31) // 32 * 4
    mrows = b""
    for y in range(h - 1, -1, -1):
        bits = np.packbits(mask[y]).tobytes()
        mrows += bits + bytes(and_stride - len(bits))
    return dib + rows + mrows


def test_decode_ico_png_and_dib_entries():
    from query_skyline_qos_flink_spark.operators.multimodal import decode_ico

    rng = np.random.default_rng(23)
    # small PNG entry + larger 32-bpp DIB entry: the LARGER one wins
    png_small = _png(4, 4, 8, 0, b"".join(b"\x00" + bytes([9] * 4) for _ in range(4)))
    rgba = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    ico = _ico([png_small, _ico_dib(rgba)], [(4, 4), (8, 8)])
    h, w, c, arr = decode_ico(ico)
    assert (h, w, c) == (8, 8, 4)
    assert np.array_equal(arr, rgba)  # 32bpp: alpha verbatim, no AND mask
    # PNG-only ICO dispatches through decode_image
    ico2 = _ico([png_small], [(4, 4)])
    h, w, c, arr = decode_image(ico2)
    assert (h, w, c, int(arr[0, 0, 0])) == (4, 4, 1, 9)


def test_decode_ico_and_mask_becomes_alpha():
    from query_skyline_qos_flink_spark.operators.multimodal import decode_bmp, decode_ico
    import struct

    # 24-bpp DIB with an AND mask marking one corner transparent
    rng = np.random.default_rng(29)
    rgb = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    h, w = 4, 4
    dib = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 24, 0, 0, 0, 0, 0, 0)
    stride = (w * 24 + 31) // 32 * 4
    rows = b""
    for y in range(h - 1, -1, -1):
        row = rgb[y, :, ::-1].tobytes()
        rows += row + bytes(stride - len(row))
    mask = np.zeros((h, w), np.uint8)
    mask[0, 0] = 1  # top-left transparent
    and_stride = (w + 31) // 32 * 4
    mrows = b""
    for y in range(h - 1, -1, -1):
        bits = np.packbits(mask[y]).tobytes()
        mrows += bits + bytes(and_stride - len(bits))
    ico = _ico([dib + rows + mrows], [(4, 4)])
    hh, ww, cc, arr = decode_ico(ico)
    assert (hh, ww, cc) == (4, 4, 4)
    assert np.array_equal(arr[..., :3], rgb)
    assert arr[0, 0, 3] == 0 and arr[3, 3, 3] == 255


def test_decode_ico_validation():
    from query_skyline_qos_flink_spark.operators.multimodal import decode_ico

    with pytest.raises(ValueError):
        decode_ico(b"\x01\x00\x01\x00")
    with pytest.raises(ValueError, match="no images"):
        decode_ico(b"\x00\x00\x01\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        decode_ico(b"\x00\x00\x01\x00\x01\x00" + bytes(10))


def test_decode_ico_legacy_bgrx_uses_and_mask():
    """Pre-Vista 32-bpp BGRX icons carry alpha bytes of 0 everywhere and
    rely on the AND mask: the decoder must take transparency from the
    mask instead of returning an all-transparent image."""
    from query_skyline_qos_flink_spark.operators.multimodal import decode_ico

    rng = np.random.default_rng(31)
    rgba = np.concatenate(
        [rng.integers(0, 256, (4, 4, 3)), np.zeros((4, 4, 1))], axis=2
    ).astype(np.uint8)
    mask = np.zeros((4, 4), np.uint8)
    mask[0, 0] = 1
    ico = _ico([_ico_dib(rgba, mask=mask)], [(4, 4)])
    h, w, c, arr = decode_ico(ico)
    assert (h, w, c) == (4, 4, 4)
    assert np.array_equal(arr[..., :3], rgba[..., :3])
    assert arr[0, 0, 3] == 0 and arr[3, 3, 3] == 255


def test_decode_ico_area_tie_breaks_on_bit_depth():
    """Equal-area entries pick the richest bit depth (directories list
    low depths first; the 32-bpp variant must win)."""
    import struct

    from query_skyline_qos_flink_spark.operators.multimodal import decode_ico

    rng = np.random.default_rng(37)
    rgba = rng.integers(1, 256, (4, 4, 4), dtype=np.uint8)
    # 8-bpp palette entry (solid index 0 = red) vs 32-bpp entry, same size
    pal_dib = struct.pack("<IiiHHIIiiII", 40, 4, 8, 1, 8, 0, 0, 0, 0, 2, 0)
    pal_dib += bytes([0, 0, 200, 0, 0, 0, 0, 0])  # BGRA quads: red, black
    pal_dib += (b"\x00" * 4) * 4  # 4 rows of 4 indices (stride 4)
    pal_dib += bytes(4 * 4 // 8 + 2) * 0 + bytes(16)  # AND mask rows (stride 4)
    entries = [pal_dib, _ico_dib(rgba)]
    out = bytearray(b"\x00\x00\x01\x00") + struct.pack("<H", 2)
    off = 6 + 32
    for bits, img in ((8, pal_dib), (32, _ico_dib(rgba))):
        out += bytes([4, 4, 0, 0]) + struct.pack("<HHII", 1, bits, len(img), off)
        off += len(img)
    out += pal_dib + _ico_dib(rgba)
    h, w, c, arr = decode_ico(bytes(out))
    assert np.array_equal(arr, rgba)  # the 32-bpp entry won the tie


def test_decode_ico_malformed_color_count_raises_value_error():
    import struct

    from query_skyline_qos_flink_spark.operators.multimodal import decode_ico

    dib = struct.pack("<IiiHHIIiiII", 40, 4, 8, 1, 8, 0, 0, 0, 0, 0x7FFFFFFF, 0)
    ico = _ico([dib + bytes(64)], [(4, 4)])
    with pytest.raises(ValueError, match="color table"):
        decode_ico(ico)
