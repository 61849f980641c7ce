"""Real GIF codec: round-trips against a minimal test-side encoder.

The encoder emits a CLEAR code before every pixel code ("uncompressed
GIF" technique) so the LZW table never grows — valid per spec, trivially
correct, and it exercises the decoder's CLEAR-handling on every pixel.
A second path exercises genuine table growth by encoding with the real
LZW algorithm mirrored from the decoder's growth rule.
"""

from __future__ import annotations

import numpy as np
import pytest

from query_skyline_qos_flink_spark.operators.multimodal import (
    _lzw_decode,
    decode_gif,
    gif_frame_mean,
)


class _BitWriter:
    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


def _lzw_encode_clear_per_code(indices: bytes, min_code: int) -> bytes:
    clear, end = 1 << min_code, (1 << min_code) + 1
    w = _BitWriter()
    width = min_code + 1
    w.write(clear, width)
    for i in indices:
        w.write(i, width)
        w.write(clear, width)
    w.write(end, width)
    return w.flush()


def _lzw_encode_real(indices: bytes, min_code: int) -> bytes:
    """Genuine LZW with table growth, mirroring the decoder's rules."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    w = _BitWriter()
    width = min_code + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    w.write(clear, width)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        w.write(table[cur], width)
        table[nxt] = next_code
        # decoder widens when ITS table hits 2^width; its table stays one
        # entry behind the encoder's (the pending w-entry), so widen when
        # the code about to be assigned no longer fits
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > (1 << 12):
            w.write(clear, width)
            width = min_code + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
        cur = bytes([b])
    if cur:
        w.write(table[cur], width)
    w.write(end, width)
    return w.flush()


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    encoder=_lzw_encode_clear_per_code,
    transparent: int | None = None,
    interlace_frame0: bool = False,
) -> bytes:
    """frames: list of (h, w) index arrays into palette (n, 3)."""
    h, w = frames[0].shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size_field = bits - 1
    padded = 1 << bits
    pal = np.zeros((padded, 3), dtype=np.uint8)
    pal[:n] = palette
    min_code = max(2, bits)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | size_field)  # GCT present
    out += b"\x00\x00"
    out += pal.tobytes()
    for fi, fr in enumerate(frames):
        if transparent is not None and fi > 0:
            # transparency only on follow-up frames: frame 0 must paint the
            # full canvas or its own transparent pixels would stay black
            out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
        out.append(0x2C)
        out += (0).to_bytes(2, "little") * 2
        out += fr.shape[1].to_bytes(2, "little") + fr.shape[0].to_bytes(2, "little")
        ilace = interlace_frame0 and fi == 0
        out.append(0x40 if ilace else 0x00)
        rows = fr
        if ilace:
            order = np.concatenate(
                [np.arange(0, h, 8), np.arange(4, h, 8),
                 np.arange(2, h, 4), np.arange(1, h, 2)]
            )
            rows = fr[order]
        out.append(min_code)
        out += _sub_blocks(encoder(rows.astype(np.uint8).tobytes(), min_code))
    out.append(0x3B)
    return bytes(out)


def test_lzw_roundtrip_both_encoders():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 4, size=500, dtype=np.uint8).tobytes()
    for enc in (_lzw_encode_clear_per_code, _lzw_encode_real):
        assert _lzw_decode(enc(data, 2), 2) == data


def test_decode_gif_single_frame():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 4, size=(11, 13), dtype=np.uint8)
    n, h, w, frames = decode_gif(_encode_gif([idx], palette))
    assert (n, h, w) == (1, 11, 13)
    assert np.array_equal(frames[0], palette[idx])


def test_decode_gif_real_lzw_table_growth():
    """A large frame forces code-width growth past min_code+1."""
    palette = np.stack([np.arange(16)] * 3, axis=1).astype(np.uint8) * 16
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 16, size=(40, 50), dtype=np.uint8)
    png = _encode_gif([idx], palette, encoder=_lzw_encode_real)
    n, h, w, frames = decode_gif(png)
    assert np.array_equal(frames[0], palette[idx])


def test_decode_gif_multiframe_and_mean():
    palette = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    f0 = np.zeros((8, 8), np.uint8)
    f1 = np.ones((8, 8), np.uint8)
    gif = _encode_gif([f0, f1], palette)
    n, h, w, frames = decode_gif(gif)
    assert n == 2
    assert np.array_equal(frames[0], palette[f0])
    assert np.array_equal(frames[1], palette[f1])
    assert gif_frame_mean(gif, 0) == (10, 20, 30)
    assert gif_frame_mean(gif, 1) == (200, 100, 50)


def test_decode_gif_transparency_keeps_canvas():
    """A transparent second frame leaves first-frame pixels in place."""
    palette = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    f0 = np.zeros((4, 4), np.uint8)
    f1 = np.ones((4, 4), np.uint8)
    f1[0, 0] = 0  # transparent index -> canvas keeps frame-0 color there
    gif = _encode_gif([f0, f1], palette, transparent=0)
    n, h, w, frames = decode_gif(gif)
    want = palette[f1].copy()
    want[0, 0] = palette[0]  # unchanged canvas pixel
    assert np.array_equal(frames[1], want)


def test_decode_gif_interlaced_frame():
    palette = np.stack([np.arange(8)] * 3, axis=1).astype(np.uint8) * 30
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 8, size=(13, 6), dtype=np.uint8)
    n, h, w, frames = decode_gif(_encode_gif([idx], palette, interlace_frame0=True))
    assert np.array_equal(frames[0], palette[idx])


def test_decode_gif_rejects_garbage():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG nope")


def test_lzw_rejects_code_beyond_table_as_valueerror():
    """Corrupt streams raise the documented ValueError, not IndexError —
    both before any CLEAR (empty table) and right after one."""
    w = _BitWriter()
    w.write(7, 3)  # min_code=2: first code 7 with NO initial CLEAR
    with pytest.raises(ValueError, match="corrupt GIF LZW"):
        _lzw_decode(w.flush(), 2)
    w = _BitWriter()
    w.write(4, 3)  # CLEAR
    w.write(7, 3)  # beyond the 6-entry fresh table
    with pytest.raises(ValueError, match="corrupt GIF LZW"):
        _lzw_decode(w.flush(), 2)


def test_decode_gif_truncated_gce_raises_valueerror():
    """A graphic-control extension declaring fewer than 4 data bytes must
    raise the documented ValueError, not IndexError."""
    palette = np.stack([np.arange(4)] * 3, axis=1).astype(np.uint8) * 60
    idx = np.zeros((2, 2), dtype=np.uint8)
    payload = bytearray(_encode_gif([idx], palette))
    at = payload.index(0x2C, 13)  # image descriptor
    # splice a GCE declaring only 2 data bytes before the frame
    payload[at:at] = bytes([0x21, 0xF9, 2, 0x01, 0x00, 0x00])
    with pytest.raises(ValueError, match="graphic-control"):
        decode_gif(bytes(payload))


def _gif_with_disposals(disposals, size=8):
    """Two-color GIF: full-canvas frame 0 (color A), then a half-rect
    frame per disposal entry (color B), each carrying a GCE with that
    disposal method."""
    pal = np.array([[200, 10, 10], [10, 200, 10], [10, 10, 200], [0, 0, 0]], np.uint8)
    out = bytearray(b"GIF89a")
    out += size.to_bytes(2, "little") * 2
    out.append(0x80 | 0x01)  # GCT, 4 entries
    out += bytes([2, 0])  # background color index 2 (blue)
    out += pal.tobytes()

    def frame(color_idx, x0, y0, fw, fh, disposal):
        b = bytearray()
        b += bytes([0x21, 0xF9, 4, (disposal & 0x07) << 2, 0, 0, 0, 0])
        b += bytes([0x2C])
        b += x0.to_bytes(2, "little") + y0.to_bytes(2, "little")
        b += fw.to_bytes(2, "little") + fh.to_bytes(2, "little")
        b += bytes([0x00, 2])
        data = _lzw_encode_real(bytes([color_idx]) * (fw * fh), 2)
        for j in range(0, len(data), 255):
            chunk = data[j : j + 255]
            b += bytes([len(chunk)]) + chunk
        b += bytes([0])
        return bytes(b)

    out += frame(0, 0, 0, size, size, 0)  # full red base, no disposal
    for d in disposals:
        out += frame(1, 0, 0, size, size // 2, d)  # green top half
    out += bytes([0x3B])
    return bytes(out)


def _tiny_probe_frame(size=8):
    """A 1x1 bottom-right frame that does NOT cover the overlay rect, so
    the post-disposal canvas state is OBSERVABLE in its emitted frame."""
    b = bytearray()
    b += bytes([0x2C])
    b += (size - 1).to_bytes(2, "little") * 2
    b += (1).to_bytes(2, "little") * 2
    b += bytes([0x00, 2])
    data = _lzw_encode_real(bytes([3]), 2)
    b += bytes([len(data)]) + data + bytes([0])
    return bytes(b)


def test_gif_disposal_restore_to_background():
    """Disposal 2: after the frame shows, its RECT refills with the
    logical-screen background color — observed through a follow-up frame
    that does NOT repaint the rect (r12 review: the first version only
    used covering frames, which a no-op disposal also satisfies)."""
    from query_skyline_qos_flink_spark.operators.multimodal import decode_gif

    p = _gif_with_disposals([2])[:-1] + _tiny_probe_frame() + bytes([0x3B])
    n, h, w, frames = decode_gif(p)
    assert n == 3
    assert frames[1][0, 0].tolist() == [10, 200, 10]  # green overlay shown
    # probe frame: the overlay rect was restored to the BACKGROUND color
    # (index 2 = blue); the untouched bottom half keeps the red base
    assert frames[2][0, 0].tolist() == [10, 10, 200]
    assert frames[2][h - 2, 0].tolist() == [200, 10, 10]
    assert frames[2][h - 1, w - 1].tolist() == [0, 0, 0]  # the probe pixel


def test_gif_disposal_restore_to_previous():
    """Disposal 3: the frame's rect reverts to the PRE-FRAME canvas —
    observed through a non-covering probe frame."""
    from query_skyline_qos_flink_spark.operators.multimodal import decode_gif

    p = _gif_with_disposals([3])[:-1] + _tiny_probe_frame() + bytes([0x3B])
    n, h, w, frames = decode_gif(p)
    assert n == 3
    base_red = [200, 10, 10]
    green = [10, 200, 10]
    assert frames[0][0, 0].tolist() == base_red
    assert frames[1][0, 0].tolist() == green
    # probe frame: the overlay rect REVERTED to the red base (disposal 3),
    # NOT to the blue background (disposal 2) and not kept green
    assert frames[2][0, 0].tolist() == base_red
    assert frames[2][h - 1, w - 1].tolist() == [0, 0, 0]


def test_gif_background_canvas_under_partial_first_frame():
    """A first frame that does NOT cover the canvas leaves the background
    color (GCT[bg index]) visible, per the logical screen descriptor."""
    from query_skyline_qos_flink_spark.operators.multimodal import decode_gif

    pal = np.array([[200, 10, 10], [10, 200, 10], [10, 10, 200], [0, 0, 0]], np.uint8)
    out = bytearray(b"GIF89a")
    out += (8).to_bytes(2, "little") * 2
    out.append(0x80 | 0x01)
    out += bytes([2, 0])  # background index 2 (blue)
    out += pal.tobytes()
    out += bytes([0x2C]) + bytes(4) + (4).to_bytes(2, "little") * 2 + bytes([0x00, 2])
    data = _lzw_encode_real(bytes([0]) * 16, 2)
    out += bytes([len(data)]) + data + bytes([0]) + bytes([0x3B])
    n, h, w, frames = decode_gif(bytes(out))
    assert frames[0][0, 0].tolist() == [200, 10, 10]  # the 4x4 patch
    assert frames[0][7, 7].tolist() == [10, 10, 200]  # background shows
