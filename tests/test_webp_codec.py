"""From-scratch WebP-lossless (VP8L) codec: bit-exact round trips over
every encoder feature, spec-constant pins, and hand-built streams for the
decoder-only paths the fixture encoder does not emit (predictor / color
transforms, meta prefix-code groups, plane-code distances).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from query_skyline_qos_flink_spark.operators import webp as W


def _expand(px):
    x = np.asarray(px, np.uint8)
    if x.ndim == 2:
        x = np.stack([x, x, x], axis=-1)
    if x.shape[2] == 3:
        x = np.concatenate([x, np.full(x.shape[:2] + (1,), 255, np.uint8)], axis=2)
    return x


def _roundtrip(px, **kw):
    h, w, c, arr = W.decode_webp(W.encode_webp(px, **kw))
    exp = _expand(px)
    assert (h, w, c) == (exp.shape[0], exp.shape[1], 4)
    assert np.array_equal(arr, exp)


def test_roundtrip_noise_rgb_rgba_grey():
    rng = np.random.default_rng(2)
    for h, w in ((1, 1), (3, 7), (16, 16), (23, 41)):
        _roundtrip(rng.integers(0, 256, (h, w, 3)).astype(np.uint8))
        _roundtrip(rng.integers(0, 256, (h, w, 4)).astype(np.uint8))
        _roundtrip(rng.integers(0, 256, (h, w)).astype(np.uint8), use_palette=False)


def test_roundtrip_feature_matrix():
    """Color cache on/off, subtract-green, palettes at every packing
    density (8/4/2/1 pixels per byte), and constant images (LZ77 runs)."""
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (19, 29, 3)).astype(np.uint8)
    _roundtrip(px, use_cache=False)
    _roundtrip(px, use_subtract_green=True, use_palette=False)
    _roundtrip((rng.integers(0, 2, (19, 29)) * 255).astype(np.uint8))  # 2 colors
    _roundtrip((rng.integers(0, 4, (19, 29)) * 80).astype(np.uint8))  # 4
    _roundtrip((rng.integers(0, 13, (19, 29)) * 19).astype(np.uint8))  # 13
    # 0-xbits density (17..256 colors): draw pixels FROM a 200-color
    # palette — the old `integers(0,40,(h,w,3))*6` fixture had 549 unique
    # colors, so use_palette=True silently exercised the no-transform
    # path (now a ValueError, r11 ADVICE)
    pal200 = rng.integers(0, 256, (200, 3)).astype(np.uint8)
    _roundtrip(pal200[rng.integers(0, 200, (19, 29))], use_palette=True)
    _roundtrip(np.full((10, 33, 3), 201, np.uint8))  # one long run


def test_roundtrip_property():
    """Arbitrary sizes x content classes x feature flags: lossless means
    decode(encode(x)) == x ALWAYS — no tolerance anywhere."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=24),
        w=st.integers(min_value=1, max_value=24),
        seed=st.integers(min_value=0, max_value=10_000),
        levels=st.sampled_from([2, 5, 17, 256]),
        cache=st.booleans(),
    )
    def run(h, w, seed, levels, cache):
        rng = np.random.default_rng(seed)
        px = (rng.integers(0, levels, (h, w, 3)) * (255 // (levels - 1))).astype(np.uint8)
        _roundtrip(px, use_cache=cache)

    run()


def test_plane_code_table_matches_spec_prefix():
    """The first plane codes listed in the VP8L specification."""
    assert W._PLANE[:24] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    ]
    assert len(W._PLANE) == 120


def test_prefix_value_coding_inverse():
    br_vals = []
    for v in list(range(1, 70)) + [120, 1000, 4096]:
        code, extra, nbits = W._prefix_encode(v)
        bw = W._BitWriter()
        bw.write(extra, nbits)
        br = W._BitReader(bw.flush() or b"\x00", 0)
        assert W._prefix_decode(br, code) == v
        br_vals.append(code)
    assert max(br_vals) < 40


def _header(w, h):
    bw = W._BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    return bw


def _wrap(bw):
    vp8l = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _emit_sub_literals(bw, argb_list):
    """Sub-resolution image stream: cache bit only (no meta bit exists)."""
    bw.write(0, 1)  # no cache
    W._emit_pixels(
        bw,
        [("lit", p >> 24 & 0xFF, p >> 16 & 0xFF, p >> 8 & 0xFF, p & 0xFF) for p in argb_list],
        0,
    )


def _emit_literals(bw, argb_list):
    """Level-0 pixel stream: cache bit + meta bit, one prefix group."""
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    W._emit_pixels(
        bw,
        [("lit", p >> 24 & 0xFF, p >> 16 & 0xFF, p >> 8 & 0xFF, p & 0xFF) for p in argb_list],
        0,
    )


def test_plane_code_distance_decodes_row_copy():
    """A copy with dist_code 1 — the (0, 1) plane offset — references one
    scanline up: second row must equal the first."""
    w, h = 4, 2
    bw = _header(w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    row = [0xFF000000 | (i * 40 << 16) | (i * 11 << 8) | i for i in range(w)]
    toks = [("lit", p >> 24 & 0xFF, p >> 16 & 0xFF, p >> 8 & 0xFF, p & 0xFF) for p in row]
    # length=4 copy at plane dist_code 1 => distance = w
    toks.append(("plane_copy", 4, 1))

    # emit manually: reuse _emit_pixels for literals, append the copy
    gf = {}
    rf = {}
    bf = {}
    af = {}
    df = {}
    for _t, a, r, g, b in toks[:-1]:
        gf[g] = gf.get(g, 0) + 1
        rf[r] = rf.get(r, 0) + 1
        bf[b] = bf.get(b, 0) + 1
        af[a] = af.get(a, 0) + 1
    lc, _x, _n = W._prefix_encode(4)
    gf[256 + lc] = 1
    dc, _dx, _dn = W._prefix_encode(1)  # dist_code 1 (plane (0,1))
    df[dc] = 1
    tables = []
    for freqs, n in ((gf, 280), (rf, 256), (bf, 256), (af, 256), (df, 40)):
        lengths = W._huffman_lengths(freqs)
        lengths += [0] * (n - len(lengths))
        W._write_prefix_code(bw, lengths)
        codes = W._build_codes(lengths)
        if len(codes) == 1:
            codes = {next(iter(codes)): (0, 0)}
        tables.append(codes)
    gt, rt, bt, at, dt = tables
    for _t, a, r, g, b in toks[:-1]:
        bw.write_code(*gt[g])
        bw.write_code(*rt[r])
        bw.write_code(*bt[b])
        bw.write_code(*at[a])
    lc, lx, ln = W._prefix_encode(4)
    bw.write_code(*gt[256 + lc])
    if ln:
        bw.write(lx, ln)
    dc, dx, dn = W._prefix_encode(1)
    bw.write_code(*dt[dc])
    if dn:
        bw.write(dx, dn)
    h_, w_, _c, arr = W.decode_webp(_wrap(bw))
    assert (h_, w_) == (h, w)
    assert np.array_equal(arr[0], arr[1])
    assert arr[1, 2, 0] == 80  # red of the copied pixel


def test_meta_prefix_groups_split_image():
    """Two prefix-code groups via the entropy image: the left 8-pixel
    block decodes through group 0 (green always 10), the right block
    through group 1 (green always 200)."""
    w, h = 16, 1
    bw = _header(w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta prefix codes
    bw.write(1, 3)  # huffman_bits code 1 -> block size 8
    # entropy sub-image: 2 x 1, green channel = group id
    _emit_sub_literals(bw, [0xFF000000 | (0 << 8), 0xFF000000 | (1 << 8)])
    # group 0: all codes single-symbol (0-bit): green 10, r 1, b 2, a 255
    for sym, n in ((10, 280), (1, 256), (2, 256), (255, 256), (0, 40)):
        lengths = [0] * n
        lengths[sym] = 1
        W._write_prefix_code(bw, lengths)
    # group 1: green 200, r 3, b 4, a 255
    for sym, n in ((200, 280), (3, 256), (4, 256), (255, 256), (0, 40)):
        lengths = [0] * n
        lengths[sym] = 1
        W._write_prefix_code(bw, lengths)
    # all 16 pixels: every code is degenerate (0 bits) -> no pixel bits at all
    h_, w_, _c, arr = W.decode_webp(_wrap(bw))
    assert (h_, w_) == (1, 16)
    assert list(arr[0, :, 1][:8]) == [10] * 8
    assert list(arr[0, :, 1][8:]) == [200] * 8
    assert list(arr[0, :, 0][:8]) == [1] * 8 and list(arr[0, :, 0][8:]) == [3] * 8


def _spec_pred(mode, L, T, TL, TR):
    """Independent per-channel predictor arithmetic from the spec text."""
    def ch(p, sh):
        return (p >> sh) & 0xFF

    def build(f):
        out = 0
        for sh in (24, 16, 8, 0):
            out |= (f(sh) & 0xFF) << sh
        return out

    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return build(lambda sh: ((((ch(L, sh) + ch(TR, sh)) >> 1) + ch(T, sh)) >> 1))
    if mode == 6:
        return build(lambda sh: (ch(L, sh) + ch(TL, sh)) >> 1)
    if mode == 7:
        return build(lambda sh: (ch(L, sh) + ch(T, sh)) >> 1)
    if mode == 8:
        return build(lambda sh: (ch(TL, sh) + ch(T, sh)) >> 1)
    if mode == 9:
        return build(lambda sh: (ch(T, sh) + ch(TR, sh)) >> 1)
    if mode == 10:
        return build(
            lambda sh: (
                ((ch(L, sh) + ch(TL, sh)) >> 1) + ((ch(T, sh) + ch(TR, sh)) >> 1)
            )
            >> 1
        )
    if mode == 11:
        pl = sum(abs(ch(T, sh) - ch(TL, sh)) for sh in (24, 16, 8, 0))
        pt = sum(abs(ch(L, sh) - ch(TL, sh)) for sh in (24, 16, 8, 0))
        return L if pl < pt else T  # ties -> TOP (libwebp Select)
    if mode == 12:
        return build(
            lambda sh: min(max(ch(L, sh) + ch(T, sh) - ch(TL, sh), 0), 255)
        )
    if mode == 13:
        def f(sh):
            a = (ch(L, sh) + ch(T, sh)) >> 1
            v = a + int((a - ch(TL, sh)) / 2)  # C division truncates to 0
            return min(max(v, 0), 255)

        return build(f)
    raise AssertionError(mode)


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_modes_decode_exactly(mode):
    """Hand-built stream: 3x3 image, one predictor block of the given
    mode, residuals chosen so every pixel is nontrivial; expected output
    computed by an INDEPENDENT spec-arithmetic walk in this test."""
    w = h = 3
    rng = np.random.default_rng(100 + mode)
    residuals = [
        0xFF000000 | int(rng.integers(0, 1 << 24)) for _ in range(w * h)
    ]
    residuals = [r & 0x00FFFFFF | (int(rng.integers(0, 256)) << 24) for r in residuals]
    bw = _header(w, h)
    bw.write(1, 1)  # transform
    bw.write(0, 2)  # predictor
    bw.write(2, 3)  # size_bits code 2 -> block 16 (one block covers 3x3)
    # sub-image 1x1: mode in green channel
    _emit_sub_literals(bw, [0xFF000000 | (mode << 8)])
    bw.write(0, 1)  # no more transforms
    _emit_literals(bw, residuals)
    _h, _w, _c, arr = W.decode_webp(_wrap(bw))
    got = (
        arr[..., 3].astype(np.uint32) << 24
        | arr[..., 0].astype(np.uint32) << 16
        | arr[..., 1].astype(np.uint32) << 8
        | arr[..., 2].astype(np.uint32)
    )
    # independent reconstruction
    exp = np.zeros((h, w), dtype=np.uint64)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(exp[0, x - 1])
            elif x == 0:
                pred = int(exp[y - 1, 0])
            else:
                L = int(exp[y, x - 1])
                T = int(exp[y - 1, x])
                TL = int(exp[y - 1, x - 1])
                # spec border rule: rightmost column's TR = leftmost pixel
                # of the SAME row
                TR = int(exp[y - 1, x + 1]) if x + 1 < w else int(exp[y, 0])
                pred = _spec_pred(mode, L, T, TL, TR)
            exp[y, x] = W._add_pixels(residuals[y * w + x], pred)
    assert np.array_equal(got, exp.astype(np.uint32)), mode


def test_color_transform_decodes_exactly():
    """Hand-built stream: one color-transform block; inverse deltas
    recomputed independently here."""
    w = h = 2
    g2r, g2b, r2b = 0x10, 0xF0, 0x08  # mixed signs (0xF0 is negative)
    residuals = [0xFF102030, 0xFF405060, 0xFF708090, 0xFFA0B0C0]
    bw = _header(w, h)
    bw.write(1, 1)
    bw.write(1, 2)  # color transform
    bw.write(2, 3)  # block 16
    # ColorTransformElement packing per spec: r2b in RED, g2b in GREEN,
    # g2r in BLUE (this test originally encoded a rotated packing that
    # the decoder mirrored — both fixed via the r12 libwebp conformance
    # suite, which decodes real libwebp streams)
    _emit_sub_literals(bw, [0xFF000000 | (r2b << 16) | (g2b << 8) | g2r])
    bw.write(0, 1)
    _emit_literals(bw, residuals)
    _h, _w, _c, arr = W.decode_webp(_wrap(bw))

    def s8(v):
        return v - 256 if v >= 128 else v

    for i, res in enumerate(residuals):
        y, x = divmod(i, w)
        g = res >> 8 & 0xFF
        r = (res >> 16 & 0xFF) + ((s8(g2r) * s8(g)) >> 5) & 0xFF
        r_s = r - 256 if r >= 128 else r
        b = ((res & 0xFF) + ((s8(g2b) * s8(g)) >> 5) + ((s8(r2b) * r_s) >> 5)) & 0xFF
        assert arr[y, x, 0] == r and arr[y, x, 1] == g and arr[y, x, 2] == b, i


def test_rejects_lossy_and_garbage():
    with pytest.raises(ValueError):
        W.decode_webp(b"\x00\x01")
    # an EMPTY lossy VP8 chunk: rejected by libwebp when the bridge is
    # available ("could not decode"), by the dispatcher ("lossy ...
    # libwebp") when it is not — a ValueError either way
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(ValueError, match="decode|lossy"):
        W.decode_webp(lossy)
    p = W.encode_webp(np.zeros((4, 4, 3), np.uint8))
    for cut in (10, 20, len(p) - 2):
        with pytest.raises(ValueError):
            W.decode_webp(p[:cut])


def test_vp8x_container_with_metadata_chunks():
    """Real lossless files saved with metadata are VP8X containers: a
    VP8X header + skippable ICCP/EXIF chunks + the VP8L payload.  The
    decoder must find and decode the VP8L; the animation flag raises."""
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (6, 9, 3)).astype(np.uint8)
    simple = W.encode_webp(px)
    vp8l_off = simple.find(b"VP8L")
    vp8l_chunk = simple[vp8l_off:]
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes(10)
    iccp = b"ICCP" + struct.pack("<I", 5) + b"fake\x00" + b"\x00"  # odd size padded
    body = b"WEBP" + vp8x + iccp + vp8l_chunk
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    h, w, c, arr = W.decode_webp(payload)
    assert (h, w, c) == (6, 9, 4)
    assert np.array_equal(arr[..., :3], px)
    # animation flag (bit 1 of the first VP8X byte) raises
    anim = bytearray(payload)
    anim[payload.find(b"VP8X") + 8] |= 0x02
    with pytest.raises(ValueError, match="animated"):
        W.decode_webp(bytes(anim))


def test_decode_image_dispatches_webp():
    from query_skyline_qos_flink_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    h, w, c, arr = decode_image(W.encode_webp(px))
    assert (h, w, c) == (8, 8, 4)
    assert np.array_equal(arr[..., :3], px)


def test_explicit_palette_over_256_colors_raises():
    """use_palette=True on a >256-color image must raise, not silently
    fall through to no transform (which would also swallow an explicit
    use_subtract_green via the elif, r11 ADVICE)."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    assert len(np.unique(px.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="palette"):
        W.encode_webp(px, use_palette=True)
    with pytest.raises(ValueError, match="palette"):
        W.encode_webp(px, use_palette=True, use_subtract_green=True)


# ---------------------------------------------------------------------------
# animated WebP (VP8X + ANIM/ANMF)
# ---------------------------------------------------------------------------


def test_anim_solid_frames_roundtrip():
    f = [np.full((16, 16, 3), c, np.uint8) for c in ([9, 200, 40], [255, 0, 0], [1, 2, 3])]
    p = W.encode_webp_anim(f)
    assert p[12:16] == b"VP8X" and b"ANIM" in p and p.count(b"ANMF") == 3
    n, h, w, frames = W.decode_webp_frames(p)
    assert (n, h, w) == (3, 16, 16)
    for i, fr in enumerate(f):
        assert np.array_equal(frames[i], fr), i


def test_anim_offsets_blend_and_dispose():
    """Frame 2 is a smaller patch at an offset: without dispose it sits on
    the persisted frame-1 canvas; frame 3 carries dispose-to-background,
    so frame 4 (a no-op transparent overlay via no-blend=False... use a
    patch) shows the background outside its rect."""
    base = np.full((8, 8, 3), [10, 20, 30], np.uint8)
    patch = np.full((4, 4, 3), [200, 100, 0], np.uint8)
    p = W.encode_webp_anim(
        [base, patch, patch],
        offsets=[(0, 0), (2, 2), (4, 4)],
        dispose=[False, True, False],
        bg=(255, 255, 255, 255),
    )
    n, h, w, frames = W.decode_webp_frames(p)
    assert (n, h, w) == (3, 8, 8)
    # frame 0: the base
    assert np.array_equal(frames[0], base)
    # frame 1: patch composited onto the persisted base
    assert frames[1][0, 0].tolist() == [10, 20, 30]
    assert frames[1][3, 3].tolist() == [200, 100, 0]
    # frame 1's rect was disposed to background before frame 2
    assert frames[2][2, 2].tolist() == [255, 255, 255]  # disposed area
    assert frames[2][0, 0].tolist() == [10, 20, 30]  # untouched base
    assert frames[2][5, 5].tolist() == [200, 100, 0]  # new patch


def test_anim_no_blend_overwrites_alpha():
    """A no-blend RGBA frame with alpha 0 must OVERWRITE the canvas (the
    region then shows the ANIM background through the transparent
    pixels), where the default alpha-blend would leave the canvas."""
    base = np.full((4, 4, 3), [50, 60, 70], np.uint8)
    clear = np.zeros((4, 4, 4), np.uint8)  # fully transparent
    p_blend = W.encode_webp_anim([base, clear], bg=(1, 2, 3, 255))
    p_over = W.encode_webp_anim([base, clear], blend=[True, False], bg=(1, 2, 3, 255))
    _, _, _, fb = W.decode_webp_frames(p_blend)
    _, _, _, fo = W.decode_webp_frames(p_over)
    assert fb[1][0, 0].tolist() == [50, 60, 70]  # blend: canvas persists
    assert fo[1][0, 0].tolist() == [1, 2, 3]  # overwrite: bg shows through


def test_still_webp_decodes_as_one_frame():
    px = np.full((5, 7, 3), [4, 5, 6], np.uint8)
    n, h, w, frames = W.decode_webp_frames(W.encode_webp(px))
    assert (n, h, w) == (1, 5, 7)
    assert np.array_equal(frames[0], px)


def test_anim_validation():
    with pytest.raises(ValueError, match="even"):
        W.encode_webp_anim([np.zeros((4, 4, 3), np.uint8)], offsets=[(1, 0)])
    f = np.zeros((4, 4, 3), np.uint8)
    p = bytearray(W.encode_webp_anim([f]))
    # frame rect beyond canvas: shrink the canvas in VP8X
    i = p.index(b"VP8X") + 8 + 4
    p[i : i + 3] = (1).to_bytes(3, "little")  # canvas width 2 < frame 4
    with pytest.raises(ValueError, match="canvas"):
        W.decode_webp_frames(bytes(p))
    with pytest.raises(ValueError):
        W.decode_webp_frames(b"RIFF\x04\x00\x00\x00WEBP")


def test_decode_frames_dispatcher():
    from query_skyline_qos_flink_spark.operators.multimodal import (
        decode_frames,
        synth_gif_payload,
    )

    # key % 5 == 3 -> animated WebP; others -> GIF. Same closed-form
    # frame colors either way (the x_gif_frame_colors contract).
    import hashlib

    for key in (3, 8, 13, 5, 6):
        payload = synth_gif_payload(key)
        is_webp = key % 5 == 3
        assert (payload[:4] == b"RIFF") == is_webp
        n, h, w, frames = decode_frames(payload)
        assert n == (key % 4) + 1
        for i in range(n):
            digest = hashlib.md5(f"gif{key}:{i}".encode()).hexdigest()
            want = [int(digest[c : c + 2], 16) for c in (0, 2, 4)]
            assert frames[i].reshape(-1, 3).mean(axis=0).round().astype(int).tolist() == want, (key, i)


def test_anim_lossy_frame_with_alpha_chunk():
    """Real-world animated WebP frames are lossy VP8 with an ALPH chunk —
    spec-valid only inside a VP8X container, which the frame re-wrapper
    must reconstruct (r12 review: a bare RIFF+ALPH was rejected by
    libwebp, failing the dominant animated-WebP form)."""
    from query_skyline_qos_flink_spark.operators import libwebp_bridge as B

    if not B.available():
        pytest.skip("libwebp shared library not present")
    img = np.zeros((16, 16, 4), np.uint8)
    img[..., :3] = 120
    img[..., 3] = 255
    img[:8, :, 3] = 128
    still = B.encode_webp_lossy(img, 90.0)
    assert still[12:16] == b"VP8X"  # alpha forces the extended container
    pos, subs = 12, b""
    while pos + 8 <= len(still):
        cid = still[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", still, pos + 4)
        if cid in (b"ALPH", b"VP8 ", b"VP8L"):
            subs += still[pos : pos + 8 + sz + (sz & 1)]
        pos += 8 + sz + (sz & 1)
    assert subs[:4] == b"ALPH"
    anmf = (
        bytes(6)
        + (15).to_bytes(3, "little") * 2
        + (100).to_bytes(3, "little")
        + bytes([0])
        + subs
    )
    vp8x = bytes([0x12, 0, 0, 0]) + (15).to_bytes(3, "little") * 2
    anim = bytes([255, 255, 255, 255]) + struct.pack("<H", 0)
    body = (
        b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
        + b"ANIM" + struct.pack("<I", len(anim)) + anim
        + b"ANMF" + struct.pack("<I", len(anmf)) + anmf
        + (b"\x00" if len(anmf) & 1 else b"")
    )
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    n, h, w, frames = W.decode_webp_frames(payload)
    assert (n, h, w) == (1, 16, 16)
    # semi-transparent top half composites toward the white background
    assert abs(int(frames[0][0, 0, 0]) - 187) <= 3
    assert abs(int(frames[0][15, 15, 0]) - 120) <= 3
