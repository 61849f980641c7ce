"""ctypes bridge to the system ``libwebp`` shared library — the lossy-VP8
decode path.

The from-scratch :mod:`.webp` codec covers the LOSSLESS half of WebP
(VP8L) with zero native dependencies; lossy VP8 key frames need the
normative coefficient-probability / dequantization tables of RFC 6386,
which are not worth re-typing when every production host ships libwebp.
This module binds the library's *simple API* (``WebPDecodeRGBA`` /
``WebPEncodeRGBA`` / ``WebPEncodeLosslessRGBA`` — stable since libwebp
0.2, plain C types, no structs), so the binding is version-robust and
works from inside Arrow-batch pandas UDF workers (each worker process
loads the .so once, lazily).

Availability is environmental: :func:`available` gates every caller, and
the fixture generators fall back to the pure-Python lossless codec when
the library is absent, keeping query results identical (the rotating
fixtures' perceptual-hash contract is codec-independent by construction).

The bridge doubles as an external conformance oracle for the from-scratch
VP8L codec: ``tests/test_libwebp_bridge.py`` decodes our encoder's output
with libwebp and requires bit-identical pixels.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from functools import lru_cache

_CANDIDATES = ("libwebp.so.7", "libwebp.so", "libwebp.7.dylib", "libwebp.dylib")


@lru_cache(maxsize=1)
def _lib():
    lib = None
    for name in _CANDIDATES:
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is None:
        found = ctypes.util.find_library("webp")
        if found:
            try:
                lib = ctypes.CDLL(found)
            except OSError:
                lib = None
    if lib is None:
        return None
    try:
        lib.WebPGetInfo.restype = ctypes.c_int
        lib.WebPGetInfo.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPEncodeRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeRGBA.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = lib.WebPEncodeRGBA.argtypes[:4] + [
            ctypes.POINTER(ctypes.c_void_p)
        ]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]
    except AttributeError:
        return None  # exotic build missing the simple API
    return lib


def available() -> bool:
    """True when a usable libwebp with the simple API is loadable."""
    return _lib() is not None


def decode_webp_rgba(payload: bytes):
    """(height, width, 4, ndarray[h, w, 4] uint8 RGBA) via libwebp.

    Handles every WebP flavor the library does — lossy VP8 (with or
    without an ALPH chunk), VP8L, and VP8X extended containers.  Raises
    ``RuntimeError`` when the library is absent and ``ValueError`` on
    payloads it rejects (same contract as the pure-Python decoder)."""
    import numpy as np

    lib = _lib()
    if lib is None:
        raise RuntimeError("libwebp shared library not available")
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.WebPDecodeRGBA(payload, len(payload), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp could not decode payload")
    try:
        arr = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 4)).copy()
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return h.value, w.value, 4, arr


def _as_rgba(pix):
    import numpy as np

    x = np.asarray(pix, dtype=np.uint8)
    if x.ndim == 2:
        x = np.stack([x, x, x], axis=-1)
    if x.shape[2] == 3:
        x = np.concatenate(
            [x, np.full(x.shape[:2] + (1,), 255, np.uint8)], axis=2
        )
    return np.ascontiguousarray(x)


def _encode(pix, encoder_call) -> bytes:
    lib = _lib()
    if lib is None:
        raise RuntimeError("libwebp shared library not available")
    x = _as_rgba(pix)
    h, w = x.shape[:2]
    out = ctypes.c_void_p()
    n = encoder_call(lib, x, w, h, out)
    if not n or not out:
        raise ValueError("libwebp encode failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)


def encode_webp_lossy(pix, quality: float = 90.0) -> bytes:
    """Lossy VP8 encode (RGBA simple API).  Deterministic for a fixed
    (pixels, quality): the simple API runs single-threaded with default
    settings, so fixture payloads are build-stable."""
    return _encode(
        pix,
        lambda lib, x, w, h, out: lib.WebPEncodeRGBA(
            x.ctypes.data, w, h, w * 4, float(quality), ctypes.byref(out)
        ),
    )


def encode_webp_lossless(pix) -> bytes:
    """Lossless (VP8L) encode via libwebp — used by tests as the external
    conformance twin of the from-scratch encoder in :mod:`.webp`."""
    return _encode(
        pix,
        lambda lib, x, w, h, out: lib.WebPEncodeLosslessRGBA(
            x.ctypes.data, w, h, w * 4, ctypes.byref(out)
        ),
    )
