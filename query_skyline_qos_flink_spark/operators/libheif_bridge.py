"""ctypes bridge to the system ``libheif`` — AVIF/HEIF PIXEL decode.

The from-scratch :mod:`.mp4` walker covers the HEIF/AVIF CONTAINER layer
(ISO 23008-12 meta item tables, primary-item dimensions through the ipma
association — oracle-gated since round 15); the PIXEL layer is an AV1 /
HEVC bitstream, squarely in the declared mdat-codec-bitstream seam.  The
round-16 shared-library rescan found libheif 1.15 with libaom (AV1
encode+decode) and libdav1d on this host, so — exactly like the lossy-VP8
path through libwebp (``libwebp_bridge.py``) — the pixel layer binds the
production library instead of re-typing an entire video codec:
:func:`decode_heif` decodes the primary item of an AVIF/HEIC payload to
interleaved RGB, :func:`encode_avif` produces AVIF bytes for fixture
synthesis (AV1 lossless, exact for the block-constant fixture patterns —
verified maxdiff 0 in tests).

``heif_error`` is returned BY VALUE (a three-field struct) from every
API; the binding declares it so a failure surfaces as ``ValueError``
with the library's message instead of a misread pointer.  Availability
is environmental: :func:`available` gates every caller and the fixture
generators fall back to an encoding the pure-Python codecs cover,
keeping query results identical (the rotating fixtures' perceptual-hash
contract is codec-independent by construction).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile
from functools import lru_cache

_CANDIDATES = ("libheif.so.1", "libheif.so", "libheif.1.dylib", "libheif.dylib")

# enum values, stable in the public libheif ABI since 1.x
_COMPRESSION_AV1 = 4
_COLORSPACE_RGB = 1
_CHROMA_INTERLEAVED_RGB = 10
_CHANNEL_INTERLEAVED = 10


class _HeifError(ctypes.Structure):
    _fields_ = [
        ("code", ctypes.c_int),
        ("subcode", ctypes.c_int),
        ("message", ctypes.c_char_p),
    ]


def _ok(err: _HeifError, what: str) -> None:
    if err.code != 0:
        msg = (err.message or b"").decode("utf-8", "replace")
        raise ValueError(f"libheif: {what} failed ({err.code}/{err.subcode}): {msg}")


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
        found = ctypes.util.find_library("heif")
        if found:
            try:
                lib = ctypes.CDLL(found)
            except OSError:
                lib = None
    if lib is None:
        return None
    try:
        P = ctypes.c_void_p
        PP = ctypes.POINTER(P)
        lib.heif_context_alloc.restype = P
        lib.heif_context_alloc.argtypes = []
        lib.heif_context_free.restype = None
        lib.heif_context_free.argtypes = [P]
        lib.heif_context_read_from_memory_without_copy.restype = _HeifError
        lib.heif_context_read_from_memory_without_copy.argtypes = [
            P, ctypes.c_char_p, ctypes.c_size_t, P,
        ]
        lib.heif_context_get_primary_image_handle.restype = _HeifError
        lib.heif_context_get_primary_image_handle.argtypes = [P, PP]
        lib.heif_image_handle_release.restype = None
        lib.heif_image_handle_release.argtypes = [P]
        lib.heif_decode_image.restype = _HeifError
        lib.heif_decode_image.argtypes = [P, PP, ctypes.c_int, ctypes.c_int, P]
        lib.heif_image_release.restype = None
        lib.heif_image_release.argtypes = [P]
        lib.heif_image_get_width.restype = ctypes.c_int
        lib.heif_image_get_width.argtypes = [P, ctypes.c_int]
        lib.heif_image_get_height.restype = ctypes.c_int
        lib.heif_image_get_height.argtypes = [P, ctypes.c_int]
        lib.heif_image_get_plane_readonly.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.heif_image_get_plane_readonly.argtypes = [
            P, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        lib.heif_context_get_encoder_for_format.restype = _HeifError
        lib.heif_context_get_encoder_for_format.argtypes = [P, ctypes.c_int, PP]
        lib.heif_encoder_release.restype = None
        lib.heif_encoder_release.argtypes = [P]
        lib.heif_encoder_set_lossless.restype = _HeifError
        lib.heif_encoder_set_lossless.argtypes = [P, ctypes.c_int]
        lib.heif_encoder_set_lossy_quality.restype = _HeifError
        lib.heif_encoder_set_lossy_quality.argtypes = [P, ctypes.c_int]
        lib.heif_image_create.restype = _HeifError
        lib.heif_image_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, PP,
        ]
        lib.heif_image_add_plane.restype = _HeifError
        lib.heif_image_add_plane.argtypes = [
            P, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.heif_image_get_plane.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.heif_image_get_plane.argtypes = [P, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.heif_context_encode_image.restype = _HeifError
        lib.heif_context_encode_image.argtypes = [P, P, P, P, PP]
        lib.heif_context_write_to_file.restype = _HeifError
        lib.heif_context_write_to_file.argtypes = [P, ctypes.c_char_p]
    except AttributeError:  # pragma: no cover - exotic/stripped build
        return None
    return lib


def available() -> bool:
    """True when the system libheif (with at least one decoder plugin)
    is loadable; every public function below requires it."""
    return _lib() is not None


def decode_heif(payload: bytes) -> tuple[int, int, int, "object"]:
    """Decode the PRIMARY item of an AVIF/HEIC payload to interleaved
    RGB: returns ``(height, width, 3, ndarray[h, w, 3] uint8)`` —
    the :func:`.multimodal.decode_image` contract."""
    import numpy as np

    lib = _lib()
    if lib is None:
        raise ValueError("libheif shared library not available")
    ctx = lib.heif_context_alloc()
    if not ctx:
        raise ValueError("libheif: context allocation failed")
    handle = ctypes.c_void_p()
    img = ctypes.c_void_p()
    try:
        # without_copy: `payload` (a Python bytes we hold a reference to
        # for the whole try block) must outlive the context — it does
        _ok(
            lib.heif_context_read_from_memory_without_copy(
                ctx, payload, len(payload), None
            ),
            "read",
        )
        _ok(lib.heif_context_get_primary_image_handle(ctx, ctypes.byref(handle)), "primary handle")
        _ok(
            lib.heif_decode_image(
                handle, ctypes.byref(img), _COLORSPACE_RGB, _CHROMA_INTERLEAVED_RGB, None
            ),
            "decode",
        )
        w = lib.heif_image_get_width(img, _CHANNEL_INTERLEAVED)
        h = lib.heif_image_get_height(img, _CHANNEL_INTERLEAVED)
        if w <= 0 or h <= 0:
            raise ValueError("libheif: decoded image has no interleaved plane")
        stride = ctypes.c_int()
        ptr = lib.heif_image_get_plane_readonly(
            img, _CHANNEL_INTERLEAVED, ctypes.byref(stride)
        )
        if not ptr:
            raise ValueError("libheif: interleaved plane unavailable")
        base = ctypes.addressof(ptr.contents)
        out = np.empty((h, w, 3), dtype=np.uint8)
        for y in range(h):
            out[y] = np.frombuffer(
                ctypes.string_at(base + y * stride.value, w * 3), dtype=np.uint8
            ).reshape(w, 3)
        return h, w, 3, out
    finally:
        if img:
            lib.heif_image_release(img)
        if handle:
            lib.heif_image_handle_release(handle)
        lib.heif_context_free(ctx)


def encode_avif(pix, lossless: bool = True, quality: int = 90) -> bytes:
    """Encode ``(h, w)`` grey or ``(h, w, 3)`` RGB uint8 to AVIF bytes
    through the library's AV1 encoder.  ``lossless=True`` is exact for
    R=G=B block-constant content (the fixture patterns); the library
    writes through a temp file because its in-memory writer API takes a
    C callback struct — fixture-size payloads make that cost nil."""
    import numpy as np

    lib = _lib()
    if lib is None:
        raise ValueError("libheif shared library not available")
    pix = np.asarray(pix, dtype=np.uint8)
    if pix.ndim == 2:
        pix = np.stack([pix, pix, pix], axis=-1)
    if pix.ndim != 3 or pix.shape[2] != 3:
        raise ValueError(f"encode_avif: expected (h, w) or (h, w, 3), got {pix.shape}")
    h, w = pix.shape[:2]
    ctx = lib.heif_context_alloc()
    if not ctx:
        raise ValueError("libheif: context allocation failed")
    enc = ctypes.c_void_p()
    img = ctypes.c_void_p()
    out_handle = ctypes.c_void_p()
    try:
        _ok(
            lib.heif_context_get_encoder_for_format(
                ctx, _COMPRESSION_AV1, ctypes.byref(enc)
            ),
            "AV1 encoder",
        )
        _ok(
            lib.heif_image_create(
                w, h, _COLORSPACE_RGB, _CHROMA_INTERLEAVED_RGB, ctypes.byref(img)
            ),
            "image create",
        )
        _ok(lib.heif_image_add_plane(img, _CHANNEL_INTERLEAVED, w, h, 8), "add plane")
        stride = ctypes.c_int()
        ptr = lib.heif_image_get_plane(img, _CHANNEL_INTERLEAVED, ctypes.byref(stride))
        if not ptr:
            raise ValueError("libheif: plane pointer unavailable")
        base = ctypes.addressof(ptr.contents)
        row_bytes = w * 3
        raw = np.ascontiguousarray(pix)
        for y in range(h):
            ctypes.memmove(base + y * stride.value, raw[y].tobytes(), row_bytes)
        if lossless:
            _ok(lib.heif_encoder_set_lossless(enc, 1), "set lossless")
        else:
            _ok(lib.heif_encoder_set_lossy_quality(enc, int(quality)), "set quality")
        _ok(
            lib.heif_context_encode_image(ctx, img, enc, None, ctypes.byref(out_handle)),
            "encode",
        )
        fd, path = tempfile.mkstemp(suffix=".avif")
        try:
            os.close(fd)
            _ok(lib.heif_context_write_to_file(ctx, path.encode()), "write")
            with open(path, "rb") as f:
                return f.read()
        finally:
            os.unlink(path)
    finally:
        if out_handle:
            lib.heif_image_handle_release(out_handle)
        if img:
            lib.heif_image_release(img)
        if enc:
            lib.heif_encoder_release(enc)
        lib.heif_context_free(ctx)
