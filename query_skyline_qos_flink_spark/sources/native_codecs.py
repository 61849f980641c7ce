"""ctypes bridges to the system ``libzstd``, ``libbrotli`` and
``liblz4`` shared libraries — the zstd (RFC 8878), brotli (RFC 7932)
and lz4-frame byte-stream codecs.

Python 3.11 ships no stdlib codec for any of them (``compression.zstd``
arrives in 3.14), but the libraries are on every production host that
handles modern corpus drops: ``.tar.zst`` is the default packaging for
ML data releases, ``.tar.lz4`` its speed-optimized sibling, and real
Common Crawl HTTP responses ship ``Content-Encoding: br`` constantly.
This module binds the libraries' stable C APIs the same way
:mod:`..operators.libwebp_bridge` binds libwebp — plain C types, no
version-fragile structs beyond zstd's documented in/out buffer triples,
lazy per-process load so Arrow-batch UDF workers each bind once.

Decode paths follow the repo's decompress-loop rules (see
``sources/archives.py``): bounded output ceilings enforced by the
caller per chunk, bounded input feeds, truncation and trailing garbage
raise.  :class:`ZstdDecompressor` speaks the stdlib ``bz2``/``lzma``
decompressobj protocol (``decompress(data, max_length)`` /
``needs_input`` / ``eof`` / ``unused_data``) so it slots directly into
the envelope loop in :func:`..sources.archives.maybe_decompress_tar`.

Availability is environmental: :func:`zstd_available` /
:func:`brotli_available` gate every caller, and the seam error messages
stay in place when the libraries are absent.  The encoder halves
(``zstd_compress`` / ``brotli_compress``) exist for fixture generation
and for roundtrip conformance tests against the ``zstd`` CLI.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from functools import lru_cache

_ZSTD_CANDIDATES = ("libzstd.so.1", "libzstd.so", "libzstd.1.dylib", "libzstd.dylib")
_BROTLI_DEC_CANDIDATES = ("libbrotlidec.so.1", "libbrotlidec.so", "libbrotlidec.1.dylib")
_BROTLI_ENC_CANDIDATES = ("libbrotlienc.so.1", "libbrotlienc.so", "libbrotlienc.1.dylib")
_LZ4_CANDIDATES = ("liblz4.so.1", "liblz4.so", "liblz4.1.dylib", "liblz4.dylib")

#: zstd frame magics: one regular frame magic plus the 16 skippable-frame
#: magics (RFC 8878 §3.1.2) — pzstd / the seekable format append
#: skippable frames, which ZSTD_decompressStream consumes as an
#: output-less frame of their own.
ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
_ZSTD_SKIPPABLE_TAIL = b"\x2a\x4d\x18"


def is_zstd_magic(prefix: bytes) -> bool:
    """True when ``prefix`` starts a zstd frame (regular or skippable)."""
    return prefix[:4] == ZSTD_MAGIC or _is_skippable_magic(prefix)


def _is_skippable_magic(prefix: bytes) -> bool:
    # the 16 skippable-frame magics are SHARED between the zstd and lz4
    # frame formats (both specs reserve 0x184D2A50-5F little-endian)
    return (
        len(prefix) >= 4
        and 0x50 <= prefix[0] <= 0x5F
        and prefix[1:4] == _ZSTD_SKIPPABLE_TAIL
    )


#: LZ4 frame magic (the modern frame format, RFC-less but published as
#: the lz4_Frame_format spec; the legacy ``lz4c`` magic is 02 21 4C 18).
LZ4_MAGIC = b"\x04\x22\x4d\x18"
LZ4_LEGACY_MAGIC = b"\x02\x21\x4c\x18"


def is_lz4_magic(prefix: bytes) -> bool:
    """True when ``prefix`` starts a modern lz4 frame (or skippable)."""
    return prefix[:4] == LZ4_MAGIC or _is_skippable_magic(prefix)


def _load(candidates, libname):
    lib = None
    for name in candidates:
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is None:
        found = ctypes.util.find_library(libname)
        if found:
            try:
                lib = ctypes.CDLL(found)
            except OSError:
                lib = None
    return lib


class _ZstdInBuffer(ctypes.Structure):
    _fields_ = [
        ("src", ctypes.c_void_p),
        ("size", ctypes.c_size_t),
        ("pos", ctypes.c_size_t),
    ]


class _ZstdOutBuffer(ctypes.Structure):
    _fields_ = [
        ("dst", ctypes.c_void_p),
        ("size", ctypes.c_size_t),
        ("pos", ctypes.c_size_t),
    ]


@lru_cache(maxsize=1)
def _zstd():
    lib = _load(_ZSTD_CANDIDATES, "zstd")
    if lib is None:
        return None
    try:
        lib.ZSTD_createDCtx.restype = ctypes.c_void_p
        lib.ZSTD_createDCtx.argtypes = []
        lib.ZSTD_freeDCtx.restype = ctypes.c_size_t
        lib.ZSTD_freeDCtx.argtypes = [ctypes.c_void_p]
        lib.ZSTD_decompressStream.restype = ctypes.c_size_t
        lib.ZSTD_decompressStream.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(_ZstdOutBuffer),
            ctypes.POINTER(_ZstdInBuffer),
        ]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        lib.ZSTD_getErrorName.restype = ctypes.c_char_p
        lib.ZSTD_getErrorName.argtypes = [ctypes.c_size_t]
        lib.ZSTD_compress.restype = ctypes.c_size_t
        lib.ZSTD_compress.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_int,
        ]
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        lib.ZSTD_DCtx_loadDictionary.restype = ctypes.c_size_t
        lib.ZSTD_DCtx_loadDictionary.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.ZSTD_createCCtx.restype = ctypes.c_void_p
        lib.ZSTD_createCCtx.argtypes = []
        lib.ZSTD_freeCCtx.restype = ctypes.c_size_t
        lib.ZSTD_freeCCtx.argtypes = [ctypes.c_void_p]
        lib.ZSTD_compress_usingDict.restype = ctypes.c_size_t
        lib.ZSTD_compress_usingDict.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_int,
        ]
    except AttributeError:
        return None
    return lib


@lru_cache(maxsize=1)
def _brotli_dec():
    lib = _load(_BROTLI_DEC_CANDIDATES, "brotlidec")
    if lib is None:
        return None
    p8 = ctypes.POINTER(ctypes.c_uint8)
    try:
        lib.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
        lib.BrotliDecoderCreateInstance.argtypes = [ctypes.c_void_p] * 3
        lib.BrotliDecoderDestroyInstance.restype = None
        lib.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
        lib.BrotliDecoderDecompressStream.restype = ctypes.c_int
        lib.BrotliDecoderDecompressStream.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(p8),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(p8),
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.BrotliDecoderGetErrorCode.restype = ctypes.c_int
        lib.BrotliDecoderGetErrorCode.argtypes = [ctypes.c_void_p]
        lib.BrotliDecoderErrorString.restype = ctypes.c_char_p
        lib.BrotliDecoderErrorString.argtypes = [ctypes.c_int]
    except AttributeError:
        return None
    return lib


@lru_cache(maxsize=1)
def _brotli_enc():
    lib = _load(_BROTLI_ENC_CANDIDATES, "brotlienc")
    if lib is None:
        return None
    try:
        lib.BrotliEncoderCompress.restype = ctypes.c_int
        lib.BrotliEncoderCompress.argtypes = [
            ctypes.c_int,  # quality
            ctypes.c_int,  # lgwin
            ctypes.c_int,  # mode
            ctypes.c_size_t,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_char_p,
        ]
        lib.BrotliEncoderMaxCompressedSize.restype = ctypes.c_size_t
        lib.BrotliEncoderMaxCompressedSize.argtypes = [ctypes.c_size_t]
    except AttributeError:
        return None
    return lib


@lru_cache(maxsize=1)
def _lz4():
    lib = _load(_LZ4_CANDIDATES, "lz4")
    if lib is None:
        return None
    try:
        lib.LZ4F_isError.restype = ctypes.c_uint
        lib.LZ4F_isError.argtypes = [ctypes.c_size_t]
        lib.LZ4F_getErrorName.restype = ctypes.c_char_p
        lib.LZ4F_getErrorName.argtypes = [ctypes.c_size_t]
        lib.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
        lib.LZ4F_createDecompressionContext.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_uint,
        ]
        lib.LZ4F_freeDecompressionContext.restype = ctypes.c_size_t
        lib.LZ4F_freeDecompressionContext.argtypes = [ctypes.c_void_p]
        lib.LZ4F_decompress.restype = ctypes.c_size_t
        lib.LZ4F_decompress.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_void_p,
        ]
        lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
        lib.LZ4F_compressFrameBound.argtypes = [ctypes.c_size_t, ctypes.c_void_p]
        lib.LZ4F_compressFrame.restype = ctypes.c_size_t
        lib.LZ4F_compressFrame.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
        ]
    except AttributeError:
        return None
    return lib


_LZ4F_VERSION = 100  # LZ4F_VERSION of the stable frame ABI


def lz4_available() -> bool:
    """True when a usable liblz4 with the frame API is loadable."""
    return _lz4() is not None


def zstd_available() -> bool:
    """True when a usable libzstd with the streaming API is loadable."""
    return _zstd() is not None


def brotli_available() -> bool:
    """True when a usable libbrotlidec is loadable (decode path)."""
    return _brotli_dec() is not None


def brotli_encoder_available() -> bool:
    """True when libbrotlienc is loadable (fixture generation only)."""
    return _brotli_enc() is not None


class ZstdDecompressor:
    """One zstd frame, stdlib-decompressobj protocol (the ``bz2``/
    ``lzma`` shape: ``decompress(data, max_length)`` buffers unconsumed
    input internally, ``needs_input`` asks for more, ``eof`` flips at
    frame end, ``unused_data`` holds the bytes past it).

    One instance decodes ONE frame — concatenated frames (legal per
    RFC 8878 §3, and what ``zstd`` CLI appends produce) are the
    caller's loop, same as the stdlib codecs.  A skippable frame is
    consumed by libzstd as an output-less frame of its own, so it also
    terminates an instance with ``eof`` set and no output.

    ``dict_data`` loads a decompression dictionary (raw-content or
    structured) before the frame — the ``.warc.zst`` IIPC packaging
    carries one in a leading skippable frame.
    """

    def __init__(self, dict_data: bytes | None = None):
        # before anything that can raise: __del__ reads these, and a
        # missing library / failed createDCtx must not turn the finalizer
        # into "Exception ignored in __del__" noise
        self._dctx = None
        self._lib = None
        lib = _zstd()
        if lib is None:
            raise RuntimeError("libzstd shared library not available")
        self._lib = lib
        self._dctx = lib.ZSTD_createDCtx()
        if not self._dctx:
            raise RuntimeError("libzstd: ZSTD_createDCtx failed")
        if dict_data:
            self._dict = dict_data  # keep the buffer alive: loadDictionary
            # defaults to by-reference (ZSTD_dlm_byRef is NOT the default,
            # it copies — but pinning costs nothing and is version-proof)
            rc = lib.ZSTD_DCtx_loadDictionary(self._dctx, dict_data, len(dict_data))
            if lib.ZSTD_isError(rc):
                name = lib.ZSTD_getErrorName(rc).decode("ascii", "replace")
                lib.ZSTD_freeDCtx(self._dctx)
                self._dctx = None
                raise ValueError(f"zstd: bad dictionary: {name}")
        self._in = b""
        self.eof = False
        self.unused_data = b""

    def __del__(self):
        self.close()

    def close(self) -> None:
        dctx, self._dctx = self._dctx, None
        if dctx:
            self._lib.ZSTD_freeDCtx(dctx)

    @property
    def needs_input(self) -> bool:
        return not self.eof and not self._in

    def reset(self) -> None:
        """Re-arm after ``eof`` for the next concatenated frame on the
        SAME context: libzstd auto-resets the dctx at frame boundaries
        and a loaded dictionary is sticky across frames (both verified
        against libzstd 1.5.7), so per-frame walkers (one frame per
        WARC record) skip the ~28 µs create/free per frame.  Leftover
        ``unused_data`` is NOT carried over — the caller owns the
        between-frames bookkeeping, same as a fresh instance.  Only
        legal at a frame boundary: a mid-frame reset would leave the C
        context mid-frame while the python flags said "fresh", decoding
        the next frame's magic as the old frame's continuation."""
        if self._dctx is None:
            raise ValueError("zstd: decompressor is closed")
        if not self.eof:
            raise ValueError("zstd: reset() is only legal after frame end")
        self.eof = False
        self._in = b""
        self.unused_data = b""

    def decompress(self, data=b"", max_length: int = -1) -> bytes:
        if self.eof:
            raise EOFError("zstd: decompress() called after frame end")
        if self._dctx is None:
            raise ValueError("zstd: decompressor is closed")
        if data:
            src = bytes(data)
            self._in = self._in + src if self._in else src
        src = self._in
        cap = max_length if max_length >= 0 else (1 << 20)
        dst = ctypes.create_string_buffer(cap) if cap else None
        out_buf = _ZstdOutBuffer(
            ctypes.cast(dst, ctypes.c_void_p) if dst else None, cap, 0
        )
        # c_char_p points into the immutable bytes object — no copy; the
        # library only reads from src, and pos bookkeeping replaces any
        # tail re-slicing (the O(n²) trap the round-13 review flagged)
        in_buf = _ZstdInBuffer(
            ctypes.cast(ctypes.c_char_p(src), ctypes.c_void_p) if src else None,
            len(src),
            0,
        )
        lib = self._lib
        while True:
            before = (in_buf.pos, out_buf.pos)
            ret = lib.ZSTD_decompressStream(
                self._dctx, ctypes.byref(out_buf), ctypes.byref(in_buf)
            )
            if lib.ZSTD_isError(ret):
                name = lib.ZSTD_getErrorName(ret).decode("ascii", "replace")
                raise ValueError(f"zstd: corrupt frame: {name}")
            if ret == 0:  # frame fully decoded and flushed
                self.eof = True
                self.unused_data = src[in_buf.pos :]
                self._in = b""
                break
            if in_buf.pos >= in_buf.size or out_buf.pos >= cap:
                self._in = src[in_buf.pos :]
                break
            if (in_buf.pos, out_buf.pos) == before:
                raise ValueError("zstd: decoder made no progress")
        return dst.raw[: out_buf.pos] if dst else b""


def zstd_compress(data: bytes, level: int = 3) -> bytes:
    """One-shot zstd frame (fixtures + CLI-conformance tests only)."""
    lib = _zstd()
    if lib is None:
        raise RuntimeError("libzstd shared library not available")
    bound = lib.ZSTD_compressBound(len(data))
    out = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress(out, bound, data, len(data), level)
    if lib.ZSTD_isError(n):
        name = lib.ZSTD_getErrorName(n).decode("ascii", "replace")
        raise ValueError(f"zstd: compress failed: {name}")
    return out.raw[:n]


def zstd_train_dict(samples: list[bytes], dict_size: int = 16 << 10) -> bytes:
    """Train a zstd dictionary from sample payloads (ZDICT), for
    dictionary-compressed shard packing (the ``.warc.zst`` IIPC shape:
    many small similar records compress dramatically better against a
    corpus-trained dictionary).  Needs enough distinct samples for
    ZDICT's cover algorithm — ~100+ in practice; raises ``ValueError``
    with the library's reason otherwise."""
    lib = _zstd()
    if lib is None:
        raise RuntimeError("libzstd shared library not available")
    try:
        lib.ZDICT_trainFromBuffer.restype = ctypes.c_size_t
        lib.ZDICT_trainFromBuffer.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_uint,
        ]
        lib.ZDICT_isError.restype = ctypes.c_uint
        lib.ZDICT_isError.argtypes = [ctypes.c_size_t]
        lib.ZDICT_getErrorName.restype = ctypes.c_char_p
        lib.ZDICT_getErrorName.argtypes = [ctypes.c_size_t]
    except AttributeError:
        raise RuntimeError("libzstd build lacks the ZDICT trainer") from None
    blob = b"".join(samples)
    sizes = (ctypes.c_size_t * len(samples))(*[len(s) for s in samples])
    out = ctypes.create_string_buffer(dict_size)
    n = lib.ZDICT_trainFromBuffer(out, dict_size, blob, sizes, len(samples))
    if lib.ZDICT_isError(n):
        name = lib.ZDICT_getErrorName(n).decode("ascii", "replace")
        raise ValueError(f"zstd: dictionary training failed: {name}")
    return out.raw[:n]


def zstd_compress_with_dict(data: bytes, dict_data: bytes, level: int = 3) -> bytes:
    """One zstd frame compressed against a dictionary (fixture twin of
    the ``.warc.zst`` dictionary read path)."""
    lib = _zstd()
    if lib is None:
        raise RuntimeError("libzstd shared library not available")
    cctx = lib.ZSTD_createCCtx()
    if not cctx:
        raise RuntimeError("libzstd: ZSTD_createCCtx failed")
    try:
        bound = lib.ZSTD_compressBound(len(data))
        out = ctypes.create_string_buffer(bound)
        n = lib.ZSTD_compress_usingDict(
            cctx, out, bound, data, len(data), dict_data, len(dict_data), level
        )
        if lib.ZSTD_isError(n):
            name = lib.ZSTD_getErrorName(n).decode("ascii", "replace")
            raise ValueError(f"zstd: dict compress failed: {name}")
        return out.raw[:n]
    finally:
        lib.ZSTD_freeCCtx(cctx)


_DEC_CHUNK = 1 << 20


def _decompress_frames_bounded(
    payload: bytes, max_out: int, what: str, label: str, is_magic, make
) -> bytes:
    """Shared bounded walker behind ``zstd_decompress_bounded`` and
    ``lz4_decompress_bounded``: decode a complete payload of one or more
    concatenated frames (skippable frames included) with a hard output
    ceiling.  Truncation, trailing garbage, and inflate-past-ceiling
    raise ``ValueError``.  Output pulls ramp from ~4x the compressed
    size up to the 1 MiB chunk: HTTP payloads are typically sub-KB per
    record, and a zero-filled 1 MiB ctypes buffer per record is a
    ~40 µs memset tax (measured 3x on the 500k-record crawl probe,
    round 14)."""
    mv = memoryview(payload)
    n = len(payload)
    if not is_magic(payload[:4]):
        raise ValueError(f"{what}: not a {label} frame (bad magic)")
    parts: list[bytes] = []
    total = 0
    pos = 0
    out_chunk = min(_DEC_CHUNK, max(4096, 4 * n))
    while pos < n:  # one iteration per concatenated frame
        if not is_magic(bytes(mv[pos : pos + 4])):
            raise ValueError(
                f"{what}: trailing bytes after the {label} frame "
                "(garbage, not a concatenated frame)"
            )
        d = make()
        while True:
            feed = b""
            if d.needs_input:
                feed = mv[pos : pos + _DEC_CHUNK]
                pos += len(feed)
            chunk = d.decompress(feed, out_chunk)
            out_chunk = min(_DEC_CHUNK, out_chunk * 8)
            total += len(chunk)
            if total > max_out:
                raise ValueError(
                    f"{what}: payload inflates past the {max_out}-byte ceiling"
                )
            if chunk:
                parts.append(chunk)
            if d.eof:
                break
            if d.needs_input and pos >= n:
                raise ValueError(f"{what}: truncated {label} frame")
        pos -= len(d.unused_data)  # rewind to the true end of this frame
    return b"".join(parts)


def zstd_decompress_bounded(payload: bytes, max_out: int, what: str = "zstd") -> bytes:
    """Bounded multi-frame zstd decode (see ``_decompress_frames_bounded``)."""
    return _decompress_frames_bounded(
        payload, max_out, what, "zstd", is_zstd_magic, ZstdDecompressor
    )


class Lz4Decompressor:
    """One lz4 frame, stdlib-decompressobj protocol (the shape
    :class:`ZstdDecompressor` speaks — see its docstring).  One instance
    decodes ONE frame so the caller's concatenation loop stays in
    charge; ``LZ4F_decompress`` stops consuming at the frame boundary
    (returns 0), which maps directly onto ``eof`` + ``unused_data``.
    Skippable frames are consumed by the library as output-less frames.
    """

    def __init__(self):
        self._dctx = None  # __del__-safe before any raising call
        self._lib = None
        lib = _lz4()
        if lib is None:
            raise RuntimeError("liblz4 shared library not available")
        self._lib = lib
        dctx = ctypes.c_void_p()
        rc = lib.LZ4F_createDecompressionContext(ctypes.byref(dctx), _LZ4F_VERSION)
        if lib.LZ4F_isError(rc):
            raise RuntimeError("liblz4: create decompression context failed")
        self._dctx = dctx
        self._in = b""
        self.eof = False
        self.unused_data = b""

    def __del__(self):
        self.close()

    def close(self) -> None:
        dctx, self._dctx = self._dctx, None
        if dctx:
            self._lib.LZ4F_freeDecompressionContext(dctx)

    @property
    def needs_input(self) -> bool:
        return not self.eof and not self._in

    def decompress(self, data=b"", max_length: int = -1) -> bytes:
        if self.eof:
            raise EOFError("lz4: decompress() called after frame end")
        if self._dctx is None:
            raise ValueError("lz4: decompressor is closed")
        if data:
            src = bytes(data)
            self._in = self._in + src if self._in else src
        src = self._in
        cap = max_length if max_length >= 0 else (1 << 20)
        dst = ctypes.create_string_buffer(cap) if cap else None
        lib = self._lib
        base = ctypes.cast(ctypes.c_char_p(src), ctypes.c_void_p)
        pos = 0
        produced = 0
        while True:
            if not src and not self.eof:
                break
            dst_sz = ctypes.c_size_t(cap - produced)
            src_sz = ctypes.c_size_t(len(src) - pos)
            srcp = ctypes.c_void_p((base.value or 0) + pos) if src else None
            dstp = (
                ctypes.c_void_p(ctypes.addressof(dst) + produced) if dst else None
            )
            ret = lib.LZ4F_decompress(
                self._dctx, dstp, ctypes.byref(dst_sz), srcp, ctypes.byref(src_sz), None
            )
            if lib.LZ4F_isError(ret):
                name = lib.LZ4F_getErrorName(ret).decode("ascii", "replace")
                raise ValueError(f"lz4: corrupt frame: {name}")
            pos += src_sz.value
            produced += dst_sz.value
            if ret == 0:  # frame fully decoded
                self.eof = True
                self.unused_data = src[pos:]
                self._in = b""
                break
            if pos >= len(src) or produced >= cap:
                self._in = src[pos:]
                break
            if src_sz.value == 0 and dst_sz.value == 0:
                raise ValueError("lz4: decoder made no progress")
        return dst.raw[:produced] if dst else b""


def lz4_compress(data: bytes) -> bytes:
    """One-shot lz4 frame (fixtures + conformance tests only)."""
    lib = _lz4()
    if lib is None:
        raise RuntimeError("liblz4 shared library not available")
    bound = lib.LZ4F_compressFrameBound(len(data), None)
    out = ctypes.create_string_buffer(bound)
    n = lib.LZ4F_compressFrame(out, bound, data, len(data), None)
    if lib.LZ4F_isError(n):
        name = lib.LZ4F_getErrorName(n).decode("ascii", "replace")
        raise ValueError(f"lz4: compress failed: {name}")
    return out.raw[:n]


def lz4_decompress_bounded(payload: bytes, max_out: int, what: str = "lz4") -> bytes:
    """Bounded multi-frame lz4 decode (see ``_decompress_frames_bounded``)."""
    return _decompress_frames_bounded(
        payload, max_out, what, "lz4", is_lz4_magic, Lz4Decompressor
    )


#: BrotliDecoderResult values (stable ABI since brotli 1.0).
_BROTLI_ERROR = 0
_BROTLI_SUCCESS = 1
_BROTLI_NEEDS_MORE_INPUT = 2
_BROTLI_NEEDS_MORE_OUTPUT = 3


def brotli_decompress_bounded(payload: bytes, max_out: int, what: str = "brotli") -> bytes:
    """Decode a complete brotli stream (RFC 7932) with a hard output
    ceiling.  Brotli has no frame magic and no legal concatenation, so a
    stream that ends early means trailing garbage and a stream that
    wants more input means truncation/corruption — both raise."""
    lib = _brotli_dec()
    if lib is None:
        raise RuntimeError("libbrotlidec shared library not available")
    p8 = ctypes.POINTER(ctypes.c_uint8)
    state = lib.BrotliDecoderCreateInstance(None, None, None)
    if not state:
        raise RuntimeError("libbrotlidec: create instance failed")
    try:
        next_in = ctypes.cast(ctypes.c_char_p(payload), p8)
        avail_in = ctypes.c_size_t(len(payload))
        total_out = ctypes.c_size_t(0)
        parts: list[bytes] = []
        total = 0
        # same output-pull ramp as zstd_decompress_bounded: per-record
        # crawl payloads must not pay a 1 MiB zeroed-buffer memset each
        out_chunk = min(_DEC_CHUNK, max(4096, 4 * len(payload)))
        while True:
            buf = ctypes.create_string_buffer(out_chunk)
            next_out = ctypes.cast(buf, p8)
            avail_out = ctypes.c_size_t(out_chunk)
            res = lib.BrotliDecoderDecompressStream(
                state,
                ctypes.byref(avail_in),
                ctypes.byref(next_in),
                ctypes.byref(avail_out),
                ctypes.byref(next_out),
                ctypes.byref(total_out),
            )
            produced = out_chunk - avail_out.value
            out_chunk = min(_DEC_CHUNK, out_chunk * 8)
            total += produced
            if total > max_out:
                raise ValueError(
                    f"{what}: payload inflates past the {max_out}-byte ceiling"
                )
            if produced:
                parts.append(buf.raw[:produced])
            if res == _BROTLI_SUCCESS:
                if avail_in.value:
                    raise ValueError(
                        f"{what}: trailing bytes after the brotli stream"
                    )
                return b"".join(parts)
            if res == _BROTLI_NEEDS_MORE_OUTPUT:
                continue
            if res == _BROTLI_NEEDS_MORE_INPUT:
                # the whole payload was handed over up front, so this is
                # truncation (or corruption brotli can only detect as such)
                raise ValueError(f"{what}: truncated or corrupt brotli stream")
            code = lib.BrotliDecoderGetErrorCode(state)
            name = lib.BrotliDecoderErrorString(code).decode("ascii", "replace")
            raise ValueError(f"{what}: corrupt brotli stream: {name}")
    finally:
        lib.BrotliDecoderDestroyInstance(state)


def brotli_compress(data: bytes, quality: int = 5) -> bytes:
    """One-shot brotli stream (fixtures + conformance tests only)."""
    lib = _brotli_enc()
    if lib is None:
        raise RuntimeError("libbrotlienc shared library not available")
    cap = lib.BrotliEncoderMaxCompressedSize(len(data)) or len(data) + 1024
    out = ctypes.create_string_buffer(cap)
    n = ctypes.c_size_t(cap)
    # mode 0 = BROTLI_MODE_GENERIC, lgwin 22 = library default
    ok = lib.BrotliEncoderCompress(quality, 22, 0, len(data), data, ctypes.byref(n), out)
    if not ok:
        raise ValueError("brotli: encode failed")
    return out.raw[: n.value]
