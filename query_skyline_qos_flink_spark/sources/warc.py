"""WARC source — the crawl-native file format (ISO 28500 / WARC 1.0-1.1).

The reference engine's only source is Kafka (FlinkSkyline.java:84-97);
a 100 TB training-data pipeline's raw input is WARC — Common Crawl ships
~100 TB per monthly crawl as ``.warc.gz``.  This module implements the
record layer from the public spec: the ``WARC/1.x`` version line, CRLF
header block, ``Content-Length``-framed body, the mandatory
CRLF CRLF record terminator, and the standard one-gzip-member-per-record
packaging (multi-member streams decompress member-by-member so member
offsets — the format's split points — are preserved and reported).

Spark integration is :func:`read_warc`: ``binaryFile`` scan →
``mapInPandas`` record explosion, one output row per record.  At cluster
scale the unit of parallelism is the WARC file (the format is only
splittable at gzip-member boundaries, which is why Common Crawl caps
files at ~1 GB); a 100 TB crawl is ~100k files, far above any cluster's
task slots, so the scan saturates without intra-file splitting.  Bodies
stay inside the Arrow batch — only requested columns leave the executor.

Strictness contract (same as the container codecs): a malformed version
line, non-numeric Content-Length, missing record terminator, or trailing
garbage raises — a crawl reader must never silently drop or truncate
records.
"""

from __future__ import annotations

import codecs
import re
import zlib
from collections.abc import Iterator

from . import native_codecs

CRLF = b"\r\n"

# Decompression ceilings (round-12 ADVICE): gzip carries no trustworthy
# declared output size, so a crafted .warc.gz bomb could exhaust executor
# memory inside mapInPandas before any strictness check fires.  Common
# Crawl caps files at ~1 GB compressed with one ~page-sized record per
# member, so these bounds are far above any legitimate crawl shape.
MAX_MEMBER_BYTES = 1 << 30  # 1 GiB per gzip member
MAX_FILE_BYTES = 4 << 30  # 4 GiB decompressed per file
_INFLATE_CHUNK = 1 << 20


def _gzip_members(b: bytes):
    """Yield ``(member_offset, decompressed_bytes)`` per gzip member.

    Inflation is chunked and bounded (``MAX_MEMBER_BYTES`` per member,
    ``MAX_FILE_BYTES`` per file) — mirroring the zip-bomb guard in
    ``sources/archives.py``, which can lean on the archive's declared
    size where gzip cannot.  INPUT is fed in bounded memoryview slices
    too (round-13 review): slicing the remaining tail per member would
    memcpy O(members × file_size) on a real ~1 GB / ~20k-member crawl
    file — the feed/position bookkeeping below keeps the walk linear."""
    mv = memoryview(b)
    n = len(b)
    off = 0
    total = 0
    while off < n:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        parts: list[bytes] = []
        produced = 0
        pos = off
        # ramped feed: members are usually far smaller than the 1 MiB
        # chunk (a crawl page is ~15-50 KB compressed), and zlib copies
        # each feed's post-EOF remainder into unused_data — a small
        # first feed bounds that per-member copy tax while big members
        # still ramp to full-size feeds within a few iterations
        feed_size = 1 << 16
        while True:
            feed = d.unconsumed_tail
            if not feed:
                feed = mv[pos : pos + feed_size]
                pos += len(feed)
                feed_size = min(feed_size * 4, _INFLATE_CHUNK)
            try:
                chunk = d.decompress(feed, _INFLATE_CHUNK)
            except zlib.error as exc:
                raise ValueError(
                    f"warc.gz: corrupt gzip member at byte {off}: {exc}"
                ) from exc
            produced += len(chunk)
            total += len(chunk)
            if produced > MAX_MEMBER_BYTES:
                raise ValueError(
                    f"warc.gz: gzip member at byte {off} inflates past "
                    f"the {MAX_MEMBER_BYTES}-byte member ceiling"
                )
            if total > MAX_FILE_BYTES:
                raise ValueError(
                    f"warc.gz: file inflates past the "
                    f"{MAX_FILE_BYTES}-byte per-file ceiling"
                )
            parts.append(chunk)
            if d.eof:
                break
            if not d.unconsumed_tail and pos >= n:
                raise ValueError(f"warc.gz: truncated gzip member at byte {off}")
        yield off, b"".join(parts)
        off = pos - len(d.unused_data)


def _zstd_members(b: bytes):
    """Yield ``(frame_offset, decompressed_bytes)`` per zstd frame — the
    ``.warc.zst`` packaging (IIPC/wget2: one frame per record or block,
    frame offsets are the resumable split points).  A LEADING skippable
    frame with the dictionary magic ``5D 2A 4D 18`` carries the
    compression dictionary (raw, or itself a zstd frame), loaded into
    every subsequent frame's decoder; other skippable frames are
    ignored.  Same per-member/per-file ceilings as the gzip walk."""
    if not native_codecs.zstd_available():
        raise ValueError(
            "warc.zst: zstd requires the libzstd shared library "
            "(no stdlib codec; library not found)"
        )
    mv = memoryview(b)
    n = len(b)
    pos = 0
    dict_data: bytes | None = None
    first = True
    total_file = 0
    decoder: "native_codecs.ZstdDecompressor | None" = None
    while pos < n:
        head = bytes(mv[pos : pos + 8])
        if len(head) < 4:
            raise ValueError(f"warc.zst: {len(head)} trailing bytes at byte {pos}")
        if head[:4] != native_codecs.ZSTD_MAGIC:
            if not native_codecs.is_zstd_magic(head):
                raise ValueError(
                    f"warc.zst: trailing bytes at byte {pos} are not a zstd frame"
                )
            # skippable frame: 4-byte magic + 4-byte little-endian size
            if len(head) < 8:
                raise ValueError(f"warc.zst: truncated skippable frame at byte {pos}")
            size = int.from_bytes(head[4:8], "little")
            if pos + 8 + size > n:
                raise ValueError(f"warc.zst: truncated skippable frame at byte {pos}")
            if first and head[0] == 0x5D:
                # the IIPC dictionary frame (magic 0x184D2A5D), only
                # meaningful at the very start of the file
                content = bytes(mv[pos + 8 : pos + 8 + size])
                if content[:4] == native_codecs.ZSTD_MAGIC:
                    content = native_codecs.zstd_decompress_bounded(
                        content, MAX_MEMBER_BYTES, what="warc.zst dictionary"
                    )
                dict_data = content
            pos += 8 + size
            first = False
            continue
        frame_off = pos
        # one context for the whole file: the dctx auto-resets per frame
        # and the dictionary is sticky, so frame-per-record files skip
        # the per-frame create/free (see ZstdDecompressor.reset)
        if decoder is None:
            decoder = native_codecs.ZstdDecompressor(dict_data=dict_data)
        else:
            decoder.reset()
        d = decoder
        parts: list[bytes] = []
        total = 0
        # both sides RAMP per frame: with one frame per record, a fixed
        # 1 MiB feed slice (copied into the decoder, and copied back out
        # as unused_data past the frame end) plus a fixed zero-filled
        # 1 MiB output buffer cost ~520 us per tiny record — 57x the
        # gzip member walk (round-14 review; same tax as the CE decode
        # ramp fix).  Tiny frames stay in the 4 KiB regime; big frames
        # reach the 1 MiB chunks within three pulls.
        feed_size = 4096
        out_pull = 4096
        while True:
            feed = b""
            if d.needs_input:
                feed = mv[pos : pos + feed_size]
                pos += len(feed)
                feed_size = min(feed_size * 8, _INFLATE_CHUNK)
            chunk = d.decompress(feed, out_pull)
            out_pull = min(out_pull * 8, _INFLATE_CHUNK)
            total += len(chunk)
            total_file += len(chunk)
            if total > MAX_MEMBER_BYTES:
                raise ValueError(
                    f"warc.zst: frame at byte {frame_off} inflates past "
                    f"the {MAX_MEMBER_BYTES}-byte ceiling"
                )
            if total_file > MAX_FILE_BYTES:
                raise ValueError(
                    f"warc.zst: file inflates past the "
                    f"{MAX_FILE_BYTES}-byte ceiling"
                )
            if chunk:
                parts.append(chunk)
            if d.eof:
                break
            if d.needs_input and pos >= n:
                raise ValueError(
                    f"warc.zst: truncated zstd frame at byte {frame_off}"
                )
        pos -= len(d.unused_data)  # rewind to the true frame end
        first = False
        if parts:
            yield frame_off, b"".join(parts)


def iter_warc_records(b: bytes) -> Iterator[dict]:
    """Streaming walk of a WARC payload (plain, ``.warc.gz``, or
    ``.warc.zst``), yielding record dicts one at a time:

    ``offset`` (byte offset of the record / gzip member / zstd frame in
    the file — the resumable split point), ``warc_type``, ``record_id``,
    ``target_uri``, ``content_type``, ``content_length``, ``body``.
    Header names are case-insensitive per the spec; values are taken
    verbatim.

    This is the memory-shape-critical form (round-15 probe): at the real
    task shape of ~1 GB decompressed per file, materializing all record
    dicts at once holds the whole file's bodies IN ADDITION to the
    consumer's own row accumulation — streaming keeps one record's body
    live at a time."""
    compressed = True
    if b[:2] == b"\x1f\x8b":
        chunks = _gzip_members(b)
    elif native_codecs.is_zstd_magic(b[:4]):
        chunks = _zstd_members(b)
    else:
        chunks = iter([(0, b)])
        compressed = False
    for base_off, data in chunks:
        off = 0
        while off < len(data):
            rec = _parse_one(data, off, base_off if compressed else off)
            off = rec.pop("_next")
            yield rec


def parse_warc_records(b: bytes) -> list[dict]:
    """List form of :func:`iter_warc_records` (tests / small payloads —
    atomic: raises before returning anything on a malformed file)."""
    return list(iter_warc_records(b))


def _parse_one(data: bytes, off: int, report_off: int) -> dict:
    line_end = data.find(CRLF, off)
    if line_end < 0:
        raise ValueError(f"warc: truncated version line at byte {off}")
    version = data[off:line_end]
    if not version.startswith(b"WARC/"):
        raise ValueError(f"warc: bad version line {version[:20]!r} at byte {off}")
    headers: dict[str, str] = {}
    pos = line_end + 2
    while True:
        nl = data.find(CRLF, pos)
        if nl < 0:
            raise ValueError("warc: truncated header block")
        line = data[pos:nl]
        pos = nl + 2
        if not line:
            break  # blank line ends the header block
        if b":" not in line:
            raise ValueError(f"warc: malformed header line {line[:40]!r}")
        k, v = line.split(b":", 1)
        headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    try:
        clen = int(headers["content-length"])
    except KeyError:
        raise ValueError("warc: record without Content-Length") from None
    except ValueError:
        raise ValueError(
            f"warc: non-numeric Content-Length {headers['content-length']!r}"
        ) from None
    body = data[pos : pos + clen]
    if len(body) != clen:
        raise ValueError("warc: body shorter than Content-Length")
    term = data[pos + clen : pos + clen + 4]
    if term != CRLF + CRLF:
        raise ValueError("warc: missing CRLFCRLF record terminator")
    return {
        "offset": report_off,
        "warc_type": headers.get("warc-type", ""),
        "record_id": headers.get("warc-record-id", ""),
        "target_uri": headers.get("warc-target-uri", ""),
        "content_type": headers.get("content-type", ""),
        "content_length": clen,
        "body": bytes(body),
        "_next": pos + clen + 4,
    }


def write_warc_record(
    warc_type: str,
    body: bytes,
    record_id: str,
    target_uri: str = "",
    content_type: str = "application/octet-stream",
    gzip_member: bool = True,
    codec: str | None = None,
) -> bytes:
    """One spec-shaped record, packaged per ``codec``: ``"gzip"`` = its
    own gzip member (the standard ``.warc.gz``), ``"zstd"`` = its own
    zstd frame (the IIPC ``.warc.zst``), ``"plain"`` = raw.  The legacy
    ``gzip_member`` flag maps to gzip/plain when ``codec`` is unset."""
    if codec is None:
        codec = "gzip" if gzip_member else "plain"
    if codec not in ("gzip", "zstd", "plain"):
        raise ValueError(f"warc: unknown record codec {codec!r}")
    headers = [
        b"WARC/1.1",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + record_id.encode(),
        b"WARC-Date: 2026-01-01T00:00:00Z",
    ]
    if target_uri:
        headers.append(b"WARC-Target-URI: " + target_uri.encode())
    headers += [
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(body)).encode(),
    ]
    raw = CRLF.join(headers) + CRLF + CRLF + body + CRLF + CRLF
    if codec == "plain":
        return raw
    if codec == "zstd":
        return native_codecs.zstd_compress(raw)
    co = zlib.compressobj(6, zlib.DEFLATED, zlib.MAX_WBITS | 16)
    return co.compress(raw) + co.flush()


def dechunk_http(payload: bytes) -> bytes:
    """Remove RFC 7230 chunked transfer framing: ``hex-size[;ext] CRLF
    data CRLF`` repeated, a ``0`` chunk, optional trailer header lines,
    final CRLF.  Strict: malformed size lines, misplaced CRLFs, or a
    missing terminator raise — chunk framing left in page text would
    poison every downstream text operator silently."""
    out = []
    pos = 0
    total = 0
    while True:
        nl = payload.find(CRLF, pos)
        if nl < 0:
            raise ValueError("http: truncated chunk-size line")
        size_tok = payload[pos:nl].split(b";", 1)[0].strip()
        # int(x, 16) is lenient ('-b', '0x5', '5_0' all parse) — a
        # negative size would wrap the slice below and leak framing
        # bytes into the payload (round-13 review); hex digits only
        if not size_tok or any(
            c not in b"0123456789abcdefABCDEF" for c in size_tok
        ):
            raise ValueError(f"http: bad chunk size {size_tok[:20]!r}")
        size = int(size_tok, 16)
        pos = nl + 2
        if size == 0:
            break
        total += size
        if total > MAX_MEMBER_BYTES:
            raise ValueError(
                f"http: chunked payload exceeds the {MAX_MEMBER_BYTES}-byte ceiling"
            )
        if pos + size + 2 > len(payload):
            raise ValueError("http: truncated chunk data")
        out.append(payload[pos : pos + size])
        if payload[pos + size : pos + size + 2] != CRLF:
            raise ValueError("http: chunk data not CRLF-terminated")
        pos += size + 2
    # optional trailer header lines, then the terminating CRLF
    while True:
        nl = payload.find(CRLF, pos)
        if nl < 0:
            raise ValueError("http: truncated chunk trailer")
        line = payload[pos:nl]
        pos = nl + 2
        if not line:
            break
        if b":" not in line:
            raise ValueError(f"http: malformed trailer line {line[:40]!r}")
    if pos != len(payload):
        raise ValueError("http: bytes after the chunked terminator")
    return b"".join(out)


def decode_content_encoding(payload: bytes, encoding: str) -> bytes:
    """Decode an HTTP ``Content-Encoding``: gzip/x-gzip and deflate
    (zlib-wrapped per the RFC, with the raw-deflate fallback real
    servers ship) via bounded chunked inflation; ``br`` (RFC 7932) and
    ``zstd`` (RFC 8878) via the libbrotli/libzstd ctypes bridges in
    :mod:`.native_codecs` — real crawl responses ship br constantly —
    with the same output ceiling; identity passes through.  Without
    the shared libraries the br/zstd branches raise (environmental
    availability, same contract as the libwebp bridge).

    A comma-separated list (RFC 9110 §8.4.1: encodings listed in the
    order APPLIED, e.g. ``gzip, br`` = gzip first then br) is undone in
    reverse order; each layer is bounded independently."""
    if "," in encoding:
        for layer in reversed(encoding.split(",")):
            payload = decode_content_encoding(payload, layer)
        return payload
    enc = encoding.strip().lower()
    if enc in ("", "identity"):
        return payload
    if enc == "br":
        if not native_codecs.brotli_available():
            raise ValueError(
                "http: content-encoding br requires the libbrotlidec "
                "shared library (no stdlib codec; library not found)"
            )
        return native_codecs.brotli_decompress_bounded(
            payload, MAX_MEMBER_BYTES, what="http: br"
        )
    if enc == "zstd":
        if not native_codecs.zstd_available():
            raise ValueError(
                "http: content-encoding zstd requires the libzstd "
                "shared library (no stdlib codec; library not found)"
            )
        return native_codecs.zstd_decompress_bounded(
            payload, MAX_MEMBER_BYTES, what="http: zstd"
        )
    if enc in ("gzip", "x-gzip", "deflate"):
        attempts = (
            [zlib.MAX_WBITS | 16] if enc != "deflate" else [zlib.MAX_WBITS, -zlib.MAX_WBITS]
        )
        last = None
        for wbits in attempts:
            d = zlib.decompressobj(wbits=wbits)
            parts, total = [], 0
            buf = payload
            try:
                while True:
                    chunk = d.decompress(buf, _INFLATE_CHUNK)
                    total += len(chunk)
                    if total > MAX_MEMBER_BYTES:
                        raise ValueError(
                            f"http: {enc} payload inflates past the "
                            f"{MAX_MEMBER_BYTES}-byte ceiling"
                        )
                    parts.append(chunk)
                    if d.eof:
                        break
                    if not d.unconsumed_tail:
                        raise ValueError(f"http: truncated {enc} payload")
                    buf = d.unconsumed_tail
                if d.unused_data:
                    raise ValueError(
                        f"http: trailing bytes after the {enc} payload"
                    )
            except ValueError as exc:
                if "ceiling" in str(exc):
                    raise  # a bomb is a bomb under either deflate framing
                last = exc
                continue
            except zlib.error as exc:
                last = exc
                continue
            return b"".join(parts)
        raise ValueError(f"http: corrupt {enc} payload: {last}")
    raise ValueError(f"http: unsupported content-encoding {encoding!r}")


def parse_http_response(body: bytes) -> tuple[int, str, bytes]:
    """Split a WARC ``response`` record body into ``(status,
    content_type, payload)`` per the HTTP/1.x message layout (status
    line, CRLF headers, blank line, payload) — with chunked transfer
    framing removed and gzip/deflate content-encodings decoded, so the
    payload is the actual page bytes (real crawl responses ship both).
    Strict: a malformed status line, header block, or chunk framing
    raises — the WET-extraction step must never hand a half-parsed page
    downstream as page text."""
    line_end = body.find(CRLF)
    if line_end < 0:
        raise ValueError("http: truncated status line")
    parts = body[:line_end].split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/") or not parts[1].isdigit():
        raise ValueError(f"http: bad status line {body[:line_end][:40]!r}")
    status = int(parts[1])
    content_type = ""
    transfer_encoding = ""
    content_encoding = ""
    pos = line_end + 2
    while True:
        nl = body.find(CRLF, pos)
        if nl < 0:
            raise ValueError("http: truncated header block")
        line = body[pos:nl]
        pos = nl + 2
        if not line:
            break
        if b":" not in line:
            raise ValueError(f"http: malformed header line {line[:40]!r}")
        k, v = line.split(b":", 1)
        key = k.strip().lower()
        if key == b"content-type":
            content_type = v.strip().decode("latin-1")
        elif key == b"transfer-encoding":
            # RFC 9110 §5.3: repeated lines join into one list — keeping
            # only the last would let 'TE: gzip' + 'TE: chunked' dechunk
            # and hand gzip bytes downstream as page text instead of
            # hitting the non-chunked-TE seam below (round-14 review)
            te = v.strip().decode("latin-1").lower()
            transfer_encoding = (
                f"{transfer_encoding}, {te}" if transfer_encoding else te
            )
        elif key == b"content-encoding":
            # RFC 9110 §5.3: repeated header lines are equivalent to one
            # comma-joined list — keeping only the last line would undo
            # one layer and hand compressed bytes downstream as text
            ce = v.strip().decode("latin-1")
            content_encoding = f"{content_encoding}, {ce}" if content_encoding else ce
    payload = body[pos:]
    if transfer_encoding and transfer_encoding != "identity":
        if transfer_encoding != "chunked":
            raise ValueError(
                f"http: transfer-encoding {transfer_encoding!r} is a declared seam"
            )
        payload = dechunk_http(payload)
    return status, content_type, decode_content_encoding(payload, content_encoding)


_BOMS = (
    (codecs.BOM_UTF32_LE, "utf-32-le"), (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"), (codecs.BOM_UTF16_BE, "utf-16-be"),
)
_CHARSET_PARAM_RE = re.compile(r"charset=[\"']?([\w.:-]+)", re.I)
_META_CHARSET_RE = re.compile(r"<meta[^>]+charset=[\"']?([\w.:-]+)", re.I)


def _usable_charset(name: str) -> str:
    """A declared charset is usable only if it resolves AND is a text
    encoding — stdlib resolves non-text codec names too (hex, zlib,
    rot13), which raise at decode time even with ``errors='replace'``."""
    try:
        if getattr(codecs.lookup(name), "_is_text_encoding", True):
            return name
    except LookupError:
        pass
    return ""


def decode_page_bytes(payload: bytes, content_type: str = "") -> str:
    """Decode page bytes to text the way WET extractors do: BOM first
    (UTF-8/16/32), then the ``charset=`` parameter of the Content-Type,
    then an ASCII scan of the first 1024 bytes for an HTML
    ``<meta charset>`` / http-equiv declaration, else UTF-8.  Decoding
    is ``errors="replace"`` — page BODIES are lenient by design (crawl
    text is dirty), while the WARC/HTTP FRAMING layers stay strict."""
    for bom, enc in _BOMS:
        if payload.startswith(bom):
            off = 0 if enc == "utf-8-sig" else len(bom)
            return payload[off:].decode(enc, "replace")
    charset = ""
    m = _CHARSET_PARAM_RE.search(content_type)
    if m:
        charset = _usable_charset(m.group(1))
    if not charset:
        # an unknown/non-text declared charset falls THROUGH to the meta
        # scan (round-13 review) rather than straight to the fallback
        head = payload[:1024].decode("latin-1", "replace")
        m = _META_CHARSET_RE.search(head)
        if m:
            charset = _usable_charset(m.group(1))
    try:
        return payload.decode(charset or "utf-8", "replace")
    except (LookupError, ValueError):
        # belt and braces for exotic codecs: page BODIES never raise
        return payload.decode("utf-8", "replace")


def _iter_files(batches):
    """Shared per-file iteration for all three readers: yields
    ``(path, content_bytes)`` one WARC file at a time — record/page rows
    must never accumulate across the files of an Arrow batch (the
    ``archives.py`` yield shape: at the real task shape of 3–4 × ~1 GB
    ``.warc.gz``, ≤4 GiB decompressed each, cross-file accumulation
    multiplies peak executor memory by files-per-task)."""
    for pdf in batches:
        for _, row in pdf.iterrows():
            yield row["path"], bytes(row["content"])


# ~2048 ×~50 KB crawl pages ≈ 100 MB per output frame — large enough to
# amortize Arrow serialization, small enough that a task's live output
# is one frame, not one FILE (round-15 probe: one-frame-per-file held
# the whole ~1 GB of page text + its Arrow copy per task; worker VmHWM
# read 8.2 GB at the 2-file shape, 2.4 GB after chunking)
_ROWS_PER_FRAME = 2048
# ... and a BYTE bound so the frame-size contract survives large rows:
# 2048 multi-MB archive members would be a multi-GB "frame" if only the
# row count gated the flush (round-15 review)
_BYTES_PER_FRAME = 64 << 20


def _frames(
    row_iter,
    columns,
    rows_per_frame: int = _ROWS_PER_FRAME,
    bytes_per_frame: int = _BYTES_PER_FRAME,
):
    """Bounded-size output frames for the row generators: flush every
    ``rows_per_frame`` rows OR once the accumulated payload bytes
    (``len`` of every str/bytes field) pass ``bytes_per_frame`` —
    whichever comes first, so the bound holds for many small rows AND
    few huge ones.  Callers invoke this PER FILE (frames never span
    files, preserving the round-14 no-cross-file-accumulation rule), so
    executor peak output is max(frame, one record) instead of the
    file's whole row set."""
    import pandas as pd

    rows = []
    nbytes = 0
    for r in row_iter:
        rows.append(r)
        nbytes += sum(
            len(v) for v in r if isinstance(v, (str, bytes, bytearray, memoryview))
        )
        if len(rows) >= rows_per_frame or nbytes >= bytes_per_frame:
            yield pd.DataFrame(rows, columns=columns)
            rows = []
            nbytes = 0
    if rows:
        yield pd.DataFrame(rows, columns=columns)


def _http_responses_in_file(path, content: bytes):
    """Shared WET-side walk for the response-shaped readers, one file at
    a time: WARC record iteration + response filter + strict HTTP split,
    yielding ``(path, record, status, content_type, payload)``.

    A record is parsed as HTTP when its WARC Content-Type declares
    ``application/http``, or when that header is absent/generic
    (``application/octet-stream``, the field is only recommended by the
    spec and minimal writers omit it) and the body starts with an HTTP
    status line.  Records DECLARING another type are skipped — WARC
    ``response`` records are not necessarily HTTP (DNS captures ship as
    ``text/dns`` in Heritrix-lineage crawls), and one of those must not
    kill the file's whole task — as are unlabeled non-HTTP bodies,
    which cannot be split."""
    for rec in iter_warc_records(content):
        if rec["warc_type"] != "response":
            continue
        ct = rec["content_type"].lower()
        declared = ct.startswith("application/http")
        if not declared and not (
            ct in ("", "application/octet-stream") and rec["body"][:5] == b"HTTP/"
        ):
            continue
        try:
            status, ctype, payload = parse_http_response(rec["body"])
        except ValueError:
            if declared:
                raise  # a labeled HTTP record that does not parse is corrupt
            continue  # the sniff was a guess; a non-parsing guess is skipped
        yield path, rec, status, ctype, payload


PAGES_SCHEMA = (
    "path string, offset bigint, record_id string, target_uri string, "
    "http_status int, content_type string, text string"
)


_html_to_text = None


def page_text(payload: bytes, ctype: str) -> str | None:
    """The WET text step shared by ``read_warc_pages`` and the ``warc``
    DataSource's pages view: charset-aware byte decode, ``html_to_text``
    for HTML content types, pass-through for other text/*, NULL for
    non-text payloads.  The html_to_text binding is cached after the
    first call: this runs per RESPONSE ROW on the WET hot path, and
    operators.text pulls pyspark.sql eagerly — neither per-row import
    machinery nor an unconditional module-level pull is right for this
    otherwise pure-bytes module."""
    global _html_to_text
    if _html_to_text is None:
        from ..operators.text import html_to_text

        _html_to_text = html_to_text
    base = ctype.split(";", 1)[0].strip().lower()
    if base in ("text/html", "application/xhtml+xml"):
        return _html_to_text(decode_page_bytes(payload, ctype))
    if base.startswith("text/"):
        return decode_page_bytes(payload, ctype)
    return None


def read_warc_pages(spark, path: str, pattern: str = "*.warc*"):
    """The full WET shape in ONE Arrow pass: WARC record walk → response
    filter → strict HTTP split (dechunk + content-encoding decode) →
    charset-aware byte decode → ``html_to_text`` for HTML content types
    (other text/* payloads pass through as decoded text; non-text
    payloads yield NULL text).  Page bytes never cross the Python
    boundary twice."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [
            "path", "offset", "record_id", "target_uri",
            "http_status", "content_type", "text",
        ]
        for fpath, content in _iter_files(batches):
            # bounded frames, flushed within the file: page rows never
            # accumulate across files NOR to a whole file's size
            yield from _frames(
                (
                    (path_, r["offset"], r["record_id"], r["target_uri"],
                     status, ctype, page_text(payload, ctype))
                    for path_, r, status, ctype, payload in
                    _http_responses_in_file(fpath, content)
                ),
                cols,
            )

    return _scan_files(spark, path, pattern).mapInPandas(
        extract, schema=PAGES_SCHEMA
    )


WARC_SCHEMA = (
    "path string, offset bigint, warc_type string, record_id string, "
    "target_uri string, content_type string, content_length bigint, body binary"
)


def _scan_files(spark, path: str, pattern: str):
    """Shared ``binaryFile`` scan for both readers: one (path, content)
    row per WARC file — the format's natural parallel unit."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
        .select("path", "content")
    )


def read_warc(spark, path: str, pattern: str = "*.warc*"):
    """WARC file scan → one DataFrame row per record.

    ``binaryFile`` brings each file into one task (the format's natural
    parallel unit — see module docstring); the record explosion runs in
    ``mapInPandas`` so bodies never leave the Arrow batch until the
    caller projects them.  Filter/projection on the metadata columns is
    Catalyst-side from here on."""
    cols = [
        "path", "offset", "warc_type", "record_id",
        "target_uri", "content_type", "content_length", "body",
    ]

    def explode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for fpath, content in _iter_files(batches):
            # bounded frames, flushed within the file (see _frames):
            # record bodies never accumulate across files nor to a
            # whole file's size
            yield from _frames(
                (
                    (fpath, *[rec[c] for c in cols[1:]])
                    for rec in iter_warc_records(content)
                ),
                cols,
            )

    return _scan_files(spark, path, pattern).mapInPandas(explode, schema=WARC_SCHEMA)


RESPONSES_SCHEMA = (
    "path string, offset bigint, record_id string, target_uri string, "
    "http_status int, content_type string, payload binary"
)


def read_warc_responses(spark, path: str, pattern: str = "*.warc*"):
    """The WET-extraction shape, fused into ONE Arrow pass: WARC record
    explosion + ``response``-type filter + HTTP split, so page payloads
    cross the Python boundary exactly once.  Non-response and non-HTTP
    records (request/metadata/warcinfo, DNS captures) are dropped
    inside the batch.  Shares the scan, record walk, and HTTP split
    with :func:`read_warc` / :func:`read_warc_pages`."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [
            "path", "offset", "record_id", "target_uri",
            "http_status", "content_type", "payload",
        ]
        for fpath, content in _iter_files(batches):
            # bounded frames, flushed within the file: payloads never
            # accumulate across files nor to a whole file's size
            yield from _frames(
                (
                    (path, r["offset"], r["record_id"], r["target_uri"],
                     status, ctype, payload)
                    for path, r, status, ctype, payload in
                    _http_responses_in_file(fpath, content)
                ),
                cols,
            )

    return _scan_files(spark, path, pattern).mapInPandas(
        extract, schema=RESPONSES_SCHEMA
    )
