"""WARC source (sources/warc.py): record layer + Spark scan.

The writer and parser are independent paths over the public ISO 28500
framing; the Spark test drives the binaryFile → mapInPandas explosion
end to end on a deterministic two-file fixture.
"""

from __future__ import annotations

import os
import zlib

import pytest

from query_skyline_qos_flink_spark.sources import warc


def _rec(i: int, gz: bool) -> bytes:
    return warc.write_warc_record(
        "response" if i % 2 == 0 else "request",
        f"body-{i}".encode() * (i + 1),
        record_id=f"<urn:uuid:{i:04d}>",
        target_uri=f"https://example.org/{i}",
        content_type="text/html",
        gzip_member=gz,
    )


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip_multi_record(gz):
    blob = b"".join(_rec(i, gz) for i in range(5))
    recs = warc.parse_warc_records(blob)
    assert len(recs) == 5
    for i, r in enumerate(recs):
        assert r["warc_type"] == ("response" if i % 2 == 0 else "request")
        assert r["record_id"] == f"<urn:uuid:{i:04d}>"
        assert r["target_uri"] == f"https://example.org/{i}"
        assert r["body"] == f"body-{i}".encode() * (i + 1)
        assert r["content_length"] == len(r["body"])
    # offsets are the resumable split points: strictly increasing, first 0
    offs = [r["offset"] for r in recs]
    assert offs[0] == 0 and offs == sorted(set(offs))
    if gz:
        # each gzip member's offset points at a real member boundary
        for o in offs:
            assert blob[o : o + 2] == b"\x1f\x8b"


def test_warc_strictness():
    good = _rec(0, False)
    with pytest.raises(ValueError, match="bad version line"):
        warc.parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="shorter than Content-Length"):
        warc.parse_warc_records(good[:-6])
    with pytest.raises(ValueError, match="terminator"):
        warc.parse_warc_records(good[:-2])
    with pytest.raises(ValueError, match="non-numeric Content-Length"):
        warc.parse_warc_records(good.replace(b"Content-Length: 6", b"Content-Length: six"))
    with pytest.raises(ValueError, match="without Content-Length"):
        warc.parse_warc_records(good.replace(b"Content-Length", b"X-Length"))
    with pytest.raises(ValueError, match="corrupt gzip|truncated gzip"):
        bad = bytearray(_rec(0, True))
        bad[12] ^= 0xFF
        warc.parse_warc_records(bytes(bad))
    with pytest.raises(ValueError, match="truncated gzip"):
        warc.parse_warc_records(_rec(0, True)[:-4])
    # trailing garbage after a record is a broken stream, not extra data
    with pytest.raises(ValueError, match="version line|truncated"):
        warc.parse_warc_records(good + b"junk")


def test_warc_gzip_bomb_ceilings(monkeypatch):
    """Round-12 ADVICE: inflation is chunked and bounded — a crafted
    .warc.gz bomb raises at the ceiling instead of materializing."""
    import zlib

    # a legitimate large-ish record passes under the real ceilings
    big = warc.write_warc_record("resource", b"A" * 300_000, "<urn:uuid:big>")
    assert warc.parse_warc_records(big)[0]["content_length"] == 300_000

    monkeypatch.setattr(warc, "MAX_MEMBER_BYTES", 100_000)
    with pytest.raises(ValueError, match="member ceiling"):
        warc.parse_warc_records(big)

    # per-file ceiling across many members, each under the member bound
    monkeypatch.setattr(warc, "MAX_MEMBER_BYTES", 1_000_000)
    monkeypatch.setattr(warc, "MAX_FILE_BYTES", 500_000)
    blob = b"".join(
        warc.write_warc_record("resource", b"B" * 200_000, f"<urn:uuid:{i}>")
        for i in range(4)
    )
    with pytest.raises(ValueError, match="per-file ceiling"):
        warc.parse_warc_records(blob)

    # a raw (non-warc) zero bomb also hits the guard, not memory
    monkeypatch.setattr(warc, "MAX_MEMBER_BYTES", 1_000_000)
    monkeypatch.setattr(warc, "MAX_FILE_BYTES", 4 << 30)
    co = zlib.compressobj(9, zlib.DEFLATED, zlib.MAX_WBITS | 16)
    bomb = co.compress(bytes(50_000_000)) + co.flush()
    assert len(bomb) < 100_000  # tiny on the wire
    with pytest.raises(ValueError, match="member ceiling"):
        warc.parse_warc_records(bomb)


def test_http_framing_roundtrip_property():
    """Hypothesis: any payload, chunk-split at arbitrary boundaries and
    wrapped in any supported content-encoding, round-trips through
    parse_http_response byte-exactly."""
    import gzip
    import zlib

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        payload=st.binary(min_size=0, max_size=4000),
        cuts=st.lists(st.integers(min_value=1, max_value=4000), max_size=4),
        chunked=st.booleans(),
        ce=st.sampled_from(["", "gzip", "deflate", "deflate-raw"]),
    )
    def run(payload, cuts, chunked, ce):
        if ce == "gzip":
            body, ce_hdr = gzip.compress(payload), "gzip"
        elif ce == "deflate":
            body, ce_hdr = zlib.compress(payload), "deflate"
        elif ce == "deflate-raw":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            body, ce_hdr = co.compress(payload) + co.flush(), "deflate"
        else:
            body, ce_hdr = payload, ""
        headers = b"HTTP/1.1 200 OK\r\nContent-Type: x/y\r\n"
        if ce_hdr:
            headers += f"Content-Encoding: {ce_hdr}\r\n".encode()
        if chunked:
            pieces, prev = [], 0
            for c in sorted({min(c, len(body)) for c in cuts}):
                if c > prev:
                    pieces.append(body[prev:c])
                    prev = c
            pieces.append(body[prev:])
            framed = b"".join(
                f"{len(p):x}\r\n".encode() + p + b"\r\n" for p in pieces if p
            ) + b"0\r\n\r\n"
            headers += b"Transfer-Encoding: chunked\r\n"
            body = framed
        status, ctype, got = warc.parse_http_response(headers + b"\r\n" + body)
        assert (status, ctype, got) == (200, "x/y", payload)

    run()


def test_parse_http_response():
    body = b"HTTP/1.1 200 OK\r\nServer: x\r\nContent-Type: text/html; charset=utf-8\r\n\r\n<html>page</html>"
    status, ctype, payload = warc.parse_http_response(body)
    assert (status, ctype, payload) == (200, "text/html; charset=utf-8", b"<html>page</html>")
    # empty payload + no content-type
    assert warc.parse_http_response(b"HTTP/1.0 404 NF\r\n\r\n") == (404, "", b"")
    for bad in (
        b"not http at all",
        b"HTTP/1.1 OK\r\n\r\n",  # non-numeric status
        b"HTTP/1.1 200 OK\r\nheader-without-colon\r\n\r\n",
        b"HTTP/1.1 200 OK\r\nTruncated: yes",
    ):
        with pytest.raises(ValueError, match="http:"):
            warc.parse_http_response(bad)


def test_http_chunked_and_content_encoding(monkeypatch):
    """Real crawl responses ship chunked transfer framing and gzip/
    deflate content-encodings; the WET split must hand back the ACTUAL
    page bytes, strictly."""
    import gzip
    import zlib

    page = b"<html>" + b"x" * 5000 + b"</html>"
    # chunked framing (with a chunk extension and a trailer header)
    chunks = b""
    for i in range(0, len(page), 1024):
        piece = page[i : i + 1024]
        chunks += f"{len(piece):x};ext=1\r\n".encode() + piece + b"\r\n"
    chunked = chunks + b"0\r\nX-Trailer: t\r\n\r\n"
    body = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + chunked
    assert warc.parse_http_response(body)[2] == page

    # gzip and deflate content-encodings (and the raw-deflate fallback)
    body = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + gzip.compress(page)
    assert warc.parse_http_response(body)[2] == page
    body = b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + zlib.compress(page)
    assert warc.parse_http_response(body)[2] == page
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw = co.compress(page) + co.flush()
    body = b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + raw
    assert warc.parse_http_response(body)[2] == page

    # chunked + gzip compose (TE removed first, then CE decoded)
    gz = gzip.compress(page)
    framed = f"{len(gz):x}\r\n".encode() + gz + b"\r\n0\r\n\r\n"
    body = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + framed
    )
    assert warc.parse_http_response(body)[2] == page

    # strictness: malformed framing raises, never passes through
    for bad_payload, msg in (
        (b"zz\r\nxx\r\n0\r\n\r\n", "bad chunk size"),
        (b"5\r\nabc", "truncated chunk data"),
        (b"3\r\nabcXX0\r\n\r\n", "not CRLF-terminated"),
        (b"3\r\nabc\r\n0\r\n\r\nJUNK", "after the chunked terminator"),
    ):
        with pytest.raises(ValueError, match=msg):
            warc.parse_http_response(
                b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + bad_payload
            )
    with pytest.raises(ValueError, match="corrupt gzip"):
        warc.parse_http_response(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnotgzip"
        )
    # br decodes through the libbrotli bridge (round 14); garbage bytes
    # are a truncated/corrupt stream, and the token is only a hard error
    # when the library is absent
    import query_skyline_qos_flink_spark.sources.native_codecs as nc

    br_err = "http: br: .*(corrupt|truncated)" if nc.brotli_available() else "libbrotlidec"
    with pytest.raises(ValueError, match=br_err):
        warc.parse_http_response(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nxxxx"
        )
    with pytest.raises(ValueError, match="unsupported content-encoding"):
        warc.parse_http_response(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: compress\r\n\r\nxxxx"
        )
    # a content-encoding bomb hits the ceiling
    big = gzip.compress(bytes(60_000_000))
    body = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + big
    monkeypatch.setattr(warc, "MAX_MEMBER_BYTES", 1_000_000)
    with pytest.raises(ValueError, match="ceiling"):
        warc.parse_http_response(body)

    # negative / prefixed / underscored chunk sizes are malformed, not
    # python-int-lenient (round-13 review: '-b' wrapped the slice and
    # leaked framing bytes into the payload)
    for tok in (b"-b", b"0x5", b"5_0", b"+5", b""):
        with pytest.raises(ValueError, match="bad chunk size"):
            warc.dechunk_http(tok + b"\r\nZZZZZZ\r\n\r\n0\r\n\r\n")


def test_read_warc_responses_fused(spark, tmp_path):
    d = str(tmp_path)
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhello page"
    )
    blob = warc.write_warc_record(
        "request", b"GET / HTTP/1.1\r\n\r\n", record_id="<urn:req:1>"
    ) + warc.write_warc_record(
        "response", http, record_id="<urn:resp:1>",
        target_uri="https://example.org/p",
        content_type="application/http;msgtype=response",
    )
    with open(os.path.join(d, "f.warc.gz"), "wb") as f:
        f.write(blob)
    rows = warc.read_warc_responses(spark, d).collect()
    assert len(rows) == 1  # the request record is dropped inside the batch
    r = rows[0]
    assert r["http_status"] == 200 and r["content_type"] == "text/plain"
    assert bytes(r["payload"]) == b"hello page"
    assert r["record_id"] == "<urn:resp:1>"


def test_read_warc_spark_scan(spark, tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "a.warc.gz"), "wb") as f:
        f.write(b"".join(_rec(i, True) for i in range(4)))
    with open(os.path.join(d, "b.warc"), "wb") as f:
        f.write(b"".join(_rec(i, False) for i in range(3)))
    with open(os.path.join(d, "ignored.txt"), "wb") as f:
        f.write(b"not a warc")
    df = warc.read_warc(spark, d)
    rows = df.collect()
    assert len(rows) == 7
    by_file = {}
    for r in rows:
        by_file.setdefault(os.path.basename(r["path"]), []).append(r)
    assert len(by_file["a.warc.gz"]) == 4 and len(by_file["b.warc"]) == 3
    # metadata filter stays Catalyst-side and projects without bodies
    n_resp = df.where(df.warc_type == "response").select("target_uri").count()
    assert n_resp == 2 + 2  # i in {0,2} per file shape
    got = sorted(
        (os.path.basename(r["path"]), r["record_id"], bytes(r["body"])) for r in rows
    )
    want = sorted(
        [("a.warc.gz", f"<urn:uuid:{i:04d}>", f"body-{i}".encode() * (i + 1)) for i in range(4)]
        + [("b.warc", f"<urn:uuid:{i:04d}>", f"body-{i}".encode() * (i + 1)) for i in range(3)]
    )
    assert got == want


# ---------------------------------------------------- HTML -> text (WET) ----


def test_decode_page_bytes_charsets():
    """BOM > Content-Type charset > meta charset > utf-8 fallback, all
    errors-replace (page bodies are lenient; framing is strict)."""
    import codecs

    assert warc.decode_page_bytes("héllo".encode("utf-8")) == "héllo"
    assert warc.decode_page_bytes(codecs.BOM_UTF8 + "héllo".encode("utf-8")) == "héllo"
    assert warc.decode_page_bytes(
        codecs.BOM_UTF16_LE + "héllo".encode("utf-16-le")
    ) == "héllo"
    assert warc.decode_page_bytes(
        "héllo".encode("latin-1"), "text/html; charset=ISO-8859-1"
    ) == "héllo"
    # meta charset wins over the utf-8 fallback
    page = b'<html><meta charset="iso-8859-1"><body>caf\xe9</body></html>'
    assert "café" in warc.decode_page_bytes(page)
    # unknown charset name degrades to utf-8/replace, never raises
    assert warc.decode_page_bytes(b"abc", "text/html; charset=not-a-charset") == "abc"
    # invalid utf-8 bytes replace, never raise
    assert "�" in warc.decode_page_bytes(b"\xff\xfe\xff bad")
    # a declared charset that is a stdlib NON-TEXT codec (hex, zlib,
    # rot13 resolve via codecs.lookup but raise at decode) degrades to
    # utf-8/replace instead of killing the task (round-13 review)
    for cs in ("hex", "zlib", "base64", "rot13"):
        assert warc.decode_page_bytes(b"abc", f"text/html; charset={cs}") == "abc"
        assert "abc" in warc.decode_page_bytes(
            b'<meta charset="' + cs.encode() + b'">abc'
        )
    # ...and a bogus declared charset falls THROUGH to a valid meta
    # charset instead of straight to utf-8/replace (round-13 review)
    page = b'<meta charset="windows-1251">' + "привет".encode("cp1251")
    assert "привет" in warc.decode_page_bytes(page, "text/html; charset=hex")
    assert "привет" in warc.decode_page_bytes(page, "text/html; charset=no-such")


def test_read_warc_pages_fused(spark, tmp_path):
    """read_warc_pages: response filter + HTTP split + charset decode +
    html_to_text in one pass; non-text payloads yield NULL text."""
    d = str(tmp_path)
    html = '<html><body><h1>T</h1><p>Olá page</p></body></html>'
    blob = warc.write_warc_record(
        "response",
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        + html.encode("utf-8"),
        record_id="<urn:1>", target_uri="https://x/1",
        content_type="application/http;msgtype=response",
    )
    blob += warc.write_warc_record(
        "response",
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nplain body",
        record_id="<urn:2>", target_uri="https://x/2",
        content_type="application/http;msgtype=response",
    )
    blob += warc.write_warc_record(
        "response",
        b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n\x89PNG...",
        record_id="<urn:3>", target_uri="https://x/3",
        content_type="application/http;msgtype=response",
    )
    blob += warc.write_warc_record(
        "request", b"GET / HTTP/1.1\r\n\r\n", record_id="<urn:req>",
    )
    # a NON-HTTP response record (DNS capture, Heritrix-lineage crawls):
    # must be SKIPPED, not parsed as an HTTP message (no status line)
    blob += warc.write_warc_record(
        "response",
        b"20260816 x.example. IN A 192.0.2.1\n",
        record_id="<urn:dns>", target_uri="dns:x.example",
        content_type="text/dns",
    )
    # an UNLABELED response (generic default content type) whose body IS
    # an HTTP message: sniffed and parsed (the WARC Content-Type header
    # is only recommended; minimal writers omit it)
    blob += warc.write_warc_record(
        "response",
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nsniffed",
        record_id="<urn:4>", target_uri="https://x/4",
    )
    # an unlabeled body that merely STARTS with 'HTTP/' but is not a
    # parseable message (LF-only headers): the sniff was a guess, so it
    # is skipped — it must NOT kill the file's task (round-13 review)
    blob += warc.write_warc_record(
        "response",
        b"HTTP/2 is the successor to HTTP/1.1, says this text blob",
        record_id="<urn:notes>", target_uri="https://x/notes",
    )
    with open(os.path.join(d, "p.warc.gz"), "wb") as f:
        f.write(blob)
    rows = {r["record_id"]: r for r in warc.read_warc_pages(spark, d).collect()}
    assert set(rows) == {"<urn:1>", "<urn:2>", "<urn:3>", "<urn:4>"}
    assert rows["<urn:4>"]["text"] == "sniffed"
    resp_ids = {r["record_id"] for r in warc.read_warc_responses(spark, d).collect()}
    assert resp_ids == {"<urn:1>", "<urn:2>", "<urn:3>", "<urn:4>"}
    assert rows["<urn:1>"]["text"] == "T\nOlá page"
    assert rows["<urn:2>"]["text"] == "plain body"
    assert rows["<urn:3>"]["text"] is None


def test_html_to_text_visible_content():
    from query_skyline_qos_flink_spark.operators.text import html_to_text

    html = (
        "<html><head><title>T</title><style>p{color:red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><h1>Head&amp;line</h1><p>first <b>bold</b> para</p>"
        "<ul><li>one</li><li>two&#33;</li></ul>"
        "<noscript>hidden</noscript>"
        "<!-- comment --><div>  spaced   out  </div></body></html>"
    )
    got = html_to_text(html)
    assert got == "T\nHead&line\nfirst bold para\none\ntwo!\nspaced out"
    # malformed crawl HTML stays lenient: unclosed tags still yield text
    assert html_to_text("<p>open <b>bold") == "open bold"
    # script is a CDATA element per the stdlib parser (browser behavior):
    # the inner "<script>" is literal data and the FIRST </script> closes
    # it, so the stray x and end tag surface — non-nesting is correct
    assert html_to_text("<script><script></script>x</script>after") == "xafter"
    # noscript parses normally, so the depth counter really nests there
    assert html_to_text("<noscript><noscript></noscript>x</noscript>after") == "after"
    assert html_to_text("") == ""


def test_extract_html_text_spark(spark):
    from query_skyline_qos_flink_spark.operators.text import extract_html_text

    df = spark.createDataFrame(
        [(1, "<p>alpha</p><script>no</script>"), (2, None), (3, "plain")],
        "doc_id bigint, html string",
    )
    rows = {r["doc_id"]: r["text"] for r in extract_html_text(df).collect()}
    assert rows == {1: "alpha", 2: None, 3: "plain"}


def _zrec(i, codec="zstd", body=b"hi"):
    http = (
        b"HTTP/1.1 200 X\r\nContent-Type: text/plain\r\nContent-Length: "
        + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    return warc.write_warc_record(
        "response", http, record_id=f"<urn:doc:{i}>",
        target_uri=f"https://x/{i}",
        content_type="application/http;msgtype=response", codec=codec,
    )


zstd_only = pytest.mark.skipif(
    not __import__(
        "query_skyline_qos_flink_spark.sources.native_codecs", fromlist=["x"]
    ).zstd_available(),
    reason="no libzstd",
)


@zstd_only
def test_warc_zst_frame_per_record():
    """IIPC .warc.zst: one zstd frame per record, frame offsets are the
    split points; whole-file single-frame packaging also parses."""
    from query_skyline_qos_flink_spark.sources import native_codecs as nc

    blob = b"".join(_zrec(i) for i in range(5))
    recs = warc.parse_warc_records(blob)
    assert [r["record_id"] for r in recs] == [f"<urn:doc:{i}>" for i in range(5)]
    offs = [r["offset"] for r in recs]
    assert offs == sorted(offs) and len(set(offs)) == 5 and offs[0] == 0
    # whole-file single frame (plain records, zstd'd as one)
    plain = b"".join(_zrec(i, codec="plain") for i in range(3))
    assert len(warc.parse_warc_records(nc.zstd_compress(plain))) == 3
    # truncation and trailing garbage raise
    with pytest.raises(ValueError, match="truncated"):
        warc.parse_warc_records(blob[:-3])
    with pytest.raises(ValueError, match="trailing"):
        warc.parse_warc_records(blob + b"xx")


@zstd_only
def test_warc_zst_dictionary_frame():
    """The leading 5D 2A 4D 18 skippable frame carries the dictionary
    (raw or itself zstd-compressed); frames compressed against it MUST
    decode with it and MUST fail without it (proving the dictionary is
    load-bearing, not decorative)."""
    from query_skyline_qos_flink_spark.sources import native_codecs as nc

    dict_data = (b"Lorem ipsum dolor sit amet, consectetur adipiscing " * 30)[:1200]
    body = dict_data[50:900]
    raw = _zrec(0, codec="plain", body=body)
    frame = nc.zstd_compress_with_dict(raw, dict_data)
    skip = b"\x5d\x2a\x4d\x18" + len(dict_data).to_bytes(4, "little") + dict_data
    recs = warc.parse_warc_records(skip + frame)
    assert len(recs) == 1 and body in recs[0]["body"]
    # compressed-dictionary variant
    cdict = nc.zstd_compress(dict_data)
    skip_c = b"\x5d\x2a\x4d\x18" + len(cdict).to_bytes(4, "little") + cdict
    assert len(warc.parse_warc_records(skip_c + frame)) == 1
    # the dictionary is load-bearing
    with pytest.raises(ValueError, match="corrupt"):
        warc.parse_warc_records(frame)
    # a truncated skippable frame raises
    with pytest.raises(ValueError, match="skippable"):
        warc.parse_warc_records(skip[: len(skip) - 4] )


@zstd_only
def test_read_warc_zst_spark_scan(spark, tmp_path):
    blob = b"".join(_zrec(i) for i in range(8))
    (tmp_path / "a.warc.zst").write_bytes(blob)
    got = warc.read_warc_responses(spark, str(tmp_path), "*.warc.zst").collect()
    assert sorted(r.record_id for r in got) == [f"<urn:doc:{i}>" for i in range(8)]
    assert all(r.http_status == 200 for r in got)


def test_content_encoding_list_decodes_in_reverse():
    """RFC 9110 §8.4.1: a comma-separated Content-Encoding lists the
    codings in application order, so decoding undoes them in reverse;
    each layer keeps its own bound."""
    import gzip
    import zlib

    page = b"layered page " * 200
    # applied gzip then deflate -> header "gzip, deflate"
    layered = zlib.compress(gzip.compress(page))
    assert warc.decode_content_encoding(layered, "gzip, deflate") == page
    assert warc.decode_content_encoding(page, "identity, identity") == page
    from query_skyline_qos_flink_spark.sources import native_codecs as nc

    if nc.brotli_available() and nc.brotli_encoder_available():
        layered = gzip.compress(nc.brotli_compress(page))
        assert warc.decode_content_encoding(layered, "br, gzip") == page
        # wrong order is corrupt, not silently wrong
        with pytest.raises(ValueError):
            warc.decode_content_encoding(layered, "gzip, br")
        # full response with chunked TE + br CE together (the real-crawl
        # combination x_warc_extract's mode-4 class drives)
        blob = nc.brotli_compress(page)
        framed = b"".join(
            f"{len(blob[i:i+100]):x}\r\n".encode() + blob[i:i+100] + b"\r\n"
            for i in range(0, len(blob), 100)
        ) + b"0\r\n\r\n"
        body = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n" + framed
        )
        assert warc.parse_http_response(body)[2] == page


@zstd_only
def test_warc_zst_arbitrary_frame_grouping_property():
    """Hypothesis: any record list, partitioned into zstd frames at any
    boundaries (wget2 groups several records per frame by size), parses
    back to the same records with frame offsets as split points."""
    from hypothesis import given, settings, strategies as st

    from query_skyline_qos_flink_spark.sources import native_codecs as nc

    @settings(max_examples=30, deadline=None)
    @given(
        bodies=st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=8),
        cuts=st.lists(st.integers(min_value=1, max_value=7), max_size=3),
        with_dict=st.booleans(),
    )
    def run(bodies, cuts, with_dict):
        recs = [
            warc.write_warc_record(
                "resource", body, record_id=f"<urn:r:{i}>", codec="plain"
            )
            for i, body in enumerate(bodies)
        ]
        # partition record list into contiguous frame groups
        bounds = sorted({min(c, len(recs)) for c in cuts})
        groups, prev = [], 0
        for c in bounds:
            if c > prev:
                groups.append(recs[prev:c])
                prev = c
        groups.append(recs[prev:])
        dict_data = b"shared warc dictionary " * 20 if with_dict else None
        blob = b""
        if dict_data:
            blob += (
                b"\x5d\x2a\x4d\x18" + len(dict_data).to_bytes(4, "little") + dict_data
            )
        for g in groups:
            if not g:
                continue
            raw = b"".join(g)
            blob += (
                nc.zstd_compress_with_dict(raw, dict_data)
                if dict_data
                else nc.zstd_compress(raw)
            )
        got = warc.parse_warc_records(blob)
        assert [r["record_id"] for r in got] == [f"<urn:r:{i}>" for i in range(len(bodies))]
        assert [r["body"] for r in got] == list(bodies)
        offs = [r["offset"] for r in got]
        assert offs == sorted(offs)

    run()


def test_repeated_content_encoding_headers_join():
    """RFC 9110 §5.3: repeated Content-Encoding lines are one list —
    keeping only the last line hands compressed bytes downstream."""
    import gzip

    from query_skyline_qos_flink_spark.sources import native_codecs as nc

    if not (nc.brotli_available() and nc.brotli_encoder_available()):
        pytest.skip("no libbrotli")
    page = b"double encoded page " * 50
    layered = gzip.compress(nc.brotli_compress(page))  # br applied, then gzip
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + layered
    )
    assert warc.parse_http_response(body)[2] == page


def test_frames_flush_on_bytes_not_just_rows():
    """_frames must bound the FRAME PAYLOAD, not just the row count: a
    handful of multi-MB members would otherwise build a multi-GB frame
    (round-15 review)."""
    rows = [("p", i, b"x" * (20 << 20)) for i in range(10)]  # 10 x 20 MB
    frames = list(warc._frames(iter(rows), ["a", "b", "c"]))
    assert len(frames) >= 3  # 64 MB bound -> ~4 rows per frame
    assert sum(len(f) for f in frames) == 10
    # small rows still flush on the row bound
    small = [("p", i, "t") for i in range(5000)]
    frames = list(warc._frames(iter(small), ["a", "b", "c"]))
    assert [len(f) for f in frames] == [2048, 2048, 904]
    # bytearray bodies (compressed tar envelopes return bytearray slices
    # since r15) must count toward the byte bound too — round-15 review
    # pass 4 reproduced the counter silently skipping them
    ba = [("p", i, bytearray(20 << 20)) for i in range(10)]
    frames = list(warc._frames(iter(ba), ["a", "b", "c"]))
    assert len(frames) >= 3
    assert sum(len(f) for f in frames) == 10
