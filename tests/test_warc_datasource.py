"""WARC Python DataSource (sources/warc_datasource.py): format
registration, the three views, per-file partitioning, and parity with
the binaryFile readers over identical fixture bytes."""

from __future__ import annotations

import pytest

from query_skyline_qos_flink_spark.sources import warc, warc_datasource


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    warc_datasource.register(spark)


def _write_fixture(tmp_path, n_files=3, recs_per_file=4):
    for f in range(n_files):
        blob = b""
        for i in range(recs_per_file):
            doc = f * 100 + i
            body = f"<html><body>page {doc}</body></html>".encode()
            http = (
                b"HTTP/1.1 200 X\r\nContent-Type: text/html\r\nContent-Length: "
                + str(len(body)).encode() + b"\r\n\r\n" + body
            )
            blob += warc.write_warc_record(
                "request", b"GET / HTTP/1.1\r\n\r\n", record_id=f"<urn:req:{doc}>"
            )
            blob += warc.write_warc_record(
                "response", http, record_id=f"<urn:doc:{doc}>",
                target_uri=f"https://x/{doc}",
                content_type="application/http;msgtype=response",
            )
        (tmp_path / f"part-{f}.warc.gz").write_bytes(blob)
    return str(tmp_path)


def test_records_view_and_partitioning(spark, tmp_path):
    d = _write_fixture(tmp_path)
    df = spark.read.format("warc").option("path", d).load()
    assert df.count() == 3 * 4 * 2  # requests + responses
    assert df.rdd.getNumPartitions() == 3  # one partition per file
    assert set(df.columns) == {
        "path", "offset", "warc_type", "record_id", "target_uri",
        "content_type", "content_length", "body",
    }


def test_responses_and_pages_views(spark, tmp_path):
    d = _write_fixture(tmp_path)
    resp = (
        spark.read.format("warc").option("path", d)
        .option("view", "responses").load()
    )
    rows = resp.collect()
    assert len(rows) == 12 and all(r.http_status == 200 for r in rows)
    pages = (
        spark.read.format("warc").option("path", d)
        .option("view", "pages").load()
    )
    got = {r.record_id: r.text for r in pages.collect()}
    assert got["<urn:doc:102>"] == "page 102"  # html_to_text ran


def test_parity_with_binaryfile_readers(spark, tmp_path):
    d = _write_fixture(tmp_path)
    via_ds = (
        spark.read.format("warc").option("path", d).option("view", "pages")
        .load().select("record_id", "http_status", "text")
    )
    via_bf = warc.read_warc_pages(spark, d).select(
        "record_id", "http_status", "text"
    )
    assert sorted(map(tuple, via_ds.collect())) == sorted(map(tuple, via_bf.collect()))


def test_single_file_and_errors(spark, tmp_path):
    d = _write_fixture(tmp_path, n_files=1)
    one = str(tmp_path / "part-0.warc.gz")
    df = spark.read.format("warc").option("path", one).load()
    assert df.count() == 8
    with pytest.raises(Exception, match="view"):
        spark.read.format("warc").option("path", d).option("view", "bogus").load()
    with pytest.raises(Exception, match="no files matching"):
        spark.read.format("warc").option("path", d).option(
            "pattern", "*.nope"
        ).load().count()


def test_streaming_directory_tail(spark, tmp_path):
    """readStream.format('warc'): files landing between micro-batches
    are picked up exactly once; the offset is a filename high-water
    mark, so restarts from the checkpoint never re-emit."""
    d = tmp_path / "landing"
    d.mkdir()

    def drop(f, docs):
        blob = b""
        for i in docs:
            body = f"page {i}".encode()
            http = (
                b"HTTP/1.1 200 X\r\nContent-Type: text/plain\r\nContent-Length: "
                + str(len(body)).encode() + b"\r\n\r\n" + body
            )
            blob += warc.write_warc_record(
                "response", http, record_id=f"<urn:doc:{i}>",
                content_type="application/http;msgtype=response",
            )
        (d / f"part-{f:04d}.warc.gz").write_bytes(blob)

    drop(0, [0, 1])
    q = (
        spark.readStream.format("warc")
        .option("path", str(d)).option("view", "responses")
        .load()
        .writeStream.format("memory").queryName("warc_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) FROM warc_tail").first()[0] == 2
        drop(1, [2, 3, 4])
        q.processAllAvailable()
        got = spark.sql("SELECT record_id FROM warc_tail").collect()
        assert sorted(r.record_id for r in got) == [f"<urn:doc:{i}>" for i in range(5)]
        # nothing new -> nothing re-emitted
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) FROM warc_tail").first()[0] == 5
    finally:
        q.stop()


def test_listing_skips_subdirectories(spark, tmp_path):
    d = _write_fixture(tmp_path, n_files=2)
    (tmp_path / "part-junk.warc.gz").mkdir()  # a DIRECTORY matching the glob
    df = spark.read.format("warc").option("path", d).load()
    assert df.rdd.getNumPartitions() == 2  # the subdir never became a task


def test_stream_offset_monotone_on_empty_listing(tmp_path):
    """A transient empty listing must not regress the offset (and so
    never re-emits committed files)."""
    from query_skyline_qos_flink_spark.sources.warc_datasource import WarcStreamReader

    r = WarcStreamReader({"path": str(tmp_path), "pattern": "*.warc.gz"})
    (tmp_path / "part-0001.warc.gz").write_bytes(
        warc.write_warc_record("resource", b"x", record_id="<urn:r:1>")
    )
    hi = r.latestOffset()
    assert hi["upto"].endswith("part-0001.warc.gz")
    (tmp_path / "part-0001.warc.gz").unlink()  # listing goes empty
    assert r.latestOffset() == hi  # monotone, no regression
    # a no-op range plans nothing; a REGRESSED range fails loudly (it
    # can only come from a poisoned pre-restart offset log — planning
    # [] would commit it and re-emit everything next batch)
    assert r.partitions(hi, hi) == []
    with pytest.raises(ValueError, match="offset regressed"):
        r.partitions(hi, {"upto": ""})


def test_stream_warns_on_out_of_order_landing(tmp_path):
    """A file landing BELOW the committed watermark is never planned
    (monotone-naming contract, stricter than Spark's seen-map file
    source) — but it must warn, once per file, instead of dropping
    silently.  Files present when the watermark is first learned are
    baseline-accounted (no restart warning burst), and a file actually
    planned in a batch never warns."""
    import warnings as _warnings

    from query_skyline_qos_flink_spark.sources.warc_datasource import WarcStreamReader

    r = WarcStreamReader({"path": str(tmp_path), "pattern": "*.warc.gz"})
    rec = warc.write_warc_record("resource", b"x", record_id="<urn:r:1>")
    (tmp_path / "part-0002.warc.gz").write_bytes(rec)
    (tmp_path / "part-0005.warc.gz").write_bytes(rec)
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")  # baseline listing must not warn
        hi = r.latestOffset()
    assert hi["upto"].endswith("part-0005.warc.gz")
    # plan the initial range: both files stream, still no warning
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        parts = r.partitions({"upto": ""}, hi)
    assert len(parts) == 2

    # out-of-order landing below the watermark -> one warning, no plan
    (tmp_path / "part-0003.warc.gz").write_bytes(rec)
    with pytest.warns(RuntimeWarning, match="part-0003"):
        assert r.latestOffset() == hi
    # absorbed: the same file never warns twice
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        assert r.latestOffset() == hi

    # a NEW high file still advances the offset and plans normally,
    # without re-surfacing the dropped straggler
    (tmp_path / "part-0006.warc.gz").write_bytes(rec)
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        hi2 = r.latestOffset()
        planned = [p.path for p in r.partitions(hi, hi2)]
    assert hi2["upto"].endswith("part-0006.warc.gz")
    assert len(planned) == 1 and planned[0].endswith("part-0006.warc.gz")


def test_recovery_seeds_watermark_from_batch_end(tmp_path):
    """On checkpoint-recovery replay, partitions(start, end) must seed
    the session watermark from the batch END: seeding from the start
    would let a transient empty listing right after the recovered batch
    commits hand the engine an offset BELOW the committed one, and the
    regression guard would kill a healthy query (round-15 review)."""
    from query_skyline_qos_flink_spark.sources.warc_datasource import WarcStreamReader

    r = WarcStreamReader({"path": str(tmp_path), "pattern": "*.warc.gz"})
    rec = warc.write_warc_record("resource", b"x", record_id="<urn:r:1>")
    for i in (1, 2):
        (tmp_path / f"part-{i:04d}.warc.gz").write_bytes(rec)
    lo = {"upto": str(tmp_path / "part-0001.warc.gz")}
    hi = {"upto": str(tmp_path / "part-0002.warc.gz")}
    assert len(r.partitions(lo, hi)) == 1  # recovery replay of (lo, hi]
    (tmp_path / "part-0002.warc.gz").unlink()
    (tmp_path / "part-0001.warc.gz").unlink()  # listing goes empty
    assert r.latestOffset() == hi  # NOT lo: no regressed offset
    assert r.partitions(hi, r.latestOffset()) == []


def test_accounted_state_bounded_by_listing(tmp_path):
    """The out-of-order-landing bookkeeping is horizon-bounded: it grows
    monotonically (a transient partial listing must not drop an
    accounted name and later false-warn about a streamed file) but
    prunes to the live listing once it far exceeds it — driver state is
    O(directory), not O(names ever seen) (round-15 review, both
    passes)."""
    import warnings as _warnings

    from query_skyline_qos_flink_spark.sources.warc_datasource import WarcStreamReader

    r = WarcStreamReader({"path": str(tmp_path), "pattern": "*.warc.gz"})
    rec = warc.write_warc_record("resource", b"x", record_id="<urn:r:1>")
    for i in range(5):
        (tmp_path / f"part-{i:04d}.warc.gz").write_bytes(rec)
    r.latestOffset()
    r.latestOffset()
    assert len(r._accounted) <= 5
    # transient partial listing: an accounted name vanishing must NOT
    # drop it — its reappearance would otherwise false-warn
    (tmp_path / "part-0002.warc.gz").unlink()
    r.latestOffset()
    assert str(tmp_path / "part-0002.warc.gz") in r._accounted
    (tmp_path / "part-0002.warc.gz").write_bytes(rec)  # reappears
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        r.latestOffset()  # no false data-loss warning
    # horizon prune: retention-deleted names cannot grow the set forever
    r._accounted.update(f"/gone/part-{i:06d}" for i in range(3000))
    r.latestOffset()
    assert len(r._accounted) <= 5
