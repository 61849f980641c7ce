"""Archive Python DataSource (sources/archive_datasource.py): auto
dispatch, per-file partitioning, envelope coverage, parity with the
binaryFile readers."""

from __future__ import annotations

import gzip

import pytest

from query_skyline_qos_flink_spark.sources import (
    archive_datasource,
    archives as ar,
    native_codecs as nc,
)


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    archive_datasource.register(spark)


def _write_fixture(tmp_path):
    members = lambda f: [
        (f"dir/doc-{f}-{i}.txt", f"body {f}-{i} ".encode() * 10) for i in range(3)
    ]
    (tmp_path / "a.zip").write_bytes(ar.write_zip(members(0)))
    (tmp_path / "b.tar").write_bytes(ar.write_tar(members(1)))
    (tmp_path / "c.tar.gz").write_bytes(gzip.compress(ar.write_tar(members(2))))
    n = 3
    if nc.zstd_available():
        (tmp_path / "d.tar.zst").write_bytes(nc.zstd_compress(ar.write_tar(members(3))))
        n += 1
    return str(tmp_path), n


def test_auto_dispatch_and_partitioning(spark, tmp_path):
    d, n_files = _write_fixture(tmp_path)
    df = spark.read.format("archive").option("path", d).load()
    assert df.count() == n_files * 3
    assert df.rdd.getNumPartitions() == n_files
    assert df.columns == ["path", "member", "offset", "size", "body"]


def test_parity_with_binaryfile_readers(spark, tmp_path):
    d, _ = _write_fixture(tmp_path)
    via_ds = (
        spark.read.format("archive").option("path", d)
        .option("pattern", "*.tar*").load()
        .select("member", "size", "body")
    )
    via_bf = ar.read_tar(spark, d).select("member", "size", "body")
    assert sorted(map(tuple, via_ds.collect())) == sorted(map(tuple, via_bf.collect()))


def test_kind_override_and_errors(spark, tmp_path):
    d, _ = _write_fixture(tmp_path)
    zips = (
        spark.read.format("archive").option("path", d)
        .option("pattern", "*.zip").option("kind", "zip").load()
    )
    assert zips.count() == 3
    with pytest.raises(Exception, match="kind"):
        spark.read.format("archive").option("path", d).option(
            "kind", "rar"
        ).load().count()
    with pytest.raises(Exception, match="no files matching"):
        spark.read.format("archive").option("path", d).option(
            "pattern", "*.nope"
        ).load().count()


def test_auto_dispatch_empty_zip_and_subdir_skip(spark, tmp_path):
    d, _ = _write_fixture(tmp_path)
    # a valid zero-member zip starts with the EOCD signature
    (tmp_path / "empty.zip").write_bytes(ar.write_zip([]))
    (tmp_path / "nested.zip").mkdir()  # directory matching the glob
    df = (
        spark.read.format("archive").option("path", d)
        .option("pattern", "*.zip").load()
    )
    assert df.count() == 3  # a.zip's members; empty.zip adds none, no crash


def test_streaming_archive_tail(spark, tmp_path):
    """readStream.format('archive'): archives landing between batches
    are exploded exactly once (shared FileTailStreamReader contract)."""
    land = tmp_path / "drop"
    land.mkdir()
    mk = lambda f: [(f"doc-{f}-{i}.txt", f"b{f}{i}".encode()) for i in range(2)]
    (land / "part-0000.tar").write_bytes(ar.write_tar(mk(0)))
    q = (
        spark.readStream.format("archive").option("path", str(land))
        .load()
        .writeStream.format("memory").queryName("arch_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) FROM arch_tail").first()[0] == 2
        (land / "part-0001.zip").write_bytes(ar.write_zip(mk(1)))
        q.processAllAvailable()
        got = spark.sql("SELECT member FROM arch_tail").collect()
        assert sorted(r.member for r in got) == [
            "doc-0-0.txt", "doc-0-1.txt", "doc-1-0.txt", "doc-1-1.txt",
        ]
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) FROM arch_tail").first()[0] == 4
    finally:
        q.stop()
