"""Fixture-schema smoke test.

The corpus assumes specific dtypes for the driver-generated parquet tables
(TESTDATA.md).  When the driver regenerates fixtures with a different
physical encoding (as happened in round 4: ``events.ts`` went from parquet
TIMESTAMP(NANOS) to ``timestamp[us]``), this test fails with ONE clear
assertion instead of nine scattered analysis errors downstream.

``events.ts`` is the one column with two tolerated encodings — bigint
(nanos, via spark.sql.legacy.parquet.nanosAsLong) or timestamp/
timestamp_ntz — both handled by :func:`session.epoch_micros`.
"""

from __future__ import annotations

import os

import pytest

from query_skyline_qos_flink_spark.session import epoch_micros, load

from conftest import SF_SMOKE

# column -> expected Spark simpleString dtype; a set means any member is fine
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": {"timestamp", "timestamp_ntz", "date"},
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": {"timestamp", "timestamp_ntz", "date"},
    },
    "events": {
        "event_id": "bigint",
        # both encodings the engine tolerates (see module docstring)
        "ts": {"bigint", "timestamp", "timestamp_ntz"},
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_dtypes(spark, table):
    path = os.path.join(SF_SMOKE, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"fixture {path} absent")
    dtypes = dict(load(spark, SF_SMOKE, table).dtypes)
    for col, want in EXPECTED[table].items():
        assert col in dtypes, f"{table}.{col} missing (have {sorted(dtypes)})"
        allowed = want if isinstance(want, set) else {want}
        assert dtypes[col] in allowed, (
            f"{table}.{col} is {dtypes[col]}, corpus assumes one of {sorted(allowed)} "
            f"— driver fixture schema changed; check epoch-/date-handling helpers"
        )


@pytest.mark.parametrize("sf_dir", ["sf0.001", "sf0.01", "sf0.1"])
def test_events_ts_encoding_every_sf(spark, sf_dir):
    """The ts encoding must be a tolerated one at EVERY fixture scale the
    driver and bench touch — round 4 broke precisely here."""
    path = f"/root/testdata/{sf_dir}/events.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    dtypes = dict(spark.read.parquet(path).dtypes)
    assert dtypes["ts"] in {"bigint", "timestamp", "timestamp_ntz"}, dtypes["ts"]


def test_epoch_micros_covers_actual_encoding(spark):
    """epoch_micros() must resolve on the fixtures as shipped and agree with
    DuckDB epoch_us on a sample row (the oracle convention)."""
    duckdb = pytest.importorskip("duckdb")
    ev = load(spark, SF_SMOKE, "events")
    got = (
        ev.select("event_id", epoch_micros(ev).alias("us"))
        .orderBy("event_id")
        .limit(3)
        .collect()
    )
    want = duckdb.sql(
        f"SELECT event_id, epoch_us(ts) AS us FROM "
        f"'{SF_SMOKE}/events.parquet' ORDER BY event_id LIMIT 3"
    ).fetchall()
    assert [(r.event_id, r.us) for r in got] == [tuple(r) for r in want]


def test_epoch_micros_nanos_encoding_roundtrip(spark, tmp_path):
    """The rounds-1-3 fixture encoding (parquet TIMESTAMP(NANOS)) must
    still load and yield the same epoch micros — load() sets the
    nanosAsLong conf so even a vanilla session reads it as bigint nanos."""
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    from query_skyline_qos_flink_spark.session import epoch_micros

    us = [1_700_000_000_000_000, 1_700_000_060_123_456]
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([u * 1000 for u in us], pa.timestamp("ns")),
        }
    )
    d = tmp_path / "events_nanos.parquet"
    d.mkdir()
    pq.write_table(t, str(d / "part-0.parquet"), version="2.6", coerce_timestamps=None)
    df = load(spark, str(tmp_path), "events_nanos")
    assert dict(df.dtypes)["ts"] == "bigint"  # nanosAsLong applied
    got = sorted(
        (r.event_id, r.us)
        for r in df.select("event_id", epoch_micros(df).alias("us")).collect()
    )
    assert got == [(1, us[0]), (2, us[1])]
