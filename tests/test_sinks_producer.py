"""O22 result-sink and P4 producer gates (round-1 item 8).

The sandbox has no Kafka broker or connector jar, so the sink gate asserts
the *contract*: the writer options carry the 10 MB
``kafka.max.request.size`` passthrough (``FlinkSkyline.java:177-183``) and
the ``value`` column is one JSON object per query in the §1.2 field order —
verified through a file-sink twin round-trip.  The producer gate runs
``tools/producer.py`` end-to-end and checks the P4 trigger cadence against
``/root/reference/python/unified_producer.py:180-188``.
"""

from __future__ import annotations

import json
import os
import sys

import pandas as pd

from query_skyline_qos_flink_spark.sources import kafka, wire


def _metrics_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "query_id": "q7",
                "record_count": 100,
                "skyline_size": 4,
                "optimality": 0.25,
                "ingestion_time_ms": 1.5,
                "local_processing_time_ms": 2.0,
                "global_processing_time_ms": 0.5,
                "total_processing_time_ms": 2.5,
                "query_latency_ms": 4.0,
            }
        ]
    )


def test_result_sink_carries_10mb_frame_option(spark):
    """O22: the kafka producer must accept the reference's large-skyline
    frames — 10 MB max.request.size, passed through the ``kafka.`` option
    namespace (connector hands those verbatim to the producer)."""
    opts = kafka.sink_options("broker:9092")
    assert opts["kafka.max.request.size"] == "10485760"  # FlinkSkyline.java:179
    assert opts["topic"] == "output-skyline"
    assert opts["kafka.bootstrap.servers"] == "broker:9092"

    # the writer builds (format/options are validated lazily at start(),
    # which needs a broker; building must not)
    stream = spark.readStream.format("rate").load().selectExpr(
        "CAST(value AS STRING) AS value"
    )
    writer = kafka.result_sink(stream, "broker:9092", "/tmp/nonexistent-ckpt")
    assert writer is not None

    # non-default frame size flows through
    assert kafka.sink_options("b:1", max_request_size=1024)[
        "kafka.max.request.size"
    ] == "1024"


def test_result_json_file_twin_field_order(spark, tmp_path):
    """O22 payload twin: write the exact ``value`` column the kafka sink
    would ship through a file sink instead, read it back, and assert each
    line is a JSON object with the §1.2 field order."""
    df = wire.result_json(spark.createDataFrame(_metrics_pdf()))
    out = str(tmp_path / "sink_twin")
    df.write.mode("overwrite").text(out)
    lines = [
        ln
        for f in os.listdir(out)
        if f.endswith(".txt") or f.startswith("part-")
        for ln in open(os.path.join(out, f))
        if ln.strip()
    ]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert list(rec.keys()) == wire.RESULT_FIELDS  # §1.2 order, incl. latency
    assert rec["skyline_size"] == 4 and rec["query_latency_ms"] == 4.0


def test_producer_p4_periodic_triggers(spark, tmp_path, monkeypatch):
    """P4: ``--query-threshold N`` injects ``qid,record_id`` after every N
    records — ids are 1-based sequential, record_id waits for the (kN-1)-th
    record (parity: unified_producer.py:180-188)."""
    from tools import producer

    out = str(tmp_path / "prod")
    monkeypatch.setattr(producer, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)  # keep the session fixture alive
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "producer.py",
            "--out", out,
            "--distribution", "anti_correlated",
            "--n", "200",
            "--dims", "2",
            "--batch-size", "80",
            "--query-threshold", "50",
            "--trigger-now", "q_imm",
        ],
    )
    producer.main()

    batches = sorted(os.listdir(os.path.join(out, "data")))
    assert batches == ["batch00000.csv", "batch00001.csv", "batch00002.csv"]
    rows = []
    for b in batches:
        rows += [ln.strip() for ln in open(os.path.join(out, "data", b)) if ln.strip()]
    assert len(rows) == 200
    # producer order == id order, wire format id,v0,v1 with numeric dims
    ids = [int(r.split(",", 1)[0]) for r in rows]
    assert ids == sorted(ids)
    first = rows[0].split(",")
    assert len(first) == 3 and all(float(x) is not None for x in first[1:])

    trig = [
        ln.strip()
        for ln in open(os.path.join(out, "queries", "triggers.csv"))
        if ln.strip()
    ]
    # P4 cadence: one trigger per 50 records, waiting on record id kN-1,
    # then the P5 immediate (comma-less) payload appended last
    assert trig == ["1,49", "2,99", "3,149", "4,199", "q_imm"]
    parsed = wire.parse_query_triggers(
        spark.createDataFrame([(t,) for t in trig], "value string")
    ).toPandas()
    assert parsed.set_index("query_id")["required_count"].to_dict() == {
        "1": 49, "2": 99, "3": 149, "4": 199, "q_imm": 0
    }


def test_run_job_query_mode(spark, tmp_path, monkeypatch):
    """The CLI's --query mode runs any registered corpus entry and writes
    parquet output."""
    from tools import run_job

    out = str(tmp_path / "q_out")
    monkeypatch.setattr(run_job, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    monkeypatch.setattr(
        sys, "argv",
        ["run_job.py", "--query", "r8_setops_nations",
         "--sf-dir", "/root/testdata/sf0.001", "--output", out],
    )
    run_job.main()
    assert spark.read.parquet(out).count() > 0
