"""Real-broker Kafka smoke: the reference's O1 -> O22 topology end-to-end.

Parity target: ``/root/reference/docker-setup/docker-compose.yml:1-44`` +
``java/org.main/FlinkSkyline.java:84-97,177-183`` — tuples in on
``input-tuples`` (earliest), triggers on ``queries``, result JSON out on
``output-skyline`` with a 10 MB producer frame cap.

This container has no broker or kafka connector jar, so the CI gate for
O1/O2/O22 is the file-twin harness (``tests/test_streaming.py``,
``tests/test_sinks_producer.py``).  Whenever an environment DOES provide a
broker, run this directly::

    KAFKA_BOOTSTRAP=localhost:9092 python tools/kafka_smoke.py

or via the skipped-by-default pytest wrapper (``tests/test_kafka_smoke.py``).
Requires the matching connector package (resolved from maven at session
start unless ``KAFKA_CONNECTOR_PACKAGE`` / ``KAFKA_CONNECTOR_JARS``
overrides it) and broker-side topic auto-create (on by default in the
reference's compose file).

Flow (unique per-run topic suffix, so reruns don't replay stale offsets):

1. produce 400 CSV tuples + one ``q_smoke,400`` trigger (batch kafka write);
2. ``sources.kafka.data_source`` / ``kafka_stream`` -> ``run_pipeline``
   (parse -> stateful skyline -> finalize) with an availableNow trigger;
3. result metrics -> ``wire.result_json`` -> batch kafka write using
   ``sources.kafka.sink_options`` (the 10 MB O22 path);
4. batch-read the output topic back, assert one result row for ``q_smoke``
   with ``record_count == 400`` and a skyline size that matches the batch
   kernel on the same tuples.

Prints ``KAFKA SMOKE PASS`` and exits 0 on success.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_session(bootstrap: str):
    import pyspark
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(os.environ.get("KAFKA_SMOKE_MASTER", "local[4]"))
        .appName("kafka-smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    jars = os.environ.get("KAFKA_CONNECTOR_JARS")
    if jars:
        b = b.config("spark.jars", jars)
    else:
        pkg = os.environ.get(
            "KAFKA_CONNECTOR_PACKAGE",
            f"org.apache.spark:spark-sql-kafka-0-10_2.13:{pyspark.__version__}",
        )
        b = b.config("spark.jars.packages", pkg)
    return b.getOrCreate()


def main() -> int:
    bootstrap = os.environ.get("KAFKA_BOOTSTRAP")
    if not bootstrap:
        print("KAFKA_BOOTSTRAP not set; nothing to smoke", file=sys.stderr)
        return 2

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from query_skyline_qos_flink_spark.operators.skyline_kernel import skyline_mask
    from query_skyline_qos_flink_spark.sources import kafka, wire
    from query_skyline_qos_flink_spark.streaming.pipeline import run_pipeline

    spark = build_session(bootstrap)
    run = uuid.uuid4().hex[:8]
    t_data = f"{kafka.DEFAULT_DATA_TOPIC}-{run}"
    t_query = f"{kafka.DEFAULT_QUERY_TOPIC}-{run}"
    t_out = f"{kafka.DEFAULT_OUTPUT_TOPIC}-{run}"
    n, d, domain = 400, 2, 100.0

    rng = np.random.default_rng(7)
    vals = rng.integers(0, int(domain), size=(n, d)).astype(float)
    tuples = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n, dtype=np.int64), "values": list(vals)})
    )
    # 1. produce (batch kafka writes share the streaming connector's producer)
    wire.encode_service_tuples(tuples).write.format("kafka").option(
        "kafka.bootstrap.servers", bootstrap
    ).option("topic", t_data).save()
    spark.createDataFrame([(f"q_smoke,{n}",)], "value string").write.format("kafka").option(
        "kafka.bootstrap.servers", bootstrap
    ).option("topic", t_query).save()

    # 2. O1 -> skyline pipeline (availableNow replay; the query channel reads
    #    earliest here because the trigger was produced before stream start —
    #    production uses query_source()'s LATEST, same code path, O2 option)
    results: list[pd.DataFrame] = []
    with tempfile.TemporaryDirectory() as ckpt:
        q = run_pipeline(
            kafka.data_source(spark, bootstrap, t_data),
            kafka.kafka_stream(spark, bootstrap, t_query, "earliest"),
            checkpoint_dir=ckpt,
            d=d,
            num_partitions=4,
            domain=domain,
            on_result=results.append,
        )
        finished = q.awaitTermination(300)
        if not finished:
            # stop the live query BEFORE the TemporaryDirectory removes its
            # checkpoint, and fail with the real cause instead of a
            # confusing stream-abort / missing-results error downstream
            q.stop()
            raise AssertionError("availableNow replay did not finish within 300s")

    assert results, "pipeline produced no finalized query results"
    metrics = pd.concat(results, ignore_index=True)

    # 3. O22: result JSON out with the 10 MB frame cap
    out_df = wire.result_json(spark.createDataFrame(metrics))
    out_df.write.format("kafka").options(**kafka.sink_options(bootstrap, t_out)).save()

    # 4. read back and verify against the batch kernel
    rows = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", t_out)
        .option("startingOffsets", "earliest")
        .load()
        .select(F.col("value").cast("string").alias("value"))
        .collect()
    )
    payloads = [json.loads(r.value) for r in rows]
    mine = [p for p in payloads if p["query_id"] == "q_smoke"]
    assert len(mine) == 1, f"expected one q_smoke result, got {payloads}"
    expected_size = int(skyline_mask(vals).sum())
    got = mine[0]
    assert got["record_count"] == n, got
    assert got["skyline_size"] == expected_size, (got, expected_size)
    print("KAFKA SMOKE PASS", json.dumps(got))
    return 0


if __name__ == "__main__":
    sys.exit(main())
