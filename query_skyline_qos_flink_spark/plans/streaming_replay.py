"""Streaming-replay corpus entries — the reference's CORE topology under
the hard oracle gate.

``s11_stream_replay`` (d=2) and ``s12_stream_replay_3d`` (d=3) replay a
deterministic producer-file stream derived from ``lineitem`` through the
full streaming pipeline (wire parse -> spatial keyBy -> stateful
per-partition skyline + record-ID barrier -> trigger fan-out ->
arrival-countdown latch -> global merge;
``/root/reference/java/org.main/FlinkSkyline.java:84-185,296-356``) with
``availableNow``, and return the fired skyline POINTS per query, which the
duckdb oracle reproduces as exact-prefix NOT-EXISTS skylines.  The d=3
variant puts the kernel's generic (d >= 3) code path — not just the 2-D
relational special case — under the streaming hard gate.

Exactness engineering (SURVEY.md §3.3): the reference's barrier is
per-partition ``max_seen >= required_count`` — a trigger snapshot is only a
deterministic N-prefix if (a) a micro-batch boundary lands exactly at the
prefix (one file per batch via ``maxFilesPerTrigger=1``, file order pinned
by mtime) and (b) the threshold is low enough that EVERY spatial partition
releases in that batch.  Both thresholds are therefore computed from the
data at setup time:

* ``q_prefix`` threshold = min over partitions of the partition's max
  record id within the N-prefix -> every partition nonempty in the prefix
  fires at the end of batch 0, whose ingested set is exactly the prefix.
* ``q_full`` threshold = min over partitions of the partition's max id over
  ALL records — and it must exceed the prefix max (asserted) so no
  partition fires early.

Partitions with no prefix rows answer the reference's ``maxId == -1``
empty-partial path, which is exactly correct for the prefix snapshot.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.dominance import skyline_oracle_sql
from ..operators.caching import persist_bounded as _persist
from ..operators.partitioners import partition_id
from ..operators.prefix import rows_at_global_ranks, with_global_rank_and_total
from ..session import epoch_micros, load
from ..streaming.pipeline import run_pipeline
from .corpus import register

_N_PREFIX = 1000
_P = 8
_MAX_REPLAY_ROWS = 2_000_000  # driver-collect guard; see _stream_replay body
_DOMAIN = 200_000.0  # covers l_extendedprice at every sf (dim-0 bucketing)

# (output column, lineitem source column); dim-0 drives the spatial bucketing
_DIMS_2D = [("price", "l_extendedprice"), ("disc", "l_discount")]
_DIMS_3D = _DIMS_2D + [("qty", "l_quantity")]


def _write_stream_file(
    sdf: DataFrame,
    path: str,
    mtime: float,
    fmt: str = "csv",
    sort_cols: list[str] | None = None,
    select=None,
) -> bool:
    """Write ONE replay file for the file-stream source with no driver
    detour: a single executor task streams the slice to disk
    (``repartition(1)`` + the writer's spill-safe external sort), and the
    part file is renamed into place with the mtime that pins micro-batch
    ingestion order.  Driver memory stays O(1) at any scale — the replay
    harness previously materialized the whole fixture via ``toPandas()``
    (the round-8 verdict's one remaining scale wart in registered plans);
    the one-file-per-micro-batch contract keeps a single sequential
    writer per file, which is the harness's deliberate price for
    deterministic batch boundaries.  Returns False for an empty slice
    (no file: the stream just sees one fewer micro-batch, which every
    replay query's semantics tolerate by construction)."""
    part = sdf.repartition(1)
    if sort_cols:
        part = part.sortWithinPartitions(*sort_cols)
    if select is not None:
        part = part.select(*select)
    tmp = path + ".tmpdir"
    writer = part.write.mode("overwrite")
    getattr(writer, fmt)(tmp)
    parts = [p for p in os.listdir(tmp) if p.startswith("part-")]
    if not parts:
        shutil.rmtree(tmp)
        return False
    assert len(parts) == 1, f"repartition(1) wrote {len(parts)} parts"
    os.replace(os.path.join(tmp, parts[0]), path)
    shutil.rmtree(tmp)
    os.utime(path, (mtime, mtime))
    return True


def _write_replay_split(
    df: DataFrame,
    order_cols: list[str],
    data_dir: str,
    fmt: str = "csv",
    name: str = "replay",
) -> int:
    """Split ``df`` into the standard two replay files at the global
    ``ceil(0.8 n)`` rank boundary (batch 0 = the first 80% of rows in
    ``order_cols`` order — the exact membership the old pandas slicing
    produced) and write both distributedly.  The boundary row comes from
    bucket-pruned rank SELECTION (one tiny collect), each slice is a
    struct-comparison filter on the order key (a total order by
    contract, so membership is exact), and intra-file order is pinned by
    a within-partition sort — not semantically required (every replay
    query is batch-membership-determined) but it keeps the files
    byte-stable across runs.  Returns the total row count, enforcing
    ``_MAX_REPLAY_ROWS`` before anything is written."""
    # Request ranks k AND k+1 in the same bucket-pruned selection: the
    # divergence condition for `key <= boundary` membership is exactly
    # "the boundary key spills past rank k" (ties wholly inside batch 0
    # are harmless — `<=` pulls precisely the first k rows then), and
    # comparing the two picked rows detects it with zero extra jobs.
    picked, total = rows_at_global_ranks(
        df,
        order_cols,
        lambda n: [-(-n * 8 // 10), -(-n * 8 // 10) + 1],
        "__rn",
    )
    if total > _MAX_REPLAY_ROWS:
        raise RuntimeError(
            f"{name} replay is a correctness harness, capped at "
            f"{_MAX_REPLAY_ROWS} rows (got {total}); run it at a smaller sf"
        )
    os.makedirs(data_dir, exist_ok=True)
    k = -(-total * 8 // 10)
    by_rank = {r["__rn"]: r for r in picked.collect()}
    boundary, after = by_rank.get(k), by_rank.get(k + 1)
    if boundary is None:  # empty fixture: one (possibly empty) batch
        slices = [df, df.limit(0)]
    else:
        if after is not None and all(
            after[c] == boundary[c] for c in order_cols
        ):
            raise ValueError(
                f"{name} replay order_cols={order_cols} is not a total "
                f"order at the split: the boundary key "
                f"{tuple(boundary[c] for c in order_cols)} extends past "
                f"rank {k}, which would pull its ties into batch 0 — "
                "pass a unique key"
            )
        key = F.struct(*[F.col(c) for c in order_cols])
        lit = F.struct(
            *[
                F.lit(boundary[c]).cast(df.schema[c].dataType)
                for c in order_cols
            ]
        )
        slices = [df.where(key <= lit), df.where(key > lit)]
    for i, s in enumerate(slices):
        _write_stream_file(
            s,
            os.path.join(data_dir, f"f{i}.{fmt}"),
            1_000_000.0 + 10 * i,
            fmt,
            sort_cols=order_cols,
        )
    return total


def _replay_oracle(dims: list[tuple[str, str]]) -> str:
    names = [n for n, _ in dims]
    src = ", ".join(f"{s} AS {n}" for n, s in dims)
    base = (
        "SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS id, "
        f"{src} FROM lineitem"
    )
    out_cols = ["id", *names]
    prefix_sky = skyline_oracle_sql(
        f"SELECT * FROM ({base}) WHERE id < {_N_PREFIX}", names, out_cols,
        bucket_sql="id",
    )
    full_sky = skyline_oracle_sql(base, names, out_cols, bucket_sql="id")
    return (
        f"SELECT 'q_prefix' AS query_id, s.* FROM ({prefix_sky}) s "
        f"UNION ALL SELECT 'q_full' AS query_id, s.* FROM ({full_sky}) s"
    )


def _run_replay(
    spark: SparkSession,
    sf_dir: str,
    dims: list[tuple[str, str]],
    *,
    emit_points: bool = True,
    per_pid_breakdown: bool = False,
) -> list[pd.DataFrame]:
    """Shared s11/s12/s36 harness: build the two-file producer fixture,
    derive the barrier thresholds, run the full streaming pipeline, and
    return the finalized per-query metric frames (one pdf per completed
    micro-batch of queries)."""
    names = [n for n, _ in dims]
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", *[s for _, s in dims]
    )
    # The exact N-prefix ids come from the distributed bucket-assembled
    # global rank (operators/prefix.py — no single-task window, no driver
    # materialization; in production ids come from the producer, as in
    # the reference; unified_producer.py:118-131).  The row cap bounds
    # the harness's single-writer-per-batch-file cost, not driver memory.
    ranked, n_rows = with_global_rank_and_total(
        li, ["l_orderkey", "l_linenumber"], "__rn"
    )
    if n_rows > _MAX_REPLAY_ROWS:
        raise RuntimeError(
            f"stream replay is a correctness harness, capped at "
            f"{_MAX_REPLAY_ROWS} rows (got {n_rows}); run it at sf<=0.01"
        )
    ids = _persist(
        ranked.select(
            (F.col("__rn") - 1).alias("id"),
            *[F.col(s).alias(n) for n, s in dims],
        )
    )

    # replicate the stream's spatial partitioner in batch to derive the
    # per-partition barrier thresholds (see module docstring) — two tiny
    # min-of-per-partition-max aggregates, nothing driver-side but 2 ints
    pid_col = partition_id("dim", [F.col(n) for n in names], _P, F.lit(_DOMAIN))
    sdf = ids.withColumn("pid", pid_col)

    def min_of_pid_max(frame: DataFrame) -> int:
        return int(
            frame.groupBy("pid")
            .agg(F.max("id").alias("m"))
            .agg(F.min("m"))
            .first()[0]
        )

    req_prefix = min_of_pid_max(sdf.where(F.col("id") < _N_PREFIX))
    req_full = min_of_pid_max(sdf)
    if req_full < _N_PREFIX:
        raise RuntimeError(
            "barrier thresholds not separable: a partition's full-data max id "
            f"({req_full}) is inside the prefix — raise sf or lower _N_PREFIX"
        )

    workdir = tempfile.mkdtemp(prefix="stream_replay_")
    data_dir = os.path.join(workdir, "data")
    query_dir = os.path.join(workdir, "queries")
    os.makedirs(data_dir), os.makedirs(query_dir)

    # one file per micro-batch (maxFilesPerTrigger=1), ordered by mtime:
    # batch 0 ingests exactly the N-prefix.  Wire doubles go through
    # CAST(string) — Java's shortest-round-trip repr, parsed back to the
    # identical double by the stream's wire parser.  NULL-propagating
    # concat + raise_error keeps the old fail-fast contract: a NULL dim
    # must crash the harness, never write a short CSV line the stream's
    # fixed-schema parser would misparse into a shifted point.
    fields = [F.col("id").cast("string")] + [
        F.col(n).cast("string") for n in names
    ]
    strict = fields[0]
    for fld in fields[1:]:
        strict = F.concat(strict, F.lit(","), fld)
    line = F.coalesce(
        strict,
        F.raise_error(F.lit("stream replay: NULL wire field in fixture")),
    )
    for path, cond, mtime in (
        ("d00.csv", F.col("id") < _N_PREFIX, 1_000_000.0),
        ("d01.csv", F.col("id") >= _N_PREFIX, 1_000_010.0),
    ):
        _write_stream_file(
            ids.where(cond),
            os.path.join(data_dir, path),
            mtime,
            "text",
            sort_cols=["id"],
            select=[line.alias("value")],
        )
    with open(os.path.join(query_dir, "q.csv"), "w") as f:
        f.write(f"q_prefix,{req_prefix}\nq_full,{req_full}\n")

    results: list[pd.DataFrame] = []
    q = run_pipeline(
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", 1)
        .text(data_dir),
        spark.readStream.schema("value string").text(query_dir),
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        d=len(names),
        num_partitions=_P,
        strategy="dim",
        domain=_DOMAIN,
        on_result=results.append,
        emit_points=emit_points,
        per_pid_breakdown=per_pid_breakdown,
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("stream replay timed out after 600 s")
    return results


def _stream_replay(
    spark: SparkSession, sf_dir: str, dims: list[tuple[str, str]]
) -> DataFrame:
    names = [n for n, _ in dims]
    results = _run_replay(spark, sf_dir, dims, emit_points=True)
    rows = [
        (str(m.query_id), int(pt[0]), *[float(v) for v in pt[1:]])
        for mdf in results
        for m in mdf.itertuples()
        for pt in m.skyline_points
    ]
    schema = "query_id string, id bigint, " + ", ".join(f"{n} double" for n in names)
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["query_id", "id", *names]), schema=schema
    )


@register(
    "s11_stream_replay",
    _replay_oracle(_DIMS_2D),
    doc="Streaming topology end to end (reference O9-O17, "
    "FlinkSkyline.java:84-185): availableNow replay of producer files "
    "through the stateful skyline stream, two record-ID-barrier triggers "
    "(exact N-prefix + full), fired skyline points vs exact-prefix oracle",
)
def s11(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stream_replay(spark, sf_dir, _DIMS_2D)


@register(
    "s12_stream_replay_3d",
    _replay_oracle(_DIMS_3D),
    doc="3-D streaming replay (price, discount, quantity): same topology "
    "and barriers as s11, exercising the kernel's generic d>=3 path inside "
    "the stateful operator under the exact-prefix oracle",
)
def s12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stream_replay(spark, sf_dir, _DIMS_3D)


# Oracle for the streaming METRICS record (reference O15/O16 sizes +
# O18/O19 Optimality ingredients), replayed through the identical fixture
# and barriers as s11.  Everything gated is integer-exact: per reporting
# partition the local skyline size and the global-skyline survivor count
# (optimality == round(sum(survivors/local_size)/P, 4) by construction —
# the float itself is NOT hashed because cross-engine summation order is
# not contractual), plus the per-query record_count (max ingested id + 1
# at barrier time) and global skyline_size.  The pid expression is the
# literal SQL twin of partitioners.mr_dim with the replay's fixed
# domain/P (width = _DOMAIN / _P), same shape as the m1 oracle.
def _metrics_oracle(dims: list[tuple[str, str]]) -> str:
    names = [n for n, _ in dims]
    src = ", ".join(f"{s} AS {n}" for n, s in dims)
    width = _DOMAIN / _P
    notnull = " AND ".join(f"{n} IS NOT NULL AND NOT isnan({n})" for n in names)
    dom = (
        " AND ".join(f"q.{n} <= p.{n}" for n in names)
        + " AND ("
        + " OR ".join(f"q.{n} < p.{n}" for n in names)
        + ")"
    )
    return f"""
WITH base AS (
  SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS id,
         {src}
  FROM lineitem
),
snap AS (
  SELECT 'q_prefix' AS query_id, * FROM base WHERE id < {_N_PREFIX}
  UNION ALL
  SELECT 'q_full' AS query_id, * FROM base
),
val AS (
  SELECT *,
         LEAST(GREATEST(CAST(FLOOR({names[0]} / {width}) AS INTEGER), 0), {_P - 1}) AS pid,
         id % 64 AS sub
  FROM snap WHERE {notnull}
),
loc0 AS (
  SELECT p.* FROM val p WHERE NOT EXISTS (
    SELECT 1 FROM val q
    WHERE q.query_id = p.query_id AND q.pid = p.pid AND q.sub = p.sub AND {dom})
),
loc AS (
  SELECT p.* FROM loc0 p WHERE NOT EXISTS (
    SELECT 1 FROM loc0 q
    WHERE q.query_id = p.query_id AND q.pid = p.pid AND {dom})
),
gsky AS (
  SELECT p.* FROM loc p WHERE NOT EXISTS (
    SELECT 1 FROM loc q WHERE q.query_id = p.query_id AND {dom})
),
sizes AS (SELECT query_id, pid, count(*) AS local_size FROM loc GROUP BY query_id, pid),
surv AS (SELECT query_id, pid, count(*) AS survivors FROM gsky GROUP BY query_id, pid),
meta AS (SELECT query_id, CAST(max(id) + 1 AS BIGINT) AS record_count FROM snap GROUP BY query_id),
ssize AS (SELECT query_id, CAST(count(*) AS BIGINT) AS skyline_size FROM gsky GROUP BY query_id)
SELECT z.query_id, z.pid, z.local_size,
       CAST(COALESCE(v.survivors, 0) AS BIGINT) AS survivors,
       m.record_count, ss.skyline_size
FROM sizes z
LEFT JOIN surv v ON v.query_id = z.query_id AND v.pid = z.pid
JOIN meta m ON m.query_id = z.query_id
JOIN ssize ss ON ss.query_id = z.query_id
""".strip()


@register(
    "s36_stream_metrics",
    _metrics_oracle(_DIMS_2D),
    doc="Streaming metrics record end to end (reference O15-O19, "
    "FlinkSkyline.java:566-608): the s11 replay's finalize_results output "
    "gated as integers — per reporting partition (local_size, global "
    "survivors), the Optimality numerator/denominator pieces, plus "
    "record_count (max ingested id + 1 at barrier time) and the global "
    "skyline_size.  O20's wall-clock latency decomposition stays "
    "pytest-gated (tests/test_streaming.py) because time is not "
    "oracle-comparable",
)
def s36(spark: SparkSession, sf_dir: str) -> DataFrame:
    results = _run_replay(
        spark, sf_dir, _DIMS_2D, emit_points=False, per_pid_breakdown=True
    )
    rows = [
        (str(m.query_id), int(pid), int(loc), int(srv),
         int(m.record_count), int(m.skyline_size))
        for mdf in results
        for m in mdf.itertuples()
        for pid, loc, srv in m.pid_breakdown
    ]
    cols = ["query_id", "pid", "local_size", "survivors", "record_count", "skyline_size"]
    schema = (
        "query_id string, pid int, local_size bigint, survivors bigint, "
        "record_count bigint, skyline_size bigint"
    )
    return spark.createDataFrame(pd.DataFrame(rows, columns=cols), schema=schema)


_WIN_US = 3_600_000_000  # 1 h tumbling window == watermark delay


@register(
    "s13_stream_window",
    f"""
WITH e AS (SELECT epoch_us(ts) AS us, event_type,
                  CAST(round(value * 100) AS BIGINT) AS vc FROM events),
wm AS (SELECT max(us) - {_WIN_US} AS wm_us FROM e),
w AS (SELECT us - us % {_WIN_US} AS ws, event_type, vc FROM e)
SELECT ws AS window_start_us, event_type,
       CAST(count(*) AS BIGINT) AS n_events, CAST(sum(vc) AS BIGINT) AS sum_vc
FROM w, wm GROUP BY ws, event_type, wm_us HAVING ws + {_WIN_US} <= wm_us
""".strip(),
    doc="Structured Streaming event-time tumbling window (1 h) + watermark "
    "over a two-file replay of events: append mode emits a window once the "
    "watermark passes its end; availableNow's trailing no-data micro-batches "
    "(spark.sql.streaming.noDataMicroBatches, default on) flush state up to "
    "the final watermark = max event time - delay, which the oracle "
    "replicates as HAVING window_end <= max(us) - delay.  Files are split "
    "in event-time order so no record is ever late-dropped (determinism).",
)
def s13(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ev = ev.select(
        "event_id",
        epoch_micros(ev).alias("us"),  # epoch micros, like epoch_us
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    workdir = tempfile.mkdtemp(prefix="s13_window_")
    data_dir = os.path.join(workdir, "data")
    _write_replay_split(ev, ["us", "event_id"], data_dir, "csv", "s13")

    agg = (
        spark.readStream.schema(
            "event_id bigint, us bigint, event_type string, vc bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .csv(data_dir)
        .withColumn("ev_ts", F.timestamp_micros("us"))
        .withWatermark("ev_ts", "1 hour")
        .groupBy(F.window("ev_ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("vc").alias("sum_vc"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_vc",
        )
    )
    sink = os.path.basename(workdir)  # unique per invocation: a second
    # run in the same session must not collide with the prior memory table
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("s13 stream window replay timed out after 600 s")
    # materialize off the transient memory sink before returning
    out = spark.sql(f"SELECT * FROM {sink}").toPandas()
    return spark.createDataFrame(
        out,
        schema="window_start_us bigint, event_type string, "
        "n_events bigint, sum_vc bigint",
    )


@register(
    "s14_stream_dedup",
    """
SELECT lang, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang, len_bucket
""".strip(),
    doc="Streaming dedup canopy: documents replayed as a two-file stream, "
    "stateful groupBy on a coarse (lang, length-bucket) key keeping the "
    "smallest doc_id per group — complete-mode streaming aggregation, so "
    "the final state equals the batch dedup regardless of how records "
    "split across micro-batches (deterministic where streaming "
    "dropDuplicates would be arrival-order-dependent).  Complete mode "
    "holds every key in state forever; for the bounded-state production "
    "form see s20_stream_dedup_watermark "
    "(dropDuplicatesWithinWatermark)",
)
def s14(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    workdir = tempfile.mkdtemp(prefix="s14_dedup_")
    data_dir = os.path.join(workdir, "data")
    _write_replay_split(d, ["doc_id"], data_dir, "csv", "s14")

    agg = (
        spark.readStream.schema("doc_id bigint, lang string, n_chars bigint")
        .option("maxFilesPerTrigger", 1)
        .csv(data_dir)
        .groupBy("lang", F.expr("n_chars div 100").alias("len_bucket"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )
    sink = os.path.basename(workdir)
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("s14 stream dedup timed out after 600 s")
    out = spark.sql(f"SELECT * FROM {sink}").toPandas()
    return spark.createDataFrame(
        out,
        schema="lang string, len_bucket bigint, keep_id bigint, n_docs bigint",
    )


@register(
    "s15_stream_join",
    """
SELECT o.o_orderkey, l.l_linenumber,
       CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_c
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_totalprice > 300000
""".strip(),
    doc="Stream-stream inner equi-join: orders (pre-filtered) and lineitem "
    "replayed as two independent file streams, joined on order key with "
    "unbounded state (no watermark -> no eviction -> the streaming result "
    "is exactly the batch join, independent of how the four files "
    "interleave across micro-batches; matches spanning batch boundaries "
    "come from the join state).  maxFilesPerTrigger=1 on both sides forces "
    "genuine cross-batch matches.  NOT the production pattern: unbounded "
    "join state grows forever on an endless stream — this entry exists to "
    "pin the exact-batch-equivalence semantics.  For a real deployment use "
    "the s19_stream_interval_join form (both sides watermarked on event "
    "time, state evicted as the watermark advances, bounded at scale); "
    "s20_stream_dedup_watermark is the same bounded-state discipline for "
    "dedup",
)
def s15(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 300000)
        .select("o_orderkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_c"),
    )
    workdir = tempfile.mkdtemp(prefix="s15_join_")
    dirs = {}
    for name, frame, order in (
        ("orders", o, ["o_orderkey"]),
        ("lineitem", li, ["l_orderkey", "l_linenumber"]),
    ):
        d = os.path.join(workdir, name)
        _write_replay_split(frame, order, d, "csv", "s15")
        dirs[name] = d

    s_o = (
        spark.readStream.schema("o_orderkey bigint")
        .option("maxFilesPerTrigger", 1)
        .csv(dirs["orders"])
    )
    s_l = (
        spark.readStream.schema("l_orderkey bigint, l_linenumber bigint, price_c bigint")
        .option("maxFilesPerTrigger", 1)
        .csv(dirs["lineitem"])
    )
    j = s_l.join(s_o, s_l.l_orderkey == s_o.o_orderkey).select(
        "o_orderkey", "l_linenumber", "price_c"
    )
    sink = os.path.basename(workdir)
    q = (
        j.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("s15 stream join timed out after 600 s")
    out = spark.sql(f"SELECT * FROM {sink}").toPandas()
    return spark.createDataFrame(
        out, schema="o_orderkey bigint, l_linenumber bigint, price_c bigint"
    )


_SESS_GAP_US = 4 * 3600 * 1_000_000  # session gap == watermark delay (4 h)


@register(
    "s16_stream_session",
    f"""
WITH e AS (SELECT epoch_us(ts) AS us, event_id, user_id FROM events),
l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
f AS (SELECT *, CASE WHEN prev IS NULL OR us - prev >= {_SESS_GAP_US} THEN 1 ELSE 0 END AS new_s FROM l),
s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f),
agg AS (SELECT user_id, CAST(min(us) AS BIGINT) AS sess_start_us,
               CAST(max(us) + {_SESS_GAP_US} AS BIGINT) AS sess_end_us,
               CAST(count(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, sid),
wm AS (SELECT max(us) - {_SESS_GAP_US} AS wm_us FROM e)
SELECT user_id, sess_start_us, sess_end_us, n_events
FROM agg, wm WHERE sess_end_us <= wm_us
""".strip(),
    doc="Streaming session windows (F.session_window, 4 h gap) + watermark "
    "over a two-file event replay: Spark merges events whose [t, t+gap) "
    "intervals overlap (new session iff the inter-event gap >= gap — note "
    ">=, not >), and append mode emits a session once the watermark "
    "passes its end (= last event + gap).  The oracle replicates both the "
    "merge rule (lag/cumsum) and the emission cutoff (end <= max event "
    "time - delay); semantics pinned empirically before the oracle was "
    "written",
)
def s16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ev = ev.select("event_id", epoch_micros(ev).alias("us"), "user_id")
    workdir = tempfile.mkdtemp(prefix="s16_session_")
    data_dir = os.path.join(workdir, "data")
    _write_replay_split(ev, ["us", "event_id"], data_dir, "csv", "s16")

    agg = (
        spark.readStream.schema("event_id bigint, us bigint, user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .csv(data_dir)
        .withColumn("ev_ts", F.timestamp_micros("us"))
        .withWatermark("ev_ts", "4 hours")
        .groupBy(F.session_window("ev_ts", "4 hours"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("sess_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("sess_end_us"),
            "n_events",
        )
    )
    sink = os.path.basename(workdir)
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("s16 stream session timed out after 600 s")
    out = spark.sql(f"SELECT * FROM {sink}").toPandas()
    return spark.createDataFrame(
        out,
        schema="user_id bigint, sess_start_us bigint, sess_end_us bigint, "
        "n_events bigint",
    )


@register(
    "s17_stream_static_dedup",
    """
WITH fp AS (SELECT doc_id, lang, md5(text) AS fp FROM documents),
ref AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 3 = 0)
SELECT doc_id, lang FROM fp ANTI JOIN ref USING (fp)
""".strip(),
    doc="Stream-static anti join - incremental dedup of an arriving "
    "document stream against a STATIC known-fingerprint corpus (the "
    "recurring-crawl shape: only docs whose md5 fingerprint is absent "
    "from the reference set survive).  Stateless per-row decision, so "
    "append mode is batch-exact regardless of micro-batch splits; "
    "fingerprints are computed before replay so no free text rides the "
    "CSV wire.  At scale the static side is a broadcast or bucketed "
    "fingerprint table; no streaming state grows",
)
def s17(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.md5(F.col("text")).alias("fp")
    )
    static_ref = (
        d.where(F.col("doc_id") % 3 == 0).select("fp").distinct()
    )
    workdir = tempfile.mkdtemp(prefix="s17_static_dedup_")
    data_dir = os.path.join(workdir, "data")
    _write_replay_split(d, ["doc_id"], data_dir, "csv", "s17")

    fresh = (
        spark.readStream.schema("doc_id bigint, lang string, fp string")
        .option("maxFilesPerTrigger", 1)
        .csv(data_dir)
        .join(static_ref, "fp", "left_anti")
        .select("doc_id", "lang")
    )
    sink = os.path.basename(workdir)
    q = (
        fresh.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("s17 stream-static dedup timed out after 600 s")
    out = spark.sql(f"SELECT * FROM {sink}").toPandas()
    return spark.createDataFrame(out, schema="doc_id bigint, lang string")


@register(
    "s18_stream_upsert",
    """
WITH r AS (
  SELECT user_id, event_id, epoch_us(ts) AS tsu,
         CAST(round(value * 100) AS BIGINT) AS value_c,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events),
n AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
SELECT r.user_id, CAST(r.event_id AS BIGINT) AS last_event_id,
       r.value_c AS last_value_c, CAST(n.n_events AS BIGINT) AS n_events
FROM r JOIN n USING (user_id) WHERE rn = 1
""".strip(),
    doc="foreachBatch incremental upsert (CDC merge / Delta-MERGE "
    "stand-in): events replayed as a two-file stream; each micro-batch "
    "reduces to per-user (latest event by (ts, event_id), count) and is "
    "merged into a versioned parquet snapshot — union with the previous "
    "snapshot, re-argmax via a struct max, counts summed. Last-writer-wins "
    "on a total (ts, id) order is associative+commutative, so the final "
    "snapshot is batch-exact regardless of how records split across "
    "micro-batches. Snapshots are written to fresh versioned dirs (never "
    "overwrite-while-reading); per-batch merge cost is one shuffle on the "
    "upsert key",
)
def s18(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ev = ev.select(
        "user_id",
        "event_id",
        epoch_micros(ev).alias("tsu"),
        F.round(F.col("value") * 100).cast("bigint").alias("value_c"),
    )
    workdir = tempfile.mkdtemp(prefix="s18_upsert_")
    data_dir = os.path.join(workdir, "data")
    _write_replay_split(ev, ["event_id"], data_dir, "csv", "s18")

    state = {"version": -1}  # driver-side snapshot pointer (foreachBatch runs on driver)

    def _remerge(df: DataFrame) -> DataFrame:
        # struct max == argmax on the (tsu, event_id) prefix: lexicographic
        # struct ordering carries value_c along for free
        return df.groupBy("user_id").agg(
            F.max("last").alias("last"),
            F.sum("n_events").alias("n_events"),
        )

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        cur = batch_df.select(
            "user_id",
            F.struct("tsu", "event_id", "value_c").alias("last"),
            F.lit(1).cast("bigint").alias("n_events"),
        )
        cur = _remerge(cur)
        if state["version"] >= 0:
            prev = batch_df.sparkSession.read.parquet(
                os.path.join(workdir, f"v{state['version']}")
            )
            cur = _remerge(prev.unionByName(cur))
        cur.write.mode("overwrite").parquet(
            os.path.join(workdir, f"v{state['version'] + 1}")
        )
        state["version"] += 1

    q = (
        spark.readStream.schema("user_id bigint, event_id bigint, tsu bigint, value_c bigint")
        .option("maxFilesPerTrigger", 1)
        .csv(data_dir)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("s18 stream upsert timed out after 600 s")
    if state["version"] < 0:
        raise RuntimeError("s18 stream upsert produced no snapshot")
    snap = spark.read.parquet(os.path.join(workdir, f"v{state['version']}"))
    return snap.select(
        "user_id",
        F.col("last.event_id").alias("last_event_id"),
        F.col("last.value_c").alias("last_value_c"),
        "n_events",
    )


@register(
    "s19_stream_interval_join",
    """
SELECT a.user_id,
       a.event_id AS a_event_id, b.event_id AS b_event_id,
       CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS dt_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND epoch_us(b.ts) > epoch_us(a.ts)
 AND epoch_us(b.ts) <= epoch_us(a.ts) + 60000000
""".strip(),
    doc="Watermarked stream-stream INTERVAL join (the canonical Structured "
    "Streaming event-correlation pattern, distinct from s15's unbounded "
    "equi-join): per user, pair each event with every event of the same "
    "user in the following 60 s, both sides watermarked so the join "
    "state is EVICTED as event time advances (bounded state at scale, "
    "where s15 grows forever). Replay determinism: files split in "
    "event-time order + a watermark delay far above the join span means "
    "no match is ever late-dropped — a batch-boundary-crossing match "
    "needs a left row within 60 s of the boundary, and the watermark "
    "(max batch-0 time - 2 h) sits far below that; availableNow's "
    "trailing no-data micro-batches flush remaining matches, so the "
    "append-mode result equals the batch interval join exactly",
)
def s19(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ev = ev.select("event_id", "user_id", epoch_micros(ev).alias("us"))
    workdir = tempfile.mkdtemp(prefix="s19_ijoin_")
    data_dir = os.path.join(workdir, "data")
    _write_replay_split(ev, ["us", "event_id"], data_dir, "csv", "s19")

    def side(alias: str):
        return (
            spark.readStream.schema("event_id bigint, user_id bigint, us bigint")
            .option("maxFilesPerTrigger", 1)
            .csv(data_dir)
            .withColumn("ev_ts", F.timestamp_micros("us"))
            .withWatermark("ev_ts", "2 hours")
            .select(
                F.col("event_id").alias(f"{alias}_event_id"),
                F.col("user_id").alias(f"{alias}_user_id"),
                F.col("ev_ts").alias(f"{alias}_ts"),
                F.col("us").alias(f"{alias}_us"),
            )
        )

    a, b = side("a"), side("b")
    j = (
        a.join(
            b,
            F.expr(
                "a_user_id = b_user_id AND "
                "b_ts > a_ts AND b_ts <= a_ts + INTERVAL 60 SECONDS"
            ),
        )
        .select(
            F.col("a_user_id").alias("user_id"),
            "a_event_id",
            "b_event_id",
            (F.col("b_us") - F.col("a_us")).alias("dt_us"),
        )
    )
    sink = os.path.basename(workdir)
    q = (
        j.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("s19 stream interval join timed out after 600 s")
    out = spark.sql(f"SELECT * FROM {sink}").toPandas()
    return spark.createDataFrame(
        out,
        schema="user_id bigint, a_event_id bigint, b_event_id bigint, dt_us bigint",
    )


@register(
    "s20_stream_dedup_watermark",
    """
SELECT DISTINCT user_id, event_type,
       CAST(round(value * 100) AS BIGINT) AS vc
FROM events
""".strip(),
    doc="dropDuplicatesWithinWatermark: bounded-state streaming dedup (the "
    "production pattern where s14's complete-mode aggregate holds ALL "
    "keys forever and plain streaming dropDuplicates never expires "
    "state). State for a key expires once the watermark passes its "
    "event time + delay; with the delay above the replay's event-time "
    "span, exactly one row per key survives. Only the KEY columns are "
    "emitted: which duplicate arrives first inside a micro-batch is "
    "partition-order-dependent, but the surviving key SET is not — so "
    "the append-mode result equals batch SELECT DISTINCT exactly",
)
def s20(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ev = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
        epoch_micros(ev).alias("us"),
    )
    workdir = tempfile.mkdtemp(prefix="s20_dedupwm_")
    data_dir = os.path.join(workdir, "data")
    _write_replay_split(ev, ["us", "event_id"], data_dir, "csv", "s20")

    # delay must exceed the replay's event-time span so no key's state
    # expires mid-replay (expiry would let a late duplicate through)
    span = ev.agg(
        (F.max("us") - F.min("us")).alias("span"), F.count(F.lit(1)).alias("n")
    ).first()
    span_us = int(span["span"]) if span["n"] else 0
    delay_s = span_us // 1_000_000 + 3600
    dd = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, event_type string, vc bigint, us bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .csv(data_dir)
        .withColumn("ev_ts", F.timestamp_micros("us"))
        .withWatermark("ev_ts", f"{delay_s} seconds")
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "vc"])
        .select("user_id", "event_type", "vc")
    )
    sink = os.path.basename(workdir)
    q = (
        dd.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("s20 streaming dedup replay timed out after 600 s")
    out = spark.sql(f"SELECT * FROM {sink}").toPandas()
    return spark.createDataFrame(
        out, schema="user_id bigint, event_type string, vc bigint"
    )


def _s21_oracle() -> str:
    from ..operators import text as _text
    from .pipeline import _PII_TEXT_SQL

    counts = ",\n       ".join(
        f"CAST(sum(len(regexp_extract_all(wtext, '{p}'))) AS BIGINT) AS n_{label}"
        for label, p in _text.PII_PATTERNS.items()
    )
    scrub = "wtext"
    for label, p in _text.PII_PATTERNS.items():
        scrub = f"regexp_replace({scrub}, '{p}', '<{label.upper()}>', 'g')"
    return f"""
WITH w AS (SELECT doc_id, source, {_PII_TEXT_SQL} AS wtext FROM documents)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       {counts},
       CAST(sum(length({scrub})) AS BIGINT) AS scrub_chars
FROM w GROUP BY source
""".strip()


@register(
    "s21_stream_scrub",
    _s21_oracle(),
    doc="Streaming governance: the SAME pii_scrub operator that runs in the "
    "batch corpus (pure column expressions, operators/text.py) applied "
    "unchanged inside Structured Streaming — documents replayed as a "
    "two-file parquet stream (maxFilesPerTrigger=1 forces a batch "
    "boundary mid-corpus), scrubbed in-stream, aggregated per source in "
    "complete mode.  Complete-mode state is one row per source (bounded "
    "by construction); the final table equals the batch aggregate "
    "regardless of how records split across micro-batches — the "
    "batch/stream unification a Spark-first design buys for every "
    "stateless operator",
)
def s21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as _text
    from .pipeline import _PII_WEAVE_SPARK

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    workdir = tempfile.mkdtemp(prefix="s21_scrub_")
    data_dir = os.path.join(workdir, "data")
    _write_replay_split(d, ["doc_id"], data_dir, "parquet", "s21")

    stream = (
        spark.readStream.schema("doc_id bigint, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    )
    woven = stream.select(
        "doc_id", "source", F.expr(_PII_WEAVE_SPARK).alias("wtext")
    )
    scrubbed = _text.pii_scrub(woven, text_col="wtext", out_col="scrub")
    agg = scrubbed.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        *[
            F.sum(f"n_{label}").cast("bigint").alias(f"n_{label}")
            for label in _text.PII_PATTERNS
        ],
        F.sum(F.length("scrub")).cast("bigint").alias("scrub_chars"),
    )
    sink = os.path.basename(workdir)
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("s21 stream scrub timed out after 600 s")
    out = spark.sql(f"SELECT * FROM {sink}").toPandas()
    n_cols = ", ".join(f"n_{label} bigint" for label in _text.PII_PATTERNS)
    return spark.createDataFrame(
        out,
        schema=f"source string, n_docs bigint, {n_cols}, scrub_chars bigint",
    )


_S25_DIMS = ["l_extendedprice", "l_discount", "l_tax"]
_S25_NOTNULL = " AND ".join(
    f"{c} IS NOT NULL AND NOT isnan({c})" for c in _S25_DIMS
)
_S25_DOM = (
    " AND ".join(f"b.{c} <= a.{c}" for c in _S25_DIMS)
    + " AND ("
    + " OR ".join(f"b.{c} < a.{c}" for c in _S25_DIMS)
    + ")"
)


@register(
    "s25_stream_skyband",
    f"""
WITH p AS (
  SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_tax
  FROM lineitem
  WHERE l_orderkey % 7 = 0 AND {_S25_NOTNULL}
),
c AS (
  SELECT a.l_orderkey, a.l_linenumber, a.l_extendedprice, a.l_discount,
         (SELECT count(*) FROM p b WHERE {_S25_DOM}) AS nd
  FROM p a
)
SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
       CAST(nd AS BIGINT) AS n_dominators
FROM c WHERE nd < 3
""".strip(),
    doc="Streaming k-skyband with BOUNDED state (k=3, same dims/filter/"
    "oracle as batch s22): lineitem replayed as a two-file stream; each "
    "foreachBatch folds the batch into a running-band parquet snapshot "
    "via state' = skyband(state ∪ batch) — the running band is a "
    "certified superset of the final band (kernel fact B2) and is all "
    "the state the query ever keeps, the bounded-state analog of the "
    "cumulative streaming skyline (O24). The post-stream finalization is "
    "just skyband(final state): a true member's dominators are "
    "themselves members (B1), so counting inside the state is EXACT, and "
    "any false survivor carries >= k in-state dominators (B3), so it "
    "drops. Final answer is batch-exact regardless of how rows split "
    "across micro-batches. Snapshots go to fresh versioned dirs (never "
    "overwrite-while-reading)",
)
def s25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skyline import skyband

    k = 3
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 7 == 0)
        .select("l_orderkey", "l_linenumber", *_S25_DIMS)
    )
    workdir = tempfile.mkdtemp(prefix="s25_skyband_")
    data_dir = os.path.join(workdir, "data")
    _write_replay_split(li, ["l_orderkey", "l_linenumber"], data_dir, "csv", "s25")

    state = {"version": -1}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        cur = batch_df
        if state["version"] >= 0:
            prev = batch_df.sparkSession.read.parquet(
                os.path.join(workdir, f"v{state['version']}")
            )
            cur = prev.unionByName(cur)
        band = skyband(cur, _S25_DIMS, k=k).drop("n_dominators")
        band.write.mode("overwrite").parquet(
            os.path.join(workdir, f"v{state['version'] + 1}")
        )
        state["version"] += 1

    q = (
        spark.readStream.schema(
            "l_orderkey bigint, l_linenumber bigint, l_extendedprice double, "
            "l_discount double, l_tax double"
        )
        .option("maxFilesPerTrigger", 1)
        .csv(data_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("s25 stream skyband replay timed out after 600 s")
    final_state = spark.read.parquet(os.path.join(workdir, f"v{state['version']}"))
    return skyband(final_state, _S25_DIMS, k=k).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "n_dominators"
    )


def _s32_oracle() -> str:
    from .pipeline import _CDC_CHUNK_CTES  # ONE chunk-derivation mirror for both oracles

    return f"""
{_CDC_CHUNK_CTES}
SELECT DISTINCT md5(substr(text, s, e - s + 1)) AS chunk_md5,
       CAST(e - s + 1 AS BIGINT) AS chunk_len
FROM ch
""".strip()


@register(
    "s35_stream_cdc_watermark",
    _s32_oracle(),
    doc="Bounded-state production form of s32: CDC chunks computed "
    "in-stream (same Arrow-kernel cdc_chunks), then "
    "dropDuplicatesWithinWatermark on chunk_md5 — per-chunk state "
    "expires once the watermark passes its event time + delay, so state "
    "holds only the watermark horizon's chunks instead of growing with "
    "every distinct chunk forever (s32's dropDuplicates caveat, and the "
    "round-7 verdict's ask). Event time derives deterministically from "
    "doc_id; the replay's delay exceeds its event-time span so no state "
    "expires mid-replay and the surviving key SET equals the batch "
    "DISTINCT oracle exactly. Only (chunk_md5, chunk_len) emit, so "
    "every surviving row is value-deterministic regardless of which "
    "duplicate the state keeps",
)
def s35(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as _text

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    workdir = tempfile.mkdtemp(prefix="s35_cdcwm_")
    data_dir = os.path.join(workdir, "data")
    _write_replay_split(d, ["doc_id"], data_dir, "parquet", "s35")

    # delay must exceed the replay's event-time span (doc_id seconds) so
    # no chunk's state expires mid-replay — expiry would re-emit a late
    # duplicate and break the DISTINCT equivalence the oracle checks
    span = d.agg(
        (F.max("doc_id") - F.min("doc_id")).alias("span"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    span_s = int(span["span"]) if span["n"] else 0
    delay_s = span_s + 3600
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    )
    dd = (
        _text.cdc_chunks(stream)
        # +86400: doc_id 0 would land exactly on epoch 0 = Spark's INITIAL
        # event-time watermark, and the dedup operator drops rows at/below
        # the watermark as late — the shift keeps every event strictly
        # above it (found the hard way: one singleton chunk of doc 0
        # vanished at sf0.001)
        .withColumn("ev_ts", F.timestamp_seconds(F.col("doc_id") + F.lit(86400)))
        .withWatermark("ev_ts", f"{delay_s} seconds")
        .dropDuplicatesWithinWatermark(["chunk_md5"])
        .select("chunk_md5", "chunk_len")
    )
    sink = os.path.basename(workdir)
    q = (
        dd.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("s35 stream cdc watermark replay timed out after 600 s")
    out = spark.sql(f"SELECT chunk_md5, chunk_len FROM {sink}").toPandas()
    return spark.createDataFrame(out, schema="chunk_md5 string, chunk_len bigint")


@register(
    "s32_stream_cdc_dedup",
    _s32_oracle(),
    doc="Streaming content-defined chunk dedup: the SAME cdc_chunks "
    "operator from the batch corpus (the vectorized Arrow kernel) applied "
    "unchanged inside Structured Streaming — documents replayed as a "
    "two-file parquet stream (maxFilesPerTrigger=1 forces a batch "
    "boundary mid-corpus), chunked in-stream, and first-occurrence "
    "deduplicated with dropDuplicates state that SPANS micro-batches "
    "(a chunk seen in batch 0 must not re-emit in batch 1). Output "
    "restricted to (chunk_md5, chunk_len) so every surviving row is "
    "value-deterministic regardless of which duplicate the state keeps; "
    "the oracle is the batch DISTINCT over the same chunk derivation. "
    "Keyed state grows with distinct chunks — bounded in this replay "
    "harness; the production bounded-state form is "
    "s35_stream_cdc_watermark",
)
def s32(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as _text

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    workdir = tempfile.mkdtemp(prefix="s32_cdc_")
    data_dir = os.path.join(workdir, "data")
    _write_replay_split(d, ["doc_id"], data_dir, "parquet", "s32")

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    )
    chunks = _text.cdc_chunks(stream)
    dd = chunks.select("chunk_md5", "chunk_len").dropDuplicates(["chunk_md5"])
    sink = os.path.basename(workdir)
    q = (
        dd.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("s32 stream cdc replay timed out after 600 s")
    return spark.sql(f"SELECT chunk_md5, chunk_len FROM {sink}")


def _s37_oracle() -> str:
    from .pipeline import _WARC_PAGES_ORACLE  # ONE mirror for both warc gates

    return _WARC_PAGES_ORACLE


@register(
    "s37_stream_warc_tail",
    _s37_oracle(),
    doc="Directory-tailing crawl ingestion under the hard gate "
    "(sources/warc_datasource.py FileTailStreamReader, round-14 "
    "surface): the harness frames the documents table as plain-CL "
    ".warc.gz shards (request records interleaved; status rotates 404 "
    "at doc_id % 10 = 7) and lands them in TWO drops with "
    "lexicographically increasing names — the monotone-naming contract "
    "the O(1) filename high-water offset is built for.  Drop 1 streams "
    "through spark.readStream.format('warc') view=pages into a parquet "
    "snapshot via foreachBatch; the query then STOPS, drop 2 lands, and "
    "a SECOND stream over the SAME checkpoint resumes from the "
    "committed offset — so the gate drives the recovery path "
    "(initialOffset -> committed watermark -> partitions(lo, hi]) as "
    "well as the live tail; a re-emit of drop 1 would double those "
    "doc_ids and fail the oracle hash.  The final snapshot is also "
    "asserted row-identical (exceptAll both ways) to the BATCH "
    "format('warc') read of the full directory — the snapshot-equals-"
    "batch contract — before being projected to the same closed-form "
    "documents oracle as x_warc_extract (shared _WARC_PAGES_ORACLE, "
    "zero drift).  Harness fixture-write is driver-side and row-capped; "
    "in production the landing dir is an object-store drop and only the "
    "stream runs.",
)
def s37(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import warc as warc_src
    from ..sources import warc_datasource

    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("text").isNotNull())
    )
    pdf = d.orderBy("doc_id").limit(200_001).toPandas()
    if len(pdf) > 200_000:
        raise RuntimeError(
            "s37_stream_warc_tail is a correctness harness with a "
            "driver-side fixture write, capped at 200k docs; run it at a "
            "smaller sf"
        )
    warc_datasource.register(spark)
    workdir = tempfile.mkdtemp(prefix="s37_warc_tail_")
    landing = os.path.join(workdir, "landing")
    out_dir = os.path.join(workdir, "out")
    ckpt = os.path.join(workdir, "ckpt")
    os.makedirs(landing)

    def write_shard(fid: int) -> None:
        rows = pdf[pdf["doc_id"] % 8 == fid].sort_values("doc_id")
        blob = bytearray()
        for r in rows.itertuples():
            body = str(r.text).encode("utf-8")
            status = 404 if r.doc_id % 10 == 7 else 200
            http = (
                f"HTTP/1.1 {status} X\r\nContent-Type: "
                f"text/plain; charset=utf-8\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
            blob += warc_src.write_warc_record(
                "request",
                b"GET / HTTP/1.1\r\n\r\n",
                record_id=f"<urn:req:{r.doc_id}>",
                target_uri=f"https://fixture.invalid/{r.doc_id}",
            )
            blob += warc_src.write_warc_record(
                "response",
                http,
                record_id=f"<urn:doc:{r.doc_id}>",
                target_uri=f"https://fixture.invalid/{r.doc_id}",
                content_type="application/http;msgtype=response",
            )
        with open(os.path.join(landing, f"part-{fid:04d}.warc.gz"), "wb") as f:
            f.write(bytes(blob))

    def run_tail_leg() -> None:
        q = (
            spark.readStream.format("warc")
            .option("path", landing)
            .option("pattern", "*.warc.gz")
            .option("view", "pages")
            .load()
            .writeStream.foreachBatch(
                lambda batch_df, _bid: batch_df.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        q.awaitTermination(60)

    try:
        for fid in range(4):  # drop 1
            write_shard(fid)
        run_tail_leg()
        for fid in range(4, 8):  # drop 2: names sort ABOVE drop 1
            write_shard(fid)
        run_tail_leg()  # fresh stream, SAME checkpoint: recovery path

        snapshot = spark.read.parquet(out_dir)
        # snapshot-equals-batch: the streamed union must be row-identical
        # to one batch DataSource read of the full landing directory
        batch = (
            spark.read.format("warc")
            .option("path", landing)
            .option("pattern", "*.warc.gz")
            .option("view", "pages")
            .load()
        )
        missing = batch.exceptAll(snapshot).count()
        extra = snapshot.exceptAll(batch).count()
        if missing or extra:
            raise RuntimeError(
                f"streamed snapshot diverges from batch read: "
                f"{missing} missing, {extra} extra rows"
            )
        out = snapshot.select(
            F.regexp_extract("record_id", r"<urn:doc:(\d+)>", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("http_status").cast("bigint").alias("http_status"),
            F.col("content_type"),
            F.octet_length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
            F.md5(F.encode("text", "UTF-8")).alias("body_md5"),
        )
        # materialize (row-capped input) so the tmpdir can be removed
        # before returning — a lazy scan would pin it for the caller
        res = out.toPandas()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    schema = (
        "doc_id bigint, http_status bigint, content_type string, "
        "n_bytes bigint, body_md5 string"
    )
    return spark.createDataFrame(res, schema=schema)
