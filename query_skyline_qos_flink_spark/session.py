"""SparkSession factory with the engine's tuned defaults.

Local-mode testing profile; the same settings are what we would ship as
cluster defaults (AQE on, Arrow on, sane shuffle parallelism).  On a real
cluster ``spark.sql.shuffle.partitions`` should be ~2-3x total cores and
AQE coalescing handles the rest.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def get_spark(app_name: str = "skyline-engine", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Arrow batch size plays the role of the reference's 5,000-row BNL
        # buffer (FlinkSkyline.java:232) for the mapInPandas skyline kernel.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # If events.ts ships as parquet TIMESTAMP(NANOS) this reads it as
        # bigint nanos; a no-op on timestamp[us] fixtures.  epoch_micros()
        # dispatches on whichever dtype actually arrives.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    # The daemon override is gated on a local[*] master: the daemon
    # module must be importable by the EXECUTOR-side interpreter at
    # daemon launch, which holds trivially in local mode (same machine,
    # PYTHONPATH exported below) but NOT for cluster deployments that
    # ship the package via --py-files/--archives — those distribute code
    # AFTER the daemon starts, so the override would fail python-worker
    # startup cluster-wide.  On a cluster, install the package on the
    # executor images (pip/conda) and set spark.python.daemon.module
    # yourself; SPARK_GRAFT_NO_PRELOAD_DAEMON=1 opts local mode out too.
    if master.startswith("local") and not os.environ.get(
        "SPARK_GRAFT_NO_PRELOAD_DAEMON"
    ):
        # Pre-import the Arrow/pandas stack ONCE per executor in the
        # python-worker daemon; forked workers inherit it copy-on-write
        # (see spark_daemon.py — a 32-worker import storm costs ~20 s of
        # CPU that otherwise contends with running kernels; preloaded
        # forks measure 0.06 s with zero import CPU).  The executor-side
        # interpreter must be able to import the package, so export it
        # onto PYTHONPATH before the JVM (which inherits this env) starts.
        pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        existing = os.environ.get("PYTHONPATH", "")
        if pkg_parent not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                pkg_parent + (os.pathsep + existing if existing else "")
            )
        builder = builder.config(
            "spark.python.daemon.module",
            "query_skyline_qos_flink_spark.spark_daemon",
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Per-session memo of the LAZY DataFrame handle for each (sf_dir, table):
# spark.read.parquet() pays a driver-side file listing + footer/schema
# read per call (~0.2 s measured — r13's six loads cost 1.25 s of its
# 1.5 s warm build, round-16 cProfile), re-paid by every query build and
# every bench rep.  Memoizing the handle is plan-level, NOT result
# caching: the relation is unevaluated, every action still scans the
# parquet files — the same class as Spark's own per-session file-index
# cache (spark.sql.hive.filesourcePartitionFileCacheSize), made explicit
# because each read.parquet() call builds a fresh InMemoryFileIndex.
# Keyed weakly on the session so a stopped session's handles die with it.
# Trade-off (same as Spark's listing cache): files ADDED to a table dir
# mid-session are not picked up by cached handles; the fixture tables
# are immutable and ad-hoc/temp paths get their own keys.
from weakref import WeakKeyDictionary  # noqa: E402

_TABLE_HANDLES: "WeakKeyDictionary[SparkSession, dict]" = WeakKeyDictionary()


def load(spark: SparkSession, sf_dir: str, name: str):
    # Defensive: sessions not built by get_spark() (the driver's vanilla
    # session) must still read parquet TIMESTAMP(NANOS) fixtures, which
    # rounds 1-3 shipped — without this runtime conf Spark refuses the
    # type at schema read ("Illegal Parquet type"), before epoch_micros'
    # dtype dispatch can run.  A no-op on timestamp[us] fixtures.
    # Also pin UTC: epoch_micros_sql uses unix_micros(cast(ts as timestamp)),
    # which is session-timezone-dependent for timestamp_ntz fixtures.
    # get_spark() already pins UTC, but a vanilla (driver) session on a
    # non-UTC host would silently diverge from DuckDB's epoch_us oracle.
    # Re-asserted on EVERY call (two ~1 ms conf sets), cache hit or miss:
    # a mid-session timezone reset must not survive a memoized handle.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # pragma: no cover - conf locked down
        pass
    try:
        cache = _TABLE_HANDLES.setdefault(spark, {})
    except TypeError:  # pragma: no cover - unweakrefable session proxy
        cache = {}
    path = table_path(sf_dir, name)
    # (size, mtime) in the key (r16 ADVICE): a table rewritten in place
    # mid-session (fixture regeneration, dev loops) gets a fresh handle
    # instead of a stale InMemoryFileIndex serving deleted files.  One
    # stat() per call; directory tables key on the dir's own stat (adds/
    # removes bump it; an in-place rewrite INSIDE an unchanged dir is
    # still the documented immutable-fixtures trade-off).
    try:
        st = os.stat(path)
        stamp = (st.st_size, st.st_mtime_ns)
    except OSError:
        stamp = None
    key = (os.path.realpath(sf_dir), name)
    hit = cache.get(key)
    if hit is not None and hit[0] == stamp:
        return hit[1]
    # stamp changed: REPLACE the entry (keying on the stamp instead would
    # accumulate one stale handle per rewrite — round-17 review finding)
    df = spark.read.parquet(path)
    cache[key] = (stamp, df)
    return df


def epoch_micros_sql(df: DataFrame, col: str = "ts") -> str:
    """SQL fragment yielding epoch *microseconds* (bigint) from an event-time
    column, tolerant of both fixture encodings of ``events.ts``:

    * parquet TIMESTAMP(NANOS) read as bigint nanos (via the
      ``spark.sql.legacy.parquet.nanosAsLong`` session conf) -> ``div 1000``;
    * parquet ``timestamp[us]`` / timestamp_ntz -> ``unix_micros`` (session
      timezone is UTC, matching DuckDB ``epoch_us(ts)`` in the oracles).
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return f"({col} div 1000)"
    return f"unix_micros(cast({col} as timestamp))"


def epoch_micros(df: DataFrame, col: str = "ts") -> Column:
    """Column form of :func:`epoch_micros_sql` (epoch micros, bigint)."""
    return F.expr(epoch_micros_sql(df, col))
