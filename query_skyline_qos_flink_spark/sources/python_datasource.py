"""Custom Python DataSource: ``spark.read.format("skyline_points")``.

The reference feeds its engine from external producer processes
(``/root/reference/python/unified_producer.py:50-123`` writing CSV into
Kafka).  This is the Spark-4 native shape of that idea: the point
generator as a FIRST-CLASS connector via the Python DataSource API
(SPARK-44076), so any consumer — including plain SQL users — can do

    spark.read.format("skyline_points")
         .option("n", 1_000_000).option("d", 3)
         .option("distribution", "anti_correlated")
         .load()

Scale shape: ``partitions()`` splits the row range into
``ceil(n / rows_per_partition)`` independent slices; each executor task
generates only its slice with a numpy Generator seeded by
``(seed, partition_index)`` — fully deterministic, no cross-partition
coordination, linear scale-out.  (The column-expression generator in
``generators.py`` is the faster JVM path for in-engine benchmarks; this
connector exists for the external-consumer surface and uses its own RNG
stream, so the two produce different — equally valid — draws of the same
distribution.)

Distributions mirror ``generators.py`` (uniform / correlated /
anti_correlated with the d-dependent anti-diagonal thickness).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .generators import EPSILON

_DEFAULT_ROWS_PER_PARTITION = 250_000


class _Slice(InputPartition):
    def __init__(self, index: int, start: int, end: int):
        self.index, self.start, self.end = index, start, end


class SkylinePointsDataSource(DataSource):
    """Options: n (rows; batch only), d (dims), distribution, domain, seed,
    rows_per_partition (batch), rows_per_batch (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "skyline_points"

    def schema(self) -> str:
        d = int(self.options.get("d", 2))
        return "id bigint, " + ", ".join(f"v{i} double" for i in range(d))

    def reader(self, schema) -> "SkylinePointsReader":
        return SkylinePointsReader(self.options)

    def simpleStreamReader(self, schema) -> "SkylinePointsStreamReader":
        return SkylinePointsStreamReader(self.options)


class SkylinePointsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.d = int(options.get("d", 2))
        self.distribution = options.get("distribution", "uniform")
        if self.distribution not in ("uniform", "correlated", "anti_correlated"):
            raise ValueError(f"unknown distribution {self.distribution!r}")
        self.domain = float(options.get("domain", 10000.0))
        self.seed = int(options.get("seed", 42))
        self.rows_per_partition = int(
            options.get("rows_per_partition", _DEFAULT_ROWS_PER_PARTITION)
        )

    def partitions(self):
        step = max(1, self.rows_per_partition)
        return [
            _Slice(i, s, min(s + step, self.n))
            for i, s in enumerate(range(0, self.n, step))
        ]

    def read(self, partition: _Slice):
        yield from _gen_rows(self, partition.start, partition.end, partition.index)


def _gen_rows(options_like, start: int, end: int, stream_index: int):
    """Shared slice generator for batch partitions and stream batches."""
    import numpy as np

    o = options_like
    rng = np.random.default_rng((o.seed, stream_index))
    m = end - start
    lo, hi = 0.0, o.domain
    span = hi - lo
    if o.distribution == "uniform":
        vals = np.floor(rng.random((m, o.d)) * (span + 1) + lo)
    elif o.distribution == "correlated":
        base = rng.random((m, 1)) * span + lo
        noise = (rng.random((m, o.d)) - 0.5) * span * (1 - 0.9)
        vals = np.floor(base + noise)
    else:  # anti_correlated
        eps = EPSILON.get(o.d, o.d * 0.5)
        direction = rng.random((m, o.d))
        direction /= direction.sum(axis=1, keepdims=True)
        target = o.d * (span / 2.0) + (rng.random((m, 1)) - 0.5) * span * eps
        vals = np.floor(direction * target + lo)
    vals = np.clip(vals, lo, hi)
    import numpy as _np

    ids = _np.arange(start, end, dtype=_np.int64)
    for i in range(m):
        yield (int(ids[i]), *map(float, vals[i]))


class SkylinePointsStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: the reference's continuous producer
    (``unified_producer.py`` pushing into Kafka) as a native
    ``readStream.format("skyline_points")`` source.  Offsets are plain row
    counts; micro-batch k deterministically replays rows
    ``[k*rows_per_batch, (k+1)*rows_per_batch)`` from the same seeded RNG
    stream as the batch reader, so a restart from a checkpoint regenerates
    identical data (exactly-once replay without any external log)."""

    def __init__(self, options):
        self.n = int(options.get("n", 0))  # 0 = unbounded
        self.d = int(options.get("d", 2))
        self.distribution = options.get("distribution", "uniform")
        if self.distribution not in ("uniform", "correlated", "anti_correlated"):
            raise ValueError(f"unknown distribution {self.distribution!r}")
        self.domain = float(options.get("domain", 10000.0))
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rows_per_batch", 10_000))

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start: dict):
        # NOTE: must return a picklable ITERATOR (the runtime caches rows
        # driver-side for replay): a generator can't pickle, a bare list
        # isn't an iterator — a list_iterator is both
        s = int(start["offset"])
        e = s + self.rows_per_batch
        if self.n:
            e = min(e, self.n)
        if e <= s:
            return iter([]), {"offset": s}
        batch_index = s // max(self.rows_per_batch, 1)
        return iter(list(_gen_rows(self, s, e, batch_index))), {"offset": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        s, e = int(start["offset"]), int(end["offset"])
        batch_index = s // max(self.rows_per_batch, 1)
        return iter(list(_gen_rows(self, s, e, batch_index)))

    def commit(self, end: dict) -> None:
        pass  # nothing external to clean up — batches are regenerable


def register(spark) -> None:
    """Register the connector on a session (idempotent)."""
    spark.dataSource.register(SkylinePointsDataSource)
