"""Python-worker daemon that pre-imports the heavy Arrow/pandas stack.

Spark forks one Python worker per concurrent task slot from a
per-executor daemon process (``pyspark/daemon.py``); a freshly forked
worker inherits the daemon's imported modules via copy-on-write, so
every import done HERE — once per executor — is an import NO worker
pays at fork time.  Stock ``pyspark.daemon`` imports ``pyspark.worker``
but not pandas/pyarrow/numpy: those load lazily inside each worker when
the first Arrow batch is deserialized.

Why it matters (measured, round 14, local[32]): 32 workers importing
that stack simultaneously cost ~0.9 s wall and **~20 s of CPU** — CPU
that contends with whatever kernels are actually running when the pool
grows mid-session (the fork storms observed alongside the
``skyline_anti_3d_1m`` cache regressions, SCALE.md).  The same 32
forks from a preloaded parent measure 0.06 s wall with zero import
CPU.  At cluster scale the arithmetic is per executor: the import tax
is paid once per executor instead of once per worker slot × every
pool growth.

Cost: the daemon process holds the imported stack resident (~150 MB)
once per executor; forked workers share those pages copy-on-write.

Wiring: ``session.get_spark`` sets ``spark.python.daemon.module`` to
this module (and exports the package onto ``PYTHONPATH`` for the
executor-side interpreter) unless ``SPARK_GRAFT_NO_PRELOAD_DAEMON`` is
set.  The module ends by delegating to the stock ``pyspark.daemon``
manager, so worker-module selection (``sys.argv``) and the fork/reuse
protocol are byte-for-byte Spark's own.
"""

from __future__ import annotations

import os

# The preload set: everything a pandas-UDF worker imports before it can
# run a kernel.  pyspark.sql.pandas.serializers transitively pulls the
# Arrow<->pandas conversion layer; pyspark.worker is the worker main.
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyspark.sql.pandas.serializers  # noqa: F401
import pyspark.worker  # noqa: F401
from pyspark.daemon import manager

# fork-inherited marker so tests (and kernels, if ever needed) can prove
# their worker was forked from the preloading daemon
os.environ["SPARK_GRAFT_PRELOAD_DAEMON"] = "1"

if __name__ == "__main__":
    manager()
