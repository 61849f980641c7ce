"""Dump ``explain("formatted")`` for declared queries to plans/$PLANS_ROUND (default r17)/.

Usage::

    python tools/dump_plans.py <tag> [query ...]

Writes ``plans/<round>/<name>_<tag>.txt`` for each query (default: every
entry of bench.py's CORPUS_QUERIES).  ``tag`` is ``before``/``after``
per the optimization-round deliverable.  Plans are captured from the
same session config the bench uses (get_spark), at $SPARK_GRAFT_SF_DIR
(default sf0.1), WITHOUT executing the query — explain is plan-time.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_skyline_qos_flink_spark.plans import corpus  # noqa: E402
from query_skyline_qos_flink_spark.plans import (  # noqa: E402, F401  (register)
    pipeline,
    relational,
    streaming_replay,
)
from query_skyline_qos_flink_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", os.environ.get("PLANS_ROUND", "r17"))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import bench

        names = bench.CORPUS_QUERIES
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name=f"dump-plans-{tag}")
    for name in names:
        spec = corpus.spec(name)
        try:
            df = spec.fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # keep going; record the failure
            text = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {SF_DIR} [{tag}]\n")
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
