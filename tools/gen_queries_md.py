"""Regenerate QUERIES.md from the plans/ registry.

Usage: python tools/gen_queries_md.py   (writes QUERIES.md at the repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_skyline_qos_flink_spark.plans import corpus  # noqa: E402
from query_skyline_qos_flink_spark.plans import (  # noqa: E402, F401  (register)
    pipeline,
    relational,
    streaming_replay,
)

HEADER = """# QUERIES — the registered corpus (generated from plans/ registry)

Every entry is exported through `__spark_entry__.queries()`; **oracle**
entries also export duckdb SQL via `oracle_sql()` and are hash-gated;
**rows-only** entries would be float-summation-order-sensitive scale paths
(none currently — every registered query carries an oracle).

Regenerate with `python tools/gen_queries_md.py`.

| Query | Gate | What it exercises |
|---|---|---|
"""


def main() -> None:
    out = HEADER
    for name, spec in corpus.REGISTRY.items():  # registration order
        gate = "oracle" if spec.oracle else "rows-only"
        doc = " ".join((spec.doc or "").split())
        out += f"| `{name}` | {gate} | {doc} |\n"
    out += f"\nTotal: **{len(corpus.REGISTRY)} queries**, " + (
        f"{sum(1 for s in corpus.REGISTRY.values() if s.oracle)} oracle-gated.\n"
    )
    if corpus.RETIRED_ANCHORS:
        out += (
            "\n## Retired anchors (pytest-only oracle gates)\n\n"
            "Correctness-anchor twins that yielded their registry slots to\n"
            "the driver-gate rotation budget; each keeps the identical\n"
            "fn-vs-oracle hash gate in `tests/test_exact_anchors.py` at\n"
            "sf0.001. The bracketed note names the gated query that\n"
            "subsumes each one's oracle shape.\n\n"
            "| Anchor | What it was |\n|---|---|\n"
        )
        for name, spec in corpus.RETIRED_ANCHORS.items():
            doc = " ".join((spec.doc or "").split())
            out += f"| `{name}` | {doc} |\n"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "QUERIES.md"), "w") as f:
        f.write(out)
    print(f"wrote QUERIES.md ({len(corpus.REGISTRY)} queries)")


if __name__ == "__main__":
    main()
