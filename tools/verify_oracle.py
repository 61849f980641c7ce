"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
duckdb at the given sf dir, then compares row count, schema width, and an
order-insensitive value hash (columns sorted by name, rows sorted
canonically, values stringified with float normalization).

Usage: python tools/verify_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import decimal
import hashlib
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_value(v):
    # Unwrap numpy scalars (np.int64 -> int, np.float64 -> float, np.bool_
    # -> bool) WITHOUT collapsing the int/float distinction: the driver
    # hashes the Arrow-typed oracle values, so a duckdb HUGEINT that exports
    # as float64 3.0 must NOT canonicalize equal to Spark's bigint 3.
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        # A decimal here means the oracle exported HUGEINT/DECIMAL through
        # Arrow — the driver hashes that differently from Spark's bigint, so
        # keep the type visible instead of letting str(Decimal('3')) == '3'.
        return f"decimal:{v}"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from query_skyline_qos_flink_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {t_spark:.1f}s spark, no oracle)")
            continue
        t0 = time.time()
        try:
            # Fetch via Arrow -> pandas, mirroring the driver's comparator:
            # duckdb fetchall() converts HUGEINT to Python int and hides the
            # decimal128/float64 export artifact the driver's hash sees.
            otbl = con.execute(oracles[name]).arrow()
            ocols = list(otbl.column_names)
            opdf = otbl.to_pandas()
            orows = [tuple(r) for r in opdf.itertuples(index=False, name=None)]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failures.append(name)
            continue
        t_oracle = time.time() - t0
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            hs, ho = table_hash(scols, srows), table_hash(ocols, orows)
            if hs != ho:
                problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} (spark {t_spark:.1f}s, oracle {t_oracle:.1f}s)")
            failures.append(name)
        else:
            print(f"PASS {name}: {len(srows)} rows (spark {t_spark:.1f}s, oracle {t_oracle:.1f}s)")
    print("----")
    if failures:
        print("FAILURES:", ", ".join(failures))
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
