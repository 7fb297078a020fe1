"""Local replica of the driver's DuckDB correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, compares row count, sorted column names,
and an order-insensitive multiset of stringified rows.

Values are compared AFTER pandas conversion (``toPandas()`` /
``duckdb .df()``), because that is demonstrably how the driver hashes:
round 1's ``salted_route_agg`` had identical Python-level values but
``hash_match:false`` — DuckDB's HUGEINT ``sum()`` becomes float64
(294.0) in pandas while Spark's LONG stays int64 (294). Comparing the
raw ``fetchall()`` ints would hide exactly that class of mismatch, so
this tool reproduces the pandas path: a type-family difference
(int vs float vs decimal) IS a value difference here, as it is for the
driver.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import os
import sys
from collections import Counter
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    # pandas NaN/NaT/None unify to "null" (both engines render missing
    # values as one of these after conversion)
    if v is None or v is pd.NaT:
        return "null"
    if isinstance(v, float) and v != v:  # NaN
        return "null"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (np.floating, float)):
        return repr(round(float(v), 9))
    if isinstance(v, Decimal):
        # Decimal is its own family: DuckDB's decimal sum vs Spark's
        # double/long must NOT silently compare equal
        return "dec:" + str(v.normalize())
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).hex()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if hasattr(v, "asDict"):  # Spark Row (struct column)
        d = v.asDict(recursive=False)
        return "{" + ",".join(f"{k}:{norm_value(d[k])}" for k in sorted(d)) + "}"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_value(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_value(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from logstash_filter_elasticsearch_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            scols = list(spdf.columns)
            srows = list(spdf.itertuples(index=False, name=None))
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows")
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
            dcols = list(dpdf.columns)
            drows = list(dpdf.itertuples(index=False, name=None))
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema spark={sorted(scols)} duckdb={sorted(dcols)}")
        else:
            ms, md = rows_to_multiset(scols, [tuple(r) for r in srows]), rows_to_multiset(
                dcols, drows
            )
            if ms != md:
                diff_s = list((ms - md).items())[:3]
                diff_d = list((md - ms).items())[:3]
                problems.append(f"values spark-only={diff_s} duckdb-only={diff_d}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)[:500]}")
        else:
            print(f"ok    {name}: {len(srows)} rows")

    print(f"\n{len(failures)} failures" if failures else "\nALL MATCH")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
