"""Local mimic of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and ``oracle_sql()[name]`` on
DuckDB at the given scale factor, then compares row count, sorted
column names, dtype compatibility, and an order-insensitive value hash
(strict normalization: exact float repr, ISO timestamps). If this
passes, any reasonable driver comparison passes.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
import traceback
from datetime import date, datetime
from decimal import Decimal

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return f"{type(v).__name__}:{v}"


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from rq_spark.session import get_spark

    spark = get_spark("check_oracle", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, passes, rows_only = [], [], []

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception:
            failures.append((name, "SPARK-ERROR"))
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            continue
        finally:
            # a finished key's pinned working set (shingle caches,
            # tokenizations) must not occupy storage memory for the
            # rest of the gate — same hygiene as bench.py
            from rq_spark.util import release_all_caches

            release_all_caches()
            spark.catalog.clearCache()
        if name not in oracles:
            rows_only.append(name)
            print(f"rows  {name}: {len(srows)} rows (rows-only, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            orows = [tuple(r) for r in rel.fetchall()]
            ocols = list(rel.columns)
        except Exception:
            failures.append((name, "DUCKDB-ERROR"))
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            continue

        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        elif value_hash(srows, scols) != value_hash(orows, ocols):
            problems.append("value-hash mismatch")
            # show a sample diff for debugging
            sset = {
                "|".join(_norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                for r in srows
            }
            oset = {
                "|".join(_norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                for r in orows
            }
            for x in list(sset - oset)[:3]:
                print(f"      spark-only: {x[:200]}")
            for x in list(oset - sset)[:3]:
                print(f"      duck-only:  {x[:200]}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            passes.append(name)
            print(f"ok    {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")

    print(
        f"\n{len(passes)} ok, {len(rows_only)} rows-only, {len(failures)} failed"
        + (f": {[f[0] for f in failures]}" if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
