"""Aggregate Python-worker CPU per module for any catalog query.

Wraps PySpark's UDF profiler (``spark.sql.pyspark.udf.profiler =
"perf"`` + ``spark.profile.show``) and rolls the per-UDF pstats up to
(a) module self-time and (b) fixed-overhead buckets, because the raw
output for a many-stage plan is thousands of lines in which the real
signal — import cost repeated per worker, Arrow IPC wait, actual
kernel time — is invisible.

This analysis found the r9 mm_real_decode win: 29 chained MapInPandas
stages spent ~700 s of summed worker CPU re-importing pandas/numpy
(one Python worker PROCESS per chained stage per task slot) against
~30 s of codec work. Rule of thumb: if `imports` rivals your kernel
modules, fuse stages; if `arrow-ipc-wait` dominates everything, the
workers are starved by an upstream stage, not slow themselves.

Usage (MUST run from the repo root, or workers fail to import
rq_spark):

    python tools/profile_udfs.py <query_key> [sf_dir]
"""

from __future__ import annotations

import collections
import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# pstats line: ncalls tottime percall cumtime percall file:lineno(func)
_LINE = re.compile(
    r"^\s*[\d/]+\s+([\d.]+)\s+[\d.]+\s+[\d.]+\s+[\d.]+\s+(\S+?):\d+\((.+)\)"
)
_HDR = re.compile(r"function calls .* in ([\d.]+) seconds")

# fixed-overhead buckets, checked in order (first match wins)
_BUCKETS = (
    ("arrow-ipc-wait", re.compile(r"ipc\.py$")),
    ("imports", re.compile(
        r"(marshal\.loads|_imp\.|importlib|_bootstrap|io\.open_code)")),
    ("codegen/compile", re.compile(r"builtins\.compile")),
)


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    key = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from rq_spark.queries import all_queries
    from rq_spark.session import get_spark

    spark = get_spark(f"profile_{key}")
    spark.conf.set("spark.sql.pyspark.udf.profiler", "perf")
    all_queries()[key](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    buf = io.StringIO()
    stdout, sys.stdout = sys.stdout, buf
    try:
        spark.profile.show(type="perf")
    finally:
        sys.stdout = stdout

    mods: collections.Counter = collections.Counter()
    buckets: collections.Counter = collections.Counter()
    n_udfs = 0
    total = 0.0
    for line in buf.getvalue().splitlines():
        if line.startswith("Profile of UDF"):
            n_udfs += 1
            continue
        h = _HDR.search(line)
        if h:
            total += float(h.group(1))
            continue
        m = _LINE.match(line)
        if not m:
            continue
        self_t, path, func = float(m.group(1)), m.group(2), m.group(3)
        # built-in frames print as "{built-in ...}" — keep the function
        # name in their rollup label or they all collapse to one row
        tag = f"{path}:{func}" if path.startswith("{") else path
        for name, pat in _BUCKETS:
            if pat.search(path) or pat.search(func):
                buckets[name] += self_t
                break
        else:
            mods[tag.split("/")[-1]] += self_t

    print(f"query={key} sf={sf_dir}")
    print(f"python UDF nodes: {n_udfs}; summed worker seconds: {total:.1f}")
    print("\nfixed-overhead buckets (self s):")
    for k, v in buckets.most_common():
        print(f"  {v:9.2f}  {k}")
    print("\ntop modules by self time (s):")
    for k, v in mods.most_common(20):
        print(f"  {v:9.2f}  {k}")
    # NOTE: profiling itself costs 2-3x (cProfile) — read SHARES, not
    # absolute seconds, and A/B wall-clock separately without it.


if __name__ == "__main__":
    main()
