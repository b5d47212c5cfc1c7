"""bench.py-methodology timing for a subset of keys: sf0.001 warmup,
noop sink, N timed runs, median. Usage:
  python tools/time_key.py key [key ...] [--runs N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    argv = sys.argv[1:]
    runs = 3
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i : i + 2]
    args = argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")

    from rq_spark.queries import all_queries
    from rq_spark.session import get_spark
    from rq_spark.util import release_all_caches

    spark = get_spark("time_key")
    qs = all_queries()
    for name in args:
        fn = qs[name]
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        release_all_caches()
        spark.catalog.clearCache()
        samples = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            release_all_caches()
            spark.catalog.clearCache()
        print(
            f"{name}: median {statistics.median(samples):.3f}s "
            f"samples {[round(s, 3) for s in samples]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
