"""Tombstone density rung (r13, r12 verdict task #6): measure the
index-probe wall at sf0.1 under 0 / 1k / 100k standing tombstones —
the deletion-volume axis the r12 tombstone tests covered only with
empty/small fixtures.

What it pins, numerically:

* the zero-overhead-when-empty claim (`bucketing.filter_tombstoned`
  returns the input untouched when no tombstone table exists), and
* that the broadcast anti-join's probe cost stays ∝ deletions: the
  tombstone side is the BROADCAST side of a LeftAnti riding the
  map-side corpus scan, so 100k standing deletions should cost the
  probe roughly the broadcast build of 100k (id, gen) rows — never a
  corpus shuffle.

Tombstone ids beyond the corpus size are synthetic (nonexistent ids
cost the anti-join's hash build exactly the same as real ones), so the
rung measures the MECHANISM at volumes a real takedown backlog reaches
even when the local test corpus is small.

This writes `tombrung_*` tables into the session warehouse and drops
them on exit; TIMING ONLY, the oracle gate never touches it.

Usage: python tools/run_tombstone_rung.py [runs]   (default 3)
Prints one JSON line:
  {"probe_sec": {"0": s, "1000": s, "100000": s}, "runs": N, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = "/root/testdata/sf0.1"
BASE = "tombrung_mh"
VOLUMES = (0, 1_000, 100_000)


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from pyspark.sql import functions as F

    from rq_spark.bucketing import add_tombstones, clear_tombstones
    from rq_spark.operators import dedup as D
    from rq_spark.queries.helpers import table
    from rq_spark.session import get_spark
    from rq_spark.util import release_all_caches

    spark = get_spark("rq_spark_tombstone_rung")
    docs = table(spark, SF1, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    out: dict[str, float] = {}
    try:
        D.write_minhash_index(corpus, "text", "doc_id", BASE)

        def probe_once() -> float:
            release_all_caches()
            spark.catalog.clearCache()
            t0 = time.time()
            D.incremental_minhash_pairs_from_index(
                spark, batch, "text", "doc_id", BASE
            ).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        probe_once()  # codegen warm (uncounted)
        for n in VOLUMES:
            clear_tombstones(spark, BASE)
            if n:
                ids = spark.range(10_000_000, 10_000_000 + n).select(
                    F.col("id").alias("doc_id")
                )
                add_tombstones(spark, BASE, ids, "doc_id")
            # min-of-N: the rung compares mechanism overhead between
            # volumes on one box in one sitting; min is the least
            # noise-contaminated estimator for that comparison
            out[str(n)] = round(min(probe_once() for _ in range(runs)), 3)
    finally:
        for t in ("bands", "shingles", "meta", "state", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {BASE}_{t}")
    print(
        json.dumps(
            {
                "probe_sec": out,
                "runs": runs,
                "sf": 0.1,
                "corpus_docs": corpus.count(),
                "batch_docs": batch.count(),
            }
        )
    )


if __name__ == "__main__":
    main()
