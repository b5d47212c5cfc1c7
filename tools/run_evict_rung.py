"""Eviction-volume rung (r13): measure `evict_nodes` wall at sf0.1
across deletion rates (~0.1% / ~3% / ~20% of the corpus) against ONE
fixed standing label set — pinning numerically that the takedown
closure's cost scales with the TOUCHED COMPONENTS, not the corpus:
the standing labels/edges are scanned map-side regardless of rate (a
fixed floor), and only the re-clustered subgraph grows with the
deletion set.

The standing fixed point is built once and localCheckpointed (as a
real loop would — yesterday's labels are materialized); each rate
times only the evict plan's execution (noop write), min-of-N.

Usage: python tools/run_evict_rung.py [runs]   (default 3)
Prints one JSON line:
  {"evict_sec": {"0.1%": s, "3%": s, "20%": s}, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = "/root/testdata/sf0.1"
RATES = (("0.1%", 1000), ("3%", 31), ("20%", 5))


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from pyspark.sql import functions as F

    from rq_spark.operators import dedup as D
    from rq_spark.queries.dedup import _JACCARD_T
    from rq_spark.queries.helpers import table
    from rq_spark.session import get_spark
    from rq_spark.util import persist_tracked, release_caches

    spark = get_spark("rq_spark_evict_rung")
    docs = table(spark, SF1, "documents")
    pairs = persist_tracked(
        D.minhash_dedup_pairs(docs, "text", "doc_id", threshold=_JACCARD_T),
        scope="evict_rung",
    )
    nodes = docs.select(F.col("doc_id").alias("node"))
    labels = D.connected_components(
        pairs, nodes, scope="evict_rung_cc"
    ).localCheckpoint()
    edges = pairs.localCheckpoint()
    n_docs = docs.count()
    out: dict[str, float] = {}
    touched: dict[str, int] = {}
    for tag, mod in RATES:
        deleted = nodes.filter((F.col("node") % mod) == 3)
        touched[tag] = (
            labels.join(F.broadcast(deleted), "node", "left_semi")
            .select("rep")
            .distinct()
            .count()
        )

        def once() -> float:
            release_caches("evict_rung_run")
            t0 = time.time()
            D.evict_nodes(
                labels, edges, deleted, scope="evict_rung_run"
            ).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        once()  # codegen warm per rate (uncounted)
        out[tag] = round(min(once() for _ in range(runs)), 3)
    print(
        json.dumps(
            {
                "evict_sec": out,
                "touched_components": touched,
                "runs": runs,
                "sf": 0.1,
                "docs": n_docs,
            }
        )
    )


if __name__ == "__main__":
    main()
