"""Time the heaviest catalog keys at sf0.1 vs a constructed 3x corpus
(tools/make_scale_ladder.py) and print per-key scaling exponents — the
scale-ladder datapoints (r10, r9 verdict task #4; r11 density rung,
r10 verdict task #3).

Runs INTERLEAVED (sf0.1 run, 3x run, per key, repeated) so ambient
load hits both rungs of each pair; reports min-of-N per rung and the
observed exponent log(t_3x / t_1x) / log(3). Exponent ~1 = linear in
corpus size; >1.3 flags a superlinear key for SURVEY documentation.

Keys may be catalog keys ("dedup_text") or bench branch solos
("dedup_text/cdc_dup", resolved via rq_spark.bench_branches) so the
density rung can time exactly the verify-join branches the duplicate
rate stresses.

Usage: python tools/run_scale_ladder.py [runs] [sf3_dir] [key ...]
Defaults: 2 /tmp/rq_scale/sf0.3 <the five heaviest catalog keys>
Density rung: python tools/run_scale_ladder.py 2 /tmp/rq_scale/sf0.3d \\
    dedup_text dedup_incremental dedup_text/cdc_dup \\
    dedup_text/ngram_jaccard dedup_incremental/sem_decontam
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEYS = (
    "dedup_text",
    "dedup_incremental",
    "dedup_connected_groups",
    "stream_stateful",
    "corpus_curation",
)

SF1 = "/root/testdata/sf0.1"


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf3 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/rq_scale/sf0.3"
    keys = sys.argv[3:] if len(sys.argv) > 3 else list(KEYS)
    from rq_spark.bench_branches import branch_queries, phase_queries
    from rq_spark.queries import all_queries
    from rq_spark.session import get_spark
    from rq_spark.util import release_all_caches

    spark = get_spark("rq_spark_scale_ladder")
    qs = dict(all_queries())
    qs.update(branch_queries())
    qs.update(phase_queries())  # attribution-only phase solos (r12)

    def timed(key: str, sf_dir: str) -> float:
        release_all_caches()
        spark.catalog.clearCache()
        t0 = time.time()
        qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    out = {}
    for key in keys:
        timed(key, "/root/testdata/sf0.001")  # codegen warm
        t1s, t3s = [], []
        for _ in range(runs):
            t1s.append(timed(key, SF1))
            t3s.append(timed(key, sf3))
        t1, t3 = min(t1s), min(t3s)
        out[key] = {
            "t_sf0.1": round(t1, 2),
            "t_3x": round(t3, 2),
            "ratio": round(t3 / t1, 2),
            "exponent": round(math.log(t3 / t1) / math.log(3), 2),
        }
        print(key, out[key], file=sys.stderr)
    print(json.dumps({"sf3": sf3, "keys": out}))


if __name__ == "__main__":
    main()
