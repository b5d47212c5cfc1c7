"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the `noop` datasource writer so the
full plan executes (scan → shuffle → agg) without driver-side collect
overhead polluting the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Headline set: one representative per operator family. Extended as
# packs land (joins, windows, events, dedup, similarity, text).
HEADLINE = [
    "q1_pricing_summary",
    "filter_predicate",
    "agg_groupby",
    "agg_distinct",
    "rollup_cube_gsets",
    "pivot_wide",
    "sort_limit",
    "set_ops",
    "join_revenue_by_nation",
    "join_broadcast_q3",
    "join_asof_event",
    "window_topk_per_group",
    "window_running_revenue",
    "tumble_10min",
    "session_window_30min",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "sim_topk_cosine",
    "text_quality_score",
    "text_lang_id",
    "corpus_curation",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from rq_spark.queries import all_queries
    from rq_spark.session import get_spark

    spark = get_spark("rq_spark_bench")
    qs = all_queries()

    # JVM/codegen warmup on a trivial plan (not counted): the agg+join
    # exercises janino bootstrap, whole-stage codegen classloading and
    # the shuffle machinery, which otherwise land on the first timed
    # query (~2s of q1's cost was this, not q1)
    from pyspark.sql import functions as F

    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("c"), F.avg("n_nationkey").alias("a"))
        .orderBy("r_name")
        .write.format("noop").mode("overwrite").save()
    )

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
