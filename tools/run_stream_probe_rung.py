"""Streaming-probe throughput rung (r14, r13 verdict task #5): the
three probe families are parity-pinned but were unmeasured under
sustained load. This drives N micro-batches of FIXED size through
`streaming.probe_index_stream` against a standing Hamming index at 1×
and 10× rows, timing each batch wall-to-wall (file landing →
processAllAvailable), and pins the two claims the design makes:

* the per-batch FIXED cost (serving-pointer + meta + tombstone
  re-resolution, plan build, engine overhead) is a flat floor — batch
  walls do not trend upward across the run;
* the per-batch wall stays ~flat as the standing index grows 10×: the
  probe is broadcast-into-bucketed-scan, so the corpus side is a
  map-side scan whose partition count, not a shuffle, absorbs growth.

The index carries live tombstones (~1% of docs) so the anti-join is
exercised, and the serving base sits behind a blue/green alias so the
per-batch pointer re-resolution is real.

Usage: python tools/run_stream_probe_rung.py [batches] [batch_size]
(defaults 8, 1000). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = (("1x", 100_000), ("10x", 1_000_000))


def main() -> None:
    batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    from pyspark.sql import functions as F

    from rq_spark.bucketing import add_tombstones, set_index_pointer
    from rq_spark.operators import dedup as D
    from rq_spark.session import get_spark
    from rq_spark.streaming import probe_index_stream

    spark = get_spark("rq_spark_stream_probe_rung")

    def sigs(n: int, seed: int):
        # deterministic pseudo-random 64-bit signatures, executor-side
        return spark.range(n).select(
            F.col("id").alias("doc"),
            F.xxhash64(F.col("id"), F.lit(seed)).alias("sig"),
        )

    out: dict[str, dict] = {}
    for tag, n_rows in SIZES:
        base, alias = f"t_sprung_{tag}", f"t_sprung_{tag}_serve"
        for t in ("hbands", "meta", "state", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {base}_{t}")
        spark.sql(f"DROP TABLE IF EXISTS {alias}_ptr")
        D.write_hamming_index(sigs(n_rows, 7), base, bands=4, buckets=32)
        add_tombstones(
            spark, base,
            spark.range(0, n_rows, 101).select(F.col("id").alias("doc")),
            "doc",
        )
        set_index_pointer(spark, alias, base)

        with tempfile.TemporaryDirectory() as d:
            stream = (
                spark.readStream.schema("doc long, sig long")
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            n_out = {"n": 0}

            def sink(df, epoch):
                n_out["n"] += df.count()

            q = probe_index_stream(stream, alias, sink, max_hamming=3)
            walls = []
            try:
                # warm batch (codegen, broadcast machinery) — uncounted.
                # every probe doc clones a live corpus signature (id
                # stride co-prime with the tombstone stride) so the
                # candidate join + popcount verify + output path all
                # carry real rows, not just the banding floor
                for i in range(batches + 1):
                    spark.range(batch_size).select(
                        (F.col("id") + 10_000_000 + i * batch_size).alias(
                            "doc"
                        ),
                        F.xxhash64(
                            (F.col("id") * 103 + i) % n_rows, F.lit(7)
                        ).alias("sig"),
                    ).coalesce(1).write.parquet(f"{d}/b{i}")
                    t0 = time.time()
                    q.processAllAvailable()
                    if i > 0:
                        walls.append(round(time.time() - t0, 3))
            finally:
                q.stop()
        out[tag] = {
            "batch_walls_sec": walls,
            "median_sec": round(statistics.median(walls), 3),
            "index_rows": n_rows,
            "probe_hits": n_out["n"],
        }
        for t in ("hbands", "meta", "state", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {base}_{t}")
        spark.sql(f"DROP TABLE IF EXISTS {alias}_ptr")

    ratio = round(out["10x"]["median_sec"] / out["1x"]["median_sec"], 2)
    print(
        json.dumps(
            {
                "stream_probe_rung": out,
                "median_ratio_10x_over_1x": ratio,
                "batches": batches,
                "batch_size": batch_size,
            }
        )
    )


if __name__ == "__main__":
    main()
