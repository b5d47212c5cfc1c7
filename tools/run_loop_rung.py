"""Continuous-loop throughput rung (r14): per-micro-batch wall of the
WHOLE composed dedup loop (`streaming.continuous_dedup_loop_stream`:
standing-index probe → edge-ledger append → label DELTA absorb →
index append) as the standing corpus grows 10×, against the
full-rewrite comparator the loop replaced.

The claim under test is the r14 label-delta design: every arrow's
per-batch write is ∝ batch + touched components, and the only
corpus-∝ work is map-side scans (probe + the absorb's strict-remap
pass) — so the engine loop's per-batch wall should stay ~flat across a
10× corpus, while the same batches through the batch loop with a FULL
`write_labels` staged rewrite per day pay corpus-∝ write amplification
that grows with the corpus.

Every batch carries planted near-dups of live corpus docs (so the
probe, ledger, and absorb arrows move real rows and real components
are touched), plus fresh singletons.

Usage: python tools/run_loop_rung.py [batches] [batch_size]
(defaults 6, 1000). Prints one JSON line.
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
    batches = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    from pyspark.sql import functions as F

    from rq_spark.operators import dedup as D
    from rq_spark.session import get_spark
    from rq_spark.streaming import continuous_dedup_loop_stream

    spark = get_spark("rq_spark_loop_rung")

    def sigs(n: int, seed: int):
        return spark.range(n).select(
            F.col("id").alias("doc"),
            F.xxhash64(F.col("id"), F.lit(seed)).alias("sig"),
        )

    def batch_df(i: int, n_rows: int):
        # half the batch clones live corpus signatures (1-bit flips →
        # real near-pairs, touched components), half fresh singletons
        return spark.range(batch_size).select(
            (F.col("id") + 10_000_000 + i * batch_size).alias("doc"),
            F.when(
                F.col("id") % 2 == 0,
                F.xxhash64((F.col("id") * 97 + i) % n_rows, F.lit(7))
                .bitwiseXOR(
                    F.expr(
                        "shiftleft(cast(1 as bigint), cast(id % 60 as int))"
                    )
                ),
            )
            .otherwise(F.xxhash64(F.col("id"), F.lit(1000 + i)))
            .alias("sig"),
        )

    def stand_up(n_rows: int, ib: str, lb: str, eb: str, tag: str):
        D.write_hamming_index(sigs(n_rows, 7), ib, bands=4, buckets=32)
        pairs = D.hamming_near_pairs_from_index(spark, ib).select(
            "a_id", "b_id"
        ).localCheckpoint()
        D.write_labels(
            D.connected_components(
                pairs,
                sigs(n_rows, 7).select(F.col("doc").alias("node")),
                scope=f"lr_cc_{tag}",
            ),
            lb,
            buckets=32,
        )
        D.write_edge_ledger(pairs, eb, buckets=32)

    def drop(ib: str, lb: str, eb: str):
        for t in ("hbands", "meta", "state", "tombstones", "applied"):
            spark.sql(f"DROP TABLE IF EXISTS {ib}_{t}")
        for b, ts in ((lb, ("labels", "meta", "state", "tombstones")),
                      (eb, ("edges", "meta", "state", "tombstones"))):
            for t in ts:
                spark.sql(f"DROP TABLE IF EXISTS {b}_{t}")

    out: dict[str, dict] = {}
    for tag, n_rows in SIZES:
        # ---- engine loop, delta labels ----
        ib, lb, eb = f"t_lr_{tag}_i", f"t_lr_{tag}_l", f"t_lr_{tag}_e"
        drop(ib, lb, eb)
        stand_up(n_rows, ib, lb, eb, tag)
        walls = []
        with tempfile.TemporaryDirectory() as d:
            stream = (
                spark.readStream.schema("doc long, sig long")
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            q = continuous_dedup_loop_stream(
                stream, ib, lb, eb, f"lr_q_{tag}"
            )
            try:
                # batch 0 warms codegen/broadcast machinery — uncounted
                for i in range(batches + 1):
                    batch_df(i, n_rows).coalesce(1).write.parquet(
                        f"{d}/b{i}"
                    )
                    t0 = time.time()
                    q.processAllAvailable()
                    if i > 0:
                        walls.append(round(time.time() - t0, 3))
            finally:
                q.stop()
        out[f"loop_delta_{tag}"] = {
            "batch_walls_sec": walls,
            "median_sec": round(statistics.median(walls), 3),
            "corpus_rows": n_rows,
        }
        drop(ib, lb, eb)

        # ---- comparator: same arrows, FULL label rewrite per batch ----
        ib, lb, eb = f"t_lrf_{tag}_i", f"t_lrf_{tag}_l", f"t_lrf_{tag}_e"
        drop(ib, lb, eb)
        stand_up(n_rows, ib, lb, eb, tag)
        fwalls = []
        for i in range(batches + 1):
            b = batch_df(i, n_rows).localCheckpoint()
            t0 = time.time()
            probe = D.hamming_probe_from_index(
                spark, b, ib, max_hamming=3
            ).filter(F.col("new_id") != F.col("corpus_id"))
            within = D.hamming_near_pairs(b, max_hamming=3)
            e = (
                probe.select(
                    F.col("new_id").alias("a_id"),
                    F.col("corpus_id").alias("b_id"),
                )
                .unionByName(within.select("a_id", "b_id"))
                .localCheckpoint()
            )
            D.append_edge_ledger(e, eb)
            D.write_labels(
                D.absorb_edges(
                    D.read_labels(spark, lb),
                    e,
                    new_nodes=b.select(F.col("doc").alias("node")),
                    scope=f"lrf_a_{tag}",  # ONE scope: yesterday's
                    # output is fully materialized (a catalog table),
                    # so release-at-entry per call is the right shape
                    # and unique scopes would leak the persist registry
                ),
                lb,
                buckets=32,
            )
            D.append_to_hamming_index(b, ib, reingest=True)
            if i > 0:
                fwalls.append(round(time.time() - t0, 3))
        out[f"loop_full_{tag}"] = {
            "batch_walls_sec": fwalls,
            "median_sec": round(statistics.median(fwalls), 3),
            "corpus_rows": n_rows,
        }
        drop(ib, lb, eb)

    print(
        json.dumps(
            {
                "loop_rung": out,
                "delta_ratio_10x_over_1x": round(
                    out["loop_delta_10x"]["median_sec"]
                    / out["loop_delta_1x"]["median_sec"],
                    2,
                ),
                "full_ratio_10x_over_1x": round(
                    out["loop_full_10x"]["median_sec"]
                    / out["loop_full_1x"]["median_sec"],
                    2,
                ),
                "delta_vs_full_at_10x": round(
                    out["loop_full_10x"]["median_sec"]
                    / out["loop_delta_10x"]["median_sec"],
                    2,
                ),
                "batches": batches,
                "batch_size": batch_size,
            }
        )
    )


if __name__ == "__main__":
    main()
