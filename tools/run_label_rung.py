"""Label-persistence rung (r14): the arrow the delta design actually
changes, isolated. The composed-loop rung (`run_loop_rung.py`) shows
the per-batch wall flat across a 10× corpus for BOTH label modes —
at local scale the loop's fixed floor (plan builds, gen bumps, engine
overhead) hides the write path. This rung isolates the label
persistence arrow at standing sizes where the write cost emerges:

  * ``append_labels`` of a fixed 5k-row delta — should stay FLAT in
    the standing size (one gen bump + one delta-sized bucketed
    append; the standing table is never read);
  * the ``write_labels`` full staged rewrite of the same standing
    view — grows ∝ standing rows (reads and rewrites every label);
  * ``read_labels`` wall after K delta appends vs after
    ``compact_labels`` — the read-side price of deferring compaction
    (K extra files per bucket → task-local sort input), and that
    compaction restores the one-file floor.

Usage: python tools/run_label_rung.py [deltas] [delta_rows]
(defaults 5, 5000). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = (("10M", 10_000_000), ("100M", 100_000_000))


def main() -> None:
    n_deltas = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    delta_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 5000

    from pyspark.sql import functions as F

    from rq_spark.operators import dedup as D
    from rq_spark.session import get_spark

    spark = get_spark("rq_spark_label_rung")

    def drop(base: str):
        for t in ("labels", "meta", "state", "tombstones"):
            for extra in ("", "__rewrite", "__prewrite"):
                spark.sql(f"DROP TABLE IF EXISTS {base}_{t}{extra}")

    out: dict[str, dict] = {}
    for tag, n in SIZES:
        base = f"t_lblr_{tag}"
        drop(base)
        # standing labels: singleton-heavy like a real corpus (reps
        # collapse every 16th node into a small component)
        standing = spark.range(n).select(
            F.col("id").alias("node"),
            F.when(F.col("id") % 16 < 2, (F.col("id") / 16).cast("long") * 16)
            .otherwise(F.col("id"))
            .alias("rep"),
        )
        D.write_labels(standing, base, buckets=32)

        # fixed-size deltas: relabel a stride of existing nodes
        append_walls = []
        for i in range(n_deltas):
            delta = spark.range(delta_rows).select(
                ((F.col("id") * 997 + i * 31) % n).alias("node"),
                F.lit(0).cast("long").alias("rep"),
            ).groupBy("node").agg(F.min("rep").alias("rep"))
            t0 = time.time()
            D.append_labels(delta, base)
            append_walls.append(round(time.time() - t0, 3))

        # read wall with K appended delta files per bucket
        t0 = time.time()
        n_read = D.read_labels(spark, base).count()
        read_deferred = round(time.time() - t0, 3)

        # the full rewrite of the same standing view (the pre-r14
        # per-call cost), measured as compaction — identical work
        t0 = time.time()
        D.compact_labels(spark, base)
        full_rewrite = round(time.time() - t0, 3)

        t0 = time.time()
        assert D.read_labels(spark, base).count() == n_read
        read_compacted = round(time.time() - t0, 3)

        out[tag] = {
            "standing_rows": n,
            "append_walls_sec": append_walls,
            "append_median_sec": round(statistics.median(append_walls), 3),
            "full_rewrite_sec": full_rewrite,
            "read_after_deltas_sec": read_deferred,
            "read_after_compact_sec": read_compacted,
        }
        drop(base)

    print(
        json.dumps(
            {
                "label_rung": out,
                "append_ratio_100M_over_10M": round(
                    out["100M"]["append_median_sec"]
                    / out["10M"]["append_median_sec"],
                    2,
                ),
                "rewrite_ratio_100M_over_10M": round(
                    out["100M"]["full_rewrite_sec"]
                    / out["10M"]["full_rewrite_sec"],
                    2,
                ),
                "rewrite_over_append_at_100M": round(
                    out["100M"]["full_rewrite_sec"]
                    / out["100M"]["append_median_sec"],
                    2,
                ),
                "deltas": n_deltas,
                "delta_rows": delta_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
