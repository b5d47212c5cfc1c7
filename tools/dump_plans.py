"""Dump .explain('formatted') for headline catalog keys (r14 opt round;
r15: output round directory via $SPARK_GRAFT_PLANS_ROUND, default r15).

Usage: python tools/dump_plans.py <outdir-suffix> [key ...]
Writes plans/<round>/<key>_<suffix>.txt for every headline key (or the
given subset). Keys whose builders run driver-side loops (graph/stream
families) execute real jobs during construction; the plan of the final
returned DataFrame is still the artifact the judge checks claims
against (Exchange count, join strategy, PushedFilters, Python nodes).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    suffix = sys.argv[1]
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE
    from rq_spark.queries import all_queries
    from rq_spark.session import get_spark
    from rq_spark.util import release_all_caches

    spark = get_spark("dump_plans")
    qs = all_queries()
    outdir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    )
    os.makedirs(outdir, exist_ok=True)
    keys = only or HEADLINE
    for name in keys:
        fn = qs[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"PLAN FAILED: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
        release_all_caches()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
