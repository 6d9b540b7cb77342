"""Dump .explain("formatted") for named queries to plans/<round>/<q>_<tag>.txt
(round from $SPARK_GRAFT_PLANS_ROUND, default r18).

Usage: python tools/dump_plans.py <tag> q1 [q2 ...]

The dump is of the RETURNED DataFrame (the frame the driver hashes) — for
lifecycle probes that is the final probe plan; the earlier protocol steps
are driver-side actions the plan cannot show (profile_query.py covers
those). Lifecycle side effects run for real, so scratch roots are built
exactly as in the bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r18"),
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from etl_hiscox_spark.queries import all_queries
    from etl_hiscox_spark.session import get_spark

    spark = get_spark("dump_plans")
    queries = all_queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = queries[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        out = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out} ({len(plan)} chars)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
