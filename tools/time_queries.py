"""Bench-protocol timing of named queries: warm tables, median of N runs.

Usage: python tools/time_queries.py q1 [q2 ...] [--runs 3]

Same methodology as bench.py (clearCache before each timed run, .count()
action, interleaved passes, median) but scoped to the named queries so an
optimization iteration measures in ~seconds, not a full bench.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        if i + 1 >= len(args):
            sys.exit("usage: time_queries.py q1 [q2 ...] [--runs N] — --runs needs a value")
        try:
            runs = int(args[i + 1])
        except ValueError:
            sys.exit(f"--runs expects an integer, got {args[i + 1]!r}")
        del args[i : i + 2]
    names = [a for a in args if not a.startswith("--")]

    from etl_hiscox_spark.queries import all_queries
    from etl_hiscox_spark.registry import TESTDATA_TABLES, load_table
    from etl_hiscox_spark.session import get_spark

    queries = all_queries()
    # validate BEFORE the table warm-up pass so a typo fails in ms, not
    # after a full warm cycle (ADVICE r17)
    unknown = [n for n in names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {', '.join(unknown)} (see all_queries())")
    if not names:
        sys.exit("usage: time_queries.py q1 [q2 ...] [--runs N]")
    spark = get_spark("time_queries")
    for t in TESTDATA_TABLES:
        load_table(spark, t, SF_DIR).count()

    import gc

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for name in names:
            spark.catalog.clearCache()
            t0 = time.time()
            queries[name].fn(spark, SF_DIR).count()
            samples[name].append(time.time() - t0)
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    out = {
        n: {"median": round(statistics.median(s), 3), "samples": [round(x, 3) for x in s]}
        for n, s in samples.items()
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
