"""Two-decade growth measurement for the scale-critical families (r16,
VERDICT r15 item 5).

The sublinear-growth claims in SCALING.md rested on ONE empirical 10x
step (sf0.1 -> sf1). This runner adds a second decade for exactly the
families whose 100-TB story matters most — LSH near-dup (documents),
IVF probe (embeddings), and the exactly-once txn-append sink (events) —
against the subset dataset ``tools/gen_sf1.py --src data/sf1 --dst
data/sf10 --copies 10 --tables documents,embeddings,events`` builds.

Protocol is bench.py's: one Spark session, per-sf table warm, per-query
``spark.catalog.clearCache()`` outside the timed region, interleaved
median-of-3 with a GC barrier between passes, identical statistic at
every sf so growth ratios compare like for like. sfs are measured
smallest-first so the big sf never pollutes the small sf's JVM.

Usage: python tools/scale_decades.py [--runs 3]
Prints one JSON line: {"queries": {name: {sf: sec}}, "growth": {name:
{"d1": sf1/sf0.1, "d2": sf10/sf1}}} — d1 and d2 are the per-decade
growth factors; 10x data -> ~10 is linear, the gate is "both decades
sublinear".
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# query -> the single table family it scales with (documents / embeddings
# / events); every query here reads ONLY tables present in data/sf10
QUERIES = [
    "l2_minhash_near_dup",        # LSH near-dup mining (documents)
    "l2_lsh_rebuild_probe",       # LSH index build + full rebuild (documents)
    "l3_ivf_probe_topk",          # IVF build + pruned probe (embeddings)
    "l3_ivf_append_probe",        # IVF OCC delta append + probe (embeddings)
    "x13_exactly_once_txn_sink",  # streaming txn-append sink (events)
]

SFS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, "data", "sf1")),
    ("sf10", os.path.join(REPO, "data", "sf10")),
]

SF10_TABLES = ("documents", "embeddings", "events")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated override of the measured query set (each "
        "must read only tables present in data/sf10)",
    )
    args = ap.parse_args()
    if args.queries:
        QUERIES[:] = args.queries.split(",")

    from etl_hiscox_spark.queries import all_queries
    from etl_hiscox_spark.registry import load_table
    from etl_hiscox_spark.session import get_spark

    for _, d in SFS:
        if not os.path.isdir(d):
            print(f"missing dataset dir {d} — generate it first", file=sys.stderr)
            return 2

    spark = get_spark("scale-decades")
    queries = all_queries()
    results: dict[str, dict[str, float]] = {q: {} for q in QUERIES}

    for label, sf_dir in SFS:
        # warm footers/codegen for THIS sf before any timing
        for t in SF10_TABLES:
            load_table(spark, t, sf_dir).count()
        samples: dict[str, list[float]] = {q: [] for q in QUERIES}
        for _ in range(args.runs):
            for name in QUERIES:
                spark.catalog.clearCache()
                t0 = time.time()
                queries[name].fn(spark, sf_dir).count()
                samples[name].append(time.time() - t0)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        for name, s in samples.items():
            results[name][label] = round(statistics.median(s), 3)
        print(f"[{label}] " + " ".join(f"{n}={results[n][label]}s" for n in QUERIES))

    growth = {
        name: {
            "d1": round(r["sf1"] / r["sf0.1"], 1) if r.get("sf0.1", 0) > 0 else None,
            "d2": round(r["sf10"] / r["sf1"], 1) if r.get("sf1", 0) > 0 else None,
        }
        for name, r in results.items()
    }
    print(json.dumps({"queries": results, "growth": growth,
                      "protocol": f"median_of_{args.runs}_interleaved_per_sf"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
