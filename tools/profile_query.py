"""Per-job profile of one or more declared queries (guide §1 "measure first").

Runs each named query once against $SPARK_GRAFT_SF_DIR (default sf0.1) with
the Spark UI enabled, then pulls the job list from the UI REST API and prints
a per-job breakdown: duration, description, stage shuffle totals — plus the
"driver gap" (wall time not covered by any job: py4j chatter, planning,
driver-side file IO). This is how we find whether a slow lifecycle probe is
executor compute, shuffle, or a hundred tiny sequential jobs.

Usage: python tools/profile_query.py q1 [q2 ...] [--runs 1]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 1
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])

    from etl_hiscox_spark.queries import all_queries
    from etl_hiscox_spark.registry import TESTDATA_TABLES, load_table
    from etl_hiscox_spark.session import get_spark

    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    queries = all_queries()
    for t in TESTDATA_TABLES:
        load_table(spark, t, SF_DIR).count()

    ui = "http://localhost:4040/api/v1/applications"
    app = _get(ui)[0]["id"]

    for name in names:
        for run in range(runs):
            spark.catalog.clearCache()
            before = {j["jobId"] for j in _get(f"{ui}/{app}/jobs?status=succeeded")}
            spark.sparkContext.setJobDescription(None)
            t0 = time.time()
            queries[name].fn(spark, SF_DIR).count()
            wall = time.time() - t0
            jobs = [
                j
                for j in _get(f"{ui}/{app}/jobs?status=succeeded")
                if j["jobId"] not in before
            ]
            jobs.sort(key=lambda j: j["jobId"])
            total_job = 0.0
            lines = []
            for j in jobs:
                sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                dur = (
                    _parse_ms(j["completionTime"]) - _parse_ms(j["submissionTime"])
                ) / 1000.0
                total_job += dur
                lines.append(
                    f"  job {j['jobId']:>5} {dur:7.3f}s tasks={j['numTasks']:>4} "
                    f"{(j.get('description') or j['name'])[:110]}"
                )
                if dur >= 0.3 and "--stages" in sys.argv:
                    for sid in sorted(j.get("stageIds", [])):
                        try:
                            st = _get(f"{ui}/{app}/stages/{sid}")[0]
                        except Exception:
                            continue
                        lines.append(
                            f"      stage {sid:>4} tasks={st['numCompleteTasks']:>4} "
                            f"in={st.get('inputBytes', 0):>9} sh_r={st.get('shuffleReadBytes', 0):>8} "
                            f"sh_w={st.get('shuffleWriteBytes', 0):>8} {st['name'][:80]}"
                        )
                _ = sub
            print(f"== {name} run {run}: wall {wall:.3f}s, {len(jobs)} jobs, "
                  f"sum(job)={total_job:.3f}s, driver-gap={wall - total_job:.3f}s")
            for ln in lines:
                print(ln)
            sys.stdout.flush()


def _parse_ms(ts: str) -> float:
    import datetime as dt

    return dt.datetime.strptime(ts[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp() * 1000


if __name__ == "__main__":
    main()
