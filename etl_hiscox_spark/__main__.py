"""CLI entry — orchestrator parity (``python -m etl_hiscox_spark``).

Runs the full insurance medallion pipeline on sample raw CSVs and prints the
step report as one JSON line, with the reference's exit-code semantics
(``scripts/orchestrator.py:192-197``): 0 on success, 1 on failure; quality
warnings do not fail the run.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="etl_hiscox_spark")
    ap.add_argument("--claims", default="data/sample/claims.csv")
    ap.add_argument("--policies", default="data/sample/policies.csv")
    ap.add_argument("--warehouse", default=None, help="output dir (default: temp)")
    args = ap.parse_args(argv)

    from etl_hiscox_spark.plans.models import build_insurance_pipeline
    from etl_hiscox_spark.session import get_spark

    spark = get_spark("etl_hiscox_spark.pipeline")
    warehouse = args.warehouse or tempfile.mkdtemp(prefix="etl_warehouse_")
    pipeline = build_insurance_pipeline(spark, args.claims, args.policies, warehouse=warehouse)
    report = pipeline.run()
    out = report.summary()
    out["warehouse"] = warehouse
    print(json.dumps(out))
    return 0 if report.success else 1


if __name__ == "__main__":
    sys.exit(main())
