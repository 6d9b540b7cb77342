"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in :mod:`etl_hiscox_spark`; the query inventory (one
entry per SURVEY.md §2 operator row) is in ``etl_hiscox_spark/queries/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Grouped pricing summary (the gold ``claims_summary`` shape of the
    reference — per-type/status count+sum+avg — over lineitem; TPC-H Q1
    pattern)."""
    from etl_hiscox_spark.queries import all_queries

    return all_queries()["a6_grouped_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from etl_hiscox_spark.queries import all_queries

    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted => rows-only check."""
    from etl_hiscox_spark.queries import all_queries

    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
