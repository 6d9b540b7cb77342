"""Declared query inventory — the driver-facing contract.

Each query is registered as a ``Q(fn, oracle)`` pair: ``fn(spark, sf_dir) ->
DataFrame`` (the Spark-first implementation) and ``oracle`` (the equivalent
ANSI SQL DuckDB runs on the same parquet for the correctness gate; ``None``
for non-SQL-expressible operators, which get a rows-only check).

Determinism rules applied throughout (SURVEY.md §7):
- every computed column aliased identically in Spark and SQL;
- money aggregates via exact DECIMAL arithmetic, cast to DOUBLE at the end;
- every window ordering carries a unique tiebreaker;
- no current_timestamp / nondeterministic exprs in declared outputs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None


QUERIES: dict[str, Q] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = Q(fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, Q]:
    # Import side-effect registration; keep imports lazy so a syntax error in
    # one group doesn't take down the whole inventory surface at import time.
    from etl_hiscox_spark.queries import relational  # noqa: F401

    try:
        from etl_hiscox_spark.queries import analytics  # noqa: F401
    except ImportError:
        pass
    try:
        from etl_hiscox_spark.queries import llm  # noqa: F401
    except ImportError:
        pass
    try:
        from etl_hiscox_spark.queries import quality  # noqa: F401
    except ImportError:
        pass
    try:
        from etl_hiscox_spark.queries import streaming  # noqa: F401
    except ImportError:
        pass
    return dict(QUERIES)
