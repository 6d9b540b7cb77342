"""Survivorship / golden-record merge (operators/survivorship.py) —
semantics pinned here; f17_golden_record carries the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_hiscox_spark.operators.survivorship import golden_record, latest_non_null


def _versions(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, other string, ord long")


def test_newer_null_does_not_erase_older_value(spark):
    # THE survivorship property: row at ord=2 has v=NULL — the golden v
    # must come from ord=1, while `other` still takes its ord=2 value.
    df = _versions(spark, [(1, "old-v", "old-o", 1), (1, None, "new-o", 2)])
    got = golden_record(df, ["k"], F.col("ord"), ["v", "other"]).collect()[0]
    assert got["v"] == "old-v" and got["other"] == "new-o" and got["n_versions"] == 2


def test_all_null_field_stays_null(spark):
    df = _versions(spark, [(1, None, "a", 1), (1, None, "b", 2)])
    got = golden_record(df, ["k"], F.col("ord"), ["v", "other"]).collect()[0]
    assert got["v"] is None and got["other"] == "b"


def test_per_key_independence_and_single_shuffle(spark):
    df = _versions(spark, [(1, "x", "a", 5), (2, "y", "b", 1), (2, "z", "c", 9)])
    out = golden_record(df, ["k"], F.col("ord"), ["v"])
    got = {r["k"]: (r["v"], r["n_versions"]) for r in out.collect()}
    assert got == {1: ("x", 1), 2: ("z", 2)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    # AQE prints the final AND initial plans after execution — count the
    # final section only
    plan = plan.split("== Initial Plan ==")[0]
    # aggregation with map-side partials, not a window over all versions
    assert "partial_max_by" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan


def test_latest_non_null_matches_duckdb_arg_max_semantics(spark):
    # The guarded ordering makes Spark's max_by equal DuckDB's arg_max on
    # NULL values (unguarded they disagree: max_by returns the NULL at the
    # max key, arg_max skips it).
    import duckdb

    rows = [(1, None, "z", 10), (1, "keep", "y", 9), (1, "older", "x", 1)]
    df = _versions(spark, rows)
    got = df.groupBy("k").agg(latest_non_null("v", F.col("ord")).alias("v")).collect()[0]
    dd = duckdb.sql(
        "SELECT arg_max(v, CASE WHEN v IS NOT NULL THEN ord END) FROM (VALUES "
        "(NULL, 10), ('keep', 9), ('older', 1)) t(v, ord)"
    ).fetchone()[0]
    assert got["v"] == dd == "keep"
