"""Property tests for the Spark↔DuckDB oracle dialect seam.

The driver's correctness gate compares full value multisets between each
Spark query and its DuckDB oracle. The registered pairs pin ONE parameter
choice each; these tests run randomized-parameter variants of the three
trickiest twins (f4 multi-format date chains, q1 SUM(CASE)+unpivot, s9
SCD-2 two-batch snapshot) through the same comparison machinery
(tools/verify_local.py canon/multiset) at sf0.001 — so a dialect divergence
(format-token mismatch, integer-width drift, timestamp literal semantics)
surfaces here before a future query edit trips the driver.
"""

from __future__ import annotations

import importlib.util
import os
import random

import duckdb
import pytest
from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "verify_local", os.path.join(ROOT, "tools", "verify_local.py")
)
vl = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(vl)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    yield con
    con.close()


def _assert_twin(df, sql, con):
    """The driver-gate comparison: column names, type classes, value multiset."""
    s_cols = df.columns
    s_classes = {f.name: vl._class_spark(f.dataType.simpleString()) for f in df.schema.fields}
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_classes = {c: vl._class_duck(str(t)) for c, t in zip(rel.columns, rel.types)}
    assert sorted(s_cols) == sorted(d_cols)
    mismatched = {c: (s_classes[c], d_classes[c]) for c in s_cols if s_classes[c] != d_classes[c]}
    assert not mismatched, f"type class mismatch: {mismatched}"
    ms = vl.rows_to_multiset(s_cols, [[r[c] for c in s_cols] for r in df.collect()])
    md = vl.rows_to_multiset(d_cols, rel.fetchall())
    assert ms == md, (
        f"value multisets differ: {len([k for k in ms if md.get(k) != ms[k]])} spark-side keys"
    )


# (spark date_format pattern, duckdb strftime/strptime pattern) — must stay
# aligned with functions.cleaning.DATE_FORMATS coalesce order.
_FMT_PAIRS = [
    ("yyyy-MM-dd", "%Y-%m-%d"),
    ("MM/dd/yyyy", "%m/%d/%Y"),
    ("yyyy/MM/dd", "%Y/%m/%d"),
    ("dd-MM-yyyy", "%d-%m-%Y"),
]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_f4_date_chain_variants(spark, duck, seed):
    from etl_hiscox_spark.functions.cleaning import DATE_FORMATS, standardize_date

    rng = random.Random(seed)
    m = rng.choice([2, 3, 4])
    assignment = [rng.choice(_FMT_PAIRS) for _ in range(m)]

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    expr = None
    for r, (sfmt, _) in enumerate(assignment[:-1]):
        branch = F.when(F.col("o_orderkey") % m == r, F.date_format("o_orderdate", sfmt))
        expr = branch if expr is None else expr.when(
            F.col("o_orderkey") % m == r, F.date_format("o_orderdate", sfmt)
        )
    expr = (
        expr.otherwise(F.date_format("o_orderdate", assignment[-1][0]))
        if expr is not None
        else F.date_format("o_orderdate", assignment[-1][0])
    )
    df = orders.select(
        "o_orderkey",
        expr.alias("date_str"),
    ).select("o_orderkey", "date_str", standardize_date("date_str").alias("parsed_date"))

    cases = " ".join(
        f"WHEN {r} THEN strftime(o_orderdate, '{dfmt}')"
        for r, (_, dfmt) in enumerate(assignment[:-1])
    )
    case_sql = (
        f"CASE o_orderkey % {m} {cases} ELSE strftime(o_orderdate, '{assignment[-1][1]}') END"
        if cases
        else f"strftime(o_orderdate, '{assignment[-1][1]}')"
    )
    duck_fmt = dict(_FMT_PAIRS)
    tries = ", ".join(f"try_strptime(date_str, '{duck_fmt[f]}')" for f in DATE_FORMATS)
    sql = f"""
    WITH raw AS (SELECT o_orderkey, {case_sql} AS date_str FROM orders)
    SELECT o_orderkey, date_str, CAST(COALESCE({tries}) AS DATE) AS parsed_date
    FROM raw
    """
    _assert_twin(df, sql, duck)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_q1_rule_unpivot_variants(spark, duck, seed):
    from etl_hiscox_spark.quality.rules import (
        AcceptedValues,
        CrossColumn,
        NotNull,
        Range,
        RuleSet,
        Unique,
    )

    rng = random.Random(seed)
    qty_lo, qty_hi = rng.choice([1, 2, 5]), rng.choice([30, 40, 45])
    disc_hi = rng.choice(["0.05", "0.06", "0.08", "0.1"])
    flags = rng.choice([("A", "N"), ("A",), ("N", "R")])
    factor = rng.choice([500, 900, 1200])

    rs = RuleSet(
        "lineitem",
        (
            NotNull("l_orderkey", treat_blank_as_null=False),
            Range("l_quantity", lo=float(qty_lo), hi=float(qty_hi)),
            Range("l_discount", lo=0.0, hi=float(disc_hi)),
            AcceptedValues("l_returnflag", values=flags),
            CrossColumn(
                "price_consistency", expr_sql=f"l_extendedprice > l_quantity * {factor}"
            ),
        ),
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    aggs = [
        F.sum(F.when(~r.predicate(), 1).otherwise(0)).cast("long").alias(r.name)
        for r in rs.row_rules
    ]
    uniq = Unique("l_orderkey")
    aggs.append(
        (F.count(F.lit(1)) - F.count_distinct(F.col(uniq.column))).cast("long").alias(uniq.name)
    )
    wide = li.agg(*aggs)
    df = wide.unpivot([], list(wide.columns), "rule_name", "n_violations")

    in_list = ", ".join(f"'{v}'" for v in flags)
    sql = f"""
    WITH agg AS (
      SELECT CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1,
             CAST(SUM(CASE WHEN NOT (l_quantity IS NULL
                      OR (l_quantity >= {qty_lo}.0 AND l_quantity <= {qty_hi}.0))
                      THEN 1 ELSE 0 END) AS BIGINT) AS v2,
             CAST(SUM(CASE WHEN NOT (l_discount IS NULL
                      OR (l_discount >= 0.0 AND l_discount <= {disc_hi}))
                      THEN 1 ELSE 0 END) AS BIGINT) AS v3,
             CAST(SUM(CASE WHEN NOT (l_returnflag IS NULL OR l_returnflag IN ({in_list}))
                      THEN 1 ELSE 0 END) AS BIGINT) AS v4,
             CAST(SUM(CASE WHEN NOT COALESCE(l_extendedprice > l_quantity * {factor}, TRUE)
                      THEN 1 ELSE 0 END) AS BIGINT) AS v5,
             CAST(COUNT(*) - COUNT(DISTINCT l_orderkey) AS BIGINT) AS v6
      FROM lineitem
    )
    SELECT 'notnull_l_orderkey' AS rule_name, v1 AS n_violations FROM agg
    UNION ALL SELECT 'range_l_quantity', v2 FROM agg
    UNION ALL SELECT 'range_l_discount', v3 FROM agg
    UNION ALL SELECT 'acceptedvalues_l_returnflag', v4 FROM agg
    UNION ALL SELECT 'crosscolumn_price_consistency', v5 FROM agg
    UNION ALL SELECT 'unique_l_orderkey', v6 FROM agg
    """
    _assert_twin(df, sql, duck)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_s9_scd2_variants(spark, duck, seed, tmp_path):
    from etl_hiscox_spark.sources.writers import scd2_snapshot

    rng = random.Random(seed)
    ts1 = rng.choice(["1994-03-01 00:00:00", "1995-01-01 00:00:00"])
    ts2 = rng.choice(["1996-06-15 12:00:00", "1997-09-30 23:59:59"])
    m = rng.choice([7, 10, 13])
    delta = rng.choice([50.0, 100.0, 250.0])

    path = str(tmp_path / "snap")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    v1 = cust.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.lit(ts1).cast("timestamp").alias("updated_at"),
    )
    v2 = cust.filter(F.col("c_custkey") % m == 0).select(
        "c_custkey",
        (F.col("c_acctbal").cast("double") + F.lit(delta)).alias("acctbal"),
        F.lit(ts2).cast("timestamp").alias("updated_at"),
    )
    scd2_snapshot(spark, v1, path, key="c_custkey", updated_at="updated_at")
    snap = scd2_snapshot(spark, v2, path, key="c_custkey", updated_at="updated_at")
    df = snap.select(
        "c_custkey",
        "acctbal",
        F.col("__valid_from").alias("valid_from"),
        F.col("__valid_to").alias("valid_to"),
    )

    sql = f"""
    SELECT c_custkey,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           TIMESTAMP '{ts1}' AS valid_from,
           CASE WHEN c_custkey % {m} = 0 THEN TIMESTAMP '{ts2}' END AS valid_to
    FROM customer
    UNION ALL
    SELECT c_custkey,
           CAST(c_acctbal AS DOUBLE) + {delta} AS acctbal,
           TIMESTAMP '{ts2}' AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to
    FROM customer WHERE c_custkey % {m} = 0
    """
    _assert_twin(df, sql, duck)
