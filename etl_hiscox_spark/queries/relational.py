"""Core relational operator queries (SURVEY.md §2.1-2.7).

One declared query per operator row, run on the driver testdata (TPC-H-ish
star schema). The insurance-domain semantics these operators implement are
exercised on reference-shaped fixtures in ``tests/``; here each operator is
demonstrated at benchmark scale with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_hiscox_spark.operators.aggregates import (
    completeness_profile,
    duplicate_stats,
    money_avg,
    money_sum,
)
from etl_hiscox_spark.operators.joins import asof_join, broadcast_join, range_join
from etl_hiscox_spark.operators.windows import (
    dedup_rank,
    lag_compare,
    rolling_agg,
    running_total,
    top_k_per_group,
)
from etl_hiscox_spark.queries import register
from etl_hiscox_spark.registry import load_table

# ---------------------------------------------------------------------------
# Flagship: grouped pricing summary (A6 — the gold claims_summary shape:
# per-type/status count+sum+avg, dbt_project.yml:97 / README.md:190-192 —
# re-expressed over lineitem). TPC-H Q1 pattern.
# ---------------------------------------------------------------------------


@register(
    "a6_grouped_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST((1 - l_discount) * (1 + l_tax) AS DECIMAL(12,6))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a6_grouped_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    charge_factor = ((F.lit(1.0) - F.col("l_discount")) * (F.lit(1.0) + F.col("l_tax"))).cast(
        "decimal(12,6)"
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            money_sum("l_extendedprice", "sum_base_price"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)") * charge_factor)
            .cast("double")
            .alias("sum_charge"),
            money_avg("l_quantity", "avg_qty"),
            money_avg("l_extendedprice", "avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "s4_sql_entry_point",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM orders GROUP BY o_orderstatus
    """,
)
def s4_sql_entry_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S4 + §3.3: the SQL entry path — named table scan via temp view +
    # spark.sql text (the dbt-compiled-SQL flow without the warehouse hop).
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM orders_v GROUP BY o_orderstatus
        """
    )


# ---------------------------------------------------------------------------
# Projections / filters (P1-P9)
# ---------------------------------------------------------------------------


@register(
    "p1_column_projection",
    oracle="SELECT o_orderkey, o_orderdate, o_totalprice FROM orders",
)
def p1_column_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit column list (bronze_claims.sql:8-21). The scan's ReadSchema
    # must contain only these three columns (column pruning).
    return load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate", "o_totalprice")


@register(
    "p2_computed_columns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           'lineitem' AS source_table
    FROM lineitem
    """,
)
def p2_computed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P2/F13: computed + literal metadata columns (ingestion.py:77-80).
    # Per-row double arithmetic is bit-deterministic across engines.
    return load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("revenue"),
        F.lit("lineitem").alias("source_table"),
    )


@register(
    "p3_filter_equality",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice
    FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def p3_filter_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
    )


@register(
    "p4_filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
    """,
)
def p4_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P4: range predicates (premium 100-100000 analog). Both predicates
    # push down to the parquet scan (PushedFilters).
    return (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_quantity").between(10, 20))
        .filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
            )
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
    )


@register(
    "p5_filter_not_null",
    oracle="""
    SELECT event_id, user_id, value FROM events
    WHERE value IS NOT NULL AND user_id IS NOT NULL
    """,
)
def p5_filter_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P5: not_null rule shape (sources.yml:16-17).
    ev = load_table(spark, "events", sf_dir)
    return ev.filter(F.col("value").isNotNull() & F.col("user_id").isNotNull()).select(
        "event_id", "user_id", "value"
    )


@register(
    "p6_filter_in_list",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def p6_filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P6: accepted_values / IN-list (claim_type enum analog).
    return (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority", "o_orderstatus")
    )


@register(
    "p7_filter_regex",
    oracle=r"""
    SELECT c_custkey, c_name FROM customer
    WHERE regexp_matches(c_name, '^Customer#0*[0-9]{1,3}7$')
    """,
)
def p7_filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P7: regex format check (^POL\d{3,}$ analog) — common Java/RE2 subset.
    return (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_name").rlike(r"^Customer#0*[0-9]{1,3}7$"))
        .select("c_custkey", "c_name")
    )


@register(
    "p8_filter_cross_column",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
    WHERE l_extendedprice > l_quantity * 1500
    """,
)
def p8_filter_cross_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P8: cross-column predicate (end_date > start_date analog).
    return (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_extendedprice") > F.col("l_quantity") * 1500)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@register(
    "p9_conditional_business_rule",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CASE WHEN (CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal > 1000.0
                               ELSE c_acctbal > -500.0 END) THEN 0 ELSE 1 END)
                AS BIGINT) AS n_violations
    FROM customer GROUP BY c_mktsegment
    """,
)
def p9_conditional_business_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P9: per-group conditional rule (LIFE => coverage >= 50000 analog,
    # test_insurance_data_quality.py:158-178).
    rule = F.when(F.col("c_mktsegment") == "BUILDING", F.col("c_acctbal") > 1000.0).otherwise(
        F.col("c_acctbal") > -500.0
    )
    return (
        load_table(spark, "customer", sf_dir)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.when(rule, 0).otherwise(1)).alias("n_violations"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (J1-J7)
# ---------------------------------------------------------------------------


@register(
    "j1_inner_equijoin",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def j1_inner_equijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J1: claims ⋈ policies analog. Catalyst broadcast-joins the small side.
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice", "total_value"),
        )
    )


@register(
    "j2_left_outer_join",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def j2_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J2: keep policies with no claims (gold per-policy metrics analog).
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0))
            .cast("double")
            .alias("total_spend"),
        )
    )


@register(
    "j3_broadcast_dim_join",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(12,6))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def j3_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J3: dim join via the size-aware helper (agents/adjusters analog).
    # part scales with SF, so no forced hint — CBO (ANALYZE stats) still
    # plans BroadcastHashJoin while the dim fits the threshold, and falls
    # back to a shuffle join instead of an OOM when it doesn't
    # (plan-gated in tests/test_plans.py::test_dim_joins_broadcast).
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(12,6)")
    return (
        broadcast_join(li, part, on=[li.l_partkey == part.p_partkey])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


@register(
    "j4_left_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def j4_left_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J4: policies having >= 1 claim.
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "j5_left_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderdate >= TIMESTAMP '2001-01-01'
                              AND o_custkey IS NOT NULL)
    """,
)
def j5_left_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J5: orphan check / dbt relationships test shape (sources.yml:18-25):
    # customers with no recent orders.
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "j6_range_interval_join",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_shipped_in_window
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    """,
)
def j6_range_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J6: validity-window join (claim_date within policy [start,end] analog).
    # Equi-key keeps it a hash/SMJ join; range condition filters inside.
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    joined = range_join(
        li,
        orders,
        keys=[],
        range_cond=(
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate >= orders.o_orderdate)
            & (li.l_shipdate <= orders.o_orderdate + F.expr("INTERVAL 90 DAYS"))
        ),
    )
    return joined.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_shipped_in_window"))


@register(
    "j7_asof_join",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts,
           (SELECT p.value FROM events p
            WHERE p.event_type = 'purchase' AND p.user_id = c.user_id AND p.ts <= c.ts
            ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS value_asof
    FROM events c WHERE c.event_type = 'click'
    """,
)
def j7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J7: as-of join — latest purchase state visible at each click
    # (SCD-2 "version in force at claim time" analog, dbt snapshots).
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"), "user_id", "ts", "value"
    )
    return asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_values=["value"],
        # (user_id, ts) duplicates among purchases resolve to the highest
        # event_id — the exact tiebreak the oracle's ORDER BY pins.
        right_tiebreakers=["purchase_event_id"],
    ).select("event_id", "user_id", "ts", "value_asof")


# ---------------------------------------------------------------------------
# Aggregations (A1-A11)
# ---------------------------------------------------------------------------


@register(
    "a1_a5_global_stats",
    oracle="""
    SELECT COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_value,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order
    FROM orders
    """,
)
def a1_a5_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1 count, A2 sum, A3 avg, A4 min/max, A5 count-distinct in one pass.
    return load_table(spark, "orders", sf_dir).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_distinct(F.col("o_custkey")).alias("n_customers"),
        money_sum("o_totalprice", "total_value"),
        money_avg("o_totalprice", "avg_value"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@register(
    "a7_conditional_aggregate",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_value,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished
    FROM orders GROUP BY o_orderpriority
    """,
)
def a7_conditional_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A7: valid_premiums / quality-rate counting shape (logger.py:141-154).
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("o_totalprice") > 150000, 1).otherwise(0)).alias("n_high_value"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
    )


@register(
    "a8_completeness_profile",
    oracle="""
    SELECT COUNT(*) AS row_count,
           CAST(COUNT(event_id) AS DOUBLE) / COUNT(*) AS event_id_completeness,
           CAST(COUNT(ts) AS DOUBLE) / COUNT(*) AS ts_completeness,
           CAST(COUNT(user_id) AS DOUBLE) / COUNT(*) AS user_id_completeness,
           CAST(COUNT(event_type) AS DOUBLE) / COUNT(*) AS event_type_completeness,
           CAST(COUNT(value) AS DOUBLE) / COUNT(*) AS value_completeness,
           CAST(COUNT(props) AS DOUBLE) / COUNT(*) AS props_completeness
    FROM events
    """,
)
def a8_completeness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A8: per-column completeness in ONE pass (vs. the reference's
    # scan-per-column, test_insurance_data_quality.py:183-198).
    return completeness_profile(load_table(spark, "events", sf_dir))


@register(
    "a9_duplicate_stats",
    oracle="""
    SELECT COUNT(*) AS row_count,
           COUNT(DISTINCT (user_id, event_type)) AS distinct_count,
           COUNT(*) - COUNT(DISTINCT (user_id, event_type)) AS duplicate_count,
           CAST(COUNT(*) - COUNT(DISTINCT (user_id, event_type)) AS DOUBLE) / COUNT(*) AS duplicate_ratio
    FROM events
    """,
)
def a9_duplicate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A9: duplicate % vs threshold (config.py:54, dbt vars max_duplicate_pct).
    return duplicate_stats(load_table(spark, "events", sf_dir), ["user_id", "event_type"])


@register(
    "a10_rollup_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a10_rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A10: multi-granularity gold aggregate (BI rollup, README.md:190-192).
    return (
        load_table(spark, "lineitem", sf_dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            money_sum("l_quantity", "sum_qty"),
        )
    )


@register(
    "a10_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def a10_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A10 (SQL form): explicit GROUPING SETS through the SQL entry —
    # Catalyst expands to a single Expand+Aggregate (one scan, one shuffle),
    # not one job per grouping.
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# ---------------------------------------------------------------------------
# Windows (W1-W5)
# ---------------------------------------------------------------------------


@register(
    "w1_dedup_rank",
    oracle="""
    SELECT event_id, user_id, event_type, ts FROM (
      SELECT event_id, user_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def w1_dedup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W1: deterministic latest-row-per-key dedup (fixes the reference's
    # nondeterministic dropDuplicates, ingestion.py:87).
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "event_type", "ts")
    return dedup_rank(ev, keys=["user_id", "event_type"], order_by=["ts", "event_id"])


@register(
    "w2_rolling_average",
    oracle="""
    SELECT event_id, user_id, ts, value,
           AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling_avg_value
    FROM events
    """,
)
def w2_rolling_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W2: pandas rolling(window=3) parity (premium-trend check analog).
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts", "value")
    return rolling_agg(
        ev,
        keys=["user_id"],
        order_by=["ts", "event_id"],
        value=F.col("value"),
        preceding=2,
        agg="avg",
        alias="rolling_avg_value",
    )


@register(
    "w3_lag_delta",
    oracle="""
    SELECT event_id, user_id, ts, value,
           value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_value
    FROM events
    """,
)
def w3_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W3: previous-row comparison (premium-increases-with-age analog).
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts", "value")
    return lag_compare(
        ev, keys=["user_id"], order_by=["ts", "event_id"], value=F.col("value"), alias="prev_value"
    ).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("value") - F.col("prev_value")).alias("delta_value"),
    )


@register(
    "w4_rank_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice, rnk FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey DESC) AS rnk
      FROM part
    ) WHERE rnk <= 3
    """,
)
def w4_rank_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W4: top claims per type analog (gold/BI ranking surface).
    part = load_table(spark, "part", sf_dir)
    return top_k_per_group(
        part.select("p_brand", "p_partkey", "p_name", "p_retailprice"),
        keys=["p_brand"],
        order_by=["p_retailprice", "p_partkey"],
        k=3,
        descending=True,
        rank_col="rnk",
    )


@register(
    "w5_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cumulative_spend
    FROM orders
    """,
)
def w5_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W5: monthly cumulative claim totals analog. Decimal window sum is
    # exact => engine-portable.
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return running_total(
        o,
        keys=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        value=F.col("o_totalprice").cast("decimal(18,2)"),
        alias="__rt",
    ).select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.col("__rt").cast("double").alias("cumulative_spend"),
    )


@register(
    "w6_trailing_week_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS spend_7d
    FROM orders
    """,
)
def w6_trailing_week_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W-extension: time-based RANGE frame — trailing 7 calendar days per
    # customer (not 7 rows). Spark's rangeBetween needs a numeric order
    # key, so the frame runs over epoch seconds with the same inclusive
    # [t-7d, t] bound (peer rows included on both engines). Decimal sum ->
    # exact -> cast double once.
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-7 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("spend_7d"),
    )


@register(
    "w7_distribution_ranks",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           NTILE(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def w7_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W-extension: distribution window functions. The order key includes
    # c_custkey so every row is rank-unique -> ntile assignment and
    # percent_rank's (rank-1)/(n-1) are integer-derived and engine-exact.
    c = load_table(spark, "customer", sf_dir).select("c_mktsegment", "c_custkey", "c_acctbal")
    w = Window.partitionBy("c_mktsegment").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Sorts / top-k / set ops (R2-R4, U1-U3)
# ---------------------------------------------------------------------------


@register(
    "r3_topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def r3_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # R2+R3+R4: global top-k with unique tiebreak (latest-blob analog).
    # Spark executes as TakeOrderedAndProject — no full sort at scale.
    return (
        load_table(spark, "orders", sf_dir)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@register(
    "u1_union_append",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'high' AS bucket FROM orders WHERE o_totalprice >= 300000
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'low' AS bucket FROM orders WHERE o_totalprice < 20000
    """,
)
def u1_union_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U1: multi-batch append = unionByName (mergeSchema append semantics).
    o = load_table(spark, "orders", sf_dir)
    high = o.filter(F.col("o_totalprice") >= 300000).select(
        "o_orderkey", "o_totalprice", F.lit("high").alias("bucket")
    )
    low = o.filter(F.col("o_totalprice") < 20000).select(
        "o_orderkey", "o_totalprice", F.lit("low").alias("bucket")
    )
    return high.unionByName(low)


@register(
    "u2_except_difference",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def u2_except_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U2: set difference — "invalid rows = all minus valid" shape
    # (quarantine delta, ingestion.py:90-91): customers with no finished order.
    customer = load_table(spark, "customer", sf_dir).select("c_custkey")
    orders = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return customer.subtract(orders)


@register(
    "u3_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    INTERSECT
    SELECT user_id AS custkey FROM events
    """,
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U3: key-overlap profiling (claim vs policy customer sets analog).
    orders = load_table(spark, "orders", sf_dir).select(F.col("o_custkey").alias("custkey"))
    events = load_table(spark, "events", sf_dir).select(F.col("user_id").alias("custkey"))
    return orders.intersect(events)


# ---------------------------------------------------------------------------
# W8: time-series resample + gap-fill (hypertable-style regularization).
# Dense daily grid per key between its first and last observation,
# forward-filled, with imputed rows marked. Grid rows are GENERATED in the
# reduce stage (sequence+explode) — grid size is keys × span, independent
# of event count, and never shuffles.
# ---------------------------------------------------------------------------


@register(
    "w8_gap_fill_daily",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority, date_trunc('day', o_orderdate) AS bucket,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS actual
      FROM orders GROUP BY 1, 2
    ), bounds AS (
      SELECT o_orderpriority, MIN(bucket) AS mn, MAX(bucket) AS mx FROM daily GROUP BY 1
    ), grid AS (
      SELECT o_orderpriority, UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) AS bucket
      FROM bounds
    ), j AS (
      SELECT g.o_orderpriority, g.bucket, d.actual
      FROM grid g
      LEFT JOIN daily d ON d.o_orderpriority = g.o_orderpriority AND d.bucket = g.bucket
    )
    SELECT o_orderpriority, bucket,
           CAST(last_value(actual IGNORE NULLS)
                  OVER (PARTITION BY o_orderpriority ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS value,
           actual IS NULL AS is_gap
    FROM j
    """,
)
def w8_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_hiscox_spark.operators.timeseries import resample_ffill

    orders = load_table(spark, "orders", sf_dir)
    out = resample_ffill(
        orders,
        key_cols=["o_orderpriority"],
        ts_col="o_orderdate",
        value_expr=F.col("o_totalprice").cast("decimal(18,2)"),
        grain="day",
        interval="1 day",
    )
    return out.select(
        "o_orderpriority", "bucket", F.col("value").cast("double").alias("value"), "is_gap"
    )
