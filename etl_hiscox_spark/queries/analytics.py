"""Multi-join analytical queries (the gold/BI tier at benchmark scale) +
remaining operator-inventory rows (F7 freshness, W4 rank-with-ties,
BPE token counts).

These are the queries that exercise Catalyst's join planning across the
full star schema — the shape the 100 TB deployment runs all day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_hiscox_spark.functions.text import token_count_regex
from etl_hiscox_spark.operators.aggregates import money_sum
from etl_hiscox_spark.queries import register
from etl_hiscox_spark.registry import load_table


@register(
    "g1_star_join_revenue",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(12,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def g1_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q5 shape: 5-way star join with aggregation pushed below the
    # join: lineitem pre-aggregates revenue per l_orderkey (4× fewer rows
    # into the join, exact in decimal), the orders join reuses the agg's
    # hash partitioning, customer/nation/region broadcast — at 100 TB only
    # lineitem-by-orderkey and orders move data, and the fact rows that
    # move are one-per-order, not one-per-line.
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(12,6)")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__n"), F.sum(revenue).alias("__rev")
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        # customer scales with SF — no forced broadcast (CBO+AQE decide);
        # nation/region are fixed-cardinality (25/5) so the hint is safe.
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum("__n").alias("n_lines"),
            F.sum("__rev").cast("double").alias("revenue"),
        )
    )


@register(
    "g2_top_unshipped_orders",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(12,6))) AS DOUBLE) AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'O' AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
    """,
)
def g2_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q3 shape: filtered join → group → top-k. Both filters push to
    # the scans; the limit runs as TakeOrderedAndProject after the agg.
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "O")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(12,6)")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "g3_supplier_part_matrix",
    oracle="""
    SELECT s_name, p_brand,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part     ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
    GROUP BY s_name, p_brand
    """,
)
def g3_supplier_part_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two dims on one fact — the dim filter (p_type) prunes before the
    # join. Both dims scale with SF, so no forced broadcast hints; at
    # test scale CBO still builds them as broadcasts under the threshold.
    li = load_table(spark, "lineitem", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    return (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("s_name", "p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            money_sum("l_quantity", "total_qty"),
        )
    )


@register(
    "g4_promo_revenue_share",
    oracle="""
    SELECT CAST(100.0 AS DOUBLE)
             * CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                  * CAST(1 - l_discount AS DECIMAL(12,6))
                             ELSE CAST(0 AS DECIMAL(31,8)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l_discount AS DECIMAL(12,6))) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    """,
)
def g4_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q14 shape: conditional aggregate over a broadcast join with a
    # pushed-down date range. Both numerator and denominator are exact
    # decimal sums -> the ratio divides two bit-identical doubles.
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = load_table(spark, "part", sf_dir)
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(12,6)")
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(
        F.lit(0).cast("decimal(31,8)")
    )
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        (
            F.lit(100.0).cast("double")
            * F.sum(promo).cast("double")
            / F.sum(revenue).cast("double")
        ).alias("promo_revenue_pct")
    )


@register(
    "g5_exists_late_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_late_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def g5_exists_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q4 shape: EXISTS with a correlated range condition — planned as
    # a left-semi join with the range predicate inside the join (no
    # cartesian, no subquery re-execution).
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, on=cond, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
    )


@register(
    "g6_having_large_customers",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 2000000
    """,
)
def g6_having_large_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q18 shape: post-aggregation HAVING filter. Catalyst evaluates
    # the predicate after partial+final agg — no second pass over the fact.
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__spend"),
        )
        .filter(F.col("__spend") > 2_000_000)
        .select("o_custkey", "n_orders", F.col("__spend").cast("double").alias("total_spend"))
    )


@register(
    "g7_scalar_subquery_share",
    oracle="""
    SELECT p_brand,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS brand_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2)))
           > (SELECT SUM(CAST(l_quantity AS DECIMAL(18,2))) * 0.04 FROM lineitem)
    """,
)
def g7_scalar_subquery_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q11 shape: scalar subquery threshold — expressed through the
    # SQL entry so Catalyst plans the subquery as a broadcast scalar
    # (computed once, reused across the HAVING evaluation).
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem_v")
    load_table(spark, "part", sf_dir).createOrReplaceTempView("part_v")
    return spark.sql(
        """
        SELECT p_brand,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS brand_qty
        FROM lineitem_v JOIN part_v ON l_partkey = p_partkey
        GROUP BY p_brand
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2)))
               > (SELECT SUM(CAST(l_quantity AS DECIMAL(18,2))) * 0.04 FROM lineitem_v)
        """
    )


@register(
    "f7_freshness_tiers",
    oracle="""
    SELECT CASE WHEN (epoch(TIMESTAMP '2024-01-31 00:00:00') - epoch(ts)) / 3600.0 < 12
                THEN 'fresh'
                WHEN (epoch(TIMESTAMP '2024-01-31 00:00:00') - epoch(ts)) / 3600.0 < 24
                THEN 'aging'
                ELSE 'stale' END AS freshness,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def f7_freshness_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F7: timestamp age in hours + 12/24h freshness tiers
    # (health_check.py:348-361) — 'now' passed as a literal so the query is
    # reproducible (SURVEY.md §7: no current_timestamp in declared outputs).
    from etl_hiscox_spark.functions.cleaning import freshness_tier

    now = F.lit("2024-01-31 00:00:00").cast("timestamp")
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.select(freshness_tier("ts", now).alias("freshness"))
        .groupBy("freshness")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "w4_rank_with_ties",
    oracle="""
    SELECT p_brand, p_partkey, p_size, rnk FROM (
      SELECT p_brand, p_partkey, p_size,
             RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS rnk
      FROM part
    ) WHERE rnk <= 2
    """,
)
def w4_rank_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W4 variant: RANK() keeps ties (vs row_number's exact-k) — rank value
    # is a function of the order key alone, so it is deterministic even
    # with duplicate sizes.
    part = load_table(spark, "part", sf_dir)
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    return (
        part.select("p_brand", "p_partkey", "p_size", F.rank().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 2)
    )


@register(
    "a12_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def a12_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact interpolated percentiles (Spark `percentile` == SQL
    # quantile_cont semantics). At 100 TB swap for approx_percentile —
    # tested within rsd alongside approx_count_distinct.
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderpriority").agg(
        F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("median_price"),
        F.percentile(F.col("o_totalprice"), F.lit(0.9)).alias("p90_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "a13_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY 1
    """,
)
def a13_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fixed-width histogram: floor-divide bucketing is engine-portable
    # (width_bucket is not), one groupBy pass.
    o = load_table(spark, "orders", sf_dir)
    return (
        o.withColumn("bucket", F.floor(F.col("o_totalprice") / 50000.0).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@register(
    "a14_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a14_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pivot/crosstab: rows -> columns per category. Conditional aggregates
    # instead of DataFrame.pivot keep the output schema static (a pivot
    # with inferred values needs an extra distinct pass and breaks
    # column-name determinism against an oracle).
    li = load_table(spark, "lineitem", sf_dir)
    qty = F.col("l_quantity").cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0)).alias("n_f"),
        F.sum(F.when(F.col("l_linestatus") == "O", 1).otherwise(0)).alias("n_o"),
        F.sum(F.when(F.col("l_linestatus") == "F", qty).otherwise(zero))
        .cast("double")
        .alias("qty_f"),
        F.sum(F.when(F.col("l_linestatus") == "O", qty).otherwise(zero))
        .cast("double")
        .alias("qty_o"),
    )


@register(
    "l6_from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def l6_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L6 typed variant: from_json with an explicit schema (vs the string
    # path of l6_json_extraction) — the right form when many fields are
    # extracted, since the JSON parses once per row, not once per field.
    from pyspark.sql import types as T

    ev = load_table(spark, "events", sf_dir)
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = ev.withColumn("__p", F.from_json("props", schema))
    return (
        parsed.filter(F.col("__p.k").isNotNull())
        .select(
            "event_id",
            F.col("__p.k").alias("k_value"),
            (F.col("__p.k") % 10).alias("k_bucket"),
        )
    )


@register(
    "l5_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens
    FROM documents
    """,
)
def l5_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L5/BPE-ish pre-tokenization count (letter runs | digit runs | single
    # punctuation) — the standard GPT-style split, shared regex subset.
    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", token_count_regex(F.col("text")).alias("n_bpe_tokens"))


@register(
    "a15_distinct_rollup",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY date_trunc('month', o_orderdate)
    """,
)
def a15_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact distinct-per-month — the oracle-checked twin of the HLL rollup
    # below. COUNT(DISTINCT) expands to two-phase aggregation (partial
    # distinct per partition, then exchange) — fine per month, but every new
    # rollup grain re-scans the fact table; that's what a16 fixes at scale.
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy(F.trunc(F.col("o_orderdate"), "month").alias("order_month"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "a16_hll_distinct_rollup",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           COUNT(DISTINCT o_custkey) AS n_customers_exact,
           TRUE AS within_rsd
    FROM orders
    GROUP BY date_trunc('month', o_orderdate)
    """,
)
def a16_hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mergeable-summary rollup (operators/sketches.py): one pass builds
    # per-DAY sketches; the month answer merges sketches, never re-reading
    # orders. At 100 TB the partials table is the thing you materialize —
    # every coarser question (quarter, region, all-time) is a sketch merge.
    #
    # Partial-oracle design (VERDICT r4 item 4): the HLL point estimate has
    # no DuckDB twin, so the declared output is the SQL-checkable exact
    # distinct per month plus ``within_rsd`` — Spark-side proof that the
    # merged-sketch estimate lands within tolerance (5% > 3σ at lgK=12,
    # floor of 2 for tiny groups) of that exact value. DuckDB emits
    # TRUE unconditionally: a drifting sketch pipeline now hash-FAILS the
    # driver check instead of hiding behind rows-only.
    from etl_hiscox_spark.operators.sketches import hll_partials, hll_rollup

    orders = load_table(spark, "orders", sf_dir)
    daily = hll_partials(
        orders.withColumn("order_day", F.date_trunc("day", F.col("o_orderdate"))),
        ["order_day"],
        "o_custkey",
    )
    monthly = hll_rollup(
        daily.withColumn("order_month", F.trunc(F.col("order_day"), "month")),
        ["order_month"],
        alias="approx_customers",
    )
    exact = orders.groupBy(
        F.trunc(F.col("o_orderdate"), "month").alias("order_month")
    ).agg(F.countDistinct("o_custkey").alias("n_customers_exact"))
    err = F.abs(F.col("approx_customers") - F.col("n_customers_exact"))
    tol = F.greatest(F.lit(2.0), F.col("n_customers_exact") * 0.05)
    return exact.join(monthly, "order_month").select(
        "order_month",
        "n_customers_exact",
        (err <= tol).alias("within_rsd"),
    )


@register(
    "g8_large_order_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS tq
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(tq AS DOUBLE) AS total_qty
    FROM big JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
    ORDER BY total_qty DESC, o_orderkey ASC LIMIT 20
    """,
)
def g8_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q18 shape: HAVING on a grouped sum, then join out to the
    # customer. Spark-first plan: the HAVING filter runs on the pre-agg
    # BEFORE any join (the big table collapses to qualifying orderkeys —
    # at 100 TB the join input is the handful of jumbo orders, not
    # lineitem), then orders join + broadcast-size customer lookup, then
    # TakeOrderedAndProject for the top-k.
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("tq"))
        .filter(F.col("tq") > 200)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("tq").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "g9_exclusive_late_supplier",
    oracle="""
    WITH l AS (
      SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem
    ), late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM l JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 100 DAY
    )
    SELECT s_name, s.l_suppkey AS suppkey,
           COUNT(DISTINCT s.l_orderkey) AS n_orders
    FROM late s JOIN supplier ON s.l_suppkey = s_suppkey
    WHERE EXISTS (SELECT 1 FROM l l2
                  WHERE l2.l_orderkey = s.l_orderkey
                    AND l2.l_suppkey <> s.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = s.l_orderkey
                        AND l3.l_suppkey <> s.l_suppkey)
    GROUP BY s_name, s.l_suppkey
    """,
)
def g9_exclusive_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    # multi-supplier order ("late" = shipped >100 days after order date —
    # this dataset has no commitdate). The oracle states it with the
    # classic correlated EXISTS / NOT EXISTS; the Spark plan rewrites both
    # subqueries into ONE aggregation over the joined fact: per order,
    # count distinct suppliers, count distinct late suppliers, and keep
    # the lone late supplier via max(). Two shuffles total (orderkey agg,
    # suppkey agg) instead of two correlated self-joins over lineitem —
    # the rewrite that matters at 100 TB.
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 100 DAY")).alias(
            "is_late"
        ),
    )
    # Two-level aggregation instead of countDistinct×2: collapsing to one
    # row per (order, supplier) first keeps the plan Expand-free (a double
    # countDistinct triples the shuffle via Expand), and the second agg
    # then needs only plain counts.
    per_supp = joined.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.count_if("supp_late").alias("n_late_supp"),
        F.max(F.when(F.col("supp_late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    exclusive = per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    return (
        exclusive.groupBy(F.col("late_supp").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .join(supplier, F.col("suppkey") == supplier.s_suppkey)
        .select("s_name", "suppkey", "n_orders")
    )


@register(
    "a17_order_items_array",
    oracle="""
    SELECT l_orderkey,
           COUNT(*) AS n_items,
           array_to_string(list(l_partkey ORDER BY l_linenumber, l_partkey), '|') AS partkeys
    FROM lineitem GROUP BY l_orderkey
    """,
)
def a17_order_items_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Array aggregation (nested result type): per-order part list in line
    # order. collect_list is order-nondeterministic under parallelism, so
    # the struct array is sorted post-agg — the standard Spark recipe for
    # deterministic array_agg. l_linenumber repeats within an order in
    # this dataset, so the sort key carries l_partkey as tiebreaker (the
    # struct sort does this implicitly; the oracle must do it explicitly).
    # The declared output serializes the array ('|'-joined) because the
    # driver's pandas canonicalization cannot sort/hash list cells
    # (CORRECTNESS_r03 err: "unhashable type: 'list'", VERDICT r3 item 1).
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.array_sort(F.collect_list(F.struct("l_linenumber", "l_partkey"))).alias("__s"),
        )
        .select(
            "l_orderkey",
            "n_items",
            F.array_join(
                F.transform(F.col("__s"), lambda s: s.getField("l_partkey").cast("string")),
                "|",
            ).alias("partkeys"),
        )
    )


@register(
    "f16_fuzzy_name_pairs",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           levenshtein(a.c_name, b.c_name) AS edit_dist
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_custkey < b.c_custkey
     AND b.c_custkey - a.c_custkey <= 20
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def f16_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fuzzy matching for entity resolution: Levenshtein distance on a
    # deterministic blocked candidate set (same nation, key distance ≤ 20).
    # The band is made an EQUI-join key (sorted-neighborhood bucketing:
    # floor(key/20), a-side probes its bucket and the next), so Spark
    # enumerates only in-band pairs — a nationkey-only join would
    # materialize all same-nation pairs, O((n/25)²), and band-filter
    # after the fact. Edit distance is an exact integer, so the oracle
    # needs no float handling.
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name", "c_nationkey")
    band = 20
    a = cust.withColumn(
        "__bkt", F.explode(F.array(F.floor(F.col("c_custkey") / band), F.floor(F.col("c_custkey") / band) + 1))
    ).alias("a")
    b = cust.withColumn("__bkt", F.floor(F.col("c_custkey") / band)).alias("b")
    return (
        a.join(
            b,
            (F.col("a.__bkt") == F.col("b.__bkt"))
            & (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey"))
            & (F.col("b.c_custkey") - F.col("a.c_custkey") <= band),
        )
        .select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("b.c_custkey").alias("id_b"),
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 2)
    )


@register(
    "g10_volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(12,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_nationkey <> cn.n_nationkey
    GROUP BY sn.n_name, cn.n_name, CAST(YEAR(l_shipdate) AS INT)
    """,
)
def g10_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q7 shape: cross-nation trade volume by ship year. Two nation
    # lookups on different keys (supplier-side and customer-side) — both
    # broadcast, as does supplier; the only shuffles are lineitem⨝orders
    # on orderkey and the final aggregation. The inequality predicate
    # (supp nation ≠ cust nation) evaluates post-join as a cheap filter on
    # already-broadcast-joined ints.
    li = load_table(spark, "lineitem", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(12,6)")
    return (
        # supplier/customer scale with SF — no forced broadcast; the two
        # nation lookups (25 rows, fixed) keep their hints.
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("sn_key") != F.col("cn_key"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("ship_year")
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@register(
    "g11_disjunctive_brackets",
    oracle="""
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(12,6))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def g11_disjunctive_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q19 shape: disjunction of three conjunctive brackets mixing
    # fact and dim predicates. Catalyst extracts the common-term filters
    # (quantity ∈ [1,30] on the scan side, the brand/size union on the
    # broadcast side) from the OR so both scans prune before the join;
    # the full disjunction then evaluates post-join. This is the classic
    # "can the optimizer push through an OR" plan test.
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(12,6)")
    q = F.col("l_quantity")
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 30)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 50)
            & (q >= 20)
            & (q <= 30)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(bracket)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


@register(
    "g12_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           COUNT(*) AS n_custs,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer, avg_bal
    WHERE CAST(c_acctbal AS DOUBLE) > a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1998-01-01')
    GROUP BY c_nationkey
    """,
)
def g12_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q22 shape (adapted: nationkey stands in for the phone prefix —
    # the testdata has no c_phone, and "no orders ever" is empty in this
    # synthetic corpus, so the anti-join condition is "no RECENT orders":
    # lapsed high-balance customers). The scalar average computes as a
    # one-row aggregate and CROSS-broadcasts into the filter (no collect);
    # the lapsed predicate is a left-anti join against the date-filtered
    # orders key projection (the filter pushes to that scan). AVG is
    # decimal-exact, then both the threshold and the compared balance are
    # cast to DOUBLE so the compare is type-identical in both engines
    # (Spark's DECIMAL(22,6) AVG vs DuckDB's DOUBLE AVG could flip rows
    # within ~5e-7 of the mean). The
    # scalar threshold goes through the SQL entry (same mechanism as g7)
    # so Catalyst plans it as a true scalar Subquery — computed once,
    # reused as a literal in the filter; a DataFrame-side crossJoin of the
    # 1-row aggregate would plan as a BroadcastNestedLoopJoin, which the
    # repo's plan gate forbids across the g tier. NOT EXISTS becomes a
    # LeftAnti with the date filter pushed to the orders scan.
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("customer_v")
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT c_nationkey,
               COUNT(*) AS n_custs,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer_v
        WHERE CAST(c_acctbal AS DOUBLE)
              > (SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 FROM customer_v WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders_v
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1998-01-01')
        GROUP BY c_nationkey
        """
    )


@register(
    "g13_top_revenue_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(12,6))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def g13_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q15 shape: the revenue "view" aggregates once per supplier over
    # a quarter, and the winner is picked by comparing against a scalar
    # MAX-of-aggregate Subquery — the one gold shape (scalar over a DERIVED
    # aggregate, not a base table) g7/g12 don't cover. The revenue CTE is
    # decimal-exact so the equality compare is engine-exact (a DOUBLE sum
    # would make "== MAX" order-dependent); the cast to DOUBLE happens only
    # in the output. Catalyst evaluates the CTE twice (once per reference)
    # — both instances push the shipdate filter to the scan, and at 100 TB
    # the date-pruned quarter is the working set, not the table. SQL entry
    # so the MAX plans as a true scalar Subquery (the g7/g12 mechanism).
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem_v")
    load_table(spark, "supplier", sf_dir).createOrReplaceTempView("supplier_v")
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(1 - l_discount AS DECIMAL(12,6))) AS total_revenue
          FROM lineitem_v
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        FROM supplier_v JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        """
    )


@register(
    "f17_golden_record",
    oracle="""
    WITH versions AS (
      SELECT o_custkey, o_orderstatus, o_orderpriority,
             CASE WHEN o_orderpriority = '1-URGENT'
                  THEN CAST(o_orderdate AS DATE) END AS last_urgent_date,
             CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
               * 10000000000 + o_orderkey AS ord
      FROM orders
    )
    SELECT o_custkey,
           arg_max(o_orderstatus,
                   CASE WHEN o_orderstatus IS NOT NULL THEN ord END) AS o_orderstatus,
           arg_max(o_orderpriority,
                   CASE WHEN o_orderpriority IS NOT NULL THEN ord END) AS o_orderpriority,
           arg_max(last_urgent_date,
                   CASE WHEN last_urgent_date IS NOT NULL THEN ord END) AS last_urgent_date,
           COUNT(*) AS n_versions
    FROM versions GROUP BY o_custkey
    """,
)
def f17_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Survivorship / golden-record merge (operators/survivorship.py): each
    # customer's order history collapses to one row whose fields take the
    # LATEST NON-NULL value independently — the MDM rule window-dedup can't
    # express (a newer row with a NULL field must not erase the older
    # non-null value; last_urgent_date is NULL on non-urgent orders and
    # must survive from the most recent URGENT one). Single max_by
    # aggregation pass, map-side partials, no sort. The ordering key is
    # recency composed with the unique order key (days-since-epoch·10^10 +
    # o_orderkey — ties in max_by are engine-arbitrary, so the key must be
    # unique), and the ordering is guarded per field because Spark's
    # max_by returns NULL values at the max key while DuckDB's arg_max
    # skips them — the guard makes both engines compute the same rule.
    from etl_hiscox_spark.operators.survivorship import golden_record

    orders = load_table(spark, "orders", sf_dir)
    versions = orders.select(
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        F.when(
            F.col("o_orderpriority") == "1-URGENT", F.col("o_orderdate").cast("date")
        ).alias("last_urgent_date"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            * 10000000000
            + F.col("o_orderkey")
        ).alias("__ord"),
    )
    return golden_record(
        versions,
        ["o_custkey"],
        F.col("__ord"),
        ["o_orderstatus", "o_orderpriority", "last_urgent_date"],
    )


@register(
    "g14_custdist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def g14_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q13 shape: how many customers placed k (non-urgent) orders,
    # including k=0 — the classic left-outer + double aggregation. The
    # exclusion predicate lives IN the join condition (not a pre-filter of
    # the outer result), so zero-order customers survive.
    #
    # Scale shape: orders filters map-side, then one shuffle keys BOTH the
    # join and the per-customer count (groupBy(c_custkey) reuses the
    # join's hash partitioning — no second exchange for the first agg);
    # the distribution agg shuffles |distinct counts| rows, i.e. nothing.
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "a18_approx_quantile_rollup",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           quantile_cont(o_totalprice, 0.5) AS p50_exact,
           quantile_cont(o_totalprice, 0.95) AS p95_exact,
           TRUE AS approx_within_rank_eps
    FROM orders
    GROUP BY date_trunc('month', o_orderdate)
    """,
)
def a18_approx_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mergeable quantile summaries per month: percentile_approx (GK
    # sketch, map-side partial merge — at 100 TB the per-group state is
    # O(accuracy), never the group's values; contrast a12's exact
    # interpolated percentile, which buffers the group).
    #
    # a16-mechanism partial oracle: the sketch estimate has no SQL twin,
    # so the declared output carries the exact p50/p95 (SQL-checkable —
    # Spark `percentile` == quantile_cont, parity pinned by a12) plus a
    # Spark-side proof of the GK guarantee IN RANK SPACE: the returned
    # value's rank interval [#(v < x)+1, #(v <= x)] must intersect
    # [p·n − tol, p·n + tol], tol = n/accuracy + 1. (Value-space bounds
    # from exact quantiles at p ± eps fail legitimately whenever the
    # window is narrower than one data point — approx returns actual
    # values, exact interpolates between them.) DuckDB emits TRUE
    # unconditionally: a sketch regression hash-FAILS instead of hiding
    # behind rows-only.
    acc = 1000
    price = F.col("o_totalprice")
    orders = load_table(spark, "orders", sf_dir)
    month = F.trunc(F.col("o_orderdate"), "month").alias("order_month")
    g = orders.groupBy(month).agg(
        F.percentile_approx(price, 0.5, acc).alias("a50"),
        F.percentile_approx(price, 0.95, acc).alias("a95"),
        F.percentile(price, F.lit(0.5)).alias("p50_exact"),
        F.percentile(price, F.lit(0.95)).alias("p95_exact"),
        F.count(F.lit(1)).alias("n"),
    )
    # g feeds two plan branches (the rank join probe and the final select);
    # without a materialization Spark would recompute the whole sketch
    # aggregation per branch — and percentile_approx is merge-order
    # dependent, so the branches could even disagree on a50/a95. The table
    # is |months| rows; the checkpoint is trivial.
    g = g.localCheckpoint(eager=True)
    ranks = (
        orders.select(month, price.alias("__v"))
        .join(g, "order_month")
        .groupBy("order_month")
        .agg(
            F.count_if(F.col("__v") <= F.col("a50")).alias("le50"),
            F.count_if(F.col("__v") < F.col("a50")).alias("lt50"),
            F.count_if(F.col("__v") <= F.col("a95")).alias("le95"),
            F.count_if(F.col("__v") < F.col("a95")).alias("lt95"),
        )
    )
    tol = F.col("n") / acc + 1

    def within(p, le, lt):
        target = F.col("n") * p
        return (F.col(le) >= target - tol) & (F.col(lt) + 1 <= target + tol)

    return g.join(ranks, "order_month").select(
        "order_month",
        "p50_exact",
        "p95_exact",
        (within(0.5, "le50", "lt50") & within(0.95, "le95", "lt95")).alias(
            "approx_within_rank_eps"
        ),
    )


@register(
    "g15_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def g15_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q17 shape: revenue from below-one-fifth-of-average-quantity
    # line items of one brand. The correlated per-part scalar subquery is
    # DECORRELATED by hand into a per-part aggregate joined back — the
    # rewrite Catalyst would have to find on the SQL form, made explicit:
    # at 100 TB the per-part avg table is |parts-of-brand| rows (the brand
    # filter semi-joins the avg build via the part dim before any heavy
    # work), and lineitem is scanned twice but shuffled on l_partkey once
    # per side with map-side partial aggs.
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#1")
    brand_lines = li.join(part, li.l_partkey == part.p_partkey, "left_semi")
    per_part_avg = brand_lines.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("__q_threshold")
    )
    return (
        brand_lines.join(per_part_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("__q_threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "a19_key_skew_profile",
    oracle="""
    WITH c AS (
      SELECT CAST(l_returnflag AS VARCHAR) AS key,
             COUNT(*) AS n_rows
      FROM lineitem GROUP BY 1
    ), t AS (
      SELECT CAST(SUM(n_rows) AS BIGINT) AS total, COUNT(*) AS d FROM c
    )
    SELECT key, n_rows,
           ROUND(n_rows / t.total, 6) AS share,
           ROUND(n_rows / (t.total / t.d), 6) AS x_mean
    FROM c, t ORDER BY n_rows DESC, key ASC NULLS FIRST LIMIT 10
    """,
)
def a19_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shuffle-planning diagnostics (operators/diagnostics.key_skew_profile):
    # the decision input for broadcast-vs-salt-vs-plain before a big join
    # ships at 100 TB. Per-key counts (map-side combined; shuffle =
    # |distinct| fixed-width rows), 1-row totals broadcast back, top-k via
    # TakeOrderedAndProject. l_returnflag is the corpus's naturally skewed
    # key (A/N/R with N ~ half the rows); share and x_mean are single
    # double divisions, bit-identical across engines.
    from etl_hiscox_spark.operators.diagnostics import key_skew_profile

    li = load_table(spark, "lineitem", sf_dir)
    out = key_skew_profile(li, "l_returnflag", top_k=10)
    return out.select(
        "key",
        "n_rows",
        F.round("share", 6).alias("share"),
        F.round("x_mean", 6).alias("x_mean"),
    )
