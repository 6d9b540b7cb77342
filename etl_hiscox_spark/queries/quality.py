"""Data-quality engine queries (Q1-Q6) + scalar cleaning functions (F1-F15)
demonstrated on the testdata tables with DuckDB oracles.

The insurance-domain rulesets (``quality.rules.insurance_rulesets``) are
exercised on reference-shaped fixtures in tests/; here the same engine runs
over testdata so the driver's oracle can check the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_hiscox_spark.quality.rules import AcceptedValues, CrossColumn, NotNull, Range, RuleSet
from etl_hiscox_spark.queries import register
from etl_hiscox_spark.registry import load_table
from etl_hiscox_spark.smalldf import local_rows_df


def lineitem_ruleset() -> RuleSet:
    """A deliberately-tight ruleset over lineitem so some rows fail
    (exercises quarantine): quantity <= 45, discount <= 0.08, flags enum."""
    return RuleSet(
        "lineitem",
        (
            NotNull("l_orderkey", treat_blank_as_null=False),
            Range("l_quantity", lo=1.0, hi=45.0),
            Range("l_discount", lo=0.0, hi=0.08),
            AcceptedValues("l_returnflag", values=("A", "N")),
            CrossColumn("price_consistency", expr_sql="l_extendedprice > l_quantity * 900"),
        ),
    )


@register(
    "q2_rule_profile",
    oracle="""
    SELECT COUNT(*) AS row_count,
           CAST(SUM(CASE WHEN l_orderkey IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS pass_notnull_orderkey,
           CAST(SUM(CASE WHEN l_quantity IS NULL OR (l_quantity >= 1.0 AND l_quantity <= 45.0)
                    THEN 1 ELSE 0 END) AS BIGINT) AS pass_range_quantity,
           CAST(SUM(CASE WHEN l_discount IS NULL OR (l_discount >= 0.0 AND l_discount <= 0.08)
                    THEN 1 ELSE 0 END) AS BIGINT) AS pass_range_discount,
           CAST(SUM(CASE WHEN l_returnflag IS NULL OR l_returnflag IN ('A', 'N')
                    THEN 1 ELSE 0 END) AS BIGINT) AS pass_accepted_returnflag,
           CAST(SUM(CASE WHEN COALESCE(l_extendedprice > l_quantity * 900, TRUE)
                    THEN 1 ELSE 0 END) AS BIGINT) AS pass_price_consistency
    FROM lineitem
    """,
)
def q2_rule_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q2: every rule's pass count in ONE aggregation pass (vs. the
    # reference's scan-per-rule). Counts (not rates) keep the oracle integral.
    rs = lineitem_ruleset()
    li = load_table(spark, "lineitem", sf_dir)
    names = {
        "notnull_l_orderkey": "pass_notnull_orderkey",
        "range_l_quantity": "pass_range_quantity",
        "range_l_discount": "pass_range_discount",
        "acceptedvalues_l_returnflag": "pass_accepted_returnflag",
        "crosscolumn_price_consistency": "pass_price_consistency",
    }
    return li.agg(
        F.count(F.lit(1)).alias("row_count"),
        *[
            F.sum(F.when(r.predicate(), 1).otherwise(0)).alias(names[r.name])
            for r in rs.row_rules
        ],
    )


@register(
    "q4_quarantine_split",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE NOT (l_orderkey IS NOT NULL
           AND (l_quantity IS NULL OR (l_quantity >= 1.0 AND l_quantity <= 45.0))
           AND (l_discount IS NULL OR (l_discount >= 0.0 AND l_discount <= 0.08))
           AND (l_returnflag IS NULL OR l_returnflag IN ('A', 'N'))
           AND COALESCE(l_extendedprice > l_quantity * 900, TRUE))
    """,
)
def q4_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q4: quarantined rows (the invalid side of the split) — anti-filter,
    # no exceptAll shuffle (quarantine_record action parity).
    from etl_hiscox_spark.quality.engine import QualityEngine

    li = load_table(spark, "lineitem", sf_dir)
    _, bad = QualityEngine().split(li, lineitem_ruleset())
    return bad.select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@register(
    "q4_failure_tagging",
    oracle="""
    SELECT l_orderkey, l_linenumber, n_failed FROM (
      SELECT l_orderkey, l_linenumber,
             (CASE WHEN l_quantity IS NULL OR (l_quantity >= 1.0 AND l_quantity <= 45.0)
                   THEN 0 ELSE 1 END)
             + (CASE WHEN l_discount IS NULL OR (l_discount >= 0.0 AND l_discount <= 0.08)
                     THEN 0 ELSE 1 END)
             + (CASE WHEN l_returnflag IS NULL OR l_returnflag IN ('A', 'N')
                     THEN 0 ELSE 1 END)
             + (CASE WHEN COALESCE(l_extendedprice > l_quantity * 900, TRUE)
                     THEN 0 ELSE 1 END) AS n_failed
      FROM lineitem
    ) WHERE n_failed > 0
    """,
)
def q4_failure_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q5 shape: per-row failed-rule count (array of names in the engine;
    # the count keeps the oracle portable).
    from etl_hiscox_spark.quality.engine import QualityEngine

    rs = lineitem_ruleset()
    li = load_table(spark, "lineitem", sf_dir)
    tagged = QualityEngine().tag_failures(li, rs)
    # NotNull(l_orderkey) never fails (PK); exclude to keep parity with the
    # 4-rule oracle above.
    return tagged.select(
        "l_orderkey",
        "l_linenumber",
        F.size(
            F.filter(F.col("failed_rules"), lambda x: x != F.lit("notnull_l_orderkey"))
        ).alias("n_failed"),
    ).filter(F.col("n_failed") > 0)


# ---------------------------------------------------------------------------
# Scalar-function queries (F1-F15)
# ---------------------------------------------------------------------------


@register(
    "f_string_cleaning",
    oracle="""
    SELECT p_partkey,
           upper(trim(p_name)) AS name_clean,
           NULLIF(trim(p_type), '') AS type_or_null,
           length(p_name) AS name_len,
           CAST(round(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.9 AS DECIMAL(2,1)), 2)
                AS DOUBLE) AS discounted_price
    FROM part
    """,
)
def f_string_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F1 trim, F2 upper, F15 blank-as-null, F10 round.
    from etl_hiscox_spark.functions.cleaning import clean_identifier, null_if_blank

    return load_table(spark, "part", sf_dir).select(
        "p_partkey",
        clean_identifier("p_name").alias("name_clean"),
        null_if_blank("p_type").alias("type_or_null"),
        F.length("p_name").alias("name_len"),
        # Rounding happens in exact decimal: double-rounding diverges across
        # engines at .xx5 boundaries (SURVEY.md §7).
        F.round(F.col("p_retailprice").cast("decimal(18,2)") * F.lit(0.9).cast("decimal(2,1)"), 2)
        .cast("double")
        .alias("discounted_price"),
    )


@register(
    "f4_multiformat_dates",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE o_orderkey % 3
               WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
               WHEN 1 THEN strftime(o_orderdate, '%m/%d/%Y')
               ELSE strftime(o_orderdate, '%Y/%m/%d') END AS date_str
      FROM orders
    )
    SELECT o_orderkey, date_str,
           CAST(COALESCE(try_strptime(date_str, '%Y-%m-%d'),
                         try_strptime(date_str, '%m/%d/%Y'),
                         try_strptime(date_str, '%Y/%m/%d')) AS DATE) AS parsed_date
    FROM raw
    """,
)
def f4_multiformat_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F4/F5: multi-format date standardization round-trip — formats pinned
    # by test_ingestion.py:236-253.
    from etl_hiscox_spark.functions.cleaning import standardize_date

    raw = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 3 == 1, F.date_format("o_orderdate", "MM/dd/yyyy"))
        .otherwise(F.date_format("o_orderdate", "yyyy/MM/dd"))
        .alias("date_str"),
    )
    return raw.select(
        "o_orderkey", "date_str", standardize_date("date_str").alias("parsed_date")
    )


@register(
    "f6_f9_date_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           datediff('day', o_orderdate, l_shipdate) AS days_to_ship,
           strftime(l_shipdate, '%Y-%m') AS ship_month,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(12,6)), 2) AS DOUBLE) AS discount_value
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def f6_f9_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F6 datediff, F8 date formatting, F9 arithmetic, F10 round.
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("days_to_ship"),
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        F.round(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_discount").cast("decimal(12,6)"),
            2,
        )
        .cast("double")
        .alias("discount_value"),
    )


@register(
    "q1_rule_violations",
    oracle="""
    WITH agg AS (
      SELECT CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1,
             CAST(SUM(CASE WHEN NOT (l_quantity IS NULL OR (l_quantity >= 1.0 AND l_quantity <= 45.0))
                      THEN 1 ELSE 0 END) AS BIGINT) AS v2,
             CAST(SUM(CASE WHEN NOT (l_discount IS NULL OR (l_discount >= 0.0 AND l_discount <= 0.08))
                      THEN 1 ELSE 0 END) AS BIGINT) AS v3,
             CAST(SUM(CASE WHEN NOT (l_returnflag IS NULL OR l_returnflag IN ('A', 'N'))
                      THEN 1 ELSE 0 END) AS BIGINT) AS v4,
             CAST(SUM(CASE WHEN NOT COALESCE(l_extendedprice > l_quantity * 900, TRUE)
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
    """,
)
def q1_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q1: the rule DSL end-to-end — row-level rules compile to predicates,
    # set-level Unique evaluates as count vs count_distinct, all in ONE
    # aggregation pass, unpivoted to (rule_name, n_violations).
    from etl_hiscox_spark.quality.rules import Unique

    rs = lineitem_ruleset()
    li = load_table(spark, "lineitem", sf_dir)
    aggs = [
        F.sum(F.when(~r.predicate(), 1).otherwise(0)).cast("long").alias(r.name)
        for r in rs.row_rules
    ]
    uniq = Unique("l_orderkey")
    aggs.append(
        (F.count(F.lit(1)) - F.count_distinct(F.col(uniq.column))).cast("long").alias(uniq.name)
    )
    wide = li.agg(*aggs)
    return wide.unpivot([], list(wide.columns), "rule_name", "n_violations")


@register(
    "q3_threshold_alerts",
    oracle="""
    WITH agg AS (
      SELECT
        CAST(SUM(CASE WHEN l_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*) AS s_notnull,
        CAST(SUM(CASE WHEN l_quantity IS NULL OR (l_quantity >= 1.0 AND l_quantity <= 45.0)
                 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS s_qty,
        CAST(SUM(CASE WHEN l_discount IS NULL OR (l_discount >= 0.0 AND l_discount <= 0.08)
                 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS s_disc,
        CAST(SUM(CASE WHEN l_returnflag IS NULL OR l_returnflag IN ('A', 'N')
                 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS s_flag,
        CAST(SUM(CASE WHEN COALESCE(l_extendedprice > l_quantity * 900, TRUE)
                 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS s_price
      FROM lineitem
    ), long AS (
      SELECT 'notnull_l_orderkey' AS rule_name, s_notnull AS score FROM agg
      UNION ALL SELECT 'range_l_quantity', s_qty FROM agg
      UNION ALL SELECT 'range_l_discount', s_disc FROM agg
      UNION ALL SELECT 'acceptedvalues_l_returnflag', s_flag FROM agg
      UNION ALL SELECT 'crosscolumn_price_consistency', s_price FROM agg
    )
    SELECT rule_name, score,
           CAST(0.95 AS DOUBLE) AS threshold,
           CASE WHEN score < CAST(0.9 AS DOUBLE) * CAST(0.95 AS DOUBLE)
                THEN 'critical' ELSE 'warning' END AS severity
    FROM long WHERE score < CAST(0.95 AS DOUBLE)
    """,
)
def q3_threshold_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q3: threshold alerting — one-pass profile scores -> Alert records
    # (severity tiers per QualityEngine.check: critical below 90% of the
    # threshold). The report row is tiny (one row of scores), so the
    # engine's driver-side check() is the declared path.
    from etl_hiscox_spark.quality.engine import QualityEngine

    rs = lineitem_ruleset()
    li = load_table(spark, "lineitem", sf_dir)
    engine = QualityEngine(default_threshold=0.95)
    report = engine.check(engine.profile(li, rs))
    rows = [(a.rule, a.score, a.threshold, a.severity) for a in report.alerts]
    return local_rows_df(
        spark, rows, "rule_name string, score double, threshold double, severity string"
    )


@register(
    "f3_money_parse",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CAST(o_orderkey % 900 + 100 AS VARCHAR) || ','
               || lpad(CAST(o_orderkey % 1000 AS VARCHAR), 3, '0') || '.'
               || lpad(CAST(o_orderkey % 100 AS VARCHAR), 2, '0') AS money_str
      FROM orders
    )
    SELECT o_orderkey, money_str,
           CAST(TRY_CAST(replace(money_str, ',', '') AS DECIMAL(18,2)) AS DOUBLE) AS amount
    FROM raw
    """,
)
def f3_money_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F3: thousands-separator money parse ('1,500.50' -> 1500.50 exact
    # decimal; unparseable -> NULL via try_cast). The input strings are a
    # pure function of o_orderkey so both engines build identical text.
    # The parse itself is exact DECIMAL(18,2); the declared OUTPUT is cast
    # to DOUBLE per the repo determinism rule (queries/__init__.py) — the
    # driver canonicalizes DuckDB decimals through pandas float64 while
    # Spark yields Decimal objects, so a raw decimal column rows/schema-
    # matches but hash-fails (CORRECTNESS_r03, VERDICT r3 item 1).
    from etl_hiscox_spark.functions.cleaning import parse_money

    raw = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        F.concat(
            (F.col("o_orderkey") % 900 + 100).cast("string"),
            F.lit(","),
            F.lpad((F.col("o_orderkey") % 1000).cast("string"), 3, "0"),
            F.lit("."),
            F.lpad((F.col("o_orderkey") % 100).cast("string"), 2, "0"),
        ).alias("money_str"),
    )
    return raw.select(
        "o_orderkey", "money_str", parse_money("money_str").cast("double").alias("amount")
    )


@register(
    "f8_batch_id_format",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y%m%d_%H%M%S') AS batch_id,
           try_strptime(strftime(o_orderdate, '%Y%m%d_%H%M%S'), '%Y%m%d_%H%M%S') AS parsed_back
    FROM orders
    """,
)
def f8_batch_id_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F8: batch-id formatting (strftime('%Y%m%d_%H%M%S'), ingestion.py:80)
    # plus the inverse parse — the round-trip pins both directions.
    from etl_hiscox_spark.functions.cleaning import batch_id

    o = load_table(spark, "orders", sf_dir)
    bid = batch_id(F.col("o_orderdate"))
    return o.select(
        "o_orderkey",
        bid.alias("batch_id"),
        F.try_to_timestamp(bid, F.lit("yyyyMMdd_HHmmss")).alias("parsed_back"),
    )


@register(
    "q5_store_failures",
    oracle="""
    SELECT l_orderkey, l_linenumber, n_failed FROM (
      SELECT l_orderkey, l_linenumber,
             (CASE WHEN l_quantity IS NULL OR (l_quantity >= 1.0 AND l_quantity <= 45.0)
                   THEN 0 ELSE 1 END)
             + (CASE WHEN l_discount IS NULL OR (l_discount >= 0.0 AND l_discount <= 0.08)
                     THEN 0 ELSE 1 END)
             + (CASE WHEN l_returnflag IS NULL OR l_returnflag IN ('A', 'N')
                     THEN 0 ELSE 1 END)
             + (CASE WHEN COALESCE(l_extendedprice > l_quantity * 900, TRUE)
                     THEN 0 ELSE 1 END) AS n_failed
      FROM lineitem
    ) WHERE n_failed > 0
    """,
)
def q5_store_failures(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q5: dbt store_failures parity — failing rows persisted to the audit
    # area (write path), then read back. The oracle checks the full
    # write→read round-trip carries exactly the quarantine rows.
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from etl_hiscox_spark.quality.engine import QualityEngine

    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    root = _os.path.join(_tf.gettempdir(), "etl_hiscox_spark_writes", f"q5_store_{tag}")
    if _os.path.exists(root):
        _sh.rmtree(root)
    _os.makedirs(root)
    path = _os.path.join(root, "lineitem_failures")

    rs = lineitem_ruleset()
    li = load_table(spark, "lineitem", sf_dir)
    QualityEngine().store_failures(li, rs, path)
    back = spark.read.parquet(path)
    # NotNull(l_orderkey) never fails (PK); exclude for parity with the
    # 4-rule oracle (same convention as q4_failure_tagging).
    return back.select(
        "l_orderkey",
        "l_linenumber",
        F.size(
            F.filter(F.col("failed_rules"), lambda x: x != F.lit("notnull_l_orderkey"))
        ).alias("n_failed"),
    ).filter(F.col("n_failed") > 0)


@register(
    "q6_observe_metrics",
    oracle="""
    SELECT 'q6_write' AS step,
           COUNT(*) AS total_records,
           CAST(SUM(CASE WHEN l_orderkey IS NOT NULL
                      AND (l_quantity IS NULL OR (l_quantity >= 1.0 AND l_quantity <= 45.0))
                      AND (l_discount IS NULL OR (l_discount >= 0.0 AND l_discount <= 0.08))
                      AND (l_returnflag IS NULL OR l_returnflag IN ('A', 'N'))
                      AND COALESCE(l_extendedprice > l_quantity * 900, TRUE)
                    THEN 1 ELSE 0 END) AS BIGINT) AS valid_records,
           CAST(SUM(CASE WHEN NOT (l_orderkey IS NOT NULL
                      AND (l_quantity IS NULL OR (l_quantity >= 1.0 AND l_quantity <= 45.0))
                      AND (l_discount IS NULL OR (l_discount >= 0.0 AND l_discount <= 0.08))
                      AND (l_returnflag IS NULL OR l_returnflag IN ('A', 'N'))
                      AND COALESCE(l_extendedprice > l_quantity * 900, TRUE))
                    THEN 1 ELSE 0 END) AS BIGINT) AS invalid_records
    FROM lineitem
    """,
)
def q6_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q6: quality logging via DataFrame.observe — the write job itself
    # produces total/valid/invalid counts (zero extra scans); the oracle
    # checks the observed numbers, proving metrics ride the write.
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from etl_hiscox_spark.observability import write_with_metrics

    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    root = _os.path.join(_tf.gettempdir(), "etl_hiscox_spark_writes", f"q6_observe_{tag}")
    if _os.path.exists(root):
        _sh.rmtree(root)
    _os.makedirs(root)
    path = _os.path.join(root, "lineitem_out")

    rs = lineitem_ruleset()
    li = load_table(spark, "lineitem", sf_dir)
    m = write_with_metrics(li, path, step="q6_write", valid_predicate=rs.all_pass())
    return local_rows_df(
        spark,
        [(m.step, m.records_processed, m.records_valid, m.records_invalid)],
        "step string, total_records bigint, valid_records bigint, invalid_records bigint",
    )


@register(
    "q7_outlier_zscore",
    oracle="""
    WITH stats AS (
      SELECT o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS ss
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderkey, orders.o_orderpriority,
           ROUND((CAST(o_totalprice AS DOUBLE) - s / n)
                 / sqrt(ss / n - (s / n) * (s / n)), 6) AS z
    FROM orders JOIN stats ON orders.o_orderpriority = stats.o_orderpriority
    WHERE ABS((CAST(o_totalprice AS DOUBLE) - s / n)
              / sqrt(ss / n - (s / n) * (s / n))) > 1.5
    """,
)
def q7_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Statistical anomaly detection as a DQ stage: per-priority z-scores of
    # order totals, flag the |z| > 1.5 tail. (Production uses 3-sigma; the
    # synthetic totals are uniform, where max |z| = sqrt(3) ~ 1.77, so a
    # 3-sigma gate would be vacuously empty — 1.5 keeps the driver check
    # non-trivial.) The group moments come from DECIMAL-exact
    # sums (SUM and SUM of squares) cast to DOUBLE once — a float STDDEV
    # aggregate would make z depend on summation order and drift between
    # engines near the 3.0 boundary; with exact sums both engines evaluate
    # the IDENTICAL double expression. One agg pass for the moments (tiny:
    # |priorities| rows, broadcast back), one broadcast join — the fact
    # table never shuffles. z in the output is rounded; the flag compares
    # the unrounded-but-engine-identical expression.
    orders = load_table(spark, "orders", sf_dir)
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    stats = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(price_dec).cast("double").alias("s"),
        F.sum(price_dec * price_dec).cast("double").alias("ss"),
    )
    j = orders.join(F.broadcast(stats), "o_orderpriority")
    mean = F.col("s") / F.col("n")
    z = (F.col("o_totalprice").cast("double") - mean) / F.sqrt(
        F.col("ss") / F.col("n") - mean * mean
    )
    return j.filter(F.abs(z) > 1.5).select(
        "o_orderkey", "o_orderpriority", F.round(z, 6).alias("z")
    )


@register(
    "q8_median_imputation",
    oracle="""
    WITH masked AS (
      SELECT doc_id, lang, source,
             CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END AS v
      FROM documents
    ), med AS (
      SELECT lang, source, quantile_cont(v, 0.5) AS m
      FROM masked GROUP BY lang, source
    ), gmed AS (SELECT quantile_cont(v, 0.5) AS g FROM masked)
    SELECT m2.doc_id, m2.lang, m2.source,
           ROUND(COALESCE(med.m, gmed.g), 6) AS n_chars_filled
    FROM masked m2
    LEFT JOIN med ON med.lang IS NOT DISTINCT FROM m2.lang
                 AND med.source IS NOT DISTINCT FROM m2.source
    CROSS JOIN gmed
    WHERE m2.v IS NULL
    """,
)
def q8_median_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DQ REPAIR tier (operators/imputation.impute_by_group_median): Q1-Q7
    # detect violations; this closes the loop — missing numerics repaired
    # from the finest grouping that observed data (group median, global
    # fallback, flagged-never-invented). Missingness is PLANTED
    # deterministically (doc_id % 7 == 0 masked, the s15 corrupt-rows
    # pattern) so the oracle replays mask -> exact interpolated median ->
    # coalesce for every repaired row; a wrong percentile interpolation,
    # null handling in the aggregate, or fallback order hash-fails.
    # Median parity: Spark percentile(col, 0.5) and DuckDB quantile_cont
    # both average the two middle values in double arithmetic. Both sides
    # join medians back NULL-SAFELY (<=> / IS NOT DISTINCT FROM) so a
    # NULL group key keeps its own group's median (r9 review).
    from etl_hiscox_spark.operators.imputation import impute_by_group_median

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        "lang",
        "source",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(F.col("n_chars")).alias("v"),
    )
    out = impute_by_group_median(docs, "v", ["lang", "source"], filled_col="n_chars_filled")
    return out.filter(F.col("was_missing")).select(
        "doc_id", "lang", "source", F.round("n_chars_filled", 6).alias("n_chars_filled")
    )
