"""DQ rule engine semantics (SURVEY.md §2.9): one-pass profile, severity
tiers, quarantine split — alert thresholds per
test_insurance_data_quality.py:337-369 of the reference."""

from __future__ import annotations

from etl_hiscox_spark.quality.engine import QualityEngine
from etl_hiscox_spark.quality.rules import (
    AcceptedValues,
    CrossColumn,
    NotNull,
    Range,
    Regex,
    RuleSet,
    Unique,
    insurance_rulesets,
)


def _policies_df(spark):
    rows = [
        ("POL001", "CUST001", "AUTO", 1200.0, 500.0, 50000.0, "ACTIVE"),
        ("POL002", "CUST002", "HOME", 2400.0, 1000.0, 120000.0, "ACTIVE"),
        ("", "CUST003", "LIFE", 3000.0, 0.0, 200000.0, "ACTIVE"),       # blank key
        ("POL004", None, "AUTO", 900.0, 250.0, 45000.0, "PENDING"),     # null customer
        ("POL005", "CUST005", "UNKNOWN", -500.0, 100.0, 30000.0, "ACTIVE"),  # bad enum+range
        ("POL001", "CUST001", "AUTO", 1250.0, 500.0, 50000.0, "ACTIVE"),     # dup key
    ]
    return spark.createDataFrame(
        rows,
        "policy_id string, customer_id string, policy_type string, premium_amount double,"
        " deductible_amount double, coverage_limit double, policy_status string",
    )


def _ruleset():
    return RuleSet(
        "policies",
        (
            NotNull("policy_id"),
            NotNull("customer_id"),
            Unique("policy_id"),
            Range("premium_amount", lo=100.0, hi=100000.0),
            AcceptedValues("policy_type", values=("AUTO", "HOME", "LIFE", "HEALTH", "BUSINESS")),
            CrossColumn("ded_vs_cov", expr_sql="deductible_amount <= coverage_limit * 0.5"),
        ),
    )


def test_profile_one_pass_scores(spark):
    report = QualityEngine().profile(_policies_df(spark), _ruleset())
    assert report.row_count == 6
    assert report.scores["notnull_policy_id"] == 5 / 6
    assert report.scores["notnull_customer_id"] == 5 / 6
    assert report.scores["range_premium_amount"] == 5 / 6
    assert report.scores["acceptedvalues_policy_type"] == 5 / 6
    assert report.scores["crosscolumn_ded_vs_cov"] == 1.0
    # uniqueness: 5 distinct / 6 rows ('' counts as a value for distinct)
    assert abs(report.uniqueness["policy_id"] - 5 / 6) < 1e-9
    assert report.completeness["customer_id"] == 5 / 6


def test_threshold_severity_tiers(spark):
    # score < threshold -> alert; critical if < 0.9*threshold
    report = QualityEngine(default_threshold=0.95).profile(_policies_df(spark), _ruleset())
    report = QualityEngine(default_threshold=0.95).check(report)
    sevs = {a.rule: a.severity for a in report.alerts}
    # 5/6 = 0.833 < 0.95*0.9=0.855 -> critical
    assert sevs["notnull_policy_id"] == "critical"
    assert "crosscolumn_ded_vs_cov" not in sevs  # 1.0 passes


def test_quarantine_split_counts(spark):
    df = _policies_df(spark)
    valid, bad = QualityEngine().split(df, _ruleset())
    # failing rows: blank key, null customer, bad enum+range => 3 bad
    assert bad.count() == 3
    assert valid.count() == 3
    tagged = QualityEngine().tag_failures(df, _ruleset())
    by_rule = {r["policy_id"]: set(r["failed_rules"]) for r in tagged.collect()}
    assert by_rule["POL005"] == {"range_premium_amount", "acceptedvalues_policy_type"}
    assert by_rule[""] == {"notnull_policy_id"}


def test_insurance_rulesets_compile(spark):
    # The reference's full declared rule surface compiles and evaluates.
    rs = insurance_rulesets()
    assert set(rs) == {"claims", "policies"}
    df = _policies_df(spark).withColumnRenamed("premium", "premium_amount")
    # evaluate row predicates only for columns present; smoke: all_pass builds
    import pyspark.sql.functions as F

    present = [
        r for r in rs["policies"].row_rules if all(
            c in df.columns for c in [r.column]
        ) and type(r).__name__ != "CrossColumn"
    ]
    pred = F.lit(True)
    for r in present:
        pred = pred & r.predicate()
    assert df.filter(pred).count() >= 1


def test_zscore_moments_are_exact_and_flag_symmetric(spark):
    # q7's mechanism: moments from decimal-exact sums -> z identical to a
    # direct two-pass computation; tail flag symmetric around the mean.
    from pyspark.sql import functions as F

    rows = [(i, "P", float(v)) for i, v in enumerate([10, 10, 10, 10, 100])]
    df = spark.createDataFrame(rows, "k long, g string, x double")
    dec = F.col("x").cast("decimal(18,2)")
    stats = df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("ss"),
    )
    j = df.join(F.broadcast(stats), "g")
    mean = F.col("s") / F.col("n")
    z = (F.col("x") - mean) / F.sqrt(F.col("ss") / F.col("n") - mean * mean)
    got = {r["k"]: r["z"] for r in j.select("k", F.round(z, 6).alias("z")).collect()}
    import statistics as st

    xs = [10.0, 10.0, 10.0, 10.0, 100.0]
    mu = st.mean(xs)
    sd = (sum((v - mu) ** 2 for v in xs) / len(xs)) ** 0.5
    assert abs(got[4] - round((100 - mu) / sd, 6)) < 1e-6
    assert abs(sum(got.values())) < 1e-6  # z-scores sum to ~0


def test_impute_by_group_median_fallback_ladder(spark):
    """Repair ladder: observed rows untouched; NULLs take the group
    median of OBSERVED values; a group with nothing observed falls back
    to the global median; an all-NULL frame stays NULL but flagged —
    repaired values are derived, never invented."""
    from etl_hiscox_spark.operators.imputation import impute_by_group_median

    df = spark.createDataFrame(
        [
            ("a", 1, 10), ("a", 2, 20), ("a", 3, None),   # group median 15.0
            ("b", 4, 7), ("b", 5, None),                  # odd obs -> 7.0
            ("c", 6, None),                               # no obs -> global
        ],
        "g string, id int, v int",
    )
    out = {
        r["id"]: (r["v_filled"], r["was_missing"])
        for r in impute_by_group_median(df, "v", ["g"]).collect()
    }
    assert out[1] == (10.0, False) and out[2] == (20.0, False)
    assert out[3] == (15.0, True)       # interpolated even-count median
    assert out[5] == (7.0, True)
    # global median of observed [10, 20, 7] = 10.0
    assert out[6] == (10.0, True)

    allnull = spark.createDataFrame([("a", 1, None)], "g string, id int, v int")
    row = impute_by_group_median(allnull, "v", ["g"]).collect()[0]
    assert row["v_filled"] is None and row["was_missing"] is True


def test_impute_null_group_key_gets_own_group_median(spark):
    """NULL group KEYS are real groups (r9 review): the null-safe join
    must hand a NULL-keyed missing row ITS group's observed median, not
    the global fallback."""
    from etl_hiscox_spark.operators.imputation import impute_by_group_median

    df = spark.createDataFrame(
        [(None, 1, 10), (None, 2, 20), (None, 3, None), ("b", 4, 100), ("b", 5, 200)],
        "g string, id int, v int",
    )
    out = {r["id"]: r["v_filled"] for r in impute_by_group_median(df, "v", ["g"]).collect()}
    assert out[3] == 15.0, f"NULL-keyed group got {out[3]} instead of its own median"
