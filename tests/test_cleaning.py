"""Silver cleaning semantics — pinned by the reference's expectations
(tests/unit/test_ingestion.py:204-253 in /root/reference)."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from etl_hiscox_spark.functions.cleaning import (
    batch_id,
    clean_identifier,
    days_between,
    freshness_tier,
    null_if_blank,
    parse_money,
    safe_ratio,
    standardize_date,
    valid_email,
)


def _one(spark, expr, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(expr.alias("out")).first()["out"]


def test_clean_identifier_trim_upper(spark):
    # '  POL001  ' -> 'POL001'; 'pol002' -> 'POL002' (test_ingestion.py:211,231)
    assert _one(spark, clean_identifier("c"), c="  POL001  ") == "POL001"
    assert _one(spark, clean_identifier("c"), c="pol002") == "POL002"
    assert _one(spark, clean_identifier("c"), c="auto") == "AUTO"


def test_parse_money_thousands_separator(spark):
    # '1,500.50' -> 1500.50 (test_ingestion.py:213,233)
    from decimal import Decimal

    assert _one(spark, parse_money("c"), c="1,500.50") == Decimal("1500.50")
    assert _one(spark, parse_money("c"), c=" 2,400.00 ") == Decimal("2400.00")
    assert _one(spark, parse_money("c"), c="not-a-number") is None


def test_standardize_date_multiformat(spark):
    # '01/01/2024', '2024-01-15', '2024/02/01' all -> ISO dates
    # (test_ingestion.py:236-253)
    assert _one(spark, standardize_date("c"), c="2024-01-15") == date(2024, 1, 15)
    assert _one(spark, standardize_date("c"), c="01/01/2024") == date(2024, 1, 1)
    assert _one(spark, standardize_date("c"), c="2024/02/01") == date(2024, 2, 1)
    # invalid-date detection (F5): unparseable -> NULL
    assert _one(spark, standardize_date("c"), c="invalid-date") is None


def test_null_if_blank(spark):
    assert _one(spark, null_if_blank("c"), c="   ") is None
    assert _one(spark, null_if_blank("c"), c="") is None
    assert _one(spark, null_if_blank("c"), c=" x ") == "x"


def test_days_between_and_ratio(spark):
    df = spark.createDataFrame(
        [(date(2024, 1, 1), date(2024, 12, 31), 500.0, 50000.0)],
        ["start", "end", "ded", "cov"],
    )
    row = df.select(
        days_between("end", "start").alias("d"),
        safe_ratio("ded", "cov", scale=4).alias("r"),
        safe_ratio("ded", F.lit(0)).alias("z"),
    ).first()
    assert row["d"] == 365
    assert row["r"] == 0.01
    assert row["z"] is None


def test_email_validation(spark):
    # 'invalid-email' / 'test@domain' rejected (test_insurance_data_quality.py:384)
    assert _one(spark, valid_email("c"), c="a.b@example.com")
    assert not _one(spark, valid_email("c"), c="invalid-email")
    assert not _one(spark, valid_email("c"), c="test@domain")


def test_freshness_and_batch_id(spark):
    # tiers: fresh <12h, aging 12-24h, stale >24h (health_check.py:352-361)
    df = spark.createDataFrame([("2024-01-02 00:00:00",)], ["ts"]).select(
        F.to_timestamp("ts").alias("ts")
    )
    now = F.to_timestamp(F.lit("2024-01-02 06:00:00"))
    assert df.select(freshness_tier("ts", now).alias("o")).first()["o"] == "fresh"
    now = F.to_timestamp(F.lit("2024-01-02 18:00:00"))
    assert df.select(freshness_tier("ts", now).alias("o")).first()["o"] == "aging"
    now = F.to_timestamp(F.lit("2024-01-04 00:00:00"))
    assert df.select(freshness_tier("ts", now).alias("o")).first()["o"] == "stale"
    assert (
        df.select(batch_id(F.col("ts")).alias("o")).first()["o"] == "20240102_000000"
    )
