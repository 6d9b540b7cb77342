"""Silver-layer cleaning functions (SURVEY.md §2.8 F1-F15).

Semantics are pinned by the reference's test expectations
(``tests/unit/test_ingestion.py:204-253`` clean_policy_data /
standardize_dates and the data-quality rules): trim+upper identifiers,
strip thousands separators from money, standardize multi-format dates to
ISO, treat empty strings as missing.

All pure ``pyspark.sql.functions`` expressions — JVM-side, codegen-friendly,
no UDFs. Each returns a Column usable in select/withColumn.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# F1+F2: identifier normalization ('  pol001  ' -> 'POL001')


def clean_identifier(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.upper(F.trim(c))


# F15: empty-string-as-missing ('' policy_id is invalid like NULL,
# tests/unit/test_ingestion.py:66,78)


def null_if_blank(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    t = F.trim(c)
    return F.when(t == "", F.lit(None)).otherwise(t)


# F3: numeric parse with thousands separator ('1,500.50' -> 1500.5)


def parse_money(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    # try_cast: unparseable -> NULL (ANSI-mode cast would abort the job;
    # invalid values are a quarantine concern, not a crash - F5/Q4)
    return F.regexp_replace(F.trim(c), ",", "").try_cast("decimal(18,2)")


# F4+F5: multi-format date standardization; unparseable -> NULL (quarantine
# upstream decides what to do with nulls). Formats pinned by
# tests/unit/test_ingestion.py:236-253.

DATE_FORMATS = ("yyyy-MM-dd", "MM/dd/yyyy", "yyyy/MM/dd", "dd-MM-yyyy")


def standardize_date(c: Column | str, formats: Sequence[str] = DATE_FORMATS) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    t = F.trim(c)
    return F.coalesce(*[F.try_to_timestamp(t, F.lit(fmt)).cast("date") for fmt in formats])


# F6: date difference in days (policy duration 30..1825 rule)


def days_between(end: Column | str, start: Column | str) -> Column:
    end = F.col(end) if isinstance(end, str) else end
    start = F.col(start) if isinstance(start, str) else start
    return F.datediff(end, start)


# F7: age in hours from a reference instant (freshness tiers 12/24h,
# health_check.py:348-361). ``now`` is passed explicitly — declared queries
# must not embed current_timestamp() (SURVEY.md §7).


def hours_old(ts: Column | str, now: Column) -> Column:
    ts = F.col(ts) if isinstance(ts, str) else ts
    return (F.unix_timestamp(now) - F.unix_timestamp(ts)) / F.lit(3600.0)


def freshness_tier(ts: Column | str, now: Column) -> Column:
    h = hours_old(ts, now)
    return (
        F.when(h < 12, F.lit("fresh")).when(h < 24, F.lit("aging")).otherwise(F.lit("stale"))
    )


# F8: batch-id formatting (strftime('%Y%m%d_%H%M%S'), ingestion.py:80)


def batch_id(ts: Column) -> Column:
    return F.date_format(ts, "yyyyMMdd_HHmmss")


# F9/F10: safe ratio + rounding (deductible/coverage, quality rates)


def safe_ratio(num: Column | str, den: Column | str, scale: int | None = None) -> Column:
    num = F.col(num) if isinstance(num, str) else num
    den = F.col(den) if isinstance(den, str) else den
    r = F.when(den != 0, num.cast("double") / den.cast("double"))
    return F.round(r, scale) if scale is not None else r


# F11: format validators (test_insurance_data_quality.py:33-48,224-225)

ID_PATTERNS = {
    "policy_id": r"^POL\d{3,}$",
    "claim_id": r"^CLM\d{3,}$",
    "customer_id": r"^CUST\d{3,}$",
    "agent_id": r"^AGT\d{3,}$",
    "adjuster_id": r"^ADJ\d{3,}$",
}
EMAIL_PATTERN = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


def matches_format(c: Column | str, pattern: str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.rlike(pattern)


def valid_email(c: Column | str) -> Column:
    return matches_format(c, EMAIL_PATTERN)


# Composite cleaners — the reference's clean_policy_data /
# standardize_dates (tests/unit/test_ingestion.py:204-253), generalized.


def clean_policies(df: DataFrame) -> DataFrame:
    """Normalize a raw policies frame: trim/upper ids and enums, parse
    money, standardize dates. Column subset is applied when present."""
    out = df
    for c in ("policy_id", "customer_id", "agent_id", "policy_type", "policy_status", "status"):
        if c in out.columns:
            out = out.withColumn(c, clean_identifier(null_if_blank(F.col(c))))
    for c in ("premium_amount", "premium", "deductible_amount", "deductible",
              "coverage_limit", "coverage_amount"):
        if c in out.columns:
            out = out.withColumn(c, parse_money(F.col(c).cast("string")))
    for c in ("start_date", "end_date"):
        if c in out.columns:
            out = out.withColumn(c, standardize_date(F.col(c).cast("string")))
    return out


def clean_claims(df: DataFrame) -> DataFrame:
    out = df
    for c in ("claim_id", "policy_id", "customer_id", "adjuster_id", "claim_type", "claim_status"):
        if c in out.columns:
            out = out.withColumn(c, clean_identifier(null_if_blank(F.col(c))))
    for c in ("claim_amount", "settlement_amount"):
        if c in out.columns:
            out = out.withColumn(c, parse_money(F.col(c).cast("string")))
    for c in ("claim_date", "settlement_date"):
        if c in out.columns:
            out = out.withColumn(c, standardize_date(F.col(c).cast("string")))
    return out
