"""Rule DSL: declarative per-column rules compiled to Spark Column predicates.

Mirrors the reference's two rule layers:
- dbt schema tests — unique / not_null / accepted_values per column
  (``dbt/models/sources.yml:12-77``);
- config-driven thresholds and business rules
  (``dbt/dbt_project.yml:76-86``, ``tests/data_quality/test_insurance_data_quality.py``).

A rule is a dataclass with a ``predicate()`` returning a Column that is TRUE
for *passing* rows (null-safe: a NULL input passes every rule except
NotNull, matching dbt semantics where each test checks one concern).
``Unique`` is a set-level rule — it has no row predicate and is evaluated
with a window/groupBy instead.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """Base: subclasses implement ``predicate`` (row-level) or mark
    themselves set-level via ``row_level = False``."""

    column: str

    row_level: bool = field(default=True, init=False, repr=False)

    @property
    def name(self) -> str:
        return f"{type(self).__name__.lower()}_{self.column}"

    def predicate(self) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError


@dataclass(frozen=True)
class NotNull(Rule):
    """not_null test (sources.yml:16-17); '' counts as missing when
    ``treat_blank_as_null`` (F15 semantics, test_ingestion.py:66)."""

    treat_blank_as_null: bool = True

    def predicate(self) -> Column:
        c = F.col(self.column)
        if self.treat_blank_as_null:
            return c.isNotNull() & (F.trim(c.cast("string")) != "")
        return c.isNotNull()


@dataclass(frozen=True)
class AcceptedValues(Rule):
    """accepted_values test (sources.yml:38-45)."""

    values: tuple[str, ...] = ()

    def predicate(self) -> Column:
        c = F.col(self.column)
        return c.isNull() | c.isin(*self.values)


@dataclass(frozen=True)
class Range(Rule):
    """min/max bounds, inclusive (premium 100..100000 etc.,
    dbt_project.yml:83-84)."""

    lo: float | None = None
    hi: float | None = None

    def predicate(self) -> Column:
        c = F.col(self.column)
        p = F.lit(True)
        if self.lo is not None:
            p = p & (c >= self.lo)
        if self.hi is not None:
            p = p & (c <= self.hi)
        return c.isNull() | p


@dataclass(frozen=True)
class Regex(Rule):
    """Format check (^POL\\d{3,}$ etc., test_insurance_data_quality.py:33-48)."""

    pattern: str = ""

    def predicate(self) -> Column:
        c = F.col(self.column)
        return c.isNull() | c.rlike(self.pattern)


@dataclass(frozen=True)
class CrossColumn(Rule):
    """Cross-column / conditional business rule: arbitrary Column expr
    builder (end_date > start_date; LIFE => coverage >= 50000, …).
    ``column`` names the rule for reporting; ``expr`` is evaluated lazily
    so the dataclass stays hashable/frozen."""

    expr_sql: str = ""  # SQL boolean expression over the row

    def predicate(self) -> Column:
        return F.coalesce(F.expr(self.expr_sql), F.lit(True))


@dataclass(frozen=True)
class Unique(Rule):
    """unique test (sources.yml:15) — set-level; evaluated by the engine
    with count vs count_distinct (A9) or a window for row tagging."""

    row_level: bool = field(default=False, init=False, repr=False)

    def predicate(self) -> Column:
        raise TypeError("Unique is set-level; use QualityEngine")


@dataclass(frozen=True)
class RuleSet:
    """All rules for one table (the sources.yml block equivalent)."""

    table: str
    rules: tuple[Rule, ...]

    @property
    def row_rules(self) -> tuple[Rule, ...]:
        return tuple(r for r in self.rules if r.row_level)

    @property
    def set_rules(self) -> tuple[Rule, ...]:
        return tuple(r for r in self.rules if not r.row_level)

    def all_pass(self) -> Column:
        """Conjunction of all row-level predicates (quarantine split key)."""
        p = F.lit(True)
        for r in self.row_rules:
            p = p & r.predicate()
        return p


def insurance_rulesets() -> dict[str, RuleSet]:
    """The reference's declared rules, verbatim (sources.yml:12-77,
    dbt_project.yml:76-86, test_insurance_data_quality.py)."""
    claims = RuleSet(
        "claims",
        (
            NotNull("claim_id"),
            NotNull("policy_id"),
            NotNull("customer_id"),
            Unique("claim_id"),
            Regex("claim_id", pattern=r"^CLM\d{3,}$"),
            Regex("policy_id", pattern=r"^POL\d{3,}$"),
            Regex("customer_id", pattern=r"^CUST\d{3,}$"),
            Range("claim_amount", lo=0.0, hi=10_000_000.0),
            AcceptedValues("claim_type", values=("AUTO", "HOME", "LIFE", "HEALTH", "BUSINESS")),
            AcceptedValues("claim_status", values=("OPEN", "CLOSED", "PENDING", "REJECTED")),
            CrossColumn("settlement_after_claim", expr_sql="settlement_date >= claim_date"),
            CrossColumn(
                "settlement_within_claim", expr_sql="settlement_amount <= claim_amount"
            ),
        ),
    )
    policies = RuleSet(
        "policies",
        (
            NotNull("policy_id"),
            NotNull("customer_id"),
            Unique("policy_id"),
            Regex("policy_id", pattern=r"^POL\d{3,}$"),
            Regex("customer_id", pattern=r"^CUST\d{3,}$"),
            Regex("agent_id", pattern=r"^AGT\d{3,}$"),
            Range("premium_amount", lo=100.0, hi=100_000.0),
            Range("coverage_limit", lo=1_000.0, hi=10_000_000.0),
            AcceptedValues(
                "policy_type", values=("AUTO", "HOME", "LIFE", "HEALTH", "BUSINESS")
            ),
            AcceptedValues(
                "policy_status",
                values=("ACTIVE", "PENDING", "CANCELLED", "EXPIRED", "SUSPENDED"),
            ),
            CrossColumn("end_after_start", expr_sql="end_date > start_date"),
            CrossColumn(
                "deductible_vs_coverage",
                expr_sql="deductible_amount <= coverage_limit * 0.5",
            ),
            CrossColumn(
                "premium_vs_coverage",
                expr_sql="premium_amount >= coverage_limit * 0.01 "
                "AND premium_amount <= coverage_limit * 0.10",
            ),
            CrossColumn(
                "life_min_coverage",
                expr_sql="policy_type != 'LIFE' OR coverage_limit >= 50000",
            ),
            CrossColumn(
                "auto_deductible_positive",
                expr_sql="policy_type != 'AUTO' OR deductible_amount > 0",
            ),
            CrossColumn(
                "duration_bounds",
                expr_sql="datediff(end_date, start_date) BETWEEN 30 AND 1825",
            ),
        ),
    )
    return {"claims": claims, "policies": policies}
