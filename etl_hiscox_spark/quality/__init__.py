"""Declarative data-quality rule engine (SURVEY.md §2.9 Q1-Q6)."""

from etl_hiscox_spark.quality.rules import (
    AcceptedValues,
    CrossColumn,
    NotNull,
    Range,
    Regex,
    Rule,
    RuleSet,
    Unique,
)
from etl_hiscox_spark.quality.engine import QualityEngine, QualityReport

__all__ = [
    "AcceptedValues",
    "CrossColumn",
    "NotNull",
    "QualityEngine",
    "QualityReport",
    "Range",
    "Regex",
    "Rule",
    "RuleSet",
    "Unique",
]
