"""Quality engine: one-pass profiling, threshold alerting, quarantine split
(SURVEY.md §2.9 Q2-Q6).

The reference evaluates each rule with its own pandas scan
(``tests/data_quality/test_insurance_data_quality.py:294-335``) and its
ingestion counts rows three times (``scripts/ingestion.py:83-98``). Here
every per-rule pass count plus completeness/uniqueness lands in ONE Spark
job (single agg over conditional counters — map-side combine, shuffle of one
row per partition).

Severity/alerting semantics are the reference's: score < threshold → alert;
critical if < 0.9×threshold, else warning
(``tests/data_quality/test_insurance_data_quality.py:337-369``). Quality
failures are observations, not aborts (``scripts/orchestrator.py:84-85``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_hiscox_spark.quality.rules import RuleSet, Unique


@dataclass
class Alert:
    rule: str
    score: float
    threshold: float
    severity: str  # critical | warning


@dataclass
class QualityReport:
    table: str
    row_count: int
    scores: dict[str, float]  # rule name -> pass rate in [0,1]
    completeness: dict[str, float]
    uniqueness: dict[str, float]
    alerts: list[Alert] = field(default_factory=list)

    @property
    def overall_score(self) -> float:
        vals = list(self.scores.values()) + list(self.completeness.values())
        return sum(vals) / len(vals) if vals else 1.0

    def to_row(self) -> dict:
        """Flat record for quality logging (logger.py:141-154 parity)."""
        return {
            "table": self.table,
            "total_records": self.row_count,
            "overall_score": round(self.overall_score, 4),
            "n_alerts": len(self.alerts),
            **{f"score_{k}": round(v, 4) for k, v in self.scores.items()},
        }


class QualityEngine:
    """Evaluate a RuleSet against a DataFrame.

    ``profile`` = Q2 (one-pass scores); ``check`` = Q3 (threshold alerts);
    ``split`` = Q4 (valid/quarantine frames); ``store_failures`` = Q5.
    """

    def __init__(self, default_threshold: float = 0.95):
        self.default_threshold = default_threshold

    # -- Q2: one-pass profile -------------------------------------------------

    def profile(self, df: DataFrame, ruleset: RuleSet) -> QualityReport:
        total = F.count(F.lit(1))
        aggs: list[Column] = [total.alias("__total")]
        # per-rule pass rates (row-level rules)
        for r in ruleset.row_rules:
            aggs.append(
                F.try_divide(
                    F.sum(F.when(r.predicate(), 1).otherwise(0)).cast("double"), total
                ).alias(f"rule__{r.name}")
            )
        # completeness per column (A8)
        for c in df.columns:
            aggs.append(F.try_divide(F.count(F.col(c)).cast("double"), total).alias(f"comp__{c}"))
        # uniqueness for Unique rules (A9): distinct non-null / non-null —
        # dbt's unique test ignores NULLs, so the denominator must too
        # (count(*) would fail nullable columns in proportion to null rate).
        for r in ruleset.set_rules:
            if isinstance(r, Unique):
                aggs.append(
                    F.try_divide(
                        F.count_distinct(F.col(r.column)).cast("double"),
                        F.count(F.col(r.column)),
                    ).alias(f"uniq__{r.column}")
                )
        row = df.agg(*aggs).collect()[0].asDict()
        n = int(row.pop("__total"))
        scores, comp, uniq = {}, {}, {}
        for k, v in row.items():
            if k.startswith("rule__"):
                scores[k[6:]] = float(v) if v is not None else 1.0
            elif k.startswith("comp__"):
                comp[k[6:]] = float(v) if v is not None else 1.0
            elif k.startswith("uniq__"):
                uniq[k[6:]] = float(v) if v is not None else 1.0
                scores[f"unique_{k[6:]}"] = float(v) if v is not None else 1.0
        return QualityReport(
            table=ruleset.table, row_count=n, scores=scores, completeness=comp, uniqueness=uniq
        )

    # -- Q3: threshold alerting ----------------------------------------------

    def check(
        self, report: QualityReport, thresholds: dict[str, float] | None = None
    ) -> QualityReport:
        thresholds = thresholds or {}
        for rule, score in report.scores.items():
            thr = thresholds.get(rule, self.default_threshold)
            if score < thr:
                severity = "critical" if score < 0.9 * thr else "warning"
                report.alerts.append(Alert(rule=rule, score=score, threshold=thr, severity=severity))
        return report

    # -- Q4: quarantine split -------------------------------------------------

    def split(self, df: DataFrame, ruleset: RuleSet) -> tuple[DataFrame, DataFrame]:
        """(valid, quarantined). One predicate evaluation per side — the
        anti-filter, not exceptAll, so no extra shuffle
        (quarantine_record action, test_ingestion.py:271-282)."""
        passes = ruleset.all_pass()
        return df.filter(passes), df.filter(~passes)

    def tag_failures(self, df: DataFrame, ruleset: RuleSet) -> DataFrame:
        """Quarantined rows tagged with the array of failed rule names —
        richer than the reference's per-test failure tables."""
        fails = F.array_compact(
            F.array(
                *[
                    F.when(~r.predicate(), F.lit(r.name)).otherwise(F.lit(None))
                    for r in ruleset.row_rules
                ]
            )
        )
        return df.withColumn("failed_rules", fails).filter(F.size("failed_rules") > 0)

    # -- Q5: store failures ---------------------------------------------------

    def store_failures(
        self, df: DataFrame, ruleset: RuleSet, path: str, fmt: str = "parquet"
    ) -> None:
        """Persist failing rows to the audit area (dbt store_failures
        parity, dbt_project.yml:61-63)."""
        bad = self.tag_failures(df, ruleset)
        bad.write.mode("overwrite").format(fmt).save(path)
