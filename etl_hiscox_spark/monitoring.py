"""Health checks — monitoring parity (``scripts/monitoring/health_check.py``
and ``pipeline_monitor.py`` of the reference).

Checks are data-plane facts (table existence, row counts, freshness tiers),
aggregated into an overall status: healthy / degraded / unhealthy. Freshness
tiers are the reference's 12/24-hour boundaries (health_check.py:352-361);
alert ceilings come from :class:`etl_hiscox_spark.config.EngineConfig`.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from etl_hiscox_spark.config import EngineConfig
from etl_hiscox_spark.sources.readers import latest_object


@dataclass
class CheckResult:
    name: str
    status: str  # pass | warn | fail
    detail: str = ""


@dataclass
class HealthReport:
    checks: list[CheckResult] = field(default_factory=list)

    @property
    def status(self) -> str:
        if any(c.status == "fail" for c in self.checks):
            return "unhealthy"
        if any(c.status == "warn" for c in self.checks):
            return "degraded"
        return "healthy"

    def to_dict(self) -> dict:
        return {
            "status": self.status,
            "checks": {c.name: {"status": c.status, "detail": c.detail} for c in self.checks},
        }


def freshness_tier_of(age_hours: float) -> str:
    if age_hours < 12:
        return "fresh"
    if age_hours < 24:
        return "aging"
    return "stale"


@dataclass
class AlertThresholds:
    """AlertManager ceilings (pipeline_monitor.py:281-284 of the reference)."""

    max_pipeline_minutes: float = 60.0
    max_error_rate: float = 0.05
    max_memory_mb: float = 4096.0


def check_pipeline_alerts(
    metrics: "list",
    thresholds: AlertThresholds | None = None,
) -> list[CheckResult]:
    """Evaluate PipelineMetrics records against the alert ceilings.

    Duration > ceiling or error rate > 5% → fail-severity alerts; the
    caller decides whether alerts abort (the reference treats them as
    observations — orchestrator.py:84-85)."""
    thresholds = thresholds or AlertThresholds()
    out: list[CheckResult] = []
    total_seconds = sum(m.duration_seconds for m in metrics)
    if total_seconds > thresholds.max_pipeline_minutes * 60:
        out.append(
            CheckResult(
                name="pipeline_duration",
                status="fail",
                detail=f"{total_seconds / 60:.1f} min > {thresholds.max_pipeline_minutes} min",
            )
        )
    for m in metrics:
        if m.records_processed > 0:
            err = m.records_invalid / m.records_processed
            if err > thresholds.max_error_rate:
                out.append(
                    CheckResult(
                        name=f"error_rate:{m.step}",
                        status="fail",
                        detail=f"{err:.1%} > {thresholds.max_error_rate:.0%}",
                    )
                )
    return out


class HealthChecker:
    def __init__(self, spark: SparkSession, config: EngineConfig | None = None):
        self.spark = spark
        self.config = config or EngineConfig()

    def check_table(self, path: str, name: str, min_rows: int | None = None) -> CheckResult:
        """Existence + minimum row count (min_row_count threshold)."""
        min_rows = self.config.min_row_count if min_rows is None else min_rows
        try:
            n = self.spark.read.parquet(path).count()
        except Exception as e:  # noqa: BLE001
            return CheckResult(name=name, status="fail", detail=f"unreadable: {str(e)[:120]}")
        if n < min_rows:
            return CheckResult(
                name=name, status="warn", detail=f"{n} rows < min_row_count {min_rows}"
            )
        return CheckResult(name=name, status="pass", detail=f"{n} rows")

    def check_freshness(
        self, root: str, name: str, suffix: str = "", now: float | None = None
    ) -> CheckResult:
        """Latest-object age → fresh/aging/stale (stale ⇒ warn; the
        reference treats staleness as observation, not outage)."""
        blob = latest_object(self.spark, root, suffix)
        if blob is None:
            return CheckResult(name=name, status="fail", detail="no objects found")
        now = now if now is not None else time.time()
        age_h = (now - blob.last_modified) / 3600.0
        tier = freshness_tier_of(age_h)
        # stale ⇒ warn (degraded), not fail: the reference treats staleness
        # as an observation, not an outage (health_check.py:352-361).
        status = "pass" if tier == "fresh" else "warn"
        return CheckResult(name=name, status=status, detail=f"{tier} ({age_h:.1f}h old)")

    def run(self, tables: dict[str, str], sources: dict[str, str] | None = None) -> HealthReport:
        """tables: name -> parquet path; sources: name -> directory root."""
        report = HealthReport()
        for name, path in tables.items():
            report.checks.append(self.check_table(path, f"table:{name}"))
        for name, root in (sources or {}).items():
            report.checks.append(self.check_freshness(root, f"source:{name}"))
        return report
