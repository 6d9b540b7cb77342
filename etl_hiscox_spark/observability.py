"""Observability: single-pass pipeline metrics + quality logging
(SURVEY.md §1.1 metrics rows, §2.9 Q6, §3.2 triple-scan fix).

The reference counts rows with separate actions before/after dedup and
before write (``scripts/ingestion.py:83-98`` — three full scans) and logs
quality rates from driver-side dict math (``scripts/utils/logger.py:141-168``,
``scripts/monitoring/pipeline_monitor.py:35-48``). Here metrics ride the
write job itself via ``DataFrame.observe`` — zero extra scans at any scale.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener  # noqa: F401  (re-export)


@dataclass
class PipelineMetrics:
    """Per-step metric record (PipelineMetrics dataclass parity)."""

    step: str
    records_processed: int = 0
    records_valid: int = 0
    records_invalid: int = 0
    started_at: float = field(default_factory=time.time)
    finished_at: float | None = None

    @property
    def duration_seconds(self) -> float:
        end = self.finished_at if self.finished_at is not None else time.time()
        return max(end - self.started_at, 0.0)

    @property
    def quality_rate(self) -> float:
        if self.records_processed == 0:
            return 1.0
        return self.records_valid / self.records_processed

    @property
    def records_per_second(self) -> float:
        d = self.duration_seconds
        return self.records_processed / d if d > 0 else 0.0

    def to_log_line(self) -> str:
        """Structured quality log (logger.py:141-154 shape)."""
        return json.dumps(
            {
                "step": self.step,
                "total_records": self.records_processed,
                "valid_records": self.records_valid,
                "invalid_records": self.records_invalid,
                "quality_rate": round(self.quality_rate, 4),
                "records_per_second": round(self.records_per_second, 2),
                "duration_seconds": round(self.duration_seconds, 2),
            }
        )


def write_with_metrics(
    df: DataFrame,
    path: str,
    step: str,
    valid_predicate: Column | None = None,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> PipelineMetrics:
    """Write + count (+ quality split counts) in a single Spark job.

    This is the reference's count→dedup→count→write quadruple collapsed to
    one action (SURVEY.md §3.2).
    """
    from pyspark.sql import Observation

    obs = Observation(step)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if valid_predicate is not None:
        metrics.append(F.sum(F.when(valid_predicate, 1).otherwise(0)).alias("n_valid"))
    t0 = time.time()
    observed_df = df.observe(obs, *metrics)
    w = observed_df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    got = obs.get
    n = int(got.get("n_rows") or 0)
    # F.sum over zero rows observes None — an empty frame has 0 valid rows.
    raw_valid = got.get("n_valid", n)
    v = int(raw_valid) if raw_valid is not None else 0
    m = PipelineMetrics(
        step=step,
        records_processed=n,
        records_valid=v,
        records_invalid=n - v,
        started_at=t0,
    )
    m.finished_at = time.time()
    return m
