"""Engine configuration — env-driven settings parity
(``scripts/utils/config.py:14-67`` of the reference).

All knobs resolve from environment variables with the reference's defaults:
DQ thresholds (max null 5%, min rows 100, max dup 1%), batch size 10000,
3 retries with 60s delay, layer naming. Values are plain Python — no Spark
dependency — so config is importable everywhere.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env_float(name: str, default: float) -> float:
    try:
        return float(os.environ.get(name, default))
    except ValueError:
        return default


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


@dataclass
class EngineConfig:
    # data-quality thresholds (config.py:52-54 / dbt_project.yml:76-79)
    max_null_percentage: float = field(
        default_factory=lambda: _env_float("ETL_MAX_NULL_PCT", 5.0)
    )
    min_row_count: int = field(default_factory=lambda: _env_int("ETL_MIN_ROW_COUNT", 100))
    max_duplicate_percentage: float = field(
        default_factory=lambda: _env_float("ETL_MAX_DUP_PCT", 1.0)
    )
    # pipeline execution (config.py:57-59)
    batch_size: int = field(default_factory=lambda: _env_int("ETL_BATCH_SIZE", 10_000))
    max_retries: int = field(default_factory=lambda: _env_int("ETL_MAX_RETRIES", 3))
    retry_delay_seconds: float = field(
        default_factory=lambda: _env_float("ETL_RETRY_DELAY_SECONDS", 60.0)
    )
    # layer naming (config.py:83-85)
    database_prefix: str = field(default_factory=lambda: os.environ.get("ETL_DB_PREFIX", "etl"))

    def get_table_name(self, layer: str, table: str) -> str:
        """``{db}_{layer}.{table}`` (get_table_name parity)."""
        return f"{self.database_prefix}_{layer}.{table}"

    def validate(self) -> list[str]:
        """Config validation errors (the reference validates env on boot)."""
        problems = []
        if not 0 <= self.max_null_percentage <= 100:
            problems.append("max_null_percentage must be in [0, 100]")
        if self.min_row_count < 0:
            problems.append("min_row_count must be >= 0")
        if not 0 <= self.max_duplicate_percentage <= 100:
            problems.append("max_duplicate_percentage must be in [0, 100]")
        if self.batch_size <= 0:
            problems.append("batch_size must be positive")
        if self.max_retries < 0:
            problems.append("max_retries must be >= 0")
        return problems
