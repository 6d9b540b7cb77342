"""Error-action semantics (SURVEY.md §2.9 Q4 error branch).

The reference pins three connector/file error actions in its test
expectations (``tests/unit/test_ingestion.py:255-295``):

- **skip_and_continue** — a missing source file skips that entity, the
  pipeline proceeds;
- **retry_with_backoff** — transient connector errors retry up to
  ``max_retries`` with a delay (``scripts/utils/config.py:58-59``);
- **quarantine_record** — row-level invalid data diverts to the audit area
  (implemented in :mod:`etl_hiscox_spark.quality.engine`).

These wrap *step* execution, not row processing — row errors are data
(quarantine), step errors are control flow.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")

# Markers that indicate a missing/unreadable SOURCE specifically — anchored
# error classes, not loose phrases ('does not exist' appears in partition/
# database/JDBC errors that are real bugs, not absent files).
_SKIPPABLE_MESSAGES = ("[PATH_NOT_FOUND]", "FileNotFoundException")


def is_missing_source_error(e: Exception) -> bool:
    if isinstance(e, FileNotFoundError):
        return True
    msg = str(e)
    return any(tag in msg for tag in _SKIPPABLE_MESSAGES)


def retry_with_backoff(
    fn: Callable[[], T],
    max_retries: int = 3,
    delay_seconds: float = 1.0,
    backoff: float = 2.0,
    retry_on: tuple[type[Exception], ...] = (Exception,),
    should_retry: Callable[[Exception], bool] | None = None,
) -> T:
    """Call ``fn``, retrying transient failures with exponential backoff.

    Raises the last error after ``max_retries`` attempts (the reference's
    3-retries/60s default lives in :class:`...config.EngineConfig`).
    ``should_retry``: predicate to exclude deterministic errors (e.g. a
    missing source) from the retry loop — they re-raise immediately.
    """
    attempt = 0
    delay = delay_seconds
    while True:
        try:
            return fn()
        except retry_on as e:
            if should_retry is not None and not should_retry(e):
                raise
            attempt += 1
            if attempt > max_retries:
                raise
            time.sleep(delay)
            delay *= backoff


def skip_and_continue(
    fn: Callable[[], T], default: T | None = None
) -> tuple[T | None, bool]:
    """Run ``fn``; on a missing-source error return (default, skipped=True)
    instead of raising. Other errors propagate — only absence is skippable."""
    try:
        return fn(), False
    except Exception as e:  # noqa: BLE001 - filtered below
        if is_missing_source_error(e):
            return default, True
        raise
