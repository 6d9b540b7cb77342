"""Survivorship / golden-record merge — the MDM consolidation aggregate.

Insurance master-data management: many versions of an entity (policy
endorsements, contact updates, near-dup customer records) collapse to ONE
golden record where each field takes the best surviving value — typically
"latest non-null". This module implements survivorship as a SINGLE
aggregation pass with ``max_by`` (reference repo has no equivalent;
extension tier per SURVEY.md §2.11).

Why not the W1 window-dedup shape (row_number over recency, keep rank 1)?
Two reasons at 100 TB:
- window dedup keeps the single most recent ROW; survivorship picks the
  most recent value PER FIELD — a newer row with a NULL field must not
  erase the older non-null value;
- a window shuffles EVERY version row to sort it; ``max_by`` is a
  declarative aggregate with map-side partial merge, so the shuffle
  carries one partial row per (task, entity) — |entities|-ish volume, not
  |versions|. (It plans as SortAggregate — a per-partition sort on the
  group key — but the data that moves is the aggregated partials.)

Engine parity note (pinned in the f17 oracle/test): Spark's
``max_by(v, k)`` returns the value AT the max key even when that value is
NULL, while DuckDB's ``arg_max`` skips NULL values. The survivorship form
below guards the ORDERING key (``WHEN v IS NOT NULL THEN k``) so rows with
NULL values never compete — which both engines agree on, and which is the
"latest non-null" rule MDM wants in the first place.

Determinism: callers must pass an ``order_by`` that is UNIQUE per row
(compose recency with a unique id — e.g. days-since-epoch · 10^10 + key);
``max_by`` on a tied key picks an arbitrary row on both engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def latest_non_null(field: Column | str, order_by: Column) -> Column:
    """``max_by`` of ``field`` over ``order_by``, considering only rows
    where the field is non-null — the survivorship pick for one field."""
    f = F.col(field) if isinstance(field, str) else field
    return F.max_by(f, F.when(f.isNotNull(), order_by))


def golden_record(
    df: DataFrame,
    key_cols: Sequence[str],
    order_by: Column,
    fields: Sequence[str],
) -> DataFrame:
    """One golden row per key: each ``fields`` entry is its latest
    non-null value by ``order_by``; ``n_versions`` counts the merged rows.

    One shuffle (the groupBy), partials merged map-side.
    """
    aggs = [latest_non_null(f, order_by).alias(f) for f in fields]
    return df.groupBy(*key_cols).agg(*aggs, F.count(F.lit(1)).alias("n_versions"))
