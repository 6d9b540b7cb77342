"""Time-series regularization: resample-to-grid + gap-fill (W tier).

The hypertable/timeseries-DB operation Spark has no single operator for:
bucket events to a regular grain, materialize the missing buckets, and
forward-fill values across gaps. Composition used here:

1. Bucket + aggregate to the grain (one shuffle, map-side combined).
2. Per-key bounds (min/max bucket) ride the same aggregation's partitioning.
3. ``sequence(min, max, interval)`` + explode materializes the dense grid
   IN the reduce stage — grid rows are generated, never shuffled.
4. Left join actuals onto the grid — key+bucket equi-join.
5. Forward fill = ``last(value, ignorenulls=True)`` over
   (key, bucket rows-unbounded-preceding) — one window over data already
   partitioned by key.

Scale notes: grid size is Σ_key (span/grain) — it grows with key count ×
time span, NOT with event count, and each key's grid lives in its key
partition (no skew unless one key spans decades at second grain — pick the
grain accordingly). Leading NULLs (before a key's first observation) stay
NULL; ``n_filled``/``is_gap`` markers are kept so downstream can tell
measured from imputed — silently synthesized data is how gap-fill bugs
ship.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_expr: Column,
    grain: str = "day",
    interval: str = "1 day",
) -> DataFrame:
    """Dense per-key time grid at ``grain`` with forward-filled values.

    Returns (``*key_cols``, bucket, value, is_gap): one row per key per
    grain bucket between that key's first and last observation; ``value``
    is the aggregated actual where one exists, else the last preceding
    actual (NULL before the first); ``is_gap`` marks imputed rows.
    """
    bucket = F.date_trunc(grain, F.col(ts_col))
    actual = (
        df.select(*key_cols, bucket.alias("bucket"), value_expr.alias("__v"))
        .groupBy(*key_cols, "bucket")
        .agg(F.sum("__v").alias("__actual"))
    )
    bounds = actual.groupBy(*key_cols).agg(
        F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx")
    )
    grid = bounds.select(
        *key_cols,
        F.explode(
            F.sequence("__mn", "__mx", F.expr(f"INTERVAL {interval}"))
        ).alias("bucket"),
    )
    joined = grid.join(actual, on=[*key_cols, "bucket"], how="left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *key_cols,
        "bucket",
        F.last("__actual", ignorenulls=True).over(w).alias("value"),
        F.col("__actual").isNull().alias("is_gap"),
    )
