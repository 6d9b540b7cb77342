"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.10 extension — the escape hatch when built-in windows/dedup
can't express the state machine).

Two operators:

- :func:`running_user_stats` — per-key cumulative count/sum/max maintained
  across micro-batches (the "profile that never forgets" pattern built-in
  aggregations only cover with complete-mode memory costs).
- :func:`threshold_alert_stream` — emits a row only when a key's cumulative
  value first crosses a threshold (cross-batch edge detection — genuinely
  inexpressible with windowed aggs, which re-emit per window).

State is a single tuple per key (Arrow-serialized), so state-store size is
O(distinct keys), partitioned by ``spark.sql.shuffle.partitions``. Both
operators also run in batch mode via ``applyInPandas`` fallbacks with
identical per-key math — the batch twin is the correctness oracle, same
policy as the windowed ops.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        vals = pdf["value"].astype(float)
        n += int(len(vals))
        total += float(vals.sum())
        if len(vals):
            mx = max(mx, float(vals.max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "total_value": total, "max_value": mx}]
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user cumulative stats, updated each micro-batch.

    Streaming: ``applyInPandasWithState`` (update mode output). Batch twin:
    plain groupBy — identical math, asserted equal in tests.
    """
    if events.isStreaming:
        return events.groupBy("user_id").applyInPandasWithState(
            _update_user_stats,
            outputStructType=USER_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("double")).alias("total_value"),
        F.max(F.col("value").cast("double")).alias("max_value"),
    )


ALERT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("cumulative_value", T.DoubleType()),
        T.StructField("crossed_at_n", T.LongType()),
    ]
)

_ALERT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("total", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("fired", T.BooleanType()),
    ]
)


def make_threshold_updater(threshold: float):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        total, n, fired = state.get if state.exists else (0.0, 0, False)
        out = []
        for pdf in pdfs:
            # Rows arrive unordered within a micro-batch — the crossing
            # point is only well-defined under the (ts, event_id) order.
            if "ts" in pdf.columns and "event_id" in pdf.columns:
                pdf = pdf.sort_values(["ts", "event_id"])
            for v in pdf["value"].astype(float):
                total += float(v)
                n += 1
                if not fired and total >= threshold:
                    fired = True
                    out.append(
                        {"user_id": user_id, "cumulative_value": total, "crossed_at_n": n}
                    )
        state.update((total, n, fired))
        yield pd.DataFrame(out, columns=[f.name for f in ALERT_SCHEMA.fields])

    return _update


def threshold_alert_stream(events: DataFrame, threshold: float) -> DataFrame:
    """Emit exactly ONE alert per key, when its cumulative value first
    crosses ``threshold`` — cross-batch edge detection. The 'fired' bit in
    state is what windowed aggregations cannot express (they would re-emit
    every trigger)."""
    if events.isStreaming:
        return events.groupBy("user_id").applyInPandasWithState(
            make_threshold_updater(threshold),
            outputStructType=ALERT_SCHEMA,
            stateStructType=_ALERT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    # Batch twin: order events per user (ts, event_id), find the first
    # prefix-sum crossing.
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Decimal-exact prefix sums: engines disagree on float window-sum
    # association (DuckDB uses segment trees), exact decimals don't.
    cum = events.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias(
            "cumulative_value"
        ),
        F.count(F.lit(1)).over(w).alias("crossed_at_n"),
    )
    first_cross = (
        cum.filter(F.col("cumulative_value") >= threshold)
        .groupBy("user_id")
        .agg(F.min_by(F.struct("cumulative_value", "crossed_at_n"), "crossed_at_n").alias("s"))
    )
    return first_cross.select(
        "user_id",
        F.col("s.cumulative_value").alias("cumulative_value"),
        F.col("s.crossed_at_n").alias("crossed_at_n"),
    )
