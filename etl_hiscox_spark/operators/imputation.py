"""Constraint repair: group-median imputation (DQ tier, the REPAIR step).

The quality engine's Q1-Q7 DETECT violations (rules, thresholds, tagging,
quarantine); this operator closes the loop for the most common numeric
repair — fill missing values from the distribution they were drawn from,
at the finest grouping that actually observed data:

    value -> group median (observed rows only)
          -> global median   (groups with nothing observed)
          -> stays NULL      (nothing observed anywhere; flagged, never
                              invented)

Median is the exact interpolated percentile (``percentile(col, 0.5)``),
which matches DuckDB's ``quantile_cont`` bit-for-bit on integer inputs —
both average the two middle values in double arithmetic — so the repair
is oracle-checkable end to end.

Plan shape at 100 TB: one map-side-combined aggregate per group (shuffle =
|groups| fixed-width rows), a 1-row global aggregate broadcast, and one
equi-join of the medians back onto the frame — the repair costs one
shuffle of group keys, never a second corpus pass (the observed/missing
split rides the same scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def impute_by_group_median(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    filled_col: str | None = None,
    flag_col: str = "was_missing",
) -> DataFrame:
    """All input columns, plus ``filled_col`` (double — the value with
    NULLs repaired) and ``flag_col`` (true where the repair applied).

    Observed values pass through exactly (cast to double); NULLs take
    their group's median of observed values, then the global median, and
    remain NULL only if the whole frame observed nothing.
    """
    if filled_col is None:
        filled_col = f"{value_col}_filled"
    med = F.expr(f"percentile({value_col}, 0.5)")
    group_meds = df.groupBy(*group_cols).agg(med.alias("__grp_med"))
    global_med = df.agg(med.alias("__glob_med"))
    joined = df.join(group_meds, group_cols, "left").crossJoin(F.broadcast(global_med))
    return joined.select(
        *df.columns,
        F.coalesce(
            F.col(value_col).cast("double"), F.col("__grp_med"), F.col("__glob_med")
        ).alias(filled_col),
        F.col(value_col).isNull().alias(flag_col),
    )
