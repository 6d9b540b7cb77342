"""Constraint repair: group-median imputation (DQ tier, the REPAIR step).

The quality engine's Q1-Q7 DETECT violations (rules, thresholds, tagging,
quarantine); this operator closes the loop for the most common numeric
repair — fill missing values from the distribution they were drawn from,
at the finest grouping that actually observed data:

    value -> group median (observed rows only)
          -> global median   (groups with nothing observed)
          -> stays NULL      (nothing observed anywhere; flagged, never
                              invented)

A NULL group KEY is a real group (at scale NULL is routinely the heaviest
key — failed parses, absent foreign keys): the medians join back
null-safely (``<=>``), so NULL-keyed rows get THEIR group's median, not
the global fallback (r9 review — the bare column-name join dropped them).

Median is the exact interpolated percentile (``percentile(col, 0.5)``),
which matches DuckDB's ``quantile_cont`` bit-for-bit on integer inputs —
both average the two middle values in double arithmetic — so the repair
is oracle-checkable end to end.

Plan shape at 100 TB, stated honestly: TWO aggregation passes over the
value column (per-group + global — columnar scans of one column, cheap
relative to the join) and one left join of |groups| medians back onto the
frame. Exact ``percentile`` keeps per-group state proportional to the
group's DISTINCT values, not fixed-width — at extreme per-group
cardinality swap ``percentile`` for ``percentile_approx`` (mergeable
O(accuracy) state), trading bit-exactness for bounded memory.
"""

from __future__ import annotations

from functools import reduce

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
    their group's median of observed values (NULL group keys included,
    null-safe join), then the global median, and remain NULL only if the
    whole frame observed nothing.
    """
    if filled_col is None:
        filled_col = f"{value_col}_filled"
    med = F.expr(f"percentile({value_col}, 0.5)")
    left = df.alias("__l")
    group_meds = df.groupBy(*group_cols).agg(med.alias("__grp_med")).alias("__m")
    global_med = df.agg(med.alias("__glob_med"))
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"__l.{c}").eqNullSafe(F.col(f"__m.{c}")) for c in group_cols],
    )
    joined = left.join(group_meds, cond, "left").crossJoin(F.broadcast(global_med))
    return joined.select(
        *[F.col(f"__l.{c}") for c in df.columns],
        F.coalesce(
            F.col(f"__l.{value_col}").cast("double"),
            F.col("__grp_med"),
            F.col("__glob_med"),
        ).alias(filled_col),
        F.col(f"__l.{value_col}").isNull().alias(flag_col),
    )
