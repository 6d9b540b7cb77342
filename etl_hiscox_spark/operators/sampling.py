"""Sampling & splitting operators for training-data pipelines.

- :func:`hash_split` — deterministic train/val/test assignment from a
  content-stable hash of a key column. Unlike ``randomSplit`` (partition-
  order dependent) the assignment is a pure function of the key: re-runs,
  re-partitions, and other engines agree row-for-row — the property that
  matters when the split must be reproducible across a 100 TB re-shard.
- :func:`stratified_sample` — per-stratum fractions via ``sampleBy``
  (seeded, one pass, no shuffle).
- :func:`reservoir_per_key` — exact k rows per key (window top-k over a
  stable hash ordering), the distributed substitute for per-group
  ``df.sample(n=k)``.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_hiscox_spark.operators.windows import top_k_per_group


def split_bucket(key: Column | str, n_buckets: int = 100) -> Column:
    """Stable bucket in [0, n_buckets) from sha256 of the key — identical
    in any engine with sha256 (the cross-engine-portable alternative to
    xxhash64). First 8 hex chars -> int -> mod."""
    key = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(F.sha2(key.cast("string"), 256), 1, 8), 16, 10).cast(
        "long"
    ) % n_buckets


HEX_PREFIX_LEN = 5  # 16^5 = 1,048,576 buckets — plenty for split weights


def hex_bounds(weights: Mapping[str, float], k: int = HEX_PREFIX_LEN) -> list[tuple[str, str]]:
    """(split_name, upper_hex_bound) thresholds over the first k hex chars
    of a sha256. String comparison on lowercase hex == numeric comparison,
    and every SQL engine can do it (BLOB/hex-int casts are not portable)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    out = []
    cum = 0.0
    for name, w in weights.items():
        cum += w
        bound = min(int(cum * (16**k)), 16**k - 1)
        out.append((name, format(bound, f"0{k}x")))
    return out


def hash_split(
    df: DataFrame,
    key: str,
    weights: Mapping[str, float],
    split_col: str = "split",
    on_null: str = "error",
) -> DataFrame:
    """Assign each row to a named split with probability ≈ its weight,
    deterministically by key hash.

    ``weights`` e.g. {"train": 0.8, "val": 0.1, "test": 0.1} (must sum to
    1.0 ± ε). Every row with the same key lands in the same split — safe
    for leakage-sensitive splits keyed by document/user id, and portable:
    the assignment is a string comparison on a sha256 hex prefix.

    NULL keys hash to NULL and would otherwise all fall into the final
    split (a systematic skew): ``on_null='error'`` (default) fails the job
    with a clear message; ``'last'`` opts into the final-split routing.
    """
    if on_null not in ("error", "last"):
        raise ValueError("on_null must be 'error' or 'last'")
    prefix = F.substring(F.sha2(F.col(key).cast("string"), 256), 1, HEX_PREFIX_LEN)
    expr = None
    bounds = hex_bounds(weights)
    for name, bound in bounds:
        cond = prefix < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = expr.otherwise(F.lit(bounds[-1][0]))
    if on_null == "error":
        expr = F.when(
            F.col(key).isNull(),
            F.raise_error(F.lit(f"hash_split: NULL {key} cannot be split deterministically")),
        ).otherwise(expr)
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame, stratum_col: str, fractions: Mapping[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (seeded) — e.g. downsample dominant
    languages while keeping rare ones whole. One pass, no shuffle."""
    return df.sampleBy(stratum_col, dict(fractions), seed)


def reservoir_per_key(
    df: DataFrame, keys: Sequence[str], k: int, order_key: str
) -> DataFrame:
    """Exactly min(k, |group|) rows per key, chosen by a stable hash of
    ``order_key`` — deterministic 'random-looking' per-group sample with
    one shuffle (the window's)."""
    return top_k_per_group(
        df.withColumn("__r", F.xxhash64(F.col(order_key))),
        keys=keys,
        order_by=["__r", order_key],
        k=k,
        descending=False,
        rank_col="__rank",
    ).drop("__r", "__rank")
