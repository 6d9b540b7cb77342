"""Misra–Gries heavy hitters: bounded-memory frequent-item summaries with
DETERMINISTIC error bounds (unlike count-min's probabilistic ones), which
is what makes the declared query hash-checkable.

Plan shape: the item stream is consumed per-partition by an Arrow
``mapInPandas`` running the classic k-counter Misra–Gries loop — O(k)
memory per partition no matter how many items stream through (the whole
point at 100 TB: a vocabulary that would OOM a hash aggregate fits in k
counters). Each partition emits at most k (item, count) partials; the
merge is a relational ``groupBy(item).sum`` over ≤ k × #partitions rows.

Guarantees (provable, not probabilistic — tests + the t24 oracle lean on
them): with per-partition capacity k and N total items,
- any item with true frequency > N/k survives in at least one partition
  (if it were evicted everywhere, summing the per-partition eviction
  bounds N_p/k would cap its total at N/k — contradiction);
- the merged estimate underestimates by at most Σ_p N_p/k = N/k and never
  overestimates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _misra_gries(items: Iterator, k: int) -> dict:
    counters: dict = {}
    for it in items:
        if it in counters:
            counters[it] += 1
        elif len(counters) < k:
            counters[it] = 1
        else:
            # decrement-all; drop zeros (the eviction step)
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters


def heavy_hitters(df: DataFrame, item_col: Column | str, k: int = 64) -> DataFrame:
    """(item, est_count) merged Misra–Gries summary of ``item_col``.

    ``k`` is the per-partition counter budget: error ≤ N/k where N is the
    total item count. Output size ≤ k × #partitions before the merge,
    ≤ that after — driver never sees raw items.
    """
    item = F.col(item_col) if isinstance(item_col, str) else item_col
    # items surface as strings (the partial schema is fixed); non-string
    # keys round-trip losslessly through cast for every atomic type
    stream = df.select(item.cast("string").alias("item"))

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            counters = _merge_into(counters, _misra_gries(iter(pdf["item"]), k), k)
        if counters:
            yield pd.DataFrame(
                {"item": list(counters.keys()), "est": list(counters.values())}
            )

    partials = stream.mapInPandas(summarize, "item string, est long")
    return partials.groupBy("item").agg(F.sum("est").alias("est_count"))


def _merge_into(a: dict, b: dict, k: int) -> dict:
    """Merge two MG summaries back under the k budget: sum shared counts,
    then subtract the (k+1)-largest merged count from everything (the
    standard mergeable-MG prune — adds its own ≤ that amount to the
    eviction bound, still within the aggregate N/k analysis)."""
    merged = dict(a)
    for item, c in b.items():
        merged[item] = merged.get(item, 0) + c
    if len(merged) <= k:
        return merged
    cutoff = sorted(merged.values(), reverse=True)[k]
    return {i: c - cutoff for i, c in merged.items() if c > cutoff}
