"""Misra–Gries heavy hitters: the deterministic guarantees the t24 oracle
leans on, checked directly — presence of above-threshold items,
underestimate-only bounds, bounded summary size, merge behavior."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_hiscox_spark.operators.heavy_hitters import _merge_into, _misra_gries, heavy_hitters


def test_misra_gries_core_loop():
    # 3 of 'a', 2 of 'b', singles — k=2 keeps the majority item
    items = list("aaabbcde")
    c = _misra_gries(iter(items), k=2)
    assert len(c) <= 2
    assert "a" in c and c["a"] <= 3  # never overestimates


def test_merge_prunes_back_to_budget():
    a = {"x": 10, "y": 5}
    b = {"x": 3, "z": 9, "w": 1}
    m = _merge_into(a, b, k=2)
    assert len(m) <= 2
    assert m["x"] == 13 - 5  # cutoff = 3rd-largest (5) subtracted
    assert "w" not in m


def test_heavy_hitters_guarantees_hold(spark):
    # Zipf-ish stream: hot items far above N/k, long tail far below.
    rng = random.Random(11)
    hot = {"alpha": 3000, "beta": 2000, "gamma": 1500}
    rows = [w for w, n in hot.items() for _ in range(n)]
    rows += [f"tail{rng.randrange(500)}" for _ in range(3500)]
    rng.shuffle(rows)
    n_total = len(rows)
    k = 32
    df = spark.createDataFrame([(w,) for w in rows], "word string").repartition(8)
    est = {r["item"]: r["est_count"] for r in heavy_hitters(df, "word", k=k).collect()}
    bound = n_total / k
    for w, n in hot.items():
        assert n > bound  # test premise
        assert w in est, f"guaranteed item {w} evicted"
        assert n - bound <= est[w] <= n, (w, est[w], n)
    # summary size bounded by k per partition
    assert len(est) <= k * 8
    # underestimate-only for every reported item
    exact = {}
    for w in rows:
        exact[w] = exact.get(w, 0) + 1
    assert all(est[w] <= exact[w] for w in est)


def test_heavy_hitters_exact_when_vocab_fits(spark):
    # vocabulary smaller than k: no eviction ever, estimates are exact
    rows = [(f"w{i % 5}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "word string").repartition(4)
    est = {r["item"]: r["est_count"] for r in heavy_hitters(df, "word", k=64).collect()}
    assert est == {f"w{i}": 200 for i in range(5)}


def test_merge_bounds_hold_under_random_splits():
    """Hypothesis: for ANY partitioning of any stream into summaries merged
    pairwise, every item with true freq > N/k survives and estimates only
    underestimate, by at most N/k."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=400),
        st.integers(min_value=2, max_value=10),
        st.data(),
    )
    def run(stream, k, data):
        n = len(stream)
        # random split into 1-4 chunks
        n_chunks = data.draw(st.integers(min_value=1, max_value=4))
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=n), min_size=n_chunks - 1, max_size=n_chunks - 1
                )
            )
        )
        chunks, prev = [], 0
        for c in cuts + [n]:
            chunks.append(stream[prev:c])
            prev = c
        merged: dict = {}
        for ch in chunks:
            merged = _merge_into(merged, _misra_gries(iter(ch), k), k)
        exact: dict = {}
        for x in stream:
            exact[x] = exact.get(x, 0) + 1
        bound = n / k
        for item, cnt in exact.items():
            if cnt > bound:
                assert item in merged, (item, cnt, bound, k)
        for item, est in merged.items():
            assert est <= exact.get(item, 0)
            assert est >= exact.get(item, 0) - bound

    run()
