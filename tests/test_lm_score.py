"""Bigram-LM quality scoring (operators/lm_score.py) — exact semantics vs a
pure-Python reference, broadcast plan shape, and ordering sanity."""

from __future__ import annotations

import math
from collections import Counter

from etl_hiscox_spark.operators.lm_score import (
    bigram_nll_scores,
    doc_bigrams,
    self_trained_nll,
    train_bigram_lm,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the mat"),          # duplicate -> identical score
    (2, "the dog sat on the mat"),          # one atypical transition
    (3, "zx qv plorp zx qv"),               # gibberish -> worst score
    (4, "solo"),                            # <2 tokens -> no score row
    (5, ""),                                # empty -> no score row
]


def _py_reference(rows, alpha=1.0):
    import re

    # mirror functions.text.tokens exactly: lower+collapse, then split on
    # single spaces — an empty doc yields [''] (one empty token), which is
    # the tier's convention in both Spark and the DuckDB oracles.
    toks = {
        i: re.sub(r"\s+", " ", t.strip().lower()).split(" ") for i, t in rows
    }
    bigrams = {i: list(zip(t, t[1:])) for i, t in toks.items() if len(t) >= 2}
    uni = Counter(w for t in toks.values() for w in t)
    bi = Counter(b for bs in bigrams.values() for b in bs)
    v = len(uni)
    out = {}
    for i, bs in bigrams.items():
        if not bs:
            continue
        nll = [-math.log((bi[b] + alpha) / (uni[b[0]] + alpha * v)) for b in bs]
        out[i] = (len(bs), round(sum(nll) / len(nll), 6))
    return out


def test_bigram_nll_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc"]: (r["n_bigrams"], r["avg_nll"])
        for r in self_trained_nll(df, "text", "doc_id").collect()
    }
    expect = _py_reference(DOCS)
    assert set(got) == set(expect)  # docs 4 and 5 contribute no row
    for i in expect:
        assert got[i][0] == expect[i][0], i
        assert abs(got[i][1] - expect[i][1]) < 1e-6, i
    # duplicates score identically; gibberish scores strictly worst
    assert got[0] == got[1]
    assert got[3][1] > max(got[0][1], got[2][1])


def test_doc_bigrams_zero_shuffle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = doc_bigrams(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_broadcast_lm_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    bc, uc, v = train_bigram_lm(df, "text", "doc_id")
    scored = bigram_nll_scores(df, "text", "doc_id", bc, uc, v, broadcast_lm=True)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    # the doc-bigram ⋈ probability join must be broadcast, not shuffled
    assert "BroadcastHashJoin" in plan
    # and results equal the non-broadcast path
    plain = bigram_nll_scores(df, "text", "doc_id", bc, uc, v)
    assert sorted(map(tuple, scored.collect())) == sorted(map(tuple, plain.collect()))
