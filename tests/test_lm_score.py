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


def test_oov_bigrams_get_the_smoothing_floor_not_dropped(spark):
    # Reference-corpus mode: score text the model never saw. Unseen
    # bigrams must contribute the smoothing floor; an inner join would
    # average only the in-vocabulary bigrams and score gibberish as
    # fluent.
    import math

    from pyspark.sql import functions as F

    from etl_hiscox_spark.operators.lm_score import bigram_nll_scores, train_bigram_lm

    ref = spark.createDataFrame([(1, "the cat sat the cat ran", "x")], "doc_id long, text string, l string")
    bc, uc, v = train_bigram_lm(ref, "text", "doc_id")
    # doc: "the cat zz" -> bigrams (the,cat) seen, (cat,zz) OOV w1 seen,
    # plus "qq ww" -> (qq,ww) both unseen
    scored = spark.createDataFrame([(9, "the cat zz"), (8, "qq ww")], "doc_id long, text string")
    got = {r["doc"]: r for r in bigram_nll_scores(scored, "text", "doc_id", bc, uc, v).collect()}
    # every bigram counted, none dropped
    assert got[9]["n_bigrams"] == 2 and got[8]["n_bigrams"] == 1
    # vocab = {the, cat, sat, ran} -> V=4. C(the)=2, C(the,cat)=2;
    # C(cat)=2, C(cat,zz)=0; C(qq)=0.
    p_the_cat = (2 + 1) / (2 + 4)
    p_cat_zz = 1 / (2 + 4)
    p_qq_ww = 1 / (0 + 4)
    assert abs(got[9]["avg_nll"] - round((-math.log(p_the_cat) - math.log(p_cat_zz)) / 2, 6)) < 1e-6
    assert abs(got[8]["avg_nll"] - round(-math.log(p_qq_ww), 6)) < 1e-6
    # and the OOV doc scores WORSE than an in-vocabulary doc
    assert got[8]["avg_nll"] > got[9]["avg_nll"] > 0


def test_perplexity_buckets_balanced_and_monotone(spark):
    """t31: NTILE(3) yields near-equal buckets and head NLL < tail NLL."""
    from etl_hiscox_spark.queries.llm import t31_perplexity_buckets

    rows = t31_perplexity_buckets(spark, "/root/testdata/sf0.001").collect()
    assert rows, "no scored docs"
    from collections import defaultdict

    by_bucket = defaultdict(list)
    for r in rows:
        by_bucket[r["ppl_bucket"]].append(r["avg_nll"])
    assert set(by_bucket) == {1, 2, 3}
    sizes = [len(by_bucket[b]) for b in (1, 2, 3)]
    assert max(sizes) - min(sizes) <= 1  # NTILE balance
    assert max(by_bucket[1]) <= min(by_bucket[3])  # head strictly easier than tail
    assert sum(sizes) == len(rows)
