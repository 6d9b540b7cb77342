"""Train/test decontamination operator — planted-overlap behavior checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_hiscox_spark.operators.decontamination import (
    contamination_report,
    decontaminate,
)

TEST_DOC = "alpha beta gamma delta epsilon zeta eta theta"


def _corpora(spark):
    train = spark.createDataFrame(
        [
            # contains the test doc's "beta gamma delta epsilon zeta" 5-gram
            (1, "prefix words beta gamma delta epsilon zeta suffix words here"),
            # shares only single words, never a 5-gram
            (2, "beta unrelated gamma padding delta noise epsilon filler zeta"),
            # completely disjoint vocabulary
            (3, "one two three four five six seven eight nine ten"),
            # a short doc (<5 tokens) that exactly equals a short test doc
            (4, "tiny snippet"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, TEST_DOC), (101, "tiny snippet")],
        "doc_id long, text string",
    )
    return train, test


def test_contamination_report_flags_planted_overlap(spark):
    train, test = _corpora(spark)
    rep = {
        r["doc_id"]: r["n_shared_grams"]
        for r in contamination_report(train, test, "text", "doc_id", ngram=5).collect()
    }
    assert 1 in rep and rep[1] >= 1  # 5-gram overlap caught
    assert 2 not in rep  # word-level overlap is not contamination
    assert 3 not in rep
    assert rep.get(4) == 1  # short docs compare whole-text shingles


def test_decontaminate_drops_only_contaminated(spark):
    train, test = _corpora(spark)
    kept = {r["doc_id"] for r in decontaminate(train, test, "text", "doc_id", ngram=5).collect()}
    assert kept == {2, 3}


def test_hashed_and_string_paths_agree(spark):
    # The declared oracle query uses string grams (SQL-expressible); the
    # scale path joins on xxhash64(gram). Same answers, pinned here.
    train, test = _corpora(spark)
    for broadcast_test in (True, False):
        a = contamination_report(
            train, test, "text", "doc_id", ngram=5, hashed=True, broadcast_test=broadcast_test
        )
        b = contamination_report(
            train, test, "text", "doc_id", ngram=5, hashed=False, broadcast_test=broadcast_test
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_broadcast_plan_has_no_shuffle_on_train_side(spark):
    # The contamination probe must be a broadcast hash join: the train gram
    # table (the 100 TB side) should not appear below a shuffle exchange.
    train, test = _corpora(spark)
    rep = contamination_report(train, test, "text", "doc_id", ngram=5, hashed=True)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
