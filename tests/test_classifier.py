"""Multinomial NB classifier (operators/classifier.py) — train/apply
semantics pinned here; the declared query t19_nb_language_classifier
carries the DuckDB oracle (including the rounded-argmax parity)."""

from __future__ import annotations

import math

from etl_hiscox_spark.operators.classifier import nb_predict, nb_scores, nb_train

TRAIN = [
    (1, "spark shuffle join agg", "tech"),
    (2, "join agg scan spark", "tech"),
    (3, "rain sun cloud wind", "weather"),
    (4, "wind rain storm cloud", "weather"),
]


def _df(spark, rows, schema="doc_id long, text string, label string"):
    return spark.createDataFrame(rows, schema)


def test_separable_corpus_classifies_held_out_docs(spark):
    ww, cs = nb_train(_df(spark, TRAIN), "text", "label")
    test = _df(spark, [(10, "spark join", "?"), (11, "storm rain", "?")])
    got = {r["doc_id"]: r["predicted_label"] for r in nb_predict(test, "text", "doc_id", ww, cs).collect()}
    assert got == {10: "tech", 11: "weather"}


def test_every_class_scored_even_with_no_shared_words(spark):
    # A doc of entirely unseen words: both classes still compete (via the
    # ln_floor path), and the winner is decided by prior + floor, not by a
    # missing group.
    ww, cs = nb_train(_df(spark, TRAIN), "text", "label")
    test = _df(spark, [(20, "zzz qqq", "?")])
    scores = nb_scores(test, "text", "doc_id", ww, cs).collect()
    assert sorted(r["label"] for r in scores) == ["tech", "weather"]
    assert all(math.isfinite(r["score"]) for r in scores)


def test_score_matches_hand_computed_formula(spark):
    # One class "a": docs "x x" and "x y" -> T=4, C(x)=3, C(y)=1, V=2.
    # P(x|a) = (3+1)/(4+2) = 2/3; doc "x x": prior ln(1) = 0,
    # score = 2·ln((3+1)/1) + 2·ln(1/(4+2)) = 2·ln(4) - 2·ln(6).
    train = _df(spark, [(1, "x x", "a"), (2, "x y", "a")])
    ww, cs = nb_train(train, "text", "label")
    got = nb_scores(_df(spark, [(9, "x x", "a")]), "text", "doc_id", ww, cs).collect()
    assert len(got) == 1
    expect = 2 * math.log(4.0) + 2 * math.log(1.0 / 6.0)
    assert abs(got[0]["score"] - expect) < 1e-9


def test_tie_breaks_by_label_ascending(spark):
    # Perfectly symmetric classes: identical scores for both -> the
    # alphabetically first label must win, deterministically.
    train = _df(spark, [(1, "x", "b"), (2, "x", "a")])
    ww, cs = nb_train(train, "text", "label")
    got = nb_predict(_df(spark, [(9, "x", "?")]), "text", "doc_id", ww, cs).collect()
    assert got[0]["predicted_label"] == "a"


def test_weight_join_is_broadcast(spark):
    ww, cs = nb_train(_df(spark, TRAIN), "text", "label")
    plan = (
        nb_predict(_df(spark, TRAIN), "text", "doc_id", ww, cs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_null_text_documents_are_excluded_not_mispredicted(spark):
    # A NULL-text doc has no evidence; it must be absent from predictions
    # rather than "predicted" as the alphabetically first class via the
    # all-NULL-score tiebreak.
    ww, cs = nb_train(_df(spark, TRAIN), "text", "label")
    test = spark.createDataFrame([(1, "spark join"), (2, None)], "doc_id long, text string")
    got = nb_predict(test, "text", "doc_id", ww, cs).collect()
    assert [r["doc_id"] for r in got] == [1]
