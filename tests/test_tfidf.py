"""TF-IDF keyword extraction (operators/tfidf.py) — semantics pinned here;
the declared query t20_tfidf_keywords carries the DuckDB oracle."""

from __future__ import annotations

import math

from etl_hiscox_spark.operators.tfidf import term_frequencies, tfidf_scores, top_keywords


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (1, "spark spark shuffle"),
    (2, "spark join"),
    (3, "rain rain rain"),
]


def test_tf_counts_occurrences(spark):
    tf = {
        (r["doc"], r["term"]): r["tf"]
        for r in term_frequencies(_docs(spark, CORPUS), "text", "doc_id").collect()
    }
    assert tf[(1, "spark")] == 2 and tf[(1, "shuffle")] == 1 and tf[(3, "rain")] == 3


def test_tfidf_matches_hand_computed(spark):
    # N=3. "spark": df=2 -> idf = ln(4/3)+1; "rain": df=1 -> idf = ln(4/2)+1.
    got = {
        (r["doc"], r["term"]): r["tfidf"]
        for r in tfidf_scores(_docs(spark, CORPUS), "text", "doc_id").collect()
    }
    assert abs(got[(1, "spark")] - 2 * (math.log(4 / 3) + 1)) < 1e-9
    assert abs(got[(3, "rain")] - 3 * (math.log(2.0) + 1)) < 1e-9


def test_top_keywords_rank_distinctive_terms_first(spark):
    # Doc 1: "shuffle" (df=1) outranks "spark" (df=2, tf=2)? tf*idf:
    # spark 2*(ln(4/3)+1)=2.575, shuffle 1*(ln(2)+1)=1.693 -> spark first
    # on mass; rank order must match the rounded-score ordering exactly.
    out = top_keywords(_docs(spark, CORPUS), "text", "doc_id", k=2)
    rows = sorted(
        ((r["doc_id"], r["rank"]), r["term"]) for r in out.collect() if r["doc_id"] == 1
    )
    assert [t for _, t in rows] == ["spark", "shuffle"]


def test_top_keywords_k_bound_and_tiebreak(spark):
    # Equal scores break by term ascending, and k caps output per doc.
    df = _docs(spark, [(7, "b a c d")])  # all tf=1, same idf
    out = top_keywords(df, "text", "doc_id", k=3).collect()
    assert [r["term"] for r in sorted(out, key=lambda r: r["rank"])] == ["a", "b", "c"]
