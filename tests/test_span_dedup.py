"""Span-level exact dedup (operators/span_dedup.py) — RefinedWeb-style
repeated-block removal. Semantics pinned here; the declared query
t18_span_dedup carries the DuckDB oracle."""

from __future__ import annotations

from etl_hiscox_spark.operators.span_dedup import (
    document_spans,
    mark_duplicate_spans,
    span_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


SPAN = " ".join(f"w{i}" for i in range(6))  # one full 6-word span
TAIL = "unique tail words here"


def test_full_copy_comes_out_empty(spark):
    df = _docs(spark, [(1, SPAN), (2, SPAN)])
    out = {r["doc_id"]: r for r in span_dedup(df, "text", "doc_id", span_words=6).collect()}
    assert out[1]["n_removed"] == 0 and out[1]["deduped_text"] == SPAN
    assert out[2]["n_removed"] == out[2]["n_spans"] == 1
    assert out[2]["deduped_text"] == ""


def test_partial_overlap_keeps_unique_tail(spark):
    # doc 2 = doc 1's span + its own tail: only the shared span is removed,
    # the tail survives in original order.
    df = _docs(spark, [(1, SPAN), (2, SPAN + " " + TAIL)])
    out = {r["doc_id"]: r for r in span_dedup(df, "text", "doc_id", span_words=6).collect()}
    assert out[2]["n_spans"] == 2 and out[2]["n_removed"] == 1
    assert out[2]["deduped_text"] == TAIL


def test_first_corpus_occurrence_wins(spark):
    # Winner is min (id, span_idx) — the duplicate inside the SAME doc at a
    # later span_idx is removed too.
    df = _docs(spark, [(5, SPAN), (3, SPAN + " " + SPAN)])
    out = {r["doc_id"]: r for r in span_dedup(df, "text", "doc_id", span_words=6).collect()}
    assert out[3]["n_removed"] == 1 and out[3]["deduped_text"] == SPAN
    assert out[5]["n_removed"] == 1 and out[5]["deduped_text"] == ""


def test_hashed_key_equals_string_key(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    a = span_dedup(docs, "text", "doc_id", span_words=20, hashed=False)
    b = span_dedup(docs, "text", "doc_id", span_words=20, hashed=True)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_normalization_is_the_dedup_key(spark):
    # Case/whitespace variants of the same span are duplicates.
    df = _docs(spark, [(1, SPAN), (2, "  " + SPAN.upper().replace(" ", "  ") + " ")])
    out = {r["doc_id"]: r for r in span_dedup(df, "text", "doc_id", span_words=6).collect()}
    assert out[2]["n_removed"] == 1


def test_every_document_yields_at_least_one_span(spark):
    spans = document_spans(_docs(spark, [(1, "one"), (2, "a b c d e f g")]), "text", "doc_id", 3)
    got = sorted((r["id"], r["span_idx"], r["span"]) for r in spans.collect())
    assert got == [(1, 0, "one"), (2, 0, "a b c"), (2, 1, "d e f"), (2, 2, "g")]


def test_mark_duplicates_single_shuffle(spark):
    df = _docs(spark, [(1, SPAN), (2, SPAN)])
    marked = mark_duplicate_spans(document_spans(df, "text", "doc_id", 6), hashed=True)
    plan = marked._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_span_dedup_matches_python_reference(spark):
    # Property: against a brute-force python implementation on a corpus
    # engineered for heavy span overlap.
    import itertools

    from pyspark.sql import functions as F  # noqa: F401

    words = ["alpha", "beta", "gamma", "delta"]
    texts = [
        " ".join(p)
        for p in itertools.product(words, repeat=3)  # 64 docs, 3 words each
    ]
    rows = [(i, t) for i, t in enumerate(texts)]

    def py_span_dedup(rows, span_words):
        # first (id, span_idx) occurrence of each distinct span wins
        seen = {}
        spans = []
        for doc_id, text in rows:
            toks = text.lower().split()
            n = max((len(toks) + span_words - 1) // span_words, 1)
            for i in range(n):
                span = " ".join(toks[i * span_words : (i + 1) * span_words])
                spans.append((doc_id, i, span))
        out = {}
        for doc_id, i, span in sorted(spans):
            dup = span in seen
            if not dup:
                seen[span] = (doc_id, i)
            ns, nr, kept = out.get(doc_id, (0, 0, []))
            out[doc_id] = (ns + 1, nr + (1 if dup else 0), kept + ([] if dup else [span]))
        return {d: (ns, nr, " ".join(k)) for d, (ns, nr, k) in out.items()}

    expect = py_span_dedup(rows, 2)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_removed"], r["deduped_text"])
        for r in span_dedup(df, "text", "doc_id", span_words=2).collect()
    }
    assert got == expect
