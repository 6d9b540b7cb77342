"""Tests for chunk_documents: coverage, overlap, edge lengths, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_hiscox_spark.operators.chunking import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_short_doc_single_chunk(spark):
    df = _docs(spark, [("d1", "alpha beta gamma")])
    out = chunk_documents(df, "text", "doc_id", chunk_size=8, overlap=2).collect()
    assert len(out) == 1
    assert out[0].chunk_idx == 0
    assert out[0].n_tokens == 3
    assert out[0].chunk_text == "alpha beta gamma"


def test_exact_size_doc_single_chunk(spark):
    words = " ".join(f"w{i}" for i in range(8))
    out = chunk_documents(
        _docs(spark, [("d1", words)]), "text", "doc_id", chunk_size=8, overlap=2
    ).collect()
    assert len(out) == 1 and out[0].n_tokens == 8


def test_overlap_and_full_coverage(spark):
    n, size, ov = 23, 8, 3
    words = [f"w{i}" for i in range(n)]
    df = _docs(spark, [("d1", " ".join(words))])
    rows = sorted(
        chunk_documents(df, "text", "doc_id", chunk_size=size, overlap=ov).collect(),
        key=lambda r: r.chunk_idx,
    )
    # stride = 5: starts 1,6,11,16 (bound = n - overlap = 20) → 4 chunks
    assert [r.chunk_idx for r in rows] == [0, 1, 2, 3]
    # consecutive chunks share exactly `overlap` tokens (full chunks)
    for a, b in zip(rows, rows[1:]):
        ta, tb = a.chunk_text.split(" "), b.chunk_text.split(" ")
        assert ta[-ov:] == tb[:ov]
    # every token of the document appears in at least one chunk
    covered = {t for r in rows for t in r.chunk_text.split(" ")}
    assert set(words) <= covered
    # last chunk is the tail of the document
    assert rows[-1].chunk_text.split(" ")[-1] == words[-1]


def test_no_redundant_trailing_chunk(spark):
    # n=10, size=8, overlap=4 (stride 4): starts bound = 6 → starts 1,5.
    # A naive bound of n would also emit start 9, fully inside chunk 2.
    words = " ".join(f"w{i}" for i in range(10))
    rows = chunk_documents(
        _docs(spark, [("d1", words)]), "text", "doc_id", chunk_size=8, overlap=4
    ).collect()
    assert len(rows) == 2
    assert {r.n_tokens for r in rows} == {8, 6}


def test_whitespace_split_and_keep_text_false(spark):
    df = _docs(spark, [("d1", "  a   b\tc  ")])
    rows = chunk_documents(df, "text", "doc_id", chunk_size=2, overlap=1).collect()
    assert all(not hasattr(r, "chunk_text") or r.chunk_text for r in rows)
    slim = chunk_documents(df, "text", "doc_id", chunk_size=2, overlap=1, keep_text=False)
    assert slim.columns == ["doc_id", "chunk_idx", "n_tokens"]
    assert sum(r.n_tokens for r in slim.collect()) >= 3  # a b c all covered


def test_invalid_overlap_raises(spark):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(_docs(spark, [("d", "x")]), "text", "doc_id", chunk_size=4, overlap=4)


def test_deterministic_across_repartition(spark):
    df = _docs(spark, [(f"d{i}", " ".join(f"t{i}_{j}" for j in range(50))) for i in range(20)])
    a = chunk_documents(df, "text", "doc_id", chunk_size=16, overlap=4).collect()
    b = chunk_documents(df.repartition(7), "text", "doc_id", chunk_size=16, overlap=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
