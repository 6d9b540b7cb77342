"""UDTF surface tests: SQL LATERAL chunking pinned equal to the
expression-tier chunk_documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_hiscox_spark.functions.udtfs import SplitChunks, register_udtfs
from etl_hiscox_spark.operators.chunking import chunk_documents


def test_udtf_matches_expression_chunker(spark):
    rows = [(f"d{i}", " ".join(f"t{i}_{j}" for j in range(5 + 13 * i))) for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    register_udtfs(spark)
    df.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.n_tokens, c.chunk_text
        FROM udtf_docs, LATERAL split_chunks(text, 16, 4) AS c
        """
    ).collect()
    want = chunk_documents(df, "text", "doc_id", chunk_size=16, overlap=4).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(want) > 8  # at least one doc produced multiple chunks


def test_udtf_dataframe_api(spark):
    out = SplitChunks(F.lit("a b c d e f g"), F.lit(4), F.lit(1)).collect()
    assert [r.chunk_idx for r in out] == [0, 1]
    assert out[0].chunk_text == "a b c d"
    assert out[1].chunk_text.startswith("d ")  # 1-token overlap


def test_udtf_invalid_overlap_raises(spark):
    register_udtfs(spark)
    with pytest.raises(Exception, match="overlap"):
        spark.sql("SELECT * FROM split_chunks('a b c', 3, 3)").collect()
