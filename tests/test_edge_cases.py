"""Edge-case hardening: null keys/timestamps in joins and dedup, empty
inputs, jaccard against a plain-Python reference."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from etl_hiscox_spark.operators.dedup import jaccard_pairs, minhash_candidates
from etl_hiscox_spark.operators.joins import asof_join
from etl_hiscox_spark.operators.windows import dedup_rank


def test_dedup_rank_null_keys_form_one_group(spark):
    df = spark.createDataFrame(
        [(None, 1, 10), (None, 2, 20), ("a", 3, 30)], "k string, v int, id int"
    )
    out = dedup_rank(df, keys=["k"], order_by=["v", "id"], descending=True)
    got = {(r["k"], r["v"]) for r in out.collect()}
    # window partitioning groups NULLs together: one winner for the null key
    assert got == {(None, 2), ("a", 3)}


def test_asof_join_null_left_ts(spark):
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10), 5.0)], "k long, ts timestamp, v double"
    )
    left = spark.createDataFrame(
        [(1, None), (1, datetime(2024, 1, 1, 11))], "k long, ts timestamp"
    )
    out = {r["ts"]: r["v_asof"] for r in asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts", right_values=["v"]
    ).collect()}
    # null ts sorts first (asc nulls first) => sees no prior right row
    assert out[None] is None
    assert out[datetime(2024, 1, 1, 11)] == 5.0


def test_empty_inputs_do_not_crash(spark):
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert minhash_candidates(empty_docs, "text", "doc_id").count() == 0
    from etl_hiscox_spark.operators.dedup import exact_dedup

    assert exact_dedup(empty_docs, "text", "doc_id").count() == 0
    from etl_hiscox_spark.quality.engine import QualityEngine
    from etl_hiscox_spark.quality.rules import NotNull, RuleSet

    report = QualityEngine().profile(
        empty_docs, RuleSet("t", (NotNull("text"),))
    )
    assert report.row_count == 0


def test_jaccard_matches_python_reference(spark):
    texts = {
        0: "alpha beta gamma delta epsilon zeta",
        1: "alpha beta gamma delta epsilon eta",
        2: "one two three four five six seven",
        3: "alpha beta gamma one two three four",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 3)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(df, pairs, "text", "doc_id", shingle_k=3).collect()
    }

    def ref_shingles(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)} or {t}

    for (a, b), j in got.items():
        sa, sb = ref_shingles(texts[a]), ref_shingles(texts[b])
        want = len(sa & sb) / len(sa | sb)
        assert abs(j - want) < 1e-12, (a, b, j, want)
    assert got[(0, 2)] == 0.0  # disjoint shingle sets
    assert got[(0, 1)] > 0.4  # near dup


def test_documents_with_single_word(spark):
    df = spark.createDataFrame(
        [(1, "word"), (2, "word"), (3, "other")], "doc_id long, text string"
    )
    # short docs fall back to whole-text shingles: exact dups still pair
    cands = minhash_candidates(df, "text", "doc_id", num_hashes=16, num_bands=8)
    assert (1, 2) in {(r["id_a"], r["id_b"]) for r in cands.collect()}
