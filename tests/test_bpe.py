"""BPE merge training (operators/bpe.py): the literal-replace merge
application must reproduce reference BPE greedy left-to-right semantics,
and training must match a hand-computed run. The t21 oracle replays the
whole loop in DuckDB; these tests pin the semantics the oracle assumes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_hiscox_spark.operators.bpe import (
    _apply_merge,
    bpe_oracle_sql,
    bpe_segment,
    bpe_train,
    word_freq_table,
)


def _apply(spark, s: str, left: str, right: str) -> str:
    df = spark.createDataFrame([(s,)], "s string")
    return df.select(_apply_merge(F.col("s"), left, right).alias("o")).collect()[0]["o"]


@pytest.mark.parametrize(
    "s,left,right,expected",
    [
        ("x y x y", "x", "y", "xy xy"),        # adjacent occurrences both merge
        ("a a a", "a", "a", "aa a"),           # overlap: greedy left-to-right
        ("a a a a", "a", "a", "aa aa"),
        ("h e l l o", "l", "l", "h e ll o"),
        ("h e l l o", "e", "l", "h el l o"),
        ("q", "a", "b", "q"),                  # no-op on single symbol
        ("ab c", "a", "b", "ab c"),            # merged symbol 'ab' != pair a,b
        ("x ab ab y", "ab", "ab", "x abab y"),  # multi-char symbols merge too
    ],
)
def test_apply_merge_semantics(spark, s, left, right, expected):
    assert _apply(spark, s, left, right) == expected


def _reference_bpe(word_freqs: dict[str, int], n_merges: int) -> list[str]:
    """Plain-Python reference BPE trainer (Sennrich et al. 2016 shape)."""
    seg = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in seg.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_freqs[w]
        if not counts:
            break
        # same tie-break as the operator: count DESC, pair string ASC
        best = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))[0]
        merges.append(f"{best[0]} {best[1]}")
        for w, syms in seg.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seg[w] = out
    return merges


def test_bpe_train_matches_python_reference(spark):
    corpus = [
        ("the cat sat on the mat",),
        ("the cats eat the fish",),
        ("low lower lowest",),
        ("new newer newest",),
    ] * 3
    df = spark.createDataFrame(corpus, "text string")
    got = [(r["rank"], r["pair"]) for r in bpe_train(df, "text", n_merges=6).collect()]

    wf = {
        r["word"]: r["freq"] for r in word_freq_table(df, "text").collect()
    }
    expected = _reference_bpe(wf, 6)
    assert [p for _, p in sorted(got)] == expected


def test_bpe_train_oracle_parity_duckdb(spark):
    import duckdb

    corpus = [("ababab banana cabbage",), ("ab ab banana",)] * 2
    df = spark.createDataFrame(corpus, "text string")
    got = sorted((r["rank"], r["pair"]) for r in bpe_train(df, "text", n_merges=5).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE docs AS SELECT * FROM (VALUES " +
                ", ".join(f"('{t[0]}')" for t in corpus) + ") v(text)")
    oracle = sorted(con.execute(bpe_oracle_sql("SELECT text FROM docs", "text", 5)).fetchall())
    assert got == [(int(r), p) for r, p in oracle]


def test_bpe_segment_respects_word_boundaries(spark):
    # merge ('t h') must not fire across the boundary of "cat" + "hat"
    df = spark.createDataFrame([("cat hat",)], "text string")
    out = bpe_segment(df, "text", [(1, "t h")]).collect()[0]["bpe_tokens"]
    assert out == ["c", "a", "t", "h", "a", "t"]
    # within-word application in rank order
    df2 = spark.createDataFrame([("lower low",)], "text string")
    out2 = bpe_segment(df2, "text", [(1, "l o"), (2, "lo w")]).collect()[0]["bpe_tokens"]
    assert out2 == ["low", "e", "r", "low"]


def test_bpe_train_short_circuits_when_no_pairs_left(spark):
    df = spark.createDataFrame([("a b c",)], "text string")  # 1-char words only
    assert bpe_train(df, "text", n_merges=4).count() == 0


def test_oracle_matches_train_when_corpus_exhausts_merges(spark):
    """A corpus supporting fewer merges than n_merges: bpe_train breaks
    early; the oracle must emit exactly the same (shorter) merge table —
    no NULL-pair rows — and the segmentation oracle must treat exhausted
    rounds as no-ops instead of NULLing every document."""
    import duckdb

    from etl_hiscox_spark.operators.bpe import bpe_segment_oracle_sql

    corpus = [("ab ab",), ("ab",)]  # only 1 possible merge ('a b')
    df = spark.createDataFrame(corpus, "text string")
    got = sorted((r["rank"], r["pair"]) for r in bpe_train(df, "text", n_merges=8).collect())
    assert got == [(1, "a b")]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t[0]}')" for i, t in enumerate(corpus))
        + ") v(doc_id, text)"
    )
    oracle = con.execute(bpe_oracle_sql("SELECT text FROM docs", "text", 8)).fetchall()
    assert sorted((int(r), p) for r, p in oracle) == got

    seg = con.execute(bpe_segment_oracle_sql("docs", "text", "doc_id", 8)).fetchall()
    assert sorted(seg) == [(0, 2), (1, 1)]  # 'ab ab' -> 2 tokens, 'ab' -> 1
