"""key_skew_profile: NULL bucket, share/x_mean arithmetic, top-k order."""

from __future__ import annotations

from etl_hiscox_spark.operators.diagnostics import key_skew_profile


def test_skew_profile_shares_and_null_bucket(spark):
    rows = [("a",)] * 6 + [("b",)] * 3 + [(None,)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_profile(df, "k", top_k=10).collect()
    # NULL keys form their own bucket (key None) — a string sentinel would
    # collide with a genuine 'NULL' value
    assert [(r["key"], r["n_rows"]) for r in out] == [("a", 6), ("b", 3), (None, 1)]
    a = out[0]
    assert abs(a["share"] - 0.6) < 1e-12
    # mean key load = 10/3 rows; 'a' carries 6 -> 1.8x the mean
    assert abs(a["x_mean"] - 6 / (10 / 3)) < 1e-12


def test_skew_profile_topk_and_ties(spark):
    rows = [(str(i % 5),) for i in range(50)]  # 5 keys x 10 rows each
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_profile(df, "k", top_k=3).collect()
    # equal counts -> deterministic key-order tiebreak, limited to k
    assert [r["key"] for r in out] == ["0", "1", "2"]
    assert all(abs(r["x_mean"] - 1.0) < 1e-12 for r in out)
