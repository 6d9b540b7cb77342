"""Coverage for the smaller public APIs not exercised by the query
inventory: aggregate helpers, text features, multimodal audio/frames,
streaming parquet sink, registry conveniences, dup-group report."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_hiscox_spark.functions.text import quality_features, quality_score, word_count
from etl_hiscox_spark.operators.aggregates import (
    conditional_count,
    grouped_summary,
    money_avg,
    money_sum,
    rollup_summary,
)
from etl_hiscox_spark.operators.dedup import exact_dup_groups
from etl_hiscox_spark.registry import load_all, register_temp_views


def test_grouped_and_rollup_summary_helpers(spark):
    df = spark.createDataFrame(
        [("A", "X", 10.0), ("A", "Y", 20.0), ("B", "X", 5.0)], "k1 string, k2 string, v double"
    )
    g = grouped_summary(
        df,
        keys=["k1"],
        metrics={
            "n": F.count(F.lit(1)),
            "total": money_sum("v", "ignored"),
            "avg_v": money_avg("v", "ignored"),
            "n_big": conditional_count(F.col("v") >= 10, "ignored"),
        },
    )
    got = {r["k1"]: (r["n"], r["total"], r["avg_v"], r["n_big"]) for r in g.collect()}
    assert got == {"A": (2, 30.0, 15.0, 2), "B": (1, 5.0, 5.0, 0)}
    r = rollup_summary(df, keys=["k1", "k2"], metrics={"n": F.count(F.lit(1))})
    # rollup: 3 leaf + 2 subtotal + 1 grand total
    assert r.count() == 6


def test_quality_features_and_scores(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat with a hat and a bat near the flat door now",)], ["text"]
    )
    row = df.select(*quality_features("text"), quality_score("text").alias("q")).first()
    assert row["n_words"] == 17
    assert row["n_chars"] > 0
    assert 0 <= row["punct_ratio"] <= 1
    assert row["stopword_ratio"] > 0  # 'the', 'with', 'and' hit
    assert row["q"] == 1.0  # in-band length, no punctuation, non-empty


def test_word_count(spark):
    df = spark.createDataFrame([("  hello   world  ",), ("one",)], ["t"])
    got = [r["n"] for r in df.select(word_count("t").alias("n")).collect()]
    assert got == [2, 1]


def test_exact_dup_groups_report(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "Same   TEXT"), (3, "unique")], "doc_id long, text string"
    )
    groups = exact_dup_groups(df, "text", "doc_id").collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2 and groups[0]["keeper_id"] == 1


def test_audio_and_frame_stubs(spark):
    from etl_hiscox_spark.operators.multimodal import audio_features_stub, frame_sample_plan

    df = spark.createDataFrame(
        [("a.wav", "audio", bytearray(b"\x00\x10\x20\x30"), 4000)],
        "path string, modality string, content binary, length long",
    )
    out = audio_features_stub(df).first()
    assert out["rms_energy"] > 0
    frames = frame_sample_plan(df, every_n=30).collect()
    assert len(frames) >= 2
    assert frames[0]["frame_index"] == 0 and frames[1]["frame_index"] == 30


def test_write_stream_parquet_sink(spark, sf_dir, tmp_path):
    from etl_hiscox_spark.registry import load_table
    from etl_hiscox_spark.streaming.ops import stream_from_parquet, write_stream_parquet

    src = str(tmp_path / "src")
    load_table(spark, "events", sf_dir).write.parquet(src)
    q = write_stream_parquet(
        stream_from_parquet(spark, src),
        path=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 1000


def test_registry_conveniences(spark, sf_dir):
    tables = load_all(spark, sf_dir)
    assert set(tables) >= {"lineitem", "orders", "documents"}
    register_temp_views(spark, sf_dir)
    assert spark.sql("SELECT COUNT(*) AS n FROM region").first()["n"] == 5
