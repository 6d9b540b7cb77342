"""End-to-end corpus-prep pipeline test: stage monotonicity, leakage
safety, packing validity — on the real documents table."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_hiscox_spark.plans.llm_pipeline import prepare_corpus
from etl_hiscox_spark.registry import load_table


def test_prepare_corpus_end_to_end(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    res = prepare_corpus(
        docs, chunk_size=32, overlap=8, pack_budget=256, split_weights={"train": 0.8, "val": 0.2}
    )
    c = res.stage_counts
    # stages only ever drop documents
    assert c["raw"] >= c["quality_gated"] >= c["repetition_gated"] >= c["exact_deduped"] >= c["near_deduped"]
    assert c["near_deduped"] > 0
    assert c["chunks"] == c["packed_chunks"] > 0  # packing reassigns, never drops

    out = res.chunks
    # every chunk of a doc is in exactly one split (leakage safety)
    leaks = out.groupBy("doc_id").agg(F.countDistinct("split").alias("n")).filter(F.col("n") > 1)
    assert leaks.count() == 0
    # pack ids are split-prefixed and packs respect the token budget
    # (single oversized chunks are impossible here: chunk_size < budget)
    over = (
        out.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("n"))
        .filter((F.col("t") > 256) & (F.col("n") > 1))
    )
    assert over.count() == 0
    splits = {r.s for r in out.select(F.split_part("pack_id", F.lit("/"), F.lit(1)).alias("s")).distinct().collect()}
    assert splits <= {"train", "val"}


def test_prepare_corpus_no_counts_runs_single_plan(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(200)
    res = prepare_corpus(docs, count_stages=False, chunk_size=32, overlap=4, pack_budget=512)
    assert res.stage_counts == {}
    assert res.chunks.count() > 0
