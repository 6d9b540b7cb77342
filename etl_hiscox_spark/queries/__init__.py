"""Declared query inventory — the driver-facing contract.

Each query is registered as a ``Q(fn, oracle)`` pair: ``fn(spark, sf_dir) ->
DataFrame`` (the Spark-first implementation) and ``oracle`` (the equivalent
ANSI SQL DuckDB runs on the same parquet for the correctness gate; ``None``
for non-SQL-expressible operators, which get a rows-only check).

Determinism rules applied throughout (SURVEY.md §7):
- every computed column aliased identically in Spark and SQL;
- money aggregates via exact DECIMAL arithmetic, cast to DOUBLE at the end;
- every window ordering carries a unique tiebreaker;
- no current_timestamp / nondeterministic exprs in declared outputs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None


QUERIES: dict[str, Q] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = Q(fn, oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Driver correctness window rotation.
#
# The driver hard-checks only the FIRST 50 entries of ``queries()`` each
# round (CORRECTNESS_r{N}.json). With ~100 declared queries, registration
# order decides which ever get a hard signal — so the window is an explicit,
# rotated list, not an accident of import order (VERDICT r2 item 1).
#
# Round 3 window: every oracle query never checked in r1/r2 (F-cleaning,
# Q-quality, X-streaming, L/T/V LLM tiers) plus the queries declared this
# round (S-tier write paths, DQ engine, scalar parses, upsert twin) — all
# 50 slots carry hash-checkable oracles. The 50 rows already driver-green
# in CORRECTNESS_r02 rotate to the back — the union of rounds keeps every
# row covered. Rotate again next round for the rows-only operators
# (l2_minhash_near_dup, l2_simhash_candidates, l2_transitive_clusters,
# l3_ann_topk, t3/t7/t8/t12/t13, m1_multimodal_features, a16, s7) + any
# newly declared queries.
# ---------------------------------------------------------------------------

WINDOW_R3: tuple[str, ...] = (
    # silver cleaning semantics (reference test_ingestion.py:204-253)
    "f_string_cleaning",
    "f4_multiformat_dates",
    "f6_f9_date_math",
    # DQ engine (sources.yml declared tests -> rule profiles / quarantine)
    "q2_rule_profile",
    "q4_quarantine_split",
    "q4_failure_tagging",
    # streaming batch-twins (x*)
    "x3_tumbling_window",
    "x4_sliding_window",
    "x5_session_window",
    "x6_stateful_dedup_batch_twin",
    "x8_threshold_crossing",
    "x9_stream_static_enrich",
    "x10_click_purchase_join",
    "x11_funnel_stages",
    # gold analytics declared after slot 50 in r1/r2
    "g8_large_order_customers",
    "g9_exclusive_late_supplier",
    "a17_order_items_array",
    "f16_fuzzy_name_pairs",
    # LLM-pipeline tier (dedup / similarity / vectors / text)
    "l1_exact_dedup",
    "l2_ngram_jaccard_pairs",
    "l3_cosine_topk",
    "l3_embedding_near_pairs",
    "v1_embedding_norms",
    "v2_quantize_int8",
    "v3_random_projection",
    "l4_text_stats",
    "l5_token_stats",
    "l6_json_extraction",
    "t1_language_id",
    "t2_quality_score",
    "t4_vocabulary",
    "t5_bigram_frequency",
    "t6_train_test_split",
    "t9_chunk_documents",
    "t10_repetition_stats",
    "t11_gopher_flags",
    # write-path round-trips (new this round — VERDICT r2 item 5)
    "s1_csv_roundtrip",
    "s3_append_schema_merge",
    "s6_json_roundtrip",
    "s8_ctas_roundtrip",
    "s9_scd2_snapshot",
    "s10_seed_load",
    "a11_table_stats",
    # DQ engine / scalar-function / streaming-sink queries (new this round)
    "q1_rule_violations",
    "q3_threshold_alerts",
    "q5_store_failures",
    "q6_observe_metrics",
    "x7_upsert_batch_twin",
    "f3_money_parse",
    "f8_batch_id_format",
)


def all_queries() -> dict[str, Q]:
    # Import side-effect registration; keep imports lazy so a syntax error in
    # one group doesn't take down the whole inventory surface at import time.
    from etl_hiscox_spark.queries import relational  # noqa: F401

    for mod in ("analytics", "llm", "quality", "streaming", "writes"):
        try:
            __import__(f"etl_hiscox_spark.queries.{mod}")
        except ImportError:
            pass
    ordered: dict[str, Q] = {}
    for name in WINDOW_R3:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    for name, q in QUERIES.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
