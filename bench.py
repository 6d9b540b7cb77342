"""Benchmark harness: runs the headline query set and prints ONE JSON line.

Protocol (BASELINE.md): run at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``; output
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is executed with a count-style action that forces full evaluation
without driver-side collect of the payload.

Median-of-3 protocol (VERDICT r2 item 4): every query runs three times and
reports the per-query MEDIAN; the headline value is the sum of medians.
Single-shot timings made round-over-round deltas unreadable — r2 showed
±2× swings on queries whose code had not changed. Runs interleave by pass
(q1..qN, q1..qN, ...) rather than back-to-back so one transient system
stall cannot inflate all three samples of the same query.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family — scan+agg, joins (shuffle +
# broadcast + asof), windows, set ops, dedup/text/similarity when present.
HEADLINE = [
    "a6_grouped_pricing_summary",
    "g1_star_join_revenue",
    "g2_top_unshipped_orders",
    "j1_inner_equijoin",
    "j3_broadcast_dim_join",
    "j6_range_interval_join",
    "j7_asof_join",
    "a8_completeness_profile",
    "w1_dedup_rank",
    "w5_running_total",
    "u2_except_difference",
    "r3_topk_orders",
    "g4_promo_revenue_share",
    # extension tier
    "l1_exact_dedup",
    "l2_minhash_near_dup",
    "l2_ngram_jaccard_pairs",
    "l3_cosine_topk",
    "l3_embedding_near_pairs",
    "l4_text_stats",
    "t4_vocabulary",
    "x3_tumbling_window",
    "x5_session_window",
    "x10_click_purchase_join",
    "g8_large_order_customers",
    "g9_exclusive_late_supplier",
    "t9_chunk_documents",
    "v2_quantize_int8",
    "t8_pack_sequences",
    # round-4 additions (new keys — r3-comparable keys above are unchanged)
    "t14_pii_scrub",
    "t15_decontamination",
    "m2_audio_features",
    "g10_volume_shipping",
    "g11_disjunctive_brackets",
]


def main() -> None:
    from etl_hiscox_spark.queries import all_queries
    from etl_hiscox_spark.session import get_spark

    spark = get_spark("bench")
    queries = all_queries()

    # Warm the JVM + parquet footers once so per-query times measure the
    # query, not session startup / codegen compilation.
    sf = SF_DIR
    from etl_hiscox_spark.registry import TESTDATA_TABLES, load_table

    for t in TESTDATA_TABLES:
        load_table(spark, t, sf).count()

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    present = [n for n in HEADLINE if n in queries]
    samples: dict[str, list[float]] = {n: [] for n in present}
    for _ in range(n_runs):
        for name in present:
            t0 = time.time()
            queries[name].fn(spark, sf).count()
            samples[name].append(time.time() - t0)
    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    total = round(sum(timings.values()), 3)

    sf_label = os.path.basename(os.path.normpath(sf)).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf_label) if sf_label.replace(".", "").isdigit() else sf_label,
                "protocol": f"median_of_{n_runs}_interleaved",
            }
        )
    )


if __name__ == "__main__":
    main()
