"""Benchmark harness: runs the headline query set and prints ONE JSON line.

Protocol (BASELINE.md): run at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``; output
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is executed with a count-style action that forces full evaluation
without driver-side collect of the payload.
"""

from __future__ import annotations

import json
import os
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

    t_total0 = time.time()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = queries.get(name)
        if q is None:
            continue
        t0 = time.time()
        df = q.fn(spark, sf)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        _ = n
    total = round(time.time() - t_total0, 3)

    sf_label = os.path.basename(os.path.normpath(sf)).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf_label) if sf_label.replace(".", "").isdigit() else sf_label,
            }
        )
    )


if __name__ == "__main__":
    main()
