"""Scale stress harness: synthesize sfN-equivalent tables in /tmp with
Spark itself, run the heavy operators, report timings.

Usage: python tools/stress.py [--rows 6000000] [--docs 50000]

Not part of the per-round bench (the driver contract pins bench to the
provided testdata); this validates that plan shapes survive a 10-100×
scale-up — the question SCALING.md answers on paper, checked empirically.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=6_000_000)  # ≈ sf1 lineitem
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_hiscox_spark.session import get_spark

    spark = get_spark("stress")
    out = args.outdir or tempfile.mkdtemp(prefix="stress_")
    timings: dict[str, float] = {}

    def timed(name):
        def deco(fn):
            t0 = time.time()
            r = fn()
            timings[name] = round(time.time() - t0, 2)
            return r

        return deco

    # ---- synthesize ------------------------------------------------------
    n_orders = args.rows // 4

    @timed("gen_lineitem")
    def _gen_li():
        (
            spark.range(args.rows)
            .select(
                (F.col("id") % n_orders).alias("l_orderkey"),
                (F.xxhash64("id") % 200000).alias("l_partkey"),
                (F.col("id") % 4 + 1).alias("l_linenumber"),
                (F.xxhash64("id", F.lit(1)) % 50 + 1).cast("double").alias("l_quantity"),
                ((F.xxhash64("id", F.lit(2)) % 90000) / 1.0 + 900).alias("l_extendedprice"),
                ((F.xxhash64("id", F.lit(3)) % 11) / 100.0).alias("l_discount"),
                F.when(F.xxhash64("id", F.lit(9)) % 4 == 0, "R")
                .when(F.xxhash64("id", F.lit(9)) % 4 == 1, "A")
                .otherwise("N")
                .alias("l_returnflag"),
                F.timestamp_seconds(
                    F.lit(820454400) + F.abs(F.xxhash64("id", F.lit(4))) % 126144000
                ).alias("l_shipdate"),
            )
            .write.mode("overwrite")
            .parquet(f"{out}/lineitem")
        )

    @timed("gen_orders")
    def _gen_o():
        (
            spark.range(n_orders)
            .select(
                F.col("id").alias("o_orderkey"),
                (F.abs(F.xxhash64("id")) % 150000).alias("o_custkey"),
                ((F.abs(F.xxhash64("id", F.lit(5))) % 500000) / 1.0).alias("o_totalprice"),
                F.timestamp_seconds(
                    F.lit(820454400) + F.abs(F.xxhash64("id", F.lit(6))) % 126144000
                ).alias("o_orderdate"),
            )
            .write.mode("overwrite")
            .parquet(f"{out}/orders")
        )

    @timed("gen_docs")
    def _gen_docs():
        words = "the quick brown fox lazy dog spark query shuffle join filter window batch stream data value".split()
        word_arr = F.array(*[F.lit(w) for w in words])
        (
            spark.range(args.docs)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(60)),
                        lambda i: F.element_at(
                            word_arr,
                            ((F.abs(F.xxhash64(F.col("id"), i)) % F.lit(len(words))) + 1).cast(
                                "int"
                            ),
                        ),
                    ),
                ).alias("text"),
            )
            .write.mode("overwrite")
            .parquet(f"{out}/documents")
        )

    li = spark.read.parquet(f"{out}/lineitem")
    orders = spark.read.parquet(f"{out}/orders")
    docs = spark.read.parquet(f"{out}/documents")

    # ---- heavy operators -------------------------------------------------
    @timed("q1_groupagg")
    def _q1():
        li.groupBy("l_returnflag").agg(
            F.count(F.lit(1)), F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        ).collect()

    @timed("fact_join_agg")
    def _join():
        (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy(F.date_trunc("year", "o_orderdate").alias("y"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    @timed("window_running_total")
    def _win():
        from pyspark.sql import Window

        w = (
            Window.partitionBy("o_custkey")
            .orderBy("o_orderdate", "o_orderkey")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        orders.withColumn("rt", F.sum("o_totalprice").over(w)).agg(
            F.count(F.lit(1))
        ).collect()

    @timed("dedup_rank")
    def _dedup():
        from etl_hiscox_spark.operators.windows import dedup_rank

        dedup_rank(
            orders, keys=["o_custkey"], order_by=["o_orderdate", "o_orderkey"]
        ).agg(F.count(F.lit(1))).collect()

    @timed("near_dedup_minhash")
    def _nd():
        from etl_hiscox_spark.operators.dedup import near_dedup_minhash

        near_dedup_minhash(docs, "text", "doc_id", threshold=0.8).agg(
            F.count(F.lit(1))
        ).collect()

    @timed("decontaminate")
    def _decon():
        # eval set = 1% of the corpus; the broadcast-gram probe must stay
        # ~linear in train size (the 100 TB-side scan + map-side probe).
        from etl_hiscox_spark.operators.decontamination import decontaminate

        train = docs.filter(F.col("doc_id") % 100 != 0)
        test = docs.filter(F.col("doc_id") % 100 == 0)
        decontaminate(train, test, "text", "doc_id", ngram=8).agg(
            F.count(F.lit(1))
        ).collect()

    print(json.dumps({"rows": args.rows, "docs": args.docs, "timings": timings}))


if __name__ == "__main__":
    main()
