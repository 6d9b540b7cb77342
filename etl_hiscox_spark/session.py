"""SparkSession factory.

Replaces the reference's session construction (``scripts/ingestion.py:36-41``
builds a Delta-enabled session; ``terraform/main.tf:136-139`` turns on AQE +
partition coalescing). We keep AQE on, pin the session timezone to UTC for
oracle reproducibility (SURVEY.md §7), and enable Arrow for the few
pandas-UDF paths.

Scale notes (100 TB design point):
- ``spark.sql.adaptive.enabled`` + coalescePartitions: runtime re-plan of
  shuffle partition counts; on a 1000-executor cluster this is what keeps
  ``spark.sql.shuffle.partitions`` from needing per-query tuning.
- ``spark.sql.adaptive.skewJoin.enabled``: splits skewed shuffle partitions
  for the big fact-fact joins instead of hand-salting.
- ``maxPartitionBytes`` 128m: scan parallelism scales with input size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "etl_hiscox_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for this engine.

    Local mode for tests; on a real cluster ``master`` is left to
    spark-submit. All settings are safe defaults for both.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif SparkSession.getActiveSession() is None and not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")

    conf = {
        # Determinism / oracle parity (SURVEY.md §7 pitfalls)
        "spark.sql.session.timeZone": "UTC",
        # Adaptive execution: runtime shuffle-partition coalescing, skew-join
        # splitting, and broadcast-join demotion — the scale levers.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Let AQE re-partition CACHED plans too (off by default). Without
        # it every persist() materializes with the static shuffle-partition
        # count and each downstream job over the cached frame pays that
        # many tasks — profiled r17: the probe operators' persisted
        # candidate/shingle stems ran 32-task stages over KB-scale frames.
        # At cluster scale this is the same win: cached intermediates get
        # AQE's advisory-size partitioning instead of a static constant.
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        # Arrow for pandas_udf / toPandas boundaries (L3 cosine path).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Scan sizing: keep partitions ~128 MB so a 100 TB table yields
        # ~800k tasks rather than a handful of giant ones.
        "spark.sql.files.maxPartitionBytes": "134217728",
        # Reading driver-generated parquet with ns timestamps (events.ts):
        # Spark has no TIMESTAMP(NANOS) type — read as long, convert to
        # microsecond timestamps at the registry boundary (FIXTURES.md §5).
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.parquet.int96RebaseModeInRead": "CORRECTED",
        "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
        # Quieter local runs.
        "spark.ui.showConsoleProgress": "false",
        "spark.ui.enabled": os.environ.get("SPARK_GRAFT_UI", "false"),
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
