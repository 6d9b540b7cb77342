"""Single-partition DataFrames for small driver-local row lists.

``SparkSession.createDataFrame(list, schema)`` parallelizes the list into
``sc.defaultParallelism`` slices — on a 32-core master that is a 32-task
Python-RDD stage (each task pays a Python-worker round trip) for what is
usually a report tail or a metadata frame of a handful of rows. Profiled on
the r17 baseline: a 2-row fragmentation-stats frame cost a 1.7 s 32-task
job (guide §1/§5 — the driver should do almost no data work, and tiny
frames should not fan out).

``local_rows_df`` pins the list to ONE slice. This is scale-correct by
construction: the helper is only for rows that already live on the driver
(bounded scalars, report tails, directory stats), so one partition is the
honest degree of parallelism — big data never goes through here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def local_rows_df(spark: SparkSession, rows: Sequence, schema) -> DataFrame:
    """``createDataFrame`` for small driver-local lists: one partition.

    ``schema`` must be explicit (DDL string or StructType) — inference over
    an RDD would schedule a sampling job, which defeats the point.
    """
    sc = spark.sparkContext
    return spark.createDataFrame(sc.parallelize(list(rows), numSlices=1), schema)
