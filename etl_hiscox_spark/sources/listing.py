"""Distributed filesystem listing for index/table observability.

Fragmentation diagnostics need per-directory (file count, bytes) facts.
A recursive driver-side ``FileSystem.listFiles`` walk is fine at
n_clusters × daily files, but at 100 TB with years of appends the
listing ITSELF becomes a driver stall (VERDICT r10) — the scale-safe
form distributes the per-directory walks across executors and keeps the
driver's share bounded by the number of directories (one non-recursive
LIST), the same split Spark's own InMemoryFileIndex uses for parallel
partition discovery.

Executors have no JVM/Hadoop gateway from Python, so the per-directory
walk runs on ``pyarrow.fs`` (LocalFileSystem for file paths, the
``from_uri`` registry for s3:// and friends — public PyArrow surface).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def _dir_file_stats(dir_uri: str, suffix: str = ".parquet") -> tuple[int, int]:
    """(n_files, total_bytes) of one directory tree — runs on EXECUTORS.

    Hadoop renders local URIs as ``file:/x`` (one slash); PyArrow's
    ``from_uri`` rejects that form, so file-scheme URIs are normalized to
    plain paths on the LocalFileSystem."""
    from pyarrow import fs as pafs

    if dir_uri.startswith("file:") or "://" not in dir_uri:
        local = dir_uri[len("file:"):] if dir_uri.startswith("file:") else dir_uri
        filesystem, root = pafs.LocalFileSystem(), re.sub("^/+", "/", local)
    else:
        filesystem, root = pafs.FileSystem.from_uri(dir_uri)
    infos = filesystem.get_file_info(pafs.FileSelector(root, recursive=True))
    files = [
        i for i in infos if i.type == pafs.FileType.File and i.path.endswith(suffix)
    ]
    return len(files), sum(i.size for i in files)


def distributed_dir_stats(
    spark: SparkSession, dirs: list[tuple[int, str]]
) -> DataFrame:
    """(key, dir_uri) pairs → (key, n_files, total_bytes) with each
    directory walked on an executor. The driver materializes only the
    directory LIST (bounded — n_clusters for an IVF index); the walks,
    which scale with total file count, are fanned out one-dir-per-row
    via mapInPandas."""
    import pandas as pd

    ddf = spark.createDataFrame(dirs, "key int, dir string")

    def _walk(batches):
        for pdf in batches:
            rows = [
                (int(k),) + _dir_file_stats(d)
                for k, d in zip(pdf["key"], pdf["dir"])
            ]
            yield pd.DataFrame(rows, columns=["key", "n_files", "total_bytes"])

    n = max(1, min(len(dirs), spark.sparkContext.defaultParallelism))
    return ddf.repartition(n).mapInPandas(
        _walk, "key int, n_files long, total_bytes long"
    )
