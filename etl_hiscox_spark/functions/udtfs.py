"""Python UDTFs — the table-function surface (SURVEY.md §2.12).

The reference defines no UDFs/UDTFs (its custom logic is plain-Python
validators); our engine policy is expressions-first, and every §2 operator
is expression-only. This module exists for the one API gap that policy
leaves: SQL-callable table-generating logic (`SELECT ... FROM tbl, LATERAL
split_chunks(text, ...)`), which Spark 4 serves with Arrow-optimized
Python UDTFs.

The expression-tier twin (`operators/chunking.chunk_documents`) is the
hot-path implementation — the UDTF is the SQL-ergonomics wrapper, and the
test suite pins both to identical output so neither can drift.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf
from pyspark.sql.session import SparkSession


@udtf(returnType="chunk_idx bigint, n_tokens int, chunk_text string", useArrow=True)
class SplitChunks:
    """LATERAL-joinable chunker: one output row per overlapping token
    window, same start-position rule as ``chunk_documents`` (starts 1,
    1+stride, … bounded by max(n_tokens - overlap, 1))."""

    def eval(self, text: str, chunk_size: int, overlap: int):  # noqa: D102
        if text is None:
            return
        if chunk_size <= 0:
            raise ValueError(f"chunk_size ({chunk_size}) must be positive")
        if not 0 <= overlap < chunk_size:
            raise ValueError(f"overlap ({overlap}) must be in [0, chunk_size={chunk_size})")
        toks = text.strip().split()
        if not toks:
            toks = [""]
        stride = chunk_size - overlap
        bound = max(len(toks) - overlap, 1)
        for idx, start in enumerate(range(0, bound, stride)):
            piece = toks[start : start + chunk_size]
            yield idx, len(piece), " ".join(piece)


def register_udtfs(spark: SparkSession) -> None:
    """Register all engine UDTFs on a session (idempotent)."""
    spark.udtf.register("split_chunks", SplitChunks)
