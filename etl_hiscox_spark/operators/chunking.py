"""Document chunking for training-data pipelines.

Splits long documents into overlapping token-window chunks — the step
between cleaning/dedup and tokenizer sharding in an LLM data pipeline
(reference has no equivalent; extension tier per SURVEY.md §2.11).

Everything is codegen'd expressions: split once, explode a ``sequence``
of chunk start positions, assemble each chunk with ``slice`` +
``array_join``. ZERO shuffles — chunking stays in the scan stage, so at
100 TB it parallelizes per input split with no data movement; chunk
counts per doc are bounded by doc length, so no skew beyond the input's
own document-length skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 128,
    overlap: int = 32,
    keep_text: bool = True,
) -> DataFrame:
    """One row per (doc, chunk): overlapping token windows of ``chunk_size``
    tokens with ``overlap`` tokens shared between consecutive chunks.

    Chunk starts are 1, 1+stride, … (stride = chunk_size - overlap), up to
    ``greatest(n_tokens - overlap, 1)`` — the bound that guarantees full
    coverage of the document while never emitting a trailing chunk whose
    tokens are all contained in the previous chunk. Every document yields
    at least one chunk; the last chunk may be shorter than ``chunk_size``.
    Tokens are whitespace-split on the trimmed text (no case folding —
    chunk text must round-trip verbatim into training shards).

    Output: (id, chunk_idx 0-based, n_tokens, [chunk_text]).
    """
    if chunk_size <= 0:
        raise ValueError(f"chunk_size ({chunk_size}) must be positive")
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"overlap ({overlap}) must be in [0, chunk_size={chunk_size})")
    stride = chunk_size - overlap
    base = df.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__t"),
    )
    starts = base.select(
        id_col,
        "__t",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.size("__t") - overlap, F.lit(1)),
                F.lit(stride),
            )
        ).alias("__s"),
    )
    piece = F.slice("__t", F.col("__s"), chunk_size)
    cols = [
        F.col(id_col),
        ((F.col("__s") - 1) / stride).cast("long").alias("chunk_idx"),
        F.size(piece).alias("n_tokens"),
    ]
    if keep_text:
        cols.append(F.array_join(piece, " ").alias("chunk_text"))
    return starts.select(*cols)
