"""Span-level exact deduplication — the RefinedWeb/Falcon repetition pass.

Full-document exact dedup (operators/dedup.exact_dedup) misses the common
web-corpus failure mode: distinct pages sharing large verbatim blocks
(boilerplate, licence walls, syndicated paragraphs). RefinedWeb and the
Falcon pipeline remove the REPEATED SPANS and keep the remainder of each
document; this module implements that at fixed word-span granularity,
entirely relationally (reference repo has no equivalent — extension tier
per SURVEY.md §2.11).

Semantics: normalize → whitespace tokens → consecutive ``span_words``-token
spans (last span may be shorter) → a span occurrence is a DUPLICATE iff an
identical span occurs earlier in corpus order (smaller ``(id, span_idx)``).
First occurrence always survives, so every distinct span the corpus
contains is preserved exactly once.

Plan shape at 100 TB:
- span construction is the zero-shuffle scan-stage pattern shared with
  operators/chunking.py (split once, explode(sequence), slice) — no data
  movement, skew bounded by document length;
- duplicate marking is ONE shuffle: a window over the span key ordered by
  (id, span_idx). The shuffle key should be a HASH of the span
  (``spark.sql.execution.sortBeforeRepartition`` irrelevant — xxhash64 is
  uniform), so hot boilerplate spans are single keys: at web scale a
  cookie-banner span can hold millions of rows. That key is exactly the
  skew AQE's skew-join handling does NOT cover (it's a window, not a
  join), so ``mark_duplicate_spans`` exposes the span key and callers with
  pathological corpora should pre-aggregate (count per key) instead of
  ranking when they only need counts;
- document reassembly is a second shuffle (groupBy id) with map-side
  partial collect — bounded by the original document sizes.

The declared query (queries/llm.py t18) keeps the raw span string as the
window key so DuckDB can replicate it verbatim; production uses
``hashed=True`` (8-byte xxhash64 keys — shuffle volume drops from corpus
bytes to 8 bytes/span plus payload), identical semantics pinned in
tests/test_span_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_hiscox_spark.functions.text import tokens


def document_spans(df: DataFrame, text_col: str, id_col: str, span_words: int = 50) -> DataFrame:
    """One row per (id, span_idx, span): consecutive non-overlapping
    ``span_words``-token windows of the normalized text. Zero shuffles.

    Every document yields at least one span (possibly shorter than
    ``span_words``); empty/NULL text yields one empty span, so documents
    are never silently dropped by the dedup pass.
    """
    if span_words <= 0:
        raise ValueError(f"span_words ({span_words}) must be positive")
    base = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("__t"))
    n_spans = F.greatest(F.ceil(F.size("__t") / F.lit(span_words)), F.lit(1))
    return (
        base.select(
            "id",
            "__t",
            F.explode(F.sequence(F.lit(0), n_spans.cast("int") - 1)).alias("span_idx"),
        )
        .select(
            "id",
            "span_idx",
            F.array_join(
                F.slice(F.col("__t"), F.col("span_idx") * span_words + 1, span_words), " "
            ).alias("span"),
        )
    )


def mark_duplicate_spans(
    spans: DataFrame, hashed: bool = False
) -> DataFrame:
    """Adds ``is_dup``: true iff an identical span occurs at a smaller
    (id, span_idx). One shuffle, on the span key (or its xxhash64 when
    ``hashed`` — same semantics, 8-byte shuffle key; hash collisions would
    merge unrelated spans, at 2^-64 per pair — the standard trade every
    hash-keyed dedup makes, same as operators/dedup.exact_dedup)."""
    key = F.xxhash64("span") if hashed else F.col("span")
    w = Window.partitionBy(key).orderBy(F.col("id").asc(), F.col("span_idx").asc())
    return spans.withColumn("is_dup", F.row_number().over(w) > 1)


def span_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_words: int = 50,
    hashed: bool = False,
) -> DataFrame:
    """Per-document span-dedup report: (id, n_spans, n_removed,
    deduped_text) where ``deduped_text`` is the surviving spans joined in
    original order. Documents whose every span is a duplicate come out
    with an empty ``deduped_text`` (and are the rows a caller drops).

    Deterministic: first corpus occurrence of each distinct span wins;
    reassembly orders by span_idx via array_sort over (span_idx, span)
    structs — no reliance on collect_list ordering.
    """
    marked = mark_duplicate_spans(
        document_spans(df, text_col, id_col, span_words), hashed=hashed
    )
    return (
        marked.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("is_dup").cast("long")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("is_dup"), F.struct("span_idx", "span")
                            )
                        )
                    ),
                    lambda s: s.span,
                ),
                " ",
            ).alias("deduped_text"),
        )
        .withColumnRenamed("id", id_col)
    )
