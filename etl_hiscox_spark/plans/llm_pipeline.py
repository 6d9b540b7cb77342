"""End-to-end LLM training-corpus preparation pipeline.

Composes the §2.11 operators into the canonical corpus-prep flow:

    raw docs → [opt] URL blocklist (suffix equi-join — cheapest gate first)
             → quality gates (Gopher/C4) → repetition filter
             → [opt] C4 boilerplate-line removal (corpus-frequency lines
               dropped BEFORE dedup, so shared chrome can't mask real
               near-duplicate bodies or create false ones)
             → exact dedup → MinHash near-dedup
             → [opt] span-level dedup (RefinedWeb repeated-block removal)
             → [opt] LM-NLL gate (CCNet-style bigram perplexity filter)
             → chunk (overlapping token windows)
             → train/val/test split (leakage-safe, by SOURCE doc)
             → token-budget shard packing (per split)

Every stage is one of the individually-tested operators; this module owns
only the composition and the stage-count report. Ordering rationale (the
order IS the optimization at 100 TB):

- Cheap per-row gates run FIRST (zero-shuffle scans) so the shuffling
  stages see only surviving rows.
- Exact dedup (one uniform-hash shuffle) runs before MinHash (the most
  expensive stage) — byte-identical copies never reach signature work.
- Chunking runs AFTER dedup: duplicated docs would otherwise fan out into
  duplicated chunks, multiplying downstream cost.
- The split is assigned per-DOCUMENT before packing, so all chunks of one
  document land in one split (no train/test leakage through overlap), and
  packing runs inside each split.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_hiscox_spark.operators.chunking import chunk_documents
from etl_hiscox_spark.operators.dedup import exact_dedup, near_dedup_minhash
from etl_hiscox_spark.operators.quality_filters import gopher_flags, repetition_stats
from etl_hiscox_spark.operators.lm_score import self_trained_nll
from etl_hiscox_spark.operators.sampling import hash_split, pack_sequences
from etl_hiscox_spark.operators.span_dedup import span_dedup


@dataclass
class CorpusPrepResult:
    """Final chunk table + per-stage row counts for the run report."""

    chunks: DataFrame  # id_col, chunk_idx, n_tokens, chunk_text, split, pack_id
    stage_counts: dict[str, int]


def prepare_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 128,
    overlap: int = 16,
    pack_budget: int = 2048,
    near_dup_threshold: float = 0.8,
    max_top_ngram_share_pct: int = 30,
    split_weights: dict[str, float] | None = None,
    count_stages: bool = True,
    span_dedup_words: int | None = None,
    lm_nll_cutoff: float | None = None,
    blocklist: DataFrame | None = None,
    url_col: str | None = None,
    boilerplate_min_docs: int | None = None,
) -> CorpusPrepResult:
    """Run the full corpus-prep flow; see module docstring for staging.

    ``count_stages=False`` skips the per-stage counts (each is an extra
    action) — the production setting; counts are for reports and tests.

    Opt-in hygiene stages (all default OFF so the declared t13 output is
    stable):
    - ``blocklist`` + ``url_col``: drop documents whose URL host matches
      a wildcard-domain blocklist rule (suffix equi-join) — runs FIRST,
      it is the cheapest gate and real pipelines never pay quality
      scoring for blocked domains.
    - ``boilerplate_min_docs``: C4 corpus-frequency line removal between
      the gates and dedup — each doc's text is replaced by its
      boilerplate-stripped rebuild, fully-emptied docs drop (their
      content is pure chrome). Runs BEFORE dedup so shared chrome can't
      mask real near-duplicate bodies or manufacture false ones.
    - ``span_dedup_words``: after near-dedup, remove repeated
      ``span_dedup_words``-token blocks corpus-wide (RefinedWeb pass);
      documents whose every span was seen earlier drop out entirely and
      the surviving text is the span-deduped reassembly.
    - ``lm_nll_cutoff``: self-train the bigram LM on the surviving corpus
      and drop documents whose avg negative log-likelihood exceeds the
      cutoff (gibberish/boilerplate tail, CCNet-style).
    """
    if (blocklist is None) != (url_col is None):
        raise ValueError("blocklist and url_col must be provided together")
    if boilerplate_min_docs is not None and boilerplate_min_docs < 2:
        # min_docs <= 1 means "drop every line that occurs in >= 1 doc" —
        # i.e. ALL of them: a silent full-corpus wipe, not a filter
        raise ValueError(
            f"boilerplate_min_docs must be >= 2 (got {boilerplate_min_docs}): "
            "1 would drop every line of every document"
        )
    weights = split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    counts: dict[str, int] = {}

    def note(name: str, df: DataFrame) -> DataFrame:
        if count_stages:
            counts[name] = df.count()
        return df

    note("raw", docs)

    # 0. optional URL blocklist — the cheapest gate runs before anything.
    #    blocked_ids, not domain_blocklist_tags: the gate needs only the
    #    matched minority, never the corpus-wide per-host report
    if blocklist is not None:
        from etl_hiscox_spark.operators.quality_filters import blocked_ids

        docs = note(
            "blocklist_gated",
            docs.join(blocked_ids(docs, url_col, id_col, blocklist), id_col, "left_anti"),
        )

    # 1-2. zero-shuffle quality gates, then the (one-shuffle) repetition gate
    flags = gopher_flags(docs, text_col, id_col).filter(F.col("keep")).select(id_col)
    gated = note("quality_gated", docs.join(flags, id_col, "left_semi"))
    rep = repetition_stats(gated, text_col, id_col, ngram=2)
    ok_rep = rep.filter(
        F.lit(100) * F.col("top_ngram_count") <= F.lit(max_top_ngram_share_pct) * F.col("total_ngrams")
    ).select(id_col)
    unrepetitive = note("repetition_gated", gated.join(ok_rep, id_col, "left_semi"))

    # 2b. optional C4 boilerplate-line removal: strip corpus-frequent
    #     lines and carry the rebuilt text into dedup; fully-emptied docs
    #     (kept = 0) are pure chrome and drop here
    if boilerplate_min_docs is not None:
        from etl_hiscox_spark.operators.boilerplate import remove_boilerplate_lines

        rebuilt = remove_boilerplate_lines(
            unrepetitive, text_col, id_col, min_docs=boilerplate_min_docs
        )
        unrepetitive = note(
            "boilerplate_stripped",
            unrepetitive.drop(text_col).join(
                rebuilt.filter(F.col("n_lines_kept") > 0).select(
                    id_col, F.col("text_clean").alias(text_col)
                ),
                id_col,
            ),
        )

    # 3-4. dedup: exact first (cheap, uniform hash), then MinHash near-dup
    exact = note("exact_deduped", exact_dedup(unrepetitive, text_col, id_col))
    deduped = note(
        "near_deduped", near_dedup_minhash(exact, text_col, id_col, threshold=near_dup_threshold)
    )

    # 4b. optional span-level dedup: replace text with the span-deduped
    #     reassembly, dropping fully-emptied docs (their content already
    #     exists verbatim earlier in the corpus)
    if span_dedup_words is not None:
        rep = span_dedup(deduped, text_col, id_col, span_words=span_dedup_words)
        deduped = note(
            "span_deduped",
            deduped.drop(text_col).join(
                rep.filter(F.col("deduped_text") != "").select(
                    id_col, F.col("deduped_text").alias(text_col)
                ),
                id_col,
            ),
        )

    # 4c. optional CCNet-style LM gate on the surviving corpus. The gate
    # DROPS the high-NLL tail (anti-join) rather than keeping the scored
    # set: a doc with <2 tokens has no bigrams, hence no score row, and a
    # semi-join on "scored low" would silently discard it even though the
    # model has no evidence against it.
    if lm_nll_cutoff is not None:
        scores = self_trained_nll(deduped, text_col, id_col)
        too_high = scores.filter(F.col("avg_nll") > lm_nll_cutoff).select(
            F.col("doc").alias(id_col)
        )
        deduped = note("lm_gated", deduped.join(too_high, id_col, "left_anti"))

    # 5. leakage-safe split BY DOCUMENT (before chunking, so overlapping
    #    chunks of one doc can never straddle train/test)
    split_docs = hash_split(deduped, id_col, weights)

    # 6. chunk, carrying the split label
    chunks = chunk_documents(split_docs, text_col, id_col, chunk_size, overlap).join(
        split_docs.select(id_col, "split"), id_col
    )
    note("chunks", chunks)

    # 7. pack per split: prefix the pack hash-group with the split so pack
    #    ids never collide across splits
    packed = None
    for name in weights:
        part = chunks.filter(F.col("split") == name)
        p = pack_sequences(
            part.select(F.concat_ws("#", id_col, F.col("chunk_idx")).alias("chunk_key"), "n_tokens"),
            "chunk_key",
            "n_tokens",
            budget=pack_budget,
        ).withColumn("pack_id", F.concat_ws("/", F.lit(name), F.col("pack_id")))
        packed = p if packed is None else packed.unionByName(p)
    out = chunks.withColumn(
        "chunk_key", F.concat_ws("#", id_col, F.col("chunk_idx"))
    ).join(packed.select("chunk_key", "pack_id"), "chunk_key").drop("chunk_key")
    note("packed_chunks", out)
    return CorpusPrepResult(chunks=out, stage_counts=counts)
