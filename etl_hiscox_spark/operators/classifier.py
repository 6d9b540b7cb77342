"""Multinomial Naive-Bayes text classifier, trained and applied relationally.

The quality/language classifier stage of LLM corpus pipelines (fastText
langid, the GPT-3/LLaMA "pages that look like references" quality gates) is
a log-linear model over token counts. Multinomial NB with add-alpha
smoothing is the closed-form member of that family: training IS aggregation
(per-class token counts) and inference IS a join + sum — so both run
distributed with no model server, no UDF, and no driver-side weight vector
(reference repo has no equivalent; extension tier per SURVEY.md §2.11).

score(d, c) = ln P(c) + Σ_w n_w(d) · ln P(w|c),   P(w|c) = (C_cw + α) / (T_c + αV)

factored for relational evaluation as

score(d, c) = ln_prior(c) + L(d) · ln_floor(c) + Σ_{w ∈ d ∩ c} n_w · ln((C_cw + α)/α)

where ln_floor(c) = ln(α / (T_c + αV)) is the unseen-word contribution.
The Σ term is the ONLY part that touches per-token data: token occurrences
join the (label, word) weight table and reduce per (doc, label). Words the
class never saw fall out of the inner join and are covered exactly by the
L·ln_floor term; classes sharing no word with a document still compete via
the (doc × class) base, so the argmax is over every class.

Plan shape at 100 TB: training = two map-side-combined aggregations
(shuffle volume = |label × vocab| types, not tokens). Scoring = token
explode (zero-shuffle scan stage) → join the weight table — |labels|·|vocab|
rows, MBs even for web vocabularies, so BROADCAST — → one groupBy
(doc, label) with partial aggregation → per-doc argmax window. One real
shuffle on (doc, label), one on doc; the class_stats side is always
broadcast (|labels| rows).

Prediction ties: the argmax ranks ROUND(score, 6) with label ASC as
tiebreak, so the winner is reproducible across engines and summation
orders (the g12 lesson: never let an unrounded float decide a
discrete output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_hiscox_spark.functions.text import tokens


def nb_train(
    df: DataFrame, text_col: str, label_col: str, alpha: float = 1.0
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB: returns ``(word_weights, class_stats)``.

    ``word_weights``: (label, word, w) with w = ln((C_cw + α)/α) — one row
    per word TYPE the class observed. ``class_stats``: (label, ln_prior,
    ln_floor) — one row per class. ``ln_prior`` uses doc counts. The two
    corpus scalars (V = distinct-word count, N = doc count) stay LAZY:
    each is a 1-row aggregate broadcast-joined into class_stats — the
    relational scalar-subquery shape (t16/g7), not an eager ``.count()``
    that would re-scan and re-explode the corpus once per scalar.
    """
    toks = df.select(F.col(label_col).alias("label"), tokens(text_col).alias("__t"))
    occ = toks.select("label", F.explode("__t").alias("word"))
    vocab = occ.select(F.countDistinct("word").cast("double").alias("__V"))
    ndocs = toks.select(F.count(F.lit(1)).cast("double").alias("__N"))
    word_weights = (
        occ.groupBy("label", "word")
        .agg(F.count(F.lit(1)).alias("__c"))
        .select(
            "label",
            "word",
            F.ln((F.col("__c") + F.lit(alpha)) / F.lit(alpha)).alias("w"),
        )
    )
    class_stats = (
        toks.groupBy("label")
        .agg(F.count(F.lit(1)).alias("__docs"), F.sum(F.size("__t")).alias("__toks"))
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(ndocs))
        .select(
            "label",
            F.ln(F.col("__docs") / F.col("__N")).alias("ln_prior"),
            F.ln(F.lit(alpha) / (F.col("__toks") + F.lit(alpha) * F.col("__V"))).alias(
                "ln_floor"
            ),
        )
    )
    return word_weights, class_stats


def nb_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    word_weights: DataFrame,
    class_stats: DataFrame,
    keep_cols: tuple[str, ...] = (),
    broadcast_model: bool = True,
) -> DataFrame:
    """Long-form scores: (id, *keep_cols, label, score) — one row per
    document per class, every class present for every document.

    ``broadcast_model=True`` (default) force-broadcasts ``word_weights``
    (|training vocab| × |labels| rows). That default ASSUMES the model was
    trained on a curated, bounded training set (the fastText/CCNet shape:
    ~1e5–1e7 labeled docs → vocab in the tens of MB), where broadcasting
    keeps the 100 TB scoring corpus from ever shuffling. It is NOT safe if
    you train on the raw corpus itself — a web-scale vocab is GBs (the
    tfidf.py lesson, VERDICT r6 item 2); pass ``broadcast_model=False``
    there and let AQE pick the join.
    ``keep_cols`` ride the grid side (no join back to the source — at
    scale that join would re-scan and re-shuffle the corpus just to
    reattach a column the scan already had).

    NULL-text documents are EXCLUDED from the output (no tokens = no
    evidence): without the filter their scores would all be NULL and the
    argmax tiebreak would confidently "predict" the alphabetically first
    class. Quarantine NULL text upstream if it must be surfaced."""
    keep = [F.col(c) for c in keep_cols]
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc"),
            *keep,
            tokens(text_col).alias("__t"),
        )
        .withColumn("__len", F.size("__t"))
    )
    occ = base.select("doc", F.explode("__t").alias("word"))
    model = F.broadcast(word_weights) if broadcast_model else word_weights
    contrib = (
        occ.join(model, "word")
        .groupBy("doc", "label")
        .agg(F.sum("w").alias("__seen"))
    )
    grid = base.select("doc", *keep_cols, "__len").crossJoin(
        F.broadcast(class_stats.select("label"))
    )
    return (
        grid.join(contrib, ["doc", "label"], "left")
        .join(F.broadcast(class_stats), "label")
        .select(
            F.col("doc").alias(id_col),
            *keep_cols,
            "label",
            (
                F.col("ln_prior")
                + F.coalesce(F.col("__seen"), F.lit(0.0))
                + F.col("__len") * F.col("ln_floor")
            ).alias("score"),
        )
    )


def nb_predict(
    df: DataFrame,
    text_col: str,
    id_col: str,
    word_weights: DataFrame,
    class_stats: DataFrame,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *keep_cols, predicted_label, score): argmax class per document
    over 6-decimal-rounded scores, label ASC as the deterministic
    tiebreak."""
    scored = nb_scores(df, text_col, id_col, word_weights, class_stats, keep_cols).select(
        id_col, *keep_cols, "label", F.round("score", 6).alias("score")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("label").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, *keep_cols, F.col("label").alias("predicted_label"), "score")
    )
