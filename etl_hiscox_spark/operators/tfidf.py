"""TF-IDF term weighting and keyword extraction — relational IR ops.

The topic-tagging / keyword stage of corpus curation (and the classic
retrieval weighting): weight each (document, term) by term frequency ×
inverse document frequency, keep the top-k terms per document. Everything
is joins and aggregations — no fitted model object, no UDF (reference repo
has no equivalent; extension tier per SURVEY.md §2.11).

tf(d, t)  = count of t in d
idf(t)    = ln((N + 1) / (df_t + 1)) + 1   (smoothed, sklearn's convention —
            never zero/negative, so unseen-everywhere terms can't NaN)
tfidf     = tf · idf

Plan shape at 100 TB: token explode is the zero-shuffle scan-stage pattern;
tf is one groupBy (doc, term) with map-side partial counts; df is a groupBy
(term) over the DISTINCT (doc, term) pairs tf already materialized — no
second pass over tokens. N rides in as a 1-row broadcast (the lazy
scalar-subquery shape, same as classifier.nb_train). The idf table is
|vocab| rows — and at web scale the raw vocab is BILLIONS of rows
(hapaxes, URLs, typos dominate distinct-token counts), i.e. GBs to tens
of GB, NOT broadcastable. So the tf⋈idf join is a plain sort-merge/shuffle
hash join by default and the tf side is already (doc, term)-aggregated —
far smaller than the token stream. Callers that have pruned the vocab
(``min_df`` here, or an upstream top-V cap) can opt in to a broadcast
with ``broadcast_idf=True``; nothing in this module forces the plan.
Per-doc top-k is one window shuffle on doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_hiscox_spark.functions.text import tokens


def term_frequencies(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, term, tf) — occurrence counts per document. One shuffle,
    map-side combined."""
    occ = df.select(F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("term"))
    return occ.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_df: int = 1,
    broadcast_idf: bool = False,
) -> DataFrame:
    """(doc, term, tf, tfidf) for every (document, term) pair.

    ``min_df`` drops terms appearing in fewer than that many documents
    BEFORE the tf⋈idf join — the standard vocab prune that collapses the
    web-scale hapax tail (typically >50% of distinct terms at df=1).
    ``broadcast_idf=True`` additionally hints the pruned idf table as the
    broadcast side; leave it False (the default) unless the caller KNOWS
    the surviving vocab fits executor memory — an unconditional broadcast
    here was the r6 scale finding (VERDICT r6 item 2): ``F.broadcast``
    forces the build regardless of size threshold, and a raw web-corpus
    vocab is GBs. AQE/CBO pick the join strategy when the hint is off.
    """
    tf = term_frequencies(df, text_col, id_col)
    n_docs = df.select(F.count(F.lit(1)).cast("double").alias("__N"))
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= F.lit(int(min_df)))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            (F.ln((F.col("__N") + 1.0) / (F.col("__df") + 1.0)) + 1.0).alias("__idf"),
        )
    )
    if broadcast_idf:
        idf = F.broadcast(idf)
    return tf.join(idf, "term").select(
        "doc", "term", "tf", (F.col("tf") * F.col("__idf")).alias("tfidf")
    )


def top_keywords(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    min_df: int = 1,
    broadcast_idf: bool = False,
) -> DataFrame:
    """(id, term, tf, tfidf, rank): each document's top-k terms by TF-IDF.

    Rank orders by 6-decimal-rounded tfidf desc with term asc as tiebreak —
    the discrete keyword set never rides an unrounded float (the g12/t19
    rule), so it reproduces across engines and summation orders.
    ``min_df`` / ``broadcast_idf`` pass through to :func:`tfidf_scores`.
    """
    scored = tfidf_scores(df, text_col, id_col, min_df=min_df, broadcast_idf=broadcast_idf).select(
        "doc", "term", "tf", F.round("tfidf", 6).alias("tfidf")
    )
    w = Window.partitionBy("doc").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumnRenamed("doc", id_col)
    )
