"""Corpus-trained n-gram LM quality scoring — the CCNet-style filter stage.

A classic LLM-data-pipeline component (CCNet, RedPajama, Gopher §A.2): score
every document by its negative log-likelihood under a smoothed n-gram
language model, then gate/bucket on the score — fluent text scores low,
boilerplate/gibberish scores high. Production stacks train the LM on a
trusted corpus (Wikipedia) via KenLM; this module implements the same
scoring RELATIONALLY so it runs distributed with no model server and no
UDF: counts are aggregations, probabilities are joins, the per-doc score is
one more aggregation.

Plan shape at 100 TB: token/bigram explode is the zero-shuffle scan-stage
pattern (explode(sequence)+element_at — same as operators/dedup shingles);
count tables shuffle once on their key with map-side partial counts
(shuffle volume = |vocab| / |bigram types|, not |tokens|); the scoring pass
joins doc-bigrams to the probability table on the bigram key and reduces
per doc. When the trained LM fits the broadcast threshold (vocab² observed
types is usually MBs-GBs), hint ``F.broadcast`` on the prob side and the
train stem never shuffles at all — the same shape as decontamination's
broadcast gram probe (operators/decontamination.py).

Smoothing: add-alpha (Laplace) over the observed unigram vocabulary —
P(w2|w1) = (C(w1,w2) + α) / (C(w1) + α·V). Integer counts make the
probability arguments engine-exact; only the final ln/avg is float.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_hiscox_spark.functions.text import tokens


def doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, w1, w2) — one row per bigram OCCURRENCE, zero shuffles.

    Same normalize/tokenize as the rest of the text tier
    (``functions.text.tokens``); docs with <2 tokens contribute nothing.
    explode(sequence)+element_at stays whole-stage-codegen'd — the
    F.transform lambda form runs interpreted (measured ~6x slower on the
    shingle stem, operators/dedup.py:80-82).
    """
    t = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("__t"))
    return (
        t.filter(F.size("__t") >= 2)
        .select(
            "doc",
            "__t",
            F.explode(F.sequence(F.lit(1), F.size("__t") - 1)).alias("__i"),
        )
        .select(
            "doc",
            F.element_at("__t", F.col("__i")).alias("w1"),
            F.element_at("__t", F.col("__i") + 1).alias("w2"),
        )
    )


def train_bigram_lm(
    df: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame, int]:
    """Count tables of a bigram LM: (bigram_counts(w1, w2, c2),
    unigram_counts(w, c1), vocab_size).

    Both counts are single map-side-combined aggregations. ``vocab_size``
    is ONE driver-side scalar (an intentional action — the same
    driver-side-small precedent as ``sampling.mixture_sample``); persist
    the count tables when training and scoring run in the same job.
    """
    bi = doc_bigrams(df, text_col, id_col)
    t = df.select(tokens(text_col).alias("__t"))
    uc = (
        t.select(F.explode("__t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    return bc, uc, uc.count()


def bigram_nll_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bigram_counts: DataFrame,
    unigram_counts: DataFrame,
    vocab_size: int,
    alpha: float = 1.0,
    broadcast_lm: bool = False,
) -> DataFrame:
    """(doc, n_bigrams, avg_nll): average negative log-likelihood per doc
    under the add-alpha bigram model. Lower = more typical text; gate or
    bucket on it downstream (the CCNet head/middle/tail split).

    ``broadcast_lm=True`` broadcasts the joined probability table so the
    document stem never shuffles before its per-doc reduce — use when the
    trained LM fits executor memory (usually true even for web-scale
    corpora; bigram TYPE counts grow far slower than token counts).

    Out-of-vocabulary bigrams get the smoothing FLOOR, never dropped:
    a (w1, w2) the model hasn't seen scores P = α/(C(w1) + αV), and an
    unseen w1 scores P = α/(0 + αV) = 1/V — both via LEFT joins with a
    coalesced fallback. (An inner join here would silently exclude OOV
    bigrams from the average, making gibberish score as fluent as its few
    in-vocabulary bigrams — exactly backwards for the reference-corpus
    mode where the scored text was NOT the training text. Invisible in
    the self-trained path, where every bigram is in the model.)
    """
    probs = bigram_counts.join(
        unigram_counts, bigram_counts.w1 == unigram_counts.w
    ).select(
        "w1",
        "w2",
        (
            (F.col("c2") + F.lit(alpha))
            / (F.col("c1") + F.lit(alpha) * F.lit(float(vocab_size)))
        ).alias("__p"),
    )
    uni = unigram_counts.select(F.col("w").alias("w1"), F.col("c1").alias("__c1"))
    if broadcast_lm:
        probs = F.broadcast(probs)
        uni = F.broadcast(uni)
    bi = doc_bigrams(df, text_col, id_col)
    av = F.lit(alpha) * F.lit(float(vocab_size))
    return (
        bi.join(probs, ["w1", "w2"], "left")
        .join(uni, ["w1"], "left")
        .select(
            "doc",
            F.coalesce(
                F.col("__p"),
                F.lit(alpha) / (F.coalesce(F.col("__c1"), F.lit(0)) + av),
            ).alias("__p"),
        )
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.ln("__p")), 6).alias("avg_nll"),
        )
    )


def self_trained_nll(
    df: DataFrame, text_col: str, id_col: str, alpha: float = 1.0
) -> DataFrame:
    """Train on the corpus, score the corpus — flags documents whose token
    transitions are atypical for the collection itself (gibberish, other
    languages, boilerplate walls). For the CCNet setup proper, train on a
    trusted reference corpus instead and pass the counts explicitly."""
    bc, uc, v = train_bigram_lm(df, text_col, id_col)
    return bigram_nll_scores(df, text_col, id_col, bc, uc, v, alpha)
