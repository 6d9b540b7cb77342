"""Corpus-frequency boilerplate line removal — the C4 cleanup pass.

Web pages repeat navigation chrome, cookie banners, and footer text across
millions of documents; the C4 pipeline (Raffel et al., 2020, public) drops
any LINE that occurs verbatim in many documents and keeps the rest of the
page. That is a line-level document-frequency computation plus a rebuild —
fully relational, no UDF.

(Reference repo has no equivalent — EXT training-data tier per
SURVEY.md §2.11.)

Plan at 100 TB: the line explode rides the scan stage (zero-shuffle);
line document-frequency is one map-side-combined aggregate; tagging is a
join on the line key; the rebuild is one per-doc shuffle. The line STRING
is the join/shuffle key here for oracle-exactness — a production run at
web scale should pre-hash lines (xxhash64) so the df aggregate and tag
join shuffle 8-byte keys instead of full line bytes (collision odds at
2^64 are dwarfed by the df threshold's own fuzziness). Boilerplate keys
are the heavy hitters by construction; AQE skew handling applies on the
tag join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def remove_boilerplate_lines(
    df: DataFrame, text_col: str, id_col: str, min_docs: int = 5
) -> DataFrame:
    """Drop every line occurring verbatim in >= ``min_docs`` distinct
    documents; rebuild the remaining text in original line order.

    Output: (id, n_lines, n_lines_kept, text_clean) — one row per input
    document, including fully-boilerplate documents (kept = 0, empty
    text): silently dropping them would skew downstream token budgets,
    and the caller decides whether an emptied doc survives. NULL text is
    normalized to '' first (one empty line) — split(NULL) yields no
    explode rows, which would silently drop the document and break the
    one-row-per-doc contract (ADVICE r7 item 3).
    """
    ln = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "pos", "line"
        ),
    )
    docfreq = ln.groupBy("line").agg(F.countDistinct("doc").alias("line_df"))
    # ONE per-doc aggregate over the tagged lines: kept-ness rides as a
    # conditional inside count/collect_list (NULL entries are skipped by
    # collect_list), so fully-boilerplate docs fall out naturally with
    # kept=0 / empty text — no second per-doc shuffle, no rebuild join.
    keep = F.col("line_df") < F.lit(int(min_docs))
    return (
        ln.join(docfreq, "line")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count(F.when(keep, 1)).alias("n_lines_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.when(keep, F.struct("pos", "line")))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text_clean"),
        )
        .select(
            F.col("doc").alias(id_col), "n_lines", "n_lines_kept", "text_clean"
        )
    )
