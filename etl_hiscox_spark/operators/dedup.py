"""Deduplication operators for LLM-scale corpora (SURVEY.md §2.11 L1-L2).

Four tiers, all shuffle-conscious:

- **exact** (L1): hash-groupBy on a normalized content hash. One shuffle on
  a uniformly-distributed 256-bit key — no skew by construction.
- **MinHash + LSH** (L2): shingle → minhash signature (expression-only
  permutation hashing) → band → bucket self-join. Candidate pairs only ever
  meet inside a band-bucket, so the join is an equi-join on (band, bucket)
  — never O(n²).
- **SimHash**: 64-bit near-dup signature via per-token xxhash bit voting;
  Hamming-adjacent buckets found by splitting the signature into 4 16-bit
  blocks (pigeonhole: any pair within Hamming distance 3 shares a block).
- **n-gram Jaccard**: exact verify step applied to LSH candidate pairs
  (array_intersect/array_union on shingle arrays).

Everything is built-in expressions — no Python UDFs — so the hot path stays
in whole-stage codegen.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyspark.errors import AnalysisException as _SparkAnalysisError

from etl_hiscox_spark.functions.text import content_hash, normalize_text, shingles
from etl_hiscox_spark.operators.caching import adopt_caches, attach_owned_caches

# ---------------------------------------------------------------------------
# L1: exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id document per normalized-content hash.

    groupBy on sha256(normalized text): one shuffle, uniform keys. The
    deterministic keeper (min id) makes the result oracle-comparable —
    same rule as the reference's deterministic dedup requirement (W1).
    """
    return (
        df.withColumn("__h", content_hash(F.col(text_col)))
        .withColumn(
            "__keep",
            F.row_number().over(
                Window.partitionBy("__h").orderBy(F.col(id_col).asc())
            ),
        )
        .filter(F.col("__keep") == 1)
        .drop("__h", "__keep")
    )


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Duplicate-group report: one row per content hash with >1 doc."""
    return (
        df.select(content_hash(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# L2: MinHash + banded LSH
# ---------------------------------------------------------------------------
# Permutation hashing: h_i(s) = xxhash64(shingle, seed=i). The minhash
# signature is [min_i over shingles] — computed with array exprs, no UDF.


def _shingle_grams(df: DataFrame, text_col: str, id_col: str, shingle_k: int) -> DataFrame:
    """(doc, shingle-string) rows, duplicates included — shared plan stem.

    Formulation: split once → explode a ``sequence`` of k-gram start
    positions → assemble each k-gram with ``element_at`` (all codegen'd
    expressions). ZERO shuffles: unlike the window-``lead`` form (which
    shuffles and sorts the whole token table by (doc, pos) — the entire
    corpus at 100 TB), the generate and projection stay in the scan stage.
    Array-lambda forms (``F.transform`` + slice) run interpreted per
    element in Spark 4 and measured ~6× slower on the sf0.1 corpus.
    Docs shorter than k tokens contribute their whole normalized text as a
    single shingle (same rule as :func:`...functions.text.shingles`).
    """
    norm = normalize_text(F.col(text_col))
    base = df.select(F.col(id_col).alias("doc"), F.split(norm, " ").alias("__t"))
    long_docs = (
        base.filter(F.size("__t") >= shingle_k)
        .select(
            "doc",
            "__t",
            F.explode(F.sequence(F.lit(1), F.size("__t") - (shingle_k - 1))).alias("__i"),
        )
        .select(
            "doc",
            F.concat_ws(
                " ", *[F.element_at("__t", F.col("__i") + j) for j in range(shingle_k)]
            ).alias("shingle"),
        )
    )
    short_docs = base.filter(F.size("__t") < shingle_k).select(
        "doc", F.concat_ws(" ", "__t").alias("shingle")
    )
    return long_docs.unionByName(short_docs)


def exploded_shingles(df: DataFrame, text_col: str, id_col: str, shingle_k: int = 3) -> DataFrame:
    """(doc, shingle) rows — one per DISTINCT word-k-gram per doc."""
    return _shingle_grams(df, text_col, id_col, shingle_k).distinct()


def _raw_shingle_hash_stream(
    df: DataFrame, text_col: str, id_col: str, shingle_k: int
) -> DataFrame:
    """(doc, h) rows, duplicates included — the ZERO-SHUFFLE stem.

    Each k-gram is xxhash64'd to a long in the scan stage, so anything
    downstream moves fixed 8-byte keys instead of text. min() aggregations
    (MinHash signatures) consume this directly — min is idempotent over
    duplicate hashes, so paying a corpus-wide distinct shuffle before the
    signature agg buys nothing (VERDICT r4 profile: that distinct
    dominated l2_minhash_near_dup's runtime).

    The hash is ``xxhash64(slice(tokens, i, k))`` — hashing the token
    slice DIRECTLY instead of materializing the concat_ws shingle string
    first (measured 2.4× faster on the sf0.1 signature stage; also
    separator-unambiguous). Hash values therefore differ from
    ``xxhash64(shingle-string)`` — fine, because every consumer (minhash
    signatures, banded LSH, Jaccard counts, hashed decontamination grams)
    compares hashes produced by THIS function against each other, never
    against string-form shingles.
    """
    norm = normalize_text(F.col(text_col))
    base = df.select(F.col(id_col).alias("doc"), F.split(norm, " ").alias("__t"))
    long_docs = (
        base.filter(F.size("__t") >= shingle_k)
        .select(
            "doc",
            "__t",
            F.explode(F.sequence(F.lit(1), F.size("__t") - (shingle_k - 1))).alias("__i"),
        )
        .select("doc", F.xxhash64(F.slice("__t", F.col("__i"), shingle_k)).alias("h"))
    )
    # docs shorter than k: the whole token array is the single shingle
    # (same rule as _shingle_grams / functions.text.shingles)
    short_docs = base.filter(F.size("__t") < shingle_k).select(
        "doc", F.xxhash64("__t").alias("h")
    )
    return long_docs.unionByName(short_docs)


def exploded_shingle_hashes(
    df: DataFrame, text_col: str, id_col: str, shingle_k: int = 3
) -> DataFrame:
    """(doc, h) rows — one per DISTINCT 64-bit-hashed word-k-gram per doc.

    The distinct'd form exact set arithmetic needs (Jaccard |A∩B|/|A∪B|);
    signature building uses :func:`_raw_shingle_hash_stream` instead.
    Jaccard counts are exact up to 64-bit hash collisions (~2^-64 per
    shingle pair — immaterial next to MinHash's own error).
    """
    return _raw_shingle_hash_stream(df, text_col, id_col, shingle_k).distinct()


def minhash_signature_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    shingle_k: int = 3,
    _shingle_hashes: DataFrame | None = None,
) -> DataFrame:
    """(doc, h0..h{n-1}) minhash signature table.

    Plan: explode shingle hashes → project num_hashes codegen'd xxhash64
    columns (per-permutation seed mixed in as an extra hashed column) →
    groupBy(doc) min() per column. One shuffle on doc id; partial min()
    runs map-side so shuffle volume is |docs| × num_hashes longs regardless
    of corpus size. The num_hashes "permutations" re-hash the fixed-width
    shingle hash with per-function seeds (xxhash64 of a long is a handful
    of multiplies — the string pass happened once, upstream).
    """
    sh = (
        _shingle_hashes
        if _shingle_hashes is not None
        else _raw_shingle_hash_stream(df, text_col, id_col, shingle_k)
    )
    # ``_shingle_hashes`` may be raw (duplicates included) or distinct'd —
    # min() is idempotent, signatures are identical either way.
    # SQL-string aggregates, one parse per column: the Column-builder form
    # (num_hashes × F.xxhash64(F.col…)/F.min chains) paid ~5 py4j round
    # trips per column PER CALL — profiled r17 at ~0.4 s per invocation
    # on the driver, and this function runs 3+ times per lifecycle probe.
    # Identical plan: min(xxhash64(h, i)) with partial map-side agg.
    return sh.groupBy("doc").agg(
        *[F.expr(f"min(xxhash64(h, {i})) AS h{i}") for i in range(num_hashes)]
    )


def _banded_buckets(sig: DataFrame, num_hashes: int, num_bands: int) -> DataFrame:
    """(doc, band, bucket) rows from a signature table — the LSH index form.

    Bucket = variadic xxhash64 over the band's signature longs + band id —
    no string concat (the cast-to-string + concat_ws form costs an order
    of magnitude more codegen and byte traffic for identical recall).
    """
    rows_per_band = num_hashes // num_bands
    # one SQL string instead of num_bands × nested Column builders (same
    # py4j-chatter fix as minhash_signature_table — this ran ~0.2 s of
    # driver time per call); the expression tree is identical
    bands_sql = ", ".join(
        "named_struct('band', {b}, 'bucket', xxhash64({cols}, {b}))".format(
            b=b,
            cols=", ".join(f"h{b * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for b in range(num_bands)
    )
    return sig.select(
        "doc", F.expr(f"explode(array({bands_sql}))").alias("bb")
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_k: int = 3,
    _shingle_hashes: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash LSH.

    Plan shape: signature table (one shuffle) → explode to (band, bucket,
    doc) — num_bands rows per doc → self equi-join on (band, bucket) →
    distinct pairs. Bucket keys are hashes, so skew appears only for
    genuinely massive duplicate clusters (AQE skew-join splits those).
    """
    if num_hashes % num_bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by num_bands "
            f"({num_bands}) — trailing hashes would be computed but never banded"
        )
    sig = minhash_signature_table(df, text_col, id_col, num_hashes, shingle_k, _shingle_hashes)
    banded = _banded_buckets(sig, num_hashes, num_bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 3,
    threshold: float = 0.0,
    _shingle_hashes: DataFrame | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    Set formulation (r17, guide §2.4/§3): aggregate each doc's distinct
    shingle hashes into ONE array row (``collect_set`` — dedup for free,
    so a raw stream works as input), join the a-side and b-side arrays
    onto the pairs, and compute |A∩B| with ``array_intersect`` /
    |A∪B| = |A| + |B| − |A∩B| inline. This replaces the count-join
    formulation (distinct stem + per-doc count agg + a big-big
    (id, shingle) intersection join + three count re-joins) with one
    aggregation and two equi-joins — ~7 Exchanges → ~3 on the confirmed-
    pairs plan, and the per-pair work is O(|A| + |B|) hash-set arithmetic
    instead of a shuffled join row per matching shingle. Joining on the
    64-bit shingle hash instead of the string keeps the per-doc payload
    at 8 bytes/element (collision error ~2^-64 — see
    :func:`exploded_shingle_hashes`). Scores are bit-identical to the
    count-join form (same integer operands, same division).
    """
    # The per-doc set table feeds two plan branches (a-side, b-side);
    # cache it lazily so the first action computes it once and the other
    # branch reuses it. (Not an eager localCheckpoint: that would run a
    # Spark job at DataFrame-CONSTRUCTION time — surprising for callers
    # that only .explain() — and truncate lineage, losing fault tolerance.)
    # Lifecycle (ADVICE r8): the persisted stem is attached to the returned
    # frame — materialize, then ``caching.release_caches(result)`` (or use
    # the ``owned_caches`` context manager) to free the blocks.
    src = (
        _shingle_hashes
        if _shingle_hashes is not None
        else _raw_shingle_hash_stream(df, text_col, id_col, shingle_k)
    )
    sets = src.groupBy("doc").agg(F.collect_set("h").alias("__s"))
    if checkpoint_dir is not None:
        # the documented cluster contract (ADVICE r17): with a reliable
        # checkpoint dir, the multi-branch set table goes to durable
        # storage — a lazy persist alone keeps full lineage back to the
        # corpus scan, so executor loss would recompute the whole stem
        sets = _materialize(sets, checkpoint_dir)
        owned: list[DataFrame] = []
    else:
        sets = sets.persist()
        owned = [sets]
    sa = sets.select(F.col("doc").alias("id_a"), F.col("__s").alias("__sa"))
    sb = sets.select(F.col("doc").alias("id_b"), F.col("__s").alias("__sb"))
    n_int = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    out = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                n_int.cast("double")
                / (F.size("__sa") + F.size("__sb") - n_int)
            ).alias("jaccard"),
        )
    )
    out = out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out
    return attach_owned_caches(out, owned)


def _materialize(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Eagerly cut lineage: ``localCheckpoint`` (executor-local blocks —
    fast, but lost with an executor) by default; with ``checkpoint_dir``
    set, a RELIABLE ``checkpoint()`` to that path, which survives executor
    loss — the cluster setting for the iterative/multi-branch pipelines
    here. The dir is set once per SparkContext; passing a different dir
    later re-points it.
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)


def _confirmed_minhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    num_hashes: int,
    num_bands: int,
    shingle_k: int,
    checkpoint_dir: str | None,
) -> DataFrame:
    """LSH candidates → exact-Jaccard-confirmed pairs (id_a, id_b, jaccard).

    Plan (the VERDICT r4 item 3 shape): the SIGNATURE path consumes the
    raw zero-shuffle shingle-hash stream — no corpus-wide distinct (min()
    is duplicate-proof), so the first shuffle in the whole pipeline is the
    |docs| × num_hashes map-side-combined signature agg. The Jaccard
    branch is the only consumer that needs distinct shingle SETS, and only
    for docs that survived banding — so the set aggregation runs after a
    broadcast semi-join against the candidate ids: its shuffle is sized by
    near-duplicate volume, not corpus volume. Candidates are materialized
    eagerly (they feed 2-3 plan branches; ``checkpoint_dir`` switches that
    from executor-local to reliable storage for real clusters); the
    per-doc set table persists inside :func:`jaccard_pairs`.
    """
    raw = _raw_shingle_hash_stream(df, text_col, id_col, shingle_k)
    cands = _materialize(
        minhash_candidates(
            df, text_col, id_col, num_hashes, num_bands, shingle_k, _shingle_hashes=raw
        ),
        checkpoint_dir,
    )
    pair_docs = (
        cands.select(F.col("id_a").alias("doc"))
        .unionByName(cands.select(F.col("id_b").alias("doc")))
        .distinct()
    )
    # Semi-join the DOCUMENTS to the candidate set BEFORE re-shingling, not
    # the exploded hash stream after: normalize/split/hash then runs over
    # candidate docs only (duplicate volume), not the whole corpus — the
    # r6 profile showed the post-explode semi-join re-paying the full
    # corpus-wide shingle-hash CPU a second time. The candidate-id set is
    # sized by near-duplicate volume; when that outgrows broadcast range,
    # Catalyst falls back per the join-strategy hint rules (no forced
    # build: candidate volume scales with duplication, not a constant).
    cand_docs = df.join(
        pair_docs.withColumnRenamed("doc", id_col), on=id_col, how="left_semi"
    )
    # No separate distinct + materialize of the candidate-doc stream:
    # jaccard_pairs' collect_set aggregation dedups for free and persists
    # the per-doc set table itself (one exchange instead of distinct +
    # checkpoint + count-agg — r17).
    return jaccard_pairs(
        df,
        cands,
        text_col,
        id_col,
        shingle_k,
        threshold,
        _shingle_hashes=_raw_shingle_hash_stream(cand_docs, text_col, id_col, shingle_k),
        checkpoint_dir=checkpoint_dir,
    )


def confirmed_minhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_k: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Public form of the LSH-candidates → exact-Jaccard-confirmed pair
    graph (id_a, id_b, jaccard) — the edge set every composition consumes
    (cluster dedup, survivorship, leakage-safe splits)."""
    return _confirmed_minhash_pairs(
        df, text_col, id_col, threshold, num_hashes, num_bands, shingle_k, checkpoint_dir
    )


def near_dedup_minhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_k: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Full near-dedup: LSH candidates → Jaccard verify → drop the higher
    id of each confirmed pair (greedy single-link by min id).

    Returns the surviving rows of ``df``. The drop set is computed as
    "appears as id_b in a confirmed pair" — a left-anti join, no driver
    collect. See :func:`_confirmed_minhash_pairs` for the plan shape;
    pass ``checkpoint_dir`` (an HDFS/S3 path on a cluster) to make the
    intermediate materializations executor-loss-tolerant.
    """
    confirmed = _confirmed_minhash_pairs(
        df, text_col, id_col, threshold, num_hashes, num_bands, shingle_k, checkpoint_dir
    )
    drops = confirmed.select(F.col("id_b").alias(id_col)).distinct()
    # propagate cache ownership (ADVICE r17): the confirmed-pairs frame
    # carries jaccard_pairs' persisted per-doc set stem — without adoption
    # the blocks outlive the caller with no handle to release them
    return adopt_caches(df.join(drops, on=id_col, how="left_anti"), confirmed)


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 20,
    strict: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components of an undirected pair graph (id_a, id_b) →
    (node, component) with component = min node id in the component.

    Iterative min-label propagation: each round every node adopts the
    smallest label among itself and its neighbors; converges in
    O(graph diameter) rounds (duplicate clusters are near-cliques, so 2-3
    rounds in practice). Each round is two equi-joins + a groupBy — no
    driver-side graph state, checkpoint-friendly. This is the transitive
    version of near-dup clustering: A~B and B~C place A,B,C in one cluster
    even when A~C was never a candidate pair.
    """
    edges = (
        pairs.selectExpr("id_a AS src", "id_b AS dst")
        .unionByName(pairs.selectExpr("id_b AS src", "id_a AS dst"))
        .distinct()
    )
    edges = _materialize(edges, checkpoint_dir)
    # The INITIAL labels are a tiny derivation over the just-materialized
    # edges (one distinct) — a lazy persist lets round 1's materialization
    # compute them once for its two plan references instead of paying a
    # dedicated eager job up front (r18, guide §5); released after the
    # first round lands. Lineage is one distinct over checkpointed edges,
    # so the plan-truncation argument for an eager cut does not apply.
    labels0 = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    labels = labels0
    def _one_step(cur: DataFrame) -> DataFrame:
        # carry the change flag THROUGH the label update instead of
        # re-joining new vs old labels afterwards — the convergence
        # check becomes a filter over the materialized frame, saving one
        # join + exchange per round (r17, guide §2.4; labels only ever
        # decrease, so "changed" ≡ new < old)
        neighbor_min = (
            edges.join(cur, edges.dst == cur.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        return (
            cur.join(neighbor_min, cur.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("__new"),
                F.col("component").alias("__old"),
            )
            .select(
                "node",
                F.col("__new").alias("component"),
                (F.col("__new") < F.col("__old")).alias("__chg"),
            )
        )

    # TWO propagation steps per materialization round (r17, guide §5/§7.3:
    # the per-round driver cost — checkpoint job + convergence count +
    # py4j round trips — dominated the per-step join work at every scale
    # we measured). Convergence is judged on the LAST step's flag only,
    # which keeps the semantics EXACTLY those of the one-step loop:
    # min-label propagation is monotone (extra steps past the fixed point
    # are no-ops), and the loop raises iff graph diameter + 1 >
    # max_iterations, same boundary as before (the final partial round
    # runs a single step when max_iterations is odd). Labels and
    # components are unchanged by construction.
    it = 0
    try:
        while it < max_iterations:
            cur = labels
            step1: DataFrame | None = None
            steps = min(2, max_iterations - it)
            for i in range(steps):
                cur = _one_step(cur.drop("__chg") if "__chg" in cur.columns else cur)
                it += 1
                if i == 0 and steps > 1:
                    # step 2's plan references step 1's output TWICE
                    # (inside neighbor_min and as the update join's left
                    # side) — a lazy persist makes the round's
                    # materialization compute step 1 once instead of
                    # relying on ReusedExchange to dedup the copies
                    # (ADVICE r17); released right after the round
                    # materializes
                    cur = cur.persist()
                    step1 = cur
            # Truncate lineage every round: without this, iteration N
            # re-executes all N-1 previous rounds for every action
            # (exponential replay — the classic iterative-algorithm trap).
            # ``checkpoint_dir`` upgrades the cut to a reliable
            # checkpoint() that also tolerates executor loss.
            new_labels = _materialize(cur, checkpoint_dir)
            if step1 is not None:
                step1.unpersist(blocking=False)
            if labels0 is not None:
                labels0.unpersist(blocking=False)
                labels0 = None
            changed = new_labels.filter(F.col("__chg")).limit(1).count()
            labels = new_labels.drop("__chg")
            if changed == 0:
                break
        else:
            # Loop exhausted without a zero-change round: labels on long
            # chains (diameter > max_iterations) are still mid-propagation
            # — silently returning them would split one duplicate cluster
            # into several.
            if strict:
                raise RuntimeError(
                    f"connected_components did not converge in {max_iterations} "
                    "iterations; raise max_iterations (graph diameter exceeds it)"
                )
    finally:
        # exception / zero-iteration exits must not strand the lazy
        # init-labels persist (idempotent on the normal path)
        if labels0 is not None:
            labels0.unpersist(blocking=False)
    return labels


def near_dedup_clusters(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_k: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Transitive near-dedup: confirmed pairs → connected components →
    keep the minimum id of each component. Returns surviving rows.

    Stricter than :func:`near_dedup_minhash`'s greedy drop (which keeps
    every local minimum of the pair graph); this keeps exactly one doc per
    transitive duplicate cluster.
    """
    confirmed = _confirmed_minhash_pairs(
        df, text_col, id_col, threshold, num_hashes, num_bands, shingle_k, checkpoint_dir
    )
    comp = connected_components(
        confirmed.select("id_a", "id_b"), checkpoint_dir=checkpoint_dir
    )
    drops = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    # cache ownership travels with the result (ADVICE r17) — see
    # near_dedup_minhash
    return adopt_caches(df.join(drops, on=id_col, how="left_anti"), confirmed)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text_col: Column | str) -> Column:
    """64-bit SimHash of the token multiset (expression-only bit voting).

    For each bit position b: sum over tokens of +1/-1 by token-hash bit b;
    bit set iff the vote is positive. Implemented with
    transform + aggregate over the token array, then a bit-OR fold.

    NOTE: array lambdas run interpreted in Spark 4 — this form is for
    single-column convenience (small frames, tests); bulk scans use
    :func:`simhash_table`, whose explode + 64 partial-sum aggregates stay
    in whole-stage codegen (same policy as ``similarity.dot``).
    """
    toks = F.split(normalize_text(text_col), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def _voter(mask: int):
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask).cast("long")) != 0, 1
        ).otherwise(-1)

    bit_cols = []
    for b in range(64):
        # Signed-64 bit mask as a Python literal (bit 63 is the sign bit).
        mask = (1 << b) if b < 63 else -(1 << 63)
        votes = F.aggregate(hashes, F.lit(0), _voter(mask))
        bit_cols.append(
            F.when(votes > 0, F.lit(mask).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out.bitwiseOR(c)
    return out


def simhash_blocks(sim_col: Column, n_blocks: int = 4) -> list[Column]:
    """Split a 64-bit simhash into 16-bit blocks for pigeonhole bucketing:
    any pair within Hamming distance n_blocks-1 shares >=1 identical block."""
    width = 64 // n_blocks
    mask = (1 << width) - 1
    return [
        F.shiftrightunsigned(sim_col, i * width)
        .bitwiseAND(F.lit(mask).cast("long"))
        .alias(f"blk_{i}")
        for i in range(n_blocks)
    ]


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_table(
    df: DataFrame, text_col: str, id_col: str, portable: bool = False
) -> DataFrame:
    """(doc, sim) SimHash table via explode + 64 conditional-sum aggregates.

    Same semantics as :func:`simhash64` (multiset bit voting over token
    hashes) but fully codegen'd: one projection per token, one groupBy(doc)
    with 64 partial sums — map-side combine keeps shuffle at |docs| rows.

    ``portable=False`` (default): token hashes are xxhash64 — the fast
    JVM-native path. ``portable=True``: token bit b comes from bit
    ``b % 4`` of hex digit ``b // 4`` of sha256(token) — re-derivable on
    any engine with sha256 (same portability contract as
    ``sampling.weighted_sample(portable=True)``); the declared query
    l2_simhash_candidates runs this form against its DuckDB twin.
    """
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
    )
    masks = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]
    if portable:
        hashed = toks.select("doc", F.sha2(F.col("tok"), 256).alias("hx"))
        digits = hashed.select(
            "doc",
            *[
                F.conv(F.substring("hx", d + 1, 1), 16, 10).cast("int").alias(f"d{d}")
                for d in range(16)
            ],
        )
        votes = digits.groupBy("doc").agg(
            *[
                F.sum(
                    F.when(
                        F.shiftright(F.col(f"d{b // 4}"), b % 4).bitwiseAND(F.lit(1)) == 1, 1
                    ).otherwise(-1)
                ).alias(f"v{b}")
                for b in range(64)
            ]
        )
    else:
        hashed = toks.select("doc", F.xxhash64(F.col("tok")).alias("h"))
        votes = hashed.groupBy("doc").agg(
            *[
                F.sum(
                    F.when(F.col("h").bitwiseAND(F.lit(m).cast("long")) != 0, 1).otherwise(-1)
                ).alias(f"v{b}")
                for b, m in enumerate(masks)
            ]
        )
    sim = F.lit(0).cast("long")
    for b, m in enumerate(masks):
        sim = sim.bitwiseOR(
            F.when(F.col(f"v{b}") > 0, F.lit(m).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return votes.select("doc", sim.alias("sim"))


def simhash_candidates(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3, portable: bool = False
) -> DataFrame:
    """Near-dup pairs by SimHash: block-bucket join then exact Hamming
    filter. 4 blocks guarantee recall for distance <= 3 (pigeonhole)."""
    with_sim = simhash_table(df, text_col, id_col, portable=portable)
    blocks = with_sim.select(
        "doc", "sim", *simhash_blocks(F.col("sim"), 4)
    )
    exploded = blocks.select(
        "doc",
        "sim",
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("blk_id"), F.col(f"blk_{i}").alias("blk")) for i in range(4)])
        ).alias("b"),
    ).select("doc", "sim", F.col("b.blk_id").alias("blk_id"), F.col("b.blk").alias("blk"))
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk_id") == F.col("b.blk_id"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            hamming64(F.col("a.sim"), F.col("b.sim")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def bitstring_block_pairs(
    df: DataFrame,
    bits_col: str,
    id_col: str,
    n_bits: int,
    n_blocks: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs over ANY fixed-width '0'/'1' bitstring column —
    the generic form of :func:`simhash_candidates`'s block-bucket
    pigeonhole, usable on perceptual hashes that aren't 64-bit longs
    (image dHash strings, audio band fingerprints, any learned binary
    code).

    Split the string into ``n_blocks`` nearly-equal substrings; any pair
    within Hamming distance ``max_hamming`` < ``n_blocks`` differs in at
    most ``max_hamming`` blocks, so it MATCHES exactly on at least one —
    candidates only ever meet inside a (block_id, block_value) bucket,
    never all-pairs. Exact Hamming distance is then a per-position
    substring comparison (codegen'd expression sum), and the filter keeps
    pairs at ``<= max_hamming``. Recall is exact (pigeonhole theorem),
    precision is exact (explicit distance) — only the candidate set is
    approximate, and only toward extra work, never missed pairs.

    Output: (id_a, id_b, hamming) with id_a < id_b, distinct.

    At 100 TB: the shuffle key is (block_id, block_value) — bucket sizes
    are the data's near-dup cluster structure; the join is an equi-join
    and AQE's skew split handles a pathological bucket. Mirrors the
    banded-LSH scale story of :func:`minhash_candidates`.
    """
    if not 0 <= max_hamming < n_blocks:
        raise ValueError(
            f"pigeonhole recall needs max_hamming ({max_hamming}) < n_blocks ({n_blocks})"
        )
    if n_blocks > n_bits:
        raise ValueError(f"n_blocks ({n_blocks}) > n_bits ({n_bits})")
    base, rem = divmod(n_bits, n_blocks)
    starts, lens, pos = [], [], 1  # substring() is 1-indexed
    for i in range(n_blocks):
        ln = base + (1 if i < rem else 0)
        starts.append(pos)
        lens.append(ln)
        pos += ln
    cols = df.select(
        F.col(id_col).alias("doc"), F.col(bits_col).alias("bits")
    ).filter(F.length("bits") == n_bits)
    exploded = cols.select(
        "doc",
        "bits",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk_id"),
                        F.substring("bits", starts[i], lens[i]).alias("blk"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("b"),
    ).select("doc", "bits", F.col("b.blk_id").alias("blk_id"), F.col("b.blk").alias("blk"))
    a, b = exploded.alias("a"), exploded.alias("b")
    # distinct the candidate PAIRS before computing the distance: a pair
    # within hamming <= n_blocks-1 can match in up to n_blocks buckets,
    # and computing the n_bits-term expression once per matched bucket
    # row (then deduping) would do the hot work up to n_blocks times
    # (r9 review). bits ride the distinct — functionally dependent on
    # the ids, so the pair set is unchanged and no re-join is needed.
    cand = (
        a.join(
            b,
            (F.col("a.blk_id") == F.col("b.blk_id"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.bits").alias("__ba"),
            F.col("b.bits").alias("__bb"),
        )
        .distinct()
    )
    # Exact Hamming distance via 32-bit chunks: conv each chunk of the
    # bitstring to a long, XOR, bit_count, sum. Replaces the r9 per-bit
    # substring-compare chain — n_bits nested Adds over 2×n_bits
    # substring calls evaluated ~30 µs/row; the chunked form is ~10
    # expression nodes and measured 10× faster on 400k pairs (r17,
    # guide §1.2 per-task work). Same value bit-for-bit: '0'/'1' chunks
    # of ≤32 chars are exact in conv(…, 2, 10).
    ham = F.lit(0)
    pos = 1
    while pos <= n_bits:
        ln = min(32, n_bits - pos + 1)
        ca = F.conv(F.substring(F.col("__ba"), pos, ln), 2, 10).cast("long")
        cb = F.conv(F.substring(F.col("__bb"), pos, ln), 2, 10).cast("long")
        ham = ham + F.bit_count(ca.bitwiseXOR(cb))
        pos += ln
    return cand.select("id_a", "id_b", ham.cast("int").alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def near_dedup_keep_best(
    df: DataFrame,
    text_col: str,
    id_col: str,
    quality: Column,
    threshold: float = 0.8,
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_k: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Transitive near-dedup with a SURVIVORSHIP POLICY: per duplicate
    cluster, keep the member maximizing ``quality`` (ties broken by min
    id) instead of :func:`near_dedup_clusters`' min-id rule — the
    "keep the longest / highest-scoring representative" step every
    training-corpus dedup actually wants.

    Returns the per-cluster report for clusters of size >= 2:
    (component, kept_id, n_members, best_quality). Survivor selection for
    the full frame is then one left-anti join of (cluster members minus
    kept ids) against ``df`` — exposed by callers that need rows, kept
    separate so the report itself stays small (|clusters| rows).

    Plan: confirmed LSH pairs → iterative min-label connected components
    → one groupBy(component) count + one row_number window per component
    ordered by (quality desc, id asc). Window partitions are cluster-
    sized — bounded by the true duplicate structure, never the corpus.
    """
    confirmed = _confirmed_minhash_pairs(
        df, text_col, id_col, threshold, num_hashes, num_bands, shingle_k, checkpoint_dir
    )
    comp = connected_components(
        confirmed.select("id_a", "id_b"), checkpoint_dir=checkpoint_dir
    )
    members = comp.join(
        df.select(F.col(id_col).alias("node"), quality.alias("__q")), "node"
    )
    w = Window.partitionBy("component").orderBy(
        F.col("__q").desc(), F.col("node").asc()
    )
    out = (
        members.select(
            "component",
            "node",
            "__q",
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(Window.partitionBy("component")).alias("n_members"),
        )
        .filter(F.col("__rn") == 1)
        .select(
            "component",
            F.col("node").alias("kept_id"),
            "n_members",
            F.col("__q").alias("best_quality"),
        )
    )
    # cache ownership travels with the result (ADVICE r17)
    return adopt_caches(out, confirmed)


def ngram_novelty_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 3,
    use_hashes: bool = True,
) -> DataFrame:
    """Per-document corpus NOVELTY: the share of a doc's distinct
    k-gram shingles that FIRST appear in it (min id over the corpus
    ordering) — the curation dual of dedup (t34's operator, promoted
    from the query body so both key layouts share one implementation).

    ``use_hashes=True`` (the PRODUCTION shape) runs the whole pipeline on
    the 8-byte xxhash64 shingle stream (:func:`exploded_shingle_hashes`):
    the min-agg + equi-join shuffle fixed-width longs instead of k-word
    strings — at 100 TB that is the difference between shuffling ~8 bytes
    and ~50+ bytes per shingle occurrence. Scores are identical up to
    64-bit hash collisions (~2^-64 per shingle pair); equality against
    the string path is pinned at two scales in
    tests/test_dedup_similarity.py. ``use_hashes=False`` joins on the
    shingle STRINGS — the oracle-exact form the declared t34 query uses
    (DuckDB has no xxhash64 twin).

    Output: (doc_id, n_shingles, n_novel, novelty) — novelty rounded to
    6 dp for engine parity.
    """
    if use_hashes:
        sh = exploded_shingle_hashes(df, text_col, id_col, shingle_k)
        key = "h"
    else:
        sh = exploded_shingles(df, text_col, id_col, shingle_k)
        key = "shingle"
    first = sh.groupBy(key).agg(F.min("doc").alias("__first_doc"))
    return (
        sh.join(first, key)
        .groupBy(F.col("doc").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("__first_doc") == F.col("doc")).cast("int"))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles").cast("double"), 6).alias("novelty"),
        )
    )


def keep_best_survivors(
    df: DataFrame,
    text_col: str,
    id_col: str,
    quality: Column,
    threshold: float = 0.8,
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_k: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Full survivor frame under :func:`near_dedup_keep_best`'s policy:
    every row of ``df`` except cluster members that lost to a
    higher-quality keeper (VERDICT r9 — the caller-owned anti-join,
    promoted to an operator with its own declared oracle).

    Plan: the same confirmed-pairs → connected-components stem, then the
    LOSERS (rank > 1 within their cluster by quality desc, id asc) are a
    |duplicates|-sized frame anti-joined against ``df`` — the corpus is
    scanned once, the window runs over cluster-sized partitions only.
    """
    confirmed = _confirmed_minhash_pairs(
        df, text_col, id_col, threshold, num_hashes, num_bands, shingle_k, checkpoint_dir
    )
    comp = connected_components(
        confirmed.select("id_a", "id_b"), checkpoint_dir=checkpoint_dir
    )
    members = comp.join(
        df.select(F.col(id_col).alias("node"), quality.alias("__q")), "node"
    )
    w = Window.partitionBy("component").orderBy(
        F.col("__q").desc(), F.col("node").asc()
    )
    losers = (
        members.select("node", F.row_number().over(w).alias("__rn"))
        .filter(F.col("__rn") > 1)
        .select("node")
    )
    # cache ownership travels with the result (ADVICE r17)
    return adopt_caches(
        df.join(losers, df[id_col] == losers["node"], "left_anti"), confirmed
    )


# ---------------------------------------------------------------------------
# Incremental near-dedup: a persisted LSH index the daily ingest probes.
# Everything above dedups ONE batch against itself; real corpus ingestion
# is "is today's crawl a near-dup of anything we already hold?" — which
# must not re-shingle the historical corpus per batch. The index stores
# the banded (doc, band, bucket) table; a probe shingles ONLY the new
# batch and equi-joins the index.
# ---------------------------------------------------------------------------


def write_minhash_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    path: str,
    num_hashes: int = 24,
    num_bands: int = 6,
    shingle_k: int = 3,
    mode: str = "overwrite",
    generational: bool = True,
    txn: tuple[str, int] | None = None,
) -> None:
    """Persist the banded LSH bucket table as the near-dedup index.

    Layout: ``path/buckets`` = (doc, band, bucket) parquet; ``path/meta``
    = a 1-row parquet pinning (num_hashes, num_bands, shingle_k). Probes
    read their banding parameters FROM the meta — a probe banded
    differently from its index silently misses every duplicate, so the
    parameters travel with the data, never with the caller.
    ``mode="append"`` adds a new batch's buckets to an existing index
    (parameters must already match — validated against meta).

    ``generational=True`` — the DEFAULT since r13 (VERDICT r12 item 3:
    new indexes must be object-store-safe without the user knowing to
    ask) — builds the GENERATION-POINTER layout (r12,
    :mod:`sources/genlog`): the flat index above is staged as a complete
    generation under ``<path>/gen-*/`` and an atomic ``_gen_log``
    pointer commit makes it live; compact/erase/rebuild then commit new
    generations with pointer flips instead of directory renames, so the
    FULL maintenance lifecycle runs on any filesystem.
    ``generational=False`` opts into the legacy FLAT layout (rename-
    committed maintenance, driver-local only) — kept readable and
    maintainable forever; :func:`migrate_flat_index_to_generational`
    upgrades it in place. A root that is already generational stays
    generational regardless of the flag.

    OCC APPENDS (r13; closes the ADVICE r12 lost-append race): on a
    generational root ``mode="append"`` stages the batch's buckets as a
    self-contained DELTA segment (``gen-*`` with its own buckets + meta)
    and commits it with a pointer flip whose ``segments`` list = the
    head's segments plus the delta (:func:`genlog.append_segment`) — so
    a compact/erase/rebuild staged from the pre-append snapshot now
    COLLIDES on the version instead of silently dropping the appended
    rows, committed generations stay immutable (a concurrent maintenance
    read can never observe a half-written bucket file), and a lost
    pointer race is retried cheaply (the delta holds only new rows, so
    it stays valid whoever won — unless the winner re-banded the index,
    which fails the parameter check loudly). Probes read the union of
    segments; the next compact merges them back to one — the LSM shape.
    Flat roots keep the plain in-place parquet append.

    ``txn=(app_id, batch_id)`` makes a generational append EXACTLY-ONCE
    under streaming redelivery (:func:`genlog.append_segment`'s
    watermark ledger — a foreachBatch replay at or below its app's
    committed watermark is a no-op): the streaming ingest path passes
    Structured Streaming's batch id here. REJECTED loudly on flat roots
    (no commit record to carry a ledger — silently degrading to
    at-least-once is the failure mode the tag exists to prevent).

    At 100 TB: the index is |corpus| × num_bands fixed-width rows; the
    probe join shuffles on (band, bucket) 16-byte keys. Bucketing the
    parquet on ``bucket`` (``save_as_catalog_table`` + bucketBy) upgrades
    the probe to a shuffle-free sort-merge — layout choice, same contract.
    """
    from etl_hiscox_spark.sources import genlog

    spark = df.sparkSession
    if num_hashes % num_bands != 0:
        # same guard as minhash_candidates: trailing signature hashes
        # would be computed but never banded — a silent recall loss the
        # meta would then propagate to every probe
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by num_bands "
            f"({num_bands}) — trailing hashes would be computed but never banded"
        )
    gen_layout = genlog.is_generational(spark, path)
    if txn is not None and not (mode == "append" and gen_layout):
        # fail-loud convention: silently dropping the exactly-once
        # contract on a flat root (no commit record to carry the ledger)
        # would let a crash-replayed micro-batch land twice with no signal
        raise ValueError(
            "txn=(app_id, batch_id) requires mode='append' on a GENERATIONAL "
            f"index root (got mode={mode!r}, generational={gen_layout}) — the "
            "watermark ledger lives in the pointer records; migrate the flat "
            "index with migrate_flat_index_to_generational first"
        )
    if mode == "append" and gen_layout:
        root = genlog.resolve_root(spark, path)
        requested = (num_hashes, num_bands, shingle_k)

        def _validate_banding(rec: dict) -> None:
            seg0 = genlog._join(root, genlog.pointer_segments(rec)[0])
            meta = _read_index_meta(spark, seg0, resolved=True)
            if meta != requested:
                raise ValueError(
                    "minhash index parameter mismatch: index has "
                    f"{meta}, append asked for {requested}"
                )

        # validate against the CURRENT head before paying the staging
        # write, then again inside each commit attempt (a rebuild landing
        # mid-append changes the banding out from under the staged delta);
        # current_generation is loud on an empty log (interrupted build)
        head_version, _ = genlog.current_generation(spark, root)
        head_rec = genlog.read_pointer(root, head_version)
        if genlog.is_replay(head_rec, txn):
            return  # replayed micro-batch: skip BEFORE staging anything
        _validate_banding(head_rec)
        delta = genlog.new_generation_name()
        write_minhash_index(
            df, text_col, id_col, genlog._join(root, delta),
            num_hashes=num_hashes, num_bands=num_bands, shingle_k=shingle_k,
            generational=False,
        )
        genlog.append_segment(
            spark, root, delta, validate=_validate_banding, txn=txn
        )
        return
    if mode != "append" and (generational or gen_layout):
        root = genlog.resolve_root(spark, path)
        _reject_flat_index_debris(spark, root)
        # capture the base pointer BEFORE staging: the commit lands at
        # base+1 create-if-absent, so a build racing another commit on
        # this root collides loudly instead of silently superseding it
        base = genlog.latest_pointer_version(spark, root)
        gen = genlog.new_generation_name()
        # stage the complete flat index as a fresh generation (buckets
        # first, meta last — the staged tree is valid only once finished),
        # then the pointer commit makes it live atomically; a crash before
        # the commit leaves the previous generation (or nothing, for a
        # first build) live and the stage vacuum-reclaimable
        write_minhash_index(
            df, text_col, id_col, genlog._join(root, gen),
            num_hashes=num_hashes, num_bands=num_bands, shingle_k=shingle_k, generational=False,
        )
        genlog.commit_generation(
            spark, root, gen, "build", base_version=base,
            geometry_id=genlog.new_geometry_id(),
            # an overwrite-build onto an EXISTING head carries its
            # exactly-once ledger like every other commit (review: a
            # build that reset it would let a crash-replayed micro-batch
            # land twice right after an index refresh)
            txn_watermarks=(
                genlog.read_pointer(root, base).get("txn_watermarks")
                if base is not None
                else None
            ),
        )
        return
    if mode == "append":
        meta = _read_index_meta(spark, path)
        if meta != (num_hashes, num_bands, shingle_k):
            raise ValueError(
                "minhash index parameter mismatch: index has "
                f"{meta}, append asked for {(num_hashes, num_bands, shingle_k)}"
            )
    else:
        # Commit protocol (ADVICE r8): meta is the index's commit record.
        # Invalidate it BEFORE overwriting buckets and rewrite it only
        # AFTER the bucket write succeeds — a failure in between leaves an
        # index with buckets but no meta, and every probe then fails
        # loudly in _read_index_meta instead of banding against a STALE
        # meta and silently missing every duplicate (the drift the meta
        # exists to prevent). Append mode needs no invalidation: the
        # parameters were just validated equal, so a partial bucket append
        # can lose rows but can never band a probe differently.
        _invalidate_index_meta(spark, path)
    sig = minhash_signature_table(df, text_col, id_col, num_hashes, shingle_k)
    _banded_buckets(sig, num_hashes, num_bands).write.mode(mode).parquet(
        os.path.join(path, "buckets")
    )
    _write_index_meta(spark, path, num_hashes, num_bands, shingle_k)


_FLAT_INDEX_MARKERS = ("buckets", "meta", "_centroids")


def _reject_flat_index_debris(spark, root: str) -> None:
    """A generational build over a root that already holds a FLAT index
    would leave the stale flat tree (buckets/meta or __cluster=/_centroids)
    as unreclaimable debris forever — every read resolves the live
    generation, and vacuum_generations only touches ``gen-*`` dirs, so a
    GDPR erase would leave subject rows on disk in the dead copy (r12
    review). BOTH layouts' markers are checked from either build path —
    an IVF build over flat minhash debris strands fingerprints just the
    same (second review). Reject loudly; folding the flat tree in
    requires a rename, so the explicit local-only migration is
    :func:`migrate_flat_index_to_generational`."""
    from pyarrow import fs as pafs

    from etl_hiscox_spark.sources.listing import _resolve_fs

    try:
        filesystem, p = _resolve_fs(root)
    except (ValueError, KeyError):
        # a scheme pyarrow cannot RESOLVE — is_generational answered the
        # same way; the staging write decides reachability loudly itself
        return
    # IO errors (throttling, timeouts) propagate: skipping the guard on a
    # transient listing failure would strand the debris it exists to catch
    infos = filesystem.get_file_info(
        pafs.FileSelector(p, recursive=False, allow_not_found=True)
    )
    debris = sorted(
        i.base_name
        for i in infos
        if i.base_name in _FLAT_INDEX_MARKERS or i.base_name.startswith("__cluster=")
    )
    if debris:
        raise ValueError(
            f"generational build over {root!r} would strand a flat index "
            f"already there ({', '.join(debris)}) as unreclaimable debris — "
            "build at a fresh root, or migrate the flat index explicitly "
            "with migrate_flat_index_to_generational(spark, root)."
        )


def migrate_flat_index_to_generational(spark, path: str) -> str:
    """One-time in-place upgrade of a FLAT index root (either layout) to
    the generation-pointer layout: the flat tree's entries move into a
    fresh ``gen-*`` directory (os.rename — driver-local only, like every
    flat-layout maintenance op; remote flat indexes don't exist because
    flat maintenance already refuses remote paths) and a v0 pointer
    commits it. Every subsequent probe resolves the pointer and every
    maintenance op commits by pointer flip. Returns the generation name.

    RE-RUNNABLE across every crash window (second review + ADVICE r12):
    a crash mid-rename or before the pointer commit leaves a root with
    one ``gen-*`` dir and no ``_gen_log`` — re-running adopts that dir,
    moves any remaining flat entries in, validates the COMPLETED
    generation, and commits. A crash INSIDE the pointer commit (after
    the ``_gen_log`` dir was created, before the v0 record linked) makes
    ``is_generational`` True with an EMPTY log — that root is also an
    adoptable crashed migration (its entry moves finished before the
    commit step), not an "already generational" rejection; only a log
    with a committed pointer is. The pointer commit is last, so the root
    only serves probes once the generation is whole."""
    from etl_hiscox_spark.sources import genlog

    local = _require_local_index_path(spark, path, "migrate_flat_index_to_generational")
    root = genlog.resolve_root(spark, path)
    if (
        genlog.is_generational(spark, root)
        and genlog.latest_pointer_version(spark, root) is not None
    ):
        raise ValueError(f"{path!r} is already generational")
    gens = sorted(e for e in os.listdir(local) if e.startswith("gen-"))
    if len(gens) > 1:
        raise ValueError(
            f"{path!r} has {len(gens)} gen-* dirs but no pointer log — not "
            "a crashed migration this can adopt; inspect by hand"
        )
    if gens:
        gen = gens[0]  # crashed migration: adopt and complete it
    else:
        _validate_live_index(spark, path)  # only a committed flat index migrates
        gen = genlog.new_generation_name()
    gen_dir = os.path.join(local, gen)
    os.makedirs(gen_dir, exist_ok=True)
    for entry in os.listdir(local):
        # an empty _gen_log from a crashed pointer commit stays at the
        # root — it IS the log the adoption is about to commit into
        if entry != gen and entry != "_gen_log":
            os.rename(os.path.join(local, entry), os.path.join(gen_dir, entry))
    # validate the COMPLETED generation (not the now-empty root) before
    # the pointer makes it live
    _validate_live_index(spark, path.rstrip("/") + "/" + gen)
    genlog.commit_generation(
        spark, root, gen, "migrate", base_version=None,
        geometry_id=genlog.new_geometry_id(),
    )
    from etl_hiscox_spark.sources.writers import refresh_swapped_path

    refresh_swapped_path(spark, path)
    return gen


def _require_local_index_path(spark, path: str, op: str) -> str:
    """Maintenance ops (compact/erase/rebuild) swap files with
    os.rename/shutil — driver-local filesystems only. An index on s3a://
    or a non-file defaultFS would fail with an opaque OSError AFTER the
    Spark tmp write already ran, leaking the tmp dir (ADVICE r10); fail
    loudly up front instead, and hand back the ``file://``-stripped local
    path for the os-level steps (Spark-facing calls keep the original)."""
    if not _meta_is_local(spark, path):
        raise ValueError(
            f"{op}: driver-local index paths only — the FLAT index layout "
            f"commits maintenance with os.rename, which cannot reach "
            f"{path!r}. On a cluster filesystem build the index with "
            "generational=True (sources/genlog): its maintenance commits "
            "by atomic pointer flip and runs anywhere."
        )
    from etl_hiscox_spark.sources.writers import _local_fs_path

    return _local_fs_path(path)


def begin_staged_rebuild(spark, path: str, op: str) -> str:
    """First half of the staged-rebuild commit protocol shared by
    :func:`rebuild_minhash_index` and ``similarity.rebuild_ivf_index``
    (ONE implementation — the repo's swap_and_refresh rule: hand-rolled
    copies of a multi-step swap drift apart on exactly the step a crash
    needs). Validates there are no ``__rebuild``/``__old`` leftovers from
    an interrupted run and returns the STAGING uri (``<path>__rebuild``)
    for the caller to write the complete new index into; commit with
    :func:`commit_staged_rebuild`."""
    local = _require_local_index_path(spark, path, op)
    for leftover in (local.rstrip("/") + "__rebuild", local.rstrip("/") + "__old"):
        if os.path.exists(leftover):
            raise ValueError(
                f"{op}: leftover {leftover!r} from an interrupted rebuild "
                "— run recover_staged_rebuild(spark, path) first (it "
                "completes or rolls back the interrupted swap and "
                "validates the live index)."
            )
    return path.rstrip("/") + "__rebuild"


def commit_staged_rebuild(spark, path: str, op: str) -> None:
    """Second half: two atomic renames (live → ``__old``, staged → live),
    remove ``__old`` last, refresh Spark's path caches. Every crash
    window leaves either the untouched live index or two complete
    indexes with the live name absent — never a half-valid index under
    the live name."""
    import shutil

    local = _require_local_index_path(spark, path, op)
    lold = local.rstrip("/") + "__old"
    os.rename(local, lold)
    os.rename(local.rstrip("/") + "__rebuild", local)
    shutil.rmtree(lold)
    from etl_hiscox_spark.sources.writers import refresh_swapped_path

    refresh_swapped_path(spark, path)


def _validate_live_index(spark, path: str) -> str:
    """Loud validity check of the index at ``path``, layout-detected:
    ``_centroids`` → IVF (centroid commit record must load), ``meta`` →
    minhash (banding meta must load). Returns the layout name."""
    local = _require_local_index_path(spark, path, "_validate_live_index")
    if os.path.isdir(os.path.join(local, "_centroids")):
        from etl_hiscox_spark.operators.similarity import load_ivf_centroids

        load_ivf_centroids(spark, path)
        return "ivf"
    if os.path.isdir(os.path.join(local, "meta")):
        _read_index_meta(spark, path)
        return "minhash"
    raise ValueError(
        f"{path!r} is not a committed index: neither an IVF _centroids "
        "record nor a minhash meta is present"
    )


def recover_staged_rebuild(spark, path: str) -> str:
    """Complete or roll back an INTERRUPTED staged rebuild (VERDICT r11
    item 4 — the recovery that was previously a docstring instruction to
    a human). Inspects the ``<path>`` / ``<path>__rebuild`` /
    ``<path>__old`` triple, applies the one action each crash window
    admits, validates the resulting live index (layout-detected: IVF
    centroids or minhash meta must load), refreshes Spark's path caches,
    and returns the action taken:

    - live only → ``"none"`` (nothing was interrupted).
    - live + ``__rebuild`` → crash during/after staging, before the
      commit's first rename: the live index was never touched, so ROLL
      BACK — remove the stage (``"rolled_back_stage"``). The staged tree
      may be incomplete (its commit record is written last), so
      completing from it would be guessing; re-run the rebuild instead.
    - ``__old`` + ``__rebuild``, live absent → crash between the two
      renames: the stage is COMPLETE by protocol (staging finished
      before the first rename ran), so COMPLETE the swap — rename the
      stage to live, drop ``__old`` (``"completed_swap"``).
    - live + ``__old`` → crash after the second rename, before ``__old``
      cleanup: the swap landed; drop ``__old`` (``"removed_old"``).
    - ``__old`` only, live absent → the stage vanished outside the
      protocol; restore the pre-rebuild index — rename ``__old`` back to
      live (``"restored_old"``).
    - anything else (no index at all; live + BOTH leftovers) is
      unreachable under the protocol → raise, touch nothing.

    Idempotent: every terminal state maps to ``"none"`` on a re-run, so
    crash-during-recovery is recovered by recovering again.
    """
    import shutil

    local = _require_local_index_path(spark, path, "recover_staged_rebuild")
    live, stage, old = (
        local.rstrip("/"),
        local.rstrip("/") + "__rebuild",
        local.rstrip("/") + "__old",
    )
    has = {p: os.path.exists(p) for p in (live, stage, old)}
    if has[live] and has[stage] and has[old]:
        raise ValueError(
            f"recover_staged_rebuild: {path!r} has live, __rebuild AND "
            "__old — unreachable under the staged-rebuild protocol; "
            "refusing to guess (inspect by hand)"
        )
    if has[live] and not has[stage] and not has[old]:
        action = "none"
    elif has[live] and has[stage]:
        shutil.rmtree(stage)
        action = "rolled_back_stage"
    elif has[live] and has[old]:
        shutil.rmtree(old)
        action = "removed_old"
    elif has[stage] and has[old]:
        os.rename(stage, live)
        shutil.rmtree(old)
        action = "completed_swap"
    elif has[old]:
        os.rename(old, live)
        action = "restored_old"
    elif has[stage]:
        # stage only, no live, no __old: begin_staged_rebuild requires a
        # live index and the commit moves it to __old before anything
        # else — this state cannot arise from the protocol
        raise ValueError(
            f"recover_staged_rebuild: {path!r} has ONLY a __rebuild stage "
            "— unreachable under the staged-rebuild protocol (the live "
            "index moves to __old before the stage is promoted); refusing "
            "to promote an unverifiable stage"
        )
    else:
        raise ValueError(
            f"recover_staged_rebuild: nothing to recover at {path!r} — no "
            "live index, no __rebuild, no __old (was the index ever built?)"
        )
    _validate_live_index(spark, path)
    from etl_hiscox_spark.sources.writers import refresh_swapped_path

    refresh_swapped_path(spark, path)
    return action


def _rename_meta_aside(spark, path: str, aside_name: str) -> None:
    """Recoverable invalidation for MAINTENANCE ops whose meta is
    unchanged: rename ``<path>/meta`` to ``<path>/<aside_name>`` instead
    of deleting it (ADVICE r10 — a crash between a delete-style
    invalidation and the final meta rewrite would permanently lose the
    banding parameters even though the bucket data is intact). Mirrors
    the IVF erase ``_centroids__erase`` protocol: after a crash the
    parameters are still on disk under the aside name, and a successful
    op restores the exact original bytes. Overwrite-style builds (whose
    meta legitimately changes) keep delete-style invalidation."""
    local = _require_local_index_path(spark, path, "_rename_meta_aside")
    aside = os.path.join(local, aside_name)
    if os.path.exists(aside):
        raise ValueError(
            f"minhash index at {path!r} has a leftover {aside_name!r} from "
            "an interrupted maintenance run — recover first (rename it "
            "back to 'meta' if the bucket table is intact, or rebuild)."
        )
    os.rename(os.path.join(local, "meta"), aside)


def _restore_meta_from_aside(spark, path: str, aside_name: str) -> None:
    local = _require_local_index_path(spark, path, "_restore_meta_from_aside")
    os.rename(os.path.join(local, aside_name), os.path.join(local, "meta"))


def compact_minhash_index(spark, path: str, target_file_mb: int = 256) -> int:
    """Rewrite a minhash index's bucket table into ~target-sized files.

    ``write_minhash_index(mode="append")`` adds one file set per batch —
    at daily-ingest cadence the bucket table fragments into thousands of
    small files and every probe's (band, bucket) join pays an open/LIST
    tax (VERDICT r9). Compaction rewrites ``<path>/buckets`` range-
    partitioned AND sorted on (band, bucket) — beyond defragmenting, the
    layout now clusters each probe key into one file-contiguous run.

    Bucket CONTENT is untouched, so probe results are equal by
    construction (pinned by test and by the l2_lsh_compact_probe oracle).
    The rewrite runs under the index's own commit protocol: meta is
    renamed ASIDE first (``meta__compact`` — recoverable, never deleted:
    the parameters are unchanged by compaction, so a crash must not lose
    the only copy; ADVICE r10) and renamed back only after the bucket
    rewrite lands — an interrupted compaction leaves a meta-less index
    every probe rejects loudly, never a half-rewritten bucket table read
    silently. Returns the post-compaction bucket file count.
    """
    from etl_hiscox_spark.sources import genlog
    from etl_hiscox_spark.sources.writers import (
        compact_parquet_to_dir,
        compact_small_files,
    )

    if genlog.is_generational(spark, path):
        # object-store form (r12): the compacted bucket table is staged
        # as a COMPLETE new generation (buckets first, meta last) and a
        # pointer flip commits it — no rename touches any data dir, so
        # this runs on any filesystem; the pre-compaction generation
        # stays live through every crash window and readable until
        # genlog.vacuum_generations
        base, _live_gen = genlog.current_generation(spark, path)
        rec = genlog.read_pointer(genlog.resolve_root(spark, path), base)
        segs = [genlog._join(path, s) for s in genlog.pointer_segments(rec)]
        params = _read_index_meta(spark, segs[0], resolved=True)
        gen = genlog.new_generation_name()
        target = genlog._join(path, gen)
        # multi-segment heads (OCC append deltas, r13) merge back to ONE
        # segment here — compaction doubles as the LSM segment merge
        n = compact_parquet_to_dir(
            spark,
            [os.path.join(s, "buckets") for s in segs],
            genlog._join(target, "buckets"),
            target_file_mb,
            sort_by=("band", "bucket"),
        )
        _write_index_meta(spark, target, *params)
        # base captured at resolve time: a concurrent commit since then
        # (e.g. an erase) collides loudly instead of being undone
        genlog.commit_generation(
            spark, path, gen, "compact", base_version=base,
            geometry_id=rec.get("geometry_id"),
            txn_watermarks=rec.get("txn_watermarks"),
        )
        return n
    _require_local_index_path(spark, path, "compact_minhash_index")
    _read_index_meta(spark, path)  # loud on an uncommitted index
    _rename_meta_aside(spark, path, "meta__compact")
    n = compact_small_files(
        spark, os.path.join(path, "buckets"), target_file_mb, sort_by=("band", "bucket")
    )
    _restore_meta_from_aside(spark, path, "meta__compact")
    return n


def erase_from_minhash_index(spark, path: str, keys: DataFrame, id_col: str) -> int:
    """Right-to-be-forgotten erasure INSIDE the minhash index: drop every
    bucket row whose ``doc`` appears in ``keys``; returns the number of
    bucket rows erased (num_bands rows per erased doc).

    The index retains a banded fingerprint of every ingested document —
    GDPR reaches it exactly like the primary table
    (``sources/writers.erase_keys``), and an erased doc must stop
    surfacing as ``dup_of`` in every future probe. The rewrite runs
    under the index's commit protocol (meta renamed aside to
    ``meta__erase`` first — recoverable, the parameters are unchanged by
    erasure; ADVICE r10 — and renamed back after the bucket swap) so an
    interrupted erasure leaves a loudly-rejected index with its
    parameters still on disk, never a half-erased one read
    silently. Whole-bucket-table rewrite (tmp + swap) — the honest
    fallback at this layout; at 100 TB partition the bucket table by
    ``band`` (or bucket prefix) so erasure rewrites only affected
    partitions, the same upgrade path erase_keys documents.
    """
    from etl_hiscox_spark.sources import genlog

    if genlog.is_generational(spark, path):
        # object-store form (r12): kept rows are staged as a complete new
        # generation (buckets, then the unchanged meta as the commit
        # record) and a pointer flip makes them live — no data-dir rename
        base, _live_gen = genlog.current_generation(spark, path)
        root = genlog.resolve_root(spark, path)
        rec = genlog.read_pointer(root, base)
        seg_names = genlog.pointer_segments(rec)
        params = _read_index_meta(
            spark, genlog._join(root, seg_names[0]), resolved=True
        )
        # SELECTIVE segment rewrite (r13, the LSM payoff): an erased doc
        # must vanish from the build segment AND every delta, but a
        # segment with NO hits is kept in the new pointer BY REFERENCE —
        # erase IO is proportional to the segments actually touched, not
        # the index (an erase of recent subjects rewrites only the recent
        # deltas). All rewrites stage first; ONE pointer commit publishes.
        k = F.broadcast(keys.select(F.col(id_col).alias("doc")).distinct())
        # ONE stats action across every segment instead of a sequential
        # semi-join count per segment (r17, guide §2.6/§5: per-action
        # latency dominated multi-segment heads; committed generations
        # are immutable, so stats and rewrites read consistent bytes)
        from etl_hiscox_spark.operators.similarity import _segment_hit_stats

        # resolve the bucket schema ONCE — a pyarrow footer read when the
        # store is local, else one Spark inference on the first segment —
        # and reuse it for every segment (r18, guide §6): every segment is
        # written by _banded_buckets with identical layout (appends
        # validate banding against the geometry segment), and per-call
        # footer inference profiled ~80-230 ms per spark.read.parquet; a
        # mismatched segment still fails loudly at scan time, never
        # silently casts
        from etl_hiscox_spark.fastschema import fast_parquet_schema

        seg_dfs: list[DataFrame] = []
        seg_schema = fast_parquet_schema(
            os.path.join(genlog._join(root, seg_names[0]), "buckets")
        )
        for name in seg_names:
            reader = (
                spark.read.schema(seg_schema) if seg_schema is not None else spark.read
            )
            seg = reader.parquet(os.path.join(genlog._join(root, name), "buckets"))
            seg_schema = seg_schema or seg.schema
            seg_dfs.append(seg)
        if len(seg_dfs) == 1:
            # FUSED stats+rewrite for the single-segment head (the common
            # shape after a compact — r18, guide §5): the anti-join
            # rewrite job itself reports total/kept via observe(), so the
            # erase pays ONE action instead of stats-then-rewrite (the
            # repair lifecycle profiled 3 erases × ~0.4 s stats + ~0.3 s
            # rewrite back to back). A no-hit erase abandons the staged
            # bucket dir (meta never written — exactly the
            # crash-before-meta state every probe already rejects and
            # vacuum reclaims) and returns 0 with no commit, matching the
            # stats-first path's contract.
            from pyspark.sql import Observation

            o_tot, o_kept = Observation(), Observation()
            gen = genlog.new_generation_name()
            target = genlog._join(root, gen)
            kept = (
                seg_dfs[0]
                .observe(o_tot, F.count(F.lit(1)).alias("n"))
                .join(k, "doc", "left_anti")
                .observe(o_kept, F.count(F.lit(1)).alias("n"))
            )
            kept.write.mode("error").parquet(genlog._join(target, "buckets"))
            n_erased = (o_tot.get["n"] or 0) - (o_kept.get["n"] or 0)
            if n_erased == 0:
                try:  # tidy the no-hit stage now; vacuum reclaims on failure
                    fs_, p_ = genlog._fs(target)
                    fs_.delete_dir(p_)
                except (FileNotFoundError, OSError):
                    pass
                return 0
            _write_index_meta(spark, target, *params)
            genlog.commit_generation(
                spark, path, gen, "erase", base_version=base,
                segments=[gen],
                geometry_id=rec.get("geometry_id"),
                txn_watermarks=rec.get("txn_watermarks"),
            )
            return n_erased
        stats = _segment_hit_stats(seg_dfs, k, "doc")
        n_erased = sum(h for _t, h in stats)
        if n_erased == 0:
            return 0
        new_segments: list[str] = []
        first_rewritten: str | None = None
        rewrites: list[tuple[str, DataFrame]] = []
        for name, buckets, (_total, hits) in zip(seg_names, seg_dfs, stats):
            if hits == 0:
                new_segments.append(name)
                continue
            # a fully-erased rewrite stays READABLE (Spark writes the
            # schema file for an empty non-partitioned frame), so the
            # segment keeps its slot — dropping it could demote a delta
            # into the geometry position
            gen = genlog.new_generation_name()
            rewrites.append((gen, buckets.join(k, "doc", "left_anti")))
            new_segments.append(gen)
            first_rewritten = first_rewritten or gen
        # hit segments rewrite to DISJOINT staged trees — independent
        # writes, overlapped (guide §2.6); ONE pointer commit publishes
        from etl_hiscox_spark.concurrency import run_overlapped

        def _rewrite(gen: str, kept: DataFrame) -> None:
            target = genlog._join(root, gen)
            kept.write.mode("error").parquet(genlog._join(target, "buckets"))
            _write_index_meta(spark, target, *params)

        run_overlapped([lambda g=g, kd=kd: _rewrite(g, kd) for g, kd in rewrites])
        genlog.commit_generation(
            spark, path, first_rewritten, "erase", base_version=base,
            segments=new_segments,
            geometry_id=rec.get("geometry_id"),
            txn_watermarks=rec.get("txn_watermarks"),
        )
        return n_erased
    _require_local_index_path(spark, path, "erase_from_minhash_index")
    _read_index_meta(spark, path)  # loud on an uncommitted index
    buckets_path = os.path.join(path, "buckets")
    buckets = spark.read.parquet(buckets_path)
    k = F.broadcast(keys.select(F.col(id_col).alias("doc")).distinct())
    n_erased = buckets.join(k, "doc", "left_semi").count()
    if n_erased == 0:
        return 0
    kept = buckets.join(k, "doc", "left_anti")
    tmp = buckets_path.rstrip("/") + "__erase"
    kept.write.mode("overwrite").parquet(tmp)
    # invalidate only once the replacement bucket table is fully staged —
    # the uncommitted window is just the swap + rename-back
    _rename_meta_aside(spark, path, "meta__erase")
    from etl_hiscox_spark.sources.writers import swap_and_refresh

    swap_and_refresh(spark, tmp, buckets_path)
    _restore_meta_from_aside(spark, path, "meta__erase")
    return n_erased


def minhash_fragmentation_stats(spark, path: str) -> DataFrame:
    """Observability twin of :func:`compact_minhash_index` — file count
    and bytes of the index's bucket table, so the compaction trigger is a
    queryable fact instead of an operator's guess (the IVF side got this
    in r10 via ``similarity.ivf_fragmentation_stats``; VERDICT r10 item 2
    closes the asymmetry). Trigger rule, same as the compactor documents:
    compact when ``n_files`` ≫ ``ceil(total_bytes / target_file_mb)`` —
    every probe's (band, bucket) join pays an open/LIST tax per bucket
    file until then.

    One row: (n_files, total_bytes, avg_file_bytes). The walk runs on an
    executor (``sources/listing.distributed_dir_stats``); the driver
    holds only the directory handles — same scale shape as the IVF twin.
    Multi-segment heads (OCC append deltas, r13) aggregate across every
    live segment's bucket table: segment count is itself fragmentation,
    and this stat is the compaction trigger that merges it away.
    """
    from etl_hiscox_spark.sources.genlog import live_index_paths
    from etl_hiscox_spark.sources.listing import distributed_dir_stats

    paths = live_index_paths(spark, path)
    _read_index_meta(spark, paths[0], resolved=True)  # loud on an uncommitted index
    stats = distributed_dir_stats(
        spark, [(i, os.path.join(p, "buckets")) for i, p in enumerate(paths)]
    )
    return stats.agg(
        F.sum("n_files").alias("n_files"),
        F.sum("total_bytes").alias("total_bytes"),
    ).select(
        "n_files",
        "total_bytes",
        (F.col("total_bytes").cast("double") / F.col("n_files")).alias(
            "avg_file_bytes"
        ),
    )


def rebuild_minhash_index(
    spark,
    df: DataFrame,
    text_col: str,
    id_col: str,
    path: str,
    num_hashes: int | None = None,
    num_bands: int | None = None,
    shingle_k: int | None = None,
) -> tuple[int, int, int]:
    """Re-band a LIVE minhash index under new parameters — the parameter
    migration the meta-pinning design otherwise forbids (r11; the IVF
    side's geometry repair is :func:`similarity.rebuild_ivf_index`, same
    protocol family). ``write_minhash_index`` pins (num_hashes,
    num_bands, shingle_k) at build time and every probe/append validates
    against them FOREVER — correct by design, but when recall
    requirements change (more bands → higher recall, fewer → cheaper
    probes) the lifecycle previously had no migration path that kept the
    commit protocol: hand-composing a fresh build at a new path leaves a
    window with two divergent indexes and re-points every probe.

    Unlike the IVF index (which stores its vectors and can self-rebuild),
    the bucket table stores only banded fingerprints — re-shingling needs
    the source corpus, so the caller supplies ``df``; the rebuilt index
    indexes EXACTLY those rows. That also makes this the
    fingerprint-refresh op: pass the current base table (post-erasures)
    and the index drops any stragglers in the same swap. ``None``
    parameters keep the live meta's values.

    Commit protocol (rename-aside, mirroring ``rebuild_ivf_index``): the
    COMPLETE new index is staged at ``<path>__rebuild`` (buckets first,
    meta LAST — the staged tree is a valid index only once finished),
    then two atomic renames: live → ``<path>__old``, staged → live;
    ``__old`` is removed last. Every crash window leaves either the
    untouched live index or two complete indexes with the live name
    absent (probes fail loudly on the missing path;
    :func:`recover_staged_rebuild` completes or rolls back the swap).
    Driver-local paths only, like the other maintenance ops. Returns the
    new (num_hashes, num_bands, shingle_k).
    """
    from etl_hiscox_spark.sources import genlog

    if genlog.is_generational(spark, path):
        # object-store form (r12): the re-banded index stages as a fresh
        # generation and the pointer flip IS the two-rename swap — one
        # atomic commit instead of two renames, same crash guarantees
        base, _live_gen = genlog.current_generation(spark, path)
        rec = genlog.read_pointer(genlog.resolve_root(spark, path), base)
        cur_hashes, cur_bands, cur_k = _read_index_meta(
            spark,
            genlog._join(path, genlog.pointer_segments(rec)[0]),
            resolved=True,
        )
        new = (
            int(num_hashes) if num_hashes is not None else cur_hashes,
            int(num_bands) if num_bands is not None else cur_bands,
            int(shingle_k) if shingle_k is not None else cur_k,
        )
        root = genlog.resolve_root(spark, path)
        gen = genlog.new_generation_name()
        write_minhash_index(
            df, text_col, id_col, genlog._join(root, gen),
            num_hashes=new[0], num_bands=new[1], shingle_k=new[2], generational=False,
        )
        genlog.commit_generation(
            spark, root, gen, "rebuild", base_version=base,
            geometry_id=genlog.new_geometry_id(),
            txn_watermarks=rec.get("txn_watermarks"),
        )
        return new
    tmp = begin_staged_rebuild(spark, path, "rebuild_minhash_index")
    cur_hashes, cur_bands, cur_k = _read_index_meta(spark, path)  # loud on uncommitted
    new = (
        int(num_hashes) if num_hashes is not None else cur_hashes,
        int(num_bands) if num_bands is not None else cur_bands,
        int(shingle_k) if shingle_k is not None else cur_k,
    )
    # write_minhash_index stages the complete new index (divisibility
    # guard included; buckets first, meta last) — on a FRESH tmp path its
    # meta invalidation is a no-op, so the staging inherits the build
    # path's own commit ordering
    write_minhash_index(
        df, text_col, id_col, tmp,
        num_hashes=new[0], num_bands=new[1], shingle_k=new[2], generational=False,
    )
    commit_staged_rebuild(spark, path, "rebuild_minhash_index")
    return new


def _meta_is_local(spark, path: str) -> bool:
    """True only when the path resolves to the DRIVER's local filesystem.

    An explicit remote scheme (hdfs://, s3a://, ...) is never local; a
    scheme-less path is local only if Spark's fs.defaultFS is file: —
    on a cluster with defaultFS=hdfs://, '/warehouse/idx' goes to HDFS
    via Spark while a naive driver-side shortcut would write the meta to
    the driver's local disk, splitting the index (and a STALE local meta
    could then band a probe differently from its index — the exact drift
    the meta exists to prevent).

    Any ``file:`` prefix counts as local (ADVICE r11): Hadoop's
    ``Path.toString()`` renders local URIs as single-slash ``file:/x``,
    which has no ``://`` — without this the fragmentation walk would
    mis-qualify the dir with a non-file defaultFS."""
    if path.startswith("file:"):
        return True
    if "://" in path:
        return False
    default_fs = (
        spark.sparkContext._jsc.hadoopConfiguration().get("fs.defaultFS", "file:///")
    )
    return default_fs.startswith("file:")


def _write_index_meta(spark, path: str, num_hashes: int, num_bands: int, shingle_k: int) -> None:
    """1-row parquet meta. Local paths write via pyarrow on the driver —
    running a 2-task Spark job to persist three ints measurably taxed the
    probe path (~0.5 s/round trip at bench scale); the contract (parquet
    at <path>/meta) is identical either way."""
    meta_path = os.path.join(path, "meta")
    if _meta_is_local(spark, path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from etl_hiscox_spark.sources.writers import _local_fs_path

        local = _local_fs_path(meta_path)
        os.makedirs(local, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "num_hashes": pa.array([num_hashes], pa.int32()),
                    "num_bands": pa.array([num_bands], pa.int32()),
                    "shingle_k": pa.array([shingle_k], pa.int32()),
                }
            ),
            os.path.join(local, "meta.parquet"),
        )
        return
    from etl_hiscox_spark.smalldf import local_rows_df

    local_rows_df(
        spark,
        [(num_hashes, num_bands, shingle_k)],
        "num_hashes int, num_bands int, shingle_k int",
    ).write.mode("overwrite").parquet(meta_path)


def _invalidate_index_meta(spark, path: str) -> None:
    """Remove the index meta — the 'uncommitted' state of the overwrite
    protocol in :func:`write_minhash_index`. Local paths via shutil;
    remote via the Hadoop FileSystem API (recursive delete)."""
    meta_path = os.path.join(path, "meta")
    if _meta_is_local(spark, path):
        import shutil

        from etl_hiscox_spark.sources.writers import _local_fs_path

        shutil.rmtree(_local_fs_path(meta_path), ignore_errors=True)
        return
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(meta_path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        fs.delete(jpath, True)


def _read_index_meta(spark, path: str, resolved: bool = False) -> tuple[int, int, int]:
    if not resolved:  # callers that already resolved skip the re-stat (r12)
        from etl_hiscox_spark.sources.genlog import live_index_paths

        # the GEOMETRY segment (segments[0]) carries the authoritative
        # banding; append deltas were validated equal at commit time (r13)
        path = live_index_paths(spark, path)[0]
    meta_path = os.path.join(path, "meta")
    try:
        if _meta_is_local(spark, path):
            import pyarrow.parquet as pq

            from etl_hiscox_spark.sources.writers import _local_fs_path

            row = pq.read_table(
                os.path.join(_local_fs_path(meta_path), "meta.parquet")
            ).to_pylist()[0]
        else:
            row = spark.read.parquet(meta_path).collect()[0].asDict()
    except (FileNotFoundError, OSError, IndexError, _SparkAnalysisError) as exc:
        # Distinguish "meta missing" (interrupted overwrite — buckets may
        # be newer than any meta ever written) from transient IO noise by
        # failing LOUD either way: a probe without trustworthy banding
        # parameters must never fall back to defaults and return
        # plausible-but-empty results.
        raise ValueError(
            f"minhash index at {path!r} has no readable meta "
            "(an overwrite may have been interrupted between the bucket "
            "and meta writes — meta is written last as the commit record). "
            "Rebuild the index with write_minhash_index(mode='overwrite')."
        ) from exc
    return int(row["num_hashes"]), int(row["num_bands"]), int(row["shingle_k"])


def probe_minhash_index(
    new_df: DataFrame,
    text_col: str,
    id_col: str,
    path: str,
    verify_df: DataFrame | None = None,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicates of a NEW batch against a written index.

    Candidates: shingle+sign the new batch only (the historical corpus is
    never re-read), equi-join the index's (band, bucket) table, distinct
    (new_id, dup_of) with self-matches dropped (re-ingesting an indexed
    doc must not flag it as its own duplicate). Without ``verify_df`` the
    candidate pairs return as-is (recall-oriented). With ``verify_df`` (a
    frame resolving BOTH sides' texts, e.g. corpus ∪ new batch) every
    candidate is confirmed by exact shingle Jaccard >= ``threshold`` and
    the pair carries its score — the precision gate of
    :func:`near_dedup_minhash`, applied cross-batch. Candidates whose ids
    ``verify_df`` does NOT resolve come back with ``jaccard`` NULL
    instead of silently vanishing — "zero duplicates" because the caller
    resolved half the corpus is this operator's worst failure mode.

    Banding parameters come from the index meta (see
    :func:`write_minhash_index`).
    """
    from etl_hiscox_spark.sources.genlog import live_index_paths

    spark = new_df.sparkSession
    # generational roots probe every live segment (build + OCC append
    # deltas, r13); banding comes from the geometry segment, which every
    # delta was validated against at append time
    paths = live_index_paths(spark, path)
    num_hashes, num_bands, shingle_k = _read_index_meta(spark, paths[0], resolved=True)
    sig = minhash_signature_table(new_df, text_col, id_col, num_hashes, shingle_k)
    new_banded = _banded_buckets(sig, num_hashes, num_bands).alias("n")
    # one pyarrow footer read replaces Spark's per-call schema inference
    # for the engine-written bucket table (r18, guide §6 — ~0.2 s per
    # probe); None falls back to inference, a mismatch fails loudly at
    # scan time
    from etl_hiscox_spark.fastschema import fast_parquet_schema

    bucket_dirs = [os.path.join(p, "buckets") for p in paths]
    fast = fast_parquet_schema(bucket_dirs[0])
    reader = spark.read.schema(fast) if fast is not None else spark.read
    idx = reader.parquet(*bucket_dirs).alias("i")
    cand = (
        new_banded.join(
            idx,
            (F.col("n.band") == F.col("i.band"))
            & (F.col("n.bucket") == F.col("i.bucket"))
            & (F.col("n.doc") != F.col("i.doc")),
        )
        .select(F.col("n.doc").alias("id_a"), F.col("i.doc").alias("id_b"))
        .distinct()
    )
    if verify_df is None:
        return cand.select(
            F.col("id_a").alias("new_id"), F.col("id_b").alias("dup_of")
        )
    # Verify only what the candidates touch: semi-join the resolver down to
    # candidate ids BEFORE shingling — at 100 TB verify_df is the whole
    # corpus and re-shingling it would dwarf the probe itself (measured
    # ~2x the query at sf0.1). cand feeds two branches (the id set and the
    # pair list); lazy persist so the banded join runs once. The persists
    # (cand and the per-doc shingle-set frame below) are attached to the
    # returned frame — callers free them with
    # ``caching.release_caches(result)`` after materializing; the streaming
    # foreachBatch path does this per batch.
    cand = cand.persist()
    ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    resolved = verify_df.join(ids, id_col, "left_semi")
    # Exact Jaccard via per-doc shingle-hash SETS instead of the generic
    # jaccard_pairs count-join formulation (r17, guide §2.4/§3): one
    # collect_set aggregation (distinct per doc for free) + two candidate
    # joins replaces the shingle-distinct stem, the per-doc count agg, the
    # big-big (id, shingle) intersection join and the three count re-joins
    # — ~7 Exchanges -> ~3 and 6 joins -> 2 on the probe plan, measured
    # 1.61 -> 1.17 s warm at sf0.1 with bit-identical scores. Safe at
    # scale: ``sets`` holds arrays only for RESOLVED docs (batch-bound —
    # the semi-join above caps it at the candidate ids, never the corpus),
    # and array_intersect is O(|A|+|B|) per LSH-gated candidate pair.
    # A candidate whose id is missing from verify_df surfaces as jaccard
    # NULL via the left joins instead of silently vanishing — "zero
    # duplicates" because the caller resolved half the corpus is this
    # operator's worst failure mode. The threshold applies only to scored
    # pairs, exactly as before.
    sets = (
        _raw_shingle_hash_stream(resolved, text_col, id_col, shingle_k)
        .groupBy("doc")
        .agg(F.collect_set("h").alias("__s"))
        .persist()
    )
    sa = sets.select(F.col("doc").alias("id_a"), F.col("__s").alias("__sa"))
    sb = sets.select(F.col("doc").alias("id_b"), F.col("__s").alias("__sb"))
    n_int = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    jac = n_int.cast("double") / (F.size("__sa") + F.size("__sb") - n_int)
    out = (
        cand.join(sa, "id_a", "left")
        .join(sb, "id_b", "left")
        .select(
            "id_a",
            "id_b",
            F.when(
                F.col("__sa").isNotNull() & F.col("__sb").isNotNull(), jac
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard").isNull() | (F.col("jaccard") >= F.lit(threshold)))
    )
    out = out.select(
        F.col("id_a").alias("new_id"),
        F.col("id_b").alias("dup_of"),
        "jaccard",
    )
    return attach_owned_caches(out, [cand, sets])
