"""Similarity search over embedding columns (SURVEY.md §2.11 L3).

Two tiers:

- **Brute-force cosine top-k** — exact baseline. The query vector is a plain
  literal array; dot product via ``F.zip_with`` + ``F.aggregate`` (JVM
  expressions, no Python). At 100 TB this is a single narrow scan +
  TakeOrderedAndProject — no shuffle at all for a single query vector.
- **LSH-bucketed ANN** — random-hyperplane (signed projection) buckets.
  Probing only the query's bucket (+ optional multi-probe neighbors) turns
  top-k into a partition-pruned scan. Hyperplanes are generated from a seed
  driver-side (numpy), shipped as literals — deterministic.

A pandas_udf batch-scoring variant is provided for many-query workloads
(query matrix broadcast once per executor, Arrow-batched numpy matmul).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_hiscox_spark.concurrency import run_overlapped
from etl_hiscox_spark.smalldf import local_rows_df


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns, expression-only.

    NOTE: Spark 4 evaluates array lambdas interpreted per element, so this
    is for one-off projections (v1 norms etc.), NOT bulk scoring scans —
    those go through :func:`cosine_scores_pandas` / the Arrow tier
    (measured ~6× on the analogous shingle path, SCALING.md)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: zero-norm vectors yield NULL (ANSI mode would raise on
    # 0/0); callers filter NULLs rather than letting them win rankings.
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def _as_double_literal_array(vec: Sequence[float]) -> Column:
    # one py4j call for the whole literal (Spark 4 F.lit accepts lists);
    # the element-wise F.array(*[F.lit(v) …]) form paid dim+1 round trips
    # per query vector (r17)
    return F.lit([float(v) for v in vec])


def _stack_embeddings(embs: pd.Series, dim: int | None = None) -> np.ndarray:
    """Stack a Series of embedding cells into an (n, dim) float64 matrix,
    turning malformed cells into all-NaN rows instead of crashing the batch.

    ``np.asarray(None)`` raises TypeError and ``np.stack`` over ragged
    lengths raises ValueError — at 100 TB of scraped data one NULL/truncated
    embedding must not fail the whole job. NaN rows flow through BLAS to NaN
    scores, which every caller filters — the same contract the expression
    tier provided via ``try_divide`` NULLs. ``dim`` defaults to the first
    well-formed row's length (0 if none, yielding an (n, 0) matrix whose
    scores are all degenerate and filtered).
    """
    # Fast path: a clean batch (the overwhelmingly common case) stacks at
    # C speed exactly as before the guard existed — the per-row repair
    # loop below costs ~1.5× and must not tax healthy data.
    try:
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        if mat.ndim == 2 and mat.shape[1] > 0 and (dim is None or mat.shape[1] == dim):
            return mat
    except (TypeError, ValueError):
        pass
    cells: list[np.ndarray | None] = []
    for e in embs:
        if e is None:
            cells.append(None)
            continue
        a = np.asarray(e, dtype=np.float64)
        cells.append(a if a.ndim == 1 and a.size > 0 else None)
    if dim is None:
        dim = next((a.size for a in cells if a is not None), 0)
    mat = np.full((len(cells), dim), np.nan)
    for i, a in enumerate(cells):
        if a is not None and a.size == dim:
            mat[i] = a
    return mat


def cosine_scores_pandas(embedding_col: Column, query_vec: Sequence[float]) -> Column:
    """Cosine similarity of each row's embedding against ONE query vector,
    computed per Arrow batch as a single BLAS matvec (``mat @ q``).

    This is the default scoring path for bulk scans: the expression-tier
    :func:`cosine` runs Spark 4's array lambdas interpreted per element,
    which is ~6× slower on wide embedding columns; here each Arrow batch
    crosses the JVM↔Python boundary once and the dim-length loop runs in
    BLAS. Embeddings are widened to float64 (exact) before arithmetic so
    scores match the DECIMAL/DOUBLE oracle convention. Zero-norm, NULL,
    empty, and wrong-length rows all yield NaN (via
    :func:`_stack_embeddings`) — callers filter them exactly as with
    ``try_divide`` NULLs.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    @F.pandas_udf("double")
    def _score(embs: pd.Series) -> pd.Series:
        if not len(embs):
            return pd.Series([], dtype="float64")
        mat = _stack_embeddings(embs, dim=q.size)
        denom = np.linalg.norm(mat, axis=1) * qn
        dots = mat @ q
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(denom > 0, dots / denom, np.nan)
        return pd.Series(out)

    # asNondeterministic stops Catalyst duplicating the call when the score
    # feeds both a Filter (NaN guard) and a Project — without it the plan
    # carries TWO ArrowEvalPython nodes and every row is scored twice.
    # (The function IS deterministic; the marker only disables the
    # clone/pushdown rewrites. Plan-pinned in tests/test_plans.py.)
    return _score.asNondeterministic()(embedding_col)


def cosine_topk(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    query_vec: Sequence[float],
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k for one query vector.

    Embeddings are cast to double element-wise before arithmetic so scores
    are reproducible across engines. Output: (id, cosine_sim, rank) ordered
    by similarity desc with id as deterministic tiebreak. Executes as
    scan → project → TakeOrderedAndProject (no shuffle).
    """
    scored = df.select(
        F.col(id_col),
        cosine_scores_pandas(F.col(embedding_col), query_vec).alias("cosine_sim"),
    )
    # Zero-norm, NULL, empty, and wrong-length embeddings all score NaN
    # (guarded stack in cosine_scores_pandas), and Spark sorts NaN above
    # every double in descending order — drop them instead of letting a
    # garbage row win rank 1.
    scored = scored.filter(F.col("cosine_sim").isNotNull() & ~F.isnan("cosine_sim"))
    # limit(k) first => TakeOrderedAndProject on the scan; the rank window
    # then runs over k rows only (single tiny task).
    topk = scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
    return topk.select(id_col, "cosine_sim", F.row_number().over(w).alias("rank"))


def _round6_engine_parity(x: float) -> float:
    """ROUND(x, 6) exactly as Spark's F.round AND DuckDB's round() compute
    it for doubles: HALF_UP on the SHORTEST DECIMAL REPR of the value
    (java BigDecimal.valueOf / duckdb both go through the decimal string),
    NOT on the exact binary expansion — 0.1234565 (binary ~...64999) rounds
    UP to 0.123457 in both engines. Parity pinned over 20k random doubles
    vs DuckDB (2k of them also through Spark's F.round) in
    tests/test_dedup_similarity.py."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def mmr_topk(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    shortlist: int = 50,
    lam: float = 0.7,
    mu: float = 0.3,
) -> DataFrame:
    """Maximal Marginal Relevance: top-k that balances query relevance
    against redundancy — the diversified selection step of retrieval /
    data-curation pipelines (dedup-aware example picking).

    Two stages with an explicit scale split:

    1. DISTRIBUTED shortlist — exact cosine against the full corpus,
       ordered by (round(sim, 6) DESC, id): scan → project →
       TakeOrderedAndProject, no shuffle, any corpus size.
    2. BOUNDED re-rank — the classic greedy loop over the ``shortlist``
       rows only (collected; ``shortlist`` × dim doubles — a few KB, the
       same bounded-collect class as watermark scalars). Each step picks
       argmax of ``lam·rel − mu·max_sim_to_selected``; step 1 is argmax
       relevance (empty selected set scores 0 redundancy). ``mu`` is an
       EXPLICIT literal, never derived as ``1 − lam``: the IEEE double
       ``1.0 - 0.7`` is 0.30000000000000004, which is NOT the SQL literal
       ``0.3`` — deriving it would desync every objective from a SQL
       replay by 4e-17 · redundancy, occasionally across a rounding edge.

    Engine-portable determinism: relevance and pairwise similarities are
    rounded to 6 dp (``_round6_engine_parity``) BEFORE any comparison and
    the objective re-rounded after the affine combine, with id as the
    tiebreak — so ulp-level float noise can never flip a greedy choice
    against the SQL replay oracle (the chained-CTE unroll pattern, same
    family as the BPE training-loop replay).

    Output: (id, mmr_rank 1..k, relevance, objective).
    """
    if k > shortlist:
        raise ValueError(f"k ({k}) must be <= shortlist ({shortlist})")
    # Result schema carries the caller's actual id type (string doc ids,
    # ints, …) — hardcoding `long` + int() casts would crash or corrupt
    # non-long ids despite the generic signature (ADVICE r9).
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("mmr_rank", IntegerType(), True),
            StructField("relevance", DoubleType(), True),
            StructField("objective", DoubleType(), True),
        ]
    )
    scored = df.select(
        F.col(id_col),
        F.col(embedding_col).alias("__emb"),
        F.round(
            cosine_scores_pandas(F.col(embedding_col), query_vec), 6
        ).alias("__rel"),
    )
    scored = scored.filter(F.col("__rel").isNotNull() & ~F.isnan("__rel"))
    short = (
        scored.orderBy(F.col("__rel").desc(), F.col(id_col).asc())
        .limit(shortlist)
        .collect()
    )
    if not short:
        return local_rows_df(df.sparkSession, [], out_schema)
    ids = [r[id_col] for r in short]
    rel = {r[id_col]: float(r["__rel"]) for r in short}
    vecs = {
        r[id_col]: np.asarray(r["__emb"], dtype=np.float64) for r in short
    }
    norms = {i: float(np.sqrt(np.dot(v, v))) for i, v in vecs.items()}

    def sim(a, b) -> float:
        return _round6_engine_parity(
            float(np.dot(vecs[a], vecs[b])) / (norms[a] * norms[b])
        )

    selected: list[tuple[object, float]] = []
    remaining = list(ids)
    while remaining and len(selected) < k:
        best_id, best_obj = None, None
        for i in remaining:
            redundancy = max((sim(i, s) for s, _ in selected), default=0.0)
            obj = _round6_engine_parity(lam * rel[i] - mu * redundancy)
            if best_obj is None or obj > best_obj or (obj == best_obj and i < best_id):
                best_id, best_obj = i, obj
        selected.append((best_id, best_obj))
        remaining.remove(best_id)
    return local_rows_df(
        df.sparkSession,
        [
            (i, rank + 1, rel[i], obj)
            for rank, (i, obj) in enumerate(selected)
        ],
        out_schema,
    )


def random_hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(embedding_col: Column, planes: np.ndarray) -> Column:
    """Signed-random-projection bucket id (long) for an embedding column.

    bit_i = 1 iff e · plane_i >= 0; bucket = packed bits. Cosine-similar
    vectors collide with probability 1 - θ/π per bit. All n_planes
    projections are ONE BLAS matmul per Arrow batch (``mat @ planes.T``) —
    the expression form would run n_planes interpreted array folds per row.
    NULL/empty/wrong-length embeddings land in bucket -1 (never a packed-bit
    value) so they can't collide with a real bucket or crash the batch.
    """
    P = np.asarray(planes, dtype=np.float64)
    if P.shape[0] > 62:
        raise ValueError(f"at most 62 hyperplanes fit a signed long bucket, got {P.shape[0]}")
    weights = (1 << np.arange(P.shape[0])).astype(np.int64)

    @F.pandas_udf("long")
    def _bucket(embs: pd.Series) -> pd.Series:
        if not len(embs):
            return pd.Series([], dtype="int64")
        mat = _stack_embeddings(embs, dim=P.shape[1])
        valid = ~np.isnan(mat).any(axis=1)
        bits = np.nan_to_num(mat) @ P.T >= 0  # (batch, n_planes) sign bits
        return pd.Series(np.where(valid, bits @ weights, -1).astype(np.int64))

    return _bucket(embedding_col)


def ann_topk_lsh(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: score only rows in the query's LSH bucket
    (plus ``multiprobe`` single-bit-flip neighbor buckets).

    At scale the table is written partitioned/bucketed by this bucket id,
    making the probe a partition-pruned read of ~n/2^n_planes rows instead
    of a full scan.
    """
    dim = len(query_vec)
    planes = random_hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=float)
    qbits = 0
    for i, plane in enumerate(planes):
        if float(qv @ plane) >= 0:
            qbits |= 1 << i
    probe_buckets = [qbits]
    if multiprobe > 0:
        # flip the bits whose hyperplane margin is smallest for the query
        margins = sorted(range(n_planes), key=lambda i: abs(float(qv @ planes[i])))
        for i in margins[:multiprobe]:
            probe_buckets.append(qbits ^ (1 << i))
    bucketed = df.withColumn("__bucket", lsh_bucket(F.col(embedding_col), planes))
    candidates = bucketed.filter(F.col("__bucket").isin(probe_buckets))
    return cosine_topk(candidates, embedding_col, id_col, query_vec, k)


def ivf_index(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    n_clusters: int = 16,
    seed: int = 42,
    train_fraction: float = 1.0,
    max_iter: int | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """IVF (inverted-file) index: k-means centroids + cluster assignment.

    Returns (assigned_df with __cluster column, centroid matrix). At scale
    the assigned table is written ``partitionBy("__cluster")`` so a probe
    reads only n_probe/n_clusters of the data — partition pruning does the
    work, no custom index structure.

    ``train_fraction < 1.0`` fits k-means on a seeded sample (the 100 TB
    path: centroid quality converges long before the full corpus is seen,
    so training on ~1-10% avoids iterating k-means over every row);
    ASSIGNMENT is always a single full pass with broadcast centroids —
    every row gets a cluster regardless of the training sample.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vdf = df.withColumn(
        "__vec", array_to_vector(F.transform(F.col(embedding_col), lambda x: x.cast("double")))
    )
    train = vdf if train_fraction >= 1.0 else vdf.sample(train_fraction, seed=seed)
    km = KMeans(k=n_clusters, seed=seed, featuresCol="__vec", predictionCol="__cluster")
    if max_iter is not None:
        # centroid quality saturates in a handful of iterations; callers
        # whose OUTPUT does not depend on centroid placement (full-probe
        # index lifecycles) cap the fit instead of paying the default 20
        km = km.setMaxIter(max_iter)
    model = km.fit(train)
    assigned = model.transform(vdf).drop("__vec")
    centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    return assigned, centroids


def ivf_topk(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    train_fraction: float = 1.0,
) -> DataFrame:
    """IVF approximate top-k: score only the n_probe clusters whose
    centroids are nearest the query (cosine). Recall grows with n_probe;
    n_probe = n_clusters degrades gracefully to exact search."""
    assigned, centroids = ivf_index(df, embedding_col, id_col, n_clusters, seed, train_fraction)
    q = np.asarray(query_vec, dtype=float)
    qn = q / np.linalg.norm(q)
    cn = centroids / np.clip(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12, None)
    probe = np.argsort(-(cn @ qn))[:n_probe].tolist()
    candidates = assigned.filter(F.col("__cluster").isin([int(p) for p in probe]))
    return cosine_topk(candidates, embedding_col, id_col, query_vec, k)


def _centroid_distance_grid(
    C: np.ndarray, embs: pd.Series
) -> tuple[np.ndarray, np.ndarray]:
    """(valid mask, squared-Euclidean distance grid) of one Arrow batch
    against the centroid matrix — THE shared kernel of cluster assignment
    (argmin over the grid) and the drift diagnostic (min over the grid):
    a single implementation guarantees reported drift distances can never
    disagree with the distances assignment actually used. One BLAS matmul
    per batch; malformed rows (NULL / wrong-dim / NaN) come back invalid
    rather than crashing the batch."""
    c_sq = (C * C).sum(axis=1)
    mat = _stack_embeddings(embs, dim=C.shape[1])
    valid = ~np.isnan(mat).any(axis=1)
    m = np.nan_to_num(mat)
    d = (m * m).sum(axis=1, keepdims=True) - 2.0 * (m @ C.T) + c_sq
    return valid, d


def _nearest_centroid_col(C: np.ndarray, embedding_col: Column) -> Column:
    """Cluster id of each embedding's nearest centroid (squared Euclidean,
    first index on a tie — KMeansModel.transform parity, test-pinned).
    NULL / wrong-dim / NaN embeddings map to -1 so callers can reject
    them loudly before anything lands on disk."""

    @F.pandas_udf("int")
    def assign(embs: pd.Series) -> pd.Series:
        valid, d = _centroid_distance_grid(C, embs)
        return pd.Series(np.where(valid, d.argmin(axis=1), -1).astype(np.int32))

    return assign(embedding_col)


def write_ivf_index(
    df: DataFrame,
    path: str,
    embedding_col: str,
    id_col: str,
    n_clusters: int = 16,
    seed: int = 42,
    train_fraction: float = 1.0,
    max_iter: int | None = None,
    centroids: np.ndarray | None = None,
    quantize: bool = False,
    generational: bool = True,
    _staged: bool = False,
) -> np.ndarray:
    """Materialize the IVF index as a cluster-partitioned parquet table;
    returns the centroid matrix and ALSO persists it inside the index
    (``<path>/_centroids`` — the leading underscore hides it from the
    partitioned data scan), so probes and appends read their geometry
    FROM the index, never from the caller — the same params-travel-with-
    the-data rule as the minhash index meta.

    Commit protocol for free: the partitioned overwrite clears ``path``
    (including any previous ``_centroids``) and the centroids are written
    LAST — a failure in between leaves an index without centroids, which
    :func:`load_ivf_centroids` rejects loudly instead of probing with
    stale geometry.

    ``centroids`` pins EXPLICIT geometry instead of fitting k-means — the
    rebuild-preserving-geometry path (re-materialize a fragmented or
    schema-migrated index without moving a single vector across clusters)
    and the deterministic-geometry path the drift diagnostic's SQL twin
    replays literal-for-literal. Explicit-geometry builds reject
    malformed embeddings loudly, exactly like the append path (the
    k-means branch throws on them inside ML's transform).

    This is the 100 TB deployment form of :func:`ivf_topk`: the one-time
    k-means assignment is written ``partitionBy(__cluster)``, so every
    subsequent probe is a PARTITION-PRUNED read of n_probe/n_clusters of
    the data — the layout does the indexing, no server, no side-structure.

    ``quantize=True`` ALSO stores per-row int8 codes + scale
    (``__codes`` / ``__qscale``, the ``vectors.quantize_int8``
    representation) inside the cluster partitions. Parquet is columnar,
    so :func:`ivf_probe_topk_quantized`'s candidate scan then reads the
    codes column only — ~4x less IO than the float32 embeddings on the
    probe path — while the float column stays in the same row for the
    exact rerank fetch. Appends inherit the layout (the append path
    detects ``__codes`` in the index schema and quantizes the batch with
    the same expression); compaction/erase/rebuild carry the columns
    through as ordinary payload.

    ``generational=True`` — the DEFAULT since r13 (VERDICT r12 item 3:
    new indexes must be object-store-safe without the user knowing to
    ask) — builds the GENERATION-POINTER layout (r12,
    :mod:`sources/genlog`): the index stages as a complete generation
    under ``<path>/gen-*/`` and an atomic ``_gen_log`` pointer commit
    makes it live — compact/erase/rebuild then flip pointers instead of
    renaming data dirs, so the full maintenance lifecycle runs on any
    filesystem. ``generational=False`` opts into the legacy FLAT layout
    (rename-committed maintenance, driver-local only) — kept readable
    and maintainable forever;
    ``dedup.migrate_flat_index_to_generational`` upgrades it in place.
    A root that is already generational stays generational regardless
    of the flag.
    """
    from etl_hiscox_spark.operators.dedup import _reject_flat_index_debris
    from etl_hiscox_spark.sources import genlog

    spark = df.sparkSession
    if generational or genlog.is_generational(spark, path):
        root = genlog.resolve_root(spark, path)
        _reject_flat_index_debris(spark, root)
        # base captured BEFORE staging: the commit lands at base+1
        # create-if-absent, so racing commits collide loudly (r12 review)
        base = genlog.latest_pointer_version(spark, root)
        gen = genlog.new_generation_name()
        C = write_ivf_index(
            df, genlog._join(root, gen), embedding_col, id_col,
            n_clusters=n_clusters, seed=seed, train_fraction=train_fraction,
            max_iter=max_iter, centroids=centroids, quantize=quantize,
            generational=False, _staged=True,
        )
        genlog.commit_generation(
            spark, root, gen, "build", base_version=base,
            geometry_id=genlog.new_geometry_id(),
            # an overwrite-build onto an EXISTING head carries its
            # exactly-once ledger like every other commit (review)
            txn_watermarks=(
                genlog.read_pointer(root, base).get("txn_watermarks")
                if base is not None
                else None
            ),
        )
        return C

    def _with_codes(assigned: DataFrame) -> DataFrame:
        if not quantize:
            return assigned
        from etl_hiscox_spark.operators.vectors import quantize_int8

        codes, scale = quantize_int8(F.col(embedding_col))
        return assigned.withColumn("__codes", codes).withColumn("__qscale", scale)

    if centroids is not None:
        C = np.asarray(centroids, dtype=np.float64)
        assigned = _with_codes(
            df.withColumn("__cluster", _nearest_centroid_col(C, F.col(embedding_col)))
        )
        if _staged:
            # staged tree (generational build): the malformed gate rides
            # the write itself via observe() — one action instead of
            # count-then-write (r17, guide §5). Raising AFTER the write
            # but BEFORE _write_ivf_centroids leaves a centroid-less
            # staged tree no reader trusts and vacuum reclaims — the
            # exact crash-mid-stage state the protocol already covers.
            _write_observed_gate(assigned, path, "write_ivf_index", C)
        else:
            # flat root: the overwrite clears the LIVE index, so the gate
            # must fire before any byte lands — bad input leaves the old
            # index intact (the pre-r17 contract, kept)
            assigned = assigned.persist()
            try:
                bad = assigned.filter(F.col("__cluster") < 0).count()
                if bad:
                    raise ValueError(
                        f"write_ivf_index: {bad} embedding(s) are NULL, empty, NaN, "
                        f"or not {C.shape[1]}-dimensional — repair or drop them "
                        "before indexing (a written -1 partition would be "
                        "invisible to every probe)"
                    )
                _write_ivf_partitions(assigned, path)
            finally:
                assigned.unpersist(blocking=False)
        _write_ivf_centroids(df.sparkSession, path, C, quantized=quantize)
        return C
    assigned, centroids = ivf_index(
        df, embedding_col, id_col, n_clusters, seed, train_fraction, max_iter
    )
    _write_ivf_partitions(_with_codes(assigned), path)
    _write_ivf_centroids(df.sparkSession, path, centroids, quantized=quantize)
    return centroids


def _write_ivf_partitions(assigned: DataFrame, path: str, mode: str = "overwrite") -> None:
    # Cluster-wise pre-shuffle before the partitioned write: without it
    # every write task holds rows of every cluster and emits one file per
    # (task, cluster) — shuffle_partitions × n_clusters KB-scale files on
    # day one, i.e. the fragmentation compact_ivf_index exists to repair,
    # created AT BUILD TIME (measured: the r10 erase lifecycle spent more
    # time listing/reading the 512-file build than probing it). One
    # exchange of the assigned frame; at 100 TB clusters larger than a
    # healthy task add a size salt (compact_ivf_index's mechanism).
    #
    # The commit protocol REQUIRES the overwrite to clear the whole path
    # (stale cluster partitions and the previous _centroids must not
    # survive a rebuild). Under the session config
    # spark.sql.sources.partitionOverwriteMode=dynamic an overwrite only
    # replaces partitions present in the new data — so pin static mode on
    # THIS writer; the safety invariant must not depend on session config
    # (ADVICE r9).
    assigned.repartition("__cluster").write.partitionBy("__cluster").mode(mode).option(
        "partitionOverwriteMode", "static"
    ).parquet(path)


def _write_ivf_centroids(
    spark, path: str, centroids: np.ndarray, quantized: bool = False
) -> None:
    # Local paths write via pyarrow on the driver — a Spark job to persist
    # a k-row centroid table measured ~5s of the whole index lifecycle at
    # bench scale (the same tiny-metadata lesson as the minhash index
    # meta); the contract (parquet at <path>/_centroids) is identical.
    # ``quantized`` rides the commit record (r11 review): the append path
    # needs "does this layout store __codes?" in O(1), and a full-index
    # schema inference per daily append is exactly the listing tax the
    # fragmentation stats were moved off the driver to avoid. _centroids
    # survives every maintenance op by construction (compact copies it
    # byte-for-byte, erase renames it aside and back, rebuild rewrites
    # it), so the flag can never drift from the layout.
    from etl_hiscox_spark.operators.dedup import _meta_is_local

    cdir = os.path.join(path, "_centroids")
    if _meta_is_local(spark, path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from etl_hiscox_spark.sources.writers import _local_fs_path

        local = _local_fs_path(cdir)
        os.makedirs(local, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "cluster": pa.array(range(len(centroids)), pa.int32()),
                    "centroid": pa.array(
                        [[float(x) for x in c] for c in centroids],
                        pa.list_(pa.float64()),
                    ),
                    "quantized": pa.array(
                        [bool(quantized)] * len(centroids), pa.bool_()
                    ),
                }
            ),
            os.path.join(local, "centroids.parquet"),
        )
        return
    local_rows_df(
        spark,
        [
            (int(i), [float(x) for x in c], bool(quantized))
            for i, c in enumerate(centroids)
        ],
        "cluster int, centroid array<double>, quantized boolean",
    ).write.mode("overwrite").parquet(cdir)


def _read_ivf_centroid_rows(spark, path: str, resolved: bool = False) -> list[dict]:
    """Raw rows of the ``_centroids`` commit record, loud when missing."""
    from etl_hiscox_spark.operators.dedup import _meta_is_local

    if not resolved:  # callers that already resolved skip the re-stat (r12)
        from etl_hiscox_spark.sources.genlog import live_index_paths

        # the GEOMETRY segment (segments[0]) carries the authoritative
        # centroid record; append deltas carry a validated copy (r13)
        path = live_index_paths(spark, path)[0]
    cdir = os.path.join(path, "_centroids")
    try:
        if _meta_is_local(spark, path):
            import glob as _glob

            import pyarrow.parquet as pq

            from etl_hiscox_spark.sources.writers import _local_fs_path

            local = _local_fs_path(cdir)
            parts = sorted(_glob.glob(os.path.join(local, "*.parquet")))
            if not parts:
                raise FileNotFoundError(f"no centroid parquet under {local!r}")
            rows = []
            for part in parts:
                rows.extend(pq.read_table(part).to_pylist())
        else:
            rows = [r.asDict() for r in spark.read.parquet(cdir).collect()]
    except Exception as exc:
        raise ValueError(
            f"IVF index at {path!r} has no readable centroids (an index "
            "write may have been interrupted — centroids are written last "
            "as the commit record). Rebuild with write_ivf_index."
        ) from exc
    if not rows:
        raise ValueError(f"IVF index at {path!r} has an empty centroid table")
    return rows


def load_ivf_centroids(spark, path: str, resolved: bool = False) -> np.ndarray:
    """Centroid matrix persisted by :func:`write_ivf_index`. Missing or
    empty centroids mean an interrupted index write — fail loudly, never
    probe with default/stale geometry. Local paths read via pyarrow on
    the driver (every probe/append/erase/drift call loads the geometry —
    a Spark job per k-row read taxed the lifecycle measurably)."""
    rows = _read_ivf_centroid_rows(spark, path, resolved=resolved)
    rows.sort(key=lambda r: r["cluster"])
    return np.vstack([np.asarray(r["centroid"], dtype=np.float64) for r in rows])


def ivf_index_is_quantized(spark, path: str, resolved: bool = False) -> bool:
    """Whether the index layout stores int8 codes — read from the
    ``_centroids`` commit record in O(1), never inferred from the data
    files (pre-r11 indexes without the flag read as False)."""
    rows = _read_ivf_centroid_rows(spark, path, resolved=resolved)
    return bool(rows[0].get("quantized", False))


def _read_ivf_segments(spark, paths: list[str]) -> DataFrame:
    """One frame over every live segment of an IVF index. Spark refuses a
    single multi-root partitioned read ([CONFLICTING_DIRECTORY_STRUCTURES]
    — each ``gen-*`` segment is its own partition tree), so segments read
    separately and union — partition pruning on ``__cluster`` pushes into
    EACH branch's scan, exactly as it does for the single-segment plan."""
    out = spark.read.parquet(paths[0])
    # later segments reuse the first segment's inferred schema — identical
    # layout by protocol (appends validate against the geometry record),
    # and per-call footer inference costs ~0.1-0.2 s (r18, guide §6); a
    # mismatched segment fails loudly at scan time, never silently casts
    for p in paths[1:]:
        out = out.unionByName(spark.read.schema(out.schema).parquet(p))
    return out


def _segment_hit_stats(
    seg_dfs: list[DataFrame], keys_bc: DataFrame, id_col: str
) -> list[tuple[int, int]]:
    """``(total_rows, erase_hits)`` for every live segment, in ONE action.

    Replaces the sequential per-segment semi-join count (+ kept-empty
    probe) the index erase paths paid — per-action latency dominates
    multi-segment heads (r17, guide §2.6/§5). ``keys_bc`` is the
    broadcast-hinted DISTINCT erase set, so the left join marks without
    duplicating; committed generations are immutable, so these stats and
    the rewrites that follow read consistent bytes by construction.
    """
    hit = keys_bc.withColumn("__hit", F.lit(1))
    marked = None
    for i, seg in enumerate(seg_dfs):
        m = seg.select(F.col(id_col), F.lit(i).alias("__seg"))
        marked = m if marked is None else marked.unionByName(m)
    rows = (
        marked.join(hit, id_col, "left")
        .groupBy("__seg")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("hits"),
        )
        .collect()
    )
    by_seg = {r["__seg"]: (r["total"], r["hits"]) for r in rows}
    return [by_seg.get(i, (0, 0)) for i in range(len(seg_dfs))]


def _assign_to_centroids(
    df: DataFrame, C: np.ndarray, quantized: bool, embedding_col: str
) -> DataFrame:
    """The shared append-side assignment: nearest pinned centroid, plus
    the quantized codes columns when the index layout stores them (an
    appended row without ``__codes`` would be invisible to the codes-only
    probe scan)."""
    assigned = df.withColumn(
        "__cluster", _nearest_centroid_col(C, F.col(embedding_col))
    )
    if quantized:
        from etl_hiscox_spark.operators.vectors import quantize_int8

        codes, scale = quantize_int8(F.col(embedding_col))
        assigned = assigned.withColumn("__codes", codes).withColumn("__qscale", scale)
    return assigned


def _write_observed_gate(
    assigned: DataFrame, target: str, op: str, C: np.ndarray
) -> None:
    """Write a STAGED cluster tree with the malformed-row gate riding the
    write action itself (``observe`` — one pass, one action) instead of a
    count-then-write over a persisted frame (r17, guide §5: per-action
    latency dominated the lifecycle ops). Only for staged targets: a bad
    batch raises AFTER partitions land but BEFORE the ``_centroids``
    commit record, leaving exactly the crash-mid-stage state the
    generational protocol already rejects loudly and vacuums."""
    from pyspark.sql import Observation

    obs = Observation()
    _write_ivf_partitions(
        assigned.observe(
            obs, F.sum((F.col("__cluster") < 0).cast("long")).alias("bad")
        ),
        target,
    )
    bad = obs.get["bad"] or 0
    if bad:
        raise ValueError(
            f"{op}: {bad} embedding(s) are NULL, empty, NaN, or not "
            f"{C.shape[1]}-dimensional — repair or drop them before "
            "indexing (a written -1 partition would be invisible to "
            "every probe)"
        )


def _reject_malformed_assignments(assigned: DataFrame, C: np.ndarray) -> None:
    """ONE copy of the append-side malformed-row gate (review: the delta
    and in-place branches each carried it verbatim — a fix to one would
    silently leave the other behind). Reject LOUDLY before anything lands
    on disk (r9 review): assign() marks NULL / wrong-dim / NaN embeddings
    as -1, and writing them would create a ``__cluster=-1`` partition no
    probe ever reads — stored-but-unsearchable forever, silently. The
    build path fails on the same input (KMeansModel.transform throws on
    null vectors); appends must be symmetric. Callers persist ``assigned``
    first so this check and the write are one computation."""
    bad = assigned.filter(F.col("__cluster") < 0).count()
    if bad:
        raise ValueError(
            f"append_to_ivf_index: {bad} embedding(s) are NULL, empty, "
            f"NaN, or not {C.shape[1]}-dimensional — repair or drop them "
            "before appending (a written -1 partition would be invisible "
            "to every probe)"
        )


def _stage_ivf_delta(
    df: DataFrame, target: str, geom_seg: str, embedding_col: str
) -> None:
    """Stage an append batch as a SELF-CONTAINED delta segment: the
    batch's ``__cluster=`` partitions plus a copy of the geometry
    segment's ``_centroids`` commit record (k rows — the copy keeps every
    segment independently validatable and means a crash mid-stage leaves
    a centroid-less tree no reader ever trusts). Same malformed-row
    rejection as the in-place append path."""
    spark = df.sparkSession
    C = load_ivf_centroids(spark, geom_seg, resolved=True)
    quantized = ivf_index_is_quantized(spark, geom_seg, resolved=True)
    assigned = _assign_to_centroids(df, C, quantized, embedding_col)
    # delta targets are always staged trees: the malformed gate rides the
    # write (observe, one action) — a bad batch leaves a centroid-less
    # stage no reader trusts, same as a crash mid-stage (r17)
    _write_observed_gate(assigned, target, "append_to_ivf_index", C)
    _write_ivf_centroids(spark, target, C, quantized=quantized)


def append_to_ivf_index(
    df: DataFrame,
    path: str,
    embedding_col: str,
    id_col: str,
    txn: tuple[str, int] | None = None,
) -> None:
    """Incremental ingest for a written IVF index: assign NEW vectors to
    the EXISTING centroids (read from the index — appending never
    re-trains; centroid geometry is pinned at build time, exactly like
    the minhash index's banding parameters) and append them to their
    cluster partitions.

    Assignment replicates Spark ML ``KMeansModel.transform``: nearest
    centroid by squared Euclidean distance, first index on a tie
    (parity pinned in tests against model.predict on the same vectors).
    One Arrow batch pass over the new rows; the write touches only the
    partitions the new vectors land in. At 100 TB the daily embedding
    batch appends in O(batch), the historical corpus is never re-read —
    re-clustering (centroid drift repair) is an explicit rebuild, not a
    side effect.

    OCC APPENDS (r13; closes the ADVICE r12 lost-append race): on a
    generational root the batch stages as a self-contained DELTA segment
    (its ``__cluster=`` partitions plus a validated copy of the geometry
    record) and commits with a pointer flip whose ``segments`` list = the
    head's segments plus the delta (:func:`genlog.append_segment`) — a
    compact/erase/rebuild staged from the pre-append snapshot now
    collides on the version instead of silently dropping the appended
    rows, and committed generations stay immutable. A lost pointer race
    re-commits the same delta (it holds only new rows — still valid after
    a compact or erase won); a REBUILD winning mid-append changes the
    geometry epoch, so the delta's cluster assignments are stale — that
    raises :class:`genlog.GeometryChanged` and the append re-stages
    against the new centroids (bounded attempts). Probes read the union
    of segments; the next compact merges them — the LSM shape. Flat
    roots keep the plain in-place partition append.

    ``txn=(app_id, batch_id)`` makes a generational append EXACTLY-ONCE
    under streaming redelivery (:func:`genlog.append_segment`'s watermark
    ledger); REJECTED loudly on flat roots — they have no commit record
    to carry the ledger, and silently degrading to at-least-once is the
    failure mode the tag exists to prevent.
    """
    from etl_hiscox_spark.sources import genlog

    spark = df.sparkSession
    if not genlog.is_generational(spark, path):
        if txn is not None:
            # fail-loud convention: silently dropping the exactly-once
            # contract on a flat root would let a crash-replayed
            # micro-batch land twice with no signal
            raise ValueError(
                "txn=(app_id, batch_id) requires a GENERATIONAL index root "
                "— the watermark ledger lives in the pointer records; "
                "migrate the flat index with "
                "migrate_flat_index_to_generational first"
            )
    else:
        root = genlog.resolve_root(spark, path)
        for _ in range(3):
            version, _gen = genlog.current_generation(spark, root)
            rec = genlog.read_pointer(root, version)
            if genlog.is_replay(rec, txn):
                return  # replayed micro-batch: skip BEFORE staging
            geom_seg = genlog._join(root, genlog.pointer_segments(rec)[0])
            geometry_id = rec.get("geometry_id")

            def _same_geometry(head_rec: dict, pinned=geometry_id) -> None:
                if head_rec.get("geometry_id") != pinned:
                    raise genlog.GeometryChanged(
                        "IVF geometry changed mid-append (a rebuild "
                        "committed) — the staged delta's cluster "
                        "assignments are stale; re-staging"
                    )

            delta = genlog.new_generation_name()
            _stage_ivf_delta(df, genlog._join(root, delta), geom_seg,
                             embedding_col)
            try:
                genlog.append_segment(
                    spark, root, delta, validate=_same_geometry, txn=txn
                )
                return
            except genlog.GeometryChanged:
                continue  # stale delta is vacuum-reclaimable debris
        raise RuntimeError(
            "append_to_ivf_index: geometry changed on every attempt (3) — "
            "pathological rebuild contention; pause rebuilds and re-append"
        )
    # flat layout: in-place partition append (driver-local maintenance).
    # quantized layouts propagate — the flag comes from the _centroids
    # commit record in O(1), a full index schema inference per daily
    # append would pay the very listing tax this module keeps off the
    # driver (r11 review).
    C = load_ivf_centroids(spark, path, resolved=True)
    assigned = _assign_to_centroids(
        df, C, ivf_index_is_quantized(spark, path, resolved=True), embedding_col
    ).persist()
    try:
        _reject_malformed_assignments(assigned, C)
        # same cluster-wise pre-shuffle as the build write: one file per
        # TOUCHED partition per batch instead of one per (task, cluster)
        _write_ivf_partitions(assigned, path, mode="append")
    finally:
        assigned.unpersist(blocking=False)


def compact_ivf_index(spark, path: str, target_file_mb: int = 256) -> int:
    """Rewrite an IVF index's cluster partitions into ~target-sized files.

    :func:`append_to_ivf_index` adds ONE parquet file per touched
    partition per batch — at daily-ingest cadence the index fragments
    into thousands of KB-scale files and every probe pays an open/LIST
    tax (VERDICT r9). Compaction rewrites each ``__cluster`` partition
    into ``ceil(bytes / target)`` files (1 at typical partition sizes)
    while preserving BOTH index contracts: the ``partitionBy(__cluster)``
    layout (partition pruning untouched) and the ``_centroids`` commit
    record byte-for-byte (geometry is pinned at build time — maintenance
    must never drift it). Probe results are therefore equal by
    construction; pinned by test and by the l3_ivf_compact_probe oracle.

    Per-cluster file counts come from the actual on-disk bytes; rows are
    salted ``hash(payload) % n_files[cluster]`` so each output file is a
    deterministic subset. Write-to-tmp + swap, same recipe as
    ``compact_small_files`` (the plan lazily reads ``path``; an in-place
    overwrite would delete its own input mid-job). Local-filesystem swap
    here; on a cluster the identical rewrite is table-format ``OPTIMIZE``.
    Returns the post-compaction data file count.
    """
    import shutil

    from etl_hiscox_spark.operators.dedup import _require_local_index_path
    from etl_hiscox_spark.sources import genlog

    if genlog.is_generational(spark, path):
        # object-store form (r12): the compacted partitions stage as a
        # COMPLETE new generation (partitions first, centroids last) and
        # a pointer flip commits — no rename touches any data dir. Sizing
        # facts come from distributed_dir_stats (the fragmentation-stats
        # machinery), so the driver's share stays bounded by n_clusters.
        from pyarrow import fs as pafs

        from etl_hiscox_spark.sources.listing import (
            _dir_file_stats,
            _resolve_fs,
            distributed_dir_stats,
        )

        base, _live_gen = genlog.current_generation(spark, path)
        rec = genlog.read_pointer(genlog.resolve_root(spark, path), base)
        segs = [genlog._join(path, s) for s in genlog.pointer_segments(rec)]
        C = load_ivf_centroids(spark, segs[0], resolved=True)
        quantized = ivf_index_is_quantized(spark, segs[0], resolved=True)
        # sizing facts across EVERY live segment (OCC append deltas, r13):
        # the same cluster may hold files in several segments — sum them;
        # the merged output is one segment, the LSM compaction shape
        dirs = []
        for seg in segs:
            filesystem, seg_path = _resolve_fs(seg)
            for info in filesystem.get_file_info(
                pafs.FileSelector(seg_path, recursive=False)
            ):
                if info.type == pafs.FileType.Directory and info.base_name.startswith(
                    "__cluster="
                ):
                    dirs.append((int(info.base_name.split("=", 1)[1]), genlog._join(seg, info.base_name)))
        if not dirs:
            # FULLY-ERASED head (the readable-empty contract, fc6a9d5):
            # the zero-row placeholder generation has a geometry record —
            # proven by load_ivf_centroids above — but no __cluster=
            # partitions, and scheduled compaction landing on it must be
            # a no-op, not an error (ADVICE r13: erase-everything then
            # compact errored until an append or rebuild arrived)
            return 0
        sizes: dict[int, int] = {}
        for r in distributed_dir_stats(spark, dirs).collect():
            sizes[int(r["key"])] = sizes.get(int(r["key"]), 0) + int(r["total_bytes"])
        step = target_file_mb * 1024 * 1024
        n_files = {c: max(1, -(-b // step)) for c, b in sizes.items()}
        df = _read_ivf_segments(spark, segs)
        data_cols = [c for c in df.columns if c != "__cluster"]
        n_map = F.create_map(*[F.lit(x) for item in n_files.items() for x in item])
        salt = F.pmod(F.hash(*[F.col(c) for c in data_cols]), n_map[F.col("__cluster")])
        gen = genlog.new_generation_name()
        target = genlog._join(path, gen)
        (
            df.repartition(sum(n_files.values()), F.col("__cluster"), salt)
            .write.partitionBy("__cluster")
            .mode("error")
            .option("partitionOverwriteMode", "static")
            .parquet(target)
        )
        n_out = _dir_file_stats(target)[0]  # before centroids land
        _write_ivf_centroids(spark, target, C, quantized=quantized)
        # base captured at resolve time: a concurrent commit since then
        # (e.g. an erase) collides loudly instead of being undone
        genlog.commit_generation(
            spark, path, gen, "compact", base_version=base,
            geometry_id=rec.get("geometry_id"),
            txn_watermarks=rec.get("txn_watermarks"),
        )
        return n_out
    # driver-local paths only (ADVICE r10): the swap below is os.rename —
    # fail loudly BEFORE the Spark tmp write, never leak a __compact dir
    local = _require_local_index_path(spark, path, "compact_ivf_index")
    # validate the commit record first — compacting an interrupted index
    # must fail loudly, not re-materialize a centroid-less layout
    load_ivf_centroids(spark, path)
    sizes: dict[int, int] = {}
    for entry in os.listdir(local):
        if not entry.startswith("__cluster="):
            continue
        cdir = os.path.join(local, entry)
        sizes[int(entry.split("=", 1)[1])] = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(cdir)
            for f in files
            if f.endswith(".parquet")
        )
    if not sizes:
        # fully-erased flat index: geometry record present (validated
        # above), zero partitions — same no-op contract as the
        # generational branch (ADVICE r13)
        return 0
    step = target_file_mb * 1024 * 1024
    n_files = {c: max(1, -(-b // step)) for c, b in sizes.items()}
    df = spark.read.parquet(path)
    data_cols = [c for c in df.columns if c != "__cluster"]
    n_map = F.create_map(*[F.lit(x) for item in n_files.items() for x in item])
    # pmod already returns a non-negative result for negative hashes; an
    # abs() here would overflow loudly under ANSI mode (Spark 4 default)
    # on the one-in-2^32 row whose int32 hash is Integer.MIN_VALUE
    salt = F.pmod(F.hash(*[F.col(c) for c in data_cols]), n_map[F.col("__cluster")])
    tmp = path.rstrip("/") + "__compact"
    ltmp = local.rstrip("/") + "__compact"
    (
        df.repartition(sum(n_files.values()), F.col("__cluster"), salt)
        .write.partitionBy("__cluster")
        .mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .parquet(tmp)
    )
    shutil.copytree(os.path.join(local, "_centroids"), os.path.join(ltmp, "_centroids"))
    from etl_hiscox_spark.sources.writers import swap_and_refresh

    swap_and_refresh(spark, tmp, path)
    return sum(
        1
        for root, _, files in os.walk(local)
        for f in files
        if f.endswith(".parquet") and os.sep + "_centroids" not in root
    )


def erase_from_ivf_index(spark, path: str, keys: DataFrame, id_col: str) -> int:
    """Right-to-be-forgotten erasure INSIDE the IVF index layout: drop
    every indexed vector whose ``id_col`` appears in ``keys``; returns
    the number of rows erased.

    Table-level erasure (``sources/writers.erase_keys``) leaves index
    layouts retaining the erased payload — an index IS a copy of the
    data, so GDPR reaches it too. Erasure here touches ONLY the affected
    cluster partitions: the erase set semi-joins the index to find its
    clusters (a collect bounded by n_clusters ints), the kept rows of
    those partitions are staged to a tmp dir (the lazy plan reads
    ``path``, so an in-place overwrite would delete its own input), and
    each affected partition directory is swapped. Centroid geometry and
    every unaffected partition are untouched byte-for-byte — erasure is
    maintenance, it must never drift the index contract. A cluster whose
    rows are ALL erased simply loses its directory (an empty partition,
    which every probe handles). ``keys`` broadcasts (erasure requests
    are tiny next to the index).

    Commit protocol: ``_centroids`` is the index's commit record
    (:func:`load_ivf_centroids` rejects an index without it) — it is
    RENAMED ASIDE (atomic, byte-preserving) before the first partition
    swap and renamed back only after the last one lands, so a crash
    mid-loop leaves a loudly-rejected index, never a silently
    half-erased one (or one missing a cluster's kept rows — a vanished
    directory is indistinguishable from a legitimately fully-erased
    cluster). Rename, not delete: the geometry stays recoverable on disk
    (``_centroids__erase``) after a crash, and the centroid bytes are
    untouched by a successful erasure.
    """
    import shutil

    from etl_hiscox_spark.operators.dedup import _require_local_index_path
    from etl_hiscox_spark.sources import genlog

    if genlog.is_generational(spark, path):
        # object-store form (r12): the kept rows stage as a complete new
        # generation (partitions first, unchanged centroids last) and a
        # pointer flip commits. This rewrites the WHOLE index — the
        # pointer names one directory, so partial-generation reuse needs
        # file-level manifests (the Iceberg/Delta upgrade); batch erasure
        # requests so each flip amortizes like an OPTIMIZE. The flat
        # local layout below keeps the affected-partitions-only rewrite.
        base, _live_gen = genlog.current_generation(spark, path)
        root = genlog.resolve_root(spark, path)
        rec = genlog.read_pointer(root, base)
        seg_names = genlog.pointer_segments(rec)
        geom_seg = genlog._join(root, seg_names[0])
        C = load_ivf_centroids(spark, geom_seg, resolved=True)
        quantized = ivf_index_is_quantized(spark, geom_seg, resolved=True)
        # SELECTIVE segment rewrite (r13, the LSM payoff): an erased id
        # must vanish from the build segment AND every delta, but a
        # segment with NO hits is kept in the new pointer BY REFERENCE —
        # erase IO is proportional to the segments actually touched. A
        # rewrite whose kept set is EMPTY is dropped from the list (an
        # empty partitionBy write produces no readable files); if that
        # empties the whole list, one schema-preserving merged generation
        # is written so the geometry record survives (pre-r13 behavior
        # for a fully-erased index).
        k = F.broadcast(keys.select(F.col(id_col)).distinct())
        # ONE stats action for every segment instead of a sequential
        # hits-count (+ kept-empty check) per segment (r17, guide §2.6 /
        # §5: the per-action latency dominated multi-segment erases —
        # committed generations are immutable, so the stats and the
        # rewrites below read consistent bytes by construction)
        # first segment infers the schema, the rest reuse it (r18, guide
        # §6: per-call footer inference profiled ~80-230 ms; all live
        # segments share the layout by protocol — deltas carry a validated
        # copy of the geometry record — and a mismatch fails loudly at
        # scan time, never silently casts)
        seg_dfs = [spark.read.parquet(genlog._join(root, seg_names[0]))]
        schema = seg_dfs[0].schema
        seg_dfs += [
            spark.read.schema(schema).parquet(genlog._join(root, name))
            for name in seg_names[1:]
        ]
        if len(seg_dfs) == 1:
            # FUSED stats+rewrite for the single-segment head (r18, guide
            # §5 — mirrors the minhash erase): the anti-join rewrite job
            # reports total/kept via observe(), so the common erase pays
            # one action instead of stats-then-rewrite. A no-hit erase
            # abandons the staged tree (no centroid record written — the
            # crash-mid-stage state the protocol already rejects and
            # vacuum reclaims) and returns 0 with no commit; a fully-
            # erased segment falls through to the readable-empty branch
            # below exactly as the stats-first path does.
            from pyspark.sql import Observation

            o_tot, o_kept = Observation(), Observation()
            gen = genlog.new_generation_name()
            target = genlog._join(root, gen)
            kept_df = (
                seg_dfs[0]
                .observe(o_tot, F.count(F.lit(1)).alias("n"))
                .join(k, id_col, "left_anti")
                .observe(o_kept, F.count(F.lit(1)).alias("n"))
            )
            _write_ivf_partitions(kept_df, target)
            try:
                total = o_tot.get["n"] or 0
                n_kept = o_kept.get["n"] or 0
            except Exception:
                # a partitionBy write of ZERO rows plans zero tasks, so
                # the CollectMetrics row never materializes and the
                # metric fetch throws (pinned by the fully-erased tests)
                # — every segment row was erased (or the segment was
                # empty); one bounded count resolves which
                total = seg_dfs[0].count()
                n_kept = 0
            n_erased = total - n_kept
            if n_erased == 0 or n_kept == 0:
                # no hits (stage useless) OR fully erased (a partitionBy
                # write of an empty frame leaves no readable files) —
                # drop the stage either way
                try:
                    fs_, p_ = genlog._fs(target)
                    fs_.delete_dir(p_)
                except (FileNotFoundError, OSError):
                    pass
                if n_erased == 0:
                    return 0
                # fully-erased index: write the READABLE zero-row
                # dataset + geometry record (same as the stats-first
                # path's empty-list branch)
                gen = genlog.new_generation_name()
                target = genlog._join(root, gen)
                local_rows_df(spark, [], seg_dfs[0].schema).write.mode(
                    "error"
                ).parquet(target)
                _write_ivf_centroids(spark, target, C, quantized=quantized)
                genlog.commit_generation(
                    spark, path, gen, "erase", base_version=base,
                    segments=[gen],
                    geometry_id=rec.get("geometry_id"),
                    txn_watermarks=rec.get("txn_watermarks"),
                )
                return n_erased
            _write_ivf_centroids(spark, target, C, quantized=quantized)
            genlog.commit_generation(
                spark, path, gen, "erase", base_version=base,
                segments=[gen],
                geometry_id=rec.get("geometry_id"),
                txn_watermarks=rec.get("txn_watermarks"),
            )
            return n_erased
        stats = _segment_hit_stats(seg_dfs, k, id_col)
        n_erased = sum(h for _t, h in stats)
        if n_erased == 0:
            return 0
        new_segments = []
        first_rewritten: str | None = None
        rewrites: list[tuple[str, "DataFrame"]] = []
        for name, seg, (total, hits) in zip(seg_names, seg_dfs, stats):
            if hits == 0:
                new_segments.append(name)
                continue
            if total == hits:
                continue  # fully-erased segment: drops out of the list
            gen = genlog.new_generation_name()
            rewrites.append((gen, seg.join(k, id_col, "left_anti")))
            new_segments.append(gen)
            first_rewritten = first_rewritten or gen
        # hit segments rewrite to DISJOINT staged trees — independent
        # writes, overlapped from a small pool (guide §2.6); the single
        # pointer commit below is what publishes them, in order
        run_overlapped(
            [
                (
                    lambda g=gen, kd=kept_df: (
                        _write_ivf_partitions(kd, genlog._join(root, g)),
                        _write_ivf_centroids(
                            spark, genlog._join(root, g), C, quantized=quantized
                        ),
                    )
                )
                for gen, kept_df in rewrites
            ]
        )
        if not new_segments:
            # fully-erased index: a centroids-only tree is UNREADABLE
            # (review — probes/erases crash on schema inference and the
            # index is unrecoverable without a rebuild). Write a READABLE
            # zero-row dataset carrying the full schema (__cluster rides
            # as a plain column; Spark writes the schema file for an
            # empty NON-partitioned frame) plus the geometry record —
            # probes answer empty, appends stage deltas beside it, the
            # next compact drops it.
            gen = genlog.new_generation_name()
            target = genlog._join(root, gen)
            local_rows_df(spark, [], schema).write.mode("error").parquet(target)
            _write_ivf_centroids(spark, target, C, quantized=quantized)
            new_segments, first_rewritten = [gen], gen
        genlog.commit_generation(
            spark, path, first_rewritten or new_segments[0], "erase",
            base_version=base,
            segments=new_segments,
            geometry_id=rec.get("geometry_id"),
            txn_watermarks=rec.get("txn_watermarks"),
        )
        return n_erased
    # driver-local paths only (ADVICE r10): the partition swaps below are
    # os.rename — fail loudly BEFORE any Spark work, never leak __erase
    local = _require_local_index_path(spark, path, "erase_from_ivf_index")
    load_ivf_centroids(spark, path)  # loud on an uncommitted index
    idx = spark.read.parquet(path)
    k = F.broadcast(keys.select(F.col(id_col)).distinct())
    hits = idx.join(k, id_col, "left_semi").persist()
    try:
        n_erased = hits.count()
        if n_erased == 0:
            return 0
        affected = sorted(
            r["__cluster"] for r in hits.select("__cluster").distinct().collect()
        )
    finally:
        hits.unpersist(blocking=False)
    kept = idx.filter(F.col("__cluster").isin(affected)).join(k, id_col, "left_anti")
    tmp = path.rstrip("/") + "__erase"
    ltmp = local.rstrip("/") + "__erase"
    _write_ivf_partitions(kept, tmp)
    # invalidate the commit record before mutating any partition (see
    # docstring): rename aside, never delete — the only on-disk copy of
    # the geometry must survive a crash in the swap window (r10 review)
    cdir = os.path.join(local, "_centroids")
    cbak = os.path.join(local, "_centroids__erase")
    os.rename(cdir, cbak)
    for c in affected:
        dst = os.path.join(local, f"__cluster={c}")
        src = os.path.join(ltmp, f"__cluster={c}")
        shutil.rmtree(dst)
        if os.path.exists(src):  # fully-erased cluster: directory disappears
            os.rename(src, dst)
    shutil.rmtree(ltmp)
    os.rename(cbak, cdir)
    from etl_hiscox_spark.sources.writers import refresh_swapped_path

    refresh_swapped_path(spark, path)
    return n_erased


def rebuild_ivf_index(
    spark,
    path: str,
    embedding_col: str,
    id_col: str,
    n_clusters: int | None = None,
    seed: int = 42,
    train_fraction: float = 1.0,
    max_iter: int | None = None,
) -> np.ndarray:
    """Retrain a LIVE index's centroid geometry on its CURRENT corpus and
    re-materialize the cluster layout — the repair :func:`ivf_centroid_drift`
    triggers (documented rule: rebuild when a batch's mean nearest-centroid
    distance exceeds ~1.25x the indexed mean). Appends pin geometry forever
    by design, so after enough distribution shift the partitions stop
    separating the data and probe pruning quality decays; rebuilding
    re-fits k-means (sample-trainable via ``train_fraction``, the 100 TB
    path) over everything currently indexed and reassigns every row.
    VERDICT r10 item 1 — previously the diagnostic said WHEN to rebuild
    but the lifecycle had no HOW that kept the commit protocol.

    The rebuilt index contains exactly the live rows (payload preserved
    row-for-row; only ``__cluster`` labels change) with a fresh
    ``_centroids`` commit record; ``n_clusters=None`` keeps the current
    cluster count. Returns the new centroid matrix.

    Commit protocol (rename-aside, the same family as
    :func:`erase_from_ivf_index`): the COMPLETE new index is staged at
    ``<path>__rebuild`` — partitions first, centroids LAST, so the staged
    tree is itself a valid index only once finished — then two atomic
    renames: live → ``<path>__old``, staged → live; ``__old`` is removed
    last. Every crash window leaves either the untouched live index, or
    two complete indexes on disk with the live name absent (probes fail
    loudly on the missing path; ``dedup.recover_staged_rebuild``
    completes or rolls back the interrupted swap).
    There is never a half-valid index under the live name, and the
    pre-rebuild geometry stays on disk until the swap has fully landed.
    Driver-local paths only, like the other maintenance ops.
    """
    from etl_hiscox_spark.operators.dedup import (
        begin_staged_rebuild,
        commit_staged_rebuild,
    )
    from etl_hiscox_spark.sources import genlog

    if genlog.is_generational(spark, path):
        # object-store form (r12): the retrained index stages as a fresh
        # generation; the pointer flip replaces the two-rename swap with
        # one atomic commit, same crash guarantees, any filesystem
        base, _live_gen = genlog.current_generation(spark, path)
        rec = genlog.read_pointer(genlog.resolve_root(spark, path), base)
        segs = [genlog._join(path, s) for s in genlog.pointer_segments(rec)]
        old_C = load_ivf_centroids(spark, segs[0], resolved=True)
        k = int(n_clusters) if n_clusters is not None else int(old_C.shape[0])
        live_df = _read_ivf_segments(spark, segs).drop("__cluster")
        assigned, C = ivf_index(
            live_df, embedding_col, id_col, k, seed, train_fraction, max_iter
        )
        gen = genlog.new_generation_name()
        target = genlog._join(path, gen)
        _write_ivf_partitions(assigned, target)
        _write_ivf_centroids(spark, target, C, quantized="__codes" in live_df.columns)
        # a rebuild is a new geometry EPOCH: any append staged against the
        # old centroids must re-stage, which this fresh id makes loud
        genlog.commit_generation(
            spark, path, gen, "rebuild", base_version=base,
            geometry_id=genlog.new_geometry_id(),
            txn_watermarks=rec.get("txn_watermarks"),
        )
        return C

    # leftover check FIRST (r11 review): after a crash in the two-rename
    # swap window the live path is absent and load_ivf_centroids' "rebuild
    # with write_ivf_index" advice would direct the operator to orphan the
    # recovery copies — begin_staged_rebuild's leftover message is the
    # correct recovery (shared protocol with rebuild_minhash_index)
    tmp = begin_staged_rebuild(spark, path, "rebuild_ivf_index")
    old_C = load_ivf_centroids(spark, path)  # loud on an uncommitted index
    k = int(n_clusters) if n_clusters is not None else int(old_C.shape[0])
    live = spark.read.parquet(path).drop("__cluster")
    assigned, C = ivf_index(
        live, embedding_col, id_col, k, seed, train_fraction, max_iter
    )
    _write_ivf_partitions(assigned, tmp)
    # quantized layouts survive a rebuild: the __codes/__qscale columns
    # ride through ivf_index as ordinary payload, so the staged commit
    # record must carry the same flag for future appends
    _write_ivf_centroids(
        spark, tmp, C, quantized="__codes" in live.columns
    )
    commit_staged_rebuild(spark, path, "rebuild_ivf_index")
    return C


def ivf_fragmentation_stats(spark, path: str) -> DataFrame:
    """Observability twin of :func:`compact_ivf_index` — per-cluster file
    count and bytes of a written IVF index, so the compaction trigger is
    a queryable fact instead of an operator's guess (the same
    make-the-maintenance-signal-visible rule as
    :func:`ivf_centroid_drift` for rebuilds). Listing goes through the
    Hadoop FileSystem API, so it works identically on local paths and
    HDFS/S3A. Driver-side cost: one recursive LIST, n_clusters rows.

    Output: (cluster, n_files, total_bytes, avg_file_bytes) ordered by
    cluster. Rule of thumb documented on the compactor: compact when
    n_files per partition ≫ ceil(total_bytes / target_file_mb).

    Scale shape (VERDICT r10): the driver issues ONE non-recursive LIST
    (n_clusters entries — the same bound as every other centroid-table
    fact); the per-partition recursive walks, which grow with total file
    count, run on EXECUTORS (``sources/listing.distributed_dir_stats``)
    — at years-of-appends scale the old all-files driver walk was itself
    a stall.
    """
    from etl_hiscox_spark.sources.genlog import live_index_paths
    from etl_hiscox_spark.sources.listing import distributed_dir_stats

    paths = live_index_paths(spark, path)
    load_ivf_centroids(spark, paths[0], resolved=True)  # loud on an uncommitted index
    sc = spark.sparkContext
    dirs: list[tuple[int, str]] = []
    for p in paths:  # every live segment (OCC append deltas, r13)
        jpath = sc._jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
        for st in fs.listStatus(jpath):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith("__cluster="):
                dirs.append((int(name.split("=", 1)[1]), st.getPath().toString()))
    if not dirs:
        raise ValueError(f"no __cluster= partitions under {path!r} — not a written IVF index")
    stats = distributed_dir_stats(spark, dirs)
    return (
        stats.groupBy(F.col("key").alias("cluster"))
        .agg(
            F.sum("n_files").alias("n_files"),
            F.sum("total_bytes").alias("total_bytes"),
        )
        .select(
            "cluster",
            "n_files",
            "total_bytes",
            (F.col("total_bytes").cast("double") / F.col("n_files")).alias(
                "avg_file_bytes"
            ),
        )
        .orderBy("cluster")
    )


def ivf_centroid_drift(
    spark,
    path: str,
    batch_df: DataFrame,
    embedding_col: str,
    index_fraction: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Distribution-drift diagnostic for an IVF index's pinned geometry.

    :func:`append_to_ivf_index` assigns every batch to the BUILD-TIME
    centroids forever — correct by design (re-clustering is an explicit
    rebuild), but a shifted embedding distribution silently degrades how
    well those centroids partition the data, and with it probe pruning
    quality (VERDICT r9). This measures that drift observably: for the
    indexed corpus and for ``batch_df``, the mean / median / p90 distance
    of each vector to its NEAREST pinned centroid. A batch whose
    assignment distances sit well above the build-time distribution is
    the rebuild trigger — documented threshold: rebuild when the batch
    mean exceeds ~1.25× the indexed mean (a 25% inflation of mean
    quantization error roughly halves the recall-per-probe budget on
    isotropic data; tune per corpus).

    Engine-portable determinism: per-row distances are rounded to 6 dp
    BEFORE aggregating (so both engines aggregate identical doubles —
    ulp-level drift between numpy's BLAS dot and a SQL replay's
    sequential sum can never reach the aggregates), and the aggregates
    re-rounded to 6 dp. One Arrow pass per side, no shuffle beyond the
    2-group aggregate.

    Malformed rows (NULL / wrong-dim / NaN embeddings) are NOT silently
    dropped — a broken upstream embedder is the most likely real cause of
    "drift", so each side reports its ``n_malformed`` count (r10 review);
    the distance stats cover the well-formed rows.

    ``index_fraction < 1.0`` scores a seeded SAMPLE of the indexed side —
    the routine-monitoring form at 100 TB (the build-time distance
    distribution is stable, so a 1% sample pins the baseline; the batch
    side is always scored in full, it IS the thing under test).

    Output: one row per side — (side, n_vectors, n_malformed, mean_dist,
    median_dist, p90_dist).
    """
    if not (0.0 < index_fraction <= 1.0):
        raise ValueError(f"index_fraction must be in (0, 1], got {index_fraction}")
    from etl_hiscox_spark.sources.genlog import live_index_paths

    paths = live_index_paths(spark, path)
    C = load_ivf_centroids(spark, paths[0], resolved=True)

    def nearest_dist(col: Column) -> Column:
        @F.pandas_udf("double")
        def _dist(embs: pd.Series) -> pd.Series:
            if not len(embs):
                return pd.Series([], dtype="float64")
            # shared kernel with cluster assignment (_nearest_centroid_col)
            # so reported distances can never disagree with the distances
            # assignment actually used
            valid, d = _centroid_distance_grid(C, embs)
            # clip tiny negative float noise before sqrt
            best = np.sqrt(np.clip(d.min(axis=1), 0.0, None))
            return pd.Series(np.where(valid, best, np.nan))

        # asNondeterministic: __d feeds several aggregate branches; without
        # the marker Catalyst may clone the ArrowEvalPython node and score
        # every row twice (same fix as cosine_scores_pandas, plan-pinned).
        return F.round(_dist.asNondeterministic()(col), 6)

    idx = _read_ivf_segments(spark, paths)
    if index_fraction < 1.0:
        idx = idx.sample(fraction=index_fraction, seed=seed)
    indexed = idx.select(
        F.lit("indexed").alias("side"),
        nearest_dist(F.col(embedding_col)).alias("__d"),
    )
    batch = batch_df.select(
        F.lit("batch").alias("side"),
        nearest_dist(F.col(embedding_col)).alias("__d"),
    )
    # NaN (malformed) -> NULL so every aggregate below skips them natively
    both = indexed.unionByName(batch).select(
        "side",
        F.when(F.isnan("__d"), F.lit(None)).otherwise(F.col("__d")).alias("__dv"),
    )
    return both.groupBy("side").agg(
        F.count("__dv").alias("n_vectors"),
        (F.count(F.lit(1)) - F.count("__dv")).alias("n_malformed"),
        F.round(F.avg("__dv"), 6).alias("mean_dist"),
        F.round(F.expr("percentile(__dv, 0.5)"), 6).alias("median_dist"),
        F.round(F.expr("percentile(__dv, 0.9)"), 6).alias("p90_dist"),
    )


def ivf_probe_topk(
    spark,
    path: str,
    centroids: np.ndarray | None,
    embedding_col: str,
    id_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k over a written IVF index: pick the ``n_probe`` nearest
    centroids driver-side ((n_clusters, dim) matvec — microseconds), then
    scan ONLY those cluster partitions. The ``__cluster`` IN-filter is a
    partition filter, so unprobed partitions are never opened (plan-gated
    in tests — the same pruning a date-partitioned fact table gets).

    ``centroids=None`` loads the geometry persisted INSIDE the index
    (:func:`load_ivf_centroids`) — the deployment form: probes read their
    parameters from the index, never from the caller."""
    from etl_hiscox_spark.sources.genlog import live_index_paths

    paths = live_index_paths(spark, path)
    if centroids is None:
        centroids = load_ivf_centroids(spark, paths[0], resolved=True)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    cn = centroids / np.clip(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12, None)
    probe = [int(p) for p in np.argsort(-(cn @ qn))[:n_probe]]
    candidates = _read_ivf_segments(spark, paths).filter(
        F.col("__cluster").isin(probe)
    )
    return cosine_topk(candidates, embedding_col, id_col, query_vec, k)


def ivf_probe_topk_quantized(
    spark,
    path: str,
    embedding_col: str,
    id_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    rerank_factor: int = 3,
) -> DataFrame:
    """Top-k over a quantized IVF index (``write_ivf_index(quantize=True)``)
    — the composed 100 TB probe path: partition pruning picks the
    ``n_probe`` nearest clusters, the candidate scan reads the STORED
    int8 codes column only (parquet column pruning: the float embeddings
    are not touched — ~4x less scan IO; plan-gated in tests), candidates
    rank by exact integer code-cosine (bit-reproducible, no float
    summation-order noise), and only the ``rerank_factor * k`` shortlist
    fetches its float vectors (an id IN-literal that pushes down to the
    parquet scan for row-group skipping) for the exact rerank.

    The scale cancels out of the code cosine, so scoring never reads
    ``__qscale``; the query vector quantizes driver-side with the SAME
    rounding convention as the stored codes (:func:`_int8_query_codes`).
    Output: (id, approx_cos, exact_cos, rank) — :func:`quantized_topk`'s
    contract, with the corpus scan swapped from float32 re-quantization
    to the stored representation. The shortlist collect is bounded
    (rerank_factor * k rows — the MMR-shortlist class of driver scalar).
    """
    import math

    from etl_hiscox_spark.sources.genlog import live_index_paths

    paths = live_index_paths(spark, path)
    C = load_ivf_centroids(spark, paths[0], resolved=True)
    q = [float(x) for x in query_vec]
    qn = np.asarray(q) / np.linalg.norm(q)
    cn = C / np.clip(np.linalg.norm(C, axis=1, keepdims=True), 1e-12, None)
    probe = [int(p) for p in np.argsort(-(cn @ qn))[:n_probe]]

    idx = _read_ivf_segments(spark, paths)
    if "__codes" not in idx.columns:
        raise ValueError(
            f"IVF index at {path!r} has no __codes column — build it with "
            "write_ivf_index(quantize=True) or probe with ivf_probe_topk"
        )
    qarr = np.asarray(_int8_query_codes(q), dtype=np.int64)
    sqrt_nq = math.sqrt(float(qarr @ qarr))

    @F.pandas_udf("double")
    def _cscore(codes: pd.Series) -> pd.Series:
        if not len(codes):
            return pd.Series([], dtype="float64")
        mat = np.vstack(
            [np.asarray(c, dtype=np.int64) for c in codes.to_numpy()]
        )
        dotq = mat @ qarr
        nc = np.einsum("ij,ij->i", mat, mat)
        denom = np.sqrt(nc.astype(np.float64)) * sqrt_nq
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(denom > 0, dotq / denom, np.nan)
        return pd.Series(out)

    pruned = idx.filter(F.col("__cluster").isin(probe))
    scored = pruned.select(
        F.col(id_col),
        # asNondeterministic: same Catalyst-cloning guard as quantized_topk
        _cscore.asNondeterministic()(F.col("__codes")).alias("approx_cos"),
    ).filter(F.col("approx_cos").isNotNull() & ~F.isnan("approx_cos"))
    shortlist = scored.orderBy(
        F.col("approx_cos").desc(), F.col(id_col).asc()
    ).limit(rerank_factor * k).collect()
    # id type comes from the index schema, never hardcoded — the same
    # generic-id rule as mmr_topk (r11 review: a string-id index would
    # crash a 'long'-typed literal frame)
    from pyspark.sql import types as T

    id_field = idx.schema[id_col]
    if not shortlist:
        return local_rows_df(
            spark,
            [],
            T.StructType(
                [
                    T.StructField(id_col, id_field.dataType),
                    T.StructField("approx_cos", T.DoubleType()),
                    T.StructField("exact_cos", T.DoubleType()),
                    T.StructField("rank", T.IntegerType()),
                ]
            ),
        )
    ids = [r[id_col] for r in shortlist]
    approx = local_rows_df(
        spark,
        [(r[id_col], float(r["approx_cos"])) for r in shortlist],
        T.StructType(
            [
                T.StructField(id_col, id_field.dataType),
                T.StructField("approx_cos", T.DoubleType()),
            ]
        ),
    )
    qdlit = _as_double_literal_array(q)
    fetched = (
        pruned.filter(F.col(id_col).isin(ids))  # pushed-down row-group skip
        .select(id_col, F.col(embedding_col).cast("array<double>").alias("_v"))
        .join(F.broadcast(approx), id_col)
    )
    rer = fetched.select(
        id_col, "approx_cos", cosine(F.col("_v"), qdlit).alias("exact_cos")
    )
    w = Window.orderBy(F.col("exact_cos").desc(), F.col(id_col).asc())
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("rank")
    )


def blocked_cosine_pairs_pandas(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    block_col: str,
    threshold: float = 0.3,
) -> DataFrame:
    """All within-block pairs (id_a < id_b) with cosine above ``threshold``,
    computed per block as ONE BLAS matrix product (``applyInPandas``).

    This is the scale form of blocked near-pair search: the per-pair cost
    of an expression-level dot product is O(dim) *interpreted* array work
    × O(block²) pairs; here each block becomes a single ``mat @ mat.T``
    (Arrow in, numpy/BLAS inside, pairs-above-threshold out — the n²×dim
    intermediate never crosses the JVM↔Python boundary). Rows are sorted
    by id inside each block so output is deterministic. Blocks must fit a
    worker's memory (n_block² doubles) — for the 100 TB deployment keep
    blocks ≤ ~50k vectors and split hot blocks upstream (salt + merge, or
    IVF-subcluster them).
    """
    from pyspark.sql import types as T

    id_field = df.schema[id_col]
    blk_field = df.schema[block_col]
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_field.dataType),
            T.StructField("id_b", id_field.dataType),
            T.StructField(block_col, blk_field.dataType),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def emit_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        n = len(pdf)
        empty = pd.DataFrame(
            {"id_a": [], "id_b": [], block_col: [], "cosine_sim": []}
        )
        if n < 2:
            return empty
        # Guarded stack: malformed embedding cells become NaN rows, whose
        # pair sims are NaN and never pass `vals > threshold` below.
        mat = _stack_embeddings(pdf[embedding_col])
        norms = np.linalg.norm(mat, axis=1)
        denom = np.outer(norms, norms)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = np.where(denom > 0, (mat @ mat.T) / denom, np.nan)
        ia, ib = np.triu_indices(n, k=1)
        vals = sims[ia, ib]
        keep = vals > threshold  # NaN (zero-norm) never passes
        if not keep.any():
            return empty
        ids = pdf[id_col].to_numpy()
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                block_col: pdf[block_col].iloc[0],
                "cosine_sim": vals[keep],
            }
        )

    emb_double = F.transform(F.col(embedding_col), lambda x: x.cast("double"))
    # A null block key would still form an applyInPandas group, but the
    # self-equi-join this operator replaces never matches nulls — keep the
    # two formulations interchangeable.
    prepared = df.filter(F.col(block_col).isNotNull()).select(
        F.col(id_col), F.col(block_col), emb_double.alias(embedding_col)
    )
    return prepared.groupBy(block_col).applyInPandas(emit_pairs, schema=out_schema)


def batch_cosine_topk_pandas(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    query_matrix: np.ndarray,
    k: int = 10,
) -> DataFrame:
    """Many-query scoring with an Arrow-batched pandas UDF (vectorized
    numpy matmul per batch) — the 10-100× faster path vs row-at-a-time
    Python when expressions can't amortize multiple queries.

    Returns (query_idx, id, cosine_sim, rank) for each query row.
    """
    from pyspark.sql.types import ArrayType, DoubleType

    qm = np.asarray(query_matrix, dtype=np.float64)
    qm_norm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    n_queries = qm.shape[0]
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(qm_norm)

    @F.pandas_udf(ArrayType(DoubleType()))
    def sims(embs: pd.Series) -> pd.Series:
        mat = _stack_embeddings(embs, dim=qm.shape[1])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            # zero-norm AND malformed (NaN-row) cells -> all-0 sims
            mat = np.where(norms > 0, mat / norms, 0.0)
        scores = mat @ bc.value.T  # (batch, n_queries)
        return pd.Series(list(scores))

    scored = df.select(F.col(id_col), sims(F.col(embedding_col)).alias("__s"))
    exploded = scored.select(
        id_col,
        F.posexplode(F.col("__s")).alias("query_idx", "cosine_sim"),
    ).filter(F.col("query_idx") < n_queries)
    w = Window.partitionBy("query_idx").orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
    return (
        exploded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def semantic_dedup(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    block_col: str,
    threshold: float = 0.3,
) -> DataFrame:
    """Semantic (embedding-space) deduplication: drop all but one document
    from every cluster of cosine-similar embeddings (SemDeDup pattern —
    Abbas et al. 2023, arXiv:2303.09540).

    Composition of existing scale primitives, nothing bespoke:
    1. within-block near pairs via one BLAS matmul per block
       (:func:`blocked_cosine_pairs_pandas` — pairs never form globally);
    2. transitive closure via iterative min-label propagation
       (:func:`...dedup.connected_components` — O(cluster diameter) rounds);
    3. keeper = min id per component, dropped via one left-anti join.

    At 100 TB the block key is an IVF/k-means cluster id written as a
    partition column; here any low-cardinality column works (label).
    """
    from etl_hiscox_spark.operators.dedup import connected_components

    pairs = blocked_cosine_pairs_pandas(df, embedding_col, id_col, block_col, threshold)
    comp = connected_components(pairs.select("id_a", "id_b"))
    drops = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drops, on=id_col, how="left_anti")


def _half_up(y: np.ndarray) -> np.ndarray:
    """Exact vectorized ROUND_HALF_UP (away from zero) for |y| < 2^52.

    frac = |y| - floor(|y|) is EXACT in float64 (both operands lie on the
    same binade grid), so the >= 0.5 comparison is the true tie-break —
    matching Spark's F.round and DuckDB's round() on the exact binary
    value. np.round would be half-even; floor(|y|+0.5) misrounds doubles
    one ulp below a half (the +0.5 addition itself rounds up). Parity
    pinned in tests/test_dedup_similarity.py.
    """
    a = np.abs(y)
    fl = np.floor(a)
    r = fl + (a - fl >= 0.5)
    return (np.sign(y) * r).astype(np.int64)


def _int8_query_codes(q: list[float]) -> list[int]:
    """Driver-side symmetric int8 quantization of ONE query vector —
    Decimal HALF_UP on the exact binary value, identical to Spark's
    F.round and DuckDB's round(); floor(x+0.5) would misround doubles
    just below a half (the +0.5 addition itself rounds up). Shared by
    :func:`quantized_topk` and :func:`ivf_probe_topk_quantized` so the
    two scan paths can never quantize the query differently."""
    import decimal

    qscale = max((abs(x) for x in q), default=0.0) / 127.0
    if qscale == 0:
        return [0] * len(q)
    return [
        int(
            decimal.Decimal(x / qscale).quantize(
                decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
            )
        )
        for x in q
    ]


def quantized_topk(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    rerank_factor: int = 3,
) -> DataFrame:
    """Int8 scalar-quantized ANN: integer-dot candidate scan + exact rerank.

    Stage 1 scores EVERY row with the quantized cosine: codes are symmetric
    per-vector int8 (round(x / (max|x|/127)), HALF_UP — the
    ``vectors.quantize_int8`` formula, vectorized in the Arrow tier), and
    dot/norms over codes are exact int64 arithmetic, so the candidate
    ranking is bit-reproducible across engines (no float summation-order
    noise). Stage 2 re-scores only ``rerank_factor * k`` candidates with
    the exact float cosine and emits the final top-k.

    Output: (id, approx_cos, exact_cos, rank) — approx_cos kept so recall
    regressions are visible in the result itself.

    At 100 TB this split is the point: the int8 codes are what the
    deployment stores and scans (4x less IO than float32, SIMD-friendly
    integer dot in an Arrow/BLAS tier), while the float vectors are fetched
    for a constant rerank_factor*k rows only. Plan here: scan → project →
    filter → TakeOrderedAndProject(rerank_factor*k) → single tiny-task
    rerank — no shuffle of the corpus, no driver collect of candidates.
    """
    import math

    q = [float(x) for x in query_vec]
    qcodes = _int8_query_codes(q)
    nq = sum(c * c for c in qcodes)

    # Stage-1 scoring runs in the Arrow tier (one numpy pass per batch) —
    # the expression-tier fold form re-evaluated the O(d) scale fold per
    # element (interpreted lambdas + no CSE: the t27 finding, O(d²)/row)
    # and even staged projections get re-collapsed by CollapseProject.
    # Integer arithmetic is exact in numpy int64, so the candidate ranking
    # stays bit-reproducible vs the SQL oracle; only the rounding needs
    # care — see _half_up below.
    qarr = np.asarray(qcodes, dtype=np.int64)
    sqrt_nq = math.sqrt(float(nq))

    @F.pandas_udf("double")
    def _qscore(embs: pd.Series) -> pd.Series:
        if not len(embs):
            return pd.Series([], dtype="float64")
        mat = _stack_embeddings(embs, dim=qarr.size)  # NaN rows for garbage
        scale = np.max(np.abs(mat), axis=1) / 127.0
        with np.errstate(divide="ignore", invalid="ignore"):
            y = mat / scale[:, None]
        ok = np.isfinite(y).all(axis=1)
        codes = np.zeros_like(mat, dtype=np.int64)
        if ok.any():
            codes[ok] = _half_up(y[ok])
        dotq = codes @ qarr
        nc = np.einsum("ij,ij->i", codes, codes)
        denom = np.sqrt(nc.astype(np.float64)) * sqrt_nq
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(ok & (denom > 0), dotq / denom, np.nan)
        return pd.Series(out)

    v = F.col(embedding_col).cast("array<double>")
    scored = df.select(
        F.col(id_col),
        v.alias("_v"),
        # asNondeterministic: same reason as cosine_scores_pandas — stop
        # Catalyst cloning the Arrow eval under both Filter and Project.
        _qscore.asNondeterministic()(v).alias("approx_cos"),
    ).filter(F.col("approx_cos").isNotNull() & ~F.isnan("approx_cos"))
    cand = scored.orderBy(F.col("approx_cos").desc(), F.col(id_col).asc()).limit(
        rerank_factor * k
    )
    qdlit = _as_double_literal_array(q)
    rer = cand.select(
        id_col,
        "approx_cos",
        cosine(F.col("_v"), qdlit).alias("exact_cos"),
    )
    w = Window.orderBy(F.col("exact_cos").desc(), F.col(id_col).asc())
    return (
        rer.orderBy(F.col("exact_cos").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "approx_cos", "exact_cos", F.row_number().over(w).alias("rank"))
    )
