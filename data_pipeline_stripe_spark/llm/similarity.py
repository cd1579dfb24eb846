"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the correctness baseline; IVF-style centroid
bucketing is the scale path (search only the probed bucket instead of the
full corpus — at 100 TB the bucket assignment is a broadcast join against
a small centroid table, and the per-bucket search reuses the same top-k
kernel).

All vector math happens JVM-side on array<double> via zip_with/aggregate —
no Python boundary. (A Pandas-UDF/numpy variant is a fair alternative; the
built-in lambda form keeps whole-stage codegen and needs no Arrow hop.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources.readers import empty_frame


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right dot product (deterministic FP association order —
    matches DuckDB's list_inner_product for the oracle)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    ``queries`` (small) is broadcast against the corpus — the corpus is
    never shuffled; ranking happens in one window per query. Ties broken
    on rounded similarity then neighbor id (fully deterministic).
    Returns (query_id, neighbor_id, similarity, rank).
    """
    corpus = emb.select(F.col(id_col).alias("neighbor_id"),
                        _as_double(vec_col).alias("cv"))
    qs = queries.select(F.col(id_col).alias("query_id"),
                        _as_double(vec_col).alias("qv"))
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    pairs = (
        corpus.join(F.broadcast(qs), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("similarity"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding",
               centroid_id_col: str = "centroid_id") -> DataFrame:
    """IVF bucket assignment: each vector goes to its max-cosine centroid
    (ties → smallest centroid id). Centroids are broadcast; one pass over
    the corpus, no shuffle of the vectors themselves.
    Returns (vec_id, cluster_id, similarity).
    """
    corpus = emb.select(F.col(id_col), _as_double(vec_col).alias("cv"))
    cents = centroids.select(F.col(centroid_id_col).alias("cluster_id"),
                             _as_double(vec_col).alias("qv"))
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    scored = corpus.join(F.broadcast(cents)).select(
        id_col, "cluster_id", sim.alias("similarity")
    )
    w = W.partitionBy(id_col).orderBy(F.col("similarity").desc(), F.col("cluster_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "cluster_id", "similarity")
    )


def hard_negatives(emb: DataFrame, queries: DataFrame,
                   centroids: DataFrame, k: int = 5,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the k
    most-similar corpus vectors that sit in a DIFFERENT semantic bucket
    (IVF cluster) than the query — similar enough to be hard, different
    enough to be negatives. Same-cluster vectors (the likely positives)
    are excluded BEFORE ranking, so every returned row is a negative.

    Shape: cluster assignment is one broadcast-centroid pass per side;
    similarity is the broadcast-queries brute-force kernel at test
    scale (swap in ivf_topk's probe path for a 100 TB corpus — the
    cluster filter composes unchanged). Returns
    (query_id, neighbor_id, query_cluster, neighbor_cluster,
    similarity, rank)."""
    assign = ivf_assign(emb, centroids, id_col, vec_col).select(
        F.col(id_col), F.col("cluster_id")
    )
    corpus = emb.select(F.col(id_col).alias("neighbor_id"),
                        _as_double(vec_col).alias("cv"))
    qs = queries.select(F.col(id_col).alias("query_id"),
                        _as_double(vec_col).alias("qv"))
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    pairs = (
        corpus.join(F.broadcast(qs),
                    F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("similarity"))
    )
    # Query clusters are assigned from the queries frame itself (one
    # more broadcast-centroid pass), NOT by joining the corpus-side
    # assignment — an inner join on query_id would silently drop any
    # query whose id is absent from ``emb``.
    qa = ivf_assign(queries, centroids, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("cluster_id").alias("query_cluster"),
    )
    na = assign.select(F.col(id_col).alias("neighbor_id"),
                       F.col("cluster_id").alias("neighbor_cluster"))
    w = W.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        pairs.join(F.broadcast(qa), "query_id")
        .join(na, "neighbor_id")
        .filter(F.col("neighbor_cluster") != F.col("query_cluster"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "query_cluster",
                "neighbor_cluster", "similarity", "rank")
    )


def ivf_probe_assign(emb: DataFrame, centroids: DataFrame, n_probes: int = 1,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     centroid_id_col: str = "centroid_id") -> DataFrame:
    """Multi-probe IVF assignment: each vector goes to its ``n_probes``
    highest-cosine centroid buckets (ties → smallest centroid id).
    Centroids broadcast, one pass over the corpus. Returns
    (vec_id, cluster_id) — up to n_probes rows per vector."""
    corpus = emb.select(F.col(id_col), _as_double(vec_col).alias("cv"))
    cents = centroids.select(F.col(centroid_id_col).alias("cluster_id"),
                             _as_double(vec_col).alias("qv"))
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    scored = corpus.join(F.broadcast(cents)).select(
        id_col, "cluster_id", sim.alias("c_sim")
    )
    w = W.partitionBy(id_col).orderBy(F.col("c_sim").desc(), F.col("cluster_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_probes)
        .select(id_col, "cluster_id")
    )


def ivf_topk(emb: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: int = 5, n_probes: int = 1, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF-bucketed approximate top-k: the corpus is assigned to its
    nearest centroid bucket; each query probes its ``n_probes`` nearest
    buckets and runs exact top-k only there. Recall rises with probes at
    linear cost — the standard IVF trade. Returns
    (query_id, neighbor_id, similarity, rank)."""
    assign = ivf_assign(emb, centroids, id_col, vec_col)
    corpus = (
        emb.join(assign.select(id_col, "cluster_id"), id_col)
        .select(F.col(id_col).alias("neighbor_id"),
                F.col("cluster_id"), _as_double(vec_col).alias("cv"))
    )
    # queries probe their n nearest centroids (not just the argmax)
    cents = centroids.select(F.col("centroid_id").alias("cluster_id"),
                             _as_double(vec_col).alias("qv2"))
    q_scored = (
        queries.select(F.col(id_col), _as_double(vec_col).alias("qv"))
        .join(F.broadcast(cents))
        .withColumn("c_sim", F.round(cosine(F.col("qv2"), F.col("qv")), 6))
    )
    wp = W.partitionBy(id_col).orderBy(F.col("c_sim").desc(), F.col("cluster_id"))
    qs = (
        q_scored.withColumn("probe", F.row_number().over(wp))
        .filter(F.col("probe") <= n_probes)
        .select(F.col(id_col).alias("query_id"), "cluster_id", "qv")
    )
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    pairs = (
        corpus.join(F.broadcast(qs), "cluster_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("similarity"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_topk_pruned(emb: DataFrame, queries: DataFrame, centroids: DataFrame,
                    k: int = 5, n_probes: int = 2, id_col: str = "vec_id",
                    vec_col: str = "embedding", dim: int = 64,
                    centroid_id_col: str = "centroid_id") -> DataFrame:
    """``ivf_topk`` with a COARSE PRE-QUANTIZER on the query side: queries
    reach their probe centroids through a keyed equi-join on RP-LSH band
    keys instead of scoring every centroid (ivf_topk's query×centroid
    broadcast cross — fine for probe workloads, O(q·C) rows for
    million-query batches against a 100k-centroid table at 10B vectors).

    Routing: centroids and queries both compute the deterministic
    32-plane RP signature (scan-speed expression, planes constant-folded
    — rp_lsh_signatures), explode into 8 band keys, and candidates are
    the centroids sharing ≥1 band key with the query — a hash join on
    (band_idx, band_key), no cross. Candidates are then scored exactly
    and the best ``n_probes`` become the probe set; the bucket search
    tail is identical to ivf_topk. The plan's ONLY remaining cross is
    the corpus→centroid assignment (the IVF build cost, shared by every
    IVF variant and amortized across query batches by persisting
    ``ivf_assign``; pinned by tests/test_plans.py).

    Trade: a query sharing no band key with any centroid gets NO results
    (P ≈ miss_rate^8, ~0.03 % at 16 centroids/16-key bands) —
    deterministic, oracle-mirrorable, and the standard coarse-quantizer
    recall trade. Band width should scale ≈ log2(C) so expected
    candidates per band stay O(1).
    """
    assign = ivf_assign(emb, centroids, id_col, vec_col, centroid_id_col)
    corpus = (
        emb.join(assign.select(id_col, "cluster_id"), id_col)
        .select(F.col(id_col).alias("neighbor_id"), "cluster_id",
                _as_double(vec_col).alias("cv"))
    )
    n_bands = RP_N_PLANES // RP_BAND_BITS

    def band_routes(df: DataFrame, src_id: str, out_id: str) -> DataFrame:
        sig = rp_lsh_signatures(df, dim=dim, id_col=src_id,
                                vec_col=vec_col)
        return sig.select(
            F.col(src_id).alias(out_id),
            F.explode(F.array(*[
                F.struct(F.lit(b).alias("band_idx"),
                         F.col(f"band_{b}").alias("band_key"))
                for b in range(n_bands)
            ])).alias("r"),
        ).select(out_id, "r.band_idx", "r.band_key")

    c_routes = band_routes(centroids, centroid_id_col, "cluster_id")
    q_routes = band_routes(queries, id_col, "query_id")
    cand = (
        q_routes.join(F.broadcast(c_routes), ["band_idx", "band_key"])
        .select("query_id", "cluster_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"),
                        _as_double(vec_col).alias("qv"))
    cvp = centroids.select(F.col(centroid_id_col).alias("cluster_id"),
                           _as_double(vec_col).alias("pv"))
    wp = W.partitionBy("query_id").orderBy(
        F.col("c_sim").desc(), F.col("cluster_id")
    )
    probes = (
        cand.join(qv, "query_id").join(F.broadcast(cvp), "cluster_id")
        .withColumn("c_sim", F.round(cosine(F.col("qv"), F.col("pv")), 6))
        .withColumn("probe", F.row_number().over(wp))
        .filter(F.col("probe") <= n_probes)
        .select("query_id", "cluster_id", "qv")
    )
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    pairs = (
        corpus.join(F.broadcast(probes), "cluster_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("similarity"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


QUERY_CHUNK_ROWS = 8192


def brute_force_topk_pandas(emb: DataFrame, queries: DataFrame, k: int = 5,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            quant: int | None = None,
                            chunk_rows: int = QUERY_CHUNK_ROWS) -> DataFrame:
    """Same semantics as ``brute_force_topk``, implemented as an
    Arrow-batched ``mapInPandas`` numpy kernel: the (small) query matrix is
    a broadcast variable; each corpus partition streams through a single
    matrix-matrix product. This is the pattern for vector math too wide
    for expression codegen — per-batch BLAS instead of per-row Python.
    Returns (query_id, neighbor_id, similarity, rank).

    ``quant`` selects the determinism mode. None → float64 BLAS: fastest,
    but summation order inside the matmul makes the last ulp (and a
    similarity sitting on a round boundary) platform-dependent, so there
    is no cross-engine oracle. An integer (e.g. ``RP_QUANT``) → vectors
    quantize to integer ``1/quant``-ths and the dot products run as int64
    matmuls: every partial is an integer below 2^53, so the result is
    EXACT and order-independent — bit-identical to any other engine that
    quantizes the same way (the RP-LSH signature trick applied to the
    dense kernel), at the cost of the non-BLAS integer matmul path.

    The query side is pulled through ``toLocalIterator`` in bounded
    ``chunk_rows`` slices — the driver never materializes more than one
    chunk of query VECTORS (there is NO ``collect()`` on this path), so
    an oversized query batch degrades into several corpus passes
    instead of a driver OOM. ``toLocalIterator`` itself holds ONE
    PARTITION of the source on the JVM driver, so the query side is
    first repartitioned to ~``chunk_rows``-sized partitions — without
    that, a single-partition 10M-row query frame would OOM the driver
    before the first chunk. The sizing count runs against a DISK_ONLY-
    persisted copy of the projected query frame (the count IS the cache
    fill, not an extra source scan) — that cache costs O(query set) of
    cluster DISK for the duration of the run (the price of not
    re-scanning the source per chunk), but no executor or driver
    MEMORY. Each chunk's top-k is materialized EAGERLY
    (``localCheckpoint``) and its query-matrix broadcast destroyed
    before the next chunk starts — cleanup runs in a ``finally`` so a
    mid-chunk task failure cannot leak the cache or an in-flight
    broadcast — so at any moment the MEMORY footprint is one chunk's
    broadcast + the (k rows per query) checkpointed results: O(chunk +
    result), never O(all query vectors) of memory. Each chunk contains
    a disjoint set of query ids, so the
    per-query rank windows are chunk-invariant and the union of chunk
    results equals the single-pass result exactly. Query batches large
    enough to make multiple corpus passes hurt should use the keyed
    routing of ``ivf_topk_pruned`` instead — this function is the
    correctness baseline."""
    import math

    import numpy as np
    import pandas as pd

    spark = emb.sparkSession

    from pyspark import StorageLevel

    # DISK_ONLY: the cache trades one avoided source re-scan per chunk
    # for O(query set) of cluster disk — deliberately NOT memory, so the
    # kernel's memory bound stays O(chunk) however big the query set is
    q_src = queries.select(id_col, vec_col).persist(StorageLevel.DISK_ONLY)

    def _chunks():
        # the count fills the cache it will iterate — one source scan
        n_parts = max(1, math.ceil(q_src.count() / chunk_rows))
        buf = []
        for r in q_src.repartition(n_parts).toLocalIterator():
            buf.append(r)
            if len(buf) >= chunk_rows:
                yield buf
                buf = []
        if buf:
            yield buf

    chunk_tops = []
    bc = None
    try:
        for q_rows in _chunks():
            q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
            q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
            if quant is None:
                q_mat = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
                q_norms = None
            else:
                # Half-away-from-zero, matching Spark F.round / DuckDB ROUND
                # (np.round is half-even).
                q_mat = (np.sign(q_mat)
                         * np.floor(np.abs(q_mat) * quant + 0.5)).astype(np.int64)
                q_norms = (q_mat * q_mat).sum(axis=1)
            bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norms))

            def score(batches, _bc=bc):
                ids, mat, qn = _bc.value
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    c = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                    if quant is None:
                        c /= np.linalg.norm(c, axis=1, keepdims=True)
                        sims = c @ mat.T  # (batch, n_queries)
                    else:
                        ci = (np.sign(c)
                              * np.floor(np.abs(c) * quant + 0.5)).astype(np.int64)
                        cn = (ci * ci).sum(axis=1)
                        dots = ci @ mat.T  # int64: exact, order-independent
                        sims = dots / np.sqrt(
                            cn[:, None].astype(np.float64)
                            * qn[None, :].astype(np.float64)
                        )
                    n, m = sims.shape
                    yield pd.DataFrame({
                        "query_id": np.tile(ids, n),
                        "neighbor_id": np.repeat(pdf[id_col].to_numpy(), m),
                        "similarity": np.round(sims.reshape(-1), 6),
                    })

            pairs = emb.select(id_col, vec_col).mapInPandas(
                score, "query_id long, neighbor_id long, similarity double"
            ).filter(F.col("query_id") != F.col("neighbor_id"))
            w = W.partitionBy("query_id").orderBy(
                F.col("similarity").desc(), F.col("neighbor_id")
            )
            top = (
                pairs.withColumn("rank", F.row_number().over(w).cast("long"))
                .filter(F.col("rank") <= k)
            )
            # materialize THIS chunk's top-k now and cut its lineage, so the
            # chunk's query-matrix broadcast can be released immediately —
            # without this, every chunk's broadcast stays referenced by the
            # lazily-unioned plan until the caller evaluates it, and the
            # aggregate driver/executor footprint scales with the FULL
            # query set instead of one chunk
            top = top.localCheckpoint(eager=True)
            bc.destroy()
            bc = None
            chunk_tops.append(top)
    finally:
        # a mid-chunk failure must not leak the disk cache or the
        # in-flight chunk's broadcast for the life of the session
        if bc is not None:
            bc.destroy()
        q_src.unpersist()
    if not chunk_tops:
        return empty_frame(
            emb.sparkSession,
            "query_id long, neighbor_id long, similarity double,"
            " rank long")
    out = chunk_tops[0]
    for extra in chunk_tops[1:]:
        out = out.unionByName(extra)
    return out


def kmeans_step(emb: DataFrame, centroids: DataFrame,
                id_col: str = "vec_id", vec_col: str = "embedding",
                centroid_id_col: str = "centroid_id") -> DataFrame:
    """One Lloyd iteration, exploded to scalar rows: assign every vector
    to its max-cosine centroid (ivf_assign), then emit the updated
    centroid coordinates as (cluster_id, pos, c) = per-dimension means.
    Iterative algorithms on Spark are a driver loop over exactly this
    step (each iteration: one broadcast + two shuffles); returning
    scalar rows keeps the result engine-comparable."""
    assign = ivf_assign(emb, centroids, id_col, vec_col, centroid_id_col)
    v = emb.select(F.col(id_col), _as_double(vec_col).alias("v"))
    return (
        v.join(assign.select(id_col, "cluster_id"), id_col)
        .select("cluster_id", F.posexplode("v").alias("pos0", "val"))
        .groupBy("cluster_id", (F.col("pos0") + 1).cast("long").alias("pos"))
        .agg(F.round(F.avg("val"), 6).alias("c"))
    )


def _attach_exact_cosine(cand: DataFrame, emb: DataFrame, threshold: float,
                         id_col: str, vec_col: str) -> DataFrame:
    """Re-attach vectors to (id_a, id_b) candidate pairs and keep pairs
    with exact rounded cosine >= threshold — the shared tail of every
    blocked near-dup path (IVF-bucketed, RP-LSH).

    Per-VECTOR self-dots are computed once (n rows) instead of once per
    candidate pair: sqrt(na*nb) multiplies the identical doubles, so the
    rounded cosine is bit-for-bit unchanged — only the per-pair work
    drops from 3 dots to 1."""
    v = emb.select(F.col(id_col), _as_double(vec_col).alias("v"))
    v = v.withColumn("n2", dot(F.col("v"), F.col("v")))
    va = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"),
                  F.col("n2").alias("na"))
    vb = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"),
                  F.col("n2").alias("nb"))
    sim = F.round(
        dot(F.col("va"), F.col("vb")) / F.sqrt(F.col("na") * F.col("nb")), 6
    )
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b", sim.alias("similarity"))
        .filter(F.col("similarity") >= threshold)
    )


def cosine_near_dup_pairs(emb: DataFrame, threshold: float = 0.45,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (upper triangle), exact.

    Brute force O(n²) — correct at any corpus size but quadratic cost, so
    it is the small-corpus baseline and the verification reference (the
    subset/recall test measures ``cosine_near_dup_bucketed`` against it).
    At 100 TB use ``cosine_near_dup_bucketed``. Returns
    (id_a, id_b, similarity).
    """
    v = emb.select(F.col(id_col), _as_double(vec_col).alias("v"))
    a = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    sim = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("similarity"))
        .filter(F.col("similarity") >= threshold)
    )


def cosine_near_dup_bucketed(emb: DataFrame, centroids: DataFrame,
                             threshold: float = 0.45, n_probes: int = 2,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs via IVF bucketing — the scale
    path (replaces the brute-force O(n²) upper-triangle join).

    Plan shape: multi-probe centroid assignment (centroids broadcast, one
    corpus pass) → keyed self-join on ``cluster_id`` (only within-bucket
    pairs are generated; bucket size ~ n/k, so candidate volume is
    n²/k·p² instead of n²) → exact cosine on the surviving pairs after
    re-attaching vectors with two id-keyed joins. No nested-loop join
    anywhere in the plan. Approximate by construction: a pair whose two
    vectors share none of their probed buckets is missed — recall rises
    with ``n_probes`` (and with centroid count at fixed bucket size, use
    k ≈ √n). Deterministic given fixed centroids, so an SQL oracle can
    mirror it exactly; recall vs ``cosine_near_dup_pairs`` is asserted by
    tests/test_llm_ops.py::test_cosine_near_dup_bucketed_subset_and_recall.
    Returns (id_a, id_b, similarity).
    """
    probes = ivf_probe_assign(emb, centroids, n_probes, id_col, vec_col)
    a, b = probes.alias("a"), probes.alias("b")
    cand = (
        a.join(b, (F.col("a.cluster_id") == F.col("b.cluster_id"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return _attach_exact_cosine(cand, emb, threshold, id_col, vec_col)


# Symmetric int8 quantization levels: |q| <= 127, one double scale per
# vector. Halves-to-even vs halves-away ambiguity is avoided entirely by
# defining the quantizer as floor(x/scale + 0.5) — floor of a double is
# exact and identical in every engine (see NOTES_r3: never ROUND a raw
# quotient).
INT8_LEVELS = 127


def quantize_int8(emb: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = max|x| / 127,
    q_i = floor(x_i/scale + 0.5). A 100 TB ANN corpus shuffles and stores
    4× fewer vector bytes (int8 vs float32) at <1% cosine error; the
    scale column rides along for dequantization. Zero vectors get
    scale 0 and an all-zero qvec (no division). Pure per-row expression
    math — scan speed, no shuffle, no Python. Returns
    (vec_id, scale, qvec array<long>)."""
    v = _as_double(vec_col)
    d = emb.select(F.col(id_col), v.alias("_v"))
    amax = F.array_max(F.transform(F.col("_v"), F.abs))
    d = d.withColumn("_s", amax / INT8_LEVELS)
    q = F.when(
        F.col("_s") == 0.0,
        F.transform(F.col("_v"), lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(F.col("_v"),
                    lambda x: F.floor(x / F.col("_s") + F.lit(0.5)))
    )
    # scale is floor-truncated for display (never ROUND a raw quotient:
    # the half-ulp boundary renders differently across engines — q2 trap)
    return d.select(F.col(id_col),
                    (F.floor(F.col("_s") * 1e9) / 1e9).alias("scale"),
                    q.alias("qvec"))


def quantized_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Top-k cosine neighbors on int8-quantized vectors — the
    shuffle-light ANN variant: per-vector scales cancel out of the cosine
    (dot(qa*sa, qb*sb) / (|qa|sa · |qb|sb) = dot(qa,qb)/(|qa||qb|)), so
    similarity is a pure INTEGER dot product over 8-bit codes —
    order-independent, exactly reproducible in any engine, and 4× less
    data through the broadcast than the float path. Max |dot| =
    127²·dim ≈ 1e6 at dim 64 — no overflow headroom concerns until
    dim ≈ 5e14. Ranking mirrors brute_force_topk (rounded sim desc,
    neighbor id). Returns (query_id, neighbor_id, similarity, rank)."""
    qz = quantize_int8(emb, id_col, vec_col)
    idot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    corpus = qz.select(F.col(id_col).alias("neighbor_id"),
                       F.col("qvec").alias("cq"))
    qs = qz.join(queries.select(id_col), id_col).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("qq")
    )
    num = idot(F.col("qq"), F.col("cq"))
    den = F.sqrt((idot(F.col("qq"), F.col("qq"))
                  * idot(F.col("cq"), F.col("cq"))).cast("double"))
    sim = F.when(den == 0.0, F.lit(0.0)).otherwise(
        F.round(num.cast("double") / den, 6)
    )
    pairs = (
        corpus.join(F.broadcast(qs), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("similarity"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def semantic_dedup(emb: DataFrame, centroids: DataFrame,
                   threshold: float = 0.45, n_probes: int = 2,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup-style semantic deduplication over embeddings: bucketed
    near-dup pairs (IVF multi-probe — no O(n²) stage) → connected
    components of the pair graph → keep exactly one representative (the
    min id) per semantic cluster. This is the embedding twin of
    doc_near_dup_clusters/doc_dedup_corpus: near-dup PAIRS alone
    over-delete chains (A~B~C with A≁C); component labeling makes the
    keep-set principled. Returns (vec_id, cluster_id, keep) for every
    corpus vector — isolated vectors are their own cluster and kept."""
    from ..operators.graph import connected_components

    pairs = cosine_near_dup_bucketed(emb, centroids, threshold, n_probes,
                                     id_col, vec_col)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    base = emb.select(F.col(id_col))
    return (
        base.join(comp, base[id_col] == comp.vertex, "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).cast("long")
            .alias("cluster_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )


# Random-hyperplane LSH configuration. Planes are Rademacher (+1/-1)
# vectors derived from md5(f"{plane}:{pos}") — md5 is bit-identical in
# Spark, DuckDB and Python's hashlib, so any engine regenerates the SAME
# planes and the signatures are cross-engine reproducible. 32 planes in
# 8 bands of 4 bits; band width grows with log(corpus) at scale.
RP_N_PLANES = 32
RP_BAND_BITS = 4
RP_QUANT = 1_000_000


def rp_plane_signs(n_planes: int = RP_N_PLANES, dim: int = 64) -> list[list[int]]:
    """The deterministic Rademacher hyperplanes: sign(p, d) = +1 iff the
    first hex digit of md5(f"{p}:{d}") is < '8' (d is 1-based to match
    SQL generate_subscripts). Pure function of (p, d) — regenerated
    identically by the oracle SQL."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0] < "8" else -1
            for d in range(1, dim + 1)
        ]
        for p in range(n_planes)
    ]


def _rp_quantized(vec_col: str) -> Column:
    """Embedding quantized to integer millionths: float→double widening is
    exact and per-element round is operand-identical across engines, so
    the integer dot products below are exact and order-independent
    (double-sum association order can differ between engines; integer
    sums cannot)."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * RP_QUANT).cast("long"),
    )


def rp_lsh_signatures(emb: DataFrame, n_planes: int = RP_N_PLANES,
                      dim: int = 64, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane (SimHash-for-embeddings) signatures: bit p of a
    vector is [dot(v, plane_p) >= 0]; bits pack into `n_planes /
    RP_BAND_BITS` band keys plus one full signature long.

    All per-row expression math (no shuffle, no UDF), built as ONE SQL
    expression with the whole plane matrix as a single nested-array
    literal: per-plane Column objects would mean n_planes × dim py4j
    literal round-trips (~4 s of driver time for 32×64) and a
    2000-node expression tree; the transform-over-planes form is a
    handful of expressions the driver ships once. At 100 TB this runs
    at scan speed, embarrassingly parallel. Returns
    (vec_id, band_0..band_{b-1}, sig)."""
    signs = rp_plane_signs(n_planes, dim)
    planes_sql = "array(" + ",".join(
        "array(" + ",".join(str(v) for v in row) + ")" for row in signs
    ) + ")"
    bits_sql = (
        f"transform({planes_sql}, p -> CASE WHEN aggregate("
        "zip_with(_q, p, (x, y) -> x * CAST(y AS BIGINT)), "
        "CAST(0 AS BIGINT), (a, x) -> a + x) >= 0 "
        "THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    )
    d = (
        emb.select(F.col(id_col), _rp_quantized(vec_col).alias("_q"))
        .withColumn("_bits", F.expr(bits_sql))
    )
    n_bands = n_planes // RP_BAND_BITS
    fold = "aggregate({arr}, CAST(0 AS BIGINT), (a, x) -> a * 2 + x)"
    bands = [
        F.expr(fold.format(
            arr=f"slice(_bits, {b * RP_BAND_BITS + 1}, {RP_BAND_BITS})"
        )).alias(f"band_{b}")
        for b in range(n_bands)
    ]
    sig = F.expr(fold.format(arr="_bits"))
    return d.select(F.col(id_col), *bands, sig.alias("sig"))


def rp_lsh_pairs(emb: DataFrame, threshold: float = 0.45,
                 n_planes: int = RP_N_PLANES, dim: int = 64,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Near-duplicate pairs via random-hyperplane LSH — the second scale
    path beside the IVF-bucketed variant, with no centroid table to
    maintain: candidates are pairs agreeing exactly on at least one
    band key, then the exact cosine filter keeps pairs >= threshold.

    Plan shape: signatures at scan speed → explode to (band_idx, key)
    → keyed self-join (hash join; buckets are balanced by construction
    since random hyperplanes split any direction evenly) → distinct
    pairs → two id-keyed joins to re-attach vectors → exact cosine.
    Approximate: a pair disagreeing in every band is missed; with 8
    bands of 4 bits a cosine-0.5 pair is caught w.p. ~0.8 (the recall
    is measured, not assumed — see
    test_rp_lsh_pairs_subset_and_recall). Returns (id_a, id_b,
    similarity)."""
    sigs = rp_lsh_signatures(emb, n_planes, dim, id_col, vec_col)
    n_bands = n_planes // RP_BAND_BITS
    keyed = sigs.select(
        F.col(id_col),
        F.posexplode(F.array(*[F.col(f"band_{b}") for b in range(n_bands)]))
        .alias("band_idx", "band_key"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return _attach_exact_cosine(cand, emb, threshold, id_col, vec_col)


# -- Product quantization (IVF-PQ's compression half) -----------------------

PQ_M = 4            # subspaces
PQ_QUANT = RP_QUANT  # integer millionths: exact, order-independent sums


def _ip_long(a: Column, b: Column) -> Column:
    """Exact int64 inner product of two long arrays (left-to-right fold,
    but order is irrelevant: integer partials never round)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _pq_subvectors(df: DataFrame, id_col: str, vec_col: str,
                   m: int, dim: int) -> DataFrame:
    """(id, m, sv): the vector L2-NORMALIZED, quantized to integer
    millionths, and split into ``m`` contiguous subvectors of
    ``dim // m`` dims each. Normalizing first makes squared-L2 ADC
    ranking equivalent to cosine ranking (‖a−b‖² = 2 − 2cos on unit
    vectors), so PQ approximates the same objective as the exact
    baseline; quantizing after keeps every distance an exact integer."""
    sub_d = dim // m
    dv = _as_double(vec_col)
    norm = F.sqrt(dot(dv, dv))
    qv = F.transform(
        dv,
        lambda x: F.round(x / norm * PQ_QUANT).cast("long"),
    )
    subs = F.array(*[
        F.struct(F.lit(j).alias("m"),
                 F.slice(qv, j * sub_d + 1, sub_d).alias("sv"))
        for j in range(m)
    ])
    return (
        df.select(F.col(id_col), F.explode(subs).alias("s"))
        .select(id_col, F.col("s.m").alias("m"), F.col("s.sv").alias("sv"))
    )


def pq_codes(emb: DataFrame, centroids: DataFrame, m: int = PQ_M,
             dim: int = 64, id_col: str = "vec_id",
             vec_col: str = "embedding",
             centroid_id_col: str = "centroid_id") -> DataFrame:
    """Product-quantization encoding: each vector compresses to ``m``
    codebook indices — per subspace, the centroid minimizing squared L2
    (ties → smallest centroid id). 64 float dims become 4 small ints:
    the 100 TB memory story for ANN (a 10B-vector corpus's codes fit
    where its floats never would). All arithmetic is integer-quantized
    (millionths), so distances are exact and cross-engine deterministic.
    Returns (vec_id, code_0..code_{m-1})."""
    subs = _pq_subvectors(emb, id_col, vec_col, m, dim)
    cents = _pq_subvectors(
        centroids.select(F.col(centroid_id_col).alias("_cid"), vec_col),
        "_cid", vec_col, m, dim,
    ).select(F.col("_cid"), "m", F.col("sv").alias("cv"))
    d = (_ip_long(F.col("sv"), F.col("sv"))
         - 2 * _ip_long(F.col("sv"), F.col("cv"))
         + _ip_long(F.col("cv"), F.col("cv")))
    scored = subs.join(F.broadcast(cents), "m").select(
        id_col, "m", F.col("_cid"), d.alias("d")
    )
    picked = (
        scored.groupBy(id_col, "m")
        .agg(F.min(F.struct("d", "_cid")).alias("_best"))
        .select(id_col, "m", F.col("_best._cid").alias("code"))
    )
    return (
        picked.groupBy(id_col)
        .agg(*[
            F.max(F.when(F.col("m") == j, F.col("code")))
            .cast("long").alias(f"code_{j}")
            for j in range(m)
        ])
    )


def pq_topk(emb: DataFrame, queries: DataFrame, centroids: DataFrame,
            k: int = 5, m: int = PQ_M, dim: int = 64,
            id_col: str = "vec_id", vec_col: str = "embedding",
            centroid_id_col: str = "centroid_id") -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over
    PQ codes: the corpus is scanned as codes only; each (small) query
    precomputes a ``m×|codebook|`` lookup table of exact subspace
    distances, folded into ONE map row per query that rides a broadcast
    cross — scoring a corpus vector is ``m`` map lookups and an integer
    add, never a float dot product. Distances are exact integers
    (quantized millionths), so ranking is cross-engine deterministic.
    Returns (query_id, neighbor_id, approx_dist, rank)."""
    codes = pq_codes(emb, centroids, m, dim, id_col, vec_col,
                     centroid_id_col)
    q_subs = _pq_subvectors(queries, id_col, vec_col, m, dim)
    cents = _pq_subvectors(
        centroids.select(F.col(centroid_id_col).alias("_cid"), vec_col),
        "_cid", vec_col, m, dim,
    ).select(F.col("_cid"), "m", F.col("sv").alias("cv"))
    d = (_ip_long(F.col("sv"), F.col("sv"))
         - 2 * _ip_long(F.col("sv"), F.col("cv"))
         + _ip_long(F.col("cv"), F.col("cv")))
    # per-query LUT → one map row: key = m * 1000 + centroid_id
    lut = (
        q_subs.join(F.broadcast(cents), "m")
        .select(F.col(id_col).alias("query_id"),
                (F.col("m") * 1000 + F.col("_cid")).alias("_key"),
                d.alias("d"))
        .groupBy("query_id")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("_key", "d"))).alias("_lut"))
    )
    approx = sum(
        F.element_at(F.col("_lut"),
                     (F.lit(j * 1000) + F.col(f"code_{j}")).cast("int"))
        for j in range(m)
    )
    pairs = (
        codes.join(F.broadcast(lut))
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", F.col(id_col).alias("neighbor_id"),
                approx.cast("long").alias("approx_dist"))
    )
    w = W.partitionBy("query_id").orderBy("approx_dist", "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def centroids_from_rows(rows: DataFrame) -> DataFrame:
    """Reassemble kmeans_step's scalar output (cluster_id, pos, c) into a
    centroid table (centroid_id, embedding) so the next iteration can
    consume it — collect_list over a sorted (pos, c) struct keeps the
    dimension order exact regardless of partitioning."""
    return (
        rows.groupBy(F.col("cluster_id").alias("centroid_id"))
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            "centroid_id",
            F.expr("transform(pc, x -> x.c)").alias("embedding"),
        )
    )


def kmeans_train(emb: DataFrame, centroids: DataFrame, max_iter: int = 20,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> tuple[DataFrame, int]:
    """Full Lloyd's algorithm: drive kmeans_step until the rounded-1e-6
    centroid table stops changing — an EXACT fixpoint test (coordinates
    are quantized by the step's round(·, 6), assignment is deterministic
    with full tiebreaks, and Lloyd's monotone objective guarantees the
    quantized iterates eventually repeat). Iterative-plan hygiene as in
    operators/graph.py: eager localCheckpoint per round so the broadcast
    centroid table is materialized, not an ever-deepening plan; the
    convergence probe is one join+count of changed coordinates (k·dim
    rows — trivially small next to the corpus). Returns (centroids,
    n_iters_run)."""
    cents = centroids.localCheckpoint(eager=True)
    for it in range(1, max_iter + 1):
        rows = kmeans_step(emb, cents, id_col, vec_col)
        new_cents = centroids_from_rows(rows).localCheckpoint(eager=True)
        old = cents.select(
            F.col("centroid_id"),
            F.posexplode(_as_double("embedding")).alias("pos0", "oc"),
        )
        new = new_cents.select(
            F.col("centroid_id"),
            F.posexplode("embedding").alias("pos0", "nc"),
        )
        changed = (
            old.join(new, ["centroid_id", "pos0"], "full_outer")
            .filter(
                ~F.col("oc").eqNullSafe(F.round(F.col("nc"), 6))
            )
            .count()
        )
        cents = new_cents
        if changed == 0:
            return cents, it
    return cents, max_iter
