"""Similarity-search queries over the embeddings table (array<float>).

Oracle parity notes: both engines compute on array<double> with identical
left-to-right dot products (Spark aggregate/zip_with vs DuckDB
list_inner_product) and the identical cosine formula
dot/sqrt(dot_aa*dot_bb); similarities are rounded to 6 decimals BEFORE
ranking/filtering so tie-breaks are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import similarity
from ..sources import load_table
from .registry import query

# top-k depth shared by the exact baseline, the IVF path, and the
# recall audit that compares them — one constant so the audit's k and
# ppm denominator can never drift from the component queries
_TOPK_K = 5

_COS = (
    "list_inner_product(a.v, b.v) / "
    "sqrt(list_inner_product(a.v, a.v) * list_inner_product(b.v, b.v))"
)


@query(
    "embedding_topk_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROUND({_COS}, 6) AS similarity
        FROM e a JOIN e b ON a.vec_id < 8 AND a.vec_id <> b.vec_id
    ), ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY similarity DESC, neighbor_id) AS BIGINT) AS rank
        FROM pairs
    )
    SELECT query_id, neighbor_id, similarity, rank
    FROM ranked WHERE rank <= {_TOPK_K}
    """,
)
def embedding_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 baseline: exact top-5 cosine neighbors for query vectors
    (vec_id < 8). Queries broadcast; corpus never shuffled."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=_TOPK_K)


@query(
    "embedding_ivf_assign",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (SELECT vec_id AS cluster_id, v AS cv FROM e WHERE vec_id < 4),
    scored AS (
        SELECT e.vec_id, c.cluster_id,
               ROUND(list_inner_product(c.cv, e.v)
                     / sqrt(list_inner_product(c.cv, c.cv)
                            * list_inner_product(e.v, e.v)), 6) AS similarity
        FROM e CROSS JOIN cents c
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY similarity DESC, cluster_id) AS rn
        FROM scored
    )
    SELECT vec_id, cluster_id, similarity FROM ranked WHERE rn = 1
    """,
)
def embedding_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path: IVF bucket assignment — every vector to its
    max-cosine centroid (centroids = vec_id < 4, broadcast)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return similarity.ivf_assign(emb, cents)


@query(
    "embedding_cosine_near_dup",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_COS}, 6) AS similarity
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE ROUND({_COS}, 6) >= 0.45
    """,
)
def embedding_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2-embedding, EXACT semantics: every pair with cosine >= 0.45
    (upper triangle), via the brute-force O(n²) upper-triangle join. The
    oracle is an independent exact SQL twin, so the hash check verifies
    the stated semantics (all qualifying pairs), not an approximation.
    This is the small-scale baseline and the verification reference; the
    100 TB path is ``embedding_cosine_near_dup_bucketed`` below."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_near_dup_pairs(emb, threshold=0.45)


# IVF-bucketed near-dup pair CTEs, shared by the bucketed pair query and
# the semantic-dedup clustering built on top of it.
_IVF_PAIRS_CTE = """
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (SELECT vec_id AS cluster_id, v AS cv FROM e WHERE vec_id < 4),
    scored AS (
        SELECT e.vec_id, c.cluster_id,
               ROUND(list_inner_product(c.cv, e.v)
                     / sqrt(list_inner_product(c.cv, c.cv)
                            * list_inner_product(e.v, e.v)), 6) AS c_sim
        FROM e CROSS JOIN cents c
    ),
    probes AS (
        SELECT vec_id, cluster_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY c_sim DESC, cluster_id) AS rn
            FROM scored) WHERE rn <= 2
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM probes a JOIN probes b
          ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
    ),
    dup_pairs AS (
        SELECT id_a, id_b,
               ROUND(list_inner_product(ea.v, eb.v)
                     / sqrt(list_inner_product(ea.v, ea.v)
                            * list_inner_product(eb.v, eb.v)), 6) AS similarity
        FROM cand JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b
        WHERE ROUND(list_inner_product(ea.v, eb.v)
                    / sqrt(list_inner_product(ea.v, ea.v)
                           * list_inner_product(eb.v, eb.v)), 6) >= 0.45
    )
"""


@query(
    "embedding_cosine_near_dup_bucketed",
    oracle=f"""
    WITH {_IVF_PAIRS_CTE}
    SELECT id_a, id_b, similarity FROM dup_pairs
    """,
)
def embedding_cosine_near_dup_bucketed(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """X2-embedding, APPROXIMATE scale path: cosine near-dup pairs
    (threshold 0.45) via IVF bucketing — multi-probe centroid assignment
    (centroids = vec_id < 4, broadcast, 2 probes), within-bucket keyed
    self-join, exact cosine on candidates. Approximate by construction: a
    pair sharing none of its probed buckets is missed. The SQL oracle
    mirrors the (deterministic) bucketing, so the hash check verifies the
    transcription, not the recall; recall vs the exact baseline is
    asserted independently by
    tests/test_llm_ops.py::test_cosine_near_dup_bucketed_subset_and_recall
    (bucketed ⊆ exact, recall >= 0.9)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return similarity.cosine_near_dup_bucketed(emb, cents, threshold=0.45,
                                               n_probes=2)


_QCOS = (
    "list_inner_product(a.q, b.q) / "
    "sqrt(list_inner_product(a.q, a.q) * list_inner_product(b.q, b.q))"
)


@query(
    "embedding_topk_cosine_pandas",
    oracle=f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[],
                              x -> ROUND(x * {similarity.RP_QUANT})) AS q
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROUND({_QCOS}, 6) AS similarity
        FROM e a JOIN e b ON a.vec_id < 8 AND a.vec_id <> b.vec_id
    ), ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY similarity DESC, neighbor_id) AS BIGINT) AS rank
        FROM pairs
    )
    SELECT query_id, neighbor_id, similarity, rank
    FROM ranked WHERE rank <= 5
    """,
)
def embedding_topk_cosine_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 alternative implementation: the same top-5 search as
    embedding_topk_cosine, as an Arrow-batched numpy matrix kernel
    (mapInPandas) — run in integer-quantized mode (millionths), where
    every dot-product partial is an integer below 2^53, so the kernel is
    exact and summation-order-independent and a cross-engine oracle CAN
    hash-check it (the float64-BLAS mode keeps no oracle: its last ulp
    depends on matmul blocking order). The oracle quantizes identically
    in SQL. Neighbor-set equality with the JVM exact baseline remains
    separately asserted in tests/test_llm_ops.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk_pandas(
        emb, emb.filter(F.col("vec_id") < 8), k=5,
        quant=similarity.RP_QUANT,
    )


@query(
    "embedding_kmeans_step",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (SELECT vec_id AS cluster_id, v AS cv FROM e WHERE vec_id < 4),
    scored AS (
        SELECT e.vec_id, c.cluster_id,
               ROUND(list_inner_product(c.cv, e.v)
                     / sqrt(list_inner_product(c.cv, c.cv)
                            * list_inner_product(e.v, e.v)), 6) AS sim
        FROM e CROSS JOIN cents c
    ),
    assign AS (
        SELECT vec_id, cluster_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY sim DESC, cluster_id) AS rn
            FROM scored
        ) WHERE rn = 1
    ),
    exploded AS (
        SELECT a.cluster_id, generate_subscripts(e.v, 1) AS pos,
               unnest(e.v) AS val
        FROM e JOIN assign a ON e.vec_id = a.vec_id
    )
    SELECT cluster_id, CAST(pos AS BIGINT) AS pos, ROUND(AVG(val), 6) AS c
    FROM exploded GROUP BY 1, 2
    """,
)
def embedding_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3-iterative: one Lloyd (k-means) iteration — broadcast centroid
    assignment + per-dimension mean, exploded to scalar rows. An
    iterative clustering run is a driver loop over this step."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return similarity.kmeans_step(emb, cents)


@query(
    "embedding_ivf_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (SELECT vec_id AS cluster_id, v AS cv FROM e WHERE vec_id < 4),
    scored AS (
        SELECT e.vec_id, c.cluster_id,
               ROUND(list_inner_product(c.cv, e.v)
                     / sqrt(list_inner_product(c.cv, c.cv)
                            * list_inner_product(e.v, e.v)), 6) AS c_sim
        FROM e CROSS JOIN cents c
    ),
    assign AS (
        SELECT vec_id, cluster_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY c_sim DESC, cluster_id) AS rn
            FROM scored) WHERE rn = 1
    ),
    qprobes AS (
        SELECT vec_id AS query_id, cluster_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY c_sim DESC, cluster_id) AS rn
            FROM scored WHERE vec_id < 8) WHERE rn <= 2
    ),
    pairs AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               ROUND(list_inner_product(eq.v, en.v)
                     / sqrt(list_inner_product(eq.v, eq.v)
                            * list_inner_product(en.v, en.v)), 6) AS similarity
        FROM qprobes p
        JOIN assign a ON p.cluster_id = a.cluster_id
        JOIN e eq ON eq.vec_id = p.query_id
        JOIN e en ON en.vec_id = a.vec_id
        WHERE p.query_id <> a.vec_id
    ),
    ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY similarity DESC, neighbor_id) AS BIGINT) AS rank
        FROM pairs
    )
    SELECT query_id, neighbor_id, similarity, rank
    FROM ranked WHERE rank <= {_TOPK_K}
    """,
)
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: IVF-bucketed approximate top-k with 2 probes per query.
    Approximate vs the EXACT baseline (recall < 1 by construction), but
    fully deterministic given the fixed centroids — so the oracle mirrors
    the bucketing itself (corpus argmax assignment, 2 query probes,
    exact cosine on candidates), the same transcription-check pattern as
    embedding_cosine_near_dup_bucketed. Recall vs the exact baseline is
    asserted independently in tests/test_llm_ops.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return similarity.ivf_topk(emb, emb.filter(F.col("vec_id") < 8), cents,
                               k=_TOPK_K, n_probes=2)


_IVF_PRUNED_ORACLE_TAIL = """
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (SELECT vec_id AS cluster_id, v AS cv FROM e WHERE vec_id < 16),
    scored AS (
        SELECT e.vec_id, c.cluster_id,
               ROUND(list_inner_product(c.cv, e.v)
                     / sqrt(list_inner_product(c.cv, c.cv)
                            * list_inner_product(e.v, e.v)), 6) AS c_sim
        FROM e CROSS JOIN cents c
    ),
    assign AS (
        SELECT vec_id, cluster_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY c_sim DESC, cluster_id) AS rn
            FROM scored) WHERE rn = 1
    ),
    cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cluster_id
        FROM keyed q JOIN keyed c
          ON q.band_idx = c.band_idx AND q.band_key = c.band_key
        WHERE q.vec_id < 8 AND c.vec_id < 16
    ),
    probes AS (
        SELECT query_id, cluster_id FROM (
            SELECT cand.query_id, cand.cluster_id, s.c_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY cand.query_id
                       ORDER BY s.c_sim DESC, cand.cluster_id) AS rn
            FROM cand JOIN scored s
              ON s.vec_id = cand.query_id
             AND s.cluster_id = cand.cluster_id
        ) WHERE rn <= 2
    ),
    pairs AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               ROUND(list_inner_product(eq.v, en.v)
                     / sqrt(list_inner_product(eq.v, eq.v)
                            * list_inner_product(en.v, en.v)), 6) AS similarity
        FROM probes p
        JOIN assign a ON p.cluster_id = a.cluster_id
        JOIN e eq ON eq.vec_id = p.query_id
        JOIN e en ON en.vec_id = a.vec_id
        WHERE p.query_id <> a.vec_id
    ),
    ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY similarity DESC, neighbor_id) AS BIGINT) AS rank
        FROM pairs
    )
    SELECT query_id, neighbor_id, similarity, rank
    FROM ranked WHERE rank <= 5
"""


# Random-hyperplane LSH oracle fragments: DuckDB regenerates the SAME
# Rademacher planes from md5(plane || ':' || pos), quantizes embeddings
# to integer millionths (exact, order-independent sums), and packs the
# sign bits into the identical band keys / signature long.
_RP_N = similarity.RP_N_PLANES
_RP_BB = similarity.RP_BAND_BITS
_RP_NB = _RP_N // _RP_BB

_RP_BITS_CTE = f"""
    q AS (SELECT vec_id,
                 CAST(ROUND(CAST(val AS DOUBLE) * {similarity.RP_QUANT})
                      AS BIGINT) AS qval,
                 pos
          FROM (SELECT vec_id, unnest(embedding) AS val,
                       generate_subscripts(embedding, 1) AS pos
                FROM embeddings)),
    planes AS (SELECT unnest(range(0, {_RP_N})) AS p),
    bits AS (
        SELECT vec_id, p,
               CASE WHEN SUM(CASE WHEN substring(md5(CAST(p AS VARCHAR)
                                     || ':' || CAST(pos AS VARCHAR)), 1, 1)
                                       < '8'
                                  THEN qval ELSE -qval END) >= 0
                    THEN 1 ELSE 0 END AS bit
        FROM q CROSS JOIN planes GROUP BY 1, 2)
"""
_RP_BAND_AGGS = ",\n           ".join(
    "CAST(SUM(CASE WHEN p // {bb} = {b} THEN bit * (CAST(1 AS BIGINT) "
    "<< ({top} - p % {bb})) ELSE 0 END) AS BIGINT) AS band_{b}".format(
        bb=_RP_BB, b=b, top=_RP_BB - 1
    )
    for b in range(_RP_NB)
)
_RP_SIG_SQL = f"""
    sig AS (
        SELECT vec_id,
           {_RP_BAND_AGGS},
           CAST(SUM(bit * (CAST(1 AS BIGINT) << ({_RP_N - 1} - p)))
                AS BIGINT) AS sig
        FROM bits GROUP BY 1)
"""
_RP_BAND_CASE = " ".join(
    f"WHEN {b} THEN band_{b}" for b in range(_RP_NB)
)


@query(
    "embedding_rp_signatures",
    oracle=f"""
    WITH {_RP_BITS_CTE},
    {_RP_SIG_SQL}
    SELECT * FROM sig
    """,
)
def embedding_rp_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: random-hyperplane (SimHash-for-embeddings) signatures — 32
    deterministic Rademacher planes in 8×4-bit band keys plus the packed
    signature. Pure per-row expression math (the plane matrix constant-
    folds into codegen): scan-speed at any scale, no shuffle. The
    oracle regenerates the identical planes from md5(plane:pos)."""
    return similarity.rp_lsh_signatures(load_table(spark, sf_dir, "embeddings"))


@query(
    "embedding_rp_lsh_pairs",
    oracle=f"""
    WITH {_RP_BITS_CTE},
    {_RP_SIG_SQL},
    keyed AS (
        SELECT vec_id, band_idx,
               CASE band_idx {_RP_BAND_CASE} END AS band_key
        FROM sig CROSS JOIN
             (SELECT unnest(range(0, {_RP_NB})) AS band_idx)),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM keyed a JOIN keyed b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.vec_id < b.vec_id),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT c.id_a, c.id_b,
           ROUND(list_inner_product(a.v, b.v)
                 / sqrt(list_inner_product(a.v, a.v)
                        * list_inner_product(b.v, b.v)), 6) AS similarity
    FROM cand c JOIN e a ON c.id_a = a.vec_id
                JOIN e b ON c.id_b = b.vec_id
    WHERE ROUND(list_inner_product(a.v, b.v)
                / sqrt(list_inner_product(a.v, a.v)
                       * list_inner_product(b.v, b.v)), 6) >= 0.45
    """,
)
def embedding_rp_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X3: embedding near-dup pairs via random-hyperplane LSH — the
    centroid-free scale path beside the IVF-bucketed variant: band-key
    self-join generates only bucket-local candidates, exact cosine
    filters them. Recall vs the exact baseline is measured by
    test_rp_lsh_pairs_subset_and_recall (11/14 = 0.786 at sf0.01)."""
    return similarity.rp_lsh_pairs(load_table(spark, sf_dir, "embeddings"))


@query(
    "embedding_ivf_topk_pruned",
    oracle=f"""
    WITH {_RP_BITS_CTE},
    {_RP_SIG_SQL},
    keyed AS (
        SELECT vec_id, band_idx,
               CASE band_idx {_RP_BAND_CASE} END AS band_key
        FROM sig CROSS JOIN
             (SELECT unnest(range(0, {_RP_NB})) AS band_idx)),
    {_IVF_PRUNED_ORACLE_TAIL}
    """,
)
def embedding_ivf_topk_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 at batch-query scale: IVF top-k whose query ROUTING is a keyed
    RP-band-signature join (coarse pre-quantizer) — no query×centroid
    cross anywhere on the query path; the plan's single remaining cross
    is the corpus→centroid build assignment (pinned by
    tests/test_plans.py). 16 centroids, 8×4-bit routing bands, 2 probes,
    k=5; the oracle replays the identical plane generation, band keys,
    candidate join, probe ranking, and bucket search in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return similarity.ivf_topk_pruned(
        emb, emb.filter(F.col("vec_id") < 8), cents, k=5, n_probes=2
    )


@query(
    "embedding_semantic_dedup",
    oracle=f"""
    WITH RECURSIVE {_IVF_PAIRS_CTE},
    edges AS (
        SELECT id_a AS u, id_b AS v FROM dup_pairs
        UNION SELECT id_b, id_a FROM dup_pairs
    ),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u
    ),
    comp AS (
        SELECT u AS vec_id, LEAST(u, MIN(v)) AS cluster_id
        FROM reach GROUP BY u
    )
    SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
           CAST(COALESCE(c.cluster_id, e.vec_id) AS BIGINT) AS cluster_id,
           e.vec_id = COALESCE(c.cluster_id, e.vec_id) AS keep
    FROM e LEFT JOIN comp c ON c.vec_id = e.vec_id
    """,
)
def embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2-embedding, SemDeDup-style: semantic dedup of the embedding
    corpus — IVF-bucketed near-dup pairs (threshold 0.45, 2 probes, no
    O(n²) stage) → connected components (operators/graph.py, iterative
    min-label propagation) → keep = one representative (min vec_id) per
    semantic cluster. The oracle computes the identical closure with a
    recursive CTE — an independent algorithm (semi-naive Datalog vs
    distributed label propagation).

    Scale-verification note: sealed at sf0.001/0.01/0.1; on the ×10
    fixture (10 near-copies of every vector by construction) the
    recursive-CTE ORACLE spilled >78 GB of DuckDB temp and hit the disk
    (NOTES_r6 cont-4). The Spark side completed; the limit is the
    oracle's quadratic intermediate at that tie structure, not the
    engine's bucketed plan."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return similarity.semantic_dedup(emb, cents, threshold=0.45, n_probes=2)


@query(
    "embedding_quantize_int8",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (
        SELECT vec_id, v,
               list_max(list_transform(v, x -> abs(x)))
                   / {similarity.INT8_LEVELS} AS raw_scale
        FROM e
    )
    SELECT vec_id,
           FLOOR(raw_scale * 1e9) / 1e9 AS scale,
           CASE WHEN raw_scale = 0
                THEN array_to_string(list_transform(v, x -> 0), ',')
                ELSE array_to_string(
                    list_transform(
                        v, x -> CAST(FLOOR(x / raw_scale + 0.5) AS BIGINT)),
                    ',')
           END AS qvec_str
    FROM s
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3-storage: symmetric int8 quantization of the embedding column —
    4× fewer vector bytes through every ANN shuffle/broadcast at 100 TB.
    Codes defined as floor(x/scale + 0.5) (exact in any engine; never
    ROUND a raw quotient), scale floor-truncated for display. The array
    is rendered to a CSV string on both sides so the hash compare sees a
    scalar."""
    emb = load_table(spark, sf_dir, "embeddings")
    qz = similarity.quantize_int8(emb)
    return qz.select(
        "vec_id", "scale",
        F.concat_ws(",", F.col("qvec")).alias("qvec_str"),
    )


@query(
    "embedding_quantized_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (
        SELECT vec_id, v,
               list_max(list_transform(v, x -> abs(x)))
                   / {similarity.INT8_LEVELS} AS raw_scale
        FROM e
    ),
    q AS (
        SELECT vec_id,
               CASE WHEN raw_scale = 0
                    THEN list_transform(v, x -> CAST(0 AS BIGINT))
                    ELSE list_transform(
                        v, x -> CAST(FLOOR(x / raw_scale + 0.5) AS BIGINT))
               END AS qv
        FROM s
    ),
    pairs AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               CASE WHEN list_inner_product(a.qv, a.qv)
                         * list_inner_product(b.qv, b.qv) = 0 THEN 0.0
                    ELSE ROUND(
                        list_inner_product(a.qv, b.qv)
                        / sqrt(CAST(list_inner_product(a.qv, a.qv)
                               * list_inner_product(b.qv, b.qv) AS DOUBLE)),
                        6)
               END AS similarity
        FROM q a JOIN q b ON a.vec_id < 8 AND a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY similarity DESC, neighbor_id) AS BIGINT) AS rank
        FROM pairs
    )
    SELECT query_id, neighbor_id, similarity, rank FROM ranked WHERE rank <= 5
    """,
)
def embedding_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: exact-on-codes top-5 cosine over int8-quantized vectors — the
    per-vector scales cancel out of the cosine, so similarity is a pure
    INTEGER dot product on 8-bit codes: order-independent, bit-exact in
    any engine, 4× less data moved than the float path. The unit test
    measures neighbor-set agreement vs the float-exact baseline."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.quantized_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=5
    )


@query(
    "embedding_hard_negatives",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (SELECT vec_id AS cluster_id, v AS cv FROM e WHERE vec_id < 4),
    scored AS (
        SELECT e.vec_id, c.cluster_id,
               ROUND(list_inner_product(c.cv, e.v)
                     / sqrt(list_inner_product(c.cv, c.cv)
                            * list_inner_product(e.v, e.v)), 6) AS csim
        FROM e CROSS JOIN cents c),
    assign AS (
        SELECT vec_id, cluster_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY csim DESC, cluster_id) AS rn
            FROM scored) WHERE rn = 1),
    pairs AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROUND({_COS}, 6) AS similarity
        FROM e a JOIN e b ON a.vec_id < 8 AND a.vec_id <> b.vec_id),
    tagged AS (
        SELECT p.query_id, p.neighbor_id,
               qa.cluster_id AS query_cluster,
               na.cluster_id AS neighbor_cluster,
               p.similarity
        FROM pairs p
        JOIN assign qa ON qa.vec_id = p.query_id
        JOIN assign na ON na.vec_id = p.neighbor_id
        WHERE qa.cluster_id <> na.cluster_id),
    ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY similarity DESC, neighbor_id) AS BIGINT) AS rank
        FROM tagged)
    SELECT query_id, neighbor_id, query_cluster, neighbor_cluster,
           similarity, rank
    FROM ranked WHERE rank <= 5
    """,
)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: hard-negative mining for contrastive training — per query
    (vec_id < 8), the 5 most-similar vectors assigned to a DIFFERENT
    IVF cluster (centroids = vec_id < 4): similar enough to be hard,
    different bucket so they are negatives, with same-cluster likely-
    positives excluded before ranking. Cluster assignment and the query
    set ride broadcasts; at 100 TB the similarity kernel swaps to the
    IVF probe path and the cluster filter composes unchanged
    (llm/similarity.py:hard_negatives)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return similarity.hard_negatives(
        emb, emb.filter(F.col("vec_id") < 8), cents, k=5
    )


@query(
    "embedding_pq_topk",
    oracle="""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding::DOUBLE[],
                          x -> CAST(ROUND(x / sqrt(list_inner_product(
                                   embedding::DOUBLE[], embedding::DOUBLE[]))
                               * 1000000) AS BIGINT)) AS qv
               FROM embeddings),
    sub AS (SELECT vec_id, m, qv[m*16+1 : (m+1)*16] AS sv
            FROM e, unnest(range(0, 4)) AS t(m)),
    cents AS (SELECT vec_id AS cid, m, sv AS cv FROM sub WHERE vec_id < 16),
    dist AS (SELECT s.vec_id, s.m, c.cid,
                    CAST(list_inner_product(s.sv, s.sv)
                         - 2 * list_inner_product(s.sv, c.cv)
                         + list_inner_product(c.cv, c.cv) AS BIGINT) AS d
             FROM sub s JOIN cents c ON s.m = c.m),
    codes AS (SELECT vec_id, m, cid AS code FROM (
                 SELECT *, ROW_NUMBER() OVER (
                     PARTITION BY vec_id, m ORDER BY d, cid) AS rn
                 FROM dist) WHERE rn = 1),
    adc AS (SELECT qd.vec_id AS query_id, x.vec_id AS neighbor_id,
                   CAST(SUM(qd.d) AS BIGINT) AS approx_dist
            FROM codes x JOIN dist qd ON qd.m = x.m AND qd.cid = x.code
            WHERE qd.vec_id < 8 AND qd.vec_id <> x.vec_id
            GROUP BY 1, 2),
    ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY approx_dist, neighbor_id) AS BIGINT) AS rank
               FROM adc)
    SELECT query_id, neighbor_id, approx_dist, rank
    FROM ranked WHERE rank <= 5
    """,
)
def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 compression tier: product-quantization (4 subspaces × 16-dim,
    codebooks = the vec_id < 16 vectors' subvectors) + asymmetric
    distance top-5 for queries vec_id < 8. The corpus is scanned as
    4 codes per vector; each query's subspace-distance LUT folds into
    one map row riding a broadcast cross, so scoring is map lookups +
    an integer add — the memory/bandwidth story for 10B-vector ANN.
    All arithmetic is integer-quantized millionths (exact, order-free),
    so the SQL oracle reproduces ranks bit-for-bit. Approximation
    quality vs the exact baseline is asserted separately in
    tests/test_llm_ops.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return similarity.pq_topk(
        emb, emb.filter(F.col("vec_id") < 8), cents, k=5
    )


def _ann_recall_oracle() -> str:
    """Composed from the two component oracles AT REGISTRATION TIME, so
    the audit's spec can never drift from the queries it audits."""
    from .registry import REGISTRY as _REG

    exact = _REG["embedding_topk_cosine"].oracle
    approx = _REG["embedding_ivf_topk"].oracle
    if 1_000_000 % _TOPK_K != 0:
        raise RuntimeError("ppm must divide evenly by k")
    ppm_per_hit = 1_000_000 // _TOPK_K
    return f"""
    WITH exact AS (SELECT * FROM ({exact})),
    approx AS (SELECT * FROM ({approx}))
    SELECT e.query_id,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
           CAST({_TOPK_K} AS BIGINT) AS k,
           CAST(COUNT(a.neighbor_id) * {ppm_per_hit} AS BIGINT)
               AS recall_ppm
    FROM exact e
    LEFT JOIN approx a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY 1
    """


@query("embedding_ann_recall_audit", oracle=_ann_recall_oracle())
def embedding_ann_recall_audit(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X3 index-quality audit: per-query recall@5 of the IVF
    approximate path against the exact brute-force ground truth — the
    eval a production ANN deployment runs before trusting an index (and
    re-runs after every re-train/re-bucket). Composes the two GATED
    queries themselves (same fns, same oracles spliced into one SQL),
    so this row proves three things at once: the exact baseline, the
    IVF path, and the measurement connecting them.

    Recall is exact integer ppm (hits × 1,000,000/5 — no float
    division), per query, with zero-hit queries kept by the left join.
    At 100 TB the same plan holds: ground truth is computed for a
    SAMPLE of queries only (here: the 8 gated ones), both sides are
    top-k frames of k rows per query, and the audit join is k·|sample|
    rows — trivially small however big the corpus underneath was."""
    from .registry import REGISTRY as _REG

    exact = _REG["embedding_topk_cosine"].fn(spark, sf_dir).select(
        "query_id", "neighbor_id")
    approx = _REG["embedding_ivf_topk"].fn(spark, sf_dir).select(
        F.col("query_id").alias("a_qid"),
        F.col("neighbor_id").alias("a_nid"))
    return (
        exact.join(
            approx,
            (F.col("query_id") == F.col("a_qid"))
            & (F.col("neighbor_id") == F.col("a_nid")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("a_nid").alias("hits"))
        .select(
            "query_id",
            F.col("hits").cast("long").alias("hits"),
            F.lit(_TOPK_K).cast("long").alias("k"),
            (F.col("hits") * (1_000_000 // _TOPK_K)).cast("long")
            .alias("recall_ppm"),
        )
    )


def _pq_recall_oracle() -> str:
    """Composed from the exact-baseline and PQ oracles AT REGISTRATION
    TIME (the r8 audit pattern), so the audit's spec can never drift
    from the queries it audits."""
    from .registry import REGISTRY as _REG

    exact = _REG["embedding_topk_cosine"].oracle
    approx = _REG["embedding_pq_topk"].oracle
    if 1_000_000 % _TOPK_K != 0:
        raise RuntimeError("ppm must divide evenly by k")
    ppm_per_hit = 1_000_000 // _TOPK_K
    return f"""
    WITH exact AS (SELECT * FROM ({exact})),
    approx AS (SELECT * FROM ({approx}))
    SELECT e.query_id,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
           CAST({_TOPK_K} AS BIGINT) AS k,
           CAST(COUNT(a.neighbor_id) * {ppm_per_hit} AS BIGINT)
               AS recall_ppm
    FROM exact e
    LEFT JOIN approx a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY 1
    """


@query("embedding_pq_recall_audit", oracle=_pq_recall_oracle())
def embedding_pq_recall_audit(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X3 index-quality audit for the COMPRESSION tier: per-query
    recall@5 of the PQ/ADC path against the exact brute-force ground
    truth. The IVF audit (embedding_ann_recall_audit) covers the
    partition-pruning tier; this covers the one a 10B-vector deployment
    actually serves from — product-quantized codes scored by asymmetric
    distance — where recall loss comes from CODE quantization rather
    than probe misses, so the two audits fail independently. Same
    composed-oracle discipline: the SQL splices the two gated
    components' own oracle texts at registration time, and recall is
    exact integer ppm with zero-hit queries kept by the left join. At
    100 TB the audit joins two k-rows-per-sampled-query frames —
    trivially small however big the corpus underneath was."""
    from .registry import REGISTRY as _REG

    exact = _REG["embedding_topk_cosine"].fn(spark, sf_dir).select(
        "query_id", "neighbor_id")
    approx = _REG["embedding_pq_topk"].fn(spark, sf_dir).select(
        F.col("query_id").alias("a_qid"),
        F.col("neighbor_id").alias("a_nid"))
    return (
        exact.join(
            approx,
            (F.col("query_id") == F.col("a_qid"))
            & (F.col("neighbor_id") == F.col("a_nid")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("a_nid").alias("hits"))
        .select(
            "query_id",
            F.col("hits").cast("long").alias("hits"),
            F.lit(_TOPK_K).cast("long").alias("k"),
            (F.col("hits") * (1_000_000 // _TOPK_K)).cast("long")
            .alias("recall_ppm"),
        )
    )


def _rp_lsh_recall_oracle() -> str:
    """Composed pair-recall spec: RP-LSH candidate pairs vs the exact
    O(n²) near-dup baseline, both spliced from their gated oracles."""
    from .registry import REGISTRY as _REG

    exact = _REG["embedding_cosine_near_dup"].oracle
    approx = _REG["embedding_rp_lsh_pairs"].oracle
    return f"""
    WITH exact AS (SELECT * FROM ({exact})),
    approx AS (SELECT * FROM ({approx})),
    counted AS (
        SELECT
            (SELECT COUNT(*) FROM exact) AS n_exact_pairs,
            (SELECT COUNT(*) FROM exact e
             JOIN approx a ON a.id_a = e.id_a AND a.id_b = e.id_b)
                AS n_found_pairs)
    SELECT CAST(n_exact_pairs AS BIGINT) AS n_exact_pairs,
           CAST(n_found_pairs AS BIGINT) AS n_found_pairs,
           CAST(CASE WHEN n_exact_pairs = 0 THEN 0
                     ELSE n_found_pairs * 1000000 // n_exact_pairs
                END AS BIGINT) AS recall_ppm
    FROM counted
    """


@query("embedding_rp_lsh_recall_audit", oracle=_rp_lsh_recall_oracle())
def embedding_rp_lsh_recall_audit(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """X2/X3 index-quality audit for the BLOCKING tier: global pair
    recall of the RP-LSH banded candidate generator against the exact
    brute-force near-dup baseline (threshold 0.45) — the number a
    dedup deployment watches when it tunes bands×bits (more bands →
    higher recall, more candidates). Both sides come from the gated
    queries themselves (fns composed here, oracle texts spliced at
    registration), the LSH side is a true subset of the exact side by
    construction (same exact-cosine filter, candidates only), and
    recall is integer ppm via floor division — no float anywhere, so
    the hash gate holds cross-engine."""
    from .registry import REGISTRY as _REG

    exact = _REG["embedding_cosine_near_dup"].fn(spark, sf_dir).select(
        "id_a", "id_b")
    approx = _REG["embedding_rp_lsh_pairs"].fn(spark, sf_dir).select(
        F.col("id_a").alias("a_a"), F.col("id_b").alias("a_b"))
    found = exact.join(
        approx,
        (F.col("id_a") == F.col("a_a")) & (F.col("id_b") == F.col("a_b")),
        "left_semi")
    counts = exact.agg(F.count("*").alias("n_exact_pairs")).crossJoin(
        found.agg(F.count("*").alias("n_found_pairs")))
    return counts.select(
        F.col("n_exact_pairs").cast("long").alias("n_exact_pairs"),
        F.col("n_found_pairs").cast("long").alias("n_found_pairs"),
        F.when(F.col("n_exact_pairs") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("n_found_pairs * 1000000 div n_exact_pairs"))
        .cast("long").alias("recall_ppm"),
    )


def _semantic_dedup_sampled_oracle() -> str:
    """The full semantic-dedup oracle with the corpus deterministically
    thinned to vec_id % 10 = 0 (and the centroid set re-anchored to the
    first four SAMPLED ids). Derived from the gated query's own oracle
    text by two surgical rewrites, asserted to land, so the twin cannot
    drift from the operator spec it samples."""
    from .registry import REGISTRY as _REG

    full = _REG["embedding_semantic_dedup"].oracle
    corpus_old = "AS v FROM embeddings),"
    corpus_new = "AS v FROM embeddings WHERE vec_id % 10 = 0),"
    cents_old = "FROM e WHERE vec_id < 4),"
    cents_new = "FROM e WHERE vec_id < 40),"
    if not (full.count(corpus_old) == 1 and full.count(cents_old) == 1):
        # explicit raise, not assert: python -O strips asserts, and a
        # drifted full oracle would then silently make replace() a no-op
        # (the "sampled" twin becomes the full oracle) — ADVICE r10
        raise RuntimeError(
            "embedding_semantic_dedup oracle text changed — update the "
            "sampled twin's rewrites")
    return full.replace(corpus_old, corpus_new).replace(
        cents_old, cents_new)


@query("embedding_semantic_dedup_sampled",
       oracle=_semantic_dedup_sampled_oracle())
def embedding_semantic_dedup_sampled(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """The ×10-checkable twin of embedding_semantic_dedup (VERDICT r8
    item 6): the SAME operator (IVF-bucketed near-dup pairs → connected
    components → min-id representative) over the deterministic
    vec_id % 10 = 0 subsample, centroids = the first four sampled ids.
    The replicated scale fixtures shift vec_id by multiples of 10⁶, so
    the sample keeps EVERY replica of every sampled original — the
    10-fold near-dup clique structure that broke the full twin's
    DuckDB closure survives intact, at a corpus size (×10 sample =
    the sealed sf0.1 full corpus) where the recursive-CTE oracle is
    feasible. The full query stays registered with its documented
    harness limit; this row is what lets the full-registry ×10
    campaign verify the semantics instead of documenting around them."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.pmod(F.col("vec_id"), F.lit(10)) == 0)
    cents = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return similarity.semantic_dedup(emb, cents, threshold=0.45, n_probes=2)


def _rp_lsh_recall_sampled_oracle() -> str:
    """The composed RP-LSH pair-recall oracle with BOTH component
    corpora deterministically thinned to vec_id % 10 = 0 — the same
    surgical-rewrite discipline as the semantic-dedup sampled twin:
    derived from the full audit's own text, asserted to land, so the
    twin cannot drift from the spec it samples. This retires the one
    registry row VERDICT r9 could not ×10-run directly (the exact
    O(n²) side at ×10 outgrows the DuckDB harness; the ×10 SAMPLE is
    the sealed full corpus's size, where it is routine)."""
    full = _rp_lsh_recall_oracle()
    corpus = "AS v FROM embeddings)"
    bits = "FROM embeddings))"
    if not (full.count(corpus) == 2 and full.count(bits) == 1):
        # explicit raise (not assert): survives python -O — ADVICE r10
        raise RuntimeError(
            "the RP-LSH recall oracle's component texts changed — update "
            "the sampled twin's rewrites")
    return full.replace(
        bits, "FROM embeddings WHERE vec_id % 10 = 0))").replace(
        corpus, "AS v FROM embeddings WHERE vec_id % 10 = 0)")


@query("embedding_rp_lsh_recall_audit_sampled",
       oracle=_rp_lsh_recall_sampled_oracle())
def embedding_rp_lsh_recall_audit_sampled(spark: SparkSession,
                                          sf_dir: str) -> DataFrame:
    """The ×10-checkable twin of embedding_rp_lsh_recall_audit: the
    SAME pair-recall computation (exact O(n²) near-dup baseline vs
    RP-LSH banded candidates, integer-ppm floor division) over the
    deterministic vec_id % 10 = 0 subsample. Signatures are per-row
    expression math and the exact filter is per-pair, so sampling
    commutes with both components — the twin measures the identical
    blocking-tier recall at a corpus size whose O(n²) oracle side
    stays feasible at every campaign scale (the replicated fixtures
    shift vec_id by multiples of 10⁶, so every replica of every
    sampled original survives the thinning). The full audit stays
    registered; this row closes its ×10 caveat."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.pmod(F.col("vec_id"), F.lit(10)) == 0)
    exact = similarity.cosine_near_dup_pairs(emb, threshold=0.45) \
        .select("id_a", "id_b")
    approx = similarity.rp_lsh_pairs(emb).select(
        F.col("id_a").alias("a_a"), F.col("id_b").alias("a_b"))
    found = exact.join(
        approx,
        (F.col("id_a") == F.col("a_a")) & (F.col("id_b") == F.col("a_b")),
        "left_semi")
    counts = exact.agg(F.count("*").alias("n_exact_pairs")).crossJoin(
        found.agg(F.count("*").alias("n_found_pairs")))
    return counts.select(
        F.col("n_exact_pairs").cast("long").alias("n_exact_pairs"),
        F.col("n_found_pairs").cast("long").alias("n_found_pairs"),
        F.when(F.col("n_exact_pairs") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("n_found_pairs * 1000000 div n_exact_pairs"))
        .cast("long").alias("recall_ppm"),
    )
