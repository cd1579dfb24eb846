"""LLM text-pipeline queries: dedup, text analysis, fingerprints.

Oracle twins reproduce the operators in DuckDB SQL bit-for-bit: the
tokenization (regex whitespace split of trimmed text), shingling
(1-indexed 3-token windows) and hashing (md5/sha256 of UTF-8) are all
engine-agnostic by construction. Several oracles are generated
programmatically (16 MinHash aggregate columns, 16 SimHash bit sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import dedup, multimodal, text as llm_text
from ..operators import packing
from ..operators.graph import connected_components
from ..sources import load_table
from .registry import query

# Shared SQL fragments (DuckDB dialect) -------------------------------------

_TOKENS = r"string_split_regex(trim(text), '\s+')"
_SHINGLES_CTE = rf"""
    docs AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    sh0 AS (SELECT doc_id,
                   unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                           for i in range(1, len(t) - 1)]) AS shingle
            FROM docs WHERE len(t) >= 3),
    sh AS (SELECT DISTINCT doc_id, shingle FROM sh0)
"""

_N_HASHES = dedup.N_HASHES
_N_BANDS = dedup.N_BANDS
_RPB = dedup.ROWS_PER_BAND

_SIG_AGGS = ",\n           ".join(
    "MIN(substring(md5('{g}:' || shingle), {start}, 8)) AS mh_{h}".format(
        g=h // dedup.SLOTS_PER_MD5, start=(h % dedup.SLOTS_PER_MD5) * 8 + 1, h=h
    )
    for h in range(_N_HASHES)
)
_BAND_SELECTS = "\n        UNION ALL\n".join(
    "        SELECT doc_id, {b} AS band_id, md5({cat}) AS band_key FROM sig".format(
        b=b,
        cat=" || ".join(f"mh_{h}" for h in range(b * _RPB, (b + 1) * _RPB)),
    )
    for b in range(_N_BANDS)
)
_EST_MATCHES = " + ".join(
    f"CASE WHEN sa.mh_{h} = sb.mh_{h} THEN 1 ELSE 0 END" for h in range(_N_HASHES)
)


@query(
    "doc_curation_funnel",
    oracle=rf"""
    WITH curated AS (
        SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   CASE WHEN len(t) < {llm_text.CURATION_MIN_TOKENS}
                            THEN 'too_short'
                        WHEN len(t) > {llm_text.CURATION_MAX_TOKENS}
                            THEN 'too_long'
                        WHEN ROUND(len(list_distinct(t)) * 1.0 / len(t), 4)
                             < {llm_text.CURATION_MIN_TTR}
                            THEN 'low_diversity'
                        WHEN lang NOT IN ('en', 'es', 'fr', 'de')
                            THEN 'bad_lang'
                        ELSE 'ok' END AS reason
            FROM (SELECT doc_id, lang, text, {_TOKENS} AS t FROM documents)
        ) WHERE reason = 'ok'),
    {_SHINGLES_CTE},
    shc AS (
        SELECT doc_id, shingle FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh
        ) WHERE df <= {dedup.MAX_SHINGLE_DOC_FREQ}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shc GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM shc a JOIN shc b ON a.shingle = b.shingle
                             AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    dup_pairs AS (
        SELECT doc_a, doc_b
        FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                   JOIN sizes sb ON sb.doc_id = doc_b
        WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4)
              >= 0.5
    ),
    canon AS (
        SELECT c.doc_id FROM curated c
        WHERE NOT EXISTS (SELECT 1 FROM dup_pairs p
                          WHERE p.doc_b = c.doc_id)),
    docs2 AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents),
    g0 AS (SELECT doc_id,
                  unnest([array_to_string(t[i:i+7], ' ')
                          for i in range(1, len(t) - 6)]) AS gram
           FROM docs2 WHERE len(t) >= 8),
    g AS (SELECT DISTINCT doc_id, gram FROM g0),
    eval_g AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
    contaminated AS (
        SELECT DISTINCT g.doc_id FROM g
        JOIN eval_g e ON g.gram = e.gram
        WHERE g.doc_id % 20 <> 0),
    clean AS (
        SELECT c.doc_id FROM canon c
        WHERE c.doc_id % 20 <> 0
          AND c.doc_id NOT IN (SELECT doc_id FROM contaminated))
    SELECT 1 AS stage_order, 'raw' AS stage,
           CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs
    UNION ALL
    SELECT 2, 'curated', CAST((SELECT COUNT(*) FROM curated) AS BIGINT)
    UNION ALL
    SELECT 3, 'deduped', CAST((SELECT COUNT(*) FROM canon) AS BIGINT)
    UNION ALL
    SELECT 4, 'train_clean', CAST((SELECT COUNT(*) FROM clean) AS BIGINT)
    """,
)
def doc_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 end-to-end composition proof: the corpus-curation FUNNEL —
    raw → curation keep → near-dup dedup survivors → train_clean (eval
    split held out, contaminated train docs dropped) — as ONE query
    chaining the engine's verbs (curation_verdict, shingle-Jaccard
    near-dup removal, decontamination), with per-stage survivor counts:
    the where-did-my-crawl-go report every corpus run starts from. Each
    stage is the same operator the standalone queries gate (the dedup
    stage is doc_dedup_corpus's removal rule), so the funnel's counts
    are cross-checked against independently verified pieces. The
    fixture's planted duplicates are NEAR-dups (no byte-identical
    texts survive to this grain), which is why the dedup stage is the
    near-dup rule, not the exact-hash one."""
    docs = load_table(spark, sf_dir, "documents")
    verdict = llm_text.curation_verdict(docs)
    kept_ids = verdict.filter(F.col("keep")).select("doc_id")
    curated = docs.join(kept_ids, "doc_id")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    canon = curated.join(
        pairs, curated.doc_id == pairs.doc_b, "left_anti"
    ).select("doc_id")
    flagged = (
        llm_text.decontamination(docs)
        .filter(F.col("contaminated"))
        .select("doc_id")
    )
    clean = (
        canon.filter(F.col("doc_id") % 20 != 0)
        .join(flagged, "doc_id", "left_anti")
    )

    def stage(order: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(order).alias("stage_order"),
            F.lit(name).alias("stage"),
            F.count("*").cast("long").alias("n_docs"),
        )

    return (
        stage(1, "raw", docs)
        .unionByName(stage(2, "curated", curated))
        .unionByName(stage(3, "deduped", canon))
        .unionByName(stage(4, "train_clean", clean))
    )


@query(
    "doc_bpe_merge_step",
    oracle=r"""
    WITH toks0 AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
        WHERE len(string_split_regex(trim(text), '\s+')) >= 2),
    toks AS (
        SELECT doc_id, i - 1 AS pos, t[i] AS tok
        FROM toks0, unnest(range(1, len(t) + 1)) AS ti(i)),
    wn AS (
        SELECT *, LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM toks),
    top_pair AS (
        SELECT tok || ' ' || nxt AS pair
        FROM wn WHERE nxt IS NOT NULL
        GROUP BY 1 ORDER BY COUNT(*) DESC, pair LIMIT 1),
    chg AS (
        SELECT w.*, p.pair,
               string_split(p.pair, ' ')[1] AS pa,
               string_split(p.pair, ' ')[2] AS pb,
               CASE WHEN LAG(tok) OVER (PARTITION BY doc_id
                                        ORDER BY pos) IS NULL
                         OR tok <> LAG(tok) OVER (PARTITION BY doc_id
                                                  ORDER BY pos)
                    THEN 1 ELSE 0 END AS is_change
        FROM wn w CROSS JOIN top_pair p),
    runs AS (
        SELECT *, SUM(is_change) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS UNBOUNDED PRECEDING) AS run_id
        FROM chg),
    marked AS (
        SELECT *,
               (tok = pa AND nxt IS NOT NULL AND nxt = pb
                AND (pa <> pb
                     OR (pos - MIN(pos) OVER (PARTITION BY doc_id, run_id))
                        % 2 = 0)) AS do_merge
        FROM runs),
    consumed AS (
        SELECT *, COALESCE(LAG(do_merge) OVER (PARTITION BY doc_id
                                               ORDER BY pos),
                           FALSE) AS is_consumed,
               COUNT(*) OVER (PARTITION BY doc_id) AS n_before
        FROM marked)
    SELECT doc_id, pair,
           CAST(MIN(n_before) AS BIGINT) AS n_tokens_before,
           CAST(COUNT(*) AS BIGINT) AS n_tokens_after,
           md5(STRING_AGG(CASE WHEN do_merge THEN pa || pb ELSE tok END,
                          ' ' ORDER BY pos)) AS seq_md5
    FROM consumed WHERE NOT is_consumed
    GROUP BY doc_id, pair
    """,
)
def doc_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: one distributed BPE vocabulary-induction step — corpus-wide
    most-frequent adjacent pair (deterministic tiebreak) applied as the
    classic left-to-right non-overlapping merge to every document, with
    the sequential fold reformulated as window expressions (non-overlap
    is automatic for a != b; for a == b left-to-right resolves to even
    offsets within repeated-token runs). seq_md5 pins exact merge
    output. Two shuffles total; the 1-row top pair is a broadcast
    cross. Driver-loop the step for a full vocab build (k-means-step
    pattern) — see llm/text.py:bpe_merge_step."""
    return llm_text.bpe_merge_step(load_table(spark, sf_dir, "documents"))


@query(
    "doc_incremental_dedup",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sig AS (
        SELECT doc_id,
           {_SIG_AGGS}
        FROM sh GROUP BY doc_id
    ),
    bands0 AS (
{_BAND_SELECTS}
    ),
    bands AS (
        SELECT doc_id, band_id, band_key FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY band_id, band_key) AS bsz
            FROM bands0
        ) WHERE bsz <= {dedup.MAX_BUCKET_SIZE}
    ),
    cand AS (
        SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS doc_a,
                        GREATEST(a.doc_id, b.doc_id) AS doc_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id <> b.doc_id
        WHERE a.doc_id % 5 = 4
    )
    SELECT doc_a, doc_b,
           ROUND(({_EST_MATCHES}) / {float(_N_HASHES)}, 4) AS est_jaccard
    FROM cand
    JOIN sig sa ON sa.doc_id = doc_a
    JOIN sig sb ON sb.doc_id = doc_b
    WHERE ROUND(({_EST_MATCHES}) / {float(_N_HASHES)}, 4) >= 0.5
    """,
)
def doc_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: incremental near-dup detection — the daily-ingest pattern:
    only pairs touching the NEW batch (here doc_id % 5 == 4 stands in
    for today's arrivals) are generated and scored; old-vs-old pairs
    never exist in the plan. The probe side of the band join is just the
    new batch's band rows (batch-sized, broadcastable at real scale), so
    ingest cost is O(new × bucket-mates) against a persisted LSH index,
    not O(corpus²) — see llm/dedup.py:incremental_minhash_pairs."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.incremental_minhash_pairs(
        docs, F.col("doc_id") % 5 == 4
    )


@query(
    "doc_exact_dedup",
    oracle="""
    SELECT sha256(lower(trim(text))) AS text_hash,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: exact dedup groups via sha256 of normalized text; deterministic
    canonical winner (min doc_id). One groupBy shuffle at any scale."""
    return dedup.exact_dedup_groups(load_table(spark, sf_dir, "documents"))


@query(
    "doc_minhash_lsh_pairs",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sig AS (
        SELECT doc_id,
           {_SIG_AGGS}
        FROM sh GROUP BY doc_id
    ),
    bands0 AS (
{_BAND_SELECTS}
    ),
    bands AS (
        SELECT doc_id, band_id, band_key FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY band_id, band_key) AS bsz
            FROM bands0
        ) WHERE bsz <= {dedup.MAX_BUCKET_SIZE}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(({_EST_MATCHES}) / {float(_N_HASHES)}, 4) AS est_jaccard
    FROM cand
    JOIN sig sa ON sa.doc_id = doc_a
    JOIN sig sb ON sb.doc_id = doc_b
    WHERE ROUND(({_EST_MATCHES}) / {float(_N_HASHES)}, 4) >= 0.5
    """,
)
def doc_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: MinHash(16 md5-min hashes) + LSH(4 bands × 4 rows) near-dup
    candidate pairs, scored by estimated Jaccard >= 0.5. Banded bucket
    join — never O(n²); buckets larger than MAX_BUCKET_SIZE are dropped
    (hot-key guard, mirrored in the oracle), and the band shuffle carries
    ids only (signatures re-attached to surviving pairs).

    The signature frame feeds three plan branches (bands + two pair-side
    re-attach joins) whose differing projections defeat exchange reuse —
    so it is materialized once (eager localCheckpoint; persist-or-table
    on a real cluster), which measured ~30% faster than the declarative
    recompute at sf0.1."""
    docs = load_table(spark, sf_dir, "documents")
    sig = dedup.minhash_signatures(docs).localCheckpoint(eager=True)
    return dedup.minhash_lsh_pairs(docs, signatures=sig)


@query(
    "doc_ngram_jaccard_pairs",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    shc AS (
        SELECT doc_id, shingle FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh
        ) WHERE df <= {dedup.MAX_SHINGLE_DOC_FREQ}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shc GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
    """,
)
def doc_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2-exact: 3-gram shingle Jaccard via inverted-index self-join —
    the exact verifier for the LSH candidates. Shingles with document
    frequency > MAX_SHINGLE_DOC_FREQ are dropped from the index (hot-key
    guard, mirrored in the oracle)."""
    return dedup.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


_SIMHASH_BITS = "".join(
    "CASE WHEN SUM(CASE WHEN substring(md5(tok), {p}, 1) IN "
    "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) > 0 "
    "THEN '1' ELSE '0' END || ".format(p=h + 1)
    for h in range(16)
).rstrip(" |")


@query(
    "doc_simhash_fingerprints",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest({_TOKENS}) AS tok FROM documents
    )
    SELECT doc_id, {_SIMHASH_BITS} AS simhash
    FROM tok GROUP BY doc_id
    """,
)
def doc_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2-fuzzy: 16-bit SimHash fingerprints (md5-parity bits over distinct
    tokens). Near-dup pair extraction (Hamming<=k with half-block keying)
    is dedup.simhash_near_dup_pairs."""
    return dedup.simhash_fingerprints(load_table(spark, sf_dir, "documents"))


_SIMHASH32_SHINGLE_BITS = "".join(
    "CASE WHEN SUM(CASE WHEN substring(md5(shingle), {p}, 1) IN "
    "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) > 0 "
    "THEN '1' ELSE '0' END || ".format(p=h + 1)
    for h in range(32)
).rstrip(" |")

_HAMMING_32 = " + ".join(
    f"CASE WHEN substring(a.simhash, {i}, 1) <> substring(b.simhash, {i}, 1) "
    "THEN 1 ELSE 0 END"
    for i in range(1, 33)
)


@query(
    "doc_simhash_near_dup",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    fp AS (
        SELECT doc_id, {_SIMHASH32_SHINGLE_BITS} AS simhash
        FROM sh GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({_HAMMING_32} AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
     AND (substring(a.simhash, 1, 16) = substring(b.simhash, 1, 16)
          OR substring(a.simhash, 17, 16) = substring(b.simhash, 17, 16))
    WHERE {_HAMMING_32} <= 2
    """,
)
def doc_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2-fuzzy pairs: SimHash near-duplicates at Hamming distance <= 2
    over 32-bit shingle-feature fingerprints (unigram fingerprints don't
    separate this corpus — the shared vocabulary dominates the sign-sums;
    shingle features match the Jaccard/MinHash feature space). The Spark
    side blocks on the two 16-bit halves (pigeonhole keying: the
    self-join is a hash join on the half key, never O(n²)); the oracle
    mirrors that blocking explicitly (half-agreement OR) so both engines
    declare the same pair set, including the documented miss case of one
    flip in each half."""
    pairs = dedup.simhash_near_dup_pairs(load_table(spark, sf_dir, "documents"))
    return pairs.withColumn("hamming", F.col("hamming").cast("long"))


@query(
    "doc_text_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_unique_tokens,
           ROUND(len(list_distinct(t)) * 1.0 / len(t), 4) AS ttr,
           ROUND(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
                 / len(t), 4) AS mean_token_len
    FROM (SELECT doc_id, text, {_TOKENS} AS t FROM documents)
    """,
)
def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: per-document text statistics, all JVM-side expressions."""
    return llm_text.text_stats(load_table(spark, sf_dir, "documents"))


@query(
    "doc_token_counts",
    oracle=rf"""
    SELECT doc_id,
           CAST(len({_TOKENS}) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: whitespace + BPE-ish regex token counting."""
    return llm_text.bpe_ish_token_count(load_table(spark, sf_dir, "documents"))


@query(
    "doc_token_shards",
    oracle=r"""
    WITH w AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                    AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tokens) / 2000.0)
                AS BIGINT) AS shard_id
    FROM w
    """,
)
def doc_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+packing: assign every document to a ~2000-token training shard
    in doc_id order — a global prefix sum done as the two-phase scan
    (operators/packing.py): range-bucket, B-row offset window, per-bucket
    windows. The oracle states the SAME result as the naive single-window
    cumsum, proving the distributed decomposition exact; the Spark plan's
    only single-partition exchange carries the 256 bucket totals, not the
    corpus."""
    docs = load_table(spark, sf_dir, "documents")
    weighted = llm_text.bpe_ish_token_count(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_bpe_tokens").alias("n_tokens"),
    )
    return packing.assign_token_shards(
        weighted, "doc_id", "n_tokens", target_weight=2000
    ).select("doc_id", "n_tokens", "shard_id")


def _lang_score_sql(sw: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in sw)
    return f"len(list_filter(t, x -> x IN ({lst})))"


_LANG_SCORES = {
    lang: _lang_score_sql(sw) for lang, sw in llm_text.STOPWORDS.items()
}
_BEST = "greatest({})".format(", ".join(_LANG_SCORES.values()))
_PRED = "CASE WHEN {best} = 0 THEN 'und' {whens} END".format(
    best=_BEST,
    whens=" ".join(
        f"WHEN {score} = {_BEST} THEN '{lang}'"
        for lang, score in _LANG_SCORES.items()
    ),
)


@query(
    "doc_language_id",
    oracle=f"""
    SELECT doc_id, {_PRED} AS predicted_lang,
           {", ".join(f"CAST({s} AS BIGINT) AS score_{lang}" for lang, s in _LANG_SCORES.items())}
    FROM (SELECT doc_id, string_split_regex(trim(lower(trim(text))), '\\s+') AS t
          FROM documents)
    """,
)
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: stopword-vote language heuristic with deterministic tie order."""
    return llm_text.language_id(load_table(spark, sf_dir, "documents"))


@query(
    "doc_quality_score",
    oracle=f"""
    SELECT doc_id,
           ROUND(0.3 * least(1.0, len(t) / 50.0)
                 + 0.4 * (len(list_distinct(t)) / CAST(len(t) AS DOUBLE))
                 + 0.3 * least(1.0, length(text) / 200.0), 4) AS quality,
           (ROUND(0.3 * least(1.0, len(t) / 50.0)
                 + 0.4 * (len(list_distinct(t)) / CAST(len(t) AS DOUBLE))
                 + 0.3 * least(1.0, length(text) / 200.0), 4) >= 0.6) AS is_quality
    FROM (SELECT doc_id, text, {_TOKENS} AS t FROM documents)
    """,
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: composite quality score (length saturation + lexical diversity)."""
    return llm_text.quality_score(load_table(spark, sf_dir, "documents"))


@query(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id, md5(lower(trim(text))) AS md5_fp,
           sha256(lower(trim(text))) AS sha256_fp
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: content fingerprints (md5 + sha256 of normalized text)."""
    return llm_text.fingerprints(load_table(spark, sf_dir, "documents"))


@query(
    "doc_tfidf_top_terms",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df_t
              FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, tf.term,
               ROUND(tf * ln(n_docs * 1.0 / df_t), 6) AS tfidf
        FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
    ),
    ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rank
        FROM scored
    )
    SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 3
    """,
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: TF-IDF top-3 terms per doc — explode, two grouped aggs, a
    doc-frequency join, one window; ranked on the rounded score with a
    term tie-break for engine-reproducible ordering. NO document-
    frequency cap here, deliberately: top-terms has no inverted-index
    self-join, so a common term is never a d² hot key (the cap exists
    for tfidf_cosine_pairs' pair generation), and on this corpus's
    small vocabulary a df≤128 filter would strip most docs of every
    term."""
    return llm_text.tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=3)


@query(
    "doc_tfidf_cosine_pairs",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df_t
              FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term
              HAVING COUNT(*) <= 128),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    w AS (
        SELECT doc_id, tf.term, tf * ln(n_docs * 1.0 / df_t) AS w
        FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
    ),
    norms AS (SELECT doc_id, sqrt(SUM(w * w)) AS norm FROM w GROUP BY doc_id),
    dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
        FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(dot / (na.norm * nb.norm), 4) AS cosine
    FROM dots
    JOIN norms na ON na.doc_id = doc_a
    JOIN norms nb ON nb.doc_id = doc_b
    WHERE ROUND(dot / (na.norm * nb.norm), 4) >= 0.9
    """,
)
def doc_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3-sparse: TF-IDF cosine document similarity through the inverted
    index (co-occurring terms only) — the sparse-vector counterpart to
    the dense embedding search. Document-frequency cap 128 ON (mirrored
    in the oracle's HAVING): without it a corpus-common term is a d²
    shuffle hot key — measured on the ×10 fixture (llm/text.py:
    tfidf_cosine_pairs docstring)."""
    return llm_text.tfidf_cosine_pairs(load_table(spark, sf_dir, "documents"),
                                       threshold=0.9)


@query(
    "doc_deterministic_sample",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '2000'
    """,
)
def doc_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~12.5% sample keyed on md5(doc_id) — stable across
    retries/engines, unlike df.sample's per-task-attempt randomness."""
    docs = load_table(spark, sf_dir, "documents")
    return llm_text.deterministic_sample(docs).select("doc_id", "lang", "source")


@query(
    "doc_stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang, ROW_NUMBER() OVER (
            PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    ) WHERE rn <= 20
    """,
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: first 20 docs per language in md5-shuffled
    order — a deterministic per-stratum shuffle + take."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


@query(
    "doc_rolling_hash",
    oracle="""
    SELECT doc_id,
           list_reduce(
               list_prepend(0, list_transform(string_split(lower(trim(text)), ''),
                                              x -> CAST(ascii(x) AS BIGINT))),
               (a, b) -> (a * 31 + b) % 1000000007) AS rolling_fp
    FROM documents
    """,
)
def doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: polynomial rolling-hash document fingerprint — exact integer
    arithmetic folded left over the char stream, reproduced bit-for-bit
    by the oracle's list_reduce."""
    return llm_text.rolling_hash_fingerprints(load_table(spark, sf_dir, "documents"))


@query(
    "doc_dedup_corpus",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    shc AS (
        SELECT doc_id, shingle FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh
        ) WHERE df <= {dedup.MAX_SHINGLE_DOC_FREQ}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shc GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    dup_pairs AS (
        SELECT doc_a, doc_b
        FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                   JOIN sizes sb ON sb.doc_id = doc_b
        WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM dup_pairs p WHERE p.doc_b = d.doc_id)
    """,
)
def doc_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1+X2 composed end-to-end: the deduplicated corpus — every doc
    survives unless it is a near-duplicate (3-shingle Jaccard >= 0.5) of a
    lower-id doc. Pair generation is the inverted-index join; the removal
    is an anti join. At 100 TB the pair stage swaps to minhash_lsh_pairs
    + exact verification of candidates only (same composition)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    return docs.join(
        pairs, docs.doc_id == pairs.doc_b, "left_anti"
    ).select("doc_id", "lang", "source")


@query(
    "doc_mixture_sample",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
          CASE source WHEN 'src0' THEN '8000'
                      WHEN 'src1' THEN '4000'
                      WHEN 'src2' THEN '2000'
                      ELSE '0800' END
    """,
)
def doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4-sampling: weighted training-mix construction — src0 keeps 50%,
    src1 25%, src2 12.5%, everything else ~3%, each draw a pure function
    of doc_id (md5-prefix threshold). The rate spec is a broadcast VALUES
    dim joined to the corpus (llm/text.py:mixture_sample): at 100 TB the
    mix is a dim edit, and the sample is reproducible across retries,
    engines and cluster layouts — df.sample is none of those."""
    docs = load_table(spark, sf_dir, "documents")
    out = llm_text.mixture_sample(
        docs,
        {"src0": "8000", "src1": "4000", "src2": "2000"},
        default_hex="0800",
    )
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), "source")


@query(
    "doc_chunks",
    oracle=f"""
    WITH docs AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    ch AS (
        SELECT doc_id, t, unnest(range(1, len(t) + 1, 48)) AS start
        FROM docs
    )
    SELECT doc_id,
           CAST((start - 1) // 48 AS BIGINT) AS chunk_id,
           CAST(least(len(t) - start + 1, 64) AS BIGINT) AS n_tokens,
           array_to_string(t[start : start + 63], ' ') AS chunk_text
    FROM ch
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4-chunking: overlapping 64-token context windows with 16-token
    overlap (stride 48) — shuffle-free array expressions; see
    llm/text.py:chunk_documents."""
    return llm_text.chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    )


@query(
    "doc_pii_redact",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text, '{llm_text.PII_URL}', '<URL>', 'g'),
                   '{llm_text.PII_EMAIL}', '<EMAIL>', 'g'),
               '{llm_text.PII_NUM}', '<NUM>', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text, '{llm_text.PII_URL}'))
                AS BIGINT) AS n_urls,
           CAST(len(regexp_extract_all(
                regexp_replace(text, '{llm_text.PII_URL}', '<URL>', 'g'),
                '{llm_text.PII_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(
                regexp_replace(
                    regexp_replace(text, '{llm_text.PII_URL}', '<URL>', 'g'),
                    '{llm_text.PII_EMAIL}', '<EMAIL>', 'g'),
                '{llm_text.PII_NUM}')) AS BIGINT) AS n_nums
    FROM documents
    """,
)
def doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4-compliance: PII redaction (URL/email/6+-digit runs → typed
    placeholder tokens) with per-document audit counts. This corpus is
    PII-free, so the oracle here checks byte-parity of the RE2-safe regex
    pipeline; behavior on planted PII is pinned by
    tests/test_llm_ops.py::test_pii_redact_planted."""
    return llm_text.pii_redact(load_table(spark, sf_dir, "documents"))


@query(
    "doc_curation_verdict",
    oracle=f"""
    SELECT doc_id, (reason = 'ok') AS keep, reason
    FROM (
        SELECT doc_id,
               CASE WHEN len(t) < {llm_text.CURATION_MIN_TOKENS}
                        THEN 'too_short'
                    WHEN len(t) > {llm_text.CURATION_MAX_TOKENS}
                        THEN 'too_long'
                    WHEN ROUND(len(list_distinct(t)) * 1.0 / len(t), 4)
                         < {llm_text.CURATION_MIN_TTR} THEN 'low_diversity'
                    WHEN lang NOT IN ('en', 'es', 'fr', 'de')
                        THEN 'bad_lang'
                    ELSE 'ok' END AS reason
        FROM (SELECT doc_id, lang, {_TOKENS} AS t FROM documents)
    )
    """,
)
def doc_curation_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4-curation: keep/drop verdict with the first failing rule named
    (too_short / too_long / low_diversity / bad_lang) — the
    filter-with-audit-trail every corpus run needs. Expression-only,
    evaluates in the scan stage."""
    return llm_text.curation_verdict(load_table(spark, sf_dir, "documents"))


@query(
    "doc_near_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    shc AS (
        SELECT doc_id, shingle FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh
        ) WHERE df <= {dedup.MAX_SHINGLE_DOC_FREQ}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shc GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    dup_pairs AS (
        SELECT doc_a, doc_b
        FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                   JOIN sizes sb ON sb.doc_id = doc_b
        WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM dup_pairs
        UNION SELECT doc_b, doc_a FROM dup_pairs
    ),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (
        SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
        FROM reach GROUP BY u
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(COALESCE(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
    FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    """,
)
def doc_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1+X2: duplicate CLUSTERS — transitive closure of the near-dup
    pair graph via iterative min-label propagation
    (operators/graph.py:connected_components). Every doc gets the min
    doc_id of its component (its own id if isolated); dedup-at-scale
    keeps one representative per cluster. The oracle computes the same
    closure with a recursive CTE — a genuinely independent algorithm
    (semi-naive Datalog evaluation vs distributed label propagation)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    return docs.join(comp, docs.doc_id == comp.vertex, "left").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.coalesce("component", "doc_id").cast("long").alias("cluster_id"),
    )


@query(
    "multimodal_image_features",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(strlen(text) % 1024 + 1 AS BIGINT) AS width,
           CAST((strlen(text) * 7) % 768 + 1 AS BIGINT) AS height,
           CAST((strlen(text) % 1024 + 1) * ((strlen(text) * 7) % 768 + 1) AS BIGINT)
               AS n_pixels
    FROM documents
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: multimodal plumbing — binary payload column + typed metadata +
    Arrow-batched mapInPandas feature extraction. The decode step uses the
    deterministic fake decoder (real decode is a documented stub; no media
    libs in this container); the Spark-side batch flow is real."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary_payload(docs)
    return multimodal.extract_image_features(media, decoder="fake")


@query(
    "doc_decontaminate",
    oracle=r"""
    WITH docs AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                  FROM documents),
    g0 AS (SELECT doc_id,
                  unnest([array_to_string(t[i:i+7], ' ')
                          for i in range(1, len(t) - 6)]) AS gram
           FROM docs WHERE len(t) >= 8),
    g AS (SELECT DISTINCT doc_id, gram FROM g0),
    eval_g AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
    train AS (SELECT g.doc_id, g.gram,
                     CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END AS hit
              FROM g LEFT JOIN eval_g e ON g.gram = e.gram
              WHERE g.doc_id % 20 <> 0)
    SELECT doc_id,
           CAST(SUM(hit) AS BIGINT) AS n_matched,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           ROUND(SUM(hit) / COUNT(*), 4) AS contamination,
           SUM(hit) > 0 AS contaminated
    FROM train GROUP BY 1
    """,
)
def doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: train/eval decontamination — 8-token-shingle overlap between
    the train split and the held-out eval split (doc_id % 20 == 0), per
    train document. The eval gram set is benchmark-sized and broadcast;
    the train side is one explode + broadcast probe + groupBy (llm/
    text.py:decontamination). The near-dup planted pairs make the
    expected hits nonzero: an eval doc's 99%-similar partner shares
    nearly all its 8-grams."""
    return llm_text.decontamination(load_table(spark, sf_dir, "documents"))


@query(
    "doc_decontaminate_bloom",
    oracle=r"""
    WITH docs AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                  FROM documents),
    g0 AS (SELECT doc_id,
                  unnest([array_to_string(t[i:i+7], ' ')
                          for i in range(1, len(t) - 6)]) AS gram
           FROM docs WHERE len(t) >= 8),
    g AS (SELECT DISTINCT doc_id, gram FROM g0),
    eval_g AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
    train AS (SELECT g.doc_id, g.gram,
                     CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END AS hit
              FROM g LEFT JOIN eval_g e ON g.gram = e.gram
              WHERE g.doc_id % 20 <> 0)
    SELECT doc_id,
           CAST(SUM(hit) AS BIGINT) AS n_matched,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           ROUND(SUM(hit) / COUNT(*), 4) AS contamination,
           SUM(hit) > 0 AS contaminated
    FROM train GROUP BY 1
    """,
)
def doc_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: decontamination via a Bloom-bitmap prefilter + exact verify —
    the web-scale plan for the same logical op as doc_decontaminate
    (identical oracle: the Bloom stage admits false positives, the exact
    semi-join removes them, so the RESULT is exact; only the plan
    differs). The eval gram set folds into a constant-size bitmap
    (operators/bloom.py) tested scan-side inside codegen; only Bloom
    survivors pay the keyed join. At this fixture scale both plans are
    cheap — the point is the bitmap stays 128 KiB when the eval split's
    gram set is 10 GB of strings no broadcast could hold."""
    return llm_text.decontamination_bloom(
        load_table(spark, sf_dir, "documents")
    )


@query(
    "doc_repetition_score",
    oracle=r"""
    WITH docs AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                  FROM documents WHERE len(string_split_regex(trim(text), '\s+')) >= 2),
    bi AS (SELECT doc_id,
                  CAST(len(t) AS BIGINT) AS n_tokens,
                  ROUND(1 - len(list_distinct([t[i] || ' ' || t[i+1]
                                               for i in range(1, len(t))]))
                          / (len(t) - 1), 4) AS dup_bigram_frac
           FROM docs),
    tok AS (SELECT doc_id, unnest(t) AS tok FROM docs),
    cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    top AS (SELECT doc_id, ROUND(MAX(c) / SUM(c), 4) AS top_token_ratio
            FROM cnt GROUP BY 1)
    SELECT bi.doc_id, bi.n_tokens, bi.dup_bigram_frac, top.top_token_ratio,
           (bi.dup_bigram_frac > 0.2 OR top.top_token_ratio > 0.2)
               AS repetitive
    FROM bi JOIN top ON bi.doc_id = top.doc_id
    """,
)
def doc_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: within-document repetition audit (Gopher-style rule):
    duplicate-bigram fraction (pure array expressions, no shuffle) and
    top-token share (explode + two grouped aggs — the distributed path,
    so a pathological document costs |tokens| rows, not a per-row
    quadratic loop). Flags docs exceeding 0.2 on either measure."""
    return llm_text.repetition_score(load_table(spark, sf_dir, "documents"))


@query(
    "doc_corpus_stats",
    oracle=r"""
    WITH d AS (
        SELECT source, lang,
               len(string_split_regex(trim(text), '\s+')) AS n_tok,
               n_chars,
               sha256(lower(trim(text))) AS h
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(n_tok), 4) AS avg_tokens,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique_texts,
           ROUND(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 / COUNT(*), 4) AS en_share
    FROM d GROUP BY 1
    """,
)
def doc_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: the corpus card — per-source document/token/char totals, mean
    length, distinct-text count and language share: the first report any
    training-mix decision reads. One grouped aggregation over expression
    columns (token count, normalized-text hash) — a single shuffle at
    |sources| output grain at any corpus size."""
    from ..functions.text import normalized_text_expr, tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "lang",
        F.size(tokens_expr("text")).alias("n_tok"),
        "n_chars",
        F.sha2(normalized_text_expr("text"), 256).alias("h"),
    )
    return d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        F.countDistinct("h").cast("long").alias("n_unique_texts"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            / F.count("*"),
            4,
        ).alias("en_share"),
    )


@query(
    "doc_shared_passages",
    oracle=r"""
    WITH docs AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                  FROM documents),
    gh AS (SELECT doc_id,
                  [md5(array_to_string(t[i:i+4], ' '))
                   for i in range(1, len(t) - 3)] AS g
           FROM docs WHERE len(t) >= 8),
    fp0 AS (SELECT doc_id,
                   unnest(list_distinct([list_aggregate(g[i:i+3], 'min')
                                         for i in range(1, len(g) - 2)])) AS fp
            FROM gh),
    fp AS (SELECT doc_id, fp FROM (
               SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS dfreq
               FROM fp0)
           WHERE dfreq <= 20)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= 3
    """,
)
def doc_shared_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 at passage grain: winnowing (MOSS) fingerprint pairs — any
    shared run of >= 8 tokens (5-token grams, window 4) guarantees a
    shared selected fingerprint, so repeated passages surface even when
    document-level Jaccard stays low. Inverted-index self-join with the
    standard document-frequency cap (llm/dedup.py:shared_passage_pairs);
    selection thins the index ~2/(w+1)x before the shuffle."""
    return dedup.shared_passage_pairs(load_table(spark, sf_dir, "documents"))


@query(
    "doc_lm_score",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents
    ),
    vocab AS (SELECT tok, COUNT(*) AS c_t FROM tok GROUP BY 1),
    totals AS (SELECT SUM(c_t) AS n_total, COUNT(*) AS v_size FROM vocab),
    scored AS (
        SELECT t.doc_id,
               FLOOR(-ln((v.c_t + 1) / (tt.n_total + tt.v_size))
                     * 1000000) AS m
        FROM tok t JOIN vocab v ON t.tok = v.tok CROSS JOIN totals tt
    )
    SELECT doc_id,
           FLOOR(SUM(m) / (COUNT(*) * 1000000.0) * 10000) / 10000
               AS mean_nll,
           CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM scored GROUP BY 1
    """,
)
def doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: corpus-unigram LM score (CCNet-style quality signal) — mean
    negative log probability of each document's tokens under the
    add-one-smoothed corpus unigram distribution. Vocabulary counts
    join back over the token stream (AQE broadcasts when small);
    per-token nll floor-quantized
    to integer micro-nats so the per-doc mean is exact and
    order-independent (llm/text.py:lm_unigram_score)."""
    return llm_text.lm_unigram_score(load_table(spark, sf_dir, "documents"))


@query(
    "doc_lm_bigram_score",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, tok, pos FROM (
            SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\s+')) AS tok,
                   generate_subscripts(
                       string_split_regex(trim(text), '\s+'), 1) AS pos
            FROM documents)
    ),
    vocab AS (SELECT tok, COUNT(*) AS c_t FROM tok GROUP BY 1),
    totals AS (SELECT SUM(c_t) AS n_total, COUNT(*) AS v_size FROM vocab),
    pairs AS (
        SELECT a.doc_id, a.tok AS prev, b.tok AS cur
        FROM tok a JOIN tok b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    bg AS (SELECT prev, cur, COUNT(*) AS c_bg FROM pairs GROUP BY 1, 2),
    ctx AS (SELECT prev, COUNT(*) AS c_ctx FROM pairs GROUP BY 1),
    first_m AS (
        SELECT t.doc_id,
               FLOOR(-ln((v.c_t + 1) / (tt.n_total + tt.v_size))
                     * 1000000) AS m
        FROM tok t JOIN vocab v ON t.tok = v.tok CROSS JOIN totals tt
        WHERE t.pos = 1
    ),
    pair_m AS (
        SELECT p.doc_id,
               FLOOR(-ln((b.c_bg + 1) / (c.c_ctx + tt.v_size))
                     * 1000000) AS m
        FROM pairs p
        JOIN bg b ON p.prev = b.prev AND p.cur = b.cur
        JOIN ctx c ON p.prev = c.prev
        CROSS JOIN totals tt
    ),
    allm AS (SELECT * FROM first_m UNION ALL SELECT * FROM pair_m)
    SELECT doc_id,
           FLOOR(SUM(m) / (COUNT(*) * 1000000.0) * 10000) / 10000
               AS mean_nll,
           CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM allm GROUP BY 1
    """,
)
def doc_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: corpus-BIGRAM LM score — first token under the add-one
    unigram, later tokens under the add-one bigram conditional
    P(cur|prev) = (c(prev,cur)+1)/(c(prev)+V); mean NLL per document.
    The sharper quality signal beside doc_lm_score: shuffled or
    rare-sequence noise scores high even when its unigrams are common.
    Bigrams are built by an array transform at scan speed (no
    position self-join on the Spark side — the oracle's pos-join is
    the transcription, not the plan); per-token nll floor-quantized to
    integer micro-nats so the mean is exact and order-independent
    (llm/text.py:lm_bigram_score)."""
    return llm_text.lm_bigram_score(load_table(spark, sf_dir, "documents"))


@query(
    "doc_cross_source_dups",
    oracle=rf"""
    WITH {_SHINGLES_CTE},
    shc AS (
        SELECT doc_id, shingle FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh
        ) WHERE df <= {dedup.MAX_SHINGLE_DOC_FREQ}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shc GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                   JOIN sizes sb ON sb.doc_id = doc_b
        WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
    )
    SELECT da.source AS source_a, db.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs p
    JOIN documents da ON p.doc_a = da.doc_id
    JOIN documents db ON p.doc_b = db.doc_id
    GROUP BY 1, 2
    """,
)
def doc_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 provenance view: near-duplicate pair counts by (source_a,
    source_b) — the contamination matrix that tells you WHICH feeds
    duplicate each other (same-source pairs = re-crawls; cross-source
    pairs = syndication). Reuses the exact Jaccard pair operator, then
    two broadcast id→source joins and a |sources|² aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"),
                    F.col("source").alias("source_a"))
    sb = src.select(F.col("doc_id").alias("doc_b"),
                    F.col("source").alias("source_b"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


_QUALITY_SQL = f"""
    SELECT doc_id,
           ROUND(0.3 * least(1.0, len(t) / 50.0)
                 + 0.4 * (len(list_distinct(t)) / CAST(len(t) AS DOUBLE))
                 + 0.3 * least(1.0, length(text) / 200.0), 4) AS quality
    FROM (SELECT doc_id, text, {_TOKENS} AS t FROM documents)
"""


@query(
    "doc_dedup_best_quality",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    shc AS (
        SELECT doc_id, shingle FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh
        ) WHERE df <= {dedup.MAX_SHINGLE_DOC_FREQ}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shc GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    dup_pairs AS (
        SELECT doc_a, doc_b
        FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                   JOIN sizes sb ON sb.doc_id = doc_b
        WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM dup_pairs
        UNION SELECT doc_b, doc_a FROM dup_pairs
    ),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (
        SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
        FROM reach GROUP BY u
    ),
    clusters AS (
        SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
               CAST(COALESCE(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    qual AS ({_QUALITY_SQL}),
    ranked AS (
        SELECT cl.cluster_id, cl.doc_id, q.quality,
               ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
                                  ORDER BY q.quality DESC, cl.doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY cl.cluster_id) AS n_members
        FROM clusters cl JOIN qual q ON cl.doc_id = q.doc_id
    )
    SELECT cluster_id, doc_id AS kept_doc_id, quality,
           CAST(n_members AS BIGINT) AS n_members
    FROM ranked WHERE rn = 1
    """,
)
def doc_dedup_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1+X2+X4 composition — quality-aware dedup: within each near-dup
    cluster keep the HIGHEST-quality member (rounded quality desc, min
    doc_id tie-break), not the arbitrary min-id winner — the curation
    policy that dedups a crawl without preferentially keeping the
    worst copy. Cluster assignment reuses connected components over the
    capped Jaccard pairs; the winner is one row_number window over the
    (|docs|-row) cluster/quality join."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    clusters = docs.join(comp, docs.doc_id == comp.vertex, "left").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.coalesce("component", "doc_id").cast("long").alias("cluster_id"),
    )
    q = llm_text.quality_score(docs).select("doc_id", "quality")
    w = W.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    wc = W.partitionBy("cluster_id")
    return (
        clusters.join(q, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(wc).cast("long"))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("kept_doc_id"),
            "quality",
            "n_members",
        )
    )


@query(
    "doc_edit_distance_pairs",
    oracle=rf"""
    WITH {_SHINGLES_CTE},
    shc AS (
        SELECT doc_id, shingle FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh
        ) WHERE df <= {dedup.MAX_SHINGLE_DOC_FREQ}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shc GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT doc_a, doc_b
        FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                   JOIN sizes sb ON sb.doc_id = doc_b
        WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
    )
    SELECT c.doc_a, c.doc_b,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance,
           FLOOR((1.0 - levenshtein(da.text, db.text)
                  / greatest(length(da.text), length(db.text))) * 10000)
               / 10000 AS char_sim
    FROM cand c
    JOIN documents da ON c.doc_a = da.doc_id
    JOIN documents db ON c.doc_b = db.doc_id
    """,
)
def doc_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 character-level verify stage: exact Levenshtein distance and
    normalized character similarity for the shingle-Jaccard candidate
    pairs — the final adjudication a near-dup pipeline runs on its
    (tiny) candidate set, NEVER on the full corpus (edit distance is
    O(len²) per pair; the candidate set is O(dups), so the quadratic
    cost is bounded by the blocking stages before it). Both engines
    implement the classic DP, so values are integer-exact; char_sim is
    floor-truncated (quotient display rule)."""
    docs = load_table(spark, sf_dir, "documents")
    cand = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    ta = docs.select(F.col("doc_id").alias("doc_a"),
                     F.col("text").alias("_ta"))
    tb = docs.select(F.col("doc_id").alias("doc_b"),
                     F.col("text").alias("_tb"))
    lev = F.levenshtein(F.col("_ta"), F.col("_tb"))
    return (
        cand.join(F.broadcast(ta), "doc_a")
        .join(F.broadcast(tb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            lev.cast("long").alias("edit_distance"),
            (
                F.floor(
                    (1.0 - lev / F.greatest(F.length("_ta"), F.length("_tb")))
                    * 10000
                ) / 10000
            ).alias("char_sim"),
        )
    )


@query(
    "doc_pmi_pairs",
    oracle=r"""
    WITH docs AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                  FROM documents),
    tok AS (SELECT doc_id, i - 1 AS pos, t[i] AS w
            FROM docs, unnest(range(1, len(t) + 1)) AS ti(i)),
    uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok),
    co AS (
        SELECT a.w AS w_a, b.w AS w_b, CAST(COUNT(*) AS BIGINT) AS c_ab
        FROM tok a JOIN tok b
          ON a.doc_id = b.doc_id
         AND b.pos - a.pos BETWEEN 1 AND 2
        GROUP BY 1, 2),
    scored AS (
        SELECT w_a, w_b, c_ab,
               FLOOR(CAST(t.n AS DOUBLE) * c_ab
                     / (ua.c * CAST(ub.c AS DOUBLE)) * 1e6) / 1e6
                   AS pmi_ratio
        FROM co
        JOIN uni ua ON ua.w = w_a
        JOIN uni ub ON ub.w = w_b
        CROSS JOIN tot t
        WHERE c_ab >= 50)
    SELECT w_a, w_b, c_ab, pmi_ratio FROM scored
    ORDER BY pmi_ratio DESC, w_a, w_b LIMIT 25
    """,
)
def doc_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 corpus statistics: skip-gram co-occurrence counts (forward
    window of 2) and the PMI ratio N·c(a,b)/(c(a)·c(b)) — the
    word2vec-style association table an embedding pipeline builds from
    the corpus. The ratio is the engine-exact part (integer counts,
    one double division, floor-truncated); PMI itself is ln(ratio),
    left to the consumer because libm ln is NOT bit-identical across
    engines. Pair counts are one map-side-combinable aggregation over
    a position self-join keyed on doc_id; unigram counts and the
    corpus total ride broadcasts; top-25 with full tiebreak
    (ratio desc, then both words) is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    from ..functions.text import tokens_expr

    tok = (
        docs.select(F.col("doc_id"), tokens_expr("text").alias("_t"))
        .select(F.col("doc_id"), F.posexplode("_t").alias("pos", "w"))
    )
    uni = tok.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    tot = tok.agg(F.count("*").cast("long").alias("n"))
    a = tok.alias("a")
    b = tok.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") - F.col("a.pos")).between(1, 2),
        )
        .groupBy(F.col("a.w").alias("w_a"), F.col("b.w").alias("w_b"))
        .agg(F.count("*").cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= 50)
    )
    ua = uni.select(F.col("w").alias("w_a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("w_b"), F.col("c").alias("c_b"))
    ratio = (
        F.col("n").cast("double") * F.col("c_ab")
        / (F.col("c_a") * F.col("c_b").cast("double"))
    )
    return (
        co.join(F.broadcast(ua), "w_a")
        .join(F.broadcast(ub), "w_b")
        .join(F.broadcast(tot))
        .select(
            "w_a", "w_b", "c_ab",
            (F.floor(ratio * 1e6) / 1e6).alias("pmi_ratio"),
        )
        .orderBy(F.col("pmi_ratio").desc(), "w_a", "w_b")
        .limit(25)
    )


@query(
    "doc_top_quality_per_source",
    oracle=r"""
    WITH q AS (
        SELECT doc_id, source,
               ROUND(0.3 * least(1.0, len(t) / 50.0)
                     + 0.4 * (len(list_distinct(t)) / CAST(len(t) AS DOUBLE))
                     + 0.3 * least(1.0, length(text) / 200.0), 4)
                   AS quality
        FROM (SELECT doc_id, source, text,
                     string_split_regex(trim(text), '\s+') AS t
              FROM documents)),
    ranked AS (
        SELECT doc_id, source, quality,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY quality DESC, doc_id) AS BIGINT) AS rank
        FROM q)
    SELECT doc_id, source, quality, rank FROM ranked WHERE rank <= 10
    """,
)
def doc_top_quality_per_source(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X4 balanced selection: the top-10 highest-quality documents per
    source — the keep-the-best-N-per-domain rule that stops one crawl
    domain from dominating a mixture. Quality is the same composite as
    quality_score; ranking is one window per source with a full
    tiebreak (quality desc, doc_id) so the cut is deterministic.
    WindowGroupLimit prunes per-partition before the shuffle — the
    same top-k shape as topk_parts_per_brand."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    q = llm_text.quality_score(docs).select("doc_id", "quality")
    d = docs.select("doc_id", "source").join(q, "doc_id")
    w = W.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        d.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("doc_id", "source", "quality", "rank")
    )


@query(
    "doc_train_val_test_split",
    oracle="""
    WITH assigned AS (
        SELECT doc_id, n_chars,
               CASE WHEN CAST(CONCAT('0x', substring(
                             md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % 100 < 80 THEN 'train'
                    WHEN CAST(CONCAT('0x', substring(
                             md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM assigned GROUP BY split
    """,
)
def doc_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10) — the split
    every training pipeline needs to be REPRODUCIBLE and
    leakage-auditable: membership is a pure function of doc_id
    (md5 hex → int mod 100), so re-running on a changed corpus keeps
    every unchanged document in its split, and the same rule is
    re-derivable in any engine (the oracle recomputes it in SQL).
    Scan-shaped: no shuffle before the 3-row rollup; at 100 TB the
    assignment rides the scan and the split becomes a partition
    column at write time."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("long") % 100
    )
    assigned = docs.withColumn(
        "split",
        F.when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test"),
    )
    return assigned.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
    )


@query(
    "doc_quality_classifier",
    oracle=r"""
    WITH feats AS (
        SELECT doc_id,
               GREATEST(CAST(len(t) AS BIGINT), 1) AS n_words,
               CAST(len(list_filter(t,
                    w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT)
                   AS n_stop,
               CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents)),
    scored AS (
        SELECT doc_id, n_words,
               n_distinct * 1000000 // n_words AS distinct_ratio_micro,
               n_stop * 1000000 // n_words AS stop_ratio_micro,
               3 * (n_distinct * 1000000 // n_words)
                 + (n_stop * 1000000 // n_words)
                 + 500 * LEAST(n_words, 100) - 2000000 AS logit_micro
        FROM feats)
    SELECT doc_id, n_words, distinct_ratio_micro, stop_ratio_micro,
           logit_micro, logit_micro > 0 AS label
    FROM scored
    """,
)
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-weight linear quality classifier — the shape of a fastText /
    logistic quality filter (the curation step between heuristic scoring
    and an LLM judge): hand-set integer weights over lexical features
    (distinct-word ratio, stopword ratio, capped length), scored at scan
    speed with NO Python. The logit stays in integer millionths —
    `div` throughout — so the decision boundary is bit-identical in any
    engine (a float sigmoid would disagree in the last ulp across
    engines; the sigmoid is monotone, so thresholding the logit IS
    thresholding the probability). Swapping trained weights in changes
    the literals, not the plan. Scan-shaped: zero exchanges; at 100 TB
    this runs as a map over the corpus scan with the filter pushed into
    the same stage."""
    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        F.expr(r"split(trim(text), '\\s+')").alias("t"),
    ).select(
        "doc_id",
        F.greatest(F.expr("cast(size(t) as bigint)"), F.lit(1).cast("long"))
        .alias("n_words"),
        F.expr("cast(size(filter(t, "
               "w -> w IN ('the', 'a', 'of', 'and', 'to'))) as bigint)")
        .alias("n_stop"),
        F.expr("cast(size(array_distinct(t)) as bigint)").alias("n_distinct"),
    )
    scored = feats.select(
        "doc_id",
        "n_words",
        F.expr("n_distinct * 1000000 div n_words").alias("distinct_ratio_micro"),
        F.expr("n_stop * 1000000 div n_words").alias("stop_ratio_micro"),
        F.expr(
            "3 * (n_distinct * 1000000 div n_words)"
            " + (n_stop * 1000000 div n_words)"
            " + 500 * least(n_words, 100) - 2000000"
        ).alias("logit_micro"),
    )
    return scored.select(
        "doc_id", "n_words", "distinct_ratio_micro", "stop_ratio_micro",
        "logit_micro", (F.col("logit_micro") > 0).alias("label"),
    )


@query(
    "doc_duplicate_spans",
    oracle=r"""
    WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
               FROM documents),
    g AS (SELECT doc_id, CAST(r.pos AS BIGINT) AS pos,
                 md5(array_to_string(t[r.pos + 1:r.pos + 8], ' ')) AS gh
          FROM d, UNNEST(range(len(t) - 7)) AS r(pos)
          WHERE len(t) >= 8),
    freq AS (SELECT gh FROM g GROUP BY gh
             HAVING COUNT(DISTINCT doc_id) >= 2),
    dup AS (SELECT doc_id, pos FROM g JOIN freq USING (gh)),
    flagged AS (
        SELECT doc_id, pos,
               CASE WHEN LAG(pos) OVER w IS NULL
                         OR pos > LAG(pos) OVER w + 8 THEN 1 ELSE 0
               END AS new_span
        FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), numbered AS (
        SELECT doc_id, pos,
               SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS span_id
        FROM flagged
    )
    SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + 8 AS BIGINT) AS span_end,
           CAST(COUNT(*) AS BIGINT) AS n_grams
    FROM numbered GROUP BY doc_id, span_id
    """,
)
def doc_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-SUBSTRING detection at span grain — the
    remove-duplicated-passages operator of Lee et al.'s "Deduplicating
    Training Data Makes Language Models Better" (doc-level dedup keeps
    boilerplate that repeats INSIDE otherwise-unique pages; this finds
    the repeated token ranges themselves): hash every 8-token gram with
    its position, keep grams seen in ≥2 distinct documents, then merge
    overlapping/adjacent hits per document into maximal [start, end)
    token spans via the lag-gap → cumulative-sum interval merge (same-
    length spans make end monotone in start, so one lag suffices — no
    running max needed). Returns (doc_id, span_start, span_end,
    n_grams). Scale shape: gram hashing rides the scan (generator +
    expression); the document-frequency filter is one groupBy on the
    gram hash (ids only, never text); the merge is one window per doc.
    The suffix-array construction of the paper is the single-machine
    formulation — gram-hash grouping is its shuffle-native equivalent,
    trading the exact minimal length for a fixed gram width."""
    docs = load_table(spark, sf_dir, "documents")
    return llm_text.duplicate_spans(docs, gram=8)


@query(
    "doc_substring_removed",
    oracle=r"""
    WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
               FROM documents),
    g AS (SELECT doc_id, CAST(r.pos AS BIGINT) AS pos,
                 md5(array_to_string(t[r.pos + 1:r.pos + 8], ' ')) AS gh
          FROM d, UNNEST(range(len(t) - 7)) AS r(pos)
          WHERE len(t) >= 8),
    freq AS (SELECT gh FROM g GROUP BY gh
             HAVING COUNT(DISTINCT doc_id) >= 2),
    dup AS (SELECT doc_id, pos FROM g JOIN freq USING (gh)),
    flagged AS (
        SELECT doc_id, pos,
               CASE WHEN LAG(pos) OVER w IS NULL
                         OR pos > LAG(pos) OVER w + 8 THEN 1 ELSE 0
               END AS new_span
        FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), numbered AS (
        SELECT doc_id, pos,
               SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS span_id
        FROM flagged
    ), spans AS (
        SELECT doc_id, MIN(pos) AS s, MAX(pos) + 8 AS e
        FROM numbered GROUP BY doc_id, span_id
    ), sp_arr AS (
        SELECT doc_id, list(struct_pack(s := s, e := e)) AS spans
        FROM spans GROUP BY doc_id
    ), tok AS (
        SELECT d.doc_id, CAST(len(t) AS BIGINT) AS n_total,
               CAST(r.pos AS BIGINT) AS pos, t[r.pos + 1] AS w
        FROM d, UNNEST(range(len(t))) AS r(pos)
    ), kept AS (
        SELECT tok.doc_id, n_total, pos, w
        FROM tok LEFT JOIN sp_arr ON tok.doc_id = sp_arr.doc_id
        WHERE spans IS NULL
              OR len(list_filter(spans,
                     x -> pos >= x.s AND pos < x.e)) = 0
    )
    , agg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               md5(string_agg(w, ' ' ORDER BY pos)) AS clean_md5
        FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(len(t) AS BIGINT) AS n_total,
           COALESCE(agg.n_kept, 0) AS n_kept,
           CAST(len(t) AS BIGINT) - COALESCE(agg.n_kept, 0) AS n_removed,
           agg.clean_md5
    FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """,
)
def doc_substring_removed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REWRITE half of exact-substring dedup
    (llm/text.py:remove_duplicate_spans): every token inside a
    cross-document duplicated span is dropped and the document
    reassembled in position order — returned as (n_total, n_kept,
    n_removed, md5 of the cleaned text) so the whole
    detect→merge→rewrite chain is hash-gated, not just the span list.
    The span array joins back by doc_id (equi join); the containment
    test is an `exists` over the per-doc span handful, never a range
    join against the token stream. Docs under the gram width carry no
    spans and pass through intact."""
    docs = load_table(spark, sf_dir, "documents")
    return llm_text.remove_duplicate_spans(docs, gram=8)


@query(
    "doc_source_token_entropy",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({_TOKENS}) AS tok FROM documents
    ), c AS (
        SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
        FROM tok GROUP BY ALL
    ), t AS (
        SELECT source, n,
               SUM(n) OVER (PARTITION BY source) AS tot
        FROM c
    )
    SELECT source,
           CAST(MAX(tot) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(COUNT(*) * CAST(1000000 AS BIGINT) // MAX(tot)
                AS BIGINT) AS ttr_ppm,
           ROUND(SUM(-(n / CAST(tot AS DOUBLE))
                     * ln(n / CAST(tot AS DOUBLE))), 6) AS entropy_nats
    FROM t GROUP BY source
    """,
)
def doc_source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: corpus-diversity audit — per-source Shannon token entropy
    (nats) and integer-ppm type-token ratio, the numbers a training-mix
    decision reads next to doc_corpus_stats' volume card (a source with
    collapsing entropy is boilerplate even when its token count looks
    healthy). Shares the repo-wide whitespace tokenization and its SQL
    twin. Plan: explode → (source, token) count (map-side combinable;
    post-shuffle rows = vocabulary) → per-source window + fold; entropy
    is the one float reduction, ROUND(6) on both engines (PSI
    precedent), every other output column integer-exact."""
    from pyspark.sql.window import Window

    from ..functions.text import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("source", F.explode(tokens_expr("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = F.sum("n").over(Window.partitionBy("source"))
    p = F.col("n") / F.col("tot")
    return (
        counts.withColumn("tot", tot)
        .groupBy("source")
        .agg(F.max("tot").cast("long").alias("n_tokens"),
             F.count("*").cast("long").alias("n_types"),
             F.expr("CAST(count(*) * CAST(1000000 AS BIGINT)"
                    " div max(tot) AS BIGINT)").alias("ttr_ppm"),
             F.round(F.sum(-p * F.log(p)), 6).alias("entropy_nats"))
    )


_MIXTURE_K = 100
_MIXTURE_WEIGHT_SQL = """
    SELECT DISTINCT source,
           CAST(1 + (CAST(SUBSTR(source, 4) AS INT) % 5) AS BIGINT) AS weight
    FROM documents
"""


def _mixture_oracle() -> str:
    from ..llm.sampling import mixture_resample_oracle_sql

    return mixture_resample_oracle_sql(
        "SELECT doc_id, source FROM documents",
        _MIXTURE_WEIGHT_SQL,
        _MIXTURE_K,
        select="doc_id, source, pick_order",
    )


@query("doc_mixture_resample", oracle=_mixture_oracle())
def doc_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: deterministic domain-mixture resampling (llm/sampling.py) —
    the training-corpus verb behind published mixture recipes (Pile
    weights, DoReMi): draw exactly K documents whose per-source counts
    are Hamilton-apportioned to declared weights, selecting within each
    source by md5 rank so the SAME documents win on any engine, any
    partitioning, any rerun. The weight recipe here derives from the
    source name (1 + src_index % 5) so it is scale-invariant; K=100 is
    far below every per-source availability at all SFs (validated
    eagerly by the operator — quota > available fails loudly). Plan:
    tiny count agg + quota math on the #sources frame, one broadcast
    join back, one per-source window rank — a single fact shuffle."""
    from ..llm.sampling import mixture_resample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    weights = (
        docs.select("source").distinct()
        .withColumn(
            "weight",
            (1 + F.expr("CAST(substring(source, 4) AS INT)") % 5).cast("long"),
        )
    )
    return mixture_resample(docs, weights, _MIXTURE_K).select(
        "doc_id", "source", "pick_order"
    )
