"""Deduplication operators over a text corpus.

Four families, each a pure DataFrame transform (input: ``df(id_col,
text_col)``), all JVM-side (no Python UDFs), all shuffle-bounded:

- **exact**: sha256 over normalized text, one groupBy. O(n) + 1 shuffle.
- **MinHash + LSH**: shingle → 16 md5-min signatures → 4 banded keys →
  bucket self-join. Candidate generation touches only colliding buckets,
  which is what makes near-dedup feasible at 100 TB (the exhaustive
  pairwise alternative is O(n²)).
- **SimHash**: 16-bit parity fingerprint; near-dups share all-but-k bits.
- **exact n-gram Jaccard**: inverted-index self-join on shingles — the
  verification pass for LSH candidates, also usable standalone.

Determinism note: hashes are md5/sha256 of UTF-8 strings, and MinHash
"permutations" are the lexicographic MIN of md5 over salted shingles —
reproducible in any engine with md5 (this is how the DuckDB oracle checks
these operators bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.text import normalized_text_expr, shingles_expr, tokens_expr

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS

# Hot-key caps, ON by default — the quadratic-blowup guards at 100 TB.
# An LSH bucket of d docs yields d² candidate pairs ON ONE SHUFFLE KEY;
# a corpus-common shingle does the same to the inverted index. Both caps
# drop only keys past the limit (boilerplate clusters / stop-shingles),
# are deterministic, and are mirrored in the DuckDB oracles.
MAX_BUCKET_SIZE = 64
MAX_SHINGLE_DOC_FREQ = 128


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups by sha256 of normalized text.

    Returns (text_hash, canonical_doc_id, n_copies): one row per distinct
    normalized text; canonical id is the MIN id (deterministic winner).
    """
    return (
        df.select(
            F.col(id_col),
            F.sha2(normalized_text_expr(text_col), 256).alias("text_hash"),
        )
        .groupBy("text_hash")
        .agg(
            F.min(id_col).cast("long").alias("canonical_doc_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
    )


def _cap_hot_keys(df: DataFrame, key_cols: list[str], limit: int) -> DataFrame:
    """Drop every row of any key whose group exceeds ``limit`` rows — the
    shared hot-key guard of all inverted-index joins here (a key held by
    d rows contributes d² join pairs on ONE shuffle key). The count is a
    window over the same partitioning the downstream self-join shuffles
    on, so the guard adds no extra exchange."""
    wk = W.partitionBy(*key_cols)
    return (
        df.withColumn("_grp_n", F.count("*").over(wk))
        .filter(F.col("_grp_n") <= limit)
        .drop("_grp_n")
    )


def _distinct_shingles(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, shingle) pairs, distinct — the inverted-index input."""
    tokens = tokens_expr(text_col)
    return (
        df.select(F.col(id_col), tokens.alias("_t"))
        .filter(F.size("_t") >= 3)
        .select(F.col(id_col), F.explode(shingles_expr(F.col("_t"))).alias("shingle"))
        .distinct()
    )


SLOTS_PER_MD5 = 4  # each md5 (32 hex chars) yields four 8-hex (32-bit) slots


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       n_hashes: int = N_HASHES) -> DataFrame:
    """Per-doc MinHash signature:
    mh_h = MIN(substring(md5('<h/4>:' || shingle), (h%4)*8+1, 8)).

    Hash once, slice many: 16 slots need only 4 md5 evaluations per
    shingle — each 128-bit digest is cut into four independent 32-bit
    (8-hex) slots, and the lexicographic MIN of a fixed-width hex slice
    is the MIN of the 32-bit value. One shuffle (the groupBy); the slots
    are aggregate columns over the same exploded shingles, so there is
    no ×h row blow-up.
    """
    sh = _distinct_shingles(df, id_col, text_col)
    aggs = []
    for h in range(n_hashes):
        g, off = divmod(h, SLOTS_PER_MD5)
        digest = F.md5(F.concat(F.lit(f"{g}:"), F.col("shingle")))
        aggs.append(F.min(F.substring(digest, off * 8 + 1, 8)).alias(f"mh_{h}"))
    return sh.groupBy(id_col).agg(*aggs)


def _band_key(sig_cols: list[str], band: int) -> Column:
    lo = band * ROWS_PER_BAND
    return F.md5(F.concat(*[F.col(c) for c in sig_cols[lo:lo + ROWS_PER_BAND]]))


_SIG_COLS = [f"mh_{h}" for h in range(N_HASHES)]


def _band_rows(sig: DataFrame, id_col: str,
               carry: tuple[str, ...] = ()) -> DataFrame:
    """Explode a signature frame into its banded index rows
    (id, *carry, band_id, band_key) — the ids-only shape every LSH join
    here shuffles on (never the 16-slot signature ×N_BANDS). ``carry``
    names extra columns already on ``sig`` to keep (e.g. a new-batch
    flag), so callers can attach per-doc metadata BEFORE the ×N_BANDS
    explode instead of joining it onto four times the rows after.

    The shared core of minhash_lsh_pairs / incremental_minhash_pairs /
    build_lsh_index: the band-key derivation must be identical in all
    three or a persisted index silently stops matching fresh probes."""
    return sig.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_id"),
                         _band_key(_SIG_COLS, b).alias("band_key"))
                for b in range(N_BANDS)
            ])
        ).alias("band"),
    ).select(id_col, *carry, "band.band_id", "band.band_key")


def _score_pairs(cand: DataFrame, sig: DataFrame, id_col: str,
                 threshold: float) -> DataFrame:
    """Attach both signatures to candidate (doc_a, doc_b) pairs by two
    id-keyed joins and keep pairs whose estimated Jaccard (fraction of
    matching slots) reaches ``threshold``. Shared scoring tail of all
    three LSH pair producers — signatures travel only to SURVIVING
    candidate pairs, never through the band shuffle."""
    sig_arr = F.array(*[F.col(c) for c in _SIG_COLS])
    sa = sig.select(F.col(id_col).alias("doc_a"), sig_arr.alias("sig_a"))
    sb = sig.select(F.col(id_col).alias("doc_b"), sig_arr.alias("sig_b"))
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda m: m,
        )
    )
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("est_jaccard",
                    F.round(matches / F.lit(float(N_HASHES)), 4))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", threshold: float = 0.5,
                      max_bucket_size: int | None = MAX_BUCKET_SIZE,
                      signatures: DataFrame | None = None) -> DataFrame:
    """Near-duplicate candidate pairs via banded LSH, scored by estimated
    Jaccard (fraction of matching signature slots), filtered to
    ``>= threshold``. Returns (doc_a, doc_b, est_jaccard).

    Scale shape: signatures are one narrow row per doc; the band explode
    is ×N_BANDS; the self-join shuffles on band key and only colliding
    buckets produce pairs. Two guards make this survive 100 TB:

    - **Bucket cap (default on).** A bucket of d docs is d² pairs on ONE
      key — a boilerplate-heavy bucket is a straggler that AQE cannot
      split (the pairs are genuinely on one key). Buckets larger than
      ``max_bucket_size`` are dropped whole: a >cap bucket is a
      near-identical boilerplate cluster, which is ``exact_dedup_groups``'s
      job, not pairwise scoring's. The count is a window over the same
      (band_id, band_key) partitioning the join shuffles on anyway.
    - **Ids-only shuffle.** Band rows carry (id, band_id, band_key) — not
      the 16-slot signature array ×N_BANDS copies. Signatures are
      re-attached to the few SURVIVING pairs by two id-keyed joins.

    The signature subtree feeds several plan branches and Catalyst does
    not common-subexpression-eliminate across them — at 100 TB,
    materialize ``minhash_signatures`` once (persist or write to a table)
    and pass it via ``signatures``; the declarative recompute is fine at
    test scale.
    """
    sig = (signatures if signatures is not None
           else minhash_signatures(df, id_col, text_col))
    bands = _band_rows(sig, id_col)
    if max_bucket_size is not None:
        bands = _cap_hot_keys(bands, ["band_id", "band_key"], max_bucket_size)

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return _score_pairs(cand, sig, id_col, threshold)


def incremental_minhash_pairs(df: DataFrame, new_pred: Column,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              threshold: float = 0.5,
                              max_bucket_size: int | None = MAX_BUCKET_SIZE,
                              ) -> DataFrame:
    """Near-dup pairs restricted to those touching a NEW document — the
    daily-ingest shape: a fresh batch (rows matching ``new_pred``) is
    checked against the full corpus (new-vs-old and new-vs-new) without
    ever re-scoring old-vs-old pairs. Same output contract as
    :func:`minhash_lsh_pairs` (doc_a < doc_b, est_jaccard >= threshold),
    just the pair set filtered by construction, not post-hoc.

    Scale shape: the probe side of the band join is ONLY the new batch's
    band rows — daily-batch-sized, typically broadcastable — so the cost
    per ingest is O(new × bucket-mates), not O(corpus²). The corpus band
    index is recomputed declaratively here; in production it is the
    persisted LSH index table this join would read as-is (the band/cap
    pipeline is identical, so the persisted index stays valid)."""
    sig = minhash_signatures(df, id_col, text_col)
    is_new = df.select(
        F.col(id_col), new_pred.alias("_is_new")
    )
    # the flag joins onto the narrow signature frame BEFORE the ×N_BANDS
    # explode (carry=), not onto the band rows after
    bands = _band_rows(sig.join(is_new, id_col), id_col,
                       carry=("_is_new",))
    if max_bucket_size is not None:
        bands = _cap_hot_keys(bands, ["band_id", "band_key"],
                              max_bucket_size)

    new_bands = bands.filter(F.col("_is_new"))
    a, b = new_bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}"))
            .alias("doc_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}"))
            .alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return _score_pairs(cand, sig, id_col, threshold)


def simhash_fingerprints(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", n_bits: int = 16,
                         features: str = "tokens") -> DataFrame:
    """SimHash over distinct text features (n_bits <= 32).

    Bit h is the sign of Σ_features (±1), where +1 iff hex digit h of
    md5(feature) has its high bit set. ``features`` picks the feature
    set: 'tokens' (distinct unigrams — cheap, profile-grade) or
    'shingles' (distinct 3-token windows — the discriminative choice for
    near-dup detection: unigram sign-sums are dominated by the corpus'
    shared vocabulary, so unrelated documents collide; shingle sets are
    what actually separates documents, matching the MinHash/Jaccard
    feature space). Returns (id, simhash) as a '0'/'1' string
    (cross-engine-stable; near-dup pairs = low Hamming distance, see
    ``simhash_near_dup_pairs``).
    """
    if features == "shingles":
        tok = _distinct_shingles(df, id_col, text_col).withColumnRenamed(
            "shingle", "tok"
        )
    else:
        tok = (
            df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("tok"))
            .distinct()
        )
    high = list("89abcdef")
    sums = [
        F.sum(
            F.when(F.substring(F.md5("tok"), h + 1, 1).isin(high), 1).otherwise(-1)
        ).alias(f"s_{h}")
        for h in range(n_bits)
    ]
    agg = tok.groupBy(id_col).agg(*sums)
    bits = [F.when(F.col(f"s_{h}") > 0, "1").otherwise("0") for h in range(n_bits)]
    return agg.select(F.col(id_col), F.concat(*bits).alias("simhash"))


def simhash_near_dup_pairs(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           max_hamming: int = 2,
                           n_bits: int = 32) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance <= max_hamming, over
    32-bit shingle-feature fingerprints.

    Blocking: pairs must agree on one of the two 16-bit halves
    (pigeonhole: any pair within Hamming<=2 agrees on at least one half
    only when the flips land in one half — with max_hamming<=1 the
    guarantee is exact; for 2 it is a high-recall heuristic). This keeps
    the self-join keyed (hash join on the half key) instead of O(n²).
    """
    half = n_bits // 2
    fp = simhash_fingerprints(df, id_col, text_col, n_bits=n_bits,
                              features="shingles")
    halves = fp.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                F.concat(F.lit("L:"), F.substring("simhash", 1, half)),
                F.concat(F.lit("R:"), F.substring("simhash", half + 1, half)),
            )
        ).alias("block"),
    )
    a, b = halves.alias("a"), halves.alias("b")
    hamming = F.size(
        F.filter(
            F.zip_with(
                F.split(F.col("a.simhash"), ""),
                F.split(F.col("b.simhash"), ""),
                lambda x, y: x != y,
            ),
            lambda d: d,
        )
    )
    return (
        a.join(b, (F.col("a.block") == F.col("b.block"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.5,
                        max_doc_freq: int | None = MAX_SHINGLE_DOC_FREQ
                        ) -> DataFrame:
    """Jaccard similarity over distinct 3-token shingle sets, via an
    inverted-index self-join (shuffle on shingle, count intersections,
    join per-doc set sizes). Returns (doc_a, doc_b, jaccard >= threshold).

    **Document-frequency cap (default on):** a shingle appearing in d
    docs contributes d² index pairs on ONE shuffle key — a corpus-common
    shingle ("all rights reserved") is the quadratic hot key at 100 TB,
    and carries no discriminative signal. Shingles with document
    frequency > ``max_doc_freq`` are dropped from the index BEFORE both
    the intersection counts and the per-doc set sizes, so the result is
    the exact Jaccard over the capped shingle universe (deterministic,
    oracle-mirrorable); with the cap off (None) it is the exact full
    Jaccard. The DF count is a window over the same shingle partitioning
    the self-join shuffles on anyway.

    This is the exact-verification counterpart to ``minhash_lsh_pairs``;
    at 100 TB run it only on LSH candidates (compose the two operators).
    """
    sh = _distinct_shingles(df, id_col, text_col)
    if max_doc_freq is not None:
        sh = _cap_hot_keys(sh, ["shingle"], max_doc_freq)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# Winnowing (MOSS-style) passage fingerprinting: k-token grams hashed,
# then the minimum gram hash selected from every w-wide window — the
# guarantee is that any shared passage of >= k + w - 1 tokens yields at
# least one shared selected fingerprint, at ~2/(w+1) the index density
# of indexing every gram.
WINNOW_K = 5
WINNOW_W = 4
WINNOW_MIN_SHARED = 3
WINNOW_MAX_FP_DOC_FREQ = 20


def winnowing_fingerprints(df: DataFrame, k: int = WINNOW_K,
                           w: int = WINNOW_W, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Distinct winnowing fingerprints per document: md5 over each
    k-token gram, window-min selection over every w consecutive gram
    hashes (lexicographic min — engine-identical on md5 hex), distinct.
    Pure array expressions until the final explode: selection runs at
    scan speed; the output index is ~2/(w+1) of the gram count.
    Returns (id, fp)."""
    toks = tokens_expr(text_col)
    d = df.select(F.col(id_col), toks.alias("_t")).filter(
        F.size("_t") >= k + w - 1
    )
    gh = F.transform(shingles_expr(F.col("_t"), k), lambda s: F.md5(s))
    d = d.select(F.col(id_col), gh.alias("_gh"))
    fps = F.transform(
        F.sequence(F.lit(1), F.size("_gh") - (w - 1)),
        lambda i: F.array_min(F.slice("_gh", i, w)),
    )
    return d.select(
        F.col(id_col), F.explode(F.array_distinct(fps)).alias("fp")
    )


def shared_passage_pairs(df: DataFrame, min_shared: int = WINNOW_MIN_SHARED,
                         max_fp_doc_freq: int | None = WINNOW_MAX_FP_DOC_FREQ,
                         k: int = WINNOW_K, w: int = WINNOW_W,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Substring-level near-dup detection ("deduplicating training data"
    at passage grain, where document-level Jaccard stays low): document
    pairs sharing >= min_shared winnowing fingerprints — i.e. repeated
    passages of >= k + w - 1 tokens, boilerplate headers, quoted blocks.

    Scale shape matches ngram_jaccard_pairs: inverted-index self-join
    keyed on fingerprint with the same document-frequency cap (default
    on) so a corpus-common passage cannot become a d² hot key; the
    winnowing selection has already thinned the index ~2/(w+1)×.
    Returns (doc_a, doc_b, n_shared)."""
    fp = winnowing_fingerprints(df, k, w, id_col, text_col)
    if max_fp_doc_freq is not None:
        fp = _cap_hot_keys(fp, ["fp"], max_fp_doc_freq)
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def build_lsh_index(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    checkpoint: bool = False) -> tuple[DataFrame, DataFrame]:
    """The persistable LSH index: (signatures, band index) — the two
    parquet artifacts a production corpus maintains so daily ingest
    never re-signatures the old corpus (incremental_minhash_pairs'
    docstring promise, made concrete). Signatures are one narrow row
    per doc; the band index is (id, band_id, band_key) — ids only,
    exactly what the probe join shuffles on.

    ``checkpoint=True`` eagerly materializes the signature frame so the
    band explode (and every later reference) reads the computed rows
    instead of re-running the shingle+MinHash pipeline — the right form
    whenever BOTH returned frames are consumed (the streaming
    maintenance loop commits both per micro-batch; measured: the lazy
    form re-signatured each batch once per consumer)."""
    sig = minhash_signatures(df, id_col, text_col)
    if checkpoint:
        sig = sig.localCheckpoint(eager=True)
    return sig, _band_rows(sig, id_col)


def probe_lsh_index(index_signatures: DataFrame, index_bands: DataFrame,
                    new_docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", threshold: float = 0.5,
                    max_bucket_size: int | None = MAX_BUCKET_SIZE,
                    new_index: tuple[DataFrame, DataFrame] | None = None,
                    ) -> DataFrame:
    """Near-dup pairs touching a NEW batch, probed against a PERSISTED
    index (read back from parquet, or any DataFrame with
    build_lsh_index's schemas): new-vs-old and new-vs-new pairs, never
    old-vs-old — same output contract and same hot-bucket cap semantics
    as :func:`incremental_minhash_pairs` (the cap counts old+new rows
    per bucket together, as it must: a boilerplate bucket does not stop
    being hot because its members span ingest days). New ids must be
    disjoint from the index and that is ENFORCED (a re-ingested id
    would put two signature rows in the scoring joins and emit
    duplicate pairs with conflicting estimates — vacuum the old rows
    first). Cost per ingest: signature the new batch ONCE (eagerly
    materialized — four plan branches reference it and Catalyst does
    not CSE across branches; the band rows re-derive from the
    MATERIALIZED signatures, a per-row explode, where checkpointing
    sig and bands independently used to run the MinHash pipeline
    twice), one bucket-count pass + one probe join over the index
    keyed on (band_id, band_key), two id-keyed signature joins on the
    survivors.

    ``new_index=(sig, bands)`` lets a caller that ALSO persists the
    batch's index (the streaming maintenance loop commits pairs, bands
    and signatures per micro-batch) hand in its already-materialized
    frames so the batch is signatured exactly once end-to-end; the
    frames must be build_lsh_index output for the same batch."""
    if new_index is not None:
        new_sig, new_bands = new_index
    else:
        new_sig, new_bands = build_lsh_index(new_docs, id_col, text_col,
                                             checkpoint=True)
    overlap = (
        new_sig.select(id_col)
        .join(index_signatures.select(id_col), id_col, "left_semi")
        .limit(1).count()
    )
    if overlap:
        raise ValueError(
            "probe batch contains ids already in the index — re-ingest "
            "must remove the old rows first (duplicate signature rows "
            "would emit conflicting pair estimates)")
    bands = index_bands.unionByName(new_bands)
    if max_bucket_size is not None:
        # ONE aggregate over the union computes bucket sizes; both join
        # sides then semi-join the surviving keys — cheaper than a
        # window count evaluated per side (the union subtree feeds two
        # branches and would shuffle the full index twice)
        surviving = (
            bands.groupBy("band_id", "band_key")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("band_id", "band_key")
        )
        new_bands = new_bands.join(surviving, ["band_id", "band_key"],
                                   "left_semi")
        bands = bands.join(surviving, ["band_id", "band_key"],
                           "left_semi")
    a = new_bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}"))
            .alias("doc_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}"))
            .alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sig = index_signatures.unionByName(new_sig)
    return _score_pairs(cand, sig, id_col, threshold)
