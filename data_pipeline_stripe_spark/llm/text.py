"""Text analysis operators: stats, quality scoring, language ID, token
counting, fingerprinting. All native column expressions (JVM-side,
whole-stage-codegen'd) — per-row text math is exactly the workload where a
Python UDF would cost 10-100× at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.text import normalized_text_expr, tokens_expr

# Tiny per-language stopword lists used by the n-gram language heuristic.
# Deliberately small and SQL-reproducible.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "los", "es"],
    "fr": ["le", "la", "les", "et", "est"],
    "de": ["der", "die", "das", "und", "ist"],
}

# A BPE-ish tokenizer regex: runs of letters, runs of digits, or a single
# non-space symbol — a public, deterministic approximation of subword
# pre-tokenization.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def text_stats(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Per-document stats: chars, whitespace tokens, distinct tokens,
    type-token ratio, mean token length."""
    tokens = tokens_expr(text_col)
    d = df.select(F.col(id_col), F.col(text_col), tokens.alias("_t"))
    n_tokens = F.size("_t").cast("long")
    n_unique = F.size(F.array_distinct("_t")).cast("long")
    sum_len = F.aggregate("_t", F.lit(0), lambda acc, x: acc + F.length(x))
    return d.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique_tokens"),
        F.round(n_unique / n_tokens, 4).alias("ttr"),
        F.round(sum_len / n_tokens, 4).alias("mean_token_len"),
    )


def bpe_ish_token_count(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Token counts: whitespace tokens and BPE-ish regex tokens."""
    return df.select(
        F.col(id_col),
        F.size(tokens_expr(text_col)).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Stopword-vote language heuristic. Scores each language by counting
    tokens from its stopword list; predicts the max-scoring language
    (fixed priority order breaks ties), 'und' if all scores are zero."""
    tokens = tokens_expr(normalized_text_expr(text_col))
    d = df.select(F.col(id_col), tokens.alias("_t"))

    def _in(sw: list[str]):
        # Single-parameter lambda on purpose: F.filter treats a 2-parameter
        # function as (element, index).
        return lambda x: x.isin(sw)

    scores = {
        lang: F.size(F.filter("_t", _in(sw))) for lang, sw in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    predicted = F.when(best == 0, "und")
    for lang in STOPWORDS:  # insertion order = tie priority
        predicted = predicted.when(scores[lang] == best, lang)
    out = d.select(F.col(id_col), predicted.alias("predicted_lang"),
                   *[scores[lang].cast("long").alias(f"score_{lang}")
                     for lang in STOPWORDS])
    return out


def quality_score(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Composite document quality in [0,1]: length saturation (tokens/50),
    lexical diversity (type-token ratio), char-length saturation
    (chars/200). Weights 0.3/0.4/0.3; is_quality at 0.6."""
    tokens = tokens_expr(text_col)
    d = df.select(F.col(id_col), F.col(text_col), tokens.alias("_t"))
    n_tokens = F.size("_t")
    ttr = F.size(F.array_distinct("_t")) / n_tokens
    len_sat = F.least(F.lit(1.0), n_tokens / F.lit(50.0))
    char_sat = F.least(F.lit(1.0), F.length(text_col) / F.lit(200.0))
    score = F.round(0.3 * len_sat + 0.4 * ttr + 0.3 * char_sat, 4)
    return d.select(
        F.col(id_col),
        score.alias("quality"),
        (score >= 0.6).alias("is_quality"),
    )


# PII patterns — RE2-compatible (no lookaround/backreferences) so the
# DuckDB oracle evaluates the IDENTICAL pattern strings. Replacement order
# matters: URLs first (they may contain '@' and digit runs), then emails,
# then standalone digit runs.
PII_URL = r"https?://[^\s]+"
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_NUM = r"\d{6,}"


def pii_redact(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """PII redaction — the compliance pass of a training-data pipeline:
    URLs → <URL>, emails → <EMAIL>, 6+-digit runs (phone/account/SSN-like)
    → <NUM>, with per-document redaction counts for audit sampling.

    Pure regexp_replace/regexp_count expressions: stays in whole-stage
    codegen, no shuffle, runs at scan speed at any scale. Patterns are
    RE2-safe so any engine (and the DuckDB oracle) reproduces the output
    byte-for-byte."""
    t = F.col(text_col)
    n_urls = F.regexp_count(t, F.lit(PII_URL)).cast("long")
    step1 = F.regexp_replace(t, PII_URL, "<URL>")
    # Each count runs on the text the corresponding replace sees, so the
    # audit numbers equal the substitutions actually made (an email
    # inside a URL is consumed by the URL pass and must not count).
    n_emails = F.regexp_count(step1, F.lit(PII_EMAIL)).cast("long")
    step2 = F.regexp_replace(step1, PII_EMAIL, "<EMAIL>")
    n_nums = F.regexp_count(step2, F.lit(PII_NUM)).cast("long")
    return df.select(
        F.col(id_col),
        F.regexp_replace(step2, PII_NUM, "<NUM>").alias("clean_text"),
        n_urls.alias("n_urls"),
        n_emails.alias("n_emails"),
        n_nums.alias("n_nums"),
    )


# Curation policy thresholds (shared with the oracle SQL via these names).
CURATION_MIN_TOKENS = 10
CURATION_MAX_TOKENS = 100_000
CURATION_MIN_TTR = 0.2
CURATION_LANGS = ("en", "es", "fr", "de")


def curation_verdict(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     lang_col: str = "lang") -> DataFrame:
    """Keep/drop verdict with the FIRST failing rule named — the
    filter-with-audit-trail shape every corpus curation run needs (a bare
    boolean can't tell you why 40% of a crawl vanished). Rules, in order:
    too_short, too_long, low_diversity (type-token ratio), bad_lang.
    Expression-only: evaluates in the scan stage; the downstream
    groupBy(reason) profile is a 5-row aggregate."""
    tokens = tokens_expr(text_col)
    d = df.select(F.col(id_col), F.col(lang_col), tokens.alias("_t"))
    n = F.size("_t")
    ttr = F.size(F.array_distinct("_t")) / n
    reason = (
        F.when(n < CURATION_MIN_TOKENS, "too_short")
        .when(n > CURATION_MAX_TOKENS, "too_long")
        .when(F.round(ttr, 4) < CURATION_MIN_TTR, "low_diversity")
        .when(~F.col(lang_col).isin(*CURATION_LANGS), "bad_lang")
        .otherwise("ok")
    )
    return d.select(
        F.col(id_col),
        (reason == "ok").alias("keep"),
        reason.alias("reason"),
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Content fingerprints: md5 of normalized text (exact identity).
    SimHash (fuzzy identity) lives in dedup.simhash_fingerprints."""
    return df.select(
        F.col(id_col),
        F.md5(normalized_text_expr(text_col)).alias("md5_fp"),
        F.sha2(normalized_text_expr(text_col), 256).alias("sha256_fp"),
    )


def tfidf_top_terms(df: DataFrame, k: int = 3, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Top-k terms per document by TF-IDF (tf = in-doc count,
    idf = ln(N / df_t)), ranked on the rounded score with a term-string
    tie-break so the ranking is engine-reproducible. All JVM-side: one
    explode, two grouped aggregations, one broadcast-sized doc-frequency
    join, one window."""
    from pyspark.sql.window import Window as W

    tok = df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = df.count()  # one scalar action; the corpus count
    docfreq = (
        tok.distinct().groupBy("term").agg(F.count("*").alias("df_t"))
    )
    scored = tf.join(docfreq, "term").select(
        F.col(id_col),
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_t")), 6)
        .alias("tfidf"),
    )
    w = W.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", "rank")
    )


TFIDF_MAX_DOC_FREQ = 128


def tfidf_cosine_pairs(df: DataFrame, threshold: float = 0.5,
                       id_col: str = "doc_id",
                       text_col: str = "text",
                       max_doc_freq: int | None = TFIDF_MAX_DOC_FREQ,
                       ) -> DataFrame:
    """Sparse TF-IDF cosine similarity between documents, via the
    inverted index: dot(a,b) = Σ_terms w_a·w_b computed by a self-join on
    term (only co-occurring terms contribute — the sparse structure the
    dense embedding kernel can't exploit), normalized by per-doc norms.
    Returns (doc_a, doc_b, cosine >= threshold).

    **Document-frequency cap (default on):** a term in d documents
    contributes d² inverted-index pairs ON ONE SHUFFLE KEY, so a
    corpus-common term is the quadratic hot key at scale — the ×10
    replicated-fixture differential measured exactly this (a 50k-doc
    corpus ground for >30 min uncapped; the same guard
    ngram_jaccard_pairs always had). Terms with document frequency
    > ``max_doc_freq`` are dropped from weights AND norms consistently
    (deterministic, oracle-mirrored) — principled for TF-IDF, since a
    df ≈ N term's idf ≈ 0 weight contributes almost nothing to any
    cosine. ``None`` restores the exact full-vocabulary cosine."""
    tok = df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = df.count()
    docfreq = tok.distinct().groupBy("term").agg(F.count("*").alias("df_t"))
    if max_doc_freq is not None:
        docfreq = docfreq.filter(F.col("df_t") <= max_doc_freq)
    w = tf.join(docfreq, "term").select(
        F.col(id_col),
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_t"))).alias("w"),
    )
    norms = w.groupBy(id_col).agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    a = w.select(F.col(id_col).alias("doc_a"), "term", F.col("w").alias("wa"))
    b = w.select(F.col(id_col).alias("doc_b"), "term", F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("doc_a"), F.col("norm").alias("norm_a"))
    nb = norms.select(F.col(id_col).alias("doc_b"), F.col("norm").alias("norm_b"))
    return (
        dots.join(na, "doc_a").join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("norm_a") * F.col("norm_b")), 4)
            .alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def deterministic_sample(df: DataFrame, fraction_hex: str = "2000",
                         id_col: str = "doc_id") -> DataFrame:
    """Reproducible sampling: keep rows whose md5(id) prefix falls below a
    hex threshold ("2000" of "10000" ≈ 12.5%). Unlike df.sample, the
    selection is a pure function of the id — stable across retries,
    engines and cluster layouts (df.sample re-rolls per task attempt)."""
    key = F.substring(F.md5(F.col(id_col).cast("string")), 1, len(fraction_hex))
    return df.filter(key < fraction_hex)


def mixture_sample(df: DataFrame, rates_hex: dict[str, str],
                   default_hex: str, source_col: str = "source",
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted mixture sampling — the training-mix
    builder: each source keeps a different fraction of its rows
    (rate = hex_threshold / 0x10000), selected by md5(id) prefix so the
    draw is a pure function of the row id (retry-safe, engine-stable,
    re-runnable — everything df.sample is not).

    The per-source rates ride a broadcast VALUES dim joined to the fact —
    at 100 TB the mixture spec is a handful of rows against any number of
    fact partitions, and changing the mix is a dim edit, not a code
    change."""
    from ..sources.readers import inline_dim

    rows = [(s, t) for s, t in rates_hex.items()]
    dim = inline_dim(df.sparkSession, rows, "source_key string, rate_hex string")
    key = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    return (
        df.join(F.broadcast(dim), F.col(source_col) == F.col("source_key"),
                "left")
        .filter(key < F.coalesce("rate_hex", F.lit(default_hex)))
        .drop("source_key", "rate_hex")
    )


def chunk_documents(df: DataFrame, chunk_tokens: int = 64,
                    overlap: int = 16, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Overlapping token-window chunking — the context-window splitter of
    a training-data pipeline: each document becomes ceil(n/stride) chunks
    of up to `chunk_tokens` whitespace tokens, consecutive chunks sharing
    `overlap` tokens (stride = chunk_tokens - overlap).

    Pure array expressions (split → sequence of starts → posexplode →
    slice): no shuffle at all — chunking is embarrassingly parallel and
    stays inside whole-stage codegen, so at 100 TB it runs at scan speed.
    Returns (id, chunk_id, n_tokens, chunk_text); chunk_id is the 0-based
    window ordinal, deterministic for any partitioning.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(stride))
    return (
        df.select(F.col(id_col), toks.alias("_t"),
                  F.posexplode(starts).alias("chunk_id", "_start"))
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.least(F.size("_t") - F.col("_start") + 1, F.lit(chunk_tokens))
            .cast("long").alias("n_tokens"),
            F.array_join(F.slice("_t", F.col("_start"), chunk_tokens), " ")
            .alias("chunk_text"),
        )
    )


ROLLING_HASH_MOD = 1_000_000_007
ROLLING_HASH_BASE = 31


def rolling_hash_expr(col: Column | str) -> Column:
    """Polynomial rolling hash over the character stream:
    h = Σ ascii(c_i)·B^(n-i) mod P, folded left. Pure integer arithmetic,
    so any engine reproduces it exactly (the DuckDB oracle uses
    list_reduce over the same char stream)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLLING_HASH_BASE + F.ascii(x)) % ROLLING_HASH_MOD,
    )


def rolling_hash_fingerprints(df: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """Per-document rolling-hash fingerprint of the normalized text."""
    return df.select(
        F.col(id_col),
        rolling_hash_expr(normalized_text_expr(text_col)).alias("rolling_fp"),
    )


# Decontamination gram width: 8-token shingles (the common 8-/13-gram
# eval-overlap rule, sized down to this corpus's 10-99-token documents).
DECONTAM_WIDTH = 8


def decontamination(df: DataFrame, eval_mod: int = 20,
                    width: int = DECONTAM_WIDTH, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Eval-set decontamination — the train/test overlap audit every
    training-data pipeline needs before a benchmark claim: flags train
    documents sharing any width-token shingle with the held-out eval
    split (here: ids divisible by `eval_mod`), with per-document matched
    and total gram counts.

    Scale shape: the eval split's distinct grams are assumed benchmark-
    sized and ride a broadcast, so the train side is ONE explode + one
    broadcast hash probe + one groupBy — no fact-fact shuffle. The
    explode is width-deduped per document first (array_distinct before
    explode), so a repetitive document can't amplify its gram count."""
    from ..functions.text import shingles_expr, tokens_expr

    d = df.select(F.col(id_col), tokens_expr(text_col).alias("_t")).filter(
        F.size("_t") >= width
    )
    grams = d.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles_expr(F.col("_t"), width))).alias(
            "gram"
        ),
    )
    is_eval = F.col(id_col) % eval_mod == 0
    eval_grams = (
        grams.filter(is_eval).select("gram").distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        grams.filter(~is_eval)
        .join(F.broadcast(eval_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long")
            .alias("n_matched"),
        )
        .select(
            F.col(id_col),
            "n_matched",
            "n_grams",
            F.round(F.col("n_matched") / F.col("n_grams"), 4)
            .alias("contamination"),
            (F.col("n_matched") > 0).alias("contaminated"),
        )
    )


def decontamination_bloom(df: DataFrame, eval_mod: int = 20,
                          width: int = DECONTAM_WIDTH,
                          m_bits: int = 1 << 20, k: int = 4,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Eval-set decontamination, Bloom-prefiltered — same EXACT result
    as :func:`decontamination` (same schema, same rows), different
    physical plan for the web-scale regime where the eval gram set is
    too large to broadcast as strings.

    Three stages, none of which ships the full train gram stream to a
    join: (1) the eval split's distinct grams fold into a constant-size
    Bloom bitmap (one bit_or agg, output <= m_bits/64 rows);
    (2) every train gram is tested scan-side against the broadcast
    bitmap — survivors are true matches plus ~FP-rate of the rest;
    (3) only the survivors pay the exact keyed semi-join against the
    eval grams, which removes the false positives, so the final counts
    are exact. Total-gram counts come straight off the train stream
    (one grouped agg) and never touch a join.

    Exactness does NOT depend on filter geometry — a deliberately
    undersized bitmap only grows the verify join's input, never changes
    the result (pinned by test_decontamination_bloom_exact_under_fp).
    """
    from ..functions.text import shingles_expr, tokens_expr
    from ..operators.bloom import bloom_build, bloom_probe

    d = df.select(F.col(id_col), tokens_expr(text_col).alias("_t")).filter(
        F.size("_t") >= width
    )
    grams = d.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles_expr(F.col("_t"), width))).alias(
            "gram"
        ),
    )
    is_eval = F.col(id_col) % eval_mod == 0
    eval_grams = grams.filter(is_eval).select("gram").distinct()
    train_grams = grams.filter(~is_eval)

    bitmap = bloom_build(eval_grams, "gram", m_bits, k)
    candidates = bloom_probe(train_grams, "gram", bitmap, m_bits, k)
    hits = candidates.join(eval_grams, "gram", "left_semi")

    totals = train_grams.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_grams")
    )
    matched = hits.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_matched")
    )
    return (
        totals.join(matched, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_matched", F.lit(0)).cast("long")
            .alias("n_matched"),
            "n_grams",
            F.round(
                F.coalesce("n_matched", F.lit(0)) / F.col("n_grams"), 4
            ).alias("contamination"),
            (F.coalesce("n_matched", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def _bpe_merged_rows(df: DataFrame, id_col: str,
                     text_col: str) -> DataFrame:
    """Shared core of the BPE step: per kept token-position row after
    applying the corpus top-pair merge — columns (id, pair, pos,
    _new_tok, _n_before). See bpe_merge_step for the semantics and the
    window reformulation of the left-to-right fold."""
    from ..functions.text import tokens_expr

    toks = (
        df.select(F.col(id_col), tokens_expr(text_col).alias("_t"))
        .filter(F.size("_t") >= 2)
        .select(F.col(id_col), F.posexplode("_t").alias("pos", "tok"))
    )
    wd = W.partitionBy(id_col).orderBy("pos")
    with_next = toks.withColumn("nxt", F.lead("tok").over(wd))
    top_pair = (
        with_next.filter(F.col("nxt").isNotNull())
        .groupBy(F.concat_ws(" ", "tok", "nxt").alias("pair"))
        .agg(F.count("*").alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("pair"))
        .limit(1)
        .select("pair")
    )
    t = with_next.join(F.broadcast(top_pair))
    pa = F.split("pair", " ")[0]
    pb = F.split("pair", " ")[1]
    change = F.when(
        F.lag("tok").over(wd).isNull()
        | (F.col("tok") != F.lag("tok").over(wd)), 1
    ).otherwise(0)
    t = t.withColumn("_run", F.sum(change).over(
        wd.rowsBetween(W.unboundedPreceding, W.currentRow)))
    t = t.withColumn(
        "_run_start", F.min("pos").over(W.partitionBy(id_col, "_run"))
    )
    match = (F.col("tok") == pa) & (F.col("nxt") == pb)
    merge_here = match & (
        (pa != pb) | ((F.col("pos") - F.col("_run_start")) % 2 == 0)
    )
    t = t.withColumn("_merge", merge_here)
    t = t.withColumn(
        "_consumed", F.coalesce(F.lag("_merge").over(wd), F.lit(False))
    )
    new_tok = F.when(F.col("_merge"), F.concat(pa, pb)).otherwise(
        F.col("tok")
    )
    t = t.withColumn("_n_before", F.count("*").over(W.partitionBy(id_col)))
    return t.filter(~F.col("_consumed")).withColumn("_new_tok", new_tok)


def bpe_merge_step(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """ONE merge step of byte-pair-encoding vocabulary induction,
    distributed: find the corpus's most frequent adjacent token pair
    (count desc, pair asc tiebreak — deterministic), then apply the
    classic left-to-right non-overlapping merge to every document.
    Returns per-doc (id, pair, n_tokens_before, n_tokens_after,
    seq_md5) — the md5 of the merged sequence pins the exact merge
    semantics, not just the counts. Driver-loop the step for a full
    vocab build (same pattern as the k-means step).

    The left-to-right fold is reformulated so it needs NO sequential
    scan: for a pair (a,b) with a != b, adjacent matches can never
    overlap (an overlap would need a == b), so every match merges; for
    a == b, matches overlap exactly within runs of the repeated token,
    and left-to-right resolves to merging at EVEN offsets from the run
    start. Both cases are window expressions (lead/lag + gaps-and-
    islands run ids), so the whole step is two shuffles (the pair count
    and the per-doc regroup) on any corpus size; the 1-row top pair
    rides a broadcast cross."""
    kept = _bpe_merged_rows(df, id_col, text_col)
    ordered = F.array_sort(F.collect_list(F.struct("pos", "_new_tok")))
    return (
        kept.groupBy(id_col, "pair")
        .agg(
            F.first("_n_before").cast("long").alias("n_tokens_before"),
            F.count("*").cast("long").alias("n_tokens_after"),
            F.md5(
                F.array_join(
                    F.transform(ordered, lambda s: s["_new_tok"]), " "
                )
            ).alias("seq_md5"),
        )
    )


def bpe_apply_step(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Apply one BPE merge step and return the corpus with ``text_col``
    REPLACED by the merged token sequence (plus the chosen ``pair``) —
    the loopable form of :func:`bpe_merge_step` for a full vocabulary
    build: re-invoke on the output N times, collecting each round's
    1-row pair (the merge table). Merged tokens are joined with a space,
    so the output feeds straight back in.

    NOTE on the merged-token encoding: a merge concatenates the two
    tokens WITHOUT a separator (classic BPE string form); on corpora
    where that concatenation could collide with an existing token, use
    an out-of-alphabet joiner in ``new_tok`` — the fixture vocabulary
    has no such collisions.

    Documents with fewer than 2 tokens (nothing to merge) pass through
    with their token sequence unchanged and a NULL ``pair`` — without
    this the loop would silently shed any document that shrinks to one
    token, breaking the feeds-straight-back-in contract."""
    from ..functions.text import tokens_expr

    kept = _bpe_merged_rows(df, id_col, text_col)
    ordered = F.array_sort(F.collect_list(F.struct("pos", "_new_tok")))
    merged = (
        kept.groupBy(id_col, "pair")
        .agg(
            F.array_join(
                F.transform(ordered, lambda s: s["_new_tok"]), " "
            ).alias(text_col)
        )
        .select(id_col, text_col, "pair")
    )
    short = (
        df.select(F.col(id_col), tokens_expr(text_col).alias("_t"))
        .filter(F.size("_t") < 2)
        .select(
            F.col(id_col),
            F.array_join("_t", " ").alias(text_col),
            F.lit(None).cast("string").alias("pair"),
        )
    )
    return merged.unionByName(short)


# Repetition thresholds (shared with the oracle SQL via these names).
REPETITION_BIGRAM_FRAC = 0.2
REPETITION_TOP_TOKEN_RATIO = 0.2


def repetition_score(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Within-document repetition audit (the Gopher-style quality rule):
    fraction of duplicate token bigrams and the share of the most
    frequent single token, flagging documents where either exceeds 0.2.

    The bigram stats are pure array expressions (no shuffle); the top-
    token share is the one part that must see per-token counts, computed
    distributed via explode + two grouped aggregations — never an
    O(tokens x distinct-tokens) per-row loop, so a pathological 100k-
    token document costs |tokens| shuffled rows, not 1e10 comparisons."""
    from ..functions.text import shingles_expr, tokens_expr

    d = df.select(F.col(id_col), tokens_expr(text_col).alias("_t")).filter(
        F.size("_t") >= 2
    )
    n_bigrams = F.size("_t") - 1
    n_uniq = F.size(F.array_distinct(shingles_expr(F.col("_t"), 2)))
    bi = d.select(
        F.col(id_col),
        F.size("_t").cast("long").alias("n_tokens"),
        F.round(1 - n_uniq / n_bigrams, 4).alias("dup_bigram_frac"),
    )
    tok = d.select(F.col(id_col), F.explode("_t").alias("tok"))
    top = (
        tok.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.round(F.max("c") / F.sum("c"), 4).alias("top_token_ratio"))
    )
    return bi.join(top, id_col).select(
        F.col(id_col),
        "n_tokens",
        "dup_bigram_frac",
        "top_token_ratio",
        (
            (F.col("dup_bigram_frac") > REPETITION_BIGRAM_FRAC)
            | (F.col("top_token_ratio") > REPETITION_TOP_TOKEN_RATIO)
        ).alias("repetitive"),
    )


def lm_unigram_score(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Corpus-unigram language-model score per document — the CCNet-style
    quality signal: mean negative log probability of the document's
    tokens under the corpus unigram distribution (add-one smoothed).
    Low = typical text, high = rare-token noise; curation buckets on
    this the way CCNet buckets on wikipedia-LM perplexity.

    Scale shape: token explode → one grouped count for the vocabulary
    (joined back at |vocab| grain; AQE broadcasts it when small) →
    per-doc mean of
    -ln((c_t + 1) / (N + V)). Two shuffles at token grain, output at
    document grain; no Python, no per-row loops.

    Oracle-parity: each token's nll is floor-quantized to integer
    micro-nats BEFORE averaging (a double AVG would sum in
    engine/partition order; the integer sum is exact and
    order-independent), and the displayed mean is floor-truncated, not
    rounded (see q2's unit_cost for the ROUND half-ulp trap)."""
    tok = df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("c_t"))
    totals = vocab.agg(
        F.sum("c_t").alias("n_total"), F.count("*").alias("v_size")
    )
    nll_micro = F.floor(
        -F.log((F.col("c_t") + 1) / (F.col("n_total") + F.col("v_size")))
        * 1000000
    )
    # vocab joins WITHOUT a broadcast hint: a web-scale vocabulary is
    # heavy-tailed and can exceed any broadcast threshold — AQE picks
    # broadcast when the aggregate turns out small, shuffle-hash when it
    # doesn't. Only the 1-row totals is force-broadcast.
    return (
        tok.join(vocab, "tok")
        .join(F.broadcast(totals))
        .select(F.col(id_col), nll_micro.alias("_m"))
        .groupBy(id_col)
        .agg(
            (
                F.floor(
                    F.sum("_m") / (F.count("*") * 1000000.0) * 10000
                ) / 10000
            ).alias("mean_nll"),
            F.count("*").cast("long").alias("n_tokens"),
        )
    )


def lm_bigram_score(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Corpus-BIGRAM language-model score per document — the sharper
    CCNet-style quality signal beside :func:`lm_unigram_score`: the
    first token scores under the add-one unigram distribution, every
    later token under the add-one bigram conditional
    ``P(cur|prev) = (c(prev,cur)+1) / (c(prev)+V)``; the document score
    is the mean negative log probability over all tokens. Repetitive
    boilerplate scores LOW (its bigrams dominate the corpus), shuffled
    or rare-word noise scores HIGH even when its unigrams are common —
    the separation the unigram model can't see.

    Scale shape: the (prev, cur) stream is an array transform at scan
    speed (no self-join to build bigrams); corpus statistics are two
    grouped counts (bigram and context grain) joined back at stream
    grain — keyed joins AQE can broadcast when the vocabulary is small;
    the 1-row V total is force-broadcast. Output at document grain.

    Oracle-parity: same micro-nat floor quantization as the unigram
    score (per-token nll → integer micro-nats BEFORE the mean, final
    mean floor-truncated) so the result is order- and
    partitioning-independent and bit-identical across engines."""
    toks = df.select(F.col(id_col), tokens_expr(text_col).alias("_t"))
    firsts = toks.filter(F.size("_t") >= 1).select(
        F.col(id_col), F.element_at("_t", 1).alias("tok"))
    pairs = toks.filter(F.size("_t") >= 2).select(
        F.col(id_col),
        F.explode(F.expr(
            "transform(sequence(2, size(_t)), "
            "i -> struct(element_at(_t, i - 1) AS prev, "
            "element_at(_t, i) AS cur))"
        )).alias("bg"),
    ).select(id_col, "bg.prev", "bg.cur")

    tok_stream = df.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("tok"))
    vocab = tok_stream.groupBy("tok").agg(F.count("*").alias("c_t"))
    totals = vocab.agg(F.sum("c_t").alias("n_total"),
                       F.count("*").alias("v_size"))
    bg_counts = pairs.groupBy("prev", "cur").agg(F.count("*").alias("c_bg"))
    ctx_counts = pairs.groupBy("prev").agg(F.count("*").alias("c_ctx"))

    first_m = (
        firsts.join(vocab, "tok")
        .join(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.floor(-F.log((F.col("c_t") + 1)
                           / (F.col("n_total") + F.col("v_size")))
                    * 1000000).alias("_m"),
        )
    )
    pair_m = (
        pairs.join(bg_counts, ["prev", "cur"])
        .join(ctx_counts, "prev")
        .join(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.floor(-F.log((F.col("c_bg") + 1)
                           / (F.col("c_ctx") + F.col("v_size")))
                    * 1000000).alias("_m"),
        )
    )
    return (
        first_m.unionByName(pair_m)
        .groupBy(id_col)
        .agg(
            (
                F.floor(F.sum("_m") / (F.count("*") * 1000000.0) * 10000)
                / 10000
            ).alias("mean_nll"),
            F.count("*").cast("long").alias("n_tokens"),
        )
    )


def duplicate_spans(df: DataFrame, gram: int = 8,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Exact duplicated-substring spans (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", re-shaped for shuffle):
    hash every ``gram``-token window with its position, keep grams seen
    in ≥2 distinct documents, merge overlapping/adjacent hits per doc
    into maximal [start, end) token spans (lag-gap → cumsum interval
    merge; same-length spans make the end monotone in start, so one lag
    suffices). Returns (id, span_start, span_end, n_grams). Gram hashing
    rides the scan; the document-frequency filter is one ids-only
    groupBy; the merge is one window per doc."""
    g = (
        df.select(
            F.col(id_col),
            F.expr(rf"split(trim({text_col}), '\\s+')").alias("t"),
        )
        .filter(F.expr(f"size(t) >= {gram}"))
        .select(
            id_col,
            F.posexplode(F.expr(
                f"transform(sequence(0, size(t) - {gram}),"
                f" i -> md5(concat_ws(' ', slice(t, i + 1, {gram}))))"
            )).alias("pos0", "gh"),
        )
        .select(id_col, F.col("pos0").cast("long").alias("pos"), "gh")
    )
    freq = g.groupBy("gh").agg(
        F.countDistinct(id_col).alias("dfreq")
    ).filter(F.col("dfreq") >= 2)
    dup = g.join(freq.select("gh"), "gh").select(id_col, "pos")
    w = W.partitionBy(id_col).orderBy("pos")
    flagged = dup.withColumn(
        "new_span",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") > F.lag("pos").over(w) + gram),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "span_id",
        F.sum("new_span").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return numbered.groupBy(id_col, "span_id").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + gram).alias("span_end"),
        F.count("*").alias("n_grams"),
    ).select(id_col, "span_start", "span_end", "n_grams")


def remove_duplicate_spans(df: DataFrame, gram: int = 8,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """The rewrite half of exact-substring dedup: drop every token that
    falls inside a duplicated span and reassemble the document. Spans
    collapse to a small per-doc array (an equi join on the id — the
    range predicate runs as an array `exists` against the handful of
    spans, never a non-equi join), tokens outside all spans re-join in
    position order via an array_sort (collect_list alone does NOT
    preserve order across partitions). Returns
    (id, n_total, n_kept, n_removed, clean_md5) — the md5 stands in
    for the rewritten text so comparisons stay narrow; callers wanting
    the text itself take `clean_text` before the final select. A doc
    whose every token sits in duplicated spans still appears, with
    n_kept = 0 and a NULL clean_md5 — silently dropping fully-removed
    docs would make the operator lossy in exactly the wrong place."""
    spans = duplicate_spans(df, gram, id_col, text_col)
    sp_arr = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"),
                     F.col("span_end").alias("e"))
        ).alias("spans")
    )
    toks = (
        df.select(
            F.col(id_col),
            F.expr(rf"split(trim({text_col}), '\\s+')").alias("t"),
        )
        .select(
            id_col,
            F.expr("cast(size(t) as bigint)").alias("n_total"),
            F.posexplode("t").alias("pos0", "w"),
        )
        .select(id_col, "n_total",
                F.col("pos0").cast("long").alias("pos"), "w")
    )
    kept = (
        toks.join(sp_arr, id_col, "left")
        .filter(
            F.col("spans").isNull()
            | ~F.expr("exists(spans, x -> pos >= x.s AND pos < x.e)")
        )
    )
    agg = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.md5(F.concat_ws(" ", F.expr(
            "transform(array_sort(collect_list(struct(pos, w))),"
            " x -> x.w)"
        ))).alias("clean_md5"),
    )
    totals = df.select(
        F.col(id_col),
        F.expr(
            rf"cast(size(split(trim({text_col}), '\\s+')) as bigint)"
        ).alias("n_total"),
    )
    return (
        totals.join(agg, id_col, "left")
        .select(
            id_col, "n_total",
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
            (F.col("n_total")
             - F.coalesce("n_kept", F.lit(0).cast("long")))
            .alias("n_removed"),
            "clean_md5",
        )
    )


def bpe_train(df: DataFrame, n_merges: int, id_col: str = "doc_id",
              text_col: str = "text") -> tuple[DataFrame, list[str]]:
    """Full BPE vocabulary induction: drive :func:`bpe_apply_step` for
    ``n_merges`` rounds, collecting each round's winning pair — the
    merge TABLE a tokenizer ships. Same iterative-plan hygiene as
    kmeans_train / pagerank: each round's corpus is eagerly
    localCheckpoint-ed (the merge plan would nest N window stages deep
    otherwise) and the only driver-side data is the 1-row winning pair
    per round. Stops early when no mergeable pair remains (every doc
    down to one token). Returns (final corpus, merge list in order).

    Scale: each round is two shuffles regardless of corpus size; N
    rounds cost N× one step — the classic trade of distributed BPE
    (per-round global synchronization) against the sequential
    formulation that cannot distribute at all."""
    corpus = df.select(id_col, text_col).localCheckpoint(eager=True)
    merges: list[str] = []
    for _ in range(n_merges):
        stepped = bpe_apply_step(corpus, id_col, text_col)
        stepped = stepped.localCheckpoint(eager=True)
        pair_row = (
            stepped.filter(F.col("pair").isNotNull())
            .select("pair").limit(1).collect()
        )
        if not pair_row:
            break
        merges.append(pair_row[0]["pair"])
        corpus = stepped.select(id_col, text_col)
    return corpus, merges
