"""Unit tests for the LLM-pipeline operators on planted-duplicate corpora
and the driver's embeddings table."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_stripe_spark.llm import dedup, multimodal, similarity
from data_pipeline_stripe_spark.llm import text as llm_text
from data_pipeline_stripe_spark.sources import load_table

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon").split()


@pytest.fixture(scope="module")
def corpus(spark):
    base = " ".join(WORDS * 2)                      # 40 tokens
    near = " ".join(WORDS * 2).replace("kappa", "KAPPA-X", 1)  # 1 token differs
    other = " ".join(reversed(WORDS))               # same vocab, different order
    exact = base
    return spark.createDataFrame(
        [(0, base), (1, near), (2, other), (3, exact)],
        "doc_id long, text string",
    )


def test_exact_dedup_groups(spark, corpus):
    groups = {r.canonical_doc_id: r.n_copies
              for r in dedup.exact_dedup_groups(corpus).collect()}
    assert groups[0] == 2          # doc 3 collapses onto doc 0
    assert groups[1] == 1 and groups[2] == 1
    assert 3 not in groups         # min-id wins


def test_minhash_lsh_finds_planted_near_dup(spark, corpus):
    pairs = {(r.doc_a, r.doc_b): r.est_jaccard
             for r in dedup.minhash_lsh_pairs(corpus, threshold=0.5).collect()}
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0   # exact dup
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.5   # near dup
    # reversed-order doc shares almost no 3-shingles with the others
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_ngram_jaccard_exact_values(spark, corpus):
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in dedup.ngram_jaccard_pairs(corpus, threshold=0.1).collect()}
    assert pairs[(0, 3)] == 1.0
    # doc1 changed 1 token of 40 (dup'd words → 20 distinct shingles hit);
    # jaccard must be high but < 1
    assert 0.5 <= pairs[(0, 1)] < 1.0


def test_simhash_identical_docs_same_fingerprint(spark, corpus):
    fps = {r.doc_id: r.simhash
           for r in dedup.simhash_fingerprints(corpus).collect()}
    assert fps[0] == fps[3]
    assert set(fps[0]) <= {"0", "1"} and len(fps[0]) == 16
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in dedup.simhash_near_dup_pairs(corpus, max_hamming=32).collect()}
    assert pairs[(0, 3)] == 0


def test_simhash_shingle_pairs_separate_planted_dups(spark, sf_dir):
    """On the driver corpus (planted near-dups at shingle-Jaccard ≈0.99,
    background <0.1), shingle-feature 32-bit SimHash at Hamming<=2 must
    recover mostly-planted pairs — and crucially stay SMALL (the unigram
    variant drowns in tens of thousands of vocabulary collisions)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.simhash_near_dup_pairs(docs).collect()
    assert 0 < len(pairs) < 100
    planted = {(r.doc_a, r.doc_b)
               for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    found = {(r.doc_a, r.doc_b) for r in pairs}
    # precision against exact Jaccard: most simhash pairs are real dups
    assert len(found & planted) / len(found) >= 0.8


def test_chunk_documents_coverage_and_overlap(spark, corpus):
    chunks = llm_text.chunk_documents(
        corpus, chunk_tokens=16, overlap=4
    ).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r
    texts = {r.doc_id: r.text for r in corpus.collect()}
    for doc_id, doc_chunks in by_doc.items():
        toks = texts[doc_id].split()
        stride = 12
        # chunk count = number of stride starts within the doc
        assert len(doc_chunks) == (len(toks) + stride - 1) // stride
        for cid, r in doc_chunks.items():
            start = cid * stride
            expect = toks[start:start + 16]
            assert r.chunk_text.split() == expect
            assert r.n_tokens == len(expect)
        # consecutive chunks overlap by exactly 4 tokens (except the tail)
        full = [c for c in sorted(doc_chunks) if doc_chunks[c].n_tokens == 16]
        for cid in full[:-1]:
            a = doc_chunks[cid].chunk_text.split()
            b = doc_chunks[cid + 1].chunk_text.split()
            assert a[-4:] == b[:4]
    with pytest.raises(ValueError):
        llm_text.chunk_documents(corpus, chunk_tokens=8, overlap=8)


def test_text_stats_and_quality(spark, corpus):
    stats = {r.doc_id: r for r in llm_text.text_stats(corpus).collect()}
    assert stats[0].n_tokens == 40 and stats[0].n_unique_tokens == 20
    assert stats[0].ttr == 0.5
    q = {r.doc_id: r for r in llm_text.quality_score(corpus).collect()}
    assert 0.0 <= q[0].quality <= 1.0


def test_language_id_votes(spark):
    docs = spark.createDataFrame(
        [(1, "the cat and the dog is a pet"),
         (2, "el gato y la casa es de los dos"),
         (3, "xyzzy plugh")],
        "doc_id long, text string",
    )
    langs = {r.doc_id: r.predicted_lang for r in llm_text.language_id(docs).collect()}
    assert langs == {1: "en", 2: "es", 3: "und"}


def test_brute_force_topk_self_excluded_and_ranked(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=4)
    rows = out.collect()
    by_q = {}
    for r in rows:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append((r.rank, r.similarity))
    for q, rs in by_q.items():
        rs.sort()
        assert [r[0] for r in rs] == [1, 2, 3, 4]
        sims = [r[1] for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_ivf_topk_is_valid_approximation(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), "embedding")
    exact = similarity.brute_force_topk(emb, queries, k=4)
    approx = similarity.ivf_topk(emb, queries, cents, k=4)
    exact_best = {r.query_id: r.similarity for r in exact.collect() if r.rank == 1}
    for r in approx.collect():
        # approximate sims can never beat the exact best for that query
        assert r.similarity <= exact_best[r.query_id] + 1e-9


_BOILER = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
           "eiusmod tempor incididunt ut labore et dolore magna aliqua")
_TAIL = "quick brown fox jumps over the lazy dog again and once more today"


@pytest.fixture(scope="module")
def hot_key_corpus(spark):
    """20 docs sharing a 19-token boilerplate prefix (the planted hot key)
    + a genuine near-dup pair (100, 101) with non-boilerplate overlap."""
    rows = [(i, f"{_BOILER} unique{i}a unique{i}b") for i in range(20)]
    rows += [(100, _TAIL), (101, _TAIL.replace("today", "tonight"))]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_doc_freq_cap_kills_boilerplate_pair_blowup(spark, hot_key_corpus):
    """Without the cap, the shared boilerplate makes every one of the 190
    doc pairs a 'near-dup' (quadratic blowup on the hot shingles). With
    the cap, boilerplate shingles (df=20) leave the index and only the
    genuinely-overlapping pair survives."""
    uncapped = dedup.ngram_jaccard_pairs(hot_key_corpus, max_doc_freq=None)
    assert uncapped.count() >= 190
    capped = {(r.doc_a, r.doc_b) for r in
              dedup.ngram_jaccard_pairs(hot_key_corpus, max_doc_freq=10).collect()}
    assert capped == {(100, 101)}


def test_lsh_precomputed_signatures_give_identical_pairs(spark, corpus):
    """The scale path materializes minhash_signatures once and passes it
    in; results must be identical to the self-contained form."""
    sig = dedup.minhash_signatures(corpus).persist()
    try:
        with_sig = {(r.doc_a, r.doc_b, r.est_jaccard) for r in
                    dedup.minhash_lsh_pairs(corpus, signatures=sig).collect()}
        without = {(r.doc_a, r.doc_b, r.est_jaccard) for r in
                   dedup.minhash_lsh_pairs(corpus).collect()}
        assert with_sig == without
    finally:
        sig.unpersist()


def test_lsh_bucket_cap_drops_boilerplate_cluster(spark):
    """An LSH bucket of d near-identical docs is d² pairs on one shuffle
    key. With the cap, the oversize bucket is dropped whole (that cluster
    is exact-dedup's job); a small genuine near-dup pair still collides in
    its own (size-2) bucket and survives."""
    rows = [(i, _BOILER) for i in range(20)]          # identical boilerplate
    rows += [(100, _TAIL), (101, _TAIL.replace("today", "tonight"))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    no_cap = dedup.minhash_lsh_pairs(docs, max_bucket_size=None).count()
    assert no_cap >= 190
    capped = {(r.doc_a, r.doc_b) for r in
              dedup.minhash_lsh_pairs(docs, max_bucket_size=5).collect()}
    assert capped == {(100, 101)}


def test_cosine_near_dup_bucketed_subset_and_recall(spark, sf_dir):
    """The IVF-bucketed near-dup result must be a subset of the exact
    brute-force pairs (identical similarity values on shared pairs) with
    recall >= 0.9 — the independent check the mirrored SQL oracle cannot
    provide (it only verifies the bucketing transcription)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), "embedding")
    exact = {
        (r.id_a, r.id_b): r.similarity
        for r in similarity.cosine_near_dup_pairs(emb, threshold=0.45).collect()
    }
    bucketed = {
        (r.id_a, r.id_b): r.similarity
        for r in similarity.cosine_near_dup_bucketed(
            emb, cents, threshold=0.45, n_probes=2).collect()
    }
    assert set(bucketed) <= set(exact)
    for pair, sim in bucketed.items():
        assert sim == exact[pair]  # exact cosine on candidates, not approx
    assert exact, "fixture has no near-dup pairs at threshold 0.45"
    recall = len(bucketed) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} < 0.9 ({len(bucketed)}/{len(exact)})"


def test_dedup_is_idempotent(spark, sf_dir):
    """Property: deduplicating an already-deduplicated corpus removes
    nothing, and the deduplicated corpus contains no qualifying pair."""
    docs = load_table(spark, sf_dir, "documents")
    survivors = docs.join(
        dedup.ngram_jaccard_pairs(docs, threshold=0.5),
        docs.doc_id == F.col("doc_b"), "left_anti",
    ).select("doc_id", "text")
    n1 = survivors.count()
    again = survivors.join(
        dedup.ngram_jaccard_pairs(survivors, threshold=0.5),
        survivors.doc_id == F.col("doc_b"), "left_anti",
    )
    assert again.count() == n1
    assert dedup.ngram_jaccard_pairs(survivors, threshold=0.5).count() == 0


def test_minhash_estimates_track_exact_jaccard(spark, sf_dir):
    """Property: for every LSH candidate pair, the 16-slot estimate is
    within 0.35 of the exact shingle Jaccard (coarse but unbiased)."""
    docs = load_table(spark, sf_dir, "documents")
    est = {(r.doc_a, r.doc_b): r.est_jaccard
           for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    exact = {(r.doc_a, r.doc_b): r.jaccard
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert est, "no candidate pairs found (planted near-dups exist)"
    for pair, e in est.items():
        assert pair in exact, f"LSH pair {pair} has low exact jaccard"
        assert abs(e - exact[pair]) <= 0.35


def test_pandas_kernel_matches_jvm_topk(spark, sf_dir):
    """The Arrow/numpy kernel must return the same neighbor sets as the
    JVM expression implementation (similarities can differ in the last
    ulp, so compare ids + rounded sims, not bits)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    jvm = similarity.brute_force_topk(emb, queries, k=5)
    arrow = similarity.brute_force_topk_pandas(emb, queries, k=5)
    j = {(r.query_id, r.rank): (r.neighbor_id, round(r.similarity, 5))
         for r in jvm.collect()}
    a = {(r.query_id, r.rank): (r.neighbor_id, round(r.similarity, 5))
         for r in arrow.collect()}
    assert j == a


def test_pandas_topk_chunked_queries_invariant(spark, sf_dir):
    """The query side streams through toLocalIterator in bounded chunks
    (never a whole-batch collect — the driver-OOM guard): forcing a
    2-row chunk on an 8-query batch must yield exactly the single-chunk
    result, because chunks partition the query ids and the per-query
    rank window never crosses a chunk."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    one = similarity.brute_force_topk_pandas(
        emb, queries, k=3, quant=similarity.RP_QUANT)
    many = similarity.brute_force_topk_pandas(
        emb, queries, k=3, quant=similarity.RP_QUANT, chunk_rows=2)
    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert rows(one) == rows(many)


def test_multimodal_plumbing_and_stub(spark, corpus):
    media = multimodal.attach_binary_payload(corpus)
    feats = {r.doc_id: r for r in
             multimodal.extract_image_features(media, decoder="fake").collect()}
    for doc_id, r in feats.items():
        assert r.n_pixels == r.width * r.height
        assert r.width == r.n_bytes % 1024 + 1
    with pytest.raises(ValueError, match="unsupported image format"):
        multimodal.decode_image_real(b"bytes")  # not a known magic


def test_pii_redact_planted(spark):
    rows = [
        (0, "mail me at alice.smith+x@example.co.uk or visit "
            "https://example.com/a?b=1 room 12345"),
        (1, "account 123456789 phone 555123456 ok"),
        (2, "no pii here, just words and the number 42"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in llm_text.pii_redact(df).collect()}
    assert out[0].clean_text == "mail me at <EMAIL> or visit <URL> room 12345"
    assert (out[0].n_emails, out[0].n_urls, out[0].n_nums) == (1, 1, 0)
    assert out[1].clean_text == "account <NUM> phone <NUM> ok"
    assert out[1].n_nums == 2
    assert out[2].clean_text == rows[2][1]
    assert (out[2].n_emails, out[2].n_urls, out[2].n_nums) == (0, 0, 0)


def test_pii_redact_counts_match_substitutions(spark):
    """An email-looking token inside a URL is consumed by the URL pass;
    the email audit count must reflect the substitutions actually made,
    not matches against the original text."""
    df = spark.createDataFrame(
        [(0, "see https://x.com/a@b.com for details")],
        "doc_id long, text string",
    )
    r = llm_text.pii_redact(df).collect()[0]
    assert r.clean_text == "see <URL> for details"
    assert r.n_urls == 1 and r.n_emails == 0


def test_curation_verdict_rules_in_order(spark):
    long_text = " ".join(f"w{i}" for i in range(20))
    rows = [
        (0, "tiny doc", "en"),                      # 2 tokens -> too_short
        (1, "a a a a a a a a a a a b", "en"),       # ttr 2/12 -> low_diversity
        (2, long_text, "zh"),                       # -> bad_lang
        (3, long_text, "en"),                       # -> ok
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in llm_text.curation_verdict(df).collect()}
    assert out[0].reason == "too_short" and not out[0].keep
    assert out[1].reason == "low_diversity"
    assert out[2].reason == "bad_lang"
    assert out[3].reason == "ok" and out[3].keep


def test_mixture_sample_rates_and_determinism(spark, sf_dir):
    from data_pipeline_stripe_spark.llm import text as llm_text
    from data_pipeline_stripe_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    rates = {"src0": "8000", "src1": "4000"}
    out = llm_text.mixture_sample(docs, rates, default_hex="0800")
    rows = out.collect()
    # deterministic: second run identical
    assert sorted(r.doc_id for r in rows) == \
        sorted(r.doc_id for r in
               llm_text.mixture_sample(docs, rates, "0800").collect())
    # the selection rule, recomputed independently with hashlib: keep iff
    # md5(doc_id) 4-hex prefix < the source's threshold
    import hashlib

    thresh = {"src0": "8000", "src1": "4000"}
    expected = {
        r.doc_id for r in docs.select("doc_id", "source").collect()
        if hashlib.md5(str(r.doc_id).encode()).hexdigest()[:4]
        < thresh.get(r.source, "0800")
    }
    assert {r.doc_id for r in rows} == expected
    # schema passthrough: sampling drops rows, not columns
    assert set(docs.columns) == set(out.columns)
    # selection is a broadcast dim join + filter, no Python boundary
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "BatchEvalPython" not in plan


def test_decontamination_flags_planted_overlap(spark):
    # eval doc 0 (id % 20 == 0); train doc 21 copies an 8-gram run from
    # it, train doc 22 shares no 8-gram (different vocabulary order).
    eval_text = " ".join(WORDS)                       # 20 tokens
    leak = "x1 x2 " + " ".join(WORDS[:8]) + " x3 x4"  # 8-token overlap run
    clean = " ".join(reversed(WORDS))
    df = spark.createDataFrame(
        [(0, eval_text), (21, leak), (22, clean)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in llm_text.decontamination(df).collect()}
    assert set(out) == {21, 22}                # eval doc never emitted
    assert out[21].contaminated and out[21].n_matched == 1
    assert not out[22].contaminated and out[22].n_matched == 0
    assert out[21].n_grams == 5                # 12 tokens -> 5 distinct 8-grams
    assert out[21].contamination == 0.2


def test_decontamination_dedupes_repeated_grams(spark):
    # A train doc repeating the leaked gram 3x still counts it ONCE
    # (array_distinct before explode caps amplification).
    eval_text = " ".join(WORDS[:8])
    rep = " ".join(WORDS[:8] * 3)  # the eval 8-gram occurs at 3 offsets
    df = spark.createDataFrame(
        [(0, eval_text), (1, rep)], "doc_id long, text string"
    )
    row = llm_text.decontamination(df).collect()[0]
    assert row.doc_id == 1 and row.contaminated
    # 24 tokens -> 17 windows but only 8 DISTINCT grams (cyclic repeats)
    assert row.n_grams == 8 and row.n_matched == 1


def test_repetition_score_exact_values(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # all-dup bigrams, one token
            (2, " ".join(WORDS)),                # 20 distinct tokens
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in llm_text.repetition_score(df).collect()}
    # doc 1: 3 bigrams all "spam spam" -> 1 distinct -> frac 1 - 1/3
    assert out[1].dup_bigram_frac == pytest.approx(0.6667)
    assert out[1].top_token_ratio == 1.0 and out[1].repetitive
    assert out[2].dup_bigram_frac == 0.0
    assert out[2].top_token_ratio == pytest.approx(0.05)
    assert not out[2].repetitive


def test_rp_lsh_pairs_subset_and_recall(spark, sf_dir):
    """The RP-LSH pair result must be a subset of the exact brute-force
    pairs (identical similarity on shared pairs); recall is measured
    against the exact baseline — the independent check the mirrored SQL
    oracle cannot provide."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.similarity
        for r in similarity.cosine_near_dup_pairs(emb, threshold=0.45).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.similarity
        for r in similarity.rp_lsh_pairs(emb, threshold=0.45).collect()
    }
    assert set(lsh) <= set(exact)
    for pair, sim in lsh.items():
        assert sim == exact[pair]  # exact cosine on candidates
    assert exact, "fixture has no near-dup pairs at threshold 0.45"
    recall = len(lsh) / len(exact)
    # 8 bands x 4 bits catch a cosine-0.5 pair w.p. ~0.8; the planes are
    # deterministic so this is a fixed property of the fixture, with
    # headroom for regenerated testdata
    assert recall >= 0.6, f"recall {recall:.3f} ({len(lsh)}/{len(exact)})"


def test_rp_signatures_pack_consistently(spark, sf_dir):
    """Band keys are 4-bit, and the packed 32-bit signature is exactly
    the concatenation of the 8 band keys."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows = similarity.rp_lsh_signatures(emb).collect()
    assert len(rows) == emb.count()
    for r in rows[:50]:
        bands = [r[f"band_{b}"] for b in range(8)]
        assert all(0 <= v <= 15 for v in bands)
        packed = 0
        for v in bands:
            packed = (packed << 4) | v
        assert r.sig == packed


def test_shared_passage_pairs_winnowing_guarantee(spark):
    """A single shared run of k+w-1 = 8 tokens must yield >= 1 shared
    fingerprint (the winnowing guarantee); a long shared passage clears
    min_shared even when the rest of the docs are disjoint; docs with
    no shared passage produce nothing."""
    passage = " ".join(WORDS[:12])                      # 12-token passage
    a = passage + " " + " ".join(f"a{i}" for i in range(20))
    b = " ".join(f"b{i}" for i in range(20)) + " " + passage
    c = " ".join(f"c{i}" for i in range(30))            # disjoint
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    pairs = {(r.doc_a, r.doc_b): r.n_shared
             for r in dedup.shared_passage_pairs(df, min_shared=1).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(p == (1, 2) for p in pairs)
    # guarantee floor: an exactly-8-token shared run still fingerprints
    short_b = " ".join(f"d{i}" for i in range(10)) + " " + " ".join(WORDS[:8])
    short_a = " ".join(WORDS[:8]) + " " + " ".join(f"e{i}" for i in range(10))
    df2 = spark.createDataFrame(
        [(1, short_a), (2, short_b)], "doc_id long, text string"
    )
    got = dedup.shared_passage_pairs(df2, min_shared=1).collect()
    assert [(r.doc_a, r.doc_b) for r in got] == [(1, 2)]


def test_lm_unigram_score_ranks_rare_tokens_higher(spark):
    """A document of corpus-rare tokens must score a higher mean nll
    than one made of the corpus's most common tokens."""
    common = "the " * 30
    rare = "zyzzyva qwertian plugh xyzzy"
    filler = [(i, "the cat and the dog and the bird") for i in range(10)]
    df = spark.createDataFrame(
        filler + [(100, common.strip()), (101, rare)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in llm_text.lm_unigram_score(df).collect()}
    assert out[101].mean_nll > out[100].mean_nll
    assert out[101].n_tokens == 4 and out[100].n_tokens == 30


def test_quantize_int8_error_bound_and_range(spark, sf_dir):
    """Quantization property: every code is in [-127, 127] and the
    dequantized value q*scale is within scale/2 + display-truncation of
    the original (the defining bound of floor(x/s + 0.5))."""
    emb = load_table(spark, sf_dir, "embeddings")
    qz = similarity.quantize_int8(emb)
    joined = emb.join(qz, "vec_id").select("vec_id", "embedding", "scale", "qvec")
    bad = joined.filter(
        F.exists("qvec", lambda q: (q > 127) | (q < -127))
    ).count()
    assert bad == 0
    r = joined.filter(F.col("scale") > 0).select(
        F.max(
            F.array_max(
                F.zip_with(
                    F.transform("embedding", lambda x: x.cast("double")),
                    "qvec",
                    lambda x, q: F.abs(x - q * F.col("scale")),
                )
            )
        ).alias("max_err"),
        F.max("scale").alias("max_scale"),
    ).collect()[0]
    # scale is floor-truncated at 1e-9 for display, so allow that slack
    assert r.max_err <= r.max_scale / 2 + 1e-9 * 128


def test_quantized_topk_agrees_with_float_exact(spark, sf_dir):
    """int8-quantized top-5 must broadly agree with the float-exact
    top-5: >= 80% neighbor overlap across the query set (int8 keeps
    ~1e-2 cosine fidelity; rank swaps happen only inside near-ties)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {}
    for r in similarity.brute_force_topk(emb, queries, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    quant = {}
    for r in similarity.quantized_topk(emb, queries, k=5).collect():
        quant.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(quant) == set(exact)
    hits = sum(len(exact[q] & quant[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.8, f"neighbor overlap {hits}/{total} < 0.8"


def test_semantic_dedup_clusters_are_consistent(spark, sf_dir):
    """SemDeDup keep-set properties: exactly one keeper per cluster, the
    keeper is the min vec_id of its cluster, every corpus vector appears
    exactly once, and the clusters are unions of the bucketed near-dup
    pairs (both endpoints of every pair share a cluster)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), "embedding")
    out = similarity.semantic_dedup(emb, cents, threshold=0.45,
                                    n_probes=2).collect()
    assert len(out) == emb.count()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m.vec_id for m in members)
        keepers = [m for m in members if m.keep]
        assert len(keepers) == 1 and keepers[0].vec_id == cid
    label = {r.vec_id: r.cluster_id for r in out}
    pairs = similarity.cosine_near_dup_bucketed(
        emb, cents, threshold=0.45, n_probes=2).collect()
    assert pairs, "fixture has no near-dup pairs at threshold 0.45"
    for p in pairs:
        assert label[p.id_a] == label[p.id_b]


# ---------------------------------------------------------------------------
# Bloom filter + Bloom-prefiltered decontamination


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from data_pipeline_stripe_spark.operators.bloom import (
        bloom_build, bloom_probe,
    )
    members = spark.range(0, 200).select(
        F.concat(F.lit("key-"), F.col("id")).alias("key")
    )
    bitmap = bloom_build(members, "key", m_bits=1 << 12, k=4)
    # bitmap stays word-bounded regardless of key count
    assert bitmap.count() <= (1 << 12) // 64
    # every member passes (no false negatives — the Bloom invariant)
    assert bloom_probe(members, "key", bitmap, 1 << 12, 4).count() == 200
    # non-members: 4096 bits / 200*4 set bits -> FP rate well under 50%;
    # assert a loose bound so the test is immune to hash luck
    others = spark.range(10_000, 11_000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("key")
    )
    fp = bloom_probe(others, "key", bitmap, 1 << 12, 4).count()
    assert fp < 500


def test_bloom_probe_is_scan_side(spark):
    # The probe plan must not shuffle the probe stream: no Exchange
    # between the scan and the filter — only the 1-row bitmap broadcast.
    from data_pipeline_stripe_spark.operators.bloom import (
        bloom_build, bloom_probe,
    )
    members = spark.range(0, 50).select(F.col("id").cast("string").alias("key"))
    probe = spark.range(0, 1000).select(F.col("id").cast("string").alias("key"))
    out = bloom_probe(probe, "key", bloom_build(members, "key"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only join is the broadcast of the single bitmap row
    assert plan.count("Join") == plan.count("BroadcastNestedLoopJoin")


def test_decontamination_bloom_matches_exact(spark):
    eval_text = " ".join(WORDS)
    leak = "x1 x2 " + " ".join(WORDS[:8]) + " x3 x4"
    clean = " ".join(reversed(WORDS))
    df = spark.createDataFrame(
        [(0, eval_text), (21, leak), (22, clean)],
        "doc_id long, text string",
    )
    exact = {tuple(r) for r in llm_text.decontamination(df).collect()}
    bloomed = {tuple(r) for r in llm_text.decontamination_bloom(df).collect()}
    assert bloomed == exact


def test_decontamination_bloom_exact_under_fp(spark):
    # A deliberately tiny bitmap (64 bits, k=2) forces a high false-
    # positive rate; the exact verify join must erase every FP so the
    # output is STILL identical to the broadcast-exact implementation.
    eval_text = " ".join(WORDS)
    leak = "x1 x2 " + " ".join(WORDS[:8]) + " x3 x4"
    clean = " ".join(reversed(WORDS))
    noisy = " ".join(f"n{i}" for i in range(30))
    df = spark.createDataFrame(
        [(0, eval_text), (21, leak), (22, clean), (23, noisy)],
        "doc_id long, text string",
    )
    exact = {tuple(r) for r in llm_text.decontamination(df).collect()}
    bloomed = {
        tuple(r)
        for r in llm_text.decontamination_bloom(df, m_bits=64, k=2).collect()
    }
    assert bloomed == exact


def test_incremental_dedup_only_new_touching_pairs(spark):
    # docs 0,1 are near-identical "old" corpus; doc 4 (new: id%5==4) is
    # a near-copy of 0. The incremental pass must find (0,4) and (1,4)
    # but NEVER the old-old pair (0,1) — which the full pass does find.
    base = " ".join(WORDS * 3)
    df = spark.createDataFrame(
        [(0, base),
         (1, base.replace("kappa", "KAPPA-X", 1)),
         (2, " ".join(reversed(WORDS))),
         (4, base.replace("zeta", "ZETA-Y", 1))],
        "doc_id long, text string",
    )
    full = {(r.doc_a, r.doc_b)
            for r in dedup.minhash_lsh_pairs(df).collect()}
    inc = {(r.doc_a, r.doc_b)
           for r in dedup.incremental_minhash_pairs(
               df, F.col("doc_id") % 5 == 4).collect()}
    assert (0, 1) in full
    assert inc == {p for p in full if 4 in p}
    assert (0, 4) in inc and (1, 4) in inc


def test_bloom_bitmap_survives_persistence(spark, tmp_path):
    # the bitmap is an ordinary DataFrame: write it as parquet, read it
    # back, probe with the reloaded copy — same survivors (the persisted
    # LSH/Bloom index claim in SCALING.md rests on this round-trip).
    from data_pipeline_stripe_spark.operators.bloom import (
        bloom_build, bloom_probe,
    )
    members = spark.range(0, 100).select(
        F.concat(F.lit("m-"), F.col("id")).alias("key")
    )
    probe = spark.range(0, 2000).select(
        F.concat(F.lit("m-"), (F.col("id") * 7).cast("long")).alias("key")
    )
    bitmap = bloom_build(members, "key")
    live = {r.key for r in bloom_probe(probe, "key", bitmap).collect()}
    path = str(tmp_path / "bloom_index")
    bitmap.write.parquet(path)
    reloaded = spark.read.parquet(path)
    persisted = {r.key
                 for r in bloom_probe(probe, "key", reloaded).collect()}
    assert persisted == live
    assert {f"m-{i*7}" for i in range(15) if i*7 < 100} <= live


def test_bpe_merge_step_classic_semantics(spark):
    # corpus where the top pair is ("x","x") — the overlapping-run case:
    # left-to-right BPE on "x x x" merges the FIRST two only ("xx x"),
    # and "x x x x" becomes "xx xx". Doc 3's pair count can't win.
    df = spark.createDataFrame(
        [(1, "x x x"), (2, "x x x x"), (3, "a b")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in llm_text.bpe_merge_step(df).collect()}
    import hashlib
    assert rows[1].pair == "x x"
    assert (rows[1].n_tokens_before, rows[1].n_tokens_after) == (3, 2)
    assert rows[1].seq_md5 == hashlib.md5(b"xx x").hexdigest()
    assert (rows[2].n_tokens_before, rows[2].n_tokens_after) == (4, 2)
    assert rows[2].seq_md5 == hashlib.md5(b"xx xx").hexdigest()
    assert (rows[3].n_tokens_before, rows[3].n_tokens_after) == (2, 2)
    assert rows[3].seq_md5 == hashlib.md5(b"a b").hexdigest()


def test_bpe_merge_step_distinct_pair(spark):
    # top pair with a != b: every match merges, consumed tokens drop,
    # and an immediately repeated pattern merges at both sites.
    df = spark.createDataFrame(
        [(1, "p q p q r"), (2, "p q z")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in llm_text.bpe_merge_step(df).collect()}
    import hashlib
    assert rows[1].pair == "p q"
    assert rows[1].seq_md5 == hashlib.md5(b"pq pq r").hexdigest()
    assert rows[2].seq_md5 == hashlib.md5(b"pq z").hexdigest()


def test_bpe_vocab_build_loop_matches_python_reference(spark):
    # Three driver-looped merge steps must equal an independently
    # implemented sequential BPE (greedy left-to-right merge of the
    # globally most frequent pair, count desc / pair asc tiebreak).
    corpus = {
        1: "a b a b c d",
        2: "a b c d c d",
        3: "b a a b a b",
    }

    def py_bpe_step(docs):
        from collections import Counter
        counts = Counter()
        for t in docs.values():
            toks = t.split()
            counts.update(f"{x} {y}" for x, y in zip(toks, toks[1:]))
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        a, b = pair.split(" ")
        out = {}
        for k, t in docs.items():
            toks, res, i = t.split(), [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(toks[i])
                    i += 1
            out[k] = " ".join(res)
        return pair, out

    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    expect = dict(corpus)
    for _ in range(3):
        out = llm_text.bpe_apply_step(df).collect()
        pair_expect, expect = py_bpe_step(expect)
        got = {r.doc_id: r.text for r in out}
        assert {r.pair for r in out} == {pair_expect}
        assert got == expect
        df = spark.createDataFrame(
            [(k, v) for k, v in got.items()], "doc_id long, text string"
        )


def test_hard_negatives_excludes_same_cluster(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    out = similarity.hard_negatives(
        emb, emb.filter(F.col("vec_id") < 8), cents, k=5
    ).collect()
    assert out, "expected nonempty hard-negative set"
    # no returned neighbor shares the query's cluster, ranks are 1..k
    # dense per query, and similarities are non-increasing in rank
    by_q = {}
    for r in out:
        assert r.neighbor_cluster != r.query_cluster
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        sims = [r.similarity for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_bloom_random_keysets_never_false_negative(spark):
    """Randomized (seeded) member sets across bitmap geometries: a
    member NEVER fails the probe — the invariant exactness of the
    decontamination verify stage rests on."""
    import random

    from data_pipeline_stripe_spark.operators.bloom import (
        bloom_build, bloom_probe,
    )

    for seed, m_bits, k in ((3, 1 << 10, 2), (11, 1 << 14, 4),
                            (42, 64, 3)):
        rng = random.Random(seed)
        keys = [f"k{rng.randint(0, 10_000)}" for _ in range(150)]
        members = spark.createDataFrame([(x,) for x in keys], "key string")
        bitmap = bloom_build(members.distinct(), "key", m_bits, k)
        survived = {
            r.key
            for r in bloom_probe(members.distinct(), "key", bitmap,
                                 m_bits, k).collect()
        }
        assert survived == set(keys)


def test_pq_topk_shape_on_fixture(spark, sf_dir):
    """PQ-ADC top-5 on the driver fixture: every query present, 5 ranked
    neighbors each, no self-matches. (The fixture embeddings are
    near-random, so neighbor-set agreement with the exact baseline is
    noise-bound there — retrieval QUALITY is asserted on the structured
    corpus below; exact-rank parity is pinned by the driver oracle.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding")
    pq_rows = similarity.pq_topk(emb, queries, cents, k=5).collect()
    per_q = {}
    for r in pq_rows:
        assert r.query_id != r.neighbor_id
        per_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(per_q) == set(range(8))
    assert all(len(v) == 5 for v in per_q.values())


def test_pq_topk_retrieves_clusters(spark):
    """PQ retrieval quality where quality is definable: 80 vectors in 4
    well-separated clusters (each concentrated on its own 16-dim block —
    aligned with the subspace split, the PQ-friendly case). Every
    query's top-3 ADC neighbors must come from the query's own cluster,
    and every same-cluster distance must rank below every cross-cluster
    distance."""
    rows = []
    for vid in range(80):
        c = vid % 4
        vec = [
            (1.0 if i // 16 == c else 0.0) + ((i * 7 + vid) % 13 - 6) / 100.0
            for i in range(64)
        ]
        rows.append((vid, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 4)  # one per cluster
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding")
    got = similarity.pq_topk(emb, queries, cents, k=3).collect()
    assert len(got) == 12
    for r in got:
        assert r.neighbor_id % 4 == r.query_id % 4, (
            f"query {r.query_id} retrieved cross-cluster {r.neighbor_id}")


def test_pq_codes_shape_and_range(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding")
    codes = similarity.pq_codes(emb, cents).collect()
    assert len(codes) == emb.count()
    for r in codes:
        for j in range(4):
            assert 0 <= r[f"code_{j}"] < 16


def test_bpe_train_matches_sequential_reference(spark):
    """Full vocab build: N driver-looped distributed steps must equal an
    independent sequential BPE (greedy most-frequent pair, count desc /
    pair asc tiebreak, left-to-right non-overlapping merges) run on the
    same corpus — merge table AND final sequences."""
    from collections import Counter

    from data_pipeline_stripe_spark.llm.text import bpe_train

    docs = [(0, "a b a b c"), (1, "a b a b a b"), (2, "c c c c"), (3, "x")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got_corpus, got_merges = bpe_train(df, n_merges=3)
    got = {r["doc_id"]: r["text"] for r in got_corpus.collect()}

    seqs = {i: t.split() for i, t in docs}
    want_merges = []
    for _ in range(3):
        counts = Counter()
        for s in seqs.values():
            i = 0
            while i < len(s) - 1:
                counts[(s[i], s[i + 1])] += 1
                # count overlapping occurrences the same way the
                # distributed step does: every adjacent position
                i += 1
        if not counts:
            break
        best = min(counts.items(),
                   key=lambda kv: (-kv[1], kv[0]))[0]
        want_merges.append(f"{best[0]} {best[1]}")
        for k, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[k] = out
    assert got_merges == want_merges
    assert got == {i: " ".join(s) for i, s in seqs.items()}


def test_persisted_lsh_index_probe_matches_incremental(spark, sf_dir,
                                                       tmp_path):
    """The production claim in incremental_minhash_pairs' docstring,
    made real: build the corpus LSH index, WRITE it to parquet, read it
    back, probe with a new batch — the pair set must equal the
    declarative incremental computation over the full union, row for
    row (ids, estimates, cap semantics)."""
    from pyspark.sql import functions as F

    from data_pipeline_stripe_spark.llm import dedup
    from data_pipeline_stripe_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 400)
    new = docs.filter(F.col("doc_id") >= 400)

    sig, bands = dedup.build_lsh_index(old)
    sig.write.parquet(str(tmp_path / "sig"))
    bands.write.parquet(str(tmp_path / "bands"))
    got = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in dedup.probe_lsh_index(
            spark.read.parquet(str(tmp_path / "sig")),
            spark.read.parquet(str(tmp_path / "bands")),
            new).collect()
    }
    expect = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in dedup.incremental_minhash_pairs(
            docs, F.col("doc_id") >= 400).collect()
    }
    assert got == expect and len(expect) > 0


def test_probe_lsh_index_caller_materialized_new_index(spark, sf_dir):
    """The r13-opt single-signature-pass path: a caller that also
    persists the batch's index hands probe_lsh_index its
    checkpoint-materialized (sig, bands) via ``new_index`` — the pair
    set must be IDENTICAL to the internal-build path, and the
    checkpointed build must equal the lazy build row-for-row."""
    from pyspark.sql import functions as F

    from data_pipeline_stripe_spark.llm import dedup
    from data_pipeline_stripe_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 400)
    new = docs.filter(F.col("doc_id") >= 400)
    idx_sig, idx_bands = dedup.build_lsh_index(old)

    lazy_sig, lazy_bands = dedup.build_lsh_index(new)
    ck_sig, ck_bands = dedup.build_lsh_index(new, checkpoint=True)
    assert sorted(map(tuple, lazy_sig.collect())) == \
        sorted(map(tuple, ck_sig.collect()))
    assert sorted(map(tuple, lazy_bands.collect())) == \
        sorted(map(tuple, ck_bands.collect()))

    internal = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in dedup.probe_lsh_index(idx_sig, idx_bands, new).collect()
    }
    shared = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in dedup.probe_lsh_index(
            idx_sig, idx_bands, new,
            new_index=(ck_sig, ck_bands)).collect()
    }
    assert internal == shared and len(shared) > 0


def test_probe_lsh_index_rejects_overlapping_ids(spark, sf_dir):
    """Re-ingesting an id without vacuuming must fail LOUDLY — a silent
    duplicate signature row would emit conflicting pair estimates."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from data_pipeline_stripe_spark.llm import dedup
    from data_pipeline_stripe_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    sig, bands = dedup.build_lsh_index(docs)
    with _pytest.raises(ValueError, match="already in the index"):
        dedup.probe_lsh_index(sig, bands, docs.limit(5))


def test_ivf_topk_pruned_matches_unpruned_probe_set(spark, sf_dir):
    """The pruned variant changes only how queries FIND their probe
    centroids (keyed RP-band routing vs the full centroid cross). When
    routing surfaces the same probe buckets the unpruned query would
    pick, results must be identical; across the fixture the pruned
    result set must stay a high-overlap subset of the unpruned one
    (a routed query can miss a band-collision with its true best
    centroid — the documented coarse-quantizer trade)."""
    from data_pipeline_stripe_spark.llm import similarity
    from data_pipeline_stripe_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    pruned = {(r.query_id, r.neighbor_id, r.rank) for r in
              similarity.ivf_topk_pruned(emb, queries, cents,
                                         k=5, n_probes=2).collect()}
    full = {(r.query_id, r.neighbor_id, r.rank) for r in
            similarity.ivf_topk(emb, queries, cents,
                                k=5, n_probes=2).collect()}
    assert pruned, "pruned IVF returned nothing — routing is broken"
    overlap = len(pruned & full) / len(full)
    assert overlap >= 0.7, f"probe-routing overlap {overlap:.3f} < 0.7"


def test_bigram_lm_separates_shuffled_from_natural(spark):
    """The bigram LM's claimed signal: a document whose TOKENS are
    common but whose SEQUENCES are corpus-atypical (word-shuffled text)
    must score strictly higher mean NLL than the natural documents its
    vocabulary came from — the separation the unigram model cannot
    make (same tokens → near-identical unigram scores)."""
    from data_pipeline_stripe_spark.llm.text import (lm_bigram_score,
                                                     lm_unigram_score)

    natural = "the quick brown fox jumps over the lazy dog"
    rows = [(i, natural) for i in range(8)]
    rows.append((8, "dog the over quick lazy jumps fox brown the"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    bg = {r.doc_id: r.mean_nll for r in lm_bigram_score(df).collect()}
    assert bg[8] > bg[0], (bg[8], bg[0])

    uni = {r.doc_id: r.mean_nll for r in lm_unigram_score(df).collect()}
    # same token multiset -> identical unigram score; bigram sees it
    assert uni[8] == uni[0]


def test_mixture_resample_invariants(spark):
    """Exact-k, per-source quotas matching Hamilton apportionment,
    partitioning-invariance of the picks, and the fail-loud quota
    validation."""
    import pytest

    from data_pipeline_stripe_spark.llm.sampling import mixture_resample

    rows = [(i, f"s{i % 4}") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    weights = spark.createDataFrame(
        [("s0", 1), ("s1", 2), ("s2", 3), ("s3", 4)],
        "source string, weight long",
    )
    picked = mixture_resample(docs, weights, 50).collect()
    assert len(picked) == 50
    by_src = {}
    for r in picked:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    # Hamilton of 50 over weights 1:2:3:4 (W=10) is exact: 5/10/15/20
    assert by_src == {"s0": 5, "s1": 10, "s2": 15, "s3": 20}

    # same picks under a different physical partitioning
    again = mixture_resample(docs.repartition(13), weights, 50).collect()
    assert {(r.doc_id, r.pick_order) for r in again} == {
        (r.doc_id, r.pick_order) for r in picked
    }

    # a source missing from the recipe is excluded (the recipe IS the
    # allow-list), and its quota redistributes to the named sources
    partial = mixture_resample(
        docs, weights.filter("source <> 's3'"), 30
    ).collect()
    assert len(partial) == 30 and not [r for r in partial if r.source == "s3"]

    # quota > available fails loudly, naming the offender
    tiny = docs.filter("source <> 's0' OR doc_id < 8")  # s0 has only 2 rows
    with pytest.raises(ValueError, match="s0"):
        mixture_resample(tiny, weights, 190)

    # output-contract collision fails loudly
    with pytest.raises(ValueError, match="pick_order"):
        mixture_resample(docs.withColumn("pick_order", docs.doc_id),
                         weights, 10)

    # an all-zero recipe fails loudly instead of silently returning
    # 0 rows (the "exactly k" contract)
    zero = spark.createDataFrame(
        [("s0", 0), ("s1", 0)], "source string, weight long"
    )
    with pytest.raises(ValueError, match="total weight"):
        mixture_resample(docs, zero, 10)
