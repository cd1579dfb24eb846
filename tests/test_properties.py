"""Property-based spot checks (SURVEY.md §5.4) — hypothesis generates
small corpora/frames; each property runs a handful of Spark jobs, so
example counts are kept low and deadlines disabled."""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_pipeline_stripe_spark.llm import dedup
from data_pipeline_stripe_spark.operators import range_join

WORD = st.sampled_from(
    ["spark", "table", "join", "scan", "row", "batch", "merge", "sort",
     "key", "hash", "window", "agg"]
)
DOC = st.lists(WORD, min_size=3, max_size=12).map(" ".join)

_SETTINGS = settings(max_examples=5, deadline=None,
                     suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(docs=st.lists(DOC, min_size=1, max_size=12))
@_SETTINGS
def test_exact_dedup_partitions_the_corpus(spark, docs):
    """Σ n_copies == corpus size and canonical ids are distinct corpus
    members — for ANY corpus."""
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    groups = dedup.exact_dedup_groups(df).collect()
    assert sum(g.n_copies for g in groups) == len(docs)
    canon_ids = [g.canonical_doc_id for g in groups]
    assert len(set(canon_ids)) == len(canon_ids)
    assert set(canon_ids) <= set(range(len(docs)))


@given(docs=st.lists(DOC, min_size=2, max_size=10))
@_SETTINGS
def test_jaccard_pairs_are_symmetric_bounded(spark, docs):
    """Every reported Jaccard is in (0, 1] and doc_a < doc_b — for ANY
    corpus (threshold 0 returns all intersecting pairs)."""
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    pairs = dedup.ngram_jaccard_pairs(df, threshold=0.0001).collect()
    for p in pairs:
        assert 0 < p.jaccard <= 1.0
        assert p.doc_a < p.doc_b


@given(
    times=st.lists(st.integers(min_value=0, max_value=5000), min_size=1,
                   max_size=30),
    window=st.sampled_from([30, 60, 300]),
)
@_SETTINGS
def test_bucketized_range_join_equals_naive(spark, times, window):
    """The bucketized range join returns EXACTLY the naive O(n²) pair set
    — for ANY point set and window."""
    rows = [(i, t) for i, t in enumerate(times)]
    a = spark.createDataFrame(rows, "id_a long, s_a long").select(
        "id_a", F.timestamp_seconds("s_a").alias("ts_a"))
    b = spark.createDataFrame(rows, "id_b long, s_b long").select(
        "id_b", F.timestamp_seconds("s_b").alias("ts_b"))
    got = {(r.id_a, r.id_b) for r in
           range_join(a, b, "ts_a", "ts_b", window).collect()}
    expected = {
        (i, j)
        for i, ti in enumerate(times)
        for j, tj in enumerate(times)
        if abs(ti - tj) <= window
    }
    assert got == expected


@given(
    docs=st.lists(st.lists(WORD, min_size=1, max_size=60).map(" ".join),
                  min_size=1, max_size=6),
    chunk=st.sampled_from([4, 8, 16]),
    overlap=st.sampled_from([0, 1, 3]),
)
@_SETTINGS
def test_chunking_reconstructs_token_stream(spark, docs, chunk, overlap):
    """Dropping each chunk's first `overlap` tokens (except chunk 0) and
    concatenating must rebuild the original token stream exactly — for
    ANY document, chunk size and overlap. Also: every chunk except the
    last is full-size... (the last may be shorter, never empty)."""
    from data_pipeline_stripe_spark.llm import text as llm_text

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    rows = llm_text.chunk_documents(df, chunk_tokens=chunk,
                                    overlap=overlap).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, doc_text in enumerate(docs):
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        rebuilt = chunks[0].chunk_text.split()
        for c in chunks[1:]:
            rebuilt += c.chunk_text.split()[overlap:]
        assert rebuilt == doc_text.split()
        assert all(c.n_tokens >= 1 for c in chunks)


@given(
    prefix=st.lists(WORD, min_size=0, max_size=10),
    passage=st.lists(WORD, min_size=8, max_size=14),
    suffix=st.lists(WORD, min_size=0, max_size=10),
)
@_SETTINGS
def test_winnowing_guarantee_any_shared_8_token_run(spark, prefix, passage,
                                                    suffix):
    """For ANY two documents sharing a contiguous run of >= k + w - 1 = 8
    tokens, winnowing selects at least one common fingerprint, so the
    pair surfaces at min_shared=1 — the MOSS selection guarantee."""
    a = " ".join(prefix + passage)
    b = " ".join(passage + suffix)
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    pairs = dedup.shared_passage_pairs(
        df, min_shared=1, max_fp_doc_freq=None
    ).collect()
    assert any(p.doc_a == 1 and p.doc_b == 2 for p in pairs)


@given(x=st.integers(0, 65535), y=st.integers(0, 65535))
@settings(max_examples=200, deadline=None)
def test_zorder_interleave_is_invertible(x, y):
    """The Morton key is a bijection on 16-bit pairs: deinterleaving the
    even/odd bits recovers (x, y) exactly — no two (custkey, day) cells
    share a z-value, which is what makes z-range file skipping sound.
    Pure-Python twin of the generated SQL in queries/relational5.py."""
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    rx = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (rx, ry) == (x, y)
    assert 0 <= z < 2 ** 32


@given(w=st.integers(1, 20), h=st.integers(1, 20),
       seed=st.integers(0, 2 ** 31))
@settings(max_examples=25, deadline=None)
def test_png_codec_roundtrip_any_shape(w, h, seed):
    """encode_png → decode_png_pixels is the identity for ANY uint8 RGB
    array — every width (all cumsum lane layouts), every height (all
    five filter types via the y%5 cycle)."""
    import numpy as np

    from data_pipeline_stripe_spark.llm import multimodal as mm

    img = np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)
    assert (mm.decode_png_pixels(mm.encode_png(img)) == img).all()


@given(x_lo=st.integers(0, 65535), x_w=st.integers(0, 2000),
       y_lo=st.integers(0, 65535), y_w=st.integers(0, 2000),
       budget=st.sampled_from([8, 32, 64, 100000]))
@settings(max_examples=40, deadline=None)
def test_z_cover_is_sound_and_exact_at_full_budget(x_lo, x_w, y_lo, y_w,
                                                   budget):
    """z_cover soundness: every point of the rectangle has its z-value
    inside some interval, at ANY budget. Exactness at unbounded budget:
    every z in the cover decodes back INTO the rectangle (no
    overshoot). Checked on the rectangle's corners/edges plus a sample
    grid, and interval bounds decode-checked directly."""
    from data_pipeline_stripe_spark.operators.zorder import (
        z_cover, z_interleave)

    x_hi, y_hi = min(x_lo + x_w, 65535), min(y_lo + y_w, 65535)
    ranges = z_cover(x_lo, x_hi, y_lo, y_hi, max_ranges=budget)
    assert all(a[1] < b[0] for a, b in zip(ranges, ranges[1:]))

    def covered(z):
        return any(lo <= z <= hi for lo, hi in ranges)

    xs = {x_lo, x_hi, (x_lo + x_hi) // 2}
    ys = {y_lo, y_hi, (y_lo + y_hi) // 2}
    for x in xs:
        for y in ys:
            assert covered(z_interleave(x, y)), (x, y)
    if budget == 100000:
        # exact cover: interval endpoints decode into the rectangle
        def decode(z):
            x = sum(((z >> (2 * i)) & 1) << i for i in range(16))
            y = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
            return x, y

        for lo, hi in ranges:
            for z in (lo, hi):
                x, y = decode(z)
                assert x_lo <= x <= x_hi and y_lo <= y <= y_hi, (z, x, y)


@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=30),   # key domain
                  st.integers(min_value=1, max_value=50)),  # weight
        min_size=1, max_size=60),
)
@_SETTINGS
def test_cms_never_undercounts_and_verify_is_exact(spark, rows):
    """Count-min property: for ANY multiset, the sketch estimate of
    every key is >= its exact count (collisions only ADD), and the
    exact-verified heavy-hitter set equals the brute-force answer."""
    from data_pipeline_stripe_spark.operators.sketches import (
        cms_heavy_hitters)

    data = [(k,) for k, w in rows for _ in range(min(w, 5))]
    df = spark.createDataFrame(data, "k long")
    total = len(data)
    exact = {}
    for (k,) in data:
        exact[k] = exact.get(k, 0) + 1
    ppm = 100_000  # 10% support
    got = {r.k: (r.est_count, r.n_exact)
           for r in cms_heavy_hitters(df, "k", support_ppm=ppm).collect()}
    want = {k: n for k, n in exact.items() if n * 1_000_000 >= total * ppm}
    assert set(got) == set(want)
    for k, (est, n) in got.items():
        assert n == exact[k]
        assert est >= n  # CMS never undercounts


@given(
    weights=st.lists(st.integers(min_value=0, max_value=1000),
                     min_size=1, max_size=50),
)
@_SETTINGS
def test_pps_sample_bounds_and_heavy_inclusion(spark, weights):
    """Systematic PPS properties for ANY weight multiset: at most k rows
    are selected per stratum, every row with weight >= tot/k is ALWAYS
    selected, zero-weight rows never are, and the selection is a pure
    function of the data (re-running returns the same rows)."""
    from data_pipeline_stripe_spark.queries.maintenance import _PPS_K

    rows = [("s", i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, wt long")
    # run the same selection the gated query uses, inline
    from pyspark.sql.window import Window as W

    shuf = df.withColumn("shuf", F.md5(F.col("event_id").cast("string")))
    cum_w = (W.partitionBy("event_type").orderBy("shuf", "event_id")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    tot_w = W.partitionBy("event_type")
    c = shuf.select(
        "event_type", "event_id", "wt",
        F.sum("wt").over(cum_w).alias("cum"),
        F.sum("wt").over(tot_w).alias("tot"),
    )
    sel = (F.col("tot") > 0) & (
        F.expr(f"(cum * {_PPS_K}) div tot")
        > F.expr(f"((cum - wt) * {_PPS_K}) div tot"))
    picked = c.filter(sel).collect()
    tot = sum(weights)
    assert len(picked) <= _PPS_K
    ids = {r.event_id for r in picked}
    for i, w in enumerate(weights):
        if tot > 0 and w * _PPS_K >= tot:
            assert i in ids, f"heavy row {i} (w={w}, tot={tot}) missed"
        if w == 0:
            assert i not in ids
    again = {r.event_id for r in c.filter(sel).collect()}
    assert again == ids


@given(
    old_rows=st.lists(st.tuples(st.integers(0, 20), st.integers(0, 3)),
                      min_size=0, max_size=15, unique_by=lambda t: t[0]),
    new_rows=st.lists(st.tuples(st.integers(0, 20), st.integers(0, 3)),
                      min_size=0, max_size=15, unique_by=lambda t: t[0]),
)
@_SETTINGS
def test_snapshot_diff_applies_back_to_new(spark, old_rows, new_rows):
    """snapshot_diff ∘ apply_cdc == identity for ANY pair of snapshots
    (unique keys per side), and the diff mentions only changed keys."""
    from data_pipeline_stripe_spark.operators.merge import (apply_cdc,
                                                            snapshot_diff)

    old = spark.createDataFrame(old_rows or [(99999, 0)], "k long, v long")
    new = spark.createDataFrame(new_rows or [(99998, 0)], "k long, v long")
    diff = snapshot_diff(old, new, "k")
    rows = diff.collect()
    o, n = dict(old_rows or [(99999, 0)]), dict(new_rows or [(99998, 0)])
    unchanged = {k for k in o.keys() & n.keys() if o[k] == n[k]}
    assert all(r.k not in unchanged for r in rows)
    changes = diff.withColumn("seq", F.lit(1)).withColumn(
        "op", F.when(F.col("op") == "D", "D").otherwise("U"))
    replayed = {(r.k, r.v) for r in
                apply_cdc(old, changes, "k").drop("cdc_action").collect()}
    assert replayed == set(n.items())


@given(
    sizes=st.lists(st.integers(1, 12), min_size=1, max_size=5),
    weights=st.lists(st.integers(0, 4), min_size=5, max_size=5),
    seed=st.integers(0, 3),
)
@_SETTINGS
def test_mixture_resample_properties(spark, sizes, weights, seed):
    """For ANY corpus shape and recipe: exactly-k selection whenever the
    quotas fit, per-source counts equal the Hamilton apportionment of k
    over the weights, and the picked ids are invariant under
    repartitioning. Infeasible quotas and all-zero recipes fail loudly."""
    import pytest

    from data_pipeline_stripe_spark.llm.sampling import mixture_resample

    rows = [(s * 1000 + i + seed, f"s{s}")
            for s, n in enumerate(sizes) for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    w = [(f"s{i}", weights[i]) for i in range(len(sizes))]
    wdf = spark.createDataFrame(w, "source string, weight long")

    total_w = sum(weights[: len(sizes)])
    if total_w == 0:
        with pytest.raises(ValueError, match="total weight"):
            mixture_resample(docs, wdf, 1)
        return

    # Hamilton quotas of k over the active weights
    k = min(sum(sizes), 3)
    act = [(i, weights[i]) for i in range(len(sizes))]
    floors = {i: (wi * k) // total_w for i, wi in act}
    rems = sorted(act, key=lambda t: (-((t[1] * k) % total_w), f"s{t[0]}"))
    leftover = k - sum(floors.values())
    quota = dict(floors)
    for i, _ in rems[:leftover]:
        quota[i] += 1

    if any(quota[i] > sizes[i] for i, _ in act):
        with pytest.raises(ValueError, match="quota exceeds"):
            mixture_resample(docs, wdf, k)
        return

    picked = mixture_resample(docs, wdf, k).collect()
    assert len(picked) == k
    by_src = {}
    for r in picked:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    assert by_src == {f"s{i}": q for i, q in quota.items() if q > 0}

    again = mixture_resample(docs.repartition(7), wdf, k).collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in picked}


SNAP_OP = st.sampled_from(
    ["append", "merge", "merge_delete", "cdc", "compact", "restore"])


@given(ops=st.lists(SNAP_OP, min_size=1, max_size=5),
       seed=st.integers(min_value=0, max_value=7))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_snapshot_verb_sequences_replay_and_history(spark, tmp_path_factory,
                                                    ops, seed):
    """For ANY sequence of snapshot verbs (append / scoped merge /
    merge-with-delete-unmatched / CDC upsert+delete / compaction /
    restore), three invariants hold: (1) the head state equals an
    independently-maintained Python model of the same operations;
    (2) replaying the change data feed from version 0 over the
    version-0 state reproduces the head exactly — every verb's
    recorded change log is faithful; (3) the manifest history is a
    contiguous parent chain whose footer-summed row count at head
    matches the model."""
    from pyspark.sql import functions as F

    from data_pipeline_stripe_spark.operators import snapshots as S
    from data_pipeline_stripe_spark.operators.merge import apply_cdc

    t = str(tmp_path_factory.mktemp("snap_prop") / "table")

    def df_of(d):
        if not d:
            return spark.createDataFrame([], "k long, v long")
        return spark.createDataFrame(sorted(d.items()), "k long, v long")

    model = {k: k * 7 + seed for k in range(10)}
    S.snapshot_commit(spark, t, df_of(model).coalesce(2), mode="append")
    model_at = [dict(model)]
    next_key = 100

    for op in ops:
        keys = sorted(model)
        if op == "append" or (not keys and op != "compact"):
            fresh = {next_key + j: (next_key + j) * 7 + seed
                     for j in range(4)}
            next_key += 10
            S.snapshot_commit(spark, t, df_of(fresh).coalesce(1),
                              mode="append")
            model.update(fresh)
        elif op == "merge":
            band = keys[len(keys) // 3: 2 * len(keys) // 3 + 1]
            upd = {k: model[k] + 1000 for k in band}
            upd[next_key] = next_key * 7 + seed  # one insert
            next_key += 10
            S.snapshot_merge(spark, t, df_of(upd), "k")
            model.update(upd)
        elif op == "merge_delete":
            band = keys[len(keys) // 3: 2 * len(keys) // 3 + 1]
            lo, hi = band[0], band[-1]
            src = {k: model[k] + 5 for k in band if k % 2 == 0}
            S.snapshot_merge(spark, t, df_of(src), "k",
                             not_matched_by_source="delete",
                             source_scope=(lo, hi))
            for k in [k for k in model if lo <= k <= hi]:
                if k % 2 == 0:
                    model[k] = src[k]
                else:
                    del model[k]
        elif op == "cdc":
            rows = []
            for k in keys:
                if k % 3 == seed % 3:
                    rows.append((k, 0, 1, "D"))
                elif k % 5 == 0:
                    rows.append((k, model[k] * 2, 1, "U"))
            ch = spark.createDataFrame(
                rows, "k long, v long, seq int, op string")
            S.snapshot_apply_cdc(spark, t, ch, "k")
            if rows:
                for k, v, _s, o in rows:
                    if o == "D":
                        model.pop(k, None)
                    else:
                        model[k] = v
        elif op == "compact":
            S.snapshot_compact(spark, t, target_files=1)
        else:  # restore
            cur = S.snapshot_current_version(t)
            target = cur // 2
            S.snapshot_restore(spark, t, target, key="k")
            model = dict(model_at[target])
        cur = S.snapshot_current_version(t)
        while len(model_at) <= cur:
            model_at.append(dict(model))

    # (1) head equals the model
    got = {r.k: r.v for r in S.snapshot_read(spark, t).collect()}
    assert got == model
    # (2) CDF replay from v0 reproduces the head
    head_v = S.snapshot_current_version(t)
    if head_v > 0:
        feed = S.snapshot_read_cdf(spark, t, from_version=0,
                                   to_version=head_v)
        replayed = apply_cdc(
            df_of(model_at[0]),
            feed.select(
                "k", "v", F.col("_commit_version").alias("seq"),
                F.when(F.col("_change_type") == "D", F.lit("D"))
                .otherwise(F.lit("U")).alias("op")),
            "k")
        got2 = {r.k: r.v for r in replayed.drop("cdc_action").collect()}
        assert got2 == model
    # (3) contiguous history; head row count matches
    hist = sorted(S.snapshot_history(spark, t).collect(),
                  key=lambda r: r.version)
    assert [r.version for r in hist] == list(range(head_v + 1))
    assert all(h.parent == p.version for p, h in zip(hist, hist[1:]))
    assert hist[-1].n_rows == len(model)
