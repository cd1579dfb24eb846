"""Multimodal real-decode queries: encode→decode round-trips gated by an
arithmetic oracle.

The payloads are REAL media bytes — standard 24-bit BMP files and
RIFF/WAVE PCM16 files — built deterministically from ``doc_id`` inside an
Arrow-batched ``mapInPandas`` stage, then decoded by the real parsers in
``llm.multimodal`` (full pixel / full sample decode, no media libraries).
Because every encoding parameter is a pure function of ``doc_id``, DuckDB
can verify the decoded output with plain arithmetic — the oracle never
decodes anything, so a hash match proves the encoder and decoder agree
with an *independent* computation of the ground truth, not with each
other.

Reference parity: the reference pipelines treat attachments as opaque
blobs and never decode (SURVEY.md §2.10); this is the training-data
extension surface (multimodal columns) the rebuild adds on top.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..llm import multimodal
from ..sources import load_table
from .registry import query

_MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])


def synthesize_bmp_media(docs: DataFrame) -> DataFrame:
    """One real BMP per doc: width/height/solid-RGB are functions of
    doc_id (w = id%31+1, h = id%17+1, rgb = (id, 3id, 7id) mod 256), so
    the decoded stats are arithmetically predictable. Width varies over
    1..31 → every row-padding remainder (w*3 mod 4) is exercised."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = i % 31 + 1, i % 17 + 1
                rgb = np.full((h, w, 3), 0, dtype=np.uint8)
                rgb[:, :, 0] = i % 256
                rgb[:, :, 1] = (i * 3) % 256
                rgb[:, :, 2] = (i * 7) % 256
                ids.append(i)
                payloads.append(multimodal.encode_bmp(rgb))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(batches, _MEDIA_SCHEMA)


def synthesize_wav_media(docs: DataFrame) -> DataFrame:
    """One real WAV per doc: rate/channels/frames are functions of doc_id;
    samples are a ±amp square wave with amp = 100 + id%900, whose RMS is
    exactly amp — arithmetically checkable without decoding."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                rate = 8000 * (i % 3 + 1)
                channels = i % 2 + 1
                frames = 50 + i % 50
                amp = 100 + i % 900
                n = frames * channels
                samples = np.where(
                    np.arange(n) % 2 == 0, amp, -amp
                ).astype(np.int16)
                ids.append(i)
                payloads.append(
                    multimodal.encode_wav_pcm16(samples, rate, channels))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(batches, _MEDIA_SCHEMA)


@query(
    "multimodal_bmp_roundtrip",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(doc_id % 31 + 1 AS BIGINT) AS width,
           CAST(doc_id % 17 + 1 AS BIGINT) AS height,
           CAST(doc_id % 256 AS DOUBLE) AS mean_r,
           CAST((doc_id * 3) % 256 AS DOUBLE) AS mean_g,
           CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_b
    FROM documents
    """,
)
def multimodal_bmp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 real image decode: encode a standard 24-bit BMP per document,
    then full-pixel-decode it back (header parse + padded-row numpy
    slicing, llm/multimodal.py) and emit dimensions + per-channel means.
    The oracle computes the expected values from doc_id arithmetic alone —
    an independent ground truth the decode must reproduce. Solid-color
    means are exact integers, so the double compare is exact."""
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_bmp_media(docs)
    return multimodal.extract_image_pixel_stats(media)


@query(
    "multimodal_wav_roundtrip",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(8000 * (doc_id % 3 + 1) AS BIGINT) AS sample_rate,
           CAST(doc_id % 2 + 1 AS BIGINT) AS n_channels,
           CAST(50 + doc_id % 50 AS BIGINT) AS n_frames,
           CAST(100 + doc_id % 900 AS DOUBLE) AS rms
    FROM documents
    """,
)
def multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 real audio decode: encode a RIFF/WAVE PCM16 file per document,
    then decode it back via the RIFF chunk walk (llm/multimodal.py) and
    emit format fields + RMS over the actual samples. A ±amp square wave
    has RMS exactly amp (a double-exact integer), so the oracle is pure
    doc_id arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_wav_media(docs)
    return multimodal.extract_audio_features(media)


def synthesize_bmp_grid_media(docs: DataFrame) -> DataFrame:
    """One real BMP per doc with PER-PIXEL structure (unlike the solid
    fill of synthesize_bmp_media): channel c of pixel (y, x) is
    (doc_id + 3x + 5y + 11c) % 256, w = id%31+1, h = id%17+1 — so any
    pixel of any crop/resample is predictable by arithmetic alone."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = i % 31 + 1, i % 17 + 1
                y, x, c = np.ogrid[0:h, 0:w, 0:3]
                rgb = ((i + 3 * x + 5 * y + 11 * c) % 256).astype(np.uint8)
                ids.append(i)
                payloads.append(multimodal.encode_bmp(rgb))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(batches, _MEDIA_SCHEMA)


@query(
    "multimodal_image_resize",
    oracle="""
    WITH d AS (SELECT doc_id,
                      doc_id % 31 + 1 AS w,
                      doc_id % 17 + 1 AS h
               FROM documents),
    grid AS (SELECT doc_id, w, h, x, y,
                    (x * w) // 8 AS sx,
                    (y * h) // 8 AS sy
             FROM d, unnest(range(0, 8)) AS tx(x),
                     unnest(range(0, 8)) AS ty(y)),
    px AS (SELECT doc_id,
                  (doc_id + 3 * sx + 5 * sy) % 256 AS r,
                  (doc_id + 3 * sx + 5 * sy + 11) % 256 AS g,
                  (doc_id + 3 * sx + 5 * sy + 22) % 256 AS b
           FROM grid)
    SELECT doc_id,
           CAST(8 AS BIGINT) AS width,
           CAST(8 AS BIGINT) AS height,
           SUM(r) / 64.0 AS mean_r,
           SUM(g) / 64.0 AS mean_g,
           SUM(b) / 64.0 AS mean_b
    FROM px GROUP BY doc_id
    """,
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 real image resize: encode a gradient BMP per document (pixel
    values a formula of doc_id, x, y, channel), real-decode it,
    nearest-neighbor-resample to 8×8 (floor(dst·src/8) index mapping),
    re-encode to BMP, then real-decode AGAIN for per-channel means — the
    whole decode→resize→encode→decode chain is under test. The oracle
    replays the integer index mapping and pixel formula in SQL and never
    touches image bytes. Means are integer sums / 64 (power of two), so
    the doubles are exact on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_bmp_grid_media(docs)
    resized = multimodal.resize_bmp_images(media, width=8, height=8)
    return multimodal.extract_image_pixel_stats(resized)


def synthesize_wav_signal_media(docs: DataFrame) -> DataFrame:
    """One mono WAV per doc whose samples follow an integer formula of
    (doc_id, sample index): s_j = ((j * (doc_id + 3)) % 251) - 125,
    frames = 80 + doc_id % 40. Every decoded sample is predictable by
    arithmetic alone, so windowed features can be verified without the
    oracle ever touching audio bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                frames = 80 + i % 40
                j = np.arange(frames, dtype=np.int64)
                samples = ((j * (i + 3)) % 251 - 125).astype(np.int16)
                ids.append(i)
                payloads.append(
                    multimodal.encode_wav_pcm16(samples, 16000, 1))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(batches, _MEDIA_SCHEMA)


@query(
    "multimodal_audio_windows",
    oracle="""
    WITH d AS (SELECT doc_id, 80 + doc_id % 40 AS frames FROM documents),
    s AS (SELECT doc_id, j,
                 ((j * (doc_id + 3)) % 251) - 125 AS s,
                 (((j + 1) * (doc_id + 3)) % 251) - 125 AS s_next,
                 j // 32 AS window_idx,
                 frames
          FROM d, unnest(range(0, frames)) AS t(j))
    SELECT doc_id,
           window_idx,
           CAST(SUM(s * s) AS BIGINT) AS sum_sq,
           FLOOR(SQRT(SUM(s * s) / 32.0) * 1e6) / 1e6 AS rms,
           CAST(SUM(CASE WHEN j % 32 < 31 AND s * s_next < 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross
    FROM s
    WHERE window_idx < frames // 32
    GROUP BY doc_id, window_idx
    """,
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 real audio signal processing: encode a mono PCM16 WAV whose
    samples are an integer formula of (doc_id, j), real-decode it
    (RIFF chunk walk → sample array), then emit per-32-frame-window
    energy (integer sum of squares), RMS, and strict zero-crossing
    counts — the VAD/energy-gating primitive of a speech data pipeline.
    The oracle regenerates the same samples arithmetically and windows
    them in SQL: a hash match proves encoder, decoder, and the
    vectorized window math agree with an independent ground truth.
    sum_sq/n_zero_cross are exact integers; rms is floor-truncated at
    1e-6 on both sides (identical IEEE sqrt input ⇒ identical double)."""
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_wav_signal_media(docs)
    return multimodal.extract_audio_windows(media, window=32)


def synthesize_gif_media(docs: DataFrame) -> DataFrame:
    """One real animated GIF per doc: 8×6 frames, n_frames = 4 + id%5,
    a 4-color global palette with color c = ((37c+11), (59c+23),
    (83c+47)) mod 256, and pixel (x, y) of frame f holding palette index
    (doc_id + f + x + 2y) % 4 — every pixel of every frame predictable
    by arithmetic alone, so frame extraction can be verified without the
    oracle ever touching GIF bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = np.arange(4)
        palette = np.stack([(37 * c + 11) % 256, (59 * c + 23) % 256,
                            (83 * c + 47) % 256], axis=1).astype(np.uint8)
        y, x = np.ogrid[0:6, 0:8]
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                frames = [((i + f + x + 2 * y) % 4).astype(np.uint8)
                          for f in range(4 + i % 5)]
                ids.append(i)
                payloads.append(multimodal.encode_gif(frames, palette))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(batches, _MEDIA_SCHEMA)


_FRAME_STATS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("r_sum", T.LongType()),
    T.StructField("g_sum", T.LongType()),
    T.StructField("b_sum", T.LongType()),
])


@query(
    "multimodal_video_frame_sample",
    oracle="""
    WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS n_frames FROM documents),
    f AS (SELECT doc_id, fi
          FROM d, unnest(range(0, n_frames)) AS t(fi)
          WHERE fi % 2 = 0),
    px AS (SELECT doc_id, fi, (doc_id + fi + x + 2 * y) % 4 AS c
           FROM f, unnest(range(0, 8)) AS tx(x),
                   unnest(range(0, 6)) AS ty(y))
    SELECT doc_id,
           CAST(fi AS BIGINT) AS frame_idx,
           CAST(8 AS BIGINT) AS width,
           CAST(6 AS BIGINT) AS height,
           CAST(SUM((37 * c + 11) % 256) AS BIGINT) AS r_sum,
           CAST(SUM((59 * c + 23) % 256) AS BIGINT) AS g_sum,
           CAST(SUM((83 * c + 47) % 256) AS BIGINT) AS b_sum
    FROM px GROUP BY doc_id, fi
    """,
)
def multimodal_video_frame_sample(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """X5 real video-class decode: encode an animated GIF per document
    (LZW-compressed palette frames, llm/multimodal.py), block-walk and
    LZW-decode it back, sample every 2nd frame, re-encode each sampled
    frame as a standalone BMP (sample_video_frames), then BMP-decode the
    frames AGAIN for per-channel integer sums — the whole
    GIF-encode → LZW-decode → frame-sample → BMP-encode → BMP-decode
    chain is under test against an oracle that replays the pixel formula
    arithmetically and never touches media bytes. All outputs are exact
    integers."""

    def frame_stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "frame_idx", "width", "height",
                                   "r_sum", "g_sum", "b_sum")}
            for doc_id, fi, fb in zip(pdf["doc_id"], pdf["frame_idx"],
                                      pdf["frame_bytes"]):
                rgb = multimodal.decode_bmp_pixels(bytes(fb)).astype(np.int64)
                out["doc_id"].append(int(doc_id))
                out["frame_idx"].append(int(fi))
                out["height"].append(rgb.shape[0])
                out["width"].append(rgb.shape[1])
                out["r_sum"].append(int(rgb[:, :, 0].sum()))
                out["g_sum"].append(int(rgb[:, :, 1].sum()))
                out["b_sum"].append(int(rgb[:, :, 2].sum()))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_gif_media(docs)
    frames = multimodal.sample_video_frames(media, every_n=2)
    return frames.mapInPandas(frame_stats, _FRAME_STATS_SCHEMA)


def synthesize_bmp_cluster_media(docs: DataFrame) -> DataFrame:
    """One real 16×16 BMP per doc whose CONTENT depends only on
    k = doc_id % 16 — 16 distinct images, each repeated across the
    corpus, so perceptual-hash dedup has genuine duplicate clusters to
    find. Pixel (y, x, c) = (7k + (3+k%5)x + (5+k%3)y + 11c) % 256 —
    the SLOPES vary with k (a constant offset alone would be erased by
    the hash's mean-threshold, collapsing every cluster to one
    fingerprint), predictable by arithmetic alone."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                k = i % 16
                y, x, c = np.ogrid[0:16, 0:16, 0:3]
                rgb = ((7 * k + (3 + k % 5) * x + (5 + k % 3) * y
                        + 11 * c) % 256).astype(np.uint8)
                ids.append(i)
                payloads.append(multimodal.encode_bmp(rgb))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(batches, _MEDIA_SCHEMA)


@query(
    "multimodal_image_ahash_dedup",
    oracle="""
    WITH ks AS (SELECT DISTINCT doc_id % 16 AS k FROM documents),
    grid AS (SELECT k, x, y, y * 8 + x AS idx,
                    (x * 16) // 8 AS sx,
                    (y * 16) // 8 AS sy
             FROM ks, unnest(range(0, 8)) AS tx(x),
                      unnest(range(0, 8)) AS ty(y)),
    px AS (SELECT k, idx,
                  (((7 * k + (3 + k % 5) * sx + (5 + k % 3) * sy) % 256) * 299
                   + ((7 * k + (3 + k % 5) * sx + (5 + k % 3) * sy + 11) % 256) * 587
                   + ((7 * k + (3 + k % 5) * sx + (5 + k % 3) * sy + 22) % 256) * 114)
                  // 1000 AS gray
           FROM grid),
    m AS (SELECT k, SUM(gray) // 64 AS mean_gray FROM px GROUP BY k),
    bits AS (SELECT px.k, idx,
                    CASE WHEN gray > mean_gray THEN 1 ELSE 0 END AS b
             FROM px JOIN m ON px.k = m.k),
    hashes AS (SELECT k,
                      SUM(CASE WHEN idx >= 32
                               THEN CAST(b AS BIGINT) << (idx - 32)
                               ELSE 0 END) AS ahash_hi,
                      SUM(CASE WHEN idx < 32
                               THEN CAST(b AS BIGINT) << idx
                               ELSE 0 END) AS ahash_lo
               FROM bits GROUP BY k)
    SELECT CAST(ahash_hi AS BIGINT) AS ahash_hi,
           CAST(ahash_lo AS BIGINT) AS ahash_lo,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM (SELECT doc_id, doc_id % 16 AS k FROM documents) d
    JOIN hashes ON d.k = hashes.k
    GROUP BY 1, 2
    """,
)
def multimodal_image_ahash_dedup(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Image near-duplicate detection by perceptual average-hash — the
    image-side twin of doc_exact_dedup: encode a real BMP per document
    (content a function of doc_id % 16, so the corpus genuinely contains
    16 duplicate clusters), REAL-decode and fingerprint each image
    (llm/multimodal.py:image_ahash — luma → 8×8 NN → threshold bits),
    then dedup is one groupBy on the 64-bit hash. The oracle replays
    luma/resample/threshold/bit-packing arithmetically in SQL and never
    touches image bytes, so a hash match proves the whole
    decode→fingerprint→group chain against an independent ground truth.
    100 TB shape: per-image work streams through Arrow batches; the
    dedup shuffle carries (two longs per image), never pixels."""
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_bmp_cluster_media(docs)
    hashes = multimodal.image_ahash(media)
    from pyspark.sql import functions as F

    return hashes.groupBy("ahash_hi", "ahash_lo").agg(
        F.count("*").alias("n_images"),
        F.min("doc_id").alias("min_doc_id"),
    )


def synthesize_png_media(docs: DataFrame) -> DataFrame:
    """One real PNG per doc with PER-PIXEL structure: channel c of pixel
    (y, x) is (doc_id + 3x + 5y + 11c) % 256, w = id%29+2, h = id%13+2.
    h ≥ 2 and the encoder's y%5 filter cycle mean most images contain a
    Sub/Up row, and any image with h ≥ 5 exercises Average and Paeth too
    — decode can't pass by handling filter 0 alone."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = i % 29 + 2, i % 13 + 2
                y, x, c = np.ogrid[0:h, 0:w, 0:3]
                rgb = ((i + 3 * x + 5 * y + 11 * c) % 256).astype(np.uint8)
                ids.append(i)
                payloads.append(multimodal.encode_png(rgb))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(batches, _MEDIA_SCHEMA)


@query(
    "multimodal_png_roundtrip",
    oracle="""
    WITH d AS (SELECT doc_id,
                      doc_id % 29 + 2 AS w,
                      doc_id % 13 + 2 AS h
               FROM documents),
    px AS (SELECT doc_id, w, h,
                  (doc_id + 3 * x + 5 * y) % 256 AS r,
                  (doc_id + 3 * x + 5 * y + 11) % 256 AS g,
                  (doc_id + 3 * x + 5 * y + 22) % 256 AS b
           FROM d, unnest(range(0, d.w)) AS tx(x),
                   unnest(range(0, d.h)) AS ty(y))
    SELECT doc_id,
           CAST(MAX(w) AS BIGINT) AS width,
           CAST(MAX(h) AS BIGINT) AS height,
           SUM(r) / (MAX(w) * MAX(h) * 1.0) AS mean_r,
           SUM(g) / (MAX(w) * MAX(h) * 1.0) AS mean_g,
           SUM(b) / (MAX(w) * MAX(h) * 1.0) AS mean_b
    FROM px GROUP BY doc_id
    """,
)
def multimodal_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 real compressed-image decode: encode a spec-conformant PNG per
    document (zlib IDAT, CRC-checked chunks, scanline filters cycling
    through all five types), then full-pixel-decode it back
    (llm/multimodal.py — chunk walk, inflate, unfilter) and emit
    dimensions + per-channel means. The oracle recomputes the means from
    doc_id arithmetic via a lateral pixel grid — it never touches PNG —
    so a hash match proves deflate→inflate→unfilter reproduces every
    pixel. Per-pixel sums are exact integers; the final division is the
    same double op on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_png_media(docs)
    return multimodal.extract_image_pixel_stats(media)
