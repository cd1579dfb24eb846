"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — binary payload columns, typed
metadata structs, Arrow-batched ``mapInPandas`` feature extraction with a
stable output schema and partition-preserving batch flow. The actual media
*decode* is stubbed: the container has no image/audio libraries, so
``decode_image_batch`` raises ``NotImplementedError`` unless the
deterministic fake decoder is selected (used by tests and the oracle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata for an opaque media payload.
MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),           # opaque encoded bytes
    T.StructField("n_bytes", T.LongType()),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("n_pixels", T.LongType()),
])


def attach_binary_payload(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (here: UTF-8 of the text —
    stands in for encoded media bytes) with typed metadata. At scale the
    payload column rides through shuffles untouched; only metadata is
    filtered/joined on."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.lit("image").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(text_col).cast("long").alias("n_bytes"),
    )


def decode_image_fake(payload: bytes) -> tuple[int, int]:
    """Deterministic FAKE decoder (byte-length-derived dimensions) so the
    Spark plumbing — batch shape, schema, partitioning — is fully
    exercisable without media libraries."""
    n = len(payload)
    return (n % 1024 + 1, (n * 7) % 768 + 1)


def decode_image_real(payload: bytes) -> tuple[int, int]:  # pragma: no cover
    """Real decode — STUB. Would use PIL/opencv (not in this container)."""
    raise NotImplementedError(
        "media decode requires an image library not present in this "
        "environment; use decoder='fake' for plumbing tests"
    )


FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("frame_bytes", T.BinaryType()),
])


def sample_video_frames(media: DataFrame, every_n: int = 10,
                        decoder: str = "fake") -> DataFrame:
    """Frame sampling for video payloads — one output row per sampled
    frame (1→N flatMap shape via mapInPandas). The fake decoder treats
    every ``every_n`` bytes of the payload as one 'frame'; a real decoder
    (ffmpeg/opencv — not in this image) would replace only the inner
    function, the batch flow is identical."""
    if decoder != "fake":  # pragma: no cover
        raise NotImplementedError(
            "video decode requires ffmpeg/opencv, not present in this "
            "environment; use decoder='fake' for plumbing tests")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for i, off in enumerate(range(0, len(raw), every_n)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(raw[off:off + every_n])
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int,
                  decoder: str = "fake") -> DataFrame:
    """Image resize — payload-in/payload-out transform. Fake decoder
    truncates/pads bytes to width*height (deterministic); a real one
    would decode, resample, re-encode. Schema and flow are the real
    contract."""
    if decoder != "fake":  # pragma: no cover
        raise NotImplementedError(
            "image resize requires PIL/opencv, not present in this "
            "environment; use decoder='fake' for plumbing tests")
    n = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["payload"].map(
                lambda p: bytes(p)[:n].ljust(n, b"\0"))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "media_type": pdf["media_type"],
                "payload": resized,
                "n_bytes": n,
            })

    return media.mapInPandas(batches, MEDIA_SCHEMA)


def extract_image_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the pattern for any per-media-file Python work
    (resize, frame-sample, spectrogram). Batches stream through workers;
    nothing is collected to the driver."""
    decode = decode_image_fake if decoder == "fake" else decode_image_real

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["payload"].map(lambda p: decode(bytes(p)))
            w = dims.map(lambda d: d[0]).astype("int64")
            h = dims.map(lambda d: d[1]).astype("int64")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["n_bytes"].astype("int64"),
                "width": w,
                "height": h,
                "n_pixels": (w * h).astype("int64"),
            })

    return media.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)
