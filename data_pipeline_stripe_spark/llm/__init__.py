"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal columns. These extend the reference's surface per the north star
(BASELINE.json) and are designed distributed-first: inverted-index joins,
banded LSH, broadcast centroid assignment — no driver-side loops."""

from . import dedup, similarity, text, multimodal  # noqa: F401
