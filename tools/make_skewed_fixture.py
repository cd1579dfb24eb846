"""Generate the SKEWED test fixture under .scratch/skewed/ (gitignored).

The driver fixtures are uniform, so the hot-key machinery (LSH bucket
cap, shingle document-frequency cap, salted join) never actually fires
against them. This generator builds the adversarial layout a real web
corpus has:

- ``documents.parquet`` — 12,500 docs of which 5,000 are a
  BOILERPLATE CLUSTER: one 41-token template with a single token mutated
  per doc. The cluster shares nearly every shingle, so (a) each of its
  LSH band buckets holds ~5,000 docs (≫ the 64 cap ⇒ ~12.5M candidate
  pairs per band uncapped) and (b) its ~38 shared shingles each have
  document frequency ~5,000 (≫ the 128 cap ⇒ ~12.5M inverted-index pairs
  per shingle uncapped).
- ``events.parquet`` — 20,000,000 events with 70% of rows on ONE hot
  user_id (the viral-key shape), plus ``users.parquet`` (100k rows) as
  the join dim.

Deterministic (fixed seed), pure pyarrow — no Spark needed to generate.
Run: ``python tools/make_skewed_fixture.py [out_dir]``.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260814
N_DOCS = 12_500
N_BOILERPLATE = 5_000
N_EVENTS = 20_000_000
N_USERS = 100_000
HOT_USER = 7
HOT_FRACTION = 0.7

VOCAB = (
    "the fast key order sort table scan merge part window small hash join "
    "group query row data slow filter customer line batch value spark plan "
    "shuffle broadcast column stage task node disk memory cache index page "
    "write read commit stream state event click view error signup purchase"
).split()

TEMPLATE = (
    "all rights reserved this page is part of the site archive and may "
    "not be reproduced without permission of the publisher please see "
    "the terms of service for details about usage limits and content "
    "distribution policy contact the admin for questions"
).split()
assert len(TEMPLATE) == 41


def make_documents(out_dir: str) -> None:
    rng = np.random.default_rng(SEED)
    ids, texts, langs, sources = [], [], [], []
    for i in range(N_DOCS):
        if i < N_BOILERPLATE:
            toks = list(TEMPLATE)
            toks[i % len(toks)] = VOCAB[i % len(VOCAB)]
        else:
            n = int(rng.integers(30, 70))
            toks = [VOCAB[j] for j in rng.integers(0, len(VOCAB), n)]
        text = " ".join(toks)
        ids.append(i)
        texts.append(text)
        langs.append(["en", "es", "zh", "fr"][i % 4])
        sources.append(f"src{i % 20}")
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))


def make_events(out_dir: str) -> None:
    rng = np.random.default_rng(SEED + 1)
    n_hot = int(N_EVENTS * HOT_FRACTION)
    user_id = np.concatenate([
        np.full(n_hot, HOT_USER, dtype=np.int64),
        rng.integers(0, N_USERS, N_EVENTS - n_hot).astype(np.int64),
    ])
    rng.shuffle(user_id)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 90 * 24 * 3600 * 1_000_000,
                             N_EVENTS).astype("timedelta64[us]")
    etypes = np.array(["click", "view", "purchase", "signup", "error"])
    tbl = pa.table({
        "event_id": pa.array(np.arange(N_EVENTS, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(user_id),
        "event_type": pa.array(etypes[rng.integers(0, 5, N_EVENTS)]),
        "value": pa.array(
            np.round(rng.uniform(0, 500, N_EVENTS), 2), pa.float64()),
        "props": pa.array(["{}"] * N_EVENTS, pa.string()),
    })
    # several row groups so Spark can parallelize the scan
    pq.write_table(tbl, os.path.join(out_dir, "events.parquet"),
                   row_group_size=1_000_000)
    users = pa.table({
        "user_id": pa.array(np.arange(N_USERS, dtype=np.int64)),
        "country": pa.array([f"C{i % 50}" for i in range(N_USERS)],
                            pa.string()),
        "tier": pa.array([f"t{i % 5}" for i in range(N_USERS)], pa.string()),
    })
    pq.write_table(users, os.path.join(out_dir, "users.parquet"))


def main() -> str:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo_root, ".scratch", "skewed")
    os.makedirs(out_dir, exist_ok=True)
    make_documents(out_dir)
    make_events(out_dir)
    print(out_dir)
    return out_dir


if __name__ == "__main__":
    main()
