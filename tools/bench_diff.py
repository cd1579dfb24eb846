"""Regenerate BENCH_DIFF.md: per-query timings across every recorded
bench round (BENCH_r*.json) plus, optionally, a fresh local run.

Usage:
    python tools/bench_diff.py                # table from BENCH_r*.json
    python tools/bench_diff.py local.json     # ... plus a local run column

A >2x swing on a query whose code did not change that round is container
noise (best-of-3 sampling bounds it but cannot eliminate co-tenant CPU);
a consistent drift on a changed query is a regression. The table exists
so the two are decidable.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    runs: list[tuple[str, dict]] = []
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        label = re.search(r"BENCH_(r\d+)\.json", path).group(1)
        with open(path) as f:
            data = json.load(f)
        # the driver wraps bench.py's JSON line: prefer the parsed payload,
        # else dig it out of the captured stdout tail
        if "queries" not in data:
            if isinstance(data.get("parsed"), dict) and "queries" in data["parsed"]:
                data = data["parsed"]
            else:
                m = re.search(r'\{"metric".*?\}\}', data.get("tail", ""))
                if m:
                    data = json.loads(m.group(0))
        runs.append((label, data))
    for path in sys.argv[1:]:
        with open(path) as f:
            runs.append((f"local({os.path.basename(path)})", json.load(f)))
    if not runs:
        raise SystemExit("no BENCH_r*.json found")

    names: list[str] = []
    for _, data in runs:
        for q in data.get("queries", {}):
            if q not in names:
                names.append(q)

    lines = [
        "# BENCH_DIFF — per-query seconds by round",
        "",
        f"sf={runs[-1][1].get('sf')}; best-of-N per query (N=2 through r2, "
        "3 from r3); '—' = not in that round's headline set.",
        "",
        "| query | " + " | ".join(l for l, _ in runs) + " |",
        "|---|" + "---|" * len(runs),
    ]
    for q in names:
        cells = []
        for _, data in runs:
            v = data.get("queries", {}).get(q)
            cells.append("—" if v is None else f"{v:.2f}")
        lines.append(f"| {q} | " + " | ".join(cells) + " |")
    lines.append(
        "| **total** | "
        + " | ".join(f"**{data.get('value', 0):.2f}**" for _, data in runs)
        + " |"
    )
    lines += [
        "",
        "## Reading the table",
        "",
        "- **r2 'regression' was noise**: 13/15 queries slowed in r2 including",
        "  several whose code did not change that round",
        "  (running_order_total_per_customer 0.77→1.47 s, ",
        "  count_distinct_users_per_type 0.59→1.13 s, embedding_topk_cosine",
        "  0.50→1.09 s); all reverted in r3, again without code changes —",
        "  co-tenant CPU, not plans. No plan changed for the worse in r2/r3.",
        "- **r3 changes**: doc_minhash_lsh_pairs and doc_ngram_jaccard_pairs",
        "  now run with hot-key caps active and the ids-only band shuffle —",
        "  timings flat-to-better vs r2 at this (skew-free) SF; the caps",
        "  exist for skewed corpora, not this fixture.",
        "- Swings >2x on unchanged queries are environment noise; consistent",
        "  drift on changed queries is a regression worth bisecting.",
    ]
    out = os.path.join(ROOT, "BENCH_DIFF.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(names)} queries x {len(runs)} runs")


if __name__ == "__main__":
    main()
