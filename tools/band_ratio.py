"""Band-normalized round-over-round bench comparison (r15, VERDICT r14
item 2).

The raw headline total conflates two things: what the CODE did and what
the HOST did (r14's driver run was 1.36x the same code's quiet-host
time, purely contention). bench.py measures three pinned ANCHORS —
queries whose code never changes — inside the same process and
protocol; the geometric mean of their round-over-round ratios IS the
host band, and dividing every per-query ratio by it separates code
movement from host movement.

Usage:
    git show <old-commit>:BENCH_DETAIL.json > /tmp/old.json
    python tools/band_ratio.py /tmp/old.json BENCH_DETAIL.json

Prints: the per-anchor ratios, the band, and the band-normalized
per-query table sorted by normalized ratio (descending); normalized
movers >= FLAG_AT are flagged. Exit code 0 always — this is a lens,
not a gate (the driver's 2x-of-baseline envelope stays the gate).
"""

from __future__ import annotations

import json
import math
import sys

FLAG_AT = 1.5

# Minimum NEW runtime for a mover to be flagged (r16, VERDICT r15 item
# 4 — the g15 promise): sub-second queries carry Spark scheduling noise
# comparable to their whole runtime, so a 1.5x "regression" on a 0.9 s
# query is usually a small-denominator artifact (g15 flagged 1.72x in
# r15, re-measured 0.84-1.18 s same-code). Ratios for such queries are
# still PRINTED — only the flag is suppressed, annotated "sub-floor".
# A genuine regression that pushes a small query past the floor still
# flags on its new_sec.
FLAG_FLOOR_SEC = 2.0

# Queries whose runtime is dominated by multi-writer contention
# mechanics — thread scheduling, OCC collision re-resolves, the
# tolerant-read backoff sleeps — not by code under measurement (r16,
# VERDICT r15 item 3): x15 moved 2.03x in the r14->r15 driver band
# comparison while the same code measured 2.5x apart across two quiet
# runs. Host contention amplifies a two-thread probe in a way the
# single-stream anchors cannot normalize, so these are reported but
# never flagged; annotated "contention-sensitive".
CONTENTION_SENSITIVE = {"x15_txn_multi_writer_occ"}

# anchor fallback for OLD detail files that predate the anchors block
# (r14 and earlier): the same pinned queries, read from "queries"
_ANCHOR_QUERIES = {
    "cpu_sql": "g1_star_join_revenue",
    "write_io": "l2_lsh_rebuild_probe",
    "pipeline_refresh": "s14_incremental_refresh",
}


def _anchor_secs(detail: dict) -> dict[str, float]:
    out = {}
    anchors = detail.get("anchors") or {}
    for role, q in _ANCHOR_QUERIES.items():
        if role in anchors:
            out[role] = float(anchors[role]["sec"])
        elif q in detail.get("queries", {}):
            out[role] = float(detail["queries"][q])
    return out


def band_and_ratios(old: dict, new: dict) -> dict:
    """The computation, separated for tests: anchor ratios, their
    geometric-mean band, and per-query raw + band-normalized ratios over
    the queries present in both details."""
    a_old, a_new = _anchor_secs(old), _anchor_secs(new)
    anchor_ratios = {
        role: a_new[role] / a_old[role]
        for role in a_old
        if role in a_new and a_old[role] > 0
    }
    if anchor_ratios:
        band = math.exp(
            sum(math.log(r) for r in anchor_ratios.values()) / len(anchor_ratios)
        )
    else:
        band = 1.0  # no shared anchors: raw == normalized, say so loudly
    qo, qn = old.get("queries", {}), new.get("queries", {})
    rows = []
    for name in sorted(set(qo) & set(qn)):
        if float(qo[name]) <= 0:
            continue
        raw = float(qn[name]) / float(qo[name])
        norm = raw / band
        if norm < FLAG_AT:
            note = ""
        elif name in CONTENTION_SENSITIVE:
            note = "contention-sensitive"
        elif float(qn[name]) < FLAG_FLOOR_SEC:
            note = "sub-floor"
        else:
            note = "FLAG"
        rows.append(
            {
                "query": name,
                "old_sec": float(qo[name]),
                "new_sec": float(qn[name]),
                "raw_ratio": round(raw, 3),
                "normalized_ratio": round(norm, 3),
                "note": note,
            }
        )
    rows.sort(key=lambda r: -r["normalized_ratio"])
    ratios = [r["normalized_ratio"] for r in rows]
    mid = len(ratios) // 2
    return {
        "anchor_ratios": {k: round(v, 3) for k, v in anchor_ratios.items()},
        "band": round(band, 3),
        "rows": rows,
        "n_compared": len(rows),
        "median_normalized": (
            round(sorted(ratios)[mid], 3) if ratios else None
        ),
        "flagged": [r["query"] for r in rows if r["note"] == "FLAG"],
    }


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(__doc__)
        return 2
    with open(argv[1]) as f:
        old = json.load(f)
    with open(argv[2]) as f:
        new = json.load(f)
    res = band_and_ratios(old, new)
    print(f"anchor ratios (new/old): {res['anchor_ratios']}")
    print(f"host band (geomean):     {res['band']}")
    if not res["anchor_ratios"]:
        print("WARNING: no shared anchors — normalized == raw")
    print(
        f"compared {res['n_compared']} queries; "
        f"median normalized ratio {res['median_normalized']}"
    )
    print(f"{'query':44s} {'old_s':>8s} {'new_s':>8s} {'raw':>7s} {'norm':>7s}")
    for r in res["rows"]:
        mark = f"  <-- {r['note']}" if r["note"] else ""
        print(
            f"{r['query']:44s} {r['old_sec']:8.3f} {r['new_sec']:8.3f} "
            f"{r['raw_ratio']:7.3f} {r['normalized_ratio']:7.3f}{mark}"
        )
    if res["flagged"]:
        print(f"\nflagged (normalized >= {FLAG_AT}, new >= {FLAG_FLOOR_SEC}s): {res['flagged']}")
    else:
        print(
            f"\nno flaggable queries moved >= {FLAG_AT}x after band "
            "normalization (sub-floor and contention-sensitive movers, "
            "if any, are annotated above)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
