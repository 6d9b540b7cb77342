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
    python tools/band_ratio.py /tmp/old.json BENCH_DETAIL.json [--mode class]

Prints: the per-anchor ratios, the band, and the band-normalized
per-query table sorted by normalized ratio (descending); normalized
movers >= FLAG_AT are flagged. ``--mode class`` (r17, VERDICT r16 item
2) normalizes each query against its NEAREST ANCHOR CLASS instead of
the geomean: a CPU-skewed contention band under-corrects CPU-bound
shapes by construction (r16: the cpu_sql anchor alone moved 2.11x
while the geomean band was 1.418, so the untouched TPC-H Q1 shape a6
showed 2.02x "normalized" — 0.96x against its own class). Exit code 0
always — this is a lens, not a gate (the driver's 2x-of-baseline
envelope stays the gate).
"""

from __future__ import annotations

import json
import math
import re
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

# ... unless the movement is too large to be scheduling noise (ADVICE
# r16 low): an unconditional floor would hide a genuine 6x regression
# that stays under 2 s (0.3 s -> 1.9 s) from the machine-readable
# "flagged" list forever. Sub-floor movers at or above this normalized
# ratio flag anyway — scheduling noise on this host measures well under
# 2x on sub-second queries (the g15 re-measure spread was 0.84-1.18 s),
# so 3x clears it with margin while still catching order-of-magnitude
# regressions early.
SUBFLOOR_FLAG_AT = 3.0

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


# Class assignment for --mode class (r17). Families whose runtime is
# dominated by staged writes / pointer+manifest protocol IO / index
# maintenance normalize against the write_io anchor; multi-step
# pipeline orchestrations against pipeline_refresh; pure
# scan/join/agg/window expression shapes (the default) against cpu_sql.
# Pattern-based so new declarations inherit a sane class; the geomean
# band is the fallback when a class's anchor is missing from a detail.
_WRITE_IO_RE = re.compile(
    r"_probe\b|_probe$|ingest|erase|compact|rebuild|lifecycle|vacuum|"
    r"^s3_|^s8_|^s9_|^s11_|^s17_|^s19_|^s20_|^s21_|^x7_|^x1[3-8]_|"
    r"gdpr|shard|scd2|ctas|seed"
)
_PIPELINE_RE = re.compile(r"refresh|pipeline|quarantine|^q[1-9]_")


def anchor_class(name: str) -> str:
    """Nearest anchor class for a query name: 'write_io',
    'pipeline_refresh', or 'cpu_sql' (default)."""
    if _WRITE_IO_RE.search(name):
        return "write_io"
    if _PIPELINE_RE.search(name):
        return "pipeline_refresh"
    return "cpu_sql"


def _anchor_secs(detail: dict) -> dict[str, float]:
    out = {}
    anchors = detail.get("anchors") or {}
    for role, q in _ANCHOR_QUERIES.items():
        if role in anchors:
            out[role] = float(anchors[role]["sec"])
        elif q in detail.get("queries", {}):
            out[role] = float(detail["queries"][q])
    return out


def band_and_ratios(old: dict, new: dict, mode: str = "geomean") -> dict:
    """The computation, separated for tests: anchor ratios, their
    geometric-mean band, and per-query raw + band-normalized ratios over
    the queries present in both details. ``mode='class'`` divides each
    query's raw ratio by its nearest anchor CLASS's ratio instead of the
    geomean (falling back to the geomean for classes whose anchor is
    missing) — the r17 answer to a CPU-skewed contention band
    under-correcting CPU-bound shapes."""
    if mode not in ("geomean", "class"):
        raise ValueError(f"mode must be 'geomean' or 'class', got {mode!r}")
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
        cls = anchor_class(name)
        divisor = anchor_ratios.get(cls, band) if mode == "class" else band
        norm = raw / divisor
        if name in CONTENTION_SENSITIVE:
            note = "contention-sensitive" if norm >= FLAG_AT else ""
        elif float(qn[name]) < FLAG_FLOOR_SEC:
            # sub-floor: scheduling-noise suppression, UNLESS the move is
            # too large to be noise (ADVICE r16)
            if norm >= SUBFLOOR_FLAG_AT:
                note = "FLAG"
            elif norm >= FLAG_AT:
                note = "sub-floor"
            else:
                note = ""
        else:
            note = "FLAG" if norm >= FLAG_AT else ""
        rows.append(
            {
                "query": name,
                "old_sec": float(qo[name]),
                "new_sec": float(qn[name]),
                "raw_ratio": round(raw, 3),
                "normalized_ratio": round(norm, 3),
                **({"anchor_class": cls} if mode == "class" else {}),
                "note": note,
            }
        )
    rows.sort(key=lambda r: -r["normalized_ratio"])
    ratios = [r["normalized_ratio"] for r in rows]
    mid = len(ratios) // 2
    return {
        "mode": mode,
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
    mode = "geomean"
    if "--mode" in argv:
        i = argv.index("--mode")
        mode = argv[i + 1] if i + 1 < len(argv) else ""
        argv = argv[:i] + argv[i + 2:]
    if len(argv) != 3 or mode not in ("geomean", "class"):
        print(__doc__)
        return 2
    with open(argv[1]) as f:
        old = json.load(f)
    with open(argv[2]) as f:
        new = json.load(f)
    res = band_and_ratios(old, new, mode=mode)
    print(f"mode:                    {res['mode']}")
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
        print(
            f"\nflagged (normalized >= {FLAG_AT} at new >= {FLAG_FLOOR_SEC}s, "
            f"or >= {SUBFLOOR_FLAG_AT} sub-floor): {res['flagged']}"
        )
    else:
        print(
            f"\nno flaggable queries moved >= {FLAG_AT}x after band "
            "normalization (sub-floor and contention-sensitive movers, "
            "if any, are annotated above)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
