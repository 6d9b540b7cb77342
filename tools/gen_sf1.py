"""Generate an sf1-scale dataset (10x sf0.1) for local scale validation.

The driver ships sf0.001/0.01/0.1 only; the 100-TB claims in SCALING.md are
argued from plan shapes. This script adds one empirical order of magnitude:
it replicates sf0.1 ten times with consistent key offsets, so every foreign
key keeps referential integrity and every value distribution is preserved
while row counts and key cardinalities scale 10x.

Corpus-dependent tables are perturbed so DATA density stays constant (a
naive 10x copy would plant 45 cross-copy duplicate pairs per document and
make near-dedup work grow quadratically by construction, not by plan):

- documents: every token in copy i>0 gets a copy-specific suffix, so
  shingle sets are disjoint across copies — the near-dup structure WITHIN
  each copy (what the dedup queries mine) replicates exactly 10x.
- embeddings: copy i>0 adds small seeded Gaussian noise, so cosine
  neighborhoods replicate without 10 exact clones of every vector.

Output: /root/repo/data/sf1/*.parquet (git-ignored, ~170 MB). bench.py
picks it up automatically for its optional sf1 section when present.

Usage: python tools/gen_sf1.py [--copies 10] [--src /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# (table, {column: offset_key}) — offset = copy_index * (max(key_space)+1),
# shared per key space so foreign keys stay consistent across tables.
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "evt", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_ASIS = ("region", "nation")


def _key_bases(src: str) -> dict[str, int]:
    return _key_bases_for(src, KEYED)


def _key_bases_for(src: str, keyed: dict) -> dict[str, int]:
    spaces = {}
    for table, cols in keyed.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        for col, space in cols.items():
            hi = pc.max(t[col]).as_py() + 1
            spaces[space] = max(spaces.get(space, 0), hi)
    return spaces


def _mangle_documents(tbl: pa.Table, copy: int) -> pa.Table:
    if copy == 0:
        return tbl
    texts = tbl["text"].to_pylist()
    tag = f"c{copy}"
    mangled = [" ".join(f"{w}{tag}" for w in t.split()) if t else t for t in texts]
    n_chars = pa.array([len(t) if t is not None else None for t in mangled], pa.int64())
    return tbl.set_column(
        tbl.schema.get_field_index("text"), "text", pa.array(mangled, pa.string())
    ).set_column(tbl.schema.get_field_index("n_chars"), "n_chars", n_chars)


def _perturb_embeddings(tbl: pa.Table, copy: int) -> pa.Table:
    if copy == 0:
        return tbl
    embs = tbl["embedding"].to_pylist()
    rng = np.random.default_rng(1000 + copy)
    out = []
    for e in embs:
        if e is None:
            out.append(None)
            continue
        v = np.asarray(e, dtype=np.float32)
        out.append((v + rng.normal(0, 0.05, size=v.shape).astype(np.float32)).tolist())
    idx = tbl.schema.get_field_index("embedding")
    return tbl.set_column(idx, "embedding", pa.array(out, tbl.schema.field(idx).type))


def generate(src: str, dst: str, copies: int, tables: list[str] | None = None) -> None:
    """``tables`` restricts generation to a subset (r16, VERDICT r15
    item 5: the second-decade sf10 dataset is built only for the
    scale-critical families' inputs — documents for LSH near-dup,
    embeddings for IVF, events for the txn-append sink — so the dataset
    stays a few hundred MB instead of ~1.7 GB). Key offsets are computed
    from the loaded subset only; referential integrity to tables OUTSIDE
    the subset is not maintained (none of the scale-family queries join
    outside their own table)."""
    os.makedirs(dst, exist_ok=True)
    keyed = {t: c for t, c in KEYED.items() if tables is None or t in tables}
    bases = _key_bases_for(src, keyed)
    for table in COPY_ASIS:
        if tables is not None and table not in tables:
            continue
        # dims are fixed-size lookup tables — identical at every sf
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        print(f"{table}: {t.num_rows} rows (copied)")
    for table, cols in keyed.items():
        t0 = pq.read_table(os.path.join(src, f"{table}.parquet"))
        parts = []
        for i in range(copies):
            t = t0
            if table == "documents":
                t = _mangle_documents(t, i)
            elif table == "embeddings":
                t = _perturb_embeddings(t, i)
            for col, space in cols.items():
                idx = t.schema.get_field_index(col)
                shifted = pc.add(t[col], pa.scalar(i * bases[space], t.schema.field(idx).type))
                t = t.set_column(idx, col, shifted)
            parts.append(t)
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, f"{table}.parquet"))
        print(f"{table}: {out.num_rows} rows ({copies}x {t0.num_rows})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "sf1"))
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset of tables to generate (default: all)",
    )
    args = ap.parse_args()
    generate(
        args.src,
        args.dst,
        args.copies,
        tables=args.tables.split(",") if args.tables else None,
    )
