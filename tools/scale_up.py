#!/usr/bin/env python3
"""Scale-headroom dataset builder (dev tool only; the library is pure Scala).

Tiles the driver's sf0.1 tables K× (default 10 -> "sf1") into an output dir,
preserving each table's parquet schema and the per-tile statistical shape the
operators' cost models depend on:

  - TPC-H-ish tables tile with disjoint key namespaces (custkey/orderkey/
    partkey/suppkey offsets applied consistently), so the join graph inside
    every tile is intact and fk fan-outs are unchanged; dims (region/nation)
    stay shared.
  - events tiles with disjoint user_id/event_id namespaces over the SAME
    30-day window: 10x users, identical per-user event profile. Date-sharded
    layouts get 10x rows per shard, not more shards - the realistic shape
    (a bigger property, not a longer history).
  - documents tiles with disjoint doc_id namespaces. Texts are rewritten by
    a per-tile token BIJECTION (each token w either stays w or becomes
    w_t<k>, decided by a stable hash of w): within a tile EVERY pairwise
    Jaccard is exactly preserved (dup/near-dup structure scales linearly),
    while cross-tile Jaccard of originally-identical docs drops to
    ~(1-p)/(1+p) = 1/3 < 0.8, so tiling does not manufacture quadratic
    dup-cluster blowups. Short boilerplate lines can survive un-renamed and
    produce some cross-tile dups - the boilerplate-repeats shape a real 10x
    corpus has.
  - embeddings tiles with disjoint vec_id namespaces; each tile k>0 applies
    a seeded random ROTATION (orthogonal matrix): within-tile cosines are
    exactly preserved (near-dup structure linear), cross-tile cosines are
    scrambled. The query convention (vec_id < 10) keeps the query set fixed
    while candidates scale.

Usage: python3 tools/scale_up.py [outdir=/tmp/sf1] [tiles=10] [src=/root/testdata/sf0.1]
"""
import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

RENAME_P = 0.5  # fraction of the token universe renamed per tile


def stable_frac(token: str) -> float:
    h = hashlib.md5(token.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") / 2**64


def retoken(text: str, k: int, renamed: dict) -> str:
    out = []
    for w in text.split(" "):
        if not w:
            out.append(w)
            continue
        r = renamed.get(w)
        if r is None:
            r = stable_frac(w) < RENAME_P
            renamed[w] = r
        out.append(f"{w}_t{k}" if r else w)
    return " ".join(out)


def add_offset(col: pa.ChunkedArray, off: int) -> pa.Array:
    return pa.compute.add(col, pa.scalar(off, col.type))


def tile_table(tbl: pa.Table, k: int, offsets: dict, transform=None) -> pa.Table:
    cols = {}
    for name in tbl.column_names:
        col = tbl.column(name)
        if name in offsets and k > 0:
            cols[name] = add_offset(col, offsets[name] * k)
        else:
            cols[name] = col
    out = pa.table(cols, schema=tbl.schema) if transform is None else transform(
        pa.table(cols, schema=tbl.schema), k)
    return out


def documents_transform(tbl: pa.Table, k: int) -> pa.Table:
    if k == 0:
        return tbl
    renamed = {}
    texts = [retoken(t, k, renamed) if t is not None else None
             for t in tbl.column("text").to_pylist()]
    n_chars = [len(t) if t is not None else None for t in texts]
    d = {n: tbl.column(n) for n in tbl.column_names}
    d["text"] = pa.chunked_array([pa.array(texts, pa.string())])
    d["n_chars"] = pa.chunked_array([pa.array(n_chars, pa.int64())])
    return pa.table(d, schema=tbl.schema)


def embeddings_transform(tbl: pa.Table, k: int) -> pa.Table:
    if k == 0:
        return tbl
    vecs = tbl.column("embedding").to_pylist()
    dim = len(next(v for v in vecs if v))
    rng = np.random.default_rng(424200 + k)
    q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    rotated = []
    for v in vecs:
        if v is None or len(v) == 0:
            rotated.append(v)
        else:
            rotated.append((q @ np.asarray(v, dtype=np.float64)).astype(np.float32).tolist())
    d = {n: tbl.column(n) for n in tbl.column_names}
    d["embedding"] = pa.chunked_array([pa.array(rotated, tbl.schema.field("embedding").type)])
    return pa.table(d, schema=tbl.schema)


# key-namespace stride per tile = the sf0.1 table sizes (ids are 0-based
# dense, verified against the driver data; a regenerated source with more
# rows would need larger strides)
SPECS = {
    "events": ({"event_id": 100_000, "user_id": 1_500}, None),
    "documents": ({"doc_id": 5_000}, documents_transform),
    "embeddings": ({"vec_id": 2_000}, embeddings_transform),
    "customer": ({"c_custkey": 15_000}, None),
    "orders": ({"o_orderkey": 150_000, "o_custkey": 15_000}, None),
    "lineitem": ({"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000}, None),
    "part": ({"p_partkey": 20_000}, None),
    "supplier": ({"s_suppkey": 1_000}, None),
    "nation": None,  # shared dims: copy once
    "region": None,
}


def main(outdir: str, tiles: int, src: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    for name, spec in SPECS.items():
        path = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(path):
            print(f"skip {name} (missing)")
            continue
        tbl = pq.read_table(path)
        if spec is None:
            pq.write_table(tbl, os.path.join(outdir, f"{name}.parquet"))
            print(f"{name}: copied {tbl.num_rows} rows (shared dim)")
            continue
        offsets, transform = spec
        parts = [tile_table(tbl, k, offsets, transform) for k in range(tiles)]
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(outdir, f"{name}.parquet"))
        print(f"{name}: {tbl.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(
        description="Tile the sf0.1 tables K x into an output dir "
                    "(see module docstring for the per-table shape rules).")
    ap.add_argument("outdir", nargs="?", default="/tmp/sf1",
                    help="output directory (default /tmp/sf1)")
    ap.add_argument("tiles", nargs="?", type=int, default=10,
                    help="number of tiles (default 10)")
    ap.add_argument("src", nargs="?", default="/root/testdata/sf0.1",
                    help="source data dir (default /root/testdata/sf0.1)")
    args = ap.parse_args()
    if args.outdir.startswith("-"):
        ap.error(f"refusing option-like outdir {args.outdir!r}")
    main(args.outdir, args.tiles, args.src)
