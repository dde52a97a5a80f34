#!/usr/bin/env python
"""Deterministic scale-up generator: synthesize an sfN dataset by tiling the
driver's sf0.1 tables T times with structure-preserving decorrelation.

The point of the generated data is the round-5 scale-proof: every operator's
per-tile work must stay IDENTICAL to sf0.1 while total volume grows T-fold,
so that a super-linear runtime at sfN falsifies a plan shape (a cap that
stops holding, a shuffle that grows quadratically) rather than an artifact
of denser synthetic data. Three transforms guarantee that:

- documents: tile t > 0 rewrites every whitespace token ``w -> w + "x{t}"``.
  A per-tile bijection on the token alphabet preserves every within-tile
  token-shingle Jaccard EXACTLY (dedup pair structure per tile is identical
  to sf0.1) while making cross-tile shingle sets disjoint — no cross-tile
  candidates, so dedup work is T * (sf0.1 work), i.e. linear by
  construction. ``n_chars`` is recomputed to stay consistent.
- embeddings: tile t > 0 applies a seeded permutation of the 64 dimensions.
  A permutation is an isometry: norms and all within-tile dot products /
  cosines are bit-identical to sf0.1 (same pair structure, same
  cluster geometry), while cross-tile cosines decorrelate to noise — no
  spurious cross-tile near-dup pairs at cosine ~1.0 that naive copying
  would plant.
- events / customer / TPC-H tables: key-offset tiling (disjoint id spaces
  per tile). CDC keys (user_id) are disjoint across tiles, so per-key LWW
  update chains keep their sf0.1 length; join fan-in stays <= 1 match per
  fact row. nation/region are bounded dimension enums and are copied once.

Seed model: all randomness is ``np.random.default_rng(GEN_SEED + tile)``;
the output is a pure function of (src dir, tiles).

Usage: python scripts/gen_sf.py [--src /root/testdata/sf0.1] [--tiles 10]
                                [--dst /root/repo/.data/sf1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

GEN_SEED = 42_1000

# key column -> offset stride per tile (stride = sf0.1 id-space size, so the
# per-tile id spaces are disjoint and dense)
OFFSETS = {
    "events": {"event_id": 100_000, "user_id": 1_500},
    "customer": {"c_custkey": 15_000},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
}
COPY_ONCE = {"nation", "region"}


def _offset_tile(tbl: pa.Table, offsets: dict[str, int], t: int) -> pa.Table:
    for col, stride in offsets.items():
        i = tbl.schema.get_field_index(col)
        shifted = pc.add(tbl.column(col), pa.scalar(t * stride, tbl.column(col).type))
        tbl = tbl.set_column(i, tbl.field(i), shifted.cast(tbl.field(i).type))
    return tbl


def _tile_documents(tbl: pa.Table, t: int) -> pa.Table:
    if t == 0:
        return tbl
    texts = tbl.column("text").to_pylist()
    suf = f"x{t}"
    new = [" ".join(w + suf for w in s.split()) if s is not None else None for s in texts]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"), tbl.schema.field("text"), pa.array(new)
    )
    n_chars = pa.array(
        [len(s) if s is not None else None for s in new],
        tbl.schema.field("n_chars").type,
    )
    return tbl.set_column(
        tbl.schema.get_field_index("n_chars"), tbl.schema.field("n_chars"), n_chars
    )


def _tile_embeddings(tbl: pa.Table, t: int) -> pa.Table:
    if t == 0:
        return tbl
    rng = np.random.default_rng(GEN_SEED + t)
    col = tbl.column("embedding").combine_chunks()
    vecs = col.to_pylist()
    dim = next(len(v) for v in vecs if v is not None)
    perm = rng.permutation(dim)
    out = [None if v is None else list(np.asarray(v, dtype=np.float32)[perm]) for v in vecs]
    arr = pa.array(out, tbl.schema.field("embedding").type)
    return tbl.set_column(
        tbl.schema.get_field_index("embedding"), tbl.schema.field("embedding"), arr
    )


def generate(src: str, dst: str, tiles: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in sorted(os.listdir(src)):
        if not name.endswith(".parquet"):
            continue
        table = name[: -len(".parquet")]
        base = pq.read_table(os.path.join(src, name))
        if table in COPY_ONCE:
            out = base
        else:
            parts = []
            for t in range(tiles):
                tt = base
                if table == "documents":
                    tt = _tile_documents(tt, t)
                elif table == "embeddings":
                    tt = _tile_embeddings(tt, t)
                tt = _offset_tile(tt, OFFSETS.get(table, {}), t)
                parts.append(tt)
            out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, name), row_group_size=131_072)
        print(f"{table:12s} {base.num_rows:>9,} -> {out.num_rows:>10,} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/.data/sf1")
    ap.add_argument("--tiles", type=int, default=10)
    a = ap.parse_args()
    generate(a.src, a.dst, a.tiles)


if __name__ == "__main__":
    main()
