#!/usr/bin/env python
"""Materialize a synthetic sf1 bench directory from sf0.1 (VERDICT r5 #6).

The driver ships sf{0.001,0.01,0.1} only; the full-headline sf1 run
needs 10x the rows with the SAME physical parquet types (events.ts is
int64 nanos read via nanosAsLong — a DuckDB/Spark rewrite would retype
it). So: pyarrow-concat 10 replicas of each sf0.1 table, shifting every
primary/foreign key by a replica offset so joins stay 1:1 within a
replica (TPC-H's own scaling keeps region/nation fixed — so do we), and
prefixing document text with a per-replica tag so the near-dup
structure stays one cluster per logical doc instead of a 10x exact-dup
blowup that no real corpus has.

Usage: python tools/make_sf1.py [/tmp/spark_graft_sf1]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# per-table key columns and their replica offsets (round numbers far
# above the sf0.1 max so replicas can never collide)
SHIFTS = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
COPY_AS_IS = ("region", "nation")


def _replica(table: pa.Table, name: str, i: int) -> pa.Table:
    if i == 0:
        return table
    out = table
    for col, base in SHIFTS.get(name, {}).items():
        idx = out.schema.get_field_index(col)
        typ = out.schema.field(idx).type
        shifted = pc.add(out.column(idx), pa.scalar(i * base, type=typ))
        out = out.set_column(idx, out.schema.field(idx), shifted)
    if name == "embeddings":
        # Same rationale as the documents text tag below: replicas must
        # not be EXACT copies of each other. Untouched, every vector has
        # REPLICAS-1 identical twins in other replicas, so any cell/bucket
        # that groups similar vectors becomes quadratically hot with pairs
        # no real corpus exhibits (an r10 full-sf1 sweep ground one cell
        # single-task for 25+ minutes). A tiny per-replica epsilon on the
        # first dimension keeps each logical vector's neighborhood (the
        # near-dup and top-k structure within a replica) while breaking
        # cross-replica exactness.
        import numpy as np

        idx = out.schema.get_field_index("embedding")
        col = out.column(idx).combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        flat = col.values.to_numpy(zero_copy_only=False).copy()
        flat[offsets[:-1]] += np.float32(i) * np.float32(1e-3)
        out = out.set_column(
            idx,
            out.schema.field(idx),
            pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(flat, type=pa.float32()),
            ),
        )
    if name == "documents":
        tag = f"[r{i}] "
        idx = out.schema.get_field_index("text")
        tagged = pc.binary_join_element_wise(
            pa.array([tag] * len(out), type=pa.string()),
            out.column(idx).combine_chunks(),
            "",
        )
        out = out.set_column(idx, out.schema.field(idx), tagged)
        nidx = out.schema.get_field_index("n_chars")
        out = out.set_column(
            nidx,
            out.schema.field(nidx),
            pc.add(out.column(nidx), pa.scalar(len(tag), type=pa.int64())),
        )
    return out


def main(dst: str | None = None) -> None:
    if dst is None:
        dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    os.makedirs(dst, exist_ok=True)
    for name in COPY_AS_IS:
        src = f"{SRC}/{name}.parquet"
        pq.write_table(pq.read_table(src), f"{dst}/{name}.parquet")
        print(f"{name}: copied")
    for name in SHIFTS:
        src_tab = pq.read_table(f"{SRC}/{name}.parquet")
        parts = [_replica(src_tab, name, i) for i in range(REPLICAS)]
        big = pa.concat_tables(parts)
        # preserve the source's physical annotations (nanos timestamps)
        pq.write_table(
            big,
            f"{dst}/{name}.parquet",
            coerce_timestamps=None,
            store_schema=True,
        )
        print(f"{name}: {len(src_tab)} -> {len(big)} rows")
    print(f"sf1 at {dst}")


if __name__ == "__main__":
    main()
