#!/usr/bin/env python3
"""Scale the driver-generated sf0.1 testdata to ~sf1 for local scale
validation (driver-side tooling, like check.py — not part of the Spark
library).

Facts scale 10x (lineitem, orders, events) with key-shifted copies so
join keys stay unique; dims (region/nation/customer/supplier/part) stay
as-is — facts grow faster than dims, and FKs must keep resolving.
Documents and embeddings scale 4x: each copy's text gains a unique
trailing token (near-dup, not exact-dup, so pair counts grow linearly
per group instead of degenerating) and each copy's embedding gets a
deterministic single-coordinate jitter (cosine ties would otherwise
make ANN recall gates nondeterministic among identical vectors).

pyarrow is used (not DuckDB) so parquet physical types survive exactly
— events carries timestamp[ns], which a rewrite through another engine
would quietly narrow.
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata-sf1"

KEY_OFFSET = 1_000_000_000

os.makedirs(DST, exist_ok=True)


def copy_unchanged(name):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    pq.write_table(t, f"{DST}/{name}.parquet")
    print(f"{name}: {t.num_rows} (unchanged)")


def shift(table, col, i):
    idx = table.schema.get_field_index(col)
    shifted = pc.add(table.column(col), pa.scalar(i * KEY_OFFSET, pa.int64()))
    return table.set_column(idx, table.schema.field(idx), shifted)


def scale_shift(name, cols, factor):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    copies = [t]
    for i in range(1, factor):
        c = t
        for col in cols:
            c = shift(c, col, i)
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{DST}/{name}.parquet")
    print(f"{name}: {t.num_rows} -> {out.num_rows}")


def scale_documents(factor):
    t = pq.read_table(f"{SRC}/documents.parquet")
    copies = [t]
    for i in range(1, factor):
        c = shift(t, "doc_id", i)
        ids = c.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        new_texts = [f"{txt} u{did}" for txt, did in zip(texts, ids)]
        tidx = c.schema.get_field_index("text")
        c = c.set_column(tidx, c.schema.field(tidx),
                         pa.array(new_texts, pa.string()))
        nidx = c.schema.get_field_index("n_chars")
        c = c.set_column(nidx, c.schema.field(nidx),
                         pa.array([len(s) for s in new_texts], pa.int64()))
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{DST}/documents.parquet")
    print(f"documents: {t.num_rows} -> {out.num_rows}")


def scale_embeddings(factor):
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    copies = [t]
    embs = t.column("embedding").to_pylist()
    for i in range(1, factor):
        c = shift(t, "vec_id", i)
        jittered = []
        for row, e in enumerate(embs):
            e2 = list(e)
            e2[(row + i) % len(e2)] += 0.01 * i
            jittered.append(e2)
        eidx = c.schema.get_field_index("embedding")
        c = c.set_column(eidx, c.schema.field(eidx),
                         pa.array(jittered, t.schema.field(eidx).type))
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{DST}/embeddings.parquet")
    print(f"embeddings: {t.num_rows} -> {out.num_rows}")


for name in ["region", "nation", "customer", "supplier", "part"]:
    copy_unchanged(name)
scale_shift("lineitem", ["l_orderkey"], 10)
scale_shift("orders", ["o_orderkey"], 10)
scale_shift("events", ["event_id"], 10)
scale_documents(4)
scale_embeddings(4)
print("done:", DST)
