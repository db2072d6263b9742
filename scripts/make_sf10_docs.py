#!/usr/bin/env python3
"""Scale the sf1 documents AND embeddings tables one more generator
decade to ~sf10 for the dedup/similarity growth-law measurement
(driver-side tooling, like make_sf1.py — not part of the Spark
library).

Applies make_sf1.py's transformations AGAIN, to testdata-sf1: each
document copy gains a unique trailing token (near-dup, not exact-dup)
and each embedding copy a deterministic single-coordinate jitter, so
both corpora follow the exact same 4x-per-decade law as sf0.1 -> sf1.
Only documents.parquet and embeddings.parquet are produced — the
growth-law gates (qs12/qs16, qd02/qd05/qd09, qs02/qp03/qp04/qp13)
read nothing else, and the fact tables at 10x sf1 would cost GBs for
queries that never touch them. (embeddings added round 18 — r17
verdict #3 asked for the embedding-side arm-vs-twin decade numbers.)
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata-sf1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata-sf10"

KEY_OFFSET = 1_000_000_000_000  # above sf1's shifted id range

os.makedirs(DST, exist_ok=True)

t = pq.read_table(f"{SRC}/documents.parquet")
copies = [t]
texts = t.column("text").to_pylist()
base_ids = t.column("doc_id").to_pylist()
for i in range(1, 4):
    ids = [d + i * KEY_OFFSET for d in base_ids]
    new_texts = [f"{txt} u{did}" for txt, did in zip(texts, ids)]
    c = t.set_column(t.schema.get_field_index("doc_id"),
                     t.schema.field("doc_id"),
                     pa.array(ids, pa.int64()))
    c = c.set_column(c.schema.get_field_index("text"),
                     c.schema.field("text"),
                     pa.array(new_texts, pa.string()))
    c = c.set_column(c.schema.get_field_index("n_chars"),
                     c.schema.field("n_chars"),
                     pa.array([len(s) for s in new_texts], pa.int64()))
    copies.append(c)
out = pa.concat_tables(copies)
pq.write_table(out, f"{DST}/documents.parquet")
print(f"documents: {t.num_rows} -> {out.num_rows} at {DST}")

# embeddings: same decade, make_sf1.py's jitter discipline (each copy's
# vectors get a deterministic single-coordinate nudge so cosine ties
# never make recall gates nondeterministic among identical vectors)
te = pq.read_table(f"{SRC}/embeddings.parquet")
ecopies = [te]
embs = te.column("embedding").to_pylist()
base_vids = te.column("vec_id").to_pylist()
for i in range(1, 4):
    vids = [v + i * KEY_OFFSET for v in base_vids]
    jittered = []
    for row, e in enumerate(embs):
        e2 = list(e)
        e2[(row + i) % len(e2)] += 0.01 * i
        jittered.append(e2)
    c = te.set_column(te.schema.get_field_index("vec_id"),
                      te.schema.field("vec_id"),
                      pa.array(vids, pa.int64()))
    eidx = c.schema.get_field_index("embedding")
    c = c.set_column(eidx, c.schema.field(eidx),
                     pa.array(jittered, te.schema.field(eidx).type))
    ecopies.append(c)
eout = pa.concat_tables(ecopies)
pq.write_table(eout, f"{DST}/embeddings.parquet")
print(f"embeddings: {te.num_rows} -> {eout.num_rows} at {DST}")
