#!/usr/bin/env python3
"""Scale the sf1 documents table one more generator decade to ~sf10 for
the dedup/similarity growth-law measurement (driver-side tooling, like
make_sf1.py — not part of the Spark library).

Applies make_sf1.py's documents transformation AGAIN, to testdata-sf1:
each copy gains a unique trailing token (near-dup, not exact-dup), so
the corpus follows the exact same 4x-per-decade document law as
sf0.1 -> sf1. Only documents.parquet is produced — the five growth-law
gates (qs12/qs16, qd02/qd05/qd09) read nothing else, and the fact
tables at 10x sf1 would cost GBs for queries that never touch them.
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
