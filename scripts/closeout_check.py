#!/usr/bin/env python3
"""Round close-out guard (r17 verdict #5): the committed round bench
archive must cover EVERY gate at the close-out HEAD — qe04 landed
after r17's close-out commit and the round archive missed it.

Usage: closeout_check.py <bench_out_rNN.json> <verify_out_dir>

Compares the archive's per-query minima keys (minus warehouse_build)
against the gate names in <verify_out_dir>/oracle_sql.json (written by
graft.Verify at HEAD). Exits non-zero and names the gap if the archive
is missing any gate or carries gates that no longer exist.
"""
import json
import sys

bench_path, verify_dir = sys.argv[1], sys.argv[2]

with open(bench_path) as f:
    bench = json.load(f)
bench_names = set(bench["queries"]) - {"warehouse_build"}

with open(f"{verify_dir}/oracle_sql.json") as f:
    gate_names = set(json.load(f))

missing = sorted(gate_names - bench_names)
stale = sorted(bench_names - gate_names)
if missing:
    print(f"ARCHIVE INCOMPLETE: {len(missing)} gate(s) at HEAD missing "
          f"from {bench_path}: {', '.join(missing)}")
if stale:
    print(f"ARCHIVE STALE: {len(stale)} archived entr(ies) no longer "
          f"gated at HEAD: {', '.join(stale)}")
if missing or stale:
    sys.exit(1)
print(f"archive complete: {len(bench_names)} bench entries == "
      f"{len(gate_names)} gates at HEAD")
