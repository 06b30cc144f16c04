#!/usr/bin/env python3
"""Multiset-equality check between two Verify dump trees.

The multi-executor certification leg (r13 verdict #1) runs the same
queries twice — once on the single-JVM local[N] master, once on
local-cluster[w,c,m] where shuffle blocks serialize across processes,
broadcasts ship over transport and codegen expressions classload in
remote executors — and the two dumps must be IDENTICAL row multisets
per query. Comparing dump-to-dump avoids a second DuckDB oracle run
(the oracle already certified one side) while still catching any
cross-process divergence bit-exactly.

Usage: check_dumps_equal.py <dumpA> <dumpB> [q1,q2,...]
  With no query list, compares every query dir present in dumpA
  (a dir in A but missing in B is a failure; extra dirs in B are
  ignored — B may be a subset run's output tree).

Per query: column names+types must match, then count(*) and an
order-independent hash aggregate (sum of per-row hashes as HUGEINT —
the same multiset-hash idea check_jaccard_sharded.py uses) must match.

Exit 0 = all equal; exit 1 = any mismatch, each on its own line.
"""
import os
import sys

import duckdb


def row_sig(con, glob):
    cols = con.execute(f"DESCRIBE SELECT * FROM read_parquet('{glob}')").fetchall()
    names = [c[0] for c in cols]
    types = [(c[0], c[1]) for c in cols]
    # Deterministic per-row hash over all columns in NAME order (the two
    # dumps come from the same query code, but sort anyway so a benign
    # projection-order difference cannot fail the compare).
    ordered = ", ".join(f'"{n}"' for n in sorted(names))
    n, h = con.execute(
        f"SELECT count(*), COALESCE(sum(hash(ROW({ordered}))::HUGEINT), 0) "
        f"FROM read_parquet('{glob}')"
    ).fetchone()
    return sorted(types), n, h


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    a, b = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    queries = sorted(
        d for d in os.listdir(a)
        if os.path.isdir(os.path.join(a, d)) and (only is None or d in only)
    )
    if not queries:
        print(f"check_dumps_equal: no query dirs under {a}")
        return 1
    con = duckdb.connect()
    fails = []
    for q in queries:
        pa = os.path.join(a, q, "*.parquet")
        pb = os.path.join(b, q, "*.parquet")
        if not os.path.isdir(os.path.join(b, q)):
            fails.append(f"MISSING: {q} present in {a} but not {b}")
            continue
        try:
            ta, na, ha = row_sig(con, pa)
            tb, nb, hb = row_sig(con, pb)
        except Exception as e:  # noqa: BLE001 — a torn dump is a failure, not a crash
            fails.append(f"READ-ERROR: {q}: {e}")
            continue
        if ta != tb:
            fails.append(f"SCHEMA: {q}: {ta} != {tb}")
        elif na != nb:
            fails.append(f"ROWCOUNT: {q}: {na} != {nb}")
        elif ha != hb:
            fails.append(f"CONTENT: {q}: multiset hash differs over {na} rows")
        else:
            print(f"  ok {q}: {na} rows multiset-equal")
    for f in fails:
        print("✗ " + f)
    print(f"check_dumps_equal: {len(queries)} compared, {len(fails)} failing")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
