#!/usr/bin/env python3
"""Scale a driver testdata directory N-fold for soak runs (NOT a benchmark
oracle replacement — both Spark and the DuckDB oracle read the SAME scaled
parquet, so the correctness compare stays exact at the larger scale).

Replication shifts every key column by copy * STRIDE, preserving referential
integrity (orders.o_custkey -> customer, lineitem.l_* -> orders/part/
supplier, events.user_id self-consistent). Dimension tables (region, nation)
stay fixed. Text/embeddings replicate as exact clones — deliberately: a
clone-heavy corpus is the realistic hard case for the dedup suite (and the
embedding copies get a per-id first-component nudge so similarity ties stay
deterministic).

Usage: python3 tools/make_scaled_sf.py SRC_DIR DST_DIR COPIES
"""
import sys

import duckdb
import pyarrow.parquet as pq

STRIDE = 100_000_000


def match_source_schema(src_file, dst_file):
    """Rewrite dst with src's exact arrow schema. DuckDB's COPY normalizes
    timestamps to timestamp[us]; the driver's testdata uses timestamp[ns]
    (events.ts — which Spark reads as BIGINT nanos, and queries depend on
    that) and timestamp[ms]. A scaled table must be schema-identical or the
    engines see different TYPES, not just different rows."""
    want = pq.read_schema(src_file)
    t = pq.read_table(dst_file)
    if t.schema != want:
        pq.write_table(t.cast(want), dst_file, row_group_size=65536)  # bounded groups: scan parallelism (see make_zipf_corpus)


def main():
    src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def scale(table, keyed_cols, extra=""):
        parts = []
        for k in range(copies):
            shift = k * STRIDE
            cols = []
            desc = con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'").fetchall()
            for name, typ, *_ in desc:
                if name in keyed_cols:
                    cols.append(f"CAST({name} + {shift} AS {typ}) AS {name}")
                elif extra and name == extra.split(":")[0]:
                    cols.append(extra.split(":", 1)[1].format(k=k, shift=shift))
                else:
                    cols.append(name)
            parts.append(
                f"SELECT {', '.join(cols)} FROM '{src}/{table}.parquet'")
        q = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({q}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        match_source_schema(f"{src}/{table}.parquet", f"{dst}/{table}.parquet")
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    # Fixed dimensions: copy through.
    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                    f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        match_source_schema(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"{t}: copied")

    scale("customer", {"c_custkey"})
    scale("supplier", {"s_suppkey"})
    scale("part", {"p_partkey"})
    scale("orders", {"o_orderkey", "o_custkey"})
    scale("lineitem", {"l_orderkey", "l_partkey", "l_suppkey"})
    scale("events", {"event_id", "user_id"})
    scale("documents", {"doc_id"})
    # Embeddings: nudge the first component by a per-id epsilon so clone
    # copies never produce exact similarity ties (tie order is the one
    # thing Spark and DuckDB could legitimately disagree on).
    # The epsilon must use the SHIFTED id (the source column is pre-shift),
    # and the list must cast back to FLOAT[] to preserve the schema.
    scale("embeddings", {"vec_id"},
          extra="embedding:CAST(list_prepend("
                "embedding[1] + ((vec_id + {shift}) % 7919) * 1e-6, "
                "embedding[2:]) AS FLOAT[]) AS embedding")


if __name__ == "__main__":
    main()
