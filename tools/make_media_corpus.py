#!/usr/bin/env python3
"""Synthesize a documents table for the MEDIA pair-family decade soak.

The media_* queries synthesize their PNG blobs deterministically from
doc_id alone (Multimodal.familyPng: doc_id//4 = family, doc_id%4 =
perturbation), so a media soak corpus is just a doc_id range with the
standard documents schema. N ids = N images = N/4 near-dup families;
the DuckDB oracle recomputes every aHash bit from the same generation
arithmetic, so the pair set hash-compares exactly at any N.

Usage: make_media_corpus.py DST N     (writes DST/documents.parquet)
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq

dst, n = sys.argv[1], int(sys.argv[2])
ids = list(range(n))
table = pa.table(
    {
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([f"media placeholder {i}" for i in ids], pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array([f"cam{i % 8}" for i in ids], pa.string()),
        "n_chars": pa.array([len(f"media placeholder {i}") for i in ids], pa.int64()),
    }
)
import os

os.makedirs(dst, exist_ok=True)
pq.write_table(table, f"{dst}/documents.parquet", row_group_size=8192)  # see make_zipf_corpus: 1 row group = 1 scan task
print(f"wrote {n} media doc ids to {dst}/documents.parquet")
