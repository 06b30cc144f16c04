#!/usr/bin/env python3
"""Build a REALISTIC-VOCABULARY soak corpus: same directory layout and
schemas as a driver testdata dir, but documents.parquet is regenerated with
a ~50k-word Zipf(1.1) vocabulary instead of the synthetic 31 words.

Why: every driver corpus has the 31-word vocabulary, so the DuckDB oracle
only ever exercises the token-set queries' degenerate-universe branch
(<=512 distinct words -> bitmap triangle join). A Zipf 50k vocabulary
pushes dedup_jaccard/dedup_clusters onto the PPJoin prefix-filtering path
at data scale, with the SAME oracle SQL judging the result — any
vocab-scale constant breaks loudly.

Corpus shape (seeded, deterministic):
  - N base documents, lengths 20-120 words, 5 langs, Zipf-sampled words.
  - ~15% exact clones (same text, new doc_id) — exercises set collapse.
  - ~15% near-dups: a base doc with a few words substituted — populates
    the J >= 0.6 pair/cluster outputs beyond clone-trivial pairs.
Non-document tables are hard-copied from SRC so the relational queries
keep working against the same directory.

Usage: python3 tools/make_zipf_corpus.py SRC_DIR DST_DIR [N_DOCS] [SEED] [N_WORDS]

N_WORDS (default 50_000) sets the vocabulary size. Growing it with N_DOCS
(Heaps-law-ish) keeps per-token document frequency — and therefore
prefix-filter/band candidate density — comparable across soak scales; a
FIXED vocabulary under growing N instead stresses densification (candidate
sets grow ~quadratically while outputs stay linear — a legitimate but
different adversary, see SCALE.md's 150k notes).
"""
import os
import random
import shutil
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def zipf_vocab(n_words):
    # Deterministic pronounceable-ish tokens: w<index> keeps tokens unique
    # and non-colliding under concatenation checks; lengths vary so the
    # byte-length-sensitive queries (n_chars, quality ratios) see spread.
    return [f"w{i:05d}" for i in range(n_words)]


def zipf_weights(n, s=1.1):
    return [1.0 / ((i + 1) ** s) for i in range(n)]


def main():
    src, dst = sys.argv[1], sys.argv[2]
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 5000
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 20260813
    n_words = int(sys.argv[5]) if len(sys.argv) > 5 else 50_000
    os.makedirs(dst, exist_ok=True)

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"):
        p = os.path.join(src, f"{t}.parquet")
        if os.path.exists(p):
            shutil.copyfile(p, os.path.join(dst, f"{t}.parquet"))

    rnd = random.Random(seed)
    vocab = zipf_vocab(n_words)
    weights = zipf_weights(len(vocab))
    # Precompute the cumulative weights ONCE: random.choices(weights=...)
    # rebuilds this O(|vocab|) prefix sum on EVERY call, which turns the
    # 500k-doc Heaps-scaled leg into hours of pure accumulation. Passing
    # cum_weights uses the identical bisect-over-random() path, so the
    # sampled sequence — and every previously generated corpus — is
    # byte-identical for a given seed.
    from itertools import accumulate
    cum = list(accumulate(weights))
    langs = ["en", "zh", "es", "fr", "de"]

    n_base = int(n_docs * 0.70)
    docs = []  # (text, lang)
    for _ in range(n_base):
        n = rnd.randint(20, 120)
        words = rnd.choices(vocab, cum_weights=cum, k=n)
        docs.append((" ".join(words), rnd.choice(langs)))
    # Exact clones of random base docs (same lang — cross-lang twins are
    # NOT duplicates under the lang-scoped queries, keep a few anyway).
    while len(docs) < int(n_docs * 0.85):
        t, lang = docs[rnd.randrange(n_base)]
        docs.append((t, lang if rnd.random() < 0.9 else rnd.choice(langs)))
    # Near-dups: substitute a small fraction of words.
    while len(docs) < n_docs:
        t, lang = docs[rnd.randrange(n_base)]
        words = t.split(" ")
        k = max(1, len(words) // rnd.choice([8, 10, 12]))
        for _ in range(k):
            words[rnd.randrange(len(words))] = rnd.choices(vocab, cum_weights=cum, k=1)[0]
        docs.append((" ".join(words), lang))

    rnd.shuffle(docs)
    want = pq.read_schema(os.path.join(src, "documents.parquet"))
    table = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array([t for t, _ in docs], type=pa.string()),
            "lang": pa.array([l for _, l in docs], type=pa.string()),
            "source": pa.array([f"src{i % 7}" for i in range(len(docs))], type=pa.string()),
            "n_chars": pa.array([len(t) for t, _ in docs], type=pa.int64()),
        }
    )
    # Bounded row groups (r15): pyarrow's default is 1M-row groups, which
    # made every soak corpus a 1-2 row-group file — and Spark assigns a
    # task per ROW GROUP, so all scan-side map work (winnow hashing, token
    # explode, signature compute) collapsed to 1-2 threads no matter the
    # split size. The r14 "winnow 1.5M straggler" was THIS, not a dense
    # reduce key. 8192-row groups ~ a few MB each: full scan parallelism
    # at every leg, matching how real multi-file corpora split at 100 TB.
    pq.write_table(table.cast(want), os.path.join(dst, "documents.parquet"),
                   row_group_size=8192)

    con = duckdb.connect()
    stats = con.sql(
        f"""SELECT count(*),
                   (SELECT count(DISTINCT word) FROM (
                        SELECT unnest(string_split(lower(trim(text)), ' ')) AS word
                        FROM '{dst}/documents.parquet')),
                   count(DISTINCT text)
            FROM '{dst}/documents.parquet'"""
    ).fetchone()
    print(f"documents: {stats[0]} rows, {stats[1]} distinct words, {stats[2]} distinct texts")


if __name__ == "__main__":
    main()
