#!/usr/bin/env python3
"""Sharded DuckDB oracle for dedup_jaccard at scales past a single
oracle run's memory/spill capacity (the measured r12 boundary: the 500k-doc
leg exceeded a 60 GB spill cap, and a 90 GB-memory + 70 GB-spill retry
exhausted too, which left the leg guarded by a content-blind row-count pin).

Two phases, both derived from SparkEntry.oracleSql["dedup_jaccard"] (the
r11 prefix+length-filtered list-probe formulation):

  1. PREP (once): the corpus-linear tables — set-collapse doc→rep map,
     rep-level distinct tokens, set sizes, rare-first prefixes, per-rep
     token lists — materialize to parquet under a scratch dir. This is the
     cheap linear work; repeating it per shard would multiply total time
     by the shard count for no memory benefit.
  2. SHARDS (S runs, fresh connection each): the candidate join + exact
     intersections + expansion with `a.doc_id % S = s` pushed into the
     candidate join's LEFT side. Every admitted pair (d1, d2) has d1 < d2
     and d1 a set-group representative, so the predicate partitions the
     cross-group pair set EXACTLY by d1's residue — the union over shards
     is the full pair multiset, disjoint, and the candidate/intersection
     working set (the memory hog) shrinks ~1/S per run. Within-group clone
     pairs (J = 1 by construction) are emitted by shard 0 only.

Verdict = the same multiset check check_correctness.py applies above
MAX_COMPARE_ROWS: row count plus an order-independent sum of per-row
hashes over the name-sorted columns, engine dump vs the shard-summed
oracle. Content-exact — a regression that emits the right number of wrong
pairs fails here.

Usage: [ORACLE_MEM=48GB] [ORACLE_SPILL=40GB] [PREP_DIR=/tmp/jacc_prep] \
  python3 tools/check_jaccard_sharded.py <sfDir> <dumpDir> [shards=4]
"""
import sys, os, glob, time, shutil
import duckdb

sf_dir = sys.argv[1]
dump_dir = sys.argv[2]
shards = int(sys.argv[3]) if len(sys.argv) > 3 else 4
prep_dir = os.environ.get("PREP_DIR", "/tmp/jaccard_shard_prep")

# Each artifact is ONE standalone COPY query reading only parquet (the
# docs or an artifact already written): no temp tables — an in-memory
# DuckDB cannot offload TABLE data, only operator intermediates, so the
# temp-table formulation hit a hard memory wall at 500k while every
# operator here (window sort, joins, aggs) spills fine.
PREP_STEPS = [
    ("w", """
      SELECT DISTINCT doc_id, lang, word FROM (
        SELECT doc_id, lang, unnest(string_split(lower(trim(text)), ' ')) AS word
        FROM read_parquet('{docs}'))"""),
    ("k", """
      SELECT doc_id, lang, string_agg(word, chr(1) ORDER BY word) AS set_key
      FROM read_parquet('{prep}/w.parquet') GROUP BY doc_id, lang"""),
    ("grp", """
      SELECT lang, set_key, min(doc_id) AS rep
      FROM read_parquet('{prep}/k.parquet') GROUP BY lang, set_key"""),
    ("docrep", """
      SELECT k.doc_id, g.rep
      FROM read_parquet('{prep}/k.parquet') k
      JOIN read_parquet('{prep}/grp.parquet') g
        ON g.lang = k.lang AND g.set_key = k.set_key"""),
    ("rw", """
      SELECT g.rep AS doc_id, g.lang, w.word
      FROM read_parquet('{prep}/grp.parquet') g
      JOIN read_parquet('{prep}/w.parquet') w
        ON w.doc_id = g.rep AND w.lang = g.lang"""),
    ("sz", """
      SELECT doc_id, count(*) AS sz
      FROM read_parquet('{prep}/rw.parquet') GROUP BY doc_id"""),
    ("jlists", """
      SELECT doc_id, list(word ORDER BY word) AS ws
      FROM read_parquet('{prep}/rw.parquet') GROUP BY doc_id"""),
    ("jpref", """
      WITH dfreq AS (
        SELECT lang, word, count(*) AS df
        FROM read_parquet('{prep}/rw.parquet') GROUP BY lang, word),
      sz AS (
        SELECT doc_id, count(*) AS sz
        FROM read_parquet('{prep}/rw.parquet') GROUP BY doc_id),
      ordw AS (
        SELECT rw.doc_id, rw.lang, rw.word,
               row_number() OVER (PARTITION BY rw.doc_id
                                  ORDER BY dfreq.df, rw.word) AS rk
        FROM read_parquet('{prep}/rw.parquet') rw
        JOIN dfreq ON rw.lang = dfreq.lang AND rw.word = dfreq.word)
      SELECT o.doc_id, o.lang, o.word, sz.sz
      FROM ordw o JOIN sz ON o.doc_id = sz.doc_id
      WHERE o.rk <= sz.sz - CAST(ceil(0.6 * sz.sz) AS BIGINT) + 1"""),
]

SHARD_SQL = """
WITH jcand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM read_parquet('{prep}/jpref.parquet') a
  JOIN read_parquet('{prep}/jpref.parquet') b
    ON a.word = b.word AND a.lang = b.lang AND a.doc_id < b.doc_id
   AND b.sz * 10 >= a.sz * 6 AND a.sz * 10 >= b.sz * 6
   AND a.doc_id % {shards} = {shard}),
p AS MATERIALIZED (
  SELECT c.d1, c.d2, CAST(len(list_intersect(l1.ws, l2.ws)) AS BIGINT) AS inter
  FROM jcand c
  JOIN read_parquet('{prep}/jlists.parquet') l1 ON c.d1 = l1.doc_id
  JOIN read_parquet('{prep}/jlists.parquet') l2 ON c.d2 = l2.doc_id),
reppairs AS MATERIALIZED (
  SELECT d1, d2, CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS jaccard
  FROM p
  JOIN read_parquet('{prep}/sz.parquet') s1 ON d1 = s1.doc_id
  JOIN read_parquet('{prep}/sz.parquet') s2 ON d2 = s2.doc_id
  WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.6),
cross_pairs AS (
  SELECT least(da.doc_id, db.doc_id) AS d1,
         greatest(da.doc_id, db.doc_id) AS d2, r.jaccard
  FROM reppairs r
  JOIN read_parquet('{prep}/docrep.parquet') da ON da.rep = r.d1
  JOIN read_parquet('{prep}/docrep.parquet') db ON db.rep = r.d2),
within_pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(1.0 AS DOUBLE) AS jaccard
  FROM read_parquet('{prep}/docrep.parquet') a
  JOIN read_parquet('{prep}/docrep.parquet') b
    ON a.rep = b.rep AND a.doc_id < b.doc_id
  WHERE {shard} = 0)
SELECT count(*) AS n, sum(hash(d1, d2, jaccard)) AS h FROM (
  SELECT d1, d2, jaccard FROM cross_pairs
  UNION ALL
  SELECT d1, d2, jaccard FROM within_pairs) _all
"""


def fresh_con():
    # One connection PER PHASE: DuckDB frees buffer-pool and temp state
    # with the connection, so phase peaks never stack.
    con = duckdb.connect()
    con.sql(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '48GB')}'")
    con.sql("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.sql(f"SET max_temp_directory_size='{os.environ.get('ORACLE_SPILL', '40GB')}'")
    return con


files = sorted(glob.glob(f"{dump_dir}/dedup_jaccard/*.parquet"))
if not files:
    print(f"FAIL: no dump at {dump_dir}/dedup_jaccard")
    sys.exit(1)
filelist = ", ".join(f"'{f}'" for f in files)
con = fresh_con()
mine_n, mine_h = con.sql(
    f"SELECT count(*), sum(hash(d1, d2, jaccard)) FROM read_parquet([{filelist}])"
).fetchone()
con.close()
print(f"engine dump: {mine_n} rows, multiset hash {mine_h}", flush=True)

docs = f"{sf_dir}/documents.parquet"
if os.path.isdir(docs):
    docs = f"{docs}/*.parquet"
shutil.rmtree(prep_dir, ignore_errors=True)
os.makedirs(prep_dir, exist_ok=True)
t0 = time.time()
for name, q in PREP_STEPS:
    tq = time.time()
    con = fresh_con()
    con.sql(
        f"COPY ({q.format(docs=docs, prep=prep_dir)}) "
        f"TO '{prep_dir}/{name}.parquet' (FORMAT PARQUET)"
    )
    con.close()
    print(f"prep {name}: {time.time() - tq:.0f}s", flush=True)
print(f"prep tables materialized in {time.time() - t0:.0f}s", flush=True)

total_n, total_h = 0, 0
for s in range(shards):
    t0 = time.time()
    con = fresh_con()
    n, h = con.sql(SHARD_SQL.format(prep=prep_dir, shards=shards, shard=s)).fetchone()
    con.close()
    n = int(n or 0)
    h = int(h or 0)
    total_n += n
    total_h += h
    print(f"shard {s + 1}/{shards}: {n} rows in {time.time() - t0:.0f}s", flush=True)
shutil.rmtree(prep_dir, ignore_errors=True)

print(f"oracle (sharded x{shards}): {total_n} rows, multiset hash {total_h}")
if (int(mine_n), int(mine_h)) == (total_n, total_h):
    print(f"OK-AGG-SHARDED ({total_n} rows; multiset hash match across {shards} shards)")
else:
    print(f"FAIL: engine ({mine_n}, {mine_h}) != oracle ({total_n}, {total_h})")
    sys.exit(1)
