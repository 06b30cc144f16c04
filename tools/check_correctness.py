#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle_sql in
DuckDB over the testdata tables and compare against the Verify parquet dumps
(columns sorted by name, rows sorted, exact value equality)."""
import sys, os, json, glob, threading
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify-out"
# Optional per-query oracle timeout (seconds) for soak scales where a
# DuckDB formulation (e.g. the 31-word-vocab token self-join) explodes:
# the query is interrupted and reported ORACLE-TIMEOUT, not hung forever.
oracle_timeout = float(os.environ.get("ORACLE_TIMEOUT_SEC", "0")) or None

con = duckdb.connect()
# Cap DuckDB's memory so a pathological oracle plan at soak scale SPILLS to
# disk instead of getting the whole process OOM-killed (observed at sf1:
# the kernel killed the run before any report line flushed). Overridable:
# ORACLE_MEM=64GB.
con.sql(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '48GB')}'")
con.sql("SET temp_directory='/tmp/duckdb_oracle_spill'")
# Bound the spill too (r10 lesson: the 50k-doc containment oracle wrote
# ~77 GB of temp and filled the DISK, failing an unrelated concurrent
# build with ENOSPC). Over budget, the one oracle errors gracefully into
# an ORACLE-ERROR row instead of taking down the box.
con.sql(f"SET max_temp_directory_size='{os.environ.get('ORACLE_SPILL', '40GB')}'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # Soak corpora may carry only the tables their leg queries (e.g. the
    # media decade ships documents alone); a query against a missing view
    # then fails ITS row, not the whole run.
    if os.path.exists(f"{sf_dir}/{t}.parquet"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# Verify writes per-query exception text here; absence of a dump must be a
# loud failing row, not a silently shorter report (round-5 lesson: 16
# queries threw at analysis time and simply vanished from the artifact).
fail_path = f"{out_dir}/_failures.json"
failures = json.load(open(fail_path)) if os.path.exists(fail_path) else {}
results = {}
def record(name, verdict):
    # Stream per-query progress to stderr immediately: the report proper
    # prints at the end, so without this a mid-run kill (OOM, timeout)
    # loses every already-computed verdict.
    results[name] = verdict
    print(f"[{len(results)}] {name}: {verdict[:80]}", file=sys.stderr, flush=True)
# ONLY=a,b,c restricts the report to those queries (matches Verify's
# third-arg filter for local iteration); a full run flags every oracle
# entry that produced no dump at all.
only = set(os.environ["ONLY"].split(",")) if os.environ.get("ONLY") else None
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}
for name in sorted(set(oracle) - set(os.listdir(out_dir))):
    record(name, "MISSING-DUMP: " + failures.get(name, "no dump dir and no recorded exception"))
for name in sorted(os.listdir(out_dir)):
    p = os.path.join(out_dir, name)
    if not os.path.isdir(p) or (only and name not in only):
        continue
    files = glob.glob(f"{p}/*.parquet")
    if not files:
        record(name, "NO-OUTPUT: " + failures.get(name, "empty dump dir"))
        continue
    # Soak guard: a degenerate-corpus pair query can emit 10^8+ rows —
    # far past what a pandas frame compare can hold. Instead of loading,
    # verify the multiset equality with streaming aggregates in DuckDB:
    # row count plus an order-independent sum of per-row hashes over the
    # name-sorted columns, computed identically over the dump parquet and
    # the oracle SQL. Falls back to rows-only when there is no oracle or
    # the oracle itself cannot finish.
    nrows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    if nrows > int(os.environ.get("MAX_COMPARE_ROWS", "20000000")):
        if name not in oracle:
            record(name, f"rows-only ({nrows} rows; above MAX_COMPARE_ROWS)")
            continue
        cols = sorted(pq.ParquetFile(files[0]).schema_arrow.names)
        collist = ", ".join(f'"{c}"' for c in cols)
        filelist = ", ".join(f"'{f}'" for f in files)
        try:
            mine_agg = con.sql(
                f"SELECT count(*), sum(hash({collist})) FROM read_parquet([{filelist}])"
            ).fetchone()
            q = f"SELECT count(*), sum(hash({collist})) FROM ({oracle[name]}) _agg"
            if oracle_timeout:
                timer = threading.Timer(oracle_timeout, con.interrupt)
                timer.start()
                try:
                    ref_agg = con.sql(q).fetchone()
                finally:
                    timer.cancel()
            else:
                ref_agg = con.sql(q).fetchone()
        except duckdb.InterruptException:
            record(name, f"rows-only ({nrows} rows; oracle agg > {oracle_timeout:.0f}s)")
            continue
        except Exception as e:
            record(name, f"ORACLE-ERROR: {str(e)[:120]}")
            continue
        if mine_agg == ref_agg:
            record(name, f"OK-AGG ({nrows} rows; multiset hash match)")
        elif mine_agg[0] != ref_agg[0]:
            record(name, f"ROWCOUNT: mine={mine_agg[0]} ref={ref_agg[0]}")
        else:
            record(name, f"VALUES-AGG: count={nrows} but multiset hash differs ({mine_agg[1]} vs {ref_agg[1]})")
        continue
    # date_as_object=False: a DATE column must land as datetime64 like the
    # DuckDB side, not as python date objects (a pandas representation
    # artifact, not an engine type difference).
    mine = pq.read_table(p).to_pandas(date_as_object=False)  # directory read: all part files
    if name not in oracle:
        record(name, f"rows-only ({len(mine)} rows)")
        continue
    try:
        if oracle_timeout:
            timer = threading.Timer(oracle_timeout, con.interrupt)
            timer.start()
            try:
                ref = con.sql(oracle[name]).df()
            finally:
                timer.cancel()
        else:
            ref = con.sql(oracle[name]).df()
    except duckdb.InterruptException:
        record(name, f"ORACLE-TIMEOUT (> {oracle_timeout:.0f}s; spark rows={len(mine)})")
        continue
    except Exception as e:
        record(name, f"ORACLE-ERROR: {str(e)[:120]}")
        continue
    mine = mine.reindex(sorted(mine.columns), axis=1)
    ref = ref.reindex(sorted(ref.columns), axis=1)
    # Canonicalize WITHIN type families, losslessly, on both sides:
    # integer widths -> int64, datetime64[any unit] -> datetime64[ns].
    # The driver's typed hash tolerates exactly these (r9 evidence:
    # int32-vs-int64 q_ltv_cohorts and ns-vs-us q_time_bucket were
    # driver-green) while failing CROSS-family diffs (int64-vs-float64
    # corpus_epochs/text_entropy were driver-red). After this, any
    # remaining dtype difference is a FAILING verdict — local OK implies
    # driver OK.
    def canon(df):
        for c in df.columns:
            k = df[c].dtype.kind
            if k in "iu" and str(df[c].dtype) != "int64":
                # uint values above int64.max would WRAP silently under
                # astype (masking a real diff / manufacturing a fake one);
                # fail loudly instead — int64 canonicalization must be
                # lossless or not happen at all.
                if k == "u" and len(df) and int(df[c].max()) > 2**63 - 1:
                    raise ValueError(
                        f"column {c}: uint value {df[c].max()} exceeds int64 range")
                df[c] = df[c].astype("int64")
            elif k == "M" and str(df[c].dtype) != "datetime64[ns]":
                df[c] = df[c].astype("datetime64[ns]")
        return df
    try:
        mine, ref = canon(mine), canon(ref)
    except ValueError as e:
        record(name, f"CANON-ERROR: {e}")
        continue
    if list(mine.columns) != list(ref.columns):
        record(name, f"SCHEMA-NAMES: mine={list(mine.columns)} ref={list(ref.columns)}")
        continue
    if len(mine) != len(ref):
        record(name, f"ROWCOUNT: mine={len(mine)} ref={len(ref)}")
        continue
    ms = mine.sort_values(list(mine.columns)).reset_index(drop=True)
    rs = ref.sort_values(list(ref.columns)).reset_index(drop=True)
    mismatch = []
    for c in ms.columns:
        a, b = ms[c], rs[c]
        try:
            eq = (a == b) | (a.isna() & b.isna())
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.all():
            i = int((~eq).idxmax())
            mismatch.append(f"{c}[{i}]: {a[i]!r} vs {b[i]!r} (dtype {a.dtype}/{b.dtype})")
    if mismatch:
        record(name, "VALUES: " + "; ".join(mismatch[:3]))
    else:
        # Dtype-STRICT (round-10): the driver hashes typed values, so a
        # value-equal frame with a dtype mismatch (e.g. DuckDB HUGEINT
        # sum() surfacing as float64 against Spark's int64) still fails
        # the driver gate. Local OK must imply driver OK — any dtype
        # difference is therefore a FAILING verdict here, not a footnote
        # (this exact leniency shipped corpus_epochs/text_entropy red in
        # r9 while the local gate read 175/175).
        dt = [f"{c}:{ms[c].dtype}!={rs[c].dtype}" for c in ms.columns if ms[c].dtype != rs[c].dtype]
        if dt:
            record(name, f"DTYPE: values equal but dtypes differ {dt}")
        else:
            record(name, f"OK ({len(mine)} rows)")

agg = sum(1 for v in results.values() if v.startswith("OK-AGG"))
ok = sum(1 for v in results.values() if v.startswith("OK")) - agg
ro = sum(1 for v in results.values() if v.startswith("rows-only"))
to = sum(1 for v in results.values() if v.startswith("ORACLE-TIMEOUT"))
for k, v in sorted(results.items()):
    flag = "  " if v.startswith(("OK", "rows-only", "ORACLE-TIMEOUT")) else "✗ "
    print(f"{flag}{k}: {v}")
print(f"\n{ok} exact-match, {agg} agg-verified, {ro} rows-only, {to} oracle-timeout, "
      f"{len(results) - ok - agg - ro - to} FAILING of {len(results)}")
