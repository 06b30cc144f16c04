#!/usr/bin/env bash
# Cross-process PRODUCT rehearsal: every CLI flow driven end-to-end from
# out-of-tree JVMs against the packaged jar — the operability story the
# in-JVM specs cannot show. Each leg asserts on real stdout; any failed
# assertion exits non-zero. ~4 min on a quiet box.
#
#   1. log lifecycle: produce → consume → export → restore → consume
#   2. corpus: build → report → explain (dropped/packed/unknown) →
#      incremental append (union counts) → report
#   3. ANN index: build → append → delete → recentre
#   4. streaming analytics: produce events → stream-topk → stream-funnel
#      → stream-anomaly (finalized daily table + z-report)
#      → stream-flow (finalized transition pairs + matrix readout)
#      → stream-pca-drift (incremental PCA, resumed across processes)
#   5. cluster: serve-grpc hub (--ttl --phi) + heartbeating follower →
#      SIGKILL → follower evicted from GetServers
#
# Usage: tools/drive_product.sh   (expects `sbt package` to be current)
set -euo pipefail
cd "$(dirname "$0")/.."

JAR=target/scala-2.13/proglogspark_2.13-0.1.0.jar
[ -f "$JAR" ] || { echo "missing $JAR — run: sbt package"; exit 2; }
CP="$JAR:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
D=$(mktemp -d /tmp/graft-drive.XXXXXX)
trap 'rm -rf "$D"' EXIT
g() { java $OPENS -Xmx4g -cp "$CP" graft.Main "$@" 2>/dev/null; }
expect() { # expect <needle> <<< output
  local needle="$1"; local out; out=$(cat)
  grep -qF "$needle" <<<"$out" || { echo "DRIVE FAIL: wanted '$needle' in:"; echo "$out"; exit 1; }
}

echo "=== [1/5] log lifecycle (produce → export → restore across JVMs)"
g --data-dir "$D/log" produce alpha beta gamma | expect "offset: 2"
g --data-dir "$D/log" export "$D/dump" >/dev/null
g --data-dir "$D/log2" restore "$D/dump" >/dev/null
g --data-dir "$D/log2" consume 1 | expect "value: beta"

echo "=== [2/5] corpus build → report → explain → incremental append"
g --data-dir "$D/s" build-corpus /root/testdata/sf0.001 "$D/corpus" --budget-tokens 5000 \
  | expect "committed corpus v=1"
g --data-dir "$D/s" corpus-report "$D/corpus" | expect "stage pack"
g --data-dir "$D/s" explain-doc "$D/corpus" 0 | expect "DROPPED at stage"
PACKED_ID=$(python3 - "$D" <<'EOF'
import sys, duckdb
print(duckdb.sql(f"select min(doc_id) from '{sys.argv[1]}/corpus/v=1/corpus/*/*.parquet'").fetchone()[0])
EOF
)
g --data-dir "$D/s" explain-doc "$D/corpus" "$PACKED_ID" | expect "PACKED"
g --data-dir "$D/s" explain-doc "$D/corpus" 999999 | expect "not in build"
python3 - "$D" <<'EOF'
import sys, pyarrow as pa, pyarrow.parquet as pq
d = sys.argv[1]
rows = [(100000+i, "en", f"src{i%3}", " ".join(f"fresh{i}w{j}" for j in range(40))) for i in range(30)]
pq.write_table(pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
  "lang": [r[1] for r in rows], "source": [r[2] for r in rows],
  "text": [r[3] for r in rows]}), f"{d}/delta.parquet")
EOF
g --data-dir "$D/s" append-corpus "$D/delta.parquet" "$D/corpus" --budget-tokens 5000 \
  | expect "stage input: docs=530"
g --data-dir "$D/s" corpus-report "$D/corpus" | expect "corpus v=2"
# Budget past the corpus mass: the committed build must carry the
# per-source repeat plan (corpus_epochs arithmetic) in stages.json, and
# corpus-report must read it back — epochs > 1 shows as capped repeats.
g --data-dir "$D/s" build-corpus /root/testdata/sf0.001 "$D/corpus-big" --budget-tokens 100000000 \
  | expect "capped=true"
g --data-dir "$D/s" corpus-report "$D/corpus-big" | expect "budget_tokens=100000000"
g --data-dir "$D/s" corpus-report "$D/corpus-big" | expect "capped=true"

echo "=== [3/5] ANN index build → append → delete → recentre"
g --data-dir "$D/s" index-ann /root/testdata/sf0.001 "$D/idx" | expect "built ann index v=1"
python3 - "$D" <<'EOF'
import sys, random, pyarrow as pa, pyarrow.parquet as pq
d = sys.argv[1]
rnd = random.Random(7)
pq.write_table(pa.table({
  "vec_id": pa.array([900000+i for i in range(5)], pa.int64()),
  "label": pa.array([i % 3 for i in range(5)], pa.int32()),
  "embedding": pa.array([[rnd.random() for _ in range(64)] for _ in range(5)],
                        pa.list_(pa.float32()))}), f"{d}/emb-delta.parquet")
pq.write_table(pa.table({"vec_id": pa.array([0,1,2], pa.int64())}), f"{d}/ids.parquet")
EOF
g --data-dir "$D/s" index-ann-append "$D/emb-delta.parquet" "$D/idx" \
  | expect "appended ann index delta v=2"
g --data-dir "$D/s" index-ann-delete "$D/ids.parquet" "$D/idx" | expect "tombstoned ann index delta v=3"
g --data-dir "$D/s" index-ann-recentre "$D/idx" | expect "recentred ann index into v=4"

echo "=== [4/5] streaming analytics: events → stream-topk → stream-funnel"
EVENTS=()
for i in 1 2 3 4 5; do EVENTS+=("{\"user_id\":7,\"ts\":\"2024-01-01 10:0$i:00\",\"event_type\":\"view\"}"); done
EVENTS+=('{"user_id":7,"ts":"2024-01-01 10:06:00","event_type":"click"}')
EVENTS+=('{"user_id":7,"ts":"2024-01-01 10:07:00","event_type":"purchase"}')
EVENTS+=('{"user_id":9,"ts":"2024-01-01 10:11:00","event_type":"view"}')
EVENTS+=("not json at all")
EVENTS+=('{"user_id":1,"ts":"2024-01-03 12:10:00","event_type":"view"}')
g --data-dir "$D/events" produce "${EVENTS[@]}" >/dev/null
g --data-dir "$D/s" stream-topk "$D/events" "$D/tkckpt" "$D/topk" --k 2 \
  | expect "rank 1: user 7"
g --data-dir "$D/s" stream-funnel "$D/events" "$D/fckpt" "$D/funnel" \
  | expect "stage 3_purchase: 1 users"
# The 2024-01-03 event pushes the watermark past 2024-01-01 midnight, so
# exactly one day (8 valid events; the bad-json row is skipped) finalizes;
# the z-report has no 7-day baseline yet — 0 scored is the correct readout.
g --data-dir "$D/s" stream-anomaly "$D/events" "$D/ackpt" "$D/daily" \
  | expect "1 finalized days at $D/daily, 0 scored, 0 anomalous"
# User 7's ordered day-1 chain (5 views, click, purchase) finalizes into 6
# transition pairs; the matrix readout is the shared q_event_flow math.
g --data-dir "$D/s" stream-flow "$D/events" "$D/fwckpt" "$D/flow" \
  | expect "click -> purchase: n=1 p=1.0"
# User 7's finalized purchase credits its last non-purchase touch (the
# 10:06 click); the producer's JSON carries no value, so cents = 0. The
# rollup is the shared q_attribution arithmetic.
g --data-dir "$D/s" stream-attribution "$D/events" "$D/atckpt" "$D/attr" \
  | expect "click: 1 conversions (0 cents, share 1.0)"
# User 7's 10:01-10:07 chain is one 360 s session (bucket 9) and user 9's
# lone view a 0 s session (bucket 1); user 1's session is still inside
# the watermark horizon. The histogram is the shared
# q_session_duration_hist bucketing.
g --data-dir "$D/s" stream-sessions "$D/events" "$D/ssckpt" "$D/sess" \
  | expect "2 finalized sessions at $D/sess, 2 buckets"
# Incremental PCA drift monitor (r12): the first pass commits one additive
# Gramian partition + readout; the resumed pass in a NEW process merges
# the new vector without recomputing history, and the readout is bit-exact
# to batch vec_pca over the union (StreamingPcaSpec proves the equality;
# here the fixed-point values pin it cross-process).
g --data-dir "$D/emb" produce '{"vec_id":0,"embedding":[0.5,-0.25,0.125,1.0]}' \
  '{"vec_id":1,"embedding":[-0.5,0.75,0.0,0.25]}' \
  '{"vec_id":2,"embedding":[0.1,0.9,-0.3,0.6]}' >/dev/null
g --data-dir "$D/s" stream-pca-drift "$D/emb" "$D/pdckpt" "$D/pdrift" \
  | expect "top component dim 1 (|loading| 1.0), ev_share 0.846862"
g --data-dir "$D/emb" produce '{"vec_id":3,"embedding":[0.8,0.1,0.4,-0.9]}' >/dev/null
g --data-dir "$D/s" stream-pca-drift "$D/emb" "$D/pdckpt" "$D/pdrift" \
  | expect "top component dim 3 (|loading| 1.0), ev_share 0.584606"
# The one-command dashboard over a testdata events table: every section is
# an oracle-checked query from SparkEntry.queries.
g --data-dir "$D/s" events-report /root/testdata/sf0.001 \
  | expect "1_view: 15 users (conversion 1.0)"
# The commerce twin over the TPC-H-ish tables: same contract, every
# section an oracle-checked query.
g --data-dir "$D/s" sales-report /root/testdata/sf0.001 \
  | expect "AFRICA: 59507966.02 (1208 items)"
# The embedding-QA twin: corpus shape, fixed-point PCA, cluster quality,
# per-label outliers — same oracle-checked contract.
g --data-dir "$D/s" embedding-report /root/testdata/sf0.001 \
  | expect "500 vectors, dim=64"
# The corpus-QA twin: triage, lang confusion, Zipf health, readability,
# length shape, cross-source duplication — the fourth dashboard.
g --data-dir "$D/s" text-report /root/testdata/sf0.001 \
  | expect "src0: 25 docs, dup 0.0"
# The media-QA twin: blob shape, exact-dup collapse, perceptual pairs.
g --data-dir "$D/s" media-report /root/testdata/sf0.001 \
  | expect "500 blobs collapse to 500 distinct contents"
# Resumable epoch stream (stream-repeat): two pages in one process, resume
# in a SECOND process, drain; the committed chunks must reproduce the
# corpus_repeat_apply expansion exactly (duckdb recomputes the multiset
# from the raw documents table and compares counts + a content checksum).
g --data-dir "$D/s" stream-repeat /root/testdata/sf0.001 "$D/repeat" --page-docs 700 --max-pages 2 \
  | expect "paused after 2 pages"
g --data-dir "$D/s" stream-repeat /root/testdata/sf0.001 "$D/repeat" \
  | expect "resuming after committed chunk 1"
g --data-dir "$D/s" stream-repeat /root/testdata/sf0.001 "$D/repeat" \
  | expect "stream drained"
python3 - "$D" <<'EOF'
import sys, duckdb
d = sys.argv[1]
con = duckdb.connect()
got = con.sql(f"""
  SELECT count(*) AS n, CAST(sum(hash(doc_id::VARCHAR || '|' || source || '|' || epoch)
                               % 1000000007) AS BIGINT) AS cks
  FROM read_parquet('{d}/repeat/chunk-*/*.parquet')""").fetchone()
ref = con.sql("""
  WITH docs AS (
    SELECT doc_id, source,
           CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tokens,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 32 AS bucket,
           md5(CAST(doc_id AS VARCHAR)) AS h
    FROM read_parquet('/root/testdata/sf0.001/documents.parquet')),
  per_src AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS mass FROM docs GROUP BY source),
  pw AS (SELECT source, mass,
                CAST(CAST(round(pow(CAST(mass AS DOUBLE), 0.7), 6) AS DECIMAL(28,6))
                     * 1000000 AS BIGINT) AS pw_int FROM per_src),
  tot AS (SELECT sum(pw_int) AS tot_pw, sum(mass) AS tot_mass FROM pw),
  planx AS (
    SELECT source, CAST(least(tgt, mass * 4) // mass AS BIGINT) AS fullep,
           CAST(least(tgt, mass * 4) % mass AS BIGINT) AS rem
    FROM (SELECT source, mass,
                 CAST((pw_int::HUGEINT * (3 * tot_mass)) // tot_pw AS BIGINT) AS tgt
          FROM pw CROSS JOIN tot)),
  fullrows AS (
    SELECT d.doc_id, d.source, CAST(unnest(generate_series(0, p.fullep - 1)) AS BIGINT) AS epoch
    FROM docs d JOIN planx p USING (source) WHERE p.fullep > 0),
  bp AS (SELECT source, bucket,
                coalesce(sum(sum(n_tokens)) OVER (PARTITION BY source ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bpre
         FROM docs GROUP BY source, bucket),
  partrows AS (
    SELECT d.doc_id, d.source, p.fullep AS epoch
    FROM (SELECT d0.doc_id, d0.source,
                 bp.bpre + coalesce(sum(d0.n_tokens) OVER (
                   PARTITION BY d0.source, d0.bucket ORDER BY d0.h, d0.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
          FROM docs d0 JOIN bp ON d0.source = bp.source AND d0.bucket = bp.bucket) d
    JOIN planx p USING (source) WHERE d.before < p.rem)
  SELECT count(*) AS n, CAST(sum(hash(doc_id::VARCHAR || '|' || source || '|' || epoch)
                               % 1000000007) AS BIGINT) AS cks
  FROM (SELECT * FROM fullrows UNION ALL SELECT * FROM partrows)""").fetchone()
assert got == ref, f"DRIVE FAIL: stream-repeat chunks {got} != batch expansion {ref}"
print(f"stream-repeat multiset verified: {got[0]} rows, checksum match")
EOF

echo "=== [5/5] cluster: phi accrual evicts a SIGKILLed heartbeating follower"
java $OPENS -Xmx3g -cp "$CP" graft.Main --data-dir "$D/hub" --ttl 2 --phi 8 serve-grpc 8931 \
  > "$D/hub.log" 2>&1 &
HUB=$!
sleep 12
java $OPENS -Xmx3g -cp "$CP" graft.Main --data-dir "$D/f1" --follower --join localhost:8931 \
  --name f1 serve-grpc 8932 > "$D/f1.log" 2>&1 &
F1=$!
sleep 14
g --bootstrap localhost:8931 servers | expect "id: f1"
kill -9 $F1
sleep 5
if g --bootstrap localhost:8931 servers | grep -q "id: f1"; then
  echo "DRIVE FAIL: SIGKILLed follower still in GetServers"; kill -9 $HUB; exit 1
fi
kill -9 $HUB 2>/dev/null || true

echo "PRODUCT DRIVE: all green"
