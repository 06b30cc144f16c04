#!/usr/bin/env bash
# One-command local rehearsal of everything the driver's round gate checks:
#   1. sbt test            (unit/property/plan/soak specs)
#   2. Verify + DuckDB compare at sf0.001 AND sf0.01 (the correctness gate)
#   3. Bench at sf0.1      (the perf gate; fails loud on any broken query)
# Run from the repo root before ending a round. ~15 min on a quiet box.
#
# --soak additionally gates the sf1 scale story (another ~10-15 min):
# regenerates tmp/sf1 (10x sf0.1) if absent, runs the heavy-pair and
# events-family representatives through Verify there, and hash-compares
# against the DuckDB oracle — so a scale regression (e.g. a broken
# repartition pin changing pair-join results, or a shuffle-width change
# breaking determinism contracts) FAILS the gate instead of waiting for
# a judge's eye. Queries chosen to cover the three riskiest shapes:
# connected components (dedup_clusters), the pair-join strategy switch
# (dedup_ngram_jaccard), sessionization windows (q_sessionize), span
# stitching (dedup_substring), the persisted-index probe
# (knn_ivf_indexed), the salted semantic pair join (dedup_semantic), and
# the checkpointed model-fit/score splits (corpus_lm_quality,
# corpus_dsir_weights), the cell-keyed bitext candidate pipeline at 20k
# embeddings (corpus_bitext_mine), and the WindowGroupLimit heavy-hitter
# readout at 1M events (q_heavy_hitters). dedup_containment is
# deliberately NOT here: the
# 31-word sf1 universe makes its output containment-dense (~1e9 pairs);
# its scale evidence is the Zipf soak (tools/make_zipf_corpus.py, 15k
# docs / 39k vocab, exact) where the prefix filter actually prunes.
set -euo pipefail
cd "$(dirname "$0")/.."

SOAK=0
for arg in "$@"; do
  case "$arg" in
    --soak) SOAK=1 ;;
    *) echo "unknown arg: $arg (supported: --soak)"; exit 2 ;;
  esac
done

echo "=== [0/4] gate-tool self-tests (check_correctness / check_bench)"
# The two Python gates are load-bearing for every verdict below; test THEM
# first so a broken gate fails loudly instead of silently passing a red run.
python3 tools/test_check_tools.py

echo "=== [1/4] sbt test"
sbt -batch test

for sf in sf0.001 sf0.01; do
  out="/tmp/round-gate-$sf"
  echo "=== [2/4] Verify + oracle compare @ $sf"
  sbt -batch "runMain graft.Verify /root/testdata/$sf $out"
  # Run the oracle suite ONCE, keep the full report, then check the summary
  # (re-running it just to grep doubled gate time).
  report="/tmp/round-gate-$sf.report"
  python3 tools/check_correctness.py "/root/testdata/$sf" "$out" | tee "$report" | tail -3
  grep -q " 0 FAILING" "$report" || { echo "FAILING rows at $sf"; exit 1; }
done

echo "=== [3/4] Bench @ sf0.1 (exits non-zero if any headline query breaks or regresses past 2x its pin)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" | tee /tmp/round-gate-bench.out
python3 tools/check_bench.py /tmp/round-gate-bench.out

if [ "$SOAK" = "1" ]; then
  echo "=== [soak] Zipf realistic-vocabulary gate (PPJoin prefix path)"
  # The sf corpora only ever exercise the degenerate-universe branch
  # (31-word vocab -> bitmap triangle); this leg regenerates a 5k-doc
  # Zipf(1.1) ~25k-word corpus and hash-compares the pair-join family
  # against the SAME DuckDB oracles — the prefix-filter path breaking on a
  # realistic vocabulary fails the gate instead of waiting for a judge.
  if [ ! -d tmp/zipf-gate ]; then
    echo "--- regenerating tmp/zipf-gate (5k docs, Zipf vocab)"
    python3 tools/make_zipf_corpus.py /root/testdata/sf0.1 tmp/zipf-gate 5000
  fi
  ZIPF_QUERIES="corpus_quality_calibration,corpus_repeat_apply,dedup_jaccard,dedup_containment,dedup_clusters,corpus_decontaminate_near,corpus_chunk,corpus_source_triage,text_entropy,corpus_novelty,corpus_interleave,corpus_source_diversity,text_bm25,text_bm25_phrase,corpus_drift,corpus_leakage_report,text_lang_confusion,corpus_sample_holdout,corpus_ngram_coverage,text_collocations,text_readability,text_bpe_pairs,text_zipf_slope,corpus_length_hist,corpus_cross_source_dup,text_char_classes,dedup_sim_hist,dedup_reduction"
  out="/tmp/round-gate-zipf"
  sbt -batch "runMain graft.Verify tmp/zipf-gate $out $ZIPF_QUERIES"
  report="/tmp/round-gate-zipf.report"
  ONLY="$ZIPF_QUERIES" ORACLE_TIMEOUT_SEC=900 \
    python3 tools/check_correctness.py tmp/zipf-gate "$out" | tee "$report" | tail -3
  grep -q " 0 FAILING" "$report" || { echo "FAILING rows at Zipf soak"; exit 1; }

  echo "=== [soak] Zipf 50k-doc pair-family decade (PPJoin/banding at 10x the 5k gate)"
  # One decade past the 5k gate on the same realistic vocabulary: ALL
  # FOUR pair producers hash-compare against the same DuckDB oracles
  # (multiset-hash agg path above MAX_COMPARE_ROWS). r10 exponents
  # (5k -> 50k wall time, recorded in SCALE.md): jaccard 0.78,
  # containment 0.55, LSH 0.37, winnow 0.38 — a super-linear regression
  # here is a skew/explosion bug the small gates cannot see. The
  # containment oracle is prefix-filtered in SQL (the exact-complete
  # pigeonhole candidate bound; the original ~n^2 form blew past 100 GB
  # of spill at this scale), so the whole leg fits the ORACLE_SPILL cap.
  if [ ! -d tmp/zipf-50k ]; then
    echo "--- regenerating tmp/zipf-50k (50k docs, Zipf vocab)"
    python3 tools/make_zipf_corpus.py /root/testdata/sf0.1 tmp/zipf-50k 50000
  fi
  Z50_QUERIES="dedup_jaccard,dedup_containment,dedup_minhash_lsh,dedup_winnow_pairs"
  out="/tmp/round-gate-zipf50k"
  sbt -batch "runMain graft.Verify tmp/zipf-50k $out $Z50_QUERIES"
  report="/tmp/round-gate-zipf50k.report"
  ONLY="$Z50_QUERIES" ORACLE_TIMEOUT_SEC=1800 ORACLE_MEM=60GB \
    python3 tools/check_correctness.py tmp/zipf-50k "$out" | tee "$report" | tail -3
  grep -q " 0 FAILING" "$report" || { echo "FAILING rows at Zipf-50k soak"; exit 1; }

  echo "=== [soak] multi-executor certification (local-cluster[2,8] — a real JVM boundary)"
  # Everything else in the gate runs in ONE JVM (local[N]); the scale
  # story claims "scale OUT", so this leg re-runs the FULL query roster
  # at sf0.01 and the heavy pair family at zipf-50k on a local-cluster
  # master — forked executor JVMs behind the standalone scheduler, where
  # shuffle blocks serialize across processes, broadcasts ship over
  # transport, and the registered codegen expressions classload in remote
  # executors — then multiset-compares each dump against the single-JVM
  # dump this gate already verified against DuckDB (dump-to-dump, so the
  # oracle is not re-run). SPARK_SCALA_VERSION: the standalone Worker
  # builds the executor command via the launcher library outside
  # bin/spark-class, which otherwise scans for a dev build tree and dies
  # with "Cannot find any build directories".
  sbt -batch package
  mkdir -p /tmp/spark-worker /tmp/graft-local
  SPARK_SCALA_VERSION=2.13 SPARK_WORKER_DIR=/tmp/spark-worker \
    SPARK_LOG_DIR=/tmp/spark-worker/logs \
    SPARK_GRAFT_MASTER='local-cluster[2,8,8192]' SPARK_GRAFT_CPUS=16 \
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/round-gate-lc"
  # `|| true`: the checker exits 1 on mismatch, which under pipefail would
  # abort the script BEFORE the labeled echo + grep gate below ran.
  python3 tools/check_dumps_equal.py /tmp/round-gate-sf0.01 /tmp/round-gate-lc \
    | tee /tmp/round-gate-lc.report | tail -3 || true
  grep -q " 0 failing" /tmp/round-gate-lc.report \
    || { echo "FAILING multi-executor full-roster compare"; exit 1; }
  SPARK_SCALA_VERSION=2.13 SPARK_WORKER_DIR=/tmp/spark-worker \
    SPARK_LOG_DIR=/tmp/spark-worker/logs \
    SPARK_GRAFT_MASTER='local-cluster[2,8,16384]' SPARK_GRAFT_CPUS=16 \
    SPARK_GRAFT_MAX_PARTITION_BYTES=16777216 SPARK_GRAFT_DUMP_PARTS=auto \
    sbt -batch "runMain graft.Verify tmp/zipf-50k /tmp/round-gate-lc-z50 $Z50_QUERIES"
  python3 tools/check_dumps_equal.py /tmp/round-gate-zipf50k /tmp/round-gate-lc-z50 \
    | tee /tmp/round-gate-lc-z50.report | tail -3 || true
  grep -q " 0 failing" /tmp/round-gate-lc-z50.report \
    || { echo "FAILING multi-executor zipf-50k pair compare"; exit 1; }

  echo "=== [soak] cross-JVM task-retry fault drill (attempt-0 throws in remote executors)"
  # TaskRetrySpec covers the same injections in-process (local[4,3]); this
  # leg reruns them with the standalone scheduler + forked executors and
  # speculation enabled, asserting byte-identical committed state. The
  # duplicate-attempt commit race itself is API-driven in TaskRetrySpec
  # (speculation never launches same-host duplicates — measured r14).
  SPARK_SCALA_VERSION=2.13 SPARK_WORKER_DIR=/tmp/spark-worker \
    SPARK_LOG_DIR=/tmp/spark-worker/logs \
    sbt -batch "runMain graft.RetryDrill"

  echo "=== [soak] Zipf 150k-doc pair-family decade (Heaps-scaled vocabulary)"
  # One more decade-third past 50k, with the VOCABULARY scaled with the
  # corpus (150k words for 150k docs — Heaps-law-ish), keeping per-token
  # density comparable across legs. All FOUR pair producers hash-compare.
  # r11 wall times (Spark side): lsh 8.3s (e≈0.52 vs 50k), winnow 58.6s
  # (0.65), containment 40.8s (0.89), jaccard 121.5s (e≈1.27 — admitted
  # OUTPUT triples linearly; the remaining growth is Zipf-head candidate
  # density, see SCALE.md). The jaccard ORACLE is prefix+length-filtered
  # with list-probe intersections (r11 rewrite) — the naive and even the
  # prefix-only forms blew the 60GB spill cap at this scale.
  if [ ! -d tmp/zipf-150k-h ]; then
    echo "--- regenerating tmp/zipf-150k-h (150k docs, 150k-word Zipf vocab)"
    python3 tools/make_zipf_corpus.py /root/testdata/sf0.1 tmp/zipf-150k-h 150000 20260813 150000
  fi
  Z150_QUERIES="dedup_jaccard,dedup_containment,dedup_minhash_lsh,dedup_winnow_pairs"
  out="/tmp/round-gate-zipf150k"
  SPARK_GRAFT_MAX_PARTITION_BYTES=16777216 \
    sbt -batch "runMain graft.Verify tmp/zipf-150k-h $out $Z150_QUERIES"
  report="/tmp/round-gate-zipf150k.report"
  ONLY="$Z150_QUERIES" ORACLE_TIMEOUT_SEC=3600 ORACLE_MEM=60GB ORACLE_SPILL=60GB \
    python3 tools/check_correctness.py tmp/zipf-150k-h "$out" | tee "$report" | tail -3
  grep -q " 0 FAILING" "$report" || { echo "FAILING rows at Zipf-150k soak"; exit 1; }

  echo "=== [soak] Zipf 500k-doc pair-family decade-third (Heaps-scaled vocabulary)"
  # r12: one more scale step past 150k (500k docs, 500k-word vocab). Run
  # this leg EXCLUSIVELY — the only 500k failure ever seen was a JVM NIO
  # race (NativeThreadSet AIOOBE) with two unrelated Spark JVMs running
  # alongside; the exclusive re-run passed first try (BASELINE.md r12).
  # Containment/LSH/winnow hash-compare via the multiset-agg path. A
  # SINGLE jaccard oracle run is a MEASURED capacity boundary at this
  # scale (60 GB spill cap exceeded; a 90 GB-memory + 70 GB-spill retry
  # exhausted too — SCALE.md r12), so the jaccard compare runs SHARDED
  # below (check_jaccard_sharded.py) — content-exact again as of r13.
  # Exponents vs the 150k leg are recorded in SCALE.md — a super-linear
  # surprise here is a skew/explosion bug the smaller legs cannot see.
  if [ ! -d tmp/zipf-500k-h ]; then
    echo "--- regenerating tmp/zipf-500k-h (500k docs, 500k-word Zipf vocab)"
    python3 tools/make_zipf_corpus.py /root/testdata/sf0.1 tmp/zipf-500k-h 500000 20260815 500000
  fi
  Z500_QUERIES="dedup_jaccard,dedup_containment,dedup_minhash_lsh,dedup_winnow_pairs"
  out="/tmp/round-gate-zipf500k"
  SPARK_GRAFT_MAX_PARTITION_BYTES=8388608 \
    sbt -batch "runMain graft.Verify tmp/zipf-500k-h $out $Z500_QUERIES"
  report="/tmp/round-gate-zipf500k.report"
  ONLY="dedup_containment,dedup_minhash_lsh,dedup_winnow_pairs" \
    ORACLE_TIMEOUT_SEC=7200 ORACLE_MEM=60GB ORACLE_SPILL=60GB \
    python3 tools/check_correctness.py tmp/zipf-500k-h "$out" | tee "$report" | tail -3
  grep -q " 0 FAILING" "$report" || { echo "FAILING rows at Zipf-500k soak"; exit 1; }
  # r13: the jaccard oracle runs SHARDED (check_jaccard_sharded.py — the
  # same prefix-filtered formulation with the shard predicate pushed into
  # the candidate join's left side; union of shards = the exact pair
  # multiset, per-shard working set ~1/S). This restores content-exact
  # verification past the single-run DuckDB capacity boundary that r12
  # had papered over with a content-blind row-count pin. ~50 min.
  ORACLE_MEM=60GB ORACLE_SPILL=60GB \
    python3 tools/check_jaccard_sharded.py tmp/zipf-500k-h "$out" 4 \
    | tee /tmp/round-gate-zipf500k-jaccard.report
  grep -q "OK-AGG-SHARDED" /tmp/round-gate-zipf500k-jaccard.report \
    || { echo "FAILING sharded jaccard oracle at Zipf-500k"; exit 1; }

  echo "=== [soak] media pair-family decade (10k synthesized images)"
  # The media twin of the Zipf decade: 10k doc ids = 10k deterministic
  # PNGs (2.5k near-dup families; content classes repeat with the
  # generator's period, so the admitted pair OUTPUT grows super-linearly
  # BY CONSTRUCTION — the candidate join stays band-bucketed). Both the
  # hash table and the banded pair set hash-compare against the DuckDB
  # bit-exact aHash recomputation. r11 decade: 1k/3k/10k all exact
  # (2,793 / 18,635 / 218,836 pairs), Spark wall time ~flat (SCALE.md).
  if [ ! -d tmp/media-10k ]; then
    echo "--- regenerating tmp/media-10k (10k synthetic media ids)"
    python3 tools/make_media_corpus.py tmp/media-10k 10000
  fi
  out="/tmp/round-gate-media10k"
  sbt -batch "runMain graft.Verify tmp/media-10k $out media_phash,media_phash_pairs"
  report="/tmp/round-gate-media10k.report"
  ONLY="media_phash,media_phash_pairs" ORACLE_TIMEOUT_SEC=1800 \
    python3 tools/check_correctness.py tmp/media-10k "$out" | tee "$report" | tail -3
  grep -q " 0 FAILING" "$report" || { echo "FAILING rows at media-10k soak"; exit 1; }

  echo "=== [soak] media decade extension (30k synthesized images)"
  # r12: 3x the 10k leg. Pair output grows super-linearly BY CONSTRUCTION
  # (generator content classes repeat); the candidate join must stay
  # band-bucketed — wall time and pair counts recorded in SCALE.md.
  if [ ! -d tmp/media-30k ]; then
    echo "--- regenerating tmp/media-30k (30k synthetic media ids)"
    python3 tools/make_media_corpus.py tmp/media-30k 30000
  fi
  out="/tmp/round-gate-media30k"
  sbt -batch "runMain graft.Verify tmp/media-30k $out media_phash,media_phash_pairs"
  report="/tmp/round-gate-media30k.report"
  ONLY="media_phash,media_phash_pairs" ORACLE_TIMEOUT_SEC=3600 ORACLE_MEM=60GB \
    python3 tools/check_correctness.py tmp/media-30k "$out" | tee "$report" | tail -3
  grep -q " 0 FAILING" "$report" || { echo "FAILING rows at media-30k soak"; exit 1; }

  echo "=== [soak] small-vocab containment (triangle escape) @ sf0.1"
  # dedup_containment's OTHER branch: sf0.1's 31-word universe routes the
  # strategy probe to the triangle all-pairs bitmap join; the dense output
  # is hash-compared exactly (it is bounded at this sf).
  out="/tmp/round-gate-cont01"
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $out dedup_containment"
  report="/tmp/round-gate-cont01.report"
  ONLY=dedup_containment ORACLE_TIMEOUT_SEC=900 \
    python3 tools/check_correctness.py /root/testdata/sf0.1 "$out" | tee "$report" | tail -3
  grep -q " 0 FAILING" "$report" || { echo "FAILING containment at sf0.1"; exit 1; }

  echo "=== [soak] sf1 scale gate"
  if [ ! -d tmp/sf1 ]; then
    echo "--- regenerating tmp/sf1 (10x sf0.1)"
    python3 tools/make_scaled_sf.py /root/testdata/sf0.1 tmp/sf1 10
  fi
  SOAK_QUERIES="dedup_clusters,dedup_ngram_jaccard,q_sessionize,dedup_substring,knn_ivf_indexed,dedup_semantic,corpus_lm_quality,corpus_dsir_weights,q_funnel,q_retention_cohorts,dedup_substring_apply,q_ab_lift,q_item_similarity,corpus_pack_apply,corpus_budget_apply,corpus_bitext_mine,q_heavy_hitters,q_active_users,q_event_flow,q_anomaly_days,vec_outliers,q_pagerank,q_session_paths,q_new_vs_returning,q_basket_rules,q_rfm_segments,q_growth_accounting,q_ltv_cohorts,q_promo_share,q_supplier_variety,q_engagement_gini,q_pareto_share,q_session_duration_hist,q_attribution,q_purchase_intervals,vec_pca,vec_cluster_quality,q_seasonality,q_shipping_delay,q_funnel_latency,q_top_returners,q_activity_power_law,q6_forecast_revenue,vec_exact_dups,q_hourly_profile"
  out="/tmp/round-gate-sf1"
  # SPARK_GRAFT_BITEXT_CELLS=label: sf1's 20k vectors are past the 10k
  # auto threshold where corpus_bitext_mine switches to k-means cells
  # (k ∝ √n — DuckDB cannot reproduce the quantizer), so the ORACLE leg
  # pins the label-cell path; the k-means path's margin-recall contract
  # is gated by BitextCellsSpec (planted crossover corpus, recall ≥ 0.8
  # vs exact) and its sf1 decade wall time is recorded in SCALE.md.
  SPARK_GRAFT_MAX_PARTITION_BYTES=16777216 SPARK_GRAFT_BITEXT_CELLS=label \
    sbt -batch "runMain graft.Verify tmp/sf1 $out $SOAK_QUERIES"
  report="/tmp/round-gate-sf1.report"
  ONLY="$SOAK_QUERIES" ORACLE_TIMEOUT_SEC=900 \
    python3 tools/check_correctness.py tmp/sf1 "$out" | tee "$report" | tail -3
  grep -q " 0 FAILING" "$report" || { echo "FAILING rows at sf1 soak"; exit 1; }

  echo "=== [soak] ANN delete -> recentre lifecycle @ sf1 (20k vectors)"
  # Tombstones 10% across 3 delta versions, asserts chain probes equal a
  # fresh build on the survivors (all-cell probe), tombstone invisibility
  # at every nProbe, and that recentre folds to an artifact-identical
  # index (small-nProbe equality + exact centroid match + physical
  # reclaim). Exits non-zero on any divergence.
  sbt -batch "runMain graft.AnnSoak tmp/sf1 tmp/ann-soak"

  echo "=== [soak] drift-monitor 1k-micro-batch soak (bounded state, flat latency)"
  # r13: the embedding-drift monitor's indefinite-run contract — 1000
  # micro-batches must keep every monitor dir at <= 2 partitions, keep
  # per-batch latency flat (last-100 median <= 2x the early median; the
  # r12 design re-read all history per batch and grows linearly), and
  # end bit-exact to the batch PCA arithmetic. ~35 min. Exits non-zero
  # on any violation.
  sbt -batch "runMain graft.DriftSoak 1000 tmp/drift-soak"

  echo "=== [soak] tiered-compaction 1k-batch soak (O(log) rewrite amplification)"
  # r15: measures the tiered derived-table claim — cumulative compaction
  # I/O must stay within log2(cycles)+2 of ingested bytes (the O(history)
  # design measures ~cycles/2), the run chain stays logarithmic, and a
  # concurrent 50 ms read loop (the 1 s-trigger race drill, accelerated)
  # must see only nondecreasing whole-batch counts — this drill found the
  # torn in-flight-batch read readOpt now gates with _SUCCESS markers.
  # Exits non-zero on any violation.
  sbt -batch "runMain graft.CompactionSoak 1000 tmp/compaction-soak"
fi

echo "=== [4/4] Plan evidence is current?"
sbt -batch "runMain graft.PlanDump"
git diff --quiet PLANS.md \
  || echo "NOTE: PLANS.md changed — review and commit the regenerated evidence."

echo "ROUND GATE: all green"
