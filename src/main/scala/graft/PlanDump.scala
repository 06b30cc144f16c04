package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes PLANS.md: executed-plan skeletons for the headline queries with
  * the scale rationale next to each. Regenerate after plan-shaping changes:
  * `sbt "runMain graft.PlanDump"` (assertions live in PlanSpec; this file
  * is the human-readable evidence).
  */
object PlanDump {

  private val commentary: Seq[(String, String)] = Seq(
    "q1_agg" -> ("Pruned 4-column scan feeds a two-phase hash aggregate " +
      "(partial map-side, final after one hash shuffle on the grouping keys). " +
      "Decimal-cents sums keep results partition-order independent."),
    "q5_region_revenue" -> ("The full dimension chain (region→nation→customer" +
      "→orders→lineitem) broadcasts every small side — the only shuffle is the " +
      "final group-by. At 100 TB the fact scan stays embarrassingly parallel."),
    "q3_top_orders" -> ("Broadcast joins + TakeOrderedAndProject: the top-k " +
      "never materializes a global sort — each partition keeps k rows, the " +
      "driver merges."),
    "q_asof_join" -> ("Union+window as-of join: ONE hash shuffle on the key, " +
      "one per-key sort, one fused Window operator computing all three " +
      "as-of aggregates. No range-condition row explosion at any scale."),
    "q_range_join" -> ("Equality key keeps the interval join a hash join; the " +
      "time bound is a residual filter, never a nested-loop strategy."),
    "q_sessionize" -> ("Gaps-and-islands over a per-user window — state is " +
      "keyed and partition-local; no global sort before the final output " +
      "ordering."),
    "dedup_jaccard" -> ("Dictionary-encoded bitmap signatures with NO corpus " +
      "broadcast: the checkpointed signature table (ids, sizes, bitmap " +
      "blocks — tokenized once) self-joins triangle-partitioned on " +
      "(lang, group-pair) keys, intersection is bit_count(a&b) per 64-word " +
      "block inside whole-stage codegen. Large vocabularies switch to " +
      "PPJoin prefix filtering on rare-token ids."),
    "dedup_ngram_jaccard" -> ("Char-trigram Jaccard through the same " +
      "machinery as dedup_jaccard, tokenized by the native codegen'd " +
      "char_ngrams expression (higher-order lambdas run interpreted — " +
      "measured 4× the pair-join cost). Trigram universes are DENSE " +
      "(each doc holds ≥5% of the vocabulary), so the density switch " +
      "routes them to the triangle all-pairs join: prefix filtering " +
      "admitted 96% of pairs on the Zipf soak while paying a 59M-row " +
      "candidate explode."),
    "dedup_spans" -> ("Span-level dedup (Lee et al.): k-token windows hash to " +
      "md5 keys; one hash shuffle counts global occurrences, one keyed " +
      "shuffle folds verdicts into per-doc coverage. Shuffle keys are " +
      "16-byte hashes, never span text."),
    "text_tfidf" -> ("tf on (doc, word), df on word — token-count shuffles " +
      "only; the vocabulary join carries no broadcast hint (AQE decides), " +
      "the single hinted broadcast is the one-row corpus count. Top-3 via " +
      "per-doc window."),
    "dedup_minhash_lsh" -> ("Banded MinHash LSH: pairs meet only inside a " +
      "band-hash bucket (shuffle keyed on the band hash) — O(n·k) candidates, " +
      "then exact re-rank."),
    "knn_brute" -> ("Tiny query side broadcast against the corpus scan; " +
      "per-query top-k via WindowGroupLimit (partial top-k before the " +
      "shuffle, final after) — only k rows per query cross the wire."),
    "knn_centroid" -> ("Centroids aggregate with one (label,dim) shuffle; " +
      "assignment is a broadcast cross join against the metadata-sized " +
      "centroid table scored in codegen, argmin via WindowGroupLimit."),
    "knn_ivf_dist" -> ("Batch-kNN shape: the query set stays a DataFrame " +
      "end-to-end (no driver collect); only the k×dim centroid table " +
      "broadcasts for probe assignment, candidates join on cell id as a " +
      "plain shuffle join — survives a 10M-query probe table."),
    "q_salted_join" -> ("Manual skew-join rewrite: deterministic salt on the " +
      "big side, small side replicated once per salt — hot keys spread over " +
      "nSalts partitions; result identical to the plain join."),
    "media_features" -> ("mapPartitions batch shape: one decoder per " +
      "partition, records streamed through — the Scala analog of " +
      "mapInPandas, no driver round-trips."),
    "dedup_winnow_pairs" -> ("Winnowed rolling-hash fingerprints (native " +
      "expression, one codegen'd pass per row) meet on a fingerprint-" +
      "equality shuffle key — O(n·k) candidate pairs, no all-pairs join."),
    "q_gap_fill" -> ("Dense-series calendar generated distributively from " +
      "aggregated bounds (sequence + explode), zero-filled via left join — " +
      "no driver-side date loop."),
    "text_winnow" -> ("Rolling hash + winnowing fused into one native " +
      "expression inside the scan projection; the rest is keyed " +
      "dedup + aggregation."),
    "q_unpivot" -> ("Wide→long melt is an Expand over the aggregated " +
      "table — no joins, partition-parallel."),
    "q_full_outer_join" -> ("Orders aggregate BEFORE the outer join, so the " +
      "full outer shuffles customer-scale rows, not order-scale; both " +
      "null-bearing sides flow through one SortMergeJoin."),
    "dedup_edit_distance" -> ("Prefix-blocked Levenshtein: candidates meet on " +
      "a 16-char block key (one shuffle), the O(len²) distance runs only " +
      "inside bounded blocks on 80-char heads — never all-pairs. Each " +
      "block is HARD-CAPPED at Dedup.EditBlockCap=1000 smallest doc ids " +
      "(a row_number<=k filter Spark plans as partial WindowGroupLimit " +
      "before the block shuffle), so a boilerplate-hot prefix " +
      "(\"<!doctype html>...\") contributes at most cap²/2 pairs instead " +
      "of an unbounded quadratic join group; the recall trade is " +
      "documented at the cap and covered by the shingle/SimHash variants."),
    "corpus_curate" -> ("The composed curation pipeline stays ONE plan: lang " +
      "allowlist + quality gate evaluate inside the scan's codegen stage, " +
      "then two hash aggregates (dedup keep-first, per-lang stats). Nothing " +
      "materializes between stages."),
    "q_stratified_sample" -> ("Per-language sampling rates over a stable md5 " +
      "bucket: the sample itself is pure scan+filter (the predicate runs " +
      "inside the FileScan's codegen stage) — the only exchange below is " +
      "the presentation ORDER BY for the oracle compare, which a real " +
      "pipeline would drop."),
    "q_approx_quantile" -> ("Mergeable rank-sketch percentiles: the " +
      "ObjectHashAggregate runs partial_percentile_approx map-side, one " +
      "bounded sketch per (group, partition) crossing the shuffle — not " +
      "each group's raw values (the exact percentile_cont brackets ride " +
      "the same two-phase aggregate)."),
    "corpus_pack" -> ("Sequence packing shards over 32 md5 buckets: one " +
      "windowed running sum PER SHARD (partition-parallel, no global " +
      "sort), then a 32-row aggregate — the concat-and-chunk order is " +
      "deterministic within each shard and shards pack independently."),
    "knn_ivf_indexed" -> ("The build/probe split: centroids and cell lists " +
      "are PERSISTED parquet (built once by index-ann); the probe " +
      "broadcasts only the k×dim centroid table, assigns cells in " +
      "codegen, and shuffle-joins the cell-partitioned list table — " +
      "directory-pruned to the probed cells."),
    "dedup_substring" -> ("Substring removal decisions: window hashes meet " +
      "in ONE map-side-combinable min aggregation (not a row_number over " +
      "the hash group — the most-repeated window is exactly the group " +
      "that would skew), then removable positions stitch per doc in a " +
      "doc-keyed window. Shuffle keys are hashes and doc ids, never text."),
    "corpus_lm_quality" -> ("CCNet-style LM quality scoring with NO Window " +
      "operator anywhere: per-language head/middle/tail buckets come from " +
      "mean/stddev cutoffs (a |langs|-row broadcast) instead of ntile — " +
      "an exact tercile would funnel each language through one reducer. " +
      "The doc-score table is checkpointed so the token-scoring pipeline " +
      "(the expensive part) feeds both the moments and the bucket join " +
      "without recomputation."),
    "corpus_dsir_weights" -> ("DSIR importance weights: the fitted model " +
      "(256 hashed-bigram buckets × target/raw log-ratio) is metadata-" +
      "sized at any corpus scale and BROADCASTS onto the per-doc bucket " +
      "counts — scoring is one map-side join + doc-keyed aggregate. The " +
      "per-(doc,bucket) count table is checkpointed: fit and scoring " +
      "share it instead of re-exploding the grams."),
    "dedup_semantic" -> ("SemDeDup keep decisions: centroid scores are " +
      "computed ONCE (checkpointed) and feed both salted pair-join roles " +
      "and the final keep projection; the within-cluster pair join " +
      "shuffles on (label, salt) with an explicit-count repartition " +
      "(AQE-coalesce-proof), and only the k×dim centroid table is ever " +
      "broadcast."),
    "dedup_substring_apply" -> ("The apply half of substring dedup: the " +
      "decisions chain (hash → map-side-combinable min → islands) feeds a " +
      "per-doc span collect (spans ≪ tokens), and the strip itself is one " +
      "MAP-SIDE higher-order filter over the token array — the corpus " +
      "text never explodes into (doc, position) rows; that shape is left " +
      "to the independent relational oracle."),
    "q_funnel" -> ("Time-bounded ordered funnel via sequenced conditional " +
      "minima: every stage is a user-keyed partial-aggregated shuffle + a " +
      "user-keyed join — no per-user event array (collect_list would OOM " +
      "on a power user), no global-sort window. The final 3-row stage " +
      "table derives from one single-row aggregate."),
    "q_retention_cohorts" -> ("Weekly cohort retention: integer " +
      "day-arithmetic weeks (no engine week-truncation convention), " +
      "distinct (user, week) activity + first-week table both keyed on " +
      "user; the (cohort, offset) aggregate and cohort-size join are " +
      "metadata-sized (sizes broadcast)."),
    "q_item_similarity" -> ("Market-basket item similarity: the pair pass " +
      "is a user-keyed hash self-join (never a cartesian) over " +
      "interactions HARD-CAPPED per user at Temporal.ItemSimUserCap=1000 " +
      "(deterministic top-N by event count then item id, enforced in " +
      "itemInteractions BEFORE the join — a bot touching 10^6 items " +
      "contributes <=500k pairs, not 10^12; cap >> the test catalog so " +
      "oracle output is unchanged), co-counts and item counts " +
      "partial-aggregate, and per-item top-3 is a window keyed on the " +
      "catalog-cardinality item."),
    "dedup_containment" -> ("Asymmetric containment join, two-branch on the " +
      "measured vocabulary (same probe as the Jaccard family): real " +
      "vocabularies take the index-probe prefix join — probe side explodes " +
      "only its rare-first PREFIX, container side is the full inverted " +
      "index, both repartitioned on the token with an explicit count, " +
      "verification via array_intersect over checkpointed sorted arrays; " +
      "degenerate (<=512-word) universes take the triangle all-pairs " +
      "bitmap join (popcount intersections, both directions tested — " +
      "containment is asymmetric). No broadcast hint anywhere."),
    "dedup_containment_apply" -> ("The per-doc keep/drop decision over the " +
      "containment pairs: drop a doc contained in a strictly larger doc " +
      "or an equal-size doc with smaller id — one distinct over the pair " +
      "stream plus a left join back to doc ids; identical-set docs keep " +
      "their min id, chains keep only the largest. Inherits the pair " +
      "machinery's branch and shuffle posture."),
    "corpus_budget_apply" -> ("Per-document token-budget keep/drop: " +
      "per-source budgets from the mass^0.7 mixture law computed in EXACT " +
      "integers (6-dp micro-unit lift via decimal multiply, DECIMAL(38,0) " +
      "product, integral division — no FP cast boundary), selection via " +
      "the sharded running-sum plan: 32 md5 buckets per source, the " +
      "(source,bucket) prefix table broadcasts, the intra-bucket window " +
      "is partition-local. No single-reducer sort at any corpus size."),
    "corpus_pack_apply" -> ("The trainer-facing packing layout per doc: " +
      "md5-bucket shard, deterministic (h, doc_id) order, greedy " +
      "running-sum token_start and seq_id = start div 512 — one windowed " +
      "pass per 32-way shard, all integer arithmetic, no global sort " +
      "before the output ordering."),
    "corpus_bitext_mine" -> ("Margin-based bitext mining (Artetxe & " +
      "Schwenk): the full bipartite cosine matrix never materializes — " +
      "each side broadcasts only its 5-row opposite-cell centroid table, " +
      "vectors assign to top-2 cells in codegen, candidates meet through " +
      "a cell-keyed shuffle join, the k-NN means reduce the candidate " +
      "stream with partial top-k, and the margin is computed over the " +
      "checkpointed candidate rows. Top-1 per source via a keyed window " +
      "— no global sort."),
    "q_heavy_hitters" -> ("Per-day heavy hitters: counts partial-aggregate " +
      "on (day, user), then the rank<=3 filter plans as Partial+Final " +
      "WindowGroupLimit — each task keeps 3 rows per day BEFORE the " +
      "day-keyed shuffle, so the raw count table never sorts globally; " +
      "the only full sort is the presentation ORDER BY over the " +
      "3-per-day survivors. Day keys are calendar-cardinality — the " +
      "window cannot skew."),
    "corpus_chunk" -> ("Document chunking is ONE map-side higher-order " +
      "expression per row (sequence → slice → md5 inside codegen) " +
      "exploded with a factor bounded by n_tokens/stride: no join, no " +
      "aggregate, no hash shuffle at any corpus size — the only exchange " +
      "is the presentation ORDER BY's range partitioning."),
    "corpus_decontaminate_near" -> ("Fuzzy benchmark decontamination: the " +
      "banded MinHash signature table computes once (checkpointed, shared " +
      "by both roles); the benchmark band keys are eval-suite-sized and " +
      "carry the query's ONLY broadcast hint, so the corpus side probes " +
      "map-side; the only corpus-scale hash shuffle groups band hits per " +
      "doc (the bench-side distinct shuffles eval-suite-sized rows). The " +
      "verdict join back to doc ids rides AQE (broadcast at small sf, " +
      "shuffle join at scale)."),
    "corpus_source_triage" -> ("Per-source triage: the dup-hash and " +
      "6-dp-integer quality signals evaluate inside the scan's codegen; " +
      "count(distinct h) rides the standard two-phase distinct aggregate " +
      "((source,h) partial → source final) — every shuffle key is " +
      "source-bounded and the output is |sources| rows at any corpus " +
      "size. No window, no join."),
    "corpus_epochs" -> ("Data-constrained repeat factors: one partial-" +
      "aggregated groupBy on source, then the exact-integer mixture " +
      "targets join only a ONE-ROW broadcast total — |sources| rows out " +
      "at any corpus size, no window, no per-doc join."),
    "corpus_quality_calibration" -> ("Heuristic-vs-LM quality audit: one " +
      "token shuffle + one doc aggregate (the corpus_lm_quality posture), " +
      "broadcast vocab totals, a <=10-row decile rollup and a 1-row " +
      "broadcast OLS fit (Q.olsFitOver). The per-doc table checkpoints " +
      "for its two consumers; nothing beyond the lm scoring touches " +
      "corpus-scale rows."),
    "corpus_repeat_apply" -> ("The epoch-expanded training stream: the " +
      "corpus_epochs plan MATERIALIZED. Explode fan-out is bounded by " +
      "the 4-epoch cap (never data-sized); the |sources|-row plan joins " +
      "by broadcast; the partial-epoch running sum shards over " +
      "(source, bucket) with a broadcast prefix table — the " +
      "corpus_token_budget posture, no global window. Emitted token " +
      "mass covers effective_tokens per source, overshooting only " +
      "into the final admitted doc."),
    "knn_recall" -> ("The ANN accuracy audit: ground truth and every " +
      "per-setting top-k are <= |queries|*k rows (metadata); the only " +
      "volume-bearing stages are the broadcast-query map-side scoring " +
      "streams the audited knn_* queries already run. Shared inputs " +
      "(scan, 8-plane LSH bits, int8 candidate stream at the max budget) " +
      "checkpoint ONCE and sweep per setting — a knob reads a cached " +
      "table, never rescans the corpus. Hit counts join a checkpointed " +
      "40-row truth; the final recall division is one IEEE op."),
    "text_bpe_apply" -> ("BPE token accounting at the word-frequency " +
      "table (Sennrich): the corpus contributes ONE tokenize pass (the " +
      "distinct-word count) and ONE shuffle join (counts back onto " +
      "docs); each of the K=8 merge iterations is a vocab-scale pair " +
      "aggregate plus a one-row argmax collect (the kmeans-centroid " +
      "metadata pattern). Merge application is a per-row string replace " +
      "in codegen. At 100 TB: corpus passes stay O(1) in K."),
    "text_entropy" -> ("Per-doc word entropy: one (doc, word) count " +
      "shuffle and one doc-keyed aggregate (the text_tfidf posture " +
      "without the vocabulary join); the entropy arithmetic — 6-dp " +
      "DECIMAL term sums, half-up integer-micro division — is all " +
      "map-side expressions after the aggregate. No window, no join."),
    "corpus_shuffle" -> ("Deterministic training order without a global " +
      "permutation sort: docs hash to 64 shards by md5(seed||id) and take " +
      "in-shard positions from the same hash — one hash shuffle on the " +
      "shard key plus a per-shard window; (shard, pos) IS the epoch " +
      "order and the resume cursor. No global sort but the presentation " +
      "ORDER BY."),
    "media_phash_pairs" -> ("Perceptual image near-dup: the checkpointed " +
      "(doc, 64-bit aHash) table meets itself only inside (band index, " +
      "16-bit band value) buckets — 4×16 banding, complete for Hamming " +
      "≤3 by pigeonhole — with an explicit-count repartition pinning the " +
      "pair shuffle; the Hamming re-rank is 4 codegen'd " +
      "bit_count(xor) terms. O(n·k) candidates, never all-pairs."),
    "corpus_novelty" -> ("Per-doc first-seen-trigram fraction with NO pair " +
      "join: the checkpointed distinct (doc, gram) pairs feed per-doc " +
      "totals (doc-keyed count) and the gram→min-doc table (gram-keyed " +
      "min with a partial phase, so stop-trigrams combine map-side); " +
      "novel counts group that vocabulary-sized table by its min doc and " +
      "join back |docs|-keyed. Linear in token volume."),
    "q_event_flow" -> ("User-path transition matrix: lead() over a " +
      "user-keyed window (each user sorts only its own events), pair " +
      "counts partial-aggregate onto the |types|² key space, and the " +
      "P(next|current) normaliser windows over that metadata-sized " +
      "table — nothing after the first shuffle scales with events."),
    "q_anomaly_days" -> ("Daily-volume z-score vs the 7 preceding active " +
      "days: the event-scale work is one partial-aggregated day count; " +
      "the trailing window runs single-partition BY DESIGN on the " +
      "calendar-bounded daily table (thousands of rows at any volume). " +
      "Exact integer sums, min=max zero-variance test, one IEEE chain."),
    "corpus_interleave" -> ("Stride-scheduled source mixing: the r-th of " +
      "a source's n docs runs at vtime (2r−1)/(2n), so sources spread " +
      "evenly over the epoch. The per-source rank stitches through " +
      "(source, md5-bucket) windows + broadcast per-bucket count " +
      "prefixes — never a per-source global row_number — and only the " +
      "presentation ORDER BY sorts globally."),
    "corpus_source_diversity" -> ("Source concentration curve: one " +
      "partial-aggregated (source → token mass) pass; ranking window + " +
      "broadcast total both run on the checkpointed |sources|-row " +
      "aggregate (catalog-bounded single-partition stages by design)."),
    "text_bm25" -> ("BM25 retrieval: query terms picked by TakeOrdered " +
      "(distributed partial top-k over the vocabulary, never a one-reducer " +
      "sort); the checkpointed tf table feeds doc lengths and the " +
      "candidate probe; the 3-term query set and 1-row stats broadcast; " +
      "scoring is map-side, the per-query top-5 windows over " +
      "query-keyed candidates. idf's libm ln rounds to 6 dp in isolation."),
    "q_new_vs_returning" -> ("Acquisition split: two keyed aggregates off " +
      "the checkpointed distinct (day, user) active set — per-user min day " +
      "partial-aggregates, DAU counts day-keyed — and a broadcast " +
      "zero-fill on calendar-cardinality day keys."),
    "q_basket_rules" -> ("Association rules over capped co-baskets: the " +
      "q_item_similarity join machinery (user-keyed self-join, " +
      "partial-aggregated co-counts), all three measures single int/int " +
      "divisions, global top-10 by lift via TakeOrdered."),
    "corpus_sample_holdout" -> ("Train/val/test manifest: the seeded " +
      "md5-bucket split decides in scan codegen, so the whole op is one " +
      "partial aggregate onto ≤3·|langs| rows at any corpus size."),
    "q_rfm_segments" -> ("Fixed-threshold RFM: per-user aggregates " +
      "partial-combine on user_id (purchase cents floor-quantized exact), " +
      "the only join is the broadcast 1-row max-day, labels are pure " +
      "expressions, the readout keys on |segments| rows."),
    "q_growth_accounting" -> ("Weekly growth decomposition: one user-keyed " +
      "lag/lead window over the checkpointed distinct user-week set, " +
      "status and churn counts partial-aggregate onto calendar-cardinality " +
      "weeks, and the min..max calendar zero-fill joins broadcast. Every " +
      "measure is an exact integer count."),
    "q_ltv_cohorts" -> ("Cohort LTV matrix: per-customer first-month " +
      "cohorts checkpoint once for the orders join and the broadcast " +
      "cohort sizes; monthly cells partial-aggregate onto the " +
      "metadata-sized (cohort, offset) key, the cumulative sum windows " +
      "over that matrix, and LTV divides exact cents by cohort size with " +
      "half-up integer arithmetic."),
    "q_promo_share" -> ("TPC-H Q14 shape: the part dimension broadcasts " +
      "into the pruned lineitem scan, revenue accumulates in exact " +
      "1e4-unit integers partial-aggregated onto calendar month keys, and " +
      "the share is one IEEE division of two exact integer sums."),
    "q_supplier_variety" -> ("Q16 shape without partsupp: per-supplier " +
      "return rates checkpoint (|suppliers| rows), the taint predicate is " +
      "a cross-multiplied exact integer compare against a broadcast 1-row " +
      "global, and the clean set + part table broadcast into the fact " +
      "scan before the distinct-supplier count."),
    "text_collocations" -> ("Collocation mining: document frequencies " +
      "partial-aggregate once, the top-100 vocabulary slice broadcasts " +
      "WITH its df's (PMI needs no second lookup join), the per-doc pair " +
      "self-join runs over the checkpointed ≤100-rows-per-doc slice " +
      "(≤4,950 pairs/doc at any scale), and the top-10 is TakeOrdered " +
      "on the 6-dp-rounded PMI."),
    "text_readability" -> ("FORCAST readability: both the word and " +
      "monosyllable counts evaluate in the scan's codegen (size/filter " +
      "on the split array — no explode, no join), the grade is one IEEE " +
      "division of exact integers, and the only exchange is the output " +
      "sort."),
    "text_bpe_pairs" -> ("BPE merge candidates: the within-word char-pair " +
      "explode is map-side and linear in corpus bytes, the count " +
      "partial-aggregates onto an alphabet²-bounded key space (constant " +
      "shuffle rows per partition at any corpus size), and the top-10 is " +
      "TakeOrdered with full tie-breaks."),
    "q_engagement_gini" -> ("Event-concentration Gini: per-user counts " +
      "partial-aggregate, collapse to counts-of-counts (one row per " +
      "distinct activity level — degree-distribution cardinality, never " +
      "user cardinality), the rank-sum folds per tie block in closed form " +
      "over that tiny table's window, products lift through DECIMAL(38,0), " +
      "and the final G is one IEEE chain over three exact aggregates."),
    "q_pareto_share" -> ("Top-1%/10% event concentration: the same " +
      "counts-of-counts collapse as the Gini, levels windowed DESCENDING " +
      "over degree-distribution cardinality, top-k cuts take whole levels " +
      "plus an exact boundary slice in BIGINT, k = ceil(users·pct) in " +
      "integer arithmetic off the broadcast 1-row totals, and each share " +
      "is one int/int IEEE division."),
    "q_session_duration_hist" -> ("Log2-bucketed session durations: one " +
      "user-keyed window shuffle (q_sessionize's arithmetic), the " +
      "(user, session) aggregate reuses that partitioning, buckets are " +
      "EXACT integer log2 (binary digit count — no floating log at a " +
      "boundary), and the bucket aggregate partial-combines onto ≤~40 " +
      "rows."),
    "corpus_cross_source_dup" -> ("Cross-source duplication matrix: the " +
      "LITERAL dedup_minhash_lsh candidate pair set (shared " +
      "lshCandidatePairsFrom, banded bucket join, pinned pair-shuffle " +
      "width), each side joined to the doc→source map on its doc id, " +
      "unordered pairs normalized via least/greatest, rollup " +
      "partial-combined onto |sources|² rows."),
    "q_activity_power_law" -> ("Degree-distribution exponent: the " +
      "Gini/Pareto counts-of-counts collapse feeds text_zipf_slope's " +
      "closed-form OLS discipline — 6-dp-isolated libm lns, exact DECIMAL " +
      "moment sums, one shared IEEE chain — over one row per distinct " +
      "activity level at any user cardinality."),
    "q6_forecast_revenue" -> ("TPC-H Q6 shape: all three predicates reach " +
      "the parquet scan, revenue is exact 1e4-unit integer cents×discount " +
      "with the discount band compared on ROUNDED integers, and the only " +
      "exchange is the 1-row final combine."),
    "q_top_returners" -> ("TPC-H Q10 shape: R-flag filter pushed to the " +
      "lineitem scan, q5's exact 1e4-unit integer revenue, orderkey " +
      "shuffle join (bucketing candidate), customer+nation broadcast, " +
      "top-10 via TakeOrdered with full tie-breaks."),
    "q_funnel_latency" -> ("Time-to-convert per completed-funnel leg: the " +
      "IDENTICAL sequenced-minima stage arithmetic as q_funnel (user-keyed " +
      "partial-agg shuffles + joins, no event arrays, no window), exact " +
      "integer epoch-second leg latencies, and the 3-row leg explode " +
      "aggregates onto a 3-row key space."),
    "corpus_length_hist" -> ("Per-source log2 token-length histogram: " +
      "counts in scan codegen (size() — docs never unnest), exact integer " +
      "log2 buckets, one partial-aggregated shuffle onto the " +
      "|sources|×~40-row key space."),
    "q_seasonality" -> ("Weekday volume profile: weekday is PURE integer " +
      "arithmetic off the Mon-2024-01-01 epoch anchor (engine dayofweek " +
      "conventions differ), the distinct-user count shuffles on " +
      "(weekday, user) then collapses to 7 rows, and the share normaliser " +
      "windows over that 7-row profile."),
    "q_shipping_delay" -> ("TPC-H Q12 shape: exact integer day delays off " +
      "the fact-to-fact l_orderkey join (broadcast at test SF, THE " +
      "bucketing candidate at warehouse scale), priority rollup " +
      "partial-combines onto |priorities| rows, mean/late_frac single " +
      "int/int IEEE divisions."),
    "dedup_reduction" -> ("The one-row dedup proposal: keep-first over " +
      "the LITERAL dedup_clusters output (shared clustersFrom — a doc " +
      "survives iff its id IS its min-label cluster id), token counts in " +
      "scan codegen, reductions as int/int IEEE divisions over exact " +
      "BIGINT sums."),
    "dedup_sim_hist" -> ("Threshold audit: decile counts over the LITERAL " +
      "dedup_jaccard pair set (shared jaccardPairsFrom), round-before-cast " +
      "decile cut on bit-identical int/int similarities, rollup onto ≤5 " +
      "rows."),
    "q_hourly_profile" -> ("Intraday volume curve: hour-of-day is pure " +
      "integer epoch-second arithmetic (unix_timestamp truncation ≡ " +
      "DuckDB whole-second date_diff), one partial-aggregated rollup onto " +
      "24 rows with the share window on that profile."),
    "vec_exact_dups" -> ("Exact-duplicate embeddings: 1e6-quantized md5 " +
      "group key in scan codegen, one partial-aggregated groupBy onto " +
      "distinct-content cardinality — completes exact dedup across " +
      "text/media/vector payloads."),
    "text_char_classes" -> ("Character-class mix per source: exact " +
      "codepoint class counts in scan codegen (regexp_replace strips all " +
      "matches; the DuckDB twin needs the 'g' flag), order-independent " +
      "BIGINT sums, int/int IEEE fractions, one shuffle onto |sources| " +
      "rows."),
    "vec_cluster_quality" -> ("Per-label cohesion vs nearest-centroid " +
      "separation: centroids one (label,pos)-keyed shuffle, member scoring " +
      "map-side against the broadcast k×d centroid table with 4-dp-rounded " +
      "cosines lifted to exact 1e4-unit integers, the mean a sign-aware " +
      "half-up integer division, and the k²-row pair table metadata-sized " +
      "at any corpus size."),
    "vec_pca" -> ("Fixed-point power-iteration PCA: inputs quantize once " +
      "to 1e4-unit BIGINTs, the scatter matrix S = n·Σqqᵀ − (Σq)(Σq)ᵀ is " +
      "exact integers off a MAP-SIDE flatten/explode outer product (no " +
      "self-join; partial sums onto the d²-row key space), three " +
      "iterations run DECIMAL products over the checkpointed 4096-row S " +
      "with sign-aware div renormalisation, and loadings + Rayleigh share " +
      "are single IEEE chains over exact integers."),
    "q_attribution" -> ("Last-touch attribution: the running " +
      "last-non-purchase type is one ignoreNulls last() over the user-keyed " +
      "window (the as-of formulation, ONE shuffle), revenue floor-quantizes " +
      "to exact cents, the channel rollup partial-combines onto |event " +
      "types| rows, and the share normaliser window runs on that " +
      "metadata-sized table."),
    "q_purchase_intervals" -> ("Repurchase cadence: gap days are exact " +
      "epoch-second differences div 86400 off one customer-keyed window " +
      "shuffle, buckets are exact integer log2 (binary digit count), the " +
      "bucket aggregate partial-combines onto ≤~40 rows, and the mean gap " +
      "is one int/int IEEE division."),
    "text_zipf_slope" -> ("Zipf exponent OLS fit: the top-1000 vocabulary " +
      "slice is TakeOrdered partial top-k, each libm ln rounds to 6 dp in " +
      "isolation, moment sums accumulate as exact DECIMAL (partition-order " +
      "independent), and slope/intercept are one identical IEEE chain over " +
      "the five aggregates."),
    "corpus_ngram_coverage" -> ("Vocabulary coverage curve: word counts " +
      "partial-aggregate and checkpoint; the top-1000 slice is TakeOrdered " +
      "(never a one-reducer vocab sort); the three cumulative masses " +
      "reduce over that bounded slice against the broadcast total."),
    "text_lang_confusion" -> ("Classifier QA: the literally-shared " +
      "langPred expression evaluates per doc in scan codegen, the matrix " +
      "is one partial-aggregated (lang, pred) count — ≤|langs|² rows at " +
      "any corpus size — and the row normaliser windows over that " +
      "metadata-sized table."),
    "text_bm25_phrase" -> ("Multi-term BM25 over the same shared pipeline: " +
      "6-dp per-(doc, term) scores DECIMAL-sum per document " +
      "(order-independent at any partition layout), one decimal→double " +
      "conversion at the end, TakeOrdered top-5."),
    "vec_outliers" -> ("Embedding QA: per-label centroid cosines score " +
      "map-side against the broadcast centroid table, lift to exact " +
      "1e4-unit integers, and the moment pass + z-window stay label-keyed " +
      "(catalog-cardinality) over the checkpointed scored table. Zero " +
      "variance by the exact min=max test; z is one IEEE chain at 6 dp."),
    "corpus_drift" -> ("Per-source quality drift (early vs late halves at " +
      "the exact integer id midpoint): per-doc scores in scan codegen, " +
      "checkpointed for the bounds pass and the halves aggregate; the " +
      "|sources|-row bounds broadcast back; one source-keyed partial " +
      "aggregate ends it. Triage's micro-int FP discipline throughout."),
    "q_pagerank" -> ("Fixed-point PageRank (3 unrolled iterations, d=0.85 " +
      "as integer 85/100 mixing): the degree-annotated edge table " +
      "checkpoints once and feeds three node-keyed message shuffles; pr " +
      "lives in exact 1e12-unit integers so receiver sums are " +
      "order-independent; mass conservation bounds every in_sum at ~1e12; " +
      "the final top-10 is TakeOrdered, never a global node sort."),
    "q_session_paths" -> ("Top user journeys: q_sessionize's " +
      "gaps-and-islands sessions, per-session paths HARD-BOUNDED at 8 " +
      "steps BEFORE collect_list (a mega-session contributes an 8-element " +
      "array, never unbounded state), path counts partial-aggregate, and " +
      "the top-10 is TakeOrdered. All windows (user[, session])-keyed."),
    "corpus_leakage_report" -> ("The decontamination flip side (per " +
      "benchmark item, how many training docs near-collide): same " +
      "checkpointed 4×4 band table, benchmark bands broadcast WITH their " +
      "doc ids (still eval-suite-sized), corpus probes map-side, pair " +
      "dedup + per-bench counts on the tiny collision set; the zero-fill " +
      "join broadcasts the bench-sized counts.")
  )

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder
      .master("local[8]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    // Optional second arg: output file. `runMain graft.PlanDump tmp/sf1
    // PLANS_sf1.md` regenerates the evidence at soak-scale STATISTICS —
    // AQE's broadcast/coalesce/skew decisions are size-dependent, and the
    // one genuine scale bug so far (single-task pair expansion) was
    // invisible at sf0.001 sizes. PlanSf1Spec asserts the load-bearing
    // shapes against the same corpus.
    val outFile = if (args.length > 1) args(1) else "PLANS.md"

    val keep = Seq("Join", "Exchange", "Window", "Scan parquet", "Aggregate",
      "TakeOrdered", "Sort ", "Project", "mapPartitions", "SerializeFromObject")
    val sb = new StringBuilder
    sb.append("# PLANS — executed-plan evidence for the headline queries\n\n")
    sb.append(s"Generated by `sbt \"runMain graft.PlanDump\"` against `$d`; plan-shape\n")
    sb.append("assertions are enforced in `PlanSpec` (and `PlanSf1Spec` at soak\n")
    sb.append("statistics). Skeleton lines only\n")
    sb.append("(joins / exchanges / windows / scans / aggregates) — run\n")
    sb.append("`.explain(\"formatted\")` on any `SparkEntry.queries` entry for the full plan.\n\n")
    sb.append("A note on the `WindowExec: No Partition Defined` warnings the bench\n")
    sb.append("tail logs: they come from by-design single-partition windows — the\n")
    sb.append("share normalisers (q_attribution), rank-sum/level windows\n")
    sb.append("(q_engagement_gini / q_pareto_share), the trailing-z window\n")
    sb.append("(q_anomaly_days) and the OLS stage over the TakeOrdered(1000)\n")
    sb.append("vocabulary slice (text_zipf_slope). PlanSpec's shape guard\n")
    sb.append("(`assertSinglesFedByAggregates`) proves every `Exchange\n")
    sb.append("SinglePartition` is fed by an aggregate (or a checkpointed metadata\n")
    sb.append("materialization) BEFORE any parquet scan, so only partial-aggregated\n")
    sb.append("metadata tables (|event types|, counts-of-counts, |days|, top-1000\n")
    sb.append("vocab) ever cross the one-reducer stage — bounded at any corpus size.\n")

    commentary.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      // Building some frames materializes localCheckpoints (signature
      // tables); free them so 22 queries back-to-back don't pile up
      // un-recomputable storage at soak scale.
      graft.queries.Checkpoints.release()
      val skeleton = plan.linesIterator
        .filter(l => keep.exists(l.contains))
        .map(_.take(140))
        .mkString("\n")
      sb.append(s"\n## $name\n\n$why\n\n```\n$skeleton\n```\n")
    }

    Files.write(Paths.get(outFile), sb.toString.getBytes("UTF-8"))
    println(s"wrote $outFile (${commentary.size} queries)")
    spark.stop()
  }
}
