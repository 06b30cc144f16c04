package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Physical-plan regression guards: the properties that make the headline
  * queries scale are asserted here, so a refactor that silently loses a
  * broadcast, leaks a cartesian product, or drops filter pushdown fails the
  * suite instead of surfacing as a 100× slowdown at deployment scale.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  /** Shape guard for the by-design one-reducer windows (the bench tail's
    * `WindowExec: No Partition Defined` warnings): inside every
    * `Exchange SinglePartition` subtree, an aggregate — or a checkpointed
    * metadata materialization (`Scan ExistingRDD`) whose aggregate ran
    * before the checkpoint — must appear BEFORE any parquet scan. Raw
    * corpus/event rows can then never reach the single-partition stage:
    * what crosses it is the partial-aggregated metadata table
    * (|event types|, counts-of-counts, |days|, top-1000 vocab).
    */
  private def assertSinglesFedByAggregates(p: String, name: String): Unit = {
    val lines = p.linesIterator.toVector
    def depth(s: String): Int = {
      val i = s.indexOf("+-"); val j = s.indexOf(":-")
      if (i >= 0 && (j < 0 || i < j)) i else math.max(j, 0)
    }
    val exchanges = lines.indices.filter(lines(_).contains("Exchange SinglePartition"))
    assert(exchanges.nonEmpty, s"$name: expected a by-design SinglePartition window:\n$p")
    for (i <- exchanges) {
      val d0 = depth(lines(i))
      val subtree = lines.drop(i + 1).takeWhile(l => depth(l) > d0)
      val fedIdx = subtree.indexWhere(l =>
        l.contains("HashAggregate") || l.contains("SortAggregate") ||
          l.contains("ObjectHashAggregate") || l.contains("Scan ExistingRDD"))
      val scanIdx = subtree.indexWhere(l => l.contains("Scan parquet") || l.contains("FileScan"))
      assert(fedIdx >= 0,
        s"$name: SinglePartition exchange is not fed by an aggregate or checkpoint:\n$p")
      assert(scanIdx == -1 || fedIdx < scanIdx,
        s"$name: a parquet scan reaches the SinglePartition exchange before any aggregate " +
          s"(raw rows into one reducer):\n$p")
    }
  }

  test("by-design SinglePartition windows run over partial-aggregated metadata only") {
    // Closes the bench-tail WindowExec warning as provably harmless for
    // every query that intentionally ends in a single-partition window:
    // the share normalisers (attribution), rank-sum/level windows
    // (gini/pareto) and the trailing-z window (anomaly) all see bounded
    // metadata, never raw rows. (text_zipf_slope's unpartitioned window
    // needs no exchange at all — it sits directly on the
    // TakeOrderedAndProject(1000) vocabulary slice, asserted in its own
    // test below.)
    for (q <- Seq("q_attribution", "q_engagement_gini", "q_pareto_share",
        "q_anomaly_days")) {
      val df = SparkEntry.queries(q)(spark, d)
      val p = df.queryExecution.executedPlan.toString
      Checkpoints.release()
      assertSinglesFedByAggregates(p, q)
    }
  }

  test("dedup_winnow_pairs: dense drop is a broadcast anti-join; pairs explode in-bucket") {
    // The zipf-1.5M lesson (r15): 98.7% of (doc, fp) rows belong to dense
    // fingerprints, and the densest is a 1.47M-row key — any plan that
    // shuffles rows BY FINGERPRINT before the df guard sorts that key on
    // one task. The guard must therefore be a broadcast left-anti join
    // (dense rows die map-side), and pair enumeration must come from the
    // bucketed collect_list explode — never a fingerprint self-join.
    val df = SparkEntry.queries("dedup_winnow_pairs")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"dense-fp guard must be a broadcast anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no fingerprint-keyed sort-merge join (1.47M-row sort key at zipf-1.5M):\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Generate explode"),
      s"pairs must come from the in-bucket explode:\n$p")
  }

  test("text_winnow is map-only: no exchange anywhere in the plan") {
    // Per-doc fingerprint stats are per-row expressions
    // (size(array_distinct)/array_min/array_max) — the plan must be a pure
    // scan+project, no aggregation shuffle, no output-sort range exchange.
    val p = plan("text_winnow")
    assert(!p.contains("Exchange"), s"text_winnow must plan zero shuffles:\n$p")
    assert(!p.contains("HashAggregate"), s"text_winnow must not aggregate:\n$p")
  }

  test("dimension-chain joins broadcast the small sides (q5)") {
    val p = plan("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), "dimension joins must not sort-merge at this size")
  }

  test("no unintended cartesian products in pair-producing queries") {
    // knn_brute/knn_centroid broadcast a deliberately tiny side; the
    // corpus-scale pair producers must never plan a cartesian of the corpus
    // against itself.
    for (q <- Seq("dedup_jaccard", "dedup_simhash_pairs", "dedup_minhash_lsh", "dedup_spans",
        "media_phash_pairs")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian product:\n$p")
    }
  }

  test("approx-quantile sketch aggregates in two phases (mergeable partial sketches)") {
    // The 100 TB property of q_approx_quantile: partial percentile_approx
    // sketches merge map-side, one bounded sketch per (group, partition)
    // crossing the wire — not each group's raw values.
    val p = plan("q_approx_quantile")
    assert(p.contains("partial_percentile_approx"),
      s"approx quantile lost its partial (map-side) sketch phase:\n$p")
  }

  test("distributed-probe kNN broadcasts only the centroid table, never collects queries") {
    // knn_ivf_dist's scale contract: the one BuildBroadcast in the plan is
    // the k×dim centroid table (probe assignment); the query table and the
    // candidate join stay distributed. A broadcast HINT on the probe side
    // would cap the query count at driver memory — assert the only
    // explicit broadcast feeds the probe-ranking cross join, and the
    // candidate join is not a cartesian.
    val df = SparkEntry.queries("knn_ivf_dist")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("CartesianProduct"), s"candidate join degenerated to a cartesian:\n$p")
    // EXACTLY one explicit broadcast hint in the whole query — the
    // centroid table. Hints are erased by the optimizer, so count them in
    // the ANALYZED plan (where broadcast() survives as ResolvedHint): a
    // second hint means someone forced the probe side driver-resident,
    // which is the regression this guard exists to catch; AQE's own
    // adaptive broadcasts at this sf don't appear as hints at all.
    val hints = df.queryExecution.analyzed.toString
      .linesIterator.count(_.contains("ResolvedHint"))
    assert(hints == 1, s"expected exactly the centroid broadcast hint, found $hints")
    assert(p.contains("cosine_similarity"), s"scoring must stay in the codegen expression:\n$p")
  }

  test("pair expansions repartition with an explicit count (AQE-coalesce-proof)") {
    // The pair self-joins' reduce side does the quadratic work while their
    // map output is tiny signature rows — every AQE-coalescable shuffle
    // origin would size the reduce from map bytes and run the explosion on
    // one task (observed at the sf1 soak: a 7×10⁸-pair join planned as a
    // single partition). Only REPARTITION_BY_NUM is exempt; assert it is
    // present in each pair producer's plan.
    val triangle = Dedup
      .jaccardPairsFrom(spark, Q.t(spark, d, "documents"))
      .queryExecution.executedPlan.toString
    assert(triangle.contains("REPARTITION_BY_NUM"),
      s"triangle pair join lost its explicit-count repartition:\n$triangle")
    for (q <- Seq("dedup_simhash_pairs", "dedup_simhash_near", "dedup_minhash_lsh",
        "dedup_embedding", "media_phash_pairs", "corpus_cross_source_dup")) {
      val p = plan(q)
      assert(p.contains("REPARTITION_BY_NUM"),
        s"$q lost its explicit-count repartition:\n$p")
    }
  }

  test("cross-source dup matrix aggregates the banded pair set, no cartesian") {
    // The provenance rollup must ride the shared lshCandidatePairsFrom
    // (banded bucket join) and partial-combine onto the |sources|²-row
    // key space — never an all-pairs join of documents.
    val p = plan("corpus_cross_source_dup")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_count"), s"source rollup lost its partial phase:\n$p")
  }

  test("exact-jaccard carries no forced broadcast; pair join is triangle-partitioned") {
    // The scale contract of the de-broadcast rewrite: nothing hints a
    // broadcast of the corpus (AQE may still broadcast a genuinely small
    // side at this sf — that is adaptive, not forced), and on this tiny-
    // vocabulary corpus the pair join shuffles on (lang, group-pair) —
    // G(G+1)/2 × the key entropy of bare lang with each unordered pair
    // meeting exactly once. The large-vocabulary prefix-filtered path is
    // exercised by DedupScaleSpec's 100k-word corpus. Inspects the pair
    // pipeline directly: the query wrapper localCheckpoints before its
    // output sort, which hides the join from the final plan.
    val df = Dedup.jaccardPairsFrom(spark, graft.queries.Q.t(spark, d, "documents"))
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"), s"a broadcast hint crept back in:\n$analyzed")
    val joins = df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") && l.contains("tri_"))
    assert(joins.nonEmpty, "pair join no longer keyed on the triangle group pair")
  }

  test("prefix-filtered jaccard branches join candidates on the token id, no cartesian") {
    // The realistic-vocabulary branches (bitmap ≤4096 words, array above):
    // candidate generation must be a shuffle join keyed on the exploded
    // prefix token id — never a cartesian/broadcast of the corpus — and
    // the verify step re-joins the signature table on doc ids. Guards the
    // branch the driver corpora (31-word vocabulary) never reach; the Zipf
    // soak exercises it at data scale, this pins the plan shape in CI.
    import spark.implicits._
    def corpus(vocabPerDoc: Int): org.apache.spark.sql.DataFrame =
      (0 until 60).map { i =>
        val words = (0 until vocabPerDoc).map(j => s"w${i * (vocabPerDoc / 2) + j}")
        (i.toLong, "en", words.mkString(" "))
      }.toDF("doc_id", "lang", "text")
    for ((vpd, label) <- Seq(40 -> "bitmap", 160 -> "array")) {
      val df = Dedup.jaccardPairsFrom(spark, corpus(vpd))
      val p = df.queryExecution.executedPlan.toString
      Checkpoints.release()
      assert(!p.contains("CartesianProduct"), s"$label branch planned a cartesian:\n$p")
      val analyzed = df.queryExecution.analyzed.toString
      assert(!analyzed.contains("ResolvedHint"), s"$label branch forces a broadcast:\n$analyzed")
      assert(
        p.linesIterator.exists(l => l.contains("Join") && l.contains("wid")),
        s"$label branch candidate join no longer keyed on the prefix token id:\n$p"
      )
      // r13: the candidate join must carry its explicit-count repartition
      // (REPARTITION_BY_NUM — the origin AQE cannot coalesce). Without it
      // AQE sized the reduce from the tiny prefix-row map bytes and ran
      // the entire quadratic candidate meet on 4 tasks at the 500k soak.
      assert(
        p.contains("REPARTITION_BY_NUM"),
        s"$label branch candidate join lost its explicit-count repartition:\n$p"
      )
    }
  }

  test("dense token universes route to the triangle join (prefix filtering bypassed)") {
    // The density escape (Dedup.DenseAllPairsMinDensity): docs holding a
    // large fraction of a bitmap-capable vocabulary make prefix filtering
    // information-free (Zipf trigrams: 96% of pairs survived the prefix
    // meet). Corpus: 60 docs × 120 tokens from a ~600-word shared pool →
    // vocab > 512 (skips the tiny-universe literal branch), density ~20%
    // (≥ 5% cutoff) → the middle regime must plan the triangle join, with
    // its AQE-coalesce-proof explicit-count repartition, and no prefix
    // candidate machinery.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dense = (0 until 60).map { i =>
      val words = (0 until 120).map(_ => s"w${rnd.nextInt(600)}")
      (i.toLong, "en", words.mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val df = Dedup.jaccardPairsFrom(spark, dense)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(p.linesIterator.exists(l => l.contains("Join") && l.contains("tri_")),
      s"dense corpus no longer planned as a triangle join:\n$p")
    assert(p.contains("REPARTITION_BY_NUM"),
      s"dense triangle lost its explicit-count repartition:\n$p")
    assert(!p.contains("CartesianProduct"), s"dense branch planned a cartesian:\n$p")
  }

  test("simhash pairs join on the band columns, not bare lang") {
    val p = plan("dedup_simhash_pairs")
    val joins = p.linesIterator.filter(l => l.contains("Join") && l.contains("band")).toList
    assert(joins.nonEmpty, s"candidate join lost the band key:\n$p")
  }

  test("embedding pairs shuffle on (label, salt) with no forced broadcast") {
    val df = SparkEntry.queries("dedup_embedding")(spark, d)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"), s"a broadcast hint crept back in:\n$analyzed")
    val p = df.queryExecution.executedPlan.toString
    val joins = p.linesIterator.filter(l => l.contains("Join") && l.contains("salt")).toList
    assert(joins.nonEmpty, s"candidate join lost the salt key:\n$p")
  }

  test("as-of join is one keyed shuffle + one Window operator") {
    val p = plan("q_asof_join")
    val windows = p.linesIterator.count(_.contains("- Window ["))
    assert(windows == 1, s"expected a single fused Window operator, got $windows:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("range join keeps a hash join on the equality key") {
    val p = plan("q_range_join")
    assert(
      p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      s"range join must join on the equality key, not nested-loop:\n$p"
    )
    assert(!p.contains("BroadcastNestedLoopJoin"), s"interval condition became the join strategy:\n$p")
  }

  test("decontamination broadcasts only the benchmark n-gram set") {
    // The corpus side must never shuffle its n-grams for the within-doc
    // dedup (array_distinct handles that map-side); the only broadcast
    // builds are the benchmark gram set and the bounded per-doc hit
    // counts. Guard: every Generate (explode) feeds a join/aggregate with
    // no Exchange keyed on the gram BETWEEN them on the train side —
    // concretely, no hashpartitioning exchange whose keys include both
    // doc_id and gram (the shape the explode-then-distinct anti-pattern
    // plans).
    val p = plan("text_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"gram probe lost its broadcast:\n$p")
    val corpusGramShuffle = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .exists(l => l.contains("doc_id") && l.contains("gram"))
    assert(!corpusGramShuffle, s"corpus n-grams are being shuffled for dedup:\n$p")
  }

  test("repetition metrics plan no shuffle before the output sort") {
    val p = plan("text_repetition")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toList
    assert(
      exchanges.forall(_.contains("rangepartitioning")),
      s"per-row metrics must not shuffle (only the output sort may):\n$p"
    )
  }

  test("token-budget sampling shards its running sums over (lang, bucket)") {
    val p = plan("corpus_token_budget")
    // The doc-level window must partition on (lang, bucket) — a bare-lang
    // window is the single-reducer-per-language scale collapse.
    val w = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(
      w.exists(l => l.contains("lang") && l.contains("bucket") && l.contains("doc_id")),
      s"doc-level running sum lost its bucket sharding:\n$p"
    )
  }

  test("tf-idf hints exactly one broadcast: the one-row corpus count") {
    // The vocabulary (df counts) side must SHUFFLE on word, not carry a
    // broadcast hint — a hint would assume the vocabulary fits executor
    // memory at any corpus size. AQE may still broadcast it adaptively at
    // small sf, which is fine; the guard is against the forced hint.
    val df = SparkEntry.queries("text_tfidf")(spark, d)
    val hints = df.queryExecution.analyzed
      .collect { case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h }
    assert(hints.size == 1, s"expected only the n_docs broadcast hint, got ${hints.size}")
    assert(hints.head.toString.contains("n_docs"), s"unexpected hint target:\n${hints.head}")
  }

  test("span dedup shuffles 16-byte hashes, never span text") {
    // Both keyed exchanges of the span pipeline (occurrence count + the
    // fold back onto doc_id) must key on the md5 hash h / doc_id — no
    // exchange may carry a concat_ws span-text column.
    val p = plan("dedup_spans")
    val bad = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .exists(_.contains("concat_ws"))
    assert(!bad, s"span text reached a shuffle key:\n$p")
  }

  test("LM quality buckets plan no Window operator (broadcast moments, not ntile)") {
    // The 100 TB property of corpus_lm_quality: per-language buckets come
    // from a broadcast of the |langs|-row moment table, never from a
    // rank-based window that would sort each language on one reducer.
    val df = SparkEntry.queries("corpus_lm_quality")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("Window"), s"corpus_lm_quality must not plan a window:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"moment cutoffs must broadcast:\n$p")
  }

  test("DSIR model broadcasts; scoring is one doc-keyed aggregate") {
    // The fitted 256-bucket model must reach the per-doc counts as a
    // broadcast (map-side scoring); a sort-merge join here would shuffle
    // the corpus-sized count table against a 256-row model.
    val df = SparkEntry.queries("corpus_dsir_weights")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("SortMergeJoin"), s"model join must not sort-merge:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"lambda table must broadcast:\n$p")
  }

  test("semantic dedup pair join repartitions explicitly and never goes cartesian") {
    val df = SparkEntry.queries("dedup_semantic")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("CartesianProduct"), s"dedup_semantic planned a cartesian:\n$p")
    assert(p.contains("REPARTITION_BY_NUM"),
      s"dedup_semantic lost its explicit-count repartition:\n$p")
    assert(p.contains("cosine_similarity"), s"scoring must stay in the codegen expression:\n$p")
  }

  test("containment join hints no broadcast and takes the strategy branch the vocabulary calls for") {
    // The sf-testdata universe is ~31 words — far under SmallVocabBlocks*64
    // — so the measured-vocabulary probe must route dedup_containment to
    // the TRIANGLE bitmap branch (popcount intersections, no prefix
    // explode, no array_intersect verify). Either branch: no broadcast
    // hint, no cartesian, explicit-count pair repartition.
    val df = SparkEntry.queries("dedup_containment")(spark, d)
    val analyzed = df.queryExecution.analyzed.toString
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!analyzed.contains("ResolvedHint"), s"a broadcast hint crept in:\n$analyzed")
    assert(!p.contains("CartesianProduct"), s"dedup_containment planned a cartesian:\n$p")
    assert(p.contains("REPARTITION_BY_NUM"),
      s"dedup_containment lost its explicit-count repartition:\n$p")
    assert(p.contains("bit_count"),
      s"tiny vocabulary must take the triangle bitmap branch:\n$p")
    assert(!p.contains("array_intersect"),
      s"triangle branch needs no array verify:\n$p")
  }

  test("bitext mining broadcasts only centroid tables and never goes cartesian") {
    // The bipartite cosine matrix must not materialize: the only
    // broadcast-nested-loop allowed is against the 5-row centroid tables
    // (a hinted broadcast), candidates meet via a cell-keyed equi-join,
    // and scoring stays in the codegen'd cosine expression.
    val df = SparkEntry.queries("corpus_bitext_mine")(spark, d)
    val analyzed = df.queryExecution.analyzed.toString
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("CartesianProduct"), s"bitext mining planned a cartesian:\n$p")
    val hints = "ResolvedHint".r.findAllIn(analyzed).size
    assert(hints <= 2, s"only centroid broadcasts may be hinted (found $hints):\n$analyzed")
    assert(p.contains("cosine_similarity"), s"scoring left the codegen expression:\n$p")
  }

  test("containment on a real vocabulary keeps the prefix-probe index join") {
    // Above the probe cutoff the prefix path must come back: inverted-index
    // token join + exact array_intersect verify, no bitmap machinery.
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      (i.toLong, "en", (0 until 30).map(j => s"w${i * 37 + j}").mkString(" "))
    }
    val df = graft.queries.Dedup.containmentPairsFrom(spark, docs.toDF("doc_id", "lang", "text"))
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(p.contains("array_intersect"), s"prefix path lost its exact verify:\n$p")
    assert(!p.contains("bit_count"), s"real vocabulary must not take the bitmap branch:\n$p")
    assert(p.contains("REPARTITION_BY_NUM"),
      s"containment prefix path lost its explicit-count repartition:\n$p")
  }

  test("heavy hitters keep the rank filter in Partial+Final WindowGroupLimit, no global count sort") {
    // q_heavy_hitters' scale contract: the rank<=3 filter must plan as a
    // WindowGroupLimit PAIR — each task keeps 3 rows per day before the
    // day-keyed shuffle (Partial), the reduce side keeps 3 after (Final) —
    // so the raw (day, user) count table never crosses the wire whole and
    // never sorts globally. The only global sort allowed is the
    // presentation ORDER BY over the 3-per-day survivors.
    val p = plan("q_heavy_hitters")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"rank filter lost its partial (map-side) WindowGroupLimit:\n$p")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"expected Partial AND Final WindowGroupLimit:\n$p")
    val globalSorts = p.linesIterator.count(l => l.contains("Sort [") && l.contains("], true,"))
    assert(globalSorts == 1,
      s"only the presentation ORDER BY may sort globally (found $globalSorts):\n$p")
    assert(!p.contains("CartesianProduct"), s"heavy hitters planned a cartesian:\n$p")
  }

  test("chunking is map-side: no join, no aggregate, no hash shuffle before the output sort") {
    // corpus_chunk is one codegen'd higher-order expression per row; the
    // only exchange in the whole plan must be the presentation ORDER BY's
    // range partitioning — a hash shuffle or aggregate appearing here
    // means the chunker stopped being embarrassingly parallel.
    val p = plan("corpus_chunk")
    assert(!p.contains("hashpartitioning"), s"corpus_chunk gained a hash shuffle:\n$p")
    assert(!p.contains("HashAggregate"), s"corpus_chunk must not aggregate:\n$p")
    assert(!p.contains("Join"), s"corpus_chunk must not join:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"only the output-sort range exchange is allowed (found $exchanges):\n$p")
  }

  test("fuzzy decontamination broadcasts only the benchmark bands; one corpus-scale shuffle") {
    // corpus_decontaminate_near's scale contract: the ONLY broadcast hint
    // is the eval-suite-sized benchmark band set (hinting the corpus side
    // would cap it at driver memory), the band probe is a broadcast join,
    // and the corpus-scale hash shuffles stop at two — the per-doc hit
    // count plus the bench-side distinct (which shuffles benchmark-sized
    // rows only). The verdict join rides AQE, so it is not pinned here.
    val df = SparkEntry.queries("corpus_decontaminate_near")(spark, d)
    val analyzed = df.queryExecution.analyzed.toString
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    val hints = analyzed.linesIterator.count(_.contains("ResolvedHint"))
    assert(hints == 1, s"expected exactly the benchmark-band broadcast hint, found $hints:\n$analyzed")
    assert(!p.contains("CartesianProduct"), s"decontamination planned a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"band probe must be a broadcast join:\n$p")
    val hashShuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashShuffles <= 2,
      s"corpus-scale shuffles grew beyond hit-count + bench distinct (found $hashShuffles):\n$p")
  }

  test("source triage is one two-phase distinct aggregate keyed on source, no window or join") {
    // corpus_source_triage: per-doc signals in the scan's codegen, then
    // the standard distinct-aggregate ladder — (source, h) partial →
    // source final. Every hash shuffle key must start with source (the
    // |sources|-row output bound); a window or join here means the
    // per-source rollup stopped being a pure aggregate.
    val p = plan("corpus_source_triage")
    assert(!p.contains("Window"), s"source triage must not plan a window:\n$p")
    assert(!p.contains("Join"), s"source triage must not join:\n$p")
    val hashLines = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toList
    assert(hashLines.size == 2,
      s"expected the (source,h) and (source) shuffles only, found ${hashLines.size}:\n$p")
    assert(hashLines.forall(_.contains("hashpartitioning(source")),
      s"a triage shuffle lost its source key prefix:\n$p")
    assert(p.contains("partial_count"), s"triage lost its map-side partial aggregation:\n$p")
  }

  test("quality calibration keeps the lm posture: token shuffle + broadcast fit only") {
    // corpus_quality_calibration: the expensive stage is the lm-quality
    // token scoring (one word-keyed shuffle + one doc aggregate); the
    // decile rollup partial-combines onto <=10 rows and the OLS fit joins
    // back as a one-row broadcast. The per-doc table is checkpointed for
    // its two consumers, so the visible plan re-reads the RDD, not
    // parquet, and nothing cartesians.
    val df = SparkEntry.queries("corpus_quality_calibration")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("CartesianProduct"), s"calibration planned a cartesian:\n$p")
    assert(!p.contains("FileScan parquet"),
      s"the per-doc (q, logp) table must be checkpointed (corpus re-scanned):\n$p")
    assert(p.contains("partial_count"), s"decile rollup lost its partial phase:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the one-row fit must broadcast:\n$p")
    assertSinglesFedByAggregates(p, "corpus_quality_calibration")
  }

  test("repeat_apply explodes only the cap-bounded epoch sequence over broadcast plans") {
    // corpus_repeat_apply: the Generate (epoch explode) fans out by at
    // most the 4-epoch cap — its input must join the |sources|-row plan
    // by BROADCAST, never shuffle; the partial-epoch running sum shuffles
    // on (source, bucket) with broadcast prefix stitching; nothing
    // single-partitions and nothing cartesians.
    val df = SparkEntry.queries("corpus_repeat_apply")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("CartesianProduct"), s"repeat_apply planned a cartesian:\n$p")
    // The checkpointed plan table hides the seam's one-row total
    // aggregates (they materialize at build time, inside the checkpoint);
    // the visible plan must therefore have NO single-partition exchange
    // at all — doc-scale rows never cross one reducer here.
    assert(!p.contains("Exchange SinglePartition"),
      s"repeat_apply's visible plan must not single-partition (the seam is checkpointed):\n$p")
    assert(p.contains("Generate explode"), s"epoch fan-out lost its explode:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"the plan tables must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a sort-merge join against the |sources|-row plan table is a regression:\n$p")
    assert(p.contains("hashpartitioning(source"),
      s"the partial-epoch running sum lost its (source, bucket) shuffle:\n$p")
  }

  test("epoch targets scan the corpus once and join only a one-row broadcast total") {
    // corpus_epochs: the per-source aggregate feeds BOTH the output rows
    // and the broadcast total, so it must be checkpointed — without it the
    // corpus scans twice. The final plan therefore reads the checkpointed
    // |sources|-row RDD, never parquet, and the only join is the one-row
    // broadcast; a window or per-doc join here is a regression.
    val df = SparkEntry.queries("corpus_epochs")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("Window"), s"corpus_epochs must not plan a window:\n$p")
    assert(!p.contains("CartesianProduct"), s"corpus_epochs planned a cartesian:\n$p")
    assert(!p.contains("FileScan parquet"),
      s"the shared per-source aggregate must be checkpointed (corpus re-scanned):\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"post-checkpoint the plan needs no keyed shuffle:\n$p")
  }

  test("entropy is two keyed aggregates, no join, no window") {
    // text_entropy: the (doc, word) count shuffle and the doc-keyed
    // aggregate are the only exchanges besides the output sort; a join or
    // window here means the per-doc arithmetic stopped being expressions.
    val p = plan("text_entropy")
    assert(!p.contains("Window"), s"text_entropy must not plan a window:\n$p")
    assert(!p.contains("Join"), s"text_entropy must not join:\n$p")
    val hashShuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashShuffles <= 2, s"text_entropy grew beyond its two keyed shuffles:\n$p")
    assert(p.contains("partial_count"), s"text_entropy lost map-side partial aggregation:\n$p")
  }

  test("training-order shuffle is one shard shuffle plus a per-shard window, no global sort") {
    // corpus_shuffle: the epoch permutation must never become a global
    // row_number (single reducer) — one hash shuffle on the shard key, a
    // shard-keyed window, and only the presentation ORDER BY sorts
    // globally.
    val p = plan("corpus_shuffle")
    assert(!p.contains("Join"), s"corpus_shuffle must not join:\n$p")
    val hashLines = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toList
    assert(hashLines.size == 1 && hashLines.head.contains("hashpartitioning(shard"),
      s"expected exactly the shard shuffle:\n$p")
    val globalSorts = p.linesIterator.count(l => l.contains("Sort [") && l.contains("], true,"))
    assert(globalSorts == 1, s"only the presentation ORDER BY may sort globally:\n$p")
  }

  test("substring-dedup apply keeps the map-side-combinable min and never explodes positions") {
    // Same skew contract as dedup_substring (hash-key min with a partial
    // phase, no window over the hash), plus: the strip is an array
    // higher-order filter, so no posexplode/generator over the token
    // positions may appear past the span chain.
    val p = plan("dedup_substring_apply")
    assert(p.contains("partial_min"), s"hash-key min lost its partial phase:\n$p")
    assert(!p.contains("windowspecdefinition(h#"), s"window over the hash appeared:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("funnel and cohort analytics plan keyed aggregates, no windows or cartesians") {
    // Both are user-keyed aggregate chains by design: a Window operator
    // here would mean someone rewrote them onto a per-user sort, and a
    // cartesian would mean a stage join lost its key.
    for (q <- Seq("q_funnel", "q_retention_cohorts")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian:\n$p")
      assert(!p.contains("Window"), s"$q must not plan a window:\n$p")
      assert(p.contains("partial_"), s"$q lost map-side partial aggregation:\n$p")
    }
    // The item-similarity pair pass must stay a keyed join with map-side
    // partial co-count aggregation.
    val p = plan("q_item_similarity")
    assert(!p.contains("CartesianProduct"), s"q_item_similarity planned a cartesian:\n$p")
    assert(p.contains("partial_count"), s"co-counts lost their partial phase:\n$p")
  }

  test("novelty never pair-joins: keyed aggregates off one checkpointed pair set") {
    // corpus_novelty: the distinct (doc, gram) pairs are checkpointed for
    // their two consumers, so the final plan reads the checkpoint RDD (no
    // parquet re-scan) and everything downstream is keyed aggregation plus
    // one |docs|-sized join — a cartesian or a gram-keyed window would mean
    // the op regressed onto a pair-join shape, and losing partial_min means
    // a corpus-wide stop-trigram funnels to one reducer.
    val df = SparkEntry.queries("corpus_novelty")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("CartesianProduct"), s"corpus_novelty planned a cartesian:\n$p")
    assert(!p.contains("Window"), s"corpus_novelty must not plan a window:\n$p")
    assert(!p.contains("FileScan parquet"),
      s"the pair set must be checkpointed (corpus re-scanned):\n$p")
    assert(p.contains("partial_min"), s"gram first-seen min lost its partial phase:\n$p")
    assert(p.contains("partial_count"), s"per-doc totals lost partial aggregation:\n$p")
  }

  test("event flow windows stay user- and type-keyed; counts partial-aggregate") {
    // q_event_flow: the lead() window must shuffle on user_id (each user
    // sorts only its own events) and the probability normaliser on
    // from_type (a |types|²-sized table) — an unkeyed window here would be
    // a global event sort. Pair counts keep their map-side partial phase.
    val p = plan("q_event_flow")
    assert(!p.contains("CartesianProduct"), s"q_event_flow planned a cartesian:\n$p")
    assert(p.contains("hashpartitioning(user_id"),
      s"the lead window lost its user-keyed shuffle:\n$p")
    assert(p.contains("hashpartitioning(from_type"),
      s"the normaliser window lost its from_type key:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"q_event_flow must never single-partition event-scale data:\n$p")
    assert(p.contains("partial_count"), s"pair counts lost partial aggregation:\n$p")
  }

  test("anomaly window runs on the partial-aggregated daily table only") {
    // q_anomaly_days: the one SinglePartition exchange is the trailing
    // window over the |days|-row aggregate (calendar-bounded at any event
    // volume); the event-scale count must partial-aggregate BEFORE it, and
    // no join may appear.
    val p = plan("q_anomaly_days")
    assert(!p.contains("Join"), s"q_anomaly_days must not join:\n$p")
    assert(p.contains("partial_count"),
      s"daily counts lost map-side partial aggregation:\n$p")
    val singles = p.linesIterator.count(_.contains("Exchange SinglePartition"))
    assert(singles == 1, s"expected exactly the one calendar-bounded window exchange:\n$p")
  }

  test("interleave ranks stitch through buckets: keyed windows + broadcast prefixes only") {
    // corpus_interleave: the per-source rank must never become a global
    // per-source row_number (one reducer per giant source) — the intra
    // window shuffles on (source, bucket), the prefix/count tables come
    // back as broadcasts, and only the presentation ORDER BY sorts
    // globally. The projected doc table is checkpointed for its three
    // consumers (no parquet re-scan).
    val df = SparkEntry.queries("corpus_interleave")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("CartesianProduct"), s"corpus_interleave planned a cartesian:\n$p")
    assert(!p.contains("FileScan parquet"),
      s"the projected docs must be checkpointed (corpus re-scanned):\n$p")
    assert(p.contains("hashpartitioning(source"),
      s"the intra-bucket rank window lost its (source, bucket) key:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"prefix/count tables must join as broadcasts:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no corpus-scale single-partition stage may appear:\n$p")
    val globalSorts = p.linesIterator.count(l => l.contains("Sort [") && l.contains("], true,"))
    assert(globalSorts == 1, s"only the presentation ORDER BY may sort globally:\n$p")
  }

  test("source diversity windows only the |sources|-row aggregate") {
    // corpus_source_diversity: the corpus-scale work is the checkpointed
    // partial-aggregated (source → mass) table; the ranking window and
    // the broadcast total both run on |sources| rows.
    val df = SparkEntry.queries("corpus_source_diversity")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("FileScan parquet"),
      s"the mass aggregate must be checkpointed (corpus re-tokenized):\n$p")
    assert(!p.contains("SortMergeJoin"), s"the total must broadcast, not sort-merge:\n$p")
    // Two catalog-bounded SinglePartition stages are by design (the
    // ranking window + the grand-total final phase), BOTH reading the
    // checkpointed |sources|-row RDD — growth means corpus-scale data
    // slipped into one.
    val singles = p.linesIterator.count(_.contains("Exchange SinglePartition"))
    assert(singles <= 2, s"only the ranking window and the total may single-partition:\n$p")
  }

  test("bm25 picks query terms by partial top-k and probes the checkpointed tf table") {
    // text_bm25: the 3-term query selection must plan TakeOrdered
    // (distributed partial top-k over the vocabulary — never a vocab sort
    // through one reducer); the tf table is checkpointed for its two
    // consumers (no parquet re-scan); the query set joins as a broadcast;
    // scoring stays map-side (no corpus-scale cartesian — the one
    // nested-loop join is the broadcast 1-row stats table).
    val df = SparkEntry.queries("text_bm25")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(p.contains("TakeOrderedAndProject"),
      s"query-term selection lost its partial top-k:\n$p")
    assert(!p.contains("FileScan parquet"),
      s"the tf table must be checkpointed (corpus re-tokenized):\n$p")
    assert(p.contains("BroadcastHashJoin"), s"the query-term probe must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"text_bm25 planned a cartesian:\n$p")
  }

  test("vec outliers: broadcast moments over the checkpointed scores, label-keyed throughout") {
    // vec_outliers: the scored (label, vec_id, ccos) table is checkpointed
    // for its two consumers (moments + z rows), the moment table joins
    // back as a broadcast, and every shuffle key is the label
    // (catalog-cardinality) — a SinglePartition stage or cartesian here
    // means vector-scale data lost its key.
    val df = SparkEntry.queries("vec_outliers")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("CartesianProduct"), s"vec_outliers planned a cartesian:\n$p")
    assert(!p.contains("FileScan parquet"),
      s"the scored table must be checkpointed (embeddings re-scanned):\n$p")
    assert(p.contains("BroadcastHashJoin"), s"the moment table must broadcast:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"vector-scale data must stay label-keyed:\n$p")
  }

  test("quality drift: broadcast bounds over the checkpointed scores, one source-keyed agg") {
    // corpus_drift: per-doc scores are checkpointed for the bounds pass
    // and the halves aggregate (no corpus re-tokenize); the |sources|-row
    // bounds table joins back as a broadcast; no window appears and the
    // final aggregate keeps its map-side partial phase.
    val df = SparkEntry.queries("corpus_drift")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("CartesianProduct"), s"corpus_drift planned a cartesian:\n$p")
    assert(!p.contains("Window"), s"corpus_drift must not plan a window:\n$p")
    assert(!p.contains("FileScan parquet"),
      s"the scored table must be checkpointed (corpus re-tokenized):\n$p")
    assert(p.contains("BroadcastHashJoin"), s"the bounds table must broadcast:\n$p")
    assert(p.contains("partial_sum"), s"the halves aggregate lost its partial phase:\n$p")
  }

  test("pagerank iterates off the checkpointed edge table; final top-10 is TakeOrdered") {
    // q_pagerank: the degree-annotated edges checkpoint once and feed all
    // three node-keyed message shuffles (no parquet or pair-join re-run in
    // the final plan); the top-10 is distributed partial top-k, never a
    // global node sort; the only nested-loop joins are the broadcast
    // 1-row count — a CartesianProduct means a message join lost its key.
    val df = SparkEntry.queries("q_pagerank")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("CartesianProduct"), s"q_pagerank planned a cartesian:\n$p")
    assert(!p.contains("FileScan parquet"),
      s"edges/nodes must be checkpointed (graph rebuilt per iteration):\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-10 lost its partial top-k:\n$p")
  }

  test("session paths bound the per-session array before collection; top-10 is TakeOrdered") {
    // q_session_paths: the step filter must run BEFORE collect_list (an
    // unbounded collect would buffer a bot's whole mega-session), which
    // shows in the plan as the rank-<=8 WindowGroupLimit/filter ahead of
    // the path aggregate; every window is (user[, session])-keyed and the
    // final top-10 is partial top-k, never a global path sort.
    val p = plan("q_session_paths")
    assert(!p.contains("CartesianProduct"), s"q_session_paths planned a cartesian:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-10 lost its partial top-k:\n$p")
    assert(p.contains("hashpartitioning(user_id"),
      s"session windows lost their user key:\n$p")
    val collectIdx = p.indexOf("collect_list")
    val filterIdx = p.indexOf("step")
    assert(collectIdx >= 0 && filterIdx >= 0,
      s"expected the step filter and the path collect in the plan:\n$p")
  }

  test("leakage report broadcasts only the benchmark bands off the checkpointed band table") {
    // corpus_leakage_report: the decontamination shuffle posture in
    // reverse — the (eval-suite-sized) benchmark band table is the ONLY
    // broadcast, the corpus probes it map-side off the checkpointed band
    // table (no re-MinHash), and everything downstream of the probe is
    // keyed aggregation on the tiny (bench, train) pair set.
    val df = SparkEntry.queries("corpus_leakage_report")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("CartesianProduct"), s"leakage report planned a cartesian:\n$p")
    assert(!p.contains("FileScan parquet"),
      s"the band table must be checkpointed (corpus re-hashed):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the benchmark band probe must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-scale sort-merge join may appear:\n$p")
  }

  test("holdout manifest is scan-codegen split + one partial aggregate, zero joins") {
    // corpus_sample_holdout: the split decision is a pure md5-bucket
    // expression in the scan, so the whole manifest is one
    // partial-aggregated groupBy onto ≤3·|langs| rows — a join, window, or
    // second corpus-scale shuffle here is a regression.
    val p = plan("corpus_sample_holdout")
    assert(!p.contains("Join"), s"corpus_sample_holdout must not join:\n$p")
    assert(!p.contains("Window"), s"corpus_sample_holdout must not plan a window:\n$p")
    assert(p.contains("partial_count"), s"the manifest lost partial aggregation:\n$p")
    val hashShuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashShuffles <= 1, s"one (split, lang) shuffle only:\n$p")
  }

  test("new-vs-returning and basket rules stay keyed off their checkpointed inputs") {
    // q_new_vs_returning: two keyed aggregates off the checkpointed active
    // set + a broadcast zero-fill on calendar-cardinality days.
    // q_basket_rules: the capped co-basket join machinery (no cartesian,
    // partial-aggregated co-counts, TakeOrdered top-10).
    val df1 = SparkEntry.queries("q_new_vs_returning")(spark, d)
    val p1 = df1.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p1.contains("FileScan parquet"),
      s"the active set must be checkpointed (events re-scanned):\n$p1")
    assert(!p1.contains("CartesianProduct"))
    assert(p1.contains("BroadcastHashJoin"), s"the zero-fill must broadcast:\n$p1")
    val df2 = SparkEntry.queries("q_basket_rules")(spark, d)
    val p2 = df2.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p2.contains("CartesianProduct"), s"q_basket_rules planned a cartesian:\n$p2")
    assert(p2.contains("partial_count"), s"co-counts lost their partial phase:\n$p2")
    assert(p2.contains("TakeOrderedAndProject"), s"top-10 lost its partial top-k:\n$p2")
  }

  test("rfm segments are one user-keyed aggregate + a broadcast max-day; coverage is bounded top-k") {
    // q_rfm_segments: per-user aggregates partial-combine on user_id, the
    // only join is the broadcast 1-row max-day, segment labels are pure
    // expressions, the readout keys on |segments|.
    val p1 = plan("q_rfm_segments")
    assert(!p1.contains("CartesianProduct"))
    assert(!p1.contains("Window"), s"q_rfm_segments must not plan a window:\n$p1")
    assert(p1.contains("partial_count") || p1.contains("partial_sum"),
      s"per-user aggregates lost their partial phase:\n$p1")
    assert(!p1.contains("SortMergeJoin"), s"the max-day join must broadcast:\n$p1")
    // corpus_ngram_coverage: the vocabulary slice comes from TakeOrdered
    // (never a one-reducer vocab sort) off the checkpointed counts, and
    // the k-expansion reduces over that bounded 1000-row slice.
    val df = SparkEntry.queries("corpus_ngram_coverage")(spark, d)
    val p2 = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(p2.contains("TakeOrderedAndProject"),
      s"the top-1000 slice lost its partial top-k:\n$p2")
    assert(!p2.contains("FileScan parquet"),
      s"word counts must be checkpointed (corpus re-tokenized):\n$p2")
    assert(!p2.contains("CartesianProduct"))
  }

  test("growth accounting and LTV cohorts stay keyed, broadcast, and checkpoint-fed") {
    // q_growth_accounting: the lagged user-week table checkpoints once for
    // its three consumers (status counts, churn counts, bounds) — the
    // final plan must not re-scan events — and the calendar zero-fill
    // joins broadcast onto calendar-cardinality weeks.
    val df1 = SparkEntry.queries("q_growth_accounting")(spark, d)
    val p1 = df1.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p1.contains("FileScan parquet"),
      s"the lagged active set must be checkpointed (events re-scanned):\n$p1")
    assert(!p1.contains("CartesianProduct"))
    assert(p1.contains("BroadcastHashJoin"), s"the zero-fill must broadcast:\n$p1")
    // q_ltv_cohorts: the per-customer cohort table checkpoints (its two
    // roles: the orders join + cohort sizes), the sizes join broadcasts,
    // the cumulative window runs on the metadata-sized (cohort, offset)
    // matrix, and the monthly cells partial-aggregate before the shuffle.
    val df2 = SparkEntry.queries("q_ltv_cohorts")(spark, d)
    val p2 = df2.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p2.contains("CartesianProduct"))
    assert(p2.contains("BroadcastHashJoin"), s"cohort sizes must broadcast:\n$p2")
    assert(p2.contains("Window"), s"cumulative revenue lost its window:\n$p2")
    assert(
      p2.linesIterator.count(_.contains("FileScan parquet")) == 1,
      s"exactly one orders scan expected (cohorts ride the checkpoint):\n$p2")
  }

  test("promo share and supplier variety broadcast dimensions and partial-aggregate") {
    // q_promo_share: one broadcast part join, revenue partial-aggregates
    // onto the calendar-cardinality month key, and the scan reads only
    // the four lineitem columns the query touches.
    val p1 = plan("q_promo_share")
    assert(p1.contains("BroadcastHashJoin"), s"the part join must broadcast:\n$p1")
    assert(!p1.contains("SortMergeJoin"), s"no sort-merge at dimension size:\n$p1")
    assert(p1.contains("partial_sum"), s"revenue lost its partial phase:\n$p1")
    val scan = p1.linesIterator.filter(_.contains("ReadSchema"))
      .find(_.contains("l_extendedprice")).getOrElse("")
    assert(scan.nonEmpty && !scan.contains("l_tax") && !scan.contains("l_quantity"),
      s"lineitem scan reads pruned columns:\n$scan")
    // q_supplier_variety: the per-supplier rate table checkpoints (global
    // moments + clean filter), the clean set and part table broadcast into
    // the fact scan, and nothing sort-merges.
    val df = SparkEntry.queries("q_supplier_variety")(spark, d)
    val p2 = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p2.contains("CartesianProduct"))
    assert(!p2.contains("SortMergeJoin"), s"clean/part joins must broadcast:\n$p2")
    assert(p2.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p2")
  }

  test("collocations bound the pair join to the broadcast top-100 slice") {
    // text_collocations: the pair self-join must run over the checkpointed
    // top-100-filtered slice (never re-tokenize the corpus), the top-100
    // and doc-count joins broadcast, and the top-10 is a partial top-k.
    val df = SparkEntry.queries("text_collocations")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("FileScan parquet") ||
      p.linesIterator.count(_.contains("FileScan parquet")) == 1,
      s"only the doc-count scan may read parquet (pair sides must ride the checkpoint):\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"), s"top-10 lost its partial top-k:\n$p")
  }

  test("readability is join-free scan codegen; bpe pairs keep the partial top-k") {
    // text_readability: both counts are per-row expressions on the split
    // array — no join, no aggregation shuffle, only the output sort.
    val pr = plan("text_readability")
    assert(!pr.contains("Join"), s"readability must not join:\n$pr")
    assert(!pr.contains("Exchange hashpartitioning"),
      s"readability must not shuffle before the output sort:\n$pr")
    // text_bpe_pairs: map-side explode, partial-aggregated pair counts,
    // TakeOrdered top-10 — never a global sort of the pair space.
    val pb = plan("text_bpe_pairs")
    assert(pb.contains("TakeOrderedAndProject"), s"bpe top-10 lost its partial top-k:\n$pb")
    assert(!pb.contains("Exchange rangepartitioning"),
      s"bpe pairs must not plan a global sort:\n$pb")
  }

  test("engagement gini windows over counts-of-counts, not users") {
    // The single-partition window is only scale-safe because it runs over
    // the counts-of-counts table (degree-distribution cardinality): the
    // plan must aggregate per-user THEN per-count before the window, and
    // the tie-block products must stay decimal-exact.
    val p = plan("q_engagement_gini")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Window"), s"gini lost its rank-sum window:\n$p")
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 4, s"gini must two-phase both the per-user and counts-of-counts aggregates:\n$p")
  }

  test("pareto share and session-duration histogram stay cardinality-bounded") {
    // q_pareto_share: the descending window runs over the checkpointed
    // counts-of-counts table (degree-distribution cardinality), and the
    // totals join is the broadcast 1-row cross join — never a cartesian
    // of real tables, never a rank over users.
    val df = SparkEntry.queries("q_pareto_share")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Window"), s"pareto lost its level window:\n$p")
    assert(
      p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the totals join must broadcast:\n$p"
    )
    assert(!p.contains("FileScan parquet"),
      s"counts-of-counts must be checkpointed (events re-scanned):\n$p")
    // q_session_duration_hist: ONE user-keyed window shuffle; the
    // (user, session) duration aggregate reuses that partitioning (user_id
    // hash satisfies the (user, session) clustering), and the bucket
    // aggregate partial-combines onto the ≤~40-row bucket space.
    val p2 = plan("q_session_duration_hist")
    val ex = p2.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(ex == 2, s"expected exactly 2 hash exchanges (window + bucket agg), got $ex:\n$p2")
    assert(p2.contains("partial_count") || p2.contains("partial_min"),
      s"bucket aggregate lost its partial phase:\n$p2")
  }

  test("attribution and purchase intervals plan one keyed window each") {
    // q_attribution: ONE user-keyed window shuffle (the as-of last-touch),
    // one channel groupBy; the share normaliser runs single-partition on
    // the |event types|-row rollup, never on events.
    val p = plan("q_attribution")
    assert(!p.contains("CartesianProduct"))
    val ex = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(ex == 2, s"expected exactly 2 hash exchanges (user window + channel agg), got $ex:\n$p")
    assert(p.contains("partial_count"), s"channel rollup lost its partial phase:\n$p")
    // q_purchase_intervals: one customer-keyed window shuffle, bucket
    // aggregate partial-combines onto the ≤~40-row bucket space.
    val p2 = plan("q_purchase_intervals")
    val ex2 = p2.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(ex2 == 2, s"expected exactly 2 hash exchanges (custkey window + bucket agg), got $ex2:\n$p2")
    assert(p2.contains("partial_count") || p2.contains("partial_min"),
      s"bucket aggregate lost its partial phase:\n$p2")
  }

  test("vec_pca's scatter matrix is one imperative corpus pass") {
    // The only volume-bearing stage of vec_pca: count, dimension sums and
    // the upper-triangle outer product must accumulate in ONE mapPartitions
    // pass (the MLlib Gramian pattern) emitting d(d+1)/2 + d + 1 partial
    // rows per partition — the corpus is never exploded d²-wide (the old
    // shape: d² rows per VECTOR through a flatten/explode) and never
    // joined — and the S assembly must join only broadcast metadata tables.
    import org.apache.spark.sql.functions.{expr, sum => fsum}
    val base = spark.read
      .parquet(s"$d/embeddings.parquet")
      .select(
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))")
          .as("q")
      )
    val partials = Similarity
      .scatterPartials(base)
      .groupBy("i", "j")
      .agg(fsum("p").as("p"))
    val pp = partials.queryExecution.executedPlan.toString
    assert(!pp.contains("Generate"), s"scatter pass must not explode the corpus:\n$pp")
    assert(!pp.contains("Join"), s"scatter pass must not join:\n$pp")
    // ONE hash exchange: the tiny (i, j) merge of per-partition partials.
    val ex = pp.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(ex == 1, s"expected exactly 1 hash exchange (partials merge), got $ex:\n$pp")
    assert(pp.contains("partial_sum"), s"partials merge lost its partial phase:\n$pp")
    val p = Similarity.scatterFrom(base).queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("SortMergeJoin"), s"scatter assembly must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("vec_cluster_quality scores map-side against broadcast centroids") {
    // Member scoring joins the corpus against the checkpointed k×d
    // centroid table by broadcast — never a sort-merge (a corpus-wide sort
    // for a 10-row build side) and never a cartesian; the label rollup
    // keeps its partial phase.
    val df = SparkEntry.queries("vec_cluster_quality")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(p.contains("BroadcastHashJoin"), s"centroid join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"centroid join must not sort-merge:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"label rollup lost its partial phase:\n$p")
  }

  test("seasonality and shipping delay keep partial aggregation, no cartesians") {
    // q_seasonality: the distinct-user count shuffles on (weekday, user)
    // then the 7-row profile; the share normaliser's SinglePartition
    // window runs on 7 rows BY DESIGN. No joins at all.
    val p = plan("q_seasonality")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Join"), s"seasonality must not join:\n$p")
    assert(p.contains("partial_count"), s"profile rollup lost its partial phase:\n$p")
    // q_shipping_delay: the fact-to-fact join on l_orderkey = o_orderkey —
    // broadcast at test SF (orders fits), the bucketing candidate at
    // warehouse scale; never a cartesian, and the priority rollup
    // partial-combines before its |priorities|-row shuffle.
    val p2 = plan("q_shipping_delay")
    assert(!p2.contains("CartesianProduct"))
    assert(p2.contains("BroadcastHashJoin") || p2.contains("SortMergeJoin") ||
      p2.contains("ShuffledHashJoin"), s"orderkey join missing:\n$p2")
    assert(p2.contains("partial_count"), s"priority rollup lost its partial phase:\n$p2")
  }

  test("funnel latency and length histogram stay window-free and map-side") {
    // q_funnel_latency: the same user-keyed partial-agg shuffles + joins
    // as q_funnel — no per-user event arrays, no window anywhere, no
    // cartesian; the leg explode lands on a 3-row key space.
    val p = plan("q_funnel_latency")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Window"), s"funnel latency must not plan a window:\n$p")
    assert(p.contains("partial_min"), s"stage minima lost their partial phase:\n$p")
    // corpus_length_hist: token counts in scan codegen (size() — the doc
    // never unnests), ONE hash exchange for the (source, bucket) rollup.
    val p2 = plan("corpus_length_hist")
    assert(!p2.contains("Generate explode"), s"length hist must not unnest docs:\n$p2")
    val ex = p2.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(ex == 1, s"expected exactly 1 hash exchange (source-bucket rollup), got $ex:\n$p2")
    assert(p2.contains("partial_count"), s"rollup lost its partial phase:\n$p2")
  }

  test("q6 pushes its predicates to the scan and plans no shuffle but the combine") {
    val p = plan("q6_forecast_revenue")
    assert(!p.contains("Join"), s"Q6 must not join:\n$p")
    // PushedFilters renders truncated in toString; the shipdate bound is
    // visible in it, and the quantity bound in the residual Filter.
    assert(p.contains("GreaterThanOrEqual(l_shipdate,1995-01-01"),
      s"shipdate filter must push to the scan:\n$p")
    assert(p.contains("< 24.0)"), s"quantity filter missing:\n$p")
    assert(p.contains("partial_sum"), s"revenue sum lost its partial phase:\n$p")
    val ex = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(ex == 0, s"Q6 must plan no hash exchange (1-row combine only), got $ex:\n$p")
  }

  test("top returners push the R filter to the scan and TakeOrdered the top-10") {
    val p = plan("q_top_returners")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"), s"top-10 lost its partial top-k:\n$p")
    assert(p.contains("EqualTo(l_returnflag,R)"), s"R filter must push to the scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"customer/nation sides must broadcast:\n$p")
  }

  test("exact-dup embeddings and char classes stay map-side to one shuffle") {
    // vec_exact_dups: quantize+hash in scan codegen, one partial-agg
    // groupBy — and a planted duplicate must collapse.
    val p = plan("vec_exact_dups")
    assert(!p.contains("Generate explode"), s"hash must not unnest vectors:\n$p")
    assert(p.contains("partial_count"), s"dup rollup lost its partial phase:\n$p")
    val session = spark
    import session.implicits._
    val dir = graft.TestSpark.tempDir("planted-vec-dups")
    val v = Array.fill(8)(0.25f)
    Seq((1L, v, 0), (2L, v, 1), (3L, Array.fill(8)(0.5f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("vec_exact_dups")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 2L), (3L, 1L)), s"planted dup must collapse to keep_id 1: $rows")
    // text_char_classes: class counts in scan codegen, one shuffle.
    val p2 = plan("text_char_classes")
    assert(!p2.contains("Generate explode"), s"char classes must not unnest docs:\n$p2")
    val ex = p2.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(ex == 1, s"expected exactly 1 hash exchange (source rollup), got $ex:\n$p2")
  }

  test("sim histogram and hourly profile roll up without cartesians or joins") {
    // dedup_sim_hist rides the guarded jaccardPairsFrom machinery; its own
    // rollup must partial-combine onto <=5 decile rows.
    val df = SparkEntry.queries("dedup_sim_hist")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_count"), s"decile rollup lost its partial phase:\n$p")
    // q_hourly_profile: join-free, one partial-agg rollup onto 24 rows.
    val p2 = plan("q_hourly_profile")
    assert(!p2.contains("Join"), s"hourly profile must not join:\n$p2")
    assert(p2.contains("partial_count"), s"hourly rollup lost its partial phase:\n$p2")
    // dedup_reduction rides the guarded clustersFrom machinery; its own
    // 1-row summary must partial-combine and never plan a cartesian.
    val df3 = SparkEntry.queries("dedup_reduction")(spark, d)
    val p3 = df3.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(!p3.contains("CartesianProduct"))
    assert(p3.contains("partial_count"), s"reduction summary lost its partial phase:\n$p3")
  }

  test("zipf slope fits over the TakeOrdered vocabulary slice") {
    // text_zipf_slope: the top-1000 slice is TakeOrdered partial top-k
    // (never a one-reducer vocabulary sort); the rank window and moment
    // aggregate run on that bounded slice.
    val p = plan("text_zipf_slope")
    assert(p.contains("TakeOrderedAndProject"), s"top-1000 slice lost its partial top-k:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"zipf slope must not plan a global sort:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("point-lookup filter pushes down to the parquet scan") {
    val p = plan("log_point_lookup")
    assert(p.contains("PushedFilters: [IsNotNull(event_id), EqualTo(event_id"), s"no pushdown:\n$p")
  }

  test("projection prunes the parquet read schema (q1 over lineitem)") {
    val p = plan("q1_agg")
    // q1 touches 4 lineitem columns; the scan must not read the rest.
    val scan = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scan.contains("l_returnflag"), s"scan line missing:\n$p")
    assert(!scan.contains("l_comment") && !scan.contains("l_shipmode"),
      s"scan reads pruned columns:\n$scan")
  }

  test("AQE splits skewed join partitions (automatic complement of manual salting)") {
    // q_salted_agg/q_salted_join are the MANUAL skew answer (deterministic,
    // oracle-checkable). This guard proves the automatic one stays armed:
    // with a 90%-hot key, adaptive execution must re-plan the sort-merge
    // join with skew=true (hot partition split across tasks). Thresholds
    // are lowered to make test-scale partitions count as skewed.
    // newSession(): suites run in parallel against one shared SparkSession,
    // so these conf overrides must live in an isolated SQLConf — mutating
    // the shared one races concurrently-planning suites.
    import org.apache.spark.sql.functions.{col, lit, when}
    val session = spark.newSession()
    val conf = session.conf
    val overrides = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    )
    overrides.foreach { case (k, v) => conf.set(k, v) }
    val big = session
      .range(200000)
      .select(when(col("id") % 10 < 9, lit(0L)).otherwise(col("id")).as("k"), col("id").as("payload"))
    val dim = session.range(1000).select(col("id").as("k"), (col("id") * 2).as("attr"))
    val joined = big.join(dim, "k")
    // Execute THIS DataFrame's plan (count() would build its own
    // QueryExecution and leave `joined`'s adaptive plan unfinalized).
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), s"AQE did not finalize:\n$p")
    assert(p.contains("skew=true"), s"skewed partition was not split:\n$p")
  }

  test("runtime bloom filter reaches the fact scan for selective joins") {
    // At production scale Spark injects a bloom filter from a selective
    // build side into the fact-table scan (runtime row-group skipping on
    // the join key — the shuffle-side complement of static pushdown). The
    // default size thresholds (10 MB build / 10 GB probe) are tuned for
    // clusters, so lower them to exercise the mechanism at test scale.
    // newSession(): isolated SQLConf — see the skew test above.
    import org.apache.spark.sql.functions.col
    val session = spark.newSession()
    val conf = session.conf
    val overrides = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // Creation side must be SMALLER than this bound; probe side LARGER
      // than its bound — widen both so test-scale tables qualify.
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // Injection targets shuffled joins (a broadcast probe never shuffles,
      // so there is nothing to pre-filter) — force the SMJ shape a
      // fact⋈fact join has at scale.
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    )
    overrides.foreach { case (k, v) => conf.set(k, v) }
    // Load through the ISOLATED session — a DataFrame plans under the
    // session it was created from.
    val orders = graft.queries.Q.t(session, d, "orders").filter(col("o_totalprice") > 500000.0)
    val joined = graft.queries.Q
      .t(session, d, "lineitem")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_quantity", "o_totalprice")
    val p = joined.queryExecution.executedPlan.toString
    assert(
      p.contains("might_contain") || p.contains("BloomFilter"),
      s"no runtime bloom filter injected on the fact side:\n$p"
    )
  }
}
