package graft.queries

import scala.util.chaining._

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The one-command corpus build: every curation stage this engine ships —
  * quality gates → exact dedup → LSH near-dedup → benchmark
  * decontamination → LM quality gate → mixture-weighted token-budget
  * sampling → sequence packing — composed into a single driven pipeline
  * that materializes the packed corpus plus per-stage counts and a
  * per-document lineage table (`drops` parquet: which stage dropped each
  * doc and why — curate_gate / exact_dup / near_dup / decontaminate /
  * lm_gate / token_budget — whose per-reason counts reconcile exactly
  * with `stages.json`).
  *
  * Each stage is the SAME recipe as its oracle-backed query (cited per
  * stage below), applied at document level, so the build's stage counts
  * are reproducible by composing the batch queries by hand — which is
  * exactly what CorpusBuilderSpec does.
  *
  * EXACTLY-ONCE: output follows the AnnIndex/LmModel versioned-commit
  * recipe — everything writes under `<outDir>/v=<N>`, the `_complete`
  * marker (carrying the packed doc count) lands LAST, readers open the
  * highest complete version, and superseded versions prune after the
  * marker. A crash anywhere leaves either an invisible half-written
  * version (overwritten by the next build, which lands on the same
  * number) or prunable debris; the pipeline itself is deterministic
  * (md5-derived shard keys, min-id tiebreaks), so a retry reproduces the
  * same corpus byte-for-byte.
  *
  * SCALE: no stage collects the corpus. Gates are map-side expressions;
  * dedup keys shuffle on content hashes / band buckets; the benchmark
  * gram list broadcasts (eval-suite-sized); the LM model is a
  * vocabulary-sized join; budget sampling shards running sums over
  * md5 buckets (the corpus_token_budget plan); packing is one windowed
  * pass per bucket shard.
  */
object CorpusBuilder {

  final case class StageCount(stage: String, docs: Long, tokens: Long)

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerPath(outDir: String, v: Long) = new Path(s"$outDir/v=$v/_complete")

  private def versions(spark: SparkSession, outDir: String): Seq[Long] = {
    val p = new Path(outDir)
    val f = fsOf(spark, outDir)
    if (!f.exists(p)) Nil
    else
      f.listStatus(p).toSeq.collect {
        case st if st.isDirectory && st.getPath.getName.startsWith("v=") =>
          scala.util.Try(st.getPath.getName.stripPrefix("v=").toLong).toOption
      }.flatten.sorted
  }

  /** Highest complete build version and its packed doc count. */
  def current(spark: SparkSession, outDir: String): Option[(Long, Long)] = {
    val f = fsOf(spark, outDir)
    versions(spark, outDir).reverse.collectFirst {
      case v if f.exists(markerPath(outDir, v)) =>
        val in = f.open(markerPath(outDir, v))
        val meta =
          try new String(in.readAllBytes(), "UTF-8").trim
          finally in.close()
        (v, meta.stripPrefix("docs=").toLong)
    }
  }

  /** Run the full build over a `documents` frame
    * (doc_id, lang, source, text, …). Returns the committed version and
    * the per-stage counts (also persisted as `stages.json` inside the
    * version directory).
    *
    * @param benchmarkGrams  optional eval-suite 3-gram blocklist (`gram`
    *                        column) — the curate-near decontamination list
    * @param benchmarkDocs   optional eval-suite DOCUMENT frame (`text`
    *                        column): enables FUZZY decontamination — drop
    *                        any train doc colliding with a benchmark doc
    *                        in ≥1 MinHash LSH band (the
    *                        corpus_decontaminate_near rule, catching
    *                        paraphrased leaks exact n-grams miss)
    * @param lmMinAvgLogp    optional CCNet-style LM gate threshold; the
    *                        model is loaded from `lmModelDir` or fitted on
    *                        the gate's input when absent
    * @param budgetTokens    optional total token budget; per-source shares
    *                        follow the corpus_mix_weights mass^0.7 law
    * @param seqLen          packing sequence length (corpus_pack's 512)
    */
  def build(
      spark: SparkSession,
      documents: DataFrame,
      outDir: String,
      langs: Seq[String] = Seq("en", "de", "fr"),
      minQuality: Double = 0.5,
      benchmarkGrams: Option[DataFrame] = None,
      benchmarkDocs: Option[DataFrame] = None,
      lmMinAvgLogp: Option[Double] = None,
      lmModelDir: Option[String] = None,
      budgetTokens: Option[Long] = None,
      seqLen: Long = 512L
  ): (Long, Seq[StageCount]) = {
    graft.functions.GraftFunctions.register(spark)
    // Stage checkpoints are BUILD-scoped: this method owns every terminal
    // action on them (stage counts + the versioned write), so it releases
    // them itself — repeated builds in a long-lived session must not
    // accumulate unpersistable checkpoint blocks (Checkpoints contract).
    val ckScope = Checkpoints.begin()
    try {
      val counts = Seq.newBuilder[StageCount]
      // Every stage output feeds (at least) the count aggregate AND the next
      // stage — checkpoint each so no stage's plan re-runs its predecessors
      // (the shared-subplan rule; without it the final pack would recompute
      // the whole pipeline once per consumer).
      def stage(name: String, df: DataFrame): DataFrame = {
        val ck = Checkpoints.checkpoint(df)
        val row = ck.agg(count(lit(1)), coalesce(sum("n_tokens"), lit(0L))).first()
        counts += StageCount(name, row.getLong(0), row.getLong(1))
        ck
      }
      // PER-DOCUMENT LINEAGE: alongside the stage counts, every dropped doc
      // records WHICH stage dropped it (`drops` parquet in the version dir)
      // — the verdict table a production curation pipeline audits ("why is
      // doc X not in the corpus?"). Each entry is an anti-join between a
      // stage's (checkpointed) input and output, so the per-reason counts
      // reconcile EXACTLY with stages.json by construction:
      // docs(stage k−1) − docs(stage k) = |drops where stage = k| (with the
      // curate stage split into its gate and exact-dup reasons).
      // Scale: the anti-joins shuffle bare (doc_id) rows off already-
      // materialized checkpoints — corpus-cardinality ids, never text.
      val dropsB = Seq.newBuilder[DataFrame]
      def recordDrops(prev: DataFrame, next: DataFrame, reason: String): Unit =
        dropsB += prev
          .select("doc_id")
          .join(next.select("doc_id"), Seq("doc_id"), "left_anti")
          .withColumn("stage", lit(reason))

      val input = stage(
        "input",
        documents.select(
          col("doc_id"),
          col("lang"),
          col("source"),
          col("text"),
          size(Corpus.ws).cast("long").as("n_tokens")
        )
      )

      // 1. CURATE (the corpus_curate recipe, TextOps.scala: lang allowlist,
      //    length+stopword quality score >= minQuality, exact-dup keep-first
      //    by min doc_id per normalized text hash).
      val scored = input
        .filter(col("lang").isin(langs.map(x => x: Any): _*))
        .filter(TextOps.curateScore(col("text")) >= minQuality)
        .withColumn("text_hash", md5(lower(trim(col("text")))))
      val keepIds = scored
        .groupBy("text_hash")
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val curated = stage("curate", scored.join(keepIds, "doc_id").drop("text_hash"))
      // The curate stage has two distinct verdicts worth auditing apart:
      // failing the lang/quality gate vs losing exact-dup keep-first.
      recordDrops(input, scored, "curate_gate")
      recordDrops(scored, curated, "exact_dup")

      // 2. NEAR-DEDUP (the dedup_minhash_lsh banding + Engine.nearDedupBatch
      //    decision rule): minhash16 4 bands × 4 rows; a doc drops when any
      //    of its band buckets contains a smaller doc id — the batch analog
      //    of streaming first-wins, deterministic in id order. Shuffles on
      //    band-bucket keys only.
      val bands = curated
        .withColumn("mh", expr("minhash16(array_distinct(split(lower(trim(text)), ' ')))"))
        .select(
          col("doc_id"),
          explode(expr(
            """transform(sequence(0, 3), b -> struct(
                 b AS band,
                 array_join(transform(slice(mh, b*4 + 1, 4), x -> cast(x AS string)), ',') AS bh))"""
          )).as("bb")
        )
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      val wBucket = Window.partitionBy("band", "bh")
      val nearDropped = bands
        .withColumn("mn", min(col("doc_id")).over(wBucket))
        .filter(col("doc_id") > col("mn"))
        .select("doc_id")
        .distinct()
      val near = stage("near_dedup", curated.join(nearDropped, Seq("doc_id"), "left_anti"))
      recordDrops(curated, near, "near_dup")

      // 3. DECONTAMINATE — two complementary rules, one stage:
      //    exact (the text_decontaminate / curate-near blocklist recipe):
      //    drop any doc sharing >= 1 distinct 3-gram with the broadcast
      //    benchmark list; fuzzy (the corpus_decontaminate_near rule): drop
      //    any doc colliding with a benchmark DOC in >= 1 MinHash LSH band,
      //    catching paraphrased leaks whose exact n-grams differ. Both
      //    benchmark sides are eval-suite-sized and broadcast. No list ->
      //    pass-through stage (counted, so the stage roster is stable).
      val gramHits = benchmarkGrams.map { grams =>
        val ngrams = expr(
          """transform(sequence(1, size(w) - 2),
                       i -> concat(element_at(w, i), ' ', element_at(w, i + 1), ' ',
                                   element_at(w, i + 2)))"""
        )
        near
          .select(col("doc_id"), Corpus.ws.as("w"))
          .filter(size(col("w")) >= 3)
          .select(col("doc_id"), explode(array_distinct(ngrams)).as("gram"))
          .join(broadcast(grams.select("gram").distinct()), Seq("gram"), "left_semi")
          .select("doc_id")
          .distinct()
      }
      def lshBands(df: DataFrame, idCol: Column): DataFrame = df
        .withColumn("mh__", expr("minhash16(array_distinct(split(lower(trim(text)), ' ')))"))
        .select(
          idCol.as("doc_id"),
          explode(expr(
            """transform(sequence(0, 3), b -> struct(
                 b AS band,
                 array_join(transform(slice(mh__, b*4 + 1, 4), x -> cast(x AS string)), ',') AS bh))"""
          )).as("bb")
        )
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      val bandHits = benchmarkDocs.map { bdocs =>
        val benchBands =
          broadcast(lshBands(bdocs, monotonically_increasing_id()).select("band", "bh").distinct())
        lshBands(near, col("doc_id"))
          .join(benchBands, Seq("band", "bh"), "left_semi")
          .select("doc_id")
          .distinct()
      }
      val allHits = (gramHits.toSeq ++ bandHits.toSeq).reduceOption(_ unionByName _)
      val decon = allHits match {
        case Some(hits) => stage("decontaminate", near.join(hits.distinct(), Seq("doc_id"), "left_anti"))
        case None       => stage("decontaminate", near)
      }
      recordDrops(near, decon, "decontaminate")

      // 4. LM GATE (the corpus_lm_quality / curate-near --lm-model recipe):
      //    average token log-likelihood against the persisted unigram model;
      //    docs below the threshold drop. Absent threshold -> pass-through.
      val gated = lmMinAvgLogp match {
        case Some(minLp) =>
          val modelDir = lmModelDir.getOrElse {
            val md = s"$outDir/_lm"
            val _ = LmModel.fit(spark, decon, md)
            md
          }
          stage(
            "lm_gate",
            LmModel.score(spark, decon, modelDir, "doc_id")
              .filter(col("avg_logp") >= minLp)
              .drop("avg_logp")
          )
        case None => stage("lm_gate", decon)
      }
      recordDrops(decon, gated, "lm_gate")

      // 5. MIX + TOKEN BUDGET (corpus_mix_weights' mass^0.7 shares feeding
      //    corpus_token_budget's sharded running sums): per-source budgets
      //    from the surviving mass, selection by deterministic md5-shard
      //    order with a 32-bucket prefix table that broadcasts. No budget ->
      //    pass-through.
      val sampled = budgetTokens match {
        case Some(b) =>
          val perSource = gated
            .groupBy("source")
            .agg(sum("n_tokens").as("mass"))
            .withColumn(
              "pw",
              round(pow(col("mass").cast("double"), 0.7), 6).cast("decimal(28,6)")
            )
            .pipe(Checkpoints.checkpoint)
          val tot = perSource.agg(sum("pw").as("tot_pw"))
          val budgets = perSource
            .crossJoin(broadcast(tot))
            .select(
              col("source"),
              (col("pw").cast("double") / col("tot_pw").cast("double") * b).cast("long")
                .as("budget")
            )
          val sharded = gated
            .withColumn("bucket", Corpus.bucketOf(32))
            .withColumn("h", md5(col("doc_id").cast("string")))
          val bucketPrefix = sharded
            .groupBy("source", "bucket")
            .agg(sum("n_tokens").as("bt"))
            .withColumn(
              "bp",
              coalesce(
                sum(col("bt")).over(
                  Window.partitionBy("source").orderBy("bucket")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                lit(0L)
              )
            )
            .select("source", "bucket", "bp")
          val intra = Window.partitionBy("source", "bucket").orderBy("h", "doc_id")
          stage(
            "token_budget",
            sharded
              .withColumn(
                "cb",
                coalesce(
                  sum(col("n_tokens")).over(intra.rowsBetween(Window.unboundedPreceding, -1)),
                  lit(0L)
                )
              )
              .join(broadcast(bucketPrefix), Seq("source", "bucket"))
              .join(broadcast(budgets), Seq("source"))
              .filter(col("bp") + col("cb") < col("budget"))
              .drop("bucket", "h", "cb", "bp", "budget")
          )
        case None => stage("token_budget", gated)
      }
      recordDrops(gated, sampled, "token_budget")

      // 6. PACK (corpus_pack's bin assignment, materialized per doc): shard
      //    on the md5 bucket, deterministic (h, doc_id) order within shard,
      //    greedy running-sum bins of seqLen tokens. Emits the training-
      //    ready layout: (bucket, seq_id, pos_in_seq-deriving token_start).
      val packW = Window.partitionBy("bucket").orderBy("h", "doc_id")
      val packed = sampled
        .withColumn("bucket", Corpus.bucketOf(32))
        .withColumn("h", md5(col("doc_id").cast("string")))
        .withColumn(
          "token_start",
          coalesce(
            sum(col("n_tokens")).over(packW.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)
          )
        )
        .withColumn("seq_id", expr(s"token_start div $seqLen"))
        .drop("h")
      val done = stage("pack", packed)

      // Versioned commit (AnnIndex recipe): data + stages.json, marker LAST,
      // prune after.
      val v = current(spark, outDir).map(_._1).getOrElse(0L) + 1
      val vd = s"$outDir/v=$v"
      done.write.mode("overwrite").partitionBy("bucket").parquet(s"$vd/corpus")
      // The lineage table lands in the SAME version dir, before the marker
      // — committed (or discarded on crash) atomically with the corpus it
      // explains. Pack assigns offsets but never drops, so the six reasons
      // here account for every input doc missing from the packed output.
      dropsB.result().reduce(_ unionByName _).write.mode("overwrite").parquet(s"$vd/drops")
      val all = counts.result()
      val json = all
        .map(c => s"""{"stage":"${c.stage}","docs":${c.docs},"tokens":${c.tokens}}""")
        .mkString("[", ",", "]")
      val f = fsOf(spark, outDir)
      val js = f.create(new Path(s"$vd/stages.json"), true)
      try js.write(json.getBytes("UTF-8"))
      finally js.close()
      val packedDocs = all.last.docs
      val out = f.create(markerPath(outDir, v), true)
      try out.write(s"docs=$packedDocs".getBytes("UTF-8"))
      finally out.close()
      versions(spark, outDir).filter(_ < v).foreach { old =>
        f.delete(new Path(s"$outDir/v=$old"), true)
      }
      (v, all)
    } finally ckScope.release()
  }
}
