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
  * INCREMENTAL: [[append]] adds a document batch WITHOUT re-running the
  * text-heavy stages over the existing corpus. Each version persists the
  * state those stages need (`state/hashes`: curated text hashes,
  * `state/bands`: curated LSH band keys, `state/gated`: the post-LM
  * survivor pool); the delta runs gates → dedup-vs-state → decontaminate
  * → LM on ITS OWN rows only, then budget selection and packing recompute
  * over the survivor pool — metadata windows plus one output rewrite.
  * That is the explicit RECOMPUTE BOUNDARY: per-append cost = delta text
  * compute + pool-sized selection/pack/IO, never raw-corpus text compute
  * (curation typically keeps a small fraction, so the pool ≪ raw input).
  * First-wins dedup is id-ordered, so append REQUIRES delta doc ids above
  * every previously built id — under that discipline an append commits
  * byte-identically to a from-scratch [[build]] on the union (asserted in
  * CorpusBuilderSpec), because existing docs' gate/dedup/LM verdicts
  * cannot change. Staleness contract (the AnnIndex recentre analog): an
  * auto-fitted LM model freezes at the base build; refresh it with a full
  * [[build]].
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

  // ------------------------------------------------- shared stage recipes

  /** The pipeline's working schema: `(doc_id, lang, source, text,
    * n_tokens)`. `tokenizer` picks the mass unit every downstream stage
    * (budget, pack, epochs, stage counts) runs in: `ws` = whitespace
    * tokens; `bpe` = BPE-applied counts ([[Bpe.tokenCounts]], merges
    * learned on THIS input) — the unit a trainer actually budgets in.
    */
  private def withTokens(documents: DataFrame, tokenizer: String): DataFrame =
    tokenizer match {
      case "bpe" =>
        val cnt = Bpe
          .tokenCounts(documents, Bpe.DefaultMerges)
          .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens"))
        documents.select("doc_id", "lang", "source", "text").join(cnt, Seq("doc_id"))
      case _ =>
        documents.select(
          col("doc_id"),
          col("lang"),
          col("source"),
          col("text"),
          size(Corpus.ws).cast("long").as("n_tokens")
        )
    }

  /** The mass unit a version was built in (stages.json `tokenizer` field;
    * pre-r11 builds wrote none and were always whitespace).
    */
  private[graft] def readTokenizer(spark: SparkSession, vd: String): String =
    """"tokenizer":"(\w+)"""".r
      .findFirstMatchIn(readSmallFile(spark, s"$vd/stages.json"))
      .map(_.group(1))
      .getOrElse("ws")

  /** Stage-1 gates (the corpus_curate recipe, TextOps.scala): lang
    * allowlist + length/stopword quality score, plus the normalized text
    * hash exact dedup keys on.
    */
  private def gateScored(input: DataFrame, langs: Seq[String], minQuality: Double): DataFrame =
    input
      .filter(col("lang").isin(langs.map(x => x: Any): _*))
      .filter(TextOps.curateScore(col("text")) >= minQuality)
      .withColumn("text_hash", md5(lower(trim(col("text")))))

  /** minhash16 4×4 LSH band keys (the dedup_minhash_lsh banding — shared
    * with the streaming near-dedup, so batch and stream agree).
    */
  private def lshBands(df: DataFrame, idCol: Column): DataFrame = df
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

  /** Contaminated doc ids among `docs` — exact (shared distinct 3-gram
    * with the broadcast benchmark list) plus fuzzy (≥1 MinHash LSH band
    * collision with a benchmark DOC, catching paraphrased leaks whose
    * exact n-grams differ). Both benchmark sides are eval-suite-sized and
    * broadcast. None when no benchmark input is configured.
    */
  private def contaminationHits(
      docs: DataFrame,
      benchmarkGrams: Option[DataFrame],
      benchmarkDocs: Option[DataFrame]
  ): Option[DataFrame] = {
    val gramHits = benchmarkGrams.map { grams =>
      val ngrams = expr(
        """transform(sequence(1, size(w) - 2),
                     i -> concat(element_at(w, i), ' ', element_at(w, i + 1), ' ',
                                 element_at(w, i + 2)))"""
      )
      docs
        .select(col("doc_id"), Corpus.ws.as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), explode(array_distinct(ngrams)).as("gram"))
        .join(broadcast(grams.select("gram").distinct()), Seq("gram"), "left_semi")
        .select("doc_id")
        .distinct()
    }
    val bandHits = benchmarkDocs.map { bdocs =>
      val benchBands =
        broadcast(lshBands(bdocs, monotonically_increasing_id()).select("band", "bh").distinct())
      lshBands(docs, col("doc_id"))
        .join(benchBands, Seq("band", "bh"), "left_semi")
        .select("doc_id")
        .distinct()
    }
    (gramHits.toSeq ++ bandHits.toSeq).reduceOption(_ unionByName _).map(_.distinct())
  }

  /** Stages 5–6 over a post-LM survivor pool: mix-weighted token-budget
    * selection (corpus_mix_weights' mass^0.7 shares feeding
    * corpus_token_budget's sharded running sums) and sequence packing
    * (corpus_pack's bin assignment, per doc). `stage` is the caller's
    * counting checkpoint. Returns (budget survivors, packed output).
    */
  private def budgetAndPack(
      pool: DataFrame,
      budgetTokens: Option[Long],
      seqLen: Long,
      stage: (String, DataFrame) => DataFrame
  ): (DataFrame, DataFrame) = {
    val sampled = budgetTokens match {
      case Some(b) =>
        val perSource = pool
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
        val sharded = pool
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
      case None => stage("token_budget", pool)
    }
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
    (sampled, done)
  }

  /** The persisted data-constrained training recipe: when a token budget
    * was given, the repeat plan over the budget stage's input pool —
    * per-source targets/epochs/caps from the SAME exact-integer
    * arithmetic as the `corpus_epochs` query ([[Corpus.epochsPlanOver]]),
    * so a budget larger than the corpus mass lands in `stages.json` as
    * the explicit per-source repeat schedule a trainer consumes
    * (epochs > 1, 4-epoch effective cap). |sources| rows — collect is a
    * metadata read.
    */
  /** Matches one [[repeatPlanJson]] row. Group 1 is the source name STILL
    * JSON-escaped (the escape-aware group accepts `\"`/`\\` sequences the
    * old `[^"]*` form silently truncated on) — readers must pass it through
    * [[unescapeJsonString]] before display/compare.
    */
  private[graft] val repeatPlanRe =
    ("""\{"source":"((?:[^"\\]|\\.)*)","mass":(\d+),"target_tokens":(\d+),""" +
      """"epochs":([0-9.E-]+),"capped":(true|false),"effective_tokens":(\d+)\}""").r

  /** Inverse of repeatPlanJson's esc(): only `\"` and `\\` are ever
    * produced, so dropping each backslash before its escaped char is exact.
    */
  private[graft] def unescapeJsonString(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) { b.append(s.charAt(i + 1)); i += 2 }
      else { b.append(s.charAt(i)); i += 1 }
    }
    b.toString
  }

  private def repeatPlanJson(pool: DataFrame, budgetTokens: Option[Long]): Option[String] =
    budgetTokens.map { b =>
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      val rows = Corpus
        .epochsPlanOver(
          pool.groupBy("source").agg(sum("n_tokens").as("mass")),
          lit(b)
        )
        .orderBy("source")
        .collect()
        .map { r =>
          s"""{"source":"${esc(r.getString(0))}","mass":${r.getLong(1)},""" +
            s""""target_tokens":${r.getLong(2)},"epochs":${r.getDouble(3)},""" +
            s""""capped":${r.getBoolean(4)},"effective_tokens":${r.getLong(5)}}"""
        }
      s""""budget_tokens":$b,"repeat_plan":${rows.mkString("[", ",", "]")}"""
    }

  // ----------------------------------------------- versioned commit + state

  /** Write version `v`'s artifacts in commit order: corpus, drops, the
    * incremental-append state tables, stages.json, then the marker LAST;
    * prune superseded versions after. Every path writes in overwrite mode,
    * so a crashed prior attempt at the same number is fully replaced.
    */
  private def commitVersion(
      spark: SparkSession,
      outDir: String,
      v: Long,
      done: DataFrame,
      drops: DataFrame,
      hashes: DataFrame,
      bands: DataFrame,
      pool: DataFrame,
      maxDocId: Long,
      all: Seq[StageCount],
      repeatPlan: Option[String],
      tokenizer: String
  ): Unit = {
    val vd = s"$outDir/v=$v"
    done.write.mode("overwrite").partitionBy("bucket").parquet(s"$vd/corpus")
    // The lineage table lands in the SAME version dir, before the marker
    // — committed (or discarded on crash) atomically with the corpus it
    // explains. Pack assigns offsets but never drops, so the six reasons
    // here account for every input doc missing from the packed output.
    drops.write.mode("overwrite").parquet(s"$vd/drops")
    // Append state: what the delta-only text stages need from history.
    hashes.select("text_hash").write.mode("overwrite").parquet(s"$vd/state/hashes")
    bands.select("band", "bh").write.mode("overwrite").parquet(s"$vd/state/bands")
    pool.select("doc_id", "lang", "source", "text", "n_tokens")
      .write.mode("overwrite").parquet(s"$vd/state/gated")
    val f = fsOf(spark, outDir)
    // Object-wrapped since round 10 (was a bare stage array): every reader
    // regex-scans for the stage objects, so both shapes parse. The
    // repeat-plan fragment (data-constrained training recipe) rides along
    // when a token budget was given.
    val stagesArr = all
      .map(c => s"""{"stage":"${c.stage}","docs":${c.docs},"tokens":${c.tokens}}""")
      .mkString("[", ",", "]")
    val json =
      s"""{"tokenizer":"$tokenizer","stages":$stagesArr${repeatPlan.map("," + _).getOrElse("")}}"""
    val js = f.create(new Path(s"$vd/stages.json"), true)
    try js.write(json.getBytes("UTF-8"))
    finally js.close()
    val mj = f.create(new Path(s"$vd/state/meta.json"), true)
    try mj.write(s"""{"max_doc_id":$maxDocId}""".getBytes("UTF-8"))
    finally mj.close()
    val packedDocs = all.last.docs
    val out = f.create(markerPath(outDir, v), true)
    try out.write(s"docs=$packedDocs".getBytes("UTF-8"))
    finally out.close()
    versions(spark, outDir).filter(_ < v).foreach { old =>
      f.delete(new Path(s"$outDir/v=$old"), true)
    }
  }

  /** Read a small metadata file through the Hadoop FS API — outDir may be
    * any Hadoop filesystem (file://, hdfs://, s3a://), so callers (incl.
    * the CLI's build/report readouts) must NOT use java.nio on it.
    */
  private[graft] def readSmallFile(spark: SparkSession, path: String): String = {
    val f = fsOf(spark, path)
    val in = f.open(new Path(path))
    try new String(in.readAllBytes(), "UTF-8")
    finally in.close()
  }

  private val stageRe =
    """\{"stage":"(\w+)","docs":(\d+),"tokens":(\d+)\}""".r

  /** Parse a version's persisted stages.json back into StageCounts. */
  private def readStages(spark: SparkSession, vd: String): Map[String, StageCount] =
    stageRe
      .findAllMatchIn(readSmallFile(spark, s"$vd/stages.json"))
      .map(m => m.group(1) -> StageCount(m.group(1), m.group(2).toLong, m.group(3).toLong))
      .toMap

  private def readMaxDocId(spark: SparkSession, vd: String): Long = {
    val meta = readSmallFile(spark, s"$vd/state/meta.json")
    """"max_doc_id":(-?\d+)""".r
      .findFirstMatchIn(meta)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(s"malformed $vd/state/meta.json: $meta"))
  }

  // ------------------------------------------------------------ full build

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
      seqLen: Long = 512L,
      tokenizer: String = "ws"
  ): (Long, Seq[StageCount]) = {
    require(
      tokenizer == "ws" || tokenizer == "bpe",
      s"unknown tokenizer '$tokenizer' (ws | bpe)"
    )
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

      val input = stage("input", withTokens(documents, tokenizer))

      // 1. CURATE: gates, then exact-dup keep-first by min doc_id per
      //    normalized text hash.
      val scored = gateScored(input, langs, minQuality)
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
      //    decision rule): a doc drops when any of its band buckets contains
      //    a smaller doc id — the batch analog of streaming first-wins,
      //    deterministic in id order. Shuffles on band-bucket keys only.
      val bands = lshBands(curated, col("doc_id"))
      val wBucket = Window.partitionBy("band", "bh")
      val nearDropped = bands
        .withColumn("mn", min(col("doc_id")).over(wBucket))
        .filter(col("doc_id") > col("mn"))
        .select("doc_id")
        .distinct()
      val near = stage("near_dedup", curated.join(nearDropped, Seq("doc_id"), "left_anti"))
      recordDrops(curated, near, "near_dup")

      // 3. DECONTAMINATE — exact n-gram + fuzzy band rules, one stage.
      //    No benchmark input -> pass-through (counted, stable roster).
      val decon = contaminationHits(near, benchmarkGrams, benchmarkDocs) match {
        case Some(hits) => stage("decontaminate", near.join(hits, Seq("doc_id"), "left_anti"))
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

      // 5–6. MIX + TOKEN BUDGET, then PACK — the pool-level recompute
      //    stages, shared verbatim with append.
      val (sampled, done) = budgetAndPack(gated, budgetTokens, seqLen, stage)
      recordDrops(gated, sampled, "token_budget")

      val v = current(spark, outDir).map(_._1).getOrElse(0L) + 1
      val maxDocId = input.agg(coalesce(max(col("doc_id")), lit(-1L))).first().getLong(0)
      commitVersion(
        spark, outDir, v,
        done = done,
        drops = dropsB.result().reduce(_ unionByName _),
        hashes = scored.select("text_hash").distinct(),
        bands = bands.select("band", "bh").distinct(),
        pool = gated,
        maxDocId = maxDocId,
        all = counts.result(),
        repeatPlan = repeatPlanJson(gated, budgetTokens),
        tokenizer = tokenizer
      )
      (v, counts.result())
    } finally ckScope.release()
  }

  // ----------------------------------------------------- incremental append

  /** Incrementally add `deltaDocs` to the current build. The text-heavy
    * stages (gates, dedup signatures, decontamination, LM scoring) run on
    * the DELTA ONLY, deduplicating against the persisted state instead of
    * re-reading the corpus; budget selection and packing then recompute
    * over the post-LM survivor pool (the explicit recompute boundary —
    * metadata windows plus the output rewrite). Commits version
    * `current+1` with the SAME artifacts and union-wide stage counts as a
    * from-scratch [[build]] on old∪delta, and — given monotone doc ids
    * and a persisted LM model — byte-identical content.
    *
    * REQUIRES every delta doc_id to exceed every previously built id:
    * first-wins dedup is id-ordered, and an out-of-order id would have to
    * retroactively drop an already-committed doc (that is a full
    * [[build]], not an append).
    */
  def append(
      spark: SparkSession,
      deltaDocs: DataFrame,
      outDir: String,
      langs: Seq[String] = Seq("en", "de", "fr"),
      minQuality: Double = 0.5,
      benchmarkGrams: Option[DataFrame] = None,
      benchmarkDocs: Option[DataFrame] = None,
      lmMinAvgLogp: Option[Double] = None,
      lmModelDir: Option[String] = None,
      budgetTokens: Option[Long] = None,
      seqLen: Long = 512L,
      tokenizer: String = "ws"
  ): (Long, Seq[StageCount]) = {
    // BPE masses are BUILD-scoped: the merge table is learned on the build
    // input and not persisted, so a delta tokenized with its own merges
    // would mix units with history. Refuse both directions loudly — the
    // remedy is a full re-build, which re-learns merges over old∪delta.
    require(
      tokenizer == "ws",
      "append-corpus supports --tokenizer ws only; re-run build-corpus for BPE masses"
    )
    graft.functions.GraftFunctions.register(spark)
    val (base, _) = current(spark, outDir).getOrElse(
      throw new IllegalStateException(s"append needs an existing complete corpus build under $outDir")
    )
    val bd = s"$outDir/v=$base"
    require(
      readTokenizer(spark, bd) == "ws",
      s"base build under $outDir was tokenized with BPE; " +
        "append would mix mass units — re-run build-corpus on old∪delta"
    )
    val prevCounts = readStages(spark, bd)
    val prevMax = readMaxDocId(spark, bd)
    val prevHashes = spark.read.parquet(s"$bd/state/hashes")
    val prevBands = spark.read.parquet(s"$bd/state/bands")
    val prevGated = spark.read.parquet(s"$bd/state/gated")
    val prevDrops = spark.read.parquet(s"$bd/drops")

    val ckScope = Checkpoints.begin()
    try {
      val counts = Seq.newBuilder[StageCount]
      // Union-wide accounting for the delta-only stages: history count (from
      // the base version's stages.json) + this delta's contribution — the
      // numbers a from-scratch build on old∪delta would report.
      def stageUnion(name: String, deltaDf: DataFrame): DataFrame = {
        val ck = Checkpoints.checkpoint(deltaDf)
        val row = ck.agg(count(lit(1)), coalesce(sum("n_tokens"), lit(0L))).first()
        val p = prevCounts.getOrElse(
          name,
          throw new IllegalStateException(s"base build is missing stage '$name' in stages.json")
        )
        counts += StageCount(name, p.docs + row.getLong(0), p.tokens + row.getLong(1))
        ck
      }
      // Pool-level stages count directly (they already see the union).
      def stagePool(name: String, df: DataFrame): DataFrame = {
        val ck = Checkpoints.checkpoint(df)
        val row = ck.agg(count(lit(1)), coalesce(sum("n_tokens"), lit(0L))).first()
        counts += StageCount(name, row.getLong(0), row.getLong(1))
        ck
      }
      val dropsB = Seq.newBuilder[DataFrame]
      def recordDrops(prev: DataFrame, next: DataFrame, reason: String): Unit =
        dropsB += prev
          .select("doc_id")
          .join(next.select("doc_id"), Seq("doc_id"), "left_anti")
          .withColumn("stage", lit(reason))

      val input = stageUnion("input", withTokens(deltaDocs, tokenizer))
      val deltaMin = input.agg(coalesce(min(col("doc_id")), lit(Long.MaxValue))).first().getLong(0)
      require(
        deltaMin > prevMax,
        s"append requires delta doc ids above every built id (first-wins dedup is id-ordered); " +
          s"got delta min=$deltaMin, history max=$prevMax — rerun as a full build instead"
      )

      // 1. CURATE on the delta: gates, within-delta keep-first, then drop
      //    anything whose hash already exists in history (the history
      //    keeper has the smaller id by the monotone-id requirement).
      val scored = gateScored(input, langs, minQuality)
      val keepIds = scored
        .groupBy("text_hash")
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val curatedDelta = stageUnion(
        "curate",
        scored
          .join(keepIds, "doc_id")
          .join(prevHashes, Seq("text_hash"), "left_anti")
          .drop("text_hash")
      )
      recordDrops(input, scored, "curate_gate")
      recordDrops(scored, curatedDelta, "exact_dup")

      // 2. NEAR-DEDUP on the delta: a delta doc drops when a band bucket
      //    holds a smaller delta id OR the bucket exists in history at all
      //    (every history id is smaller).
      val bandsDelta = lshBands(curatedDelta, col("doc_id"))
      val wBucket = Window.partitionBy("band", "bh")
      val nearDroppedDelta = bandsDelta
        .withColumn("mn", min(col("doc_id")).over(wBucket))
        .filter(col("doc_id") > col("mn"))
        .select("doc_id")
        .unionByName(
          bandsDelta.join(prevBands, Seq("band", "bh"), "left_semi").select("doc_id")
        )
        .distinct()
      val nearDelta = stageUnion(
        "near_dedup",
        curatedDelta.join(nearDroppedDelta, Seq("doc_id"), "left_anti")
      )
      recordDrops(curatedDelta, nearDelta, "near_dup")

      // 3. DECONTAMINATE the delta against the same static benchmark.
      val deconDelta = contaminationHits(nearDelta, benchmarkGrams, benchmarkDocs) match {
        case Some(hits) =>
          stageUnion("decontaminate", nearDelta.join(hits, Seq("doc_id"), "left_anti"))
        case None => stageUnion("decontaminate", nearDelta)
      }
      recordDrops(nearDelta, deconDelta, "decontaminate")

      // 4. LM GATE with the PERSISTED model only — append never refits
      //    (scores must agree with the docs already admitted); an
      //    auto-fitted model freezes at the base build, full build() is the
      //    refresh.
      val gatedDelta = lmMinAvgLogp match {
        case Some(minLp) =>
          val modelDir = lmModelDir.getOrElse(s"$outDir/_lm")
          require(
            LmModel.current(spark, modelDir).isDefined,
            s"append with an LM gate needs the persisted model at $modelDir " +
              "(the base build's auto-fit or an explicit lmModelDir)"
          )
          stageUnion(
            "lm_gate",
            LmModel.score(spark, deconDelta, modelDir, "doc_id")
              .filter(col("avg_logp") >= minLp)
              .drop("avg_logp")
          )
        case None => stageUnion("lm_gate", deconDelta)
      }
      recordDrops(deconDelta, gatedDelta, "lm_gate")

      // 5–6. The RECOMPUTE BOUNDARY: budget shares and pack offsets are
      //    global functions of the survivor pool, so they re-run over
      //    history ∪ delta — metadata-keyed windows and the output write,
      //    no text-stage compute.
      val pool = Checkpoints.checkpoint(
        prevGated.unionByName(gatedDelta.select("doc_id", "lang", "source", "text", "n_tokens"))
      )
      val (sampled, done) = budgetAndPack(pool, budgetTokens, seqLen, stagePool)
      recordDrops(pool, sampled, "token_budget")

      // Lineage: history text-stage verdicts stand; the budget verdict is
      // recomputed pool-wide, so the base version's token_budget rows are
      // replaced by this version's.
      val drops = prevDrops
        .filter(col("stage") =!= "token_budget")
        .unionByName(dropsB.result().reduce(_ unionByName _))

      val deltaMax = input.agg(coalesce(max(col("doc_id")), lit(-1L))).first().getLong(0)
      commitVersion(
        spark, outDir, base + 1,
        done = done,
        drops = drops,
        hashes = prevHashes.unionByName(
          // Disjoint from history by the anti-join above and unique within
          // the delta by keep-first — the union is already distinct.
          scored.join(keepIds, "doc_id").join(prevHashes, Seq("text_hash"), "left_anti")
            .select("text_hash")
        ),
        bands = prevBands.unionByName(
          bandsDelta.select("band", "bh").distinct()
            .join(prevBands, Seq("band", "bh"), "left_anti")
        ),
        pool = pool,
        maxDocId = math.max(prevMax, deltaMax),
        all = counts.result(),
        repeatPlan = repeatPlanJson(pool, budgetTokens),
        tokenizer = tokenizer
      )
      (base + 1, counts.result())
    } finally ckScope.release()
  }
}
