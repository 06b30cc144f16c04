package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.log.{LogConfig, SparkLog}

/** The product story in one test: opaque payloads land in the commit log,
  * the graft streaming source tails it exactly-once, a typed projection
  * (from_json) recovers event time, and a watermarked window aggregates —
  * the reference's produce→consume loop composed with the analytics
  * surface it never had (SURVEY §7.4 "typed/JSON payload projection").
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("log tail feeds an event-time windowed aggregation end-to-end") {
    val log = SparkLog(spark, TestSpark.tempDir("pipeline"), LogConfig())
    val payloads = Seq(1, 2, 3, 11, 12).map { m =>
      f"""{"ts":"2024-01-01 10:$m%02d:00","user":7}""".getBytes
    }
    log.append(payloads)

    val jsonSchema = StructType(
      Seq(StructField("ts", TimestampType), StructField("user", LongType))
    )
    val q = spark.readStream
      .format("graft")
      .load(log.dir)
      .select(
        from_json(
          col("value").cast("string"),
          jsonSchema,
          Map("timestampFormat" -> "yyyy-MM-dd HH:mm:ss")
        ).as("j")
      )
      .select(col("j.ts").as("ts"), col("j.user").as("user"))
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "10 minutes"), col("user"))
      .agg(count(lit(1)).as("n"))
      .writeStream
      .format("memory")
      .queryName("pipeline_agg")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark
        .sql("select window.start, user, n from pipeline_agg order by window.start")
        .collect()
      assert(rows.length == 2, s"expected 2 windows, got ${rows.toSeq}")
      assert(rows(0).getLong(2) == 3) // 10:00-10:10 → minutes 1,2,3
      assert(rows(1).getLong(2) == 2) // 10:10-10:20 → minutes 11,12
      assert(rows.forall(_.getLong(1) == 7))

      // Late arrival: a new append lands in the running stream (tail
      // semantics — the reference's ConsumeStream busy-poll, SURVEY §2.6).
      log.append(Seq("""{"ts":"2024-01-01 10:13:00","user":7}""".getBytes))
      q.processAllAvailable()
      val n2 = spark
        .sql("select n from pipeline_agg order by window.start")
        .collect()
        .map(_.getLong(0))
        .toSeq
      assert(n2 == Seq(3, 3), s"second window must absorb the tailed append: $n2")
    } finally q.stop()
  }

  test("streaming curation: raw log → gates → cross-batch dedup → curated log") {
    val raw = SparkLog(spark, TestSpark.tempDir("curate-raw"), LogConfig())
    def doc(lang: String, text: String): Array[Byte] =
      s"""{"lang":"$lang","text":"$text"}""".getBytes
    val filler = "spark shuffles the corpus while the corpus shuffles back "
    raw.append(
      Seq(
        doc("en", "too short"),            // fails the length gate
        doc("de", filler + "germanisch"),  // fails the language allowlist
        doc("en", filler + "one"),         // kept
        doc("en", filler + "one"),         // exact dup, same batch
        doc("en", filler + "two")          // kept
      )
    )

    val engine = Engine(spark, TestSpark.tempDir("curate-out"))
    val q = engine.curateFrom(raw.dir, TestSpark.tempDir("curate-ckpt"))
    def curatedTexts(): Set[String] =
      engine.toDF
        .collect()
        .map(r => new String(r.getAs[Array[Byte]]("value")))
        .toSet
    try {
      q.processAllAvailable()
      assert(curatedTexts() == Set(doc("en", filler + "one"), doc("en", filler + "two")).map(new String(_)))

      // A later batch re-sends "one" (cross-batch duplicate — the dedup
      // state must remember it) plus one genuinely new document.
      raw.append(Seq(doc("en", filler + "one"), doc("en", filler + "three")))
      q.processAllAvailable()
      assert(
        curatedTexts() == Set("one", "two", "three").map(s => new String(doc("en", filler + s))),
        "cross-batch duplicate leaked into the curated corpus"
      )
      assert(engine.log.highestOffset == 2)
    } finally q.stop()
  }

  test("curation dedup state survives a query restart (checkpoint recovery)") {
    val raw = SparkLog(spark, TestSpark.tempDir("curate2-raw"), LogConfig())
    def doc(text: String): Array[Byte] = s"""{"lang":"en","text":"$text"}""".getBytes
    val filler = "the corpus remembers what the corpus has seen before it "
    raw.append(Seq(doc(filler + "alpha"), doc(filler + "beta")))

    val engine = Engine(spark, TestSpark.tempDir("curate2-out"))
    val ckpt = TestSpark.tempDir("curate2-ckpt")
    val q1 = engine.curateFrom(raw.dir, ckpt)
    try {
      q1.processAllAvailable()
      assert(engine.log.highestOffset == 1)
    } finally q1.stop()

    // New query, same checkpoint: the dropDuplicates state store recovers,
    // so a re-sent "alpha" is still a duplicate while "gamma" lands —
    // exactly-once curation across restarts, not just across batches.
    raw.append(Seq(doc(filler + "alpha"), doc(filler + "gamma")))
    val q2 = engine.curateFrom(raw.dir, ckpt)
    try {
      q2.processAllAvailable()
      val texts = engine.toDF
        .collect()
        .map(r => new String(r.getAs[Array[Byte]]("value")))
        .toSet
      assert(texts == Set("alpha", "beta", "gamma").map(s => new String(doc(filler + s))))
    } finally q2.stop()
  }

  test("near-dup curation: LSH index drops permuted docs across batches and restarts") {
    val raw = SparkLog(spark, TestSpark.tempDir("curate-near-raw"), LogConfig())
    def doc(text: String): Array[Byte] = s"""{"lang":"en","text":"$text"}""".getBytes
    // Word-permuted docs have IDENTICAL token sets → identical minhash16
    // signatures → every band collides: deterministic near-dups for the
    // LSH gate that are NOT byte-exact duplicates (curateFrom's exact
    // hash would pass them).
    val a  = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    val a2 = "kappa lambda alpha beta gamma delta epsilon zeta eta theta iota"
    val b  = "solar lunar tidal plasma quantum neutron photon electron muon tau"
    raw.append(Seq(doc(a), doc(a2), doc(b)))

    val engine = Engine(spark, TestSpark.tempDir("curate-near-out"))
    val ckpt = TestSpark.tempDir("curate-near-ckpt")
    val idx = TestSpark.tempDir("curate-near-idx") + "/index"
    def curated(): Set[String] =
      engine.toDF.collect().map(r => new String(r.getAs[Array[Byte]]("value"))).toSet

    val q1 = engine.curateNearFrom(raw.dir, ckpt, idx, minChars = 20)
    try {
      q1.processAllAvailable()
      // Within-batch: a kept (smallest peer offset in its buckets), a2
      // dropped (all four buckets held by a), b kept (disjoint buckets).
      assert(curated() == Set(a, b).map(s => new String(doc(s))), s"got ${curated()}")

      // Cross-batch: another permutation of a collides with the PERSISTED
      // index (no state store involved); a genuinely new doc lands.
      val a3 = "beta alpha delta gamma zeta epsilon theta eta kappa iota lambda"
      val c  = "granite basalt schist gneiss quartzite marble slate obsidian pumice tuff"
      raw.append(Seq(doc(a3), doc(c)))
      q1.processAllAvailable()
      assert(curated() == Set(a, b, c).map(s => new String(doc(s))), s"got ${curated()}")
    } finally q1.stop()

    // Restart on the same checkpoint: history lives in the parquet index,
    // so the new query needs no state recovery at all.
    raw.append(Seq(doc("gamma beta alpha epsilon delta eta zeta iota theta lambda kappa")))
    val q2 = engine.curateNearFrom(raw.dir, ckpt, idx, minChars = 20)
    try {
      q2.processAllAvailable()
      val a3 = "beta alpha delta gamma zeta epsilon theta eta kappa iota lambda"
      val c  = "granite basalt schist gneiss quartzite marble slate obsidian pumice tuff"
      assert(curated() == Set(a, b, c).map(s => new String(doc(s))), "restart leaked a near-dup")

      // Compaction folds per-batch partitions into one; the probe result
      // is unchanged (a fourth permutation still collides afterwards).
      val batchDirs = new java.io.File(idx).listFiles().filter(_.getName.startsWith("batch="))
      assert(batchDirs.length >= 2, s"expected multiple batch partitions, got ${batchDirs.toSeq}")
      val maxBatch = batchDirs.map(_.getName.stripPrefix("batch=").toLong).max
      Engine.compactNearIndex(spark, idx, maxBatch)
      val after = new java.io.File(idx).listFiles().filter(_.getName.startsWith("batch="))
      assert(after.map(_.getName) sameElements Array(s"batch=$maxBatch"), s"got ${after.toSeq}")

      raw.append(Seq(doc("delta gamma beta alpha zeta epsilon eta theta iota lambda kappa")))
      q2.processAllAvailable()
      assert(curated() == Set(a, b, c).map(s => new String(doc(s))), "post-compaction dup leaked")
    } finally q2.stop()

    // Retry idempotence, directly: re-running a batch's dedup AFTER its
    // own index partition landed must reproduce the same survivors —
    // the history filter excludes batch >= id, so the batch never sees
    // its own debris (the foreachBatch retry path).
    val batchIds = new java.io.File(idx).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName.stripPrefix("batch=").toLong)
    val lastBatch = batchIds.max
    val session = spark
    import session.implicits._
    val replay = Seq((0L, doc(a), a), (1L, doc(a2), a2), (2L, doc(b), b))
      .toDF("offset", "value", "text")
    val survivors1 = Engine.nearDedupBatch(spark, replay, idx, 0L)
      .select("offset").as[Long].collect().toSet
    val survivors2 = Engine.nearDedupBatch(spark, replay, idx, 0L)
      .select("offset").as[Long].collect().toSet
    assert(survivors1 == survivors2 && survivors1 == Set(0L, 2L),
      s"retry divergence: $survivors1 vs $survivors2 (last=$lastBatch)")
  }

  test("streaming FUZZY decontamination: benchmark band collision drops paraphrases " +
    "exact n-grams miss, across batches + restart") {
    val session = spark
    import session.implicits._
    val raw = SparkLog(spark, TestSpark.tempDir("fdecon-raw"), LogConfig())
    def doc(text: String): Array[Byte] = s"""{"lang":"en","text":"$text"}""".getBytes
    // Benchmark doc; the stream receives a PARAPHRASE (identical word
    // set, reversed order — zero shared 3-grams, identical MinHash) and
    // a clean doc with a disjoint vocabulary.
    val benchWords = (0 until 30).map(i => s"eval$i")
    val benchDocs = Seq(benchWords.mkString(" ")).toDF("text")
    val paraphrase = benchWords.reverse.mkString(" ")
    val clean1 = (0 until 30).map(i => s"keep$i").mkString(" ")
    val clean2 = (100 until 130).map(i => s"keep$i").mkString(" ")
    raw.append(Seq(doc(paraphrase), doc(clean1)))

    val engine = Engine(spark, TestSpark.tempDir("fdecon-out"))
    val ckpt = TestSpark.tempDir("fdecon-ckpt")
    val idx = TestSpark.tempDir("fdecon-idx")
    def curated(): Set[String] =
      engine.toDF.collect().map(r => new String(r.getAs[Array[Byte]]("value"))).toSet
    val q1 = engine.curateNearFrom(raw.dir, ckpt, idx, benchmarkDocs = Some(benchDocs))
    try {
      q1.processAllAvailable()
      assert(curated() == Set(new String(doc(clean1))),
        "batch 1: the benchmark paraphrase leaked past the band gate")
    } finally q1.stop()

    // Restart on the same checkpoint: the gate is stateless (benchmark
    // bands recompute at stream start) and must keep filtering; the
    // near-dedup history still applies to clean survivors.
    raw.append(Seq(doc(paraphrase), doc(clean2), doc(clean1)))
    val q2 = engine.curateNearFrom(raw.dir, ckpt, idx, benchmarkDocs = Some(benchDocs))
    try {
      q2.processAllAvailable()
      assert(
        curated() == Set(clean1, clean2).map(s => new String(doc(s))),
        "batch 2: paraphrase or near-dup survived the restart"
      )
    } finally q2.stop()
  }

  test("streaming decontamination: benchmark n-gram overlap drops docs across batches + restart") {
    val session = spark
    import session.implicits._
    val raw = SparkLog(spark, TestSpark.tempDir("decon-raw"), LogConfig())
    def doc(text: String): Array[Byte] = s"""{"lang":"en","text":"$text"}""".getBytes
    // Benchmark = one eval sentence; its 3-grams are the blocklist.
    val evalSentence = "the quick brown fox jumps over the lazy dog"
    val bench = evalSentence
      .split(" ")
      .sliding(3)
      .map(_.mkString(" "))
      .toSeq
      .toDF("gram")

    // Distinct word sets per doc (no shared filler): the near-dup stage
    // downstream must not collapse the clean survivors.
    val clean1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val dirty1 = "omicron pi rho sigma tau upsilon phi chi psi omega quick brown fox escapes"
    val clean2 = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen"
    val dirty2 = "red orange yellow green blue indigo violet cyan magenta over the lazy dog sleeps"
    raw.append(Seq(doc(clean1), doc(dirty1)))

    val engine = Engine(spark, TestSpark.tempDir("decon-out"))
    val ckpt = TestSpark.tempDir("decon-ckpt")
    val idx = TestSpark.tempDir("decon-idx")
    def curated(): Set[String] =
      engine.toDF.collect().map(r => new String(r.getAs[Array[Byte]]("value"))).toSet
    val q1 = engine.curateNearFrom(raw.dir, ckpt, idx, benchmarkGrams = Some(bench))
    try {
      q1.processAllAvailable()
      assert(curated() == Set(new String(doc(clean1))), "batch 1: contaminated doc leaked")
    } finally q1.stop()

    // Restart on the same checkpoint: the gate is stateless and must keep
    // filtering; dedup history still applies to the clean survivor.
    raw.append(Seq(doc(clean2), doc(dirty2), doc(clean1) /* near-dup of kept */ ))
    val q2 = engine.curateNearFrom(raw.dir, ckpt, idx, benchmarkGrams = Some(bench))
    try {
      q2.processAllAvailable()
      assert(
        curated() == Set(clean1, clean2).map(s => new String(doc(s))),
        "batch 2: contamination or dup survived the restart"
      )
    } finally q2.stop()

    // Stream/batch agreement: the streaming gate's verdicts equal the
    // batch decontamination contract (doc contaminated iff it shares a
    // 3-gram with the benchmark) on the same corpus.
    val corpus = Seq(0L -> clean1, 1L -> dirty1, 2L -> clean2, 3L -> dirty2)
      .map { case (o, t) => (o, doc(t), t) }
      .toDF("offset", "value", "text")
    val streamVerdicts = Engine
      .decontaminate(corpus, bench)
      .select("offset").as[Long].collect().toSet
    val batchVerdicts = corpus
      .select(col("offset"), explode(array_distinct(expr(
        """transform(sequence(1, size(split(lower(trim(text)), ' ')) - 2),
           i -> concat_ws(' ', slice(split(lower(trim(text)), ' '), i, 3)))"""))).as("gram"))
      .join(bench, Seq("gram"), "left_semi")
      .select("offset").distinct().as[Long].collect().toSet
    assert(streamVerdicts == Set(0L, 2L) && batchVerdicts == Set(1L, 3L),
      s"stream kept $streamVerdicts, batch flagged $batchVerdicts")
  }

  test("streaming repetition gate: Gopher rules drop repetitive docs, agree with the batch query") {
    val session = spark
    import session.implicits._
    val raw = SparkLog(spark, TestSpark.tempDir("repgate-raw"), LogConfig())
    def doc(text: String): Array[Byte] = s"""{"lang":"en","text":"$text"}""".getBytes
    // Distinct word sets (the LSH stage must not collapse survivors); all
    // clear the 50-char length gate.
    val clean = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    // top word 5/14 = 0.357 > 0.2 → word rule drops it
    val wordRep = "spam spam spam spam spam one two three four five six seven eight nine"
    // top word 3/15 = 0.2 (passes), top bigram "tick tock" 3/14 ≈ 0.214 > 0.18 → bigram rule
    val bigramRep = "tick tock apple tick tock banana tick tock cherry date elder fig grape honey melon"
    raw.append(Seq(doc(clean), doc(wordRep)))

    val engine = Engine(spark, TestSpark.tempDir("repgate-out"))
    val ckpt = TestSpark.tempDir("repgate-ckpt")
    val idx = TestSpark.tempDir("repgate-idx")
    def curated(): Set[String] =
      engine.toDF.collect().map(r => new String(r.getAs[Array[Byte]]("value"))).toSet
    val q1 = engine.curateNearFrom(raw.dir, ckpt, idx, repetitionGate = true)
    try {
      q1.processAllAvailable()
      assert(curated() == Set(new String(doc(clean))), "batch 1: repetitive doc leaked")
    } finally q1.stop()

    // Restart on the same checkpoint: the gate is stateless and must keep
    // filtering (bigram rule this time).
    raw.append(Seq(doc(bigramRep)))
    val q2 = engine.curateNearFrom(raw.dir, ckpt, idx, repetitionGate = true)
    try {
      q2.processAllAvailable()
      assert(curated() == Set(new String(doc(clean))), "batch 2: bigram-repetitive doc leaked")
    } finally q2.stop()

    // Stream/batch agreement: the same corpus written as a documents table
    // must get identical verdicts from the batch text_repetition query's
    // keep flag and from the streaming gate helper.
    val dir = TestSpark.tempDir("repgate-docs")
    Seq((0L, clean), (1L, wordRep), (2L, bigramRep))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batchKeep = SparkEntry
      .queries("text_repetition")(spark, dir)
      .select("doc_id", "keep")
      .as[(Long, Boolean)]
      .collect()
      .toMap
    assert(batchKeep == Map(0L -> true, 1L -> false, 2L -> false), s"batch verdicts: $batchKeep")
    val streamKeep = Engine
      .repetitionGated(Seq((0L, clean), (1L, wordRep), (2L, bigramRep)).toDF("offset", "text"))
      .select("offset").as[Long].collect().toSet
    assert(streamKeep == Set(0L), s"stream kept $streamKeep")
  }

  test("lm quality model: fit/score split gates streaming docs; OOV scores the floor exactly") {
    import graft.queries.LmModel
    val session = spark
    import session.implicits._
    // Reference corpus: every vocab word appears EXACTLY 6 times, so every
    // in-domain token scores ln(7/(120+20)) and expected document scores
    // are computable in closed form.
    val vocab = (1 to 20).map(i => f"w$i%02d")
    val refDocs = (0 until 6)
      .map(r => vocab.drop(r % 3).concat(vocab.take(r % 3)).mkString(" "))
      .toDF("text")
    val modelDir = TestSpark.tempDir("lm-model")
    val v1 = LmModel.fit(spark, refDocs, modelDir)
    val (_, _, floor) = LmModel.current(spark, modelDir).get
    val wordLogp = BigDecimal(math.log(7.0 / 140.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(v1 == 1L)
    assert(floor == BigDecimal(math.log(1.0 / 140.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)

    // Exact score contract: an all-in-domain doc averages the word logp,
    // an all-OOV doc averages exactly the floor.
    val inDomain = vocab.take(14).mkString(" ")
    val gibberish = (1 to 14).map(i => f"zz$i%04d").mkString(" ")
    val scores = LmModel
      .score(spark, Seq((0L, inDomain), (1L, gibberish)).toDF("offset", "text"), modelDir, "offset")
      .select("offset", "avg_logp").as[(Long, Double)].collect().toMap
    assert(scores(0L) == wordLogp, s"in-domain score ${scores(0L)} != $wordLogp")
    assert(scores(1L) == floor, s"OOV score ${scores(1L)} != floor $floor")

    // Streaming gate: threshold between the two scores keeps in-domain,
    // drops gibberish — across batches and a restart.
    val raw = SparkLog(spark, TestSpark.tempDir("lm-raw"), LogConfig())
    def doc(text: String): Array[Byte] = s"""{"lang":"en","text":"$text"}""".getBytes
    raw.append(Seq(doc(inDomain), doc(gibberish)))
    val engine = Engine(spark, TestSpark.tempDir("lm-out"))
    val ckpt = TestSpark.tempDir("lm-ckpt")
    val idx = TestSpark.tempDir("lm-idx")
    val cutoff = (wordLogp + floor) / 2
    def curated(): Set[String] =
      engine.toDF.collect().map(r => new String(r.getAs[Array[Byte]]("value"))).toSet
    val q1 = engine.curateNearFrom(raw.dir, ckpt, idx, lmQuality = Some(modelDir -> cutoff))
    try {
      q1.processAllAvailable()
      assert(curated() == Set(new String(doc(inDomain))), "batch 1: gibberish leaked")
    } finally q1.stop()

    // Disjoint word set from inDomain (w15..w20 ×3): zero MinHash band
    // collision risk with the kept doc, still all in-domain tokens.
    val inDomain2 = (0 until 3).flatMap(_ => vocab.slice(14, 20)).mkString(" ")
    raw.append(Seq(doc(inDomain2), doc((1 to 14).map(i => f"yy$i%04d").mkString(" "))))
    val q2 = engine.curateNearFrom(raw.dir, ckpt, idx, lmQuality = Some(modelDir -> cutoff))
    try {
      q2.processAllAvailable()
      assert(
        curated() == Set(inDomain, inDomain2).map(s => new String(doc(s))),
        "batch 2: gate did not survive the restart"
      )
    } finally q2.stop()

    // Versioning: ensure() no-ops on an unchanged corpus, refits when it
    // grows; a half-written higher version (no marker) stays invisible
    // and the next fit lands on current+1 (the AnnIndex recipe).
    assert(LmModel.ensure(spark, refDocs, modelDir) == 1L)
    new java.io.File(s"$modelDir/v=3/unigrams").mkdirs()
    assert(LmModel.current(spark, modelDir).map(_._1).contains(1L))
    val grown = refDocs.union(Seq(vocab.mkString(" ")).toDF("text"))
    assert(LmModel.ensure(spark, grown, modelDir) == 2L, "stale model must refit")
    assert(LmModel.current(spark, modelDir).map(_._1).contains(2L))
  }

  test("streaming chunker maintains the derived chunk table exactly-once and " +
    "matches the batch corpus_chunk on the same docs") {
    val session = spark
    import session.implicits._
    val raw = SparkLog(spark, TestSpark.tempDir("chunk-raw"), LogConfig())
    def doc(text: String): Array[Byte] = s"""{"lang":"en","text":"$text"}""".getBytes
    val longDoc = (0 until 150).map(i => s"w$i").mkString(" ") // starts 1,49,97 -> 3 chunks
    val shortDoc = (0 until 10).map(i => s"s$i").mkString(" ") // 1 chunk
    raw.append(Seq(doc(longDoc), doc(shortDoc)))

    val engine = Engine(spark, TestSpark.tempDir("chunk-out"))
    val ckpt = TestSpark.tempDir("chunk-ckpt")
    val chunks = TestSpark.tempDir("chunk-table")
    def table(): Set[(Long, Long, Long, String)] = spark.read
      .parquet(chunks)
      .select("offset", "chunk_id", "chunk_tokens", "chunk_hash")
      .as[(Long, Long, Long, String)]
      .collect()
      .toSet
    val q1 = engine.chunksFrom(raw.dir, ckpt, chunks)
    try {
      q1.processAllAvailable()
      val t1 = table()
      // Stream/batch agreement: the batch query over the same docs (keyed
      // by offset as doc_id) yields the identical chunk rows.
      val docsDir = TestSpark.tempDir("chunk-docs")
      Seq((0L, "en", longDoc), (1L, "en", shortDoc))
        .toDF("doc_id", "lang", "text")
        .write.parquet(s"$docsDir/documents.parquet")
      val batch = graft.SparkEntry
        .queries("corpus_chunk")(spark, docsDir)
        .as[(Long, Long, Long, String)]
        .collect()
        .toSet
      assert(t1 == batch, s"stream chunks != batch chunks: ${t1.size} vs ${batch.size}")
      assert(t1.count(_._1 == 0L) == 3 && t1.count(_._1 == 1L) == 1)
    } finally q1.stop()

    // Restart on the same checkpoint: a new doc lands in a new batch
    // partition; earlier chunks are untouched (exactly-once, no re-split).
    raw.append(Seq(doc((0 until 70).map(i => s"n$i").mkString(" "))))
    val q2 = engine.chunksFrom(raw.dir, ckpt, chunks)
    try {
      q2.processAllAvailable()
      val t2 = table()
      assert(t2.count(_._1 == 2L) == 2, s"restart: new doc not chunked: ${t2.map(_._1)}")
      assert(t2.size == 6)
      val parts = new java.io.File(chunks).listFiles().count(_.getName.startsWith("batch="))
      assert(parts == 2, "each micro-batch owns exactly one partition")
    } finally q2.stop()
  }

  test("streaming top-k maintains the derived heavy-hitter table across a restart") {
    // The product surface over streamingTopK (CLI stream-topk): JSON
    // events tail from the log, each event-time window keeps ONE bounded
    // SpaceSaving summary, and rows land in the derived table exactly
    // once, when the watermark closes their window.
    val session = spark
    import session.implicits._
    val raw = SparkLog(spark, TestSpark.tempDir("topk-raw"), LogConfig())
    def ev(user: Long, hhmm: String): Array[Byte] =
      s"""{"user_id":$user,"ts":"2024-01-01 $hhmm:00","event_type":"click"}""".getBytes
    raw.append(
      (1 to 5).map(m => ev(7L, s"10:0$m")) ++
        (1 to 3).map(m => ev(9L, s"10:1$m")) ++
        Seq(
          ev(11L, "10:20"),
          "not json at all".getBytes, // a bad record must be skipped, not fatal
          ev(1L, "12:10") // pushes the watermark past 11:00 -> 10:00 window closes
        )
    )

    val engine = Engine(spark, TestSpark.tempDir("topk-out"))
    val ckpt = TestSpark.tempDir("topk-ckpt")
    val topk = TestSpark.tempDir("topk-table")
    def table(): Set[(java.sql.Timestamp, Long, Long, Long, Int)] = spark.read
      .parquet(topk)
      .select("window_start", "user_id", "est_count", "max_overcount", "rank")
      .as[(java.sql.Timestamp, Long, Long, Long, Int)]
      .collect()
      .toSet
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")

    val q1 = engine.topKFrom(raw.dir, ckpt, topk, k = 2)
    try {
      q1.processAllAvailable()
      assert(
        table() == Set((ts("10:00"), 7L, 5L, 0L, 1), (ts("10:00"), 9L, 3L, 0L, 2)),
        s"closed window must finalize its top-2: ${table()}"
      )
    } finally q1.stop()

    // Restart on the same checkpoint: the open 12:00 window's state was
    // restored; a later event closes it, and the already-final rows are
    // untouched.
    raw.append(Seq(ev(2L, "14:30")))
    val q2 = engine.topKFrom(raw.dir, ckpt, topk, k = 2)
    try {
      q2.processAllAvailable()
      val t2 = table()
      assert(t2.contains((ts("12:00"), 1L, 1L, 0L, 1)),
        s"restored 12:00 window must finalize after restart: $t2")
      assert(t2.filter(_._1 == ts("10:00")) ==
        Set((ts("10:00"), 7L, 5L, 0L, 1), (ts("10:00"), 9L, 3L, 0L, 2)),
        "final rows must never change across restarts")
    } finally q2.stop()
  }

  test("streaming transitions maintain the derived pair table across a restart") {
    // The product surface over streamingTransitions (CLI stream-flow):
    // pair rows are immutable once emitted; a restart restores each
    // user's chain scalar + pending buffer from the checkpoint, so
    // chains CONTINUE across restarts (the purchase->view edge below
    // spans the restart boundary).
    val session = spark
    import session.implicits._
    val raw = SparkLog(spark, TestSpark.tempDir("sflow-raw"), LogConfig())
    def ev(user: Long, hhmm: String, t: String): Array[Byte] =
      s"""{"user_id":$user,"ts":"2024-01-01 $hhmm:00","event_type":"$t"}""".getBytes
    raw.append(Seq(
      ev(5L, "10:00", "view"), ev(5L, "10:05", "click"),
      "not json at all".getBytes, // skipped, not fatal
      ev(5L, "10:10", "purchase"),
      ev(9L, "12:10", "view") // advances the watermark to 12:00; itself pending
    ))
    val engine = Engine(spark, TestSpark.tempDir("sflow-out"))
    val ckpt = TestSpark.tempDir("sflow-ckpt")
    val out = TestSpark.tempDir("sflow-table")
    def table(): Set[(Long, String, String)] = spark.read
      .parquet(out)
      .select("user_id", "from_type", "to_type")
      .as[(Long, String, String)]
      .collect()
      .toSet

    val q1 = engine.transitionsFrom(raw.dir, ckpt, out)
    try {
      q1.processAllAvailable()
      assert(
        table() == Set((5L, "view", "click"), (5L, "click", "purchase")),
        s"user 5's chain below the watermark must finalize: ${table()}"
      )
    } finally q1.stop()

    // Restart: user 5's chain continues from its restored scalar, user
    // 9's buffered view pairs with its click, and the already-final rows
    // are untouched.
    raw.append(Seq(
      ev(9L, "12:20", "click"), ev(5L, "12:30", "view"),
      ev(1L, "23:00", "view") // watermark pusher; itself pending
    ))
    val q2 = engine.transitionsFrom(raw.dir, ckpt, out)
    try {
      q2.processAllAvailable()
      assert(
        table() == Set(
          (5L, "view", "click"), (5L, "click", "purchase"), (5L, "purchase", "view"),
          (9L, "view", "click")
        ),
        s"chains must continue across the restart: ${table()}"
      )
    } finally q2.stop()
  }

  test("streaming attribution credits continue across restart over the real log") {
    // The feed of the CLI stream-attribution: the last-touch scalar
    // restores from the checkpoint, so a purchase AFTER the restart
    // credits a touch finalized BEFORE it; already-credited rows are
    // untouched; bad records skip.
    val session = spark
    import session.implicits._
    val raw = SparkLog(spark, TestSpark.tempDir("sattr-raw"), LogConfig())
    def ev(user: Long, hhmm: String, t: String, v: Double): Array[Byte] =
      s"""{"user_id":$user,"ts":"2024-01-01 $hhmm:00","event_type":"$t","value":$v}""".getBytes
    raw.append(Seq(
      ev(5L, "10:00", "view", 0.0),
      "not json at all".getBytes, // skipped, not fatal
      ev(5L, "10:10", "purchase", 12.34),
      ev(9L, "12:10", "view", 0.0) // advances the watermark to 12:00; itself pending
    ))
    val engine = Engine(spark, TestSpark.tempDir("sattr-out"))
    val ckpt = TestSpark.tempDir("sattr-ckpt")
    val out = TestSpark.tempDir("sattr-table")
    def table(): Set[(Long, String, Long)] = spark.read
      .parquet(out)
      .select("user_id", "channel", "cents")
      .as[(Long, String, Long)]
      .collect()
      .toSet

    val q1 = engine.attributionFrom(raw.dir, ckpt, out)
    try {
      q1.processAllAvailable()
      assert(
        table() == Set((5L, "view", 1234L)),
        s"user 5's purchase below the watermark must credit its view: ${table()}"
      )
    } finally q1.stop()

    // Restart: user 5 purchases again with NO new touch — the restored
    // last-touch scalar (the 10:00 view) must credit it; user 9's
    // buffered view becomes its touch for a later purchase.
    raw.append(Seq(
      ev(5L, "12:30", "purchase", 5.0),
      ev(9L, "12:40", "purchase", 7.0),
      ev(1L, "23:00", "view", 0.0) // watermark pusher; itself pending
    ))
    val q2 = engine.attributionFrom(raw.dir, ckpt, out)
    try {
      q2.processAllAvailable()
      assert(
        table() == Set((5L, "view", 1234L), (5L, "view", 500L), (9L, "view", 700L)),
        s"credits must continue across the restart: ${table()}"
      )
    } finally q2.stop()
  }

  test("streaming sessions merge across restart; finalized sessions never reopen") {
    // The feed of the CLI stream-sessions: an OPEN session (not yet past
    // end + gap at the watermark) restores from the checkpoint, so an
    // event arriving AFTER the restart extends it rather than starting a
    // new row; sessions already finalized stay untouched.
    val session = spark
    import session.implicits._
    val raw = SparkLog(spark, TestSpark.tempDir("ssess-raw"), LogConfig())
    def ev(user: Long, hhmm: String): Array[Byte] =
      s"""{"user_id":$user,"ts":"2024-01-01 $hhmm:00","event_type":"view"}""".getBytes
    raw.append(Seq(
      ev(5L, "10:00"), ev(5L, "10:10"),
      ev(9L, "12:10") // watermark → 12:00; user 5's session (ends 10:10,
      //                 +30min gap = 10:40 < 12:00) finalizes; 9 pending
    ))
    val engine = Engine(spark, TestSpark.tempDir("ssess-out"))
    val ckpt = TestSpark.tempDir("ssess-ckpt")
    val out = TestSpark.tempDir("ssess-table")
    def table(): Set[(Long, String, String, Long)] = spark.read
      .parquet(out)
      .selectExpr("user_id", "CAST(start AS STRING)", "CAST(end AS STRING)", "n_events")
      .as[(Long, String, String, Long)]
      .collect()
      .toSet

    val q1 = engine.sessionsFrom(raw.dir, ckpt, out)
    try {
      q1.processAllAvailable()
      assert(
        table() == Set((5L, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2L)),
        s"user 5's gap-closed session must finalize: ${table()}"
      )
    } finally q1.stop()

    // Restart: user 9's 12:15 event EXTENDS its restored open session
    // (12:10 + gap not yet passed); the pusher finalizes both.
    raw.append(Seq(ev(9L, "12:15"), ev(1L, "23:00")))
    val q2 = engine.sessionsFrom(raw.dir, ckpt, out)
    try {
      q2.processAllAvailable()
      assert(
        table() == Set(
          (5L, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2L),
          (9L, "2024-01-01 12:10:00", "2024-01-01 12:15:00", 2L)
        ),
        s"the restored open session must extend, not split: ${table()}"
      )
    } finally q2.stop()
  }

  test("streaming daily counts merge a day's events across restart and never re-finalize") {
    // The feed of the anomaly surface (CLI stream-anomaly): a day's count
    // can accumulate across batches AND a restart (the windowed-agg state
    // restores from the checkpoint); each day lands in the derived table
    // exactly once, when the watermark passes midnight.
    val session = spark
    import session.implicits._
    val raw = SparkLog(spark, TestSpark.tempDir("sdaily-raw"), LogConfig())
    def ev(day: Int, hhmm: String): Array[Byte] =
      s"""{"user_id":1,"ts":"2024-01-0$day $hhmm:00","event_type":"view"}""".getBytes
    raw.append(Seq(
      ev(1, "10:00"), ev(1, "10:05"), ev(1, "10:10"),
      ev(3, "00:30") // pushes the watermark past Jan 1 midnight; counts into Jan 3
    ))
    val engine = Engine(spark, TestSpark.tempDir("sdaily-out"))
    val ckpt = TestSpark.tempDir("sdaily-ckpt")
    val out = TestSpark.tempDir("sdaily-table")
    def table(): Set[(String, Long)] = spark.read
      .parquet(out)
      .select("day", "n")
      .as[(java.sql.Date, Long)]
      .collect()
      .map { case (d, n) => (d.toString, n) }
      .toSet

    val q1 = engine.dailyCountsFrom(raw.dir, ckpt, out)
    try {
      q1.processAllAvailable()
      assert(table() == Set(("2024-01-01", 3L)), s"Jan 1 must finalize with 3: ${table()}")
    } finally q1.stop()

    // Restart: Jan 3 gains a second event (restored open-day state must
    // merge it), then a Jan 5 event closes Jan 3. Jan 1 stays untouched.
    raw.append(Seq(ev(3, "23:00"), ev(5, "12:00")))
    val q2 = engine.dailyCountsFrom(raw.dir, ckpt, out)
    try {
      q2.processAllAvailable()
      assert(
        table() == Set(("2024-01-01", 3L), ("2024-01-03", 2L)),
        s"Jan 3 must merge across the restart to 2: ${table()}"
      )
    } finally q2.stop()
  }

  test("streaming funnel maintains the derived stage table across a restart") {
    // The product surface over streamingFunnel (CLI stream-funnel):
    // stage rows are immutable once emitted, so the derived table only
    // ever GROWS, and a restart restores in-flight per-user state from
    // the checkpoint.
    val session = spark
    import session.implicits._
    val raw = SparkLog(spark, TestSpark.tempDir("sfunnel-raw"), LogConfig())
    def ev(user: Long, hhmm: String, t: String): Array[Byte] =
      s"""{"user_id":$user,"ts":"2024-01-01 $hhmm:00","event_type":"$t"}""".getBytes
    raw.append(Seq(
      ev(5L, "10:00", "view"), ev(5L, "10:05", "click"), ev(5L, "10:30", "purchase"),
      ev(6L, "10:02", "view"),
      ev(9L, "23:50", "view") // advances the watermark; its own window stays open
    ))

    val engine = Engine(spark, TestSpark.tempDir("sfunnel-out"))
    val ckpt = TestSpark.tempDir("sfunnel-ckpt")
    val out = TestSpark.tempDir("sfunnel-table")
    def table(): Set[(Long, String)] = spark.read
      .parquet(out)
      .select("user_id", "stage")
      .as[(Long, String)]
      .collect()
      .toSet

    val q1 = engine.funnelFrom(raw.dir, ckpt, out)
    try {
      q1.processAllAvailable()
      val t1 = table()
      assert(t1.filter(_._1 == 5L).map(_._2) == Set("1_view", "2_click", "3_purchase"),
        s"completed funnel must emit all three stages: $t1")
      assert(t1.filter(_._1 == 6L).map(_._2) == Set("1_view"))
    } finally q1.stop()

    // Restart: user 6 converts with an event INSIDE the restored watermark
    // horizon (the checkpointed watermark is 23:40; an older event would
    // be dropped as late data — correct streaming semantics) — the click
    // stage lands without re-emitting the view, earlier rows untouched.
    raw.append(Seq(ev(6L, "23:45", "click"), ev(9L, "23:58", "view")))
    val q2 = engine.funnelFrom(raw.dir, ckpt, out)
    try {
      q2.processAllAvailable()
      val t2 = table()
      assert(t2.filter(_._1 == 6L).map(_._2) == Set("1_view", "2_click"),
        s"restored state must extend user 6's funnel: $t2")
      assert(t2.count(_ == (6L, "1_view")) == 1, "stage rows must never re-emit")
      assert(t2.filter(_._1 == 5L).map(_._2) == Set("1_view", "2_click", "3_purchase"))
    } finally q2.stop()
  }

  test("streaming media features: decode-in-stream maintains the derived table exactly-once") {
    val session = spark
    import session.implicits._
    val raw = SparkLog(spark, TestSpark.tempDir("media-raw"), LogConfig())
    // A real PNG (pixel tier) and an ASCII blob (stub tier) in one batch.
    val img = new java.awt.image.BufferedImage(4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 3) img.setRGB(x, y, (x * 60) << 16 | (y * 80) << 8 | 40)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val txt = "just bytes, not an image".getBytes("UTF-8")
    raw.append(Seq(png, txt))

    val engine = Engine(spark, TestSpark.tempDir("media-out"))
    val ckpt = TestSpark.tempDir("media-ckpt")
    val feats = TestSpark.tempDir("media-feats")
    def table(): Map[Long, (Int, Int, Int, Int, String)] = spark.read
      .parquet(feats)
      .select("offset", "n_bytes", "width", "height", "n_frames", "hist_fp")
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5))))
      .toMap
    val q1 = engine.mediaFeaturesFrom(raw.dir, ckpt, feats)
    try {
      q1.processAllAvailable()
      val t1 = table()
      assert(t1.size == 2)
      // Pixel tier: matches decoding the same bytes directly.
      val pf = graft.media.MediaDecoder.features(png).get
      assert(t1(0L) == ((png.length, pf.width, pf.height, 1, pf.lumaHist.mkString(","))))
      assert(pf.width == 4 && pf.height == 3 && pf.lumaHist.sum == 12L)
      // Stub tier: byte-arithmetic dims + byte histogram.
      val hist = new Array[Long](16); txt.foreach(b => hist((b & 0xff) % 16) += 1)
      assert(t1(1L) ==
        ((txt.length, txt.length % 640, (txt.length * 7) % 480, txt.length % 30, hist.mkString(","))))
    } finally q1.stop()

    // Restart on the same checkpoint: a new append lands in a new batch
    // partition; earlier rows are untouched (exactly-once, no re-decode).
    raw.append(Seq("second text record".getBytes("UTF-8")))
    val q2 = engine.mediaFeaturesFrom(raw.dir, ckpt, feats)
    try {
      q2.processAllAvailable()
      val t2 = table()
      assert(t2.size == 3 && t2.contains(2L), s"restart lost rows: ${t2.keySet}")
      // RAW row count, not the offset-keyed map (which would silently
      // collapse duplicates): exactly-once means exactly 3 rows on disk.
      assert(spark.read.parquet(feats).count() == 3L, "restart re-decoded earlier offsets")
    } finally q2.stop()
  }

  test("composed curation: repetition + LM gates + near-dedup over 10 batches with a restart") {
    import graft.queries.LmModel
    val session = spark
    import session.implicits._
    // Reference vocabulary: 120 words, uniform count 5 → every in-vocab
    // token scores ln(6/720); the OOV floor is ln(1/720). A threshold
    // between them separates clean docs from gibberish deterministically.
    val vocab = (1 to 120).map(i => f"word$i%03d")
    val refDocs = (0 until 5).map(_ => vocab.mkString(" ")).toDF("text")
    val modelDir = TestSpark.tempDir("composed-lm")
    LmModel.fit(spark, refDocs, modelDir)
    val cutoff = (math.log(6.0 / 720.0) + math.log(1.0 / 720.0)) / 2

    val raw = SparkLog(spark, TestSpark.tempDir("composed-raw"), LogConfig())
    def doc(text: String): Array[Byte] = s"""{"lang":"en","text":"$text"}""".getBytes
    // Per batch: a clean doc on a DISJOINT 12-word slice (no cross-batch
    // LSH collision possible), a shuffled same-set near-dup (identical
    // token set → identical MinHash signature → certain suppression), an
    // all-OOV gibberish doc, and a word-repetitive doc.
    def slice(b: Int): Seq[String] = vocab.slice(12 * b, 12 * b + 12)
    def clean(b: Int) = slice(b).mkString(" ")
    def nearDup(b: Int) = (slice(b).drop(3) ++ slice(b).take(3)).mkString(" ")
    def gibberish(b: Int) = (1 to 12).map(i => f"zz$b%02d$i%02d").mkString(" ")
    def repetitive(b: Int) =
      (Seq.fill(5)(slice(b).head) ++ slice(b).slice(1, 8)).mkString(" ")

    val engine = Engine(spark, TestSpark.tempDir("composed-out"))
    val ckpt = TestSpark.tempDir("composed-ckpt")
    val idx = TestSpark.tempDir("composed-idx")
    def run(): Unit = {
      val q = engine.curateNearFrom(
        raw.dir, ckpt, idx,
        repetitionGate = true,
        lmQuality = Some(modelDir -> cutoff)
      )
      try q.processAllAvailable()
      finally q.stop()
    }
    // Batches 0-4 under one query run, restart, then 5-9 under another —
    // the gates are stateless and the dedup history is storage-backed, so
    // the restart must be invisible in the result.
    for (b <- 0 until 5)
      raw.append(Seq(doc(clean(b)), doc(nearDup(b)), doc(gibberish(b)), doc(repetitive(b))))
    run()
    for (b <- 5 until 10)
      raw.append(Seq(doc(clean(b)), doc(nearDup(b)), doc(gibberish(b)), doc(repetitive(b))))
    run()

    val kept = engine.toDF
      .orderBy("offset")
      .collect()
      .map(r => new String(r.getAs[Array[Byte]]("value")))
      .toSeq
    assert(
      kept == (0 until 10).map(b => new String(doc(clean(b)))),
      s"composed pipeline kept ${kept.size} docs: expected exactly the 10 clean docs in order"
    )
  }

  test("ann index: build/probe split, rebuild-on-append, crash debris ignored") {
    import graft.queries.AnnIndex
    val session = spark
    import session.implicits._
    val dir = TestSpark.tempDir("ann-rebuild")
    val tableDir = s"$dir/embeddings.parquet"
    val idx = s"$dir/index"
    def vec(seed: Int): Array[Float] =
      Array.tabulate(8)(i => (math.sin(seed * 31 + i) * 100).toFloat)
    def writeTable(n: Int): Unit =
      (0 until n)
        .map(i => (i.toLong, i % 3, vec(i)))
        .toDF("vec_id", "label", "embedding")
        .write.mode("overwrite").parquet(tableDir)

    writeTable(40)
    val emb = () => spark.read.parquet(tableDir)
    val v1 = AnnIndex.build(spark, emb(), idx)
    assert(v1 == 1L && AnnIndex.current(spark, idx).contains((1L, 40L)))

    // Probe result must match the same computation done from scratch on
    // the raw table (the knn_ivf_dist shape) — the index adds persistence,
    // not semantics.
    def probes() = emb()
      .select(col("vec_id").as("qid"), transform(col("embedding"), x => x.cast("double")).as("qv"))
      .filter(col("qid") < 4)
    def results() =
      AnnIndex.probe(spark, idx, probes(), nProbe = 2, k = 3)
        .orderBy("qid", "rank")
        .select("qid", "vec_id", "rank")
        .as[(Long, Long, Int)]
        .collect()
        .toSeq
    val r1 = results()
    assert(r1.nonEmpty && r1.forall(_._3 <= 3))

    // Rebuild-on-append: the table grows; a stale index must be detected
    // (marker row count) and a fresh build must supersede + prune v=1.
    writeTable(64)
    assert(AnnIndex.current(spark, idx).contains((1L, 40L)), "index is stale, not gone")
    val v2 = AnnIndex.build(spark, emb(), idx)
    assert(v2 == 2L && AnnIndex.current(spark, idx).contains((2L, 64L)))
    assert(!new java.io.File(s"$idx/v=1").exists(), "superseded version must be pruned")
    val r2 = results()
    // New vectors can enter the top-k; the probe must reflect the new
    // corpus (at minimum: still well-formed and over the larger table).
    assert(r2.nonEmpty && r2.forall(_._3 <= 3))

    // Crash-safety: a half-written higher version (no _complete marker —
    // the build died mid-write) is invisible to readers and harmless.
    new java.io.File(s"$idx/v=3/cells").mkdirs()
    assert(AnnIndex.current(spark, idx).contains((2L, 64L)), "incomplete v=3 must be ignored")
    assert(results() == r2, "probe must keep reading the last complete version")
    // The next build lands on the debris version number (current+1 = 3),
    // overwriting the half-written directories and committing them.
    val v3 = AnnIndex.build(spark, emb(), idx)
    assert(v3 == 3L && AnnIndex.current(spark, idx).contains((3L, 64L)))
    assert(!new java.io.File(s"$idx/v=2").exists(), "superseded version must be pruned")
    assert(results() == r2, "identical corpus -> identical probe results")
  }

  test("ann index: append-only delta updates, crash recovery, recentre consolidation") {
    import graft.queries.AnnIndex
    val session = spark
    import session.implicits._
    val dir = TestSpark.tempDir("ann-append")
    val idx = s"$dir/index"
    def vec(seed: Int): Array[Float] =
      Array.tabulate(8)(i => (math.sin(seed * 31 + i) * 100).toFloat)
    def table(ids: Range) =
      ids.map(i => (i.toLong, i % 3, vec(i))).toDF("vec_id", "label", "embedding")

    val v1 = AnnIndex.build(spark, table(0 until 40), idx)
    assert(v1 == 1L)
    def probes() = table(0 until 4)
      .select(col("vec_id").as("qid"), transform(col("embedding"), x => x.cast("double")).as("qv"))
    def results() =
      AnnIndex.probe(spark, idx, probes(), nProbe = 3, k = 40)
        .select("qid", "vec_id")
        .as[(Long, Long)]
        .collect()
        .toSet
    val r1 = results()
    assert(r1.nonEmpty && !r1.exists(_._2 >= 40L))

    // Record the base's cell files: an append must not rewrite any.
    def cellFiles(v: Long): Set[String] = {
      val root = java.nio.file.Paths.get(s"$idx/v=$v/cells")
      val s = java.nio.file.Files.walk(root)
      try s.iterator().asScala.filter(_.toString.endsWith(".parquet")).map(_.toString).toSet
      finally s.close()
    }
    val baseFiles = cellFiles(1L)
    val baseStamps = baseFiles.map(f =>
      f -> java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(f))).toMap

    // Append 24 new vectors: a delta version with a _base pointer; the
    // probe must see them immediately, the base lists must be untouched.
    val v2 = AnnIndex.append(spark, table(40 until 64), idx)
    assert(v2 == 2L && AnnIndex.current(spark, idx).contains((2L, 64L)))
    assert(new java.io.File(s"$idx/v=2/_base").exists(), "append must record its base")
    assert(new java.io.File(s"$idx/v=1").exists(), "append must NOT prune its base")
    assert(cellFiles(1L) == baseFiles, "append must not add/remove base cell files")
    baseStamps.foreach { case (f, t) =>
      assert(java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(f)) == t,
        s"append rewrote a base cell file: $f")
    }
    val r2 = results()
    assert(r2.exists(_._2 >= 40L), "probe must surface appended vectors without a rebuild")

    // Crash mid-append: cells + _base written, marker never lands. The
    // current index is unaffected; the NEXT append lands on the debris
    // number and overwrites it (same recipe as build).
    val debris = s"$idx/v=3"
    table(64 until 66)
      .select(col("vec_id"), lit(0).as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .write.partitionBy("cell").parquet(s"$debris/cells")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$debris/_base"), "base=2".getBytes)
    assert(AnnIndex.current(spark, idx).contains((2L, 64L)), "incomplete append must be invisible")
    assert(results() == r2, "probe must keep reading the last complete chain")
    val v3 = AnnIndex.append(spark, table(64 until 72), idx)
    assert(v3 == 3L && AnnIndex.current(spark, idx).contains((3L, 72L)))
    val r3 = results()
    assert(r3.exists(_._2 >= 64L) && !r3.exists(t => t._2 == 64L && false), "second delta visible")

    // Recentre: the chain folds into one full version — same members,
    // recomputed centroids, no _base, old chain pruned.
    val v4 = AnnIndex.recentre(spark, idx)
    assert(v4 == 4L && AnnIndex.current(spark, idx).contains((4L, 72L)))
    assert(!new java.io.File(s"$idx/v=4/_base").exists(), "recentre must be a full version")
    assert(!new java.io.File(s"$idx/v=1").exists() && !new java.io.File(s"$idx/v=3").exists(),
      "recentre must prune the folded chain")
    // Membership preserved: the consolidated index serves the same vector
    // set (ranks can shift — centroids moved, so probe cells may differ).
    val r4 = results()
    assert(r4.map(_._2).size >= r3.map(_._2).size / 2 && r4.nonEmpty)
    val consolidated = spark.read.parquet(s"$idx/v=4/cells")
    assert(consolidated.count() == 72L, "recentre must carry every chained vector")
  }

  test("ann index: tombstone deletes hide vectors immediately; recentre reclaims the space") {
    // The curation companion: a doc dropped from the corpus must leave
    // the index in O(delta) — a delete version holds only the tombstone
    // ids + a _base pointer, no inverted list rewrites; probes mask the
    // chain-wide delete set at once, and the next recentre drops the
    // vectors physically.
    import graft.queries.AnnIndex
    val session = spark
    import session.implicits._
    val dir = TestSpark.tempDir("ann-delete")
    val idx = s"$dir/index"
    def vec(seed: Int): Array[Float] =
      Array.tabulate(8)(i => (math.sin(seed * 13 + i) * 100).toFloat)
    def table(ids: Range) =
      ids.map(i => (i.toLong, i % 3, vec(i))).toDF("vec_id", "label", "embedding")
    def probes() = table(10 until 14)
      .select(col("vec_id").as("qid"), transform(col("embedding"), x => x.cast("double")).as("qv"))
    def seen(): Set[Long] =
      AnnIndex.probe(spark, idx, probes(), nProbe = 3, k = 60)
        .select("vec_id").as[Long].collect().toSet

    val v1 = AnnIndex.build(spark, table(0 until 40), idx)
    assert(v1 == 1L && seen().contains(0L))

    // Dimension guard: a delta or probe with the wrong vector width must
    // fail loudly (cosine_similarity nulls mismatched lengths, which
    // would otherwise silently assign every vector to an arbitrary cell).
    val wrongDim = Seq((500L, 0, Array.tabulate(4)(_.toFloat)))
      .toDF("vec_id", "label", "embedding")
    val eDim = intercept[IllegalArgumentException](AnnIndex.append(spark, wrongDim, idx))
    assert(eDim.getMessage.contains("does not match"), eDim.getMessage)
    val wrongProbe = wrongDim
      .select(col("vec_id").as("qid"), transform(col("embedding"), x => x.cast("double")).as("qv"))
    val ePr = intercept[IllegalArgumentException](
      AnnIndex.probe(spark, idx, wrongProbe).collect()
    )
    assert(ePr.getMessage.contains("does not match"), ePr.getMessage)

    // Delete 3 vectors (plus one id that does not exist — must not skew
    // the row count) — visible immediately, lists untouched.
    val v2 = AnnIndex.delete(spark, Seq(0L, 1L, 2L, 999L).toDF("vec_id"), idx)
    assert(v2 == 2L && AnnIndex.current(spark, idx).contains((2L, 37L)))
    assert(new java.io.File(s"$idx/v=2/_base").exists() &&
      new java.io.File(s"$idx/v=2/deletes").exists())
    assert(!new java.io.File(s"$idx/v=2/cells").exists(), "a delete version carries no lists")
    val s2 = seen()
    assert(s2.intersect(Set(0L, 1L, 2L)).isEmpty, s"tombstoned ids still probed: $s2")
    assert(s2.nonEmpty)

    // Append atop the delete version: chain 3→2→1 serves new + old minus
    // tombstoned.
    val v3 = AnnIndex.append(spark, table(40 until 48), idx)
    assert(v3 == 3L && AnnIndex.current(spark, idx).contains((3L, 45L)))
    val s3 = seen()
    assert(s3.exists(_ >= 40L) && s3.intersect(Set(0L, 1L, 2L)).isEmpty)

    // Recentre folds the chain: tombstoned vectors drop PHYSICALLY.
    val v4 = AnnIndex.recentre(spark, idx)
    assert(v4 == 4L && AnnIndex.current(spark, idx).contains((4L, 45L)))
    assert(spark.read.parquet(s"$idx/v=4/cells").count() == 45L,
      "recentre must reclaim tombstoned vectors")
    assert(!new java.io.File(s"$idx/v=4/deletes").exists() &&
      !new java.io.File(s"$idx/v=4/_base").exists())
    assert(seen().intersect(Set(0L, 1L, 2L)).isEmpty)
  }

  test("ann index: a full build/recentre over crashed-append debris must not chain to it") {
    // ADVICE r8 (medium): an append that died between `_base` and the
    // marker leaves a stale `_base` at v=N+1. cells/centroids overwrite on
    // the next attempt, but the orphan `_base` survived — so a FULL build
    // landing on that number looked like a delta chained to the superseded
    // head: probes unioned the rebuild with the old chain, duplicating
    // vectors and resurrecting ones the rebuild dropped. build/recentre now
    // clear the whole stale version directory first.
    import graft.queries.AnnIndex
    val session = spark
    import session.implicits._
    val dir = TestSpark.tempDir("ann-stale-base")
    val idx = s"$dir/index"
    def vec(seed: Int): Array[Float] =
      Array.tabulate(8)(i => (math.cos(seed * 17 + i) * 100).toFloat)
    def table(ids: Range) =
      ids.map(i => (i.toLong, i % 3, vec(i))).toDF("vec_id", "label", "embedding")

    val v1 = AnnIndex.build(spark, table(0 until 40), idx)
    assert(v1 == 1L)

    // Crashed append at v=2: cells + _base landed, marker did not.
    val debris = s"$idx/v=2"
    table(100 until 102)
      .select(col("vec_id"), lit(0).as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .write.partitionBy("cell").parquet(s"$debris/cells")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$debris/_base"), "base=1".getBytes)

    // Full REBUILD that drops vectors 10..39: must land on v=2 as its own
    // chain — no _base, no union with the superseded v=1.
    val v2 = AnnIndex.build(spark, table(0 until 10), idx)
    assert(v2 == 2L && AnnIndex.current(spark, idx).contains((2L, 10L)))
    assert(!new java.io.File(s"$idx/v=2/_base").exists(),
      "stale _base must not survive a full rebuild at the same version")
    val probes = table(0 until 4)
      .select(col("vec_id").as("qid"), transform(col("embedding"), x => x.cast("double")).as("qv"))
    val seen = AnnIndex.probe(spark, idx, probes, nProbe = 3, k = 40)
      .select("qid", "vec_id").as[(Long, Long)].collect()
    assert(seen.nonEmpty && seen.forall(_._2 < 10L),
      s"rebuild resurrected dropped vectors: ${seen.filter(_._2 >= 10L).take(5).toSeq}")
    assert(seen.distinct.length == seen.length, "rebuild duplicated vectors via the stale chain")

    // Same hazard for recentre: plant debris at head+1, then fold.
    val debris2 = s"$idx/v=3"
    table(100 until 102)
      .select(col("vec_id"), lit(0).as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .write.partitionBy("cell").parquet(s"$debris2/cells")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$debris2/_base"), "base=2".getBytes)
    val v3 = AnnIndex.recentre(spark, idx)
    assert(v3 == 3L && AnnIndex.current(spark, idx).contains((3L, 10L)))
    assert(!new java.io.File(s"$idx/v=3/_base").exists(),
      "stale _base must not survive a recentre at the same version")
    assert(spark.read.parquet(s"$idx/v=3/cells").count() == 10L,
      "recentre folded debris vectors into the consolidated version")
  }
}
