package graft.queries

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** The persisted tokenizer artifact: versioned publish, crash-point
  * recovery, fingerprint-guarded rebuild, and exact equality between the
  * probe path (persisted merges applied) and inline training.
  */
class TokenizerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit = {
    val session = spark
    import session.implicits._
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("build publishes versioned merges; probe equals inline training exactly") {
    val idx = TestSpark.tempDir("tok-build")
    val v = Tokenizer.build(spark, sf, idx, Bpe.DefaultMerges)
    assert(v == 1L)
    val (cv, meta) = Tokenizer.current(spark, idx).get
    assert(cv == 1L && meta.contains(s";k=${Bpe.DefaultMerges};"))

    val persisted = Tokenizer.merges(spark, idx)
    assert(persisted.nonEmpty && persisted.size <= Bpe.DefaultMerges)

    // The apply-only path over the persisted table must equal inline
    // training row-for-row (the merge list is a deterministic function of
    // the corpus; tie-break (count DESC, pair ASC) is total).
    val docs = Q.t(spark, sf, "documents")
    val inline =
      Bpe.tokenCounts(docs, Bpe.DefaultMerges).orderBy("doc_id").collect().toSeq
    Checkpoints.release()
    val probed =
      Bpe.tokenCountsWith(docs, persisted).orderBy("doc_id").collect().toSeq
    assert(probed == inline)
  }

  test("a crash before the marker leaves the previous version serving; rebuild recovers") {
    val dir = TestSpark.tempDir("tok-crash-docs")
    writeDocs(dir, Seq(1L -> "aa ab aa", 2L -> "ab aa ab ab"))
    val idx = TestSpark.tempDir("tok-crash-idx")
    assert(Tokenizer.build(spark, dir, idx, 4) == 1L)
    val before = Tokenizer.merges(spark, idx)

    // Crash simulation: v=2 fully written EXCEPT the marker (the last
    // PUT) — half a merges table and no _complete.
    val f = fs(idx)
    f.mkdirs(new Path(s"$idx/v=2/merges"))
    val out = f.create(new Path(s"$idx/v=2/merges/part-junk.parquet"), true)
    out.write("not parquet".getBytes("UTF-8")); out.close()

    // Readers still serve v=1 — the torn attempt is invisible.
    assert(Tokenizer.current(spark, idx).map(_._1).contains(1L))
    assert(Tokenizer.merges(spark, idx) == before)

    // The retry claims the same number: stale attempt cleared, commit
    // lands. v=1 SURVIVES this commit (live-chain retention: a reader
    // that resolved it just before the marker may still be scanning) and
    // dies only when the NEXT build commits.
    assert(Tokenizer.build(spark, dir, idx, 4) == 2L)
    assert(Tokenizer.merges(spark, idx) == before)
    assert(f.exists(new Path(s"$idx/v=1")), "previous version retained until the next commit")
    assert(!f.exists(new Path(s"$idx/v=2/merges/part-junk.parquet")), "stale attempt cleared")
    assert(Tokenizer.build(spark, dir, idx, 2) == 3L)
    assert(!f.exists(new Path(s"$idx/v=1")), "v=1 dies once v=3 commits (no reader can hold it)")
    assert(f.exists(new Path(s"$idx/v=2")), "v=2 retained for readers racing v=3's commit")
  }

  test("a reader racing a rebuild never sees a missing or torn merge list") {
    val dir = TestSpark.tempDir("tok-race-docs")
    writeDocs(dir, Seq(1L -> "aa ab aa ab", 2L -> "ab aa ab ab aa"))
    val idx = TestSpark.tempDir("tok-race-idx")
    assert(Tokenizer.build(spark, dir, idx, 4) == 1L)
    val v1Merges = Tokenizer.merges(spark, idx)

    // Reader thread: loop merges() (resolve current -> read its parquet —
    // exactly the gap live-chain retention protects) while the main
    // thread rebuilds TWICE. Every read must return one of the three
    // committed merge lists, never throw.
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() =>
      while (!stop.get()) {
        try {
          val m = Tokenizer.merges(spark, idx)
          assert(m.nonEmpty, "a resolved version must serve a complete list")
          reads.incrementAndGet()
        } catch { case t: Throwable => failures.add(t); stop.set(true) }
      }
    )
    reader.start()
    try {
      writeDocs(dir, Seq(1L -> "cd cd ce", 2L -> "cd ce ce cd"))
      assert(Tokenizer.build(spark, dir, idx, 4) == 2L)
      writeDocs(dir, Seq(1L -> "fg fg fh", 2L -> "fg fh fh fg"))
      assert(Tokenizer.build(spark, dir, idx, 4) == 3L)
    } finally {
      stop.set(true)
      reader.join(30000)
    }
    assert(failures.isEmpty, s"racing reader failed: ${Option(failures.peek()).map(_.toString)}")
    assert(reads.get() > 0, "the reader must have completed reads during the rebuilds")
    assert(Tokenizer.merges(spark, idx) != v1Merges, "the rebuilds actually changed the artifact")
  }

  test("ensureFor resolves its root through the Hadoop FileSystem (scheme URIs work)") {
    val dir = TestSpark.tempDir("tok-scheme-docs")
    writeDocs(dir, Seq(1L -> "mm mn mm", 2L -> "mn mm mn mn"))
    val root = "file://" + TestSpark.tempDir("tok-scheme-root")
    spark.conf.set("spark.graft.tokenizer.dir", root)
    try {
      val idx = Tokenizer.ensureFor(spark, dir, 4)
      assert(idx.startsWith("file:"), s"root must stay on its scheme: $idx")
      assert(Tokenizer.current(spark, idx).nonEmpty)
      assert(Tokenizer.merges(spark, idx).nonEmpty)
      assert(Tokenizer.ensureFor(spark, dir, 4) == idx, "idempotent on the scheme root too")
    } finally spark.conf.unset("spark.graft.tokenizer.dir")
  }

  test("ensureFor is idempotent until the corpus bytes or k change") {
    val dir = TestSpark.tempDir("tok-ensure-docs")
    writeDocs(dir, Seq(1L -> "xy xy xz", 2L -> "xy xz xz"))
    val idx = Tokenizer.ensureFor(spark, dir, 4)
    val v1 = Tokenizer.current(spark, idx).get._1
    assert(Tokenizer.ensureFor(spark, dir, 4) == idx)
    assert(Tokenizer.current(spark, idx).get._1 == v1, "unchanged corpus must not rebuild")

    // A different k is a different tokenizer.
    Tokenizer.ensureFor(spark, dir, 2)
    val v2 = Tokenizer.current(spark, idx).get._1
    assert(v2 > v1, "changed k must rebuild")

    // An in-place rewrite changes the listing fingerprint -> rebuild, and
    // the new merges reflect the NEW corpus.
    writeDocs(dir, Seq(1L -> "pq pq pq pr", 2L -> "pq pr pr"))
    Tokenizer.ensureFor(spark, dir, 2)
    val v3 = Tokenizer.current(spark, idx).get._1
    assert(v3 > v2, "rewritten corpus must rebuild")
    assert(Tokenizer.merges(spark, idx).exists(_.startsWith("p")))
  }

  test("text_bpe_apply through the persisted probe matches a fresh inline computation") {
    val q = SparkEntry.queries("text_bpe_apply")(spark, sf).collect().toSeq
    Checkpoints.release()
    val inline = Bpe
      .tokenCounts(Q.t(spark, sf, "documents"), Bpe.DefaultMerges)
      .select("doc_id", "n_words", "n_bpe_tokens")
      .orderBy("doc_id")
      .collect()
      .toSeq
    Checkpoints.release()
    assert(q == inline)
  }
}
