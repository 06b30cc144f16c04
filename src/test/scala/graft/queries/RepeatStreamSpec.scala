package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** The resumable epoch-stream pager vs its batch contract: draining the
  * chunks must reproduce EXACTLY the corpus_repeat_apply multiset in the
  * (source, epoch, shard, pos) total order; restarts (incl. a crash that
  * left an uncommitted chunk) never duplicate or drop a row; the page
  * size never changes the concatenated stream.
  */
class RepeatStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def drain(out: String, pageRows: Int, maxPages: Int = 1000): Vector[(Int, Long)] = {
    val emitted = Vector.newBuilder[(Int, Long)]
    var k = 0
    var done = false
    while (k < maxPages && !done) {
      RepeatStream.emitNext(spark, d, out, pageRows) match {
        case Some((seq, rows, _)) => emitted += ((seq, rows)); k += 1
        case None                 => done = true
      }
    }
    emitted.result()
  }

  private def concatenated(out: String): Vector[(Long, String, Long, Long, Long, Long)] = {
    import spark.implicits._
    RepeatStream.committedSeqs(spark, out).flatMap { seq =>
      spark.read
        .parquet(f"$out/chunk-$seq%06d")
        .orderBy("source", "epoch", "shard", "pos")
        .select("doc_id", "source", "epoch", "n_tokens", "shard", "pos")
        .as[(Long, String, Long, Long, Long, Long)]
        .collect()
        .toVector
    }
  }

  private def batchReference(): Vector[(Long, String, Long, Long, Long, Long)] = {
    import spark.implicits._
    val ref = RepeatStream
      .orderedRows(spark, d)
      .orderBy("source", "epoch", "shard", "pos")
      .as[(Long, String, Long, Long, Long, Long)]
      .collect()
      .toVector
    Checkpoints.release()
    ref
  }

  test("drained chunks == corpus_repeat_apply expansion in shuffle order; resume is seamless") {
    val ref = batchReference()
    assert(ref.nonEmpty)
    // Cross-check the multiset against the oracle-checked query itself.
    import spark.implicits._
    val queryRows = SparkEntry
      .queries("corpus_repeat_apply")(spark, d)
      .select("doc_id", "source", "epoch", "n_tokens")
      .as[(Long, String, Long, Long)]
      .collect()
      .toVector
      .sorted
    Checkpoints.release()
    assert(ref.map(r => (r._1, r._2, r._3, r._4)).sorted == queryRows,
      "ordered stream lost/invented rows vs the oracle-checked query")

    val pageRows = math.max(1, ref.size / 7)
    val out = TestSpark.tempDir("repeat-stream") + "/s"
    // First session: two pages, then "stop".
    val first = drain(out, pageRows, maxPages = 2)
    assert(first.map(_._1) == Vector(0, 1))
    // Second session resumes where the first left off and drains.
    val rest = drain(out, pageRows)
    assert(rest.headOption.map(_._1).contains(2), s"resume did not continue at chunk 2: $rest")
    assert(concatenated(out) == ref, "concatenated chunks != batch order")
    // Drained: another call is a no-op and leaves no new chunk.
    val seqsBefore = RepeatStream.committedSeqs(spark, out)
    assert(RepeatStream.emitNext(spark, d, out, pageRows).isEmpty)
    assert(RepeatStream.committedSeqs(spark, out) == seqsBefore)
  }

  test("a crash-leftover uncommitted chunk is overwritten, never double-counted") {
    val ref = batchReference()
    val pageRows = math.max(1, ref.size / 5)
    val out = TestSpark.tempDir("repeat-crash") + "/s"
    assert(drain(out, pageRows, maxPages = 1).size == 1)
    // Simulate a crash mid-chunk-write: chunk-000001 dir exists WITHOUT
    // _SUCCESS (partial page, marker never landed).
    val partial = new java.io.File(s"$out/chunk-000001")
    assert(partial.mkdirs())
    val junk = new java.io.File(partial, "part-junk.parquet")
    java.nio.file.Files.write(junk.toPath, Array[Byte](1, 2, 3))
    assert(RepeatStream.committedSeqs(spark, out) == Vector(0))
    // The retry recomputes chunk 1 from the committed cursor and
    // overwrites the debris; the drained stream is exact.
    drain(out, pageRows)
    assert(concatenated(out) == ref)
  }

  test("two concurrent resuming readers extend one stream; every consumer sees identical pages") {
    val ref = batchReference()
    val pageRows = math.max(1, ref.size / 9)
    val out = TestSpark.tempDir("repeat-conc") + "/s"
    // Reader A emits one page, "pauses"; both readers then race resuming
    // emitNext-until-drained from separate threads.
    assert(drain(out, pageRows, maxPages = 1).size == 1)
    val emitted =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long)]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val readers = Seq("A", "B").map { name =>
      new Thread(() => {
        try {
          var done = false
          while (!done) {
            RepeatStream.emitNext(spark, d, out, pageRows) match {
              case Some((seq, rows, _)) => emitted.add((name, seq, rows))
              case None                 => done = true
            }
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    readers.foreach(_.start())
    readers.foreach(_.join(120000))
    assert(errors.isEmpty, s"concurrent readers threw: ${errors.toArray.mkString("; ")}")
    // Exactly-once: each seq was committed by exactly one reader, and the
    // union covers the stream with no gaps.
    import scala.jdk.CollectionConverters._
    val bySeq = emitted.asScala.toVector.groupBy(_._2)
    assert(bySeq.forall(_._2.size == 1), s"a chunk was emitted twice: $bySeq")
    val seqs = RepeatStream.committedSeqs(spark, out)
    assert(seqs == (0 until seqs.size).toVector)
    // Every consumer reading chunk-* in seq order sees the reference
    // stream byte-for-byte — identical page contents for both readers.
    assert(concatenated(out) == ref)
  }

  test("a corpus bump mid-stream refuses to straddle versions; a fresh stream serves the new corpus") {
    val session = spark
    import session.implicits._
    val docsDir = TestSpark.tempDir("repeat-bump-docs")
    // Distinct doc_id ranges per version so every emitted row attributes
    // to exactly one corpus version.
    def writeCorpus(idBase: Long, n: Int): Unit =
      (0 until n)
        .map(i => (idBase + i, s"src${i % 2}", Seq.fill(20)(s"d${idBase + i} w${i % 7}").mkString(" ")))
        .toDF("doc_id", "source", "text")
        .write.mode("overwrite").parquet(s"$docsDir/documents.parquet")

    writeCorpus(0L, 12)
    val out = TestSpark.tempDir("repeat-bump") + "/s"
    val emittedV1 = {
      var rows = Vector.empty[(Int, Long)]
      (0 until 2).foreach { _ =>
        RepeatStream.emitNext(spark, docsDir, out, 15).foreach(r => rows :+= ((r._1, r._2)))
      }
      rows
    }
    assert(emittedV1.size == 2)
    val v1Chunks = RepeatStream.committedSeqs(spark, out)
    val v1Content = concatWithDocs(out)

    // v=N bump: the corpus republishes in place (different docs).
    writeCorpus(100L, 9)

    // BOTH a fresh reader and a would-be resumer refuse: the cursor is a
    // position in the old corpus's deal — no page may straddle versions.
    val e = intercept[RepeatStream.CorpusChangedException] {
      RepeatStream.emitNext(spark, docsDir, out, 15)
    }
    assert(e.getMessage.contains("fresh stream dir"))
    // Committed chunks are untouched and still wholly old-corpus pages.
    assert(RepeatStream.committedSeqs(spark, out) == v1Chunks)
    assert(concatWithDocs(out) == v1Content)
    assert(v1Content.forall(_ < 100L), "a page straddled corpus versions")

    // The new version streams from a FRESH dir, pinned to the new bytes.
    val out2 = TestSpark.tempDir("repeat-bump2") + "/s"
    while (RepeatStream.emitNext(spark, docsDir, out2, 1000).nonEmpty) ()
    val v2Content = concatWithDocs(out2)
    assert(v2Content.nonEmpty && v2Content.forall(_ >= 100L))
  }

  /** Emitted doc_ids in stream order — attributes every page row to a
    * corpus version via the per-version doc_id ranges.
    */
  private def concatWithDocs(out: String): Vector[Long] = {
    import spark.implicits._
    RepeatStream.committedSeqs(spark, out).flatMap { seq =>
      spark.read
        .parquet(f"$out/chunk-$seq%06d")
        .orderBy("source", "epoch", "shard", "pos")
        .select("doc_id")
        .as[Long]
        .collect()
        .toVector
    }
  }

  test("page size does not change the concatenated stream") {
    val ref = batchReference()
    val outA = TestSpark.tempDir("repeat-pgA") + "/s"
    val outB = TestSpark.tempDir("repeat-pgB") + "/s"
    drain(outA, math.max(1, ref.size / 3))
    drain(outB, math.max(1, ref.size / 11))
    assert(concatenated(outA) == ref)
    assert(concatenated(outB) == ref)
    assert(RepeatStream.committedSeqs(spark, outB).size >
      RepeatStream.committedSeqs(spark, outA).size)
  }
}
