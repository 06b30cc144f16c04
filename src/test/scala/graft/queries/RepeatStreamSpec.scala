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
