package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.{Engine, TestSpark}
import graft.log.{LogConfig, SparkLog}

/** Soak of [[Engine.curateNearFrom]]: 25 micro-batches of a churning
  * corpus (fresh roots, exact permutation clones of earlier roots,
  * word-substituted near-dups) checked batch-by-batch against a driver
  * oracle that replays the EXACT contract — a doc is kept iff none of its
  * 4 MinHash band buckets is held by a previously KEPT doc (any earlier
  * batch, via the index) or by a smaller-offset doc in its own batch
  * (bucket-representative, kept or not). The oracle computes signatures
  * through the SAME production `MinHash16.compute`, so the test pins the
  * streaming plumbing (index growth, batch boundaries, exactly-once
  * appends), not the hash arithmetic.
  *
  * Also soaks the operational story: the index accrues one partition per
  * non-empty batch, `compactNearIndex` mid-run (between batches) folds
  * them into one, and the probe result is unchanged afterwards.
  */
class CurateNearSoakSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def doc(text: String): Array[Byte] =
    s"""{"lang":"en","text":"$text"}""".getBytes

  /** The doc's 4 LSH buckets under the production signature family. */
  private def buckets(text: String): Seq[(Int, Seq[Long])] = {
    val tokens = text.toLowerCase.trim.split(" ").distinct
    val arr = new GenericArrayData(tokens.map(t => UTF8String.fromString(t): Any))
    val sig = graft.functions.MinHash16.compute(arr)
    val mh = (0 until 16).map(sig.getLong)
    (0 until 4).map(b => b -> mh.slice(b * 4, b * 4 + 4))
  }

  test("25-batch near-dup curation soak matches the driver oracle; compaction mid-run") {
    val raw = SparkLog(spark, TestSpark.tempDir("near-soak-raw"), LogConfig())
    val engine = Engine(spark, TestSpark.tempDir("near-soak-out"))
    val ckpt = TestSpark.tempDir("near-soak-ckpt")
    val idx = TestSpark.tempDir("near-soak-idx") + "/index"

    val rnd = new scala.util.Random(7)
    val vocab = (0 until 400).map(i => s"tok$i")
    def freshRoot(): String =
      (0 until 12).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    def permute(t: String): String = rnd.shuffle(t.split(" ").toList).mkString(" ")
    def substitute(t: String): String = {
      val w = t.split(" ")
      w(rnd.nextInt(w.length)) = vocab(rnd.nextInt(vocab.length))
      w.mkString(" ")
    }

    // Oracle state: buckets of KEPT docs (history) + expected kept texts.
    val histBuckets = mutable.Set[(Int, Seq[Long])]()
    val expectedKept = mutable.ArrayBuffer[String]()
    val roots = mutable.ArrayBuffer[String]()

    def oracleBatch(batch: Seq[String]): Unit = {
      // Within-batch bucket minima over ALL docs (kept or not).
      val batchMin = mutable.Map[(Int, Seq[Long]), Int]()
      batch.zipWithIndex.foreach { case (t, i) =>
        buckets(t).foreach(bk => if (!batchMin.contains(bk)) batchMin(bk) = i)
      }
      val keptNow = batch.zipWithIndex.collect {
        case (t, i)
            if buckets(t).forall(bk => !histBuckets(bk) && batchMin(bk) == i) =>
          t
      }
      keptNow.foreach(t => buckets(t).foreach(histBuckets.add))
      expectedKept ++= keptNow
    }

    // autoCompactEvery: the stream folds its own history partitions as it
    // runs (current batch's partition always left intact — the retry-
    // safety rule), so the probe's directory listing stays bounded.
    val q = engine.curateNearFrom(raw.dir, ckpt, idx, minChars = 10, autoCompactEvery = 8)
    try {
      def partitions(): Array[String] = new java.io.File(idx).listFiles()
        .filter(_.getName.startsWith("batch=")).map(_.getName)
      (0 until 25).foreach { b =>
        val batch = (0 until 20).map { _ =>
          val r = rnd.nextInt(10)
          if (roots.isEmpty || r < 4) { val t = freshRoot(); roots += t; t }
          else if (r < 7) permute(roots(rnd.nextInt(roots.length)))
          else substitute(roots(rnd.nextInt(roots.length)))
        }
        raw.append(batch.map(doc))
        q.processAllAvailable()
        oracleBatch(batch)
        assert(partitions().length <= 12,
          s"auto-compaction failed to bound the partition count: ${partitions().toSeq}")

        if (b == 12) {
          // Operational compaction mid-run via the no-upTo overload: folds
          // to the SECOND-newest id (never the newest — a retry of an
          // uncommitted newest batch must still see folded history).
          assert(partitions().length > 1, s"expected several partitions, got ${partitions().toSeq}")
          val folded = Engine.compactNearIndex(spark, idx)
          assert(folded.nonEmpty, "convenience compaction found nothing to fold")
          assert(partitions().length == 2,
            s"expected folded + newest, got ${partitions().toSeq}")
        }
      }

      val got = engine.toDF.orderBy("offset").collect()
        .map(r => new String(r.getAs[Array[Byte]]("value"))).toSeq
      val expected = expectedKept.map(t => new String(doc(t))).toSeq
      // Exactly-once + order: the curated log holds the oracle's kept docs
      // in arrival order, no dupes, no leaks.
      assert(got.size == expected.size,
        s"kept ${got.size} docs, oracle expected ${expected.size}")
      val onlyGot = got.diff(expected)
      val onlyExp = expected.diff(got)
      assert(onlyGot.isEmpty && onlyExp.isEmpty,
        s"membership diverged: stream-only=${onlyGot.take(3)} oracle-only=${onlyExp.take(3)}")
      val firstOoo = got.zip(expected).indexWhere { case (g, e) => g != e }
      assert(got == expected,
        s"order diverged at index $firstOoo: got=${got.slice(firstOoo, firstOoo + 3)} " +
          s"expected=${expected.slice(firstOoo, firstOoo + 3)}")

      // The index holds exactly the kept docs' buckets (4 per kept doc,
      // unique by the keep rule), minus nothing: near-dup state is fully
      // externalized — no state store rows at all for this query.
      val idxRows = spark.read.parquet(idx).count()
      assert(idxRows == 4L * expected.size,
        s"index holds $idxRows rows, expected ${4 * expected.size}")
    } finally q.stop()
  }
}
