package graft.streaming

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.{Engine, TestSpark}
import graft.log.ObjectStoreFileSystem

/** Object-store crash-point sweep for the drift monitor's merged chain
  * (r13 verdict #7): the `gram/batch=N` → `merged/batch=N` →
  * `pc/batch=N` → retention-delete window in [[Engine.driftStep]] gets
  * the same PUT-boundary adversary ObjectStoreCommitSpec gives the other
  * committed artifacts — every rename is a PUT + separate source delete,
  * crashed between the halves at EVERY PUT boundary in turn. Invariants
  * at every crash point k of batch 1 (applied on top of a committed
  * batch 0):
  *
  *   1. the readout stays READABLE and BIT-EQUAL to a committed
  *      prefix — [[Engine.pcaDriftReport]] returns either batch 0's or
  *      batch 1's rows, never garbage, never an exception;
  *   2. a clean RETRY of batch 1 converges: merged partial and readout
  *      equal the never-crashed reference bit-for-bit;
  *   3. the NEXT batch self-heals retention: after batch 2 commits, every
  *      monitor dir is back to ≤ 2 `batch=` partitions even when the
  *      crash skipped the delete loop entirely.
  */
class DriftCommitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def reset(): Unit = ObjectStoreFileSystem.failAfterPuts = -1

  /** Run one attempt at crash point k. Returns true when the injection
    * FIRED — whether the crash propagated out of driftStep (torn state on
    * disk) or was absorbed by a task retry under local[4,3] (state fully
    * committed): the invariants below hold in BOTH cases, because a
    * committed batch 1 is one of the two legal readouts. False = the op
    * has fewer PUT boundaries than k (sweep exhausted).
    */
  private def crashFired(k: Int)(op: => Unit): Boolean = {
    ObjectStoreFileSystem.failAfterPuts = k
    try {
      op
      val fired = ObjectStoreFileSystem.failAfterPuts < 0
      reset()
      fired
    } catch {
      case t: Throwable if ObjectStoreFileSystem.isInjected(t) => reset(); true
      case t: Throwable => reset(); throw t
    }
  }

  private def batchDf(b: Int): DataFrame = {
    val session = spark
    import session.implicits._
    // Deterministic 3-dim vectors; values vary per batch so a stale
    // readout can never coincide with a fresh one.
    (0 until 8)
      .map(i => Array(0.1 * (b * 10 + i), 0.3 - 0.02 * i, 0.05 * b + 0.01 * i))
      .toDF("embedding")
  }

  private def readout(dir: String): Seq[(Int, Double, Double)] =
    Engine
      .pcaDriftReport(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
      .toSeq

  private def mergedRows(dir: String, b: Int): Seq[(Int, Int, Long)] =
    spark.read
      .parquet(s"$dir/merged/batch=$b")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
      .toSeq

  private def partitions(dir: String, sub: String): Seq[Long] =
    DerivedTable.batchIds(spark, s"$dir/$sub")

  test("every PUT boundary of the gram→merged→pc→retention chain is torn-state-safe") {
    // Never-crashed reference.
    val ref = "objstore://" + TestSpark.tempDir("drift-ref")
    Engine.driftStep(batchDf(0), 0L, ref)
    val r0 = readout(ref)
    Engine.driftStep(batchDf(1), 1L, ref)
    val r1 = readout(ref)
    val m1 = mergedRows(ref, 1)
    Engine.driftStep(batchDf(2), 2L, ref)
    val r2 = readout(ref)
    assert(Seq(r0, r1, r2).distinct.size == 3, "readouts must differ across batches")

    var k = 0
    var exhausted = false
    while (!exhausted && k < 400) {
      val dir = "objstore://" + TestSpark.tempDir(s"drift-crash-$k")
      Engine.driftStep(batchDf(0), 0L, dir) // committed predecessor
      if (crashFired(k)(Engine.driftStep(batchDf(1), 1L, dir))) {
        // (1) torn state invisible: the readout is a committed prefix.
        val r = readout(dir)
        assert(
          r == r0 || r == r1,
          s"crash point $k: readout is neither batch 0's nor batch 1's: $r"
        )
        // (2) clean retry converges bit-exactly.
        Engine.driftStep(batchDf(1), 1L, dir)
        assert(readout(dir) == r1, s"crash point $k: retry readout diverged")
        assert(mergedRows(dir, 1) == m1, s"crash point $k: retry merged partial diverged")
        // (3) the next batch self-heals retention to ≤ 2 partitions.
        Engine.driftStep(batchDf(2), 2L, dir)
        assert(readout(dir) == r2, s"crash point $k: post-heal readout diverged")
        Seq("gram", "merged", "pc").foreach { sub =>
          val parts = partitions(dir, sub)
          assert(
            parts.size <= 2,
            s"crash point $k: $sub retains ${parts.size} partitions: $parts"
          )
        }
        k += 1
      } else exhausted = true
    }
    assert(exhausted, s"chain still crashing at PUT boundary $k — raise the sweep bound")
    assert(k > 0, "the sweep must observe at least one PUT boundary")
  }
}
