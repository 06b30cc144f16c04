package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** The localCheckpoint lifecycle: repeated runs of the checkpoint-heavy
  * queries must leave storage memory flat once the caller releases — a
  * long-lived session (or the bench's 6×12 query runs) must not accumulate
  * dead RDD blocks until eviction churn.
  */
class CheckpointHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def persistedRddCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("repeated dedup_jaccard runs with release() keep storage flat") {
    // Settle: other suites may share the session — measure deltas, not
    // absolutes.
    Checkpoints.release()
    val base = persistedRddCount

    (1 to 3).foreach { i =>
      SparkEntry.queries("dedup_jaccard")(spark, d).write
        .format("noop").mode("overwrite").save()
      assert(Checkpoints.trackedCount > 0, "dedup_jaccard should checkpoint a shared subplan")
      Checkpoints.release()
      assert(Checkpoints.trackedCount == 0)
      val now = persistedRddCount
      assert(now <= base, s"run $i stranded ${now - base} persisted RDDs (base=$base, now=$now)")
    }
  }

  test("corpus_token_budget's checkpoint is tracked and released") {
    Checkpoints.release()
    val base = persistedRddCount
    SparkEntry.queries("corpus_token_budget")(spark, d).write
      .format("noop").mode("overwrite").save()
    Checkpoints.release()
    assert(persistedRddCount <= base)
  }
}
