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
    // Settle: other suites may share the session (and may have built on
    // other threads) — drain every scope, then measure deltas.
    Checkpoints.releaseAll()
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
    Checkpoints.releaseAll()
    val base = persistedRddCount
    SparkEntry.queries("corpus_token_budget")(spark, d).write
      .format("noop").mode("overwrite").save()
    Checkpoints.release()
    assert(persistedRddCount <= base)
  }

  test("scoped {} frees only the inner build and restores the outer scope") {
    import spark.implicits._
    Checkpoints.releaseAll()

    // Outer build checkpoints something...
    val outer = Checkpoints.checkpoint(Seq(1, 2, 3).toDF("a"))
    assert(Checkpoints.trackedCount == 1)

    // ...then composes a scoped library call (the RepeatStream.emitNext
    // shape) on the SAME thread: the inner checkpoints must free on exit,
    // the outer one must stay live AND usable.
    Checkpoints.scoped {
      val inner = Checkpoints.checkpoint(Seq(4).toDF("a"))
      assert(inner.count() == 1)
      assert(Checkpoints.trackedCount == 2)
    }
    assert(Checkpoints.trackedCount == 1, "inner scope should have freed exactly itself")
    assert(outer.count() == 3, "outer checkpoint must survive the nested scope")

    // Post-scope checkpoints land back in the OUTER scope: one release()
    // frees everything this thread built.
    Checkpoints.checkpoint(Seq(5).toDF("a"))
    assert(Checkpoints.trackedCount == 2)
    Checkpoints.release()
    assert(Checkpoints.trackedCount == 0)
  }

  test("releasing one query's scope leaves another's checkpoints live") {
    import spark.implicits._
    Checkpoints.releaseAll()

    // Query A builds on a separate thread with an explicit scope handle —
    // its eager localCheckpoints materialize during construction and must
    // survive other queries' releases (they are NOT recomputable).
    @volatile var handle: Checkpoints.Scope = null
    @volatile var dfA: org.apache.spark.sql.DataFrame = null
    val builder = new Thread(() => {
      handle = Checkpoints.begin()
      val docs = (0L until 60L)
        .map(i => (i, "en", s"w${i % 7} x${(i + 1) % 7} y${(i + 2) % 7}"))
      dfA = Dedup.clustersFrom(spark, docs.toDF("doc_id", "lang", "text"))
    })
    builder.start()
    builder.join()
    val aTracked = handle.trackedCount
    assert(aTracked > 0, "clustersFrom should checkpoint")

    // Query B builds and releases on THIS thread while A is un-released.
    SparkEntry.queries("corpus_token_budget")(spark, d).write
      .format("noop").mode("overwrite").save()
    Checkpoints.release()

    // B's release must not have touched A's scope; A's blocks must still
    // back a successful action.
    assert(handle.trackedCount == aTracked, "another query's release freed A's checkpoints")
    assert(dfA.count() == 60)

    handle.release()
    assert(Checkpoints.trackedCount == 0, "both scopes released -> fully drained")
  }
}
