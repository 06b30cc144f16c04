package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** The serving-shaped vec_pca reuse path
  * (`spark.graft.pca.reuseScatter=true`): repeated invocations over an
  * unchanged embeddings dir must return results BIT-IDENTICAL to the
  * fresh-checkpoint default, and the pinned scatter checkpoint must
  * survive the per-query `Checkpoints.release()` the bench and Verify
  * issue between invocations (a scope-tracked checkpoint would be
  * unpersisted there and — localCheckpoints being non-recomputable —
  * fail the second invocation instead of speeding it up).
  */
class PcaReuseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def runOnce(): Seq[(Int, Double, Double)] = {
    import spark.implicits._
    val out = SparkEntry.queries("vec_pca")(spark, d)
      .as[(Int, Double, Double)].collect().toSeq.sortBy(_._1)
    Checkpoints.release()
    out
  }

  test("reuse path is bit-identical to the fresh path, across release()") {
    val fresh = runOnce()
    val cacheBefore = Similarity.pcaScatterCacheSize
    spark.conf.set("spark.graft.pca.reuseScatter", "true")
    try {
      val first = runOnce() // builds + pins the per-dir scatter cache
      assert(Similarity.pcaScatterCacheSize == cacheBefore + 1,
        "first reuse invocation must populate the per-dir cache")
      val second = runOnce() // must ride the pinned checkpoint
      assert(Similarity.pcaScatterCacheSize == cacheBefore + 1,
        "second invocation must not rebuild the cache entry")
      assert(first == fresh, "cached scatter must not change loadings/ev_share")
      assert(second == fresh, "reused scatter must survive Checkpoints.release()")
    } finally spark.conf.set("spark.graft.pca.reuseScatter", "false")
    // Back to default: a fresh invocation neither reads nor grows the cache.
    assert(runOnce() == fresh)
    assert(Similarity.pcaScatterCacheSize == cacheBefore + 1)
  }

  test("an in-place rewrite of the embeddings dir invalidates the cached scatter") {
    import org.apache.spark.sql.functions.{col, expr}
    val base = TestSpark.tempDir("pca-invalidate")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    def runAt(): Seq[(Int, Double, Double)] = {
      import spark.implicits._
      val out = SparkEntry.queries("vec_pca")(spark, base)
        .as[(Int, Double, Double)].collect().toSeq.sortBy(_._1)
      Checkpoints.release()
      out
    }
    emb.write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    spark.conf.set("spark.graft.pca.reuseScatter", "true")
    try {
      val full = runAt()
      assert(runAt() == full, "warm repeat must be stable")
      // Rewrite the SAME path with different content: half the corpus,
      // every vector negated on one dim — loadings must move.
      emb.filter(col("vec_id") % 2 === 0)
        .withColumn("embedding",
          expr("transform(embedding, (x, i) -> CASE WHEN i = 0 THEN -x ELSE x END)"))
        .write.mode("overwrite").parquet(s"$base/embeddings.parquet")
      val rewritten = runAt()
      spark.conf.set("spark.graft.pca.reuseScatter", "false")
      val freshRewritten = runAt()
      assert(rewritten == freshRewritten,
        "post-rewrite reuse must serve the NEW data, not the stale pinned scatter")
      assert(rewritten != full, "rewrite was supposed to change the loadings")
    } finally {
      spark.conf.set("spark.graft.pca.reuseScatter", "false")
      Similarity.releaseScatterCache()
    }
  }
}
