package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.log.{LogConfig, SparkLog}
import graft.queries.Checkpoints

/** The streaming embedding-drift monitor ([[Engine.pcaDriftFrom]]) against
  * its batch contract: after any prefix of ingested batches, the derived
  * `pc/` readout must be BIT-EXACT equal to the oracle-checked batch
  * `vec_pca` query over the same vectors — the shared
  * `Similarity.pcaFromScatter`/`scatterAssemble` arithmetic over additive
  * integer Gramian partials makes that an equality, not an approximation.
  * Also drills the derived-table exactly-once contract (one `gram` and one
  * `pc` partition per micro-batch, resume on the same checkpoint, earlier
  * partitions untouched) and the bad-record house rule.
  */
class StreamingPcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rec(id: Long, v: Array[Float]): Array[Byte] =
    s"""{"vec_id":$id,"embedding":[${v.map(_.toDouble).mkString(",")}]}""".getBytes

  /** Batch vec_pca over the given vectors, via the real queries entry. */
  private def batchPca(vecs: Seq[Array[Float]], dir: String): Seq[(Int, Double, Double)] = {
    val session = spark
    import session.implicits._
    vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v, i % 3) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry
      .queries("vec_pca")(spark, dir)
      .as[(Int, Double, Double)]
      .collect()
      .toSeq
    Checkpoints.release()
    rows
  }

  test("streamed drift readout is bit-exact to batch vec_pca, across a resume") {
    val session = spark
    import session.implicits._
    val rnd = new Random(41)
    val dim = 8
    def mk(n: Int) = Seq.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val b1 = mk(25)
    val b2 = mk(30)

    val raw = SparkLog(spark, TestSpark.tempDir("pca-drift-raw"), LogConfig())
    raw.append(b1.zipWithIndex.map { case (v, i) => rec(i.toLong, v) })

    val engine = Engine(spark, TestSpark.tempDir("pca-drift-eng"))
    val ckpt = TestSpark.tempDir("pca-drift-ckpt")
    val drift = TestSpark.tempDir("pca-drift-table")
    def readout(): Seq[(Int, Double, Double)] = {
      val r = Engine
        .pcaDriftReport(spark, drift)
        .as[(Int, Double, Double)]
        .collect()
        .toSeq
      Checkpoints.release()
      r
    }

    val q1 = engine.pcaDriftFrom(raw.dir, ckpt, drift)
    try {
      q1.processAllAvailable()
      assert(readout() == batchPca(b1, TestSpark.tempDir("pca-drift-batch1")))
    } finally q1.stop()

    // Resume on the same checkpoint: the new vectors land as ONE new
    // additive partials partition; the merged readout equals batch
    // vec_pca over the UNION — history is never recomputed, only merged.
    raw.append(b2.zipWithIndex.map { case (v, i) => rec((100 + i).toLong, v) })
    val q2 = engine.pcaDriftFrom(raw.dir, ckpt, drift)
    try {
      q2.processAllAvailable()
      assert(readout() == batchPca(b1 ++ b2, TestSpark.tempDir("pca-drift-batch2")))
      def parts(sub: String) = new java.io.File(s"$drift/$sub")
        .listFiles()
        .count(_.getName.startsWith("batch="))
      assert(parts("gram") == 2, "each micro-batch owns exactly one partials partition")
      assert(parts("merged") == 2, "running merged partial: previous + current only")
      assert(parts("pc") == 2, "each micro-batch owns exactly one readout partition")
    } finally q2.stop()
  }

  test("per-batch state stays bounded across 50 micro-batches (no history re-read)") {
    val rnd = new Random(97)
    val dim = 4
    def mk(n: Int) = Seq.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))

    val raw = SparkLog(spark, TestSpark.tempDir("pca-soak-raw"), LogConfig())
    val engine = Engine(spark, TestSpark.tempDir("pca-soak-eng"))
    val drift = TestSpark.tempDir("pca-soak-table")
    def batchParts(sub: String): Seq[String] = {
      val fs = Option(new java.io.File(s"$drift/$sub").listFiles()).getOrElse(Array.empty)
      fs.map(_.getName).filter(_.startsWith("batch=")).toSeq
    }
    def filesUnder(sub: String): Int = batchParts(sub).map { part =>
      new java.io.File(s"$drift/$sub/$part").listFiles().count(_.getName.endsWith(".parquet"))
    }.sum

    var all = Seq.empty[Array[Float]]
    var nextId = 0L
    val q = engine.pcaDriftFrom(raw.dir, TestSpark.tempDir("pca-soak-ckpt"), drift)
    try {
      (1 to 50).foreach { _ =>
        val b = mk(3)
        raw.append(b.zipWithIndex.map { case (v, i) => rec(nextId + i, v) })
        nextId += b.size
        all ++= b
        q.processAllAvailable()
        // Retention bounds EVERY monitor dir at ≤ 2 batch partitions, so
        // the per-batch merge physically cannot re-read history: its only
        // inputs are the previous merged partial and this batch's partials
        // (two ≤ d(d+1)/2 + d + 1-row partitions at any history length).
        Seq("gram", "merged", "pc").foreach { sub =>
          assert(
            batchParts(sub).size <= 2,
            s"$sub grew past retention after a batch: ${batchParts(sub)}"
          )
        }
      }
      // File counts are flat, not O(history): a year-long monitor lists the
      // same handful of files as a minute-long one.
      Seq("gram", "merged", "pc").foreach { sub =>
        assert(batchParts(sub).size == 2, s"$sub should hold exactly {prev, last}")
        assert(filesUnder(sub) <= 2 * spark.sparkContext.defaultParallelism + 4)
      }
      // The merged partial's row count is the d-bound d(d+1)/2 + d + 1,
      // independent of how many batches fed it.
      val lastMerged = batchParts("merged").map(_.stripPrefix("batch=").toLong).max
      val mergedRows = spark.read.parquet(s"$drift/merged/batch=$lastMerged").count()
      assert(mergedRows == dim * (dim + 1) / 2 + dim + 1)
      // And the readout is still bit-exact to batch vec_pca over the union
      // of all 50 batches.
      val got = {
        val session = spark
        import session.implicits._
        val r = Engine.pcaDriftReport(spark, drift).as[(Int, Double, Double)].collect().toSeq
        Checkpoints.release()
        r
      }
      assert(got == batchPca(all, TestSpark.tempDir("pca-soak-batch")))
    } finally q.stop()
  }

  test("readout on an absent or not-yet-committed drift table is empty, not a crash") {
    val session = spark
    import session.implicits._
    val missing = TestSpark.tempDir("pca-report-missing") + "/never-written"
    assert(Engine.pcaDriftReport(spark, missing).collect().isEmpty)
    assert(
      Engine.pcaDriftReport(spark, missing).schema.fieldNames.toSeq ==
        Seq("dim", "loading", "ev_share")
    )
    // Dir exists but no committed pc partition yet (monitor started, zero
    // batches): still empty, and Main's "no committed drift readout yet"
    // branch is reachable.
    val started = TestSpark.tempDir("pca-report-empty")
    new java.io.File(s"$started/pc").mkdirs()
    assert(Engine.pcaDriftReport(spark, started).collect().isEmpty)
  }

  test("undecodable records are skipped, not fatal") {
    val session = spark
    import session.implicits._
    val rnd = new Random(7)
    val vecs = Seq.fill(10)(Array.fill(4)(rnd.nextFloat()))
    val raw = SparkLog(spark, TestSpark.tempDir("pca-bad-raw"), LogConfig())
    raw.append(
      "not json at all".getBytes +:
        """{"vec_id":1}""".getBytes +:
        vecs.zipWithIndex.map { case (v, i) => rec(i.toLong, v) }
    )
    val engine = Engine(spark, TestSpark.tempDir("pca-bad-eng"))
    val drift = TestSpark.tempDir("pca-bad-table")
    val q = engine.pcaDriftFrom(raw.dir, TestSpark.tempDir("pca-bad-ckpt"), drift)
    try {
      q.processAllAvailable()
      val got = Engine.pcaDriftReport(spark, drift).as[(Int, Double, Double)].collect().toSeq
      Checkpoints.release()
      assert(got == batchPca(vecs, TestSpark.tempDir("pca-bad-batch")))
    } finally q.stop()
  }
}
