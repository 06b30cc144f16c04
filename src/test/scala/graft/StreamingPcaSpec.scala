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
      assert(parts("pc") == 2, "each micro-batch owns exactly one readout partition")
    } finally q2.stop()
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
