package graft.queries

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Model check for `vec_pca`: the Spark pipeline must compute the SPECIFIED
  * fixed-point algorithm — quantize at 1e4, exact scatter matrix
  * S = n·Σqqᵀ − (Σq)(Σq)ᵀ, three power-iteration steps with sign-aware
  * renormalisation v ← sign(u)·((|u|·1e6) div max(|u|,1)), loadings v/1e6
  * and Rayleigh share (vᵀSv/vᵀv)/tr(S) — not merely agree with DuckDB on
  * one dataset. A pure-Scala BigInt re-derivation over seeded random
  * corpora is the third independent implementation; every loading must
  * match to the bit (both are round(integer/1e6, 6)).
  *
  * A planted-direction trial then checks SEMANTICS, not just arithmetic:
  * vectors sampled as (signal · e_k + small noise) must put the dominant
  * |loading| on dimension k with a high explained-variance share.
  */
class PcaPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The specification, in BigInt arithmetic (never Double until output). */
  private def reference(vecs: Seq[Array[Double]]): (Seq[Double], Double) = {
    val n = vecs.length
    val dim = vecs.head.length
    val q = vecs.map(_.map(x => BigInt(math.round(x * 10000))))
    val sums = Array.tabulate(dim)(i => q.map(_(i)).sum)
    val sraw = Array.tabulate(dim, dim)((i, j) => q.map(v => v(i) * v(j)).sum)
    val s = Array.tabulate(dim, dim)((i, j) => BigInt(n) * sraw(i)(j) - sums(i) * sums(j))
    var v = Array.fill(dim)(BigInt(1000000))
    for (_ <- 0 until 3) {
      val u = Array.tabulate(dim)(i => (0 until dim).map(j => s(i)(j) * v(j)).sum)
      val m = u.map(_.abs).max.max(BigInt(1))
      v = u.map(x => (if (x < 0) BigInt(-1) else BigInt(1)) * ((x.abs * 1000000) / m))
    }
    val w = Array.tabulate(dim)(i => (0 until dim).map(j => s(i)(j) * v(j)).sum)
    val num = (0 until dim).map(i => v(i) * w(i)).sum
    val den = (0 until dim).map(i => v(i) * v(i)).sum
    val tr = (0 until dim).map(i => s(i)(i)).sum
    val share = (num.toDouble / den.toDouble) / tr.toDouble
    (
      v.map(x => BigDecimal(x.toDouble / 1000000.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toSeq,
      BigDecimal(share).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    )
  }

  private def runQuery(vecs: Seq[Array[Double]], dir: String): (Seq[Double], Double) = {
    val session = spark
    import session.implicits._
    vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat), i % 3) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("vec_pca")(spark, dir).collect()
    Checkpoints.release()
    (rows.sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq, rows.head.getDouble(2))
  }

  test("vec_pca equals the BigInt reference algorithm on random corpora") {
    val rnd = new Random(97)
    for (trial <- 0 until 3) {
      val n = 20 + rnd.nextInt(30)
      val dim = Seq(4, 8, 16)(trial)
      val vecs = Seq.fill(n)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
      val dir = TestSpark.tempDir(s"pca-model-$trial")
      val (gotLoad, gotShare) = runQuery(vecs, dir)
      val (expLoad, expShare) = reference(vecs)
      assert(gotLoad == expLoad, s"trial $trial (n=$n dim=$dim): loadings\n$gotLoad\n$expLoad")
      assert(gotShare == expShare, s"trial $trial: share $gotShare != $expShare")
    }
  }

  test("a planted dominant direction wins the loading and the variance share") {
    val rnd = new Random(11)
    val dim = 8
    val k = 5
    val vecs = Seq.fill(60)(Array.tabulate(dim)(i =>
      (if (i == k) rnd.nextDouble() * 2 - 1 else (rnd.nextDouble() * 2 - 1) * 0.05)))
    val dir = TestSpark.tempDir("pca-planted")
    val (load, share) = runQuery(vecs, dir)
    val topDim = load.zipWithIndex.maxBy { case (l, _) => math.abs(l) }._2
    assert(topDim == k, s"dominant loading on dim $topDim, planted $k: $load")
    assert(share > 0.5, s"planted direction must dominate the variance: share=$share")
  }
}
