package graft.queries

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Model check for the shared OLS seam (`Q.olsFitOver`, routing
  * `text_zipf_slope` and `q_activity_power_law`): the moment sums must be
  * EXACT — partition-order independent — so a BigDecimal re-derivation of
  * the same 6-dp-rounded inputs must produce bit-equal slope/intercept
  * through the same final IEEE chain, regardless of how the points are
  * shuffled or repartitioned (the property the DECIMAL lift exists for;
  * a double accumulation would drift with partition layout).
  */
class OlsPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def reference(pts: Seq[(Double, Double)]): (Long, Double, Double) = {
    val xs = pts.map(p => BigDecimal(p._1).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    val ys = pts.map(p => BigDecimal(p._2).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    val n = pts.length.toDouble
    val sx = xs.sum.toDouble
    val sy = ys.sum.toDouble
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
    val sxx = xs.map(a => a * a).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    (pts.length.toLong, round6(slope), round6((sy - slope * sx) / n))
  }

  test("olsFitOver equals the BigDecimal reference under any partition layout") {
    val rnd = new Random(13)
    val session = spark
    import session.implicits._
    for (trial <- 0 until 3) {
      val pts = Seq.fill(200 + rnd.nextInt(300))(
        (rnd.nextDouble() * 10 - 5, rnd.nextDouble() * 20 - 10)
      )
      // Pre-round at 6 dp like both callers do for their libm inputs.
      val rounded = pts.map { case (x, y) => (round6(x), round6(y)) }
      val exp = reference(rounded)
      // Two adversarial layouts: one partition, and a 13-way shuffle of a
      // differently-ordered copy — exact DECIMAL sums must not care.
      for (df <- Seq(
          rounded.toDF("x", "y").coalesce(1),
          rnd.shuffle(rounded).toDF("x", "y").repartition(13)
        )) {
        val r = Q.olsFitOver(df).collect().head
        assert(
          (r.getLong(0), r.getDouble(1), r.getDouble(2)) == exp,
          s"trial $trial: (${r.getLong(0)}, ${r.getDouble(1)}, ${r.getDouble(2)}) != $exp"
        )
      }
    }
  }
}
