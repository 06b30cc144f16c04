package graft.queries

import java.sql.Timestamp

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Brute-force model check for the batch `q_funnel`: the sequenced
  * conditional minima (first view; first click STRICTLY after it within
  * 24h; first purchase strictly after that within 24h) are re-derived per
  * user by direct scan over seeded random event histories whose
  * timestamps straddle the 24-hour windows — the regime where an
  * off-by-inclusive bound or a wrong window anchor changes counts.
  */
class FunnelBatchPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val DayMs = 24L * 60 * 60 * 1000

  private def reference(evts: Seq[(Long, Long, String)]): (Long, Long, Long) = {
    val byUser = evts.groupBy(_._1)
    var n1 = 0L; var n2 = 0L; var n3 = 0L
    byUser.values.foreach { es =>
      val views = es.filter(_._3 == "view").map(_._2)
      if (views.nonEmpty) {
        n1 += 1
        val t1 = views.min
        val clicks = es.filter(e => e._3 == "click" && e._2 > t1 && e._2 <= t1 + DayMs).map(_._2)
        if (clicks.nonEmpty) {
          n2 += 1
          val t2 = clicks.min
          val buys =
            es.filter(e => e._3 == "purchase" && e._2 > t2 && e._2 <= t2 + DayMs).map(_._2)
          if (buys.nonEmpty) n3 += 1
        }
      }
    }
    (n1, n2, n3)
  }

  test("batch funnel equals the per-user scan on window-straddling histories") {
    val rnd = new Random(47)
    val types = Vector("view", "click", "purchase")
    for (trial <- 0 until 3) {
      val base = Timestamp.valueOf("2024-08-01 00:00:00").getTime
      val evts = (0 until 150).map { i =>
        // Spread over ~3 days so click/purchase windows genuinely cut.
        (1L + rnd.nextInt(12), base + rnd.nextInt(3 * 24 * 60) * 60000L, types(rnd.nextInt(3)))
      }
      val session = spark
      import session.implicits._
      val dir = TestSpark.tempDir(s"funnel-model-$trial")
      evts.zipWithIndex
        .map { case ((u, ms, tp), i) => (i.toLong, new Timestamp(ms), u, tp, 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      val rows = SparkEntry.queries("q_funnel")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
      val (n1, n2, n3) = reference(evts)
      val exp = List(
        ("1_view", n1, 1.0),
        ("2_click", n2, round6(n2.toDouble / n1.toDouble)),
        ("3_purchase", n3, round6(n3.toDouble / n2.toDouble))
      )
      assert(rows == exp, s"trial $trial: got $rows exp $exp")
    }
  }
}
