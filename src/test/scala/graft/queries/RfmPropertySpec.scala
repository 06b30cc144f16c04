package graft.queries

import java.sql.Timestamp

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Brute-force model check for `q_rfm_segments`: the fixed-threshold
  * classification (recency ≤7/≤30 days, frequency ≥20/≥5, monetary
  * ≥50000/≥5000 cents with floor quantization) is re-derived per user by
  * direct scan over seeded histories whose users are PLANTED ON the
  * threshold boundaries — exactly 7/8 days, exactly 5/20 events, exactly
  * 5000/50000 cents — the regime where an off-by-one in any threshold or
  * a truncate-vs-round drift in the cents quantization flips a segment.
  */
class RfmPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rfm segments equal the per-user scan on threshold-boundary users") {
    val rnd = new Random(37)
    for (trial <- 0 until 2) {
      val base = java.time.LocalDate.of(2024, 6, 30) // max day anchor
      val session = spark
      import session.implicits._
      // (user, days-before-max of last event, freq, purchase value each)
      val profiles = (1L to 24L).map { u =>
        val rec = Seq(0, 7, 8, 30, 31, 60)(rnd.nextInt(6))
        val freq = Seq(1, 4, 5, 19, 20, 30)(rnd.nextInt(6))
        val per = Seq(0.0, 49.999, 50.0, 499.99, 500.0, 700.0)(rnd.nextInt(6))
        (u, rec, freq, per)
      }
      val rows = profiles.flatMap { case (u, rec, freq, per) =>
        (0 until freq).map { i =>
          // Last event exactly `rec` days before the anchor; earlier events
          // further back. One user must land ON the anchor day so max_day
          // is the anchor.
          val d = if (i == 0) rec else rec + 1 + (i % 5)
          val day = base.minusDays(d.toLong)
          (u * 1000 + i, Timestamp.valueOf(day.atTime(10, 0)), u, "purchase", per, "{}")
        }
      } :+ (999999L, Timestamp.valueOf(base.atTime(1, 0)), 999L, "view", 0.0, "{}")
      val dir = TestSpark.tempDir(s"rfm-model-$trial")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      val got = SparkEntry.queries("q_rfm_segments")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList

      // Reference: classify each user by direct arithmetic.
      case class U(seg: String, cents: Long, events: Long)
      val anchorUser = U("133", 0L, 1L) // the 999 view on the anchor day
      val us = profiles.map { case (u, rec, freq, per) =>
        val cents = freq.toLong * math.floor(per * 100).toLong
        val r = if (rec <= 7) "1" else if (rec <= 30) "2" else "3"
        val f = if (freq >= 20) "1" else if (freq >= 5) "2" else "3"
        val m = if (cents >= 50000L) "1" else if (cents >= 5000L) "2" else "3"
        U(r + f + m, cents, freq.toLong)
      } :+ anchorUser
      val exp = us.groupBy(_.seg).toSeq.map { case (seg, g) =>
        (seg, g.size.toLong, g.map(_.cents).sum, g.map(_.events).sum)
      }.sortBy(_._1).toList
      assert(got == exp, s"trial $trial:\ngot $got\nexp $exp\nprofiles=$profiles")
    }
  }
}
