package graft.queries

import java.sql.Timestamp

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Brute-force model check for `q_retention_cohorts`: the matrix is
  * re-derived from per-user active-week SETS — cohort = first week,
  * retention(c, off) = |{u : cohort(u) = c ∧ active(u, c + off)}| / |c| —
  * on seeded gappy histories, including PRE-EPOCH weeks (negative week
  * ids), the case the floor-division discipline exists for: a truncating
  * `div` would collapse days −6..+6 into one 13-day "week 0" and shift
  * every pre-2024 cohort.
  */
class RetentionPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("retention matrix equals the per-user-set brute force incl. pre-epoch cohorts") {
    val rnd = new Random(71)
    for (trial <- 0 until 3) {
      val nUsers = 12 + rnd.nextInt(12)
      // Weeks −3..6 relative to the 2024-01-01 anchor: negative cohorts
      // exercise the sign-normalized floor division.
      val active = (1L to nUsers.toLong).map { u =>
        val ws = (-3L to 6L).filter(_ => rnd.nextDouble() < 0.4).toSet
        u -> (if (ws.isEmpty) Set(rnd.nextInt(10) - 3L) else ws)
      }.toMap
      val base = java.time.LocalDate.of(2024, 1, 1)
      val session = spark
      import session.implicits._
      val rows = active.toSeq.flatMap { case (u, ws) =>
        ws.toSeq.map { w =>
          val day = base.plusDays(w * 7 + rnd.nextInt(7))
          (u * 100 + w + 10, Timestamp.valueOf(day.atTime(9, 30)), u, "view", 1.0, "{}")
        }
      }
      val dir = TestSpark.tempDir(s"retention-model-$trial")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      val got = SparkEntry.queries("q_retention_cohorts")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      val cohorts = active.map { case (u, ws) => u -> ws.min }
      val sizes = cohorts.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val exp = active.toSeq
        .flatMap { case (u, ws) => ws.map(w => (cohorts(u), w - cohorts(u))) }
        .groupBy(identity)
        .map { case ((c, off), hits) =>
          (c, off, hits.size.toLong, round6(hits.size.toDouble / sizes(c).toDouble))
        }
        .toSeq
        .sortBy(t => (t._1, t._2))
      assert(got == exp, s"trial $trial:\ngot $got\nexp $exp")
    }
  }
}
