package graft.queries

import java.sql.Timestamp

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Brute-force model check for `q_growth_accounting`: the lag/lead
  * classification (new / retained / resurrected, churn attributed to
  * week w+1 with the final observed week exempt) is re-derived here from
  * first principles over per-user active-week SETS — the O(users × weeks)
  * definition the windowed query avoids — on seeded random activity
  * patterns with gaps, comebacks, single-week users, and boundary weeks.
  */
class GrowthPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The semantic definition, per calendar week lo..hi:
    *   new(w)        = users whose FIRST active week is w
    *   retained(w)   = users active in both w-1 and w
    *   resurrected(w)= users active in w, inactive in w-1, first week < w
    *   churned(w)    = users active in w-1, inactive in w — unless w-1 is
    *                   the global last week (the not-yet-observable exempt)
    */
  private def reference(
      active: Map[Long, Set[Long]]
  ): Seq[(Long, Long, Long, Long, Long)] = {
    val lo = active.values.flatten.min
    val hi = active.values.flatten.max
    (lo to hi).map { w =>
      val newU = active.count { case (_, ws) => ws.min == w }
      val ret = active.count { case (_, ws) => ws(w) && ws(w - 1) }
      val res = active.count { case (_, ws) => ws(w) && !ws(w - 1) && ws.min < w }
      val chu =
        if (w - 1 == hi || w == lo) 0
        else active.count { case (_, ws) => ws(w - 1) && !ws(w) }
      (w, newU.toLong, ret.toLong, res.toLong, chu.toLong)
    }
  }

  test("growth accounting equals the per-user-set brute force on gappy histories") {
    val rnd = new Random(83)
    for (trial <- 0 until 3) {
      val nUsers = 10 + rnd.nextInt(15)
      // Weeks 0..9 with ~45% activity → plenty of gaps and comebacks.
      val active = (1L to nUsers.toLong).map { u =>
        val ws = (0L to 9L).filter(_ => rnd.nextDouble() < 0.45).toSet
        u -> (if (ws.isEmpty) Set(rnd.nextInt(10).toLong) else ws)
      }.toMap
      val base = java.time.LocalDate.of(2024, 1, 1) // the epoch anchor, a Monday
      val session = spark
      import session.implicits._
      val rows = active.toSeq.flatMap { case (u, ws) =>
        ws.toSeq.map { w =>
          val day = base.plusDays(w * 7 + rnd.nextInt(7))
          (u * 100 + w, Timestamp.valueOf(day.atTime(12, 0)), u, "view", 1.0, "{}")
        }
      }
      val dir = TestSpark.tempDir(s"growth-model-$trial")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      val got = SparkEntry.queries("q_growth_accounting")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
      Checkpoints.release()
      val exp = reference(active)
      assert(got == exp, s"trial $trial:\ngot $got\nexp $exp\nactive=$active")
    }
  }
}
