package graft.queries

import java.sql.Timestamp

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Brute-force model check for the concentration family: the Gini's
  * closed-form counts-of-counts rank-sum and the Pareto cut's
  * whole-levels-plus-boundary-slice arithmetic are subtle enough that the
  * DuckDB oracle (which mirrors the same formulation) could share a bug.
  * This spec sorts the per-user counts explicitly — the O(users · log)
  * definition the closed forms avoid at scale — and requires the query
  * outputs to match to the rounded digit on seeded random activity
  * profiles with heavy ties (the tie-block arithmetic is the risky part).
  */
class ConcentrationPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Textbook Gini over sorted counts: G = Σ(2i − n − 1)·cᵢ / (n·Σc). */
  private def giniRef(counts: Seq[Long]): Double = {
    val s = counts.sorted
    val n = s.length.toLong
    val total = s.sum
    val num = s.zipWithIndex.map { case (c, i) => (2L * (i + 1) - n - 1) * c }.sum
    round6(num.toDouble / (n.toDouble * total.toDouble))
  }

  /** Brute-force top-pct share: sort desc, take ceil(n·pct) users. */
  private def paretoRef(counts: Seq[Long], pctNum: Int, pctDen: Int): (Long, Long) = {
    val desc = counts.sorted(Ordering[Long].reverse)
    val k = ((counts.length.toLong * pctNum + pctDen - 1) / pctDen).toInt
    (k.toLong, desc.take(k).sum)
  }

  private def writeEvents(counts: Map[Long, Int], dir: String): Unit = {
    val session = spark
    import session.implicits._
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val rows = counts.toSeq.flatMap { case (u, c) =>
      (0 until c).map(i => (u * 1000 + i, new Timestamp(base + u * 7919 + i * 61000L),
        u, "view", 1.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("gini and pareto equal the sorted brute force on tie-heavy profiles") {
    val rnd = new Random(59)
    for (trial <- 0 until 3) {
      // Few distinct levels over many users → heavy tie blocks, the case
      // where the closed-form rank arithmetic can silently drift.
      val nUsers = 30 + rnd.nextInt(40)
      val levels = Array(1, 2, 3, 5, 8, 20)
      val counts = (1L to nUsers.toLong).map(u => u -> levels(rnd.nextInt(levels.length))).toMap
      val dir = TestSpark.tempDir(s"conc-model-$trial")
      writeEvents(counts, dir)

      val gini = SparkEntry.queries("q_engagement_gini")(spark, dir).collect().head
      Checkpoints.release()
      val cs = counts.values.map(_.toLong).toSeq
      assert(gini.getLong(0) == nUsers.toLong && gini.getLong(1) == cs.sum)
      assert(gini.getDouble(2) == giniRef(cs),
        s"trial $trial: gini ${gini.getDouble(2)} != ${giniRef(cs)} (counts=$cs)")

      val par = SparkEntry.queries("q_pareto_share")(spark, dir).collect().head
      Checkpoints.release()
      val (k1, top1) = paretoRef(cs, 1, 100)
      val (k10, top10) = paretoRef(cs, 1, 10)
      assert((par.getLong(2), par.getLong(3)) == ((k1, top1)),
        s"trial $trial: top1 (${par.getLong(2)}, ${par.getLong(3)}) != ($k1, $top1)")
      assert((par.getLong(5), par.getLong(6)) == ((k10, top10)),
        s"trial $trial: top10 (${par.getLong(5)}, ${par.getLong(6)}) != ($k10, $top10)")
      assert(par.getDouble(4) == round6(top1.toDouble / cs.sum.toDouble))
      assert(par.getDouble(7) == round6(top10.toDouble / cs.sum.toDouble))
    }
  }
}
