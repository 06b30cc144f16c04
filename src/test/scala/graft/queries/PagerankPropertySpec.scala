package graft.queries

import java.sql.Timestamp

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Brute-force model check for `q_pagerank`: the fixed-point iteration
  * (pr in 1e12-unit integers, messages floor-divided by sender degree,
  * damping as (15·(1e12 div n)) div 100 + (85·Σ) div 100, three steps,
  * top-10 with (pr desc, item) ties) is re-derived in plain Scala Long
  * arithmetic over the co-occurrence graph built directly from the raw
  * baskets — adjacency maps and explicit loops, the formulation the
  * distributed query avoids — on seeded random graphs with isolated
  * cliques and hub items (the skew/ordering regime).
  */
class PagerankPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def reference(baskets: Seq[Set[Long]]): List[(Int, Long, Long)] = {
    val pairs = baskets
      .flatMap(its => for (i <- its; j <- its if i < j) yield (i, j))
      .toSet
    val und = pairs.toSeq.flatMap { case (i, j) => Seq((i, j), (j, i)) }
    val deg = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = und.map(_._1).distinct.sorted
    val n = nodes.length.toLong
    var pr: Map[Long, Long] = nodes.map(_ -> 1000000000000L / n).toMap
    for (_ <- 0 until 3) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      und.foreach { case (src, dst) => in(dst) += pr(src) / deg(src) }
      pr = nodes.map { it =>
        it -> ((15L * (1000000000000L / n)) / 100L + (85L * in(it)) / 100L)
      }.toMap
    }
    pr.toSeq
      .sortBy { case (it, p) => (-p, it) }
      .take(10)
      .zipWithIndex
      .map { case ((it, p), k) => (k + 1, it, p) }
      .toList
  }

  test("pagerank equals the adjacency-map reference on clique-and-hub graphs") {
    val rnd = new Random(61)
    for (trial <- 0 until 3) {
      // Two cliques + a hub item touching most users → skewed degrees.
      val baskets = (1L to 20L).map { u =>
        val clique = if (u <= 10) Set(1L, 2L, 3L) else Set(7L, 8L, 9L)
        val extra = (10L to 14L).filter(_ => rnd.nextDouble() < 0.3).toSet
        val hub = if (rnd.nextDouble() < 0.7) Set(99L) else Set.empty[Long]
        clique.filter(_ => rnd.nextDouble() < 0.8) ++ extra ++ hub
      }.filter(_.size >= 2)
      val base = Timestamp.valueOf("2024-10-01 00:00:00").getTime
      val session = spark
      import session.implicits._
      val rows = baskets.zipWithIndex.flatMap { case (its, u) =>
        its.toSeq.map { it =>
          (u * 1000L + it, new Timestamp(base + u * 61000L + it * 1000), u.toLong + 1,
            "click", 1.0, s"""{"k":$it}""")
        }
      }
      val dir = TestSpark.tempDir(s"pagerank-model-$trial")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      val got = SparkEntry.queries("q_pagerank")(spark, dir)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
      Checkpoints.release()
      val exp = reference(baskets)
      assert(got == exp, s"trial $trial:\ngot $got\nexp $exp\nbaskets=$baskets")
    }
  }
}
