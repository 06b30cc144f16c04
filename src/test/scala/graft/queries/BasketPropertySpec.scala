package graft.queries

import java.sql.Timestamp

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Brute-force model check for `q_basket_rules`: support, confidence and
  * lift are re-derived by direct enumeration over the distinct
  * (user, item) interaction sets — pair counts, both rule directions, the
  * c ≥ 2 floor, and the top-10 cut ordered on the ROUNDED measures with
  * full tie-breaks — on seeded random baskets dense enough that rounded
  * lifts tie (the ordering-subtlety regime).
  */
class BasketPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("basket rules equal the enumerated reference on dense baskets") {
    val rnd = new Random(29)
    for (trial <- 0 until 3) {
      val nUsers = 15 + rnd.nextInt(10)
      val items = 1L to 8L
      val baskets = (1L to nUsers.toLong).map { u =>
        u -> items.filter(_ => rnd.nextDouble() < 0.4).toSet
      }.filter(_._2.nonEmpty)
      val base = Timestamp.valueOf("2024-09-01 00:00:00").getTime
      val session = spark
      import session.implicits._
      val rows = baskets.flatMap { case (u, its) =>
        its.toSeq.map { it =>
          (u * 100 + it, new Timestamp(base + u * 61000 + it * 1000), u,
            if (rnd.nextBoolean()) "click" else "purchase", 1.0, s"""{"k":$it}""")
        }
      }
      val dir = TestSpark.tempDir(s"basket-model-$trial")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      val got = SparkEntry.queries("q_basket_rules")(spark, dir)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))
        .toList
      Checkpoints.release()

      // Enumerated reference over the basket sets.
      val nu = baskets.size.toLong
      val ni = baskets.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val pairs = (for {
        (_, its) <- baskets
        i <- its; j <- its if i < j
      } yield (i, j)).groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2)
      val rules = pairs.toSeq.flatMap { case ((i, j), c) =>
        Seq((i, j, c), (j, i, c))
      }.map { case (a, cq, c) =>
        (a, cq, c, round6(c.toDouble / nu.toDouble), round6(c.toDouble / ni(a).toDouble),
          round6((c * nu).toDouble / (ni(a) * ni(cq)).toDouble))
      }
      val exp = rules
        .sortBy { case (a, cq, _, _, conf, lift) => (-lift, -conf, a, cq) }
        .take(10)
        .zipWithIndex
        .map { case ((a, cq, c, sup, conf, lift), k) => (k + 1, a, cq, c, sup, conf, lift) }
        .toList
      assert(got == exp, s"trial $trial:\ngot $got\nexp $exp")
    }
  }
}
