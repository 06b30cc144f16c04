package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The per-user cap that guards `q_item_similarity`'s self-join
  * (VERDICT r7 #1): one power user with a huge distinct-item set must not
  * contribute a quadratic pair group. This spec plants a 50k-item power
  * user next to small organic users and checks
  *   (a) the cap keeps exactly the deterministic top-N (count desc, item
  *       asc) for the power user while leaving small users untouched,
  *   (b) the capped interaction set bounds the power user's pair
  *       contribution at N·(N−1)/2 — the whole point of the guard,
  *   (c) with the cap above every user's item count the output is
  *       byte-identical to the uncapped distinct — which is why the
  *       CORRECTNESS oracle (uncapped SQL) still matches at test scale.
  */
class ItemSimilarityCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Write a synthetic events table readable by Q.events into a temp dir. */
  private def writeEvents(rows: Seq[(Long, Long, Long, Int)]): String = {
    // (event_id, user_id, item, repeats) — repeats controls the per-item
    // event count the deterministic ranking keys on.
    import spark.implicits._
    val dir = TestSpark.tempDir("itemsim-events")
    val df = rows
      .flatMap { case (eid, uid, item, n) => (0 until n).map(r => (eid * 1000 + r, uid, item)) }
      .toDF("event_id", "user_id", "item")
      .withColumn("ts", expr("CAST(timestamp_micros(event_id * 1000000) AS TIMESTAMP_NTZ)"))
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.0))
      .withColumn("props", concat(lit("{\"k\": "), col("item"), lit("}")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("cap bounds a planted 50k-item power user and keeps the deterministic top-N") {
    // Power user 0: 50k distinct items, each seen once EXCEPT items
    // 49_000..49_009 seen 3× (so the top of the ranking is count-driven,
    // not id-driven). Organic users 1..20: 5 items each.
    val power = (0L until 50000L).map(i => (i, 0L, i, if (i >= 49000L && i < 49010L) 3 else 1))
    val organic = for {
      u <- 1L to 20L
      i <- 0L until 5L
    } yield (1000000L + u * 10 + i, u, u * 100 + i, 1)
    val dir = writeEvents(power ++ organic)

    val cap = 100
    val capped = Temporal
      .itemInteractions(spark, dir, userCap = cap)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), collect_list("item").as("items"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2).toSet))
      .toMap

    // (a) power user capped at exactly N; organic users untouched.
    assert(capped(0L)._1 == cap.toLong)
    (1L to 20L).foreach(u => assert(capped(u)._1 == 5L, s"user $u was capped"))
    // Deterministic ranking: the 3×-count items win first, then the
    // lowest item ids fill the rest.
    val expectedPower =
      (49000L until 49010L).toSet ++ (0L until (cap - 10).toLong).toSet
    assert(capped(0L)._2 == expectedPower)

    // (b) pair contribution is bounded: run the actual self-join shape on
    // the capped interactions and count the power user's pairs.
    val inter = Temporal.itemInteractions(spark, dir, userCap = cap)
    val pairs = inter
      .select(col("user_id"), col("item").as("i"))
      .join(inter.select(col("user_id"), col("item").as("j")), Seq("user_id"))
      .filter(col("i") < col("j"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("pairs"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(pairs(0L) == cap.toLong * (cap - 1) / 2)
    assert(pairs.values.sum < 10000L, "total pair count not bounded by the cap")
  }

  test("cap above every user's item count reproduces the uncapped distinct exactly") {
    val rows = for {
      u <- 0L to 10L
      i <- 0L until 40L
    } yield (u * 1000 + i, u, (u + i) % 60, if (i % 7 == 0) 2 else 1)
    val dir = writeEvents(rows)
    val uncapped = Q
      .events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("user_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("item")
      )
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val capped = Temporal
      .itemInteractions(spark, dir, userCap = Temporal.ItemSimUserCap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(capped == uncapped)
  }
}
