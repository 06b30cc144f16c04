package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Co-located join via bucketing — the standing answer for repeated
  * fact⋈fact joins on the same key at warehouse scale: both sides
  * pre-hashed into the same bucket layout, so the join needs NO exchange
  * at read time (bucket pruning + per-bucket joins), amortizing one
  * write-time shuffle across every future join.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val session = spark
    import session.implicits._
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    // Two "fact" tables sharing the bucket key.
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders_a")
    orders
      .select(col("o_orderkey"), col("o_orderstatus"))
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders_b")

    val joined = spark.table("b_orders_a").join(spark.table("b_orders_b"), "o_orderkey")
    // Disable broadcast so the planner must choose between shuffle and
    // bucket-colocated join — the bucketed layout must win.
    val plan = withNoBroadcast(joined.queryExecution.executedPlan.toString)
    assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == orders.count())
  }

  private def withNoBroadcast(mkPlan: => String): String = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try mkPlan
    finally spark.conf.set(key, prev)
  }
}
