package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Q.t

/** Skew-handling patterns. At 100 TB a hot key (one user, one null-ish
  * default, one viral document) turns a single `groupBy` partition into the
  * straggler that defines job latency. Two standing answers:
  *
  *   - AQE skew-join splitting (`spark.sql.adaptive.*`, on in our sessions)
  *     handles skewed *joins* at runtime;
  *   - **salting** handles skewed *aggregations*: spray each key across
  *     `nSalts` sub-keys, partially aggregate, then merge the partials —
  *     two small shuffles instead of one skewed one.
  *
  * The salted result is exactly the unsalted result for decomposable
  * aggregates (sum/count/min/max) — which is why `q_salted_agg`'s oracle is
  * the plain GROUP BY.
  */
object Skew {

  /** Two-stage salted aggregation: sums/counts per (key, salt), then per
    * key. `saltExpr` must be deterministic per row (NOT rand(): a task
    * retry would re-salt rows differently and double-count) — hash the
    * row's unique id.
    */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      saltSource: Column,
      nSalts: Int,
      value: Column
  ): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(saltSource), lit(nSalts)))
    salted
      .groupBy(key.as("k"), col("_salt"))
      .agg(
        // partials stay in exact DECIMAL — double partials would make the
        // merge order-dependent (and oracle-divergent) in the last ulp
        sum(value.cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("partial_sum"),
        count(lit(1)).as("partial_n")
      )
      .groupBy("k")
      .agg(
        sum(col("partial_sum")).cast("double").as("total"),
        sum(col("partial_n")).as("n")
      )
  }

  val all: Seq[Q] = Seq(
    // --- salted aggregation ≡ plain GROUP BY (skew-safe formulation) ---
    Q(
      "q_salted_agg",
      (s, d) => {
        val ev = t(s, d, "events")
        saltedSumCount(ev, col("user_id"), col("event_id"), nSalts = 16, value = col("value"))
          .select(col("k").as("user_id"), col("n"), col("total"))
          .orderBy("user_id")
      },
      Some("""
        SELECT user_id, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events GROUP BY user_id ORDER BY user_id
      """)
    ),

    // --- salted join ≡ plain join (replicate-the-small-side salting) ---
    Q(
      "q_salted_join",
      (s, d) => {
        // The manual skew-join rewrite for when AQE can't help (e.g. the
        // skewed key is known upfront, or the join feeds a stateful op):
        // salt the big side with a deterministic per-row hash, replicate
        // the small side once per salt, join on (key, salt). Each hot key's
        // rows spread over `nSalts` partitions; result set is EXACTLY the
        // unsalted join, which is why the oracle is the plain join.
        val nSalts = 8
        val ord = t(s, d, "orders")
          .withColumn("_s_big", pmod(hash(col("o_orderkey")), lit(nSalts)))
        val cust = t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
          .withColumn("_s_rep", explode(sequence(lit(0), lit(nSalts - 1))))
        ord
          .join(
            cust,
            col("o_custkey") === col("c_custkey") && col("_s_big") === col("_s_rep")
          )
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n_orders"),
            Q.dsum(col("o_totalprice")).as("total_price")
          )
          .orderBy("c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
      """)
    )
  )
}
