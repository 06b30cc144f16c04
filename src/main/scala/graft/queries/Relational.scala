package graft.queries

import scala.util.chaining._

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}

import Q.{t, dsum, dsumOver, money, rate}

/** Relational operator coverage over the TPC-H-ish testdata: scan, filter,
  * projection, aggregation, joins (inner/semi/anti/multi-way), window
  * functions, rollup/cube, sort/limit/top-k, set ops, distinct, having,
  * scalar subquery, scalar/date/JSON functions, time bucketing and
  * sessionization (gaps-and-islands).
  *
  * The reference engine has none of these (SURVEY.md §2.11) — its only
  * predicates are offset equality/range (reference: internal/log/log.go:94-109,
  * internal/server/server.go:138-158), mirrored here by the point-lookup /
  * range-scan / min-max queries over `events`. Everything else is the
  * analytics surface Spark provides over the log table.
  *
  * Plans stay fully declarative: filters and projections reach the parquet
  * scan (pushdown + pruning), small dimension tables are broadcast, and all
  * money aggregates use exact DECIMAL accumulation (Q.dsum) so results are
  * bit-stable at any partitioning.
  */
object Relational {

  val all: Seq[Q] = Seq(
    // --- aggregation (TPC-H Q1 pattern): scan + filter pushdown + groupBy ---
    Q(
      "q1_agg",
      (s, d) => {
        t(s, d, "lineitem")
          .filter(expr("l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            (sum(round(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .cast("double") / 10000.0).as("sum_disc_price"),
            (sum(round(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - round(col("l_discount") * 100).cast("long")) *
              (lit(100L) + round(col("l_tax") * 100).cast("long")))
              .cast("double") / 1000000.0).as("sum_charge"),
            (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order")
          )
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE) / 10000.0 AS sum_disc_price,
               CAST(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT) AS DOUBLE) / 1000000.0 AS sum_charge,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """)
    ),

    // --- join + agg + top-k (TPC-H Q3 pattern), dimension side broadcast ---
    Q(
      "q3_top_orders",
      (s, d) => {
        val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val orders = t(s, d, "orders")
        val li = t(s, d, "lineitem")
        li.join(orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy("o_orderkey", "o_orderdate")
          .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .cast("double") / 10000.0).as("revenue"))
          .orderBy(desc("revenue"), asc("o_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT o_orderkey, o_orderdate,
               CAST(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE) / 10000.0 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
      """)
    ),

    // --- multi-way join through the full dimension chain (TPC-H Q5 shape) ---
    Q(
      "q5_region_revenue",
      (s, d) => {
        t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(
            (sum(round(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .cast("double") / 10000.0).as("revenue"),
            count(lit(1)).as("n_items")
          )
          .orderBy("r_name")
      },
      Some("""
        SELECT r_name,
               CAST(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE) / 10000.0 AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name
      """)
    ),

    // --- semi join: customers holding at least one high-value order ---
    Q(
      "q_semi_join",
      (s, d) => {
        val big = t(s, d, "orders").filter(col("o_totalprice") > 400000.0)
        t(s, d, "customer")
          .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        ORDER BY c_custkey
      """)
    ),

    // --- anti join: customers with no orders at all ---
    Q(
      "q_anti_join",
      (s, d) => {
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
      """)
    ),

    // --- full outer join: deep-debt customers ⟗ big spenders ---
    // Both sides are partial (negative balances vs high aggregate spend),
    // so the result exercises null-bearing rows from each side plus the
    // COALESCE'd key. The aggregate side reduces orders BEFORE the join —
    // at scale the outer join then shuffles ~#customers rows, not #orders.
    Q(
      "q_full_outer_join",
      (s, d) => {
        val debtors = t(s, d, "customer")
          .filter(col("c_acctbal") < -900.0)
          .select(col("c_custkey"), col("c_acctbal").as("acctbal"))
        val spenders = t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(Q.dsum(col("o_totalprice")).as("spend"))
          .filter(col("spend") > 900000.0)
        debtors
          .join(spenders, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("acctbal"),
            col("spend")
          )
          .orderBy("custkey")
      },
      Some("""
        SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey, c.acctbal, o.spend
        FROM (SELECT c_custkey, c_acctbal AS acctbal FROM customer
              WHERE c_acctbal < -900.0) c
        FULL OUTER JOIN
             (SELECT o_custkey,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
              FROM orders GROUP BY o_custkey
              HAVING CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) > 900000.0) o
        ON c.c_custkey = o.o_custkey
        ORDER BY custkey
      """)
    ),

    // --- window: top order per customer by rank ---
    Q(
      "q_window_rank",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("o_custkey", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders) WHERE rn = 1
        ORDER BY o_custkey
      """)
    ),

    // --- window: running revenue per customer (explicit ROWS frame) ---
    Q(
      "q_window_running",
      (s, d) => {
        val w = Window
          .partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders")
          .filter(col("o_custkey") < 100)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            col("o_orderdate"),
            dsumOver(col("o_totalprice"), w).as("running_spend")
          )
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_spend
        FROM orders WHERE o_custkey < 100
        ORDER BY o_custkey, o_orderdate, o_orderkey
      """)
    ),

    // --- grouping sets: rollup ---
    Q(
      "q_rollup",
      (s, d) => {
        t(s, d, "orders")
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
          .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
      """)
    ),

    // --- grouping sets: cube ---
    Q(
      "q_cube",
      (s, d) => {
        t(s, d, "orders")
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
      """)
    ),

    // --- explicit GROUPING SETS with grouping() disambiguation ---
    Q(
      "q_grouping_sets",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders_gs")
        s.sql("""
          SELECT o_orderstatus, o_orderpriority,
                 CAST(grouping(o_orderstatus) AS INT) AS g_status,
                 CAST(grouping(o_orderpriority) AS INT) AS g_priority,
                 count(*) AS n
          FROM orders_gs
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """)
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
               CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
      """)
    ),

    // --- moving average over a sliding ROWS frame (decimal-exact sums) ---
    Q(
      "q_moving_avg",
      (s, d) => {
        val w = Window
          .partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(-3, Window.currentRow)
        t(s, d, "orders")
          .filter(col("o_custkey") < 60)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            // decimal inner sum: incremental frame updates vs recompute
            // would drift in double; exact decimal is engine-independent
            (sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast("double") /
              count(lit(1)).over(w)).as("moving_avg")
          )
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) /
               count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS moving_avg
        FROM orders WHERE o_custkey < 60
        ORDER BY o_custkey, o_orderkey
      """)
    ),

    // --- set ops ---
    Q(
      "q_set_union",
      (s, d) => {
        val a = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
        val b = t(s, d, "orders").filter(col("o_totalprice") > 450000.0).select(col("o_custkey").as("k"))
        a.union(b).distinct().orderBy("k")
      },
      Some("""
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 450000.0
        ORDER BY k
      """)
    ),
    Q(
      "q_set_intersect",
      (s, d) => {
        val a = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
        val b = t(s, d, "orders").filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
        a.intersect(b).orderBy("k")
      },
      Some("""
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        ORDER BY k
      """)
    ),
    Q(
      "q_set_except",
      (s, d) => {
        val a = t(s, d, "customer").select(col("c_custkey").as("k"))
        val b = t(s, d, "orders").select(col("o_custkey").as("k"))
        a.except(b).orderBy("k")
      },
      Some("""
        SELECT c_custkey AS k FROM customer
        EXCEPT
        SELECT o_custkey AS k FROM orders
        ORDER BY k
      """)
    ),
    // Bag semantics (ALL variants): duplicates preserved by multiplicity —
    // a different operator under the hood (counted anti/semi aggregation,
    // not dedup), hence their own inventory entries.
    Q(
      "q_set_intersect_all",
      (s, d) => {
        val a = t(s, d, "orders").select(col("o_custkey").as("k"))
        val b = t(s, d, "events").select(col("user_id").as("k"))
        a.intersectAll(b).groupBy("k").agg(count(lit(1)).as("n")).orderBy("k")
      },
      Some("""
        SELECT k, count(*) AS n FROM (
          SELECT o_custkey AS k FROM orders
          INTERSECT ALL
          SELECT user_id AS k FROM events)
        GROUP BY k ORDER BY k
      """)
    ),
    Q(
      "q_set_except_all",
      (s, d) => {
        val a = t(s, d, "orders").select(col("o_custkey").as("k"))
        val b = t(s, d, "events").select(col("user_id").as("k"))
        a.exceptAll(b).groupBy("k").agg(count(lit(1)).as("n")).orderBy("k")
      },
      Some("""
        SELECT k, count(*) AS n FROM (
          SELECT o_custkey AS k FROM orders
          EXCEPT ALL
          SELECT user_id AS k FROM events)
        GROUP BY k ORDER BY k
      """)
    ),

    // --- distinct aggregation ---
    Q(
      "q_distinct_count",
      (s, d) => {
        t(s, d, "orders").agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_pri"),
          count(lit(1)).as("n_orders")
        )
      },
      Some("""
        SELECT count(DISTINCT o_custkey) AS n_cust,
               count(DISTINCT o_orderpriority) AS n_pri,
               count(*) AS n_orders
        FROM orders
      """)
    ),

    // --- HAVING ---
    Q(
      "q_having",
      (s, d) => {
        t(s, d, "orders")
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("spend"))
          .filter(col("n") >= 15)
          .orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey HAVING count(*) >= 15
        ORDER BY o_custkey
      """)
    ),

    // --- uncorrelated scalar subquery ---
    Q(
      "q_scalar_subquery",
      (s, d) => {
        val cust = t(s, d, "customer")
        val avgBal = cust.agg(avg(col("c_acctbal"))).head().getDouble(0)
        cust
          .filter(col("c_acctbal") > lit(avgBal) * 1.8)
          .select("c_custkey", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer) * 1.8
        ORDER BY c_custkey
      """)
    ),

    // --- correlated scalar subquery (Catalyst decorrelates to a join) ---
    Q(
      "q_correlated_subquery",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders_corr")
        s.sql("""
          SELECT o_orderkey, o_custkey, o_totalprice
          FROM orders_corr o
          WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
                                    FROM orders_corr o2
                                    WHERE o2.o_custkey = o.o_custkey)
          ORDER BY o_orderkey
        """)
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
                                  FROM orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey
      """)
    ),

    // --- scalar functions: string/math ---
    Q(
      "q_scalar_funcs",
      (s, d) => {
        t(s, d, "part")
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("name_up"),
            length(col("p_name")).as("name_len"),
            substring(col("p_type"), 1, 5).as("type_pfx"),
            concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"),
            abs(col("p_size") - lit(25)).as("size_dist"),
            round(col("p_retailprice") * 1.1, 2).as("uplift")
          )
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey, upper(p_name) AS name_up,
               CAST(length(p_name) AS INTEGER) AS name_len,
               substring(p_type, 1, 5) AS type_pfx,
               p_brand || '-' || p_type AS brand_type,
               CAST(abs(p_size - 25) AS INTEGER) AS size_dist,
               round(p_retailprice * 1.1, 2) AS uplift
        FROM part ORDER BY p_partkey
      """)
    ),

    // --- date functions ---
    Q(
      "q_date_funcs",
      (s, d) => {
        t(s, d, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"),
            dayofmonth(col("o_orderdate")).as("dom"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
            expr("o_orderdate + INTERVAL '30' DAY").as("due_ts")
          )
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS y,
               CAST(month(o_orderdate) AS INTEGER) AS m,
               CAST(day(o_orderdate) AS INTEGER) AS dom,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               o_orderdate + INTERVAL 30 DAY AS due_ts
        FROM orders ORDER BY o_orderkey
      """)
    ),

    // --- JSON extraction from the events props column ---
    Q(
      "q_json_extract",
      (s, d) => {
        t(s, d, "events")
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("bigint").as("k")
          )
          .filter(col("k") % 7 === 0)
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
        ORDER BY event_id
      """)
    ),

    // --- CASE bucketing + aggregation ---
    Q(
      "q_case_buckets",
      (s, d) => {
        t(s, d, "orders")
          .withColumn(
            "bucket",
            when(col("o_totalprice") < 50000.0, "small")
              .when(col("o_totalprice") < 200000.0, "medium")
              .otherwise("large")
          )
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("bucket")
      },
      Some("""
        SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small'
                    WHEN o_totalprice < 200000.0 THEN 'medium'
                    ELSE 'large' END AS bucket,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY 1 ORDER BY bucket
      """)
    ),

    // --- log-parity analogs over events (SURVEY §2.2: L2/L3/L4/R4) ---
    Q(
      "log_point_lookup",
      (s, d) =>
        t(s, d, "events")
          .filter(col("event_id") === 424)
          .select("event_id", "user_id", "event_type", "value", "props"),
      Some("""
        SELECT event_id, user_id, event_type, value, props
        FROM events WHERE event_id = 424
      """)
    ),
    Q(
      "log_min_max",
      (s, d) =>
        t(s, d, "events").agg(
          min(col("event_id")).as("lowest"),
          max(col("event_id")).as("highest"),
          count(lit(1)).as("n")
        ),
      Some("""
        SELECT min(event_id) AS lowest, max(event_id) AS highest, count(*) AS n
        FROM events
      """)
    ),
    Q(
      "log_range_scan",
      (s, d) =>
        t(s, d, "events")
          .filter(col("event_id") >= 100 && col("event_id") < 200)
          .select("event_id", "event_type", "value")
          .orderBy("event_id"),
      Some("""
        SELECT event_id, event_type, value FROM events
        WHERE event_id >= 100 AND event_id < 200
        ORDER BY event_id
      """)
    ),

    // --- sort + limit (top-k) ---
    Q(
      "q_topk",
      (s, d) =>
        t(s, d, "orders")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .limit(10),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
      """)
    ),

    // --- event-time tumbling bucket (batch twin of the streaming window) ---
    Q(
      "q_time_bucket",
      (s, d) => {
        t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
          .orderBy("hour", "event_type")
      },
      Some("""
        SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type
      """)
    ),

    // --- sessionization: gaps-and-islands with a 30-minute inactivity gap ---
    Q(
      "q_sessionize",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "events")
          .withColumn("prev_ts", lag("ts", 1).over(w))
          .withColumn(
            "new_sess",
            when(
              col("prev_ts").isNull ||
                (col("ts") - col("prev_ts")) > expr("INTERVAL '30' MINUTE"),
              1
            ).otherwise(0)
          )
          .withColumn("session_id", sum("new_sess").over(cum))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"), min("ts").as("start_ts"), max("ts").as("end_ts"))
          .orderBy("user_id", "session_id")
      },
      Some("""
        WITH x AS (
          SELECT user_id, event_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events),
        y AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM x),
        z AS (
          SELECT user_id, ts,
                 CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_id
          FROM y)
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts) AS start_ts, max(ts) AS end_ts
        FROM z GROUP BY user_id, session_id
        ORDER BY user_id, session_id
      """)
    ),

    // --- UNION ALL (bag semantics, no dedup shuffle) ---
    Q(
      "q_union_all",
      (s, d) => {
        val a = t(s, d, "orders").filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
        val b = t(s, d, "orders").filter(col("o_totalprice") > 450000.0).select(col("o_custkey").as("k"))
        a.union(b).groupBy("k").agg(count(lit(1)).as("n")).orderBy("k")
      },
      Some("""
        SELECT k, count(*) AS n FROM (
          SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
          UNION ALL
          SELECT o_custkey AS k FROM orders WHERE o_totalprice > 450000.0)
        GROUP BY k ORDER BY k
      """)
    ),

    // --- LIKE / regex predicates ---
    Q(
      "q_like_filter",
      (s, d) =>
        t(s, d, "part")
          .filter(col("p_name").like("%bolt%") || col("p_type").rlike("^(PROMO|STANDARD)$"))
          .select("p_partkey", "p_name", "p_type")
          .orderBy("p_partkey"),
      Some("""
        SELECT p_partkey, p_name, p_type FROM part
        WHERE p_name LIKE '%bolt%' OR regexp_matches(p_type, '^(PROMO|STANDARD)$')
        ORDER BY p_partkey
      """)
    ),

    // --- IN subquery ---
    Q(
      "q_in_subquery",
      (s, d) => {
        val bigOrders = t(s, d, "orders").filter(col("o_totalprice") > 400000.0).select("o_orderkey")
        t(s, d, "lineitem")
          .join(bigOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("qty"))
          .orderBy("l_orderkey")
      },
      Some("""
        SELECT l_orderkey, count(*) AS n_lines,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
        GROUP BY l_orderkey ORDER BY l_orderkey
      """)
    ),

    // --- null handling: nullif / coalesce / null-aware aggregation ---
    Q(
      "q_null_funcs",
      (s, d) =>
        t(s, d, "orders")
          .select(
            col("o_orderkey"),
            coalesce(nullif(col("o_orderstatus"), lit("F")), lit("finished")).as("status_or_default"),
            when(col("o_totalprice") > 250000.0, col("o_totalprice")).as("big_or_null")
          )
          .groupBy("status_or_default")
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("big_or_null")).as("n_big"),
            dsum(coalesce(col("big_or_null"), lit(0.0))).as("big_total")
          )
          .orderBy("status_or_default"),
      Some("""
        WITH x AS (
          SELECT o_orderkey,
                 coalesce(nullif(o_orderstatus, 'F'), 'finished') AS status_or_default,
                 CASE WHEN o_totalprice > 250000.0 THEN o_totalprice END AS big_or_null
          FROM orders)
        SELECT status_or_default, count(*) AS n_rows, count(big_or_null) AS n_big,
               CAST(sum(CAST(coalesce(big_or_null, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS big_total
        FROM x GROUP BY 1 ORDER BY status_or_default
      """)
    ),

    // --- window function zoo: lead/lag/ntile/percent_rank ---
    Q(
      "q_window_funcs",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        t(s, d, "orders")
          .filter(col("o_custkey") < 40)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            lag("o_totalprice", 1).over(w).as("prev_price"),
            lead("o_totalprice", 1).over(w).as("next_price"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 6).as("pct_rank")
          )
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               lag(o_totalprice, 1) OVER w AS prev_price,
               lead(o_totalprice, 1) OVER w AS next_price,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank
        FROM orders WHERE o_custkey < 40
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
      """)
    ),

    // --- boundary window values: first/last/nth over an unbounded frame ---
    Q(
      "q_window_firstlast",
      (s, d) => {
        val w = Window
          .partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "orders")
          .filter(col("o_custkey") < 40)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            first("o_totalprice").over(w).as("first_price"),
            last("o_totalprice").over(w).as("last_price"),
            nth_value(col("o_totalprice"), 2).over(w).as("second_price")
          )
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               first_value(o_totalprice) OVER w AS first_price,
               last_value(o_totalprice) OVER w AS last_price,
               nth_value(o_totalprice, 2) OVER w AS second_price
        FROM orders WHERE o_custkey < 40
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey, o_orderkey
      """)
    ),

    // --- ordered string aggregation ---
    Q(
      "q_string_agg",
      (s, d) => {
        t(s, d, "nation")
          .groupBy("n_regionkey")
          .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
          .orderBy("n_regionkey")
      },
      Some("""
        SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
      """)
    ),

    // --- statistical aggregates from exact integer moments ---
    // stddev/variance/corr computed the scale-safe way: the AGGREGATION is
    // exact BIGINT moment sums (partial-aggregable, partition-order
    // independent — where built-in stddev/corr merge float state and drift
    // in the low bits between engines), and the floating point happens once
    // per group in an expression tree mirrored verbatim in the oracle
    // (IEEE ops incl. correctly-rounded sqrt ⇒ bit-identical).
    Q(
      "q_stats_moments",
      (s, d) => {
        t(s, d, "lineitem")
          .select(
            col("l_returnflag"),
            col("l_quantity").cast("long").as("q"),
            col("l_linenumber").cast("long").as("l")
          )
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(col("q")).as("sq"),
            sum(col("q") * col("q")).as("sq2"),
            sum(col("l")).as("sl"),
            sum(col("l") * col("l")).as("sl2"),
            sum(col("q") * col("l")).as("sxy")
          )
          .select(
            col("l_returnflag"),
            col("n"),
            expr("""round((CAST(n AS DOUBLE) * CAST(sq2 AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6)""").as("var_qty"),
            expr("""round(sqrt((CAST(n AS DOUBLE) * CAST(sq2 AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6)""").as("stddev_qty"),
            expr("""round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sl AS DOUBLE))
                    / sqrt((CAST(n AS DOUBLE) * CAST(sq2 AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(sl2 AS DOUBLE) - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE))), 6)""")
              .as("corr_qty_line")
          )
          .orderBy("l_returnflag")
      },
      Some("""
        WITH m AS (
          SELECT l_returnflag, count(*) AS n,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
                 CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq2,
                 CAST(sum(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sl,
                 CAST(sum(CAST(l_linenumber AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sl2,
                 CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sxy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               round((CAST(n AS DOUBLE) * CAST(sq2 AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6) AS var_qty,
               round(sqrt((CAST(n AS DOUBLE) * CAST(sq2 AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6) AS stddev_qty,
               round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sl AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sq2 AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(sl2 AS DOUBLE) - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE))), 6) AS corr_qty_line
        FROM m ORDER BY l_returnflag
      """)
    ),

    // --- percentiles (linear interpolation) ---
    Q(
      "q_percentiles",
      (s, d) => {
        t(s, d, "orders")
          .groupBy("o_orderstatus")
          .agg(
            expr("round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4)").as("median_price"),
            expr("round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4)").as("p90_price"),
            count(lit(1)).as("n")
          )
          .orderBy("o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
      """)
    ),

    // --- PIVOT: order counts by status × priority ---
    Q(
      "q_pivot",
      (s, d) => {
        t(s, d, "orders")
          .groupBy("o_orderstatus")
          .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .count()
          .withColumnRenamed("1-URGENT", "urgent")
          .withColumnRenamed("2-HIGH", "high")
          .withColumnRenamed("3-MEDIUM", "medium")
          .withColumnRenamed("4-NOT SPECIFIED", "unspecified")
          .withColumnRenamed("5-LOW", "low")
          .orderBy("o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
               count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
               count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
               count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS unspecified,
               count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
      """)
    ),

    // --- event-time RANGE frame (interval-bounded, not row-counted) ---
    Q(
      "q_range_frame",
      (s, d) => {
        // RANGE BETWEEN INTERVAL: the frame is bounded by event-time
        // distance, not row count — trailing-hour stats per event. The
        // aggregates are order-independent (count/min/max), so peer-row
        // ordering inside the frame can't cause engine divergence.
        t(s, d, "events").createOrReplaceTempView("ev_range_frame")
        s.sql("""
          SELECT event_id,
                 count(*) OVER w AS n_1h,
                 min(value) OVER w AS min_1h,
                 max(value) OVER w AS max_1h
          FROM ev_range_frame
          WINDOW w AS (PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
          ORDER BY event_id
        """)
      },
      Some("""
        SELECT event_id,
               count(*) OVER w AS n_1h,
               min(value) OVER w AS min_1h,
               max(value) OVER w AS max_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY event_id
      """)
    ),

    // --- map-typed column construction + lookup ---
    Q(
      "q_map_funcs",
      (s, d) => {
        // Build a map column from aggregated entries, then look keys up —
        // the map type round-trip (map_from_entries / element_at / size).
        // Output stays scalar: map-typed cells don't survive the driver's
        // pandas-based compare.
        val c = t(s, d, "events")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"))
        c.agg(
          map_from_entries(
            sort_array(collect_list(struct(col("event_type"), col("n"))))
          ).as("mp")
        ).select(
          // try_element_at, not element_at: under ANSI mode a missing key
          // throws MAP_KEY_DOES_NOT_EXIST, while the DuckDB twin's
          // mp['purchase'][1] yields NULL — both engines must degrade to
          // NULL on a dataset with no purchase/click events.
          try_element_at(col("mp"), lit("click")).as("clicks"),
          try_element_at(col("mp"), lit("purchase")).as("purchases"),
          size(col("mp")).as("n_keys")
        )
      },
      Some("""
        WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        m AS (SELECT map(list(event_type ORDER BY event_type),
                         list(n ORDER BY event_type)) AS mp FROM c)
        SELECT mp['click'][1] AS clicks,
               mp['purchase'][1] AS purchases,
               CAST(cardinality(mp) AS INTEGER) AS n_keys
        FROM m
      """)
    ),

    // --- UNPIVOT (wide → long), the inverse of q_pivot ---
    Q(
      "q_unpivot",
      (s, d) => {
        // Aggregate to a small wide table, then melt the metric columns to
        // (metric, value) rows with the native unpivot operator — a
        // Generate/Expand in the plan, no joins, partition-parallel.
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            Q.dsum(col("l_quantity")).as("sum_qty"),
            Q.dsum(col("l_extendedprice")).as("sum_price"),
            Q.dsum(col("l_discount")).as("sum_disc")
          )
          .unpivot(
            Array(col("l_returnflag")),
            Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
            "metric",
            "value"
          )
          .orderBy("l_returnflag", "metric")
      },
      Some("""
        WITH w AS (
          SELECT l_returnflag,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                 CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        UNION ALL
        SELECT l_returnflag, 'sum_price', sum_price FROM w
        UNION ALL
        SELECT l_returnflag, 'sum_disc', sum_disc FROM w
        ORDER BY l_returnflag, metric
      """)
    ),

    // --- deterministic sampling: portable hash-mod, no engine RNG ---
    Q(
      "q_sample",
      (s, d) => {
        // TABLESAMPLE/rand() can never oracle-match across engines; a
        // md5-derived bucket is the portable deterministic equivalent and
        // the right tool for reproducible pipeline sampling anyway.
        t(s, d, "events")
          .filter(conv(substring(md5(col("event_id").cast("string")), 1, 4), 16, 10).cast("int") % 10 === 0)
          .select("event_id", "event_type", "value")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, event_type, value FROM events
        WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))::INTEGER % 10 = 0
        ORDER BY event_id
      """)
    ),

    // --- approximate distinct (sketch; no exact oracle by construction) ---
    Q(
      "q_approx_distinct",
      (s, d) =>
        // QUANTIFIED check instead of rows-only: the HLL++ estimate is
        // engine-specific (DuckDB cannot reproduce Spark's sketch), but its
        // CONTRACT is checkable — emit the exact distinct count (oracle-
        // computable) plus a bounded-relative-error flag. rsd=0.01 puts the
        // standard error at ~1%; the 5% gate leaves wide margin while still
        // catching a broken sketch.
        t(s, d, "events")
          .agg(
            countDistinct(col("user_id")).as("exact_users"),
            approx_count_distinct(col("user_id"), 0.01).as("approx")
          )
          .select(
            col("exact_users"),
            // Multiplicative form of |approx-exact|/exact <= 0.05: no
            // division, so an empty table (exact = 0) degrades to the
            // correct `approx == 0` check instead of an ANSI DIVIDE_BY_ZERO.
            (abs(col("approx") - col("exact_users")).cast("double") <=
              col("exact_users").cast("double") * 0.05).as("approx_ok")
          ),
      Some("""
        SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users, true AS approx_ok
        FROM events
      """)
    ),

    // --- approximate percentiles (mergeable quantile sketch) ---
    Q(
      "q_approx_quantile",
      (s, d) =>
        // The quantile twin of q_approx_distinct: percentile_approx is a
        // KLL-style rank sketch whose partial states MERGE — the two-phase
        // hash aggregate ships one bounded sketch per (group, partition)
        // instead of sorting each group's values, which is why it survives
        // 100 TB where exact percentile_cont's per-group sort-buffer does
        // not. The sketch VALUE is engine-specific, so the oracle asserts
        // its rank-error CONTRACT instead: accuracy=2000 bounds rank error
        // by n/2000, far inside the exact [p48, p52] / [p88, p92] value
        // brackets computed in the same query (oracle-checkable; brackets
        // are CONT-interpolated so they also cover APPROX's discrete
        // return landing one sample outside the inner rank).
        t(s, d, "orders")
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n_orders"),
            expr("round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4)").as("exact_p50"),
            expr("percentile_approx(o_totalprice, 0.5, 2000)").as("ap50"),
            expr("percentile_approx(o_totalprice, 0.9, 2000)").as("ap90"),
            expr("percentile_cont(0.48) WITHIN GROUP (ORDER BY o_totalprice)").as("p48"),
            expr("percentile_cont(0.52) WITHIN GROUP (ORDER BY o_totalprice)").as("p52"),
            expr("percentile_cont(0.88) WITHIN GROUP (ORDER BY o_totalprice)").as("p88"),
            expr("percentile_cont(0.92) WITHIN GROUP (ORDER BY o_totalprice)").as("p92")
          )
          .select(
            col("o_orderpriority"),
            col("n_orders"),
            col("exact_p50"),
            (col("ap50") >= col("p48") && col("ap50") <= col("p52")).as("p50_ok"),
            (col("ap90") >= col("p88") && col("ap90") <= col("p92")).as("p90_ok")
          )
          .orderBy("o_orderpriority"),
      Some("""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
               round(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
               true AS p50_ok, true AS p90_ok
        FROM orders GROUP BY 1 ORDER BY 1
      """)
    ),

    // --- customer lifetime-value cohorts ---
    // The revenue-side twin of q_retention_cohorts: customers cohorted by
    // first-order month (exact integer month index year*12+month — no
    // months_between FP), each later month's buyers and revenue laid out
    // as a (cohort, offset) matrix with cumulative revenue and per-member
    // LTV. Money is exact cents end-to-end (DECIMAL(12,2)·100 → BIGINT),
    // the cumulative sum is a window over the metadata-sized matrix, and
    // LTV divides cumulative cents by cohort size with HALF-UP EXACT
    // integer arithmetic — `round(decimal/n)` is the cross-engine trap.
    // The per-customer cohort table checkpoints once for its two plan
    // roles (the orders join and the cohort sizes); sizes broadcast.
    Q(
      "q_ltv_cohorts",
      (s, d) => {
        val o = t(s, d, "orders").select(
          col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("midx"),
          (money(col("o_totalprice")) * 100).cast("long").as("cents")
        )
        val first = o
          .groupBy("o_custkey")
          .agg(min("midx").as("cohort"))
          .pipe(Checkpoints.checkpoint) // two consumers: orders join + sizes
        val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
        val cells = o
          .join(first, "o_custkey")
          .groupBy(col("cohort"), (col("midx") - col("cohort")).as("month_offset"))
          .agg(
            countDistinct("o_custkey").as("buyers"),
            sum("cents").as("revenue_cents")
          )
        val w = Window.partitionBy("cohort").orderBy("month_offset")
        cells
          .withColumn("cum_revenue_cents", sum("revenue_cents").over(w))
          .join(broadcast(sizes), "cohort")
          .select(
            col("cohort"),
            col("month_offset"),
            col("buyers"),
            col("revenue_cents"),
            col("cum_revenue_cents"),
            expr("(2 * cum_revenue_cents + cohort_users) div (2 * cohort_users)")
              .as("ltv_cents")
          )
          .orderBy("cohort", "month_offset")
      },
      Some("""
        WITH o AS (
          SELECT o_custkey,
                 year(o_orderdate) * 12 + month(o_orderdate) AS midx,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM orders),
        f AS (SELECT o_custkey, min(midx) AS cohort FROM o GROUP BY 1),
        sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users FROM f GROUP BY 1),
        cells AS (
          SELECT f.cohort, o.midx - f.cohort AS month_offset,
                 CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS buyers,
                 CAST(sum(o.cents) AS BIGINT) AS revenue_cents
          FROM o JOIN f ON o.o_custkey = f.o_custkey
          GROUP BY 1, 2),
        cum AS (
          SELECT cohort, month_offset, buyers, revenue_cents,
                 CAST(sum(revenue_cents) OVER (PARTITION BY cohort ORDER BY month_offset) AS BIGINT)
                   AS cum_revenue_cents
          FROM cells)
        SELECT c.cohort, c.month_offset, c.buyers, c.revenue_cents, c.cum_revenue_cents,
               (2 * c.cum_revenue_cents + s.cohort_users) // (2 * s.cohort_users) AS ltv_cents
        FROM cum c JOIN sz s ON c.cohort = s.cohort
        ORDER BY c.cohort, c.month_offset
      """)
    ),

    // --- promotional revenue share per month (TPC-H Q14 shape) ---
    // Case-conditional aggregation over a fact⋈dimension join: lineitems
    // meet the broadcast part table, revenue accumulates in the exact
    // 1e4-unit integers of q1_agg, and the monthly promo share is one
    // IEEE division of two exact integer sums rounded at 6 dp (an
    // unstructured ratio — safe where decimal/n would not be). Month keys
    // are exact integer year*100+month; nothing after the scan shuffles
    // more than the calendar-cardinality month key.
    Q(
      "q_promo_share",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val p = t(s, d, "part").select("p_partkey", "p_type")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(
            (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("ym")
          )
          .agg(
            sum(
              when(
                col("p_type") === "PROMO",
                round(col("l_extendedprice") * 100).cast("long") *
                  (lit(100L) - round(col("l_discount") * 100).cast("long"))
              ).otherwise(0L)
            ).as("promo_units"),
            sum(
              round(col("l_extendedprice") * 100).cast("long") *
                (lit(100L) - round(col("l_discount") * 100).cast("long"))
            ).as("total_units")
          )
          .select(
            col("ym"),
            (col("promo_units").cast("double") / 10000.0).as("promo_revenue"),
            (col("total_units").cast("double") / 10000.0).as("total_revenue"),
            round(col("promo_units").cast("double") / col("total_units").cast("double"), 6)
              .as("promo_share")
          )
          .orderBy("ym")
      },
      Some("""
        WITH r AS (
          SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ym,
                 CAST(sum(CASE WHEN p.p_type = 'PROMO'
                               THEN CAST(round(l_extendedprice*100) AS BIGINT)
                                    * (100 - CAST(round(l_discount*100) AS BIGINT))
                               ELSE 0 END) AS BIGINT) AS promo_units,
                 CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                          * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS total_units
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY 1)
        SELECT ym,
               CAST(promo_units AS DOUBLE) / 10000.0 AS promo_revenue,
               CAST(total_units AS DOUBLE) / 10000.0 AS total_revenue,
               round(CAST(promo_units AS DOUBLE) / CAST(total_units AS DOUBLE), 6) AS promo_share
        FROM r ORDER BY ym
      """)
    ),

    // --- supplier variety per part line, tainted suppliers excluded ---
    // The TPC-H Q16 shape on this schema (no partsupp table): how many
    // DISTINCT suppliers ship each (brand, type), counting only suppliers
    // whose return rate is at or below the corpus-wide rate. The taint
    // predicate is a CROSS-MULTIPLIED exact integer compare
    // (r_s·total > R·total_s) — no FP rate can straddle engines — against
    // a broadcast 1-row global; the clean-supplier set is supplier-
    // cardinality and broadcasts into a left-semi join before the part
    // join, so the distinct-count aggregate only ever sees clean rows.
    Q(
      "q_supplier_variety",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val perSup = li
          .groupBy("l_suppkey")
          .agg(
            count(when(col("l_returnflag") === "R", 1)).as("r_s"),
            count(lit(1)).as("n_s")
          )
          .pipe(Checkpoints.checkpoint) // two consumers: global moments + clean filter
        val global = perSup.agg(sum("r_s").as("r_all"), sum("n_s").as("n_all"))
        val clean = perSup
          .join(broadcast(global))
          .filter(col("r_s") * col("n_all") <= col("r_all") * col("n_s"))
          .select("l_suppkey")
        val p = t(s, d, "part").select("p_partkey", "p_brand", "p_type")
        li.join(broadcast(clean), Seq("l_suppkey"), "left_semi")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type")
          .agg(countDistinct("l_suppkey").as("supplier_cnt"))
          .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"))
      },
      Some("""
        WITH per_sup AS (
          SELECT l_suppkey,
                 CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS r_s,
                 CAST(count(*) AS BIGINT) AS n_s
          FROM lineitem GROUP BY 1),
        g AS (SELECT CAST(sum(r_s) AS BIGINT) AS r_all, CAST(sum(n_s) AS BIGINT) AS n_all
              FROM per_sup),
        clean AS (
          SELECT l_suppkey FROM per_sup CROSS JOIN g
          WHERE r_s * n_all <= r_all * n_s)
        SELECT p.p_brand, p.p_type,
               CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l
        JOIN clean c ON l.l_suppkey = c.l_suppkey
        JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type
      """)
    ),

    // --- shipping delay by order priority (TPC-H Q12 shape) ---
    // The fulfillment-SLA readout: per priority class, how long after the
    // order date lines actually ship, and what fraction blows a 90-day
    // SLA. Delay is EXACT integer day arithmetic (datediff of dates in
    // both engines); the fact-to-fact lineitem⋈orders join shuffles on
    // the natural key l_orderkey = o_orderkey — at warehouse scale this
    // is THE canonical co-location candidate (bucket both tables by
    // orderkey and the shuffle disappears; at test SF the orders side
    // auto-broadcasts, which is equally right). The rollup
    // partial-combines onto |priorities| rows, and mean/late_frac are
    // single int/int IEEE divisions at 6 dp.
    Q(
      "q_shipping_delay",
      (s, d) => {
        t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
          .join(
            t(s, d, "orders").select(
              col("o_orderkey"),
              col("o_orderdate"),
              col("o_orderpriority")
            ),
            col("l_orderkey") === col("o_orderkey")
          )
          .select(
            col("o_orderpriority"),
            expr("CAST(datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE)) AS BIGINT)")
              .as("delay_days")
          )
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n_lines"),
            min("delay_days").as("min_days"),
            max("delay_days").as("max_days"),
            sum("delay_days").as("sum_days"),
            sum(when(col("delay_days") > 90, 1L).otherwise(0L)).as("late_lines")
          )
          .select(
            col("o_orderpriority"),
            col("n_lines"),
            col("min_days"),
            col("max_days"),
            round(col("sum_days").cast("double") / col("n_lines").cast("double"), 6)
              .as("mean_days"),
            col("late_lines"),
            round(col("late_lines").cast("double") / col("n_lines").cast("double"), 6)
              .as("late_frac")
          )
          .orderBy("o_orderpriority")
      },
      Some("""
        WITH x AS (
          SELECT o.o_orderpriority,
                 CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                               CAST(l.l_shipdate AS DATE)) AS BIGINT) AS delay_days
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        agg AS (
          SELECT o_orderpriority,
                 CAST(count(*) AS BIGINT) AS n_lines,
                 min(delay_days) AS min_days,
                 max(delay_days) AS max_days,
                 CAST(sum(delay_days) AS BIGINT) AS sum_days,
                 CAST(sum(CASE WHEN delay_days > 90 THEN 1 ELSE 0 END) AS BIGINT) AS late_lines
          FROM x GROUP BY 1)
        SELECT o_orderpriority, n_lines, min_days, max_days,
               round(CAST(sum_days AS DOUBLE) / CAST(n_lines AS DOUBLE), 6) AS mean_days,
               late_lines,
               round(CAST(late_lines AS DOUBLE) / CAST(n_lines AS DOUBLE), 6) AS late_frac
        FROM agg ORDER BY o_orderpriority
      """)
    ),

    // --- top customers by returned revenue (TPC-H Q10 shape) ---
    // The returns-triage list: which customers generate the most
    // returned-item revenue. The R-flag filter pushes into the lineitem
    // scan; revenue is q5's exact integer arithmetic (1e4-unit products
    // of rounded cents — partition-order independent where a double sum
    // is not); the lineitem⋈orders join shuffles on the natural orderkey
    // (bucketing candidate), customers and the nation dimension
    // broadcast; the top-10 is TakeOrdered (partial top-k, never a
    // global sort) with full (revenue desc, custkey) tie-breaks.
    Q(
      "q_top_returners",
      (s, d) => {
        t(s, d, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
          .join(
            t(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey")
          )
          .groupBy("o_custkey")
          .agg(
            sum(
              round(col("l_extendedprice") * 100).cast("long") *
                (lit(100L) - round(col("l_discount") * 100).cast("long"))
            ).as("rev_1e4"),
            count(lit(1)).as("n_returned")
          )
          .join(
            broadcast(
              t(s, d, "customer")
                .join(
                  broadcast(t(s, d, "nation")),
                  col("c_nationkey") === col("n_nationkey")
                )
                .select(col("c_custkey"), col("c_name"), col("n_name"))
            ),
            col("o_custkey") === col("c_custkey")
          )
          .select(
            col("o_custkey").as("custkey"),
            col("c_name"),
            col("n_name").as("nation"),
            (col("rev_1e4").cast("double") / 10000.0).as("returned_revenue"),
            col("n_returned")
          )
          .orderBy(desc("returned_revenue"), asc("custkey"))
          .limit(10)
      },
      Some("""
        WITH r AS (
          SELECT o.o_custkey,
                 CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
                   AS rev_1e4,
                 CAST(count(*) AS BIGINT) AS n_returned
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE l.l_returnflag = 'R'
          GROUP BY 1)
        SELECT r.o_custkey AS custkey, c.c_name, n.n_name AS nation,
               CAST(rev_1e4 AS DOUBLE) / 10000.0 AS returned_revenue,
               n_returned
        FROM r JOIN customer c ON r.o_custkey = c.c_custkey
               JOIN nation n ON c.c_nationkey = n.n_nationkey
        ORDER BY returned_revenue DESC, custkey LIMIT 10
      """)
    ),

    // --- forecast revenue change (TPC-H Q6 shape) ---
    // The iconic single-scan aggregate: revenue that would have been
    // gained by eliminating discounts in a band — a one-year shipdate
    // range, a ±1% discount band, a quantity cap, ONE filtered sum with
    // no join and no shuffle beyond the final 1-row combine. All three
    // predicates must reach the parquet scan (PlanSpec asserts the
    // pushed quantity filter); revenue is exact integer cents×discount
    // (1e4-unit products of rounded integers — the q5 discipline), and
    // the discount band compares ROUNDED integer discounts so no float
    // boundary can split engines.
    Q(
      "q6_forecast_revenue",
      (s, d) => {
        t(s, d, "lineitem")
          .filter(
            col("l_shipdate") >= lit("1995-01-01") &&
              col("l_shipdate") < lit("1996-01-01") &&
              col("l_quantity") < 24.0
          )
          .select(
            round(col("l_extendedprice") * 100).cast("long").as("cents"),
            round(col("l_discount") * 100).cast("long").as("disc")
          )
          .filter(col("disc") >= 5L && col("disc") <= 7L)
          .agg(
            (sum(col("cents") * col("disc")).cast("double") / 10000.0).as("forecast_revenue"),
            count(lit(1)).as("n_lines")
          )
      },
      Some("""
        SELECT CAST(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                             * CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS DOUBLE)
                 / 10000.0 AS forecast_revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
          AND l_quantity < 24.0
          AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
      """)
    )
  )
}
