package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q.t

/** Temporal join operators over the `events` stream table — the as-of and
  * range joins a training-data pipeline needs once records carry event time
  * (the reference has no time column at all; SURVEY §2.6 marks this whole
  * category as our documented extension surface).
  *
  * Scale stance: the as-of join is the union+window formulation — ONE
  * shuffle on the join key, per-key sorted windows, no range-condition row
  * explosion — which survives arbitrary fact-table sizes as long as single
  * keys fit a partition (salt the window key if one user dominates). The
  * range join keeps an equality key so Catalyst plans a hash join with the
  * range as a residual filter, never a cartesian.
  */
object Temporal {

  val all: Seq[Q] = Seq(
    // --- as-of join: for each purchase, the same user's latest click at or
    //     before the purchase (the classic trades-vs-quotes shape) ---
    Q(
      "q_asof_join",
      (s, d) => {
        // Union probes (purchases) and quotes (clicks) into one keyed
        // stream, sort each key by (time, tag) — tag 0 (click) before tag 1
        // (purchase) so a click exactly at purchase time counts as "at or
        // before" — and read the running last/count off a rows-frame
        // window. This is the standard scalable as-of join: ONE shuffle on
        // the key, per-key sorted windows, no per-probe range scan and no
        // range-condition row explosion.
        val ev = t(s, d, "events")
        val clicks = ev
          .filter(col("event_type") === "click")
          .select(col("user_id").as("uid"), col("ts").as("tm"), lit(0).as("tag"),
            col("value").as("click_value"), lit(null).cast("bigint").as("event_id"))
        val purchases = ev
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("uid"), col("ts").as("tm"), lit(1).as("tag"),
            lit(null).cast("double").as("click_value"), col("event_id"))
        val w = Window
          .partitionBy("uid")
          .orderBy(col("tm"), col("tag"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks
          .unionByName(purchases)
          // One projection for all three window aggregates so CollapseWindow
          // fuses them into a single Window operator — one sort, one pass.
          .select(
            col("*"),
            max(when(col("tag") === 0, col("tm"))).over(w).as("last_click_ts"),
            last(when(col("tag") === 0, col("click_value")), ignoreNulls = true)
              .over(w).as("last_click_value"),
            count(when(col("tag") === 0, lit(1))).over(w).as("n_clicks_before")
          )
          .filter(col("tag") === 1)
          .select(
            col("event_id"),
            date_format(col("last_click_ts"), "yyyy-MM-dd HH:mm:ss").as("last_click_ts"),
            col("last_click_value"),
            col("n_clicks_before")
          )
          .orderBy("event_id")
      },
      // The oracle pins the same tie rule declaratively: among clicks at the
      // max qualifying ts, take the one from the latest-sorted row (the
      // window `last` above); clicks share no exact duplicate (user, ts) in
      // this data, so arg-max by ts is unambiguous.
      Some("""
        WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        k AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
        SELECT p.event_id,
               strftime(max(k.ts), '%Y-%m-%d %H:%M:%S') AS last_click_ts,
               arg_max(k.value, k.ts) AS last_click_value,
               count(k.ts) AS n_clicks_before
        FROM p
        LEFT JOIN k ON k.user_id = p.user_id AND k.ts <= p.ts
        GROUP BY p.event_id
        ORDER BY event_id
      """)
    ),

    // --- range (interval) join: activity in the hour before each error ---
    Q(
      "q_range_join",
      (s, d) => {
        val ev = t(s, d, "events")
        val errors = ev
          .filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id").as("euid"), col("ts").as("ets"))
        val activity = ev
          .filter(col("event_type") =!= "error")
          .select(col("user_id"), col("ts"), col("value"))
        // Equality on the user key keeps this a hash join (the interval
        // condition is a residual filter, not the join strategy); the
        // aggregates are order-independent (count/min/max), so no FP-sum
        // drift across engines or partition layouts.
        errors
          .join(
            activity,
            col("user_id") === col("euid") &&
              col("ts") >= col("ets") - expr("INTERVAL 1 HOUR") &&
              col("ts") < col("ets")
          )
          .groupBy("event_id")
          .agg(
            count(lit(1)).as("n_events"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value")
          )
          .orderBy("event_id")
      },
      Some("""
        SELECT e.event_id,
               count(*) AS n_events,
               min(a.value) AS min_value,
               max(a.value) AS max_value
        FROM events e
        JOIN events a
          ON a.user_id = e.user_id
         AND a.event_type <> 'error'
         AND a.ts >= e.ts - INTERVAL 1 HOUR
         AND a.ts < e.ts
        WHERE e.event_type = 'error'
        GROUP BY e.event_id
        ORDER BY e.event_id
      """)
    ),

    // --- time-series gap fill: emit every hour in range, zero-filled ---
    Q(
      "q_gap_fill",
      (s, d) => {
        // Downstream time-series consumers (dashboards, anomaly detectors)
        // need dense series; `sequence` generates the calendar from the
        // aggregated bounds — one row per hour, no driver round-trip — and
        // a left join zero-fills the quiet hours.
        val ev = t(s, d, "events")
        val buckets = ev
          .select(date_trunc("hour", col("ts")).as("h"))
          .groupBy("h")
          .agg(count(lit(1)).as("n"))
        val cal = buckets
          .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("h"))
        cal
          .join(buckets, Seq("h"), "left")
          .select(
            date_format(col("h"), "yyyy-MM-dd HH:00").as("hour"),
            coalesce(col("n"), lit(0L)).as("n")
          )
          .orderBy("hour")
      },
      Some("""
        WITH b AS (
          SELECT date_trunc('hour', ts) AS h, count(*) AS n FROM events GROUP BY 1),
        r AS (
          SELECT unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h FROM b)
        SELECT strftime(r.h, '%Y-%m-%d %H:00') AS hour, COALESCE(b.n, 0) AS n
        FROM r LEFT JOIN b ON r.h = b.h
        ORDER BY hour
      """)
    )
  )
}
