package graft.queries

import scala.util.chaining._

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
    ),

    // --- ordered, time-bounded funnel analysis (view → click → purchase) ---
    // The product-analytics staple: how many users complete each stage IN
    // ORDER and WITHIN the conversion window (a click before the first
    // view, or a week after it, doesn't count — 24 h here). Stage times
    // resolve by sequenced conditional minima — first view, first
    // qualifying click after it, first qualifying purchase after that —
    // each one a user-keyed aggregate plus a user-keyed join, so every
    // stage is a partial-aggregated shuffle on user_id and the per-stage
    // frames reuse the same partitioning. No window over a global sort,
    // no per-user event array materialization (collect_list per user
    // would OOM on a 100 TB power user; conditional minima stay scalar).
    Q(
      "q_funnel",
      (s, d) => {
        val e = Q.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
        val t1 = e
          .filter(col("event_type") === "view")
          .groupBy("user_id")
          .agg(min("ts").as("t1"))
        val t2 = e
          .filter(col("event_type") === "click")
          .join(t1, "user_id")
          .filter(col("ts") > col("t1") && col("ts") <= col("t1") + expr("INTERVAL 24 HOUR"))
          .groupBy("user_id")
          .agg(min("ts").as("t2"))
        val t3 = e
          .filter(col("event_type") === "purchase")
          .join(t2, "user_id")
          .filter(col("ts") > col("t2") && col("ts") <= col("t2") + expr("INTERVAL 24 HOUR"))
          .groupBy("user_id")
          .agg(min("ts").as("t3"))
        val counts = t1
          .join(t2.select(col("user_id"), lit(1).as("c2")), Seq("user_id"), "left")
          .join(t3.select(col("user_id"), lit(1).as("c3")), Seq("user_id"), "left")
          .agg(
            count(lit(1)).as("n1"),
            count(col("c2")).as("n2"),
            count(col("c3")).as("n3")
          )
        counts.select(
          explode(
            array(
              struct(lit("1_view").as("stage"), col("n1").as("users"),
                lit(1.0).as("conversion")),
              struct(lit("2_click").as("stage"), col("n2").as("users"),
                round(col("n2").cast("double") / col("n1").cast("double"), 6).as("conversion")),
              struct(lit("3_purchase").as("stage"), col("n3").as("users"),
                round(col("n3").cast("double") / col("n2").cast("double"), 6).as("conversion"))
            )
          ).as("r")
        ).select(col("r.stage").as("stage"), col("r.users").as("users"),
          col("r.conversion").as("conversion"))
          .orderBy("stage")
      },
      Some("""
        WITH t1 AS (
          SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1),
        t2 AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN t1 ON e.user_id = t1.user_id
          WHERE e.event_type = 'click' AND e.ts > t1.t1
            AND e.ts <= t1.t1 + INTERVAL 24 HOUR GROUP BY 1),
        t3 AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN t2 ON e.user_id = t2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > t2.t2
            AND e.ts <= t2.t2 + INTERVAL 24 HOUR GROUP BY 1),
        c AS (
          SELECT CAST(count(*) AS BIGINT) AS n1,
                 CAST(count(t2.user_id) AS BIGINT) AS n2,
                 CAST(count(t3.user_id) AS BIGINT) AS n3
          FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
                  LEFT JOIN t3 ON t1.user_id = t3.user_id)
        SELECT '1_view' AS stage, n1 AS users, CAST(1.0 AS DOUBLE) AS conversion FROM c
        UNION ALL
        SELECT '2_click', n2, round(CAST(n2 AS DOUBLE) / n1, 6) FROM c
        UNION ALL
        SELECT '3_purchase', n3, round(CAST(n3 AS DOUBLE) / n2, 6) FROM c
        ORDER BY stage
      """)
    ),

    // --- cohort retention matrix ---
    // Users cohort by the week of their first event; retention(cohort,
    // offset) = fraction of the cohort active in cohort+offset. Weeks are
    // exact integer FLOOR(day/7) from a fixed epoch — no reliance on
    // either engine's week-truncation convention, correct before the
    // epoch too. Every stage is a
    // keyed shuffle: first-week per user (partial-agg), distinct (user,
    // week) activity, one user-keyed join, then a (cohort, offset) count
    // whose key space is weeks² — metadata-sized, as is the cohort-size
    // table it joins (broadcast) for the rate.
    Q(
      "q_retention_cohorts",
      (s, d) => {
        // FLOOR division, not `div` (truncation): pre-epoch days would
        // otherwise collapse -6..+6 into one 13-day "week 0". Exact
        // integer arithmetic: subtract the sign-normalized remainder
        // ((d % 7) + 7) % 7, then divide — identical in both engines.
        val e = Q.events(s, d)
          .select(
            col("user_id"),
            expr("""(datediff(CAST(ts AS DATE), DATE'2024-01-01')
                     - ((datediff(CAST(ts AS DATE), DATE'2024-01-01') % 7) + 7) % 7)
                    div 7""").as("wk")
          )
        val act = e.distinct()
        val first = act.groupBy("user_id").agg(min("wk").as("cohort"))
        val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
        act
          .join(first, "user_id")
          .groupBy(col("cohort"), (col("wk") - col("cohort")).as("week_offset"))
          .agg(count(lit(1)).as("users"))
          .join(broadcast(sizes), "cohort")
          .select(
            col("cohort"),
            col("week_offset"),
            col("users"),
            round(col("users").cast("double") / col("cohort_users").cast("double"), 6)
              .as("retention")
          )
          .orderBy("cohort", "week_offset")
      },
      Some("""
        WITH e AS (
          SELECT DISTINCT user_id,
                 (datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  - ((datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7) + 7) % 7) // 7 AS wk
          FROM events),
        f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY 1),
        sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users FROM f GROUP BY 1),
        r AS (
          SELECT f.cohort, e.wk - f.cohort AS week_offset, CAST(count(*) AS BIGINT) AS users
          FROM e JOIN f ON e.user_id = f.user_id
          GROUP BY 1, 2)
        SELECT r.cohort, r.week_offset, r.users,
               round(CAST(r.users AS DOUBLE) / sz.cohort_users, 6) AS retention
        FROM r JOIN sz ON r.cohort = sz.cohort
        ORDER BY r.cohort, r.week_offset
      """)
    ),

    // --- A/B experiment readout: lift + z-score over purchase value ---
    // The third leg of the product-analytics tier (funnel, retention,
    // experimentation): users split into arms by a deterministic hash
    // (user_id parity here; production salts a hash), the metric is
    // per-user purchase value, and the readout is mean lift with a
    // two-sample z-score. FP discipline is the q_stats_moments recipe:
    // quantize the metric to integer CENTS with floor (floor(x*100) is
    // engine-identical; a bare BIGINT cast is NOT — Spark truncates,
    // DuckDB rounds), aggregate exact integer sums and sums-of-squares,
    // and only then evaluate the mean/variance/z formulas as
    // correctly-rounded IEEE chains. Scale shape: one user-keyed
    // partial-agg shuffle, then a 2-group aggregate.
    Q(
      "q_ab_lift",
      (s, d) => {
        // `%` (truncated, sign of dividend) in BOTH engines — pmod would
        // diverge from DuckDB's % on negative ids. Squares accumulate in
        // DECIMAL: a BIGINT um*um overflows DIVERGENTLY (Spark wraps,
        // DuckDB errors) once a user's cents exceed ~3e9.
        val perUser = Q.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), expr("CAST(floor(value * 100) AS BIGINT)").as("m"))
          .groupBy("user_id")
          .agg(sum("m").as("um"))
          .select(expr("user_id % 2").as("arm"), col("um"))
        val arms = perUser
          .groupBy("arm")
          .agg(
            count(lit(1)).as("n"),
            sum("um").as("s1"),
            sum(col("um").cast("decimal(18,0)") * col("um").cast("decimal(18,0)")).as("s2")
          )
        arms
          .agg(
            max(when(col("arm") === 0, col("n"))).as("n_c"),
            max(when(col("arm") === 1, col("n"))).as("n_t"),
            max(when(col("arm") === 0, col("s1"))).as("s1c"),
            max(when(col("arm") === 1, col("s1"))).as("s1t"),
            max(when(col("arm") === 0, col("s2"))).as("s2c"),
            max(when(col("arm") === 1, col("s2"))).as("s2t")
          )
          .select(
            col("n_c"),
            col("n_t"),
            expr("round(CAST(s1c AS DOUBLE) / 100.0 / n_c, 6)").as("mean_c"),
            expr("round(CAST(s1t AS DOUBLE) / 100.0 / n_t, 6)").as("mean_t"),
            expr("""round((CAST(s1t AS DOUBLE) / n_t - CAST(s1c AS DOUBLE) / n_c)
                          / (CAST(s1c AS DOUBLE) / n_c), 6)""").as("lift"),
            // greatest(·, 0) on each variance term: FP cancellation can
            // land a few ulps negative, which is NaN under Spark's sqrt
            // but an ERROR in DuckDB (the corpus_lm_quality lesson).
            expr("""round((CAST(s1t AS DOUBLE) / n_t - CAST(s1c AS DOUBLE) / n_c)
                    / sqrt( greatest((CAST(n_t AS DOUBLE) * CAST(s2t AS DOUBLE) - CAST(s1t AS DOUBLE) * CAST(s1t AS DOUBLE))
                            / (CAST(n_t AS DOUBLE) * (CAST(n_t AS DOUBLE) - 1.0)) / n_t, 0.0)
                          + greatest((CAST(n_c AS DOUBLE) * CAST(s2c AS DOUBLE) - CAST(s1c AS DOUBLE) * CAST(s1c AS DOUBLE))
                            / (CAST(n_c AS DOUBLE) * (CAST(n_c AS DOUBLE) - 1.0)) / n_c, 0.0)), 6)""")
              .as("z_score")
          )
      },
      Some("""
        WITH pu AS (
          SELECT user_id, CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS um
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        arms AS (
          SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(um) AS BIGINT) AS s1,
                 sum(CAST(um AS DECIMAL(18,0)) * CAST(um AS DECIMAL(18,0))) AS s2
          FROM pu GROUP BY 1),
        p AS (
          SELECT max(CASE WHEN arm = 0 THEN n END) AS n_c,
                 max(CASE WHEN arm = 1 THEN n END) AS n_t,
                 max(CASE WHEN arm = 0 THEN s1 END) AS s1c,
                 max(CASE WHEN arm = 1 THEN s1 END) AS s1t,
                 max(CASE WHEN arm = 0 THEN s2 END) AS s2c,
                 max(CASE WHEN arm = 1 THEN s2 END) AS s2t
          FROM arms)
        SELECT n_c, n_t,
               round(CAST(s1c AS DOUBLE) / 100.0 / n_c, 6) AS mean_c,
               round(CAST(s1t AS DOUBLE) / 100.0 / n_t, 6) AS mean_t,
               round((CAST(s1t AS DOUBLE) / n_t - CAST(s1c AS DOUBLE) / n_c)
                     / (CAST(s1c AS DOUBLE) / n_c), 6) AS lift,
               round((CAST(s1t AS DOUBLE) / n_t - CAST(s1c AS DOUBLE) / n_c)
                 / sqrt( greatest((CAST(n_t AS DOUBLE) * CAST(s2t AS DOUBLE) - CAST(s1t AS DOUBLE) * CAST(s1t AS DOUBLE))
                         / (CAST(n_t AS DOUBLE) * (CAST(n_t AS DOUBLE) - 1.0)) / n_t, 0.0)
                       + greatest((CAST(n_c AS DOUBLE) * CAST(s2c AS DOUBLE) - CAST(s1c AS DOUBLE) * CAST(s1c AS DOUBLE))
                         / (CAST(n_c AS DOUBLE) * (CAST(n_c AS DOUBLE) - 1.0)) / n_c, 0.0)), 6) AS z_score
        FROM p
      """)
    ),

    // --- per-day heavy hitters: top users by event volume ---
    // The windowed heavy-hitter readout (abuse/bot triage, usage top-N):
    // exact at any scale because the shape never sorts globally — counts
    // partial-aggregate on (day, user), then the per-day top-3 runs
    // through WindowGroupLimit (each partition keeps 3 rows before the
    // day-keyed shuffle, the final pass keeps 3 after). Day keys are
    // calendar-cardinality, so the window can never skew.
    // --- DAU / WAU / MAU + stickiness ---
    // The canonical engagement dashboard. Distinct-users-over-a-trailing-
    // window is the shape that tempts a range self-join (every day joined
    // against its 30-day history — O(days·events) shuffle); instead each
    // active (day, user) row CONTRIBUTES itself to the 7/30 window days
    // it makes active — a bounded explode (≤37 rows per active pair),
    // then plain distinct counts keyed on the day. Exact, partition-
    // parallel, and the shuffle keys stay (day[, user]) at any event
    // volume. Stickiness is a safe int/int ratio. Output days are the
    // days with actual activity (DAU ≥ 1).
    Q(
      "q_active_users",
      (s, d) => {
        val active = Q.events(s, d)
          .select(date_trunc("day", col("ts")).cast("date").as("day"), col("user_id"))
          .distinct()
          .pipe(Checkpoints.checkpoint) // three consumers: dau + both windows
        val dau = active.groupBy("day").agg(count(lit(1)).as("dau"))
        def windowed(days: Int, out: String) = active
          .select(
            explode(expr(s"transform(sequence(0, ${days - 1}), i -> date_add(day, i))"))
              .as("wday"),
            col("user_id")
          )
          .distinct()
          .groupBy(col("wday").as(out + "_day"))
          .agg(count(lit(1)).as(out))
        dau
          .join(windowed(7, "wau"), col("day") === col("wau_day"))
          .join(windowed(30, "mau"), col("day") === col("mau_day"))
          .select(
            col("day"),
            col("dau"),
            col("wau"),
            col("mau"),
            round(col("dau").cast("double") / col("mau").cast("double"), 6).as("stickiness")
          )
          .orderBy("day")
      },
      Some("""
        WITH active AS (
          SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events),
        dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM active GROUP BY day),
        wexp AS (SELECT DISTINCT day + CAST(t.i AS INTEGER) AS wday, user_id
                 FROM active CROSS JOIN range(0, 7) t(i)),
        wau AS (SELECT wday, CAST(count(*) AS BIGINT) AS wau FROM wexp GROUP BY wday),
        mexp AS (SELECT DISTINCT day + CAST(t.i AS INTEGER) AS mday, user_id
                 FROM active CROSS JOIN range(0, 30) t(i)),
        mau AS (SELECT mday, CAST(count(*) AS BIGINT) AS mau FROM mexp GROUP BY mday)
        SELECT d.day, d.dau, w.wau, m.mau,
               round(CAST(d.dau AS DOUBLE) / m.mau, 6) AS stickiness
        FROM dau d JOIN wau w ON d.day = w.wday JOIN mau m ON d.day = m.mday
        ORDER BY d.day
      """)
    ),

    // --- daily new vs returning users ---
    // The acquisition/retention split every engagement dashboard pairs
    // with DAU: a user is NEW on their first-seen day, RETURNING after.
    // Two keyed aggregates off one checkpointed distinct (day, user)
    // active set — per-user min day (user-keyed, partial-aggregated min)
    // grouped onto its day for the new counts, the plain day count for
    // DAU — and a broadcast zero-fill join on the calendar-cardinality
    // day key. new_frac is a safe int/int ratio at 6 dp.
    Q(
      "q_new_vs_returning",
      (s, d) => {
        val active = Q.events(s, d)
          .select(date_trunc("day", col("ts")).cast("date").as("day"), col("user_id"))
          .distinct()
          .pipe(Checkpoints.checkpoint) // two consumers: dau + first-seen
        val dau = active.groupBy("day").agg(count(lit(1)).as("dau"))
        val firstSeen = active
          .groupBy("user_id")
          .agg(min("day").as("day"))
          .groupBy("day")
          .agg(count(lit(1)).as("new_users"))
        dau
          .join(broadcast(firstSeen), Seq("day"), "left")
          .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
          .withColumn("returning", col("dau") - col("new_users"))
          .withColumn(
            "new_frac",
            round(col("new_users").cast("double") / col("dau").cast("double"), 6)
          )
          .select("day", "dau", "new_users", "returning", "new_frac")
          .orderBy("day")
      },
      Some("""
        WITH active AS (
          SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events),
        dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM active GROUP BY day),
        fs AS (
          SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM (
            SELECT user_id, min(day) AS day FROM active GROUP BY user_id)
          GROUP BY day)
        SELECT d.day, d.dau,
               coalesce(fs.new_users, 0) AS new_users,
               d.dau - coalesce(fs.new_users, 0) AS returning,
               round(CAST(coalesce(fs.new_users, 0) AS DOUBLE) / d.dau, 6) AS new_frac
        FROM dau d LEFT JOIN fs ON d.day = fs.day ORDER BY d.day
      """)
    ),

    Q(
      "q_heavy_hitters",
      (s, d) => {
        val counts = Q.events(s, d)
          .groupBy(date_trunc("day", col("ts")).as("day"), col("user_id"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("day").orderBy(desc("n"), asc("user_id"))
        counts
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .orderBy("day", "rank")
      },
      Some("""
        WITH c AS (
          SELECT date_trunc('day', ts) AS day, user_id, CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        r AS (
          SELECT day, user_id, n,
                 row_number() OVER (PARTITION BY day ORDER BY n DESC, user_id) AS rank
          FROM c)
        SELECT day, user_id, n, CAST(rank AS INTEGER) AS rank
        FROM r WHERE rank <= 3 ORDER BY day, rank
      """)
    ),

    // --- item-item co-occurrence similarity (collaborative filtering) ---
    // The market-basket shape: items (the `k` prop of click/purchase
    // events) are similar when the same users touch both. Interactions
    // dedupe to distinct (user, item); the pair pass is the standard
    // user-keyed self-join — per-user cost is quadratic in THAT user's
    // distinct-item count, so `itemInteractions` CAPS each user at
    // `ItemSimUserCap` distinct items (deterministic top-N by event count
    // then item id) BEFORE the self-join. The cap sits far above the test
    // catalog (100 items) so small-scale output is byte-identical to the
    // uncapped oracle, while at 100 TB a crawler touching 10⁶ items
    // contributes at most cap²/2 pairs instead of 10¹²; co-counts and item
    // counts partial-aggregate, the cosine c/√(n_i·n_j) is one
    // correctly-rounded chain, and per-item top-3 is a window keyed on the
    // item — catalog-cardinality keys, no global sort.
    Q(
      "q_item_similarity",
      (s, d) => {
        // Three consumers (item counts + both self-join roles) —
        // checkpoint or the events scan + JSON extract + cap window runs
        // three times.
        val inter = itemInteractions(s, d).pipe(Checkpoints.checkpoint)
        val ni = inter.groupBy("item").agg(count(lit(1)).as("n"))
        val co = inter
          .select(col("user_id"), col("item").as("i"))
          .join(inter.select(col("user_id"), col("item").as("j")), Seq("user_id"))
          .filter(col("i") < col("j"))
          .groupBy("i", "j")
          .agg(count(lit(1)).as("c"))
        val sim = co
          .join(ni.select(col("item").as("i"), col("n").as("ni")), "i")
          .join(ni.select(col("item").as("j"), col("n").as("nj")), "j")
          .withColumn(
            "cosine",
            round(col("c").cast("double") / sqrt((col("ni") * col("nj")).cast("double")), 6)
          )
        val both = sim
          .select(col("i").as("item"), col("j").as("other"), col("c"), col("cosine"))
          .unionByName(sim.select(col("j").as("item"), col("i").as("other"), col("c"), col("cosine")))
        val w = Window.partitionBy("item").orderBy(desc("cosine"), asc("other"))
        both
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select("item", "other", "c", "cosine", "rank")
          .orderBy("item", "rank")
      },
      Some("""
        WITH inter AS (
          SELECT DISTINCT user_id,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
          FROM events WHERE event_type IN ('click', 'purchase')),
        ni AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM inter GROUP BY item),
        co AS (
          SELECT a.item AS i, b.item AS j, CAST(count(*) AS BIGINT) AS c
          FROM inter a JOIN inter b ON a.user_id = b.user_id AND a.item < b.item
          GROUP BY 1, 2),
        sim AS (
          SELECT co.i, co.j, co.c,
                 round(CAST(co.c AS DOUBLE) / sqrt(CAST(x.n * y.n AS DOUBLE)), 6) AS cosine
          FROM co JOIN ni x ON co.i = x.item JOIN ni y ON co.j = y.item),
        bi AS (
          SELECT i AS item, j AS other, c, cosine FROM sim
          UNION ALL
          SELECT j AS item, i AS other, c, cosine FROM sim),
        r AS (
          SELECT item, other, c, cosine,
                 row_number() OVER (PARTITION BY item ORDER BY cosine DESC, other ASC) AS rank
          FROM bi)
        SELECT item, other, c, cosine, CAST(rank AS INTEGER) AS rank
        FROM r WHERE rank <= 3 ORDER BY item, rank
      """)
    ),

    // --- RFM segmentation (fixed thresholds) ---
    // The recency/frequency/monetary segment counts CRM dashboards run.
    // Thresholds are FIXED business constants (recency ≤7/≤30 days from
    // the corpus max day, frequency ≥20/≥5 events, monetary ≥$500/≥$50)
    // — quantile-based variants would need cross-engine-exact tertiles
    // over |users| rows (the ntile trap corpus_lm_quality's broadcast
    // cutoffs exist to avoid). Per-user aggregates partial-combine on
    // user_id (purchase cents exact via floor-quantization, the q_ab_lift
    // rule), recency is exact integer day arithmetic against the
    // broadcast 1-row max-day, the 3-letter segment label is a pure
    // expression, and the readout is a |segments|-row count.
    Q(
      "q_rfm_segments",
      (s, d) => {
        val ev = Q.events(s, d)
        val perUser = ev
          .groupBy("user_id")
          .agg(
            max(date_trunc("day", col("ts")).cast("date")).as("last_day"),
            count(lit(1)).as("freq"),
            sum(
              when(
                col("event_type") === "purchase",
                floor(col("value") * 100).cast("long")
              ).otherwise(0L)
            ).as("cents")
          )
        val maxDay = ev.agg(max(date_trunc("day", col("ts")).cast("date")).as("max_day"))
        perUser
          .crossJoin(broadcast(maxDay))
          .withColumn("recency_days", datediff(col("max_day"), col("last_day")).cast("long"))
          .withColumn(
            "r",
            when(col("recency_days") <= 7, "1").when(col("recency_days") <= 30, "2").otherwise("3")
          )
          .withColumn("f", when(col("freq") >= 20, "1").when(col("freq") >= 5, "2").otherwise("3"))
          .withColumn(
            "m",
            when(col("cents") >= 50000L, "1").when(col("cents") >= 5000L, "2").otherwise("3")
          )
          .withColumn("segment", concat(col("r"), col("f"), col("m")))
          .groupBy("segment")
          .agg(
            count(lit(1)).as("n_users"),
            sum("cents").as("cents"),
            sum("freq").as("events")
          )
          .orderBy("segment")
      },
      Some("""
        WITH pu AS (
          SELECT user_id,
                 max(CAST(date_trunc('day', ts) AS DATE)) AS last_day,
                 CAST(count(*) AS BIGINT) AS freq,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                               THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
                   AS cents
          FROM events GROUP BY user_id),
        md AS (SELECT max(CAST(date_trunc('day', ts) AS DATE)) AS max_day FROM events),
        seg AS (
          SELECT (CASE WHEN md.max_day - pu.last_day <= 7 THEN '1'
                       WHEN md.max_day - pu.last_day <= 30 THEN '2' ELSE '3' END)
                 || (CASE WHEN pu.freq >= 20 THEN '1' WHEN pu.freq >= 5 THEN '2' ELSE '3' END)
                 || (CASE WHEN pu.cents >= 50000 THEN '1'
                          WHEN pu.cents >= 5000 THEN '2' ELSE '3' END) AS segment,
                 pu.cents, pu.freq
          FROM pu CROSS JOIN md)
        SELECT segment, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(cents) AS BIGINT) AS cents,
               CAST(sum(freq) AS BIGINT) AS events
        FROM seg GROUP BY segment ORDER BY segment
      """)
    ),

    // --- association rules over item co-baskets ---
    // Market-basket rules (support / confidence / lift) — the
    // interpretable complement of q_item_similarity's cosine: which item
    // IMPLIES which, and with how much lift over independence. Baskets
    // are the capped distinct (user, item) interactions (one checkpoint,
    // the q_item_similarity machinery), co-counts partial-aggregate off
    // the user-keyed self-join, and each pair emits BOTH rule
    // directions. All three measures are single int/int IEEE divisions
    // at 6 dp (lift's numerator c·n_users and denominator n_a·n_c stay
    // exact integers); the global top-10 by lift is TakeOrdered with
    // full tie-breaks, never a rule-table sort.
    Q(
      "q_basket_rules",
      (s, d) => {
        val inter = itemInteractions(s, d).pipe(Checkpoints.checkpoint)
        val nu = inter.agg(countDistinct("user_id").as("n_users"))
        val ni = inter.groupBy("item").agg(count(lit(1)).as("n"))
        val co = inter
          .select(col("user_id"), col("item").as("i"))
          .join(inter.select(col("user_id"), col("item").as("j")), Seq("user_id"))
          .filter(col("i") < col("j"))
          .groupBy("i", "j")
          .agg(count(lit(1)).as("c"))
          .filter(col("c") >= 2)
        val both = co
          .select(col("i").as("antecedent"), col("j").as("consequent"), col("c"))
          .unionByName(co.select(col("j").as("antecedent"), col("i").as("consequent"), col("c")))
        both
          .join(ni.select(col("item").as("antecedent"), col("n").as("n_a")), "antecedent")
          .join(ni.select(col("item").as("consequent"), col("n").as("n_c")), "consequent")
          .crossJoin(broadcast(nu))
          .withColumn(
            "support",
            round(col("c").cast("double") / col("n_users").cast("double"), 6)
          )
          .withColumn(
            "confidence",
            round(col("c").cast("double") / col("n_a").cast("double"), 6)
          )
          .withColumn(
            "lift",
            round(
              (col("c") * col("n_users")).cast("double") / (col("n_a") * col("n_c")).cast("double"),
              6
            )
          )
          .orderBy(desc("lift"), desc("confidence"), asc("antecedent"), asc("consequent"))
          .limit(10)
          .withColumn(
            "rank",
            row_number()
              .over(Window.orderBy(desc("lift"), desc("confidence"),
                asc("antecedent"), asc("consequent")))
              .cast("int")
          )
          .select("rank", "antecedent", "consequent", "c", "support", "confidence", "lift")
          .orderBy("rank")
      },
      Some("""
        WITH inter AS (
          SELECT DISTINCT user_id,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
          FROM events WHERE event_type IN ('click', 'purchase')),
        nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM inter),
        ni AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM inter GROUP BY item),
        co AS (
          SELECT a.item AS i, b.item AS j, CAST(count(*) AS BIGINT) AS c
          FROM inter a JOIN inter b ON a.user_id = b.user_id AND a.item < b.item
          GROUP BY 1, 2 HAVING count(*) >= 2),
        bi AS (
          SELECT i AS antecedent, j AS consequent, c FROM co
          UNION ALL
          SELECT j AS antecedent, i AS consequent, c FROM co),
        m AS (
          SELECT b.antecedent, b.consequent, b.c,
                 round(CAST(b.c AS DOUBLE) / nu.n_users, 6) AS support,
                 round(CAST(b.c AS DOUBLE) / x.n, 6) AS confidence,
                 round(CAST(b.c * nu.n_users AS DOUBLE) / CAST(x.n * y.n AS DOUBLE), 6) AS lift
          FROM bi b
          JOIN ni x ON b.antecedent = x.item
          JOIN ni y ON b.consequent = y.item
          CROSS JOIN nu),
        r AS (
          SELECT antecedent, consequent, c, support, confidence, lift,
                 row_number() OVER (ORDER BY lift DESC, confidence DESC,
                                    antecedent, consequent) AS rank
          FROM m)
        SELECT CAST(rank AS INTEGER) AS rank, antecedent, consequent, c,
               support, confidence, lift
        FROM r WHERE rank <= 10 ORDER BY rank
      """)
    ),

    // --- fixed-point PageRank over the item co-occurrence graph ---
    // Iterative graph ranking beyond connected components — the
    // centrality signal web-scale curation ranks domains by (Common
    // Crawl's harmonic/PageRank ordering) and recommenders use for item
    // importance, here over the same co-occurrence graph as
    // q_item_similarity. Three unrolled power iterations, damping 0.85.
    // The cross-engine trick is FIXED-POINT arithmetic: pr lives in exact
    // 1e12-unit integers, messages floor-divide by the sender's degree,
    // receiver sums are order-independent BIGINT aggregates, and the
    // damping mix is integer (85·Σ) div 100 — so the whole iteration is
    // deterministic integer arithmetic in both engines, where a
    // floating-point power iteration would drift with partition order.
    // Plan: the degree-annotated edge table checkpoints once and feeds
    // all three node-keyed message shuffles; mass conservation bounds
    // every in_sum at ~1e12 (no overflow at any catalog size); the final
    // top-10 is TakeOrdered, never a global sort.
    Q(
      "q_pagerank",
      (s, d) => {
        val inter = itemInteractions(s, d).pipe(Checkpoints.checkpoint)
        val pairs = inter
          .select(col("user_id"), col("item").as("i"))
          .join(inter.select(col("user_id"), col("item").as("j")), Seq("user_id"))
          .filter(col("i") < col("j"))
          .select("i", "j")
          .distinct()
        val und = pairs
          .select(col("i").as("src"), col("j").as("dst"))
          .unionByName(pairs.select(col("j").as("src"), col("i").as("dst")))
        val deg = und.groupBy("src").agg(count(lit(1)).as("src_deg"))
        val edges = und.join(deg, "src").pipe(Checkpoints.checkpoint)
        val nodes = edges.select(col("src").as("item")).distinct().pipe(Checkpoints.checkpoint)
        val nTotal = nodes.agg(count(lit(1)).as("n"))
        val pr0 = nodes
          .crossJoin(broadcast(nTotal))
          .withColumn("pr", expr("1000000000000 div n"))
          .select("item", "pr", "n")
        val pr3 = (1 to 3).foldLeft(pr0)((pr, _) => prStep(pr, edges))
        pr3
          .orderBy(desc("pr"), asc("item"))
          .limit(10)
          .withColumn(
            "rank",
            row_number().over(Window.orderBy(desc("pr"), asc("item"))).cast("int")
          )
          .select("rank", "item", "pr")
          .orderBy("rank")
      },
      Some("""
        WITH inter AS (
          SELECT DISTINCT user_id,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
          FROM events WHERE event_type IN ('click', 'purchase')),
        pairs AS (
          SELECT DISTINCT a.item AS i, b.item AS j
          FROM inter a JOIN inter b ON a.user_id = b.user_id AND a.item < b.item),
        und AS (SELECT i AS src, j AS dst FROM pairs
                UNION ALL SELECT j AS src, i AS dst FROM pairs),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS src_deg FROM und GROUP BY src),
        e AS (SELECT u.src, u.dst, d.src_deg FROM und u JOIN deg d USING (src)),
        nodes AS (SELECT DISTINCT src AS item FROM und),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        p0 AS (SELECT item, 1000000000000 // n AS pr FROM nodes CROSS JOIN nt),
        m1 AS (SELECT e.dst AS item, CAST(sum(p.pr // e.src_deg) AS BIGINT) AS s
               FROM e JOIN p0 p ON e.src = p.item GROUP BY 1),
        p1 AS (SELECT nodes.item,
                      (15 * (1000000000000 // nt.n)) // 100 + (85 * coalesce(m1.s, 0)) // 100 AS pr
               FROM nodes CROSS JOIN nt LEFT JOIN m1 ON nodes.item = m1.item),
        m2 AS (SELECT e.dst AS item, CAST(sum(p.pr // e.src_deg) AS BIGINT) AS s
               FROM e JOIN p1 p ON e.src = p.item GROUP BY 1),
        p2 AS (SELECT nodes.item,
                      (15 * (1000000000000 // nt.n)) // 100 + (85 * coalesce(m2.s, 0)) // 100 AS pr
               FROM nodes CROSS JOIN nt LEFT JOIN m2 ON nodes.item = m2.item),
        m3 AS (SELECT e.dst AS item, CAST(sum(p.pr // e.src_deg) AS BIGINT) AS s
               FROM e JOIN p2 p ON e.src = p.item GROUP BY 1),
        p3 AS (SELECT nodes.item,
                      (15 * (1000000000000 // nt.n)) // 100 + (85 * coalesce(m3.s, 0)) // 100 AS pr
               FROM nodes CROSS JOIN nt LEFT JOIN m3 ON nodes.item = m3.item),
        r AS (SELECT item, pr, row_number() OVER (ORDER BY pr DESC, item) AS rank FROM p3)
        SELECT CAST(rank AS INTEGER) AS rank, item, pr
        FROM r WHERE rank <= 10 ORDER BY rank
      """)
    ),

    // --- top session paths (full user journeys) ---
    // The sequence-analytics complement of q_event_flow (1-step) and
    // q_funnel (one fixed pattern): the most common COMPLETE journeys,
    // as the first 8 event types of each 30-minute-gap session. Sessions
    // reuse q_sessionize's gaps-and-islands arithmetic; the per-session
    // path array is HARD-BOUNDED at 8 steps BEFORE collection (a step
    // window filter, so a bot's million-event session contributes an
    // 8-element array, never an unbounded collect_list); path counts
    // partial-aggregate on a key space bounded by |types|⁸ in theory and
    // the observed journey variety in practice, and the top-10 is
    // TakeOrdered. Everything shuffles on (user[, session]) then path —
    // no global sort, no unbounded state.
    Q(
      "q_session_paths",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sess = Q.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
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
        val sw = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
        val paths = sess
          .withColumn("step", row_number().over(sw))
          .filter(col("step") <= 8)
          .groupBy("user_id", "session_id")
          .agg(
            array_join(
              transform(
                array_sort(collect_list(struct(col("step"), col("event_type")))),
                x => x.getField("event_type")
              ),
              ">"
            ).as("path")
          )
        paths
          .groupBy("path")
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("path"))
          .limit(10)
          .withColumn(
            "rank",
            row_number().over(Window.orderBy(desc("n"), asc("path"))).cast("int")
          )
          .select("rank", "path", "n")
          .orderBy("rank")
      },
      Some("""
        WITH x AS (
          SELECT user_id, event_id, ts, event_type,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events),
        y AS (
          SELECT user_id, event_id, ts, event_type,
                 CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM x),
        z AS (
          SELECT user_id, event_id, ts, event_type,
                 CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_id
          FROM y),
        st AS (
          SELECT user_id, session_id, event_type,
                 row_number() OVER (PARTITION BY user_id, session_id
                                    ORDER BY ts, event_id) AS step
          FROM z),
        p AS (
          SELECT user_id, session_id,
                 array_to_string(list(event_type ORDER BY step), '>') AS path
          FROM st WHERE step <= 8 GROUP BY user_id, session_id),
        c AS (SELECT path, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY path),
        r AS (SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rank FROM c)
        SELECT CAST(rank AS INTEGER) AS rank, path, n
        FROM r WHERE rank <= 10 ORDER BY rank
      """)
    ),

    // --- event-flow transition matrix (user-path Markov chain) ---
    // The product-flow readout behind sankey/path dashboards: for each
    // ordered pair of consecutive events within a user's timeline, the
    // transition count and probability P(next | current). One user-keyed
    // window (lead over (ts, event_id) — the unique id breaks timestamp
    // ties deterministically, the sessionize posture: linearithmic in each
    // user's own event count, never cross-user), then the pair counts
    // partial-aggregate onto a |types|²-sized key space and the per-source
    // normaliser is a window over that same metadata-sized table — nothing
    // after the first shuffle scales with event volume. P is a safe
    // int/int double division rounded at 6 dp.
    Q(
      "q_event_flow",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        flowOver(
          Q.events(s, d)
            .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
            .withColumn("next_type", lead("event_type", 1).over(w))
            .filter(col("next_type").isNotNull)
            .select(col("event_type").as("from_type"), col("next_type").as("to_type"))
        )
      },
      Some("""
        WITH s AS (
          SELECT user_id, event_type,
                 lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
          FROM events),
        c AS (
          SELECT event_type AS from_type, next_type AS to_type, CAST(count(*) AS BIGINT) AS n
          FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n,
               round(CAST(n AS DOUBLE)
                     / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
        FROM c ORDER BY from_type, to_type
      """)
    ),

    // --- daily-volume anomaly detection (trailing-window z-score) ---
    // The ops/abuse alarm over event volume: each day's count against the
    // mean/std of the 7 PRECEDING active days (rows-based, so a dark day
    // doesn't shrink the baseline sample). The window input is the daily
    // aggregate — calendar-cardinality (thousands of rows at ANY event
    // volume) — so the unpartitioned ordered window is bounded by the
    // calendar, not the data; everything event-scale happened in the
    // partial-aggregated day count before it. Cross-engine discipline: the
    // sums s1/s2 are exact integers (|s2| < 2⁶³ up to ~10⁹ events/day — an
    // order of magnitude above 100 TB/yr event rates); zero variance is
    // detected by the EXACT min=max test, never by comparing a computed
    // double to 0; the z chain (n − s1/7)/√((7·s2 − s1²)/42) is evaluated
    // with the identical correctly-rounded IEEE expression tree in both
    // engines, then rounded at 6 dp, and the boolean flag compares the
    // ROUNDED z so no sub-ulp drift can flip it.
    Q(
      "q_anomaly_days",
      (s, d) =>
        anomalyOver(
          Q.events(s, d)
            .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
            .agg(count(lit(1)).as("n"))
        ),
      Some("""
        WITH daily AS (
          SELECT CAST(date_trunc('day', ts) AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1),
        w AS (
          SELECT day, n,
                 CAST(count(*) OVER win AS BIGINT) AS k,
                 CAST(sum(n) OVER win AS BIGINT) AS s1,
                 CAST(sum(n * n) OVER win AS BIGINT) AS s2,
                 max(n) OVER win = min(n) OVER win AS flat
          FROM daily
          WINDOW win AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        zc AS (
          SELECT day, n,
                 round(CAST(s1 AS DOUBLE) / 7.0, 6) AS mean,
                 CASE WHEN flat THEN NULL
                      ELSE round((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / 7.0)
                                 / sqrt((7.0 * CAST(s2 AS DOUBLE)
                                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / 42.0), 6)
                 END AS z
          FROM w WHERE k = 7)
        SELECT day, n, mean, z, COALESCE(abs(z) > 3.0, FALSE) AS is_anomaly
        FROM zc ORDER BY day
      """)
    ),

    // --- weekly growth accounting ---
    // The canonical growth decomposition (new / retained / resurrected /
    // churned per week) that DAU and new-vs-returning only hint at: every
    // active user-week is classified by its per-user PREVIOUS active week
    // (lag over a user-keyed window — one shuffle, then counts partial-
    // aggregate onto calendar-cardinality weeks), and a user churns INTO
    // week w+1 when week w was active but w+1 is not (lead gap, with the
    // final observed week exempt — the corpus ending is not churn). The
    // report frame is the full min..max week calendar (a 1-row broadcast
    // bound exploded), zero-filled, so quiet weeks still carry their
    // churn counts. Weeks use the exact floor-division arithmetic shared
    // with q_retention_cohorts; every measure is an integer count.
    Q(
      "q_growth_accounting",
      (s, d) => {
        val act = Q
          .events(s, d)
          .select(
            col("user_id"),
            expr("""(datediff(CAST(ts AS DATE), DATE'2024-01-01')
                     - ((datediff(CAST(ts AS DATE), DATE'2024-01-01') % 7) + 7) % 7)
                    div 7""").as("wk")
          )
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("wk")
        val lagged = act
          .withColumn("prev", lag("wk", 1).over(w))
          .withColumn("nxt", lead("wk", 1).over(w))
          .pipe(Checkpoints.checkpoint) // three consumers: status, churn, bounds
        val bounds = lagged.agg(min("wk").as("lo"), max("wk").as("hi"))
        val status = lagged
          .groupBy("wk")
          .agg(
            count(when(col("prev").isNull, 1)).as("new_users"),
            count(when(col("prev") === col("wk") - 1, 1)).as("retained"),
            count(when(col("prev") < col("wk") - 1, 1)).as("resurrected")
          )
        val churn = lagged
          .join(broadcast(bounds))
          .filter(
            (col("nxt").isNull && col("wk") < col("hi")) || col("nxt") > col("wk") + 1
          )
          .groupBy((col("wk") + 1).as("wk"))
          .agg(count(lit(1)).as("churned"))
        bounds
          .select(explode(sequence(col("lo"), col("hi"))).as("wk"))
          .join(broadcast(status), Seq("wk"), "left")
          .join(broadcast(churn), Seq("wk"), "left")
          .select(
            col("wk").as("week"),
            coalesce(col("new_users"), lit(0L)).as("new_users"),
            coalesce(col("retained"), lit(0L)).as("retained"),
            coalesce(col("resurrected"), lit(0L)).as("resurrected"),
            coalesce(col("churned"), lit(0L)).as("churned")
          )
          .orderBy("week")
      },
      Some("""
        WITH act AS (
          SELECT DISTINCT user_id,
                 (datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  - ((datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7) + 7) % 7) // 7 AS wk
          FROM events),
        lagged AS (
          SELECT user_id, wk,
                 lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev,
                 lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nxt
          FROM act),
        bounds AS (SELECT min(wk) AS lo, max(wk) AS hi FROM lagged),
        status AS (
          SELECT wk,
                 CAST(count(*) FILTER (WHERE prev IS NULL) AS BIGINT) AS new_users,
                 CAST(count(*) FILTER (WHERE prev = wk - 1) AS BIGINT) AS retained,
                 CAST(count(*) FILTER (WHERE prev < wk - 1) AS BIGINT) AS resurrected
          FROM lagged GROUP BY wk),
        churn AS (
          SELECT l.wk + 1 AS wk, CAST(count(*) AS BIGINT) AS churned
          FROM lagged l CROSS JOIN bounds b
          WHERE (l.nxt IS NULL AND l.wk < b.hi) OR l.nxt > l.wk + 1
          GROUP BY 1),
        cal AS (SELECT b.lo + CAST(t.i AS BIGINT) AS wk
                FROM bounds b CROSS JOIN range(0, 10000) t(i)
                WHERE b.lo + t.i <= b.hi)
        SELECT cal.wk AS week,
               COALESCE(s.new_users, 0) AS new_users,
               COALESCE(s.retained, 0) AS retained,
               COALESCE(s.resurrected, 0) AS resurrected,
               COALESCE(c.churned, 0) AS churned
        FROM cal LEFT JOIN status s ON cal.wk = s.wk
                 LEFT JOIN churn c ON cal.wk = c.wk
        ORDER BY week
      """)
    ),

    // --- engagement concentration: Gini coefficient of events per user ---
    // The inequality readout behind every "top 1% of users" claim: how
    // concentrated is event volume across users. The naive formulation
    // ranks every user by activity through ONE global sort; instead the
    // per-user counts collapse to a COUNTS-OF-COUNTS table (one row per
    // distinct activity level — bounded by the max per-user count, the
    // degree-distribution shape, thousands of rows when users are
    // billions), and the rank-sum Σ i·cᵢ folds per tie block in closed
    // form: the m users at level c with B quieter users below them occupy
    // ranks B+1..B+m, contributing c·(B·m + m(m+1)/2). Everything
    // is exact BIGINT (the tie-block product lifts through DECIMAL(38,0)
    // so a 10¹²-event corpus cannot overflow); the final
    // G = (2·S₁ − (n+1)·T) / (n·T) is ONE identical IEEE chain over
    // exactly-cast doubles, rounded at 6 dp.
    Q(
      "q_engagement_gini",
      (s, d) => {
        val coc = Q
          .events(s, d)
          .groupBy("user_id")
          .agg(count(lit(1)).as("c"))
          .groupBy("c")
          .agg(count(lit(1)).as("m"))
        val w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
        coc
          .withColumn("b", coalesce(sum("m").over(w), lit(0L)))
          .agg(
            sum(col("m")).as("users"),
            sum(col("c") * col("m")).as("events"),
            sum(
              expr("""CAST(c AS DECIMAL(38,0)) *
                      (CAST(b AS DECIMAL(38,0)) * m + (m * (m + 1)) div 2)""")
            ).as("s1")
          )
          .select(
            col("users"),
            col("events"),
            round(
              (lit(2.0) * col("s1").cast("double")
                - (col("users").cast("double") + lit(1.0)) * col("events").cast("double"))
                / (col("users").cast("double") * col("events").cast("double")),
              6
            ).as("gini")
          )
      },
      Some("""
        WITH cnt AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
        coc AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM cnt GROUP BY 1),
        ranked AS (
          SELECT c, m,
                 COALESCE(sum(m) OVER (ORDER BY c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
          FROM coc),
        agg AS (
          SELECT CAST(sum(m) AS BIGINT) AS users,
                 CAST(sum(c * m) AS BIGINT) AS events,
                 sum(CAST(c AS DECIMAL(38,0)) *
                     (CAST(b AS DECIMAL(38,0)) * m + (m * (m + 1)) // 2)) AS s1
          FROM ranked)
        SELECT users, events,
               round((2.0 * CAST(s1 AS DOUBLE)
                      - (CAST(users AS DOUBLE) + 1.0) * CAST(events AS DOUBLE))
                     / (CAST(users AS DOUBLE) * CAST(events AS DOUBLE)), 6) AS gini
        FROM agg
      """)
    ),

    // --- Pareto concentration: event share of the top 1% / 10% users ---
    // The "top x% of users drive y% of volume" companion to the Gini,
    // computed WITHOUT ranking users: per-user counts collapse to the
    // same counts-of-counts table, levels order DESCENDING by activity,
    // and the top-k cut takes whole levels plus an exact partial slice of
    // the boundary level — its users are indistinguishable (identical
    // count c), so "the top k" is well-defined as any k of them and the
    // boundary mass is exactly t·c for the t users still needed. k itself
    // is ceil(users·pct) in pure integer arithmetic off the broadcast
    // 1-row totals (never a percentile over users). Everything until the
    // two shares is exact BIGINT; each share is ONE int/int IEEE division
    // rounded at 6 dp. The descending window runs over degree-distribution
    // cardinality, like the Gini's ascending one.
    Q(
      "q_pareto_share",
      (s, d) => {
        val coc = Q
          .events(s, d)
          .groupBy("user_id")
          .agg(count(lit(1)).as("c"))
          .groupBy("c")
          .agg(count(lit(1)).as("m"))
          .pipe(Checkpoints.checkpoint) // two consumers: totals + levels
        val tot = coc.agg(
          sum(col("m")).as("users"),
          sum(col("c") * col("m")).as("events")
        )
        val wd = Window.orderBy(desc("c")).rowsBetween(Window.unboundedPreceding, -1)
        coc
          .withColumn("a", coalesce(sum("m").over(wd), lit(0L)))
          .crossJoin(broadcast(tot))
          .withColumn("k1", expr("(users + 99) div 100"))
          .withColumn("k10", expr("(users + 9) div 10"))
          .agg(
            max("users").as("users"),
            max("events").as("events"),
            max("k1").as("top1_users"),
            sum(expr("greatest(least(m, k1 - a), 0) * c")).as("top1_events"),
            max("k10").as("top10_users"),
            sum(expr("greatest(least(m, k10 - a), 0) * c")).as("top10_events")
          )
          .select(
            col("users"),
            col("events"),
            col("top1_users"),
            col("top1_events"),
            round(col("top1_events").cast("double") / col("events").cast("double"), 6)
              .as("top1_share"),
            col("top10_users"),
            col("top10_events"),
            round(col("top10_events").cast("double") / col("events").cast("double"), 6)
              .as("top10_share")
          )
      },
      Some("""
        WITH cnt AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
        coc AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM cnt GROUP BY 1),
        tot AS (SELECT CAST(sum(m) AS BIGINT) AS users,
                       CAST(sum(c * m) AS BIGINT) AS events FROM coc),
        lv AS (
          SELECT c, m,
                 COALESCE(sum(m) OVER (ORDER BY c DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a
          FROM coc),
        x AS (
          SELECT t.users, t.events,
                 (t.users + 99) // 100 AS k1, (t.users + 9) // 10 AS k10,
                 lv.c, lv.m, lv.a
          FROM lv CROSS JOIN tot t),
        agg AS (
          SELECT max(users) AS users, max(events) AS events,
                 max(k1) AS top1_users,
                 CAST(sum(greatest(least(m, k1 - a), 0) * c) AS BIGINT) AS top1_events,
                 max(k10) AS top10_users,
                 CAST(sum(greatest(least(m, k10 - a), 0) * c) AS BIGINT) AS top10_events
          FROM x)
        SELECT users, events, top1_users, top1_events,
               round(CAST(top1_events AS DOUBLE) / CAST(events AS DOUBLE), 6) AS top1_share,
               top10_users, top10_events,
               round(CAST(top10_events AS DOUBLE) / CAST(events AS DOUBLE), 6) AS top10_share
        FROM agg
      """)
    ),

    // --- session duration histogram: log2-bucketed dwell times ---
    // The engagement-depth distribution behind "median session length"
    // dashboards, without a percentile over sessions: each session's
    // duration (q_sessionize's gaps-and-islands arithmetic, 30-minute
    // gap) lands in a power-of-two bucket computed as EXACT integer
    // log2 — bucket = length(bin(dur+1)), the binary digit count, so no
    // floating log can misplace a boundary duration in one engine only.
    // Plan: one user-keyed window shuffle (each user sorts only its own
    // events), the (user, session) aggregate reuses that partitioning,
    // and the bucket aggregate partial-combines onto ≤~40 rows — nothing
    // after the first shuffle scales with event volume.
    Q(
      "q_session_duration_hist",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Q.events(s, d)
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
          .agg(
            (unix_timestamp(max("ts")) - unix_timestamp(min("ts"))).as("dur_s")
          )
          .pipe(durationHistOver)
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
          FROM y),
        sess AS (
          SELECT user_id, session_id,
                 CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS dur_s
          FROM z GROUP BY user_id, session_id),
        b AS (SELECT CAST(length(bin(dur_s + 1)) AS BIGINT) AS bucket, dur_s FROM sess)
        SELECT bucket, CAST(count(*) AS BIGINT) AS n_sessions,
               min(dur_s) AS min_s, max(dur_s) AS max_s
        FROM b GROUP BY bucket ORDER BY bucket
      """)
    ),

    // --- last-touch attribution: conversions credited to the channel ---
    // The marketing readout behind "which touchpoint drives purchases":
    // each purchase is credited to the SAME USER'S most recent preceding
    // non-purchase event type ("direct" when the purchase is the user's
    // first recorded touch). The running last-non-purchase type is one
    // ignoreNulls last() over the user-keyed window — the as-of-join
    // formulation, ONE shuffle, no per-purchase range scan — revenue
    // quantizes to exact integer cents with floor (the q_ab_lift
    // discipline: a bare BIGINT cast truncates in Spark and rounds in
    // DuckDB), the channel rollup partial-combines onto |event types|
    // rows, and the share normaliser window runs on that metadata-sized
    // table. Shares are single int/int IEEE divisions at 6 dp.
    Q(
      "q_attribution",
      (s, d) => {
        val w = Window
          .partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        attributionOver(
          Q.events(s, d)
            .withColumn(
              "last_touch",
              last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true)
                .over(w)
            )
            .filter(col("event_type") === "purchase")
            .select(
              coalesce(col("last_touch"), lit("direct")).as("channel"),
              expr("CAST(floor(value * 100) AS BIGINT)").as("cents")
            )
        )
      },
      Some("""
        WITH x AS (
          SELECT user_id, ts, event_id, event_type, value,
                 last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                            IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
          FROM events),
        p AS (
          SELECT COALESCE(last_touch, 'direct') AS channel,
                 CAST(floor(value * 100) AS BIGINT) AS cents
          FROM x WHERE event_type = 'purchase'),
        agg AS (
          SELECT channel, CAST(count(*) AS BIGINT) AS conversions,
                 CAST(sum(cents) AS BIGINT) AS revenue_cents
          FROM p GROUP BY channel)
        SELECT channel, conversions, revenue_cents,
               round(CAST(conversions AS DOUBLE)
                     / CAST(sum(conversions) OVER () AS DOUBLE), 6) AS conv_share
        FROM agg ORDER BY channel
      """)
    ),

    // --- inter-purchase intervals: log2-bucketed repurchase gaps ---
    // The repeat-purchase cadence behind replenishment/churn models: the
    // gap in whole days between each customer's consecutive orders, rolled
    // into power-of-two buckets. Gap days are EXACT integer arithmetic —
    // epoch-second difference div 86400, never date_diff('day') whose
    // boundary-counting semantics differ from elapsed time — and the
    // bucket is the same exact integer log2 as the session histogram
    // (binary digit count, no floating log at a boundary). Plan: one
    // customer-keyed window shuffle over orders (each customer sorts only
    // its own orders), then the bucket aggregate partial-combines onto
    // ≤~40 rows; the mean gap is one int/int IEEE division at 6 dp.
    Q(
      "q_purchase_intervals",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("sec", "o_orderkey")
        t(s, d, "orders")
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            unix_timestamp(col("o_orderdate")).as("sec")
          )
          .withColumn("prev_sec", lag("sec", 1).over(w))
          .filter(col("prev_sec").isNotNull)
          .select(expr("(sec - prev_sec) div 86400").as("gap_days"))
          .groupBy(length(bin(col("gap_days") + 1)).cast("long").as("bucket"))
          .agg(
            count(lit(1)).as("n_gaps"),
            min("gap_days").as("min_days"),
            max("gap_days").as("max_days"),
            round(
              sum("gap_days").cast("double") / count(lit(1)).cast("double"),
              6
            ).as("mean_days")
          )
          .orderBy("bucket")
      },
      Some("""
        WITH o AS (
          SELECT o_custkey, o_orderkey,
                 CAST(epoch(o_orderdate) AS BIGINT) AS sec
          FROM orders),
        g AS (
          SELECT (sec - lag(sec) OVER (PARTITION BY o_custkey
                                       ORDER BY sec, o_orderkey)) // 86400 AS gap_days
          FROM o),
        f AS (SELECT gap_days FROM g WHERE gap_days IS NOT NULL)
        SELECT CAST(length(bin(gap_days + 1)) AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_gaps,
               min(gap_days) AS min_days, max(gap_days) AS max_days,
               round(CAST(sum(gap_days) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_days
        FROM f GROUP BY bucket ORDER BY bucket
      """)
    ),

    // --- weekday seasonality: the day-of-week volume profile ---
    // The staffing/alerting baseline behind "is Tuesday always this
    // quiet?". Weekday extraction is the cross-engine trap here — Spark's
    // dayofweek() is 1=Sunday while DuckDB's dayofweek() is 0=Sunday, and
    // locale-dependent day names are worse — so the weekday is PURE
    // integer arithmetic off the same epoch anchor the retention queries
    // use: ((days since Mon 2024-01-01) % 7 + 7) % 7 ⇒ 0=Mon..6=Sun,
    // identical in any engine. One partial-aggregated groupBy onto 7 rows
    // (the distinct-user count shuffles on (weekday, user) first); the
    // share normaliser windows over the 7-row profile.
    Q(
      "q_seasonality",
      (s, d) => {
        Q.events(s, d)
          .select(
            expr(
              "CAST(((datediff(CAST(ts AS DATE), DATE'2024-01-01') % 7) + 7) % 7 AS BIGINT)"
            ).as("weekday"),
            col("user_id")
          )
          .groupBy("weekday")
          .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("n_users"))
          .withColumn(
            "wd_name",
            expr(
              "element_at(array('Mon','Tue','Wed','Thu','Fri','Sat','Sun'), " +
                "CAST(weekday AS INT) + 1)"
            )
          )
          .withColumn(
            "share",
            round(
              col("n_events").cast("double")
                / sum("n_events").over(Window.partitionBy()).cast("double"),
              6
            )
          )
          .select("weekday", "wd_name", "n_events", "n_users", "share")
          .orderBy("weekday")
      },
      Some("""
        WITH x AS (
          SELECT CAST(((datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7) + 7) % 7
                      AS BIGINT) AS weekday,
                 user_id
          FROM events),
        agg AS (
          SELECT weekday, CAST(count(*) AS BIGINT) AS n_events,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          FROM x GROUP BY 1)
        SELECT weekday,
               ['Mon','Tue','Wed','Thu','Fri','Sat','Sun'][CAST(weekday AS INT) + 1] AS wd_name,
               n_events, n_users,
               round(CAST(n_events AS DOUBLE) / CAST(sum(n_events) OVER () AS DOUBLE), 6) AS share
        FROM agg ORDER BY weekday
      """)
    ),

    // --- funnel latency: time-to-convert per completed-funnel leg ---
    // The "how fast do converters convert" companion to q_funnel's
    // conversion counts: for every user who completes the sequenced
    // view→click→purchase funnel (the IDENTICAL stage arithmetic — first
    // view, first click strictly after it within 24h, first purchase
    // strictly after that within 24h), the elapsed whole seconds of each
    // leg. Latencies are exact integer epoch-second differences; the
    // mean is one int/int IEEE division at 6 dp. Plan: the same three
    // user-keyed partial-agg shuffles + user-keyed joins as q_funnel (no
    // per-user event arrays, no global-sort window), then the 3-row leg
    // explode aggregates onto a 3-row key space.
    Q(
      "q_funnel_latency",
      (s, d) => {
        val e = Q.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
        val t1 = e
          .filter(col("event_type") === "view")
          .groupBy("user_id")
          .agg(min("ts").as("t1"))
        val t2 = e
          .filter(col("event_type") === "click")
          .join(t1, "user_id")
          .filter(col("ts") > col("t1") && col("ts") <= col("t1") + expr("INTERVAL 24 HOUR"))
          .groupBy("user_id")
          .agg(min("ts").as("t2"))
        val t3 = e
          .filter(col("event_type") === "purchase")
          .join(t2, "user_id")
          .filter(col("ts") > col("t2") && col("ts") <= col("t2") + expr("INTERVAL 24 HOUR"))
          .groupBy("user_id")
          .agg(min("ts").as("t3"))
        t3.join(t2, "user_id")
          .join(t1, "user_id")
          .select(
            (unix_timestamp(col("t2")) - unix_timestamp(col("t1"))).as("s12"),
            (unix_timestamp(col("t3")) - unix_timestamp(col("t2"))).as("s23"),
            (unix_timestamp(col("t3")) - unix_timestamp(col("t1"))).as("s13")
          )
          .select(
            explode(
              array(
                struct(lit("1_view_to_click").as("leg"), col("s12").as("sec")),
                struct(lit("2_click_to_purchase").as("leg"), col("s23").as("sec")),
                struct(lit("3_view_to_purchase").as("leg"), col("s13").as("sec"))
              )
            ).as("r")
          )
          .select(col("r.leg").as("leg"), col("r.sec").as("sec"))
          .groupBy("leg")
          .agg(
            count(lit(1)).as("n_users"),
            min("sec").as("min_s"),
            max("sec").as("max_s"),
            round(sum("sec").cast("double") / count(lit(1)).cast("double"), 6).as("mean_s")
          )
          .orderBy("leg")
      },
      Some("""
        WITH t1 AS (
          SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1),
        t2 AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN t1 ON e.user_id = t1.user_id
          WHERE e.event_type = 'click' AND e.ts > t1.t1
            AND e.ts <= t1.t1 + INTERVAL 24 HOUR GROUP BY 1),
        t3 AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN t2 ON e.user_id = t2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > t2.t2
            AND e.ts <= t2.t2 + INTERVAL 24 HOUR GROUP BY 1),
        done AS (
          -- date_diff('second') counts whole-second boundaries =
          -- floor(b) - floor(a), matching Spark's unix_timestamp
          -- subtraction; epoch() would keep fractional seconds and drift
          -- by one around sub-second offsets.
          SELECT CAST(date_diff('second', t1.t1, t2.t2) AS BIGINT) AS s12,
                 CAST(date_diff('second', t2.t2, t3.t3) AS BIGINT) AS s23,
                 CAST(date_diff('second', t1.t1, t3.t3) AS BIGINT) AS s13
          FROM t3 JOIN t2 ON t3.user_id = t2.user_id
                  JOIN t1 ON t3.user_id = t1.user_id),
        legs AS (
          SELECT '1_view_to_click' AS leg, s12 AS sec FROM done
          UNION ALL SELECT '2_click_to_purchase', s23 FROM done
          UNION ALL SELECT '3_view_to_purchase', s13 FROM done)
        SELECT leg, CAST(count(*) AS BIGINT) AS n_users,
               min(sec) AS min_s, max(sec) AS max_s,
               round(CAST(sum(sec) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_s
        FROM legs GROUP BY leg ORDER BY leg
      """)
    ),

    // --- hour-of-day profile: the intraday volume curve ---
    // The staffing/scheduling companion of q_seasonality at hour grain:
    // hour-of-day is PURE integer arithmetic on epoch seconds —
    // (sec % 86400) div 3600 — with seconds derived identically in both
    // engines (unix_timestamp truncation ≡ DuckDB whole-second
    // date_diff; epoch() would keep fractions and round differently).
    // One partial-aggregated rollup onto 24 rows; the share normaliser
    // windows over that 24-row profile.
    Q(
      "q_hourly_profile",
      (s, d) => {
        Q.events(s, d)
          .select(expr("(unix_timestamp(ts) % 86400) div 3600").as("hour"))
          .groupBy("hour")
          .agg(count(lit(1)).as("n_events"))
          .withColumn(
            "share",
            round(
              col("n_events").cast("double")
                / sum("n_events").over(Window.partitionBy()).cast("double"),
              6
            )
          )
          .orderBy("hour")
      },
      Some("""
        WITH x AS (
          SELECT (CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS BIGINT)
                  % 86400) // 3600 AS hour
          FROM events),
        agg AS (SELECT hour, CAST(count(*) AS BIGINT) AS n_events FROM x GROUP BY 1)
        SELECT hour, n_events,
               round(CAST(n_events AS DOUBLE) / CAST(sum(n_events) OVER () AS DOUBLE), 6)
                 AS share
        FROM agg ORDER BY hour
      """)
    ),

    // --- activity power-law exponent: the degree-distribution fit ---
    // The one-number bot/health summary of the user-activity distribution
    // (organic engagement sits near a power law; a bot farm bends or
    // truncates it): OLS of ln(users-at-level) on ln(level) over the
    // counts-of-counts table — the same degree-distribution collapse as
    // the Gini/Pareto, so the fit input has one row per distinct activity
    // level at ANY user cardinality, and the same closed-form OLS
    // discipline as text_zipf_slope: each libm ln rounds to 6 dp in
    // ISOLATION, the moment sums accumulate those 6-dp values as exact
    // DECIMAL (partition-order independent), and slope/intercept are one
    // identical IEEE chain over exactly-cast doubles at 6 dp.
    Q(
      "q_activity_power_law",
      (s, d) => {
        Q.olsFitOver(
          Q.events(s, d)
            .groupBy("user_id")
            .agg(count(lit(1)).as("c"))
            .groupBy("c")
            .agg(count(lit(1)).as("m"))
            .select(
              round(log(col("c").cast("double")), 6).as("x"),
              round(log(col("m").cast("double")), 6).as("y")
            )
        ).withColumnRenamed("n_points", "n_levels")
      },
      Some("""
        WITH cnt AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
        coc AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM cnt GROUP BY 1),
        p AS (
          SELECT CAST(round(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
                 CAST(round(ln(CAST(m AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
          FROM coc),
        a AS (
          SELECT CAST(count(*) AS BIGINT) AS n_levels,
                 CAST(sum(x) AS DECIMAL(38,6)) AS sx,
                 CAST(sum(y) AS DECIMAL(38,6)) AS sy,
                 CAST(sum(x * y) AS DECIMAL(38,12)) AS sxy,
                 CAST(sum(x * x) AS DECIMAL(38,12)) AS sxx
          FROM p)
        SELECT n_levels,
               round((CAST(n_levels AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n_levels AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
               round((CAST(sy AS DOUBLE)
                      - ((CAST(n_levels AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n_levels AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                        * CAST(sx AS DOUBLE)) / CAST(n_levels AS DOUBLE), 6) AS intercept
        FROM a
      """)
    )
  )

  /** Fixed-point PageRank message passing, shared across the three unrolled
    * iterations of `q_pagerank`: one node-keyed shuffle join puts pr onto
    * the outgoing edges, messages floor-divide by the sender's degree in
    * EXACT integer micro-units, and the receiver sum is an order-independent
    * BIGINT aggregate — the property that makes iterative ranking
    * cross-engine exact where floating-point power iteration is not.
    */
  private def prStep(
      pr: org.apache.spark.sql.DataFrame,
      edges: org.apache.spark.sql.DataFrame
  ): org.apache.spark.sql.DataFrame = {
    val msgs = edges
      .join(pr.select(col("item").as("src"), col("pr")), "src")
      .select(col("dst").as("item"), expr("pr div src_deg").as("msg"))
      .groupBy("item")
      .agg(sum("msg").as("in_sum"))
    pr.select("item", "n")
      .join(msgs, Seq("item"), "left")
      .withColumn(
        "pr",
        expr("(15 * (1000000000000 div n)) div 100 + (85 * coalesce(in_sum, 0)) div 100")
      )
      .select("item", "pr", "n")
  }

  /** The log2 duration-histogram rollup over a (dur_s BIGINT) frame —
    * shared by the batch `q_session_duration_hist` and the streaming
    * session report ([[graft.Engine.sessionHistReport]]) so both surfaces
    * bucket identical durations identically: bucket = length(bin(dur+1)),
    * the exact integer binary digit count, so no floating log can
    * misplace a boundary duration in one engine (or surface) only.
    */
  def durationHistOver(durs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    durs
      .select(length(bin(col("dur_s") + 1)).cast("long").as("bucket"), col("dur_s"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_sessions"),
        min("dur_s").as("min_s"),
        max("dur_s").as("max_s")
      )
      .orderBy("bucket")

  /** The weekday volume profile over a finalized (day DATE, n BIGINT)
    * frame — the seasonality seam of the streaming daily-counts table
    * ([[graft.Engine.seasonalityReport]]): summing per-day counts by the
    * SAME pure-integer epoch-anchor weekday as `q_seasonality` yields
    * exactly that query's (weekday, wd_name, n_events, share) columns
    * (asserted in EventStreamsSpec), because per-event weekday grouping
    * factors through per-day grouping. The distinct-user column is the one
    * thing a counts-only table cannot carry.
    */
  def seasonalityOver(daily: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    daily
      .groupBy(
        expr("CAST(((datediff(day, DATE'2024-01-01') % 7) + 7) % 7 AS BIGINT)").as("weekday")
      )
      .agg(sum("n").as("n_events"))
      .withColumn(
        "wd_name",
        expr(
          "element_at(array('Mon','Tue','Wed','Thu','Fri','Sat','Sun'), " +
            "CAST(weekday AS INT) + 1)"
        )
      )
      .withColumn(
        "share",
        round(
          col("n_events").cast("double")
            / sum("n_events").over(Window.partitionBy()).cast("double"),
          6
        )
      )
      .select("weekday", "wd_name", "n_events", "share")
      .orderBy("weekday")

  /** The attribution rollup over credited (channel, cents BIGINT) rows —
    * shared by the batch `q_attribution` and the streaming attribution
    * report ([[graft.Engine.attributionReport]]) so both surfaces compute
    * identical conversions, revenue and shares for identical credited
    * rows. The channel rollup partial-combines onto |event types| rows and
    * the share normaliser windows over that metadata-sized table.
    */
  def attributionOver(credited: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    credited
      .groupBy("channel")
      .agg(count(lit(1)).as("conversions"), sum("cents").as("revenue_cents"))
      .withColumn(
        "conv_share",
        round(
          col("conversions").cast("double")
            / sum("conversions").over(Window.partitionBy()).cast("double"),
          6
        )
      )
      .orderBy("channel")

  /** The transition-matrix aggregation over (from_type, to_type) pair rows
    * — shared by the batch `q_event_flow` and the streaming transitions
    * report ([[graft.Engine.flowReport]]) so both surfaces compute the
    * identical counts and P(next|current). The key space is |types|², so
    * both the aggregate and the normaliser window are metadata-sized.
    */
  def flowOver(pairs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val norm = Window.partitionBy("from_type")
    pairs
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .withColumn(
        "p",
        round(col("n").cast("double") / sum("n").over(norm).cast("double"), 6)
      )
      .select("from_type", "to_type", "n", "p")
      .orderBy("from_type", "to_type")
  }

  /** The trailing-z-score anomaly arithmetic over a (day DATE, n BIGINT)
    * frame — shared by the batch `q_anomaly_days` and the streaming
    * daily-counts report ([[graft.Engine.anomalyReport]]) so both surfaces
    * flag the IDENTICAL rows for the same counts. Each day scores against
    * the 7 preceding active days (rows-based, so a dark day doesn't shrink
    * the baseline). Cross-engine/FP discipline (see the q_anomaly_days
    * oracle): exact integer s1/s2 sums, zero variance via the exact
    * min=max test, one identical correctly-rounded IEEE chain, flag on the
    * ROUNDED z. The unpartitioned window is calendar-bounded by
    * construction — callers must hand in the aggregated daily table, never
    * raw events.
    */
  def anomalyOver(daily: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val win = Window.orderBy("day").rowsBetween(-7, -1)
    val s1d = col("s1").cast("double")
    daily
      .withColumn("k", count(lit(1)).over(win))
      .withColumn("s1", sum("n").over(win))
      .withColumn("s2", sum(col("n") * col("n")).over(win))
      .withColumn("flat", max("n").over(win) === min("n").over(win))
      .filter(col("k") === 7)
      .withColumn("mean", round(s1d / 7.0, 6))
      .withColumn(
        "z",
        when(col("flat"), lit(null).cast("double")).otherwise(
          round(
            (col("n").cast("double") - s1d / 7.0) /
              sqrt((lit(7.0) * col("s2").cast("double") - s1d * s1d) / 42.0),
            6
          )
        )
      )
      .withColumn("is_anomaly", coalesce(abs(col("z")) > 3.0, lit(false)))
      .select("day", "n", "mean", "z", "is_anomaly")
      .orderBy("day")
  }

  /** Per-user distinct-item cap for `q_item_similarity`. The self-join's
    * worst case is quadratic in a single user's distinct-item count, so one
    * hot key (a bot touching 10⁶ items) would put ~10¹² pairs in one join
    * group — a straggler no AQE setting fixes. 1000 is far above any human
    * session (and 10× the test catalog, so test-scale output is uncapped)
    * yet bounds any user's pair contribution at ~500k.
    */
  val ItemSimUserCap: Int = 1000

  /** Distinct (user_id, item) interactions from click/purchase events, each
    * user capped at `userCap` items. The ranking is deterministic — event
    * count desc, then item id asc — so reruns and the capped/uncapped
    * equivalence below the cap are both stable. One extra shuffle (the
    * user-keyed window) vs a plain distinct; the window sorts each user's
    * items (linearithmic in that user's count), which is exactly the cost
    * profile that survives a power user, unlike the quadratic join it
    * guards.
    */
  def itemInteractions(
      s: org.apache.spark.sql.SparkSession,
      d: String,
      userCap: Int = ItemSimUserCap
  ): org.apache.spark.sql.DataFrame = {
    val counted = Q.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("user_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("item")
      )
      .groupBy("user_id", "item")
      .agg(count(lit(1)).as("cnt"))
    val capW = Window.partitionBy("user_id").orderBy(desc("cnt"), asc("item"))
    counted
      .withColumn("cap_rank", row_number().over(capW))
      .filter(col("cap_rank") <= userCap)
      .select("user_id", "item")
  }
}
