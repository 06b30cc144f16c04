package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Headline queries span the scale-critical paths: wide-scan aggregation,
  * broadcast + shuffle joins, window functions, sessionization, the dedup
  * family (hash-group, token self-join, SimHash bit votes), kNN, and text
  * hashing. Each runs once against `SPARK_GRAFT_SF_DIR` and is forced with
  * a `noop` sink — full computation, no driver collect, no output I/O.
  */
object Bench {

  /** Scale-representative subset of SparkEntry.queries. */
  val headline: Seq[String] = Seq(
    "q1_agg",
    "q3_top_orders",
    "q5_region_revenue",
    "q_window_rank",
    "q_time_bucket",
    "q_sessionize",
    "dedup_exact",
    "dedup_jaccard",
    "dedup_simhash",
    "knn_brute",
    "text_fingerprint",
    "media_meta"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // Same soak knob as Verify: single-file tables at sf>=1 plan ONE
      // input partition at the 128 MB default split, serializing scans.
      .config(
        "spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728")
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM (codegen, parquet reader, shuffle machinery) outside the
    // timed region.
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.queries("log_min_max")(spark, sfDir).collect()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }

    // Per query: one cold run (one-time planning + codegen, reported as an
    // aux metric), then `runs` timed steady-state runs with the MEDIAN as
    // the headline number — single-run numbers on this box drift ±20-30%,
    // which nearly produced a false regression verdict between rounds; the
    // median of 5 bounds that noise. Override with SPARK_GRAFT_BENCH_RUNS.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    def run(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
      } finally {
        // Storage hygiene: the dedup queries localCheckpoint shared
        // subplans; 6 runs × 12 queries would strand dozens of dead RDDs
        // in storage memory and skew later samples via eviction churn.
        graft.queries.Checkpoints.release()
      }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // Box load BEFORE the timed region — the one number that separates "the
    // code regressed" from "the driver's box was busy" when medians drift
    // between rounds (it already took a judge re-run to adjudicate twice).
    val loadavg =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").trim
      catch { case _: Exception => "" }
    val firstPass = headline.map { name =>
      val cold = run(name)
      val samples =
        if (cold < 0) Seq.empty[Double]
        else Seq.fill(runs)(run(name)).filter(_ >= 0)
      (name, cold, samples)
    }
    // Noise guard: a >5× max/min spread within one query's samples means a
    // co-tenant stole the box mid-measurement (r5: dedup_jaccard sampled
    // 2.1–27.3 s). Re-sample those queries once and merge — the median over
    // 2×runs samples shrugs off the contended block — and flag them so the
    // JSON records that a rerun happened.
    val reran = firstPass.collect {
      case (name, _, ss) if ss.size >= 2 && ss.max / ss.min > 5.0 => name
    }
    val results = firstPass.map { case (name, cold, ss) =>
      val samples = if (reran.contains(name)) ss ++ Seq.fill(runs)(run(name)).filter(_ >= 0) else ss
      val warm = if (samples.isEmpty) -1.0 else median(samples)
      (name, cold, warm, samples)
    }
    val loadavgAfter =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").trim
      catch { case _: Exception => "" }
    val qs = results.map { case (k, _, w, _) => "\"" + k + "\":" + f"$w%.3f" }.mkString("{", ",", "}")
    // Raw per-run samples ride along so a surprising median is adjudicable
    // from the recorded JSON alone (spread vs genuine regression).
    val samplesJson = results
      .map { case (k, _, _, ss) => "\"" + k + "\":" + ss.map(s => f"$s%.3f").mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    // A broken query must not silently shrink the total's denominator
    // (r5: two −1s made an 8.2 s 10-query total read as an improvement over
    // a 12-query 8.1 s). `failed` names every unmeasured query; a non-empty
    // list means `value` is NOT comparable to a full-roster round.
    val failed = results.collect { case (k, _, w, _) if w < 0 => "\"" + k + "\"" }
    val failedJson = failed.mkString("[", ",", "]")
    val reranJson = reran.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._3).filter(_ >= 0).sum
    val coldTotal = results.map(_._2).filter(_ >= 0).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"samples":$samplesJson,"failed":$failedJson,"reran":$reranJson,"loadavg":"$loadavg","loadavg_after":"$loadavgAfter","cold_total":$coldTotal%.3f,"runs":$runs,"sf":"$sfDir"}"""
    )
    spark.stop()
    // Loud exit on any broken headline query — but only after the JSON line
    // is on stdout, so a driver that captures output regardless of status
    // still records the partial numbers alongside the failure.
    if (failed.nonEmpty) sys.exit(1)
  }
}
