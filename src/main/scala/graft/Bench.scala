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
    "media_meta",
    // Round-9 roster widening (r8 verdict #6): the original 12 covered
    // none of the round-7/8 additions, so a perf regression in the
    // containment index-probe, the bitext candidate pipeline, the
    // chunker's map-side explode, or the funnel's keyed aggregates would
    // not move any gated number. One representative per family.
    "dedup_containment",
    "corpus_bitext_mine",
    "corpus_chunk",
    "q_funnel",
    // Round-9 session-7 widening (same logic): one representative each
    // for the fixed-point linear-algebra family (the d²-per-row
    // outer-product aggregate + iteration joins) and the as-of-window
    // analytics family added this session.
    "vec_pca",
    // The serving-shaped twin (r9 verdict #8): the SAME query under
    // spark.graft.pca.reuseScatter=true — repeated invocations on an
    // unchanged corpus reuse the pinned scatter checkpoint instead of
    // re-paying the quantize+scatter passes (~24% of the warm total).
    // The cold sweep builds the cache; the timed sweeps measure the
    // repeat-invocation cost. Plain vec_pca above stays uncached.
    "vec_pca_reuse",
    "q_attribution",
    // Round-11 widening (same one-per-family logic): the ANN accuracy
    // audit (seven retrieval variants swept off shared checkpointed
    // inputs — a regression in the sweep sharing shows here first) and
    // the BPE token-accounting pipeline (vocab-scale merge learning +
    // the per-doc count join — the build-corpus --tokenizer bpe hot
    // path). Totals are NOT comparable across roster widenings; compare
    // per-query or the original-12 subset.
    "knn_recall",
    "text_bpe_apply"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Off-gate scale runs (e.g. the sf1 bench decade in SCALE.md) skip
    // queries whose SYNTHETIC-corpus output is pathological at that SF —
    // the sf tables' 31-word vocabulary makes the jaccard/containment pair
    // OUTPUT explode by construction (their scale evidence is the Zipf
    // legs). Never set in the driver's gated sf0.1 run, where check_bench
    // requires every pinned query present.
    val skip: Set[String] = sys.env
      .get("SPARK_GRAFT_BENCH_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val headline = Bench.headline.filterNot(skip)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_MASTER selects a multi-JVM master (local-cluster[...])
    // for the cross-executor certification leg; default is local[cpus].
    val spark = GraftSession
      .builder(cpus)
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
    //
    // Sampling is INTERLEAVED: the suite runs as `runs` full sweeps over all
    // queries rather than `runs` back-to-back samples per query. Steady
    // co-tenant load then inflates one sweep across every query — visible
    // as a cross-sweep shift the median rejects — instead of inflating ALL
    // samples of whichever queries ran during the contention window, which
    // no within-query spread guard can detect (r6: dedup_simhash sampled
    // 2.6 s × 5 back-to-back under loadavg 3; the judge's quiet box
    // measured 0.39 s and the 3.5× spread never tripped the 5× guard).
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    def run(name: String): Double = {
      val reuse = name == "vec_pca_reuse"
      val fn = SparkEntry.queries(if (reuse) "vec_pca" else name)
      if (reuse) spark.conf.set("spark.graft.pca.reuseScatter", "true")
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
        if (reuse) spark.conf.set("spark.graft.pca.reuseScatter", "false")
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
    def readLoadavg(): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").trim
      catch { case _: Exception => "" }
    def load1(s: String): Double =
      try s.split(" ")(0).toDouble catch { case _: Exception => -1.0 }

    // Direct co-tenant CPU measurement: whole-box busy jiffies from
    // /proc/stat minus THIS JVM's cpu time, over the timed window. The
    // bench's own 32-thread bursts raise 1-min loadavg by ~2 even on a
    // quiet box (measured), so a loadavg-delta guard false-positives on
    // self-load; busy-minus-own cannot — whatever remains after
    // subtracting our own consumption IS someone else's.
    // Kernel tick rate for jiffy→seconds: read once via getconf instead of
    // assuming USER_HZ=100 — a different CLK_TCK would mis-scale the own-CPU
    // subtraction that gates bench acceptance.
    val clkTck: Double =
      try {
        val p = new ProcessBuilder("getconf", "CLK_TCK").start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
        p.waitFor()
        val v = out.toDouble
        if (v > 0) v else 100.0
      } catch { case _: Exception => 100.0 }
    def busyJiffies(): Long =
      try {
        val cpu = scala.io.Source.fromFile("/proc/stat").getLines().next()
        // "cpu user nice system idle iowait irq softirq steal ..." — busy =
        // everything except idle(3) and iowait(4).
        val f = cpu.trim.split("\\s+").drop(1).map(_.toLong)
        f.zipWithIndex.collect { case (v, i) if i != 3 && i != 4 => v }.sum
      } catch { case _: Exception => -1L }
    // "Own" CPU must cover the whole PROCESS TREE, not just this JVM: on a
    // local-cluster master the executors are forked child processes, and
    // the r14 first cluster-bench run misread its own executors as a
    // 5.8-core co-tenant. Sum utime+stime for this pid and every
    // descendant from /proc/<pid>/stat (field layout: comm is
    // parenthesized and may contain spaces — parse after the last ')');
    // dead children fold into cutime/cstime of the parent, which we skip:
    // executors outlive the timed window.
    def ownCpuNanos(): Long =
      try {
        val procs = new java.io.File("/proc")
          .listFiles()
          .filter(f => f.isDirectory && f.getName.forall(_.isDigit))
          .flatMap { d =>
            try {
              val stat = new String(
                java.nio.file.Files.readAllBytes(d.toPath.resolve("stat")), "UTF-8")
              val rest = stat.substring(stat.lastIndexOf(')') + 2).split(" ")
              // rest: state ppid pgrp session tty tpgid flags minflt cminflt
              //       majflt cmajflt utime stime ...
              Some((d.getName.toLong, rest(1).toLong, rest(11).toLong + rest(12).toLong))
            } catch { case _: Exception => None }
          }
        val children = procs.groupBy(_._2).map { case (p, xs) => p -> xs.map(_._1) }
        val cpuOf = procs.map(p => p._1 -> p._3).toMap
        val self = ProcessHandle.current().pid()
        var sum = 0L
        val stack = scala.collection.mutable.Stack(self)
        while (stack.nonEmpty) {
          val pid = stack.pop()
          sum += cpuOf.getOrElse(pid, 0L)
          children.getOrElse(pid, Array.empty[Long]).foreach(stack.push)
        }
        (sum * 1e9 / clkTck).toLong // jiffies → nanos at the measured tick rate
      } catch { case _: Exception => -1L }
    // Co-tenant cores over a bounded probe window — usable any time, even
    // mid-run, because our own consumption is subtracted out.
    def cotenantOver(ms: Long): Double = {
      val b0 = busyJiffies(); val o0 = ownCpuNanos(); val t0 = System.nanoTime()
      Thread.sleep(ms)
      val b1 = busyJiffies(); val o1 = ownCpuNanos()
      val wall = (System.nanoTime() - t0) / 1e9
      if (b0 < 0 || b1 < 0 || o0 < 0 || o1 < 0 || wall <= 0) -1.0
      else math.max(0.0, ((b1 - b0) / clkTck - (o1 - o0) / 1e9) / wall)
    }

    // Quiet-box wait, keyed on MEASURED co-tenant cores (r12 lesson: the
    // sweep was accepted with cotenant_cores 0.96 — roughly a full
    // neighbor core all run — because the pre-wait only looked at
    // loadavg and the post-guard threshold sat at 1.0; that round's
    // medians drifted ~1.33x on load alone). A 5 s probe before the
    // timed region must read <= SPARK_GRAFT_COTENANT_MAX (default 0.1 —
    // quiet rounds measure ~0.02) or the bench sleeps 25 s and re-probes,
    // up to SPARK_GRAFT_BENCH_MAX_WAITS times. Every failed probe is
    // recorded in the JSON: a round that still ran loaded shows k failed
    // waits instead of leaving the adjudication to a judge re-run.
    val maxWaits =
      try sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_WAITS", "6").toInt
      catch { case _: Exception => 6 }
    val cotenantMax =
      try sys.env.getOrElse("SPARK_GRAFT_COTENANT_MAX", "0.1").toDouble
      catch { case _: Exception => 0.1 }
    // Each wait gets its OWN attempts budget (r13 advice: a pre-sweep wait
    // that exhausted the shared budget left the post-guard re-wait with a
    // single un-waitable probe, so the extra sweeps ran into the very
    // contention they exist to avoid). Waits are recorded separately.
    final case class Wait(attempts: Seq[Double], sleptSec: Long, accepted: Double) {
      def json: String = {
        val a = attempts.map(x => f"$x%.2f").mkString("[", ",", "]")
        f"""{"attempts":$a,"slept_sec":$sleptSec,"cotenant_at_accept":$accepted%.2f}"""
      }
    }
    val waits = scala.collection.mutable.ListBuffer.empty[Wait]
    def waitForQuiet(): Double = {
      val attempts = scala.collection.mutable.ListBuffer.empty[Double]
      var slept = 5L
      var probe = cotenantOver(5000L)
      while (probe >= 0 && probe > cotenantMax && attempts.size < maxWaits) {
        attempts += probe
        Thread.sleep(25000L)
        probe = cotenantOver(5000L)
        slept += 30L
      }
      waits += Wait(attempts.toList, slept, probe)
      probe
    }
    val probeAtAccept = waitForQuiet()
    val loadavg = readLoadavg()

    // One full sweep over the suite: each query sampled once, in order.
    def sweepOnce(active: String => Boolean): Map[String, Double] =
      headline.map(name => name -> (if (active(name)) run(name) else -1.0)).toMap
    def sweeps(n: Int, active: String => Boolean): Seq[Map[String, Double]] =
      Seq.fill(n)(sweepOnce(active))

    // Sweep 0 is the cold pass (one-time planning + codegen per query);
    // sweeps 1..runs are the timed samples. A query broken in the cold pass
    // is skipped in later sweeps (it lands in `failed` either way — no point
    // re-raising the same error `runs` more times).
    val coldSweep = sweepOnce(_ => true)
    val coldOk = (name: String) => coldSweep(name) >= 0
    val busy0 = busyJiffies(); val own0 = ownCpuNanos(); val wall0 = System.nanoTime()
    val timedSweeps = sweeps(runs, coldOk)
    val loadavgAfter = readLoadavg()

    // Co-tenant guard: steady external load inflates every sample
    // uniformly, which no within-query spread check can see (r6: four
    // queries read 3–7× their baselines under loadavg 3 and nothing
    // tripped). Average co-tenant cores over the timed window =
    // (box busy − our own cpu) / wall. If someone else held >1 core —
    // or the box was already loaded at process start (1-min load > 2,
    // when our own contribution is still ~0) — run a second full set of
    // sweeps and take medians over both: the contention now has to cover
    // 2× the wall time to corrupt the median, and the JSON records the
    // verdict + the measured co-tenant cores either way.
    def cotenantCores(): Double = {
      val busy1 = busyJiffies(); val own1 = ownCpuNanos()
      val wallSec = (System.nanoTime() - wall0) / 1e9
      if (busy0 < 0 || busy1 < 0 || own0 < 0 || own1 < 0 || wallSec <= 0) -1.0
      else {
        val busySec = (busy1 - busy0) / clkTck
        val ownSec = (own1 - own0) / 1e9
        math.max(0.0, (busySec - ownSec) / wallSec)
      }
    }
    val cotenant = cotenantCores()
    val guardReason = {
      val l0 = load1(loadavg)
      if (cotenant > cotenantMax) f"cotenant_cores=$cotenant%.2f>$cotenantMax%.2f"
      else if (l0 > 2.0) s"loadavg_start=$l0>2"
      else ""
    }
    // Re-wait, then re-sweep: a triggered guard means the first sweeps ran
    // against a neighbor — don't just double into the same contention,
    // wait it out first (the probe loop again), then take the extra
    // sweeps. The medians then span both sets.
    val extraSweeps =
      if (guardReason.nonEmpty) { val _ = waitForQuiet(); sweeps(runs, coldOk) }
      else Seq.empty
    val allSweeps = timedSweeps ++ extraSweeps

    // Per-query samples in sweep order; a query that failed in a sweep
    // contributes no sample from it.
    val firstPass = headline.map { name =>
      (name, coldSweep(name), allSweeps.map(_(name)).filter(_ >= 0))
    }
    // Within-query spread guard stays for single-query blips (a >5× max/min
    // spread means something stole the box mid-sample; r5: dedup_jaccard
    // sampled 2.1–27.3 s). Re-sample just those queries once and merge.
    val reran = firstPass.collect {
      case (name, _, ss) if ss.size >= 2 && ss.max / ss.min > 5.0 => name
    }
    val results = firstPass.map { case (name, cold, ss) =>
      val samples = if (reran.contains(name)) ss ++ Seq.fill(runs)(run(name)).filter(_ >= 0) else ss
      val warm = if (samples.isEmpty) -1.0 else median(samples)
      (name, cold, warm, samples)
    }
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
    // `load_guard` is the guard's verdict: empty reason = quiet box, no
    // extra sweeps; a reason means the medians span 2× the sweeps and the
    // recorded loadavgs explain why.
    val waitJson = {
      // `waits` are the separate quiet-box waits (pre-sweep, and the
      // post-guard re-wait if the guard tripped), each with its own
      // attempts budget; attempts are MEASURED co-tenant cores per failed
      // 5 s probe (not loadavg — the probe subtracts our own CPU).
      val ws = waits.map(_.json).mkString("[", ",", "]")
      s"""{"waits":$ws,""" +
        f""""cotenant_at_accept":$probeAtAccept%.2f,"loadavg_at_accept":${load1(loadavg)}}"""
    }
    val guardJson =
      f"""{"triggered":${guardReason.nonEmpty},"reason":"$guardReason","cotenant_max":$cotenantMax%.2f,"cotenant_cores":$cotenant%.2f,"sweeps":${allSweeps.size},"wait":$waitJson}"""
    // Two output lines (r13 verdict #1: the single giant samples-bearing
    // line got truncated mid-token by the driver's tail-capture window,
    // leaving the round's bench evidence unparseable). The bulky per-run
    // samples go FIRST; the compact medians-only summary — everything the
    // gate and the judge need — goes LAST, so any tail window that keeps
    // even ~2 KB of stdout keeps the parseable line. check_bench.py takes
    // the last line that parses with a "queries" key, which is this one.
    println(f"""{"metric":"samples","samples":$samplesJson,"runs":$runs,"sf":"$sfDir"}""")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"reran":$reranJson,"load_guard":$guardJson,"loadavg":"$loadavg","loadavg_after":"$loadavgAfter","cold_total":$coldTotal%.3f,"runs":$runs,"sf":"$sfDir"}"""
    )
    spark.stop()
    // Loud exit on any broken headline query — but only after the JSON line
    // is on stdout, so a driver that captures output regardless of status
    // still records the partial numbers alongside the failure.
    if (failed.nonEmpty) sys.exit(1)
  }
}
