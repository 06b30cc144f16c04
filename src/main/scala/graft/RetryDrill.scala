package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cross-process task-retry fault drill on the exactly-once write paths —
  * the multi-JVM twin of TaskRetrySpec: every write stage's attempt 0
  * throws (marker files on the shared local FS record each attempt, since
  * executor statics don't come back across process boundaries), the
  * standalone scheduler retries in a REAL forked executor, and the
  * committed state must be byte-identical to a clean run.
  *
  * `spark.speculation` is ON with aggressive thresholds, which exercises
  * the speculation scheduler against these stages — but note the measured
  * limitation (r14): Spark's TaskSetManager refuses to run a speculative
  * copy on the same HOST as the original, so on a single box (local or
  * local-cluster) a true duplicate-attempt RACE never launches. That race
  * is drilled at the DSv2 API level instead (TaskRetrySpec's
  * "duplicate attempts of one partition" case: two DataWriters for the
  * same partition both write + commit; publish is message-driven, so the
  * loser's staged file is ignored and swept).
  *
  * Input layout is deliberately SHUFFLE-FREE (spark.range slices): the
  * record↔offset mapping is only deterministic up to reduce-side fetch
  * order when a shuffle feeds the write (measured: two CLEAN
  * repartition(8) appendDF runs map offsets differently across executor
  * JVMs), so byte-identical assertions need a deterministic layout —
  * shuffled writes keep contiguity + multiset instead (GraftSinkSpec).
  *
  * Exits non-zero on any divergence. Wired into round_gate --soak.
  */
object RetryDrill {

  /** Identity on the value; attempt 0 of every task throws after leaving
    * a `<stage>-<partition>-<attempt>` marker file.
    */
  private def flaky(markerDir: String): String => String = { s =>
    val tc = TaskContext.get()
    if (tc != null) {
      val mark = new java.io.File(markerDir, s"${tc.stageId()}-${tc.partitionId()}-${tc.attemptNumber()}")
      val _ = mark.createNewFile()
      if (tc.attemptNumber() == 0)
        throw new RuntimeException(s"injected task failure (attempt 0, part ${tc.partitionId()})")
    }
    s
  }

  def main(args: Array[String]): Unit = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,4,4096]")
    val jar = sys.env
      .get("SPARK_GRAFT_JARS")
      .orElse(GraftSession.packagedJar())
      .getOrElse(sys.error("RetryDrill needs the packaged jar: run `sbt package` first"))
    val spark = SparkSession
      .builder()
      .master(master)
      .config("spark.jars", jar)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/tmp/graft-local")
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "100ms")
      .config("spark.speculation.multiplier", "1.5")
      .config("spark.speculation.quantile", "0.5")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("retry-drill").toString
    var failed = 0
    def check(name: String)(cond: Boolean, detail: => String): Unit =
      if (cond) println(s"[retry-drill] ok $name")
      else { failed += 1; System.err.println(s"[retry-drill] FAIL $name: $detail") }

    def markers(dir: String): Seq[String] =
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty).map(_.getName).toSeq
    def retriedRan(dir: String): Boolean =
      markers(dir).exists(_.split("-").last.toInt > 0)

    // Shuffle-free deterministic layout: 8 range slices, no exchange.
    def values(n: Int, parts: Int, fn: String => String) =
      spark
        .range(0, n, 1, parts)
        .select(udf(fn).apply(format_string("rec-%d", col("id"))).cast("binary").as("value"))

    // --- leg 1: appendDF under cross-JVM attempt-0 failures ---
    locally {
      val markerDir = s"$base/markers-appenddf"
      new java.io.File(markerDir).mkdirs()
      val log = graft.log.SparkLog(spark, s"$base/log-flaky", graft.log.LogConfig())
      log.appendDF(values(400, 8, flaky(markerDir)), Some(("retry-drill", 1L)))
      val clean = graft.log.SparkLog(spark, s"$base/log-clean", graft.log.LogConfig())
      clean.appendDF(values(400, 8, identity), Some(("retry-drill", 1L)))
      def dump(l: graft.log.SparkLog) =
        l.toDF.select(col("offset"), col("value").cast("string"))
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      check("appendDF retried attempts ran in remote executors")(
        retriedRan(markerDir),
        s"no attempt>0 marker in ${markers(markerDir).sorted}"
      )
      val (a, b) = (dump(log), dump(clean))
      check("appendDF committed state byte-identical to clean run")(
        a == b,
        s"sizes ${a.size}/${b.size}; first diff: ${a.zip(b).find(p => p._1 != p._2)}"
      )
      val (_, n2) = log.appendDF(values(400, 8, identity), Some(("retry-drill", 1L)))
      check("appendDF idempotence token survived retries")(n2 == 0L, s"re-appended $n2 rows")
    }

    // --- leg 2: DSv2 graft sink under cross-JVM attempt-0 failures ---
    locally {
      val markerDir = s"$base/markers-sink"
      new java.io.File(markerDir).mkdirs()
      values(300, 8, flaky(markerDir)).write.format("graft").mode("append").save(s"$base/sink-flaky")
      values(300, 8, identity).write.format("graft").mode("append").save(s"$base/sink-clean")
      def read(d: String) =
        spark.read.format("graft").load(d)
          .select(col("offset"), col("value").cast("string"))
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      check("sink retried attempts ran in remote executors")(
        retriedRan(markerDir),
        s"no attempt>0 marker in ${markers(markerDir).sorted}"
      )
      val (a, b) = (read(s"$base/sink-flaky"), read(s"$base/sink-clean"))
      check("sink committed state byte-identical to clean run")(
        a == b,
        s"sizes ${a.size}/${b.size}; first diff: ${a.zip(b).find(p => p._1 != p._2)}"
      )
      val stray = Option(new java.io.File(s"$base/sink-flaky").listFiles())
        .getOrElse(Array.empty).map(_.getName)
        .filter(n => n.startsWith("_sink-stage-") || n.startsWith("inflight-"))
      check("sink leaves no staging debris")(stray.isEmpty, stray.mkString(","))
    }

    spark.stop()
    if (failed > 0) sys.exit(1)
    println("[retry-drill] all green")
  }
}
