package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-sep query names] — the optional filter
    // is a local-iteration aid; the driver always passes exactly two args.
    val sfDir = args(0)
    val outDir = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER selects a multi-JVM master (local-cluster[...])
    // for the cross-executor certification leg; default is local[cpus].
    val spark = GraftSession.builder(cpus)
      // Scan parallelism knob for soak runs whose tables are few large
      // files (a single 100 MB parquet = ONE input partition at the
      // 128 MB default — scans serialize no matter how many cores).
      .config(
        "spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728")
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Oracle dumps must be DETERMINISTIC: corpus_bitext_mine's auto mode
    // switches to k-means cells above 10k vectors, whose k-means|| init
    // can depend on partitioning despite the fixed seed — a hash compare
    // there would flake. Pin the label-cell path for every Verify dump
    // unless the caller explicitly chose a mode (the kmeans path's
    // recall contract is gated by BitextCellsSpec instead).
    if (sys.env.get("SPARK_GRAFT_BITEXT_CELLS").isEmpty
        && spark.conf.getOption("spark.graft.bitext.cells").isEmpty)
      spark.conf.set("spark.graft.bitext.cells", "label")
    new java.io.File(outDir).mkdirs()
    // Dump parallelism. Default: repartition(1) — one file per query for
    // the driver's compare. (repartition, not coalesce: coalesce is a
    // narrow dependency and would collapse the query's final stage to a
    // single task; the shuffle boundary keeps the computation parallel and
    // leaves only the parquet ENCODE on one task.) That one-task encode
    // dominates soak wall time on giant dumps (sf1 dedup_jaccard: 182M
    // rows ≈ 7 min), so SPARK_GRAFT_DUMP_PARTS lets the soak harness
    // write directly from tasks — "auto" keeps the query's own
    // partitioning, an integer repartitions to that many part files; the
    // checkers read every part either way (frame compare + multiset hash
    // both glob the dump dir).
    val dumpParts = sys.env.get("SPARK_GRAFT_DUMP_PARTS")
    // Failures must be visible in the artifact tree, not just on stderr:
    // in round 5 every events-family query threw at ANALYSIS time, so no
    // dump dir was created and the correctness gate silently dropped 16
    // rows instead of reporting 16 failures. An empty stub dir per failed
    // query makes the checker report NO-OUTPUT, and `_failures.json`
    // carries the exception text for diagnosis.
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val frame = fn(spark, sfDir)
        val shaped = dumpParts match {
          case None         => frame.repartition(1)
          case Some("auto") => frame
          case Some(n)      => frame.repartition(n.toInt)
        }
        shaped.write.mode("overwrite").parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        e.printStackTrace() // message-only hides the cause (e.g. an NPE)
        failures(name) = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(500)}"
        val stub = new java.io.File(s"$outDir/$name")
        if (!stub.exists()) stub.mkdirs() // empty dir => checker flags NO-OUTPUT
      }
      // Free any localCheckpoint blocks the builder materialized — 96
      // queries back-to-back would otherwise accumulate dead storage.
      finally graft.queries.Checkpoints.release()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val failJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_failures.json"), failJson)
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} FAILED: ${failures.keys.mkString(", ")}")
    spark.stop()
  }
}
