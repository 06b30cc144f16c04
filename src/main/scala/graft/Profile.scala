package graft

import org.apache.spark.scheduler._

/** Optimization-round measurement harness (guide §1): per-query stage
  * breakdown over the SAME session wiring as Bench. For each named query
  * (default: the Bench headline roster) it runs one cold pass, then one
  * instrumented warm pass with a SparkListener recording every stage's
  * wall span, executor run/CPU time, task count, and I/O volumes, plus the
  * job count — the fixed-overhead signal the sf0.1 bench is sensitive to.
  *
  * NOT part of the driver contract; a diagnostic main only. Output is a
  * human-readable table per query on stdout.
  */
object Profile {

  private case class StageRec(
      id: Int,
      name: String,
      tasks: Int,
      wallMs: Long,
      runMs: Long,
      cpuMs: Long,
      shufReadMB: Double,
      shufWriteMB: Double,
      inputMB: Double,
      spillMB: Double
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names: Seq[String] = if (args.nonEmpty) args.toSeq else Bench.headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config(
        "spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728")
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = scala.collection.mutable.Buffer.empty[StageRec]
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = { val _ = jobCount.incrementAndGet() }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val tm = si.taskMetrics
        stages.synchronized {
          stages += StageRec(
            si.stageId,
            si.name,
            si.numTasks,
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            tm.executorRunTime,
            tm.executorCpuTime / 1000000L,
            tm.shuffleReadMetrics.totalBytesRead / 1e6,
            tm.shuffleWriteMetrics.bytesWritten / 1e6,
            tm.inputMetrics.bytesRead / 1e6,
            tm.diskBytesSpilled / 1e6
          )
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // Same warmup as Bench.
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.queries("log_min_max")(spark, sfDir).collect()
    catch { case e: Throwable => System.err.println(s"[profile] warmup failed: ${e.getMessage}") }

    def run(name: String): Double = {
      val reuse = name == "vec_pca_reuse"
      val fn = SparkEntry.queries(if (reuse) "vec_pca" else name)
      if (reuse) spark.conf.set("spark.graft.pca.reuseScatter", "true")
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      if (reuse) spark.conf.set("spark.graft.pca.reuseScatter", "false")
      graft.queries.Checkpoints.release()
      w
    }

    for (name <- names) {
      val cold = run(name) // cold pass: planning + codegen, uninstrumented
      Thread.sleep(300)
      stages.synchronized(stages.clear())
      jobCount.set(0)
      val warm = run(name)
      Thread.sleep(700) // let listener-bus events drain
      val recs = stages.synchronized(stages.toList)
      val totRun = recs.map(_.runMs).sum
      val totCpu = recs.map(_.cpuMs).sum
      println(f"\n=== $name: warm=$warm%.3f s (cold=$cold%.3f) jobs=${jobCount.get()} stages=${recs.size} sumStageWall=${recs.map(_.wallMs).sum}%d ms sumRun=$totRun ms sumCpu=$totCpu ms ===")
      recs.sortBy(-_.wallMs).take(14).foreach { r =>
        println(
          f"  [${r.id}%4d] wall=${r.wallMs}%6d run=${r.runMs}%6d cpu=${r.cpuMs}%6d tasks=${r.tasks}%4d in=${r.inputMB}%8.2fMB sr=${r.shufReadMB}%8.3fMB sw=${r.shufWriteMB}%8.3fMB spill=${r.spillMB}%6.1fMB  ${r.name.take(90)}"
        )
      }
    }
    spark.stop()
  }
}
