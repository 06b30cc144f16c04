package graft

import org.apache.spark.sql.SparkSession

/** Session wiring shared by the driver-contract mains (Verify / Bench).
  *
  * Thirteen rounds of evidence ran in ONE JVM (`local[N]`), where shuffle
  * blocks never serialize across a process boundary, broadcasts never ship
  * over transport, and the registered codegen expressions never classload
  * in a remote executor — while the scale story claims "scale OUT". The
  * reference certifies its distribution story with a real 3-node test
  * (reference: internal/log/distributed_test.go:19-106,
  * internal/agent/agent_test.go:24-84); the Spark-side analog is
  * `local-cluster[workers,coresPerWorker,memPerWorkerMB]`, which forks real
  * executor JVMs behind the standalone scheduler. `SPARK_GRAFT_MASTER`
  * selects it without touching the default single-JVM path.
  *
  * Multi-JVM masters need the application classes shipped to executors:
  * the sbt classpath is invisible to a forked CoarseGrainedExecutorBackend,
  * so we put the packaged library jar on `spark.jars` (fetched by each
  * executor at launch and added to its classloader — the same mechanism a
  * real cluster submit uses). `SPARK_GRAFT_JARS` overrides the default
  * `target/scala-2.13/<artifact>.jar`.
  */
object GraftSession {

  /** The packaged library jar, if the build has produced one. Refuses a
    * STALE jar (older than the newest compiled class): under local-cluster
    * the forked executors run the jar while the driver runs sbt's fresh
    * classes, so a stale jar silently certifies old executor code.
    */
  def packagedJar(): Option[String] = {
    val dir = new java.io.File("target/scala-2.13")
    val jar = Option(dir.listFiles())
      .flatMap(_.find(f => f.getName.startsWith("proglogspark") && f.getName.endsWith(".jar")))
    jar.foreach { j =>
      def newestUnder(f: java.io.File): Long =
        if (f.isDirectory)
          Option(f.listFiles()).map(_.map(newestUnder).foldLeft(0L)(math.max)).getOrElse(0L)
        else f.lastModified()
      val classes = newestUnder(new java.io.File(dir, "classes"))
      if (classes > j.lastModified())
        throw new IllegalStateException(
          s"${j.getName} is STALE (classes compiled after it was packaged): " +
            "run `sbt package` before any multi-JVM master, or set SPARK_GRAFT_JARS"
        )
    }
    jar.map(_.getAbsolutePath)
  }

  /** Builder with master + executor-classpath wiring resolved from env.
    * `cpus` sizes `spark.sql.shuffle.partitions` (the single-JVM thread
    * count, or the cluster-wide core count for a local-cluster master).
    */
  def builder(cpus: String): SparkSession.Builder = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val b = SparkSession
      .builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Soak-scale legs run single-box with ~100 GB heaps; a full-GC pause
      // during a skewed task's spill can starve the executor heartbeat
      // thread past the default 120 s and the HeartbeatReceiver then
      // kills the whole context (measured at the zipf-1.5M winnow leg:
      // "no recent heartbeats: 328909 ms exceeds timeout 120000 ms").
      // Failure detection here guards nothing — there is no other node —
      // so trade detection latency for pause tolerance.
      .config("spark.network.timeout", "800s")
      .config("spark.executor.heartbeatInterval", "60s")
    if (master.startsWith("local-cluster")) {
      val jars = sys.env.get("SPARK_GRAFT_JARS").orElse(packagedJar())
      jars.fold(
        throw new IllegalStateException(
          "local-cluster master needs the packaged jar: run `sbt package` or set SPARK_GRAFT_JARS"
        )
      )(j => b.config("spark.jars", j))
      // Forked executors write shuffle/broadcast spill under java.io.tmpdir
      // by default; keep their heap dumps and work dirs out of /opt/spark
      // (read-only install) by routing local dirs to /tmp.
      b.config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp/graft-local"))
    }
    b
  }
}
