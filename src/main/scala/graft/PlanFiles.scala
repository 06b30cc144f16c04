package graft

import java.nio.file.{Files, Paths}

/** Writes full `.explain("formatted")` output for named queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the optimization-round plan
  * evidence (`plans/r15/<q>_before.txt` / `..._after.txt`).
  *
  * Usage: `runMain graft.PlanFiles <suffix> <query...>`; env
  * `SPARK_GRAFT_SF_DIR` picks the data dir (default sf0.1 — plans at the
  * gated bench SF), `SPARK_GRAFT_PLAN_TAG` the directory (default r15).
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanFiles <suffix> <query...>")
    val suffix = args.head
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r15")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(s"plans/$tag"))
    names.foreach { name =>
      val fn = SparkEntry.queries(if (name == "vec_pca_reuse") "vec_pca" else name)
      if (name == "vec_pca_reuse") spark.conf.set("spark.graft.pca.reuseScatter", "true")
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      if (name == "vec_pca_reuse") spark.conf.set("spark.graft.pca.reuseScatter", "false")
      graft.queries.Checkpoints.release()
      val p = Paths.get(s"plans/$tag/${name}_$suffix.txt")
      Files.write(p, plan.getBytes("UTF-8"))
      println(s"wrote $p")
    }
    spark.stop()
  }
}
