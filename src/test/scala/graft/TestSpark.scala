package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      // local[threads, maxTaskFailures]: plain local[4] treats the FIRST
      // task failure as fatal, which would make the task-retry fault
      // injection (TaskRetrySpec) impossible — 3 attempts lets an
      // injected attempt-0 failure retry the way a real cluster would.
      .master("local[4,3]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // Object-store semantics shim (ObjectStoreFileSystem): rename is a
      // non-atomic copy+delete that OVERWRITES, with injectable crash
      // points — the `s3a://`-shaped adversary HadoopFsLogSpec/FencingSpec
      // drive the metadata protocol against.
      .config("spark.hadoop.fs.objstore.impl", "graft.log.ObjectStoreFileSystem")
      .config(
        "spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString
      )
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
