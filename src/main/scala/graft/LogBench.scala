package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.log.{LogConfig, SparkLog}

/** Micro-benchmarks for the commit-log core (BASELINE.md §self-defined):
  * append throughput (bulk + single-record), point-read latency, tail
  * visibility latency, full-scan rate. Run manually:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.LogBench"`.
  */
object LogBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("logbench").toString
    val log = SparkLog(spark, dir, LogConfig())

    // Source payloads: the events table's props JSON as bytes (sf0.1: 100k).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val payloads = spark.read
      .parquet(s"$sfDir/events.parquet")
      .select(col("props").cast("binary").as("value"))
      .cache()
    val n = payloads.count()

    // 1. bulk append throughput (the distributed ingest path)
    val t0 = System.nanoTime()
    val (_, appended) = log.appendDF(payloads)
    val bulkSec = (System.nanoTime() - t0) / 1e9
    println(f"bulk_append: $appended%d records in $bulkSec%.2f s = ${appended / bulkSec}%.0f rec/s")

    // 1b. DSv2 sink throughput (stage + rewrite, no count pass)
    val sinkDir = java.nio.file.Files.createTempDirectory("logbench-sink").toString + "/log"
    val ts = System.nanoTime()
    payloads.write.format("graft").mode("append").save(sinkDir)
    val sinkSec = (System.nanoTime() - ts) / 1e9
    println(f"sink_append: $n%d records in $sinkSec%.2f s = ${n / sinkSec}%.0f rec/s")

    // 2. single-record append latency (driver commit path, 50 iterations)
    val t1 = System.nanoTime()
    val iters = 50
    (0 until iters).foreach(i => log.appendOne(s"single-$i".getBytes))
    val singleSec = (System.nanoTime() - t1) / 1e9
    println(f"single_append: $iters in $singleSec%.2f s = ${singleSec / iters * 1000}%.1f ms/record")

    // 3. point-read latency (steady state: 10 warm-up reads amortize JIT +
    //    footer-cache fill, then 100 timed reads over varied offsets/pages)
    (0 until 10).foreach(i => log.read((i * 131L) % n))
    val t2 = System.nanoTime()
    val reads = 100
    (0 until reads).foreach(i => log.read((i * 997L) % n))
    val readSec = (System.nanoTime() - t2) / 1e9
    println(f"point_read: $reads in $readSec%.2f s = ${readSec / reads * 1000}%.1f ms/read")

    // 4. tail visibility: append→visible in a running memory-sink stream
    val q = log
      .tail(from = log.highestOffset + 1)
      .writeStream
      .format("memory")
      .queryName("tail_bench")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    val t3 = System.nanoTime()
    log.append(Seq("tail-probe".getBytes))
    q.processAllAvailable()
    val tailSec = (System.nanoTime() - t3) / 1e9
    val seen = spark.sql("select count(*) from tail_bench").as[Long].head()
    println(f"tail_visibility: $tailSec%.2f s (records seen: $seen)")
    q.stop()

    // 5. full-scan rate (count/min/max over the whole log)
    val t4 = System.nanoTime()
    val row = log.toDF.agg(count(lit(1)), min(col("offset")), max(col("offset"))).head()
    val scanSec = (System.nanoTime() - t4) / 1e9
    println(
      f"full_scan: ${row.getLong(0)}%d rows in $scanSec%.2f s = ${row.getLong(0) / scanSec}%.0f rows/s"
    )

    log.remove()
    spark.stop()
  }
}
