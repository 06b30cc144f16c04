package graft.log

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The same log lifecycle, but with the data directory addressed as a
  * `file://` URI — every byte of I/O then routes through [[HadoopLogFs]]
  * (Hadoop `FileSystem` + parquet `HadoopInputFile`/`HadoopOutputFile` +
  * the versioned metadata protocol) instead of the plain-NIO fast path.
  * This is the exact code path an `hdfs://` or `s3a://` log directory
  * takes on a cluster; `file://` is the Hadoop filesystem we can exercise
  * hermetically.
  */
class HadoopFsLogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def uriDir(tag: String): String = "file://" + TestSpark.tempDir(tag)

  private def tinyConfig = LogConfig(maxStoreBytes = 32, maxRecordsPerSegment = 1024)

  test("scheme detection picks the Hadoop implementation") {
    assert(LogFs.forPath("file:///tmp/x") eq HadoopLogFs)
    assert(LogFs.forPath("file:/tmp/x") eq HadoopLogFs) // Hadoop-normalized form
    assert(LogFs.forPath("hdfs://nn:8020/logs/a") eq HadoopLogFs)
    assert(LogFs.forPath("s3a://bucket/logs/a") eq HadoopLogFs)
    assert(LogFs.forPath("/tmp/x") eq NioLogFs)
    assert(LogFs.forPath("relative/dir") eq NioLogFs)
  }

  test("append/read round-trip over file:// with segment rolling") {
    val dir = uriDir("hfs-rt")
    val log = SparkLog(spark, dir, tinyConfig)
    val first = log.append((0 until 5).map(i => s"record-$i".getBytes))
    assert(first == 0)
    assert(log.segmentCount > 1) // 32-byte threshold forces rolling
    (0 until 5).foreach { i =>
      assert(new String(log.read(i.toLong).value) == s"record-$i")
    }
    intercept[OffsetOutOfRangeException](log.read(5))
  }

  test("metadata publishes via the versioned protocol (no rename-over)") {
    val local = TestSpark.tempDir("hfs-meta")
    val dir = "file://" + local
    val log = SparkLog(spark, dir, tinyConfig)
    log.appendOne("a".getBytes)
    log.appendOne("b".getBytes)
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(local))
    val names =
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala.map(_.getFileName.toString).toVector
      } finally listing.close()
    val versions = names.filter(_.startsWith("_manifest.json.v"))
    // Superseded versions are pruned: exactly one survives.
    assert(versions.size == 1, s"expected one manifest version, got: $names")
    assert(!names.contains("_manifest.json")) // never writes the legacy name
  }

  test("appendDF bulk path + toDF + DSv2 graft scan over file://") {
    val dir = uriDir("hfs-bulk")
    val log = SparkLog(spark, dir)
    import spark.implicits._
    val df = (0 until 500).map(i => s"bulk-$i".getBytes).toDF("value")
    val (base, n) = log.appendDF(df)
    assert(base == 0L && n == 500L)
    assert(log.toDF.count() == 500L)

    // DSv2 source with offset pushdown against the URI directory.
    val scan = spark.read.format("graft").load(dir)
    assert(scan.filter(org.apache.spark.sql.functions.col("offset") === 123L).count() == 1L)
    assert(scan.count() == 500L)

    // Driver-side point read through HadoopInputFile.
    assert(new String(log.read(321L).value) == "bulk-321")
  }

  test("reopen recovery and manifest-less recovery over file://") {
    val local = TestSpark.tempDir("hfs-recover")
    val dir = "file://" + local
    val log = SparkLog(spark, dir, tinyConfig)
    (0 until 4).foreach(i => log.appendOne(s"v$i".getBytes))

    val reopened = SparkLog(spark, dir, tinyConfig)
    assert(reopened.lowestOffset == 0)
    assert(reopened.highestOffset == 3)

    // Delete every manifest version: recovery rebuilds from segment dirs.
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(local))
    try {
      listing.iterator().forEachRemaining { p =>
        if (p.getFileName.toString.startsWith("_manifest.json"))
          java.nio.file.Files.delete(p)
      }
    } finally listing.close()
    val recovered = SparkLog(spark, dir, tinyConfig)
    assert(recovered.highestOffset == 3)
    assert(new String(recovered.read(3).value) == "v3")
    assert(recovered.appendOne("v4".getBytes) == 4)
  }

  test("truncate and compact over file://") {
    val dir = uriDir("hfs-compact")
    val log = SparkLog(spark, dir, tinyConfig)
    (0 until 8).foreach(i => log.appendOne(s"rec-$i".getBytes))
    val before = log.segmentCount
    assert(before > 2)

    log.compact(targetBytes = Long.MaxValue)
    assert(log.segmentCount < before)
    (0 until 8).foreach(i => assert(new String(log.read(i.toLong).value) == s"rec-$i"))

    log.truncate(3)
    assert(log.lowestOffset <= 4) // segment-granular: survivors may start earlier
    assert(log.highestOffset == 7)
  }

  test("backend migration round-trips preserve manifest state and tokens") {
    val local = TestSpark.tempDir("hfs-migrate")
    val session = spark
    import session.implicits._

    // NIO phase: data plus an idempotence token in the manifest.
    val nio1 = SparkLog(spark, local)
    nio1.appendDF(Seq("a", "b").map(_.getBytes).toDF("value"), Some("src" -> 5L))

    // Hadoop phase: same dir as file:// — token visible, and the token
    // ADVANCES in this phase (the regression shape: a later phase must
    // never resurrect an older epoch from a stale representation).
    val had = SparkLog(spark, "file://" + local)
    assert(had.currentManifest.tokens.get("src").contains(5L))
    had.appendDF(Seq("c").map(_.getBytes).toDF("value"), Some("src" -> 6L))

    // Back to the plain path: newest (versioned) manifest wins, token 6
    // intact; advance again through NIO.
    val nio2 = SparkLog(spark, local)
    assert(nio2.highestOffset == 2, "NIO reopen missed the Hadoop-written manifest")
    assert(nio2.currentManifest.tokens.get("src").contains(6L), "token lost in migration")
    nio2.appendDF(Seq("d").map(_.getBytes).toDF("value"), Some("src" -> 7L))

    // Hadoop once more: must see token 7 (both backends share ONE
    // monotonic version sequence — no cross-backend staleness), and the
    // exactly-once guard must still reject the replayed epoch.
    val had2 = SparkLog(spark, "file://" + local)
    assert(had2.highestOffset == 3, "Hadoop reopen read a stale versioned manifest")
    assert(had2.currentManifest.tokens.get("src").contains(7L), "stale token resurrected")
    val (_, n) = had2.appendDF(Seq("d-again").map(_.getBytes).toDF("value"), Some("src" -> 7L))
    assert(n == 0L, "replayed epoch was re-applied after migration")
    assert(new String(had2.read(3).value) == "d")
  }

  test("streaming tail over file:// (manifest-cursor micro-batches)") {
    val dir = uriDir("hfs-tail")
    val log = SparkLog(spark, dir)
    log.append((0 until 3).map(i => s"s-$i".getBytes))
    val q = log
      .tail()
      .writeStream
      .format("memory")
      .queryName("hfs_tail")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("hfs_tail").count() == 3)
      log.append(Seq("s-3".getBytes))
      q.processAllAvailable()
      assert(spark.table("hfs_tail").count() == 4)
    } finally q.stop()
  }
}
