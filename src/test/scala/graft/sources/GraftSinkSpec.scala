package graft.sources

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.log.{LogManifest, SparkLog}

class GraftSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def valuesDf(from: Int, until: Int) = {
    val session = spark
    import session.implicits._
    (from until until).map(i => s"rec-$i").toDF("s").select(col("s").cast("binary").as("value"))
  }

  private def readStrings(dir: String): Seq[(Long, String)] =
    spark.read
      .format("graft")
      .load(dir)
      .select(col("offset"), col("value").cast("string"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
      .toSeq

  test("batch write creates the log and assigns contiguous offsets from 0") {
    val dir = TestSpark.tempDir("gsink") + "/fresh"
    valuesDf(0, 100).write.format("graft").mode("append").save(dir)
    val rows = readStrings(dir)
    // Offset assignment follows the partition layout (ordered local slices
    // here), so record↔offset mapping is exact, not just contiguous.
    assert(rows.map(_._1) == (0L until 100L))
    assert(rows == (0 until 100).map(i => (i.toLong, s"rec-$i")))
    // no staging debris
    val stray = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("_sink-stage-"))
    assert(stray.isEmpty)
  }

  test("a second batch write appends after the existing tail in partition order") {
    val dir = TestSpark.tempDir("gsink") + "/appends"
    valuesDf(0, 10).write.format("graft").mode("append").save(dir)
    valuesDf(10, 25).write.format("graft").mode("append").save(dir)
    val rows = readStrings(dir)
    assert(rows == (0 until 25).map(i => (i.toLong, s"rec-$i")))
  }

  test("a multi-partition shuffled write stays contiguous and keeps every record") {
    val dir = TestSpark.tempDir("gsink") + "/shuffled"
    valuesDf(0, 200).repartition(7).write.format("graft").mode("append").save(dir)
    val rows = readStrings(dir)
    assert(rows.map(_._1) == (0L until 200L))
    assert(rows.map(_._2).toSet == (0 until 200).map(i => s"rec-$i").toSet)
  }

  test("mode overwrite clears the log and restarts offsets at zero") {
    val dir = TestSpark.tempDir("gsink") + "/ovw"
    valuesDf(0, 20).write.format("graft").mode("append").save(dir)
    assert(readStrings(dir).size == 20)
    valuesDf(100, 105).write.format("graft").mode("overwrite").save(dir)
    val rows = readStrings(dir)
    assert(rows == (0 until 5).map(i => (i.toLong, s"rec-${100 + i}")))
    // The cleared log is a normal log: appends continue after the new tail.
    valuesDf(105, 107).write.format("graft").mode("append").save(dir)
    assert(readStrings(dir).map(_._1) == (0L until 7L))
  }

  test("staging sweeps are fencing-scoped: foreign roots survive until a writer claims") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = TestSpark.tempDir("gsink")
    val dir = root + "/sweep"
    valuesDf(0, 2).write.format("graft").mode("append").save(dir)
    // Plant a "foreign" staging root (another writer's in-flight work).
    val foreign = new java.io.File(dir, "_sink-stage-foreign")
    foreign.mkdirs()
    new java.io.File(foreign, "stage-x.parquet").createNewFile()

    val input = MemoryStream[String]
    val q = input.toDF().select(col("value").cast("binary").as("value"))
      .writeStream.format("graft")
      .option("path", dir).option("checkpointLocation", root + "/sweep-ckpt")
      .start()
    try {
      // Query START (planning/construction) must not touch the foreign
      // root — only this query's own root is reset pre-claim.
      q.processAllAvailable() // empty batch: no commit data, but query is live
      assert(foreign.exists(), "pre-claim sweep deleted a foreign staging root")
      // First data commit claims the log; from then on the foreign root's
      // owner is provably fenced and the debris is swept.
      input.addData("a")
      q.processAllAvailable()
      assert(readStrings(dir).map(_._2).last == "a")
      assert(!foreign.exists(), "post-claim sweep should clear fenced writers' debris")
    } finally q.stop()
  }

  test("batch write round-trips null payloads") {
    val session = spark
    import session.implicits._
    val dir = TestSpark.tempDir("gsink") + "/nulls"
    Seq(Some("a"), None, Some("b"))
      .toDF("s")
      .select(col("s").cast("binary").as("value"))
      .write.format("graft").mode("append").save(dir)
    val rows = spark.read.format("graft").load(dir)
      .select(col("offset"), col("value").cast("string")).collect().sortBy(_.getLong(0))
    assert(rows.length == 3)
    assert(rows.count(_.isNullAt(1)) == 1)
  }

  test("the sink rejects schemas other than (value BINARY)") {
    val session = spark
    import session.implicits._
    val dir = TestSpark.tempDir("gsink") + "/badschema"
    val e = intercept[Exception] {
      Seq((1L, "x")).toDF("offset", "value").write.format("graft").mode("append").save(dir)
    }
    assert(e.getMessage.contains("graft sink requires schema (value BINARY)"))
  }

  test("streaming sink delivers exactly-once across restart with a shared checkpoint") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = TestSpark.tempDir("gsink")
    val dir = root + "/stream"
    val ckpt = root + "/ckpt"

    val input = MemoryStream[String]
    input.addData("a", "b", "c")
    def start() = input
      .toDF()
      .select(col("value").cast("binary").as("value"))
      .writeStream
      .format("graft")
      .option("path", dir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()

    val q1 = start(); q1.awaitTermination(30000); q1.stop()
    assert(readStrings(dir).map(_._2).sorted == Seq("a", "b", "c"))

    // Restart on the same checkpoint: already-committed batches replay as
    // token no-ops; only the new data lands.
    input.addData("d", "e")
    val q2 = start(); q2.awaitTermination(30000); q2.stop()
    val rows = readStrings(dir)
    assert(rows.map(_._1) == (0L until 5L), s"offsets not contiguous: $rows")
    assert(rows.map(_._2).sorted == Seq("a", "b", "c", "d", "e"))

    // The idempotence token is recorded in the manifest under the queryId.
    val m = LogManifest.read(dir).get
    assert(m.tokens.keys.exists(_.startsWith("sink-")), s"tokens: ${m.tokens}")
  }

  test("a replayed epoch is a no-op (direct token check)") {
    val dir = TestSpark.tempDir("gsink") + "/replay"
    valuesDf(0, 5).write.format("graft").mode("append").save(dir)
    val log = SparkLog(spark, dir)
    val (base1, n1) = log.appendDF(valuesDf(5, 8), Some(("sink-q", 0L)))
    assert(base1 == 5L && n1 == 3L)
    // Same epoch again — the exact crash-replay path commit() exercises.
    val (base2, n2) = log.appendDF(valuesDf(5, 8), Some(("sink-q", 0L)))
    assert(n2 == 0L, s"replayed epoch appended $n2 rows at $base2")
    assert(readStrings(dir).map(_._1) == (0L until 8L))
  }

  test("log-to-log replication is pure DSv2 composition: graft source -> graft sink") {
    val root = TestSpark.tempDir("gsink")
    val src = root + "/peer"; val dst = root + "/replica"; val ckpt = root + "/ckpt"
    val peer = SparkLog(spark, src)
    peer.append((0 until 7).map(i => s"p-$i".getBytes))

    def drain(): Unit = {
      val q = spark.readStream.format("graft").load(src)
        .select(col("value"))
        .writeStream.format("graft")
        .option("path", dst).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(30000); q.stop()
    }
    drain()
    assert(readStrings(dst).map(_._2) == (0 until 7).map(i => s"p-$i"))

    // Incremental: the offset cursor resumes from the checkpoint; only the
    // delta crosses, exactly once.
    peer.append(Seq("p-7".getBytes, "p-8".getBytes))
    drain()
    val rows = readStrings(dst)
    assert(rows.map(_._1) == (0L until 9L))
    assert(rows.map(_._2) == (0 until 9).map(i => s"p-$i"))
  }

  test("sink writes interleave with driver-side appends, offsets stay contiguous") {
    val dir = TestSpark.tempDir("gsink") + "/interleave"
    val log = SparkLog(spark, dir)
    log.append(Seq("a0".getBytes, "a1".getBytes)) // unsealed tail segment
    valuesDf(0, 10).write.format("graft").mode("append").save(dir)
    // The sink's commit reconciles through a fresh SparkLog; this handle
    // predates it — reopen to observe the post-sink manifest.
    val log2 = SparkLog(spark, dir)
    log2.append(Seq("a2".getBytes))
    val rows = readStrings(dir)
    assert(rows.map(_._1) == (0L until 13L), s"offsets: ${rows.map(_._1)}")
    assert(rows.head._2 == "a0" && rows.last._2 == "a2")
    assert(log2.read(5L).value sameElements "rec-3".getBytes)
  }

  test("write options carry the log config (part roll at maxRecordsPerSegment)") {
    val dir = TestSpark.tempDir("gsink") + "/cfg"
    valuesDf(0, 100)
      .coalesce(1)
      .write.format("graft")
      .option("maxRecordsPerSegment", "10")
      .mode("append").save(dir)
    val segs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("segment="))
    assert(segs.length == 1)
    val parts = segs.head.listFiles().map(_.getName).filter(_.endsWith(".parquet"))
    assert(parts.length == 10, s"expected 10 rolled parts, got ${parts.toSeq}")
    assert(readStrings(dir).map(_._1) == (0L until 100L))
  }

  test("a re-attempted rewrite task cannot duplicate or tear parts") {
    val root = TestSpark.tempDir("gsink")
    val staged = root + "/staged.parquet"
    val out = root + "/out"
    new java.io.File(out).mkdirs()
    val w = new graft.log.StagedParquet.ValueWriter(staged)
    (0 until 25).foreach(i => w.write(s"v-$i".getBytes))
    w.close()
    // First attempt lands parts 0..4; the "retry" (same args) must leave
    // the exact same file set behind — no duplicates, no inflight debris.
    graft.log.StagedParquet.rewriteToParts(staged, out, 100L, maxRecordsPerPart = 5)
    val first = new java.io.File(out).listFiles().map(_.getName).sorted
    graft.log.StagedParquet.rewriteToParts(staged, out, 100L, maxRecordsPerPart = 5)
    val second = new java.io.File(out).listFiles().map(_.getName).sorted
    assert(first.toSeq == second.toSeq, s"retry changed the file set: $first vs $second")
    assert(first.length == 5 && first.forall(_.endsWith(".parquet")))
    assert(!first.exists(_.startsWith("inflight-")))
  }

  test("autoCompactSegments keeps a per-epoch-segment log bounded") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = TestSpark.tempDir("gsink")
    val dir = root + "/compact"; val ckpt = root + "/cckpt"
    val input = MemoryStream[String]
    def drainOne(): Unit = {
      val q = input
        .toDF()
        .select(col("value").cast("binary").as("value"))
        .writeStream
        .format("graft")
        .option("path", dir)
        .option("checkpointLocation", ckpt)
        .option("autoCompactSegments", "4")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(30000); q.stop()
    }
    // 10 one-record epochs; without compaction that is 10 segments.
    (0 until 10).foreach { i => input.addData(s"e-$i"); drainOne() }
    val log = SparkLog(spark, dir)
    assert(log.segmentCount < 10, s"auto-compact never ran: ${log.segmentCount} segments")
    val rows = readStrings(dir)
    assert(rows.map(_._1) == (0L until 10L))
    assert(rows.map(_._2).sorted == (0 until 10).map(i => s"e-$i").sorted)
  }

  test("the sink works over a scheme:// (Hadoop FS) log dir end to end") {
    // Same code path a cluster takes for hdfs:// or s3a:// — staged
    // writes, the rewrite job, publish renames, and the manifest protocol
    // all route through HadoopLogFs instead of plain NIO.
    val dir = "file://" + TestSpark.tempDir("gsink-hfs") + "/log"
    valuesDf(0, 30).write.format("graft").mode("append").save(dir)
    valuesDf(30, 40).write.format("graft").mode("append").save(dir)
    val rows = spark.read.format("graft").load(dir)
      .select(col("offset"), col("value").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows == (0 until 40).map(i => (i.toLong, s"rec-$i")))
    val log = SparkLog(spark, dir)
    assert(new String(log.read(35L).value) == "rec-35")
  }

  test("a vanished staged file fails the commit loudly and leaves the log untouched") {
    val dir = TestSpark.tempDir("gsink") + "/lost"
    valuesDf(0, 5).write.format("graft").mode("append").save(dir)
    val log = SparkLog(spark, dir)
    val before = log.highestOffset
    intercept[Exception] {
      log.appendStaged(Seq((dir + "/никогда.parquet", 3L)), Some(("sink-x", 0L)))
    }
    val reopened = SparkLog(spark, dir)
    assert(reopened.highestOffset == before, "failed commit moved the log tail")
    assert(readStrings(dir).size == 5)
    // The failed epoch's token must NOT be recorded — a retry must re-run.
    assert(!graft.log.LogManifest.read(dir).get.tokens.contains("sink-x"))
  }

  test("commitToken records empty epochs monotonically") {
    val dir = TestSpark.tempDir("gsink") + "/token"
    val log = SparkLog(spark, dir)
    log.commitToken("sink-q", 3L)
    assert(LogManifest.read(dir).get.tokens("sink-q") == 3L)
    log.commitToken("sink-q", 2L) // stale — must not regress
    assert(LogManifest.read(dir).get.tokens("sink-q") == 3L)
    log.commitToken("sink-q", 7L)
    assert(LogManifest.read(dir).get.tokens("sink-q") == 7L)
  }
}
