package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.log.{LogConfig, SparkLog}

class GraftSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def newLog(n: Int): SparkLog = {
    val log = SparkLog(spark, TestSpark.tempDir("gsrc"), LogConfig(maxStoreBytes = 96))
    log.append((0 until n).map(i => s"rec-$i".getBytes))
    log
  }

  test("batch read returns the full log") {
    val log = newLog(12)
    val df = spark.read.format("graft").load(log.dir)
    assert(df.count() == 12)
    val r = df.filter(col("offset") === 7).select(col("value").cast("string")).head()
    assert(r.getString(0) == "rec-7")
    assert(df.schema.fieldNames.toSeq == Seq("value", "offset", "term", "recordType"))
  }

  test("offset predicates prune partitions (pushdown reaches planning)") {
    val log = newLog(20) // 96-byte cap → several part files
    val all = spark.read.format("graft").load(log.dir)
    val point = all.filter(col("offset") === 10)
    // one part file covers offset 10 → exactly one planned input partition
    assert(point.rdd.getNumPartitions == 1)
    assert(all.rdd.getNumPartitions > 1)
    assert(point.select(col("value").cast("string")).head().getString(0) == "rec-10")
    // range scan
    val range = all.filter(col("offset") >= 5 && col("offset") < 9)
    assert(range.select("offset").collect().map(_.getLong(0)).sorted.toSeq == Seq(5L, 6L, 7L, 8L))
  }

  test("count/min/max push down to the manifest (zero file I/O)") {
    val log = newLog(20) // several part files under the 96-byte cap
    val df = spark.read.format("graft").load(log.dir)
      .agg(count(lit(1)).as("n"), min(col("offset")).as("mn"), max(col("offset")).as("mx"))
    // The aggregate scan answers from the manifest: its plan carries the
    // pushed-aggregate marker and plans ONE metadata partition instead of
    // per-file readers.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftAggScan"), s"aggregate not pushed:\n$plan")
    val r = df.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((20L, 0L, 19L)))

    // Pushed offset predicates narrow the window the manifest answers for.
    val bounded = spark.read.format("graft").load(log.dir)
      .filter(col("offset") >= 5 && col("offset") <= 11)
      .agg(count(lit(1)), min(col("offset")), max(col("offset")))
    val rb = bounded.head()
    assert((rb.getLong(0), rb.getLong(1), rb.getLong(2)) == ((7L, 5L, 11L)))
    assert(bounded.queryExecution.executedPlan.toString.contains("GraftAggScan"))

    // After truncate the manifest window moves — metadata answer tracks it.
    log.truncate(10)
    val rt = spark.read.format("graft").load(log.dir)
      .agg(count(lit(1)), min(col("offset")), max(col("offset"))).head()
    assert(rt.getLong(0) < 20L && rt.getLong(1) > 0L && rt.getLong(2) == 19L)
  }

  test("scans and pushed aggregates agree when uncommitted parts linger past the manifest") {
    // Simulate a crashed append: a published part carrying offsets past the
    // manifest's committed high-water sits in the segment dir. Every scan
    // shape must ignore it (committed-read semantics), or count(*) via the
    // manifest and count(value) via the files would durably disagree.
    val log = newLog(10)
    val segDir = log.dir + "/segment=0"
    val orphanSrc = graft.TestSpark.tempDir("orphan") + "/staged.parquet"
    val w = new graft.log.StagedParquet.ValueWriter(orphanSrc)
    (0 until 5).foreach(i => w.write(s"orphan-$i".getBytes))
    w.close()
    graft.log.StagedParquet.rewriteToParts(orphanSrc, segDir, start = 10L, maxRecordsPerPart = 100)
    val df = spark.read.format("graft").load(log.dir)
    assert(df.count() == 10L) // pushed-down count: manifest
    assert(df.agg(count(col("value"))).head().getLong(0) == 10L) // file scan
    assert(df.select("offset").collect().map(_.getLong(0)).max == 9L)
  }

  test("reported per-partition offset ordering elides sortWithinPartitions") {
    val log = newLog(15)
    val sorted = spark.read.format("graft").load(log.dir).sortWithinPartitions("offset")
    val plan = sorted.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort ["), s"per-partition sort not elided:\n$plan")
    // And the claim is true: each partition's offsets really ascend.
    val perPartition = sorted.select("offset").rdd
      .mapPartitions(it => Iterator(it.map(_.getLong(0)).toSeq))
      .collect()
    perPartition.foreach(s => assert(s == s.sorted, s"partition out of order: $s"))
  }

  test("_segment/_part metadata columns name what actually served each record") {
    val log = newLog(20) // 96-byte cap → multiple segments and parts
    spark.sql(s"CREATE TABLE graft_meta USING graft OPTIONS (path '${log.dir}')")
    try {
      val rows = spark
        .sql("SELECT offset, _segment, _part FROM graft_meta ORDER BY offset")
        .collect()
      assert(rows.length == 20)
      // Each record's reported segment is the one whose dir holds it.
      rows.foreach { r =>
        val (off, seg, part) = (r.getLong(0), r.getLong(1), r.getString(2))
        assert(seg >= 0 && off >= seg, s"offset $off reported segment $seg")
        assert(part.endsWith(".parquet"))
        assert(new java.io.File(s"${log.dir}/segment=$seg/$part").exists())
      }
      assert(rows.map(_.getLong(1)).distinct.length > 1, "expected several segments")
      // Metadata stays hidden from SELECT *.
      assert(spark.sql("SELECT * FROM graft_meta").schema.fieldNames.toSeq ==
        Seq("value", "offset", "term", "recordType"))
    } finally spark.sql("DROP TABLE graft_meta")
  }

  test("DELETE FROM maps to prefix truncate, only when segment-exact") {
    val log = newLog(20) // 96-byte cap → several segments
    val bases = graft.log.LogManifest.read(log.dir).get.segments.map(_.base)
    assert(bases.length > 2)
    val cut = bases(2) // a real segment boundary
    spark.sql(s"CREATE TABLE graft_del USING graft OPTIONS (path '${log.dir}')")
    try {
      spark.sql(s"DELETE FROM graft_del WHERE offset < $cut")
      val left = spark.sql("SELECT min(offset), count(*) FROM graft_del").head()
      assert(left.getLong(0) == cut && left.getLong(1) == 20 - cut)
      // A cut inside a segment is NOT exact — must be rejected, not rounded.
      val mid = cut + 1
      val e = intercept[Exception] {
        spark.sql(s"DELETE FROM graft_del WHERE offset < $mid")
      }
      assert(e.getMessage.toLowerCase.contains("delete"), e.getMessage)
      // And a non-prefix predicate is rejected too.
      intercept[Exception] { spark.sql("DELETE FROM graft_del WHERE offset = 12") }
    } finally spark.sql("DROP TABLE graft_del")
  }

  test("DELETE is exact on single-record segments (truncate bound off-by-one)") {
    // 10-byte cap → one record per segment: every offset is a segment
    // base, so DELETE offset < 2 must remove offsets {0, 1} and KEEP 2 —
    // the inclusive-vs-exclusive truncate bound bites exactly here.
    val log = SparkLog(spark, TestSpark.tempDir("gsrc"), LogConfig(maxStoreBytes = 10))
    log.append((0 until 6).map(i => s"r$i".getBytes))
    spark.sql(s"CREATE TABLE graft_del1 USING graft OPTIONS (path '${log.dir}')")
    try {
      spark.sql("DELETE FROM graft_del1 WHERE offset < 2")
      val r = spark.sql("SELECT min(offset), count(*) FROM graft_del1").head()
      assert((r.getLong(0), r.getLong(1)) == ((2L, 4L)), s"got $r")
      // A nothing-matches delete must be a no-op, not a one-record bite.
      spark.sql("DELETE FROM graft_del1 WHERE offset < 2")
      assert(spark.sql("SELECT count(*) FROM graft_del1").head().getLong(0) == 4L)
      // Delete-everything via <= MaxValue saturates instead of wrapping.
      spark.sql(s"DELETE FROM graft_del1 WHERE offset <= ${Long.MaxValue}")
      assert(spark.sql("SELECT count(*) FROM graft_del1").head().getLong(0) == 0L)
    } finally spark.sql("DROP TABLE graft_del1")
  }

  test("endOffset gives a reproducible snapshot read despite later appends") {
    val log = newLog(10)
    val snapshotEnd = 10L // saved high-water: offsets [0, 10) are "the run's data"
    val snap = spark.read.format("graft")
      .option("endOffset", snapshotEnd).load(log.dir)
    assert(snap.count() == 10L)
    log.append(Seq("late-0".getBytes, "late-1".getBytes))
    // Re-planning the SAME snapshot frame after appends sees the same rows;
    // an unbounded frame sees the live tail.
    assert(snap.count() == 10L)
    assert(snap.select(max(col("offset"))).head().getLong(0) == 9L)
    assert(spark.read.format("graft").load(log.dir).count() == 12L)
    // Composes with the pushed aggregate (manifest-answered) and filters.
    val plan = snap.agg(count(lit(1))).queryExecution.executedPlan.toString
    assert(plan.contains("GraftAggScan"))
    assert(snap.filter(col("offset") >= 5).count() == 5L)
  }

  test("endOffset bounds a STREAM at the snapshot too") {
    val log = newLog(8)
    log.append(Seq("past-end".getBytes)) // offset 8, outside the snapshot
    val q = spark.readStream.format("graft")
      .option("endOffset", 8).load(log.dir)
      .select(col("value").cast("string").as("v"))
      .writeStream.format("memory").queryName("bounded_tail")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(30000); q.stop()
    val vs = spark.sql("select v from bounded_tail").collect().map(_.getString(0))
    assert(vs.length == 8 && !vs.contains("past-end"), s"stream leaked past endOffset: ${vs.toSeq}")
  }

  test("overflowing offset bounds yield empty results, not wrapped windows") {
    val log = newLog(6)
    val df = spark.read.format("graft").load(log.dir)
    assert(df.filter(col("offset") > Long.MaxValue).count() == 0L)
    assert(df.filter(col("offset") < Long.MinValue).count() == 0L)
    assert(df.filter(col("offset") > Long.MaxValue).collect().isEmpty)
  }

  test("aggregates the manifest cannot answer fall back to a real scan") {
    val log = newLog(8)
    // count(value) skips nulls — needs the data; sum(offset) is not a
    // supported pushdown — both must plan the regular file scan.
    for (df <- Seq(
        spark.read.format("graft").load(log.dir).agg(count(col("value"))),
        spark.read.format("graft").load(log.dir).agg(sum(col("offset")))
      )) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("GraftAggScan"), s"unsound pushdown:\n$plan")
    }
    assert(spark.read.format("graft").load(log.dir).agg(sum(col("offset"))).head().getLong(0) == 28L)
    // A residual (non-offset) filter blocks pushdown wholesale.
    val filtered = spark.read.format("graft").load(log.dir)
      .filter(col("value").isNotNull).agg(count(lit(1)))
    assert(!filtered.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    assert(filtered.head().getLong(0) == 8L)
  }

  test("the log registers as a SQL catalog table (CREATE TABLE USING graft)") {
    val log = newLog(12)
    spark.sql(s"CREATE TABLE graft_ddl USING graft OPTIONS (path '${log.dir}')")
    try {
      assert(spark.sql("SELECT count(*) FROM graft_ddl").head().getLong(0) == 12)
      assert(
        spark
          .sql("SELECT cast(value AS STRING) v FROM graft_ddl WHERE offset = 7")
          .head()
          .getString(0) == "rec-7"
      )
      // Appends are visible to the catalog table (planning re-reads the
      // manifest — no cached file listing).
      log.append(Seq("rec-12".getBytes))
      assert(spark.sql("SELECT count(*) FROM graft_ddl").head().getLong(0) == 13)
    } finally spark.sql("DROP TABLE graft_ddl")
  }

  test("limit pushdown stops partition planning early") {
    val log = newLog(20) // 96-byte cap → several part files
    val limited = spark.read.format("graft").load(log.dir).limit(3)
    // Ranged part names give exact per-file record counts, so planning
    // stops at the first file(s) that provably cover the limit.
    assert(limited.rdd.getNumPartitions < spark.read.format("graft").load(log.dir).rdd.getNumPartitions)
    assert(limited.count() == 3)
    // Direct planning check: 3 rows fit in the first part file.
    val planned = GraftPlanning.partitionsFor(log.dir, Long.MinValue, Long.MaxValue, Some(3))
    assert(planned.length == 1, s"expected 1 planned partition, got ${planned.length}")
    // Limit larger than the log: planning covers everything, count unharmed.
    assert(spark.read.format("graft").load(log.dir).limit(100).count() == 20)
  }

  test("tail(from) starts at the requested offset - no full-log replay in batch 1") {
    val log = newLog(30)
    val q = log
      .tail(from = 28)
      .writeStream
      .format("memory")
      .queryName("tail_start")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // startOffset travels as a read option (streaming scans get no filter
      // pushdown): the first batch must read only [28, 30), not all 30 rows
      val progress = q.recentProgress.filter(_.numInputRows > 0)
      assert(progress.nonEmpty)
      assert(progress.map(_.numInputRows).sum == 2, s"read ${progress.map(_.numInputRows).toSeq}")
      assert(spark.sql("select count(*) from tail_start").head().getLong(0) == 2)
    } finally q.stop()
  }

  test("tail(from, until) streams exactly the requested window") {
    val log = newLog(30)
    val q = log
      .tail(from = 10, until = Some(14L))
      .writeStream
      .format("memory")
      .queryName("tail_window")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val offs = spark.sql("select offset from tail_window order by offset")
        .collect().map(_.getLong(0)).toSeq
      assert(offs == (10L until 14L), s"got $offs")
      // The bound is enforced by the endOffset OPTION (planning), not just
      // the guard filter: no batch reads rows past the window.
      assert(q.recentProgress.filter(_.numInputRows > 0).map(_.numInputRows).sum == 4)
    } finally q.stop()
  }

  test("column pruning reaches the scan (projected columns only)") {
    val log = newLog(15)
    val df = spark.read.format("graft").load(log.dir).select("offset")
    val scanLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("GraftScan")).getOrElse("")
    assert(scanLine.contains("columns=[offset]"), s"scan not pruned: $scanLine")
    // values correct under pruning
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == (0L until 15L))
    // pruning composes with predicate pushdown
    val one = spark.read.format("graft").load(log.dir).select("offset").filter(col("offset") === 9)
    assert(one.rdd.getNumPartitions == 1 && one.head().getLong(0) == 9L)
  }

  test("micro-batch stream tails the log with exact offset cursors") {
    val log = newLog(3)
    val q = spark.readStream
      .format("graft")
      .load(log.dir)
      .writeStream
      .format("memory")
      .queryName("graft_tail")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select count(*) from graft_tail").head().getLong(0) == 3)
      log.append(Seq("late-1".getBytes, "late-2".getBytes))
      q.processAllAvailable()
      val rows = spark
        .sql("select offset, cast(value as string) v from graft_tail order by offset")
        .collect()
      // exactly once: 5 rows total, no duplicates, new records present
      assert(rows.length == 5)
      assert(rows.map(_.getLong(0)).toSeq == (0L to 4L))
      assert(rows.last.getString(1) == "late-2")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains a pre-populated log in bounded batches, then terminates") {
    // Native SupportsTriggerAvailableNow (reference: ConsumeStream's
    // catch-up phase, internal/server/server.go:138-158): the drain honors
    // the admission cap — ceil(30/8) = 4 paced batches — and the query
    // terminates on its own instead of tailing forever.
    val log = newLog(30)
    val q = spark.readStream
      .format("graft")
      .option("maxRecordsPerBatch", "8")
      .load(log.dir)
      .writeStream
      .format("memory")
      .queryName("graft_avail_now")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow query did not terminate")
      val rows = spark.sql("select offset from graft_avail_now order by offset").collect()
      assert(rows.map(_.getLong(0)).toSeq == (0L until 30L))
      val withRows = q.recentProgress.filter(_.numInputRows > 0)
      assert(withRows.map(_.numInputRows).sum == 30)
      assert(withRows.length == 4, s"expected 4 paced batches, got ${withRows.map(_.numInputRows).toSeq}")
    } finally q.stop()
  }

  test("prepareForTriggerAvailableNow pins the end offset against later appends") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val log = newLog(10)
    val s = new GraftMicroBatchStream(log.dir, startAt = 0L)
    s.prepareForTriggerAvailableNow()
    log.append(Seq("after-pin-1".getBytes, "after-pin-2".getBytes))
    val end = s
      .latestOffset(GraftStreamOffset(0L), ReadLimit.allAvailable())
      .asInstanceOf[GraftStreamOffset]
      .offset
    assert(end == 10, s"drain end must stay at the pinned snapshot, got $end")
    // Monitoring still sees the true tail past the pin.
    assert(s.reportLatestOffset().asInstanceOf[GraftStreamOffset].offset == 12)
  }

  test("graft source agrees with the native read path on randomized logs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.resize(6, Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.alphaNumStr.map(s => "p" + s.take(10)))))
    (0 until 3).flatMap(i => gen.apply(Gen.Parameters.default, Seed(99L + i))).foreach { batches =>
      val log = SparkLog(spark, TestSpark.tempDir("gsrc-prop"), LogConfig(maxStoreBytes = 80))
      batches.foreach(b => log.append(b.map(_.getBytes)))
      val native = log.toDF.select(col("offset"), col("value").cast("string"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val viaSource = spark.read.format("graft").load(log.dir)
        .select(col("offset"), col("value").cast("string"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(viaSource.toSeq == native.toSeq, s"batches=${batches.map(_.size)}")
    }
  }

  test("scan reports manifest-derived statistics to the optimizer") {
    import org.apache.spark.sql.connector.read.SupportsReportStatistics
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val log = newLog(20)
    val full = spark.read.format("graft").load(log.dir)
    val scan = full.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b.scan }.get
    val stats = scan.asInstanceOf[SupportsReportStatistics].estimateStatistics()
    assert(stats.numRows.getAsLong == 20)
    assert(stats.sizeInBytes.getAsLong > 0)
    // A pushed point filter prorates the estimate down to ~one record.
    val point = full.filter(col("offset") === 3)
    val pscan = point.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b.scan }.get
    val pstats = pscan.asInstanceOf[SupportsReportStatistics].estimateStatistics()
    assert(pstats.numRows.getAsLong <= 2, s"expected ~1 row, got ${pstats.numRows}")
  }

  test("runtime filters narrow partition planning (DPP analog)") {
    import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.sources.In
    val log = newLog(20) // tiny store cap → several part files
    val full = spark.read.format("graft").load(log.dir)
    val scan = full.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b.scan }.get
    val rf = scan.asInstanceOf[SupportsRuntimeFiltering]
    assert(rf.filterAttributes().map(_.describe()).toSeq == Seq("offset"))
    val before = scan.toBatch.planInputPartitions().length
    // Simulate the runtime join-key delivery Spark performs for DPP.
    rf.filter(Array[org.apache.spark.sql.sources.Filter](In("offset", Array(3L, 4L))))
    val after = scan.toBatch.planInputPartitions().length
    assert(before > 1 && after < before, s"runtime filter did not prune: $before -> $after")
  }

  test("maxRecordsPerBatch paces catch-up into bounded micro-batches") {
    val log = newLog(30)
    val q = spark.readStream
      .format("graft")
      .option("maxRecordsPerBatch", 10)
      .load(log.dir)
      .writeStream
      .format("memory")
      .queryName("paced")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select count(*) from paced").head().getLong(0) == 30)
      val sized = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(sized.nonEmpty && sized.forall(_ <= 10), s"batch sizes: ${sized.toSeq}")
      assert(sized.length >= 3, s"expected >= 3 paced batches, got ${sized.toSeq}")
    } finally q.stop()
  }

  test("reader recovers when its planned file is compacted away (swap race)") {
    import graft.log.ParquetPointReader
    val log = SparkLog(spark, TestSpark.tempDir("gsrc-compact"), LogConfig(maxStoreBytes = 96))
    log.append((0 until 20).map(i => s"rec-$i".getBytes)) // several sealed parts
    // Plan against the PRE-compaction layout (the in-flight scan).
    val stale = GraftPlanning.partitionsFor(log.dir, 0, 19).map(_.asInstanceOf[GraftInputPartition])
    assert(stale.length > 1)
    log.compact(targetBytes = Long.MaxValue) // renames every planned file away
    val factory = GraftReaderFactory(Array("offset", "value"))
    val rows = stale.flatMap { p =>
      val r = factory.createReader(p)
      val buf = Vector.newBuilder[(Long, String)]
      while (r.next()) {
        val row = r.get()
        buf += ((row.getLong(0), new String(row.getBinary(1))))
      }
      r.close()
      buf.result()
    }.sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L until 20L), s"lost/duplicated rows: ${rows.map(_._1).toSeq}")
    assert(rows.head._2 == "rec-0" && rows.last._2 == "rec-19")
    // silence unused warning for import
    assert(ParquetPointReader.RangedName.pattern.pattern().nonEmpty)
  }

  test("null payloads round-trip as NULL on every read path") {
    val log = SparkLog(spark, TestSpark.tempDir("gsrc-null"), LogConfig())
    log.append(Seq("before".getBytes, null, "after".getBytes))
    // Point read through parquet-java.
    assert(log.read(0).value.sameElements("before".getBytes))
    assert(log.read(1).value == null)
    // Native parquet scan.
    val native = log.toDF.select("offset", "value")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1)
    // Graft DSv2 source.
    val viaSource = spark.read.format("graft").load(log.dir)
      .select("offset", "value")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1)
    assert(native(1)._2.isEmpty, "native scan must see NULL")
    assert(viaSource(1)._2.isEmpty, "graft source must see NULL")
    assert(native.map(_._1).toSeq == viaSource.map(_._1).toSeq)
  }
}
