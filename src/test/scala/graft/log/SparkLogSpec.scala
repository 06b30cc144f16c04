package graft.log

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Scenario tests mirroring the reference's log tests
  * (reference: internal/log/log_test.go:13-119, segment_test.go, store_test.go).
  */
class SparkLogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val hello = "hello world".getBytes("UTF-8") // store_test.go:12

  // Tiny thresholds force multi-segment logs like log_test.go:27
  // (MaxStoreBytes=32 → two 19-byte records seal a segment).
  private def tinyConfig = LogConfig(maxStoreBytes = 32, maxRecordsPerSegment = 1024)

  test("append then read round-trips (log_test.go:36-45)") {
    val log = SparkLog(spark, TestSpark.tempDir("log-rt"))
    val off = log.appendOne(hello)
    assert(off == 0)
    val rec = log.read(0)
    assert(new String(rec.value, "UTF-8") == "hello world")
    assert(rec.offset == 0)
  }

  test("read past end raises typed 404 (log_test.go:47-53)") {
    val log = SparkLog(spark, TestSpark.tempDir("log-oor"))
    log.appendOne(hello)
    val e = intercept[OffsetOutOfRangeException](log.read(1))
    assert(e.offset == 1)
    assert(e.code == 404)
    assert(e.getMessage == "offset out of range: 1")
  }

  test("read on empty log raises 404") {
    val log = SparkLog(spark, TestSpark.tempDir("log-empty"))
    intercept[OffsetOutOfRangeException](log.read(0))
  }

  test("batch append assigns contiguous offsets and rolls segments") {
    val log = SparkLog(spark, TestSpark.tempDir("log-roll"), tinyConfig)
    val first = log.append((0 until 5).map(i => s"record-$i".getBytes))
    assert(first == 0)
    assert(log.lowestOffset == 0)
    assert(log.highestOffset == 4)
    assert(log.segmentCount > 1) // 32-byte threshold forces rolling
    (0 until 5).foreach { i =>
      assert(new String(log.read(i.toLong).value) == s"record-$i")
    }
  }

  test("reopen preserves lowest/highest (log_test.go:55-80)") {
    val dir = TestSpark.tempDir("log-reopen")
    val log = SparkLog(spark, dir, tinyConfig)
    (0 until 3).foreach(_ => log.appendOne(hello))
    assert(log.lowestOffset == 0)
    assert(log.highestOffset == 2)

    val reopened = SparkLog(spark, dir, tinyConfig)
    assert(reopened.lowestOffset == 0)
    assert(reopened.highestOffset == 2)
    assert(new String(reopened.read(2).value) == "hello world")
  }

  test("recovery without manifest rebuilds from segment files (log.go:39-68)") {
    val dir = TestSpark.tempDir("log-recover")
    val log = SparkLog(spark, dir, tinyConfig)
    (0 until 4).foreach(i => log.appendOne(s"v$i".getBytes))
    // Remove every manifest representation (versioned + legacy).
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try
      listing.iterator().forEachRemaining { p =>
        if (p.getFileName.toString.startsWith("_manifest.json"))
          java.nio.file.Files.delete(p)
      }
    finally listing.close()

    val recovered = SparkLog(spark, dir, tinyConfig)
    assert(recovered.lowestOffset == 0)
    assert(recovered.highestOffset == 3)
    assert(new String(recovered.read(3).value) == "v3")
    assert(recovered.appendOne("v4".getBytes) == 4)
  }

  test("truncate is segment-granular (log_test.go:98-118)") {
    val dir = TestSpark.tempDir("log-trunc")
    // maxStoreBytes=32: records 0,1 share a segment (19+19=38≥32 seals it),
    // record 2 starts the next — exactly the reference's roll points.
    val log = SparkLog(spark, dir, tinyConfig)
    (0 until 3).foreach(_ => log.appendOne(hello))
    log.truncate(1)
    intercept[OffsetOutOfRangeException](log.read(0))
    intercept[OffsetOutOfRangeException](log.read(1))
    assert(new String(log.read(2).value) == "hello world")
    assert(log.lowestOffset == 2)
    assert(log.highestOffset == 2)
  }

  test("truncate keeps a segment containing any surviving record") {
    val log = SparkLog(spark, TestSpark.tempDir("log-trunc2"), tinyConfig)
    (0 until 4).foreach(i => log.appendOne(s"r$i-${"x" * 30}".getBytes)) // 8+34B ≥ 32 → 1 record/segment
    log.truncate(0)
    intercept[OffsetOutOfRangeException](log.read(0))
    assert(new String(log.read(1).value).startsWith("r1"))
  }

  test("toDF exposes the full log; reader is offset-ordered (log.go:173-193)") {
    val log = SparkLog(spark, TestSpark.tempDir("log-df"), tinyConfig)
    log.append((0 until 10).map(i => s"m$i".getBytes))
    val df = log.toDF
    assert(df.count() == 10)
    import org.apache.spark.sql.functions._
    val row = df.agg(min(col("offset")), max(col("offset"))).head()
    assert(row.getLong(0) == 0 && row.getLong(1) == 9)
    val ordered = log.reader.select("offset").collect().map(_.getLong(0))
    assert(ordered.toSeq == (0L until 10L))
  }

  test("range scan prunes to [from, until)") {
    val log = SparkLog(spark, TestSpark.tempDir("log-range"), tinyConfig)
    log.append((0 until 8).map(i => s"m$i".getBytes))
    val got = log.range(2, 5).select("offset").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(2L, 3L, 4L))
  }

  test("appendDF bulk-ingest assigns contiguous offsets (scale path)") {
    val session = spark
    import session.implicits._
    val log = SparkLog(spark, TestSpark.tempDir("log-bulk"))
    log.appendOne("seed".getBytes) // non-zero base for the bulk batch
    val df = (0 until 1000).map(i => s"bulk-$i".getBytes).toDF("value").repartition(7)
    val (base, n) = log.appendDF(df)
    assert(base == 1 && n == 1000)
    assert(log.highestOffset == 1000)
    val offs = log.toDF.select("offset").collect().map(_.getLong(0)).sorted
    assert(offs.toSeq == (0L to 1000L)) // gap-free
    // round-trip integrity: every value still readable at its offset
    val rec = log.read(500)
    assert(new String(rec.value).startsWith("bulk-"))
  }

  test("initialOffset honored like segment base 16 (segment_test.go:21-37)") {
    val log = SparkLog(spark, TestSpark.tempDir("log-base16"), LogConfig(initialOffset = 16))
    val off = log.appendOne(hello)
    assert(off == 16)
    assert(log.lowestOffset == 16)
    assert(log.read(16).offset == 16)
    intercept[OffsetOutOfRangeException](log.read(0))
  }

  test("reset empties the log (log.go:129-135)") {
    val log = SparkLog(spark, TestSpark.tempDir("log-reset"), tinyConfig)
    log.append(Seq("a".getBytes, "b".getBytes))
    log.reset()
    assert(log.segmentCount == 0)
    intercept[OffsetOutOfRangeException](log.read(0))
    assert(log.appendOne("c".getBytes) == 0)
  }

  test("manifest JSON round-trips") {
    val m = LogManifest(
      Vector(SegmentMeta(0, 2, 38, 2, sealed_ = true), SegmentMeta(2, 3, 19, 1, sealed_ = false)),
      3,
      tokens = Map("ingest" -> 41L, "other.src-2" -> 0L)
    )
    val dir = TestSpark.tempDir("manifest")
    LogManifest.write(dir, m)
    assert(LogManifest.read(dir).contains(m))
    // tokenless (pre-token) manifests still parse
    val legacy = LogManifest.parse("""{"nextOffset":3,"segments":[{"base":0,"next":3,"bytes":1,"records":3,"sealed":true}]}""")
    assert(legacy.tokens.isEmpty && legacy.nextOffset == 3)
  }

  test("manifest segmentFor binary search") {
    val m = LogManifest(
      Vector(SegmentMeta(0, 5, 0, 5, true), SegmentMeta(5, 9, 0, 4, true), SegmentMeta(9, 12, 0, 3, false)),
      12
    )
    assert(m.segmentFor(0).get.base == 0)
    assert(m.segmentFor(4).get.base == 0)
    assert(m.segmentFor(5).get.base == 5)
    assert(m.segmentFor(11).get.base == 9)
    assert(m.segmentFor(12).isEmpty)
    assert(m.segmentFor(-1).isEmpty)
  }

  test("compact merges adjacent small segments preserving content (snapshot analog)") {
    val dir = TestSpark.tempDir("log-compact")
    val log = SparkLog(spark, dir, tinyConfig)
    (0 until 10).foreach(i => log.appendOne(s"c$i".getBytes)) // many tiny segments
    val before = log.segmentCount
    assert(before >= 3)
    log.compact(targetBytes = 1024 * 1024)
    assert(log.segmentCount < before)
    assert(log.lowestOffset == 0 && log.highestOffset == 9)
    (0 until 10).foreach(i => assert(new String(log.read(i.toLong).value) == s"c$i"))
    assert(log.toDF.count() == 10)
    // reopen after compact: manifest + layout consistent
    val reopened = SparkLog(spark, dir, tinyConfig)
    assert(reopened.highestOffset == 9)
    assert(new String(reopened.read(5).value) == "c5")
    // appends continue after compaction
    assert(reopened.appendOne("post-compact".getBytes) == 10)
  }

  test("compact writes the merged segment in parallel with disjoint ranged parts") {
    val dir = TestSpark.tempDir("log-compact-par")
    val log = SparkLog(spark, dir, LogConfig(maxStoreBytes = 48, maxRecordsPerSegment = 3))
    log.append((0 until 12).map(i => s"rec-$i".getBytes))
    val before = log.segmentCount
    log.compact(targetBytes = Long.MaxValue)
    assert(log.segmentCount < before)

    // The merged segment is written by multiple range-partitioned tasks:
    // several part files whose offset ranges are disjoint and contiguous.
    val lo = log.currentManifest.segments.head.base
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(dir, s"segment=$lo"))
    val ranges =
      try {
        import scala.jdk.CollectionConverters._
        listing
          .iterator()
          .asScala
          .map(_.getFileName.toString)
          .collect { case ParquetPointReader.RangedName(mn, mx) => (mn.toLong, mx.toLong) }
          .toVector
          .sorted
      } finally listing.close()
    assert(ranges.size > 1, s"expected a multi-file merged segment, got $ranges")
    ranges.sliding(2).foreach {
      case Vector((_, aHi), (bLo, _)) => assert(bLo == aHi + 1, s"ranges not contiguous: $ranges")
      case _                          => ()
    }

    (0 until 12).foreach(i => assert(new String(log.read(i.toLong).value) == s"rec-$i"))
    assert(spark.read.format("graft").load(dir).count() >= 12)
  }

  test("compact leaves the unsealed tail segment alone") {
    val log = SparkLog(spark, TestSpark.tempDir("log-compact2"), LogConfig(maxStoreBytes = 1024 * 1024))
    log.append((0 until 5).map(i => s"t$i".getBytes)) // single unsealed segment
    val before = log.segmentCount
    log.compact()
    assert(log.segmentCount == before)
    assert(new String(log.read(4).value) == "t4")
  }

  test("crash mid-compaction (olds moved, manifest not yet updated) rolls back on reopen") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = TestSpark.tempDir("log-crash-back")
    val log = SparkLog(spark, dir, tinyConfig)
    (0 until 12).foreach(i => log.appendOne(s"x-record-$i".getBytes))
    val segs = log.currentManifest.segments.filter(_.sealed_).take(2)
    assert(segs.size == 2)
    // Simulate: journal written, old dirs moved away, then CRASH (no new dir
    // swapped in, manifest untouched).
    val olds = segs.map(s => s.base -> s"_old-${s.base}-test")
    CompactJournal.write(dir, CompactJournal(segs.head.base, segs.last.next, "_compact-test", olds))
    olds.foreach { case (b, d) =>
      Files.move(Paths.get(dir, s"segment=$b"), Paths.get(dir, d), StandardCopyOption.ATOMIC_MOVE)
    }
    val reopened = SparkLog(spark, dir, tinyConfig)
    // rollback restored every segment; all records readable
    (0 until 12).foreach(i => assert(new String(reopened.read(i.toLong).value) == s"x-record-$i"))
    assert(CompactJournal.read(dir).isEmpty)
  }

  test("CompactJournal.write rejects part names that would corrupt the pipe-joined field") {
    val dir = TestSpark.tempDir("log-journal-guard")
    // newParts rides pipe-joined inside a JSON string; a '|' or '"' in a
    // name would silently corrupt rollback. Must fail loudly at write.
    for (bad <- Seq("part|evil.parquet", "part\"evil.parquet")) {
      val ex = intercept[IllegalArgumentException] {
        CompactJournal.write(dir, CompactJournal(0L, 1L, "_compact-x", Nil, Seq(bad)))
      }
      assert(ex.getMessage.contains("must not contain"))
    }
    assert(CompactJournal.read(dir).isEmpty, "a rejected write must leave no journal")
  }

  test("crash after manifest update (olds not yet deleted) rolls forward on reopen") {
    import java.nio.file.{Files, Paths}
    val dir = TestSpark.tempDir("log-crash-fwd")
    val log = SparkLog(spark, dir, tinyConfig)
    (0 until 6).foreach(i => log.appendOne(s"y$i".getBytes))
    log.compact(targetBytes = 1024 * 1024) // completes fully
    // Simulate the forward-crash residue: journal present again + stray dirs
    val merged = log.currentManifest.segments.head
    CompactJournal.write(
      dir,
      CompactJournal(merged.base, merged.next, "_compact-gone", Seq(999L -> "_old-999-test"))
    )
    Files.createDirectories(Paths.get(dir, "_old-999-test"))
    val reopened = SparkLog(spark, dir, tinyConfig)
    (0 until 6).foreach(i => assert(new String(reopened.read(i.toLong).value) == s"y$i"))
    assert(CompactJournal.read(dir).isEmpty)
    assert(!Files.exists(Paths.get(dir, "_old-999-test")))
  }
  test("reconcile resurrects a half-committed appendDF segment WITH its token") {
    val session = spark
    import session.implicits._
    val dir = TestSpark.tempDir("log-token-crash")
    val log = SparkLog(spark, dir)
    log.appendDF(Seq("a", "b").map(_.getBytes).toDF("value"), Some(("src", 1L)))
    val preCrash = LogManifest.read(dir).get // manifest as of epoch 1
    val base2 = log.currentManifest.nextOffset
    log.appendDF(Seq("c", "d", "e").map(_.getBytes).toDF("value"), Some(("src", 2L)))
    // Simulate a crash between epoch 2's parts-publish and manifest-commit:
    // roll the manifest back to the epoch-1 version and restore the
    // pending-token marker that the successful commit path deleted.
    LogManifest.write(dir, preCrash)
    LogFs.forPath(dir).writeMeta(s"$dir/segment=$base2", "_pending_token", "src\n2".getBytes("UTF-8"))

    // Reopen: reconcile must resurrect the segment AND its token together.
    val re = SparkLog(spark, dir)
    assert(re.highestOffset == 4, "resurrected data must be visible")
    assert(re.currentManifest.tokens.get("src").contains(2L),
      s"pending token lost in resurrection: ${re.currentManifest.tokens}")
    // The foreachBatch retry of epoch 2 is now a no-op, not a duplicate.
    val (_, n) = re.appendDF(Seq("c", "d", "e").map(_.getBytes).toDF("value"), Some(("src", 2L)))
    assert(n == 0, "epoch 2 retry must be skipped")
    assert(re.highestOffset == 4)
  }

  test("export → wipe → restore round-trips records, offsets, manifest and fencing " +
    "(fsm.Restore analog, distributed_fsm.go:53-83)") {
    val dir = TestSpark.tempDir("log-restore")
    val log = SparkLog(spark, dir, tinyConfig)
    (0 until 10).foreach(i => log.appendOne(s"rec-$i".getBytes("UTF-8")))
    // Truncate so the export's FIRST offset is non-zero: restore must reset
    // the initial offset from the first record, not assume 0.
    log.truncate(3)
    val preLow = log.lowestOffset
    assert(preLow > 0, "truncation should have advanced the lowest offset")
    val before = log.reader
      .collect()
      .map(r => (r.getLong(r.fieldIndex("offset")), new String(r.getAs[Array[Byte]]("value"), "UTF-8")))
      .toList

    // Export the L6 reader as parquet (the CLI `export` verb's shape).
    val exportDir = TestSpark.tempDir("log-export") + "/dump"
    log.reader.write.parquet(exportDir)

    // Wipe: the log is gone (fresh manifest history), then restore from dir.
    log.reset()
    assert(log.segmentCount == 0)
    log.restore(exportDir)

    val after = log.reader
      .collect()
      .map(r => (r.getLong(r.fieldIndex("offset")), new String(r.getAs[Array[Byte]]("value"), "UTF-8")))
      .toList
    assert(after == before, "restored records/offsets must be byte-identical")
    assert(log.lowestOffset == preLow)
    assert(log.highestOffset == 9L)

    // Manifest consistent + fencing epoch fresh: a reopen reconciles
    // cleanly, claims writership on the rebuilt history, and appends at
    // the right next offset.
    val reopened = SparkLog(spark, dir, tinyConfig)
    assert(reopened.writerEpoch >= 1L)
    assert(reopened.lowestOffset == preLow && reopened.highestOffset == 9L)
    assert(reopened.appendOne("post-restore".getBytes("UTF-8")) == 10L)
  }

  test("restore(df) into a second log reproduces the source; empty export is a no-op") {
    val src = SparkLog(spark, TestSpark.tempDir("log-restore-src"), tinyConfig)
    (0 until 6).foreach(i => src.appendOne(s"v$i".getBytes("UTF-8")))
    val dst = SparkLog(spark, TestSpark.tempDir("log-restore-dst"), tinyConfig)
    dst.appendOne("will-be-wiped".getBytes("UTF-8"))
    dst.restore(src.reader)
    assert(
      dst.reader.collect().map(r => new String(r.getAs[Array[Byte]]("value"), "UTF-8")).toList ==
        (0 until 6).map(i => s"v$i").toList
    )
    assert(dst.lowestOffset == 0L && dst.highestOffset == 5L)

    // Empty export: like the reference (the restore loop never runs), the
    // log is left untouched.
    val empty = SparkLog(spark, TestSpark.tempDir("log-restore-empty"), tinyConfig)
    dst.restore(empty.reader)
    assert(dst.highestOffset == 5L)
  }

  test("self-restore from the log's own reader is safe (export materializes before the reset)") {
    // ADVICE r8: restore() resets (= deletes every segment) before the
    // lazy export plan runs, so passing the log's OWN reader frame would
    // read parquet files the reset already deleted — data loss. The fix
    // pins the sorted export in block storage first; the no-op identity
    // restore must round-trip byte-identically.
    val log = SparkLog(spark, TestSpark.tempDir("log-self-restore"), tinyConfig)
    (0 until 8).foreach(i => log.appendOne(s"self-$i".getBytes("UTF-8")))
    log.truncate(2)
    val before = log.reader
      .collect()
      .map(r => (r.getLong(r.fieldIndex("offset")), new String(r.getAs[Array[Byte]]("value"), "UTF-8")))
      .toList
    log.restore(log.reader)
    val after = log.reader
      .collect()
      .map(r => (r.getLong(r.fieldIndex("offset")), new String(r.getAs[Array[Byte]]("value"), "UTF-8")))
      .toList
    assert(after == before, "self-restore must be an identity round-trip")
    assert(log.appendOne("post".getBytes("UTF-8")) == 8L)
  }

  test("retention drops exactly the eligible prefix by age and by size; tail survives") {
    // Deterministic clock: each append batch lands one hour apart.
    var now = 1000L * 1000
    val hour = 3600L * 1000
    val log = SparkLog(spark, TestSpark.tempDir("log-retain"), tinyConfig, () => now)
    // 40-byte records overshoot the 32-byte store cap alone, so every
    // batch seals into its own segment(s) — one createdAt stamp per hour.
    def rec(tag: String) = (tag + "-" + "x" * 37).take(40).getBytes
    log.append(Seq(rec("a0"), rec("a1"))) // segment(s) at t0
    now += hour
    log.append(Seq(rec("b0"), rec("b1"))) // t0+1h
    now += hour
    log.append(Seq(rec("c0"), rec("c1"))) // t0+2h
    assert(log.segmentCount >= 3, s"need >=3 segments, got ${log.segmentCount}")

    // A streaming reader is mid-flight before retention runs.
    val tail = spark.readStream.format("graft").load(log.dir)
      .writeStream.format("memory").queryName("retain_tail").start()
    tail.processAllAvailable()

    // Age retention: cut everything older than 90 minutes — exactly the
    // t0 segments; the t0+1h and t0+2h segments survive.
    now += 1 // "now" = t0 + 2h + epsilon
    val manifestBefore = log.currentManifest.segments
    val eligible = manifestBefore.count(s => s.createdAtMillis < now - 90 * 60 * 1000)
    val droppedByAge = log.retain(maxAgeMillis = 90 * 60 * 1000, nowMillis = now)
    assert(droppedByAge == eligible && droppedByAge >= 1,
      s"dropped $droppedByAge, eligible $eligible")
    assert(new String(log.read(log.lowestOffset).value) == new String(rec("b0")),
      "lowest surviving record must be the first of the t0+1h batch")
    intercept[OffsetOutOfRangeException](log.read(0L))

    // Size retention: cap to the two newest segments' bytes — the oldest
    // survivors drop, c0's and c1's segments stay.
    val lastTwo = log.currentManifest.segments.takeRight(2).map(_.bytes).sum
    val droppedBySize = log.retain(maxBytes = math.max(lastTwo, 1L), nowMillis = now)
    assert(log.currentManifest.segments.size == 2, "size cap must keep the two tail segments")
    assert(droppedBySize >= 1)
    assert(new String(log.read(log.lowestOffset).value) == new String(rec("c0")))

    // The newest segment NEVER drops, even when aged and over-cap.
    val _ = log.retain(maxAgeMillis = 1L, maxBytes = 1L, nowMillis = now + 100 * hour)
    assert(log.currentManifest.segments.size == 1, "only the live tail survives")
    assert(new String(log.read(log.highestOffset).value) == new String(rec("c1")))

    // The in-flight streaming reader sees a clean advance: a post-retention
    // append lands and the tail picks it up without error.
    log.append(Seq("d0".getBytes))
    tail.processAllAvailable()
    val tailed = spark.sql("select cast(value as string) v from retain_tail")
      .collect().map(_.getString(0)).toSet
    assert(tailed.contains("d0"), s"tail missed the post-retention append: $tailed")
    tail.stop()

    // Retention survives reopen (manifest round-trips createdAt).
    val re = SparkLog(spark, log.dir, tinyConfig, () => now)
    assert(re.lowestOffset == log.lowestOffset)
    assert(re.currentManifest.segments.forall(_.createdAtMillis > 0))
  }
}
