package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.log.{LogConfig, SparkLog}
import graft.streaming.DerivedTable

/** The shared derived-table compaction ([[graft.streaming.DerivedTable]]):
  * the `batch=<id>`-per-trigger layout every streaming analytics sink
  * writes must stay a BOUNDED listing under an indefinite run, while
  * [[DerivedTable.readOpt]] returns the exact row multiset through every
  * crash window of the fold (half-written run, committed marker with the
  * prune not yet run, a committed merge whose folded runs still exist, a
  * reader racing one commit behind). Runs are TIERED (r13 advice): each
  * compaction folds only the NEW batches, merges grow geometrically, so
  * the per-fold cost is O(new rows) — not O(history) — and the live run
  * count stays logarithmic.
  */
class DerivedTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeBatch(dir: String, id: Long, rows: Seq[(Long, String)]): Unit = {
    val session = spark
    import session.implicits._
    rows.toDF("k", "v").write.mode("overwrite").parquet(s"$dir/batch=$id")
  }

  private def rowsOf(dir: String): Set[(Long, String, Long)] = {
    val session = spark
    import session.implicits._
    DerivedTable
      .readOpt(spark, dir)
      .get
      .select("k", "v", "batch")
      .as[(Long, String, Long)]
      .collect()
      .toSet
  }

  private def liveBatches(dir: String): Set[Long] =
    Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .map(_.getName)
      .collect { case n if n.startsWith("batch=") => n.stripPrefix("batch=").toLong }
      .toSet

  private def generations(dir: String): Set[Long] =
    Option(new java.io.File(s"$dir/_compact").listFiles())
      .getOrElse(Array.empty)
      .map(_.getName)
      .collect { case n if n.startsWith("v=") => n.stripPrefix("v=").toLong }
      .toSet

  test("compaction folds old partitions; reads stay exact through every window") {
    val dir = TestSpark.tempDir("derived-fold")
    assert(DerivedTable.readOpt(spark, dir).isEmpty, "nothing committed → None")

    var expected = Set.empty[(Long, String, Long)]
    def addBatch(id: Long): Unit = {
      val rows = Seq((id * 10, s"a$id"), (id * 10 + 1, s"b$id"))
      writeBatch(dir, id, rows)
      expected ++= rows.map { case (k, v) => (k, v, id) }
    }
    (0L to 9L).foreach(addBatch)
    assert(rowsOf(dir) == expected)

    // First fold: cutoff = 7 (keep the newest 2 live). The live-chain
    // prune deletes NOTHING on the first cycle (nothing was superseded
    // before it started), so every original partition still exists
    // alongside the run — the marker-committed-but-unpruned crash window —
    // and the read must not double-count the folded rows.
    DerivedTable.compact(spark, dir, keepBatches = 2)
    assert(generations(dir).nonEmpty)
    assert(liveBatches(dir) == (0L to 9L).toSet, "first fold prunes nothing")
    assert(rowsOf(dir) == expected, "no duplicates while folded batches await pruning")

    // Second fold: prunes live batches ≤ the previous cutoff (7) — rows a
    // reader that resolved the pre-commit chain can still reach live only
    // ABOVE that cutoff. Runs merged away THIS cycle must also survive it.
    (10L to 12L).foreach(addBatch)
    DerivedTable.compact(spark, dir, keepBatches = 2)
    assert(liveBatches(dir) == (8L to 12L).toSet)
    assert(rowsOf(dir) == expected)

    // Third fold: runs superseded by the SECOND fold's merges die now
    // (depth-1 live-chain), live batches ≤ the second fold's cutoff (10)
    // die with them.
    (13L to 14L).foreach(addBatch)
    DerivedTable.compact(spark, dir, keepBatches = 2)
    assert(liveBatches(dir) == (11L to 14L).toSet)
    assert(rowsOf(dir) == expected)

    // Nothing new to fold → no-op (no new runs, no deletes).
    val gensBefore = generations(dir)
    DerivedTable.compact(spark, dir, keepBatches = 2)
    assert(generations(dir) == gensBefore)
    assert(liveBatches(dir) == (11L to 14L).toSet)
    assert(rowsOf(dir) == expected)
  }

  test("tiered folds: run count stays logarithmic and old runs are shadowed, not lost") {
    val dir = TestSpark.tempDir("derived-tiered")
    var expected = Set.empty[(Long, String, Long)]
    var maxChain = 0
    (0L to 39L).foreach { id =>
      val rows = Seq((id, s"r$id"))
      writeBatch(dir, id, rows)
      expected ++= rows.map { case (k, v) => (k, v, id) }
      if (id % 3 == 2) { // compaction cadence: every 3 batches
        DerivedTable.compact(spark, dir, keepBatches = 2)
        val runs = DerivedTable.chain(spark, dir)
        maxChain = math.max(maxChain, runs.size)
        // Chain spans are contiguous and non-overlapping, newest first.
        runs.sliding(2).foreach {
          case Seq(newer, older) => assert(newer.lo == older.cutoff, s"contiguous spans: $runs")
          case _                 =>
        }
        assert(rowsOf(dir) == expected, s"exact multiset after fold at batch $id")
      }
    }
    // 13 folds over 40 batches: a single-base scheme has 1 run but O(n²)
    // rewrite work; an unmerged scheme has 13. Geometric merging must keep
    // the chain well under the fold count at every probe.
    assert(maxChain <= 6, s"run chain stays logarithmic, saw $maxChain")
    // Live partitions: cadence(3) since the last fold + keepBatches(2) +
    // one cadence of depth-1 prune lag (batches ≤ the PREVIOUS cutoff are
    // the ones a fold deletes) — bounded, never growing with history.
    assert(liveBatches(dir).size <= 7, s"live partitions bounded: ${liveBatches(dir)}")
  }

  test("a half-written run (no marker) is invisible and cleared by the next fold") {
    val dir = TestSpark.tempDir("derived-torn")
    val session = spark
    import session.implicits._
    var expected = Set.empty[(Long, String, Long)]
    (0L to 5L).foreach { id =>
      val rows = Seq((id, s"r$id"))
      writeBatch(dir, id, rows)
      expected ++= rows.map { case (k, v) => (k, v, id) }
    }
    DerivedTable.compact(spark, dir, keepBatches = 2)
    val v = generations(dir).max

    // Crash mid-fold: a run's data landed but the marker never did.
    // Garbage rows inside it must be invisible to readers, and the next
    // fold must clear the debris (version numbers only grow).
    Seq((999L, "garbage", 999L))
      .toDF("k", "v", "batch")
      .write
      .parquet(s"$dir/_compact/v=${v + 1}/data")
    assert(rowsOf(dir) == expected, "markerless run is invisible")

    (6L to 7L).foreach { id =>
      val rows = Seq((id, s"r$id"))
      writeBatch(dir, id, rows)
      expected ++= rows.map { case (k, v) => (k, v, id) }
    }
    DerivedTable.compact(spark, dir, keepBatches = 2)
    assert(rowsOf(dir) == expected, "debris cleared; fold proceeds past the torn attempt")
    assert(
      !new java.io.File(s"$dir/_compact/v=${v + 1}/_complete").exists()
        || rowsOf(dir) == expected
    )
  }

  test("a torn or garbled marker reads as absent — never as a wrong-span run") {
    val dir = TestSpark.tempDir("derived-torn-marker")
    var expected = Set.empty[(Long, String, Long)]
    (0L to 11L).foreach { id =>
      val rows = Seq((id, s"r$id"))
      writeBatch(dir, id, rows)
      expected ++= rows.map { case (k, v) => (k, v, id) }
      if (id % 4 == 3) DerivedTable.compact(spark, dir, keepBatches = 2)
    }
    assert(rowsOf(dir) == expected)
    val newest = DerivedTable.chain(spark, dir).head
    val markerFile = new java.io.File(s"$dir/_compact/v=${newest.version}/_complete")
    val intact = new String(
      java.nio.file.Files.readAllBytes(markerFile.toPath), "UTF-8")
    assert(intact.endsWith(";end"), "markers carry the truncation sentinel")
    // Drop the LocalFileSystem checksum sidecar: the raw NIO mutations
    // below would otherwise fail its CRC before the parser ever ran.
    val _ = new java.io.File(markerFile.getParentFile, "._complete.crc").delete()

    // Every truncation prefix of the real marker — including the ones the
    // old lenient parse accepted (`cutoff=C` → legacy lo=MinValue;
    // `cutoff=C;lo=4` with a mid-digit-cut lo → broader span than the
    // run's rows) — must read as TORN: the chain falls back to the runs
    // this one folded, so the row multiset is unchanged, and nothing
    // throws on a garbled numeric tail.
    (1 until intact.length).foreach { cut =>
      java.nio.file.Files.write(markerFile.toPath, intact.take(cut).getBytes("UTF-8"))
      assert(
        !DerivedTable.chain(spark, dir).exists(_.version == newest.version),
        s"prefix '${intact.take(cut)}' must parse as torn")
      assert(rowsOf(dir) == expected, s"rows intact under truncation at $cut")
    }
    java.nio.file.Files.write(markerFile.toPath, "cutoff=12;lo=xx;end".getBytes("UTF-8"))
    assert(rowsOf(dir) == expected, "garbled numeric tail is torn, not an exception")
    java.nio.file.Files.write(markerFile.toPath, intact.getBytes("UTF-8"))
    assert(DerivedTable.chain(spark, dir).head == newest, "restored marker resolves again")
  }

  test("a committed merge shadows the runs it folded while they await pruning") {
    val dir = TestSpark.tempDir("derived-shadow")
    var expected = Set.empty[(Long, String, Long)]
    (0L to 11L).foreach { id =>
      val rows = Seq((id, s"r$id"))
      writeBatch(dir, id, rows)
      expected ++= rows.map { case (k, v) => (k, v, id) }
      if (id % 4 == 3) DerivedTable.compact(spark, dir, keepBatches = 2)
    }
    // Similar-size runs force merges; the folded runs survive the cycle
    // that merged them (depth-1 retention) — disk holds BOTH the merge and
    // its inputs, and the chain must serve each row exactly once.
    assert(rowsOf(dir) == expected)
    val runs = DerivedTable.chain(spark, dir)
    val allComplete = generations(dir).filter { v =>
      new java.io.File(s"$dir/_compact/v=$v/_complete").exists()
    }
    assert(allComplete.size >= runs.size, "superseded runs may linger on disk")
  }

  test("withRead retries a readout whose files were pruned mid-scan") {
    val dir = TestSpark.tempDir("derived-retry")
    (0L to 7L).foreach(id => writeBatch(dir, id, Seq((id, s"r$id"))))
    DerivedTable.compact(spark, dir, keepBatches = 2)
    // Simulate the two-commits-behind reader: the closure's FIRST attempt
    // throws the wrapped FileNotFound Spark surfaces when a pruned file
    // vanishes mid-scan; the retry re-resolves the chain and must succeed.
    var calls = 0
    val n = DerivedTable.withRead(spark, dir) { df =>
      calls += 1
      if (calls == 1)
        throw new org.apache.spark.SparkException(
          "scan failed",
          new java.io.FileNotFoundException(s"$dir/_compact/v=1/data/part-0.parquet")
        )
      df.count()
    }
    assert(calls == 2 && n == 8L)
  }

  test("streaming sink compacts on cadence; reports read through generations") {
    val session = spark
    import session.implicits._
    val raw = SparkLog(spark, TestSpark.tempDir("derived-stream-raw"), LogConfig())
    val engine = Engine(spark, TestSpark.tempDir("derived-stream-eng"))
    val ckpt = TestSpark.tempDir("derived-stream-ckpt")
    val out = TestSpark.tempDir("derived-stream-table")
    def ev(day: Int): Array[Byte] =
      f"""{"user_id":1,"ts":"2024-01-$day%02d 12:00:00","event_type":"view"}""".getBytes

    spark.conf.set("spark.graft.derived.compactEvery", "2")
    spark.conf.set("spark.graft.derived.keepBatches", "2")
    try {
      val q = engine.dailyCountsFrom(raw.dir, ckpt, out)
      try {
        // One event per day, one micro-batch per append: appending day d
        // (watermark d 11:00) closes day d−1, so 9 batches finalize days
        // 1..8 while the cadence (every 2 batches) folds old partitions.
        (1 to 9).foreach { d =>
          raw.append(Seq(ev(d)))
          q.processAllAvailable()
        }
      } finally q.stop()

      assert(generations(out).nonEmpty, "the cadence must have folded at least once")
      assert(liveBatches(out).size < 6, s"live partitions stay bounded: ${liveBatches(out)}")
      val table = DerivedTable
        .read(spark, out)
        .select(col("day").cast("string"), col("n"))
        .as[(String, Long)]
        .collect()
        .toSet
      val want = (1 to 8).map(d => (f"2024-01-$d%02d", 1L)).toSet
      assert(table == want, s"finalized days through generations: $table")
      // anomalyReport's exactly-once duplicate check reads through the
      // same path — a double-counted day in any crash window would trip it.
      assert(Engine.anomalyReport(spark, out).count() >= 0)
    } finally {
      spark.conf.unset("spark.graft.derived.compactEvery")
      spark.conf.unset("spark.graft.derived.keepBatches")
    }
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
