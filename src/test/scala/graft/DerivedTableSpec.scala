package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.log.{LogConfig, SparkLog}
import graft.streaming.DerivedTable

/** The shared derived-table compaction ([[graft.streaming.DerivedTable]]):
  * the `batch=<id>`-per-trigger layout every streaming analytics sink
  * writes must stay a BOUNDED listing under an indefinite run, while
  * [[DerivedTable.readOpt]] returns the exact row multiset through every
  * crash window of the fold (half-written generation, committed marker
  * with the prune not yet run, a reader racing one generation behind).
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
    // prune deletes NOTHING on the first generation (there is no older
    // generation whose cutoff is safe to prune to), so every original
    // partition still exists alongside the generation — the
    // marker-committed-but-unpruned crash window — and the read must not
    // double-count the folded rows.
    DerivedTable.compact(spark, dir, keepBatches = 2)
    assert(generations(dir) == Set(1L))
    assert(liveBatches(dir) == (0L to 9L).toSet, "first fold prunes nothing")
    assert(rowsOf(dir) == expected, "no duplicates while folded batches await pruning")

    // Second fold: prunes live batches ≤ generation 1's cutoff (7) and
    // keeps generation 1 itself for a reader that resolved it an instant
    // before this commit.
    (10L to 12L).foreach(addBatch)
    DerivedTable.compact(spark, dir, keepBatches = 2)
    assert(generations(dir) == Set(1L, 2L))
    assert(liveBatches(dir) == (8L to 12L).toSet)
    assert(rowsOf(dir) == expected)

    // Third fold: generation 1 finally dies (nothing resolvable points at
    // it), live batches ≤ generation 2's cutoff (10) die with it.
    (13L to 14L).foreach(addBatch)
    DerivedTable.compact(spark, dir, keepBatches = 2)
    assert(generations(dir) == Set(2L, 3L))
    assert(liveBatches(dir) == (11L to 14L).toSet)
    assert(rowsOf(dir) == expected)

    // Nothing new to fold → no-op (no new generation, no deletes).
    DerivedTable.compact(spark, dir, keepBatches = 2)
    assert(generations(dir) == Set(2L, 3L))
    assert(liveBatches(dir) == (11L to 14L).toSet)
    assert(rowsOf(dir) == expected)
  }

  test("a half-written generation (no marker) is invisible and gets rebuilt") {
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
    assert(generations(dir) == Set(1L))

    // Crash mid-fold: generation 2's data landed but the marker never did.
    // Garbage rows inside it must be invisible to readers, and the next
    // fold must clear + rebuild the same number.
    Seq((999L, "garbage", 999L))
      .toDF("k", "v", "batch")
      .write
      .parquet(s"$dir/_compact/v=2/data")
    assert(rowsOf(dir) == expected, "markerless generation is invisible")

    (6L to 7L).foreach { id =>
      val rows = Seq((id, s"r$id"))
      writeBatch(dir, id, rows)
      expected ++= rows.map { case (k, v) => (k, v, id) }
    }
    DerivedTable.compact(spark, dir, keepBatches = 2)
    assert(generations(dir) == Set(1L, 2L))
    assert(rowsOf(dir) == expected, "rebuilt generation replaces the torn attempt")
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
