package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Engine, TestSpark}

/** Soak of the stateful streaming suite under the RocksDB state store — the
  * provider the docs prescribe for corpus-scale dedup (bounded heap, state
  * on local disk). Asserts (a) the provider is actually in effect for the
  * soaked queries, (b) watermark-bounded dedup state stays BOUNDED across
  * 50+ micro-batches (rows are evicted as the watermark passes), and
  * (c) results stay correct under the provider swap.
  */
class RocksDBSoakSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDB(f: => Unit): Unit = {
    val before = spark.conf.getOption(providerKey)
    Engine.enableRocksDBStateStore(spark)
    try f
    finally before match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  test("watermarked dedup state stays bounded across 50+ micro-batches on RocksDB") {
    withRocksDB {
      val session = spark
      import session.implicits._
      implicit val sqlCtx = spark.sqlContext

      val input = MemoryStream[(Long, String)]
      val deduped = EventStreams.streamingDedup(
        input.toDF().toDF("ms", "k")
          .withColumn("ts", timestamp_millis(col("ms"))),
        tsCol = "ts",
        keyCols = Seq("k"),
        watermarkDelay = "1 second"
      )
      val q = deduped.writeStream
        .format("memory").queryName("rocks_dedup").outputMode("append").start()
      try {
        val base = 1700000000000L
        var maxStateRows = 0L
        // 55 micro-batches, 20 keys re-sent every batch at advancing event
        // times: the 1s watermark should evict old (k, ts) state
        // continuously — under a leak, rows-in-state would track the
        // 55×20 total instead of the horizon.
        (0 until 55).foreach { b =>
          val t = base + b * 1000L
          input.addData((0 until 20).map(i => (t, s"k-$i")): _*)
          q.processAllAvailable()
          val rows = Option(q.lastProgress)
            .flatMap(p => p.stateOperators.headOption)
            .map(_.numRowsTotal)
            .getOrElse(0L)
          maxStateRows = math.max(maxStateRows, rows)
        }
        // Horizon ≈ watermark delay (1s = one batch of 20 keys) plus the
        // not-yet-watermarked tail; 10 batches of slack is generous — the
        // leak signature would be ~1100 rows.
        assert(maxStateRows <= 20L * 10, s"state grew unbounded: $maxStateRows rows")
        assert(maxStateRows > 0L, "state operator reported no rows — did dedup run?")
        // Provider actually RocksDB: the progress JSON carries rocksdb
        // custom metrics only under that provider.
        val progressJson = q.lastProgress.json
        assert(progressJson.contains("rocksdb"), s"not on RocksDB provider: $progressJson")
        // Dedup semantics intact: every (key, ts) pair distinct → all pass.
        val n = spark.table("rocks_dedup").count()
        assert(n == 55L * 20, s"expected 1100 distinct events, got $n")
      } finally q.stop()
    }
  }

  test("curateFrom's cross-batch content dedup runs green on RocksDB") {
    withRocksDB {
      val session = spark
      import session.implicits._
      val root = TestSpark.tempDir("rocks-curate")
      val rawDir = root + "/raw"
      val curatedDir = root + "/curated"

      val rawEngine = new Engine(spark, rawDir)
      val curated = new Engine(spark, curatedDir, rocksdbStateStore = true)

      def doc(i: Int, text: String) = s"""{"lang":"en","text":"$text padding-$i ${"x " * 30}"}"""
      // 60 docs over 3 waves with cross-wave duplicates: the stateful
      // content-hash dedup must drop repeats across micro-batches.
      val q = curated.curateFrom(
        rawDir,
        checkpoint = root + "/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()
      )
      // AvailableNow drains what exists at start; run three passes.
      rawEngine.log.appendDF((0 until 20).map(i => doc(i, s"alpha-$i").getBytes).toDF("value"))
      q.processAllAvailable(); q.stop()
      // Wave 2 BEFORE starting the next AvailableNow query — the
      // availability snapshot is taken at start.
      rawEngine.log.appendDF(
        ((0 until 10).map(i => doc(i, s"alpha-$i")) ++ // dups of wave 1
          (0 until 10).map(i => doc(i, s"beta-$i"))).map(_.getBytes).toDF("value"))
      val q2 = curated.curateFrom(rawDir, root + "/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q2.processAllAvailable(); q2.stop()

      val kept = curated.log.toDF.count()
      assert(kept == 30L, s"expected 20 alpha + 10 beta after cross-batch dedup, got $kept")
    }
  }
}
