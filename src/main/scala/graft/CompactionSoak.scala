package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong, AtomicReference}

import org.apache.spark.sql.SparkSession

import graft.streaming.DerivedTable

/** Long-run soak for the TIERED derived-table compaction
  * ([[DerivedTable.compact]]) — measures the claim the r14 redesign made
  * but never quantified: geometric run merging rewrites a row O(log n)
  * times over the table's life, so cumulative compaction I/O stays within
  * a logarithmic factor of the bytes ingested (the superseded r13 design
  * refolded ALL history every cycle — O(n) rewrites per row, quadratic
  * total I/O). Over `n` batches with a compaction every `keepBatches`:
  *
  *   1. REWRITE AMPLIFICATION: (total bytes written under `_compact`) /
  *      (bytes ingested into folds) must stay ≤ log2(cycles) + 2 — the
  *      O(history) design fails this by ~cycles/2 at 250 cycles;
  *   2. the resolvable chain stays logarithmic (≤ log2(cycles) + 4 runs)
  *      and the live `batch=*` listing stays bounded at every probe;
  *   3. per-cycle latency stays FLAT in the median (big merges spike
  *      individual cycles at power-of-2 boundaries — by design);
  *   4. a CONCURRENT READER loops `withRead(count)` the whole run at a
  *      ~50 ms cadence — the r13-advice race drill at streaming-trigger
  *      frequency: prunes land mid-scan, the retry must absorb every one,
  *      and the observed count must be a nondecreasing multiple of the
  *      batch size (a torn or double-counted read fails here);
  *   5. the final row multiset is exact: every (k, batch) ingested, once.
  *
  * Run: `sbt "runMain graft.CompactionSoak [nBatches] [workDir]"`
  * (defaults 1000, tmp/compaction-soak); wired into round_gate --soak.
  */
object CompactionSoak {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val work = if (args.length > 1) args(1) else "tmp/compaction-soak"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val rowsPerBatch = 500L
    val keepBatches = 4
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val session = spark
    import session.implicits._

    val workPath = new org.apache.hadoop.fs.Path(work)
    val fs = workPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(workPath)) { val _ = fs.delete(workPath, true) }
    val _ = fs.mkdirs(workPath)
    val dir = s"$work/table"

    def bytesUnder(p: String): Long = {
      val hp = new org.apache.hadoop.fs.Path(p)
      if (fs.exists(hp)) fs.getContentSummary(hp).getLength else 0L
    }
    def compactVersions(): Map[Long, Long] =
      Option(new java.io.File(s"$dir/_compact").listFiles())
        .getOrElse(Array.empty)
        .collect {
          case f if f.getName.startsWith("v=") =>
            f.getName.stripPrefix("v=").toLong -> bytesUnder(s"$dir/_compact/${f.getName}/data")
        }
        .toMap
    def liveBatches(): Int =
      Option(new java.io.File(dir).listFiles())
        .getOrElse(Array.empty)
        .count(_.getName.startsWith("batch="))

    var fail = false

    // Concurrent reader: the 1-s-trigger race drill, at higher frequency.
    val readerErr = new AtomicReference[Throwable](null)
    val readerReads = new AtomicInteger(0)
    val lastCount = new AtomicLong(0L)
    @volatile var stopReader = false
    val reader = new Thread(() =>
      try {
        while (!stopReader) {
          val c = DerivedTable.withRead(spark, dir)(_.count())
          val prev = lastCount.getAndSet(c)
          if (c < prev || c % rowsPerBatch != 0)
            throw new IllegalStateException(
              s"reader saw count $c after $prev (must be a nondecreasing multiple of $rowsPerBatch)"
            )
          readerReads.incrementAndGet()
          Thread.sleep(50)
        }
      } catch { case t: Throwable => readerErr.set(t) }
    )

    var ingestedBytes = 0L
    var rewriteBytes = 0L
    var cycles = 0
    val cycleLat = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to n).foreach { i =>
      (0L until rowsPerBatch)
        .map(k => (i * rowsPerBatch + k, s"v$i"))
        .toDF("k", "v")
        .write
        .mode("overwrite")
        .parquet(s"$dir/batch=$i")
      if (i == 1) reader.start()
      if (i % keepBatches == 0) {
        // Everything this cycle folds is the batches between the previous
        // cutoff and the new one — with cadence == keepBatches that is
        // exactly the last `keepBatches` batches' bytes.
        val foldLo = math.max(1, i - 2 * keepBatches + 1)
        ingestedBytes += (foldLo to i - keepBatches).map(b => bytesUnder(s"$dir/batch=$b")).sum
        val before = compactVersions().keySet
        val t0 = System.nanoTime()
        DerivedTable.compact(spark, dir, keepBatches)
        cycleLat += (System.nanoTime() - t0) / 1e9
        cycles += 1
        rewriteBytes += compactVersions().collect {
          case (v, b) if !before.contains(v) => b
        }.sum
        if (cycles % 25 == 0) {
          val runs = DerivedTable.chain(spark, dir).size
          val amp = rewriteBytes.toDouble / math.max(1L, ingestedBytes)
          println(f"[compaction-soak] cycle $cycles%4d: runs=$runs live=${liveBatches()} " +
            f"amp=$amp%.2f last=${cycleLat.last}%.2fs")
          if (liveBatches() > 3 * keepBatches) {
            println(s"FAIL: live batch listing grew to ${liveBatches()}"); fail = true
          }
        }
      }
    }
    stopReader = true
    reader.join(30000)

    val logBound = math.log(cycles.toDouble) / math.log(2.0) + 2.0
    val amp = rewriteBytes.toDouble / math.max(1L, ingestedBytes)
    println(f"[compaction-soak] rewrite amplification: $amp%.2fx over $cycles cycles " +
      f"(O(log) bound ${logBound}%.1fx; the O(history) design measures ~${cycles / 2}x)")
    if (amp > logBound) { println("FAIL: rewrite amplification exceeds the O(log) envelope"); fail = true }

    val runs = DerivedTable.chain(spark, dir).size
    println(s"[compaction-soak] final chain: $runs runs (bound ${logBound.toInt + 2})")
    if (runs > logBound.toInt + 2) { println("FAIL: run chain is not logarithmic"); fail = true }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) 0.0 else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val early = median(cycleLat.slice(5, math.min(55, cycleLat.size)).toSeq)
    val late = median(cycleLat.takeRight(50).toSeq)
    println(f"[compaction-soak] per-cycle median: early=$early%.2fs late=$late%.2fs " +
      f"ratio=${late / early}%.2f")
    if (late > 2.0 * early) { println("FAIL: per-cycle latency is not flat"); fail = true }

    // Exact final multiset: n*rowsPerBatch distinct keys, each batch whole.
    val got = DerivedTable.read(spark, dir)
    val total = got.count()
    val distinctK = got.select("k").distinct().count()
    val batchCounts = got.groupBy("batch").count().as[(Long, Long)].collect().toMap
    val batchesOk = (1L to n.toLong).forall(b => batchCounts.get(b).contains(rowsPerBatch))
    println(s"[compaction-soak] final rows=$total distinct=$distinctK batchesExact=$batchesOk")
    if (total != n * rowsPerBatch || distinctK != total || !batchesOk) {
      println("FAIL: final row multiset is not exact"); fail = true
    }

    println(s"[compaction-soak] concurrent reader: ${readerReads.get()} reads, " +
      s"err=${Option(readerErr.get()).map(_.toString).getOrElse("none")}")
    if (readerErr.get() != null || readerReads.get() == 0) {
      println("FAIL: concurrent reader raced a prune past the retry"); fail = true
    }

    spark.stop()
    if (fail) sys.exit(1)
    println(s"[compaction-soak] PASS ($n batches, $cycles cycles)")
  }
}
