package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession

import graft.log.{LogConfig, SparkLog}

/** Long-run soak for the streaming embedding-drift monitor
  * ([[Engine.pcaDriftFrom]]) — the indefinite-run contract the r12 design
  * could not honor (it re-read every historical partials partition per
  * batch, O(history) per trigger). Over `n` micro-batches (default 1000)
  * it asserts the r13 bounded-state design end to end:
  *
  *   1. every monitor dir (`gram`, `merged`, `pc`) holds ≤ 2 `batch=*`
  *      partitions at every checkpointed probe — the per-batch merge
  *      physically cannot re-read history;
  *   2. per-batch latency stays FLAT: the median of the last 100 batches
  *      must be ≤ 2× the median of batches 20–120 (the r12 design grows
  *      linearly — at 1000 batches it re-read 1000 partitions per
  *      trigger and failed this by an order of magnitude);
  *   3. the final readout matches the exact fixed-point PCA over every
  *      ingested vector: recomputed here through the literally shared
  *      batch arithmetic on a fresh frame of the same vectors.
  *
  * Run: `sbt "runMain graft.DriftSoak [nBatches] [workDir]"` (defaults
  * 1000, tmp/drift-soak); wired into `tools/round_gate.sh --soak`.
  */
object DriftSoak {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val work = if (args.length > 1) args(1) else "tmp/drift-soak"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val workPath = new org.apache.hadoop.fs.Path(work)
    val workFs = workPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (workFs.exists(workPath)) { val _ = workFs.delete(workPath, true) }
    val _ = workFs.mkdirs(workPath)
    val raw = SparkLog(spark, s"$work/raw", LogConfig())
    val engine = Engine(spark, s"$work/eng")
    val drift = s"$work/drift"

    val rnd = new Random(13)
    val dim = 4
    // All vectors drawn upfront (4-dp quantized so the JSON round trip is
    // exact); batch 1 carries the first THREE (a 1-vector corpus has a
    // zero scatter matrix — ev_share would divide by a zero trace), later
    // batches one each.
    val allVecs: IndexedSeq[(Long, Array[Double])] = (1 to (n + 2)).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextDouble() * 2 - 1).map(x => f"$x%.4f".toDouble))
    }
    def rec(idv: (Long, Array[Double])): Array[Byte] =
      s"""{"vec_id":${idv._1},"embedding":[${idv._2.map(x => f"$x%.4f").mkString(",")}]}""".getBytes
    def parts(sub: String): Int =
      Option(new java.io.File(s"$drift/$sub").listFiles())
        .getOrElse(Array.empty)
        .count(_.getName.startsWith("batch="))

    val lat = scala.collection.mutable.ArrayBuffer.empty[Double]
    var fail = false
    val q = engine.pcaDriftFrom(raw.dir, s"$work/ckpt", drift)
    try {
      (1 to n).foreach { i =>
        raw.append(
          if (i == 1) allVecs.take(3).map(rec)
          else Seq(rec(allVecs(i + 1)))
        )
        val t0 = System.nanoTime()
        q.processAllAvailable()
        lat += (System.nanoTime() - t0) / 1e9
        if (i % 100 == 0) {
          val counts = Seq("gram", "merged", "pc").map(s => s -> parts(s))
          println(f"[drift-soak] batch $i%4d: last=${lat.last}%.2fs " +
            counts.map { case (s, c) => s"$s=$c" }.mkString(" "))
          counts.foreach { case (s, c) =>
            if (c > 2) { println(s"FAIL: $s grew to $c partitions"); fail = true }
          }
        }
      }
    } finally q.stop()

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) 0.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val early = median(lat.slice(20, math.min(120, lat.size)).toSeq)
    val late = median(lat.takeRight(100).toSeq)
    println(f"[drift-soak] per-batch median: early=$early%.3fs late=$late%.3fs " +
      f"ratio=${late / early}%.2f over ${lat.size} batches")
    if (late > 2.0 * early) { println("FAIL: per-batch latency is not flat"); fail = true }

    // Readout bit-equality against the literally shared batch arithmetic
    // over the SAME vectors (fresh frame, same quantization).
    val session = spark
    import session.implicits._
    val quantized = allVecs
      .map(_._2.map(x => math.round(x * 10000)))
      .toDF("q")
    val scat = graft.queries.Checkpoints.scoped {
      val merged = graft.queries.Checkpoints.checkpoint(
        graft.queries.Similarity
          .scatterPartials(quantized)
          .groupBy("i", "j")
          .agg(org.apache.spark.sql.functions.sum("p").as("p"))
      )
      graft.queries.Similarity
        .pcaFromScatter(graft.queries.Similarity.scatterAssemble(merged))
        .as[(Int, Double, Double)]
        .collect()
        .toSeq
    }
    val got = Engine
      .pcaDriftReport(spark, drift)
      .as[(Int, Double, Double)]
      .collect()
      .toSeq
    graft.queries.Checkpoints.release()
    if (got != scat) {
      println(s"FAIL: streamed readout != batch arithmetic\n  got   : $got\n  expect: $scat")
      fail = true
    } else println(s"[drift-soak] readout bit-equal to batch PCA over ${n + 2} vectors")

    spark.stop()
    if (fail) sys.exit(1)
    println(s"DRIFT SOAK OK: $n micro-batches, bounded state, flat latency")
  }
}
