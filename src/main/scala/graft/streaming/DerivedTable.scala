package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared layout + compaction for streamed DERIVED TABLES — the
  * `<dir>/batch=<id>` parquet partitions every exactly-once foreachBatch
  * sink writes ([[graft.Engine]]'s topK/daily/flow/sessions/attribution/
  * funnel surfaces). Rows are append-FINAL (each batch's partition holds
  * only rows finalized by that batch; no partition is ever read back by
  * the writer), so the only unbounded cost is small-file growth: one tiny
  * parquet directory per trigger, forever — a 1 s trigger over a day is
  * 86k directories for a reader to list. This is the log's own problem
  * solved the log's own way (`SparkLog.compact`, reference snapshot D4):
  * periodically fold old partitions into one base generation.
  *
  * Layout after compaction (the live `batch=*` partitions stay the write
  * path — the compactor never touches the writer's protocol):
  *
  * {{{
  *   <dir>/batch=<id>/...               live partitions (recent batches)
  *   <dir>/_compact/v=<N>/data/         all rows from batches ≤ cutoff
  *   <dir>/_compact/v=<N>/_complete     "cutoff=<C>" — commit marker, LAST
  * }}}
  *
  * `_compact` is underscore-prefixed, so Spark's partition discovery over
  * the dir root never sees it; readers MUST go through [[readOpt]], which
  * unions the newest complete generation with the live partitions ABOVE
  * its cutoff — that filter, not the prune, is what makes the read
  * duplicate-free, so a crash between marker and prune is invisible.
  *
  * Crash-safety is the versioned-artifact recipe used across the engine
  * ([[graft.queries.AnnIndex]], [[graft.queries.Tokenizer]]): data before
  * marker, marker written last, a half-written generation is invisible
  * and overwritten by the next attempt at the same number. Retention is
  * live-chain: generation N's commit prunes live batches ≤ cutoff(N−1)
  * and generations ≤ N−2 — never what a reader that resolved N−1 an
  * instant earlier could still be scanning.
  *
  * Single-writer contract: the owning streaming query's foreachBatch is
  * the only compactor (same contract as the partitions themselves).
  */
object DerivedTable {

  private val BatchRe = "^batch=(\\d+)$".r
  private val VersionRe = "^v=(\\d+)$".r

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Sorted batch ids under a `batch=<id>`-partitioned dir; empty when the
    * dir does not exist yet. One `listStatus`, no data read.
    */
  private[graft] def batchIds(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(dir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) Seq.empty
    else
      f.listStatus(p)
        .toSeq
        .collect {
          case st if st.isDirectory =>
            st.getPath.getName match {
              case BatchRe(n) => Some(n.toLong)
              case _          => None
            }
        }
        .flatten
        .sorted
  }

  /** All compaction generation numbers (complete or not), sorted. */
  private def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(s"$dir/_compact")
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else
      f.listStatus(p)
        .toSeq
        .collect {
          case st if st.isDirectory =>
            st.getPath.getName match {
              case VersionRe(n) => Some(n.toLong)
              case _            => None
            }
        }
        .flatten
        .sorted
  }

  /** Newest COMPLETE generation and its cutoff, if any. */
  private[graft] def currentCompact(spark: SparkSession, dir: String): Option[(Long, Long)] = {
    val f = fs(spark, dir)
    versions(spark, dir).reverse.collectFirst {
      case v if f.exists(new Path(s"$dir/_compact/v=$v/_complete")) =>
        val in = f.open(new Path(s"$dir/_compact/v=$v/_complete"))
        val meta =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        (v, meta.stripPrefix("cutoff=").trim.toLong)
    }
  }

  /** The derived table's full row set: the newest complete compaction
    * generation plus every live batch partition ABOVE its cutoff (the
    * `batch` column rides along as a regular long column). None when
    * nothing has ever been committed — the "no finalized rows yet"
    * signal. Duplicate-free through every crash window: rows at or below
    * the cutoff are served from the generation even while their original
    * partitions await pruning.
    */
  def readOpt(spark: SparkSession, dir: String): Option[DataFrame] = {
    val ids = batchIds(spark, dir)
    currentCompact(spark, dir) match {
      case None =>
        if (ids.isEmpty) None
        else Some(spark.read.parquet(dir).withColumn("batch", col("batch").cast("long")))
      case Some((v, cutoff)) =>
        val base = spark.read.parquet(s"$dir/_compact/v=$v/data")
        if (ids.forall(_ <= cutoff)) Some(base)
        else
          Some(
            base.unionByName(
              spark.read
                .parquet(dir)
                .filter(col("batch") > cutoff)
                .withColumn("batch", col("batch").cast("long"))
            )
          )
    }
  }

  /** [[readOpt]] for callers that know the table exists (the Engine
    * report readouts, called after the owning stream committed batches).
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    readOpt(spark, dir).getOrElse(
      throw new IllegalStateException(s"no committed derived-table rows under $dir")
    )

  /** Fold every live batch partition except the newest `keepBatches` into
    * the next compaction generation. No-op when there is nothing new to
    * fold. Cost is one read of (previous generation + the folded
    * partitions) and one write — rows are copied once per compaction, so
    * at a fixed cadence the table's small-file count stays bounded by
    * roughly cadence + keepBatches directories while total rewrite work
    * stays O(rows) per compaction.
    */
  def compact(spark: SparkSession, dir: String, keepBatches: Int = 4): Unit = {
    require(keepBatches >= 1, "keepBatches must keep at least the in-flight batch live")
    val ids = batchIds(spark, dir)
    val cur = currentCompact(spark, dir)
    val prevCutoff = cur.map(_._2).getOrElse(Long.MinValue)
    val newCutoff = ids.dropRight(keepBatches).lastOption.getOrElse(return)
    if (newCutoff <= prevCutoff) return
    val v = cur.map(_._1).getOrElse(0L) + 1
    val f = fs(spark, dir)
    val vd = s"$dir/_compact/v=$v"
    // A crash mid-write left this number half-built and invisible (no
    // marker); clear it before rebuilding at the same number.
    if (f.exists(new Path(vd))) { val _ = f.delete(new Path(vd), true) }
    val fresh = spark.read
      .parquet(dir)
      .filter(col("batch") > prevCutoff && col("batch") <= newCutoff)
      .withColumn("batch", col("batch").cast("long"))
    val folded = cur match {
      case Some((pv, _)) =>
        spark.read.parquet(s"$dir/_compact/v=$pv/data").unionByName(fresh)
      case None => fresh
    }
    // Size the generation's file count by bytes, not by the input's
    // partition count: per-trigger partitions are tiny (files would
    // accumulate one-per-batch forever), while a year-old base must not
    // collapse to one single-threaded file either. coalesce (no shuffle)
    // only ever REDUCES the count toward ~128 MB files.
    def bytesUnder(path: String): Long = {
      val p = new Path(path)
      if (f.exists(p)) f.getContentSummary(p).getLength else 0L
    }
    val totalBytes = cur.map(c => bytesUnder(s"$dir/_compact/v=${c._1}/data")).getOrElse(0L) +
      ids.filter(id => id > prevCutoff && id <= newCutoff).map(id => bytesUnder(s"$dir/batch=$id")).sum
    val targetFiles = math.max(1L, (totalBytes + (128L << 20) - 1) / (128L << 20)).toInt
    folded.coalesce(targetFiles).write.mode("overwrite").parquet(s"$vd/data")
    // Commit marker LAST; everything before this line is invisible.
    val out = f.create(new Path(s"$vd/_complete"), true)
    try out.write(s"cutoff=$newCutoff".getBytes("UTF-8"))
    finally out.close()
    // Live-chain prune: a reader that resolved generation v−1 just before
    // this commit still needs v−1's data AND the live partitions above
    // v−1's cutoff — so prune only what NO resolvable generation can
    // reference. A crash anywhere below here just leaves debris the next
    // compaction removes.
    versions(spark, dir).filter(_ < v - 1).foreach { old =>
      f.delete(new Path(s"$dir/_compact/v=$old"), true)
    }
    ids.filter(_ <= prevCutoff).foreach { old =>
      f.delete(new Path(s"$dir/batch=$old"), true)
    }
  }
}
