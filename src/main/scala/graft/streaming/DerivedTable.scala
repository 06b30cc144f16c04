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
  * periodically fold old partitions into compaction RUNS.
  *
  * Runs are TIERED (r13 advice): a single base generation rewritten every
  * compaction costs O(total history rows) per fold — micro-batch latency
  * at the cadence grows without bound and cumulative write amplification
  * is quadratic, the very pattern the drift monitor removed in r13.
  * Instead each compaction folds ONLY the new live batches into a fresh
  * small run covering the span `(lo, cutoff]`, then merges adjacent runs
  * geometrically (newest two merge while the newer is ≥ half the older's
  * bytes), so run sizes grow ~2× with age: the live run count stays
  * O(log total), each row is rewritten O(log total) times over the
  * table's whole life, and the per-trigger fold is O(new rows) except at
  * doubling boundaries.
  *
  * Layout (the live `batch=*` partitions stay the write path — the
  * compactor never touches the writer's protocol):
  *
  * {{{
  *   <dir>/batch=<id>/...               live partitions (recent batches)
  *   <dir>/_compact/v=<N>/data/         rows from batches in (lo, cutoff]
  *   <dir>/_compact/v=<N>/_complete     "cutoff=<C>;lo=<L>" — marker, LAST
  * }}}
  *
  * `_compact` is underscore-prefixed, so Spark's partition discovery over
  * the dir root never sees it; readers MUST go through [[readOpt]], which
  * unions the resolvable run CHAIN with the live partitions above its
  * newest cutoff — that filter, not the prune, is what makes the read
  * duplicate-free, so a crash between marker and prune is invisible.
  * The chain resolves newest-version-first: a run is accepted iff its
  * span slots under everything already accepted, so a committed merge
  * shadows the runs it folded even while they still exist on disk.
  *
  * Crash-safety is the versioned-artifact recipe used across the engine
  * ([[graft.queries.AnnIndex]], [[graft.queries.Tokenizer]]): data before
  * marker, marker written last, a half-written run is invisible and
  * cleared by the next compaction (version numbers only ever grow).
  * Retention is live-chain: a run or live batch superseded by THIS
  * compaction survives until the NEXT one — never deleted under a reader
  * that resolved the pre-commit chain an instant earlier. Readers that
  * race two commits behind retry through [[withRead]].
  *
  * Single-writer contract: the owning streaming query's foreachBatch is
  * the only compactor (same contract as the partitions themselves).
  */
object DerivedTable {

  private val BatchRe = "^batch=(\\d+)$".r
  private val VersionRe = "^v=(\\d+)$".r

  /** A committed compaction run covering live-batch span `(lo, cutoff]`. */
  private[graft] final case class Run(version: Long, lo: Long, cutoff: Long)

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

  /** All compaction version numbers (complete or not), sorted. */
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

  // Markers carry a terminator token so a crash-truncated PUT can never
  // parse as a (shorter) valid marker, and the parse is a FULL-match
  // regex: any anomaly — a missing `;end` (a truncated `cutoff=C;lo=L`
  // prefix can carry a mid-digit-cut lo, claiming a broader span than its
  // rows cover and shadowing older runs), a bare legacy `cutoff=12`
  // (possibly truncated from `cutoff=123;…`, which the old lenient
  // split-parse accepted with a wrong cutoff AND lo=MinValue), or a
  // garbled numeric tail (NumberFormatException made chain()/compact()
  // fail persistently) — reads as a TORN run (None), which the chain walk
  // already handles: the folded runs stay resolvable.
  private val MarkerRe = """cutoff=(-?\d+);lo=(-?\d+);end""".r

  /** Parse a run's commit marker; None for absent OR torn/garbled. */
  private def readMarker(spark: SparkSession, dir: String, v: Long): Option[Run] = {
    val f = fs(spark, dir)
    val p = new Path(s"$dir/_compact/v=$v/_complete")
    if (!f.exists(p)) None
    else {
      // An UNREADABLE marker (torn checksum sidecar, truncated stream) is
      // torn, same as a failed parse: fall back to the folded runs, which
      // still hold the exact row multiset.
      val meta =
        try {
          val in = f.open(p)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        } catch { case _: java.io.IOException => "" }
      meta.trim match {
        case MarkerRe(c, lo) => Some(Run(v, lo.toLong, c.toLong))
        case _               => None
      }
    }
  }

  /** The resolvable run chain, newest span first. Walk complete runs by
    * DESCENDING version, accepting a run iff its span slots entirely under
    * everything already accepted — so a committed merge shadows the runs
    * it folded, and a torn merge (no marker) leaves the folded runs
    * resolvable. Spans are contiguous by construction (every fresh run
    * starts at the previous head cutoff; merges preserve coverage), so the
    * accepted chain covers exactly `(MinValue, head.cutoff]`.
    */
  private[graft] def chain(spark: SparkSession, dir: String): Seq[Run] = {
    val complete = versions(spark, dir).reverse.flatMap(v => readMarker(spark, dir, v))
    val acc = scala.collection.mutable.ListBuffer.empty[Run]
    var lowBound = Long.MaxValue
    complete.foreach { r =>
      if (r.cutoff <= lowBound && r.cutoff > r.lo) {
        acc += r
        lowBound = r.lo
      }
    }
    acc.toList
  }

  /** Newest resolvable cutoff, if any run has ever committed. */
  private[graft] def currentCutoff(spark: SparkSession, dir: String): Option[Long] =
    chain(spark, dir).headOption.map(_.cutoff)

  /** The derived table's full row set: every run in the resolvable chain
    * plus every live batch partition ABOVE the newest cutoff (the `batch`
    * column rides along as a regular long column). None when nothing has
    * ever been committed — the "no finalized rows yet" signal.
    * Duplicate-free through every crash window: rows at or below the
    * cutoff are served from runs even while their original partitions
    * await pruning, and merged-away runs are shadowed by the merge's span.
    */
  def readOpt(spark: SparkSession, dir: String): Option[DataFrame] = {
    val ids = committedBatchIds(spark, dir)
    val runs = chain(spark, dir)
    if (runs.isEmpty) {
      if (ids.isEmpty) None
      else Some(liveRead(spark, dir, ids).withColumn("batch", col("batch").cast("long")))
    } else {
      val base = runs
        .map(r => spark.read.parquet(s"$dir/_compact/v=${r.version}/data"))
        .reduce(_ unionByName _)
      val cutoff = runs.head.cutoff
      val above = ids.filter(_ > cutoff)
      if (above.isEmpty) Some(base)
      else
        Some(
          base.unionByName(
            liveRead(spark, dir, above)
              .filter(col("batch") > cutoff)
              .withColumn("batch", col("batch").cast("long"))
          )
        )
    }
  }

  /** Live batch ids a reader may serve: only JOB-COMMITTED partitions.
    * A `batch=<id>` directory is visible the moment its first task output
    * moves into place, but the `_SUCCESS` marker lands only at job commit —
    * a reader racing an in-flight trigger (found by the compaction soak's
    * 50 ms read loop: count 10375 of a 500-row batch) must not see the
    * partial task outputs. A crashed trigger replays under the same epoch
    * id with mode=overwrite, so skipping unmarked partitions never drops
    * committed rows. Fallback: if NO live partition carries a marker, the
    * writer runs with marksuccessfuljobs disabled — serve them all (the
    * pcaDriftReport convention; this repo's sinks keep markers on).
    */
  private def committedBatchIds(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val ids = batchIds(spark, dir)
    val marked = ids.filter(id => f.exists(new Path(s"$dir/batch=$id/_SUCCESS")))
    if (marked.nonEmpty) marked else ids
  }

  /** Read exactly the given live partitions, keeping `batch` a partition
    * column (basePath) so the schema matches a whole-directory read.
    */
  private def liveRead(spark: SparkSession, dir: String, ids: Seq[Long]): DataFrame =
    spark.read
      .option("basePath", dir)
      .parquet(ids.map(id => s"$dir/batch=$id"): _*)

  /** [[readOpt]] for callers that know the table exists (the Engine
    * report readouts, called after the owning stream committed batches).
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    readOpt(spark, dir).getOrElse(
      throw new IllegalStateException(s"no committed derived-table rows under $dir")
    )

  /** Run a readout against the table, re-resolving and retrying when the
    * owning stream's compactor pruned files out from under the scan (r13
    * advice: live-chain retention protects a reader one commit behind;
    * one racing TWO commits behind — possible at a 1 s trigger cadence —
    * sees FileNotFound). The retry re-lists the chain, which by then
    * points at the current runs. Deterministic because the table's ROW
    * multiset is append-final: any successful resolution reads the same
    * rows.
    */
  def withRead[T](spark: SparkSession, dir: String)(f: DataFrame => T): T = {
    def isFileGone(e: Throwable): Boolean =
      e != null && (e.isInstanceOf[java.io.FileNotFoundException] || isFileGone(e.getCause))
    var attempts = 0
    var out: Option[T] = None
    while (out.isEmpty) {
      attempts += 1
      try out = Some(f(read(spark, dir)))
      catch {
        case e: Throwable if isFileGone(e) && attempts < 3 =>
          // Back off past the prune window before re-listing: an immediate
          // retry at a 1 s trigger cadence can land in the same compaction
          // cycle it just raced and hit the identical FileNotFound.
          Thread.sleep(300L * attempts)
      }
    }
    out.get
  }

  private def bytesUnder(spark: SparkSession, dir: String, path: String): Long = {
    val f = fs(spark, dir)
    val p = new Path(path)
    if (f.exists(p)) f.getContentSummary(p).getLength else 0L
  }

  /** Write one run: data first, marker last. Sizes the file count by
    * bytes (~128 MB targets), never by the input's partition count —
    * per-trigger partitions are tiny, a merged base must not collapse to
    * one single-threaded file either. coalesce (no shuffle) only ever
    * REDUCES the count.
    */
  private def writeRun(
      spark: SparkSession,
      dir: String,
      v: Long,
      lo: Long,
      cutoff: Long,
      rows: DataFrame,
      inputBytes: Long
  ): Unit = {
    val f = fs(spark, dir)
    val vd = s"$dir/_compact/v=$v"
    if (f.exists(new Path(vd))) { val _ = f.delete(new Path(vd), true) }
    val targetFiles = math.max(1L, (inputBytes + (128L << 20) - 1) / (128L << 20)).toInt
    rows.coalesce(targetFiles).write.mode("overwrite").parquet(s"$vd/data")
    // Marker gets the same atomic-PUT discipline as the data: write a temp
    // name, then rename — a reader never observes a partially-written
    // `_complete` (and the `;end` terminator catches non-atomic stores).
    val tmp = new Path(s"$vd/_complete.tmp")
    val out = f.create(tmp, true)
    try out.write(s"cutoff=$cutoff;lo=$lo;end".getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, new Path(s"$vd/_complete")))
      throw new java.io.IOException(s"marker rename failed under $vd")
  }

  /** Fold every live batch partition except the newest `keepBatches` into
    * a fresh run, then merge runs geometrically. No-op when there is
    * nothing new to fold. The fresh fold reads ONLY the new partitions;
    * merges rewrite a row O(log total) times over the table's life.
    */
  def compact(spark: SparkSession, dir: String, keepBatches: Int = 4): Unit = {
    require(keepBatches >= 1, "keepBatches must keep at least the in-flight batch live")
    val f = fs(spark, dir)
    // Fold only job-committed partitions (same rule as readOpt): a torn
    // in-flight batch must neither fold partial rows into a run nor
    // advance the cutoff past an epoch its writer will replay.
    val ids = committedBatchIds(spark, dir)
    // Snapshot what was ALREADY superseded before this cycle: those runs
    // were unreferenced at the previous commit, so only a reader two
    // commits behind could touch them — they die now (depth-1 live-chain,
    // backstopped by withRead's retry). Runs superseded BY this cycle's
    // merges survive until the next compaction.
    val chain0 = chain(spark, dir)
    val complete0 = versions(spark, dir).flatMap(v => readMarker(spark, dir, v))
    val superseded0 = complete0.map(_.version).toSet -- chain0.map(_.version).toSet
    val prevCutoff = chain0.headOption.map(_.cutoff).getOrElse(Long.MinValue)
    val newCutoff = ids.dropRight(keepBatches).lastOption.getOrElse(return)
    if (newCutoff <= prevCutoff) return
    // Torn attempts (data without marker) are invisible to every reader
    // and we are the only writer — clear them so version numbers stay
    // monotonic and debris does not accumulate across crashes.
    val torn = versions(spark, dir).filter(v => readMarker(spark, dir, v).isEmpty)
    torn.foreach(v => f.delete(new Path(s"$dir/_compact/v=$v"), true))
    var nextV = (versions(spark, dir) ++ complete0.map(_.version)).foldLeft(0L)(math.max) + 1

    // Fresh run: ONLY the new live partitions — O(new rows), regardless
    // of history length.
    val foldIds = ids.filter(id => id > prevCutoff && id <= newCutoff)
    val freshBytes = foldIds.map(id => bytesUnder(spark, dir, s"$dir/batch=$id")).sum
    val fresh = spark.read
      .parquet(dir)
      .filter(col("batch") > prevCutoff && col("batch") <= newCutoff)
      .withColumn("batch", col("batch").cast("long"))
    writeRun(spark, dir, nextV, prevCutoff, newCutoff, fresh, freshBytes)
    nextV += 1

    // Geometric merge ladder: while the newest run is at least half the
    // size of its older neighbor, fold the two into one run covering both
    // spans. Sizes then grow ≥2× with age → O(log total) runs, O(log
    // total) lifetime rewrites per row.
    var runs = chain(spark, dir)
    var merging = true
    while (merging && runs.size >= 2) {
      val newer = runs(0)
      val older = runs(1)
      val newerBytes = bytesUnder(spark, dir, s"$dir/_compact/v=${newer.version}/data")
      val olderBytes = bytesUnder(spark, dir, s"$dir/_compact/v=${older.version}/data")
      if (newerBytes * 2 >= olderBytes) {
        val merged = spark.read
          .parquet(s"$dir/_compact/v=${older.version}/data")
          .unionByName(spark.read.parquet(s"$dir/_compact/v=${newer.version}/data"))
        writeRun(spark, dir, nextV, older.lo, newer.cutoff, merged, newerBytes + olderBytes)
        nextV += 1
        runs = chain(spark, dir)
      } else merging = false
    }

    // Live-chain prune: what NO resolvable chain as of the PREVIOUS
    // commit can reference. A crash anywhere below just leaves debris the
    // next compaction removes.
    superseded0.foreach(v => f.delete(new Path(s"$dir/_compact/v=$v"), true))
    // Prune from the FULL listing (marked or not): unmarked debris below
    // the cutoff is a dead crash remnant — its committed incarnation was
    // folded long ago — and must not accumulate.
    batchIds(spark, dir).filter(_ <= prevCutoff).foreach { old =>
      f.delete(new Path(s"$dir/batch=$old"), true)
    }
  }
}
