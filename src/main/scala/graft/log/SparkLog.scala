package graft.log

import java.util.UUID

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The Spark-native commit log — the heart of the engine.
  *
  * Re-expresses the reference's segmented append-only log
  * (reference: internal/log/log.go, segment.go, store.go, index.go) on
  * Parquet + a JSON manifest:
  *
  *   - a log is a directory of `segment=<baseOffset>` sub-directories, each
  *     holding one or more Parquet part files (the analog of a
  *     `<base>.store` file, reference: internal/log/segment.go:24-31);
  *   - offsets are assigned contiguously by this single-writer commit path —
  *     the total-order property the reference obtains from Raft
  *     (reference: internal/log/distributed.go:99-131) falls out of the Spark
  *     driver being the one commit point, no consensus needed;
  *   - the per-record mmap index (reference: internal/log/index.go) is
  *     replaced by Parquet row-group min/max statistics on `offset` plus the
  *     manifest's segment map: a point read opens exactly one segment
  *     directory and prunes row groups via footer stats;
  *   - publish is atomic: part files are written to a `_tmp-*` staging dir
  *     (hidden from Spark's file listing) and renamed into the segment dir,
  *     then the manifest swaps atomically ([[LogFs]] picks the protocol per
  *     backend). Readers never observe a torn segment — the property the
  *     reference gets from index-truncate-on-close
  *     (reference: internal/log/index.go:68-79).
  *
  * Scale notes (100 TB design): reads are pure Spark scans (filter pushdown,
  * partition-value pruning on `segment`, row-group skipping); `appendDF` is
  * the bulk-ingest path that writes a full batch in parallel across
  * executors with per-partition offset ranges computed from one counting
  * pass — no driver collect of data, no global sort, no shuffle. The log
  * directory may live on any Hadoop-supported filesystem (`hdfs://`,
  * `s3a://`, …): all file I/O routes through [[LogFs]], so executors never
  * need a shared POSIX mount.
  */
class SparkLog(
    val spark: SparkSession,
    val dir: String,
    val config: LogConfig = LogConfig(),
    /** Injectable wall clock (tests drive retention deterministically);
      * stamps new segments' `createdAtMillis`.
      */
    clock: () => Long = () => System.currentTimeMillis()
) {
  import SparkLog._

  private val fs: LogFs = LogFs.forPath(dir)

  fs.mkdirs(dir)
  recoverCompaction()

  @volatile private var manifest: LogManifest = _

  /** On-disk manifest version this writer last published (CAS target for the
    * next swap). Guarded by the instance monitor, same as every mutator.
    */
  private var metaSeq: Long = 0L

  /** appendDF pending-token segment dirs reconcile() found — their markers
    * are deleted only AFTER the claim swap durably commits the merged
    * tokens (deleting before would reopen the duplicate-apply window the
    * markers exist to close).
    */
  private var pendingTokenCleanup: Vector[Long] = Vector.empty

  /** The epoch under which this handle owns the log. Claiming bumps the
    * manifest's `writerEpoch` through one CAS swap, so opening a SparkLog
    * IS becoming the single writer — any previously open handle's next
    * swap observes the higher epoch and throws [[LogFencedException]]
    * instead of forking offset history. The inter-process enforcement of
    * the single-writer contract the reference gets from Raft leadership
    * (reference: internal/log/distributed.go:99-131).
    */
  val writerEpoch: Long = claim()

  private def claim(): Long = {
    var attempt = 0
    while (attempt < 8) {
      val cur = LogManifest.readWithSeq(dir)
      pendingTokenCleanup = Vector.empty
      val base = cur.map { case (_, m) => reconcile(m) }.getOrElse(recover())
      val seq = cur.map(_._1).getOrElse(0L)
      val claimed = base.copy(writerEpoch = base.writerEpoch + 1)
      if (LogManifest.writeCas(dir, claimed, seq)) {
        manifest = claimed
        metaSeq = seq + 1
        pendingTokenCleanup.foreach(b =>
          try fs.deleteMeta(segmentPath(b), PendingTokenFile)
          catch { case _: Exception => () }
        )
        pendingTokenCleanup = Vector.empty
        return claimed.writerEpoch
      }
      // Lost the claim race to another opener — re-read their manifest and
      // bump past THEIR epoch (re-running reconcile on the fresh state, so
      // a concurrent writer's committed appends are never reverted).
      attempt += 1
    }
    throw new java.io.IOException(
      s"could not claim log writer epoch after $attempt attempts (writers racing on $dir)"
    )
  }

  /** Fenced manifest publish — the ONLY post-claim path to disk. Stamps our
    * epoch, CAS-swaps at the next version; on a lost CAS re-reads: a
    * foreign epoch means another writer claimed the log → fail loudly
    * (callers roll back their staged data before rethrowing), while a
    * same-epoch loss can only be a listing race against our own prune —
    * refresh the sequence and retry.
    */
  private def swapManifest(m: LogManifest): Unit = {
    val stamped = m.copy(writerEpoch = writerEpoch)
    var attempt = 0
    while (!LogManifest.writeCas(dir, stamped, metaSeq)) {
      LogManifest.readWithSeq(dir) match {
        case Some((seq, onDisk)) =>
          if (onDisk.writerEpoch != writerEpoch)
            throw LogFencedException(dir, writerEpoch, onDisk.writerEpoch)
          metaSeq = seq
        case None => metaSeq = 0L
      }
      attempt += 1
      if (attempt >= 8)
        throw new java.io.IOException(s"manifest swap kept losing the version race: $dir")
    }
    metaSeq += 1
    manifest = stamped
    notifyCommit()
  }

  /** Commit listeners, fired after every successful manifest swap (append,
    * truncate, compaction, token commit) on the committing thread. The
    * gRPC ConsumeStream uses this to wake blocked tails the moment data
    * lands instead of sleep-polling. Listeners must be cheap and must not
    * throw (exceptions are swallowed — a notification must never fail a
    * committed write).
    */
  private val commitListeners = new java.util.concurrent.CopyOnWriteArrayList[Runnable]

  /** Register `l` to run after each commit; close the returned handle to
    * deregister.
    */
  private[graft] def onCommit(l: Runnable): AutoCloseable = {
    commitListeners.add(l)
    () => { commitListeners.remove(l); () }
  }

  private def notifyCommit(): Unit = {
    val it = commitListeners.iterator()
    while (it.hasNext) {
      try it.next().run()
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Finish or undo a compaction swap interrupted by a crash, then clear
    * stale working directories (`_tmp-*`, `_compact-*`, `_old-*` — safe
    * under the single-writer assumption). Idempotent under repeated
    * crashes: the journal is only removed once the log is consistent.
    */
  private def recoverCompaction(): Unit = {
    CompactJournal.read(dir).foreach { j =>
      val mOpt = LogManifest.read(dir)
      val forward = mOpt.exists(_.segments.exists(s => s.base == j.lo && s.next == j.next))
      if (forward) {
        // Manifest already points at the merged segment: finish deletions.
        j.olds.foreach { case (_, d) => fs.deleteRecursively(fs.child(dir, d)) }
      } else {
        // Roll back — SPLIT-RENAME-SAFE. On an object store a directory
        // rename is a per-file copy+delete, so a crash can leave ANY dir
        // half-moved: originals split across segment-<b> and _old-*, or
        // merged parts split across _compact-* and segment-<lo>. Treat
        // every state as a mixture; all steps are idempotent, so a crash
        // inside this rollback re-runs cleanly.
        val newDirPath = fs.child(dir, j.newDir)
        // 1. Evict merged data from segment-<lo>. The journal names the
        //    merged part files exactly (fresh UUIDs — no collision with an
        //    original part name is possible). Pre-field journals fall back
        //    to the old whole-dir heuristic, correct for atomic-rename
        //    backends where dirs never split.
        if (j.newParts.nonEmpty)
          j.newParts.foreach(n => fs.delete(fs.child(segmentPath(j.lo), n)))
        else {
          val loMoved = j.olds.find(_._1 == j.lo).map(o => fs.child(dir, o._2))
          if (
            loMoved.exists(fs.isDir) && !fs.isDir(newDirPath) &&
            fs.isDir(segmentPath(j.lo))
          )
            fs.deleteRecursively(segmentPath(j.lo))
        }
        // 2. Restore originals PER FILE: a file present on both sides
        //    means the copy landed and only the source delete was lost —
        //    drop the straggler (object PUTs appear complete or not at
        //    all, so the destination copy is whole).
        j.olds.foreach { case (b, d) =>
          val src = fs.child(dir, d)
          if (fs.isDir(src)) {
            fs.mkdirs(segmentPath(b))
            fs.list(src).foreach { f =>
              val dst = fs.child(segmentPath(b), fs.fileName(f))
              if (!fs.exists(dst)) fs.move(f, dst)
              else fs.delete(f)
            }
            fs.deleteRecursively(src)
          }
        }
        if (fs.isDir(newDirPath)) fs.deleteRecursively(newDirPath)
      }
      CompactJournal.delete(dir)
    }
    fs.list(dir)
      .filter { p =>
        val n = fs.fileName(p)
        n.startsWith("_tmp-") || n.startsWith("_compact-") || n.startsWith("_old-")
      }
      .foreach(fs.deleteRecursively)
  }

  // ---------------------------------------------------------------- append

  /** Append a single record, returning its assigned offset.
    * (reference: internal/log/log.go:80-92, segment.go:46-64)
    */
  def appendOne(value: Array[Byte]): Long = append(Seq(value))

  /** Append a batch of records; returns the offset of the first.
    *
    * Records are chunked into segments with the reference's roll rule: a
    * record lands in the active segment, and the segment seals once its
    * store bytes or record count reach the configured maxima
    * (reference: internal/log/segment.go:81-83, log.go:88-90). Store-byte
    * accounting mirrors the reference's 8-byte length prefix per record
    * (reference: internal/log/store.go:14-16).
    */
  def append(values: Seq[Array[Byte]]): Long = synchronized {
    require(values.nonEmpty, "append of empty batch")
    val first = manifest.nextOffset
    var m = manifest
    var off = first

    // Active (unsealed, non-empty) trailing segment, if any.
    var active: SegmentMeta = m.segments.lastOption.filter(s => !s.sealed_) match {
      case Some(s) => s
      case None    => SegmentMeta(off, off, 0L, 0L, sealed_ = false, createdAtMillis = clock())
    }
    var pending = Vector.newBuilder[LogRecord]
    var pendingFor = active.base
    val published = Vector.newBuilder[String]
    val markedDirs = scala.collection.mutable.LinkedHashSet.empty[String]

    def flush(): Unit = {
      val recs = pending.result()
      if (recs.nonEmpty) {
        // Publish-intent marker before the part becomes visible; re-check
        // it on every later flush into the same dir (ownership handshake —
        // see the marker Scaladoc).
        val segDir = segmentPath(pendingFor)
        if (markedDirs.add(segDir)) writeMarker(segDir) else checkMarker(segDir)
        published += writePart(pendingFor, recs)
      }
      pending = Vector.newBuilder[LogRecord]
    }

    def sealAndRoll(): Unit = {
      flush()
      active = active.copy(sealed_ = true)
      m = m.copy(segments = upsert(m.segments, active))
      active = SegmentMeta(off, off, 0L, 0L, sealed_ = false, createdAtMillis = clock())
      pendingFor = off
    }

    values.foreach { v =>
      pending += LogRecord(v, off)
      off += 1
      active = active.copy(
        next = off,
        bytes = active.bytes + (if (v == null) 0 else v.length) + LenWidth,
        records = active.records + 1
      )
      if (active.bytes >= config.maxStoreBytes || active.records >= config.maxRecordsPerSegment)
        sealAndRoll()
    }
    flush()
    m = m.copy(
      segments = upsert(m.segments, active).filterNot(_.isEmpty),
      nextOffset = off
    )
    // Publish order is data-then-manifest; if the manifest swap fails (I/O
    // or a fencing loss) the published parts must not stay behind — the
    // in-memory nextOffset is unchanged, so a retry would mint the SAME
    // offsets again and a later reconcile() would surface both copies as
    // duplicate records.
    try swapManifest(m)
    catch {
      case scala.util.control.NonFatal(e) =>
        // Per-dir journaled rollback (see the marker Scaladoc): only dirs
        // whose marker we win are ours to clean; a lost marker means a
        // claimant manifested those parts.
        val byDir = published.result().groupBy(fs.parent)
        markedDirs.foreach(d =>
          rollbackPublished(d, byDir.getOrElse(d, Vector.empty), tokenMarker = false)
        )
        throw e
    }
    markedDirs.foreach(d => try fs.delete(markerPath(d)) catch { case _: Exception => () })
    first
  }

  /** Bulk-ingest path: append every row of `df`'s `value` (binary) column,
    * assigning contiguous offsets, written in parallel as ONE new sealed
    * segment (split into bounded part files). Returns (firstOffset, count).
    *
    * Offset order follows the DataFrame's partition layout (a DataFrame has
    * no intrinsic row order): offsets are contiguous and each row gets
    * exactly one, but callers needing a specific record↔offset mapping must
    * order the input first (e.g. `df.orderBy(...).coalesce(1)` or a
    * range-partitioned sort).
    *
    * Contiguity across a distributed batch needs per-partition bases, which
    * needs per-partition counts — taken from the staged files' parquet
    * footers (metadata reads, no counting job).
    * `monotonically_increasing_id` would leave gaps and is therefore wrong
    * here (SURVEY.md §7.4).
    */
  def appendDF(df: DataFrame): (Long, Long) = appendDF(df, None)

  /** appendDF with an idempotence token `(source, epoch)`: the token commits
    * in the SAME atomic manifest swap as the data, so re-applying an
    * already-committed epoch (foreachBatch retry after a crash between
    * append and checkpoint) is a no-op — exactly-once ingest
    * (SURVEY §2.6). Returns (nextOffset, 0) when skipped.
    */
  def appendDF(df: DataFrame, token: Option[(String, Long)]): (Long, Long) = synchronized {
    token.foreach { case (name, epoch) =>
      // Validate the name BEFORE any data lands — failing in the final
      // manifest write would leave published files without their token.
      require(name.matches("[A-Za-z0-9_.-]+"), s"invalid token name: $name")
      if (manifest.tokens.get(name).exists(_ >= epoch))
        return (manifest.nextOffset, 0L)
    }
    // Stage once, then ride the sink's commit core: ONE traversal of the
    // input writes value-only staged parquet (the write itself snapshots a
    // nondeterministic source — sample(), rand() filters — where the old
    // count-then-write needed a MEMORY_AND_DISK persist to pin two
    // traversals to the same rows). Row counts come from the staged file
    // FOOTERS — driver-side metadata reads, one per task file, no counting
    // job — and `appendStaged` assigns per-file offset bases in file-name
    // (= partition) order and rewrites into final parts. Measured 2.8×
    // the persist+count+write throughput on the 100k-record LogBench set.
    val staging0 = stagingDir()
    df.select(col("value").cast("binary").as("value")).write.parquet(staging0)
    try {
      // Partition order comes from the NUMERIC part index in Spark's file
      // names, not lexicographic name order — part-%05d padding overflows
      // past 99,999 partitions and a string sort would interleave
      // part-100000 between part-10000 and part-10001, silently scrambling
      // a pre-sorted record↔offset mapping at exactly the scale this
      // engine targets.
      val partIdx = """part-(\d+)-.*""".r
      val named = fs
        .list(staging0)
        .filter(p => fs.fileName(p).endsWith(".parquet"))
        .map { p =>
          val idx = fs.fileName(p) match {
            case partIdx(i) => i.toLong
            // This method itself just wrote the staging dir, so every
            // .parquet here must carry Spark's part index. A non-matching
            // name (writer naming-scheme change, stray file) would
            // otherwise sort somewhere silently and scramble the
            // record↔offset mapping — fail instead.
            case other =>
              throw new java.io.IOException(
                s"unexpected file in appendDF staging (not part-<idx>-*): $other"
              )
          }
          (idx, p)
        }
        .sortBy { case (i, p) => (i, fs.fileName(p)) }
        .map(_._2)
      // Footer row counts in parallel: each is one independent metadata
      // read, and a serial loop would cost O(files) blocking round-trips
      // on an object store while holding the log's monitor.
      val counts = parallelMap(named, StagedParquet.rowCount)
      appendStaged(named.zip(counts), token) // reentrant: same lock, same thread
    } finally {
      try fs.deleteRecursively(staging0)
      catch { case _: Exception => () }
    }
  }

  /** Bounded-parallelism map preserving input order (driver-side metadata
    * fan-out; not for data-plane work).
    */
  private def parallelMap[A, B](xs: Vector[A], f: A => B): Vector[B] = {
    if (xs.size <= 1) return xs.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(16, xs.size))
    try {
      import scala.jdk.CollectionConverters._
      val tasks = xs.map(x => (() => f(x)): java.util.concurrent.Callable[B])
      pool.invokeAll(tasks.asJava).asScala.map(_.get()).toVector
    } finally pool.shutdown()
  }

  /** Shared tail of the bulk-ingest paths (`appendDF`, `appendStaged`):
    * publish staged parts into `segment=<base>`, seal it, and commit the
    * manifest (with the token, when present) in one atomic swap. Assumes
    * the pending-token marker is already in place (see appendDF).
    */
  private def publishAndCommit(
      staging: String,
      base: Long,
      total: Long,
      token: Option[(String, Long)]
  ): (Long, Long) = {
    val segDir = segmentPath(base)
    writeMarker(segDir)
    val (bytes, moved) = publishParts(staging, base)
    val seg = SegmentMeta(base, base + total, bytes, total, sealed_ = true, createdAtMillis = clock())
    val m0 = manifest
    val sealedPrev = m0.segments.lastOption.filter(!_.sealed_) match {
      case Some(last) => upsert(m0.segments, last.copy(sealed_ = true))
      case None       => m0.segments
    }
    val newTokens = token match {
      case Some((name, epoch)) => manifest.tokens + (name -> epoch)
      case None                => manifest.tokens
    }
    val m = LogManifest(sealedPrev :+ seg, base + total, newTokens)
    // Data-then-manifest: on a manifest-swap failure (I/O or fencing) our
    // unmanifested parts must not stay behind — a retry would mint the same
    // offsets again and manifest-less recovery would surface duplicates.
    // Rollback is SURGICAL — exactly the files this call moved in, plus our
    // pending-token marker — never the directory: under a fencing loss the
    // NEW writer may have already committed ITS OWN segment at this very
    // base (`segment=<our stale nextOffset>` is exactly where its next
    // commit lands), and a recursive delete would destroy the winner's
    // committed data. An emptied dir is removed best-effort.
    try swapManifest(m)
    catch {
      case scala.util.control.NonFatal(e) =>
        // Journaled, marker-gated: we win → roll back our files; a
        // claimant won → it manifested (and owns) them, including the
        // pending-token marker its reconcile merged — touch nothing.
        rollbackPublished(segDir, moved, token.isDefined)
        throw e
    }
    try fs.delete(markerPath(segDir))
    catch { case _: Exception => () }
    token.foreach(_ => try fs.deleteMeta(segDir, PendingTokenFile) catch { case _: Exception => () })
    (base, total)
  }

  /** Sink-commit path (DSv2 graft sink): append pre-staged value-only
    * parquet files, each with its writer-reported row count, assigning
    * contiguous offsets IN THE GIVEN FILE ORDER. Row counts come from the
    * sink tasks' commit messages, so — unlike `appendDF` — there is no
    * count pass and no driver-side cache of the batch: one distributed
    * rewrite job (one task per staged file, streaming I/O, constant
    * memory) turns staged values into final offset-carrying parts, then
    * the usual data-then-manifest publish commits them. The record↔offset
    * mapping is deterministic: file order × row order within each file.
    */
  private[graft] def appendStaged(
      files: Seq[(String, Long)],
      token: Option[(String, Long)]
  ): (Long, Long) = synchronized {
    token.foreach { case (name, epoch) =>
      require(name.matches("[A-Za-z0-9_.-]+"), s"invalid token name: $name")
      if (manifest.tokens.get(name).exists(_ >= epoch))
        return (manifest.nextOffset, 0L)
    }
    val base = manifest.nextOffset
    val nonEmpty = files.filter(_._2 > 0L)
    val total = nonEmpty.map(_._2).sum
    if (total == 0L) {
      // An empty commit still advances the token: a post-crash replay of
      // this epoch must be a provable no-op against a log that moved on.
      token.foreach { case (name, epoch) => commitToken(name, epoch) }
      return (base, 0L)
    }
    val starts = nonEmpty.map(_._2).scanLeft(base)(_ + _)
    val specs = nonEmpty.zip(starts).map { case ((f, n), s) => (f, n, s) }
    // Pending-token marker BEFORE any data, same reasoning as appendDF.
    val segDir = segmentPath(base)
    token.foreach { case (name, epoch) =>
      fs.mkdirs(segDir)
      fs.writeMeta(segDir, PendingTokenFile, s"$name\n$epoch".getBytes("UTF-8"))
    }
    val staging = stagingDir()
    fs.mkdirs(staging)
    val maxPer = config.maxRecordsPerSegment
    try {
      spark.sparkContext
        .parallelize(specs, specs.size)
        .foreach { case (f, _, start) =>
          StagedParquet.rewriteToParts(f, staging, start, maxPer)
        }
    } catch {
      case scala.util.control.NonFatal(e) =>
        try fs.deleteRecursively(staging)
        catch { case _: Exception => () }
        // Surgical, same reasoning as publishAndCommit's rollback: a fenced
        // winner may own this base by now — remove only OUR marker, and the
        // dir only if it holds no data.
        token.foreach(_ => rollbackSegment(segDir, Vector.empty, tokenMarker = true))
        throw e
    }
    publishAndCommit(staging, base, total, token)
  }

  // ------------------------------------------------- publish-intent marker

  /** Publish-intent ownership handshake, closing the adoption/rollback race
    * (a new claimant's reconcile() adopting unmanifested parts that a
    * fenced loser then deletes → committed manifest referencing missing
    * files):
    *
    *   - A publisher writes `_publishing` into the segment dir BEFORE any
    *     part becomes visible there, re-checks it before each subsequent
    *     part, and removes it after its manifest swap commits.
    *   - On a failed swap the publisher's rollback is JOURNALED: it first
    *     writes `_rollback_intent.<epoch>` naming exactly the part files
    *     it moved in, then ATOMICALLY deletes the marker
    *     ([[LogFs.deleteIfExists]]). Winning the delete means nobody
    *     adopted — delete the listed parts, then the journal; losing it
    *     means a claimant owns the parts now — remove only the journal and
    *     leave every data file alone.
    *   - reconcile() takes the mirror side per dir before counting
    *     unmanifested parts:
    *       - journal present, marker gone → a rollback crashed mid-delete:
    *         COMPLETE it (delete the listed files + journal), then treat
    *         the dir normally — debris can never collide with re-minted
    *         offsets.
    *       - marker present → atomically delete it. Winning licenses
    *         adoption (the publisher's rollback will lose and leave the
    *         files); losing means a LIVE loser is rolling back right now —
    *         wait briefly for it to finish, and on timeout skip the dir
    *         (and, for unknown dirs, every later one: adopting past a
    *         rolled-back dir would leave an offset gap).
    *       - neither → legacy dir, adopt as before.
    *
    * Exactly one side wins the marker, so adoption and rollback are
    * mutually exclusive per directory, and the journal makes a crashed
    * rollback completable by anyone. Residual window, documented rather
    * than closed: a publisher's single in-flight part move racing the
    * adopter's listing can land a file the adopter never saw; the marker
    * re-check before the NEXT move bounds the exposure to one part, and
    * reaching it requires a writer that stayed alive but silent across an
    * entire claim generation — the same double-writer pathology the
    * reference does not survive at all (two Raft nodes sharing one data
    * dir corrupt arbitrarily).
    */
  private def markerPath(segDir: String): String = fs.child(segDir, PublishMarkerFile)

  private def writeMarker(segDir: String): Unit = {
    fs.mkdirs(segDir)
    fs.writeRawFile(markerPath(segDir), writerEpoch.toString.getBytes("UTF-8"))
  }

  /** Abort the publish when an adopter claimed the dir out from under us. */
  private def checkMarker(segDir: String): Unit =
    if (!fs.exists(markerPath(segDir))) {
      val observed =
        try LogManifest.readWithSeq(dir).map(_._2.writerEpoch).getOrElse(-1L)
        catch { case _: Exception => -1L }
      throw LogFencedException(dir, writerEpoch, observed)
    }

  /** True iff WE removed the marker — ownership of the unmanifested parts. */
  private def claimMarker(segDir: String): Boolean = fs.deleteIfExists(markerPath(segDir))

  private def intentFiles(segDir: String): Vector[String] =
    fs.list(segDir).filter(p => fs.fileName(p).startsWith(RollbackIntentPrefix))

  /** Journaled, marker-gated rollback of a failed publish — see the
    * handshake Scaladoc. `files` are the full paths this writer moved into
    * `segDir`; `tokenMarker` adds its pending-token meta to the cleanup.
    */
  private def rollbackPublished(segDir: String, files: Seq[String], tokenMarker: Boolean): Unit = {
    val intent = fs.child(segDir, s"$RollbackIntentPrefix.$writerEpoch")
    val journaled =
      try {
        fs.writeRawFile(intent, files.map(fs.fileName).mkString("\n").getBytes("UTF-8"))
        true
      } catch { case _: Exception => false }
    if (claimMarker(segDir)) {
      files.foreach(p => try fs.delete(p) catch { case _: Exception => () })
      if (tokenMarker)
        try fs.deleteMeta(segDir, PendingTokenFile)
        catch { case _: Exception => () }
      if (journaled) try fs.delete(intent) catch { case _: Exception => () }
      try if (fs.isDir(segDir) && fs.list(segDir).isEmpty) fs.delete(segDir)
      catch { case _: Exception => () }
    } else {
      // A claimant adopted our parts (and merged any pending token) — the
      // data is manifested under its epoch; only our journal is ours.
      if (journaled) try fs.delete(intent) catch { case _: Exception => () }
    }
  }

  /** Finish a rollback whose owner crashed mid-delete: remove the files its
    * journal names, the pending-token meta, and the journal itself.
    *
    * A journal can ALSO survive adoption (loser crashed between writing it
    * and losing the marker claim), in which case its files are manifested
    * data that must NOT be touched. The two cases separate by offset: only
    * files whose ranged name starts at or past `minUnmanifested` (the
    * manifest's recorded next offset for this dir — everything for an
    * unknown dir) are rollback debris; anything below is adopted data, and
    * an unranged name is left alone out of caution.
    */
  private def completeRollback(segDir: String, minUnmanifested: Long): Unit = {
    intentFiles(segDir).foreach { intent =>
      fs.readRawFile(intent).foreach { bytes =>
        new String(bytes, "UTF-8").split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach {
          name =>
            if (partMinOffset(name).exists(_ >= minUnmanifested))
              try fs.delete(fs.child(segDir, name))
              catch { case _: Exception => () }
        }
      }
      try fs.deleteMeta(segDir, PendingTokenFile)
      catch { case _: Exception => () }
      try fs.delete(intent)
      catch { case _: Exception => () }
    }
    try if (fs.isDir(segDir) && fs.list(segDir).isEmpty) fs.delete(segDir)
    catch { case _: Exception => () }
  }

  /** Lost the marker to a live loser: give its (small, fast) rollback a
    * bounded window to finish so this claim sees a clean dir instead of
    * skipping adoption. True once marker and journal are gone (or the dir
    * itself is); false on timeout.
    */
  private def awaitRollback(segDir: String): Boolean = {
    val deadline = System.nanoTime() + 2000L * 1000 * 1000
    while (System.nanoTime() < deadline) {
      if (!fs.isDir(segDir) || (!fs.exists(markerPath(segDir)) && intentFiles(segDir).isEmpty))
        return true
      Thread.sleep(25L)
    }
    false
  }

  /** Undo a failed segment publish without collateral damage: delete exactly
    * the part files this writer moved in and (when present) its pending
    * -token marker, then the directory itself only once nothing else lives
    * there. See publishAndCommit's rollback comment for why a recursive
    * delete would be a data-loss bug under fencing.
    */
  private def rollbackSegment(segDir: String, moved: Seq[String], tokenMarker: Boolean): Unit = {
    moved.foreach(p => try fs.delete(p) catch { case _: Exception => () })
    if (tokenMarker)
      try fs.deleteMeta(segDir, PendingTokenFile)
      catch { case _: Exception => () }
    try {
      if (fs.isDir(segDir) && fs.list(segDir).isEmpty) fs.delete(segDir)
    } catch { case _: Exception => () }
  }

  /** Commit an idempotence token WITHOUT data — the empty-batch leg of an
    * exactly-once sink: an empty epoch must still advance the token so a
    * post-crash replay of it is a provable no-op. Monotonic: an epoch at or
    * below the recorded one leaves the manifest untouched.
    */
  def commitToken(name: String, epoch: Long): Unit = synchronized {
    require(name.matches("[A-Za-z0-9_.-]+"), s"invalid token name: $name")
    if (manifest.tokens.get(name).exists(_ >= epoch)) return
    swapManifest(manifest.copy(tokens = manifest.tokens + (name -> epoch)))
  }

  // ----------------------------------------------------------------- reads

  /** Point lookup by offset (reference: internal/log/log.go:94-109).
    *
    * Fast path: the manifest's binary search picks the one segment
    * (replacing the reference's linear segment scan), then the record is
    * read driver-side straight through parquet-java — footer min/max stats
    * skip part files and row groups the way the reference's mmap index
    * skips store bytes — so a warm point read costs file-footer I/O, not a
    * Spark job (~100 ms scheduling floor). Falls back to a Spark scan on
    * any reader surprise. Throws the typed 404 error past either end.
    */
  def read(offset: Long): LogRecord = {
    // Reads are deliberately lock-free against the @volatile manifest, so a
    // concurrent compact() can swap a segment dir away between our manifest
    // snapshot and the file listing — readOffset then sees an empty/missing
    // dir and reports None, which must NOT become a 404: offsets inside a
    // manifested segment are contiguous, so None for one of them can only
    // mean the swap race (compaction preserves every offset — the fresh
    // manifest resolves it). Bounded retries, then fail loud.
    var attempt = 0
    while (attempt < 5) {
      val seg = manifest
        .segmentFor(offset)
        .getOrElse(throw OffsetOutOfRangeException(offset))
      val fast =
        try ParquetPointReader.readOffset(segmentPath(seg.base), offset)
        catch {
          case scala.util.control.NonFatal(_) =>
            try sparkRead(seg.base, offset)
            catch { case scala.util.control.NonFatal(_) => None }
        }
      fast match {
        case Some(r) => return r
        case None =>
          attempt += 1
          if (attempt < 5) Thread.sleep(5L * attempt)
      }
    }
    throw OffsetOutOfRangeException(offset)
  }

  private def sparkRead(base: Long, offset: Long): Option[LogRecord] = {
    val session = spark
    import session.implicits._
    spark.read
      .schema(LogRecord.schema)
      .parquet(segmentPath(base))
      .filter(col("offset") === offset)
      .as[LogRecord]
      .take(1)
      .headOption
  }

  /** First available offset (reference: internal/log/log.go:137-142). O(1). */
  def lowestOffset: Long = manifest.lowestOffset

  /** Last assigned offset, 0 when empty (reference: internal/log/log.go:144-153). O(1). */
  def highestOffset: Long = manifest.highestOffset

  /** Batch view of the whole log as a DataFrame with the partition column
    * `segment` (Catalyst prunes segments on it). Unordered, like any scan;
    * use [[reader]] for the ordered export view.
    */
  def toDF: DataFrame = {
    val segs = manifest.segments
    if (segs.isEmpty) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        LogRecord.schema
      )
    } else {
      spark.read
        .option("basePath", dir)
        .schema(LogRecord.schema)
        .parquet(segs.map(s => segmentPath(s.base)): _*)
        .drop("segment")
    }
  }

  /** Offset-range scan `[from, until)` with segment pruning done driver-side
    * from the manifest, so Spark never lists non-matching segment dirs.
    */
  def range(from: Long, until: Long): DataFrame = {
    val segs = manifest.segments.filter(s => s.next > from && s.base < until)
    if (segs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], LogRecord.schema)
    else
      spark.read
        .option("basePath", dir)
        .schema(LogRecord.schema)
        .parquet(segs.map(s => segmentPath(s.base)): _*)
        .drop("segment")
        .filter(col("offset") >= from && col("offset") < until)
  }

  /** Ordered full-log view — the analog of `Log.Reader`'s concatenated
    * stream used for snapshots/export (reference: internal/log/log.go:173-193).
    */
  def reader: DataFrame = toDF.orderBy("offset")

  /** Streaming tail from `offset` onward — the `ConsumeStream` analog
    * (reference: internal/server/server.go:138-158). The reference busy-polls
    * for the next record; our micro-batch stream's cursors ARE log offsets
    * (the "graft" DataSource V2 MicroBatchStream): each trigger reads
    * exactly `[lastCommitted, nextOffset)` from the manifest — no
    * file-listing, no duplicates, in-order within a batch.
    */
  def tail(
      from: Long = 0L,
      maxRecordsPerBatch: Option[Long] = None,
      until: Option[Long] = None
  ): DataFrame = {
    val reader = spark.readStream
      .format("graft")
      // Streaming scans never receive filter pushdown (batch-only in
      // Spark), so the start position travels as a read option; the filter
      // stays as a semantic guard. maxRecordsPerBatch paces catch-up from
      // a deep tail into bounded micro-batches (admission control).
      // `until` (exclusive) bounds the stream at a snapshot — the
      // reference's ConsumeStream catch-up half without the unbounded
      // tail; pair with Trigger.AvailableNow to drain and terminate.
      .option("startOffset", from)
    maxRecordsPerBatch.foreach(n => reader.option("maxRecordsPerBatch", n))
    until.foreach(e => reader.option("endOffset", e))
    // Both bounds keep a semantic-guard filter alongside the option (the
    // option does the planning work; the filter catches any regression in
    // the option plumbing instead of silently over-delivering).
    until
      .foldLeft(reader.load(dir).filter(col("offset") >= from)) { (df, e) =>
        df.filter(col("offset") < e)
      }
  }

  // ------------------------------------------------------------- retention

  /** Remove every segment whose highest offset is ≤ `lowest` — deliberately
    * segment-granular, exactly like the reference (`nextOffset <= lowest+1`,
    * reference: internal/log/log.go:155-171): a segment survives if ANY of
    * its records is newer than the truncation point.
    */
  def truncate(lowest: Long): Unit = synchronized {
    val (drop, keep) = manifest.segments.partition(_.next <= lowest + 1)
    swapManifest(manifest.copy(segments = keep))
    drop.foreach(s => fs.deleteRecursively(segmentPath(s.base)))
  }

  /** Policy-driven retention — the `log.retention.ms` / `log.retention.bytes`
    * analog the reference's caller-driven `Truncate` leaves to the
    * operator. Drops the longest eligible PREFIX of segments (offset
    * contiguity is preserved by construction; the newest segment never
    * drops, so readers always see a live tail): a prefix segment is
    * eligible while it is older than `maxAgeMillis` (0 disables; unknown
    * ages — manifest-less recovery — are never age-dropped) or while the
    * log's total bytes still exceed `maxBytes` (0 disables). Segment-
    * granular like [[truncate]]: a segment survives until its NEWEST
    * record is eligible. Returns the number of segments dropped.
    */
  def retain(
      maxAgeMillis: Long = 0L,
      maxBytes: Long = 0L,
      nowMillis: Long = clock()
  ): Int = synchronized {
    val segs = manifest.segments
    var total = segs.map(_.bytes).sum
    def ageOld(s: SegmentMeta): Boolean =
      maxAgeMillis > 0 && s.createdAtMillis > 0 &&
        s.createdAtMillis < nowMillis - maxAgeMillis
    var rest = segs
    val dropped = Vector.newBuilder[SegmentMeta]
    while (rest.size > 1 && (ageOld(rest.head) || (maxBytes > 0 && total > maxBytes))) {
      total -= rest.head.bytes
      dropped += rest.head
      rest = rest.tail
    }
    val out = dropped.result()
    if (out.nonEmpty) {
      swapManifest(manifest.copy(segments = rest))
      out.foreach(s => fs.deleteRecursively(segmentPath(s.base)))
    }
    out.size
  }

  /** Compact adjacent small sealed segments into larger ones — the analog
    * of the reference's snapshot/compaction surface (reference:
    * internal/log/distributed_fsm.go:48-51 streams the whole log into one
    * snapshot) and the standing answer to small-file pressure from
    * per-record appends and streaming ingest.
    *
    * Each run of ≥2 adjacent sealed segments whose bytes sum to at most
    * `targetBytes` is rewritten (offset-ordered, bounded part files) into a
    * fresh directory, then swapped in: old dir renamed away → new dir
    * renamed in → manifest update → old data deleted. Offsets, order, and
    * content are unchanged — only the file layout. Like the reference's
    * `Truncate`, compaction is a maintenance operation: in-flight scans
    * holding the old file list can fail over the brief swap window.
    *
    * Interaction with [[truncate]]: truncation is segment-granular, so
    * merging segments coarsens it — a merged segment survives truncation if
    * ANY of its records is newer than the cut. Retention-sensitive logs
    * should truncate before compacting, or cap `targetBytes`.
    */
  def compact(targetBytes: Long = config.maxStoreBytes): Unit = synchronized {
    val session = spark
    import session.implicits._
    val segs = manifest.segments
    // Greedy runs of adjacent sealed segments under the byte target.
    val runs = Vector.newBuilder[Vector[SegmentMeta]]
    var run = Vector.empty[SegmentMeta]
    var runBytes = 0L
    def flushRun(): Unit = { if (run.size >= 2) runs += run; run = Vector.empty; runBytes = 0L }
    segs.foreach { s =>
      if (s.sealed_ && (run.isEmpty || runBytes + s.bytes <= targetBytes)) {
        run :+= s; runBytes += s.bytes
      } else { flushRun(); if (s.sealed_) { run = Vector(s); runBytes = s.bytes } }
    }
    flushRun()

    runs.result().foreach { r =>
      val lo = r.head.base
      val records = r.map(_.records).sum
      val staging = stagingDir()
      // Parallel rewrite: range-partition on offset so every task writes a
      // DISJOINT contiguous offset span (sorted within its partition) — the
      // ranged part names stay non-overlapping, which is all point reads
      // and scan planning require. A coalesce(1) would funnel the whole
      // merged segment through one task: fine for kilobytes, unusable for
      // a multi-TB compaction.
      val nParts = math.max(1L, (records + config.maxRecordsPerSegment - 1) /
        config.maxRecordsPerSegment).toInt
      spark.read
        .schema(LogRecord.schema)
        .parquet(r.map(s => segmentPath(s.base)): _*)
        .as[LogRecord]
        .repartitionByRange(nParts, col("offset"))
        .sortWithinPartitions("offset")
        .write
        .option("maxRecordsPerFile", config.maxRecordsPerSegment)
        // Same 2k-row pages as the append paths: without this the rewrite
        // would regress point reads into compacted (i.e. the oldest,
        // largest) segments back to ~20k-row default pages.
        .option("parquet.page.row.count.limit", "2048")
        .parquet(staging)
      val newSeg = fs.child(dir, s"_compact-$lo-${UUID.randomUUID().toString.take(8)}")
      val (bytes, newParts) = publishPartsTo(staging, newSeg) // fresh _compact-* dir: no rollback set needed
      // Crash-safe swap: journal FIRST, then olds out → new in → manifest →
      // delete olds → delete journal. Recovery (recoverCompaction) rolls a
      // half-done swap back (manifest not yet written) or forward (it was),
      // so committed offsets never strand in _old-*/ _compact-* dirs.
      val olds = r.map(s =>
        s.base -> fs.child(dir, s"_old-${s.base}-${UUID.randomUUID().toString.take(8)}")
      )
      CompactJournal.write(dir, CompactJournal(lo, r.last.next, fs.fileName(newSeg),
        olds.map { case (b, p) => b -> fs.fileName(p) },
        newParts = newParts.map(fs.fileName)))
      olds.foreach { case (b, moved) =>
        fs.move(segmentPath(b), moved)
      }
      fs.move(newSeg, segmentPath(lo))
      val merged = SegmentMeta(lo, r.last.next, bytes, records, sealed_ = true,
        createdAtMillis = r.map(_.createdAtMillis).max)
      val kept = manifest.segments.filterNot(s => r.exists(_.base == s.base))
      // A fencing loss here leaves the journal in place: the NEW claimant's
      // recoverCompaction rolls the half-done swap back (its manifest does
      // not carry the merged segment), so committed offsets never strand.
      swapManifest(manifest.copy(segments = (kept :+ merged).sortBy(_.base)))
      olds.foreach { case (_, p) => fs.deleteRecursively(p) }
      CompactJournal.delete(dir)
    }
  }

  /** Delete the log directory (reference: internal/log/log.go:119-127). */
  def remove(): Unit = synchronized {
    fs.deleteRecursively(dir)
  }

  /** Delete and recreate empty (reference: internal/log/log.go:129-135). */
  def reset(): Unit = resetTo(config.initialOffset)

  private def resetTo(initialOffset: Long): Unit = synchronized {
    remove()
    fs.mkdirs(dir)
    // The delete wiped every manifest version — the sequence restarts, and
    // our epoch restamps on the fresh v1 (fencing history is gone with the
    // log it fenced).
    metaSeq = 0L
    swapManifest(LogManifest(Vector.empty, initialOffset))
  }

  /** Rebuild this log from an L6 export — the `fsm.Restore` analog
    * (reference: internal/log/distributed_fsm.go:53-83). The export is
    * [[reader]]'s frame or any frame with `value` (binary) and `offset`
    * columns (e.g. a parquet dump of the reader — see the String overload).
    *
    * Semantics mirror the reference exactly: the FIRST record's offset
    * becomes the fresh initial offset, the log RESETS, and records
    * re-append in offset order with offsets re-assigned sequentially from
    * that base — so a contiguous export (which [[reader]] always is)
    * restores to byte-identical offsets, and a doctored export with gaps
    * re-compacts exactly as the reference's sequential Append would. An
    * empty export is a no-op (the reference's restore loop never runs).
    * The fencing epoch is fresh: the reset wiped manifest history and this
    * writer claims the rebuilt log anew.
    *
    * The rebuild rides [[appendDF]], so it is one distributed staged write
    * at any export size — no driver-side record loop.
    */
  def restore(export: DataFrame): Unit = synchronized {
    val cols = export.columns.toSet
    require(
      cols.contains("value") && cols.contains("offset"),
      s"restore needs (value, offset) columns; got ${export.columns.mkString(",")}"
    )
    // One aggregate pass: the restore base, plus loud failure on
    // non-default Raft-parity fields — this engine never writes them, and
    // silently dropping a nonzero term would corrupt a hypothetical
    // Raft-bearing export rather than refuse it. Every aggregate casts in
    // the PLAN so an export whose term/recordType landed as int/byte/long
    // hits the intended require, not a Row-accessor ClassCastException.
    val aggs = Seq(min(col("offset")).cast("long").as("base")) ++
      (if (cols.contains("term")) Seq(max(abs(col("term"))).cast("long").as("t")) else Nil) ++
      (if (cols.contains("recordType")) Seq(max(abs(col("recordType"))).cast("long").as("rt"))
       else Nil)
    val head = export.agg(aggs.head, aggs.tail: _*).first()
    if (head.isNullAt(0)) return // empty export: no-op, like the reference
    if (cols.contains("term"))
      require(head.getLong(1) == 0L, "restore: export carries non-zero term records")
    if (cols.contains("recordType"))
      require(
        head.getLong(if (cols.contains("term")) 2 else 1) == 0L,
        "restore: export carries non-zero recordType records"
      )
    // Materialize the export BEFORE the reset: the docstring invites
    // passing this log's own reader frame, and a lazy plan over our own
    // parquet segments would otherwise be read only AFTER resetTo deleted
    // them — a self-restore would wipe the log, then fail. localCheckpoint
    // pins the sorted values in block storage (MEMORY_AND_DISK), making
    // `log.restore(log.reader)` safe; the backing RDD frees in `finally`.
    val staged = export
      .orderBy("offset")
      .select(col("value").cast("binary").as("value"))
      .localCheckpoint(true)
    try {
      resetTo(head.getLong(0))
      appendDF(staged)
      ()
    } finally {
      staged.queryExecution.analyzed
        .collectFirst { case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd }
        .foreach(r => try r.unpersist(blocking = false) catch { case _: Exception => () })
    }
  }

  /** Restore from a directory holding a parquet dump of [[reader]] (the CLI
    * `export` verb's output).
    */
  def restore(exportDir: String): Unit = restore(spark.read.parquet(exportDir))

  /** Remove every committed (and orphaned) segment and reset the offset
    * sequence to `initialOffset`, leaving non-segment contents — e.g. a
    * sink's staged files — untouched. The overwrite leg of the DSv2 sink:
    * `reset()` cannot serve it because it removes the whole dir, staged
    * commit inputs included.
    */
  private[graft] def clearForOverwrite(): Unit = synchronized {
    LogManifest
      .listSegmentBases(dir)
      .foreach(b => try fs.deleteRecursively(segmentPath(b)) catch { case _: Exception => () })
    swapManifest(LogManifest(Vector.empty, config.initialOffset))
  }

  def segmentCount: Int = manifest.segments.size
  def currentManifest: LogManifest = manifest

  // -------------------------------------------------------------- plumbing

  private def segmentPath(base: Long): String = fs.child(dir, s"segment=$base")

  // Spark's Parquet writer insists on creating the output path itself.
  private def stagingDir(): String =
    fs.child(dir, s"_tmp-${UUID.randomUUID().toString.take(12)}")

  /** Write a driver-side chunk as one Parquet part file inside its segment
    * dir: stage → rename (atomic publish). Goes straight through
    * parquet-java (no Spark job — the chunk already lives on the driver,
    * reference: internal/log/log.go:80-92 is a plain buffered write) and
    * embeds the chunk's offset range in the file name so point reads pick
    * the file without opening footers.
    */
  private def writePart(base: Long, recs: Vector[LogRecord]): String = {
    val target = segmentPath(base)
    fs.mkdirs(target)
    val tmp = fs.child(dir, s"_tmp-${UUID.randomUUID().toString.take(12)}.parquet")
    ParquetPartWriter.write(tmp, recs)
    val name =
      s"part-${recs.head.offset}-${recs.last.offset}-${UUID.randomUUID().toString.take(8)}.parquet"
    val dest = fs.child(target, name)
    fs.move(tmp, dest)
    // Checksum sidecar (Hadoop local FS only; the NIO path never writes one).
    fs.delete(fs.child(dir, "." + fs.fileName(tmp) + ".crc"))
    dest
  }

  /** Move every part file from `staging` into `segment=<base>/`, returning
    * total bytes moved plus the destination paths (the exact rollback set
    * for a failed swap). Each file is renamed to carry its offset range
    * (one cheap footer read per file at publish time) — the analog of the
    * reference's per-segment index file, paid once at write so point reads
    * are O(1) in file selection. Deletes the staging dir.
    */
  private def publishParts(staging: String, base: Long): (Long, Vector[String]) =
    publishPartsTo(staging, segmentPath(base), checkMarkerPerMove = true)

  private def publishPartsTo(
      staging: String,
      target: String,
      /** Re-verify the publish-intent marker before each move — on for
        * segment publishes (ownership handshake), off for compaction's
        * `_compact-*` working dirs which no reconcile ever adopts.
        */
      checkMarkerPerMove: Boolean = false
  ): (Long, Vector[String]) = {
    fs.mkdirs(target)
    var bytes = 0L
    val moved = Vector.newBuilder[String]
    fs.list(staging)
      .filter(p => fs.fileName(p).endsWith(".parquet"))
      .sortBy(fs.fileName)
      .foreach { p =>
        if (checkMarkerPerMove) checkMarker(target)
        bytes += fs.size(p)
        val u = UUID.randomUUID().toString.take(8)
        val name = ParquetPointReader.offsetRange(p) match {
          case Some((mn, mx)) => s"part-$mn-$mx-$u.parquet"
          case None           => s"part-$u.parquet"
        }
        val dest = fs.child(target, name)
        fs.move(p, dest)
        moved += dest
      }
    fs.deleteRecursively(staging)
    (bytes, moved.result())
  }

  /** Manifest-less recovery: list segment dirs (sorted by base, the only
    * sort in the reference, internal/log/log.go:54-56) and rebuild metadata
    * from one Spark scan per segment. Pure — the claim swap commits it.
    */
  private def recover(): LogManifest = {
    val bases = LogManifest.listSegmentBases(dir)
    if (bases.isEmpty) return LogManifest(Vector.empty, config.initialOffset)
    val segs = bases.map(rebuildSegmentMeta)
    LogManifest(segs, segs.last.next)
  }

  /** Post-crash reconciliation: the publish order is data-then-manifest, so
    * a crash can leave the TAIL segment(s) ahead of the manifest. Recount
    * only the trailing segment plus any dirs the manifest doesn't know —
    * bounded work, like the reference recovering nextOffset from the last
    * index entry (reference: internal/log/segment.go:38-42). Adoption of
    * unmanifested parts is gated by the publish-marker ownership handshake
    * (see the marker Scaladoc): winning a dir's marker licenses counting
    * its parts; losing means a fenced publisher is rolling them back right
    * now — skip the dir, and for unknown dirs every later one too (an
    * adopted segment past a rolled-back one would leave an offset gap).
    * Otherwise pure apart from noting pending-token markers for post-claim
    * cleanup — the claim swap commits the result.
    */
  private def reconcile(m: LogManifest): LogManifest = {
    val onDisk = LogManifest.listSegmentBases(dir)
    val known = m.segments.map(_.base).toSet
    val unknownAll = onDisk.filterNot(known)
    val needsTail = m.segments.lastOption.exists(s => !s.sealed_)
    if (unknownAll.isEmpty && !needsTail) return m

    /** Marker gate: true → this dir's unmanifested parts are ours to count
      * (see the ownership-handshake Scaladoc). `minUnmanifested` bounds
      * which journaled files a crashed rollback may still delete.
      */
    def adoptable(base: Long, minUnmanifested: Long): Boolean = {
      val segDir = segmentPath(base)
      if (!fs.exists(markerPath(segDir))) {
        // No live publish. A leftover journal is a crashed rollback —
        // complete it before counting what remains.
        if (intentFiles(segDir).nonEmpty) completeRollback(segDir, minUnmanifested)
        true
      } else if (claimMarker(segDir)) {
        // We own the parts now; any journal a crashed loser left behind is
        // void (its rollback lost the moment our claim won).
        intentFiles(segDir).foreach(i => try fs.delete(i) catch { case _: Exception => () })
        true
      } else {
        // A live loser is rolling back — let it finish (fast, file
        // deletes), then the dir is clean. Timeout → skip adoption.
        awaitRollback(segDir)
      }
    }

    val fixedTail = m.segments.lastOption.filter(_ => needsTail) match {
      case Some(last) if adoptable(last.base, last.next) =>
        // Rebuild counts/bytes from parts, but KEEP the recorded creation
        // stamp — rebuild must not reset the segment's retention age.
        upsert(
          m.segments,
          rebuildSegmentMeta(last.base)
            .copy(sealed_ = last.sealed_, createdAtMillis = last.createdAtMillis)
        )
      // Lost the tail marker: a fenced writer is rolling back its
      // unmanifested tail parts — the manifest's recorded meta already
      // describes every committed record.
      case _ => m.segments
    }
    val unknown = unknownAll.takeWhile(adoptable(_, Long.MinValue))
    // Empty unknown dirs (a failed append's mkdirs with its parts cleaned
    // up) carry no data — don't resurrect zero-record segments.
    val extra = unknown.map(rebuildSegmentMeta).filterNot(_.isEmpty)
    val segs = (fixedTail ++ extra).sortBy(_.base)
    // Tokens ride along: dropping them here would re-enable duplicate
    // application of an already-committed streaming batch after a crash —
    // exactly the window the tokens exist to close. A resurrected appendDF
    // segment additionally carries its own pending-token marker (written
    // before its parts): merge it, or the resurrected DATA would be visible
    // while the token check still said "not applied" and a foreachBatch
    // retry would append the batch twice.
    val resurrected = extra.flatMap { s =>
      val segDir = segmentPath(s.base)
      try fs.readMeta(segDir, PendingTokenFile).map(new String(_, "UTF-8")).flatMap { txt =>
        txt.split("\n", 2) match {
          case Array(name, epoch) => Some(name -> epoch.trim.toLong)
          case _                  => None
        }
      } catch { case _: Exception => None }
    }
    val mergedTokens = resurrected.foldLeft(m.tokens) { case (acc, (name, epoch)) =>
      acc + (name -> math.max(acc.getOrElse(name, Long.MinValue), epoch))
    }
    pendingTokenCleanup = extra.map(_.base)
    LogManifest(
      segs,
      math.max(m.nextOffset, segs.lastOption.map(_.next).getOrElse(m.nextOffset)),
      mergedTokens,
      m.writerEpoch
    )
  }

  private def rebuildSegmentMeta(base: Long): SegmentMeta = {
    val p = segmentPath(base)
    // A completed rollback may have emptied (or removed) the dir since it
    // was listed — that is an empty segment, not a scan error.
    if (!fs.isDir(p) || !fs.list(p).exists(f => fs.fileName(f).endsWith(".parquet")))
      return SegmentMeta(base, base, 0L, 0L, sealed_ = true)
    val stats = spark.read
      .schema(LogRecord.schema)
      .parquet(p)
      .agg(count(lit(1)).as("n"), max(col("offset")).as("hi"))
      .head()
    val n = stats.getLong(0)
    val hi = if (n == 0) base - 1 else stats.getLong(1)
    val bytes = fs.list(p)
      .filter(f => fs.fileName(f).endsWith(".parquet"))
      .map(fs.size)
      .sum
    SegmentMeta(base, hi + 1, bytes, n, sealed_ = true)
  }

  private def upsert(segs: Vector[SegmentMeta], s: SegmentMeta): Vector[SegmentMeta] =
    segs.indexWhere(_.base == s.base) match {
      case -1 => segs :+ s
      case i  => segs.updated(i, s)
    }
}

object SparkLog {
  /** Per-record store overhead the reference charges against MaxStoreBytes:
    * the 8-byte BigEndian length prefix (reference: internal/log/store.go:14-16).
    * We charge the same so roll points line up with the reference's tests.
    */
  val LenWidth: Int = 8

  /** Marker carrying an appendDF idempotence token between parts-publish and
    * manifest-commit (versioned via the LogFs metadata protocol; format
    * `<name>\n<epoch>`). Read back only by reconcile(). Lives on the
    * companion: reconcile runs during CONSTRUCTION, before any class val
    * declared below the manifest field would be initialized.
    */
  private[log] val PendingTokenFile = "_pending_token"

  /** Publish-intent marker file — see the ownership-handshake Scaladoc in
    * the class body. Underscore-prefixed so Spark's parquet listings skip
    * it.
    */
  private[log] val PublishMarkerFile = "_publishing"

  /** Rollback journal prefix (suffixed with the rolling-back writer's
    * epoch) — see the ownership-handshake Scaladoc.
    */
  private[log] val RollbackIntentPrefix = "_rollback_intent"

  private val PartRangeName = """part-(\d+)-(\d+)-.*\.parquet""".r

  /** First offset a ranged part file name covers, when parseable. */
  private[log] def partMinOffset(name: String): Option[Long] = name match {
    case PartRangeName(mn, _) => Some(mn.toLong)
    case _                    => None
  }

  /** Open (or create) a log at `dir` — recovery included, mirroring
    * `NewLog` + `setup` (reference: internal/log/log.go:25-68).
    */
  def apply(
      spark: SparkSession,
      dir: String,
      config: LogConfig = LogConfig(),
      clock: () => Long = () => System.currentTimeMillis()
  ): SparkLog =
    new SparkLog(spark, dir, config, clock)
}
