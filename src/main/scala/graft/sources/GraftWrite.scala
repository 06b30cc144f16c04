package graft.sources

import java.util.UUID

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.log.{LogConfig, LogFs, SparkLog, StagedParquet}

/** DataSource V2 WRITE path for the "graft" format — the sink twin of
  * `GraftScan`, making the log a symmetric Spark source/sink:
  *
  *   - `df.write.format("graft").mode("append").save(dir)` — distributed
  *     batch append: one atomic manifest commit for the whole DataFrame.
  *   - `df.writeStream.format("graft").start(dir)` — streaming sink with
  *     EXACTLY-ONCE delivery: each epoch commits under a
  *     `(queryId, epochId)` idempotence token in the same manifest swap as
  *     its data, so Spark's post-crash epoch replay is a no-op (the DSv2
  *     analog of `Engine.ingest`'s foreachBatch tokens, and of the
  *     reference's ProduceStream, internal/server/server.go:83-110).
  *
  * Mechanics — executor-stage, driver-commit (the DSv2 commit protocol):
  * each task streams its rows through parquet-java into a value-only
  * staged file under `dir/_sink-stage-...`; the driver's commit hands the
  * files named in the tasks' commit messages (a lost speculative
  * attempt's orphan file is invisible), with their writer-reported row
  * counts, to `SparkLog.appendStaged` — which assigns per-file offset
  * bases WITHOUT a count pass, rewrites staged values into final parts in
  * one distributed job, and publishes with the crash-hardened
  * data-then-manifest swap. Offsets follow the input's partition order
  * (file order × row order), deterministically.
  *
  * Scale posture: staged bytes are written once by the write job and
  * streamed once by the rewrite job (the DataFrame API gives writers no
  * second pass, so per-task offset bases cannot be known while tasks
  * run); nothing is collected or cached driver-side — strictly less I/O
  * than `appendDF`'s persist+count+write. Each streaming epoch seals one
  * segment — a high-frequency-trigger log is exactly what `compact()`
  * re-merges.
  *
  * Single-writer contract (same as SparkLog): one live writer per log dir.
  * Stale staging roots from hard-crashed writes are swept at the next
  * writer-factory creation — safe under that contract.
  */
object GraftWrite {

  private[sources] val StagePrefix = "_sink-stage-"

  /** The write schema must be exactly `value: binary` — offsets/terms are
    * the log's to assign (a caller-supplied `offset` column would be a lie
    * the moment it published).
    */
  def validateSchema(schema: StructType): Unit = {
    val ok = schema.fields.length == 1 &&
      schema.fields(0).name.equalsIgnoreCase("value") &&
      schema.fields(0).dataType == BinaryType
    if (!ok)
      throw new IllegalArgumentException(
        s"graft sink requires schema (value BINARY) — offsets are assigned by the log; got ${schema.simpleString}"
      )
  }

  /** Remove every staging root except the one NAMED `keep` — crash debris
    * from previous writers. Call ONLY after this writer's SparkLog has
    * claimed the log: from that moment any other root's owner is fenced
    * (its commit throws LogFencedException), so its staging is provably
    * dead — sweeping BEFORE the claim destroyed live staging of concurrent
    * writers that then failed with a confusing missing-file error instead
    * of the fence. Comparison is by last path component: backend listings
    * may normalize the full path (Hadoop returns `file:/…` URIs), so a raw
    * string compare against a `child()`-built path would silently never
    * protect anything.
    */
  private[sources] def sweepStale(dir: String, keepName: String): Unit = {
    val fs = LogFs.forPath(dir)
    fs.list(dir)
      .filter { p =>
        val n = fs.fileName(p)
        n.startsWith(StagePrefix) && n != keepName
      }
      .foreach(p => try fs.deleteRecursively(p) catch { case _: Exception => () })
  }

  /** Log config from write options — a sink writing a log that was created
    * with custom roll thresholds must be able to match them (the config is
    * per-open, not persisted in the log).
    */
  private[sources] def configFrom(options: CaseInsensitiveStringMap): LogConfig = {
    val d = LogConfig()
    LogConfig(
      maxStoreBytes = Option(options.get("maxStoreBytes")).map(_.toLong).getOrElse(d.maxStoreBytes),
      maxRecordsPerSegment =
        Option(options.get("maxRecordsPerSegment")).map(_.toLong).getOrElse(d.maxRecordsPerSegment),
      initialOffset = Option(options.get("initialOffset")).map(_.toLong).getOrElse(d.initialOffset)
    )
  }

  /** Driver-side commit: append the staged files' rows to the log under an
    * optional idempotence token, in PARTITION ORDER (so the record↔offset
    * mapping is the input DataFrame's partition layout — same contract as
    * `appendDF`, but deterministic because the staged files, not a re-read,
    * define the order). Files come exclusively from the tasks' commit
    * messages (never a directory listing — see orphan-attempt note above);
    * their writer-reported row counts let `appendStaged` skip the count
    * pass entirely.
    */
  private[sources] def commitStaged(
      log: SparkLog,
      messages: Array[WriterCommitMessage],
      token: Option[(String, Long)]
  ): Unit = {
    val files = messages
      .collect { case m: GraftCommitMessage => m }
      .sortBy(_.partitionId)
      .collect { case GraftCommitMessage(_, Some(f), n) if n > 0 => (f, n) }
      .toSeq
    log.appendStaged(files, token)
  }
}

/** Per-task staged file + row count; the only thing commit trusts.
  * `partitionId` orders files at commit so offset assignment follows the
  * input's partition layout.
  */
case class GraftCommitMessage(partitionId: Int, file: Option[String], rows: Long)
    extends WriterCommitMessage

class GraftWriteBuilder(dir: String, info: LogicalWriteInfo)
    extends WriteBuilder
    with SupportsTruncate {
  GraftWrite.validateSchema(info.schema())
  private val config = GraftWrite.configFrom(info.options())
  private val autoCompactSegments =
    Option(info.options().get("autoCompactSegments")).map(_.toInt).getOrElse(0)
  private var truncateFirst = false

  /** `mode("overwrite")` — the DSv2 mapping of the reference's `Reset`
    * (reference: internal/log/log.go:145-152): clear the log, restart the
    * offset sequence at `initialOffset`, then append the batch. Clear and
    * append are two manifest swaps, not one atomic unit — same
    * non-atomicity as Spark's own file-source overwrite.
    */
  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftBatchWrite(dir, config, autoCompactSegments, truncateFirst)
    override def toStreaming: StreamingWrite =
      new GraftStreamingWrite(dir, info.queryId(), config, autoCompactSegments)
  }
}

class GraftBatchWrite(
    dir: String,
    config: LogConfig,
    autoCompactSegments: Int,
    truncateFirst: Boolean = false
) extends BatchWrite {
  private val stagingName = s"${GraftWrite.StagePrefix}${UUID.randomUUID().toString.take(12)}"
  private val staging = LogFs.forPath(dir).child(dir, stagingName)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val fs = LogFs.forPath(dir)
    fs.mkdirs(dir)
    fs.mkdirs(staging)
    new GraftWriterFactory(staging)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    try {
      val log = SparkLog(SparkSession.active, dir, config)
      // Post-claim (see sweepStale): every other staging root's writer is
      // now fenced, so its debris is safe to clear.
      GraftWrite.sweepStale(dir, keepName = stagingName)
      if (truncateFirst) log.clearForOverwrite()
      GraftWrite.commitStaged(log, messages, token = None)
      // Same opt-in hygiene as the streaming path (best-effort, after the
      // durable commit). Batch writes are one segment per job, so there is
      // no ladder state to keep — a full-target merge per opted-in write
      // is the repeated-small-batch user's explicit request.
      if (autoCompactSegments > 0 && log.segmentCount >= autoCompactSegments) {
        try log.compact()
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[graft-sink] auto-compaction skipped: ${e.getMessage}")
        }
      }
    } finally cleanup()

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit =
    try LogFs.forPath(dir).deleteRecursively(staging)
    catch { case _: Exception => () }
}

class GraftStreamingWrite(
    dir: String,
    queryId: String,
    config: LogConfig,
    autoCompactSegments: Int
) extends StreamingWrite {
  // One root per query (queryId is stable across restarts); one subdir per
  // epoch. A restart may sweep this query's OWN root — no epoch of this
  // run has staged anything yet, and leftover files from the crashed run
  // are dead (their epoch either committed, making the replay a token
  // no-op, or will be re-staged by the replayed tasks) — but it must keep
  // every OTHER staging root: a concurrent batch write's staging, or a
  // second streaming query's, is live work whose deletion would surface
  // later as a missing-file commit error on the victim. (Concurrent
  // writers then fail loudly at the manifest fence instead.)
  private val rootName = s"${GraftWrite.StagePrefix}q-$queryId"
  private val root = LogFs.forPath(dir).child(dir, rootName)

  {
    val fs = LogFs.forPath(dir)
    fs.mkdirs(dir)
    try fs.deleteRecursively(root)
    catch { case _: Exception => () }
    fs.mkdirs(root)
  }

  // One log handle for the query's lifetime: opening a SparkLog runs the
  // full recovery pass (compaction journal, stale-dir sweep, manifest
  // read + reconcile) — per-EPOCH that is pure listing overhead, and on an
  // object store several LIST round-trips a second. Safe to cache under the
  // sink's single-writer contract: no other writer moves the manifest
  // between epochs. Lazy so construction (query planning) does no I/O
  // beyond the sweep above.
  private lazy val log = SparkLog(SparkSession.active, dir, config)

  private def epochDir(epochId: Long): String =
    LogFs.forPath(dir).child(root, s"epoch-$epochId")

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamingWriterFactory(root)

  // Size-tiered compaction ladder: merging at a FIXED target would fold
  // every new small run back into the previously merged head until it
  // reaches the target — quadratic write amplification for tiny epochs.
  // Doubling the target each time a merge happens makes each byte
  // participate in O(log(maxStoreBytes / epochBytes)) merges total: a head
  // that outgrew the current target graduates (compact()'s greedy run never
  // extends a run past targetBytes), and the ladder resets once a trigger
  // merges nothing, so fresh small runs start cheap again.
  private var compactTarget = GraftStreamingWrite.LadderStartBytes

  // One-time post-claim sweep of other writers' dead staging roots — safe
  // only once `log` has claimed (see GraftWrite.sweepStale).
  private var swept = false

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    try {
      GraftWrite.commitStaged(log, messages, Some((s"sink-$queryId", epochId)))
      if (!swept) {
        GraftWrite.sweepStale(dir, keepName = rootName)
        swept = true
      }
      // Streaming small-file hygiene: every epoch seals one segment, so a
      // frequent trigger accumulates them without bound. When opted in
      // (option autoCompactSegments=N), merge adjacent small sealed runs
      // once the segment count passes N — compact() swaps atomically and
      // concurrent scans self-heal through the re-plan path, so readers
      // tailing this log never notice. Best-effort: the epoch's data and
      // token are already durable, so a maintenance failure must not fail
      // the query.
      if (autoCompactSegments > 0 && log.segmentCount >= autoCompactSegments) {
        try {
          val before = log.segmentCount
          log.compact(math.min(compactTarget, config.maxStoreBytes))
          compactTarget =
            if (log.segmentCount < before)
              math.min(compactTarget * 2, config.maxStoreBytes)
            else GraftStreamingWrite.LadderStartBytes
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[graft-sink] auto-compaction skipped: ${e.getMessage}")
        }
      }
    } finally cleanupEpoch(epochId)

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    cleanupEpoch(epochId)

  private def cleanupEpoch(epochId: Long): Unit =
    try LogFs.forPath(dir).deleteRecursively(epochDir(epochId))
    catch { case _: Exception => () }
}

object GraftStreamingWrite {
  /** Compaction ladder entry rung — small enough that a tiny-epoch stream's
    * first merges are cheap, large enough to be done in a handful of
    * doublings to any realistic maxStoreBytes.
    */
  private[sources] val LadderStartBytes = 4L * 1024 * 1024
}

class GraftWriterFactory(staging: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(
      partitionId,
      LogFs
        .forPath(staging)
        .child(staging, f"stage-$partitionId%05d-$taskId-${UUID.randomUUID().toString.take(8)}.parquet")
    )
}

class GraftStreamingWriterFactory(root: String) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] = {
    val fs = LogFs.forPath(root)
    val dir = fs.child(root, s"epoch-$epochId")
    new GraftDataWriter(
      partitionId,
      fs.child(dir, f"stage-$partitionId%05d-$taskId-${UUID.randomUUID().toString.take(8)}.parquet")
    )
  }
}

/** Streams rows into one staged parquet file. The writer opens LAZILY on
  * the first row — an empty partition stages nothing (and its commit
  * message carries no file), so a 10k-partition DataFrame with sparse data
  * doesn't litter the staging dir with empty parquet footers.
  */
class GraftDataWriter(partitionId: Int, path: String) extends DataWriter[InternalRow] {
  private var writer: StagedParquet.ValueWriter = _
  private var rows = 0L

  private def open(): Unit = {
    val fs = LogFs.forPath(path)
    fs.mkdirs(fs.parent(path))
    writer = new StagedParquet.ValueWriter(path)
  }

  override def write(record: InternalRow): Unit = {
    if (writer == null) open()
    // Null payloads stay null end-to-end (same contract as append/appendDF).
    writer.write(if (record.isNullAt(0)) null else record.getBinary(0))
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) { writer.close(); writer = null }
    GraftCommitMessage(partitionId, if (rows > 0) Some(path) else None, rows)
  }

  override def abort(): Unit = {
    if (writer != null) {
      try writer.close()
      catch { case _: Exception => () }
      writer = null
    }
    try LogFs.forPath(path).delete(path)
    catch { case _: Exception => () }
  }

  override def close(): Unit =
    if (writer != null) { writer.close(); writer = null }
}
