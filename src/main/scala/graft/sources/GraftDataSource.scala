package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsMetadataColumns, SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream,
  Offset,
  ReadLimit,
  ReadMaxRows,
  SupportsAdmissionControl,
  SupportsTriggerAvailableNow
}
import org.apache.spark.sql.sources.{
  DataSourceRegister,
  EqualTo,
  Filter,
  GreaterThan,
  GreaterThanOrEqual,
  In,
  LessThan,
  LessThanOrEqual
}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.log.{LogFs, LogManifest, LogRecord, ParquetPointReader}

/** DataSource V2 "graft" format over a SparkLog directory — the optional
  * `TableProvider` SURVEY §4.3 sketches, done properly:
  *
  *   - `spark.read.format("graft").load(dir)` — batch scan with offset
  *     predicates pushed into partition planning: the manifest prunes
  *     segments, offset-range part names prune files, footer stats prune
  *     row groups. A point lookup plans exactly one input partition.
  *   - `spark.readStream.format("graft").load(dir)` — a MicroBatchStream
  *     whose streaming offsets ARE log offsets (reference:
  *     `ConsumeStream`'s `req.Offset` cursor, internal/server/server.go:
  *     138-158): each trigger reads `[lastCommitted, nextOffset)` exactly
  *     once, replacing glob-based file listing with manifest reads.
  *
  * Readers run executor-side through parquet-java (`ParquetPointReader.
  * readRange`), one partition per part file overlapping the wanted range.
  */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = LogRecord.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table = {
    val dir = Option(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("graft source requires a path"))
    // Existence is checked at SCAN time (newScanBuilder), not here: a sink
    // writing a brand-new log has nothing on disk yet.
    new GraftTable(dir)
  }
}

class GraftTable(dir: String)
    extends Table
    with SupportsRead
    with SupportsWrite
    with SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  /** `DELETE FROM log WHERE offset < N` — the SQL face of the reference's
    * prefix Truncate (internal/log/log.go:113-124). Truncation is
    * SEGMENT-granular (a segment survives if ANY of its records is ≥ N),
    * so the delete is accepted only when it is EXACT: N at or below the
    * lowest offset (no-op), past the highest (clear), or on a segment
    * boundary — anything else, or any other predicate shape, is rejected
    * and Spark reports the table cannot delete that condition, rather
    * than silently deleting more or less than asked.
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    truncateBoundOf(filters).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val n = truncateBoundOf(filters).getOrElse(
      throw new IllegalArgumentException(s"unsupported delete: ${filters.mkString(", ")}")
    )
    val log = graft.log.SparkLog(org.apache.spark.sql.SparkSession.active, dir)
    // `truncate`'s bound is INCLUSIVE (drops segments whose highest
    // offset <= bound, reference log.go:113-124) while `n` is the
    // EXCLUSIVE `offset < n` bound — pass n-1, and skip entirely when the
    // predicate matches nothing (n at/below the lowest offset; also dodges
    // the n-1 underflow at Long.MinValue).
    if (n > log.lowestOffset) log.truncate(n - 1)
  }

  /** The exclusive truncation bound, when `filters` is exactly one
    * offset-prefix predicate aligned with the log's segment layout.
    */
  private def truncateBoundOf(filters: Array[Filter]): Option[Long] = {
    val bound = filters match {
      case Array(LessThan("offset", v: java.lang.Long))    => Some(v.longValue())
      case Array(LessThan("offset", v: java.lang.Integer)) => Some(v.longValue())
      // `<= MaxValue` saturates instead of wrapping: offsets above
      // 2^63-2 cannot exist (nextOffset would overflow), so the
      // delete-everything intent is preserved exactly.
      case Array(LessThanOrEqual("offset", v: java.lang.Long)) =>
        Some(if (v.longValue() == Long.MaxValue) Long.MaxValue else v.longValue() + 1)
      case Array(LessThanOrEqual("offset", v: java.lang.Integer)) => Some(v.longValue() + 1)
      case _                                                      => None
    }
    bound.filter { n =>
      LogManifest.read(dir) match {
        case None => true // empty log: any prefix delete is a no-op
        case Some(m) =>
          val lowest = m.segments.headOption.map(_.base).getOrElse(m.nextOffset)
          n <= lowest || n >= m.nextOffset || m.segments.exists(_.base == n)
      }
    }
  }
  override def name(): String = s"graft:$dir"
  override def schema(): StructType = LogRecord.schema

  /** Hidden ops/debug columns resolved on demand (`SELECT offset, _segment,
    * _part FROM log`): which segment and part file serve each record —
    * the observable form of the manifest's routing, handy for auditing
    * compaction and skew without leaving SQL.
    */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_segment"
        override def dataType(): org.apache.spark.sql.types.DataType = LongType
        override def isNullable: Boolean = false
        override def comment(): String = "base offset of the segment serving this record"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_part"
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.StringType
        override def isNullable: Boolean = false
        override def comment(): String = "part file name serving this record"
      }
    )
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      // mode("overwrite") → clear + restart offsets (the Reset analog).
      TableCapability.TRUNCATE,
      // The write schema (`value` only) is narrower than the table schema —
      // offsets are assigned at commit. GraftWriteBuilder enforces it.
      TableCapability.ACCEPT_ANY_SCHEMA
    )
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    if (!LogFs.forPath(dir).isDir(dir))
      throw new IllegalArgumentException(s"graft source path does not exist: $dir")
    // Spark only invokes pushFilters for BATCH scans; streaming readers pass
    // the start position as a read option instead (see SparkLog.tail).
    // `endOffset` (exclusive) is the SNAPSHOT read: offsets are the log's
    // version axis, so bounding the scan at a recorded high-water gives a
    // reproducible point-in-time view regardless of concurrent appends —
    // pair a saved `highestOffset + 1` with this option to re-run any job
    // over the exact data it saw.
    val startOffset = Option(options.get("startOffset")).map(_.toLong)
    val endOffset = Option(options.get("endOffset")).map(_.toLong)
    val maxPerBatch = Option(options.get("maxRecordsPerBatch")).map(_.toLong)
    new GraftScanBuilder(dir, startOffset, maxPerBatch, endOffset)
  }
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo): org.apache.spark.sql.connector.write.WriteBuilder =
    new GraftWriteBuilder(dir, info)
}

/** Accepts offset bound filters, column pruning, limit, and
  * manifest-answerable aggregates; everything else stays post-scan.
  */
class GraftScanBuilder(
    dir: String,
    startOffset: Option[Long] = None,
    maxPerBatch: Option[Long] = None,
    endOffset: Option[Long] = None
) extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  private var lo = Long.MinValue
  private var hi = Long.MaxValue
  private var pushed = Array.empty[Filter]
  private var requiredSchema: StructType = LogRecord.schema
  private var limit: Option[Int] = None
  private var pushedAgg: Option[Seq[GraftAggScan.Field]] = None

  /** COMPLETE aggregate pushdown for the queries a manifest answers
    * exactly: ungrouped COUNT(*) / COUNT(offset) (offset is never null) /
    * MIN(offset) / MAX(offset), optionally under pushed offset-range
    * filters. Offsets are contiguous within every manifested segment, so
    * the result is pure metadata arithmetic — `SELECT count(*) FROM log`
    * on a million-file log does ZERO file I/O (the analog of the
    * reference's O(1) HighestOffset, internal/log/log.go:118-131, but for
    * any offset window). Spark only attempts this when every filter was
    * pushed down, so residual predicates can't be silently ignored.
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    translateAgg(aggregation).isDefined

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    pushedAgg = translateAgg(aggregation)
    pushedAgg.isDefined
  }

  private def translateAgg(agg: Aggregation): Option[Seq[GraftAggScan.Field]] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    if (agg.groupByExpressions().nonEmpty) return None
    def isOffset(e: org.apache.spark.sql.connector.expressions.Expression): Boolean = e match {
      case nr: NamedReference => nr.fieldNames().toSeq == Seq("offset")
      case _                  => false
    }
    val fields = agg.aggregateExpressions().toSeq.map {
      case _: CountStar                                    => Some(GraftAggScan.CountAll)
      case c: Count if !c.isDistinct && isOffset(c.column) => Some(GraftAggScan.CountAll)
      case m: Min if isOffset(m.column)                    => Some(GraftAggScan.MinOffset)
      case m: Max if isOffset(m.column)                    => Some(GraftAggScan.MaxOffset)
      case _                                               => None
    }
    if (fields.nonEmpty && fields.forall(_.isDefined)) Some(fields.map(_.get)) else None
  }

  /** Limit pushdown reaches PARTITION PLANNING: ranged part names carry
    * exact record counts (offsets are contiguous within a part), so
    * planning stops as soon as the planned files provably cover the limit
    * — a `limit(10)` on a million-file log plans one partition. Reported
    * as partially pushed: Spark keeps its own Limit operator, we just
    * avoid planning (and opening) files that cannot contribute.
    */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark hands us the post-projection schema; empty (count(*)-style)
    // still needs one column to drive row iteration — keep offset.
    this.requiredSchema =
      if (requiredSchema.isEmpty) StructType(LogRecord.schema.filter(_.name == "offset"))
      else requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("offset", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("offset", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("offset", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("offset", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("offset", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    supported.foreach {
      case EqualTo(_, v) =>
        lo = math.max(lo, num(v)); hi = math.min(hi, num(v))
      // `offset > Long.MaxValue` / `< Long.MinValue` must yield an EMPTY
      // window, not wrap around: since these filters are reported as fully
      // pushed, nothing downstream re-checks them — a wrapped bound would
      // make a provably-false predicate scan (and, under aggregate
      // pushdown, COUNT) the whole log.
      case GreaterThan(_, v) =>
        if (num(v) == Long.MaxValue) { lo = Long.MaxValue; hi = Long.MinValue }
        else lo = math.max(lo, num(v) + 1)
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, num(v))
      case LessThan(_, v) =>
        if (num(v) == Long.MinValue) { lo = Long.MaxValue; hi = Long.MinValue }
        else hi = math.min(hi, num(v) - 1)
      case LessThanOrEqual(_, v) => hi = math.min(hi, num(v))
      case _                     => ()
    }
    pushed = supported
    rest // Spark re-applies all filters post-scan; pruning is our win
  }

  private def num(v: Any): Long = v.asInstanceOf[Number].longValue()

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val blo = startOffset.map(math.max(_, lo)).getOrElse(lo)
    // endOffset is exclusive; an endOffset of Long.MinValue would wrap —
    // clamp through the same empty-window convention as the filters.
    val bhi = endOffset match {
      case Some(e) if e == Long.MinValue => Long.MinValue
      case Some(e)                       => math.min(hi, e - 1)
      case None                          => hi
    }
    pushedAgg match {
      case Some(fields) => new GraftAggScan(dir, blo, bhi, fields)
      case None         => new GraftScan(dir, blo, bhi, requiredSchema, maxPerBatch, limit)
    }
  }
}

/** Completely-pushed-down aggregate scan: one metadata row computed from
  * the manifest, no file partitions planned, no file I/O.
  */
object GraftAggScan {
  sealed trait Field
  case object CountAll extends Field
  case object MinOffset extends Field
  case object MaxOffset extends Field
}

class GraftAggScan(
    dir: String,
    lo: Long,
    hi: Long,
    fields: Seq[GraftAggScan.Field]
) extends Scan {
  import GraftAggScan._

  override def readSchema(): StructType = StructType(fields.zipWithIndex.map {
    case (CountAll, i)  => StructField(s"count_$i", LongType, nullable = false)
    case (MinOffset, i) => StructField(s"min_$i", LongType)
    case (MaxOffset, i) => StructField(s"max_$i", LongType)
  })

  override def description(): String =
    s"GraftAggScan(dir=$dir, offsets=[$lo, $hi], pushedAggregates=[${fields.mkString(",")}])"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      // Pure manifest arithmetic: offsets are contiguous within each
      // manifested segment [base, next), so an offset window's row count
      // and endpoints never need a file open.
      val segs = LogManifest.read(dir).map(_.segments).getOrElse(Vector.empty)
      var count = 0L
      var minOff = Long.MaxValue
      var maxOff = Long.MinValue
      segs.foreach { s =>
        val a = math.max(lo, s.base)
        val b = math.min(hi, s.next - 1)
        if (a <= b) {
          count += b - a + 1
          if (a < minOff) minOff = a
          if (b > maxOff) maxOff = b
        }
      }
      val row: Array[Any] = fields.map {
        case CountAll  => count: Any
        case MinOffset => if (count > 0) (minOff: Any) else null
        case MaxOffset => if (count > 0) (maxOff: Any) else null
      }.toArray
      Array(GraftAggResultPartition(row))
    }
    override def createReaderFactory(): PartitionReaderFactory = GraftAggReaderFactory()
  }
}

case class GraftAggResultPartition(row: Array[Any]) extends InputPartition

case class GraftAggReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val values = partition.asInstanceOf[GraftAggResultPartition].row
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = new GenericInternalRow(values)
      override def close(): Unit = ()
    }
}

/** One input partition = one part file restricted to [lo, hi]. `dir` rides
  * along so a reader can re-plan its range if the file is compacted away
  * between planning and open.
  */
case class GraftInputPartition(dir: String, file: String, lo: Long, hi: Long)
    extends InputPartition

class GraftScan(
    dir: String,
    lo0: Long,
    hi0: Long,
    schema: StructType = LogRecord.schema,
    maxPerBatch: Option[Long] = None,
    limit: Option[Int] = None
) extends Scan
    with SupportsReportStatistics
    with SupportsRuntimeFiltering
    with SupportsReportOrdering {

  // Narrowed in place by runtime filters (below) before partition planning.
  private var lo = lo0
  private var hi = hi0

  /** Runtime (DPP-style) filtering: when the log table is joined and the
    * other side resolves first, Spark hands us the join keys at runtime —
    * we narrow the offset window before `planInputPartitions`, so part
    * files outside the runtime bounds are never even planned. The analog
    * of dynamic partition pruning for the offset dimension.
    */
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("offset"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("offset", vs) if vs.nonEmpty =>
      val nums = vs.collect { case n: Number => n.longValue() }
      if (nums.nonEmpty) {
        lo = math.max(lo, nums.min)
        hi = math.min(hi, nums.max)
      }
    case EqualTo("offset", v: Number) =>
      lo = math.max(lo, v.longValue()); hi = math.min(hi, v.longValue())
    case GreaterThan("offset", v: Number) =>
      if (v.longValue() == Long.MaxValue) { lo = Long.MaxValue; hi = Long.MinValue }
      else lo = math.max(lo, v.longValue() + 1)
    case GreaterThanOrEqual("offset", v: Number) => lo = math.max(lo, v.longValue())
    case LessThan("offset", v: Number) =>
      if (v.longValue() == Long.MinValue) { lo = Long.MaxValue; hi = Long.MinValue }
      else hi = math.min(hi, v.longValue() - 1)
    case LessThanOrEqual("offset", v: Number) => hi = math.min(hi, v.longValue())
    case _                                    => ()
  }

  override def readSchema(): StructType = schema
  override def description(): String =
    s"GraftScan(dir=$dir, offsets=[$lo, $hi], columns=[${schema.fieldNames.mkString(",")}])"

  /** Every partition emits rows in ascending offset order (writers append
    * offsets monotonically within a part file, and the compaction-race
    * re-plan reads replacement ranges lowest-first), so Spark can elide
    * per-partition sorts on `offset` — e.g. a sort-merge join against the
    * log, or an ORDER BY offset over one partition, skips its SortExec.
    */
  override def outputOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    if (schema.fieldNames.contains("offset"))
      Array(
        Expressions.sort(
          Expressions.column("offset"),
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING
        )
      )
    else Array.empty

  /** Manifest-derived size/row estimates, prorated by the pushed offset
    * range's overlap with each segment — Catalyst's CBO (join-side
    * selection, broadcast decisions) sees an accurate size for log-table
    * joins instead of a default-huge unknown. Metadata-only: no file I/O.
    */
  override def estimateStatistics(): Statistics = {
    val m = LogManifest.read(dir)
    new Statistics {
      private val (bytes, rows) = m match {
        case None => (0L, 0L)
        case Some(manifest) =>
          manifest.segments.foldLeft((0L, 0L)) { case ((b, r), s) =>
            val overlap =
              math.min(hi, s.next - 1) - math.max(lo, s.base) + 1
            if (overlap <= 0) (b, r)
            else {
              val total = s.next - s.base
              val frac = overlap.toDouble / math.max(total, 1L)
              (b + (s.bytes * frac).toLong, r + (s.records * frac).toLong)
            }
          }
      }
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
    }
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      GraftPlanning.partitionsFor(dir, lo, hi, limit)
    override def createReaderFactory(): PartitionReaderFactory =
      GraftReaderFactory(schema.fieldNames)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(
      dir,
      startAt = math.max(lo, 0L),
      fields = schema.fieldNames,
      maxRecordsPerBatch = maxPerBatch,
      // A batch-pushed hi can only come from the endOffset option here
      // (streaming scans never see pushFilters) — thread it through so a
      // bounded readStream actually stops at the snapshot instead of
      // silently tailing past it.
      endAt = if (hi == Long.MaxValue) None else Some(hi + 1)
    )
}

/** Shared partition planning: manifest segments ∩ [lo,hi] → ranged part
  * files ∩ [lo,hi].
  */
object GraftPlanning {
  def partitionsFor(
      dir: String,
      lo: Long,
      hi: Long,
      limit: Option[Int] = None
  ): Array[InputPartition] = {
    if (lo > hi) return Array.empty
    val manifest = LogManifest.read(dir).getOrElse(return Array.empty)
    val ranged = ParquetPointReader.RangedName
    val fs = LogFs.forPath(dir)
    val all = manifest.segments.iterator
      .filter(s => s.next > lo && s.base <= hi)
      .flatMap { s =>
        // Clamp to the segment's MANIFESTED window: a crashed (or
        // in-flight) append can leave published parts past `next` in the
        // active segment dir, and reading them would (a) surface
        // uncommitted records and (b) disagree with the manifest-answered
        // aggregate pushdown. Committed-read semantics: the manifest is
        // the one source of visibility for every scan shape.
        val slo = math.max(lo, s.base)
        val shi = math.min(hi, s.next - 1)
        val segDir = fs.child(dir, s"segment=${s.base}")
        fs.list(segDir)
          .filter { p =>
            fs.fileName(p) match {
              case ranged(mn, mx)              => mn.toLong <= shi && mx.toLong >= slo
              case n if n.endsWith(".parquet") => true
              case _                           => false
            }
          }
          // Offset-sorted, not listing-order: segments already iterate by
          // ascending base, so ordering each segment's (non-overlapping)
          // parts by their range makes the PLAN order globally ascending —
          // partition-order consumers (toLocalIterator delivery, limit
          // pushdown's early stop) then see offsets in log order with no
          // sort. Unranged legacy names fall back to name order, after
          // ranged ones.
          .sortBy { p =>
            fs.fileName(p) match {
              case ranged(mn, _) => (mn.toLong, fs.fileName(p))
              case n             => (Long.MaxValue, n)
            }
          }
          .map(p => GraftInputPartition(dir, p, slo, shi): InputPartition)
          .iterator
      }
    limit match {
      case None => all.toArray
      case Some(n) =>
        // Early-stop planning once the planned files PROVABLY cover the
        // limit. Offsets are contiguous within a ranged part, so its
        // overlap with [lo, hi] is an exact record count; unranged files
        // count as zero (pessimistic — never stops too early).
        var covered = 0L
        val out = Array.newBuilder[InputPartition]
        while (all.hasNext && covered < n) {
          val p = all.next()
          out += p
          val ip = p.asInstanceOf[GraftInputPartition]
          fs.fileName(ip.file) match {
            case ranged(mn, mx) =>
              // The partition's own bounds — clamped to the segment's
              // manifested window above — not the raw query range.
              covered += math.min(ip.hi, mx.toLong) - math.max(ip.lo, mn.toLong) + 1
            case _ => ()
          }
        }
        out.result()
    }
  }
}

object GraftReaderFactory {
  private[sources] val MetaFields = Set("_segment", "_part")
  private[sources] val SegDir = """segment=(\d+)""".r
}

case class GraftReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  // Metadata columns (_segment, _part) are synthesized per OPENED file —
  // the compaction-race re-plan can serve a partition from replacement
  // files, and the metadata must name what was actually read.
  private val dataFields = fields.filterNot(GraftReaderFactory.MetaFields.contains)
  private val metaIdx: Array[(Int, String)] =
    fields.zipWithIndex.collect { case (f, i) if GraftReaderFactory.MetaFields.contains(f) => (i, f) }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    new PartitionReader[InternalRow] {
      // Projected read: only the pruned columns' pages are decoded.
      private var open = Vector.empty[ParquetPointReader.RangeRowIterator]

      // Per-FILE splicer: the path parses and the UTF8String allocation
      // happen once per opened file; per row it is one masked array fill
      // (no hash lookups, no Option allocation — this is the scan hot
      // path).
      private def metaSplicer(file: String): Array[Any] => Array[Any] =
        if (metaIdx.isEmpty) identity
        else {
          val fs = LogFs.forPath(file)
          val segBase = fs.fileName(fs.parent(file)) match {
            case GraftReaderFactory.SegDir(b) => b.toLong
            case _                            => -1L
          }
          val part = org.apache.spark.unsafe.types.UTF8String.fromString(fs.fileName(file))
          val isMeta = new Array[Boolean](fields.length)
          val metaVal = new Array[Any](fields.length)
          metaIdx.foreach { case (i, f) =>
            isMeta(i) = true
            metaVal(i) = if (f == "_segment") segBase else part
          }
          row => {
            val out = new Array[Any](fields.length)
            var di = 0
            var i = 0
            while (i < fields.length) {
              if (isMeta(i)) out(i) = metaVal(i)
              else { out(i) = row(di); di += 1 }
              i += 1
            }
            out
          }
        }

      // Open one planned file; if it was compacted away between planning
      // and open, re-plan its remaining range against the fresh layout and
      // recurse — bounded, so back-to-back compactions racing each retry
      // can't loop forever. Compaction preserves offsets and part names
      // carry their ranges, so the vanished file's range ∩ [lo, hi] is
      // exactly re-readable. Opened files never vanish mid-read (POSIX fds
      // survive unlink); only the list→open window needs this. The
      // recursion covers files opened lazily inside the re-planned flatMap
      // too — each gets its own `replansLeft` budget decrement. A file with
      // an unranged (legacy) name can't be range-recovered — its offset
      // coverage is unknown, so a re-plan could double-read rows owned by
      // sibling partitions. Rethrow: the failure is permanent for this
      // query (Spark task retries re-execute the SAME serialized partition;
      // they do not re-plan), which is the honest trade — unranged names
      // only arise from pre-range-naming legacy writers, and any compact()
      // rewrites them to ranged names, shrinking this exposure to nothing.
      private def openPlanned(
          file: String,
          lo: Long,
          hi: Long,
          replansLeft: Int
      ): Iterator[Array[Any]] =
        try {
          val it0 = ParquetPointReader.readRangeRows(file, lo, hi, dataFields)
          open :+= it0
          if (metaIdx.isEmpty) it0 else it0.map(metaSplicer(file))
        } catch {
          case e @ (_: java.nio.file.NoSuchFileException | _: java.io.FileNotFoundException) =>
            LogFs.forPath(file).fileName(file) match {
              case ParquetPointReader.RangedName(mn, mx) if replansLeft > 0 =>
                val flo = math.max(lo, mn.toLong)
                val fhi = math.min(hi, mx.toLong)
                // Lowest-range-first: the scan reports ascending-offset
                // output per partition (SupportsReportOrdering), so the
                // replacement files must be drained in offset order.
                GraftPlanning
                  .partitionsFor(p.dir, flo, fhi)
                  .iterator
                  .map(_.asInstanceOf[GraftInputPartition])
                  .toVector
                  .sortBy { np =>
                    LogFs.forPath(np.file).fileName(np.file) match {
                      case ParquetPointReader.RangedName(m, _) => m.toLong
                      case _                                   => Long.MaxValue
                    }
                  }
                  .iterator
                  .flatMap { np =>
                    openPlanned(
                      np.file,
                      math.max(np.lo, flo),
                      math.min(np.hi, fhi),
                      replansLeft - 1
                    )
                  }
              case _ => throw e
            }
        }

      private var its: Iterator[Array[Any]] =
        openPlanned(p.file, p.lo, p.hi, replansLeft = 4)
      private var current: Array[Any] = _
      override def next(): Boolean = {
        if (its.hasNext) { current = its.next(); true } else false
      }
      override def get(): InternalRow = new GenericInternalRow(current)
      // Release the parquet readers even when Spark stops early (limit,
      // cancelled stream) — otherwise each truncated partition leaks an fd.
      override def close(): Unit = open.foreach(_.close())
    }
  }
}

/** Streaming cursor carrying a log offset (exclusive end of what's read). */
case class GraftStreamOffset(offset: Long) extends Offset {
  override def json(): String = s"""{"offset":$offset}"""
}

/** Micro-batch tail: each trigger covers log offsets [start, end).
  *
  * Admission control: `maxRecordsPerBatch` caps how far a trigger's end
  * offset may advance past its start — the backpressure lever for catch-up
  * from a deep log tail (the analog of the Kafka source's
  * `maxOffsetsPerTrigger`). Without it, the first batch after a long pause
  * would try to process the entire backlog at once.
  */
class GraftMicroBatchStream(
    dir: String,
    startAt: Long,
    fields: Array[String] = LogRecord.schema.fieldNames,
    maxRecordsPerBatch: Option[Long] = None,
    endAt: Option[Long] = None
) extends MicroBatchStream
    with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** Live tail, capped at the snapshot bound when `endOffset` was given —
    * a bounded stream drains `[startAt, endAt)` and then idles (or, under
    * AvailableNow, terminates).
    */
  private def nextOffset: Long = {
    val live = LogManifest.read(dir).map(_.nextOffset).getOrElse(startAt)
    endAt.fold(live)(math.min(live, _))
  }

  /** `Trigger.AvailableNow` support — the batch-drain twin of the
    * reference's ConsumeStream catch-up phase (reference: internal/server/
    * server.go:138-158): the end offset is PINNED here, at trigger start,
    * and every subsequent micro-batch drains toward it in
    * `maxRecordsPerBatch` chunks, terminating exactly at the pinned end.
    * Records appended after the pin belong to the next run — without the
    * pin (Spark's single-batch wrapper fallback), a restart with an
    * uncommitted batch could under-deliver the drain.
    */
  @volatile private var pinnedEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = pinnedEnd = Some(nextOffset)

  /** Offsets available to a running trigger: the pinned snapshot under
    * AvailableNow, the live manifest tail otherwise.
    */
  private def available: Long = pinnedEnd.getOrElse(nextOffset)

  override def initialOffset(): Offset = GraftStreamOffset(startAt)

  override def latestOffset(): Offset = GraftStreamOffset(available)

  override def getDefaultReadLimit: ReadLimit =
    maxRecordsPerBatch.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftStreamOffset].offset
    val end = limit match {
      case mr: ReadMaxRows => math.min(available, from + mr.maxRows())
      case _               => available
    }
    GraftStreamOffset(math.max(end, from))
  }

  override def reportLatestOffset(): Offset = GraftStreamOffset(nextOffset)

  override def deserializeOffset(json: String): Offset = {
    val n = json.replaceAll("[^0-9-]", "")
    GraftStreamOffset(if (n.isEmpty) startAt else n.toLong)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[GraftStreamOffset].offset
    val hi = end.asInstanceOf[GraftStreamOffset].offset - 1
    GraftPlanning.partitionsFor(dir, lo, hi)
  }

  override def createReaderFactory(): PartitionReaderFactory = GraftReaderFactory(fields)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
