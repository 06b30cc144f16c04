package graft.log

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.io.ColumnIOFactory

/** Driver-side point read straight through parquet-java, bypassing Spark's
  * job machinery for single-record lookups.
  *
  * The reference answers a point read with one mmap index probe + one
  * positional file read (reference: internal/log/segment.go:66-79,
  * internal/log/index.go:40-56). Our analog: offset-range part file names
  * select the file with zero I/O, a filter2 predicate on `offset` drops
  * row groups via footer stats and non-matching pages via the parquet
  * column index, and — because the writer emits offsets in ascending
  * contiguous order — the surviving page is scanned only up to the target
  * record. File handles come from [[LogFs]]: plain NIO (`LocalInputFile`,
  * no Hadoop dispatch) for local paths, `HadoopInputFile` for `scheme://`
  * paths — this same code runs executor-side against shared filesystems.
  */
private[graft] object ParquetPointReader {

  /** `part-<minOffset>-<maxOffset>-<uuid>.parquet` — range baked into the
    * name by the writer so file selection needs no I/O at all.
    */
  private[graft] val RangedName = """part-(\d+)-(\d+)-.*\.parquet""".r

  /** LRU cache of parsed footers. Part files are IMMUTABLE once published
    * (atomic rename into place, uuid-suffixed names that are never reused —
    * truncate deletes, compaction writes new names), so a parsed footer
    * stays valid for the file's lifetime and a stale entry for a deleted
    * path is merely dead weight. Footer thrift parsing measured ~10 ms on a
    * 100k-row part — the dominant cost of a warm point read.
    */
  /** One shared read-only Configuration: constructing a Configuration per
    * read re-scans the default resource XMLs (~5 ms measured) for nothing —
    * the options built from it never mutate it.
    */
  private val sharedConf = new Configuration()

  private val footerCache =
    new java.util.LinkedHashMap[String, org.apache.parquet.hadoop.metadata.ParquetMetadata](
      64,
      0.75f,
      true
    ) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, org.apache.parquet.hadoop.metadata.ParquetMetadata]
      ): Boolean = size() > 64
    }

  /** Read the record at `offset` from one `segment=<base>` directory.
    * Returns None when no part file covers the offset.
    */
  def readOffset(segmentDir: String, offset: Long): Option[LogRecord] = {
    val fs = LogFs.forPath(segmentDir)
    val parts = fs
      .list(segmentDir)
      .filter { p =>
        fs.fileName(p) match {
          case RangedName(mn, mx)          => mn.toLong <= offset && offset <= mx.toLong
          case n if n.endsWith(".parquet") => true // unranged: must inspect
          case _                           => false
        }
      }
      .sortBy(fs.fileName)
    parts.iterator.flatMap { p =>
      val it = readRange(p, offset, offset)
      try it.nextOption()
      finally it.close()
    }.nextOption()
  }

  /** (min, max) of the `offset` column across a file's row groups, from
    * footer statistics only (no page I/O).
    */
  def offsetRange(file: String): Option[(Long, Long)] = {
    val ranges = footerOf(file).getBlocks.asScala.flatMap { block =>
      block.getColumns.asScala
        .find(_.getPath.toDotString == "offset")
        .map(_.getStatistics)
        .collect {
          case st if st != null && !st.isEmpty =>
            (
              st.genericGetMin.asInstanceOf[Number].longValue(),
              st.genericGetMax.asInstanceOf[Number].longValue()
            )
        }
    }
    if (ranges.isEmpty) None else Some((ranges.map(_._1).min, ranges.map(_._2).max))
  }

  /** Parse-once footer access through the LRU cache. Local paths read via
    * plain NIO (`LocalInputFile`): no Hadoop FileSystem dispatch and no
    * .crc sidecar verification.
    */
  private def footerOf(file: String): org.apache.parquet.hadoop.metadata.ParquetMetadata = {
    val c = footerCache.synchronized(footerCache.get(file))
    if (c != null) c
    else {
      val r = ParquetFileReader.open(LogFs.forPath(file).inputFile(file))
      try {
        val f = r.getFooter
        footerCache.synchronized(footerCache.put(file, f))
        f
      } finally r.close()
    }
  }

  /** Iterate every record with `lo <= offset <= hi` in one part file, in
    * file order. Row groups outside the range are skipped via footer stats
    * (zero page I/O). Used by the "graft" DataSource V2 partition readers —
    * runs executor-side there.
    */
  /** Iterator over a range that can release its file handle early —
    * partition readers must close it when Spark stops consuming (limit,
    * cancelled stream) before exhaustion.
    */
  trait RangeIterator extends Iterator[LogRecord] with AutoCloseable

  /** Projected variant for the DSv2 readers: yields one `Array[Any]` per
    * record holding exactly `fields` (in order), decoding ONLY those
    * columns — the parquet reader gets a pruned requested schema, so a
    * `SELECT offset` never pays for the value bytes. `offset` is always
    * read internally for range filtering.
    */
  trait RangeRowIterator extends Iterator[Array[Any]] with AutoCloseable

  def readRangeRows(file: String, lo: Long, hi: Long, fields: Array[String]): RangeRowIterator = {
    val withOffset = if (fields.contains("offset")) fields else fields :+ "offset"
    val inner = openRange(file, lo, hi, Some(withOffset))
    new RangeRowIterator {
      override def hasNext: Boolean = inner.hasNext
      override def next(): Array[Any] = {
        val g = inner.next()
        fields.map {
          case "offset"     => g.offset
          case "value"      => g.value
          case "term"       => g.term
          case "recordType" => g.recordType
          // Fail loud: silently substituting recordType for an unknown
          // requested column would materialize wrong data into every row.
          case other => throw new IllegalArgumentException(s"unknown log column: $other")
        }
      }
      override def close(): Unit = inner.close()
    }
  }

  def readRange(file: String, lo: Long, hi: Long): RangeIterator =
    openRange(file, lo, hi, None)

  private def openRange(
      file: String,
      lo: Long,
      hi: Long,
      projection: Option[Array[String]]
  ): RangeIterator = {
    // Push the offset range into the reader as a filter2 predicate: the
    // constructor drops whole row groups via footer stats, and
    // readNextFilteredRowGroup() uses the parquet COLUMN INDEX (page-level
    // min/max written by the part writer) to decode only the pages whose
    // offset range overlaps [lo, hi]. A point read in a large sealed
    // segment touches one page (~a few thousand rows) per column instead
    // of every page up to the target — the analog of the reference's O(1)
    // mmap index probe (reference: internal/log/index.go:40-56) at page
    // granularity.
    val rowFilter = FilterCompat.get(
      FilterApi.and(
        FilterApi.gtEq(FilterApi.longColumn("offset"), java.lang.Long.valueOf(lo)),
        FilterApi.ltEq(FilterApi.longColumn("offset"), java.lang.Long.valueOf(hi))
      )
    )
    val opts = HadoopReadOptions.builder(sharedConf).withRecordFilter(rowFilter).build()
    val in = LogFs.forPath(file).inputFile(file)
    // Footer from the LRU cache (parse-once); the constructor still applies
    // the row-group filters for THIS call's offset range. Resolve the footer
    // BEFORE opening the stream, and close the stream if the constructor
    // throws (corrupt footer, file vanished after a cached-footer hit) —
    // otherwise every failed open, including each compaction-race retry,
    // leaks one fd.
    val footer = footerOf(file)
    val stream = in.newStream()
    val reader =
      try new ParquetFileReader(in, footer, opts, stream)
      catch {
        case t: Throwable =>
          try stream.close()
          catch { case suppressed: Throwable => t.addSuppressed(suppressed) }
          throw t
      }
    val fileSchema = reader.getFooter.getFileMetaData.getSchema
    // Projection pushdown: request only the needed columns so the reader
    // never decompresses/decodes the others' pages.
    val schema = projection match {
      case Some(fields) =>
        val kept = fields.filter(fileSchema.containsField)
        new org.apache.parquet.schema.MessageType(
          fileSchema.getName,
          kept.map(f => fileSchema.getType(Seq(f): _*)): _*
        )
      case None => fileSchema
    }
    reader.setRequestedSchema(schema)
    val colIO = new ColumnIOFactory().getColumnIO(schema)

    new RangeIterator {
      private var rowsLeft = 0L
      private var rr: org.apache.parquet.io.RecordReader[org.apache.parquet.example.data.Group] = _
      private var nextRec: LogRecord = _
      private var closed = false

      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && !closed) {
          if (rowsLeft > 0) {
            val g = rr.read()
            rowsLeft -= 1
            if (g == null || rr.shouldSkipCurrentRecord()) {
              // record-level filter miss inside a kept page — keep scanning
            } else {
              val off = g.getLong("offset", 0)
              if (off > hi) {
                // Writers emit offsets in ascending file order, so nothing
                // past `hi` can follow — stop instead of draining the group.
                reader.close()
                closed = true
              } else if (off >= lo) {
                def has(f: String) =
                  schema.containsField(f) && g.getFieldRepetitionCount(f) > 0
                // A null payload is written with repetition count 0 (the
                // field is optional); surface it as null — NOT empty bytes —
                // so this path round-trips identically to the native scan.
                val value = if (has("value")) g.getBinary("value", 0).getBytes else null
                val term = if (has("term")) g.getLong("term", 0) else 0L
                val rt = if (has("recordType")) g.getInteger("recordType", 0) else 0
                nextRec = LogRecord(value, off, term, rt)
              }
            }
          } else {
            val pages = reader.readNextFilteredRowGroup()
            if (pages == null) {
              reader.close()
              closed = true
            } else {
              rr = colIO.getRecordReader(pages, new GroupRecordConverter(schema), rowFilter)
              rowsLeft = pages.getRowCount
            }
          }
        }
      }

      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): LogRecord = {
        val r = nextRec
        advance()
        r
      }
      override def close(): Unit =
        if (!closed) { closed = true; reader.close() }
    }
  }

}
