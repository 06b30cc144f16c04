package graft.log

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory

/** Driver-side point read straight through parquet-java, bypassing Spark's
  * job machinery for single-record lookups.
  *
  * The reference answers a point read with one mmap index probe + one
  * positional file read (reference: internal/log/segment.go:66-79,
  * internal/log/index.go:40-56). Our analog: parquet footer min/max
  * statistics on `offset` select the part file and row group (skipped
  * groups cost zero page I/O via `skipNextRowGroup`), and — because the
  * writer emits offsets in ascending contiguous order — the matching group
  * is scanned only up to the target record.
  */
private[graft] object ParquetPointReader {

  /** `part-<minOffset>-<maxOffset>-<uuid>.parquet` — range baked into the
    * name by the writer so file selection needs no I/O at all.
    */
  private[graft] val RangedName = """part-(\d+)-(\d+)-.*\.parquet""".r

  /** Read the record at `offset` from one `segment=<base>` directory.
    * Returns None when no part file covers the offset.
    */
  def readOffset(segmentDir: Path, offset: Long): Option[LogRecord] = {
    if (!Files.isDirectory(segmentDir)) return None
    val listing = Files.list(segmentDir)
    val parts = try listing.iterator()
      .asScala
      .filter { p =>
        p.getFileName.toString match {
          case RangedName(mn, mx)                      => mn.toLong <= offset && offset <= mx.toLong
          case n if n.endsWith(".parquet")             => true // unranged: must inspect
          case _                                       => false
        }
      }
      .toVector
      .sortBy(_.getFileName.toString)
    finally listing.close()
    parts.iterator.flatMap { p =>
      val it = readRange(p, offset, offset)
      try it.nextOption()
      finally it.close()
    }.nextOption()
  }

  /** (min, max) of the `offset` column across a file's row groups, from
    * footer statistics only (no page I/O).
    */
  def offsetRange(file: Path): Option[(Long, Long)] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file.toUri), new Configuration())
    )
    try {
      val ranges = reader.getFooter.getBlocks.asScala.flatMap { block =>
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
    } finally reader.close()
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

  def readRangeRows(file: Path, lo: Long, hi: Long, fields: Array[String]): RangeRowIterator = {
    val withOffset = if (fields.contains("offset")) fields else fields :+ "offset"
    val inner = openRange(file, lo, hi, Some(withOffset))
    new RangeRowIterator {
      override def hasNext: Boolean = inner.hasNext
      override def next(): Array[Any] = {
        val g = inner.next()
        fields.map {
          case "offset" => g.offset
          case "value"  => g.value
          case "term"   => g.term
          case _        => g.recordType
        }
      }
      override def close(): Unit = inner.close()
    }
  }

  def readRange(file: Path, lo: Long, hi: Long): RangeIterator =
    openRange(file, lo, hi, None)

  private def openRange(
      file: Path,
      lo: Long,
      hi: Long,
      projection: Option[Array[String]]
  ): RangeIterator = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file.toUri), new Configuration())
    )
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
    val blocks = reader.getFooter.getBlocks.asScala.toVector

    new RangeIterator {
      private var blockIdx = 0
      private var rowsLeft = 0L
      private var rr: org.apache.parquet.io.RecordReader[org.apache.parquet.example.data.Group] = _
      private var nextRec: LogRecord = _
      private var closed = false

      private def blockInRange(i: Int): Boolean = {
        val stats = blocks(i).getColumns.asScala
          .find(_.getPath.toDotString == "offset")
          .map(_.getStatistics)
        stats match {
          case Some(st) if st != null && !st.isEmpty =>
            val mn = st.genericGetMin.asInstanceOf[Number].longValue()
            val mx = st.genericGetMax.asInstanceOf[Number].longValue()
            hi >= mn && lo <= mx
          case _ => true
        }
      }

      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && !closed) {
          if (rowsLeft > 0) {
            val g = rr.read()
            rowsLeft -= 1
            val off = g.getLong("offset", 0)
            if (off > hi) {
              // Writers emit offsets in ascending file order, so nothing
              // past `hi` can follow — stop instead of draining the row
              // group (a point read would otherwise scan to segment end).
              reader.close()
              closed = true
            } else if (off >= lo && off <= hi) {
              def has(f: String) =
                schema.containsField(f) && g.getFieldRepetitionCount(f) > 0
              // A null payload is written with repetition count 0 (the field
              // is optional); surface it as null — NOT empty bytes — so this
              // path round-trips identically to the native parquet scan.
              val value = if (has("value")) g.getBinary("value", 0).getBytes else null
              val term = if (has("term")) g.getLong("term", 0) else 0L
              val rt = if (has("recordType")) g.getInteger("recordType", 0) else 0
              nextRec = LogRecord(value, off, term, rt)
            }
          } else if (blockIdx < blocks.length) {
            if (blockInRange(blockIdx)) {
              val pages = reader.readNextRowGroup()
              rr = colIO.getRecordReader(pages, new GroupRecordConverter(schema))
              rowsLeft = pages.getRowCount
            } else reader.skipNextRowGroup()
            blockIdx += 1
          } else {
            reader.close()
            closed = true
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
