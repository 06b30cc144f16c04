package graft.log

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

/** Value-only staged parquet files — the intermediate the DSv2 sink's
  * executor tasks write and the commit job re-reads. Separate from the
  * final LogRecord part format on purpose: a staged file has no offsets
  * (they don't exist until commit assigns them), so nothing about it can
  * be mistaken for published log data.
  */
private[graft] object StagedParquet {

  val valueSchema: MessageType = MessageTypeParser.parseMessageType(
    "message graft_staged_value { optional binary value; }"
  )

  private val writeConf: Configuration = {
    val c = new Configuration()
    GroupWriteSupport.setSchema(valueSchema, c)
    c
  }

  private val readConf = new Configuration()

  /** Incremental writer for one staged file (executor-side; LogFs handles
    * route local paths through plain NIO, `scheme://` through Hadoop).
    */
  final class ValueWriter(path: String) {
    private val writer = ExampleParquetWriter
      .builder(LogFs.forPath(path).outputFile(path))
      .withConf(writeConf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    def write(value: Array[Byte]): Unit = {
      val g = new SimpleGroup(valueSchema)
      if (value != null) g.add("value", Binary.fromConstantByteArray(value))
      writer.write(g)
    }
    def close(): Unit = writer.close()
  }

  /** Sequential full read of a staged file's values, in file order (null
    * payloads surface as null). Caller must exhaust or close.
    */
  def readValues(file: String): Iterator[Array[Byte]] with AutoCloseable = {
    val in = LogFs.forPath(file).inputFile(file)
    val reader = ParquetFileReader.open(in, HadoopReadOptions.builder(readConf).build())
    val schema = reader.getFooter.getFileMetaData.getSchema
    val colIO = new ColumnIOFactory().getColumnIO(schema)

    new Iterator[Array[Byte]] with AutoCloseable {
      private var rowsLeft = 0L
      private var rr: org.apache.parquet.io.RecordReader[org.apache.parquet.example.data.Group] = _
      private var closed = false
      private var nextVal: Array[Byte] = _
      private var hasPending = false

      private def advance(): Unit = {
        hasPending = false
        while (!hasPending && !closed) {
          if (rowsLeft > 0) {
            val g = rr.read()
            rowsLeft -= 1
            if (g != null) {
              nextVal = if (g.getFieldRepetitionCount("value") > 0) g.getBinary("value", 0).getBytes else null
              hasPending = true
            }
          } else {
            val pages = reader.readNextRowGroup()
            if (pages == null) { reader.close(); closed = true }
            else {
              rr = colIO.getRecordReader(pages, new GroupRecordConverter(schema))
              rowsLeft = pages.getRowCount
            }
          }
        }
      }

      advance()
      override def hasNext: Boolean = hasPending
      override def next(): Array[Byte] = {
        val v = nextVal
        advance()
        v
      }
      override def close(): Unit = if (!closed) { closed = true; reader.close() }
    }
  }

  /** Footer-only row count — no data pages are read or decoded. */
  def rowCount(file: String): Long = {
    val r = ParquetFileReader.open(
      LogFs.forPath(file).inputFile(file),
      HadoopReadOptions.builder(readConf).build()
    )
    try r.getRecordCount
    finally r.close()
  }

  /** Cached once, same rationale as [[ParquetPartWriter.writeConf]]:
    * Configuration construction re-scans default XMLs (~5 ms/instance),
    * which a task rolling many parts would otherwise pay per part.
    */
  private val recordWriteConf: Configuration = {
    val c = new Configuration()
    GroupWriteSupport.setSchema(ParquetPartWriter.schema, c)
    c
  }

  /** Rewrite one staged file into final LogRecord part file(s) under
    * `outDir`, assigning offsets `start..start+n-1` in file order. Rolls a
    * new part every `maxRecordsPerPart` records so a single huge writer
    * task cannot produce an unboundedly large part file. Streaming:
    * constant memory regardless of file size. Returns parts written.
    *
    * RETRY-SAFE under Spark task re-attempts (executor loss, speculation):
    * each part streams into an attempt-unique temp name — invisible to the
    * publish step, which only picks up `*.parquet` — and is MOVED to its
    * deterministic final name `staged-<start>-<idx>.parquet` once complete.
    * Offsets make re-attempt output byte-identical, so whichever attempt
    * lands the final name first wins and the loser just drops its temp; a
    * torn file from a killed attempt can only ever live under a temp name.
    */
  def rewriteToParts(
      stagedFile: String,
      outDir: String,
      start: Long,
      maxRecordsPerPart: Long
  ): Int = {
    val fs = LogFs.forPath(outDir)
    val values = readValues(stagedFile)
    var off = start
    var parts = 0
    var writer: org.apache.parquet.hadoop.ParquetWriter[org.apache.parquet.example.data.Group] = null
    var tmp: String = null
    var inPart = 0L

    def finishPart(): Unit = {
      writer.close()
      writer = null
      val dest = fs.child(outDir, f"staged-$start%020d-${parts - 1}%05d.parquet")
      // NIO move replaces atomically (POSIX rename); Hadoop rename throws
      // when a prior attempt already landed the part — identical content,
      // so drop ours. But a rename can also fail transiently (FS/object-store
      // hiccup) with no prior attempt in sight; silently dropping the temp
      // then would lose this part's records while the commit still counts
      // them — a durable manifest/data mismatch. Only discard when the
      // destination verifiably exists; otherwise rethrow so the task retries.
      try fs.move(tmp, dest)
      catch {
        case e @ (_: java.io.IOException | _: java.nio.file.FileAlreadyExistsException) =>
          if (fs.exists(dest)) {
            try fs.delete(tmp)
            catch { case _: Exception => () }
          } else throw e
      }
      tmp = null
    }

    try {
      while (values.hasNext) {
        if (writer == null) {
          tmp = fs.child(outDir, s"inflight-${java.util.UUID.randomUUID().toString.take(12)}")
          writer = ExampleParquetWriter
            .builder(fs.outputFile(tmp))
            .withConf(recordWriteConf)
            .withCompressionCodec(CompressionCodecName.SNAPPY)
            // Same page bound as every other writer: keeps the column index
            // fine-grained so point reads stay page-local.
            .withPageRowCountLimit(2048)
            .build()
          parts += 1
          inPart = 0L
        }
        val v = values.next()
        val g = new SimpleGroup(ParquetPartWriter.schema)
        if (v != null) g.add("value", Binary.fromConstantByteArray(v))
        g.add("offset", off)
        g.add("term", 0L)
        g.add("recordType", 0)
        writer.write(g)
        off += 1
        inPart += 1
        if (inPart >= maxRecordsPerPart) finishPart()
      }
      if (writer != null) finishPart()
    } finally {
      if (writer != null) writer.close() // abnormal exit: leave only a temp
      values.close()
    }
    parts
  }
}
