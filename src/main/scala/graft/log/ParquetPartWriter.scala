package graft.log

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

/** Driver-side parquet writer for driver-resident record chunks.
  *
  * The single-record/small-batch append path (reference:
  * internal/log/log.go:80-92 — a buffered file write) has no business
  * scheduling a Spark job per commit: chunks built on the driver are
  * written straight through parquet-java. Bulk distributed ingest
  * (`appendDF`) still writes in parallel through Spark; both paths produce
  * identical-schema files that any Spark scan reads.
  */
private[log] object ParquetPartWriter {

  /** Parquet twin of LogRecord.schema (value nullable, rest required). */
  val schema: MessageType = MessageTypeParser.parseMessageType(
    """message graft_log_record {
      |  optional binary value;
      |  required int64 offset;
      |  required int64 term;
      |  required int32 recordType;
      |}""".stripMargin
  )

  /** Write `recs` as one snappy parquet file at `file`.
    *
    * The output handle comes from [[LogFs]]: plain local paths get
    * `LocalOutputFile` (plain NIO writes — skips the Hadoop LocalFileSystem
    * layer and its `.crc` sidecar files; parquet pages carry their own
    * CRCs), `scheme://` paths get `HadoopOutputFile` on the shared
    * filesystem.
    */
  /** Built once: the schema property never changes and Configuration
    * construction re-scans default resources (~5 ms) per instance.
    */
  private val writeConf: Configuration = {
    val c = new Configuration()
    GroupWriteSupport.setSchema(schema, c)
    c
  }

  def write(file: String, recs: Seq[LogRecord]): Unit = {
    val conf = writeConf
    val writer = ExampleParquetWriter
      .builder(LogFs.forPath(file).outputFile(file))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      // Same page bound as appendDF: keeps the column index fine-grained so
      // point reads scan at most ~2k rows after page skipping.
      .withPageRowCountLimit(2048)
      .build()
    try {
      recs.foreach { r =>
        val g = new SimpleGroup(schema)
        if (r.value != null) g.add("value", Binary.fromConstantByteArray(r.value))
        g.add("offset", r.offset)
        g.add("term", r.term)
        g.add("recordType", r.recordType)
        writer.write(g)
      }
    } finally writer.close()
  }
}
