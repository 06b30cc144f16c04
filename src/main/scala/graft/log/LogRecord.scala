package graft.log

/** The engine's single logical record type.
  *
  * Mirrors the reference wire schema `Record` (reference: api/v1/log.proto:7-12):
  * an opaque `bytes` payload plus the engine-assigned position in the log, and
  * the two Raft-dual-use fields (`term`, `type`) kept for API parity
  * (reference: internal/log/distributed_log_store.go:37-48).
  *
  * Deviation (documented in SURVEY.md §7.4): the reference's `uint64` offset
  * narrows to a signed Spark `LongType`; offsets are bounded by 2^63-1.
  */
final case class LogRecord(
    value: Array[Byte],
    offset: Long,
    term: Long = 0L,
    recordType: Int = 0
)

object LogRecord {
  import org.apache.spark.sql.types._

  /** StructType of the log table: value BINARY, offset BIGINT, term BIGINT,
    * recordType INT. Column order matches the case class so Encoders agree.
    */
  val schema: StructType = StructType(
    Seq(
      StructField("value", BinaryType, nullable = true),
      StructField("offset", LongType, nullable = false),
      StructField("term", LongType, nullable = false),
      StructField("recordType", IntegerType, nullable = false)
    )
  )
}

/** Log configuration, mirroring the reference's `Config.Segment`
  * (reference: internal/log/config.go:5-17, defaults internal/log/log.go:26-31).
  *
  * The reference defaults both thresholds to 1024 bytes — pathological for
  * Parquet — so our defaults target cluster-scale segments (128 MiB / 4M
  * records) while tests shrink them to force multi-segment logs exactly like
  * the reference's own tests do (reference: internal/log/log_test.go:27).
  *
  * `maxRecordsPerSegment` is the analog of `MaxIndexBytes / entryWidth`
  * (12-byte index entries, reference: internal/log/index.go:10-14): the
  * reference caps a segment by index capacity as well as store bytes.
  */
final case class LogConfig(
    maxStoreBytes: Long = 128L * 1024 * 1024,
    maxRecordsPerSegment: Long = 4L * 1024 * 1024,
    initialOffset: Long = 0L
)

object LogConfig {
  /** The reference's literal defaults — 1024-byte store cap and the
    * 1024-byte index cap's 85-entry record bound
    * (reference: internal/log/log.go:26-31, index entryWidth=12
    * internal/log/index.go:10-14). Pathological for Parquet; provided for
    * behavioral parity tests only.
    */
  val referenceDefaults: LogConfig =
    LogConfig(maxStoreBytes = 1024L, maxRecordsPerSegment = 1024L / 12)
}

/** Typed error for reads past the log end, carrying HTTP-404 semantics like
  * the reference's `ErrOffsetOutOfRange` (reference: api/v1/error.go:10-30,
  * raised internal/log/log.go:105-107). Message text matches the gRPC status
  * message asserted in reference: internal/server/server_test.go:207-209.
  */
final case class OffsetOutOfRangeException(offset: Long)
    extends RuntimeException(s"offset out of range: $offset") {
  val code: Int = 404
}

/** Thrown when a manifest swap observes that another writer has claimed the
  * log since this handle was opened — the inter-process analog of the
  * reference losing Raft leadership (reference: internal/log/distributed.go:99-131,
  * only the leader's Apply commits). A fenced handle must be discarded; its
  * in-flight operation was rolled back, never half-committed.
  */
final case class LogFencedException(dir: String, ourEpoch: Long, observedEpoch: Long)
    extends RuntimeException(
      s"log writer fenced: this writer holds epoch $ourEpoch but $dir is at epoch " +
        s"$observedEpoch — another SparkLog claimed the log (zombie driver, duplicate " +
        "job, or a second writer); discard this handle and reopen to continue"
    )
