package graft.server

import scala.collection.mutable.ArrayBuffer

/** The reference's chapter-1 toy: a slice-backed in-memory log with a JSON
  * twin of Record carrying only value+offset
  * (reference: internal/server/log.go:9-47, http.go:14-78). Kept for API
  * parity (H1/H2) and as the zero-dependency test double; the real engine
  * is [[graft.log.SparkLog]].
  */
final case class JsonRecord(value: Array[Byte], offset: Long)

/** HTTP-twin 404 (reference: internal/server/log.go:21 `ErrOffsetNotFound`). */
case object OffsetNotFoundException extends RuntimeException("offset not found") {
  val code: Int = 404
}

class InMemoryLog {
  private val records = ArrayBuffer.empty[JsonRecord]

  /** H1: offset = slice length (reference: internal/server/log.go:29-36). */
  def append(value: Array[Byte]): Long = synchronized {
    val off = records.length.toLong
    records += JsonRecord(value, off)
    off
  }

  /** H2: slice index read; 404 past the end
    * (reference: internal/server/log.go:39-47).
    */
  def read(offset: Long): JsonRecord = synchronized {
    if (offset < 0 || offset >= records.length) throw OffsetNotFoundException
    records(offset.toInt)
  }

  def size: Int = synchronized(records.length)
}
