package graft.log

import java.nio.charset.StandardCharsets

/** One segment's metadata: base offset (first offset it holds), the next
  * offset after its last record, store bytes and record count (the two roll
  * inputs, reference: internal/log/segment.go:81-83), and whether it is
  * sealed (no further part files may be added).
  */
final case class SegmentMeta(
    base: Long,
    next: Long,
    bytes: Long,
    records: Long,
    sealed_ : Boolean,
    /** Wall-clock stamp of segment creation — the input to policy-driven
      * retention ([[graft.log.SparkLog.retain]], the `log.retention.ms`
      * analog). 0 = unknown (pre-retention manifests, manifest-less
      * recovery): never age-dropped, only size-dropped.
      */
    createdAtMillis: Long = 0L
) {
  def maxOffset: Long = next - 1
  def isEmpty: Boolean = next == base
}

/** Log-level metadata: ordered segment list + next offset to assign.
  *
  * The manifest replaces the reference's mmap'd per-segment index files
  * (reference: internal/log/index.go) at the *log* level: O(1)
  * lowest/highest-offset answers (reference: internal/log/log.go:137-153) and
  * O(log #segments) segment location for point reads (the reference scans
  * linearly, internal/log/log.go:99-104). Within a segment, Parquet footer
  * min/max statistics on `offset` replace the per-record index entries.
  */
final case class LogManifest(
    segments: Vector[SegmentMeta],
    nextOffset: Long,
    /** Idempotence tokens: source name → last applied epoch/batch id. A
      * token travels in the SAME atomic manifest swap as the data it
      * commits, so "was this batch applied?" and "is the data visible?"
      * can never disagree — exactly-once appends for checkpointed
      * streaming sources (SURVEY §2.6).
      */
    tokens: Map[String, Long] = Map.empty,
    /** Writer-fencing epoch — the manifest-level stand-in for the Raft term
      * that makes split-brain writes impossible in the reference
      * (reference: internal/log/distributed.go:99-131, leader-only Apply).
      * A [[SparkLog]] claims the log at open by bumping this through a
      * compare-and-swap manifest publish and stamps every subsequent swap;
      * a swap that loses its CAS to a manifest carrying a DIFFERENT epoch
      * fails loudly ([[LogFencedException]]) instead of forking offset
      * history. 0 = legacy manifest written before fencing existed.
      */
    writerEpoch: Long = 0L
) {

  /** Segment holding `off`, if any: binary search over ordered bases. */
  def segmentFor(off: Long): Option[SegmentMeta] = {
    if (segments.isEmpty) return None
    var lo = 0
    var hi = segments.length - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (segments(mid).base <= off) lo = mid else hi = mid - 1
    }
    val s = segments(lo)
    if (s.base <= off && off < s.next) Some(s) else None
  }

  def lowestOffset: Long = segments.headOption.map(_.base).getOrElse(nextOffset)

  /** Last assigned offset. Empty-log quirk inherited verbatim from the
    * reference (internal/log/log.go:144-153 returns `nextOffset - 1` even
    * when nothing was appended): an empty log with initialOffset=16 reports
    * highest=15. Check `isEmpty` before trusting it on fresh logs.
    */
  def highestOffset: Long = math.max(nextOffset - 1, 0L)
  def isEmpty: Boolean = segments.forall(_.isEmpty)
}

/** Micro-helpers for the flat hand-rolled JSON the log metadata uses (no
  * external JSON deps resolve in this offline environment).
  */
private[log] object JsonFields {
  def long(src: String, name: String): Long = {
    val i = src.indexOf("\"" + name + "\":")
    require(i >= 0, s"missing field $name")
    val start = i + name.length + 3
    var end = start
    while (end < src.length && (src.charAt(end).isDigit || src.charAt(end) == '-')) end += 1
    src.substring(start, end).toLong
  }

  def bool(src: String, name: String): Boolean = {
    val i = src.indexOf("\"" + name + "\":")
    require(i >= 0, s"missing field $name")
    src.startsWith("true", i + name.length + 3)
  }

  def str(src: String, name: String): String = {
    val i = src.indexOf("\"" + name + "\":\"")
    require(i >= 0, s"missing field $name")
    val start = i + name.length + 4
    src.substring(start, src.indexOf('"', start))
  }
}

/** Flat-JSON (de)serialization with atomic publish (NIO rename locally, the
  * versioned single-object protocol on Hadoop filesystems — [[LogFs]]), so a
  * crash never leaves a torn manifest — the analog of the reference's index
  * truncate-to-used + fsync on close (reference: internal/log/index.go:68-79).
  * Recovery without a manifest re-lists segment directories, mirroring
  * `Log.setup`'s directory scan (reference: internal/log/log.go:39-68).
  */
object LogManifest {
  private val FileName = "_manifest.json" // leading '_' => invisible to Spark file listing

  private def encode(m: LogManifest): Array[Byte] = {
    val segs = m.segments
      .map(s =>
        s"""{"base":${s.base},"next":${s.next},"bytes":${s.bytes},"records":${s.records},"sealed":${s.sealed_},"createdAt":${s.createdAtMillis}}"""
      )
      .mkString("[", ",", "]")
    // Token names are caller-chosen identifiers: restrict to a safe charset
    // rather than implementing JSON string escaping in the minimal codec.
    m.tokens.keys.foreach { k =>
      require(k.matches("[A-Za-z0-9_.-]+"), s"invalid token name: $k")
    }
    val toks = m.tokens.toVector.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val json =
      s"""{"nextOffset":${m.nextOffset},"writerEpoch":${m.writerEpoch},"tokens":$toks,"segments":$segs}"""
    json.getBytes(StandardCharsets.UTF_8)
  }

  def write(dir: String, m: LogManifest): Unit =
    LogFs.forPath(dir).writeMeta(dir, FileName, encode(m))

  /** Compare-and-swap publish at version `expectedSeq + 1` — the fencing
    * primitive: exactly one of N racing writers lands any given version.
    * Returns false when that version already exists (the caller lost; it
    * must re-read and decide — see [[graft.log.SparkLog]]'s swap loop).
    */
  def writeCas(dir: String, m: LogManifest, expectedSeq: Long): Boolean =
    LogFs.forPath(dir).writeMetaCas(dir, FileName, encode(m), expectedSeq)

  def read(dir: String): Option[LogManifest] =
    LogFs.forPath(dir).readMeta(dir, FileName)
      .map(b => parse(new String(b, StandardCharsets.UTF_8)))

  /** Newest manifest plus its on-disk version sequence number (0 when only a
    * legacy unversioned file exists) — what a CAS-swapping writer tracks.
    */
  def readWithSeq(dir: String): Option[(Long, LogManifest)] =
    LogFs.forPath(dir).readMetaWithSeq(dir, FileName)
      .map { case (seq, b) => (seq, parse(new String(b, StandardCharsets.UTF_8))) }

  // Minimal parser for the exact flat shape written above (no external json
  // deps are resolvable in this environment).
  private[log] def parse(json: String): LogManifest = {
    import JsonFields.{long => longField, bool => boolField}
    val next = longField(json, "nextOffset")
    // Absent in pre-fencing manifests → epoch 0 (any claimant bumps to ≥1).
    val epoch =
      if (json.contains("\"writerEpoch\":")) longField(json, "writerEpoch") else 0L
    // Optional flat tokens object (absent in pre-token manifests).
    val tokens: Map[String, Long] = {
      val ti = json.indexOf("\"tokens\":{")
      if (ti < 0) Map.empty
      else {
        val start = ti + 10
        val end = json.indexOf('}', start)
        val body = json.substring(start, end).trim
        if (body.isEmpty) Map.empty
        else
          body
            .split(",")
            .map { kv =>
              val Array(k, v) = kv.split(":", 2)
              k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toLong
            }
            .toMap
      }
    }
    val arrStart = json.indexOf('[')
    val arrEnd = json.lastIndexOf(']')
    val body = json.substring(arrStart + 1, arrEnd).trim
    val segs =
      if (body.isEmpty) Vector.empty[SegmentMeta]
      else
        body
          .split("\\},\\s*\\{")
          .toVector
          .map { raw =>
            SegmentMeta(
              base = longField(raw, "base"),
              next = longField(raw, "next"),
              bytes = longField(raw, "bytes"),
              records = longField(raw, "records"),
              sealed_ = boolField(raw, "sealed"),
              // Absent in pre-retention manifests → 0 (age unknown).
              createdAtMillis =
                if (raw.contains("\"createdAt\":")) longField(raw, "createdAt") else 0L
            )
          }
    LogManifest(segs, next, tokens, epoch)
  }

  /** Manifest-less recovery: list `segment=<base>` directories, read each
    * segment's record count and max offset from Parquet footers (via a Spark
    * scan of the metadata columns would be heavier; we only need counts, so
    * the caller supplies a counting function). Mirrors the reference's
    * recovery sort of base offsets (reference: internal/log/log.go:54-56).
    */
  def listSegmentBases(dir: String): Vector[Long] = {
    val fs = LogFs.forPath(dir)
    // Name-shape filtering only: `segment=<digits>` children are only ever
    // created as directories, and a per-child isDir probe would cost one
    // extra round-trip per segment on object stores (N+1 on the recovery
    // path).
    fs.list(dir)
      .map(fs.fileName)
      .filter(n => n.startsWith("segment=") && n.stripPrefix("segment=").forall(_.isDigit) && n.length > 8)
      .map(_.stripPrefix("segment=").toLong)
      .sorted
  }
}

/** Write-ahead journal for a compaction swap: written before any directory
  * moves, deleted after the swap fully lands. On open, a surviving journal
  * means a crash mid-swap — [[graft.log.SparkLog]] rolls the swap back
  * (manifest not yet updated) or forward (it was), so committed offsets
  * never strand in `_old-*` / `_compact-*` directories.
  */
final case class CompactJournal(
    lo: Long,
    next: Long,
    newDir: String,
    olds: Seq[(Long, String)],
    /** File names of the merged segment's parts (fresh UUIDs — never
      * collide with an original part name). What split-rename-safe
      * rollback needs to evict half-swapped-in merged data from
      * `segment-<lo>` without guessing by offset range; empty on journals
      * written before this field existed.
      */
    newParts: Seq[String] = Nil
)

object CompactJournal {
  private val FileName = "_compact_journal.json"

  def write(dir: String, j: CompactJournal): Unit = {
    // newParts rides pipe-joined inside a JSON string (below); a '|' or '"'
    // in a part name would silently corrupt the journal and break the
    // named-parts rollback. publishPartsTo's generated names can't contain
    // either today — fail loudly if a future naming change breaks that.
    require(
      j.newParts.forall(n => !n.contains('|') && !n.contains('"')),
      s"CompactJournal part names must not contain '|' or '\"': ${j.newParts.mkString(",")}"
    )
    val olds = j.olds
      .map { case (b, d) => s"""{"base":$b,"dir":"$d"}""" }
      .mkString("[", ",", "]")
    // newParts rides as ONE pipe-joined string field: the olds parser
    // takes the first '['..last ']' slice, so a second JSON array here
    // would corrupt it.
    val json = s"""{"lo":${j.lo},"next":${j.next},"newDir":"${j.newDir}",""" +
      s""""newParts":"${j.newParts.mkString("|")}","olds":$olds}"""
    LogFs.forPath(dir).writeMeta(dir, FileName, json.getBytes(StandardCharsets.UTF_8))
  }

  def read(dir: String): Option[CompactJournal] =
    LogFs.forPath(dir).readMeta(dir, FileName).map { bytes =>
      val json = new String(bytes, StandardCharsets.UTF_8)
      import JsonFields.{long => longField, str => strField}
      val arrStart = json.indexOf('[')
      val arrEnd = json.lastIndexOf(']')
      val body = json.substring(arrStart + 1, arrEnd).trim
      val olds =
        if (body.isEmpty) Vector.empty[(Long, String)]
        else
          body
            .split("\\},\\s*\\{")
            .toVector
            .map(raw => (longField(raw, "base"), strField(raw, "dir")))
      val newParts = scala.util
        .Try(strField(json, "newParts"))
        .toOption
        .filter(_.nonEmpty)
        .map(_.split('|').toVector)
        .getOrElse(Vector.empty)
      CompactJournal(
        longField(json, "lo"),
        longField(json, "next"),
        strField(json, "newDir"),
        olds,
        newParts
      )
    }

  def delete(dir: String): Unit = LogFs.forPath(dir).deleteMeta(dir, FileName)
}
