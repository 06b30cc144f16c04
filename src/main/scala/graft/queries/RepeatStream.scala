package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The resumable trainer-facing epoch stream (`stream-repeat` CLI verb):
  * [[Corpus.repeatApplyFrom]]'s epoch expansion consumed as a paged
  * stream in `(source, epoch, shard, pos)` order, where (shard, pos) is
  * the `corpus_shuffle` deal (seed 7) — trainers read a reproducible
  * pseudo-random order within each epoch and resume mid-epoch from a
  * cursor.
  *
  * Exactly-once WITHOUT a cursor file: each page lands as
  * `chunk-%06d` parquet whose `_SUCCESS` marker is the commit; the cursor
  * IS the max key of the last committed chunk, so cursor and data can
  * never disagree. A crash mid-write leaves a markerless dir that the
  * retry overwrites with byte-identical content (the page is a
  * deterministic function of the cursor: the order key is unique, so
  * `ORDER BY key LIMIT n` has no tie freedom).
  *
  * Scale shape: each page is one cursor-filtered pass over the epoch
  * expansion ending in a TakeOrdered partial top-k (never a global sort);
  * the per-page recompute amortizes by page size — a trainer pulls
  * millions of rows per page, not thousands (tests use tiny pages to
  * force many boundaries).
  *
  * CORPUS-VERSION PIN (the swap contract): the first page writes a
  * `_source` meta recording a metadata-only fingerprint of the docs
  * listing; every later page requires it to match. The cursor is a
  * position in the PINNED corpus's shuffle deal — after an in-place
  * corpus rewrite (a v=N bump republishing documents.parquet) the deal
  * is a different permutation over different rows, so the old cursor is
  * meaningless in the new version. Rather than silently emitting a page
  * that straddles versions, [[emitNext]] throws [[CorpusChangedException]];
  * trainers start a fresh stream dir per corpus version (committed
  * chunks remain readable — they are wholly from the pinned version).
  *
  * CONCURRENT READERS: pages are deterministic functions of the cursor,
  * and in-process emitters serialize per outDir, so N readers racing
  * [[emitNext]] extend ONE shared stream — each seq commits exactly once
  * and every consumer reading `chunk-*` in seq order sees identical page
  * contents. Cross-process emitters converge to the same bytes
  * (deterministic pages + overwrite), but should still be coordinated —
  * two JVMs committing the same seq concurrently waste work.
  */
object RepeatStream {

  /** The stream's pinned corpus changed underneath it — the cursor
    * cannot be carried into the new version (see the class doc).
    */
  final class CorpusChangedException(msg: String) extends RuntimeException(msg)

  /** The full ordered stream table:
    * `(doc_id, source, epoch, n_tokens, shard, pos)`.
    */
  def orderedRows(s: SparkSession, d: String): DataFrame = {
    val h = md5(concat(lit("7:"), col("doc_id").cast("string")))
    val deal = Q
      .t(s, d, "documents")
      .select(
        col("doc_id"),
        h.as("h"),
        pmod(conv(substring(h, 1, 15), 16, 10).cast("long"), lit(64)).as("shard")
      )
      .withColumn(
        "pos",
        row_number()
          .over(org.apache.spark.sql.expressions.Window.partitionBy("shard").orderBy("h", "doc_id"))
          .cast("long")
      )
      .select("doc_id", "shard", "pos")
    Corpus
      .repeatApplyFrom(s, d)
      .join(deal, "doc_id")
      .select("doc_id", "source", "epoch", "n_tokens", "shard", "pos")
  }

  private val ChunkRe = "^chunk-(\\d{6})$".r

  private def fsOf(s: SparkSession, dir: String) =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Sequence numbers of COMMITTED chunks (dir present + _SUCCESS). */
  def committedSeqs(s: SparkSession, outDir: String): Vector[Int] = {
    val f = fsOf(s, outDir)
    val p = new Path(outDir)
    if (!f.exists(p)) return Vector.empty
    f.listStatus(p)
      .toVector
      .collect {
        case st if st.isDirectory =>
          st.getPath.getName match {
            case ChunkRe(n) if f.exists(new Path(st.getPath, "_SUCCESS")) => Some(n.toInt)
            case _                                                        => None
          }
      }
      .flatten
      .sorted
  }

  private def chunkPath(outDir: String, seq: Int): String =
    f"${outDir.stripSuffix("/")}/chunk-$seq%06d"

  /** Emit the next page after the committed cursor. Returns
    * `Some((seq, rows, lastKeyString))` or None when the stream is
    * drained. Safe to call after a crash at any point: an uncommitted
    * chunk dir is recomputed and overwritten identically.
    */
  private val emitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def emitNext(s: SparkSession, docsDir: String, outDir: String, pageRows: Int): Option[(Int, Long, String)] = {
    // In-process emitters serialize per stream dir: concurrent readers
    // extend one shared stream, each seq committed exactly once.
    val lock = emitLocks.computeIfAbsent(outDir.stripSuffix("/"), _ => new Object)
    lock.synchronized {
      // Scoped: free only THIS page build's localCheckpoints — a caller
      // composing emitNext inside its own query build keeps its live
      // checkpoints (advisor r11).
      Checkpoints.scoped(emitNextInScope(s, docsDir, outDir, pageRows))
    }
  }

  /** Enforce (or establish, on the first page) the stream's corpus pin. */
  private def pinSource(s: SparkSession, docsDir: String, outDir: String): Unit = {
    val f = fsOf(s, outDir)
    val meta = new Path(s"$outDir/_source")
    val fp = Q.docsFingerprint(s, docsDir)
    if (f.exists(meta)) {
      val in = f.open(meta)
      val pinned =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      if (pinned != fp)
        throw new CorpusChangedException(
          s"stream at $outDir is pinned to corpus fingerprint $pinned but $docsDir " +
            s"now fingerprints $fp — the cursor cannot be carried across a corpus " +
            "version bump; start a fresh stream dir for the new version"
        )
    } else {
      // First page (or a legacy pre-pin stream): pin the CURRENT corpus.
      // Concurrent first writers race to an identical value; a crash
      // between this PUT and chunk-0 re-pins the same fingerprint.
      f.mkdirs(new Path(outDir))
      val out = f.create(meta, true)
      try out.write(fp.getBytes("UTF-8"))
      finally out.close()
    }
  }

  private def emitNextInScope(
      s: SparkSession,
      docsDir: String,
      outDir: String,
      pageRows: Int
  ): Option[(Int, Long, String)] = {
    require(pageRows > 0, "pageRows must be positive")
    pinSource(s, docsDir, outDir)
    val seqs = committedSeqs(s, outDir)
    val next = seqs.lastOption.map(_ + 1).getOrElse(0)
    // Cursor = max order key of the last committed chunk (pages are
    // written in order, so the max of the LAST chunk is the global max).
    val cursor = seqs.lastOption.map { last =>
      s.read
        .parquet(chunkPath(outDir, last))
        .orderBy(desc("source"), desc("epoch"), desc("shard"), desc("pos"))
        .limit(1)
        .select("source", "epoch", "shard", "pos")
        .head()
    }
    val base = orderedRows(s, docsDir)
    val after = cursor.fold(base) { c =>
      base.filter(
        struct(col("source"), col("epoch"), col("shard"), col("pos")) >
          struct(
            lit(c.getString(0)),
            lit(c.getLong(1)),
            lit(c.getLong(2)),
            lit(c.getLong(3))
          )
      )
    }
    val page = after.orderBy("source", "epoch", "shard", "pos").limit(pageRows)
    val dest = chunkPath(outDir, next)
    page.write.mode("overwrite").parquet(dest)
    val written = s.read.parquet(dest)
    val n = written.count()
    if (n == 0L) {
      // Drained: retract the empty page so the committed-chunk listing
      // stays "every chunk carries rows" and a later re-drain is a no-op.
      fsOf(s, outDir).delete(new Path(dest), true)
      None
    } else {
      val lastRow = written
        .orderBy(desc("source"), desc("epoch"), desc("shard"), desc("pos"))
        .limit(1)
        .head()
      Some(
        (
          next,
          n,
          s"(${lastRow.getAs[String]("source")}, ${lastRow.getAs[Long]("epoch")}, " +
            s"${lastRow.getAs[Long]("shard")}, ${lastRow.getAs[Long]("pos")})"
        )
      )
    }
  }
}
