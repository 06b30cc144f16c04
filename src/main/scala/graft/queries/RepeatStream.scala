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
  */
object RepeatStream {

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
  def emitNext(s: SparkSession, docsDir: String, outDir: String, pageRows: Int): Option[(Int, Long, String)] =
    // Scoped: free only THIS page build's localCheckpoints — a caller
    // composing emitNext inside its own query build keeps its live
    // checkpoints (advisor r11).
    Checkpoints.scoped(emitNextInScope(s, docsDir, outDir, pageRows))

  private def emitNextInScope(
      s: SparkSession,
      docsDir: String,
      outDir: String,
      pageRows: Int
  ): Option[(Int, Long, String)] = {
    require(pageRows > 0, "pageRows must be positive")
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
