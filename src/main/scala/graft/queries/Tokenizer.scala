package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent, versioned BPE merge table — the tokenizer-as-artifact.
  *
  * Real trainers build a tokenizer once and apply it for months; the merge
  * table is STATE, not a per-query computation (the reference treats its
  * index the same way: `segment.go:19-44` recovers persisted index state on
  * open rather than rebuilding it from the store). This is the [[AnnIndex]]
  * build/probe split applied to [[Bpe]]:
  *
  * {{{
  *   <indexDir>/v=<N>/merges/          parquet (rank INT, pair STRING)
  *   <indexDir>/v=<N>/_complete        "fp=<md5>;k=<k>;nmerges=<m>" — commit
  * }}}
  *
  * The `_complete` marker is written LAST, so a crash mid-build leaves an
  * invisible half-written version that the next build overwrites (same
  * number, cleared first); readers always open the highest COMPLETE
  * version. The marker carries a METADATA-ONLY fingerprint of the source
  * documents listing (names + lengths + mtimes — one `listStatus`, no data
  * pass) plus the requested merge count, so [[ensureFor]] rebuilds exactly
  * when the corpus bytes or the requested k changed — an in-place rewrite
  * of documents.parquet can never serve a stale tokenizer.
  *
  * Scale shape: training is vocab-scale ([[Bpe.learn]] — one corpus pass
  * for the word count, then K vocab-sized aggregates); the persisted apply
  * path ([[Bpe.tokenCountsWith]]) folds the merge list into one
  * nested-replace expression — a single map-side pass over any corpus.
  */
object Tokenizer {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerPath(indexDir: String, v: Long) = new Path(s"$indexDir/v=$v/_complete")

  private val VersionRe = "^v=(\\d+)$".r

  private def versions(spark: SparkSession, indexDir: String): Seq[Long] = {
    val f = fs(spark, indexDir)
    val p = new Path(indexDir)
    if (!f.exists(p)) Seq.empty
    else
      f.listStatus(p).toSeq.collect {
        case st if st.isDirectory =>
          st.getPath.getName match {
            case VersionRe(n) => Some(n.toLong)
            case _            => None
          }
      }.flatten.sorted
  }

  /** Highest COMPLETE version and its marker metadata, if any. */
  def current(spark: SparkSession, indexDir: String): Option[(Long, String)] = {
    val f = fs(spark, indexDir)
    versions(spark, indexDir).reverse.collectFirst {
      case v if f.exists(markerPath(indexDir, v)) =>
        val in = f.open(markerPath(indexDir, v))
        val meta =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        (v, meta)
    }
  }

  /** Metadata-only fingerprint of the corpus' documents listing. */
  private[graft] def docsFingerprint(spark: SparkSession, docsOrSfDir: String): String =
    Q.docsFingerprint(spark, docsOrSfDir)

  /** Train on `docsOrSfDir`'s documents table and publish as the next
    * version. Returns the committed version id. Crash-safe: merges land
    * BEFORE the marker; a rebuild at the same number clears the stale
    * attempt first (the [[AnnIndex.build]] recipe).
    */
  def build(spark: SparkSession, docsOrSfDir: String, indexDir: String, k: Int): Long = {
    import spark.implicits._
    val prev = current(spark, indexDir).map(_._1)
    val v = prev.getOrElse(0L) + 1
    val vd = s"$indexDir/v=$v"
    val f = fs(spark, indexDir)
    if (f.exists(new Path(vd))) { val _ = f.delete(new Path(vd), true) }
    val fp = docsFingerprint(spark, docsOrSfDir) // BEFORE the corpus read: a
    // concurrent rewrite mid-train then mismatches on the next ensureFor
    // probe instead of being fingerprinted as fresh.
    val docs = Q.t(spark, docsOrSfDir, "documents")
    val vw = docs
      .select(explode(split(lower(trim(col("text"))), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy("word")
      .agg(count(lit(1)).as("wn"))
    // Scoped: training's per-iteration checkpoints free here without
    // touching a composing caller's live checkpoints (text_bpe_apply
    // builds on demand inside its own query construction).
    val merges = Checkpoints.scoped(Bpe.learn(vw, k)._1)
    merges.zipWithIndex
      .map { case (pr, i) => (i, pr) }
      .toDF("rank", "pair")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$vd/merges")
    // Commit marker LAST; everything before this line is invisible.
    val out = f.create(markerPath(indexDir, v), true)
    try out.write(s"fp=$fp;k=$k;nmerges=${merges.size}".getBytes("UTF-8"))
    finally out.close()
    // Live-chain retention (the [[AnnIndex]] recipe): keep the version
    // that was current WHEN THIS BUILD STARTED until the NEXT build
    // commits — a reader that resolved it an instant before this marker
    // landed can still be scanning its merges. Only versions no reader
    // could have resolved die here.
    versions(spark, indexDir).filter(old => old < prev.getOrElse(v)).foreach { old =>
      f.delete(new Path(s"$indexDir/v=$old"), true)
    }
    v
  }

  /** Ordered merge list of the current complete version. */
  def merges(spark: SparkSession, indexDir: String): Seq[String] = {
    val (v, _) = current(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"no complete tokenizer version under $indexDir")
    )
    spark.read
      .parquet(s"$indexDir/v=$v/merges")
      .orderBy("rank")
      .collect()
      .map(_.getAs[String]("pair"))
      .toSeq
  }

  /** Idempotent build-on-demand for a corpus dir (the
    * [[AnnIndex.ensureFor]] pattern): one index per distinct corpus path
    * (path-digest namespace), rebuilt only when the documents listing
    * fingerprint or the requested k no longer match the committed marker.
    * The artifact root comes from `spark.graft.tokenizer.dir` (default
    * `tmp/tokenizer`) and is resolved through the Hadoop FileSystem of
    * whatever scheme it carries — an `hdfs://`/`s3a://` root works
    * exactly like the build/read paths do; nothing here touches
    * `java.io.File`.
    */
  def ensureFor(spark: SparkSession, docsOrSfDir: String, k: Int): String = {
    val digest = java.security.MessageDigest
      .getInstance("MD5")
      .digest(docsOrSfDir.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
      .take(12)
    val root = new Path(
      spark.conf.get("spark.graft.tokenizer.dir", "tmp/tokenizer")
    )
    val rootFs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val indexDir = rootFs.makeQualified(new Path(root, digest)).toString
    val fp = docsFingerprint(spark, docsOrSfDir)
    val fresh = current(spark, indexDir).exists { case (_, meta) =>
      meta.contains(s"fp=$fp;") && meta.contains(s";k=$k;")
    }
    if (!fresh) { val _ = build(spark, docsOrSfDir, indexDir, k) }
    indexDir
  }
}
