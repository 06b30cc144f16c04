package graft.queries

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF index as a build/probe split — a real 100 TB pipeline
  * builds its ANN index once and probes it for months; every `knn_*` query
  * computing centroids in-query answers the correctness question but not
  * the serving shape. The index is two parquet tables per version:
  *
  * {{{
  *   <indexDir>/v=<N>/centroids/        (cell  : int, cv : array<double>)
  *   <indexDir>/v=<N>/cells/cell=<c>/   (vec_id: long, v : array<double>)
  *   <indexDir>/v=<N>/_complete         ("rows=<n>" — commit marker + meta)
  * }}}
  *
  * Versioning follows the near-dup band index's crash-safety recipe
  * ([[graft.Engine.compactNearIndex]]): a version becomes visible only
  * when its `_complete` marker lands (written LAST), readers always open
  * the highest COMPLETE version, and stale-version pruning runs after the
  * marker — a crash anywhere leaves either an invisible half-written
  * version (overwritten by the next build) or an extra old version
  * (ignored by readers, removed by the next build's prune). Rebuild is
  * change-detected: the marker records the covered row count, and
  * [[ensureFor]] rebuilds when the table moved.
  *
  * The cells table is PARTITIONED by cell id, so a probe that touches
  * `nProbe` cells prunes its scan to those directories — the on-disk
  * analog of an IVF inverted list.
  */
object AnnIndex {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerPath(indexDir: String, v: Long) = new Path(s"$indexDir/v=$v/_complete")

  /** Versions on disk, complete or not. */
  private def versions(spark: SparkSession, indexDir: String): Seq[Long] = {
    val p = new Path(indexDir)
    val f = fs(spark, indexDir)
    if (!f.exists(p)) Nil
    else
      f.listStatus(p).toSeq.collect {
        case st if st.isDirectory && st.getPath.getName.startsWith("v=") =>
          scala.util.Try(st.getPath.getName.stripPrefix("v=").toLong).toOption
      }.flatten.sorted
  }

  /** Highest version whose commit marker exists, with its covered rows. */
  def current(spark: SparkSession, indexDir: String): Option[(Long, Long)] = {
    val f = fs(spark, indexDir)
    versions(spark, indexDir).reverse.collectFirst {
      case v if f.exists(markerPath(indexDir, v)) =>
        val in = f.open(markerPath(indexDir, v))
        val meta =
          try new String(in.readAllBytes(), "UTF-8").trim
          finally in.close()
        (v, meta.stripPrefix("rows=").toLong)
    }
  }

  /** Promote a float array column to double for exact cross-engine math. */
  private def dbl(c: org.apache.spark.sql.Column) = transform(c, x => x.cast("double"))

  /** Fail LOUDLY on vector-dimension mismatch: `cosine_similarity` yields
    * null for mismatched lengths (a scalar-function contract — corrupt
    * data surfaces as missing, not a truncated score), but at the INDEX
    * level a null score would silently assign every delta vector to an
    * arbitrary cell / return garbage neighbors. One metadata-sized
    * aggregate per call.
    */
  private def requireDim(
      centroids: DataFrame,
      vectors: DataFrame,
      vecCol: String,
      op: String
  ): Unit = {
    val centDim = centroids.select(size(col("cv"))).first().getInt(0)
    val dims = vectors
      .agg(min(size(col(vecCol))).as("lo"), max(size(col(vecCol))).as("hi"))
      .first()
    if (!dims.isNullAt(0))
      require(
        dims.getInt(0) == centDim && dims.getInt(1) == centDim,
        s"$op: vector dimension ${dims.getInt(0)}..${dims.getInt(1)} does not match " +
          s"the index dimension $centDim"
      )
  }

  private def basePath(indexDir: String, v: Long) = new Path(s"$indexDir/v=$v/_base")

  /** Remove every trace of a crashed prior attempt at version `v` before
    * writing it anew. Overwrite-mode writes replace cells/centroids on
    * their own, but NOT a stale `_base` pointer left by an append that
    * died between `_base` and the marker — that orphan would make a
    * subsequent full build/recentre at the same number look like a delta
    * chained to the superseded head, so `allCells` would union the rebuild
    * with the old chain (duplicated vectors, resurrected drops). Deleting
    * the whole directory restores the documented crash contract: an
    * invisible half-written version is fully overwritten.
    */
  private def clearStaleAttempt(spark: SparkSession, indexDir: String, v: Long): Unit = {
    val f = fs(spark, indexDir)
    val p = new Path(s"$indexDir/v=$v")
    if (f.exists(p)) { val _ = f.delete(p, true) }
  }

  /** Delta chain of version `v`, head first: `v` plus its transitive
    * `_base` ancestors. A full build has no `_base` file and is its own
    * chain.
    */
  private def chainOf(spark: SparkSession, indexDir: String, v: Long): Seq[Long] = {
    val f = fs(spark, indexDir)
    val out = Seq.newBuilder[Long]
    var cur = Option(v)
    while (cur.isDefined) {
      val c = cur.get
      out += c
      cur =
        if (!f.exists(basePath(indexDir, c))) None
        else {
          val in = f.open(basePath(indexDir, c))
          val meta =
            try new String(in.readAllBytes(), "UTF-8").trim
            finally in.close()
          Some(meta.stripPrefix("base=").toLong)
        }
    }
    out.result()
  }

  /** Build version `current+1` from an embeddings table
    * `(vec_id, label, embedding)` — the coarse quantizer is the per-label
    * centroid (identical definition to `knn_ivf_dist`, so the indexed
    * probe is hash-comparable to the in-query plan). Returns the new
    * version id.
    */
  def build(spark: SparkSession, embeddings: DataFrame, indexDir: String): Long = {
    val v = current(spark, indexDir).map(_._1).getOrElse(0L) + 1
    val vd = s"$indexDir/v=$v"
    clearStaleAttempt(spark, indexDir, v)
    val e = embeddings.select(
      col("vec_id"),
      col("label").cast("int").as("cell"),
      dbl(col("embedding")).as("v")
    )
    // Inverted lists: vectors partitioned by cell id — nProbe cells read
    // nProbe directories, not the corpus.
    e.write.mode("overwrite").partitionBy("cell").parquet(s"$vd/cells")
    // Coarse centroids: per-cell mean via posexplode + avg (the
    // knn_centroid/knn_ivf_dist pattern — one shuffle keyed (cell, pos)).
    e.select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg(avg("x").as("cx"))
      .groupBy("cell")
      .agg(
        transform(
          array_sort(collect_list(struct(col("pos"), col("cx")))),
          st => st.getField("cx")
        ).as("cv")
      )
      .write.mode("overwrite").parquet(s"$vd/centroids")
    // Commit marker LAST; carries the covered row count for staleness
    // checks. Everything before this line is invisible to readers.
    val rows = embeddings.count()
    commitAndPrune(spark, indexDir, v, rows)
    v
  }

  /** Write the commit marker for `v` (LAST — everything before is
    * invisible), then prune every version outside `v`'s live chain. A
    * crash after the marker only leaves ignorable debris for the next
    * writer; a crash before it leaves an invisible half-written version
    * that the next build/append overwrites (same number, overwrite mode).
    */
  private def commitAndPrune(spark: SparkSession, indexDir: String, v: Long, rows: Long): Unit = {
    val f = fs(spark, indexDir)
    val out = f.create(markerPath(indexDir, v), true)
    try out.write(s"rows=$rows".getBytes("UTF-8"))
    finally out.close()
    val live = chainOf(spark, indexDir, v).toSet
    versions(spark, indexDir).filterNot(live).filter(_ < v).foreach { old =>
      f.delete(new Path(s"$indexDir/v=$old"), true)
    }
  }

  /** Append-only index maintenance: new vectors join the CURRENT index
    * without a full rebuild. The new version holds ONLY the delta —
    * incoming vectors assigned to their nearest EXISTING centroid
    * (broadcast k×dim model state, one map-side pass over the delta) and
    * written as cell-partitioned inverted-list files — plus a copy of the
    * (tiny) centroid table and a `_base` pointer to the version it
    * extends. Readers resolve the chain and union the cell directories,
    * so existing inverted lists are never rewritten: append cost is
    * O(|delta|), independent of index size.
    *
    * STALENESS CONTRACT (explicit): appended vectors are searchable the
    * moment the marker lands, but centroids do NOT move — cell membership
    * is frozen at assignment time, so as deltas accumulate the quantizer
    * drifts from the true cell means and recall decays. [[recentre]] is
    * the periodic repair: it folds the whole chain into one consolidated
    * full version with freshly recomputed centroids (the
    * `compactNearIndex` fold). Run it when the appended fraction is no
    * longer small (the marker row counts make the ratio observable).
    *
    * Crash-safe by the same marker recipe as [[build]]: cells, centroid
    * copy and `_base` land BEFORE the marker; a crash mid-append leaves
    * an invisible partial version that the next append overwrites.
    */
  def append(spark: SparkSession, newVectors: DataFrame, indexDir: String): Long = {
    graft.functions.GraftFunctions.register(spark)
    val (base, baseRows) = current(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"append needs an existing complete index under $indexDir")
    )
    // current+1, like build: a crashed append's debris at this number is
    // simply overwritten (static partition overwrite replaces the dir).
    val v = base + 1
    val vd = s"$indexDir/v=$v"
    clearStaleAttempt(spark, indexDir, v)
    val cent = spark.read.parquet(s"$indexDir/v=$base/centroids")
    requireDim(cent, newVectors, "embedding", "append")
    // Nearest existing centroid, deterministic tiebreak — the same
    // rounding + (score desc, cell asc) order the probe side uses.
    val wAssign = Window.partitionBy("vec_id").orderBy(desc("ccos"), asc("cell"))
    val delta = newVectors
      .select(col("vec_id"), dbl(col("embedding")).as("v"))
      .crossJoin(broadcast(cent))
      .withColumn("ccos", round(expr("cosine_similarity(v, cv)"), 4))
      .withColumn("pr", row_number().over(wAssign))
      .filter(col("pr") === 1)
      .select(col("vec_id"), col("cell"), col("v"))
    delta.write.mode("overwrite").partitionBy("cell").parquet(s"$vd/cells")
    cent.write.mode("overwrite").parquet(s"$vd/centroids")
    val f = fs(spark, indexDir)
    val bout = f.create(basePath(indexDir, v), true)
    try bout.write(s"base=$base".getBytes("UTF-8"))
    finally bout.close()
    val rows = baseRows + newVectors.count()
    commitAndPrune(spark, indexDir, v, rows)
    v
  }

  /** Tombstone-delete vectors from the current index without touching any
    * inverted list: the new version holds ONLY a `deletes` table (the ids)
    * plus the centroid copy and a `_base` pointer — the curation
    * pipeline's natural companion (a doc dropped from the corpus must
    * leave the index, and rewriting cell files for each drop batch would
    * make deletion O(index)). Readers apply the chain's union of delete
    * sets to the chain's union of cells, so deleted vectors vanish from
    * probes the moment the marker lands; the space reclaims at the next
    * [[recentre]], which folds the chain and drops tombstoned vectors
    * physically (the same consolidation that repairs centroid drift).
    * Same crash recipe as [[append]]: everything lands before the marker,
    * debris at the next number is cleared by the next writer.
    */
  def delete(spark: SparkSession, vecIds: DataFrame, indexDir: String): Long = {
    val (base, baseRows) = current(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"delete needs an existing complete index under $indexDir")
    )
    val v = base + 1
    val vd = s"$indexDir/v=$v"
    clearStaleAttempt(spark, indexDir, v)
    val ids = vecIds.select(col("vec_id").cast("long").as("vec_id")).distinct()
    // Count the vectors that actually leave (ids not in the index must not
    // corrupt the marker's row count) — one semi join against the chain.
    val gone = allCells(spark, indexDir, base)
      .join(ids, Seq("vec_id"), "left_semi")
      .count()
    ids.write.mode("overwrite").parquet(s"$vd/deletes")
    spark.read.parquet(s"$indexDir/v=$base/centroids")
      .write.mode("overwrite").parquet(s"$vd/centroids")
    val f = fs(spark, indexDir)
    val bout = f.create(basePath(indexDir, v), true)
    try bout.write(s"base=$base".getBytes("UTF-8"))
    finally bout.close()
    commitAndPrune(spark, indexDir, v, baseRows - gone)
    v
  }

  /** Fold a delta chain back into one consolidated full version: all
    * chained cells re-read (cell membership preserved — vectors stay
    * where they were assigned), centroids recomputed as the mean of each
    * cell's CURRENT members, everything rewritten as a fresh base version
    * with no `_base` pointer; the old chain prunes after the marker.
    * Tombstoned vectors are dropped physically here.
    */
  def recentre(spark: SparkSession, indexDir: String): Long = {
    val (head, rows) = current(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"no complete ANN index version under $indexDir")
    )
    val v = head + 1
    val vd = s"$indexDir/v=$v"
    // Read the chain BEFORE clearing debris at v: a crashed append may
    // have left a stale _base at this number, but the chain being folded
    // is head's, which never includes v.
    val e = allCells(spark, indexDir, head).select("vec_id", "cell", "v")
    clearStaleAttempt(spark, indexDir, v)
    e.write.mode("overwrite").partitionBy("cell").parquet(s"$vd/cells")
    e.select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg(avg("x").as("cx"))
      .groupBy("cell")
      .agg(
        transform(
          array_sort(collect_list(struct(col("pos"), col("cx")))),
          st => st.getField("cx")
        ).as("cv")
      )
      .write.mode("overwrite").parquet(s"$vd/centroids")
    commitAndPrune(spark, indexDir, v, rows)
    v
  }

  /** Union of the cell tables across `head`'s delta chain, minus the
    * chain's union of tombstoned ids. Each version's cells read with
    * their own partition discovery, so per-cell pruning still applies to
    * every chained directory; delete-only versions contribute no cells.
    * The delete mask is CHAIN-WIDE, so a tombstoned id stays invisible
    * even if a later append re-adds it — re-introducing an id requires a
    * [[recentre]] first (which clears tombstones physically).
    */
  private def allCells(spark: SparkSession, indexDir: String, head: Long): DataFrame = {
    val f = fs(spark, indexDir)
    val chain = chainOf(spark, indexDir, head)
    val cells = chain
      .filter(cv => f.exists(new Path(s"$indexDir/v=$cv/cells")))
      .map(cv => spark.read.parquet(s"$indexDir/v=$cv/cells"))
      .reduce(_.unionByName(_))
    chain
      .filter(cv => f.exists(new Path(s"$indexDir/v=$cv/deletes")))
      .map(cv => spark.read.parquet(s"$indexDir/v=$cv/deletes"))
      .reduceOption(_.unionByName(_)) match {
      case Some(del) => cells.join(del.distinct(), Seq("vec_id"), "left_anti")
      case None      => cells
    }
  }

  /** The probe side of the split: assign each probe vector to its nProbe
    * nearest persisted centroids (broadcast — k×dim model state), then
    * exact-re-rank inside the probed cells via a partition-parallel
    * shuffle join on cell id. Semantics and rounding identical to
    * `knn_ivf_dist`.
    */
  def probe(
      spark: SparkSession,
      indexDir: String,
      probes: DataFrame, // (qid, qv: array<double>)
      nProbe: Int = 2,
      k: Int = 5
  ): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val (v, _) = current(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"no complete ANN index version under $indexDir")
    )
    val vd = s"$indexDir/v=$v"
    val cent = spark.read.parquet(s"$vd/centroids")
    requireDim(cent, probes, "qv", "probe")
    // The head's cells plus any append deltas it chains to — appended
    // vectors are searchable without their base lists ever rewriting.
    val cells = allCells(spark, indexDir, v)
    val wProbe = Window.partitionBy("qid").orderBy(desc("ccos"), asc("cell"))
    val assigned = probes
      .crossJoin(broadcast(cent))
      .withColumn("ccos", round(expr("cosine_similarity(qv, cv)"), 4))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select(col("qid"), col("qv"), col("cell").as("pcell"))
    val wFinal = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
    cells
      .join(assigned, col("cell") === col("pcell") && col("vec_id") =!= col("qid"))
      .withColumn("cos", round(expr("cosine_similarity(qv, v)"), 6))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .select("qid", "vec_id", "rank", "cos")
  }

  /** Idempotent build-on-demand for a testdata scale dir: keep one index
    * per distinct embeddings table (namespaced by path digest, the token
    * pattern from Engine), rebuild only when the covered row count no
    * longer matches the table.
    */
  def ensureFor(spark: SparkSession, sfDir: String): String = {
    val digest = java.security.MessageDigest
      .getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
      .take(12)
    val indexDir = new java.io.File(s"tmp/annindex/$digest").getAbsolutePath
    val emb = Q.t(spark, sfDir, "embeddings")
    val rows = emb.count()
    val fresh = current(spark, indexDir).exists(_._2 == rows)
    if (!fresh) { val _ = build(spark, emb, indexDir) }
    indexDir
  }
}
