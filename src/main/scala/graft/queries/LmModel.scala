package graft.queries

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent corpus-LM quality model as a fit/score split — the CCNet
  * production loop (Wenzek et al. 2020): the language model is fitted ONCE
  * on a reference corpus and then scores months of incoming documents;
  * `corpus_lm_quality` fitting in-query answers the correctness question
  * but not the serving shape. The model is one parquet table per version:
  *
  * {{{
  *   <modelDir>/v=<N>/unigrams/   (word : string, logp : double)
  *   <modelDir>/v=<N>/_complete   ("rows=<nDocs>;floor=<logp>" — marker + meta)
  * }}}
  *
  * `floor` is the add-one-smoothed log-probability of an UNSEEN word,
  * ln(1/(N+V)) — out-of-vocabulary tokens score it, so gibberish outside
  * the reference vocabulary lands far below any in-domain document.
  *
  * Versioning follows the AnnIndex/band-index crash-safety recipe: a
  * version is visible only once its `_complete` marker lands (written
  * LAST), readers open the highest COMPLETE version, pruning runs after
  * the marker, and [[ensure]] refits when the reference corpus row count
  * moved.
  *
  * Word scores use the SAME estimator and rounding as the
  * `corpus_lm_quality` query (add-one smoothing, ln rounded to 6 dp), so
  * a fitted model's scores are directly comparable with the in-query
  * batch computation on the same corpus.
  */
object LmModel {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerPath(modelDir: String, v: Long) = new Path(s"$modelDir/v=$v/_complete")

  private def versions(spark: SparkSession, modelDir: String): Seq[Long] = {
    val p = new Path(modelDir)
    val f = fs(spark, modelDir)
    if (!f.exists(p)) Nil
    else
      f.listStatus(p).toSeq.collect {
        case st if st.isDirectory && st.getPath.getName.startsWith("v=") =>
          scala.util.Try(st.getPath.getName.stripPrefix("v=").toLong).toOption
      }.flatten.sorted
  }

  /** Highest complete version with its (docRows, floor) meta. */
  def current(spark: SparkSession, modelDir: String): Option[(Long, Long, Double)] = {
    val f = fs(spark, modelDir)
    versions(spark, modelDir).reverse.collectFirst {
      case v if f.exists(markerPath(modelDir, v)) =>
        val in = f.open(markerPath(modelDir, v))
        val meta =
          try new String(in.readAllBytes(), "UTF-8").trim
          finally in.close()
        val kv = meta.split(";").map(_.split("=", 2)).collect { case Array(k, x) => k -> x }.toMap
        (v, kv("rows").toLong, kv("floor").toDouble)
    }
  }

  private def ws: Column = split(lower(trim(col("text"))), " ")

  /** Fit version `current+1` from a reference corpus `(.., text)`.
    * Returns the new version id. The unigram table is vocabulary-sized
    * (model state, not corpus state); counting is one partial-aggregated
    * groupBy over the exploded tokens — the text never shuffles.
    */
  def fit(spark: SparkSession, docs: DataFrame, modelDir: String): Long = {
    val v = current(spark, modelDir).map(_._1).getOrElse(0L) + 1
    val vd = s"$modelDir/v=$v"
    // The count table feeds the unigram write, the totals, AND the floor;
    // persist it so the explode+groupBy (the expensive pass over the
    // reference corpus) runs once, not three times.
    val counts = docs
      .select(explode(ws).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("c"))
      .persist()
    try {
      val totals = counts.agg(sum("c").as("n_total"), count(lit(1)).as("vocab"))
      counts
        .crossJoin(broadcast(totals))
        .select(
          col("word"),
          round(
            log((col("c") + 1).cast("double") / (col("n_total") + col("vocab")).cast("double")),
            6
          ).as("logp")
        )
        .write.mode("overwrite").parquet(s"$vd/unigrams")
      // Meta for the marker: doc count (staleness check) + the OOV floor.
      val (nTotal, vocab) = {
        val r = totals.collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val floor =
        BigDecimal(math.log(1.0 / (nTotal + vocab).toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      val rows = docs.count()
      val f = fs(spark, modelDir)
      val out = f.create(markerPath(modelDir, v), true)
      try out.write(s"rows=$rows;floor=$floor".getBytes("UTF-8"))
      finally out.close()
      // Prune with a ONE-VERSION grace window (unlike AnnIndex's
      // prune-all): long-running curate streams resolve the model once at
      // stream start, and an eager prune racing such a reader would
      // delete parquet out from under its in-flight batch. Keeping v-1
      // means a stream started before this fit keeps reading cleanly;
      // adopt the refit by restarting the stream. The grace covers ONE
      // refit: a SECOND fit during the same stream's lifetime deletes the
      // stream's pinned version — restart gating streams between refits
      // (operationally: refit and restart travel together).
      versions(spark, modelDir).filter(_ < v - 1).foreach { old =>
        f.delete(new Path(s"$modelDir/v=$old"), true)
      }
      v
    } finally counts.unpersist()
  }

  /** Fit if absent or stale (reference corpus row count moved). */
  def ensure(spark: SparkSession, docs: DataFrame, modelDir: String): Long =
    current(spark, modelDir) match {
      case Some((v, rows, _)) if rows == docs.count() => v
      case _                                          => fit(spark, docs, modelDir)
    }

  /** The score side of the split: per-document average token
    * log-likelihood under the persisted model, OOV tokens at the floor.
    * Input needs a `text` column and a unique `idCol`; emits the input
    * plus `avg_logp`. The unigram table is model state — vocabulary-
    * sized, joined on the token (broadcast when it fits, keyed shuffle
    * otherwise: AQE's call); per-doc reduction is one keyed aggregate.
    * Same FP discipline as the batch query: per-token scores are already
    * rounded to 6 dp at fit time, summed in DECIMAL, so the document
    * score is independent of partition order.
    */
  def score(
      spark: SparkSession,
      df: DataFrame,
      modelDir: String,
      idCol: String
  ): DataFrame = {
    val (model, floor) = load(spark, modelDir)
    scoreWith(df, model, floor, idCol)
  }

  /** Resolve the current version ONCE and return its unigram table +
    * floor. Long-running consumers (the streaming gate) call this at
    * stream start and hold the pair — re-resolving per micro-batch would
    * relist the directory every trigger and race a concurrent refit's
    * prune.
    */
  def load(spark: SparkSession, modelDir: String): (DataFrame, Double) = {
    val (v, _, floor) = current(spark, modelDir).getOrElse(
      throw new IllegalStateException(s"no complete LM model at $modelDir")
    )
    (spark.read.parquet(s"$modelDir/v=$v/unigrams"), floor)
  }

  /** Score against an already-loaded model. The per-doc average rounds in
    * exact integer micro-units (same discipline as `corpus_lm_quality`):
    * a 6-dp decimal sum over a small count lands on exact half-boundaries
    * where double-rounding paths disagree across engines.
    */
  def scoreWith(df: DataFrame, model: DataFrame, floor: Double, idCol: String): DataFrame = {
    val scored = df
      .select(col(idCol), explode(ws).as("word"))
      .join(model, Seq("word"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n__"),
        (sum(coalesce(col("logp"), lit(floor)).cast("decimal(18,6)")) * 1000000)
          .cast("long").as("m__")
      )
      .withColumn("avg_logp", Q.halfUpMicroAvg("m__", "n__"))
      .drop("n__", "m__")
    df.join(scored, Seq(idCol), "left")
  }
}
