package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.util.chaining._

/** Box-independent scale diagnostics for the pair family: counts the
  * CANDIDATE volumes that drive each operator's scaling exponent, so a
  * pruning change can be judged on the quantity it actually targets
  * instead of this box's noisy wall clock (±60% run-to-run observed on
  * the r15 soak box). Currently reports the containment prefix-probe
  * meet (`dedup_containment`, Dedup.scala): posting-list join rows,
  * distinct candidates without the PPJoin+ positional bound, and
  * distinct candidates with it — the verify stage's exact input.
  *
  * Run: `sbt "runMain graft.queries.PairDiag <corpusDir>"`.
  */
object PairDiag {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("tmp/zipf-gate")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft-pair-diag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.network.timeout", "800s")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val documents = spark.read.parquet(s"$dir/documents.parquet")
    val docsTok = documents
      .select(col("doc_id"), array_distinct(split(lower(trim(col("text"))), " ")).as("words"))
    val wordRows = docsTok.select(col("doc_id"), explode(col("words")).as("word"))
    val dfreq = wordRows.groupBy("word").agg(count(lit(1)).as("df"))
    val ranked = wordRows
      .join(dfreq, "word")
      .groupBy("doc_id")
      .agg(
        transform(
          array_sort(collect_list(struct(col("df"), col("word")))),
          st => st.getField("word")
        ).as("w")
      )
      .withColumn("sz", size(col("w")).cast("long"))
      .pipe(graft.queries.Checkpoints.checkpoint)
    val P = Dedup.pairShufflePartitions(spark)
    val probe = ranked
      .withColumn("min_inter", expr("(19 * sz + 19) div 20"))
      .select(
        col("doc_id").as("i"),
        col("sz").as("szA"),
        col("min_inter"),
        posexplode(slice(col("w"), lit(1), (col("sz") - col("min_inter") + 1).cast("int")))
      )
      .withColumnRenamed("pos", "pA")
      .withColumnRenamed("col", "word")
      .repartition(P, col("word"))
    val index = ranked
      .select(col("doc_id").as("j"), col("sz").as("szB"), posexplode(col("w")))
      .withColumnRenamed("pos", "pB")
      .withColumnRenamed("col", "word")
      .repartition(P, col("word"))
    val met = probe
      .join(index, Seq("word"))
      .filter(col("i") =!= col("j") && col("szB") * 20 >= col("szA") * 19)
      .pipe(graft.queries.Checkpoints.checkpoint)

    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pair-diag] $what%-28s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val joinRows = t("posting meet rows")(met.count())
    val candsOld = t("candidates (size only)")(met.select("i", "j").distinct().count())
    val candsNew = t("candidates (positional)")(
      met
        .filter(
          lit(1) + least(col("szA") - col("pA") - 1, col("szB") - col("pB") - 1) >=
            col("min_inter"))
        .select("i", "j")
        .distinct()
        .count())
    // Extended-prefix count filter (pigeonhole generalization): among A's
    // first (szA - min_inter + c) rare-first words a true pair shares >= c,
    // and the c-th common token's positional bound is
    // (c-1) + 1 + min(szA - pA - 1, szB - pB - 1) >= min_inter.
    val counted = (2 to 3).map { c =>
      val probeC = ranked
        .withColumn("min_inter", expr("(19 * sz + 19) div 20"))
        .withColumn("cReq", least(col("min_inter"), lit(c)))
        .select(
          col("doc_id").as("i"),
          col("sz").as("szA"),
          col("min_inter"),
          col("cReq"),
          posexplode(
            slice(
              col("w"),
              lit(1),
              least(col("sz"), col("sz") - col("min_inter") + col("cReq")).cast("int")))
        )
        .withColumnRenamed("pos", "pA")
        .withColumnRenamed("col", "word")
        .repartition(P, col("word"))
      val n = t(s"candidates (count>=$c)")(
        probeC
          .join(index, Seq("word"))
          .filter(
            col("i") =!= col("j") && col("szB") * 20 >= col("szA") * 19 &&
              col("cReq") + least(col("szA") - col("pA") - 1, col("szB") - col("pB") - 1) >=
                col("min_inter"))
          .groupBy("i", "j")
          .agg(count(lit(1)).as("n"), first("cReq").as("cReq"))
          .filter(col("n") >= col("cReq"))
          .count())
      c -> n
    }
    println(
      s"[pair-diag] dir=$dir join_rows=$joinRows cands_size_only=$candsOld " +
        s"cands_positional=$candsNew " +
        counted.map { case (c, n) => s"cands_count$c=$n" }.mkString(" "))
    spark.stop()
  }
}
