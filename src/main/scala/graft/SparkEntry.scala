package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{Corpus, Dedup, Multimodal, Q, Relational, Similarity, Skew, Temporal, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory: relational coverage (SURVEY §2.11
  * provisions), log-parity analogs (SURVEY §2.2), and the training-data
  * pipeline suite (dedup / similarity / text analysis / multimodal).
  * `oracleSql` carries the DuckDB twin for every SQL-expressible entry.
  */
object SparkEntry {

  val allQueries: Seq[Q] =
    Relational.all ++ TextOps.all ++ Corpus.all ++ Dedup.all ++ Similarity.all ++
      Multimodal.all ++ Skew.all ++ Temporal.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Region revenue through the full dimension chain (TPC-H Q5 shape).
    */
  def entry(spark: SparkSession): DataFrame =
    allQueries.find(_.name == "q5_region_revenue").get.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate sketches, LSH, mapPartitions feature extraction) →
    * driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
