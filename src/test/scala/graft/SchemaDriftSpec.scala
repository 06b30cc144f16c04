package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard against testdata schema drift (the round-5 failure mode: the
  * driver regenerated `events.parquet` with `timestamp[us]` where the
  * reader assumed int64-nanos, and all 16 events-family queries silently
  * vanished from the correctness artifact because they threw at ANALYSIS
  * time, before any dump directory existed).
  *
  * This spec analyzes — but does not execute — every `SparkEntry.queries`
  * entry against the smallest driver-generated testdata. Any future schema
  * change fails here in seconds, naming the query, instead of disappearing
  * from a round artifact.
  */
class SchemaDriftSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private val haveData = new java.io.File(s"$sfDir/lineitem.parquet").exists()

  test("every registered query analyzes against the current testdata schema") {
    assume(haveData, s"driver testdata missing at $sfDir")
    val spark = TestSpark.spark
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        // Force analysis + schema resolution only. Some builders run
        // bounded metadata probes while constructing the plan (documented
        // in Dedup/Similarity) — at sf0.001 those are sub-second.
        fn(spark, sfDir).queryExecution.analyzed.schema
        None
      } catch {
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      } finally graft.queries.Checkpoints.release()
    }
    assert(failures.isEmpty, s"\n${failures.size} queries fail analysis:\n${failures.mkString("\n")}")
  }

  test("every registered query has a DuckDB oracle (no silent rows-only downgrades)") {
    // The driver records a weaker rows-only check for queries without an
    // oracle entry. Today every query has one — keep that a conscious
    // decision: adding a query without an oracle must fail here, not
    // silently weaken the correctness gate.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(noOracle.isEmpty, s"queries without an oracle: ${noOracle.toSeq.sorted.mkString(", ")}")
    assert(orphaned.isEmpty, s"oracles without a query: ${orphaned.toSeq.sorted.mkString(", ")}")
  }
}
