package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Plan-shape guards evaluated against sf1 STATISTICS (tmp/sf1, the 10×
  * soak corpus) rather than sf0.001: AQE's decisions — broadcast
  * thresholds, partition coalescing, skew splits — depend on sizes, and
  * the one genuine scale bug found so far (the pair-join reduce side
  * coalesced to a single task) lived exactly in that gap. Gated on the
  * soak corpus being present (`assume`), so the suite stays green on
  * checkouts without tmp/sf1; PLANS_sf1.md carries the human-readable
  * dump of the same plans.
  */
class PlanSf1Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf1 = new java.io.File("tmp/sf1").getAbsolutePath
  private def present: Boolean = new java.io.File(sf1, "documents.parquet").isFile

  private def plan(name: String): String = {
    val p = SparkEntry.queries(name)(spark, sf1).queryExecution.executedPlan.toString
    Checkpoints.release()
    p
  }

  /** Partition counts of every REPARTITION_BY_NUM exchange in the plan —
    * the Exchange line reads `hashpartitioning(keys..., N), REPARTITION_BY_NUM`.
    */
  private def pinnedWidths(p: String): Seq[Int] =
    p.linesIterator
      .filter(_.contains("REPARTITION_BY_NUM"))
      .flatMap(l => raw"(\d+)\),\s*REPARTITION_BY_NUM".r.findFirstMatchIn(l).map(_.group(1).toInt))
      .toSeq

  test("sf1: pair expansion keeps its explicit-count repartition, wider than one task") {
    assume(present, "tmp/sf1 soak corpus not present")
    val df = Dedup.jaccardPairsFrom(spark, Q.t(spark, sf1, "documents"))
    val p = df.queryExecution.executedPlan.toString
    Checkpoints.release()
    assert(p.contains("REPARTITION_BY_NUM"), s"pair join lost its pinned shuffle at sf1:\n$p")
    val widths = pinnedWidths(p)
    assert(widths.forall(_ > 1), s"pinned pair shuffle collapsed to one partition: $widths\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("sf1: banded LSH keeps its pinned shuffle width") {
    assume(present, "tmp/sf1 soak corpus not present")
    val p = plan("dedup_minhash_lsh")
    assert(p.contains("REPARTITION_BY_NUM"), s"LSH pair stage lost its pinned shuffle at sf1:\n$p")
    val widths = pinnedWidths(p)
    assert(widths.forall(_ > 1), s"pinned LSH shuffle collapsed to one partition: $widths")
  }

  test("sf1: dedup_substring aggregates window hashes map-side, never windows over them") {
    assume(present, "tmp/sf1 soak corpus not present")
    val p = plan("dedup_substring")
    // The keep-first decision must be a two-phase MIN aggregate on the
    // hash key (map-side combinable — skew-immune for hyper-frequent
    // boilerplate windows), NOT a row_number window partitioned by the
    // hash, which would drag a hot window's whole group to one task.
    assert(p.contains("partial_min"), s"hash-key min lost its partial phase at sf1:\n$p")
    assert(
      !p.contains("windowspecdefinition(h#"),
      s"a window partitioned by the hash column appeared:\n$p"
    )
    assert(!p.contains("CartesianProduct"))
  }

  test("sf1: knn_ivf_indexed probes the persisted index with one centroid broadcast") {
    assume(present, "tmp/sf1 soak corpus not present")
    val p = plan("knn_ivf_indexed")
    // The centroid table (metadata-scale) must broadcast for probe
    // assignment; the candidate join may be broadcast or shuffle by AQE
    // size decision, but never a cartesian, and the partial top-k must
    // keep only k rows per query ahead of the final rank.
    assert(p.contains("BroadcastExchange"), s"centroid broadcast missing at sf1:\n$p")
    assert(p.contains("WindowGroupLimit"), s"partial top-k missing at sf1:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("sf1: semantic-dedup pair join keeps its pinned width; moments/model stay broadcast") {
    assume(present, "tmp/sf1 soak corpus not present")
    val p = plan("dedup_semantic")
    assert(p.contains("REPARTITION_BY_NUM"),
      s"semantic pair join lost its pinned shuffle at sf1:\n$p")
    val widths = pinnedWidths(p)
    assert(widths.forall(_ > 1), s"pinned pair shuffle collapsed to one partition: $widths")
    assert(!p.contains("CartesianProduct"))
    // At sf1 statistics the quality/model joins must STILL not sort-merge
    // a corpus-sized table against a metadata-sized one.
    val lm = plan("corpus_lm_quality")
    assert(!lm.contains("Window"), s"corpus_lm_quality planned a window at sf1:\n$lm")
    val dsir = plan("corpus_dsir_weights")
    assert(dsir.contains("BroadcastHashJoin"), s"DSIR model join lost its broadcast at sf1:\n$dsir")
  }

  test("sf1: dimension chain still broadcasts; fact scan stays pruned") {
    assume(present, "tmp/sf1 soak corpus not present")
    val p5 = plan("q5_region_revenue")
    assert(p5.contains("BroadcastHashJoin"), s"q5 lost its broadcasts at sf1 sizes:\n$p5")
    assert(!p5.contains("CartesianProduct"))
    val p1 = plan("q1_agg")
    val read = p1.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(
      !read.contains("l_orderkey") && read.contains("l_quantity"),
      s"q1 fact scan no longer pruned at sf1:\n$read"
    )
  }
}
