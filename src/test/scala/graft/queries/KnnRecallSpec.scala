package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** The ANN accuracy audit's own contract: the recall table covers every
  * (method, setting) cell exactly once, counts are consistent, a larger
  * quantized candidate budget can never LOWER recall (its candidate set is
  * a superset by construction), and the plan never degenerates into a
  * corpus×corpus cartesian — the scoring streams stay broadcast-query
  * shaped like the knn_* bodies they audit.
  */
class KnnRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("knn_recall: full sweep grid, consistent counts, monotone quantized recall") {
    val df = SparkEntry.queries("knn_recall")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    val rows = df.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    Checkpoints.release()

    assert(!p.contains("CartesianProduct"), s"knn_recall planned a cartesian:\n$p")

    val grid = rows.map(r => (r._1, r._2)).toSeq
    assert(grid == Seq(("ivf", 1), ("lsh", 4), ("lsh", 6), ("lsh", 8),
      ("quantized", 8), ("quantized", 16), ("quantized", 32)),
      s"sweep grid drifted: $grid")

    val total = rows.head._4
    assert(total == 40L, s"8 queries x k=5 ground truth, got $total")
    rows.foreach { case (m, set, hits, tot, recall) =>
      assert(tot == total)
      assert(hits >= 0 && hits <= tot, s"$m/$set hits=$hits out of range")
      assert(recall == hits.toDouble / tot, s"$m/$set recall is not hits/total")
    }

    // Budget b's candidates are crank<=b — a subset of budget b'>b's, so
    // the re-ranked top-k can only gain true neighbors as b grows.
    val quant = rows.filter(_._1 == "quantized").sortBy(_._2).map(_._3)
    assert(quant.zip(quant.tail).forall { case (a, b) => a <= b },
      s"quantized recall must be monotone in candidate budget: ${quant.toSeq}")
  }
}
