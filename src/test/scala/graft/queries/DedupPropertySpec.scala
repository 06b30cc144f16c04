package graft.queries

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized equivalence guard for the set-collapsed clustering path:
  * on arbitrary corpora (clone-heavy, near-dup chains, multi-lang), the
  * distributed pipeline — set collapse → exact Jaccard pairs over reps →
  * min-label propagation with pointer jumping → rep re-expansion — must
  * produce exactly the labels of a driver-side brute-force union-find
  * over doc-level J ≥ 0.6 same-lang pairs. Seeded, so failures replay.
  */
class DedupPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Brute-force oracle: all-pairs Jaccard + union-find, min-id labels. */
  private def bruteClusters(docs: Seq[(Long, String, String)]): Map[Long, Long] = {
    val sets = docs.map { case (id, lang, text) =>
      (id, lang, text.trim.toLowerCase.split(" ").toSet)
    }
    val parent = scala.collection.mutable.Map(docs.map(d => d._1 -> d._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    def union(a: Long, b: Long): Unit = { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    for {
      (i, li, a) <- sets
      (j, lj, b) <- sets
      if i < j && li == lj
      inter = (a & b).size
      if inter.toDouble / (a.size + b.size - inter) >= 0.6
    } union(i, j)
    docs.map(d => d._1 -> find(d._1)).toMap
  }

  test("clustering matches a brute-force union-find on random corpora") {
    import spark.implicits._
    val pool = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l")
    for (seed <- Seq(1, 7, 42, 99, 2026)) {
      val rnd = new Random(seed)
      val docs = (0 until 40).map { id =>
        val lang = if (rnd.nextBoolean()) "en" else "zh"
        // Small word pool + sizes 3..7 → dense clone groups, borderline
        // J ratios around the 0.6 threshold, and cross-lang twins.
        val n = 3 + rnd.nextInt(5)
        val words = rnd.shuffle(pool).take(n)
        (id.toLong, lang, words.mkString(" "))
      }
      val got = Dedup
        .clustersFrom(spark, docs.toDF("doc_id", "lang", "text"))
        .as[(Long, Long)]
        .collect()
        .toMap
      val expected = bruteClusters(docs)
      assert(got == expected, s"seed $seed: labels diverged\n got=$got\n exp=$expected")
      graft.queries.Checkpoints.release()
    }
  }

  test("set key is injective on boundary-colliding token sets") {
    import spark.implicits._
    // Every doc's token set CONCATENATES to "abc" — if the collapse key
    // ever used an empty (or space) separator, all four would be treated
    // as one J=1 clone group. With the U+0001 separator they are four
    // distinct sets, pairwise Jaccard 0, so each doc is its own cluster.
    val docs = Seq(
      (0L, "en", "ab c"),
      (1L, "en", "a bc"),
      (2L, "en", "abc"),
      (3L, "en", "a b c"))
    val got = Dedup
      .clustersFrom(spark, docs.toDF("doc_id", "lang", "text"))
      .as[(Long, Long)]
      .collect()
      .toMap
    val expected = bruteClusters(docs)
    assert(got == expected, s"boundary corpus: labels diverged\n got=$got\n exp=$expected")
    assert(expected.values.toSet.size == 4, "oracle sanity: four singleton clusters")
    graft.queries.Checkpoints.release()
  }

  test("multi-char random corpora: collapse key matches brute force") {
    import spark.implicits._
    // Same property as above but with a pool engineered for concatenation
    // collisions ("ab"+"c" == "a"+"bc" == "abc") at random compositions.
    val pool = Vector("a", "b", "c", "ab", "bc", "abc", "ca", "cab", "bca")
    for (seed <- Seq(3, 11, 2027)) {
      val rnd = new Random(seed)
      val docs = (0 until 40).map { id =>
        val n = 2 + rnd.nextInt(4)
        (id.toLong, "en", rnd.shuffle(pool).take(n).mkString(" "))
      }
      val got = Dedup
        .clustersFrom(spark, docs.toDF("doc_id", "lang", "text"))
        .as[(Long, Long)]
        .collect()
        .toMap
      val expected = bruteClusters(docs)
      assert(got == expected, s"seed $seed: labels diverged\n got=$got\n exp=$expected")
      graft.queries.Checkpoints.release()
    }
  }
}
