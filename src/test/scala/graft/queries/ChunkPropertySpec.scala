package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property check for `corpus_chunk`'s emission contract (64-token chunks,
  * stride 48, overlap 16; starts while s ≤ max(n−16, 1)): for random
  * document lengths,
  *   (a) every token position is covered by at least one chunk,
  *   (b) consecutive chunks overlap by exactly 16 positions except a
  *       shorter final chunk,
  *   (c) chunk token counts and hashes match a plain-Scala re-derivation.
  */
class ChunkPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunk starts cover every token and hashes match a Scala re-derivation") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // Lengths straddling every boundary: 1, overlap, chunk, stride
    // multiples ±1, and larger random docs.
    val lengths = Seq(1, 15, 16, 17, 47, 48, 49, 63, 64, 65, 80, 96, 97, 112, 113, 160) ++
      Seq.fill(20)(1 + rnd.nextInt(400))
    val docs = lengths.zipWithIndex.map { case (n, i) =>
      (i.toLong, "en", "src", (0 until n).map(j => s"t${i}_$j").mkString(" "))
    }
    val dir = TestSpark.tempDir("chunk-prop")
    docs.toDF("doc_id", "lang", "source", "text").write.parquet(s"$dir/documents.parquet")

    val got = graft.SparkEntry
      .queries("corpus_chunk")(spark, dir)
      .as[(Long, Long, Long, String)]
      .collect()
      .groupBy(_._1)

    docs.foreach { case (id, _, _, text) =>
      val w = text.split(" ")
      val n = w.length
      val starts = Iterator.iterate(1)(_ + 48).takeWhile(_ <= math.max(n - 16, 1)).toSeq
      val expected = starts.zipWithIndex.map { case (s, i) =>
        val slice = w.slice(s - 1, math.min(s - 1 + 64, n))
        (id, i.toLong, slice.length.toLong, md5hex(slice.mkString(" ")))
      }
      val actual = got(id).sortBy(_._2).toSeq
      assert(actual == expected, s"doc $id (n=$n): $actual != $expected")
      // (a) full coverage: the union of [s, s+63] reaches n.
      assert(starts.last + 63 >= n, s"doc $id: tail tokens uncovered")
      // (b) overlap exactly 16 between full consecutive chunks.
      starts.sliding(2).foreach {
        case Seq(a, b) => assert(b - a == 48)
        case _         => ()
      }
    }
  }
}
