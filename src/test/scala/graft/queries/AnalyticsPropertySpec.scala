package graft.queries

import java.sql.Date

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Model checks for the round-9 analytics arithmetic: the shared anomaly
  * z-score is re-derived by an independent imperative reference over random
  * daily series, and the interleave stride guarantee (each source's emitted
  * share tracks its corpus share within one document at ANY epoch cutoff)
  * is asserted on seeded skewed corpora through the full query.
  */
class AnalyticsPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("anomalyOver matches an imperative trailing-window reference on 60 random series") {
    val session = spark
    import session.implicits._
    val rnd = new Random(41)
    for (trial <- 0 until 60) {
      // Random series: gaps allowed (rows-based baseline), occasional flat
      // stretches (the exact zero-variance branch), occasional spikes.
      val len = 8 + rnd.nextInt(23)
      var day = java.time.LocalDate.of(2024, 1, 1)
      val series = (0 until len).map { _ =>
        day = day.plusDays(1L + rnd.nextInt(3))
        val n =
          if (rnd.nextInt(6) == 0) 500L + rnd.nextInt(500)
          else if (rnd.nextInt(4) == 0) 10L // flat-stretch material
          else 1L + rnd.nextInt(40)
        (day.toString, n)
      }
      val df = series.map { case (d, n) => (Date.valueOf(d), n) }.toDF("day", "n")
      val got = Temporal
        .anomalyOver(df)
        .collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))
        .toList

      // Independent reference: plain-Scala fold over the sorted series.
      val sorted = series.sortBy(_._1)
      val expected = sorted.indices.drop(7).map { i =>
        val win = sorted.slice(i - 7, i).map(_._2)
        val s1 = win.sum.toDouble
        val s2 = win.map(x => x * x).sum.toDouble
        val mean = round6(s1 / 7.0)
        val z =
          if (win.max == win.min) None
          else Some(round6((sorted(i)._2 - s1 / 7.0) / math.sqrt((7.0 * s2 - s1 * s1) / 42.0)))
        (sorted(i)._1, sorted(i)._2, mean, z, z.exists(v => math.abs(v) > 3.0))
      }.toList
      assert(got == expected, s"trial $trial: $got\nvs\n$expected")
    }
  }

  test("interleave stride bound holds on seeded skewed corpora at every cutoff") {
    val session = spark
    import session.implicits._
    // Three corpora with increasingly pathological source skew — the shape
    // the stride schedule exists for (one source must not dominate any
    // training window the way a concatenated or size-ordered feed would).
    val shapes = Seq(
      Seq(700, 200, 50, 30, 20),
      Seq(990, 10),
      Seq(300, 300, 300, 50, 25, 12, 6, 3, 2, 1)
    )
    for ((sizes, trial) <- shapes.zipWithIndex) {
      val docs = sizes.zipWithIndex.flatMap { case (n, si) =>
        (0 until n).map { i =>
          val id = (si * 100000 + i).toLong
          (id, s"doc $id body", "en", s"src$si", 10L)
        }
      }
      val dir = graft.TestSpark.tempDir(s"interleave-$trial")
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("corpus_interleave")(spark, dir).collect()
      Checkpoints.release()
      assert(rows.length == sizes.sum)
      val bySrc = rows.groupBy(_.getString(1))
      for ((src, rs) <- bySrc) {
        val n = rs.length
        assert(rs.map(_.getLong(2)).sorted.sameElements(1L to n), s"$src ranks not 1..$n")
        // vtime = (2r-1)/(2n): at any cutoff t the emitted count is within
        // one doc of n·t — no training window over- or under-serves a
        // source regardless of skew.
        for (t <- Seq(0.1, 0.25, 0.37, 0.5, 0.75, 0.9)) {
          val emitted = rs.count(_.getDouble(3) < t)
          assert(math.abs(emitted - n * t) <= 1.0,
            s"trial $trial $src: emitted=$emitted at t=$t (n=$n)")
        }
      }
    }
  }
}
