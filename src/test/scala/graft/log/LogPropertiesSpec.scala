package graft.log

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property tests (SURVEY §5 port): random batches ⇒ contiguous offsets,
  * round-trip reads, truncate keeps segment granularity. Generators are
  * sampled on fixed seeds (the scalatest–scalacheck bridge isn't in the
  * offline cache) and case counts stay small — every op is a Spark job.
  */
class LogPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val batchesGen: Gen[List[List[String]]] =
    Gen.resize(
      8,
      Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.alphaNumStr.map(s => "v" + s.take(12))))
    )

  private def cases[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("sink writes keep offsets contiguous and content exact for any batch/partition shape") {
    val session = spark
    import session.implicits._
    val shapeGen: Gen[List[(Int, Int)]] = // (rows, partitions) per write
      Gen.resize(
        4,
        Gen.nonEmptyListOf(
          for {
            n <- Gen.chooseNum(0, 60)
            p <- Gen.chooseNum(1, 7)
          } yield (n, p)
        )
      )
    cases(shapeGen, 5).foreach { writes =>
      val dir = TestSpark.tempDir("prop-sink") + "/log"
      var expected = 0L
      var payload = Set.empty[String]
      writes.zipWithIndex.foreach { case ((n, p), w) =>
        val vals = (0 until n).map(i => s"w$w-$i")
        payload ++= vals
        vals.toDF("s").select(col("s").cast("binary").as("value"))
          .repartition(p)
          .write.format("graft").mode("append").save(dir)
        expected += n
      }
      val rows = spark.read.format("graft").load(dir)
        .select(
          col("offset"),
          col("value").cast("string")
        )
        .collect()
      assert(rows.map(_.getLong(0)).sorted.toSeq == (0L until expected), s"shapes $writes")
      assert(rows.map(_.getString(1)).toSet == payload, s"shapes $writes")
    }
  }

  test("offsets are contiguous and gap-free across any batch sequence") {
    cases(batchesGen, 5).foreach { batches =>
      val log = SparkLog(spark, TestSpark.tempDir("prop-contig"), LogConfig(maxStoreBytes = 96))
      var expected = 0L
      batches.foreach { batch =>
        val first = log.append(batch.map(_.getBytes))
        assert(first == expected, s"batch sizes ${batches.map(_.size)}")
        expected += batch.size
      }
      assert(log.highestOffset == expected - 1)
      assert(log.lowestOffset == 0)
      val offs = log.toDF.select("offset").collect().map(_.getLong(0)).sorted
      assert(offs.toSeq == (0L until expected))
    }
  }

  test("read(i) round-trips sampled records from any batch sequence") {
    cases(batchesGen, 4).foreach { batches =>
      val values = batches.flatten
      val log = SparkLog(spark, TestSpark.tempDir("prop-rt"), LogConfig(maxStoreBytes = 96))
      batches.foreach(b => log.append(b.map(_.getBytes)))
      val idx = (values.size - 1) / 2
      assert(new String(log.read(idx.toLong).value) == values(idx))
      assert(new String(log.read(values.size - 1L).value) == values.last)
    }
  }

  test("truncate drops only whole segments at or below the boundary") {
    cases(Gen.chooseNum(0, 10), 5).foreach { cut =>
      val log = SparkLog(spark, TestSpark.tempDir("prop-trunc"), LogConfig(maxStoreBytes = 48))
      log.append((0 until 12).map(i => s"record-$i".getBytes))
      log.truncate(cut.toLong)
      val low = log.lowestOffset
      // nothing newer than the cut was lost...
      assert(low <= cut + 1, s"cut=$cut low=$low")
      // ...and everything still present reads back
      (low to log.highestOffset).foreach { i =>
        assert(new String(log.read(i).value) == s"record-$i")
      }
      if (low > 0) intercept[OffsetOutOfRangeException](log.read(low - 1))
    }
  }

  test("NIO and Hadoop backends agree on any batch sequence (file:// twin)") {
    // The same random op sequence against a plain-path log and a file://
    // URI log (which routes every byte through HadoopLogFs) must produce
    // identical observable state — offsets, round-trips, layout counts,
    // and full content.
    cases(batchesGen, 3).foreach { batches =>
      val cfg = LogConfig(maxStoreBytes = 96)
      val nio = SparkLog(spark, TestSpark.tempDir("prop-agree-nio"), cfg)
      val had = SparkLog(spark, "file://" + TestSpark.tempDir("prop-agree-hfs"), cfg)
      batches.foreach { batch =>
        val bytes = batch.map(_.getBytes("UTF-8"))
        assert(nio.append(bytes) == had.append(bytes))
      }
      assert(nio.highestOffset == had.highestOffset)
      assert(nio.segmentCount == had.segmentCount)
      val n = nio.highestOffset
      Seq(0L, n / 2, n).distinct.foreach { i =>
        assert(java.util.Arrays.equals(nio.read(i).value, had.read(i).value), s"offset $i")
      }
      val a = nio.toDF.select("offset", "value").collect().map(r => (r.getLong(0), new String(r.getAs[Array[Byte]](1)))).sortBy(_._1)
      val b = had.toDF.select("offset", "value").collect().map(r => (r.getLong(0), new String(r.getAs[Array[Byte]](1)))).sortBy(_._1)
      assert(a.toSeq == b.toSeq)
    }
  }
}
