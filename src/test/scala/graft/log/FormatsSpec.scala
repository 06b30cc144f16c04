package graft.log

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Source/sink coverage beyond the native Parquet segments: the log's batch
  * view exports to (and reloads from) JSON and CSV losslessly — the
  * `Log.Reader` export surface (reference: internal/log/log.go:173-193)
  * generalized to Spark's format zoo.
  */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshLog(n: Int): SparkLog = {
    val log = SparkLog(spark, TestSpark.tempDir("fmt"), LogConfig(maxStoreBytes = 96))
    log.append((0 until n).map(i => s"payload-$i".getBytes))
    log
  }

  test("JSON export/import round-trips the log") {
    val log = freshLog(20)
    val out = TestSpark.tempDir("fmt-json")
    // binary → base64 for a text format
    log.toDF.select(col("offset"), base64(col("value")).as("value_b64")).write.mode("overwrite").json(out)
    val back = spark.read.json(out).select(col("offset"), unbase64(col("value_b64")).as("value"))
    assert(back.count() == 20)
    val r7 = back.filter(col("offset") === 7).head()
    assert(new String(r7.getAs[Array[Byte]]("value")) == "payload-7")
  }

  test("CSV export/import round-trips the log") {
    val log = freshLog(12)
    val out = TestSpark.tempDir("fmt-csv")
    log.toDF
      .select(col("offset"), base64(col("value")).as("value_b64"))
      .write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == 12)
    val r3 = back.filter(col("offset") === "3").select(unbase64(col("value_b64"))).head()
    assert(new String(r3.getAs[Array[Byte]](0)) == "payload-3")
  }

  test("ordered reader export preserves total order (Log.Reader analog)") {
    val log = freshLog(15)
    val offs = log.reader.select("offset").collect().map(_.getLong(0))
    assert(offs.toSeq == (0L until 15L))
  }
}
