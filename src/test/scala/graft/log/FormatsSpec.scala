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

  test("ORC export/import round-trips the log (binary stays binary)") {
    val log = freshLog(15)
    val out = TestSpark.tempDir("fmt-orc")
    // ORC carries binary natively — no base64 shim needed.
    log.toDF.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.count() == 15)
    val r9 = back.filter(col("offset") === 9).head()
    assert(new String(r9.getAs[Array[Byte]]("value")) == "payload-9")
    // And ORC data loads back INTO a log through the DSv2 sink.
    val dst = TestSpark.tempDir("fmt-orc") + "/reimport"
    spark.read.orc(out).orderBy("offset").coalesce(1)
      .select(col("value"))
      .write.format("graft").mode("append").save(dst)
    val re = SparkLog(spark, dst)
    assert(new String(re.read(9L).value) == "payload-9")
  }

  test("ordered reader export preserves total order (Log.Reader analog)") {
    val log = freshLog(15)
    val offs = log.reader.select("offset").collect().map(_.getLong(0))
    assert(offs.toSeq == (0L until 15L))
  }
}
