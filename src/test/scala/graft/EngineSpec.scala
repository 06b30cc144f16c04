package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.server.ConsumeRequest

class EngineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming ingest commits micro-batches into the log (fsm.Apply analog)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val engine = Engine(spark, TestSpark.tempDir("engine-ingest"))
    val input = MemoryStream[String]
    val q = engine.ingest(
      input.toDF().selectExpr("cast(value as binary) as value"),
      checkpoint = TestSpark.tempDir("engine-ckpt"),
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()
    )
    input.addData("a", "b", "c")
    q.processAllAvailable()
    q.awaitTermination(30000)
    assert(engine.log.highestOffset == 2)
    assert(new String(engine.service.consume("root", ConsumeRequest(1)).record.value) == "b")
  }

  test("engine registers native functions on the session") {
    Engine(spark, TestSpark.tempDir("engine-fn"))
    val r = spark.sql("SELECT cosine_similarity(array(3.0d,4.0d), array(3.0d,4.0d))").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
