package graft.server

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.log.{LogConfig, OffsetOutOfRangeException, SparkLog}

/** Scenario tests mirroring the reference's gRPC server tests
  * (reference: internal/server/server_test.go:40-59 scenario map).
  */
class LogServiceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def newService(): LogService = {
    val log = SparkLog(spark, TestSpark.tempDir("svc"), LogConfig(maxStoreBytes = 64))
    new LogService(log)
  }

  test("produce/consume round-trips (server_test.go:177-192)") {
    val svc = newService()
    val want = "hello world".getBytes("UTF-8")
    val ack = svc.produce("root", ProduceRequest(want))
    assert(ack.offset == 0)
    val got = svc.consume("root", ConsumeRequest(ack.offset))
    assert(got.record.value.sameElements(want))
    assert(got.record.offset == 0)
  }

  test("consume past boundary fails with 404 (server_test.go:194-210)") {
    val svc = newService()
    val ack = svc.produce("root", ProduceRequest("hello world".getBytes))
    val e = intercept[OffsetOutOfRangeException] {
      svc.consume("root", ConsumeRequest(ack.offset + 1))
    }
    assert(e.code == 404)
  }

  test("produce stream acks each record with its offset (server_test.go:212-245)") {
    val svc = newService()
    val records = (0 until 3).map(i => ProduceRequest(s"rec-$i".getBytes))
    val acks = svc.produceStream("root", records.iterator).toSeq
    assert(acks.map(_.offset) == Seq(0L, 1L, 2L))
    // and the log holds them in order
    (0 until 3).foreach { i =>
      assert(new String(svc.consume("root", ConsumeRequest(i.toLong)).record.value) == s"rec-$i")
    }
  }

  test("consume stream replays from offset to end (server_test.go:247-284 catch-up half)") {
    val svc = newService()
    svc.produceStream("root", (0 until 5).map(i => ProduceRequest(s"m-$i".getBytes)).iterator).foreach(_ => ())
    val got = svc.consumeStream("root", 2).toSeq
    assert(got.map(_.offset) == Seq(2L, 3L, 4L))
    assert(new String(got.head.value) == "m-2")
    // past the end: empty, not an error (the tail picks up from there)
    assert(svc.consumeStream("root", 5).isEmpty)
  }

  test("consume stream delivers log order from plan order — no sort, no exchange") {
    import org.apache.spark.sql.functions.col
    val session = spark
    import session.implicits._
    val svc = newService() // 64-byte store cap: 40 records roll many segments/parts
    svc.produceStream("root", (0 until 40).map(i => ProduceRequest(s"ord-$i".getBytes)).iterator)
      .foreach(_ => ())
    val got = svc.consumeStream("root", 0).toSeq
    assert(got.map(_.offset) == (0L until 40L), s"out of order: ${got.map(_.offset)}")
    assert(new String(got(17).value) == "ord-17")
    // Multi-PART segments too: a 6-partition bulk append writes several
    // part files per segment; plan order must still be offset order.
    svc.log.appendDF(
      (40 until 120).map(i => s"bulk-$i".getBytes).toDF("value").repartition(6))
    val all = svc.consumeStream("root", 0).map(_.offset).toSeq
    assert(all == (0L until 120L), s"out of order after bulk append: $all")
    // The plan that backs the iterator must carry neither a Sort nor an
    // Exchange: the scan's partition order IS the delivery order.
    val plan = session.read
      .format("graft")
      .load(svc.log.dir)
      .filter(col("offset") >= 0 && col("offset") <= svc.log.highestOffset)
      .as[graft.log.LogRecord]
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("Sort"), s"unexpected sort:\n$plan")
    assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
  }

  test("tail sees records appended after the stream starts (server_test.go:247-284 blocking half)") {
    val svc = newService()
    svc.produce("root", ProduceRequest("first".getBytes))
    val q = svc
      .tail("root", from = 1)
      .writeStream
      .format("memory")
      .queryName("svc_tail")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select count(*) from svc_tail").head().getLong(0) == 0)
      svc.produce("root", ProduceRequest("second".getBytes))
      q.processAllAvailable()
      val rows = spark.sql("select offset, cast(value as string) v from svc_tail").collect()
      assert(rows.length == 1 && rows.head.getLong(0) == 1L && rows.head.getString(1) == "second")
    } finally q.stop()
  }

  test("unauthorized subject is denied (server_test.go:286-308)") {
    val svc = newService()
    val e = intercept[PermissionDeniedException] {
      svc.produce("nobody", ProduceRequest("denied".getBytes))
    }
    assert(e.code == 7)
    assert(e.getMessage == "nobody not permitted to produce to *")
    intercept[PermissionDeniedException] {
      svc.consume("nobody", ConsumeRequest(0))
    }
  }

  test("getServers reports the driver as single leader (server_test.go GetServers analog)") {
    val svc = newService()
    val servers = svc.getServers
    assert(servers.size == 1)
    assert(servers.head.isLeader)
    assert(servers.head.id == "driver-0")
  }

  test("produce stream batches large iterators without losing ack order") {
    val svc = newService()
    val n = 3000 // > one internal batch (1024)
    val acks = svc.produceStream("root", (0 until n).iterator.map(i => ProduceRequest(s"big-$i".getBytes))).toSeq
    assert(acks.map(_.offset) == (0L until n.toLong))
    assert(new String(svc.consume("root", ConsumeRequest(2999)).record.value) == "big-2999")
  }

  test("acl isPermitted reflects the policy map without throwing") {
    val acl = Acl(Map("alice" -> Set(Action.Consume)))
    assert(acl.isPermitted("alice", Action.Consume))
    assert(!acl.isPermitted("alice", Action.Produce))
    assert(!acl.isPermitted("mallory", Action.Consume))
  }

  test("tail continues past a truncation boundary") {
    val svc = newService()
    svc.produceStream("root", (0 until 6).map(i => ProduceRequest(s"t$i".getBytes)).iterator).foreach(_ => ())
    svc.log.truncate(2)
    val q = svc.tail("root", from = svc.log.highestOffset + 1)
      .writeStream.format("memory").queryName("svc_tail_trunc").outputMode("append").start()
    try {
      q.processAllAvailable()
      svc.produce("root", ProduceRequest("after-trunc".getBytes))
      q.processAllAvailable()
      val rows = spark.sql("select offset, cast(value as string) v from svc_tail_trunc").collect()
      assert(rows.length == 1 && rows.head.getString(1) == "after-trunc")
    } finally q.stop()
  }
}
