package graft.server.grpc

import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.log.{LogConfig, LogRecord, SparkLog}
import graft.server.{LogService, TestCerts}

/** End-to-end over the real wire protocol — mirrors the reference's server
  * test matrix (reference: internal/server/server_test.go:177-308):
  * produce/consume round trip, past-boundary 404 with the exact message and
  * LocalizedMessage detail, bidi produce-stream acks, consume-stream
  * catch-up AND its blocking half, and the `nobody`-cert PermissionDenied
  * pair. All calls cross a real TCP socket under mTLS with CN→subject
  * authentication; the only deviation from the reference is the canonical
  * NOT_FOUND(5) wire code standing in for Go's non-canonical 404 (which
  * rides in the rpc.Status detail instead — see GrpcLogServer).
  */
class GrpcLogServerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withServer(f: (GrpcLogClient, GrpcLogClient, SparkLog) => Unit): Unit = {
    val log = SparkLog(spark, TestSpark.tempDir("grpc-log"), LogConfig(maxStoreBytes = 256))
    val srv = new GrpcLogServer(new LogService(log), port = 0, tls = Some(TestCerts.serverTls))
      .start()
    val root = new GrpcLogClient("localhost", srv.boundPort, Some(TestCerts.clientTls("root.p12")))
    val nobody =
      new GrpcLogClient("localhost", srv.boundPort, Some(TestCerts.clientTls("nobody.p12")))
    try f(root, nobody, log)
    finally {
      root.close(); nobody.close(); srv.stop()
    }
  }

  test("produce/consume round trip (server_test.go:177-192)") {
    withServer { (client, _, _) =>
      val off = client.produce("hello world".getBytes)
      assert(off == 0L)
      val rec = client.consume(0L)
      assert(new String(rec.value) == "hello world")
      assert(rec.offset == 0L)
    }
  }

  test("consume past boundary: 404 contract with exact message + detail (server_test.go:194-210)") {
    withServer { (client, _, _) =>
      client.produce("Hello World".getBytes)
      val e = intercept[Throwable](client.consume(1L))
      val Some((msg, localized, code)) = GrpcLogClient.offsetErrorDetails(e)
      assert(msg == "offset out of range: 1")
      assert(localized == "The requested offset is outside the log's range: 1")
      // Canonical stand-in for the reference's literal 404 (grpc-java
      // cannot emit non-canonical codes).
      assert(code == GrpcLogServer.io404CanonicalCode)
      assert(e.getMessage.contains("offset out of range: 1"))
    }
  }

  test("produce stream acks each record; consume stream replays in order (server_test.go:212-246)") {
    withServer { (client, _, _) =>
      val records = Seq("First message", "Second message").map(_.getBytes)
      val acks = client.produceStream(records)
      assert(acks == Seq(0L, 1L), s"acks: $acks")

      val it = client.consumeStream(0L)
      records.zipWithIndex.foreach { case (want, i) =>
        val rec = it.next()
        assert(new String(rec.value) == new String(want))
        assert(rec.offset == i.toLong)
      }
    }
  }

  test("consume stream blocks for the next record (server_test.go:248-284)") {
    withServer { (client, _, _) =>
      client.produce("First message".getBytes)
      val it = client.consumeStream(0L)
      val first = it.next()
      assert(new String(first.value) == "First message" && first.offset == 0L)

      // The next Recv must block until a produce lands — deliver it from
      // another thread after a beat, like the reference's goroutine.
      val got = new java.util.concurrent.LinkedBlockingQueue[LogRecord](1)
      val reader = new Thread(() => got.put(it.next()))
      reader.start()
      client.produce("Second message".getBytes)
      val second = got.poll(30, TimeUnit.SECONDS)
      assert(second != null, "blocking consume stream never delivered")
      assert(new String(second.value) == "Second message" && second.offset == 1L)
      reader.join(5000)
    }
  }

  test("nobody's verified cert authenticates but authorizes nothing (server_test.go:286-308)") {
    withServer { (_, nobody, _) =>
      val p = intercept[Throwable](nobody.produce("hello world".getBytes))
      assert(p.getMessage.contains("PERMISSION_DENIED"), p.getMessage)
      assert(p.getMessage.contains("nobody not permitted to produce to *"), p.getMessage)

      val c = intercept[Throwable](nobody.consume(0L))
      assert(c.getMessage.contains("PERMISSION_DENIED"), c.getMessage)
      assert(c.getMessage.contains("nobody not permitted to consume to *"), c.getMessage)
    }
  }

  test("GetServers reports the single-leader topology (server.go:180-190)") {
    withServer { (client, _, _) =>
      val servers = client.getServers
      assert(servers.size == 1)
      assert(servers.head.isLeader)
      assert(servers.head.id.nonEmpty && servers.head.rpcAddr.nonEmpty)
    }
  }

  test("wire codecs are proto3-exact: round trip + unknown-field tolerance") {
    // Record with all four fields round-trips bit-exactly.
    val rec = LogRecord("payload".getBytes, 7L, 3L, 2)
    val bytes = LogProto.encodeRecord(rec)
    val back = LogProto.decodeRecord(bytes)
    assert(back.value.toSeq == rec.value.toSeq)
    assert(back.offset == 7L && back.term == 3L && back.recordType == 2)

    // proto3 defaults are omitted: a zero record is zero bytes.
    assert(LogProto.encodeRecord(LogRecord(Array.emptyByteArray, 0L)).isEmpty)

    // Unknown fields (a future proto revision) are skipped, not fatal:
    // append field 9 (varint 1) to an encoded record.
    val withUnknown = bytes ++ Array[Byte](0x48, 0x01) // tag 9<<3|0, value 1
    assert(LogProto.decodeRecord(withUnknown).offset == 7L)

    // ConsumeResponse keeps the reference's field-number-2 quirk.
    val cr = LogProto.encodeConsumeResponse(LogRecord("x".getBytes, 1L))
    assert((cr(0) & 0xff) == 0x12, f"expected tag 0x12 (field 2 LEN), got 0x${cr(0)}%02x")
  }
}
