package graft.server.grpc

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.log.SparkLog
import graft.server.LogService

/** R7 server-assembly extras: the standard `grpc.health.v1.Health` service
  * and per-RPC counters (reference: internal/server/server.go:48-86 —
  * health server registration and OpenCensus stats views).
  */
class HealthAndStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withServer(f: (GrpcLogClient, GrpcLogServer) => Unit): Unit = {
    val log = SparkLog(spark, TestSpark.tempDir("health"))
    val srv =
      new GrpcLogServer(new LogService(log), port = 0, anonymousSubject = "root").start()
    val client = new GrpcLogClient("localhost", srv.boundPort)
    try f(client, srv)
    finally { client.close(); srv.stop() }
  }

  test("health check reports SERVING for the server and both services") {
    withServer { (client, _) =>
      assert(client.healthCheck() == HealthProto.StatusServing)
      assert(client.healthCheck("log.v1.Log") == HealthProto.StatusServing)
      assert(client.healthCheck("graft.v1.Membership") == HealthProto.StatusServing)
      // The published health contract: unknown service names → NOT_FOUND.
      val e = intercept[Throwable](client.healthCheck("no.such.Service"))
      assert(e.getMessage.contains("NOT_FOUND"), s"got: ${e.getMessage}")
    }
  }

  test("per-RPC counters track calls and errors (OpenCensus views stand-in)") {
    withServer { (client, srv) =>
      client.produce("a".getBytes)
      client.produce("b".getBytes)
      client.consume(0L)
      intercept[Throwable](client.consume(99L)) // typed 404 → an error close

      val s = srv.stats
      assert(s("log.v1.Log/Produce") == ((2L, 0L)), s"stats: $s")
      assert(s("log.v1.Log/Consume") == ((2L, 1L)), s"stats: $s")
      // Health checks count too (they ride the same interceptor chain).
      client.healthCheck()
      assert(srv.stats("grpc.health.v1.Health/Check")._1 == 1L)
    }
  }

  test("per-RPC latency percentiles move with traffic (ServerLatency view stand-in)") {
    withServer { (client, srv) =>
      assert(srv.latencies.isEmpty, "no traffic yet → no histograms")
      client.produce("a".getBytes)
      (0 until 20).foreach(_ => client.consume(0L))

      val lat = srv.latencies
      val consume = lat("log.v1.Log/Consume")
      assert(consume.count == 20L, s"latencies: $lat")
      // Real sampled latencies: positive, percentile-ordered, max observed
      // at least the p50 bucket's scale.
      assert(consume.p50Millis > 0.0)
      assert(consume.p50Millis <= consume.p95Millis)
      assert(consume.p95Millis <= consume.p99Millis)
      assert(consume.maxMillis > 0.0)
      // Error closes sample too (the 404 path is a latency data point).
      intercept[Throwable](client.consume(99L))
      assert(srv.latencies("log.v1.Log/Consume").count == 21L)
    }
  }

  test("always-sample trace ring records one span per RPC, oldest to newest") {
    withServer { (client, srv) =>
      client.produce("a".getBytes)
      client.consume(0L)
      intercept[Throwable](client.consume(99L)) // error close samples too

      val spans = srv.recentTraces
      assert(spans.size == 3, s"spans: $spans")
      assert(spans.map(_.traceId) == spans.map(_.traceId).sorted, "oldest → newest")
      assert(spans.map(_.method) == Seq(
        "log.v1.Log/Produce", "log.v1.Log/Consume", "log.v1.Log/Consume"
      ))
      assert(spans.take(2).forall(_.ok) && !spans.last.ok, "status rides the span")
      assert(spans.forall(s => s.durationNanos > 0 && s.startEpochMillis > 0))

      // The ring is bounded: flood past capacity, keep the newest window.
      (0 until 300).foreach(_ => client.healthCheck())
      val after = srv.recentTraces
      assert(after.size <= 256, s"ring must stay bounded, got ${after.size}")
      assert(after.forall(_.traceId > spans.last.traceId - 1))
    }
  }

  test("unit: histogram percentiles rank geometric buckets correctly") {
    val h = new graft.server.LatencyHistogram
    // 90 samples ~1 ms, 9 at ~80 ms, 1 at ~1.3 s: p50 in the 1 ms bucket,
    // p95 in the 80 ms bucket, p99 likewise, max ≈ 1.3 s exactly.
    (0 until 90).foreach(_ => h.record(1000000L))
    (0 until 9).foreach(_ => h.record(80000000L))
    h.record(1300000000L)
    val s = h.snapshot()
    assert(s.count == 100L)
    assert(s.p50Millis >= 1.0 && s.p50Millis <= 2.1, s"p50=${s.p50Millis}")
    assert(s.p95Millis >= 64.0 && s.p95Millis <= 131.1, s"p95=${s.p95Millis}")
    assert(s.p99Millis >= 64.0 && s.p99Millis <= 131.1, s"p99=${s.p99Millis}")
    assert(math.abs(s.maxMillis - 1300.0) < 0.001)
    // The lone tail sample is the 100th rank: p100 ≈ its bucket, via p99
    // over a 1-sample histogram.
    val t = new graft.server.LatencyHistogram
    t.record(1300000000L)
    assert(t.snapshot().p99Millis >= 1300.0 / 2 && t.snapshot().p99Millis <= 2600.0)
  }
}
