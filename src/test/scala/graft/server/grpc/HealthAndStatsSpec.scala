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
}
