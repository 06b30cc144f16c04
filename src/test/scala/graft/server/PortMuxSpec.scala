package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.log.SparkLog
import graft.server.grpc.{GrpcLogClient, GrpcLogServer}

/** Single-port multiplexing — the cmux role in the reference's agent
  * (reference: internal/agent/agent.go:79-91: one listener, connections
  * routed by their first bytes). Both protocols drive the SAME mux port:
  * a gRPC client (HTTP/2 preface) and an HTTP/1 client (GET/POST), against
  * one shared LogService.
  */
class PortMuxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("gRPC and HTTP/1 share one port, routed by first bytes (agent.go:79-91)") {
    val log = SparkLog(spark, TestSpark.tempDir("mux"))
    val service = new LogService(log)
    val grpcSrv = new GrpcLogServer(service, port = 0, anonymousSubject = "root").start()
    val httpSrv = new HttpLogServer(service, port = 0).start()
    val mux = new PortMux(0, grpcSrv.boundPort, httpSrv.boundPort).start()
    try {
      // gRPC through the mux port: produce + consume round trip.
      val g = new GrpcLogClient("localhost", mux.boundPort)
      try {
        val off = g.produce("via-grpc".getBytes("UTF-8"))
        assert(off == 0L)
        assert(new String(g.consume(0L).value, "UTF-8") == "via-grpc")
      } finally g.close()

      // HTTP/1 through the SAME port: stat + consume see the gRPC write.
      val c = HttpClient.newHttpClient()
      val stat = c.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:${mux.boundPort}/stat")).GET().build(),
        HttpResponse.BodyHandlers.ofString()
      )
      assert(stat.statusCode() == 200 && stat.body().contains("\"highest\":0"), stat.body())
      val consume = c.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:${mux.boundPort}/?offset=0"))
          .GET().build(),
        HttpResponse.BodyHandlers.ofString()
      )
      assert(consume.statusCode() == 200)
      assert(
        consume.body().contains(
          java.util.Base64.getEncoder.encodeToString("via-grpc".getBytes("UTF-8"))
        ),
        consume.body()
      )

      // Interleaved traffic: the two protocols keep working side by side
      // (each connection classifies independently).
      val g2 = new GrpcLogClient("localhost", mux.boundPort)
      try {
        assert(g2.produce("second".getBytes("UTF-8")) == 1L)
        val stat2 = c.send(
          HttpRequest.newBuilder(URI.create(s"http://localhost:${mux.boundPort}/stat")).GET().build(),
          HttpResponse.BodyHandlers.ofString()
        )
        assert(stat2.body().contains("\"highest\":1"), stat2.body())
      } finally g2.close()
    } finally {
      mux.stop()
      httpSrv.stop()
      grpcSrv.stop()
    }
  }
}
