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

  test("TLS twin: gRPC and HTTPS share one TLS port, routed by ALPN peek") {
    val log = SparkLog(spark, TestSpark.tempDir("mux-tls"))
    val service = new LogService(log)
    // Both backends own their mTLS handshake; the mux stays a byte relay
    // (reference: agent.go:79-91 + :124-149 reach single-port TLS via cmux
    // + per-listener TLS — same observable surface).
    val grpcSrv = new GrpcLogServer(
      service, port = 0, tls = Some(TestCerts.serverTls), bindHost = Some("127.0.0.1")
    ).start()
    val httpSrv = new HttpLogServer(
      service, port = 0, tls = Some(TestCerts.serverTls), bindHost = Some("127.0.0.1")
    ).start()
    val mux = new PortMux(0, grpcSrv.boundPort, httpSrv.boundPort).start()
    try {
      // mTLS gRPC through the mux port (client offers ALPN h2 only).
      val g = new GrpcLogClient(
        "localhost", mux.boundPort, Some(TestCerts.clientTls("root.p12"))
      )
      try {
        val off = g.produce("via-tls-grpc".getBytes("UTF-8"))
        assert(off == 0L)
        assert(new String(g.consume(0L).value, "UTF-8") == "via-tls-grpc")
      } finally g.close()

      // mTLS HTTPS through the SAME port (java.net.http offers h2,http/1.1
      // → HTTP backend, which negotiates http/1.1).
      val c = java.net.http.HttpClient
        .newBuilder()
        .sslContext(Mtls.sslContext(TestCerts.clientTls("root.p12")))
        .build()
      val stat = c.send(
        HttpRequest.newBuilder(URI.create(s"https://localhost:${mux.boundPort}/stat"))
          .GET().build(),
        HttpResponse.BodyHandlers.ofString()
      )
      assert(stat.statusCode() == 200 && stat.body().contains("\"highest\":0"), stat.body())

      // nobody's cert IS trusted for the handshake but CN=nobody is denied
      // by the ACL on a write — through the mux, on both protocols.
      val gNobody = new GrpcLogClient(
        "localhost", mux.boundPort, Some(TestCerts.clientTls("nobody.p12"))
      )
      try {
        val denied = intercept[Exception](gNobody.produce("x".getBytes("UTF-8")))
        assert(denied.getMessage.contains("nobody not permitted to produce to *"),
          denied.getMessage)
      } finally gNobody.close()

      // CN spoof inert: an X-Subject header under TLS cannot override the
      // verified certificate CN (HttpLogServer ignores it in TLS mode).
      val cNobody = java.net.http.HttpClient
        .newBuilder()
        .sslContext(Mtls.sslContext(TestCerts.clientTls("nobody.p12")))
        .build()
      val spoof = cNobody.send(
        HttpRequest.newBuilder(URI.create(s"https://localhost:${mux.boundPort}/"))
          .header("X-Subject", "root")
          .POST(HttpRequest.BodyPublishers.ofString(
            s"""{"record":{"value":"${java.util.Base64.getEncoder
              .encodeToString("x".getBytes("UTF-8"))}"}}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString()
      )
      assert(spoof.statusCode() == 403, s"${spoof.statusCode()}: ${spoof.body()}")
      assert(spoof.body() == "nobody not permitted to produce to *", spoof.body())

      // The earlier gRPC write is visible over HTTPS — one shared log
      // behind one TLS port.
      val consume = c.send(
        HttpRequest.newBuilder(URI.create(s"https://localhost:${mux.boundPort}/?offset=0"))
          .GET().build(),
        HttpResponse.BodyHandlers.ofString()
      )
      assert(consume.statusCode() == 200 && consume.body().contains(
        java.util.Base64.getEncoder.encodeToString("via-tls-grpc".getBytes("UTF-8"))
      ), consume.body())
    } finally {
      mux.stop()
      httpSrv.stop()
      grpcSrv.stop()
    }
  }

  test("concurrent mixed traffic classifies correctly under load") {
    val log = SparkLog(spark, TestSpark.tempDir("mux-soak"))
    val service = new LogService(log)
    val grpcSrv = new GrpcLogServer(service, port = 0, anonymousSubject = "root").start()
    val httpSrv = new HttpLogServer(service, port = 0).start()
    val mux = new PortMux(0, grpcSrv.boundPort, httpSrv.boundPort).start()
    try {
      val seed = new GrpcLogClient("localhost", mux.boundPort)
      try { val _ = seed.produce("soak".getBytes("UTF-8")) } finally seed.close()

      // 16 threads × 8 rounds, each round one gRPC consume (fresh
      // connection — exercises the per-connection classify path) and one
      // HTTP stat, all through the single mux port.
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val threads = (0 until 16).map { t =>
        new Thread(() => {
          val http = HttpClient.newHttpClient()
          (0 until 8).foreach { i =>
            try {
              val g = new GrpcLogClient("localhost", mux.boundPort)
              try {
                if (new String(g.consume(0L).value, "UTF-8") != "soak")
                  errors.add(s"t$t/$i: wrong consume value")
              } finally g.close()
              val r = http.send(
                HttpRequest.newBuilder(
                  URI.create(s"http://localhost:${mux.boundPort}/stat")
                ).GET().build(),
                HttpResponse.BodyHandlers.ofString()
              )
              if (r.statusCode() != 200) errors.add(s"t$t/$i: http ${r.statusCode()}")
            } catch { case e: Exception => errors.add(s"t$t/$i: ${e.getMessage}") }
          }
        }, s"mux-soak-$t")
      }
      threads.foreach(_.start())
      threads.foreach(_.join(60000))
      assert(errors.isEmpty, s"${errors.size} failures: ${
        scala.jdk.CollectionConverters.CollectionHasAsScala(errors).asScala.take(5).mkString("; ")}")
      // Every one of the 128 HTTP stats actually traversed the mux.
      assert(service.log.highestOffset == 0L)
    } finally {
      mux.stop()
      httpSrv.stop()
      grpcSrv.stop()
    }
  }
}
