package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.log.{LogConfig, SparkLog}

/** End-to-end drive of the HTTP surface, mirroring the reference's gRPC
  * server tests: produce → consume round trip and consume-past-boundary 404
  * (reference: internal/server/server_test.go:177-210), unauthorized subject
  * 403 (server_test.go:286-308), plus the stat/servers/tail extras.
  */
class HttpLogServerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def b64(s: String): String = Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private def withServer(f: (HttpClient, String, LogService) => Unit): Unit = {
    val log = SparkLog(spark, TestSpark.tempDir("http"), LogConfig(maxStoreBytes = 256))
    val service = new LogService(log)
    val srv = new HttpLogServer(service, port = 0).start()
    try f(HttpClient.newHttpClient(), s"http://localhost:${srv.boundPort}", service)
    finally srv.stop()
  }

  private def post(c: HttpClient, url: String, body: String, subject: String = "root") =
    c.send(
      HttpRequest.newBuilder(URI.create(url)).header("X-Subject", subject)
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString()
    )

  private def get(c: HttpClient, url: String, subject: String = "root") =
    c.send(
      HttpRequest.newBuilder(URI.create(url)).header("X-Subject", subject).GET().build(),
      HttpResponse.BodyHandlers.ofString()
    )

  test("produce/consume round trip over HTTP (server_test.go:177-196)") {
    withServer { (c, base, _) =>
      val p1 = post(c, s"$base/", s"""{"record":{"value":"${b64("hello world")}"}}""")
      assert(p1.statusCode() == 200 && p1.body().contains("\"offset\":0"))
      val p2 = post(c, s"$base/", s"""{"record":{"value":"${b64("second")}"}}""")
      assert(p2.body().contains("\"offset\":1"))

      val r = get(c, s"$base/?offset=0")
      assert(r.statusCode() == 200)
      assert(r.body().contains(s""""value":"${b64("hello world")}""""))
      assert(r.body().contains("\"offset\":0"))
      // The reference's JSON-body consume form works too.
      val viaBody = c.send(
        HttpRequest.newBuilder(URI.create(s"$base/")).header("X-Subject", "root")
          .method("GET", HttpRequest.BodyPublishers.ofString("""{"offset":1}""")).build(),
        HttpResponse.BodyHandlers.ofString()
      )
      assert(viaBody.statusCode() == 200 && viaBody.body().contains(s""""value":"${b64("second")}""""))
    }
  }

  test("consume past the boundary is a typed 404 (server_test.go:198-210)") {
    withServer { (c, base, _) =>
      post(c, s"$base/", s"""{"record":{"value":"${b64("only")}"}}""")
      val r = get(c, s"$base/?offset=1")
      assert(r.statusCode() == 404, s"got ${r.statusCode()}: ${r.body()}")
      assert(r.body().contains("offset out of range"), r.body())
    }
  }

  test("unauthorized subject gets 403 with the Casbin deny message (server_test.go:286-308)") {
    withServer { (c, base, _) =>
      val p = post(c, s"$base/", s"""{"record":{"value":"${b64("x")}"}}""", subject = "nobody")
      assert(p.statusCode() == 403)
      assert(p.body() == "nobody not permitted to produce to *", p.body())
      val r = get(c, s"$base/?offset=0", subject = "nobody")
      assert(r.statusCode() == 403)
      assert(r.body() == "nobody not permitted to consume to *", r.body())
    }
  }

  test("stat and servers report log state and topology") {
    withServer { (c, base, _) =>
      (0 until 3).foreach(i => post(c, s"$base/", s"""{"record":{"value":"${b64(s"r$i")}"}}"""))
      val stat = get(c, s"$base/stat")
      assert(stat.statusCode() == 200)
      assert(stat.body().contains("\"lowest\":0") && stat.body().contains("\"highest\":2"))
      val servers = get(c, s"$base/servers")
      assert(servers.statusCode() == 200)
      assert(servers.body().contains("\"isLeader\":true"))
    }
  }

  test("/stats serves per-route latency percentiles that move with traffic") {
    val log = SparkLog(spark, TestSpark.tempDir("http-stats"), LogConfig(maxStoreBytes = 256))
    val srv = new HttpLogServer(new LogService(log), port = 0).start()
    val c = HttpClient.newHttpClient()
    val base = s"http://localhost:${srv.boundPort}"
    try {
      (0 until 5).foreach(i => post(c, s"$base/", s"""{"record":{"value":"${b64(s"r$i")}"}}"""))
      (0 until 5).foreach(_ => get(c, s"$base/stat"))
      val stats = get(c, s"$base/stats")
      assert(stats.statusCode() == 200)
      // Both exercised routes appear with counts and ordered percentiles.
      assert(stats.body().contains("\"/\":") && stats.body().contains("\"/stat\":"))
      val lat = srv.latencies
      assert(lat("/").count == 5L && lat("/stat").count == 5L)
      assert(lat("/").p50Millis > 0.0 && lat("/").p50Millis <= lat("/").p99Millis)
    } finally srv.stop()
  }

  test("tail streams the catch-up portion as SSE events") {
    withServer { (c, base, _) =>
      (0 until 5).foreach(i => post(c, s"$base/", s"""{"record":{"value":"${b64(s"e$i")}"}}"""))
      val r = get(c, s"$base/tail?from=2")
      assert(r.statusCode() == 200)
      assert(r.headers().firstValue("Content-Type").orElse("").startsWith("text/event-stream"))
      val events = r.body().split("\n\n").filter(_.startsWith("data: "))
      assert(events.length == 3, r.body())
      assert(events.head.contains("\"offset\":2") && events.last.contains("\"offset\":4"))
      assert(events.last.contains(s""""value":"${b64("e4")}""""))
    }
  }

  test("concurrent producers get unique contiguous offsets (4-thread pool)") {
    // The HTTP layer is the first CONCURRENT caller of SparkLog (the CLI
    // and driver are single-threaded): 32 parallel produces across the
    // 4-thread pool must serialize through the synchronized append path
    // into unique, gap-free offsets.
    withServer { (c, base, _) =>
      import java.util.concurrent.{Callable, Executors}
      val pool = Executors.newFixedThreadPool(8)
      try {
        val tasks = (0 until 32).map { i =>
          new Callable[Long] {
            override def call(): Long = {
              val r = post(c, s"$base/", s"""{"record":{"value":"${b64(s"c$i")}"}}""")
              assert(r.statusCode() == 200, r.body())
              """"offset":(\d+)""".r.findFirstMatchIn(r.body()).get.group(1).toLong
            }
          }
        }
        import scala.jdk.CollectionConverters._
        val offsets = pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
        assert(offsets.sorted == (0L until 32L), s"offsets not contiguous/unique: $offsets")
      } finally pool.shutdown()
    }
  }

  test("malformed bodies keep the reference's status quirks (http.go:33-37,55-59)") {
    withServer { (c, base, _) =>
      assert(post(c, s"$base/", "{not json").statusCode() == 500)
      val viaBody = c.send(
        HttpRequest.newBuilder(URI.create(s"$base/")).header("X-Subject", "root")
          .method("GET", HttpRequest.BodyPublishers.ofString("{not json")).build(),
        HttpResponse.BodyHandlers.ofString()
      )
      assert(viaBody.statusCode() == 400)
    }
  }
}
