package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import java.util.concurrent.Executors

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{
  HttpExchange,
  HttpServer,
  HttpsConfigurator,
  HttpsExchange,
  HttpsParameters,
  HttpsServer
}

import graft.log.OffsetOutOfRangeException

/** HTTP/JSON front end over [[LogService]] — the network layer the engine
  * deliberately kept out of scope until now, mirroring the reference's own
  * HTTP server (reference: internal/server/http.go:14-18 routes POST / →
  * produce, GET / → consume) plus the gRPC-only verbs as extra routes:
  *
  *   - `POST /`            produce: `{"record":{"value":"<base64>"}}` → `{"offset":N}`
  *   - `GET  /?offset=N`   consume (also accepts the reference's JSON-body
  *                         form) → `{"record":{...}}`; typed 404 past the end
  *   - `GET  /stat`        lowest/highest/segment count (CLI `stat` twin)
  *   - `GET  /stats`       per-route request counts + latency percentiles
  *                         (the OpenCensus server-views stand-in,
  *                         server.go:52-60)
  *   - `GET  /servers`     topology (R5 GetServers, server.go:180-190)
  *   - `GET  /tail?from=N` catch-up ConsumeStream as Server-Sent Events —
  *                         one `data:` event per record, then the stream
  *                         closes (the UNBOUNDED tail is the Structured
  *                         Streaming surface, `SparkLog.tail`; HTTP serves
  *                         the catch-up phase, server.go:138-158)
  *
  * Error mapping keeps the reference's quirks: malformed produce bodies are
  * 500 and malformed consume bodies 400 (http.go:33-37,55-59), offset past
  * the end is 404 with the typed message (server_test.go:177-210), denied
  * subjects are 403 carrying the exact Casbin deny message
  * (server_test.go:286-308).
  *
  * Authentication: with [[MtlsConfig]] the server REQUIRES a verified
  * client certificate and the subject IS the certificate's CN — the
  * reference's authenticate interceptor (reference: internal/server/
  * server.go:160-178, config/tls.go:36-40); a spoofed `X-Subject` header
  * cannot override it. Without TLS the caller-asserted `X-Subject` header
  * names the subject (defaulting to `root` like the CLI) — the plaintext
  * mode for already-authenticated perimeters. Bytes travel as base64, the
  * standard JSON mapping for proto `bytes` fields.
  */
class HttpLogServer(
    service: LogService,
    port: Int = 0,
    tls: Option[MtlsConfig] = None,
    /** Bind host — None binds the wildcard address; `Some("127.0.0.1")`
      * keeps the listener loopback-only (the serve-mux backend posture).
      */
    bindHost: Option[String] = None
) {
  private val mapper = new ObjectMapper()
  private val pool = Executors.newFixedThreadPool(4)
  private def bindAddr = bindHost.fold(new InetSocketAddress(port))(new InetSocketAddress(_, port))
  private val server = tls match {
    case None => HttpServer.create(bindAddr, 0)
    case Some(cfg) =>
      val s = HttpsServer.create(bindAddr, 0)
      val ctx = Mtls.sslContext(cfg)
      s.setHttpsConfigurator(new HttpsConfigurator(ctx) {
        override def configure(p: HttpsParameters): Unit = {
          // setSSLParameters is the variant the JDK server actually honors
          // for client auth — setNeedClientAuth alone is dropped once any
          // other parameter is set.
          val params = ctx.getDefaultSSLParameters
          params.setNeedClientAuth(true) // RequireAndVerifyClientCert (tls.go:38)
          p.setSSLParameters(params)
        }
      })
      s
  }
  server.setExecutor(pool)

  /** Bound port (useful when constructed with port 0 for tests). */
  def boundPort: Int = server.getAddress.getPort

  private def subjectOf(ex: HttpExchange): String = ex match {
    case https: HttpsExchange if tls.isDefined =>
      // The verified client certificate IS the identity; header spoofing
      // is inert once mTLS is on.
      Mtls
        .commonName(https.getSSLSession.getPeerPrincipal.getName)
        .getOrElse(throw PermissionDeniedException("unidentified", "connect"))
    case _ => Option(ex.getRequestHeaders.getFirst("X-Subject")).getOrElse("root")
  }

  private def respond(ex: HttpExchange, status: Int, body: String, cType: String = "application/json"): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", cType)
    ex.sendResponseHeaders(status, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes)
    finally os.close()
  }

  private def recordJson(rec: graft.log.LogRecord): JsonNode = {
    val node = mapper.createObjectNode()
    node.put("value", if (rec.value == null) null else Base64.getEncoder.encodeToString(rec.value))
    node.put("offset", rec.offset)
    node.put("term", rec.term)
    node.put("recordType", rec.recordType)
    node
  }

  /** Per-route latency histograms (request arrival → response close),
    * mirroring the gRPC server's per-RPC percentiles so both front ends
    * answer the same ops question. Keyed by the registered context path.
    */
  private val routeLatency =
    new java.util.concurrent.ConcurrentHashMap[String, LatencyHistogram]()

  /** Snapshot of per-route latency percentiles (also served at `/stats`). */
  def latencies: Map[String, LatencySnapshot] = {
    import scala.jdk.CollectionConverters._
    routeLatency.asScala.map { case (k, h) => k -> h.snapshot() }.toMap
  }

  /** One guarded handler: domain exceptions map to wire statuses here so
    * every route shares the 403/404 semantics, and every route — error
    * responses included — lands one latency sample.
    */
  private def handle(ex: HttpExchange)(f: => Unit): Unit = {
    val started = System.nanoTime()
    try f
    catch {
      case e: PermissionDeniedException => respond(ex, 403, e.getMessage, "text/plain")
      case e: OffsetOutOfRangeException => respond(ex, 404, e.getMessage, "text/plain")
      case e: Exception                 => respond(ex, 500, String.valueOf(e.getMessage), "text/plain")
    } finally {
      routeLatency
        .computeIfAbsent(ex.getHttpContext.getPath, _ => new LatencyHistogram)
        .record(System.nanoTime() - started)
      ex.close()
    }
  }

  server.createContext(
    "/",
    (ex: HttpExchange) =>
      handle(ex) {
        (ex.getRequestMethod, ex.getRequestURI.getPath) match {
          case ("POST", "/") =>
            // Reference quirk: a produce body that fails to decode is a
            // 500, not a 400 (http.go:33-37).
            val parsed =
              try {
                val body = mapper.readTree(ex.getRequestBody)
                Right(ProduceRequest(Base64.getDecoder.decode(body.path("record").path("value").asText())))
              } catch { case e: Exception => Left(String.valueOf(e.getMessage)) }
            parsed match {
              case Left(msg) => respond(ex, 500, msg, "text/plain")
              case Right(req) =>
                val ack = service.produce(subjectOf(ex), req)
                val node = mapper.createObjectNode()
                node.put("offset", ack.offset)
                respond(ex, 200, mapper.writeValueAsString(node))
            }
          case ("GET", "/") =>
            val parsed =
              try {
                val q = Option(ex.getRequestURI.getQuery).getOrElse("")
                val fromQuery = q.split("&").collectFirst {
                  case s if s.startsWith("offset=") => s.drop(7).toLong
                }
                Right(fromQuery.getOrElse(mapper.readTree(ex.getRequestBody).path("offset").asLong()))
              } catch { case e: Exception => Left(String.valueOf(e.getMessage)) }
            parsed match {
              case Left(msg) => respond(ex, 400, msg, "text/plain")
              case Right(offset) =>
                val res = service.consume(subjectOf(ex), ConsumeRequest(offset))
                val node = mapper.createObjectNode()
                node.set[JsonNode]("record", recordJson(res.record))
                respond(ex, 200, mapper.writeValueAsString(node))
            }
          case _ => respond(ex, 405, "method not allowed", "text/plain")
        }
      }
  )

  server.createContext(
    "/stat",
    (ex: HttpExchange) =>
      handle(ex) {
        val node = mapper.createObjectNode()
        node.put("lowest", service.log.lowestOffset)
        node.put("highest", service.log.highestOffset)
        node.put("segments", service.log.segmentCount)
        respond(ex, 200, mapper.writeValueAsString(node))
      }
  )

  server.createContext(
    "/stats",
    (ex: HttpExchange) =>
      handle(ex) {
        // Ops telemetry: per-route request counts + latency percentiles —
        // the HTTP twin of the gRPC server's OpenCensus-views stand-in.
        val node = mapper.createObjectNode()
        latencies.toSeq.sortBy(_._1).foreach { case (route, s) =>
          val r = mapper.createObjectNode()
          r.put("count", s.count)
          r.put("p50_ms", s.p50Millis)
          r.put("p95_ms", s.p95Millis)
          r.put("p99_ms", s.p99Millis)
          r.put("max_ms", s.maxMillis)
          node.set[JsonNode](route, r)
        }
        respond(ex, 200, mapper.writeValueAsString(node))
      }
  )

  server.createContext(
    "/servers",
    (ex: HttpExchange) =>
      handle(ex) {
        val arr = mapper.createArrayNode()
        service.getServers.foreach { s =>
          val n = mapper.createObjectNode()
          n.put("id", s.id); n.put("rpcAddr", s.rpcAddr); n.put("isLeader", s.isLeader)
          arr.add(n)
        }
        respond(ex, 200, mapper.writeValueAsString(arr))
      }
  )

  server.createContext(
    "/tail",
    (ex: HttpExchange) =>
      handle(ex) {
        val from = Option(ex.getRequestURI.getQuery)
          .getOrElse("")
          .split("&")
          .collectFirst { case s if s.startsWith("from=") => s.drop(5).toLong }
          .getOrElse(0L)
        // ACL check happens before headers go out so a deny is a clean 403.
        val records = service.consumeStream(subjectOf(ex), from)
        ex.getResponseHeaders.set("Content-Type", "text/event-stream")
        ex.sendResponseHeaders(200, 0) // chunked
        val os = ex.getResponseBody
        // Once the 200 went out, a mid-stream failure (Spark task error,
        // client disconnect) can only END the stream — letting it escape to
        // handle() would make respond() re-send headers on a committed
        // exchange and mask the original error with an IllegalStateException.
        try {
          records.foreach { rec =>
            os.write(s"data: ${mapper.writeValueAsString(recordJson(rec))}\n\n".getBytes(UTF_8))
            os.flush()
          }
        } catch { case _: Exception => () }
        finally os.close()
      }
  )

  def start(): HttpLogServer = { server.start(); this }

  def stop(): Unit = {
    server.stop(0)
    // The pool is non-daemon: without shutdown every construct/stop cycle
    // leaks 4 live threads and an embedder's main() never exits.
    pool.shutdown()
  }
}
