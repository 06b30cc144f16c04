package graft.server.grpc

import java.util.concurrent.{Executors, TimeUnit}

import org.sparkproject.connect.google_protos.rpc.{LocalizedMessage, Status => RpcStatus}
import org.sparkproject.connect.grpc._
import org.sparkproject.connect.grpc.protobuf.StatusProto
import org.sparkproject.connect.grpc.stub.{ServerCalls, StreamObserver}
import org.sparkproject.connect.protobuf.Any

import graft.log.{LogRecord, OffsetOutOfRangeException}
import graft.server.{Action, ConsumeRequest, LogService, Mtls, MtlsConfig, PermissionDeniedException, ProduceRequest, ProduceResponse}

/** The reference's actual client surface — `log.v1.Log` over gRPC
  * (reference: internal/server/server.go:48-86 NewGRPCServer,
  * api/v1/log.proto:14-20) — served from the shaded gRPC runtime Spark
  * ships inside spark-connect (no new dependency; the library already
  * rides those jars).
  *
  *   - 5 RPCs: unary Produce/Consume/GetServers, bidi ProduceStream
  *     (per-record acks), server-streaming ConsumeStream (catch-up then
  *     blocking tail, out-of-range retried exactly like the reference's
  *     `continue` loop, server.go:138-158).
  *   - mTLS: `RequireAndVerifyClientCert`; the ACL subject is the verified
  *     client certificate's CN, resolved by an interceptor into the call
  *     Context (reference: server.go:160-178). Plaintext mode (no TLS)
  *     authenticates as "" like the reference's nil-AuthInfo branch.
  *   - Errors: PermissionDenied(7) with the exact Casbin message shape;
  *     reads past the end surface the reference's ErrOffsetOutOfRange
  *     contract (reference: api/v1/error.go:10-30): message
  *     "offset out of range: N" plus a `google.rpc.LocalizedMessage`
  *     detail in `grpc-status-details-bin`. One deviation, documented: the
  *     reference stamps the NON-canonical status code 404 on the wire —
  *     grpc-java refuses to emit codes outside the canonical space, so the
  *     status code is NOT_FOUND(5) and the literal 404 travels in the
  *     detail payload's `code` field.
  *
  * Scale posture: this is a control/ops surface (single-record produce and
  * consume, topology); bulk data movement belongs to the DSv2 source/sink
  * which never crosses the driver. ConsumeStream is EVENT-DRIVEN: a
  * caught-up tail parks as a passive waiter (no thread, no poll loop) and
  * is re-armed by the log's commit hook, so any number of idle tails cost
  * zero threads — unlike the reference's per-stream goroutine poll
  * (server.go:147-150), which is cheap for goroutines but would be ~1 MiB
  * of stack per idle JVM thread. Active drains share a small fixed worker
  * pool; a long catch-up holds one worker until it reaches the tail.
  */
class GrpcLogServer(
    service: LogService,
    port: Int = 0,
    tls: Option[MtlsConfig] = None,
    /** Fallback re-arm cadence for parked tails — a safety net behind the
      * commit-hook wake-up (e.g. for appends that bypass this process's
      * SparkLog handle after a reopen). Not a per-record poll: parked
      * streams wake instantly via the commit hook.
      */
    pollMillis: Long = 250L,
    /** Subject assigned to connections carrying no verified peer identity —
      * "" by default, the reference's nil-AuthInfo branch (under the
      * root-only ACL that denies everything). The CLI's plaintext dev mode
      * sets its `--subject` here; mTLS connections always use the cert CN.
      */
    anonymousSubject: String = "",
    /** Bind host — None binds the wildcard address; `Some("127.0.0.1")`
      * keeps the listener loopback-only (the serve-mux backend posture).
      */
    bindHost: Option[String] = None
) {

  import GrpcLogServer._

  /** Fixed drain pool shared by ALL ConsumeStreams — the thread bound is
    * this constant, independent of how many tails are open or parked.
    */
  private val workers =
    Executors.newFixedThreadPool(TailWorkers, namedThreads("graft-tail-worker"))
  private val fallbackTimer =
    Executors.newSingleThreadScheduledExecutor(namedThreads("graft-tail-fallback"))

  /** Tails parked at the end of the log, waiting for the next commit. */
  private val waiters =
    java.util.concurrent.ConcurrentHashMap.newKeySet[TailStream]()
  private var commitHook: AutoCloseable = _
  private var server: Server = _

  private def wakeWaiters(): Unit = {
    val it = waiters.iterator()
    while (it.hasNext) {
      val w = it.next()
      it.remove()
      w.wake()
    }
  }

  /** One ConsumeStream's state machine. `wake()` is the only entry point:
    * the token counter guarantees at most one drain pass runs at a time
    * (only the 0→1 transition schedules; the pass keeps running while
    * tokens remain), so `off` needs no lock. A pass drains records until
    * the stream is cancelled, the transport is flow-control blocked
    * (re-armed by onReady), or the log is exhausted (parked in [[waiters]],
    * re-armed by the commit hook / fallback timer).
    */
  private final class TailStream(
      sub: String,
      obs: StreamObserver[LogRecord],
      ctx: Context,
      startOffset: Long
  ) {
    private var off = startOffset
    private val wakes = new java.util.concurrent.atomic.AtomicInteger(0)
    private val flowControlled = obs match {
      case s: org.sparkproject.connect.grpc.stub.ServerCallStreamObserver[LogRecord @unchecked] =>
        s.setOnReadyHandler(() => wake())
        Some(s)
      case _ => None
    }

    def wake(): Unit =
      if (wakes.getAndIncrement() == 0) workers.execute(() => run())

    private def run(): Unit = {
      var again = true
      while (again) {
        wakes.set(1) // collapse tokens queued since scheduling into this pass
        drain()
        again = wakes.decrementAndGet() != 0
      }
    }

    private def drain(): Unit =
      try {
        while (!ctx.isCancelled) {
          if (flowControlled.exists(s => !s.isReady)) return // onReady re-arms
          try {
            obs.onNext(service.consume(sub, ConsumeRequest(off)).record)
            off += 1
          } catch {
            case _: OffsetOutOfRangeException =>
              // Park FIRST, then re-check: a commit landing between the
              // failed read and registration would otherwise be a lost
              // wake-up. The re-check probes "is `off` readable NOW"
              // (segmentFor, not highestOffset — which is 0 even on an
              // empty log and would self-wake into a spin); a truncated-
              // away offset stays parked and re-fails only per commit.
              waiters.add(this)
              if (service.log.currentManifest.segmentFor(off).isDefined) wake()
              return
          }
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          try obs.onError(toStatusException(e))
          catch { case _: Exception => () }
      }
  }

  // ---------------------------------------------------------------- errors

  private def toStatusException(e: Throwable): StatusRuntimeException = e match {
    case o: OffsetOutOfRangeException =>
      // The reference's ErrOffsetOutOfRange detail contract
      // (reference: api/v1/error.go:14-25).
      val detail = LocalizedMessage
        .newBuilder()
        .setLocale("en-US")
        .setMessage(s"The requested offset is outside the log's range: ${o.offset}")
        .build()
      StatusProto.toStatusRuntimeException(
        RpcStatus
          .newBuilder()
          .setCode(io404CanonicalCode)
          .setMessage(o.getMessage)
          .addDetails(Any.pack(detail))
          .build()
      )
    case p: PermissionDeniedException =>
      Status.PERMISSION_DENIED.withDescription(p.getMessage).asRuntimeException()
    case already: StatusRuntimeException => already
    case other =>
      Status.INTERNAL.withDescription(String.valueOf(other.getMessage)).asRuntimeException()
  }

  private def unary[Req, Resp](f: Req => Resp): ServerCalls.UnaryMethod[Req, Resp] =
    new ServerCalls.UnaryMethod[Req, Resp] {
      override def invoke(req: Req, obs: StreamObserver[Resp]): Unit =
        try {
          obs.onNext(f(req))
          obs.onCompleted()
        } catch { case scala.util.control.NonFatal(e) => obs.onError(toStatusException(e)) }
    }

  // --------------------------------------------------------------- service

  private def serviceDefinition: ServerServiceDefinition = {
    val subject = () => SubjectKey.get()

    ServerServiceDefinition
      .builder("log.v1.Log")
      .addMethod(
        LogProto.Produce,
        ServerCalls.asyncUnaryCall(unary { (rec: LogRecord) =>
          service.produce(subject(), ProduceRequest(rec.value))
        })
      )
      .addMethod(
        LogProto.Consume,
        ServerCalls.asyncUnaryCall(unary { (req: ConsumeRequest) =>
          service.consume(subject(), req).record
        })
      )
      .addMethod(
        LogProto.GetServers,
        ServerCalls.asyncUnaryCall(unary { (_: Unit) =>
          // GetServers is unauthenticated in the reference too
          // (server.go:180-190 has no Authorize call).
          service.getServers
        })
      )
      .addMethod(
        LogProto.ProduceStream,
        ServerCalls.asyncBidiStreamingCall(
          new ServerCalls.BidiStreamingMethod[LogRecord, ProduceResponse] {
            override def invoke(
                acks: StreamObserver[ProduceResponse]
            ): StreamObserver[LogRecord] = {
              val sub = subject()
              new StreamObserver[LogRecord] {
                // Per-record produce + ack, the reference's loop verbatim
                // (server.go:122-136): each Recv → Produce → Send.
                override def onNext(rec: LogRecord): Unit =
                  try acks.onNext(service.produce(sub, ProduceRequest(rec.value)))
                  catch {
                    case scala.util.control.NonFatal(e) => acks.onError(toStatusException(e))
                  }
                override def onError(t: Throwable): Unit = () // client went away
                override def onCompleted(): Unit = acks.onCompleted()
              }
            }
          }
        )
      )
      .addMethod(
        LogProto.ConsumeStream,
        ServerCalls.asyncServerStreamingCall(
          new ServerCalls.ServerStreamingMethod[ConsumeRequest, LogRecord] {
            override def invoke(req: ConsumeRequest, obs: StreamObserver[LogRecord]): Unit = {
              val sub = subject()
              // Authorize once up front so a denied subject fails fast
              // (the reference authorizes inside each Consume — we also
              // keep that, service.consume re-checks).
              try service.acl.authorize(sub, Action.Consume)
              catch {
                case scala.util.control.NonFatal(e) =>
                  obs.onError(toStatusException(e))
                  return
              }
              // Event-driven tail (replaces the reference's per-stream
              // retry loop, server.go:138-158): the first wake starts the
              // catch-up; afterwards the stream lives in [[waiters]] /
              // the flow-control handler, holding no thread while idle.
              new TailStream(sub, obs, Context.current(), req.offset).wake()
            }
          }
        )
      )
      .build()
  }

  /** Per-RPC call/error counters, keyed by full method name — the
    * lightweight stand-in for the reference's OpenCensus stats views
    * (reference: internal/server/server.go:66-76). Snapshot via [[stats]];
    * the CLI prints them on shutdown.
    */
  private val rpcCalls = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private val rpcErrors = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private val rpcLatency = new java.util.concurrent.ConcurrentHashMap[String, graft.server.LatencyHistogram]()
  // Always-sample span ring (the trace.AlwaysSample() half of the
  // reference's telemetry setup, server.go:52-58): every call records one
  // completed span — id, method, start, duration, status. Bounded ring so
  // an arbitrarily long-lived server holds constant memory; a production
  // deployment exports these instead of retaining them.
  private val traceRing = new java.util.concurrent.atomic.AtomicReferenceArray[GrpcLogServer.Span](GrpcLogServer.TraceRingSize)
  private val traceSeq = new java.util.concurrent.atomic.AtomicLong()
  @volatile private var serving = false

  private def bump(
      m: java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong],
      key: String
  ): Unit =
    m.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()

  /** (calls, errors) per full RPC method name, for everything served since
    * start. Error = the call closed with a non-OK status (including the
    * typed 404s — they are wire-level errors exactly as in the reference).
    */
  def stats: Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    (rpcCalls.keySet.asScala ++ rpcErrors.keySet.asScala).map { k =>
      k -> (Option(rpcCalls.get(k)).map(_.get).getOrElse(0L),
      Option(rpcErrors.get(k)).map(_.get).getOrElse(0L))
    }.toMap
  }

  /** Per-RPC latency percentiles (arrival → close, so streaming RPCs count
    * their full stream lifetime — the same span OpenCensus's ServerLatency
    * view measures). Snapshot semantics: see [[graft.server.LatencyHistogram]].
    */
  def latencies: Map[String, graft.server.LatencySnapshot] = {
    import scala.jdk.CollectionConverters._
    rpcLatency.asScala.map { case (k, h) => k -> h.snapshot() }.toMap
  }

  /** The most recent completed spans, oldest → newest (bounded by the ring
    * size). Every RPC is sampled — the reference configures
    * `trace.AlwaysSample()` (server.go:52-58); the ring is the in-process
    * stand-in for its exporter.
    */
  def recentTraces: Seq[GrpcLogServer.Span] = {
    val upto = traceSeq.get()
    val from = math.max(0L, upto - GrpcLogServer.TraceRingSize)
    (from until upto).flatMap { i =>
      Option(traceRing.get((i % GrpcLogServer.TraceRingSize).toInt))
        // A slot may have been lapped between reading `upto` and the slot;
        // keep only spans whose id matches the window we advertised.
        .filter(s => s.traceId >= from && s.traceId < upto)
    }
  }

  /** Counting interceptor: one call bump at arrival, one error bump when
    * the call closes non-OK, one latency sample (arrival → close) always.
    */
  private final class MetricsInterceptor extends ServerInterceptor {
    override def interceptCall[ReqT, RespT](
        call: ServerCall[ReqT, RespT],
        headers: Metadata,
        next: ServerCallHandler[ReqT, RespT]
    ): ServerCall.Listener[ReqT] = {
      val name = call.getMethodDescriptor.getFullMethodName
      bump(rpcCalls, name)
      val started = System.nanoTime()
      val startedWall = System.currentTimeMillis()
      val counted = new ForwardingServerCall.SimpleForwardingServerCall[ReqT, RespT](call) {
        override def close(status: Status, trailers: Metadata): Unit = {
          if (!status.isOk) bump(rpcErrors, name)
          val elapsed = System.nanoTime() - started
          rpcLatency
            .computeIfAbsent(name, _ => new graft.server.LatencyHistogram)
            .record(elapsed)
          // Always-sample span: claim the next ring slot and publish.
          val id = traceSeq.getAndIncrement()
          traceRing.set(
            (id % GrpcLogServer.TraceRingSize).toInt,
            GrpcLogServer.Span(id, name, startedWall, elapsed, status.isOk)
          )
          super.close(status, trailers)
        }
      }
      next.startCall(counted, headers)
    }
  }

  /** `grpc.health.v1.Health/Check` — the standard health surface the
    * reference registers (server.go:60-64). The empty service name (the
    * whole server) and both served services report SERVING while the
    * server runs, NOT_SERVING during shutdown; unknown service names get
    * the contract's NOT_FOUND.
    */
  private def healthDefinition: ServerServiceDefinition =
    ServerServiceDefinition
      .builder("grpc.health.v1.Health")
      .addMethod(
        HealthProto.Check,
        ServerCalls.asyncUnaryCall(unary { (svc: String) =>
          if (svc.nonEmpty && svc != "log.v1.Log" && svc != "graft.v1.Membership")
            throw Status.NOT_FOUND
              .withDescription(s"unknown service: $svc")
              .asRuntimeException()
          if (serving) HealthProto.StatusServing else HealthProto.StatusNotServing
        })
      )
      .build()

  /** `graft.v1.Membership` — the Serf-gossip stand-in (see
    * [[MembershipProto]]): members announce themselves and depart through
    * these two RPCs, and `log.v1.Log/GetServers` reflects the churn.
    */
  private def membershipDefinition: ServerServiceDefinition = {
    val subject = () => SubjectKey.get()
    ServerServiceDefinition
      .builder("graft.v1.Membership")
      .addMethod(
        MembershipProto.Join,
        ServerCalls.asyncUnaryCall(unary { (m: graft.server.ServerInfo) =>
          // The response advertises THIS hub's TTL so the joiner can derive
          // its heartbeat cadence from the evictor's clock, not its own flag.
          JoinView(service.join(subject(), m), service.memberTtlMillis)
        })
      )
      .addMethod(
        MembershipProto.Leave,
        ServerCalls.asyncUnaryCall(unary { (id: String) =>
          service.leave(subject(), id)
        })
      )
      .build()
  }

  // ---------------------------------------------------------------- server

  def start(): GrpcLogServer = {
    val creds = tls match {
      case Some(cfg) =>
        TlsServerCredentials
          .newBuilder()
          .keyManager(Mtls.keyManagers(cfg): _*)
          .trustManager(Mtls.trustManagers(cfg): _*)
          .clientAuth(TlsServerCredentials.ClientAuth.REQUIRE)
          .build()
      case None => InsecureServerCredentials.create()
    }
    // Concrete NettyServerBuilder rather than Grpc.newServerBuilderForPort:
    // the latter returns the Java wildcard ServerBuilder<?>, whose
    // self-bounded fluent chain Scala cannot type.
    server = bindHost
      .fold(
        org.sparkproject.connect.grpc.netty.NettyServerBuilder.forPort(port, creds)
      )(h =>
        org.sparkproject.connect.grpc.netty.NettyServerBuilder
          .forAddress(new java.net.InetSocketAddress(h, port), creds)
      )
      .addService(serviceDefinition)
      .addService(membershipDefinition)
      .addService(healthDefinition)
      // Interceptor order: metrics OUTSIDE auth, so denied calls still
      // count (they do in the reference's stats handler too).
      .intercept(new AuthInterceptor(anonymousSubject))
      .intercept(new MetricsInterceptor)
      .build()
      .start()
    serving = true
    commitHook = service.log.onCommit(() => wakeWaiters())
    // Safety net: re-arm parked tails on a coarse cadence in case data
    // lands through a path the hook doesn't see.
    fallbackTimer.scheduleWithFixedDelay(
      () => wakeWaiters(),
      pollMillis,
      pollMillis,
      TimeUnit.MILLISECONDS
    )
    this
  }

  def boundPort: Int = server.getPort

  def stop(): Unit = {
    serving = false
    if (commitHook != null) commitHook.close()
    if (server != null) {
      server.shutdownNow()
      server.awaitTermination(10, TimeUnit.SECONDS)
    }
    fallbackTimer.shutdownNow()
    workers.shutdownNow()
    val _ = workers.awaitTermination(10, TimeUnit.SECONDS)
  }
}

object GrpcLogServer {

  /** One completed RPC span (the always-sample trace record). */
  final case class Span(
      traceId: Long,
      method: String,
      startEpochMillis: Long,
      durationNanos: Long,
      ok: Boolean
  )

  /** Span ring capacity — recent-history window for the ops surface. */
  private[grpc] val TraceRingSize: Int = 256

  /** Size of the shared ConsumeStream drain pool — the server's tail
    * thread bound regardless of open-stream count.
    */
  private[grpc] val TailWorkers: Int = 8

  private def namedThreads(prefix: String): java.util.concurrent.ThreadFactory =
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"$prefix-${n.getAndIncrement()}")
        t.setDaemon(true)
        t
      }
    }

  /** The reference wires literal 404 as the gRPC status code
    * (api/v1/error.go:15 `status.New(404, …)`), which is outside gRPC's
    * canonical code space; grpc-java cannot emit it, so the wire code is
    * NOT_FOUND(5) and the 404 rides in the rpc.Status detail `code`.
    */
  private[grpc] val io404CanonicalCode: Int = Status.Code.NOT_FOUND.value()

  /** Authenticated subject for the current call — "" when the transport
    * carries no verified peer identity (plaintext), mirroring the
    * reference's nil-AuthInfo branch (server.go:166-169).
    */
  private[grpc] val SubjectKey: Context.Key[String] = Context.keyWithDefault("graft-subject", "")

  /** CN-from-verified-client-cert authentication, as a context-seeding
    * interceptor (the grpc-java shape of reference server.go:160-178's
    * grpc_auth interceptor). The TLS layer already REQUIREd and verified
    * the certificate; here we only read the identity it proved.
    */
  private final class AuthInterceptor(anonymousSubject: String) extends ServerInterceptor {
    override def interceptCall[ReqT, RespT](
        call: ServerCall[ReqT, RespT],
        headers: Metadata,
        next: ServerCallHandler[ReqT, RespT]
    ): ServerCall.Listener[ReqT] = {
      val subject =
        Option(call.getAttributes.get(Grpc.TRANSPORT_ATTR_SSL_SESSION))
          .flatMap { session =>
            try Mtls.commonName(session.getPeerPrincipal.getName)
            catch { case _: Exception => None }
          }
          .getOrElse(anonymousSubject)
      val ctx = Context.current().withValue(SubjectKey, subject)
      Contexts.interceptCall(ctx, call, headers, next)
    }
  }
}
