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
  * which never crosses the driver. ConsumeStream holds one server thread
  * per subscriber (cached pool) — the same cost as the reference's
  * per-stream goroutine, acceptable for the ops tailing this serves.
  */
class GrpcLogServer(
    service: LogService,
    port: Int = 0,
    tls: Option[MtlsConfig] = None,
    /** Poll cadence for the blocking half of ConsumeStream. The reference
      * busy-spins on `continue`; a bounded sleep is the JVM-polite version.
      */
    pollMillis: Long = 2L,
    /** Subject assigned to connections carrying no verified peer identity —
      * "" by default, the reference's nil-AuthInfo branch (under the
      * root-only ACL that denies everything). The CLI's plaintext dev mode
      * sets its `--subject` here; mTLS connections always use the cert CN.
      */
    anonymousSubject: String = ""
) {

  import GrpcLogServer._

  private val streams = Executors.newCachedThreadPool()
  private var server: Server = _

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
              val ctx = Context.current()
              streams.execute { () =>
                var off = req.offset
                try {
                  // Authorize once up front so a denied subject fails fast
                  // (the reference authorizes inside each Consume — we also
                  // keep that, service.consume re-checks).
                  service.acl.authorize(sub, Action.Consume)
                  while (!ctx.isCancelled) {
                    try {
                      obs.onNext(service.consume(sub, ConsumeRequest(off)).record)
                      off += 1
                    } catch {
                      // Past the end: wait for the next produce — the
                      // blocking half (reference server.go:145-150 retries
                      // on ErrOffsetOutOfRange).
                      case _: OffsetOutOfRangeException => Thread.sleep(pollMillis)
                    }
                  }
                } catch {
                  case _: InterruptedException => ()
                  case scala.util.control.NonFatal(e) =>
                    try obs.onError(toStatusException(e))
                    catch { case _: Exception => () }
                }
              }
            }
          }
        )
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
    server = org.sparkproject.connect.grpc.netty.NettyServerBuilder
      .forPort(port, creds)
      .addService(serviceDefinition)
      .intercept(new AuthInterceptor(anonymousSubject))
      .build()
      .start()
    this
  }

  def boundPort: Int = server.getPort

  def stop(): Unit = {
    if (server != null) {
      server.shutdownNow()
      server.awaitTermination(10, TimeUnit.SECONDS)
    }
    streams.shutdownNow()
    val _ = streams.awaitTermination(10, TimeUnit.SECONDS)
  }
}

object GrpcLogServer {

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
