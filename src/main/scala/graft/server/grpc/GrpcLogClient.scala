package graft.server.grpc

import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import scala.jdk.CollectionConverters._

import org.sparkproject.connect.google_protos.rpc.{LocalizedMessage, Status => RpcStatus}
import org.sparkproject.connect.grpc._
import org.sparkproject.connect.grpc.protobuf.StatusProto
import org.sparkproject.connect.grpc.stub.{ClientCalls, StreamObserver}

import graft.log.LogRecord
import graft.server.{ConsumeRequest, MtlsConfig, Mtls, ServerInfo}

/** Client for the `log.v1.Log` wire protocol — what a proglog user points at
  * this server (or at the reference's; the bytes are the same). Used by the
  * e2e spec and the CLI's remote mode; backed by the same shaded gRPC
  * runtime as [[GrpcLogServer]].
  */
class GrpcLogClient(
    host: String,
    port: Int,
    tls: Option[MtlsConfig] = None,
    /** Authority override for TLS hostname verification when dialing an
      * address the server certificate doesn't name.
      */
    authority: Option[String] = None
) extends AutoCloseable {

  private val channel: ManagedChannel = {
    val creds = tls match {
      case Some(cfg) =>
        TlsChannelCredentials
          .newBuilder()
          .keyManager(Mtls.keyManagers(cfg): _*)
          .trustManager(Mtls.trustManagers(cfg): _*)
          .build()
      case None => InsecureChannelCredentials.create()
    }
    val b = Grpc.newChannelBuilderForAddress(host, port, creds)
    authority.foreach(b.overrideAuthority)
    b.build()
  }

  def produce(value: Array[Byte]): Long =
    ClientCalls
      .blockingUnaryCall(channel, LogProto.Produce, CallOptions.DEFAULT, LogRecord(value, 0L))
      .offset

  def consume(offset: Long): LogRecord =
    ClientCalls.blockingUnaryCall(
      channel,
      LogProto.Consume,
      CallOptions.DEFAULT,
      ConsumeRequest(offset)
    )

  /** Server-streaming tail from `offset`: catch-up then blocks for new
    * records — iterate as far as needed, then [[close]] to cancel.
    */
  def consumeStream(offset: Long): Iterator[LogRecord] =
    ClientCalls
      .blockingServerStreamingCall(
        channel,
        LogProto.ConsumeStream,
        CallOptions.DEFAULT,
        ConsumeRequest(offset)
      )
      .asScala

  /** Bidi produce: stream `values`, collect one ack per record (in order —
    * gRPC preserves message order per direction). Returns assigned offsets.
    */
  def produceStream(values: Seq[Array[Byte]], timeoutSec: Long = 30L): Seq[Long] = {
    val acks = new LinkedBlockingQueue[Either[Throwable, Long]]()
    val done = new java.util.concurrent.CountDownLatch(1)
    val reqObserver = ClientCalls.asyncBidiStreamingCall(
      channel.newCall(LogProto.ProduceStream, CallOptions.DEFAULT),
      new StreamObserver[graft.server.ProduceResponse] {
        override def onNext(ack: graft.server.ProduceResponse): Unit =
          acks.put(Right(ack.offset))
        override def onError(t: Throwable): Unit = { acks.put(Left(t)); done.countDown() }
        override def onCompleted(): Unit = done.countDown()
      }
    )
    values.foreach(v => reqObserver.onNext(LogRecord(v, 0L)))
    reqObserver.onCompleted()
    require(done.await(timeoutSec, TimeUnit.SECONDS), "produceStream timed out")
    val out = Vector.newBuilder[Long]
    var n = 0
    while (n < values.size && !acks.isEmpty) {
      acks.take() match {
        case Right(off) => out += off
        case Left(t)    => throw t
      }
      n += 1
    }
    val offsets = out.result()
    // A server that half-closes after acking fewer records than were sent
    // (error swallowed as onCompleted, early close) must be an explicit
    // failure — a silently short list would let callers zip offsets with
    // inputs and misattribute them.
    require(
      offsets.size == values.size,
      s"produceStream acked ${offsets.size} of ${values.size} records before the server closed the stream"
    )
    offsets
  }

  def getServers: Seq[ServerInfo] =
    ClientCalls.blockingUnaryCall(channel, LogProto.GetServers, CallOptions.DEFAULT, ())

  /** Announce a member to this server (`graft.v1.Membership/Join` — the
    * Serf-join stand-in); returns the server's full post-join view plus
    * the hub's liveness TTL (0 = announcement-only membership).
    */
  def join(member: ServerInfo): JoinView =
    ClientCalls.blockingUnaryCall(channel, MembershipProto.Join, CallOptions.DEFAULT, member)

  /** Announce a departure (`graft.v1.Membership/Leave`). */
  def leave(id: String): Unit =
    ClientCalls.blockingUnaryCall(channel, MembershipProto.Leave, CallOptions.DEFAULT, id)

  /** Standard `grpc.health.v1.Health/Check` — returns the ServingStatus
    * enum value (1 = SERVING). Empty name asks about the whole server.
    */
  def healthCheck(service: String = ""): Int =
    ClientCalls.blockingUnaryCall(channel, HealthProto.Check, CallOptions.DEFAULT, service)

  override def close(): Unit = {
    channel.shutdownNow()
    val _ = channel.awaitTermination(10, TimeUnit.SECONDS)
  }
}

object GrpcLogClient {

  /** Decode the reference's ErrOffsetOutOfRange contract from a failed call:
    * (status message, localized detail message, rpc.Status.code). The
    * LocalizedMessage travels in `grpc-status-details-bin` exactly as the
    * reference packs it (api/v1/error.go:17-24).
    */
  def offsetErrorDetails(t: Throwable): Option[(String, String, Int)] =
    Option(StatusProto.fromThrowable(t)).map { st: RpcStatus =>
      val localized = st.getDetailsList.asScala.collectFirst {
        case any if any.is(classOf[LocalizedMessage]) =>
          any.unpack(classOf[LocalizedMessage]).getMessage
      }
      (st.getMessage, localized.getOrElse(""), st.getCode)
    }
}
