package graft.server.grpc

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream}

import org.sparkproject.connect.grpc.MethodDescriptor
import org.sparkproject.connect.grpc.MethodDescriptor.MethodType
import org.sparkproject.connect.protobuf.{CodedInputStream, CodedOutputStream}

import graft.server.ServerInfo

/** A hub's Join answer: the full post-join view plus the hub's liveness
  * TTL. Carrying the TTL makes heartbeat cadence a server-side contract —
  * a joiner beats at the HUB's TTL/3 rather than trusting its own `--ttl`
  * flag to match cluster-wide (asymmetric config would otherwise evict a
  * healthy member that never heartbeats, or heartbeats too slowly).
  * `ttlMillis = 0` means the hub runs announcement-only membership.
  */
final case class JoinView(servers: Seq[ServerInfo], ttlMillis: Long)

/** Wire codecs and descriptors for the membership-announcement service —
  * `graft.v1.Membership`, Join and Leave. Deliberately a SEPARATE gRPC
  * service: the reference's `log.v1.Log` has exactly five RPCs
  * (reference: api/v1/log.proto:14-20) and stays byte-compatible here;
  * membership in the reference travels out-of-band over Serf gossip
  * (reference: internal/discovery/membership.go:31-125), and this service
  * is its announcement-RPC stand-in.
  *
  * Messages reuse the reference's Server shape (api/v1/log.proto:41-45):
  *   JoinRequest   { Server member = 1 }
  *   JoinResponse  { repeated Server servers = 1; int64 ttl_millis = 2 }
  *   LeaveRequest  { string id = 1 }
  *   LeaveResponse { }
  */
private[grpc] object MembershipProto {

  private val Svc = "graft.v1.Membership"

  private def encode(f: CodedOutputStream => Unit): Array[Byte] = {
    val bos = new ByteArrayOutputStream(64)
    val out = CodedOutputStream.newInstance(bos)
    f(out)
    out.flush()
    bos.toByteArray
  }

  private def decode(bytes: Array[Byte])(f: (CodedInputStream, Int) => Boolean): Unit = {
    val in = CodedInputStream.newInstance(bytes)
    var tag = in.readTag()
    while (tag != 0) {
      if (!f(in, tag)) in.skipField(tag)
      tag = in.readTag()
    }
  }

  /** Server { string id=1; string rpc_addr=2; bool is_leader=3 } — the
    * same shape GetServers speaks (reference: api/v1/log.proto:41-45).
    */
  private def encodeServer(s: ServerInfo): Array[Byte] = encode { out =>
    if (s.id.nonEmpty) out.writeString(1, s.id)
    if (s.rpcAddr.nonEmpty) out.writeString(2, s.rpcAddr)
    if (s.isLeader) out.writeBool(3, true)
  }

  private def decodeServer(bytes: Array[Byte]): ServerInfo = {
    var id = ""
    var addr = ""
    var leader = false
    decode(bytes) { (in, tag) =>
      tag match {
        case 10 => id = in.readStringRequireUtf8(); true
        case 18 => addr = in.readStringRequireUtf8(); true
        case 24 => leader = in.readBool(); true
        case _  => false
      }
    }
    ServerInfo(id, addr, leader)
  }

  def encodeJoinRequest(m: ServerInfo): Array[Byte] = encode { out =>
    out.writeByteArray(1, encodeServer(m))
  }

  def decodeJoinRequest(bytes: Array[Byte]): ServerInfo = {
    var m = ServerInfo("", "", isLeader = false)
    decode(bytes) { (in, tag) =>
      if (tag == 10) { m = decodeServer(in.readBytes().toByteArray); true } else false
    }
    m
  }

  def encodeJoinResponse(view: JoinView): Array[Byte] = encode { out =>
    view.servers.foreach(s => out.writeByteArray(1, encodeServer(s)))
    if (view.ttlMillis != 0L) out.writeInt64(2, view.ttlMillis)
  }

  def decodeJoinResponse(bytes: Array[Byte]): JoinView = {
    val acc = Vector.newBuilder[ServerInfo]
    var ttl = 0L
    decode(bytes) { (in, tag) =>
      tag match {
        case 10 => acc += decodeServer(in.readBytes().toByteArray); true
        case 16 => ttl = in.readInt64(); true
        case _  => false
      }
    }
    JoinView(acc.result(), ttl)
  }

  def encodeLeaveRequest(id: String): Array[Byte] = encode { out =>
    if (id.nonEmpty) out.writeString(1, id)
  }

  def decodeLeaveRequest(bytes: Array[Byte]): String = {
    var id = ""
    decode(bytes) { (in, tag) =>
      if (tag == 10) { id = in.readStringRequireUtf8(); true } else false
    }
    id
  }

  private def marshaller[T](enc: T => Array[Byte], dec: Array[Byte] => T) =
    new MethodDescriptor.Marshaller[T] {
      override def stream(value: T): InputStream = new ByteArrayInputStream(enc(value))
      override def parse(stream: InputStream): T = dec(stream.readAllBytes())
    }

  private val joinReqM = marshaller(encodeJoinRequest, decodeJoinRequest)
  private val joinRespM = marshaller[JoinView](encodeJoinResponse, decodeJoinResponse)
  private val leaveReqM = marshaller(encodeLeaveRequest, decodeLeaveRequest)
  private val emptyM = marshaller[Unit](_ => Array.emptyByteArray, _ => ())

  /** rpc Join (JoinRequest) returns (JoinResponse) */
  val Join: MethodDescriptor[ServerInfo, JoinView] =
    MethodDescriptor
      .newBuilder(joinReqM, joinRespM)
      .setType(MethodType.UNARY)
      .setFullMethodName(MethodDescriptor.generateFullMethodName(Svc, "Join"))
      .build()

  /** rpc Leave (LeaveRequest) returns (LeaveResponse) */
  val Leave: MethodDescriptor[String, Unit] =
    MethodDescriptor
      .newBuilder(leaveReqM, emptyM)
      .setType(MethodType.UNARY)
      .setFullMethodName(MethodDescriptor.generateFullMethodName(Svc, "Leave"))
      .build()
}
