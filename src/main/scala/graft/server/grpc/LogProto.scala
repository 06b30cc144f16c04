package graft.server.grpc

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream}

import org.sparkproject.connect.grpc.MethodDescriptor
import org.sparkproject.connect.grpc.MethodDescriptor.MethodType
import org.sparkproject.connect.protobuf.{CodedInputStream, CodedOutputStream}

import graft.log.LogRecord
import graft.server.{ConsumeRequest, ProduceResponse, ServerInfo}

/** Wire-exact protobuf codecs and gRPC method descriptors for the
  * reference's service contract (reference: api/v1/log.proto:14-20, messages
  * :7-48) — `log.v1.Log` with its five RPCs, byte-compatible with any
  * proglog client or server.
  *
  * Why hand-rolled: no protoc in this environment, and the full protobuf
  * runtime Spark ships is the SHADED copy inside spark-connect
  * (`org.sparkproject.connect.protobuf`), so generated stubs wouldn't link
  * anyway. The messages are five flat shapes with nine fields between them —
  * `CodedInput/OutputStream` against the proto3 wire rules (defaults
  * omitted, unknown fields skipped) is smaller than a codegen pass and
  * testable down to the byte.
  */
private[grpc] object LogProto {

  private val Svc = "log.v1.Log"

  // ------------------------------------------------------------ primitives

  /** Encode via a fresh CodedOutputStream; messages here are request-sized
    * (one record or a server list), never data-plane batches.
    */
  private def encode(f: CodedOutputStream => Unit): Array[Byte] = {
    val bos = new ByteArrayOutputStream(64)
    val out = CodedOutputStream.newInstance(bos)
    f(out)
    out.flush()
    bos.toByteArray
  }

  /** proto3 decode loop: dispatch known tags, skip the rest. */
  private def decode(bytes: Array[Byte])(f: (CodedInputStream, Int) => Boolean): Unit = {
    val in = CodedInputStream.newInstance(bytes)
    var tag = in.readTag()
    while (tag != 0) {
      if (!f(in, tag)) in.skipField(tag)
      tag = in.readTag()
    }
  }

  // -------------------------------------------------------------- messages

  /** Record { bytes value=1; uint64 offset=2; uint64 term=3; uint32 type=4 }
    * (reference: api/v1/log.proto:7-12). proto3 cannot carry null bytes —
    * a null payload travels as the default (empty), same as Go's nil slice.
    */
  def encodeRecord(r: LogRecord): Array[Byte] = encode { out =>
    if (r.value != null && r.value.nonEmpty) out.writeByteArray(1, r.value)
    if (r.offset != 0L) out.writeUInt64(2, r.offset)
    if (r.term != 0L) out.writeUInt64(3, r.term)
    if (r.recordType != 0) out.writeUInt32(4, r.recordType)
  }

  def decodeRecord(bytes: Array[Byte]): LogRecord = {
    var value: Array[Byte] = Array.emptyByteArray
    var offset = 0L
    var term = 0L
    var rtype = 0
    decode(bytes) { (in, tag) =>
      tag match {
        case 10 => value = in.readBytes().toByteArray; true // 1<<3|LEN
        case 16 => offset = in.readUInt64(); true           // 2<<3|VARINT
        case 24 => term = in.readUInt64(); true             // 3<<3|VARINT
        case 32 => rtype = in.readUInt32(); true            // 4<<3|VARINT
        case _  => false
      }
    }
    LogRecord(value, offset, term, rtype)
  }

  /** ProduceRequest { Record record = 1 } (reference: api/v1/log.proto:22-24).
    * Carried as the full wire Record: a reference client may stamp term/type
    * and the server must parse (then re-assign offset), exactly like
    * `CommitLog.Append(*api.Record)`.
    */
  def encodeProduceRequest(r: LogRecord): Array[Byte] = encode { out =>
    val rec = encodeRecord(r)
    if (rec.nonEmpty || r.value != null) out.writeByteArray(1, rec)
  }

  def decodeProduceRequest(bytes: Array[Byte]): LogRecord = {
    var rec = LogRecord(Array.emptyByteArray, 0L)
    decode(bytes) { (in, tag) =>
      if (tag == 10) { rec = decodeRecord(in.readBytes().toByteArray); true } else false
    }
    rec
  }

  /** ProduceResponse { uint64 offset = 1 } (reference: api/v1/log.proto:26-28). */
  def encodeProduceResponse(r: ProduceResponse): Array[Byte] = encode { out =>
    if (r.offset != 0L) out.writeUInt64(1, r.offset)
  }

  def decodeProduceResponse(bytes: Array[Byte]): ProduceResponse = {
    var off = 0L
    decode(bytes) { (in, tag) =>
      if (tag == 8) { off = in.readUInt64(); true } else false
    }
    ProduceResponse(off)
  }

  /** ConsumeRequest { uint64 offset = 1 } (reference: api/v1/log.proto:30-32). */
  def encodeConsumeRequest(r: ConsumeRequest): Array[Byte] = encode { out =>
    if (r.offset != 0L) out.writeUInt64(1, r.offset)
  }

  def decodeConsumeRequest(bytes: Array[Byte]): ConsumeRequest = {
    var off = 0L
    decode(bytes) { (in, tag) =>
      if (tag == 8) { off = in.readUInt64(); true } else false
    }
    ConsumeRequest(off)
  }

  /** ConsumeResponse { Record record = 2 } — field number TWO, a quirk
    * inherited verbatim from the reference (api/v1/log.proto:34-36).
    */
  def encodeConsumeResponse(r: LogRecord): Array[Byte] = encode { out =>
    out.writeByteArray(2, encodeRecord(r))
  }

  def decodeConsumeResponse(bytes: Array[Byte]): LogRecord = {
    var rec = LogRecord(Array.emptyByteArray, 0L)
    decode(bytes) { (in, tag) =>
      if (tag == 18) { rec = decodeRecord(in.readBytes().toByteArray); true } else false
    }
    rec
  }

  /** Server { string id=1; string rpc_addr=2; bool is_leader=3 } and
    * GetServersResponse { repeated Server servers = 1 }
    * (reference: api/v1/log.proto:38-48).
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

  def encodeGetServersRequest(): Array[Byte] = Array.emptyByteArray

  def encodeGetServersResponse(servers: Seq[ServerInfo]): Array[Byte] = encode { out =>
    servers.foreach(s => out.writeByteArray(1, encodeServer(s)))
  }

  def decodeGetServersResponse(bytes: Array[Byte]): Seq[ServerInfo] = {
    val acc = Vector.newBuilder[ServerInfo]
    decode(bytes) { (in, tag) =>
      if (tag == 10) { acc += decodeServer(in.readBytes().toByteArray); true } else false
    }
    acc.result()
  }

  // ----------------------------------------------------------- descriptors

  private def marshaller[T](enc: T => Array[Byte], dec: Array[Byte] => T) =
    new MethodDescriptor.Marshaller[T] {
      override def stream(value: T): InputStream = new ByteArrayInputStream(enc(value))
      override def parse(stream: InputStream): T = dec(stream.readAllBytes())
    }

  private val produceReqM = marshaller(encodeProduceRequest, decodeProduceRequest)
  private val produceRespM = marshaller(encodeProduceResponse, decodeProduceResponse)
  private val consumeReqM = marshaller(encodeConsumeRequest, decodeConsumeRequest)
  private val consumeRespM = marshaller(encodeConsumeResponse, decodeConsumeResponse)
  private val serversReqM =
    marshaller[Unit](_ => encodeGetServersRequest(), _ => ())
  private val serversRespM =
    marshaller[Seq[ServerInfo]](encodeGetServersResponse, decodeGetServersResponse)

  /** rpc Produce (ProduceRequest) returns (ProduceResponse) */
  val Produce: MethodDescriptor[LogRecord, ProduceResponse] =
    MethodDescriptor
      .newBuilder(produceReqM, produceRespM)
      .setType(MethodType.UNARY)
      .setFullMethodName(MethodDescriptor.generateFullMethodName(Svc, "Produce"))
      .build()

  /** rpc Consume (ConsumeRequest) returns (ConsumeResponse) */
  val Consume: MethodDescriptor[ConsumeRequest, LogRecord] =
    MethodDescriptor
      .newBuilder(consumeReqM, consumeRespM)
      .setType(MethodType.UNARY)
      .setFullMethodName(MethodDescriptor.generateFullMethodName(Svc, "Consume"))
      .build()

  /** rpc ConsumeStream (ConsumeRequest) returns (stream ConsumeResponse) */
  val ConsumeStream: MethodDescriptor[ConsumeRequest, LogRecord] =
    MethodDescriptor
      .newBuilder(consumeReqM, consumeRespM)
      .setType(MethodType.SERVER_STREAMING)
      .setFullMethodName(MethodDescriptor.generateFullMethodName(Svc, "ConsumeStream"))
      .build()

  /** rpc ProduceStream (stream ProduceRequest) returns (stream ProduceResponse) */
  val ProduceStream: MethodDescriptor[LogRecord, ProduceResponse] =
    MethodDescriptor
      .newBuilder(produceReqM, produceRespM)
      .setType(MethodType.BIDI_STREAMING)
      .setFullMethodName(MethodDescriptor.generateFullMethodName(Svc, "ProduceStream"))
      .build()

  /** rpc GetServers (GetServersRequest) returns (GetServersResponse) */
  val GetServers: MethodDescriptor[Unit, Seq[ServerInfo]] =
    MethodDescriptor
      .newBuilder(serversReqM, serversRespM)
      .setType(MethodType.UNARY)
      .setFullMethodName(MethodDescriptor.generateFullMethodName(Svc, "GetServers"))
      .build()
}
