package graft.server.grpc

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream}

import org.sparkproject.connect.grpc.MethodDescriptor
import org.sparkproject.connect.grpc.MethodDescriptor.MethodType
import org.sparkproject.connect.protobuf.{CodedInputStream, CodedOutputStream}

/** Wire codecs and descriptor for the STANDARD `grpc.health.v1.Health`
  * service's Check method — what the reference registers on its server so
  * load balancers and probes can ask for liveness
  * (reference: internal/server/server.go:60-64,
  * `health.NewServer()` + `healthpb.RegisterHealthServer`). Same
  * hand-rolled-proto3 rationale as [[LogProto]]; the message shapes are
  * the published grpc-health-v1 contract:
  *
  *   HealthCheckRequest  { string service = 1 }
  *   HealthCheckResponse { ServingStatus status = 1 }   // SERVING = 1
  */
private[grpc] object HealthProto {

  val StatusUnknown = 0
  val StatusServing = 1
  val StatusNotServing = 2

  private def encode(f: CodedOutputStream => Unit): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16)
    val out = CodedOutputStream.newInstance(bos)
    f(out)
    out.flush()
    bos.toByteArray
  }

  def encodeCheckRequest(service: String): Array[Byte] = encode { out =>
    if (service.nonEmpty) out.writeString(1, service)
  }

  def decodeCheckRequest(bytes: Array[Byte]): String = {
    var service = ""
    val in = CodedInputStream.newInstance(bytes)
    var tag = in.readTag()
    while (tag != 0) {
      if (tag == 10) service = in.readStringRequireUtf8() else in.skipField(tag)
      tag = in.readTag()
    }
    service
  }

  def encodeCheckResponse(status: Int): Array[Byte] = encode { out =>
    if (status != 0) out.writeEnum(1, status)
  }

  def decodeCheckResponse(bytes: Array[Byte]): Int = {
    var status = 0
    val in = CodedInputStream.newInstance(bytes)
    var tag = in.readTag()
    while (tag != 0) {
      if (tag == 8) status = in.readEnum() else in.skipField(tag)
      tag = in.readTag()
    }
    status
  }

  private def marshaller[T](enc: T => Array[Byte], dec: Array[Byte] => T) =
    new MethodDescriptor.Marshaller[T] {
      override def stream(value: T): InputStream = new ByteArrayInputStream(enc(value))
      override def parse(stream: InputStream): T = dec(stream.readAllBytes())
    }

  /** rpc Check (HealthCheckRequest) returns (HealthCheckResponse) */
  val Check: MethodDescriptor[String, Int] =
    MethodDescriptor
      .newBuilder(
        marshaller(encodeCheckRequest, decodeCheckRequest),
        marshaller(encodeCheckResponse, decodeCheckResponse)
      )
      .setType(MethodType.UNARY)
      .setFullMethodName(MethodDescriptor.generateFullMethodName("grpc.health.v1.Health", "Check"))
      .build()
}
