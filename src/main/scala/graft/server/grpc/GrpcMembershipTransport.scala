package graft.server.grpc

import graft.server.{MembershipTransport, MtlsConfig, ServerInfo}

/** Production [[MembershipTransport]]: dial the target's `rpc_addr` and
  * speak the `graft.v1.Membership` RPCs. Dial-per-event is deliberate —
  * membership churn is control-plane-rare, and a cached channel per peer
  * would need its own liveness management for no measurable win.
  *
  * In mTLS clusters nodes authenticate to each other with the same
  * credential they serve with (single-CA deployments, exactly the
  * reference's peer-TLS arrangement — internal/agent/agent.go:124-149
  * passes PeerTLSConfig to client dials).
  */
final class GrpcMembershipTransport(clientTls: Option[MtlsConfig] = None)
    extends MembershipTransport {

  private def dial[A](target: ServerInfo)(f: GrpcLogClient => A): A = {
    val addr = target.rpcAddr
    val ix = addr.lastIndexOf(':')
    require(ix > 0, s"member ${target.id} has no dialable rpc_addr: '$addr'")
    val c = new GrpcLogClient(addr.substring(0, ix), addr.substring(ix + 1).toInt, clientTls)
    try f(c)
    finally c.close()
  }

  override def join(target: ServerInfo, m: ServerInfo): Seq[ServerInfo] =
    dial(target)(_.join(m).servers)

  override def leave(target: ServerInfo, id: String): Unit =
    dial(target)(_.leave(id))
}
