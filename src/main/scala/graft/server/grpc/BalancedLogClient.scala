package graft.server.grpc

import java.util.concurrent.atomic.AtomicLong

import graft.log.LogRecord
import graft.server.{MtlsConfig, ServerInfo}

/** Client-side load balancing over the `log.v1.Log` protocol — the
  * reference's resolver + picker pair re-expressed as a plain client
  * (reference: internal/loadbalance/resolver.go:32-77, picker.go:25-77).
  *
  * The reference plugs into grpc-go's balancer registry: its resolver dials
  * one bootstrap address, asks it `GetServers`, and publishes the member
  * list with an `is_leader` attribute; its picker then routes every
  * Produce-shaped RPC to the leader and round-robins Consume-shaped RPCs
  * over the followers. Registering providers inside a SHADED grpc runtime
  * would couple us to relocation internals, so the same two roles live here
  * as an explicit client: [[refresh]] is the resolver (GetServers through
  * whichever member answers first), and the routing methods are the picker,
  * policy-identical to picker.go:48-56 — produce → leader; consume →
  * followers round-robin, falling back to the leader when no followers
  * exist; no reachable leader → [[NoLeaderException]] (the
  * `ErrNoSubConnAvailable` analog).
  *
  * Scale posture: one long-lived channel per member (channels multiplex),
  * resolution is a single unary call, and routing is a local atomic — no
  * coordination on the hot path. Reads fan out across replicas exactly as
  * the reference intends follower reads to.
  */
class BalancedLogClient(
    bootstrapHost: String,
    bootstrapPort: Int,
    tls: Option[MtlsConfig] = None,
    /** Authority override for TLS hostname verification, applied to every
      * member channel (test certificates typically name one host).
      */
    authority: Option[String] = None,
    /** Re-resolve the member list when the view is older than this before
      * routing a call — how membership churn (a follower joining or
      * leaving, see [[MembershipProto]]) reaches a long-lived client
      * without a failure first. The reference gets this push-style from
      * Serf-fed resolver updates; a staleness-bounded pull is the
      * client-side analog. 0 disables (resolve only at construction and
      * on explicit [[refresh]]); a stale refresh that fails keeps the
      * previous view (routing then falls back on per-call errors).
      */
    refreshEveryMillis: Long = 3000L
) extends AutoCloseable {

  /** Member list as of the last [[refresh]], in GetServers order. */
  @volatile private var members: Seq[ServerInfo] = Nil
  @volatile private var resolvedAtNanos: Long = Long.MinValue
  private var clients: Map[String, GrpcLogClient] = Map.empty
  private val rr = new AtomicLong(0L)

  refresh()

  /** Re-resolve the member list (resolver.go:55-77's ResolveNow): ask the
    * bootstrap address — or, if it is gone, any known member — for the
    * current topology, then open/retire per-member channels to match.
    */
  def refresh(): Unit = synchronized {
    val bootstrapAddr = s"$bootstrapHost:$bootstrapPort"
    val seeds = bootstrapAddr +: members.map(_.rpcAddr).filterNot(_ == bootstrapAddr)
    val resolved = seeds.view
      .map { addr =>
        try {
          val c = clientFor(addr)
          val servers = c.getServers
          Some(servers)
        } catch { case scala.util.control.NonFatal(_) => None }
      }
      .collectFirst { case Some(servers) => servers }
      .getOrElse(throw new NoLeaderException(s"no member of $seeds answered GetServers"))
    members = resolved
    // Retire channels to members that left; keep the bootstrap channel —
    // it is the re-resolution seed even when not a member.
    val keep = (members.map(_.rpcAddr) :+ bootstrapAddr).toSet
    val (stay, gone) = clients.partition { case (addr, _) => keep(addr) }
    gone.valuesIterator.foreach(c => try c.close() catch { case _: Exception => () })
    clients = stay
    resolvedAtNanos = System.nanoTime()
  }

  /** Staleness-bounded re-resolution before routing; failures keep the
    * previous view (the call then surfaces its own transport error).
    */
  private def maybeRefresh(): Unit =
    if (
      refreshEveryMillis > 0L &&
      System.nanoTime() - resolvedAtNanos > refreshEveryMillis * 1000000L
    ) {
      try refresh()
      catch { case scala.util.control.NonFatal(_) => () }
    }

  /** Current view of the cluster (last resolution). */
  def servers: Seq[ServerInfo] = members

  /** Block until the resolved view contains a leader, re-resolving on a
    * ticker — the reference's `DistributedLog.WaitForLeader`
    * (reference: internal/log/distributed.go:164-178 polls `raft.Leader()`
    * on a 1 s tick until the election settles; the agent calls it before
    * serving, agent.go:119). Here "election" is the deployer promoting or
    * starting a leader-role node, so each tick is a GetServers
    * re-resolution; returns the leader row, or throws
    * [[NoLeaderException]] after `timeoutMillis` like the reference's
    * "leader timed out" error.
    */
  def waitForLeader(timeoutMillis: Long = 3000L, tickMillis: Long = 1000L): ServerInfo = {
    val deadline = System.nanoTime() + timeoutMillis * 1000000L
    var leader = members.find(_.isLeader)
    while (leader.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(math.max(1L, math.min(tickMillis, timeoutMillis)))
      try refresh()
      catch { case scala.util.control.NonFatal(_) => () }
      leader = members.find(_.isLeader)
    }
    leader.getOrElse(throw new NoLeaderException(s"leader timed out after $timeoutMillis ms"))
  }

  private def clientFor(addr: String): GrpcLogClient = synchronized {
    clients.getOrElse(
      addr, {
        val (h, p) = addr.lastIndexOf(':') match {
          case -1 => throw new IllegalArgumentException(s"rpcAddr '$addr' is not host:port")
          case i  => (addr.substring(0, i), addr.substring(i + 1).toInt)
        }
        val c = new GrpcLogClient(h, p, tls, authority)
        clients = clients.updated(addr, c)
        c
      }
    )
  }

  private def leaderClient: GrpcLogClient =
    members.find(_.isLeader) match {
      case Some(l) => clientFor(l.rpcAddr)
      case None    => throw new NoLeaderException(s"no leader among ${members.map(_.rpcAddr)}")
    }

  /** Round-robin follower pick (picker.go:60-66); leader when the cluster
    * has no followers (picker.go:49-50's `len(p.followers) == 0` branch).
    */
  private def followerClient: GrpcLogClient = {
    val followers = members.filterNot(_.isLeader)
    if (followers.isEmpty) leaderClient
    else {
      val idx = (rr.incrementAndGet() % followers.size).toInt
      clientFor(followers(idx).rpcAddr)
    }
  }

  // ------------------------------------------------------------- routing
  // Produce-shaped RPCs → leader; Consume-shaped → follower (picker.go:48-56).

  def produce(value: Array[Byte]): Long = { maybeRefresh(); leaderClient.produce(value) }

  def produceStream(values: Seq[Array[Byte]], timeoutSec: Long = 30L): Seq[Long] = {
    maybeRefresh()
    leaderClient.produceStream(values, timeoutSec)
  }

  def consume(offset: Long): LogRecord = { maybeRefresh(); followerClient.consume(offset) }

  def consumeStream(offset: Long): Iterator[LogRecord] = {
    maybeRefresh()
    followerClient.consumeStream(offset)
  }

  override def close(): Unit = synchronized {
    clients.valuesIterator.foreach(c => try c.close() catch { case _: Exception => () })
    clients = Map.empty
    members = Nil
  }
}

/** No routable leader — the `balancer.ErrNoSubConnAvailable` analog
  * (reference: internal/loadbalance/picker.go:53-55).
  */
final class NoLeaderException(msg: String) extends RuntimeException(msg)
