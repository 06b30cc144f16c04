package graft.server

import java.util.concurrent.{Executors, ThreadFactory, TimeUnit}

/** How a propagator reaches another node's membership service. Abstracted
  * so the convergence logic is model-checkable without sockets: production
  * uses [[grpc.GrpcMembershipTransport]] (the `graft.v1.Membership` RPCs);
  * the property test wires registries to each other directly.
  */
trait MembershipTransport {
  /** Announce `m` to `target`; returns the target's full post-join view. */
  def join(target: ServerInfo, m: ServerInfo): Seq[ServerInfo]

  /** Announce `id`'s departure to `target`. */
  def leave(target: ServerInfo, id: String): Unit
}

/** Epidemic view propagation — closes the gap between this repo's
  * hub-propagated topology and Serf's convergence guarantee (reference:
  * internal/discovery/membership.go:31-125: every node converges to the
  * full member set with no client cooperation). Two mechanisms, both
  * standard gossip practice:
  *
  *   - **One-hop forwarding**: whenever this node's registry CHANGES (a
  *     genuinely new/updated Join, or a Leave), the event is relayed to
  *     every other member this node knows. Receivers apply-and-relay the
  *     same way, and the cascade terminates because [[Membership.join]] /
  *     [[Membership.leave]] report no-change for duplicates — each node
  *     relays a given change at most once.
  *   - **Push-pull anti-entropy**: on a timer, exchange views with one
  *     known peer — announce self (which doubles as the TTL heartbeat),
  *     merge the peer's returned view (pull), then push any members the
  *     peer's view lacked. Repairs any forwarding miss (dropped packet,
  *     node briefly down) within a bounded number of rounds.
  *
  * Deviations from Serf, documented: no Lamport-clock tombstones, so a
  * Leave racing a concurrent push can transiently resurrect a departed
  * member on some nodes; under TTL liveness (the deployment mode this is
  * built for) such a ghost stops being refreshed and is swept within
  * ~2×TTL. Announcement-only clusters (ttl=0) retain the race window.
  *
  * Threading: handler events enqueue onto one daemon executor (never block
  * the RPC thread that fired them); the anti-entropy timer is a daemon
  * scheduler. `runSync = true` makes everything same-thread for the
  * deterministic model check.
  */
final class MembershipPropagator(
    membership: Membership,
    transport: MembershipTransport,
    antiEntropyMillis: Long = 0L,
    runSync: Boolean = false
) extends AutoCloseable {

  private def daemon(name: String): ThreadFactory = r => {
    val t = new Thread(r, name); t.setDaemon(true); t
  }
  private val exec =
    if (runSync) None
    else Some(Executors.newSingleThreadExecutor(daemon("membership-propagate")))
  private val timer =
    if (runSync || antiEntropyMillis <= 0) None
    else Some(Executors.newSingleThreadScheduledExecutor(daemon("membership-antientropy")))

  private def async(body: => Unit): Unit = exec match {
    case Some(e) => e.submit(new Runnable { def run(): Unit = body }); ()
    case None    => body
  }

  private var unsubscribe: AutoCloseable = null

  def start(): MembershipPropagator = {
    unsubscribe = membership.subscribe(new MembershipHandler {
      override def onJoin(m: ServerInfo): Unit = async(forwardJoin(m))
      override def onLeave(id: String): Unit = async(forwardLeave(id))
    })
    timer.foreach(
      _.scheduleWithFixedDelay(
        () => try exchangeOnce() catch { case _: Exception => () },
        antiEntropyMillis,
        antiEntropyMillis,
        TimeUnit.MILLISECONDS
      )
    )
    this
  }

  /** Relay a changed Join to every other known member. Fire-and-forget:
    * response views are deliberately NOT merged back — a response can be
    * stale against a Leave processed while the forward was in flight, and
    * merging it resurrects the departed member on this node (observed in
    * the three-server drill before this rule). The only merge points are
    * the two explicit pulls: a node's own announce/heartbeat response and
    * the anti-entropy pull. Per-target failures are skipped — anti-entropy
    * repairs them.
    */
  private def forwardJoin(m: ServerInfo): Unit =
    targets(excludeId = m.id).foreach { t =>
      try { val _ = transport.join(t, m) }
      catch { case _: Exception => () }
    }

  private def forwardLeave(id: String): Unit =
    targets(excludeId = id).foreach { t =>
      try transport.leave(t, id)
      catch { case _: Exception => () }
    }

  private def targets(excludeId: String): Seq[ServerInfo] =
    membership.list.filter(t => t.id != membership.local.id && t.id != excludeId)

  /** One push-pull anti-entropy round against one peer (random when more
    * than one is known): announce self, merge the peer's view, push what
    * the peer lacked. Public so tests and the timer share the exact code.
    */
  def exchangeOnce(): Unit = {
    // Anti-entropy announces SELF, so it requires a dialable advertised
    // address — announcing a placeholder (e.g. the default "local[*]")
    // would epidemically replace this node's real address cluster-wide
    // and cut it off from future forwards.
    if (!membership.local.rpcAddr.contains(':')) return
    val peers = targets(excludeId = "")
    if (peers.isEmpty) return
    // Rotate deterministically by nano clock rather than Random: the pick
    // just needs to spread over peers across rounds.
    val peer = peers((System.nanoTime() % peers.size).toInt.abs)
    val theirView =
      try transport.join(peer, membership.local)
      catch { case _: Exception => return }
    theirView.foreach(membership.join)
    val theirIds = theirView.map(_.id).toSet
    membership.list
      .filter(m => m.id != peer.id && m.id != membership.local.id && !theirIds.contains(m.id))
      .foreach { missing =>
        // Push without merging the response — same staleness rule as
        // forwardJoin; the pull above was this round's merge.
        try { val _ = transport.join(peer, missing) }
        catch { case _: Exception => () }
      }
  }

  def close(): Unit = {
    if (unsubscribe != null) unsubscribe.close()
    timer.foreach(_.shutdownNow())
    exec.foreach(_.shutdownNow())
  }
}
