package graft.server

/** Callback surface for membership churn — the reference's discovery
  * Handler (reference: internal/discovery/membership.go:20-28), which the
  * agent implements to start/stop replicating from joined members
  * (reference: internal/agent/agent.go:151-163).
  */
trait MembershipHandler {
  def onJoin(member: ServerInfo): Unit = ()
  def onLeave(id: String): Unit = ()
}

/** Live cluster-membership registry — the Serf stand-in
  * (reference: internal/discovery/membership.go:31-125). Serf's gossip
  * layer (failure detection, epidemic propagation) is the part with no
  * Spark analog and stays out of scope (COVERAGE.md §2.5); what the rest
  * of the reference actually consumes from it is exactly this surface:
  * a mutable id→(rpc addr, role) map fed by join/leave events, with
  * handlers fired on churn and the current view served through
  * GetServers (reference: internal/server/server.go:180-190).
  *
  * Join events arrive through the gRPC layer ([[grpc.MembershipProto]]'s
  * Join/Leave RPCs — announcements to a member rather than gossip between
  * peers), so topology is hub-propagated: each node knows itself plus
  * whoever announced to it or was seeded by the deployer; joiners receive
  * the full view in the Join response.
  *
  * Failure detection: Serf evicts members that DIE as well as members that
  * leave (reference: membership.go:82-101 handles both event classes).
  * Gossip's phi-accrual detector has no stand-in here; instead liveness is
  * TTL-based when `ttlMillis > 0`: every Join announcement — including an
  * idempotent re-announce, which is the heartbeat — refreshes the member's
  * `lastSeen`, and any view read first sweeps out members not seen within
  * the TTL, firing `onLeave` exactly as an explicit departure would. A
  * member that crashes without leaving therefore vanishes from GetServers
  * within one TTL instead of lingering forever. `ttlMillis = 0` (default)
  * preserves the announcement-only behavior for deployments whose
  * processes always depart cleanly.
  */
final class Membership(
    val local: ServerInfo,
    initialPeers: Seq[ServerInfo] = Nil,
    /** Evict members not re-announced within this window; 0 disables. */
    val ttlMillis: Long = 0L,
    /** Injectable time source — tests advance it deterministically. */
    clock: () => Long = () => System.currentTimeMillis(),
    /** Reject joins of an explicitly-departed id for this window after its
      * leave — the minimal stand-in for Serf's incarnation numbers: with
      * epidemic forwarding ([[MembershipPropagator]]) a join relay can
      * still be in flight when the member's Leave processes, and applying
      * it afterwards would resurrect the departed member forever. Real
      * rejoins are unaffected at any realistic scale: a process restart
      * takes far longer than the window, and TTL'd deployments heartbeat
      * past it. Only explicit leaves tombstone — a TTL sweep is a failure
      * verdict, and a late heartbeat legitimately revives the member.
      */
    val tombstoneMillis: Long = 2000L
) {

  /** id → member, join order preserved (GetServers answers local-first then
    * join order, so round-robin routing is stable across resolutions).
    */
  private val members = scala.collection.mutable.LinkedHashMap.empty[String, ServerInfo]
  private val lastSeen = scala.collection.mutable.HashMap.empty[String, Long]
  private val tombstones = scala.collection.mutable.HashMap.empty[String, Long]
  private val handlers = new java.util.concurrent.CopyOnWriteArrayList[MembershipHandler]
  initialPeers.filter(_.id != local.id).foreach { p =>
    members.put(p.id, p); lastSeen.put(p.id, clock())
  }

  /** Register a churn handler; close the result to deregister. Fired
    * outside the registry lock, on the joining/leaving caller's thread.
    */
  def subscribe(h: MembershipHandler): AutoCloseable = {
    handlers.add(h)
    () => { handlers.remove(h); () }
  }

  /** Idempotent upsert by id (a rejoin under the same id replaces the
    * address — the reference's Serf does the same on a node restart).
    * Self-joins are ignored, mirroring the eventHandler's isLocal skip
    * (reference: membership.go:82-96). True when the view changed.
    */
  def join(m: ServerInfo): Boolean = {
    if (m.id == local.id) return false
    val changed = synchronized {
      val dead = tombstoneMillis > 0 &&
        tombstones.get(m.id).exists(t => clock() - t <= tombstoneMillis)
      if (dead) false // recently departed: a stale relay, not a rejoin
      else {
        tombstones.remove(m.id)
        // An unchanged re-announce is the liveness heartbeat: refresh the
        // clock even when the view doesn't move.
        lastSeen.put(m.id, clock())
        val prev = members.get(m.id)
        if (prev.contains(m)) false
        else { members.put(m.id, m); true }
      }
    }
    if (changed) {
      val it = handlers.iterator()
      while (it.hasNext) {
        try it.next().onJoin(m)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    changed
  }

  /** Remove a member by id; true when it was present. The tombstone is
    * recorded even for an id never seen — a Leave relay can overtake its
    * Join relay, and the tombstone must swallow the laggard either way.
    */
  def leave(id: String): Boolean = {
    val removed = synchronized {
      if (tombstoneMillis > 0) tombstones.put(id, clock())
      lastSeen.remove(id); members.remove(id).isDefined
    }
    if (removed) fireLeave(id)
    removed
  }

  private def fireLeave(id: String): Unit = {
    val it = handlers.iterator()
    while (it.hasNext) {
      try it.next().onLeave(id)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Evict members whose last announcement is older than the TTL — the
    * failure-eviction half of Serf's event stream (membership.go:82-101:
    * a MemberFailed event is handled identically to MemberLeave). Handlers
    * fire outside the lock, on the reading caller's thread. No-op when
    * liveness is disabled.
    */
  private def sweep(): Unit = {
    val nowTs = clock()
    synchronized {
      tombstones.filterInPlace((_, t) => nowTs - t <= tombstoneMillis)
    }
    if (ttlMillis <= 0L) return
    val now = clock()
    val stale = synchronized {
      val ids = members.keysIterator
        .filter(id => now - lastSeen.getOrElse(id, now) > ttlMillis)
        .toVector
      ids.foreach { id => members.remove(id); lastSeen.remove(id) }
      ids
    }
    stale.foreach(fireLeave)
  }

  /** Current view: this node first, then members in join order —
    * the Members() analog (reference: membership.go:43-45). Sweeps
    * TTL-expired members first, so a crashed-without-leaving node never
    * appears in a GetServers answer past its liveness window.
    */
  def list: Seq[ServerInfo] = {
    sweep()
    local +: synchronized(members.values.toVector)
  }

  def size: Int = { sweep(); 1 + synchronized(members.size) }
}
