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
  * the full view in the Join response. A member that dies without leaving
  * is not auto-evicted (no failure detector) — the balanced client routes
  * around it on failure and re-resolves.
  */
final class Membership(
    val local: ServerInfo,
    initialPeers: Seq[ServerInfo] = Nil
) {

  /** id → member, join order preserved (GetServers answers local-first then
    * join order, so round-robin routing is stable across resolutions).
    */
  private val members = scala.collection.mutable.LinkedHashMap.empty[String, ServerInfo]
  private val handlers = new java.util.concurrent.CopyOnWriteArrayList[MembershipHandler]
  initialPeers.filter(_.id != local.id).foreach(p => members.put(p.id, p))

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
      val prev = members.get(m.id)
      if (prev.contains(m)) false
      else { members.put(m.id, m); true }
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

  /** Remove a member by id; true when it was present. */
  def leave(id: String): Boolean = {
    val removed = synchronized(members.remove(id).isDefined)
    if (removed) {
      val it = handlers.iterator()
      while (it.hasNext) {
        try it.next().onLeave(id)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    removed
  }

  /** Current view: this node first, then members in join order —
    * the Members() analog (reference: membership.go:43-45).
    */
  def list: Seq[ServerInfo] = local +: synchronized(members.values.toVector)

  def size: Int = 1 + synchronized(members.size)
}
