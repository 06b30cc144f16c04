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

/** The φ accrual failure detector (Hayashibara et al., "The φ Accrual
  * Failure Detector", SRDS 2004) — the algorithm behind the gossip-layer
  * liveness the reference delegates to Serf. Instead of a binary verdict
  * at a fixed TTL, each member's heartbeat INTER-ARRIVAL times feed a
  * sliding statistical window, and suspicion is the continuous
  *
  *   φ(tElapsed) = −log10( P(next heartbeat arrives later than tElapsed) )
  *
  * under a normal model of the observed intervals. φ grows with silence
  * and the threshold maps directly to a false-positive rate (φ=8 ⇒
  * ~10⁻⁸ chance the member is actually alive): a jittery-but-alive
  * member accumulates a wide interval distribution and tolerates gaps
  * that would evict a metronome-regular member — the adaptivity the
  * fixed TTL lacks.
  */
private[server] object PhiAccrual {

  /** φ at `elapsed` ms of silence given the window's mean/std. The normal
    * tail is evaluated through the logistic approximation of the normal
    * CDF (Bowling et al. 2009: Φ(y) ≈ 1/(1+e^(−y(1.5976+0.070566·y²))))
    * — branch on the sign so the tail never cancels to 0 at large y
    * (φ stays finite and monotone instead of jumping to ∞).
    */
  def phi(elapsedMillis: Double, meanMillis: Double, stdMillis: Double): Double = {
    val y = (elapsedMillis - meanMillis) / stdMillis
    // Clamp the tail at the smallest positive double: past y≈21 the exp
    // underflows to 0 and φ would read ∞ — keep it finite (~323) so
    // comparisons and observability stay well-behaved at any silence.
    val e = math.max(math.exp(-y * (1.5976 + 0.070566 * y * y)), Double.MinPositiveValue)
    if (elapsedMillis > meanMillis) -math.log10(e / (1.0 + e))
    else -math.log10(1.0 - 1.0 / (1.0 + e))
  }

  /** Sliding window of the last `maxSamples` heartbeat intervals with O(1)
    * mean/variance via running sums. `minStdMillis` floors the deviation:
    * a perfectly regular heartbeat would otherwise have zero variance and
    * evict on a microsecond of jitter.
    */
  final class ArrivalWindow(maxSamples: Int, minStdMillis: Double) {
    private val intervals = scala.collection.mutable.Queue.empty[Long]
    private var sum = 0.0
    private var sumSq = 0.0
    private var lastMillis = -1L

    def record(nowMillis: Long): Unit = {
      if (lastMillis >= 0) {
        val iv = (nowMillis - lastMillis).toDouble
        intervals.enqueue(iv.toLong)
        sum += iv; sumSq += iv * iv
        if (intervals.size > maxSamples) {
          val old = intervals.dequeue().toDouble
          sum -= old; sumSq -= old * old
        }
      }
      lastMillis = nowMillis
    }

    def samples: Int = intervals.size

    def phiAt(nowMillis: Long): Double = {
      if (intervals.isEmpty || lastMillis < 0) return 0.0
      val n = intervals.size.toDouble
      val mean = sum / n
      val variance = math.max(0.0, sumSq / n - mean * mean)
      val std = math.max(math.sqrt(variance), minStdMillis)
      PhiAccrual.phi((nowMillis - lastMillis).toDouble, mean, std)
    }
  }
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
  * Liveness here is layered: every Join announcement — including an
  * idempotent re-announce, which is the heartbeat — refreshes the member's
  * `lastSeen`, and any view read first sweeps out members judged dead,
  * firing `onLeave` exactly as an explicit departure would. The judgment
  * has two tiers:
  *
  *   - TTL (`ttlMillis > 0`): evict when silence exceeds a fixed window —
  *     simple, but a partitioned-yet-alive member and a dead one look
  *     identical until the window lapses, regardless of how regular the
  *     member's heartbeats were;
  *   - φ accrual (`phiThreshold > 0`, see [[PhiAccrual]]): evict when the
  *     suspicion level computed from the member's OWN heartbeat
  *     inter-arrival distribution crosses the threshold — Serf-grade
  *     adaptive detection: a metronome-regular member is evicted within a
  *     few missed beats, a jittery one gets proportionally more slack,
  *     and the threshold maps to a false-positive probability (φ=8 ⇒
  *     10⁻⁸). Until a member has `phiMinSamples` recorded intervals the
  *     TTL (when configured) governs — the bootstrap window.
  *
  * `ttlMillis = 0` with `phiThreshold = 0` (defaults) preserves the
  * announcement-only behavior for deployments whose processes always
  * depart cleanly.
  */
final class Membership(
    val local: ServerInfo,
    initialPeers: Seq[ServerInfo] = Nil,
    /** Evict members not re-announced within this window; 0 disables. */
    val ttlMillis: Long = 0L,
    /** φ accrual suspicion threshold; 0 disables (TTL-only liveness).
      * 8 is the conventional production value.
      */
    val phiThreshold: Double = 0.0,
    /** Heartbeat intervals required before φ governs a member (TTL rules
      * the bootstrap).
      */
    val phiMinSamples: Int = 3,
    /** Deviation floor for the interval window (see [[PhiAccrual.ArrivalWindow]]). */
    val phiMinStdMillis: Double = 100.0,
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
  // φ can only judge a member once phiMinSamples heartbeat intervals have
  // accrued; a member that dies BEFORE that (and in a φ-only deployment,
  // heartbeats themselves are paced by the TTL — ttl/3 in the CLI) would
  // otherwise linger in GetServers forever. The TTL is the mandatory
  // bootstrap window, not an alternative.
  require(
    phiThreshold <= 0 || ttlMillis > 0,
    s"phiThreshold=$phiThreshold requires ttlMillis > 0: the TTL governs the " +
      "bootstrap window before a member has phiMinSamples heartbeat intervals, " +
      "and without it an early-dying member is never evicted"
  )

  /** id → member, join order preserved (GetServers answers local-first then
    * join order, so round-robin routing is stable across resolutions).
    */
  private val members = scala.collection.mutable.LinkedHashMap.empty[String, ServerInfo]
  private val lastSeen = scala.collection.mutable.HashMap.empty[String, Long]
  private val tombstones = scala.collection.mutable.HashMap.empty[String, Long]
  /** Per-member heartbeat inter-arrival windows (φ accrual state). */
  private val arrivals = scala.collection.mutable.HashMap.empty[String, PhiAccrual.ArrivalWindow]
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
        if (phiThreshold > 0)
          arrivals
            .getOrElseUpdate(m.id, new PhiAccrual.ArrivalWindow(100, phiMinStdMillis))
            .record(clock())
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
      lastSeen.remove(id); arrivals.remove(id); members.remove(id).isDefined
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
    if (ttlMillis <= 0L && phiThreshold <= 0.0) return
    val now = clock()
    val stale = synchronized {
      val ids = members.keysIterator.filter { id =>
        val window = arrivals.get(id).filter(_.samples >= phiMinSamples)
        (phiThreshold > 0, window) match {
          // φ governs once the member has a usable interval history.
          case (true, Some(w)) => w.phiAt(now) > phiThreshold
          // Bootstrap (or φ disabled): the fixed TTL, when configured.
          case _ => ttlMillis > 0 && now - lastSeen.getOrElse(id, now) > ttlMillis
        }
      }.toVector
      ids.foreach { id => members.remove(id); lastSeen.remove(id); arrivals.remove(id) }
      ids
    }
    stale.foreach(fireLeave)
  }

  /** Current suspicion level for a member — observability hook (0 when φ
    * is disabled, the member is unknown, or no heartbeat history exists).
    */
  def phiOf(id: String): Double = synchronized {
    if (phiThreshold <= 0) 0.0
    else arrivals.get(id).map(_.phiAt(clock())).getOrElse(0.0)
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
