package graft.server

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Randomized model checks for membership.
  *
  * Single-registry: arbitrary interleavings of join / address-change
  * rejoin / leave / heartbeat / clock-advance must keep the TTL'd registry
  * identical to a trivial driver-side model (a map with lastSeen + leave
  * tombstones), and every eviction must fire onLeave exactly once.
  *
  * Multi-node: N registries wired through an in-memory transport with
  * same-thread propagators model the epidemic layer — after every
  * fully-delivered join/leave, all live views must equal the model's
  * member set, and anti-entropy must repair views that missed events while
  * partitioned. Seeded, so failures replay.
  */
class MembershipPropertySpec extends AnyFunSuite {

  test("registry view matches a reference model under random churn (seeded)") {
    val rnd = new Random(1337)
    for (trial <- 0 until 30) {
      var now = 1000L
      val ttl = 50L + rnd.nextInt(200)
      val tomb = 20L + rnd.nextInt(100)
      val m = new Membership(
        ServerInfo("local", "l:0", isLeader = true),
        ttlMillis = ttl,
        clock = () => now,
        tombstoneMillis = tomb
      )
      // Reference model: id -> (addr, lastSeen), plus leave tombstones.
      val model = scala.collection.mutable.LinkedHashMap.empty[String, (String, Long)]
      val tombModel = scala.collection.mutable.HashMap.empty[String, Long]
      val leaves = scala.collection.mutable.ArrayBuffer.empty[String]
      m.subscribe(new MembershipHandler {
        override def onLeave(id: String): Unit = leaves += id
      })
      def modelSweep(): Seq[String] = {
        val stale = model.collect { case (id, (_, seen)) if now - seen > ttl => id }.toSeq
        stale.foreach(model.remove)
        stale
      }
      val expectedLeaves = scala.collection.mutable.ArrayBuffer.empty[String]
      val ids = (0 until 6).map(i => s"m$i")

      for (step <- 0 until 120) {
        rnd.nextInt(5) match {
          case 0 => // join or heartbeat (same op: idempotent upsert)
            val id = ids(rnd.nextInt(ids.size))
            val addr = s"$id:${rnd.nextInt(3)}" // occasional address churn
            val tombstoned = tombModel.get(id).exists(t => now - t <= tomb)
            val changed = m.join(ServerInfo(id, addr, isLeader = false))
            if (tombstoned) {
              // A join inside the leave window is a stale relay: swallowed.
              assert(!changed, s"trial $trial step $step: tombstoned join applied")
            } else {
              tombModel.remove(id)
              model.put(id, (addr, now))
            }
          case 1 => // explicit leave
            val id = ids(rnd.nextInt(ids.size))
            if (m.leave(id)) expectedLeaves += id
            tombModel.put(id, now)
            model.remove(id)
          case _ => // time passes, then a view read sweeps
            now += rnd.nextInt(ttl.toInt)
            val viewed = m.list // triggers the sweep + onLeave fires
            expectedLeaves ++= modelSweep()
            val got = viewed.filterNot(_.id == "local").map(s => s.id -> s.rpcAddr).toMap
            val want = model.map { case (id, (addr, _)) => id -> addr }.toMap
            assert(got == want, s"trial $trial step $step: view $got != model $want")
        }
      }
      // Final reconciliation: one more read, then compare everything.
      now += ttl + 1
      assert(m.list.map(_.id) == Seq("local"), s"trial $trial: full silence must empty the view")
      expectedLeaves ++= modelSweep()
      assert(leaves.sorted == expectedLeaves.sorted,
        s"trial $trial: onLeave fired ${leaves.sorted} but expected ${expectedLeaves.sorted}")
    }
  }

  test("epidemic propagation converges every node's view under random churn (seeded)") {
    val rnd = new Random(4242)
    for (trial <- 0 until 20) {
      var now = 1000L
      // Tombstones ON (they are what makes leave-vs-relay ordering safe);
      // TTL off so the model is purely about propagation, not liveness.
      val tomb = 500L

      // Live nodes: id -> (registry, propagator). The transport routes
      // RPCs directly into the target registry — same-thread, so every
      // forward cascade completes before the op returns, and reachability
      // is controlled per-node to model partitions.
      val nodes =
        scala.collection.mutable.LinkedHashMap.empty[String, (Membership, MembershipPropagator)]
      val partitioned = scala.collection.mutable.Set.empty[String]
      val transport: MembershipTransport = new MembershipTransport {
        override def join(target: ServerInfo, m: ServerInfo): Seq[ServerInfo] = {
          if (partitioned(target.id)) throw new RuntimeException(s"${target.id} unreachable")
          val (mem, _) = nodes.getOrElse(target.id, throw new RuntimeException("gone"))
          mem.join(m)
          mem.local +: mem.list.tail
        }
        override def leave(target: ServerInfo, id: String): Unit = {
          if (partitioned(target.id)) throw new RuntimeException(s"${target.id} unreachable")
          nodes.get(target.id).foreach(_._1.leave(id))
        }
      }
      def spawn(id: String): (Membership, MembershipPropagator) = {
        val mem = new Membership(
          ServerInfo(id, s"$id:0", isLeader = id == "n0"),
          clock = () => now,
          tombstoneMillis = tomb
        )
        val prop = new MembershipPropagator(mem, transport, runSync = true).start()
        (mem, prop)
      }
      // Model: the set of live node ids.
      def modelView = nodes.keySet.toSet

      // Seed node.
      nodes.put("n0", spawn("n0"))
      val pool = (1 until 6).map(i => s"n$i")

      def converged(): Unit =
        nodes.foreach { case (id, (mem, _)) =>
          val got = mem.list.map(_.id).toSet
          assert(
            got == modelView,
            s"trial $trial: $id sees $got, model $modelView (partitioned=$partitioned)"
          )
        }

      for (step <- 0 until 60) {
        now += tomb + 1 // each op in a fresh tombstone window
        rnd.nextInt(4) match {
          case 0 => // a pool node (re)joins via ONE random live node
            val id = pool(rnd.nextInt(pool.size))
            if (!nodes.contains(id)) {
              val hubs = nodes.keys.toSeq.filterNot(partitioned)
              if (hubs.nonEmpty) {
                val hub = hubs(rnd.nextInt(hubs.size))
                val self = spawn(id)
                nodes.put(id, self)
                // announceTo's contract: announce to one node, seed the
                // local view from the response. A partitioned node misses
                // the forward — anti-entropy repairs it on heal.
                val view = transport.join(nodes(hub)._1.local, self._1.local)
                view.foreach(self._1.join)
              }
            }
          case 1 => // a live node departs, announcing to ONE other node.
            // Leaves churn only while nobody is partitioned: a missed
            // Leave is NOT repairable by positive-only anti-entropy (the
            // Serf-incarnation gap this layer documents); deployments
            // cover it with TTL liveness, which this propagation model
            // deliberately excludes.
            val live = nodes.keys.toSeq
            if (partitioned.isEmpty && live.size >= 2) {
              val id = live(rnd.nextInt(live.size))
              val others = live.filterNot(_ == id)
              val target = others(rnd.nextInt(others.size))
              nodes.remove(id).foreach(_._2.close())
              transport.leave(nodes(target)._1.local, id)
            }
          case 2 => // partition heal: exchange rounds repair missed events
            partitioned.clear()
            nodes.values.foreach { case (_, prop) =>
              (0 until nodes.size).foreach(_ => prop.exchangeOnce())
            }
          case 3 => // partition one node (future forwards to it fail)
            val live = nodes.keys.toSeq
            if (live.size >= 3 && partitioned.isEmpty)
              partitioned += live(rnd.nextInt(live.size))
        }
        // With nobody partitioned, every completed op must have fully
        // propagated (same-thread cascades): all views equal the model.
        if (partitioned.isEmpty) converged()
      }
      // Final heal + anti-entropy: everyone converges no matter what the
      // churn history was.
      partitioned.clear()
      now += tomb + 1
      nodes.values.foreach { case (_, prop) =>
        (0 until nodes.size).foreach(_ => prop.exchangeOnce())
      }
      converged()
      nodes.values.foreach(_._2.close())
    }
  }
}
