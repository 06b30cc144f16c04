package graft.server

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Randomized model check for the TTL'd membership registry: arbitrary
  * interleavings of join / address-change rejoin / leave / heartbeat /
  * clock-advance must keep the registry's view identical to a trivial
  * driver-side model (a map with lastSeen timestamps), and every eviction
  * must fire onLeave exactly once. Seeded, so failures replay.
  */
class MembershipPropertySpec extends AnyFunSuite {

  test("registry view matches a reference model under random churn (seeded)") {
    val rnd = new Random(1337)
    for (trial <- 0 until 30) {
      var now = 1000L
      val ttl = 50L + rnd.nextInt(200)
      val m = new Membership(
        ServerInfo("local", "l:0", isLeader = true),
        ttlMillis = ttl,
        clock = () => now
      )
      // Reference model: id -> (addr, lastSeen).
      val model = scala.collection.mutable.LinkedHashMap.empty[String, (String, Long)]
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
            m.join(ServerInfo(id, addr, isLeader = false))
            model.put(id, (addr, now))
          case 1 => // explicit leave
            val id = ids(rnd.nextInt(ids.size))
            if (m.leave(id)) expectedLeaves += id
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
}
