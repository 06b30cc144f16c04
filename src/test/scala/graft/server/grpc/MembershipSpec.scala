package graft.server.grpc

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.log.{LogConfig, SparkLog}
import graft.server.{Acl, ConsumeRequest, ConsumeResponse, LogService, Membership, MembershipHandler, MembershipPropagator, PermissionDeniedException, ProduceRequest, ProduceResponse, ServerInfo}

/** Dynamic membership — the Serf stand-in. The registry half mirrors the
  * reference's membership tests (reference:
  * internal/discovery/membership_test.go:14-35 — three members join, the
  * view counts them, a leave is reflected); the e2e half mirrors the agent
  * test's semantics (reference: internal/agent/agent_test.go:24-84 — a
  * joined follower serves consumes) over real sockets: a follower joins
  * MID-RUN through the `graft.v1.Membership` RPC, the balanced client's
  * re-resolution starts routing consumes to it, and after it leaves,
  * routing excludes it again.
  */
class MembershipSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ------------------------------------------------------------- registry

  test("join/leave update the view and fire handlers (membership_test.go:14-35)") {
    val m = new Membership(ServerInfo("leader", "h:1", isLeader = true))
    val joins = new AtomicInteger(0)
    val leaves = new AtomicInteger(0)
    val sub = m.subscribe(new MembershipHandler {
      override def onJoin(member: ServerInfo): Unit = joins.incrementAndGet()
      override def onLeave(id: String): Unit = leaves.incrementAndGet()
    })

    assert(m.join(ServerInfo("f-0", "h:2", isLeader = false)))
    assert(m.join(ServerInfo("f-1", "h:3", isLeader = false)))
    assert(m.size == 3 && joins.get == 2)
    // Idempotent re-join: no view change, no handler fire.
    assert(!m.join(ServerInfo("f-0", "h:2", isLeader = false)))
    assert(joins.get == 2)
    // Rejoin under the same id with a NEW address replaces (node restart)
    // and fires the handler again — the address change IS churn.
    assert(m.join(ServerInfo("f-0", "h:9", isLeader = false)))
    assert(m.list.find(_.id == "f-0").exists(_.rpcAddr == "h:9"))
    assert(joins.get == 3)
    // Self-join is ignored (membership.go isLocal skip).
    assert(!m.join(ServerInfo("leader", "elsewhere:1", isLeader = true)))

    assert(m.leave("f-1") && m.size == 2 && leaves.get == 1)
    assert(!m.leave("f-1"), "double leave is a no-op")
    assert(m.list.map(_.id) == Seq("leader", "f-0"), "local first, join order after")

    sub.close()
    m.join(ServerInfo("f-2", "h:4", isLeader = false))
    assert(joins.get == 3, "unsubscribed handler must not fire")
  }

  test("TTL sweep evicts a member that dies without leaving (membership.go:82-101)") {
    // Serf treats MemberFailed like MemberLeave; the TTL sweep is the
    // gossip-free stand-in. Deterministic via an injected clock.
    var now = 1000L
    val m = new Membership(
      ServerInfo("leader", "h:1", isLeader = true),
      ttlMillis = 100L,
      clock = () => now
    )
    val left = new java.util.concurrent.CopyOnWriteArrayList[String]
    m.subscribe(new MembershipHandler {
      override def onLeave(id: String): Unit = left.add(id)
    })
    m.join(ServerInfo("f-0", "h:2", isLeader = false))
    m.join(ServerInfo("f-1", "h:3", isLeader = false))
    assert(m.size == 3)

    // f-0 heartbeats (an idempotent re-announce), f-1 goes silent.
    now += 80L
    m.join(ServerInfo("f-0", "h:2", isLeader = false))
    now += 80L // f-1 last seen 160ms ago > TTL; f-0 80ms ago
    assert(m.list.map(_.id) == Seq("leader", "f-0"), "silent member must be swept")
    assert(left.toArray.toSeq == Seq("f-1"), "eviction fires onLeave like a departure")

    // The survivor outlives any number of sweeps while it keeps beating.
    now += 80L
    m.join(ServerInfo("f-0", "h:2", isLeader = false))
    now += 80L
    assert(m.size == 2 && left.size == 1)

    // Full silence: everyone but the local node ages out.
    now += 200L
    assert(m.list.map(_.id) == Seq("leader"))
    assert(left.toArray.toSeq == Seq("f-1", "f-0"))

    // A post-eviction rejoin is a fresh join (node restarted after crash).
    assert(m.join(ServerInfo("f-1", "h:3", isLeader = false)))
    assert(m.size == 2)
  }

  test("ttl=0 (default) never evicts — announcement-only membership") {
    var now = 0L
    val m = new Membership(ServerInfo("leader", "h:1", isLeader = true), clock = () => now)
    m.join(ServerInfo("f-0", "h:2", isLeader = false))
    now += 1000L * 60 * 60
    assert(m.size == 2, "no TTL: a silent member lingers (documented pre-liveness behavior)")
  }

  test("membership RPCs require produce permission") {
    val log = SparkLog(spark, TestSpark.tempDir("member-acl"))
    val svc = new LogService(log)
    intercept[PermissionDeniedException] {
      svc.join("nobody", ServerInfo("x", "h:1", isLeader = false))
    }
    intercept[PermissionDeniedException](svc.leave("nobody", "x"))
    assert(svc.join("root", ServerInfo("x", "h:1", isLeader = false)).exists(_.id == "x"))
  }

  // ------------------------------------------------------------------ e2e

  private final class CountingService(
      log: SparkLog,
      name: String,
      addr: => String,
      leader: Boolean,
      ttl: Long = 0L
  ) extends LogService(log, Acl.rootOnly, name, "placeholder", leader, memberTtlMillis = ttl) {
    val consumed = new AtomicInteger(0)
    override def consume(subject: String, req: ConsumeRequest): ConsumeResponse = {
      consumed.incrementAndGet(); super.consume(subject, req)
    }
    override def produce(subject: String, req: ProduceRequest): ProduceResponse =
      super.produce(subject, req)
    override def getServers: Seq[ServerInfo] =
      ServerInfo(nodeName, addr, isLeader = leader) +: membership.list.tail
  }

  test("a follower joining mid-run starts receiving consumes; leaving excludes it") {
    val log = SparkLog(spark, TestSpark.tempDir("member-e2e"), LogConfig(maxStoreBytes = 256))
    var leaderPort = 0
    val leaderSvc = new CountingService(log, "leader", s"localhost:$leaderPort", leader = true)
    val leaderSrv = new GrpcLogServer(leaderSvc, port = 0, anonymousSubject = "root").start()
    leaderPort = leaderSrv.boundPort

    // refreshEveryMillis = 1: every routed call re-resolves, so churn is
    // visible immediately (deterministic; production default is 3 s).
    val client =
      new BalancedLogClient("localhost", leaderSrv.boundPort, refreshEveryMillis = 1L)
    try {
      client.produce("m0".getBytes)
      client.produce("m1".getBytes)
      // No followers yet: reads land on the leader.
      client.consume(0L)
      assert(leaderSvc.consumed.get == 1)
      assert(client.servers.size == 1)

      // Follower joins MID-RUN through the membership RPC (same shared
      // log — the pull-replica arrangement the multi-node story uses).
      var followerPort = 0
      val followerSvc =
        new CountingService(log, "follower-0", s"localhost:$followerPort", leader = false)
      val followerSrv = new GrpcLogServer(followerSvc, port = 0, anonymousSubject = "root").start()
      followerPort = followerSrv.boundPort
      try {
        val announce = new GrpcLogClient("localhost", leaderSrv.boundPort)
        val view = announce.join(ServerInfo("follower-0", s"localhost:$followerPort", false))
        assert(view.servers.map(_.id).toSet == Set("leader", "follower-0"))

        // The balanced client's next consumes re-resolve and route to the
        // follower; the leader's consume counter must not move.
        val leaderBefore = leaderSvc.consumed.get
        (0 until 4).foreach(i => assert(new String(client.consume(i % 2L).value) == s"m${i % 2}"))
        assert(followerSvc.consumed.get == 4, "joined follower must receive the consumes")
        assert(leaderSvc.consumed.get == leaderBefore)
        assert(client.servers.size == 2)

        // Departure: routing excludes the follower again.
        announce.leave("follower-0")
        val followerBefore = followerSvc.consumed.get
        (0 until 2).foreach(i => client.consume(i.toLong))
        assert(followerSvc.consumed.get == followerBefore, "departed follower must see no reads")
        assert(leaderSvc.consumed.get == leaderBefore + 2)
        assert(client.servers.size == 1)
        announce.close()
      } finally followerSrv.stop()
    } finally {
      client.close()
      leaderSrv.stop()
    }
  }

  test("a follower killed without Leave vanishes from GetServers within the TTL; routing follows") {
    val log = SparkLog(spark, TestSpark.tempDir("member-ttl-e2e"), LogConfig(maxStoreBytes = 256))
    var leaderPort = 0
    val leaderSvc =
      new CountingService(log, "leader", s"localhost:$leaderPort", leader = true, ttl = 300L)
    val leaderSrv = new GrpcLogServer(leaderSvc, port = 0, anonymousSubject = "root").start()
    leaderPort = leaderSrv.boundPort
    val client = new BalancedLogClient("localhost", leaderSrv.boundPort, refreshEveryMillis = 1L)
    try {
      client.produce("m0".getBytes)

      var followerPort = 0
      val followerSvc =
        new CountingService(log, "follower-0", s"localhost:$followerPort", leader = false)
      val followerSrv = new GrpcLogServer(followerSvc, port = 0, anonymousSubject = "root").start()
      followerPort = followerSrv.boundPort
      val announce = new GrpcLogClient("localhost", leaderSrv.boundPort)
      announce.join(ServerInfo("follower-0", s"localhost:$followerPort", false))
      // Routed call → staleness-bounded re-resolution picks up the join.
      client.consume(0L)
      assert(client.servers.size == 2)
      assert(followerSvc.consumed.get == 1, "live follower serves reads")

      // CRASH: the follower's process dies — no Leave RPC, no heartbeat.
      followerSrv.stop()
      announce.close()

      // Within the TTL the sweep drops it from every GetServers answer.
      // Bounded poll (pass as soon as the view shrinks), driving routed
      // calls because resolution happens before routing, not in `servers`;
      // pre-eviction calls may still hit the dead node — that transport
      // error is exactly what the client is expected to ride out.
      val deadline = System.currentTimeMillis() + 5000L
      while (client.servers.size != 1 && System.currentTimeMillis() < deadline) {
        try { val _ = client.consume(0L) }
        catch { case _: Exception => () }
        Thread.sleep(25L)
      }
      assert(client.servers.map(_.id) == Seq("leader"), "crashed follower must be evicted")

      // And routing follows the view: reads land on the leader again.
      val followerBefore = followerSvc.consumed.get
      val leaderBefore = leaderSvc.consumed.get
      (0 until 3).foreach(_ => client.consume(0L))
      assert(followerSvc.consumed.get == followerBefore)
      assert(leaderSvc.consumed.get == leaderBefore + 3)
    } finally {
      client.close()
      leaderSrv.stop()
    }
  }

  test("a joiner announcing to ONE node converges every node's view (membership.go:31-125)") {
    // Serf's guarantee: every node ends with the full member set no matter
    // who the joiner contacted. Three real servers, each running a
    // propagator (one-hop forwarding + anti-entropy); B and C announce to
    // A ONLY, and all three GetServers answers must converge.
    val log = SparkLog(spark, TestSpark.tempDir("member-converge"), LogConfig(maxStoreBytes = 256))
    // Real advertised addresses matter: the propagator announces
    // `membership.local` during anti-entropy, exactly like a production
    // node whose Engine got the real --advertise address.
    def freePort(): Int = {
      val ss = new java.net.ServerSocket(0)
      try ss.getLocalPort
      finally ss.close()
    }
    def node(name: String, leader: Boolean): (LogService, GrpcLogServer, MembershipPropagator) = {
      val port = freePort()
      val svc =
        new LogService(log, nodeName = name, rpcAddr = s"localhost:$port", isLeader = leader)
      val srv = new GrpcLogServer(svc, port = port, anonymousSubject = "root").start()
      val prop =
        new MembershipPropagator(svc.membership, new GrpcMembershipTransport()).start()
      (svc, srv, prop)
    }
    val (aSvc, aSrv, aProp) = node("node-a", leader = true)
    val (bSvc, bSrv, bProp) = node("node-b", leader = false)
    val (cSvc, cSrv, cProp) = node("node-c", leader = false)
    try {
      // announceTo's contract: announce to the one known address, seed the
      // local view from the response.
      def announce(selfSvc: LogService, selfSrv: GrpcLogServer, hubPort: Int): Unit = {
        val ann = new GrpcLogClient("localhost", hubPort)
        try {
          val self = ServerInfo(selfSvc.nodeName, s"localhost:${selfSrv.boundPort}", false)
          ann.join(self).servers.foreach(selfSvc.membership.join)
        } finally ann.close()
      }
      announce(bSvc, bSrv, aSrv.boundPort)
      announce(cSvc, cSrv, aSrv.boundPort)

      // Bounded convergence poll: A forwards C's join to B; B learned A
      // from its join response; C got both from its response.
      val all = Set("node-a", "node-b", "node-c")
      val deadline = System.currentTimeMillis() + 10000L
      def views = Seq(aSvc, bSvc, cSvc).map(_.getServers.map(_.id).toSet)
      while (!views.forall(_ == all) && System.currentTimeMillis() < deadline)
        Thread.sleep(25L)
      assert(views.forall(_ == all), s"views did not converge: $views")

      // Anti-entropy repairs a miss: a member lands in B's registry only
      // (as if its announcement's forward was dropped); one push-pull
      // round from B plus the receivers' own forwarding spreads it.
      bSvc.membership.join(ServerInfo("node-d", "localhost:1", isLeader = false))
      // (the registry fired B's forwarder; wait for either path to land)
      val all4 = all + "node-d"
      val deadline2 = System.currentTimeMillis() + 10000L
      while (!views.forall(_ == all4) && System.currentTimeMillis() < deadline2) {
        bProp.exchangeOnce()
        Thread.sleep(50L)
      }
      assert(views.forall(_ == all4), s"anti-entropy did not spread the miss: $views")

      // A departure announced to ONE node disappears everywhere.
      val ann = new GrpcLogClient("localhost", cSrv.boundPort)
      try ann.leave("node-d")
      finally ann.close()
      val deadline3 = System.currentTimeMillis() + 10000L
      while (!views.forall(_ == all) && System.currentTimeMillis() < deadline3)
        Thread.sleep(25L)
      assert(views.forall(_ == all), s"leave did not propagate: $views")
    } finally {
      aProp.close(); bProp.close(); cProp.close()
      aSrv.stop(); bSrv.stop(); cSrv.stop()
    }
  }

  test("waitForLeader blocks until promotion, times out leaderless (distributed.go:164-178)") {
    val log = SparkLog(spark, TestSpark.tempDir("member-wait"))
    // Follower-only cluster: resolution succeeds (the follower answers
    // GetServers) but no row is a leader — the post-crash window before
    // the deployer promotes a replacement.
    var fPort = 0
    val fSvc = new CountingService(log, "follower-0", s"localhost:$fPort", leader = false)
    val fSrv = new GrpcLogServer(fSvc, port = 0, anonymousSubject = "root").start()
    fPort = fSrv.boundPort
    val client = new BalancedLogClient("localhost", fSrv.boundPort, refreshEveryMillis = 1L)
    try {
      intercept[NoLeaderException](client.waitForLeader(timeoutMillis = 300L, tickMillis = 50L))

      // Promotion mid-wait: a leader announces itself through the
      // membership RPC while a waiter ticks; the waiter must return it.
      val waiter = new Thread(null, null, "wait-leader", 256 * 1024) {
        @volatile var got: ServerInfo = _
        override def run(): Unit =
          got = client.waitForLeader(timeoutMillis = 10000L, tickMillis = 20L)
      }
      waiter.start()
      val announce = new GrpcLogClient("localhost", fSrv.boundPort)
      announce.join(ServerInfo("leader", "localhost:1", isLeader = true))
      announce.close()
      waiter.join(10000L)
      assert(waiter.got != null && waiter.got.id == "leader", "waiter must see the promotion")
    } finally {
      client.close()
      fSrv.stop()
    }
  }
}
