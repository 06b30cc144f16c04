package graft.server.grpc

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.log.{LogConfig, SparkLog}
import graft.server.{Acl, ConsumeRequest, ConsumeResponse, LogService, ProduceRequest, ProduceResponse, ServerInfo}

/** Client-side load balancing: resolver + picker policy over real sockets
  * (reference: internal/loadbalance/resolver_test.go, picker_test.go —
  * there against fake clientConns; here end-to-end through GetServers).
  * Produce must land on the leader, consume must round-robin across the
  * followers, a follower-less cluster serves reads from the leader, and a
  * leaderless cluster refuses writes (picker.go:48-56). Plaintext servers
  * with a pre-authenticated subject keep the focus on routing; the mTLS
  * path is covered by GrpcLogServerSpec/MtlsSpec.
  */
class BalancedClientSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** LogService that counts produce/consume calls, so tests can assert
    * WHERE the balanced client routed each RPC.
    */
  private final class CountingService(
      log: SparkLog,
      name: String,
      addr: => String,
      leader: Boolean,
      peerList: => Seq[ServerInfo]
  ) extends LogService(log, Acl.rootOnly, name, "placeholder", leader) {
    val produced = new AtomicInteger(0)
    val consumed = new AtomicInteger(0)
    override def produce(subject: String, req: ProduceRequest): ProduceResponse = {
      produced.incrementAndGet(); super.produce(subject, req)
    }
    override def consume(subject: String, req: ConsumeRequest): ConsumeResponse = {
      consumed.incrementAndGet(); super.consume(subject, req)
    }
    override def getServers: Seq[ServerInfo] =
      ServerInfo(nodeName, addr, isLeader = leader) +: peerList
  }

  /** One log, `nFollowers`+1 servers over it. Ports are only known after
    * start, so addresses resolve lazily through the by-name closures.
    */
  private def withCluster(nFollowers: Int, leaderIsLeader: Boolean = true)(
      f: (BalancedLogClient, CountingService, Seq[CountingService]) => Unit
  ): Unit = {
    val log = SparkLog(spark, TestSpark.tempDir("balanced-log"), LogConfig(maxStoreBytes = 256))
    var servers = Map.empty[String, GrpcLogServer]
    def addrOf(name: String) = s"localhost:${servers(name).boundPort}"

    val followerNames = (0 until nFollowers).map(i => s"follower-$i")
    def followerInfos = followerNames.map(n => ServerInfo(n, addrOf(n), isLeader = false))
    def leaderInfo = ServerInfo("leader", addrOf("leader"), isLeader = leaderIsLeader)

    val leaderSvc =
      new CountingService(log, "leader", addrOf("leader"), leaderIsLeader, followerInfos)
    val followerSvcs = followerNames.map { n =>
      new CountingService(
        log,
        n,
        addrOf(n),
        leader = false,
        leaderInfo +: followerInfos.filterNot(_.id == n)
      )
    }
    servers = ((leaderSvc +: followerSvcs): Seq[CountingService]).map { svc =>
      svc.nodeName -> new GrpcLogServer(svc, port = 0, anonymousSubject = "root").start()
    }.toMap

    val client = new BalancedLogClient("localhost", servers("leader").boundPort)
    try f(client, leaderSvc, followerSvcs)
    finally {
      client.close()
      servers.valuesIterator.foreach(_.stop())
    }
  }

  test("produce routes to the leader, consume round-robins the followers (picker.go:48-66)") {
    withCluster(nFollowers = 2) { (client, leader, followers) =>
      assert(client.servers.size == 3)
      val offs = (1 to 4).map(i => client.produce(s"msg-$i".getBytes))
      assert(offs == Seq(0L, 1L, 2L, 3L))
      assert(leader.produced.get == 4)
      assert(followers.map(_.produced.get).sum == 0)

      (0 until 4).foreach(i => assert(new String(client.consume(i.toLong).value) == s"msg-${i + 1}"))
      assert(leader.consumed.get == 0, "reads must not hit the leader while followers exist")
      // Round-robin: 4 reads over 2 followers → exactly 2 each.
      assert(followers.map(_.consumed.get) == Seq(2, 2))
    }
  }

  test("follower-less cluster serves reads from the leader (picker.go:49-50)") {
    withCluster(nFollowers = 0) { (client, leader, _) =>
      client.produce("solo".getBytes)
      assert(new String(client.consume(0L).value) == "solo")
      assert(leader.consumed.get == 1)
    }
  }

  test("leaderless cluster refuses writes (ErrNoSubConnAvailable analog, picker.go:53-55)") {
    withCluster(nFollowers = 1, leaderIsLeader = false) { (client, _, _) =>
      intercept[NoLeaderException](client.produce("never lands".getBytes))
      // Reads still ROUTE (to a follower): the empty log answers with the
      // wire-level 404, not a routing failure.
      val e = intercept[Throwable](client.consume(0L))
      assert(!e.isInstanceOf[NoLeaderException])
      assert(GrpcLogClient.offsetErrorDetails(e).exists(_._1 == "offset out of range: 0"))
    }
  }

  test("refresh() re-resolves through a surviving member when the bootstrap dies (resolver.go:55-77)") {
    val log = SparkLog(spark, TestSpark.tempDir("balanced-log2"), LogConfig(maxStoreBytes = 256))
    var followerAddr = ""
    var leaderAddr = ""
    val followerSvc = new CountingService(
      log,
      "follower-0",
      followerAddr,
      leader = false,
      Seq(ServerInfo("leader", leaderAddr, isLeader = true))
    )
    val leaderSvc = new CountingService(
      log,
      "leader",
      leaderAddr,
      leader = true,
      Seq(ServerInfo("follower-0", followerAddr, isLeader = false))
    )
    val followerSrv = new GrpcLogServer(followerSvc, port = 0, anonymousSubject = "root").start()
    followerAddr = s"localhost:${followerSrv.boundPort}"
    val leaderSrv = new GrpcLogServer(leaderSvc, port = 0, anonymousSubject = "root").start()
    leaderAddr = s"localhost:${leaderSrv.boundPort}"

    val client = new BalancedLogClient("localhost", leaderSrv.boundPort)
    try {
      client.produce("before".getBytes)
      leaderSrv.stop()
      // Bootstrap (the leader) is gone; resolution must fall through to the
      // known follower and reads must keep working.
      client.refresh()
      assert(client.servers.exists(s => !s.isLeader))
      assert(new String(client.consume(0L).value) == "before")
    } finally {
      client.close()
      followerSrv.stop()
    }
  }
}
