package graft.server

import org.scalatest.funsuite.AnyFunSuite

/** The φ accrual failure detector (Hayashibara et al. 2004) that upgrades
  * TTL liveness to Serf-grade adaptive detection: suspicion grows with
  * silence measured against the member's OWN heartbeat inter-arrival
  * distribution, so a jittery-but-alive member gets proportionally more
  * slack than a metronome-regular one — the property a fixed TTL cannot
  * have. All tests drive an injected clock; nothing sleeps.
  */
class PhiAccrualSpec extends AnyFunSuite {

  test("phi is monotone in silence, ~log10(2) at the mean, and shrinks with variance") {
    val atMean = PhiAccrual.phi(100.0, 100.0, 10.0)
    assert(math.abs(atMean - math.log10(2.0)) < 0.05, s"phi(mean) was $atMean")
    val phis = (100 to 600 by 25).map(t => PhiAccrual.phi(t.toDouble, 100.0, 10.0))
    assert(phis.zip(phis.tail).forall { case (a, b) => b >= a }, s"not monotone: $phis")
    // Same silence, wider distribution -> lower suspicion.
    assert(PhiAccrual.phi(300.0, 100.0, 100.0) < PhiAccrual.phi(300.0, 100.0, 10.0))
    // Deep tail stays finite and ordered (no cancellation blow-up).
    val deep = PhiAccrual.phi(10000.0, 100.0, 10.0)
    assert(deep > 100 && !deep.isInfinite)
  }

  test("phi properties hold across random interval distributions (seeded)") {
    // 100 random (mean, std) regimes: suspicion is non-decreasing in
    // silence, never NaN/∞/negative, and the time to cross the φ=8
    // eviction threshold grows with the distribution's spread — the
    // adaptivity property, quantified.
    val rnd = new scala.util.Random(42)
    def crossingTime(mean: Double, std: Double): Double = {
      var t = mean
      while (PhiAccrual.phi(t, mean, std) <= 8.0) t += mean / 100.0
      t
    }
    for (_ <- 0 until 100) {
      val mean = 50 + rnd.nextDouble() * 1000
      val std = 1 + rnd.nextDouble() * mean
      val phis = (0 until 40).map(i => PhiAccrual.phi(mean * i / 8.0, mean, std))
      assert(phis.zip(phis.tail).forall { case (a, b) => b >= a - 1e-9 },
        s"not monotone at mean=$mean std=$std: $phis")
      assert(phis.forall(p => p >= 0 && !p.isNaN && !p.isInfinite))
      val tight = crossingTime(mean, std)
      val loose = crossingTime(mean, std * 3)
      assert(loose > tight, s"wider spread must buy more slack: $tight vs $loose")
    }
  }

  test("a regular member evicts within a few missed beats; a jittery one rides out the same gap") {
    var now = 0L
    def detector() = new Membership(
      ServerInfo("local", "h:0", isLeader = true),
      // TTL is mandatory with phi (bootstrap window); huge here so phi —
      // which governs once samples exist — is the only live detector.
      ttlMillis = 1000000L,
      phiThreshold = 8.0,
      phiMinSamples = 3,
      phiMinStdMillis = 1.0, // tight floor so the regular member's variance is its own
      clock = () => now
    )
    val info = ServerInfo("peer", "h:1", isLeader = false)

    // Metronome member: beats exactly every 100 ms.
    val regular = detector()
    (0 until 10).foreach { _ => regular.join(info); now += 100 }
    now -= 100 // `now` = the last beat
    now += 120 // 120 ms of silence ≈ y=20 with the 1 ms floor
    assert(!regular.list.exists(_.id == "peer"),
      "a metronome member silent for 1.2 intervals must be evicted")

    // Jittery member: same mean interval (100 ms) but alternating 40/160.
    now = 0L
    val jittery = detector()
    var beat = 0
    (0 until 10).foreach { _ =>
      jittery.join(info)
      now += (if (beat % 2 == 0) 40 else 160); beat += 1
    }
    now -= (if ((beat - 1) % 2 == 0) 40 else 160)
    val silenceStart = now
    now = silenceStart + 120
    assert(jittery.list.exists(_.id == "peer"),
      "the same 120 ms gap must NOT evict a member whose own beats vary by ±60 ms")
    assert(jittery.phiOf("peer") < 8.0)
    // But real death is still detected — just later, scaled to its jitter.
    now = silenceStart + 1000
    assert(!jittery.list.exists(_.id == "peer"),
      "a second of silence must evict even the jittery member")
  }

  test("bootstrap: TTL governs until the member has enough interval history") {
    var now = 0L
    val m = new Membership(
      ServerInfo("local", "h:0", isLeader = true),
      ttlMillis = 500L,
      phiThreshold = 8.0,
      phiMinSamples = 5,
      clock = () => now
    )
    val info = ServerInfo("peer", "h:1", isLeader = false)
    m.join(info) // 0 intervals recorded — phi cannot judge yet
    now += 501
    assert(!m.list.exists(_.id == "peer"), "TTL must evict during the phi bootstrap window")

    // With history below phiMinSamples the TTL still governs; once at or
    // above it, phi takes over (and is MORE tolerant here: the TTL would
    // have evicted at 501 ms, phi with ~200 ms beats evicts later).
    now += 10000 // clear the implicit tombstone-free rejoin window
    // 6 announcements = 5 recorded intervals = phiMinSamples reached.
    (0 until 6).foreach { _ => m.join(info); now += 200 }
    now -= 200
    now += 700 // past the 500 ms TTL, but phi(700 ms | mean 200, floor 100) < 8
    assert(m.list.exists(_.id == "peer"),
      "phi must govern once history exists — the fixed TTL no longer applies")
    now += 2000
    assert(!m.list.exists(_.id == "peer"), "silence eventually evicts under phi too")
  }

  test("an evicted member's window resets: a revival starts a fresh history") {
    var now = 0L
    val m = new Membership(
      ServerInfo("local", "h:0", isLeader = true),
      ttlMillis = 1000000L, // mandatory bootstrap window; inert in this test
      phiThreshold = 8.0,
      phiMinSamples = 2,
      phiMinStdMillis = 1.0,
      clock = () => now
    )
    val info = ServerInfo("peer", "h:1", isLeader = false)
    (0 until 5).foreach { _ => m.join(info); now += 100 }
    now += 1000
    assert(!m.list.exists(_.id == "peer"))
    // Late heartbeat revives the member (a phi eviction is a failure
    // verdict, not a departure — no tombstone), with no stale intervals.
    m.join(info)
    assert(m.list.exists(_.id == "peer"))
    assert(m.phiOf("peer") == 0.0, "revived member must start with an empty window")
  }

  test("phi without a TTL is rejected at construction — the bootstrap hole") {
    // A member that dies before accumulating phiMinSamples intervals can
    // only be evicted by the TTL; with ttlMillis = 0 it would linger in
    // GetServers forever. The constructor closes that configuration off.
    val e = intercept[IllegalArgumentException] {
      new Membership(
        ServerInfo("local", "h:0", isLeader = true),
        ttlMillis = 0L,
        phiThreshold = 8.0
      )
    }
    assert(e.getMessage.contains("ttlMillis"))
  }
}
