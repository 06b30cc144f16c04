package graft.server

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Randomized contract guard for the geometric-bucket histogram: on
  * arbitrary sample sets the reported percentiles must bracket the true
  * order statistics within one 2× bucket (the documented resolution), stay
  * monotone in q, and survive concurrent recording without losing counts.
  * Seeded, so failures replay.
  */
class LatencyHistogramPropertySpec extends AnyFunSuite {

  private def exactPercentile(sorted: Seq[Long], q: Double): Long =
    sorted(math.min(sorted.size - 1, math.max(0, math.ceil(q * sorted.size).toInt - 1)))

  test("percentiles bracket the true order statistic within one 2x bucket (seeded random)") {
    val rnd = new Random(42)
    for (trial <- 0 until 50) {
      val n = 1 + rnd.nextInt(2000)
      // Mix magnitudes: microseconds to minutes, heavy-tailed like RPC
      // latencies actually are.
      val samples = Seq.fill(n)(math.abs(rnd.nextLong() % (1L << (10 + rnd.nextInt(30)))) + 1000L)
      val h = new LatencyHistogram
      samples.foreach(h.record)
      val s = h.snapshot()
      assert(s.count == n.toLong, s"trial $trial: lost samples")
      val sorted = samples.sorted
      for ((q, got) <- Seq((0.50, s.p50Millis), (0.95, s.p95Millis), (0.99, s.p99Millis))) {
        val exactMs = exactPercentile(sorted, q) / 1e6
        // The reported value is the 2x bucket's upper bound: never below
        // the true value, never more than 2x above (plus the 1µs floor).
        assert(got >= exactMs * 0.999,
          s"trial $trial q=$q: reported $got below exact $exactMs")
        assert(got <= math.max(exactMs * 2.001, 0.003),
          s"trial $trial q=$q: reported $got beyond 2x exact $exactMs")
      }
      assert(s.p50Millis <= s.p95Millis && s.p95Millis <= s.p99Millis, "monotone in q")
      assert(math.abs(s.maxMillis - sorted.last / 1e6) < 1e-9, "max is exact")
    }
  }

  test("concurrent recording loses no samples") {
    val h = new LatencyHistogram
    val threads = (0 until 8).map { t =>
      new Thread(() => (0 until 10000).foreach(i => h.record(1000L * (1 + (i % 1000)))), s"hist-$t")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    assert(h.snapshot().count == 80000L)
  }
}
