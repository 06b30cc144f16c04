package graft.server

import java.util.concurrent.atomic.{AtomicLong, AtomicLongArray}

/** Immutable percentile snapshot (milliseconds). */
final case class LatencySnapshot(
    count: Long,
    p50Millis: Double,
    p95Millis: Double,
    p99Millis: Double,
    maxMillis: Double
)

/** Lock-free streaming latency histogram — the stand-in for the latency
  * distribution the reference's default gRPC server views record
  * (reference: internal/server/server.go:52-60 registers
  * ocgrpc.DefaultServerViews, whose ServerLatency view is a bucketed
  * distribution; percentiles fall out of the buckets the same way here).
  *
  * Geometric buckets, 2× wide, from 1 µs to ~18 min: recording is one
  * `numberOfLeadingZeros` + one atomic increment (no allocation, no lock —
  * safe on the gRPC event loop), and the 2× spacing bounds any reported
  * percentile within a factor of 2 of the true value at every magnitude,
  * which is the resolution an ops "is p99 1 ms or 1 s?" question needs.
  * Reads are racy-by-design snapshots: bucket counts are summed without a
  * barrier, so a concurrent record may or may not be included — exactly
  * the semantics of every sampled metrics registry.
  */
final class LatencyHistogram {
  import LatencyHistogram.Buckets

  private val buckets = new AtomicLongArray(Buckets)
  private val total = new AtomicLong()
  private val maxNanos = new AtomicLong()

  def record(elapsedNanos: Long): Unit = {
    val micros = math.max(elapsedNanos / 1000L, 1L)
    // bucket i covers [2^i, 2^(i+1)) µs
    val idx = math.min(63 - java.lang.Long.numberOfLeadingZeros(micros), Buckets - 1)
    buckets.incrementAndGet(idx.toInt)
    total.incrementAndGet()
    var prev = maxNanos.get()
    while (elapsedNanos > prev && !maxNanos.compareAndSet(prev, elapsedNanos))
      prev = maxNanos.get()
  }

  /** Upper bound of the bucket holding the q-th ranked sample, in ms. */
  private def percentile(q: Double, counts: Array[Long], n: Long): Double = {
    if (n == 0) return 0.0
    val rank = math.max(1L, math.ceil(q * n).toLong)
    var seen = 0L
    var i = 0
    while (i < counts.length) {
      seen += counts(i)
      if (seen >= rank) return math.pow(2.0, (i + 1).toDouble) / 1000.0 // µs → ms
      i += 1
    }
    math.pow(2.0, counts.length.toDouble) / 1000.0
  }

  def snapshot(): LatencySnapshot = {
    val counts = Array.tabulate(Buckets)(buckets.get)
    val n = counts.sum // consistent with the copied counts, not `total`
    val max = maxNanos.get() / 1e6
    // Percentiles report bucket upper bounds while max is exact; clamp so a
    // snapshot never shows p50 > max (all samples at 1.5 ms would otherwise
    // read p50=2.048, max=1.5 — nonsense on the ops surface).
    def clamped(q: Double): Double = {
      val p = percentile(q, counts, n)
      if (max > 0.0) math.min(p, max) else p
    }
    LatencySnapshot(
      count = n,
      p50Millis = clamped(0.50),
      p95Millis = clamped(0.95),
      p99Millis = clamped(0.99),
      maxMillis = max
    )
  }
}

object LatencyHistogram {
  /** 40 geometric buckets: 2^0 µs up to 2^40 µs ≈ 18 minutes. */
  val Buckets = 40
}
