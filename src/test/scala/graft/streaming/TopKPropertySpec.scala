package graft.streaming

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import EventStreams.SpaceSaving

/** Model check for the SpaceSaving summary's guarantees (Metwally et al.
  * 2005) under random streams and random arrival orders: with N items and
  * capacity m,
  *   (1) estimate ≥ true count ≥ estimate − overestimate for every
  *       tracked key,
  *   (2) overestimate ≤ N/m,
  *   (3) every key with true count > N/m is tracked (no heavy hitter is
  *       ever lost),
  *   (4) with capacity ≥ distinct keys the summary is EXACT.
  * Seeded, so failures replay.
  */
class TopKPropertySpec extends AnyFunSuite {

  test("SpaceSaving guarantees hold over random streams and orders") {
    val rnd = new Random(515)
    for (trial <- 0 until 300) {
      val capacity = 2 + rnd.nextInt(30)
      val nKeys = 1 + rnd.nextInt(80)
      val n = 1 + rnd.nextInt(600)
      // Zipf-ish skew so genuine heavy hitters exist.
      val stream = (0 until n).map(_ => (math.pow(rnd.nextDouble(), 3) * nKeys).toLong)
      val shuffled = rnd.shuffle(stream)

      val counters = shuffled.foldLeft(Map.empty[Long, (Long, Long)])(
        (m, k) => SpaceSaving.add(m, k, capacity))
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = n.toDouble / capacity

      assert(counters.size <= capacity, s"trial $trial: capacity exceeded")
      counters.foreach { case (key, (est, over)) =>
        val t = truth.getOrElse(key, 0L)
        assert(est >= t, s"trial $trial: estimate $est under-counts true $t for $key")
        assert(est - over <= t,
          s"trial $trial: lower bound ${est - over} exceeds true $t for $key")
        assert(over <= bound + 1e-9, s"trial $trial: overestimate $over > N/m $bound")
      }
      truth.foreach { case (key, t) =>
        if (t > bound)
          assert(counters.contains(key),
            s"trial $trial: heavy hitter $key (true $t > N/m $bound) lost")
      }
      if (capacity >= truth.size) {
        assert(counters.view.mapValues(_._1).toMap == truth,
          s"trial $trial: capacity >= distinct keys must be exact")
        assert(counters.values.forall(_._2 == 0L))
      }
    }
  }
}
