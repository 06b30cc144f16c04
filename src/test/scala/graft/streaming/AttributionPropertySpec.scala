package graft.streaming

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import EventStreams.{AttributionFold, AttributionState}

/** Model check for the streaming attribution's core claim: for ANY split of
  * an event history into micro-batches and ANY nondecreasing watermark
  * schedule, the concatenated incremental credits equal the batch reference
  * fold over the complete ordered history — a credited purchase is
  * immutable the moment it is emitted, never skipped, never duplicated,
  * and always credits the newest finalized non-purchase touch ("direct"
  * when none precedes). Seeded, so failures replay.
  */
class AttributionPropertySpec extends AnyFunSuite {

  private val types = Vector("view", "click", "purchase", "signup")

  test("incremental attribution credits equal the batch fold under random schedules") {
    val rnd = new Random(4242)
    for (trial <- 0 until 300) {
      val n = 1 + rnd.nextInt(30)
      // Dense timestamps force same-ms ties (the event_type tiebreak) and
      // cross-batch interleavings with high probability.
      val events = (0 until n).map { _ =>
        (rnd.nextInt(60).toLong, types(rnd.nextInt(4)), rnd.nextInt(10000).toLong)
      }

      val nBatches = 1 + rnd.nextInt(6)
      val batches =
        Array.fill(nBatches)(scala.collection.mutable.ListBuffer.empty[(Long, String, Long)])
      events.foreach(e => batches(rnd.nextInt(nBatches)) += e)

      var wm = 0L
      var st = AttributionState(Nil, None, None)
      val emitted = scala.collection.mutable.ListBuffer.empty[(String, Long, Long)]
      val delivered = scala.collection.mutable.ListBuffer.empty[(Long, String, Long)]
      batches.foreach { b =>
        // The engine never delivers an event below the current watermark.
        val admitted = b.filter(_._1 >= wm).toList
        delivered ++= admitted
        val (st2, out) = AttributionFold.advance(st, admitted, wm)
        st = st2
        emitted ++= out
        wm = math.max(wm, wm + rnd.nextInt(30))
      }
      val (stEnd, tail) = AttributionFold.advance(st, Nil, Long.MaxValue)
      emitted ++= tail
      assert(stEnd.pending.isEmpty)

      val expected = AttributionFold.reference(delivered.toList)
      assert(
        emitted.toList == expected,
        s"trial $trial: incremental $emitted != batch $expected " +
          s"(events=$events batches=${batches.toList})"
      )
      // Credit integrity: exactly one credited row per delivered purchase,
      // amounts preserved.
      val purchases = delivered.filter(_._2 == "purchase")
      assert(emitted.length == purchases.length, s"trial $trial: credit count")
      assert(
        emitted.map(_._2).sorted == purchases.map(_._3).sorted,
        s"trial $trial: credited cents drifted"
      )
    }
  }
}
