package graft.streaming

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import EventStreams.{TransitionFold, TransitionState}

/** Model check for the streaming transitions' core claim: for ANY split of
  * an event history into micro-batches and ANY nondecreasing watermark
  * schedule, the concatenated incremental emissions equal the batch
  * reference fold over the complete ordered history — a (from, to) pair is
  * immutable the moment it is emitted, and the chain never skips or
  * duplicates an edge. Seeded, so failures replay.
  */
class TransitionPropertySpec extends AnyFunSuite {

  private val types = Vector("view", "click", "purchase", "scroll")

  test("incremental transition emissions equal the batch fold under random schedules") {
    val rnd = new Random(1717)
    for (trial <- 0 until 300) {
      val n = 1 + rnd.nextInt(30)
      // Dense timestamps force same-ms ties (the event_type tiebreak) and
      // cross-batch interleavings with high probability.
      val events = (0 until n).map(_ => (rnd.nextInt(60).toLong, types(rnd.nextInt(4))))

      val nBatches = 1 + rnd.nextInt(6)
      val batches = Array.fill(nBatches)(scala.collection.mutable.ListBuffer.empty[(Long, String)])
      events.foreach(e => batches(rnd.nextInt(nBatches)) += e)

      var wm = 0L
      var st = TransitionState(Nil, None)
      val emitted = scala.collection.mutable.ListBuffer.empty[(String, String, Long, Long)]
      val delivered = scala.collection.mutable.ListBuffer.empty[(Long, String)]
      batches.foreach { b =>
        // The engine never delivers an event below the current watermark.
        val admitted = b.filter(_._1 >= wm).toList
        delivered ++= admitted
        val (st2, out) = TransitionFold.advance(st, admitted, wm)
        st = st2
        emitted ++= out
        wm = math.max(wm, wm + rnd.nextInt(30))
      }
      val (stEnd, tail) = TransitionFold.advance(st, Nil, Long.MaxValue)
      emitted ++= tail
      assert(stEnd.pending.isEmpty)

      val expected = TransitionFold.reference(delivered.toList)
      assert(
        emitted.toList == expected,
        s"trial $trial: incremental $emitted != batch $expected " +
          s"(events=$events batches=${batches.toList})"
      )
      // Chain integrity: n delivered events form exactly n-1 edges (when
      // any were delivered), each edge's from is the previous edge's to.
      if (delivered.nonEmpty)
        assert(emitted.length == delivered.length - 1, s"trial $trial: edge count")
      emitted.toList.sliding(2).foreach {
        case List(a, b) => assert(a._2 == b._1 && a._4 == b._3, s"trial $trial: chain broken")
        case _ =>
      }
    }
  }
}
