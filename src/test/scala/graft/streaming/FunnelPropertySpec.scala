package graft.streaming

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import EventStreams.{FunnelFold, FunnelState}

/** Model check for the streaming funnel's core claim: for ANY split of an
  * event history into micro-batches and ANY nondecreasing watermark
  * schedule (each batch's watermark can lag arbitrarily, mimicking late
  * data), the concatenated incremental emissions equal the batch
  * reference fold over the complete ordered history — stage times are
  * immutable the moment they are emitted. Seeded, so failures replay.
  */
class FunnelPropertySpec extends AnyFunSuite {

  private val types = Vector("view", "click", "purchase")

  test("incremental emissions equal the batch fold under random batching + watermarks") {
    val rnd = new Random(4242)
    for (trial <- 0 until 300) {
      val n = 1 + rnd.nextInt(30)
      val windowMs = 1 + rnd.nextInt(40)
      // Dense timestamps force collisions, boundary hits (ts == t1 +
      // window), and pre-view clicks with high probability.
      val events = (0 until n).map(_ => (rnd.nextInt(60).toLong, types(rnd.nextInt(3))))

      // Random batch split: each event lands in one of up to 6 batches,
      // in arbitrary processing order within its batch.
      val nBatches = 1 + rnd.nextInt(6)
      val batches = Array.fill(nBatches)(scala.collection.mutable.ListBuffer.empty[(Long, String)])
      events.foreach(e => batches(rnd.nextInt(nBatches)) += e)

      // Nondecreasing watermark schedule; the engine guarantees no event
      // below the current watermark is ever DELIVERED, so events whose
      // batch's watermark has already passed them are dropped on arrival
      // (exactly what withWatermark does before flatMapGroupsWithState).
      var wm = 0L
      var st = FunnelState(Nil, None, None, None)
      val emitted = scala.collection.mutable.ListBuffer.empty[(String, Long)]
      val delivered = scala.collection.mutable.ListBuffer.empty[(Long, String)]
      batches.foreach { b =>
        val admitted = b.filter(_._1 >= wm).toList
        delivered ++= admitted
        val (st2, out) = FunnelFold.advance(st, admitted, wm, windowMs)
        st = st2
        emitted ++= out
        wm = math.max(wm, wm + rnd.nextInt(30))
      }
      // Final flush: watermark passes everything (stream end).
      val (stEnd, tail) = FunnelFold.advance(st, Nil, Long.MaxValue, windowMs)
      emitted ++= tail
      assert(stEnd.buffered.isEmpty)

      val expected = FunnelFold.reference(delivered.toList, windowMs)
      assert(
        emitted.toList == expected,
        s"trial $trial: incremental $emitted != batch $expected " +
          s"(events=$events batches=${batches.toList} window=$windowMs)"
      )
    }
  }
}
