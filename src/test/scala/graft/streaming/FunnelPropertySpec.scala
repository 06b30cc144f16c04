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

  /** Independent retention reference: one imperative pass over the ordered
    * history with the documented era rule — an event with ts strictly past
    * t3 + retention resets the stage machine. Written WITHOUT advanceEra so
    * the model check doesn't test the implementation against itself.
    */
  private def referenceWithRetention(
      events: Seq[(Long, String)],
      windowMs: Long,
      retentionMs: Long
  ): List[(String, Long)] = {
    val prio = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
    var (t1, t2, t3) = (Option.empty[Long], Option.empty[Long], Option.empty[Long])
    val out = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    events.sortBy { case (ms, tp) => (ms, prio(tp)) }.foreach { case (ms, tp) =>
      if (t3.isDefined && ms > t3.get + retentionMs) { t1 = None; t2 = None; t3 = None }
      if (t1.isEmpty) {
        if (tp == "view") { t1 = Some(ms); out += (("1_view", ms)) }
      } else if (t2.isEmpty) {
        if (tp == "click" && ms > t1.get && ms <= t1.get + windowMs) {
          t2 = Some(ms); out += (("2_click", ms))
        }
      } else if (t3.isEmpty) {
        if (tp == "purchase" && ms > t2.get && ms <= t2.get + windowMs) {
          t3 = Some(ms); out += (("3_purchase", ms))
        }
      }
    }
    out.toList
  }

  test("retention eras: incremental emissions equal the era-aware batch fold " +
    "under random batching + watermarks (incl. same-batch boundary jumps)") {
    val rnd = new Random(8181)
    for (trial <- 0 until 300) {
      val n = 1 + rnd.nextInt(30)
      val windowMs = 1 + rnd.nextInt(40)
      // Small retention relative to the timestamp range so multiple eras
      // are common, and single-batch watermark jumps larger than the
      // retention (the r7 ADVICE gap) happen regularly.
      val retentionMs = 1L + rnd.nextInt(25)
      val events = (0 until n).map(_ => (rnd.nextInt(200).toLong, types(rnd.nextInt(3))))

      val nBatches = 1 + rnd.nextInt(6)
      val batches = Array.fill(nBatches)(scala.collection.mutable.ListBuffer.empty[(Long, String)])
      events.foreach(e => batches(rnd.nextInt(nBatches)) += e)

      var wm = 0L
      var st = FunnelState(Nil, None, None, None)
      val emitted = scala.collection.mutable.ListBuffer.empty[(String, Long)]
      val delivered = scala.collection.mutable.ListBuffer.empty[(Long, String)]
      batches.foreach { b =>
        val admitted = b.filter(_._1 >= wm).toList
        delivered ++= admitted
        val (st2, out) = FunnelFold.advanceEra(st, admitted, wm, windowMs, Some(retentionMs))
        st = st2
        emitted ++= out
        // Watermark jumps up to 100ms — frequently larger than retention.
        wm = math.max(wm, wm + rnd.nextInt(100))
      }
      val (stEnd, tail) = FunnelFold.advanceEra(st, Nil, Long.MaxValue, windowMs, Some(retentionMs))
      emitted ++= tail
      assert(stEnd.buffered.isEmpty)

      val expected = referenceWithRetention(delivered.toList, windowMs, retentionMs)
      assert(
        emitted.toList == expected,
        s"trial $trial: incremental $emitted != batch $expected (events=$events " +
          s"batches=${batches.toList} window=$windowMs retention=$retentionMs)"
      )
    }
  }

  test("same-batch era rollover: an event past t3+retention arriving in the batch " +
    "that completes the purchase starts a fresh funnel (r7 ADVICE gap)") {
    val windowMs = 10L
    val retention = 5L
    // One batch, watermark already past everything: view@1 click@2
    // purchase@3 complete the funnel; view@20 is past 3+5=8 and must open
    // a NEW era in the same call.
    val batch = List((1L, "view"), (2L, "click"), (3L, "purchase"), (20L, "view"))
    val (st, out) =
      FunnelFold.advanceEra(FunnelState(Nil, None, None, None), batch, 100L, windowMs, Some(retention))
    assert(out == List(("1_view", 1L), ("2_click", 2L), ("3_purchase", 3L), ("1_view", 20L)))
    assert(st.t1 == Some(20L) && st.t3.isEmpty)
  }
}
