package graft.queries

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** corpus_repeat_apply against an independent plain-Scala reference on
  * random corpora (the third-implementation pattern): the DuckDB oracle
  * already re-derives it in SQL at four corpus scales; this spec
  * re-derives the semantics imperatively — mixture targets, the 4-epoch
  * cap, full-epoch fan-out and the md5-order partial prefix — and
  * asserts the full row multiset plus the two contracts that make the
  * query a training recipe:
  *
  *   1. per-source emitted token mass COVERS effective_tokens and
  *      overshoots only into the final admitted doc (the token_budget
  *      admit-while-below rule: < one doc past the target; exact when
  *      the remainder is zero);
  *   2. the partial epoch is a PREFIX of the deterministic md5 order —
  *      resumable consumption depends on it.
  */
class RepeatApplyPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def round6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("random corpora: row multiset, mass identity and prefix property hold") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (trial <- 0 until 4) {
      val nSrc = 2 + rnd.nextInt(5)
      val docs = (0 until (40 + rnd.nextInt(160))).map { i =>
        val n = 1 + rnd.nextInt(50)
        (i.toLong, "en", s"s${rnd.nextInt(nSrc)}",
          Seq.fill(n)(s"w${rnd.nextInt(300)}").mkString(" "))
      }
      val dir = TestSpark.tempDir(s"repeat-apply-$trial")
      docs.toDF("doc_id", "lang", "source", "text")
        .write.parquet(s"$dir/documents.parquet")

      // --- reference: exact-integer plan + imperative expansion ---
      val tok = docs.map(d => (d._1, d._3, d._4.trim.toLowerCase.split(" ", -1).length.toLong))
      val mass = tok.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val pwInt = mass.view.mapValues(m => (round6(math.pow(m.toDouble, 0.7)) * 1000000).toBigInt).toMap
      val totPw = pwInt.values.sum
      val budget = BigInt(3) * BigInt(mass.values.sum)
      val expected = scala.collection.mutable.Buffer.empty[(Long, String, Long, Long)]
      for (src <- mass.keys) {
        val target = (pwInt(src) * budget / totPw).toLong
        val eff = math.min(target, 4 * mass(src))
        val full = eff / mass(src)
        val rem = eff % mass(src)
        val srcDocs = tok.filter(_._2 == src)
        for ((id, _, n) <- srcDocs; e <- 0L until full) expected += ((id, src, e, n))
        // Partial epoch: bucket-major md5 order (bucket asc, then (h, id)),
        // docs admitted while tokens_before < rem.
        val ordered = srcDocs.sortBy { case (id, _, _) =>
          ((BigInt(md5hex(id.toString).take(15), 16) % 32).toLong, md5hex(id.toString), id)
        }
        var before = 0L
        for ((id, _, n) <- ordered) {
          if (before < rem) expected += ((id, src, full, n))
          before += n
        }
      }

      val got = SparkEntry.queries("corpus_repeat_apply")(spark, dir)
        .as[(Long, String, Long, Long)].collect().toSeq
      Checkpoints.release()
      assert(got.sorted == expected.sorted.toSeq,
        s"trial $trial: row multiset diverged (${got.size} vs ${expected.size} rows)")

      // Contract 1: emitted mass covers effective_tokens, overshooting
      // only into the final admitted doc (exact when the remainder is 0).
      val emitted = got.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
      for (src <- mass.keys) {
        val eff = math.min((pwInt(src) * budget / totPw).toLong, 4 * mass(src))
        val e = emitted.getOrElse(src, 0L)
        val maxDoc = tok.filter(_._2 == src).map(_._3).max
        if (eff % mass(src) == 0)
          assert(e == eff, s"trial $trial: source $src zero-remainder mass $e != $eff")
        else
          assert(e >= eff && e < eff + maxDoc,
            s"trial $trial: source $src emitted $e outside [$eff, $eff+$maxDoc)")
      }

      // Contract 2: within each source, the partial epoch's doc set is a
      // PREFIX of the deterministic order (no holes).
      for (src <- mass.keys) {
        val full = {
          val eff = math.min((pwInt(src) * budget / totPw).toLong, 4 * mass(src))
          eff / mass(src)
        }
        val partIds = got.filter(r => r._2 == src && r._3 == full).map(_._1).toSet
        val ordered = tok.filter(_._2 == src).sortBy { case (id, _, _) =>
          ((BigInt(md5hex(id.toString).take(15), 16) % 32).toLong, md5hex(id.toString), id)
        }.map(_._1)
        val prefix = ordered.takeWhile(partIds.contains)
        assert(prefix.toSet == partIds,
          s"trial $trial: source $src partial epoch is not an order prefix")
      }
    }
  }
}
