package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Vocabulary-scale behaviour of the exact-Jaccard pipeline: above
  * [[Dedup.MaxBitmapBlocks]] the verify step must switch from scalar bitmap
  * columns to sorted-array intersection WITHOUT changing results. The
  * sf-testdata corpora never cross the cap, so this spec builds a synthetic
  * corpus whose vocabulary (>100k words) forces the array path and checks
  * the emitted pairs against a brute-force Jaccard computed in plain Scala.
  */
class DedupScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("jaccard pairs are exact on a mid-size vocabulary (prefix + bitmap path)") {
    // Covers the middle strategy branch: > 512 words (so the tiny-universe
    // all-pairs path is skipped) but << 32k (so verification uses packed
    // bitmap columns, not the array fallback).
    import spark.implicits._
    val docs = (0 until 80).map { i =>
      val base = (i / 2) * 40
      val words =
        if (i % 2 == 0) (0 until 36).map(j => s"w${base + j}")
        else (0 until 32).map(j => s"w${base + j}") ++ (0 until 4).map(j => s"y${base + j}")
      (i.toLong, "en", words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "lang", "text")
    val vocabSize = df
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct()
      .count()
    assert(
      vocabSize > Dedup.SmallVocabBlocks * 64L && vocabSize <= Dedup.MaxBitmapBlocks * 64L,
      s"vocab $vocabSize does not exercise the middle branch"
    )
    val got = Dedup
      .jaccardPairsFrom(spark, df)
      .select("d1", "d2", "jaccard")
      .as[(Long, Long, Double)]
      .collect()
      .toSet
    val sets = docs.map { case (id, _, text) => id -> text.split(" ").toSet }
    val expected = (for {
      (i, a) <- sets
      (j, b) <- sets
      if i < j
      inter = (a & b).size
      jac = inter.toDouble / (a.size + b.size - inter)
      if jac >= 0.6
    } yield (i, j, jac)).toSet
    assert(expected.nonEmpty, "synthetic corpus produced no expected pairs")
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
  }

  test("jaccard pairs are exact on a 100k-word vocabulary (array fallback path)") {
    import spark.implicits._
    // 200 docs x 520 mostly-unique words = ~104k distinct words >> the
    // 32,768-word bitmap cap. Every even doc 2k shares 90% of its words
    // with doc 2k+1 (a true near-dup pair); odd-even neighbours across
    // pair boundaries share nothing.
    val docs = (0 until 200).map { i =>
      val base = (i / 2) * 1000
      val words =
        if (i % 2 == 0) (0 until 520).map(j => s"w${base + j}")
        else (0 until 468).map(j => s"w${base + j}") ++ (0 until 52).map(j => s"x${base + j}")
      (i.toLong, "en", words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "lang", "text")

    // The corpus really crosses the bitmap cap.
    val vocabSize = df
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct()
      .count()
    assert(vocabSize > Dedup.MaxBitmapBlocks * 64L, s"vocab $vocabSize does not exercise the fallback")

    val got = Dedup
      .jaccardPairsFrom(spark, df)
      .select("d1", "d2", "jaccard")
      .as[(Long, Long, Double)]
      .collect()
      .toSet

    // Brute-force oracle over the word sets (n=200 is fine driver-side).
    val sets = docs.map { case (id, _, text) => id -> text.split(" ").toSet }
    val expected = (for {
      (i, a) <- sets
      (j, b) <- sets
      if i < j
      inter = (a & b).size
      jac = inter.toDouble / (a.size + b.size - inter)
      if jac >= 0.6
    } yield (i, j, jac)).toSet

    assert(expected.nonEmpty, "synthetic corpus produced no expected pairs")
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
  }

  test("clustering collapses clone cliques and merges across near-dup groups") {
    // Hand-built corpus with known components, exercising the set-collapse
    // path end to end: clone cliques (identical token sets), a cross-group
    // near-dup merge (J = 4/6 ≥ 0.6), language blocking (same words,
    // different lang stays apart), and the singleton fallback.
    import spark.implicits._
    val docs = Seq(
      (0L, "en", "a b c d e"), // group A: clones 0,1,2
      (1L, "en", "a b c d e"),
      (2L, "en", "e d c b a"), // same SET, different order — still group A
      (3L, "en", "a b c d f"), // group B: J(A,B) = 4/6 → merges with A
      (4L, "en", "a b c d f"),
      (5L, "en", "x y z w v"), // group C: disjoint from A/B
      (6L, "en", "x y z w v"),
      (7L, "en", "p q r s t"), // singleton
      (8L, "zh", "a b c d e")  // A's words, other lang — lang-blocked
    )
    val dir = java.nio.file.Files.createTempDirectory("dedup-clique").toString
    docs.toDF("doc_id", "lang", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    try {
      val got = graft.SparkEntry.queries("dedup_clusters")(spark, dir)
        .as[(Long, Long)].collect().toMap
      val expected = Map(
        0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
        5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L)
      assert(got == expected, s"cluster labels diverged: $got")

      // The quantified MinHash contract on the same corpus: 11 exact pairs
      // (C(3,2)=3 within A, 1 within B, 3·2 across A×B, 1 within C), full
      // recall and zero spurious pairs at the fixed seed.
      val row = graft.SparkEntry.queries("dedup_minhash")(spark, dir).collect().head
      assert(row.getLong(0) == 11L, s"n_exact = ${row.getLong(0)}, expected 11")
      assert(row.getBoolean(1), "recall contract failed on the clique corpus")
      assert(row.getBoolean(2), "precision contract failed on the clique corpus")
    } finally {
      graft.queries.Checkpoints.release()
    }
  }

  test("char-trigram jaccard catches typo near-dups word-level jaccard misses") {
    import spark.implicits._
    // Typo corpus: doc 1 is doc 0 with a character-level typo in EVERY
    // word (a trailing 's'), so their WORD sets are fully disjoint
    // (word-Jaccard 0) while long words keep the trigram sets ~75%
    // overlapping — the case the n-gram variant exists for. Docs 2/3 are
    // trigram-disjoint controls, 4 is a clone of 0.
    val docs = Seq(
      (0L, "en", "internationalization standardization characterization industrialization misunderstanding responsibilities"),
      (1L, "en", "internationalizations standardizations characterizations industrializations misunderstandings responsibilitiess"),
      (2L, "en", "zzz qqq vvv kkk jjj www"),
      (3L, "en", "xyx pqp fgf hjh bnb mnm"),
      (4L, "en", "internationalization standardization characterization industrialization misunderstanding responsibilities")
    )
    val dir = java.nio.file.Files.createTempDirectory("dedup-ngram").toString
    docs.toDF("doc_id", "lang", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    try {
      val got = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
        .as[(Long, Long, Double)].collect().toSet

      // Brute-force trigram oracle in plain Scala.
      def tris(text: String): Set[String] = {
        val t = text.toLowerCase.trim
        val n = math.max(t.length - 2, 1)
        (1 to n).map(i => t.substring(i - 1, math.min(i + 2, t.length))).toSet
      }
      val sets = docs.map { case (id, _, text) => id -> tris(text) }
      val expected = (for {
        (i, a) <- sets
        (j, b) <- sets
        if i < j
        inter = (a & b).size
        jac = inter.toDouble / (a.size + b.size - inter)
        if jac >= 0.6
      } yield (i, j, jac)).toSet
      assert(got == expected, s"got $got, expected $expected")

      // The motivating asymmetry: the typo pair (0,1) is trigram-caught...
      assert(got.exists { case (d1, d2, _) => d1 == 0L && d2 == 1L })
      // ...but invisible to word-set jaccard (every word differs).
      val wordPairs = graft.SparkEntry.queries("dedup_jaccard")(spark, dir)
        .as[(Long, Long, Double)].collect().toSet
      assert(!wordPairs.exists { case (d1, d2, _) => d1 == 0L && d2 == 1L })
      // The exact clone pair is caught by both.
      assert(got.exists { case (d1, d2, j) => d1 == 0L && d2 == 4L && j == 1.0 })
      assert(wordPairs.exists { case (d1, d2, j) => d1 == 0L && d2 == 4L && j == 1.0 })
    } finally {
      graft.queries.Checkpoints.release()
    }
  }

  test("containment pairs are exact on a degenerate vocabulary (triangle escape path)") {
    // ≤512-word universe: the prefix meet is information-free, so the
    // strategy probe must route to the triangle all-pairs bitmap branch —
    // and the result must still be the exact containment relation, BOTH
    // directions (containment is asymmetric: a small doc contained in a
    // big one pairs one way only). Brute-force oracle in plain Scala.
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 300).map(i => s"w$i") // < SmallVocabBlocks*64 = 512
    val base = (0 until 150).map { i =>
      val n = 12 + rnd.nextInt(25)
      val ws = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).distinct
      (i.toLong, "en", ws.mkString(" "))
    }
    // Planted exact quote ACROSS langs (containment ignores lang): doc 1000
    // holds a 10-word subset of doc 0's tokens.
    val quote = (1000L, "fr", base.head._3.split(" ").take(10).mkString(" "))
    val all = base :+ quote
    val dir = TestSpark.tempDir("containment-tiny")
    all.toDF("doc_id", "lang", "text").write.parquet(s"$dir/documents.parquet")

    val got = graft.SparkEntry
      .queries("dedup_containment")(spark, dir)
      .select("contained", "container", "inter")
      .as[(Long, Long, Long)]
      .collect()
      .toSet
    Checkpoints.release()

    val sets = all.map { case (id, _, text) => id -> text.split(" ").toSet }
    val expected = (for {
      (i, a) <- sets
      (j, b) <- sets
      if i != j && (a & b).size * 20 >= 19 * a.size
    } yield (i, j, (a & b).size.toLong)).toSet
    assert(expected.exists(_._1 == 1000L), "planted quote produced no contained pair")
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}; " +
      s"missing=${(expected -- got).take(5)} spurious=${(got -- expected).take(5)}")
  }

  test("containment pairs are exact on a realistic vocabulary (prefix-probe path)") {
    // The sf-testdata's 31-word universe makes containment trivially dense;
    // this corpus has a ~5k-word vocabulary where the rare-first prefix
    // actually prunes. Planted structure: every 4th base doc gets a "quote"
    // doc holding a 10-word subset of it (containment 1.0 → pair) and a
    // "tainted quote" holding 9 of those words plus one foreign token
    // (containment 0.9 < 19/20 → must NOT pair). Verified against
    // brute-force set containment in plain Scala.
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = (0 until 120).map { i =>
      val words = (0 until 40).map(_ => s"v${rnd.nextInt(5000)}").distinct
      (i.toLong, words)
    }
    var nextId = 1000L
    val extra = base.collect {
      case (id, words) if id % 4 == 0 && words.size >= 12 =>
        val quote = words.take(10)
        val tainted = words.slice(1, 10) :+ s"x$id"
        val q = (nextId, quote); val t = (nextId + 1, tainted)
        nextId += 2
        Seq(q, t)
    }.flatten
    val docs = (base ++ extra).map { case (id, ws) => (id, "en", ws.mkString(" ")) }
    val dir = TestSpark.tempDir("containment-vocab")
    docs.toDF("doc_id", "lang", "text").write.parquet(s"$dir/documents.parquet")

    val got = graft.SparkEntry
      .queries("dedup_containment")(spark, dir)
      .select("contained", "container")
      .as[(Long, Long)]
      .collect()
      .toSet
    Checkpoints.release()

    val sets = docs.map { case (id, _, text) => id -> text.split(" ").toSet }
    val expected = (for {
      (i, a) <- sets
      (j, b) <- sets
      if i != j && (a & b).size * 20 >= 19 * a.size
    } yield (i, j)).toSet
    assert(expected.exists { case (i, j) => i >= 1000L && j < 1000L },
      "planted quotes produced no contained pair")
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}; " +
      s"missing=${(expected -- got).take(5)} spurious=${(got -- expected).take(5)}")
  }

  test("substring removal decisions match a single-node reference on a Zipf corpus") {
    // Lee et al.-style substring dedup at a corpus scale the sf-testdata
    // doesn't reach: 1500 Zipf-sampled docs (natural window collisions)
    // plus planted boilerplate (a shared banner) and cross-doc chunk
    // reuse. The reference implementation stitches spans over the raw
    // window TEXT — so this also checks that md5 window hashing is an
    // honest stand-in for string equality.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val k = 10
    val vocab = (0 until 300).map(i => s"z$i")
    val weights = vocab.indices.map(r => 1.0 / (r + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    def zipfWord(): String = {
      val x = rnd.nextDouble() * total
      vocab(cum.indexWhere(x <= _))
    }
    val banner = (0 until 15).map(_ => zipfWord()).mkString(" ")
    val bodies = scala.collection.mutable.ArrayBuffer.empty[String]
    val docs = (0 until 1500).map { i =>
      val n = 20 + rnd.nextInt(40)
      var words = (0 until n).map(_ => zipfWord())
      if (i % 7 == 3) { // shared banner boilerplate at a random cut point
        val at = rnd.nextInt(words.size)
        words = words.take(at) ++ banner.split(" ") ++ words.drop(at)
      }
      if (i % 13 == 5 && bodies.nonEmpty) { // verbatim chunk reuse
        val src = bodies(rnd.nextInt(bodies.size)).split(" ")
        if (src.length >= 12) {
          val off = rnd.nextInt(src.length - 11)
          words = words ++ src.slice(off, off + 12)
        }
      }
      val text = words.mkString(" ")
      bodies += text
      (i.toLong, "en", text)
    }
    val dir = TestSpark.tempDir("substr-zipf")
    docs.toDF("doc_id", "lang", "text").write.parquet(s"$dir/documents.parquet")

    val got = graft.SparkEntry
      .queries("dedup_substring")(spark, dir)
      .as[(Long, Long, Long, Long)]
      .collect()
      .toSeq

    // Single-node reference over raw window text.
    val occs = docs.flatMap { case (id, _, text) =>
      val w = text.toLowerCase.trim.split(" ")
      if (w.length < k) Nil
      else (1 to w.length - k + 1).map(p => (id, p.toLong, w.slice(p - 1, p - 1 + k).mkString(" ")))
    }
    val firstKey = occs.groupBy(_._3).map { case (win, os) =>
      win -> os.map(o => o._1 * 100000L + o._2).min
    }
    val expected = occs
      .filter(o => o._1 * 100000L + o._2 > firstKey(o._3))
      .groupBy(_._1)
      .toSeq
      .map { case (id, os) =>
        val ps = os.map(_._2).sorted
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        ps.foreach { p =>
          if (spans.nonEmpty && p - spans.last._2 <= k) spans(spans.size - 1) = (spans.last._1, p)
          else spans += ((p, p))
        }
        val lens = spans.map { case (sp, ep) => ep - sp + k }
        (id, spans.size.toLong, lens.sum, lens.max)
      }
      .sortBy(_._1)
    assert(expected.nonEmpty && expected.exists(_._2 > 1), "corpus must produce real spans")
    assert(got == expected, s"got ${got.size} rows, expected ${expected.size}")

    // APPLY agreement on the same corpus: the cleaned output must equal
    // removing the union of removable windows from the raw text (span
    // coverage == window union because gaps > k split spans).
    val coveredByDoc: Map[Long, Set[Long]] = occs
      .filter(o => o._1 * 100000L + o._2 > firstKey(o._3))
      .groupBy(_._1)
      .map { case (id, os) => id -> os.flatMap(o => o._2 until (o._2 + k)).toSet }
    val gotApply = graft.SparkEntry
      .queries("dedup_substring_apply")(spark, dir)
      .as[(Long, Long, Long, String)]
      .collect()
      .toSeq
      .sortBy(_._1)
    val expApply = docs.map { case (id, _, text) =>
      val w = text.toLowerCase.trim.split(" ")
      val covered = coveredByDoc.getOrElse(id, Set.empty[Long])
      val kept = w.zipWithIndex.collect { case (t, i) if !covered((i + 1).toLong) => t }
      val md = java.security.MessageDigest
        .getInstance("MD5")
        .digest(kept.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_))
        .mkString
      (id, w.length.toLong, kept.length.toLong, md)
    }.sortBy(_._1)
    assert(expApply.exists(r => r._3 < r._2), "apply must actually remove tokens somewhere")
    assert(gotApply == expApply, "cleaned corpus differs from the single-node reference")
  }

  test("edit-distance blocks are capped against a planted hot boilerplate prefix") {
    // The skew adversary: 10k web pages opening with identical boilerplate
    // share one 16-char prefix block. Uncapped, that block is a ~50M-pair
    // quadratic join group (the ItemSimUserCap skew class); capped, it
    // contributes at most cap·(cap−1)/2 pairs from the deterministic
    // smallest-doc_id members — which is also why this test finishes in
    // seconds instead of minutes.
    import spark.implicits._
    val boiler = "<!doctype html> " // exactly the 16-char block key
    val hot = (0 until 10000).map(i => (i.toLong, "en", s"$boiler page $i body ${"x" * (i % 7)}"))
    // Organic tail: ten 3-doc blocks with distinct prefixes (below any cap).
    val organic = (0 until 30).map { i =>
      val g = i / 3
      (100000L + i, "en", f"organicprefix$g%03d tail variant $i word$i")
    }
    val df = (hot ++ organic).toDF("doc_id", "lang", "text")

    val cap = 50
    // (a) deterministic membership: the hot block keeps exactly its `cap`
    //     smallest doc ids; small organic blocks are untouched.
    val kept = Dedup.editBlocked(df, cap).select("doc_id").as[Long].collect().toSet
    assert(kept.filter(_ < 100000L) == (0L until cap.toLong).toSet, "hot block not capped to smallest ids")
    assert(organic.map(_._1).toSet.subsetOf(kept), "organic blocks must be untouched by the cap")

    // (b) the pair bound — the whole point of the guard.
    val pairs = Dedup.editDistancePairs(df, cap)
    val hotPairs = pairs.filter(col("d1") < 100000L).count()
    assert(hotPairs <= cap.toLong * (cap - 1) / 2, s"hot block produced $hotPairs pairs")
    assert(hotPairs > 0, "planted near-identical boilerplate must produce pairs")

    // (c) below-cap equivalence: on a corpus whose largest block is under
    //     the default cap, the capped pipeline is byte-identical to the
    //     uncapped join — why the CORRECTNESS oracle (uncapped SQL) still
    //     matches at every test SF.
    val small = (hot.take(30) ++ organic).toDF("doc_id", "lang", "text")
    val capped = Dedup.editDistancePairs(small).collect().toSeq
    val uncapped = Dedup.editDistancePairs(small, Int.MaxValue).collect().toSeq
    assert(capped == uncapped, "default cap changed output on a below-cap corpus")
  }
}
