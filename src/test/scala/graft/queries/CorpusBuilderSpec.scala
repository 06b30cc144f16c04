package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The one-command corpus build vs the stages composed BY HAND: every
  * per-stage count the builder reports must equal an independent
  * re-derivation — plain Scala where the stage is pure (quality score,
  * exact dedup, decontamination, budget selection over md5-derived
  * orderings), the shared Catalyst expression only where it IS the
  * contract (minhash16, the LM model artifact). Plus the exactly-once
  * versioned-commit behavior (deterministic rebuild, crash debris
  * invisible and overwritten).
  */
class CorpusBuilderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is")

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucketOf(docId: Long): Long =
    (BigInt(md5hex(docId.toString).take(15), 16) % 32).toLong

  /** The corpus_curate quality score, re-derived in plain Scala. */
  private def score(text: String): Double = {
    val ws = text.trim.toLowerCase.split(" ", -1)
    val stopRatio = ws.count(enStop.contains).toDouble / ws.length
    math.min(ws.length / 50.0, 1.0) * 0.5 + (1.0 - stopRatio) * 0.5
  }

  private def tokens(text: String): Long = text.trim.toLowerCase.split(" ", -1).length.toLong

  // Deterministic corpus: 4 langs, 3 sources, planted exact dups, planted
  // near-dups (1-word substitution on a 40-word doc), planted contaminated
  // docs sharing a known 3-gram.
  private def corpus: Seq[(Long, String, String, String)] = {
    val rnd = new scala.util.Random(77)
    val langs = Seq("en", "de", "fr", "es")
    val base = (0 until 240).map { i =>
      val n = 20 + rnd.nextInt(60)
      val words = Seq.fill(n)(s"w${rnd.nextInt(4000)}") ++ Seq.fill(n / 6)(enStop(rnd.nextInt(enStop.size)))
      (i.toLong, langs(i % 4), s"src${i % 3}", rnd.shuffle(words).mkString(" "))
    }
    val exactDups = base.take(12).map { case (id, l, s, t) => (1000L + id, l, s, t) }
    val nearDups = base.slice(20, 32).map { case (id, l, s, t) =>
      val ws = t.split(" "); ws(ws.length / 2) = "subst"
      (2000L + id, l, s, ws.mkString(" "))
    }
    val contaminated = (0 until 8).map { i =>
      (3000L + i, "en", "src0",
        s"alpha beta gamma w${i} " + Seq.fill(40)(s"w${rnd.nextInt(4000)}").mkString(" "))
    }
    base ++ exactDups ++ nearDups ++ contaminated
  }

  test("build-corpus stage counts equal the hand-composed batch stages") {
    import spark.implicits._
    val docs = corpus
    val df = docs.toDF("doc_id", "lang", "source", "text")
    val out = TestSpark.tempDir("corpus-build") + "/out"
    val grams = Seq("alpha beta gamma").toDF("gram")
    val budget = 3000L

    val (v, counts) = CorpusBuilder.build(
      spark, df, out,
      benchmarkGrams = Some(grams),
      lmMinAvgLogp = Some(-12.0),
      budgetTokens = Some(budget)
    )
    assert(v == 1L)
    val byStage = counts.map(c => c.stage -> c).toMap
    assert(counts.map(_.stage) ==
      Seq("input", "curate", "near_dedup", "decontaminate", "lm_gate", "token_budget", "pack"))

    // input
    assert(byStage("input").docs == docs.size.toLong)
    assert(byStage("input").tokens == docs.map(d => tokens(d._4)).sum)

    // curate — plain-Scala re-derivation: lang allowlist, score >= 0.5,
    // exact dedup keep-first by min doc_id per normalized text.
    val curatedHand = docs
      .filter(d => Seq("en", "de", "fr").contains(d._2))
      .filter(d => score(d._4) >= 0.5)
      .groupBy(d => d._4.trim.toLowerCase)
      .map { case (_, ds) => ds.minBy(_._1) }
      .toSeq
    assert(byStage("curate").docs == curatedHand.size.toLong,
      s"curate: builder=${byStage("curate").docs} hand=${curatedHand.size}")

    // near-dedup — minhash16 IS the contract (a Catalyst expression), so
    // fetch signatures through it, then apply the drop rule in Scala: a
    // doc drops iff any of its 4 band buckets holds a smaller doc id.
    graft.functions.GraftFunctions.register(spark)
    val sigs = curatedHand.map(d => (d._1, d._4)).toDF("doc_id", "text")
      .withColumn("mh", expr("minhash16(array_distinct(split(lower(trim(text)), ' ')))"))
      .select("doc_id", "mh")
      .as[(Long, Seq[Long])]
      .collect()
    val buckets = scala.collection.mutable.Map.empty[(Int, String), Long]
    sigs.foreach { case (id, mh) =>
      (0 until 4).foreach { b =>
        val key = (b, mh.slice(b * 4, b * 4 + 4).mkString(","))
        buckets(key) = math.min(buckets.getOrElse(key, Long.MaxValue), id)
      }
    }
    val nearHand = sigs.filter { case (id, mh) =>
      (0 until 4).forall { b =>
        buckets((b, mh.slice(b * 4, b * 4 + 4).mkString(","))) == id
      }
    }.map(_._1).toSet
    assert(byStage("near_dedup").docs == nearHand.size.toLong,
      s"near_dedup: builder=${byStage("near_dedup").docs} hand=${nearHand.size}")

    // decontaminate — plain Scala: drop docs sharing the planted 3-gram.
    val textsById = docs.map(d => d._1 -> d._4).toMap
    def grams3(text: String): Set[String] = {
      val ws = text.trim.toLowerCase.split(" ", -1)
      if (ws.length < 3) Set.empty
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    val deconHand = nearHand.filter(id => !grams3(textsById(id)).contains("alpha beta gamma"))
    assert(byStage("decontaminate").docs == deconHand.size.toLong)

    // lm_gate — the fitted model is the artifact; score the surviving docs
    // through LmModel directly and apply the threshold in Scala.
    val deconDf = docs.filter(d => deconHand(d._1)).toDF("doc_id", "lang", "source", "text")
    val lmScores = LmModel.score(spark, deconDf, s"$out/_lm", "doc_id")
      .select("doc_id", "avg_logp").as[(Long, Double)].collect().toMap
    val gatedHand = deconHand.filter(id => lmScores(id) >= -12.0)
    assert(byStage("lm_gate").docs == gatedHand.size.toLong,
      s"lm_gate: builder=${byStage("lm_gate").docs} hand=${gatedHand.size}")

    // token_budget — plain Scala: per-source mass^0.7 shares of the budget,
    // selection in (bucket, md5(doc_id), doc_id) order within each source.
    val gatedDocs = docs.filter(d => gatedHand(d._1))
    val masses = gatedDocs.groupBy(_._3).view.mapValues(_.map(d => tokens(d._4)).sum).toMap
    val pws = masses.view.mapValues(m =>
      BigDecimal(math.pow(m.toDouble, 0.7)).setScale(6, BigDecimal.RoundingMode.HALF_UP)).toMap
    val totPw = pws.values.sum
    val budgets = pws.view.mapValues(pw => ((pw / totPw).toDouble * budget).toLong).toMap
    val keptHand = gatedDocs
      .groupBy(_._3)
      .flatMap { case (src, ds) =>
        val ordered = ds.sortBy(d => (bucketOf(d._1), md5hex(d._1.toString), d._1))
        var cum = 0L
        ordered.takeWhile { d =>
          val keep = cum < budgets(src)
          cum += tokens(d._4)
          keep
        }
      }
      .map(_._1)
      .toSet
    assert(byStage("token_budget").docs == keptHand.size.toLong,
      s"token_budget: builder=${byStage("token_budget").docs} hand=${keptHand.size}")
    assert(byStage("token_budget").tokens <= byStage("lm_gate").tokens)

    // pack — no docs drop; the committed corpus carries contiguous
    // running-sum token_starts within each bucket shard.
    assert(byStage("pack").docs == byStage("token_budget").docs)
    val packed = spark.read.parquet(s"$out/v=1/corpus")
      .select("bucket", "doc_id", "n_tokens", "token_start", "seq_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(packed.length.toLong == byStage("pack").docs)
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (md5hex(r._2.toString), r._2))
      var cum = 0L
      ordered.foreach { case (_, _, n, start, seqId) =>
        assert(start == cum, "token_start must be the bucket running sum")
        assert(seqId == start / 512, "seq_id must derive from token_start")
        cum += n
      }
    }
  }

  test("randomized trials: stage counts equal the hand composition on random corpora") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(991)
    for (trial <- 0 until 3) {
      val nLangs = Seq("en", "de", "fr", "es", "zh")
      val docs = (0 until 120 + rnd.nextInt(120)).map { i =>
        val n = 5 + rnd.nextInt(90)
        val words = Seq.fill(n)(s"v${rnd.nextInt(600)}") ++
          Seq.fill(rnd.nextInt(1 + n / 4))(enStop(rnd.nextInt(enStop.size)))
        (i.toLong, nLangs(rnd.nextInt(nLangs.size)), s"s${rnd.nextInt(4)}",
          rnd.shuffle(words).mkString(" "))
      } ++ (0 until 10).map { i => // planted exact dups of doc i
        (5000L + i, "en", "s0", null)
      }
      val fixed = docs.map {
        case (id, l, src, null) => (id, l, src, docs((id - 5000L).toInt)._4)
        case d                  => d
      }
      val budget = 500L + rnd.nextInt(4000)
      val out = TestSpark.tempDir(s"corpus-rand$trial") + "/out"
      val (_, counts) = CorpusBuilder.build(
        spark, fixed.toDF("doc_id", "lang", "source", "text"), out,
        budgetTokens = Some(budget)
      )
      val byStage = counts.map(c => c.stage -> c.docs).toMap

      val curatedHand = fixed
        .filter(d => Seq("en", "de", "fr").contains(d._2))
        .filter(d => score(d._4) >= 0.5)
        .groupBy(d => d._4.trim.toLowerCase)
        .map { case (_, ds) => ds.minBy(_._1) }
        .toSeq
      assert(byStage("curate") == curatedHand.size.toLong, s"trial $trial curate")

      val sigs = curatedHand.map(d => (d._1, d._4)).toDF("doc_id", "text")
        .withColumn("mh", expr("minhash16(array_distinct(split(lower(trim(text)), ' ')))"))
        .select("doc_id", "mh").as[(Long, Seq[Long])].collect()
      val buckets = scala.collection.mutable.Map.empty[(Int, String), Long]
      sigs.foreach { case (id, mh) =>
        (0 until 4).foreach { b =>
          val key = (b, mh.slice(b * 4, b * 4 + 4).mkString(","))
          buckets(key) = math.min(buckets.getOrElse(key, Long.MaxValue), id)
        }
      }
      val nearHand = sigs.filter { case (id, mh) =>
        (0 until 4).forall(b => buckets((b, mh.slice(b * 4, b * 4 + 4).mkString(","))) == id)
      }.map(_._1).toSet
      assert(byStage("near_dedup") == nearHand.size.toLong, s"trial $trial near_dedup")

      val gatedDocs = fixed.filter(d => nearHand(d._1))
      val masses = gatedDocs.groupBy(_._3).view.mapValues(_.map(d => tokens(d._4)).sum).toMap
      val pws = masses.view.mapValues(m =>
        BigDecimal(math.pow(m.toDouble, 0.7)).setScale(6, BigDecimal.RoundingMode.HALF_UP)).toMap
      val totPw = pws.values.sum
      val budgets = pws.view.mapValues(pw => ((pw / totPw).toDouble * budget).toLong).toMap
      val keptHand = gatedDocs
        .groupBy(_._3)
        .flatMap { case (src, ds) =>
          val ordered = ds.sortBy(d => (bucketOf(d._1), md5hex(d._1.toString), d._1))
          var cum = 0L
          ordered.takeWhile { d =>
            val keep = cum < budgets(src)
            cum += tokens(d._4)
            keep
          }
        }
        .map(_._1)
        .toSet
      assert(byStage("token_budget") == keptHand.size.toLong,
        s"trial $trial token_budget: builder=${byStage("token_budget")} hand=${keptHand.size}")
      assert(byStage("pack") == byStage("token_budget"), s"trial $trial pack")
    }
  }

  test("fuzzy decontamination drops benchmark paraphrases exact n-grams miss") {
    import spark.implicits._
    // Benchmark doc; the train corpus contains a PARAPHRASE: identical
    // word SET in reversed order — no 3-gram survives, so exact
    // decontamination misses it, but the MinHash signature (a set
    // function) is identical, so every LSH band collides.
    val benchWords = (0 until 40).map(i => s"bench$i")
    val benchDocs = Seq((benchWords.mkString(" "))).toDF("text")
    val paraphrase = benchWords.reverse.mkString(" ")
    val clean = (0 until 60).map(i => s"clean$i").mkString(" ")
    val docs = Seq(
      (0L, "en", "src0", paraphrase),
      (1L, "en", "src0", clean)
    ).toDF("doc_id", "lang", "source", "text")
    val out = TestSpark.tempDir("corpus-fuzzy") + "/out"

    // Exact grams from the benchmark do NOT hit the paraphrase (sanity).
    val benchGrams = benchWords.sliding(3).map(_.mkString(" ")).toSeq.toDF("gram")
    val paraGrams = paraphrase.split(" ").sliding(3).map(_.mkString(" ")).toSet
    assert(benchGrams.as[String].collect().forall(g => !paraGrams.contains(g)))

    val (_, counts) = CorpusBuilder.build(
      spark, docs, out,
      benchmarkGrams = Some(benchGrams),
      benchmarkDocs = Some(benchDocs)
    )
    val byStage = counts.map(c => c.stage -> c.docs).toMap
    assert(byStage("near_dedup") == 2L, "both docs reach decontamination")
    assert(byStage("decontaminate") == 1L, "the paraphrase must drop on band collision")
    val kept = spark.read.parquet(s"$out/v=1/corpus").select("doc_id").as[Long].collect()
    assert(kept.toSeq == Seq(1L))
  }

  test("per-document lineage: drops.parquet partitions the input and reconciles with stages.json") {
    import spark.implicits._
    val docs = corpus
    val df = docs.toDF("doc_id", "lang", "source", "text")
    val out = TestSpark.tempDir("corpus-lineage") + "/out"
    val (v, counts) = CorpusBuilder.build(
      spark, df, out,
      benchmarkGrams = Some(Seq("alpha beta gamma").toDF("gram")),
      lmMinAvgLogp = Some(-12.0),
      budgetTokens = Some(3000L)
    )
    val byStage = counts.map(c => c.stage -> c.docs).toMap

    // stages.json on disk carries the same counts the builder returned —
    // the artifact the drops table must reconcile against.
    val stagesJson = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$out/v=$v/stages.json")), "UTF-8")
    counts.foreach { c =>
      assert(stagesJson.contains(s"""{"stage":"${c.stage}","docs":${c.docs}"""),
        s"stages.json missing ${c.stage}=${c.docs}:\n$stagesJson")
    }

    val drops = spark.read.parquet(s"$out/v=$v/drops")
      .select("doc_id", "stage").as[(Long, String)].collect()

    // Per-reason counts reconcile EXACTLY with the stage-count deltas.
    val byReason = drops.groupBy(_._2).view.mapValues(_.length.toLong).toMap.withDefaultValue(0L)
    assert(byReason("curate_gate") + byReason("exact_dup") == byStage("input") - byStage("curate"))
    assert(byReason("near_dup") == byStage("curate") - byStage("near_dedup"))
    assert(byReason("decontaminate") == byStage("near_dedup") - byStage("decontaminate"))
    assert(byReason("lm_gate") == byStage("decontaminate") - byStage("lm_gate"))
    assert(byReason("token_budget") == byStage("lm_gate") - byStage("token_budget"))

    // The lineage is a PARTITION of the input: every input doc is either
    // packed or dropped exactly once, never both, never neither.
    assert(drops.map(_._1).distinct.length == drops.length, "a doc carries two drop verdicts")
    val packedIds = spark.read.parquet(s"$out/v=$v/corpus").select("doc_id").as[Long].collect().toSet
    val droppedIds = drops.map(_._1).toSet
    assert(packedIds.intersect(droppedIds).isEmpty, "a doc is both packed and dropped")
    assert(packedIds ++ droppedIds == docs.map(_._1).toSet, "lineage must cover every input doc")

    // Planted adversaries land on the right reason: the 12 exact clones
    // (ids 1000+) drop as exact_dup; any surviving contaminated doc (ids
    // 3000+, sharing the benchmark 3-gram) drops as decontaminate.
    val reasonOf = drops.toMap
    val exactClones = docs
      .filter(d => d._1 >= 1000L && d._1 < 2000L)
      // A clone of a gate-failing doc drops at the gate itself, so only
      // gate-passing clones reach the exact-dup verdict.
      .filter(d => Seq("en", "de", "fr").contains(d._2) && score(d._4) >= 0.5)
      .map(_._1)
    assert(exactClones.nonEmpty && exactClones.forall(id => reasonOf.get(id).contains("exact_dup")),
      s"gate-passing exact clones must drop as exact_dup: ${exactClones.map(id => id -> reasonOf.get(id))}")
    val contaminated = docs.map(_._1).filter(_ >= 3000L)
    assert(contaminated.forall(id =>
      Set("decontaminate", "near_dup", "curate_gate").contains(reasonOf.getOrElse(id, "KEPT"))),
      s"contaminated docs must not survive: ${contaminated.map(id => id -> reasonOf.get(id))}")
    assert(contaminated.exists(id => reasonOf.get(id).contains("decontaminate")),
      "at least one planted contaminated doc must drop at the decontaminate stage")
  }

  test("append commits byte-identically to a from-scratch build on the union") {
    import spark.implicits._
    val base = corpus // ids up to 3007
    val rnd = new scala.util.Random(123)
    val langs = Seq("en", "de", "fr", "es")
    val fresh = (0 until 40).map { i =>
      val n = 25 + rnd.nextInt(50)
      val words = Seq.fill(n)(s"d${rnd.nextInt(4000)}") ++
        Seq.fill(n / 6)(enStop(rnd.nextInt(enStop.size)))
      (10000L + i, langs(i % 4), s"src${i % 3}", rnd.shuffle(words).mkString(" "))
    }
    val delta = fresh ++ Seq(
      (10100L, base(5)._2, base(5)._3, base(5)._4), // exact dup of a base doc
      (10101L, fresh(0)._2, fresh(0)._3, fresh(0)._4), // exact dup within the delta
      (10102L, "en", "src0", // contaminated: unique words + the benchmark gram
        "alpha beta gamma " + (0 until 40).map(i => s"uniq$i").mkString(" "))
    )

    // A persisted LM model shared by all three runs: append never refits,
    // so equality needs the same frozen artifact on both paths.
    val modelDir = TestSpark.tempDir("corpus-append-lm") + "/model"
    val _ = LmModel.fit(spark, base.toDF("doc_id", "lang", "source", "text"), modelDir)
    val grams = Seq("alpha beta gamma").toDF("gram")
    def run(outDir: String, docs: Seq[(Long, String, String, String)]) =
      CorpusBuilder.build(
        spark, docs.toDF("doc_id", "lang", "source", "text"), outDir,
        benchmarkGrams = Some(grams), lmMinAvgLogp = Some(-12.0),
        lmModelDir = Some(modelDir), budgetTokens = Some(3000L)
      )

    val incDir = TestSpark.tempDir("corpus-append-inc") + "/out"
    val (v1, _) = run(incDir, base)
    assert(v1 == 1L)
    val (v2, incCounts) = CorpusBuilder.append(
      spark, delta.toDF("doc_id", "lang", "source", "text"), incDir,
      benchmarkGrams = Some(grams), lmMinAvgLogp = Some(-12.0),
      lmModelDir = Some(modelDir), budgetTokens = Some(3000L)
    )
    assert(v2 == 2L && !new java.io.File(s"$incDir/v=1").exists(), "append must prune the base")

    val scratchDir = TestSpark.tempDir("corpus-append-scratch") + "/out"
    val (_, scratchCounts) = run(scratchDir, base ++ delta)

    // Union-wide stage counts match a from-scratch build exactly.
    assert(incCounts == scratchCounts,
      s"append counts $incCounts != from-scratch $scratchCounts")

    // Packed corpus content matches byte-for-byte.
    def content(dir: String, v: Long) = spark.read.parquet(s"$dir/v=$v/corpus")
      .select("doc_id", "bucket", "seq_id", "token_start", "n_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(content(incDir, 2L) == content(scratchDir, 1L), "packed corpus diverged")
    assert(content(incDir, 2L).exists(_._1 >= 10000L), "some delta doc must reach the corpus")

    // Lineage matches too — history verdicts carried, budget recomputed.
    def dropsOf(dir: String, v: Long) = spark.read.parquet(s"$dir/v=$v/drops")
      .select("doc_id", "stage").as[(Long, String)].collect().toMap
    val incDrops = dropsOf(incDir, 2L)
    assert(incDrops == dropsOf(scratchDir, 1L), "drop lineage diverged")
    assert(incDrops.get(10100L).contains("exact_dup"), "delta dup of a base doc must drop as exact_dup")
    assert(incDrops.get(10101L).contains("exact_dup"), "within-delta dup must drop as exact_dup")
    assert(incDrops.get(10102L).contains("decontaminate"), "contaminated delta doc must drop")

    // Append state equals from-scratch state — a second append would see
    // identical history either way.
    def stateSet(dir: String, v: Long, name: String, cols: Seq[String]) =
      spark.read.parquet(s"$dir/v=$v/state/$name").select(cols.map(col): _*)
        .collect().map(_.toSeq).toSet
    assert(stateSet(incDir, 2L, "hashes", Seq("text_hash")) ==
      stateSet(scratchDir, 1L, "hashes", Seq("text_hash")))
    assert(stateSet(incDir, 2L, "bands", Seq("band", "bh")) ==
      stateSet(scratchDir, 1L, "bands", Seq("band", "bh")))
    assert(stateSet(incDir, 2L, "gated", Seq("doc_id")) ==
      stateSet(scratchDir, 1L, "gated", Seq("doc_id")))
  }

  test("append refuses out-of-order doc ids (first-wins dedup is id-ordered)") {
    import spark.implicits._
    val out = TestSpark.tempDir("corpus-append-order") + "/out"
    val (_, _) = CorpusBuilder.build(spark, corpus.toDF("doc_id", "lang", "source", "text"), out)
    val stale = Seq((5L, "en", "src0", "some new words here entirely fresh"))
    val e = intercept[IllegalArgumentException] {
      CorpusBuilder.append(spark, stale.toDF("doc_id", "lang", "source", "text"), out)
    }
    assert(e.getMessage.contains("doc ids above every built id"), e.getMessage)
  }

  test("append IO cost tracks the delta and survivor pool, not the raw corpus") {
    import spark.implicits._
    // Realistic curation shape: most raw docs fail the lang gate, so the
    // survivor pool (and with it the persisted state) is a small fraction
    // of the raw corpus. Long documents make the text bytes dominate, so
    // bytes READ are a faithful proxy for "what did this run have to
    // process". The delta-only contract: an append re-reads its delta and
    // the state tables — never the raw base corpus — so its input bytes
    // must be well under a from-scratch build's union scan.
    val rnd = new scala.util.Random(555)
    def doc(id: Long, lang: String) = {
      val n = 120 + rnd.nextInt(60)
      (id, lang, s"src${id % 3}",
        (Seq.fill(n)(s"t${rnd.nextInt(50000)}") ++ Seq.fill(n / 8)(enStop(rnd.nextInt(enStop.size))))
          .mkString(" "))
    }
    val baseDocs = (0 until 3000).map(i => doc(i.toLong, if (i % 7 == 0) "en" else "zz"))
    val deltaDocs = (0 until 60).map(i => doc(10000L + i, "en"))
    val dir = TestSpark.tempDir("corpus-append-cost")
    baseDocs.toDF("doc_id", "lang", "source", "text").write.parquet(s"$dir/base")
    deltaDocs.toDF("doc_id", "lang", "source", "text").write.parquet(s"$dir/delta")
    (baseDocs ++ deltaDocs).toDF("doc_id", "lang", "source", "text")
      .write.parquet(s"$dir/union")

    @volatile var bytes = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) bytes += e.taskMetrics.inputMetrics.bytesRead
    }
    def settle(): Long = {
      // The listener bus is async: poll until the counter is stable.
      var last = -1L
      var same = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (same < 3 && System.nanoTime() < deadline) {
        val cur = bytes
        if (cur == last) same += 1 else { same = 0; last = cur }
        Thread.sleep(100)
      }
      last
    }
    def measure(work: => Unit): Long = {
      spark.sparkContext.addSparkListener(listener)
      try { bytes = 0L; work; settle() }
      finally spark.sparkContext.removeSparkListener(listener)
    }

    val incDir = s"$dir/inc"
    val (_, _) = CorpusBuilder.build(spark, spark.read.parquet(s"$dir/base"), incDir)
    val appendBytes = measure {
      val _ = CorpusBuilder.append(spark, spark.read.parquet(s"$dir/delta"), incDir)
    }
    val scratchBytes = measure {
      val _ = CorpusBuilder.build(spark, spark.read.parquet(s"$dir/union"), s"$dir/scratch")
    }
    assert(appendBytes > 0 && scratchBytes > 0, s"listener saw no IO: $appendBytes / $scratchBytes")
    assert(appendBytes < scratchBytes / 2,
      s"append read $appendBytes bytes vs from-scratch $scratchBytes — cost is not tracking the delta")

    // And the outputs still agree, so the saving is not buying a different
    // corpus.
    def ids(dir0: String) = {
      val (v, _) = CorpusBuilder.current(spark, dir0).get
      spark.read.parquet(s"$dir0/v=$v/corpus").select("doc_id").as[Long].collect().toSet
    }
    assert(ids(incDir) == ids(s"$dir/scratch"))
  }

  test("build is exactly-once: deterministic rebuild, crash debris overwritten") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "lang", "source", "text")
    val out = TestSpark.tempDir("corpus-once") + "/out"

    val (v1, c1) = CorpusBuilder.build(spark, df, out)
    assert(v1 == 1L && CorpusBuilder.current(spark, out).map(_._1).contains(1L))
    def contentHash(v: Long): Seq[(Long, Long, Long, Long)] = spark.read.parquet(s"$out/v=$v/corpus")
      .select("doc_id", "bucket", "seq_id", "token_start")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

    val h1 = contentHash(1L)
    val (v2, c2) = CorpusBuilder.build(spark, df, out)
    assert(v2 == 2L && c2 == c1, "identical input must reproduce identical stage counts")
    assert(contentHash(2L) == h1, "identical input must reproduce identical packed content")
    assert(!new java.io.File(s"$out/v=1").exists(), "superseded version must prune")

    // Crash simulation: a half-written v=3 (no marker) is invisible; the
    // next build lands on the same number and commits over it.
    new java.io.File(s"$out/v=3/corpus").mkdirs()
    assert(CorpusBuilder.current(spark, out).map(_._1).contains(2L))
    val (v3, c3) = CorpusBuilder.build(spark, df, out)
    assert(v3 == 3L && c3 == c1)
    assert(CorpusBuilder.current(spark, out).map(_._1).contains(3L))
    assert(contentHash(3L) == h1)
  }

  private def parsedPlan(out: String, v: Long): Seq[(String, Long, Long, Double, Boolean, Long)] = {
    val sj = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$out/v=$v/stages.json")), "UTF-8")
    // The writer-adjacent shared regex: source arrives still-escaped.
    CorpusBuilder.repeatPlanRe.findAllMatchIn(sj).map(m =>
      (CorpusBuilder.unescapeJsonString(m.group(1)), m.group(2).toLong, m.group(3).toLong,
        m.group(4).toDouble, m.group(5).toBoolean, m.group(6).toLong)).toSeq.sortBy(_._1)
  }

  test("--tokenizer bpe: budget/plan masses are the BPE-applied counts, not whitespace") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "lang", "source", "text")
    val base = TestSpark.tempDir("corpus-bpe")

    // Build with a beyond-mass budget so the persisted plan exposes every
    // source's mass in the tokenizer's unit.
    val out = s"$base/bpe"
    val (v, stageCounts) = CorpusBuilder.build(
      spark, df, out, lmMinAvgLogp = Some(-12.0),
      budgetTokens = Some(1L << 40), tokenizer = "bpe")

    // Independent re-derivation: the text_bpe_apply pipeline (Bpe
    // .tokenCounts with the same K) over the SAME input docs, summed per
    // source over the gated pool's survivors.
    val bpeCounts = Bpe.tokenCounts(df, Bpe.DefaultMerges)
      .select($"doc_id", $"n_bpe_tokens")
    val pool = spark.read.parquet(s"$out/v=$v/state/gated")
    val expectedMass = pool.select("doc_id", "source")
      .join(bpeCounts, "doc_id")
      .groupBy("source").agg(sum("n_bpe_tokens").as("mass"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val persistedMass = parsedPlan(out, v).map(p => (p._1, p._2))
    assert(persistedMass == expectedMass,
      s"plan masses != independent BPE recount:\n$persistedMass\n$expectedMass")

    // The gated pool itself must carry BPE n_tokens (budget/pack/epochs
    // all read this column), and they must differ from whitespace counts
    // somewhere — otherwise the flag did nothing.
    val poolTok = pool.select("doc_id", "n_tokens")
      .join(bpeCounts, "doc_id")
      .filter($"n_tokens" =!= $"n_bpe_tokens").count()
    Checkpoints.release()
    assert(poolTok == 0, s"$poolTok pool docs carry non-BPE n_tokens")
    val wsDiff = pool
      .withColumn("ws_n", org.apache.spark.sql.functions.size(
        split(lower(trim($"text")), " ")).cast("long"))
      .filter($"n_tokens" =!= $"ws_n").count()
    assert(wsDiff > 0, "BPE counts never diverged from whitespace — vacuous test corpus")

    // stages.json records the unit; appending onto a BPE build refuses.
    assert(stageCounts.nonEmpty)
    val sj = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/v=$v/stages.json")), "UTF-8")
    assert(sj.contains(""""tokenizer":"bpe""""))
    val delta = Seq((900000L, "en", "src0", "a fresh appended document with new words entirely"))
      .toDF("doc_id", "lang", "source", "text")
    val ex = intercept[IllegalArgumentException](CorpusBuilder.append(spark, delta, out))
    assert(ex.getMessage.contains("mass units"))
    val ex2 = intercept[IllegalArgumentException](
      CorpusBuilder.append(spark, delta, out, tokenizer = "bpe"))
    assert(ex2.getMessage.contains("tokenizer ws only"))
  }

  test("quote/backslash-bearing source names round-trip through the persisted plan") {
    import spark.implicits._
    val weird = Seq("""he said "hi"""", """c:\data\web""", "plain")
    val rnd = new scala.util.Random(11)
    val rows = (0 until 30).map { i =>
      (i.toLong, "en", weird(i % 3),
        Seq.fill(60)(s"w${rnd.nextInt(4000)}").mkString(" "))
    }
    val out = TestSpark.tempDir("corpus-escape") + "/c"
    val (v, _) = CorpusBuilder.build(
      spark, rows.toDF("doc_id", "lang", "source", "text"),
      out, budgetTokens = Some(1L << 30))
    val plan = parsedPlan(out, v)
    // Every source that survived the pipeline must appear UNDER ITS EXACT
    // NAME (the old [^"]* group dropped the quoted one from every reader).
    val pool = spark.read.parquet(s"$out/v=$v/state/gated")
      .select("source").distinct().as[String].collect().toSet
    assert(pool.exists(_.contains("\"")), "test corpus lost its quoted source pre-plan")
    assert(plan.map(_._1).toSet == pool,
      s"plan sources ${plan.map(_._1).toSet} != pool sources $pool")
  }

  test("a budget past the corpus mass persists the repeat plan; plan == corpus_epochs arithmetic") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "lang", "source", "text")
    val base = TestSpark.tempDir("corpus-epochs")

    // Build with a budget far beyond any corpus mass: every source must
    // repeat, so the persisted plan is the full data-constrained recipe.
    val bigBudget = 1L << 40
    val out1 = s"$base/big"
    val (v1, _) = CorpusBuilder.build(
      spark, df, out1, lmMinAvgLogp = Some(-12.0), budgetTokens = Some(bigBudget))
    val pool = spark.read.parquet(s"$out1/v=$v1/state/gated")
    val perSrc = pool.groupBy("source")
      .agg(sum("n_tokens").as("mass")).as[(String, Long)].collect().sortBy(_._1).toSeq

    // Third implementation: the exact-integer corpus_epochs arithmetic in
    // plain BigInt/BigDecimal (6-dp micro-unit pw lift, integral division,
    // half-up 6-dp epochs), source by source.
    def round6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val pwInt = perSrc.map { case (s, m) => s -> (round6(math.pow(m.toDouble, 0.7)) * 1000000).toBigInt }
    val totPw = pwInt.map(_._2).sum
    val expected = perSrc.zip(pwInt).map { case ((s, m), (_, pw)) =>
      val target = (pw * BigInt(bigBudget) / totPw).toLong
      val epochs = round6(target.toDouble / m.toDouble).toDouble
      (s, m, target, epochs, target > 4 * m, math.min(target, 4 * m))
    }
    val persisted = parsedPlan(out1, v1)
    assert(persisted == expected,
      s"persisted repeat plan != BigInt re-derivation:\n$persisted\n$expected")
    assert(persisted.forall(_._5), "a 2^40 budget must cap every source at 4 epochs")
    assert(persisted.forall(p => p._6 == 4 * p._2))

    // Query agreement: with budget = 3x the pool mass (corpus_epochs' own
    // B), the persisted plan must equal the corpus_epochs query run over
    // the same pool as a documents table, row for row.
    val out2 = s"$base/three"
    val threeBudget = 3L * perSrc.map(_._2).sum
    val (v2, _) = CorpusBuilder.build(
      spark, df, out2, lmMinAvgLogp = Some(-12.0), budgetTokens = Some(threeBudget))
    val docsDir = s"$base/docs"
    pool.select("doc_id", "lang", "source", "text").write.parquet(s"$docsDir/documents.parquet")
    val query = graft.SparkEntry.queries("corpus_epochs")(spark, docsDir)
      .as[(String, Long, Long, Double, Boolean, Long)].collect().toSeq.sortBy(_._1)
    Checkpoints.release()
    assert(parsedPlan(out2, v2) == query,
      s"persisted plan != corpus_epochs query on the same pool")

    // No budget -> no plan fragment in stages.json.
    val out3 = s"$base/none"
    val (v3, _) = CorpusBuilder.build(spark, df, out3, lmMinAvgLogp = Some(-12.0))
    assert(parsedPlan(out3, v3).isEmpty)
  }
}
