package graft.log

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Inter-process writer fencing — the manifest-epoch enforcement of the
  * single-writer contract. The reference makes split-brain writes impossible
  * via Raft leadership (reference: internal/log/distributed.go:99-131,
  * leader-only Apply); here a second SparkLog on the same directory claims a
  * higher `writerEpoch` through a CAS manifest swap, and the displaced
  * handle's next swap fails loudly instead of forking offset history.
  */
class FencingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def bytes(s: String) = s.getBytes("UTF-8")

  test("a second writer fences the first: stale append throws, nothing forks") {
    val dir = TestSpark.tempDir("fence-two")
    val a = SparkLog(spark, dir)
    a.append(Seq(bytes("a0"), bytes("a1")))

    val b = SparkLog(spark, dir) // claims — A is now a zombie
    assert(b.writerEpoch > a.writerEpoch)
    assert(b.highestOffset == 1) // B adopted A's committed state, not a fork
    b.appendOne(bytes("b2"))

    val e = intercept[LogFencedException](a.appendOne(bytes("zombie")))
    assert(e.ourEpoch == a.writerEpoch && e.observedEpoch == b.writerEpoch)

    // No silent corruption: the fenced append left neither data nor a
    // manifest change — offsets stay contiguous and B's record is the tail.
    val m = LogManifest.read(dir).get
    assert(m.nextOffset == 3 && m.writerEpoch == b.writerEpoch)
    assert(new String(b.read(2).value) == "b2")
    val offsets = b.toDF.select("offset").collect().map(_.getLong(0)).sorted
    assert(offsets.toSeq == (0L until 3L))
  }

  test("every fenced mutator throws; reads on the stale handle still serve") {
    val dir = TestSpark.tempDir("fence-ops")
    val a = SparkLog(spark, dir)
    a.append((0 until 4).map(i => bytes(s"r$i")))
    val b = SparkLog(spark, dir)
    assert(b.writerEpoch > a.writerEpoch)

    intercept[LogFencedException](a.append(Seq(bytes("x"))))
    intercept[LogFencedException](a.commitToken("src", 1L))
    intercept[LogFencedException](a.truncate(2))
    // Stale reads are permitted (the documented relaxed-read posture,
    // SURVEY §2.5 D3): fencing protects writes, not snapshot reads.
    assert(new String(a.read(1).value) == "r1")

    // The failed truncate deleted nothing.
    assert(b.lowestOffset == 0 && b.highestOffset == 3)
  }

  test("fenced appendDF rolls back its staged segment — no duplicate offsets") {
    val dir = TestSpark.tempDir("fence-df")
    val session = spark
    import session.implicits._
    val a = SparkLog(spark, dir)
    a.appendDF(Seq("a", "b").map(bytes).toDF("value"))
    val b = SparkLog(spark, dir)
    b.appendDF(Seq("c").map(bytes).toDF("value"))

    intercept[LogFencedException](a.appendDF(Seq("zombie").map(bytes).toDF("value")))

    // The zombie staged into segment=2 — the SAME dir b's committed record
    // lives in (its stale nextOffset equals b's committed base). Rollback
    // must be surgical: b's data intact, zombie parts gone.
    val c = SparkLog(spark, dir)
    assert(c.highestOffset == 2)
    assert(new String(c.read(2).value) == "c")
    // Manifest-less recovery is the acid test for debris: any zombie part
    // left behind would resurface as a duplicate offset 2 here.
    LogFs.forPath(dir).deleteMeta(dir, "_manifest.json")
    val rec = SparkLog(spark, dir)
    assert(rec.highestOffset == 2)
    assert(new String(rec.read(2).value) == "c")
    val offs = rec.toDF.select("offset").collect().map(_.getLong(0)).sorted.toSeq
    assert(offs == (0L until 3L), s"duplicate/missing offsets after recovery: $offs")
  }

  test("crash-then-reopen keeps epoch semantics: reopen claims, offsets continue") {
    val dir = TestSpark.tempDir("fence-crash")
    val a = SparkLog(spark, dir)
    a.append(Seq(bytes("x0"), bytes("x1")))
    val e1 = a.writerEpoch
    // "Crash": the handle is simply never used again.
    val b = SparkLog(spark, dir)
    assert(b.writerEpoch == e1 + 1)
    assert(b.append(Seq(bytes("x2"))) == 2L)
    val c = SparkLog(spark, dir)
    assert(c.writerEpoch == b.writerEpoch + 1)
    assert(c.highestOffset == 2)
    (0 until 3).foreach(i => assert(new String(c.read(i.toLong).value) == s"x$i"))
  }

  test("pre-fencing manifests (no writerEpoch field) claim from epoch 0") {
    val dir = TestSpark.tempDir("fence-legacy")
    val a = SparkLog(spark, dir)
    a.appendOne(bytes("v"))
    // Rewrite the manifest in the pre-fencing shape (no writerEpoch key).
    val m = LogManifest.read(dir).get
    val legacy =
      s"""{"nextOffset":${m.nextOffset},"tokens":{},"segments":[""" +
        m.segments
          .map(s =>
            s"""{"base":${s.base},"next":${s.next},"bytes":${s.bytes},"records":${s.records},"sealed":${s.sealed_}}"""
          )
          .mkString(",") + "]}"
    LogFs.forPath(dir).writeMeta(dir, "_manifest.json", legacy.getBytes("UTF-8"))
    val b = SparkLog(spark, dir)
    assert(b.writerEpoch == 1L)
    assert(b.highestOffset == 0)
    b.appendOne(bytes("w"))
    assert(LogManifest.read(dir).get.writerEpoch == 1L)
  }

  test("concurrent opens race the claim CAS: all claimants get distinct epochs") {
    val dir = TestSpark.tempDir("fence-race")
    SparkLog(spark, dir).append(Seq(bytes("seed")))
    val n = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    val gate = new java.util.concurrent.CountDownLatch(1)
    try {
      val futures = (0 until n).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = { gate.await(); SparkLog(spark, dir).writerEpoch }
        })
      }
      gate.countDown()
      val epochs = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(epochs.distinct.size == n, s"duplicate claim epochs: $epochs")
      // The committed record survived every claim swap.
      val last = SparkLog(spark, dir)
      assert(last.highestOffset == 0)
      assert(new String(last.read(0).value) == "seed")
    } finally pool.shutdownNow()
  }

  test("two live writers alternating: exactly the stale one fails, state stays linear") {
    val dir = TestSpark.tempDir("fence-alt")
    val a = SparkLog(spark, dir)
    a.appendOne(bytes("w0")) // a owns epoch e
    val b = SparkLog(spark, dir) // b claims e+1
    b.appendOne(bytes("w1"))
    intercept[LogFencedException](a.appendOne(bytes("lost"))) // a fenced
    val a2 = SparkLog(spark, dir) // a "recovers" by reopening
    a2.appendOne(bytes("w2"))
    intercept[LogFencedException](b.appendOne(bytes("lost"))) // now b is stale
    val fin = SparkLog(spark, dir)
    assert(fin.highestOffset == 2)
    (0 until 3).foreach(i => assert(new String(fin.read(i.toLong).value) == s"w$i"))
  }

  // ---- publish-marker ownership handshake (adoption vs rollback race) ----

  /** Rewind the on-disk manifest so its tail ends at `wantNext` —
    * reconstructing "publisher crashed (or is paused) after publishing
    * parts, before its swap": the parts past `wantNext` are on disk, the
    * manifest doesn't know them.
    */
  private def rewindManifestTo(dir: String, wantNext: Long): Unit = {
    val Some((seq, m)) = LogManifest.readWithSeq(dir)
    val tail = m.segments.last
    val trimmed = m.copy(
      segments = m.segments.init :+ tail.copy(
        next = wantNext,
        records = wantNext - tail.base
      ),
      nextOffset = wantNext
    )
    assert(LogManifest.writeCas(dir, trimmed, seq), "rewind failed")
  }

  private def segDir(dir: String, base: Long) = s"$dir/segment=$base"

  test("claimant adopts a marked unmanifested publish; loser's gated rollback leaves it") {
    val dir = TestSpark.tempDir("fence-adopt")
    val fs = LogFs.forPath(dir)
    val a = SparkLog(spark, dir)
    a.append(Seq(bytes("r0"), bytes("r1"), bytes("r2")))
    a.append(Seq(bytes("r3"), bytes("r4")))
    // Freeze the moment between publish and swap: manifest says next=3,
    // the part holding offsets 3-4 is unmanifested, marker present.
    rewindManifestTo(dir, 3L)
    fs.writeRawFile(s"${segDir(dir, 0)}/${SparkLog.PublishMarkerFile}", bytes("1"))

    val b = SparkLog(spark, dir)
    // B won the marker during reconcile → adopted the parts.
    assert(b.highestOffset == 4)
    assert(new String(b.read(3).value) == "r3")
    assert(!fs.exists(s"${segDir(dir, 0)}/${SparkLog.PublishMarkerFile}"), "marker consumed")

    // The fenced loser's rollback now loses the marker claim — the atomic
    // delete returns false — so per protocol it must leave every file.
    assert(!fs.deleteIfExists(s"${segDir(dir, 0)}/${SparkLog.PublishMarkerFile}"))
    assert(new String(b.read(4).value) == "r4")
  }

  test("a crashed rollback's journal is completed at reconcile — debris never resurrects") {
    val dir = TestSpark.tempDir("fence-complete")
    val fs = LogFs.forPath(dir)
    val a = SparkLog(spark, dir)
    a.append(Seq(bytes("k0"), bytes("k1"), bytes("k2")))
    a.append(Seq(bytes("k3"), bytes("k4")))
    rewindManifestTo(dir, 3L)
    // The loser wrote its journal and won the marker (it is gone), then
    // crashed before deleting the part: exactly the state completeRollback
    // exists for.
    val debris = fs
      .list(segDir(dir, 0))
      .map(fs.fileName)
      .filter(n => SparkLog.partMinOffset(n).exists(_ >= 3L))
    assert(debris.nonEmpty)
    fs.writeRawFile(
      s"${segDir(dir, 0)}/${SparkLog.RollbackIntentPrefix}.1",
      bytes(debris.mkString("\n"))
    )

    val b = SparkLog(spark, dir)
    assert(b.highestOffset == 2, "rolled-back records must not resurrect")
    intercept[OffsetOutOfRangeException](b.read(3))
    assert(
      !fs.list(segDir(dir, 0)).exists(p => fs.fileName(p).startsWith(SparkLog.RollbackIntentPrefix)),
      "journal consumed"
    )
    assert(
      !fs.list(segDir(dir, 0)).map(fs.fileName).exists(debris.contains),
      "journaled debris deleted"
    )
    // The log keeps working where the rollback left it.
    assert(b.appendOne(bytes("k3b")) == 3L)
    assert(new String(b.read(3).value) == "k3b")
  }

  test("a journal that survived adoption must not delete manifested parts") {
    val dir = TestSpark.tempDir("fence-void-journal")
    val fs = LogFs.forPath(dir)
    val a = SparkLog(spark, dir)
    a.append(Seq(bytes("m0"), bytes("m1"), bytes("m2")))
    a.append(Seq(bytes("m3"), bytes("m4"))) // committed — manifest next=5
    // A loser that crashed between journaling and losing the marker claim:
    // its journal names parts that a claimant ADOPTED (here: plain
    // committed parts — same offset relationship).
    val named = fs
      .list(segDir(dir, 0))
      .map(fs.fileName)
      .filter(n => SparkLog.partMinOffset(n).exists(_ >= 3L))
    assert(named.nonEmpty)
    fs.writeRawFile(
      s"${segDir(dir, 0)}/${SparkLog.RollbackIntentPrefix}.1",
      bytes(named.mkString("\n"))
    )

    val b = SparkLog(spark, dir)
    // Journal consumed, data intact: the offset bound (>= tail next = 5)
    // protected the manifested files.
    assert(b.highestOffset == 4)
    assert(new String(b.read(3).value) == "m3")
    assert(new String(b.read(4).value) == "m4")
    assert(
      !fs.list(segDir(dir, 0)).exists(p => fs.fileName(p).startsWith(SparkLog.RollbackIntentPrefix)),
      "void journal consumed"
    )
  }
}
