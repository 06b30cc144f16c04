package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.server.ConsumeRequest

class EngineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming ingest commits micro-batches into the log (fsm.Apply analog)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val engine = Engine(spark, TestSpark.tempDir("engine-ingest"))
    val input = MemoryStream[String]
    // Data must land before the query starts: AvailableNow snapshots the
    // available end offset at start, so later addData may be skipped.
    input.addData("a", "b", "c")
    val q = engine.ingest(
      input.toDF().selectExpr("cast(value as binary) as value"),
      checkpoint = TestSpark.tempDir("engine-ckpt"),
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()
    )
    q.processAllAvailable()
    q.awaitTermination(30000)
    assert(engine.log.highestOffset == 2)
    assert(new String(engine.service.consume("root", ConsumeRequest(1)).record.value) == "b")
  }

  test("appendDF idempotence token makes epoch re-application a no-op (exactly-once)") {
    val session = spark
    import session.implicits._
    val engine = Engine(spark, TestSpark.tempDir("engine-once"))
    val batch = Seq("e1", "e2", "e3").map(_.getBytes).toDF("value")
    val (b0, n0) = engine.log.appendDF(batch, Some("src-a" -> 7L))
    assert(b0 == 0 && n0 == 3)
    // same epoch again: the retry after a crash-between-append-and-checkpoint
    val (b1, n1) = engine.log.appendDF(batch, Some("src-a" -> 7L))
    assert(n1 == 0 && b1 == 3)
    assert(engine.log.toDF.count() == 3)
    // older epoch: also skipped
    assert(engine.log.appendDF(batch, Some("src-a" -> 5L))._2 == 0)
    // newer epoch: applied; other source names independent
    assert(engine.log.appendDF(batch, Some("src-a" -> 8L))._2 == 3)
    assert(engine.log.appendDF(batch, Some("src-b" -> 0L))._2 == 3)
    assert(engine.log.toDF.count() == 9)
    // tokens survive reopen (same atomic swap as the data)
    val reopened = graft.log.SparkLog(spark, engine.dataDir)
    assert(reopened.appendDF(batch, Some("src-a" -> 8L))._2 == 0)
  }

  test("replicateFrom tails a peer log exactly-once (Replicator analog)") {
    val peer = Engine(spark, TestSpark.tempDir("engine-peer"))
    val local = Engine(spark, TestSpark.tempDir("engine-replica"))
    peer.log.append(Seq("r0".getBytes, "r1".getBytes, "r2".getBytes))
    val ckpt = TestSpark.tempDir("engine-repl-ckpt")
    val q = local.replicateFrom(
      peer.dataDir,
      checkpoint = ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()
    )
    q.processAllAvailable()
    q.awaitTermination(30000)
    assert(local.log.toDF.count() == 3)
    assert(new String(local.log.read(1).value) == "r1")
    // New appends on the peer flow through a restarted replication stream,
    // and already-replicated batches re-apply as no-ops (exactly-once).
    peer.log.append(Seq("r3".getBytes))
    val q2 = local.replicateFrom(
      peer.dataDir,
      checkpoint = ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()
    )
    q2.processAllAvailable()
    q2.awaitTermination(30000)
    assert(local.log.toDF.count() == 4, "restart must not duplicate replicated records")
    assert(new String(local.log.read(3).value) == "r3")
  }

  test("3-log cluster analog: replicate everywhere, leave stops one replica") {
    // The reference's distributed test vector (FIXTURES §2 "cluster
    // vector"): ["first","second"] reach every node; after node 1 leaves,
    // "third" reaches only the remaining follower.
    def drain(e: Engine, peer: String, ckpt: String): Unit = {
      val q = e.replicateFrom(peer, ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.processAllAvailable(); q.awaitTermination(30000)
    }
    val leader = Engine(spark, TestSpark.tempDir("cl-leader"))
    val f1 = Engine(spark, TestSpark.tempDir("cl-f1"))
    val f2 = Engine(spark, TestSpark.tempDir("cl-f2"))
    val (c1, c2) = (TestSpark.tempDir("cl-ck1"), TestSpark.tempDir("cl-ck2"))
    leader.log.append(Seq("first".getBytes, "second".getBytes))
    drain(f1, leader.dataDir, c1)
    drain(f2, leader.dataDir, c2)
    assert(f1.log.toDF.count() == 2 && f2.log.toDF.count() == 2)
    // f1 "leaves" (its replication stream is simply not restarted).
    leader.log.append(Seq("third".getBytes))
    drain(f2, leader.dataDir, c2)
    assert(f2.log.toDF.count() == 3)
    assert(new String(f2.log.read(2).value) == "third")
    assert(f1.log.toDF.count() == 2, "departed follower must miss new appends")
  }

  test("registerView exposes the log to SQL") {
    val engine = Engine(spark, TestSpark.tempDir("engine-view"))
    engine.log.append(Seq("sql-a".getBytes, "sql-b".getBytes))
    val view = engine.registerView("test_log")
    val rows = spark
      .sql(s"SELECT offset, cast(value as string) v FROM $view ORDER BY offset")
      .collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("sql-a", "sql-b"))
    // filters through SQL hit the pushdown path
    assert(spark.sql(s"SELECT count(*) FROM $view WHERE offset = 1").head().getLong(0) == 1)
  }

  test("engine registers native functions on the session") {
    Engine(spark, TestSpark.tempDir("engine-fn"))
    val r = spark.sql("SELECT cosine_similarity(array(3.0d,4.0d), array(3.0d,4.0d))").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("leader failover drill: fence, claim, catch-up — no fork, no loss") {
    // The availability property Raft gives the reference
    // (reference: internal/log/distributed.go:90-95 automatic leader
    // promotion), composed from graft's parts: writer fencing makes a
    // MANUAL promotion safe, and pull replication converges the replica
    // after it. Sequence: writer A dies mid-stream → a promoted writer
    // claims the same log (epoch fence) → replication catches up → a
    // stray write from zombie A throws instead of forking → offsets stay
    // contiguous and the replica's content equals the new leader's.
    val primaryDir = TestSpark.tempDir("fo-primary")
    val a = Engine(spark, primaryDir) // writer A — will become the zombie
    a.log.append(Seq("w0".getBytes, "w1".getBytes, "w2".getBytes))

    // Standby replica tailing the primary (the reference's replicator).
    val replica = Engine(spark, TestSpark.tempDir("fo-replica"))
    val ckpt = TestSpark.tempDir("fo-ckpt")
    def catchUp(): Unit = {
      val q = replica.replicateFrom(
        primaryDir,
        checkpoint = ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()
      )
      q.processAllAvailable(); q.awaitTermination(30000)
    }
    catchUp()
    assert(replica.log.highestOffset == 2)

    // A "dies" mid-stream (stops committing but still holds its handle —
    // the zombie-driver case). Promotion: a new process claims the SAME
    // log; the claim IS the fence.
    val b = Engine(spark, primaryDir)
    assert(b.log.writerEpoch > a.log.writerEpoch)
    assert(b.log.highestOffset == 2, "promotion adopts the committed state, no loss")
    assert(b.log.appendOne("w3".getBytes) == 3L, "offsets continue, no gap")

    // Zombie A's stray write is fenced — it cannot fork history.
    val e = intercept[graft.log.LogFencedException](a.log.appendOne("zombie".getBytes))
    assert(e.ourEpoch == a.log.writerEpoch && e.observedEpoch == b.log.writerEpoch)

    // Replication reconnects to the promoted writer and catches up;
    // exactly-once tokens make the re-run a no-op for old batches.
    b.log.appendOne("w4".getBytes)
    catchUp()
    assert(replica.log.highestOffset == 4)

    // No fork, no loss, no duplicates: one linear history on the primary,
    // and the replica's content is byte-identical in offset order.
    val primary = b.log.toDF
      .select("offset", "value")
      .collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getLong(0), new String(r.getAs[Array[Byte]](1))))
    assert(primary.map(_._1).toSeq == (0L to 4L))
    assert(primary.map(_._2).toSeq == Seq("w0", "w1", "w2", "w3", "w4"))
    val replicated = replica.log.toDF
      .select("offset", "value")
      .collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getLong(0), new String(r.getAs[Array[Byte]](1))))
    assert(replicated.toSeq == primary.toSeq)
  }
}
