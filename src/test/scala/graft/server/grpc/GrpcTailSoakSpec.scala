package graft.server.grpc

import java.util.concurrent.{CountDownLatch, TimeUnit}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.sparkproject.connect.grpc._
import org.sparkproject.connect.grpc.stub.{ClientCalls, StreamObserver}

import graft.TestSpark
import graft.log.{LogRecord, SparkLog}
import graft.server.{ConsumeRequest, LogService}

/** Thread-bound + wake-up soak for the event-driven ConsumeStream: 200
  * concurrent tails all parked past the end of the log must hold ZERO
  * per-stream threads (the shared drain pool is the only tail machinery),
  * and one produce must wake every one of them through the log's commit
  * hook — the fallback timer is configured far too slow to help, so a
  * delivery proves the event path. The old design parked one
  * cached-pool thread per stream in a 2 ms sleep-poll loop; 200 tails
  * would have been 200 threads.
  */
class GrpcTailSoakSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Streams = 200

  private def tailThreadCount: Int =
    Thread.getAllStackTraces.keySet.asScala.count(_.getName.startsWith("graft-tail-worker"))

  test(s"$Streams parked tails: bounded threads, one commit wakes all") {
    val log = SparkLog(spark, TestSpark.tempDir("grpc-soak"))
    // pollMillis = 10 min: any delivery inside the test window came from
    // the commit hook, not the fallback re-arm.
    val srv = new GrpcLogServer(
      new LogService(log),
      port = 0,
      pollMillis = 600000L,
      anonymousSubject = "root"
    ).start()
    val channel = Grpc
      .newChannelBuilderForAddress("localhost", srv.boundPort, InsecureChannelCredentials.create())
      .build()
    try {
      val first = new CountDownLatch(Streams)
      val second = new CountDownLatch(Streams)
      (0 until Streams).foreach { _ =>
        ClientCalls.asyncServerStreamingCall(
          channel.newCall(LogProto.ConsumeStream, CallOptions.DEFAULT),
          ConsumeRequest(0L),
          new StreamObserver[LogRecord] {
            override def onNext(rec: LogRecord): Unit = rec.offset match {
              case 0L => first.countDown()
              case 1L => second.countDown()
              case _  => ()
            }
            override def onError(t: Throwable): Unit = ()
            override def onCompleted(): Unit = ()
          }
        )
      }

      // Let every stream run its catch-up pass and park. No stream may own
      // a thread while parked: the only tail threads are the fixed pool.
      Thread.sleep(1500)
      val parkedThreads = tailThreadCount
      assert(
        parkedThreads <= GrpcLogServer.TailWorkers,
        s"$Streams parked tails use $parkedThreads tail threads (bound ${GrpcLogServer.TailWorkers})"
      )

      // One commit → all 200 streams deliver, via the hook (fallback is
      // 10 min away). Generous await for a loaded box; typical is <1 s.
      log.appendOne("wake one".getBytes)
      assert(first.await(30, TimeUnit.SECONDS), s"${first.getCount} tails missed offset 0")

      log.appendOne("wake two".getBytes)
      assert(second.await(30, TimeUnit.SECONDS), s"${second.getCount} tails missed offset 1")

      assert(tailThreadCount <= GrpcLogServer.TailWorkers)
    } finally {
      channel.shutdownNow()
      channel.awaitTermination(5, TimeUnit.SECONDS)
      srv.stop()
    }
  }
}
