package graft.server

import java.io.ByteArrayInputStream

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** The mux's ClientHello/ALPN peek sits on the public port's untrusted
  * byte path, so it gets its own adversarial coverage: a synthesized
  * well-formed hello must parse to exactly the offered protocols
  * (including fragmented across TLS records), and arbitrary garbage must
  * classify (to "no ALPN" → HTTP backend) or throw IO — never crash,
  * never loop, never read past the sniff window.
  */
class TlsSniffSpec extends AnyFunSuite {

  /** Build a syntactically valid ClientHello offering `protos`, split
    * into TLS records of at most `recCap` payload bytes.
    */
  private def clientHello(protos: Seq[String], recCap: Int = 16384): Array[Byte] = {
    val alpnList = protos.flatMap { p =>
      val b = p.getBytes("US-ASCII")
      b.length.toByte +: b
    }.toArray
    val alpnData = Array[Byte](
      ((alpnList.length >> 8) & 0xff).toByte,
      (alpnList.length & 0xff).toByte
    ) ++ alpnList
    val ext = Array[Byte](0x00, 0x10) ++ // type 16 = ALPN
      Array[Byte](((alpnData.length >> 8) & 0xff).toByte, (alpnData.length & 0xff).toByte) ++
      alpnData
    // A padding-ish extension first, so ALPN is not the opening one.
    val pad = Array[Byte](0x00, 0x15, 0x00, 0x03, 0x00, 0x00, 0x00)
    val exts = pad ++ ext
    val body =
      Array[Byte](0x03, 0x03) ++ // legacy_version
        Array.fill[Byte](32)(0x42) ++ // random
        Array[Byte](0x00) ++ // session id len 0
        Array[Byte](0x00, 0x02, 0x13, 0x01) ++ // one cipher suite
        Array[Byte](0x01, 0x00) ++ // one compression method (null)
        Array[Byte](((exts.length >> 8) & 0xff).toByte, (exts.length & 0xff).toByte) ++
        exts
    val hs = Array[Byte](0x01, // ClientHello
      ((body.length >> 16) & 0xff).toByte,
      ((body.length >> 8) & 0xff).toByte,
      (body.length & 0xff).toByte) ++ body
    // Fragment the handshake into 0x16 records.
    hs.grouped(recCap).flatMap { frag =>
      Array[Byte](0x16, 0x03, 0x03,
        ((frag.length >> 8) & 0xff).toByte, (frag.length & 0xff).toByte) ++ frag
    }.toArray
  }

  private def parse(bytes: Array[Byte]): Set[String] =
    Tls.clientHelloAlpn(new SniffBuffer(new ByteArrayInputStream(bytes)))

  test("well-formed hello parses the exact ALPN offer") {
    assert(parse(clientHello(Seq("h2"))) == Set("h2"))
    assert(parse(clientHello(Seq("h2", "http/1.1"))) == Set("h2", "http/1.1"))
    assert(parse(clientHello(Seq("grpc-exp", "h2"))) == Set("grpc-exp", "h2"))
    assert(parse(clientHello(Nil)) == Set.empty)
  }

  test("hello fragmented across tiny TLS records still parses") {
    // 7-byte record payloads force the ClientHello across many records.
    assert(parse(clientHello(Seq("h2", "http/1.1"), recCap = 7)) == Set("h2", "http/1.1"))
    assert(parse(clientHello(Seq("h2"), recCap = 1)) == Set("h2"))
  }

  test("garbage, truncation, and hostile lengths never crash or hang (seeded fuzz)") {
    val rnd = new Random(90210)
    val base = clientHello(Seq("h2", "http/1.1"))
    for (trial <- 0 until 2000) {
      val bytes: Array[Byte] = rnd.nextInt(4) match {
        case 0 => // pure noise
          Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
        case 1 => // truncated valid hello
          base.take(rnd.nextInt(base.length))
        case 2 => // valid hello with random byte corruption
          val b = base.clone()
          (0 until 1 + rnd.nextInt(8))
            .foreach(_ => b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte)
          b
        case _ => // valid record header declaring a hostile huge length
          Array[Byte](0x16, 0x03, 0x03, 0x7f.toByte, 0xff.toByte) ++
            Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      }
      // Contract: returns a (possibly empty) protocol set, or throws an
      // IOException family error (peer-closed / window exceeded). Anything
      // else — NPE, index error, infinite loop — fails the trial.
      try { val _ = parse(bytes) }
      catch {
        case _: java.io.IOException => () // EOF / sniff window: expected
        case e: Throwable           => fail(s"trial $trial: unexpected ${e.getClass}: $e")
      }
    }
  }

  test("sniff window is bounded: a hello larger than the cap throws IO, not OOM") {
    // Declared handshake length far beyond the 64 KiB sniff cap, fed from
    // an endless stream of records.
    val in = new java.io.InputStream {
      private var n = 0L
      override def read(): Int = {
        // Endless 0x16 records with max-size payload declarations.
        val header = Array[Byte](0x16, 0x03, 0x03, 0x3f, 0xff.toByte)
        val b: Byte =
          if (n % 16388 < 5) header((n % 16388).toInt)
          else if (n == 5) 0x01 // ClientHello type
          else if (n <= 8) 0x7f // 3-byte length: huge
          else 0x00
        n += 1
        b & 0xff
      }
    }
    intercept[java.io.IOException](Tls.clientHelloAlpn(new SniffBuffer(in)))
  }
}
