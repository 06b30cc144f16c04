package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Paths
import java.util.Base64

import javax.net.ssl.SSLHandshakeException

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.log.{LogConfig, SparkLog}

/** Mutual-TLS end-to-end: the server requires a VERIFIED client
  * certificate and derives the ACL subject from its CN — the reference's
  * authentication model (reference: internal/server/server.go:160-178 CN
  * extraction; internal/config/tls.go:36-40 RequireAndVerifyClientCert).
  * Certificates are generated per-run with the JDK's keytool: self-signed
  * client certs whose trust anchors live in the server trust store play the
  * CA role (trust semantics identical, fewer moving parts than a chain).
  */
class MtlsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // Certificate fixtures shared with the gRPC spec — see TestCerts.
  private val pw = TestCerts.password
  private def dir = TestCerts.dir

  private def client(keyStore: String): HttpClient = {
    val ctx = Mtls.sslContext(TestCerts.clientTls(keyStore))
    HttpClient.newBuilder().sslContext(ctx).build()
  }

  private def withTlsServer(f: (String) => Unit): Unit = {
    val log = SparkLog(spark, TestSpark.tempDir("mtls-log"), LogConfig(maxStoreBytes = 256))
    val srv = new HttpLogServer(
      new LogService(log),
      port = 0,
      tls = Some(TestCerts.serverTls)
    ).start()
    try f(s"https://localhost:${srv.boundPort}")
    finally srv.stop()
  }

  private def b64(s: String): String = Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  test("verified client cert CN is the subject; round trip works for root") {
    withTlsServer { base =>
      val c = client("root.p12")
      val p = c.send(
        HttpRequest.newBuilder(URI.create(s"$base/"))
          .POST(HttpRequest.BodyPublishers.ofString(s"""{"record":{"value":"${b64("secure")}"}}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString()
      )
      assert(p.statusCode() == 200 && p.body().contains("\"offset\":0"), p.body())
      val r = c.send(
        HttpRequest.newBuilder(URI.create(s"$base/?offset=0")).GET().build(),
        HttpResponse.BodyHandlers.ofString()
      )
      assert(r.statusCode() == 200 && r.body().contains(s""""value":"${b64("secure")}""""))
    }
  }

  test("a spoofed X-Subject header cannot override the certificate CN") {
    withTlsServer { base =>
      val c = client("nobody.p12")
      val p = c.send(
        HttpRequest.newBuilder(URI.create(s"$base/"))
          .header("X-Subject", "root") // lies
          .POST(HttpRequest.BodyPublishers.ofString(s"""{"record":{"value":"${b64("x")}"}}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString()
      )
      assert(p.statusCode() == 403, s"${p.statusCode()}: ${p.body()}")
      assert(p.body() == "nobody not permitted to produce to *", p.body())
    }
  }

  test("a client without a trusted certificate cannot connect at all") {
    withTlsServer { base =>
      // Trusts the server but presents no client identity.
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      val ts = java.security.KeyStore.getInstance("PKCS12")
      val in = new java.io.FileInputStream(s"$dir/clienttrust.p12")
      try ts.load(in, pw.toCharArray)
      finally in.close()
      val tmf = javax.net.ssl.TrustManagerFactory
        .getInstance(javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(ts)
      ctx.init(null, tmf.getTrustManagers, null)
      val c = HttpClient.newBuilder().sslContext(ctx).build()
      val attempt =
        try {
          val r = c.send(
            HttpRequest.newBuilder(URI.create(s"$base/stat")).GET().build(),
            HttpResponse.BodyHandlers.ofString()
          )
          Left(r.statusCode())
        } catch { case e: Exception => Right(e) }
      attempt match {
        case Right(e) =>
          def causes(t: Throwable): Seq[Throwable] =
            if (t == null) Nil else t +: causes(t.getCause)
          assert(
            causes(e).exists(c =>
              c.isInstanceOf[SSLHandshakeException] || c.isInstanceOf[java.io.IOException]),
            s"unexpected failure: $e"
          )
        case Left(code) => fail(s"handshake should have failed, got HTTP $code")
      }
    }
  }
}
