package graft.server

import java.nio.file.Paths

import graft.TestSpark

/** Shared per-run mTLS fixtures generated with the JDK's keytool:
  * server.p12 (CN=localhost, SAN for loopback), root.p12 (CN=root),
  * nobody.p12 (CN=nobody), servertrust.p12 (trusts both clients),
  * clienttrust.p12 (trusts the server). Self-signed certs whose anchors
  * live in the peer's trust store play the CA role — trust semantics
  * identical to the reference's CA-signed chain
  * (reference: internal/config/tls.go:18-46), fewer moving parts.
  */
object TestCerts {
  val password = "changeit"

  private lazy val keytool =
    Paths.get(System.getProperty("java.home"), "bin", "keytool").toString

  private def run(args: String*): Unit = {
    val p = new ProcessBuilder((keytool +: args): _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0, s"keytool ${args.head} failed:\n$out")
  }

  lazy val dir: String = {
    val d = TestSpark.tempDir("testcerts")
    def gen(alias: String, cn: String, store: String, san: Boolean): Unit =
      run(
        Seq(
          "-genkeypair", "-keyalg", "RSA", "-keysize", "2048", "-validity", "30",
          "-alias", alias, "-dname", s"CN=$cn", "-storetype", "PKCS12",
          "-keystore", s"$d/$store", "-storepass", password
        ) ++ (if (san) Seq("-ext", "san=dns:localhost,ip:127.0.0.1") else Nil): _*
      )
    def export(alias: String, store: String): Unit =
      run("-exportcert", "-alias", alias, "-keystore", s"$d/$store", "-storepass", password,
        "-file", s"$d/$alias.crt")
    def trust(alias: String, store: String): Unit =
      run("-importcert", "-noprompt", "-alias", alias, "-file", s"$d/$alias.crt",
        "-storetype", "PKCS12", "-keystore", s"$d/$store", "-storepass", password)
    gen("server", "localhost", "server.p12", san = true)
    gen("root", "root", "root.p12", san = false)
    gen("nobody", "nobody", "nobody.p12", san = false)
    Seq("server" -> "server.p12", "root" -> "root.p12", "nobody" -> "nobody.p12")
      .foreach { case (a, s) => export(a, s) }
    trust("root", "servertrust.p12")
    trust("nobody", "servertrust.p12")
    trust("server", "clienttrust.p12")
    d
  }

  def serverTls: MtlsConfig = MtlsConfig(s"$dir/server.p12", password, s"$dir/servertrust.p12", password)
  def clientTls(keyStore: String): MtlsConfig =
    MtlsConfig(s"$dir/$keyStore", password, s"$dir/clienttrust.p12", password)
}
