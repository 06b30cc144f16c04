package graft.server

import java.io.FileInputStream

import javax.naming.ldap.LdapName
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

import scala.jdk.CollectionConverters._

/** Mutual-TLS configuration for [[HttpLogServer]] — the JVM analog of the
  * reference's `SetupTLSConfig` (reference: internal/config/tls.go:18-46):
  * the key store holds the server's certificate chain + private key
  * (CertFile/KeyFile), the trust store holds the client trust anchors
  * (CAFile with `ClientAuth = RequireAndVerifyClientCert`). Stores are
  * PKCS12, the JDK-native container.
  */
final case class MtlsConfig(
    keyStorePath: String,
    keyStorePassword: String,
    trustStorePath: String,
    trustStorePassword: String
)

object Mtls {

  /** KeyManagers presenting the key store's identity (CertFile/KeyFile leg). */
  def keyManagers(cfg: MtlsConfig): Array[javax.net.ssl.KeyManager] = {
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val ksIn = new FileInputStream(cfg.keyStorePath)
    try ks.load(ksIn, cfg.keyStorePassword.toCharArray)
    finally ksIn.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, cfg.keyStorePassword.toCharArray)
    kmf.getKeyManagers
  }

  /** TrustManagers verifying peers against the trust store (CAFile leg). */
  def trustManagers(cfg: MtlsConfig): Array[javax.net.ssl.TrustManager] = {
    val ts = java.security.KeyStore.getInstance("PKCS12")
    val tsIn = new FileInputStream(cfg.trustStorePath)
    try ts.load(tsIn, cfg.trustStorePassword.toCharArray)
    finally tsIn.close()
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ts)
    tmf.getTrustManagers
  }

  /** Build an SSLContext that presents the key-store identity and verifies
    * peers against the trust store — both directions of the reference's
    * server-mode config.
    */
  def sslContext(cfg: MtlsConfig): SSLContext = {
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(keyManagers(cfg), trustManagers(cfg), null)
    ctx
  }

  /** CN from an X.500 name (`CN=root,O=...`) — the subject extraction of
    * the reference's `authenticate` interceptor (reference:
    * internal/server/server.go:162-174: VerifiedChains[0][0].Subject
    * .CommonName).
    */
  def commonName(x500: String): Option[String] =
    try new LdapName(x500).getRdns.asScala.collectFirst {
      case rdn if rdn.getType.equalsIgnoreCase("CN") => String.valueOf(rdn.getValue)
    } catch { case _: Exception => None }
}
