package graft.server

import java.io.{InputStream, OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.util.concurrent.atomic.AtomicBoolean

/** Single-port protocol multiplexer — the cmux role in the reference's
  * agent (reference: internal/agent/agent.go:79-91 serves Raft and gRPC on
  * one listener by matching each connection's first bytes; cmux routes the
  * byte-prefix `RaftRPC=1` stream to Raft and everything else to gRPC).
  *
  * Here the two protocols sharing a port are gRPC and HTTP/1: every gRPC
  * connection opens with the HTTP/2 client preface `PRI * HTTP/2.0` (RFC
  * 9113 §3.4 — constant bytes, exactly what cmux's matcher reads), while
  * the JSON front end speaks HTTP/1 (`GET`/`POST`/...). The mux accepts,
  * reads just enough of the first bytes to classify, dials the matching
  * loopback backend, replays the sniffed bytes, and pumps the socket pair
  * both ways until either side closes.
  *
  * TLS connections mux too, without terminating: a first byte of 0x16 is a
  * TLS handshake record, and the ClientHello inside it is PLAINTEXT — the
  * mux parses its ALPN extension (RFC 7301) before any handshake completes
  * and routes h2-only offers (what every gRPC client sends) to the gRPC
  * backend, anything else (curl/browsers offer `h2,http/1.1`; no-ALPN
  * legacy clients offer nothing) to the HTTP backend. The reference
  * reaches the same end differently — its cmux matches raw bytes and the
  * agent layers server TLS per matched listener (reference:
  * internal/agent/agent.go:79-91, :124-149); here the BACKENDS own their
  * mTLS handshakes and the mux stays a byte relay, which keeps the
  * CN-subject auth chain literally intact: the backend verifies the real
  * client certificate, so no identity ever has to be relayed or trusted
  * from the front door. Deployers hand both backends the same
  * [[MtlsConfig]] and publish one TLS port.
  *
  * Threading: one accept loop + two pump threads per live connection, all
  * daemons. This is a control-plane front door (CLI produces/consumes,
  * health checks, membership announcements) — the data plane is Spark
  * scans, which never cross this socket — so thread-per-connection is the
  * right simplicity trade at any deployment size.
  */
final class PortMux(port: Int, grpcBackendPort: Int, httpBackendPort: Int) {
  private val listener = new ServerSocket()
  private val closed = new AtomicBoolean(false)

  /** HTTP/2 connection preface prefix — enough bytes to be unambiguous
    * (no HTTP/1 method starts with "PRI ").
    */
  private val Preface = "PRI ".getBytes("US-ASCII")

  def boundPort: Int = listener.getLocalPort

  def start(): PortMux = {
    listener.bind(new InetSocketAddress(port))
    val acceptor = new Thread(
      () =>
        while (!closed.get()) {
          try {
            val conn = listener.accept()
            val t = new Thread(() => route(conn), "mux-conn")
            t.setDaemon(true)
            t.start()
          } catch {
            case _: Exception if closed.get() => () // listener closed: exit
            case _: Exception                 =>
              // Persistent accept failure (fd exhaustion, EMFILE): back off
              // instead of busy-spinning the accept loop at 100% CPU while
              // starving the connections that would release descriptors.
              try Thread.sleep(100L)
              catch { case _: InterruptedException => () }
          }
        },
      "mux-accept"
    )
    acceptor.setDaemon(true)
    acceptor.start()
    this
  }

  private def route(conn: Socket): Unit = {
    // Track the backend socket so ANY failure after the dial closes both
    // sides — a client reset during the head replay must not leak the
    // freshly dialed backend fd (each leak compounds toward EMFILE).
    var backend: Socket = null
    try {
      conn.setTcpNoDelay(true)
      val in = conn.getInputStream
      // Read exactly the sniff window; a client that sends fewer bytes and
      // stalls never classifies — bound the wait so a dead peer can't pin
      // the thread forever.
      conn.setSoTimeout(10000)
      val sniff = new SniffBuffer(in)
      val first = sniff.byteAt(0)
      val isGrpc =
        if (first == 0x16) {
          // TLS handshake record: peek the ClientHello's ALPN offer. Only a
          // pure-h2 offer is a gRPC client; `h2,http/1.1` (curl, browsers,
          // java.net.http) and no-ALPN both mean the HTTP backend, whose
          // TLS stack will negotiate http/1.1.
          val alpn = Tls.clientHelloAlpn(sniff)
          alpn.contains("h2") && !alpn.contains("http/1.1")
        } else {
          // Plaintext: the HTTP/2 client preface is constant bytes; no
          // HTTP/1 method starts with "PRI ".
          (0 until Preface.length).forall(i => sniff.byteAt(i) == (Preface(i) & 0xff))
        }
      val head = sniff.consumed
      conn.setSoTimeout(0)
      val backendPort = if (isGrpc) grpcBackendPort else httpBackendPort
      // Dial the literal loopback address the backends bind rather than
      // "localhost": on hosts where localhost resolves to ::1 first,
      // Socket(String, int) tries only that address and every multiplexed
      // connection would fail against a 127.0.0.1-bound backend.
      backend = new Socket("127.0.0.1", backendPort)
      backend.setTcpNoDelay(true)
      // Replay the classified bytes, then pump both directions.
      backend.getOutputStream.write(head)
      backend.getOutputStream.flush()
      pump(in, backend.getOutputStream, conn, backend)
      pump(backend.getInputStream, conn.getOutputStream, backend, conn)
    } catch {
      case _: Exception =>
        try conn.close() catch { case _: Exception => () }
        if (backend != null) { try backend.close() catch { case _: Exception => () } }
    }
  }

  /** One-direction byte pump; closes both sockets when its side ends, which
    * unblocks the opposite pump's read — the pair dies together.
    */
  private def pump(in: InputStream, out: OutputStream, a: Socket, b: Socket): Unit = {
    val t = new Thread(
      () => {
        val buf = new Array[Byte](8192)
        try {
          var n = in.read(buf)
          while (n >= 0) {
            out.write(buf, 0, n)
            out.flush()
            n = in.read(buf)
          }
        } catch { case _: Exception => () } finally {
          try a.close() catch { case _: Exception => () }
          try b.close() catch { case _: Exception => () }
        }
      },
      "mux-pump"
    )
    t.setDaemon(true)
    t.start()
  }

  def stop(): Unit = {
    closed.set(true)
    try listener.close()
    catch { case _: Exception => () }
  }
}

/** Lazily-filled peek buffer over a connection's first bytes: `byteAt`
  * reads from the stream only as far as asked, `consumed` returns every
  * byte actually read so the router can replay them verbatim to the chosen
  * backend. Bounded so a hostile client can't balloon the sniff window.
  */
private[server] final class SniffBuffer(in: InputStream, maxBytes: Int = 64 * 1024) {
  private var buf = new Array[Byte](512)
  private var len = 0

  /** Byte at offset `i` as 0–255; reads more from the stream as needed.
    * Throws EOF/IO on a peer that closes or overruns the window — the
    * router treats either as a dead connection.
    */
  def byteAt(i: Int): Int = { ensure(i + 1); buf(i) & 0xff }

  private def ensure(n: Int): Unit = {
    if (n > maxBytes) throw new java.io.IOException(s"sniff window exceeded: $n > $maxBytes")
    if (n > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, n))
    while (len < n) {
      val r = in.read(buf, len, buf.length - len)
      if (r < 0) throw new java.io.EOFException("peer closed during sniff")
      len += r
    }
  }

  def consumed: Array[Byte] = java.util.Arrays.copyOf(buf, len)
}

/** Minimal TLS ClientHello reader — just enough of RFC 8446 §4.1.2 +
  * RFC 7301 to pull the ALPN offer out of the handshake's plaintext
  * prefix. Nothing here decrypts or terminates; the bytes parsed are the
  * ones any network tap could read before the handshake completes.
  */
private[server] object Tls {

  /** ALPN protocol names offered by the ClientHello starting at stream
    * offset 0, or empty when absent/unparseable (unparseable routes to the
    * HTTP backend, whose TLS stack will reject it properly — the mux never
    * needs to be the component that fails a bad handshake).
    */
  def clientHelloAlpn(s: SniffBuffer): Set[String] = {
    // Handshake messages may be fragmented across consecutive 0x16 records
    // (RFC 8446 §5.1); concatenate payloads until the ClientHello's own
    // declared length is buffered. IO errors propagate (dead peer); any
    // structural surprise just means "no ALPN".
    val hs = new java.io.ByteArrayOutputStream(512)
    var recOff = 0
    var total = -1
    while (total < 0 || hs.size < total) {
      if (s.byteAt(recOff) != 0x16) return Set.empty
      val recLen = (s.byteAt(recOff + 3) << 8) | s.byteAt(recOff + 4)
      if (recLen <= 0) return Set.empty
      var i = 0
      while (i < recLen && (total < 0 || hs.size < total)) {
        hs.write(s.byteAt(recOff + 5 + i))
        i += 1
      }
      recOff += 5 + recLen
      if (total < 0 && hs.size >= 4) {
        val h = hs.toByteArray
        if (h(0) != 0x01) return Set.empty // not a ClientHello
        total = 4 + (((h(1) & 0xff) << 16) | ((h(2) & 0xff) << 8) | (h(3) & 0xff))
      }
    }
    try parseAlpn(hs.toByteArray)
    catch { case _: IndexOutOfBoundsException => Set.empty }
  }

  private def parseAlpn(h: Array[Byte]): Set[String] = {
    def u16(p: Int): Int = ((h(p) & 0xff) << 8) | (h(p + 1) & 0xff)
    var p = 4 // handshake header
    p += 2 + 32 // legacy_version + random
    p += 1 + (h(p) & 0xff) // session id
    p += 2 + u16(p) // cipher suites
    p += 1 + (h(p) & 0xff) // compression methods
    if (p + 2 > h.length) return Set.empty // extensionless hello
    val extEnd = math.min(h.length, p + 2 + u16(p))
    p += 2
    while (p + 4 <= extEnd) {
      val extType = u16(p)
      val extLen = u16(p + 2)
      p += 4
      if (extType == 16) { // application_layer_protocol_negotiation
        val listEnd = math.min(p + extLen, h.length)
        var q = p + 2 // skip the list's own length prefix
        val out = Set.newBuilder[String]
        while (q < listEnd) {
          val n = h(q) & 0xff
          q += 1
          if (n > 0 && q + n <= listEnd) out += new String(h, q, n, "US-ASCII")
          q += n
        }
        return out.result()
      }
      p += extLen
    }
    Set.empty
  }
}
