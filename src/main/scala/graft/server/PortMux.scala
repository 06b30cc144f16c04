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
  * Plaintext-mode only, like the byte-matchers it mirrors: sniffing inside
  * TLS would need an SNI/ALPN peek before the handshake completes —
  * deployments running mTLS keep the two listeners separate (exactly the
  * trade the reference makes by matching on raw first bytes).
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
      val head = new Array[Byte](Preface.length)
      var got = 0
      while (got < head.length) {
        val n = in.read(head, got, head.length - got)
        if (n < 0) { conn.close(); return }
        got += n
      }
      conn.setSoTimeout(0)
      val isGrpc = java.util.Arrays.equals(head, Preface)
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
