package graft.server

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the toy HTTP server behavior (reference: internal/server/http.go
  * produce/consume handlers over the slice log).
  */
class InMemoryLogSpec extends AnyFunSuite {

  test("append assigns offsets by slice length; read round-trips (log.go:29-47)") {
    val log = new InMemoryLog
    assert(log.append("first".getBytes) == 0)
    assert(log.append("second".getBytes) == 1)
    assert(new String(log.read(1).value) == "second")
    assert(log.read(0).offset == 0)
  }

  test("read past end raises ErrOffsetNotFound with 404 (http.go:63-66)") {
    val log = new InMemoryLog
    log.append("only".getBytes)
    val e = intercept[OffsetNotFoundException.type](log.read(1))
    assert(e.code == 404)
    assert(e.getMessage == "offset not found")
    intercept[OffsetNotFoundException.type](log.read(-1))
  }
}
