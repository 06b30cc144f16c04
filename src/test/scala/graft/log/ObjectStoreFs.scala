package graft.log

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** An object-store-semantics adversary over the local filesystem, for
  * proving the versioned metadata protocol + fencing survive what
  * `s3a://` actually gives you:
  *
  *   - `rename` is NOT a filesystem rename: each FILE becomes one
  *     "atomic PUT" of the destination (the object appears complete or
  *     not at all — S3 PUT semantics) followed by a separate delete of
  *     the source. A crash between the halves leaves BOTH objects.
  *   - rename OVERWRITES an existing destination silently (PUT has no
  *     create-exclusive) — the exact hole [[LogFs.writeMetaCas]]'s
  *     pre-flight-exists fence is documented to only best-effort cover.
  *   - a DIRECTORY rename is a per-child copy+delete loop — non-atomic
  *     across children; a crash mid-loop leaves a SPLIT directory (some
  *     children moved, some not).
  *
  * Crash injection: [[ObjectStoreFileSystem.failAfterPuts]] counts down
  * per completed PUT; when it hits zero the rename throws AFTER the
  * destination appeared but BEFORE the source was deleted.
  */
class ObjectStoreFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "objstore"
  override def getUri: URI = URI.create("objstore:///")

  private def putBytes(src: Path, dst: Path): Unit = {
    // "Atomic PUT": stage next to the destination, then one POSIX rename
    // (File.renameTo replaces atomically) — the destination object is
    // only ever visible complete, but any prior object is overwritten.
    val tmp = new Path(dst.getParent, s"._put-${java.util.UUID.randomUUID().toString.take(8)}")
    val in = super.open(src)
    val out = super.create(tmp, true)
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } finally { in.close(); out.close() }
    if (!super.rename(tmp, dst)) {
      // POSIX renameTo refuses when dst exists as a DIRECTORY etc. — the
      // shim treats that as a hard error, never a partial state.
      super.delete(tmp, false)
      throw new java.io.IOException(s"objstore PUT failed: $dst")
    }
    ObjectStoreFileSystem.onPutDone()
  }

  override def rename(src: Path, dst: Path): Boolean = {
    val st =
      try getFileStatus(src)
      catch { case _: java.io.FileNotFoundException => return false }
    if (st.isDirectory) {
      mkdirs(dst)
      listStatus(src).foreach { c =>
        if (!rename(c.getPath, new Path(dst, c.getPath.getName)))
          throw new java.io.IOException(s"objstore dir-rename child failed: ${c.getPath}")
      }
      super.delete(src, true)
      true
    } else {
      putBytes(src, dst)
      super.delete(src, false)
      true
    }
  }
}

object ObjectStoreFileSystem {
  /** Countdown of PUTs to allow before the NEXT rename throws between its
    * PUT and its source delete (-1 = never). Reset by tests.
    */
  @volatile var failAfterPuts: Int = -1

  /** Total completed PUTs since the last reset — lets a sweep measure an
    * operation's PUT-boundary count before crashing each boundary in turn.
    */
  @volatile var putCount: Long = 0L

  val InjectedMessage = "objstore: injected crash after PUT, before source delete"

  /** True when `t` (or anything in its cause chain) is an injected crash —
    * Spark wraps executor-side failures in SparkException layers.
    */
  def isInjected(t: Throwable): Boolean = {
    var cur: Throwable = t
    val seen = scala.collection.mutable.Set.empty[Throwable]
    while (cur != null && seen.add(cur)) {
      if (cur.getMessage != null && cur.getMessage.contains(InjectedMessage)) return true
      cur = cur.getCause
    }
    false
  }

  private def onPutDone(): Unit = synchronized {
    putCount += 1
    if (failAfterPuts > 0) failAfterPuts -= 1
    else if (failAfterPuts == 0) {
      failAfterPuts = -1
      throw new java.io.IOException(InjectedMessage)
    }
  }
}
