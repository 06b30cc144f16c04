package graft.log

import java.net.URI
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.parquet.io.{InputFile, LocalInputFile, LocalOutputFile, OutputFile}

/** Filesystem seam for the log core.
  *
  * The reference is a single-node engine over POSIX files (reference:
  * internal/log/store.go, index.go — `os.File` + mmap throughout); a
  * 1000-executor log needs its segments on a shared filesystem instead. All
  * log-core I/O (manifest, journal, segment listing, part publish, and the
  * executor-side parquet readers) goes through this trait with two
  * implementations picked per path:
  *
  *   - [[NioLogFs]] for plain local paths (no scheme): unchanged plain-NIO
  *     fast path — `LocalInputFile`/`LocalOutputFile`, no Hadoop FileSystem
  *     dispatch, no `.crc` sidecars. This keeps single-record appends and
  *     point reads at single-digit milliseconds (BASELINE.md).
  *   - [[HadoopLogFs]] for any `scheme://` URI (`hdfs://`, `s3a://`, and
  *     `file://` for tests): routed through `org.apache.hadoop.fs.FileSystem`
  *     with parquet's `HadoopInputFile`/`HadoopOutputFile`. Metadata
  *     (manifest/journal) publishes via a VERSIONED single-object protocol
  *     (below) so it is torn-read-safe on object stores where rename is
  *     copy+delete, not atomic.
  *
  * Instances are stateless singletons resolved from the path string
  * (`LogFs.forPath`), so executor-side code reconstructs them from the
  * partition's path — nothing filesystem-shaped is serialized.
  *
  * Durability envelope, by backend:
  *   - HDFS-class filesystems (atomic rename, consistent listing): full
  *     crash-safety story — identical guarantees to the local NIO path.
  *   - Object stores (S3A et al.): metadata swaps are safe (each version is
  *     one atomic PUT, readers take the max version), but DIRECTORY renames
  *     (compaction's segment swap) are non-atomic copy+delete. The
  *     compaction journal + the graft scan's self-healing re-plan cover the
  *     swap window for readers; a writer crash mid-swap still recovers via
  *     the journal on reopen.
  */
private[graft] trait LogFs {

  /** Join a directory path and a child name. */
  def child(dir: String, name: String): String

  def mkdirs(path: String): Unit
  def exists(path: String): Boolean
  def isDir(path: String): Boolean

  /** Full paths of a directory's direct children; empty when not a dir. */
  def list(path: String): Vector[String]

  def size(path: String): Long

  /** Rename `src` to `dst` (atomic where the backend supports it). */
  def move(src: String, dst: String): Unit

  def delete(path: String): Unit
  def deleteRecursively(path: String): Unit

  /** Publish small metadata (manifest/journal) so that readers see either
    * the previous or the new content, never a torn mix.
    */
  def writeMeta(dir: String, name: String, bytes: Array[Byte]): Unit
  def readMeta(dir: String, name: String): Option[Array[Byte]]
  def deleteMeta(dir: String, name: String): Unit

  /** Parquet file handles for the point reader / part writer. */
  def inputFile(path: String): InputFile
  def outputFile(path: String): OutputFile

  /** Last path component. */
  def fileName(path: String): String = {
    val p = path.stripSuffix("/")
    p.substring(p.lastIndexOf('/') + 1)
  }
}

private[graft] object LogFs {
  private val Scheme = "^[A-Za-z][A-Za-z0-9+.-]*:/.*".r

  /** Scheme-bearing paths go through Hadoop; plain paths stay on NIO. Both
    * `scheme://authority/...` and the normalized single-slash form Hadoop's
    * own listings return (`file:/tmp/...`) count as scheme-bearing — a
    * listed child must resolve through the same filesystem as its parent.
    */
  def forPath(path: String): LogFs =
    if (Scheme.matches(path)) HadoopLogFs else NioLogFs
}

/** Plain-NIO implementation for local paths — the perf-critical default.
  * Metadata publish is tmp-write + `ATOMIC_MOVE`, which POSIX renames make
  * atomic.
  */
private[graft] object NioLogFs extends LogFs {
  private def p(s: String): Path = Paths.get(s)

  override def child(dir: String, name: String): String = Paths.get(dir, name).toString
  override def mkdirs(path: String): Unit = Files.createDirectories(p(path))
  override def exists(path: String): Boolean = Files.exists(p(path))
  override def isDir(path: String): Boolean = Files.isDirectory(p(path))

  override def list(path: String): Vector[String] = {
    if (!Files.isDirectory(p(path))) return Vector.empty
    val s = Files.list(p(path))
    try s.iterator().asScala.map(_.toString).toVector
    finally s.close()
  }

  override def size(path: String): Long = Files.size(p(path))

  override def move(src: String, dst: String): Unit =
    Files.move(p(src), p(dst), StandardCopyOption.ATOMIC_MOVE)

  override def delete(path: String): Unit = Files.deleteIfExists(p(path))

  override def deleteRecursively(path: String): Unit =
    if (Files.exists(p(path))) {
      val walk = Files.walk(p(path))
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally walk.close()
    }

  override def writeMeta(dir: String, name: String, bytes: Array[Byte]): Unit = {
    val tmp = Paths.get(dir, name + ".tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, Paths.get(dir, name), StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  override def readMeta(dir: String, name: String): Option[Array[Byte]] = {
    val f = Paths.get(dir, name)
    if (Files.exists(f)) Some(Files.readAllBytes(f)) else None
  }

  override def deleteMeta(dir: String, name: String): Unit =
    Files.deleteIfExists(Paths.get(dir, name))

  override def inputFile(path: String): InputFile = new LocalInputFile(p(path))
  override def outputFile(path: String): OutputFile = new LocalOutputFile(p(path))
}

/** Hadoop FileSystem implementation for `scheme://` paths.
  *
  * Metadata protocol: each publish writes a NEW object
  * `<name>.v<zero-padded seq>` (staged then renamed into the fresh name —
  * on object stores that rename is one atomic PUT because the destination
  * key never pre-exists), readers list and take the highest version, and
  * older versions are pruned best-effort after the new one lands. A reader
  * racing the prune retries the listing once. This removes the
  * rename-over-existing-file step that object stores can't do atomically.
  */
private[graft] object HadoopLogFs extends LogFs {
  /** One shared Configuration: construction re-scans default XMLs (~5 ms). */
  private val conf = new Configuration()

  private def fs(path: String): FileSystem = FileSystem.get(URI.create(path), conf)
  private def hp(s: String): HPath = new HPath(s)

  override def child(dir: String, name: String): String =
    dir.stripSuffix("/") + "/" + name

  override def mkdirs(path: String): Unit = fs(path).mkdirs(hp(path))

  override def exists(path: String): Boolean = fs(path).exists(hp(path))

  override def isDir(path: String): Boolean = {
    val f = fs(path)
    try f.getFileStatus(hp(path)).isDirectory
    catch { case _: java.io.FileNotFoundException => false }
  }

  override def list(path: String): Vector[String] = {
    val f = fs(path)
    try f.listStatus(hp(path)).toVector.map(_.getPath.toString)
    catch { case _: java.io.FileNotFoundException => Vector.empty }
  }

  override def size(path: String): Long = fs(path).getFileStatus(hp(path)).getLen

  override def move(src: String, dst: String): Unit = {
    if (!fs(src).rename(hp(src), hp(dst)))
      throw new java.io.IOException(s"rename failed: $src -> $dst")
  }

  override def delete(path: String): Unit = fs(path).delete(hp(path), false)

  override def deleteRecursively(path: String): Unit = fs(path).delete(hp(path), true)

  // ------------------------------------------------- versioned metadata

  private def versionOf(name: String, fileName: String): Option[Long] = {
    val prefix = name + ".v"
    if (fileName.startsWith(prefix)) fileName.stripPrefix(prefix).toLongOption
    else None
  }

  private def versions(dir: String, name: String): Vector[(Long, String)] =
    list(dir).flatMap(p => versionOf(name, fileName(p)).map(_ -> p)).sortBy(_._1)

  override def writeMeta(dir: String, name: String, bytes: Array[Byte]): Unit = {
    val f = fs(dir)
    val old = versions(dir, name)
    val next = old.lastOption.map(_._1 + 1).getOrElse(1L)
    val tmp = hp(child(dir, f"_tmp-$name.v$next%020d"))
    val out = f.create(tmp, true)
    try out.write(bytes)
    finally out.close()
    val dst = hp(child(dir, f"$name.v$next%020d"))
    if (!f.rename(tmp, dst)) {
      f.delete(tmp, false)
      throw new java.io.IOException(s"metadata publish failed: $dst")
    }
    // Prune superseded versions best-effort; racing readers retry the list.
    old.foreach { case (_, p) => try f.delete(hp(p), false) catch { case _: Exception => () } }
  }

  override def readMeta(dir: String, name: String): Option[Array[Byte]] = {
    def attempt(): Option[Array[Byte]] =
      versions(dir, name).lastOption.map { case (_, p) =>
        val in = fs(p).open(hp(p))
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          buf.toByteArray
        } finally in.close()
      }
    val read =
      try attempt()
      catch {
        case _: java.io.FileNotFoundException =>
          // Lost the race against a writer's prune — the newer version is
          // already listed on retry.
          try attempt()
          catch { case _: java.io.FileNotFoundException => None }
      }
    read.orElse(legacy(dir, name))
  }

  /** Unversioned fallback so a log copied byte-for-byte from a local
    * directory (plain `_manifest.json`) still opens.
    */
  private def legacy(dir: String, name: String): Option[Array[Byte]] = {
    val f = fs(dir)
    val p = hp(child(dir, name))
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(buf.toByteArray)
      } finally in.close()
    }
  }

  override def deleteMeta(dir: String, name: String): Unit = {
    val f = fs(dir)
    versions(dir, name).foreach { case (_, p) => try f.delete(hp(p), false) catch { case _: Exception => () } }
    try f.delete(hp(child(dir, name)), false)
    catch { case _: Exception => () }
  }

  override def inputFile(path: String): InputFile =
    org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp(path), conf)

  override def outputFile(path: String): OutputFile =
    org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(hp(path), conf)
}
