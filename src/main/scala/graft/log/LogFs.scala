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
  *   - [[NioLogFs]] for plain local paths (no scheme): plain-NIO fast path —
  *     `LocalInputFile`/`LocalOutputFile`, no Hadoop FileSystem dispatch, no
  *     `.crc` sidecars. This keeps single-record appends and point reads at
  *     single-digit milliseconds (BASELINE.md).
  *   - [[HadoopLogFs]] for any `scheme://` URI (`hdfs://`, `s3a://`, and
  *     `file://` for tests): routed through `org.apache.hadoop.fs.FileSystem`
  *     with parquet's `HadoopInputFile`/`HadoopOutputFile`.
  *
  * Small metadata (manifest/journal) uses ONE versioned protocol on both
  * backends — see [[LogFs.writeMeta]]. Unifying the representation is what
  * makes migration safe: a directory addressed as `/mnt/log` today and
  * `file:///mnt/log` (or copied to `s3a://…`) tomorrow always agrees on
  * which metadata object is newest, with no cross-backend staleness and no
  * correctness dependence on best-effort cleanup.
  *
  * Instances are stateless singletons resolved from the path string
  * (`LogFs.forPath`), so executor-side code reconstructs them from the
  * partition's path — nothing filesystem-shaped is serialized.
  *
  * Durability envelope, by backend:
  *   - HDFS-class filesystems (atomic rename, consistent listing): full
  *     crash-safety story — identical guarantees to the local NIO path.
  *   - Object stores (S3A et al.): metadata swaps are safe (each version is
  *     one atomic PUT of a fresh key, readers take the max version), but
  *     DIRECTORY renames (compaction's segment swap) are non-atomic
  *     copy+delete. The compaction journal + the graft scan's self-healing
  *     re-plan cover the swap window for readers; a writer crash mid-swap
  *     still recovers via the journal on reopen.
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

  /** Delete `path` and report whether THIS call removed it — atomic on both
    * backends (NIO `deleteIfExists`, Hadoop `delete`), so concurrent
    * callers racing on one file see exactly one `true`. The primitive
    * behind the publish-marker ownership handshake (see SparkLog): whoever
    * wins the delete owns the fate of a dir's unmanifested parts.
    */
  def deleteIfExists(path: String): Boolean

  /** Write a small plain (un-versioned) file, overwriting any existing one.
    * Not for metadata that needs the versioned CAS protocol — this is for
    * advisory markers whose lifecycle is create → atomic-delete.
    */
  def writeRawFile(path: String, bytes: Array[Byte]): Unit

  /** Read a plain file written by [[writeRawFile]]; None when absent. */
  def readRawFile(path: String): Option[Array[Byte]]

  /** Parquet file handles for the point reader / part writer. */
  def inputFile(path: String): InputFile
  def outputFile(path: String): OutputFile

  /** Last path component. */
  def fileName(path: String): String = {
    val p = path.stripSuffix("/")
    p.substring(p.lastIndexOf('/') + 1)
  }

  /** Parent directory path ('/'-separated on every backend we construct).
    * A bare single-segment name has the working directory as its parent.
    */
  def parent(path: String): String = {
    val p = path.stripSuffix("/")
    val i = p.lastIndexOf('/')
    if (i < 0) "." else p.substring(0, i)
  }

  // ---------------------------------------------------- versioned metadata

  /** Read a small file fully. */
  protected def readFileBytes(path: String): Array[Byte]

  /** Write `bytes` so the file APPEARS ATOMICALLY at `finalPath`, which
    * never pre-exists: stage under `tmpPath`, then rename. On POSIX/HDFS
    * the rename is atomic; on object stores renaming to a fresh key is one
    * atomic PUT. `tmpPath` starts with `_tmp-` so a crash's leftover is
    * swept by the open-time cleanup.
    */
  protected def writeFreshFile(tmpPath: String, finalPath: String, bytes: Array[Byte]): Unit

  private def versionsOf(dir: String, name: String): Vector[(Long, String)] = {
    val prefix = name + ".v"
    list(dir)
      .flatMap { p =>
        val n = fileName(p)
        if (n.startsWith(prefix)) n.stripPrefix(prefix).toLongOption.map(_ -> p)
        else None
      }
      .sortBy(_._1)
  }

  /** Publish small metadata (manifest/journal): write `<name>.v<seq>` with
    * `seq` = on-disk max + 1, then prune older versions and any legacy
    * plain `<name>` file best-effort. Readers take the highest version, so
    * neither the prune nor the legacy delete is load-bearing — a crash
    * between publish and prune merely leaves superseded objects for the
    * next write to clear. Torn reads are impossible: a version object is
    * only visible complete (fresh-key rename). The listing before each
    * write costs one directory scan — noise next to the parquet encode on
    * the append path, and the price of deriving `seq` from DISK rather
    * than a per-process counter that a backend switch or crash could
    * de-synchronize.
    */
  final def writeMeta(dir: String, name: String, bytes: Array[Byte]): Unit = {
    val old = versionsOf(dir, name)
    val next = old.lastOption.map(_._1 + 1).getOrElse(1L)
    val finalName = f"$name.v$next%020d"
    writeFreshFile(child(dir, s"_tmp-$finalName"), child(dir, finalName), bytes)
    old.foreach { case (_, p) => try delete(p) catch { case _: Exception => () } }
    try delete(child(dir, name))
    catch { case _: Exception => () }
  }

  /** Compare-and-swap flavor of [[writeMeta]]: publish `<name>.v<expectedSeq+1>`
    * EXCLUSIVELY — if that version object already exists, nothing is written
    * and this returns false, so of N writers racing from the same observed
    * version exactly one wins. This is the primitive writer fencing stands
    * on. Strictness by backend: POSIX-NIO uses an atomic hard-link create
    * (fails iff the target exists), HDFS rename refuses an existing
    * destination atomically; Hadoop-local and object stores lack an atomic
    * create-exclusive through this API, so there the exclusivity check is a
    * pre-flight exists() — a best-effort fence that still catches every
    * non-pathological zombie (the epoch check on re-read closes the rest of
    * the window on the next swap).
    */
  final def writeMetaCas(dir: String, name: String, bytes: Array[Byte], expectedSeq: Long): Boolean = {
    // Drift check FIRST: pruning frees old version slots, so "v<expected+1>
    // doesn't exist" alone would let a long-stale writer land an old version
    // number that readers (who take the max) never see — a silent success.
    // The exclusive create below closes the list→create race window; this
    // listing closes the drift.
    val cur = versionsOf(dir, name).lastOption.map(_._1).getOrElse(0L)
    if (cur != expectedSeq) return false
    val next = expectedSeq + 1
    val finalName = f"$name.v$next%020d"
    // Unique tmp per attempt: racing writers must not stage through one name
    // (the loser's cleanup would delete the winner's in-flight tmp).
    val tmpName = s"_tmp-$finalName-${java.util.UUID.randomUUID().toString.take(8)}"
    val won = writeExclusiveFile(child(dir, tmpName), child(dir, finalName), bytes)
    if (won) {
      versionsOf(dir, name).foreach { case (s, p) =>
        if (s < next) try delete(p) catch { case _: Exception => () }
      }
      try delete(child(dir, name))
      catch { case _: Exception => () }
    }
    won
  }

  /** Write `bytes` to appear atomically at `finalPath` ONLY if it does not
    * already exist; false when it does (the CAS-lost signal). See
    * [[writeMetaCas]] for per-backend strictness.
    */
  protected def writeExclusiveFile(tmpPath: String, finalPath: String, bytes: Array[Byte]): Boolean

  /** Read the newest metadata version; fall back to a legacy plain
    * `<name>` file (pre-versioning logs) only when NO version exists. A
    * list→open loss against a concurrent writer's prune re-lists and finds
    * the newer version; if versions keep being listed but never opened,
    * raise rather than return None — None means "no metadata" to callers
    * and would turn a transient race into silently-empty scans or a
    * token-dropping manifest rebuild.
    */
  final def readMeta(dir: String, name: String): Option[Array[Byte]] =
    readMetaWithSeq(dir, name).map(_._2)

  /** [[readMeta]] plus the version sequence the bytes came from (0 for a
    * legacy unversioned file) — what a CAS-swapping writer needs to target
    * its next publish.
    */
  final def readMetaWithSeq(dir: String, name: String): Option[(Long, Array[Byte])] = {
    // BOTH not-found flavors: Hadoop streams throw java.io.
    // FileNotFoundException, plain NIO throws java.nio.file.
    // NoSuchFileException — they share no ancestor below IOException, and
    // catching only the former silently disabled this retry for local
    // logs (a concurrent writer's prune between our list and open then
    // surfaced as a raw reader error instead of a re-list).
    var i = 0
    while (i < 8) {
      versionsOf(dir, name).lastOption match {
        case Some((seq, p)) =>
          try return Some((seq, readFileBytes(p)))
          catch {
            case _: java.io.FileNotFoundException | _: java.nio.file.NoSuchFileException =>
              i += 1
          }
        case None =>
          val legacy = child(dir, name)
          if (exists(legacy)) {
            try return Some((0L, readFileBytes(legacy)))
            // Legacy file retired by a concurrent first versioned publish
            // between the exists check and the open — loop re-lists for
            // the version that replaced it.
            catch {
              case _: java.io.FileNotFoundException | _: java.nio.file.NoSuchFileException => ()
            }
          } else if (versionsOf(dir, name).isEmpty) {
            // Re-listed and still nothing: either genuinely no metadata, or
            // we'd be racing ANOTHER upgrade publish — but the legacy→
            // versioned upgrade happens once per log lifetime, so a second
            // empty sighting is conclusive. (Returning None off the FIRST
            // sighting raced the writer's publish-v1-then-delete-legacy
            // sequence and reported an upgraded log as metadata-less.)
            return None
          }
          i += 1
      }
    }
    throw new java.io.IOException(s"metadata read lost the publish race $i times: $dir/$name")
  }

  final def deleteMeta(dir: String, name: String): Unit = {
    versionsOf(dir, name).foreach { case (_, p) => try delete(p) catch { case _: Exception => () } }
    try delete(child(dir, name))
    catch { case _: Exception => () }
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

/** Plain-NIO implementation for local paths — the perf-critical default. */
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

  override def deleteIfExists(path: String): Boolean =
    try Files.deleteIfExists(p(path))
    catch { case _: java.io.IOException => false }

  override def writeRawFile(path: String, bytes: Array[Byte]): Unit = {
    val _ = Files.write(p(path), bytes)
  }

  override def readRawFile(path: String): Option[Array[Byte]] =
    try Some(Files.readAllBytes(p(path)))
    catch { case _: java.io.IOException => None }

  override protected def readFileBytes(path: String): Array[Byte] =
    Files.readAllBytes(p(path))

  override protected def writeFreshFile(tmpPath: String, finalPath: String, bytes: Array[Byte]): Unit = {
    Files.write(p(tmpPath), bytes)
    Files.move(p(tmpPath), p(finalPath), StandardCopyOption.ATOMIC_MOVE)
  }

  override protected def writeExclusiveFile(tmpPath: String, finalPath: String, bytes: Array[Byte]): Boolean = {
    Files.write(p(tmpPath), bytes)
    // Hard-link creation is the one POSIX primitive that both publishes an
    // already-complete file atomically AND fails (EEXIST) when the target
    // exists — rename(2) silently replaces, which is exactly the
    // last-writer-wins hole CAS must close.
    try {
      Files.createLink(p(finalPath), p(tmpPath))
      Files.deleteIfExists(p(tmpPath))
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(p(tmpPath))
        false
      case _: UnsupportedOperationException =>
        // Filesystem without hard links (exotic): degrade to the plain
        // atomic-but-replacing publish — fencing falls back to the epoch
        // check on the next swap's re-read.
        Files.move(p(tmpPath), p(finalPath), StandardCopyOption.ATOMIC_MOVE)
        true
    }
  }

  override def inputFile(path: String): InputFile = new LocalInputFile(p(path))
  override def outputFile(path: String): OutputFile = new LocalOutputFile(p(path))
}

/** Hadoop FileSystem implementation for `scheme://` paths. */
private[graft] object HadoopLogFs extends LogFs {
  /** One shared Configuration (construction re-scans default XMLs, ~5 ms),
    * seeded from the Spark application's `spark.hadoop.*` settings — the
    * standard way clusters carry s3a credentials/endpoints and HDFS
    * nameservice configs. `SparkEnv` exists on the driver AND on executors,
    * so executor-side readers see the same filesystem configuration without
    * anything being serialized. (Session-local `spark.conf.set` overrides
    * made after application start are not visible here — supply filesystem
    * settings via spark-submit/SparkConf, as Spark's own sources expect.)
    */
  private lazy val conf: Configuration = {
    val c = new Configuration()
    Option(org.apache.spark.SparkEnv.get).foreach { env =>
      env.conf.getAll.foreach { case (k, v) =>
        if (k.startsWith("spark.hadoop."))
          c.set(k.stripPrefix("spark.hadoop."), v)
      }
    }
    c
  }

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

  override protected def readFileBytes(path: String): Array[Byte] = {
    val in = fs(path).open(hp(path))
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  override protected def writeFreshFile(tmpPath: String, finalPath: String, bytes: Array[Byte]): Unit = {
    val f = fs(tmpPath)
    val out = f.create(hp(tmpPath), true)
    try out.write(bytes)
    finally out.close()
    if (!f.rename(hp(tmpPath), hp(finalPath))) {
      f.delete(hp(tmpPath), false)
      throw new java.io.IOException(s"metadata publish failed: $finalPath")
    }
  }

  override def deleteIfExists(path: String): Boolean =
    try fs(path).delete(hp(path), false)
    catch { case _: java.io.IOException => false }

  override def writeRawFile(path: String, bytes: Array[Byte]): Unit = {
    val out = fs(path).create(hp(path), true)
    try out.write(bytes)
    finally out.close()
  }

  override def readRawFile(path: String): Option[Array[Byte]] =
    try if (fs(path).exists(hp(path))) Some(readFileBytes(path)) else None
    catch { case _: java.io.IOException => None }

  override protected def writeExclusiveFile(tmpPath: String, finalPath: String, bytes: Array[Byte]): Boolean = {
    val f = fs(tmpPath)
    // Pre-flight: cheap CAS-lost detection, and the only exclusivity
    // available on Hadoop-local (whose rename replaces like POSIX). On HDFS
    // the rename below additionally refuses an existing destination
    // atomically, closing the check-then-act window.
    if (f.exists(hp(finalPath))) return false
    val out = f.create(hp(tmpPath), true)
    try out.write(bytes)
    finally out.close()
    if (f.rename(hp(tmpPath), hp(finalPath))) true
    else {
      f.delete(hp(tmpPath), false)
      // Rename refusal either means the destination appeared (lost the CAS)
      // or a genuine transient failure — distinguishable by existence.
      if (f.exists(hp(finalPath))) false
      else throw new java.io.IOException(s"metadata publish failed: $finalPath")
    }
  }

  override def inputFile(path: String): InputFile =
    org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp(path), conf)

  override def outputFile(path: String): OutputFile =
    org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(hp(path), conf)
}
