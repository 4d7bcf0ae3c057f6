package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** The ONE primitive [[TxnLog]]'s commit protocol needs from storage:
  * an atomic PUT-IF-ABSENT of the next version file (Delta's pluggable
  * `LogStore` shape — every cloud gets its own mutual-exclusion
  * mechanism, the table format itself stays storage-agnostic).
  *
  * Contract: `putIfAbsent(fs, dest, bytes)` publishes `bytes` at `dest`
  * atomically iff nothing exists there. True = this writer won the
  * version; false = `dest` already exists (a concurrent writer won).
  * A loser must leave NO artifact a reader could mistake for the
  * version file, and a reader must NEVER observe a half-written
  * `dest` — all-or-nothing is what makes the log a prefix of intended
  * commits after any crash.
  *
  * Built-ins, selected by URI scheme:
  *  - `file` → [[LogStore.HardLink]]: write a temp in the log
  *    directory, then POSIX `link(2)` it to `dest` — link fails iff
  *    the name exists, the kernel arbitrates the race. (A local
  *    `rename(2)` would silently REPLACE an existing dest, so rename
  *    is not a CAS on POSIX.)
  *  - everything else → [[LogStore.AtomicRename]]: write a temp, then
  *    `fs.rename(tmp, dest)` — correct where rename is atomic and
  *    refuses an existing destination (HDFS's namenode contract; also
  *    most HDFS-compatible stores).
  *  - RAW OBJECT STORES (S3 et al.) have neither primitive natively:
  *    rename is copy+delete and create is last-writer-wins. Register a
  *    conditional-put implementation for the scheme (`If-None-Match`
  *    put, or an external arbiter à la Delta's DynamoDB LogStore)
  *    before hosting a table there — [[LogStore.register]] is the
  *    deployment hook.
  */
trait LogStore {
  def putIfAbsent(fs: FileSystem, dest: HPath, bytes: Array[Byte]): Boolean
}

object LogStore {

  /** POSIX hard-link CAS for `file://`: `link(2)` fails with EEXIST iff
    * the destination name exists — kernel-arbitrated, atomic, and the
    * temp (same directory, same filesystem) is removed either way. */
  object HardLink extends LogStore {
    override def putIfAbsent(fs: FileSystem, dest: HPath,
                             bytes: Array[Byte]): Boolean = {
      val destNio = Paths.get(dest.toUri.getPath)
      Files.createDirectories(destNio.getParent)
      val tmp = Files.createTempFile(destNio.getParent, "_tmp_",
        ".inprogress")
      Files.write(tmp, bytes)
      try { Files.createLink(destNio, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally Files.deleteIfExists(tmp)
    }
  }

  /** Temp-write + atomic rename for filesystems whose rename is atomic
    * and REFUSES an existing destination (HDFS). The temp carries the
    * same `_tmp_*.inprogress` convention vacuum sweeps. */
  object AtomicRename extends LogStore {
    override def putIfAbsent(fs: FileSystem, dest: HPath,
                             bytes: Array[Byte]): Boolean = {
      fs.mkdirs(dest.getParent)
      val tmp = new HPath(dest.getParent,
        s"_tmp_${UUID.randomUUID()}.inprogress")
      val out = fs.create(tmp, false)
      try out.write(bytes) finally out.close()
      val won = try fs.rename(tmp, dest)
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        false }
      if (!won) fs.delete(tmp, false)
      won
    }
  }

  private val registry = new ConcurrentHashMap[String, LogStore]()
  registry.put("file", HardLink)

  /** Deployment hook: install the conditional-put implementation for a
    * scheme (`s3a`, `gs`, …) before hosting tables there. */
  def register(scheme: String, store: LogStore): Unit =
    registry.put(scheme, store)

  def forScheme(scheme: String): LogStore =
    Option(registry.get(scheme)).getOrElse(AtomicRename)

  private[sources] def utf8(lines: Seq[String]): Array[Byte] =
    (lines.mkString("\n") + "\n").getBytes(UTF_8)
}
