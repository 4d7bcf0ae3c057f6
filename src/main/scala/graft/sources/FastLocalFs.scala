package graft.sources

import org.apache.hadoop.fs.{LocalFileSystem, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{Path => HPath}

/** Raw local filesystem with the permission shell-outs removed.
  *
  * Without the Hadoop native library (this JVM has none), every
  * `setPermission` — which `FileSystem.mkdirs(Path)` and
  * `create(path, permission, …)` call with the umask'd default — runs
  * `chmod` via `Shell.execCommand`: a fork+exec of the whole JVM per
  * directory/file touched. A TxnLog commit pays it dozens of times
  * (committer setup dirs, task attempt dirs, part files), a streaming
  * micro-batch pays it per state-store delta file, and concurrent
  * commits serialize on the kernel's fork path — measured as
  * driver/commit fixed cost and as anti-scaling at high core counts.
  * POSIX `open(2)`/`mkdir(2)` already apply the process umask, so for
  * engine-private staging/checkpoint dirs the chmod is a no-op with
  * fork overhead; it is skipped entirely. Production deployments on
  * HDFS/object stores never hit these classes (scheme-keyed), and a
  * cluster with libhadoop gets the same effect via NativeIO. */
class FastRawLocalFs extends RawLocalFileSystem {
  override def setPermission(p: HPath, permission: FsPermission): Unit = ()
}

/** `file://` [[org.apache.hadoop.fs.FileSystem]] binding for the
  * engine's staging writes and table I/O: a [[LocalFileSystem]] (some
  * Hadoop paths hard-cast `FileSystem.getLocal` to it, e.g. RocksDB's
  * checkpoint upload) over [[FastRawLocalFs]], with checksum sidecars
  * off — the engine's own commit protocol (published log lines over
  * immutable files) is the integrity mechanism, and `.crc` shadows
  * double every create/rename. */
class FastLocalFs extends LocalFileSystem(new FastRawLocalFs) {
  override def initialize(uri: java.net.URI,
                          conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(uri, conf)
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }
}

/** The [[FastRawLocalFs]] twin for the `FileContext` API
  * (`fs.AbstractFileSystem.file.impl`): Structured Streaming's
  * checkpoint layer (offset/commit WAL, state-store delta files)
  * resolves `file://` through `AbstractFileSystem`, whose default local
  * binding is a checksummed wrapper over the same Shell-forking raw FS
  * — every state-store commit paid fork+exec chmod per created file.
  * Hadoop instantiates the impl reflectively via this exact
  * (URI, Configuration) constructor. */
class FastLocalAbstractFs(uri: java.net.URI,
                          conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new FastRawLocalFs, conf, "file", false)
