package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap

/** Per-query scratch dirs for the physical-layout demo queries
  * (q38 CSV round-trip, q86 bucketed tables, q87 partitioned facts,
  * q93 dynamic partition overwrite). Each invocation gets a fresh dir;
  * the SAME query's previous dir is deleted on the next invocation (its
  * result has been consumed — Bench/Verify fully materialize a query
  * before re-invoking it), and a JVM shutdown hook sweeps the last
  * generation. Net effect: at most one live dir per query inside a
  * session, zero across sessions — /tmp is stable across consecutive
  * Bench runs instead of accumulating fixture copies. */
object TempWork {
  private val live = new ConcurrentHashMap[String, Path]()

  sys.addShutdownHook {
    live.values.forEach(deleteRecursively(_))
  }

  def fresh(tag: String): String = {
    val next = Files.createTempDirectory(s"graft_${tag}_")
    val prev = live.put(tag, next)
    if (prev != null) deleteRecursively(prev)
    next.toString
  }

  /** Best-effort recursive delete (same contract as the streaming
    * landing-dir cleanup in EventStream). */
  def deleteRecursively(dir: Path): Unit = {
    try {
      val walk = Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p): Unit)
      finally walk.close()
    } catch { case _: java.io.IOException => () }
  }
}
