package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Per-JVM scratch root for queries that materialize an on-disk
  * artifact (persisted ANN indexes, the storage-audit parquet): every
  * directory is created under ONE tmp root that a JVM shutdown hook
  * deletes recursively, so repeated bench/verify runs cannot leak disk
  * — the previous bare `createTempDirectory` sites left one orphan
  * tree per invocation and never cleaned up. Directories stay unique
  * per call (concurrent sessions never clobber each other's index
  * mid-read, the original reason for per-invocation paths). */
object Scratch {
  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh unique directory under the shutdown-cleaned root. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  /** Eagerly delete a scratch dir a caller is DONE with (e.g. a
    * stream's frozen-model snapshot on stream stop) instead of waiting
    * for the JVM shutdown hook. Only paths under the scratch root are
    * touched — anything else is refused loudly (a typo must not
    * recursively delete a data dir). */
  def remove(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir).toAbsolutePath.normalize()
    require(p.startsWith(root.toAbsolutePath.normalize()),
      s"Scratch.remove: $dir is not under the scratch root $root")
    deleteRecursively(p)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => try Files.delete(f) catch { case _: Exception => () })
      finally walk.close()
    }
}
