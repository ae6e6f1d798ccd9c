package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Per-JVM temp-dir allocator with a REAL cleanup path.
  *
  * `File.deleteOnExit()` on a directory is a no-op once the directory is
  * non-empty — so the boundary queries that materialize a table copy
  * under /tmp (q110 CSV round-trip, q114 day-partitioned lake, s18 JSONL
  * dedup) would leak one full copy per invocation, multiplied by bench
  * reruns and 250-query sweeps. Instead every caller gets a subdirectory
  * of ONE session root, and a single shutdown hook deletes that root
  * recursively (deepest-first walk, symlinks not followed).
  */
object TempDirs {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-session-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh directory under the session root; removed (with everything
    * written into it) by the shutdown hook.
    */
  def scratch(prefix: String): Path =
    Files.createTempDirectory(root, prefix)

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => try Files.deleteIfExists(f) catch { case _: Throwable => () })
      finally walk.close()
    }
  }
}
