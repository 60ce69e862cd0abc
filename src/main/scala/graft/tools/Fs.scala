package graft.tools

import java.nio.file.{Files, Path, Paths}

/** Local-filesystem helpers for driver-side scratch space (export staging,
  * round-trip query temp dirs). Operator paths never touch this — it exists
  * so repeated invocations (benchmark trials, re-runs) don't accumulate
  * temp directories.
  */
object Fs {

  /** Delete `path` and everything under it; missing paths are a no-op. */
  def deleteRecursively(path: String): Unit = {
    val root: Path = Paths.get(path)
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
