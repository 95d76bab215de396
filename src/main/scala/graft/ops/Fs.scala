package graft.ops

import java.nio.file.{Files, Path}

/** Tiny filesystem helpers shared by the verification harnesses
  * (streaming replay staging, scale-trend blow-up, binary-ingest
  * staging). Driver-side temp management only — nothing here touches
  * distributed data.
  */
object Fs {

  /** Recursively delete `p` if it exists (children before parents). */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
}
