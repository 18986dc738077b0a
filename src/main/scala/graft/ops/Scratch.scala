package graft.ops

import java.nio.file.{Files, Path}

/** Session-scoped scratch directories for operators that persist
  * intermediate state (streaming index/label stores, the on-disk BM25
  * index twin). Everything allocated here lives under one per-JVM root
  * that a shutdown hook deletes recursively — results stay readable for
  * the lifetime of the session that built them (the frames read the
  * dirs lazily), while repeated Verify/Bench runs (each its own JVM)
  * cannot accumulate on-disk state across invocations. */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(r)))
    r
  }

  private def delete(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = Files.list(p)
      try s.forEach(c => delete(c)) finally s.close()
    }
    Files.deleteIfExists(p)
  }

  /** A fresh directory under the auto-cleaned root. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString
}
