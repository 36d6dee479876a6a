package graft.sources

import java.nio.file.{Files, Path}

/** Self-cleaning scratch directories for queries that exercise a real
  * storage boundary (partitioned-sink round-trips). A bench loop that
  * invokes such a query repeatedly would otherwise litter /tmp with one
  * parquet copy per invocation; every dir created here is removed
  * recursively by a single JVM shutdown hook. */
object Scratch {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach(deleteRecursively)
  }))

  /** A fresh temp dir (per-invocation, so concurrent drivers never race
    * on a shared path), deleted at JVM exit. */
  def dir(prefix: String): Path = {
    hook
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p
  }

  private def deleteRecursively(p: Path): Unit =
    try {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(deleteRecursively) finally s.close()
      }
      Files.deleteIfExists(p)
    } catch { case _: java.io.IOException => () } // best effort at exit
}
