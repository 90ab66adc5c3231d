package graft.core

/** Scratch directories with RELIABLE JVM-exit cleanup.
  *
  * `File.deleteOnExit()` silently fails on non-empty directories, so
  * any scratch root that parquet gets written under leaks forever;
  * every temp-dir user (st05's rollup target, spec corpora) shares
  * this one recursive shutdown-hook delete instead of re-deriving it.
  */
object TempDirs {

  /** Create a temp directory removed (recursively) on JVM exit. */
  def scratch(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$tag").toFile
    sys.addShutdownHook(rmTree(d))
    d.getAbsolutePath
  }

  private val sharedRoots =
    new java.util.concurrent.ConcurrentHashMap[String, java.io.File]()
  private val ctr = new java.util.concurrent.atomic.AtomicInteger()

  /** A fresh subdirectory under ONE shutdown-hooked root per `base` —
    * repeated calls (per-query scratch or checkpoint dirs in a
    * long-running service) do not accumulate JVM shutdown hooks the
    * way per-call [[scratch]] would. */
  def scratchShared(tag: String,
      base: String = System.getProperty("java.io.tmpdir")): String = {
    val root = sharedRoots.computeIfAbsent(base, b => {
      val d = java.nio.file.Files
        .createTempDirectory(java.nio.file.Paths.get(b), "graft-shared").toFile
      sys.addShutdownHook(rmTree(d))
      d
    })
    val d = new java.io.File(root, s"$tag-${ctr.incrementAndGet()}")
    d.mkdirs()
    d.getAbsolutePath
  }

  def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete()
    ()
  }
}
