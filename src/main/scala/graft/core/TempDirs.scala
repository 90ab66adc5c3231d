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

  def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete()
    ()
  }
}
