package graft.core

/** The exclusive put-if-absent file publish shared by every metadata
  * channel that is NOT the manifest log itself (constraint/colmap
  * epochs, IVF generation pointers): write the full body to a temp
  * file, then claim the target with a HARD LINK — the target appears
  * complete or not at all, and a second publisher of the same name
  * fails rather than silently replacing the winner. On link-less
  * filesystems the fallback claims with `Files.createFile`
  * (O_CREAT|O_EXCL — a true test-and-set) and fills via atomic move;
  * its momentary empty-target window is each caller's documented
  * concern (epochs gate on a committed manifest; generation pointers
  * resolve MAX, and a crash mid-fill is a named recovery).
  * `TxnTable.writeManifest` keeps its own specialized variant (the
  * lock-file protocol with re-plan semantics that TxnTableSpec pins
  * under an 8-racer thread storm). */
object AtomicFiles {

  /** Publish `body` at `dir/targetName` exactly once; invokes `lost`
    * (which must throw) when the name is already claimed. */
  def publishExclusive(dir: String, targetName: String,
      body: Array[Byte])(lost: => Nothing): Unit = {
    val target = java.nio.file.Paths.get(dir, targetName)
    val tmp = java.nio.file.Files.createTempFile(
      java.nio.file.Paths.get(dir), s".$targetName", ".tmp")
    try {
      java.nio.file.Files.write(tmp, body)
      try java.nio.file.Files.createLink(target, tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException => lost
        case _: UnsupportedOperationException =>
          try java.nio.file.Files.createFile(target)
          catch { case _: java.nio.file.FileAlreadyExistsException =>
            lost }
          java.nio.file.Files.move(tmp, target,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          ()
      }
    } finally { java.nio.file.Files.deleteIfExists(tmp); () }
  }
}
