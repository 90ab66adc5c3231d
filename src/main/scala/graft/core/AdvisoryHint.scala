package graft.core

/** The shared ADVISORY head-hint file (`_head.json`) behind LIST-free
  * head resolution on both metadata logs — the table's manifest chain
  * (`{"head":N}`) and the ANN index's generation pointers
  * (`{"gen":N}`). One implementation so the two cannot drift: write is
  * BEST-EFFORT (never throws — a failed hint write costs the next
  * reads a forward walk or one LIST, never correctness) and
  * last-writer-wins (atomic replace; racing publishers may land hints
  * out of order, the reader's forward probe absorbs a stale winner);
  * read returns None for missing/corrupt files (the reader falls back
  * to its listing and re-primes). The hint is ADVISORY ONLY: the
  * exclusive-create publish of the underlying log stays the sole
  * source of truth, and every consumer validates the hinted value
  * against the log (existence probe) before trusting it. */
object AdvisoryHint {

  val FileName = "_head.json"

  def write(dir: String, key: String, v: Int): Unit =
    try {
      val tmp = java.nio.file.Files.createTempFile(
        java.nio.file.Paths.get(dir), "._head", ".tmp")
      // a failed move must not orphan the tmp in the table/index root:
      // a best-effort writer that swallows its failure AND leaves its
      // temp behind accumulates junk forever (nothing sweeps these)
      try {
        java.nio.file.Files.write(tmp,
          s"""{"$key":$v}""".getBytes("UTF-8"))
        java.nio.file.Files.move(tmp,
          java.nio.file.Paths.get(dir, FileName),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally {
        java.nio.file.Files.deleteIfExists(tmp); ()
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  def read(dir: String, key: String): Option[Int] = {
    val f = new java.io.File(dir, FileName)
    if (!f.exists()) return None
    try ("\"" + key + "\":(\\d+)").r.findFirstMatchIn(new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      .map(_.group(1).toInt)
    catch { case scala.util.control.NonFatal(_) => None }
  }
}
