package graft.core

/** Table/index-wide MAINTENANCE LEASE — the structural closure of the
  * maintenance-vs-maintenance races the r14 guards only narrowed:
  * vacuum-vs-restore on the table log (vacuum's head-advance abort +
  * restore's post-publish re-verify shrank the window to instants but
  * could not close it) and vacuum-vs-rollback on the index root.
  *
  * Mechanics: an op that DELETES old files or RE-REFERENCES them
  * (vacuum, restore, rollback) brackets its whole plan-to-mutate
  * window with an exclusive `_maintenance.lock` under the root —
  * claimed with the same put-if-absent publish every metadata channel
  * here uses ([[AtomicFiles.publishExclusive]]; a conditional PUT on
  * an object store). The lock body carries holder id, acquisition
  * instant, and TTL:
  *  - a CONTENDER refuses loudly (`ConcurrentModificationException`
  *    → 409 over the wire) NAMING the holder — the operator's retry
  *    signal, never a wedge;
  *  - a CRASHED holder's lease expires after its TTL and is reclaimed
  *    by the next contender;
  *  - RELEASE deletes only the caller's own claim (token-checked), so
  *    a slow holder whose lease expired and was taken over cannot
  *    delete the new holder's lock.
  *
  * DELETION DISCIPLINE: every path that removes the shared lock name
  * (expiry reap, token-checked release) is a judge-then-delete, and on
  * a filesystem that pair is a TOCTOU — between the judgment read and
  * the delete, a faster reaper may remove the lock and a fresh claim
  * may land under the same name, so the pending delete would destroy
  * the NEW holder's lease (two maintenance ops holding at once:
  * exactly what the lease exists to prevent; the takeover-storm spec
  * reproduced it). So all judge-then-delete runs inside a tiny
  * exclusive critical section (`.reaper.lock`, O_CREAT|O_EXCL):
  * reapers and releases serialize against each other, and a CLAIM can
  * only land while the name is vacant — which, inside a section, only
  * happens after a legitimate delete. The section is µs-scale (reads
  * + one delete, no Spark work); a crashed entrant's stale section
  * (>10 s) is cleaned by SINGLE-WINNER atomic move — never
  * delete-by-name, which would re-open the same hazard one level down
  * — with an mtime re-verify and restore-or-yield if a live section
  * was stolen. The judged delete re-reads and byte-compares
  * immediately before removing. The residue after all of this needs a
  * crashed reaper + dual cleanup race + a re-entry and a re-claim
  * inside instruction-scale windows, stacked; the r14 defense-in-depth
  * guards (head-advance abort, post-publish re-verify, idempotent
  * folds) remain underneath the lease for exactly such residues. On an
  * object store the whole dance is one conditional (if-match) delete.
  *
  * Ordinary reads and commits NEVER take the lease: snapshot isolation
  * and OCC already serialize them, and a lease on the write path would
  * put a lock in front of every streaming trigger. A holder that
  * STALLS past its TTL mid-work and resumes after a takeover is the
  * standard lease tradeoff; the TTL default is sized two orders above
  * any measured sweep. */
object Lease {

  /** Generous vs the measured cost of any maintenance op at sandbox
    * scale, small vs a wedged-table outage. */
  val DefaultTtlMillis: Long = 10L * 60 * 1000

  private val lockName = "_maintenance.lock"
  private val sectionName = ".reaper.lock"

  private final class Held extends RuntimeException

  /** Run `body` holding the maintenance lease on `dir`. */
  def withLease[T](dir: String, op: String,
      ttlMillis: Long = DefaultTtlMillis)(body: => T): T = {
    val token = acquire(dir, op, ttlMillis)
    try body finally release(dir, token)
  }

  private[graft] def acquire(dir: String, op: String,
      ttlMillis: Long): String = {
    val token = java.util.UUID.randomUUID().toString
    val payload = (s"""{"holder":"$op@pid${ProcessHandle.current().pid()}"""" +
      s""","token":"$token","ts":${System.currentTimeMillis()}""" +
      s""","ttlMs":$ttlMillis}""").getBytes("UTF-8")
    var takeovers = 0
    while (true) {
      try {
        AtomicFiles.publishExclusive(dir, lockName, payload)(
          throw new Held)
        return token
      } catch {
        case _: Held =>
          val f = new java.io.File(dir, lockName)
          // the lock may vanish between the collision and this read —
          // a racing release; just re-claim
          val body =
            try new String(
              java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
            catch { case _: java.nio.file.NoSuchFileException => "" }
          def field(name: String): Option[String] =
            ("\"" + name + "\":\"?([^\",}]+)").r
              .findFirstMatchIn(body).map(_.group(1))
          val ts = field("ts").flatMap(_.toLongOption)
          val ttl = field("ttlMs").flatMap(_.toLongOption)
          val holder = field("holder").getOrElse("unknown")
          val expired = (ts, ttl) match {
            case (Some(t), Some(w)) =>
              System.currentTimeMillis() - t > w
            // unreadable/corrupt body: treat as expired — a lock
            // nobody can identify must be reclaimable, not a wedge
            case _ => true
          }
          if (!expired) throw new java.util.ConcurrentModificationException(
            s"maintenance on $dir is held by $holder (acquired " +
              s"${ts.getOrElse(-1L)}, ttl ${ttl.getOrElse(-1L)} ms) — " +
              "retry after it releases or expires")
          takeovers += 1
          if (takeovers > 20) throw new java.util.ConcurrentModificationException(
            s"maintenance lease on $dir cannot be reclaimed (an " +
              "expired claim keeps reappearing, or the reaper section " +
              s"$sectionName stays contended) — inspect $lockName")
          // a contended section (another reaper/release mid-judgment)
          // is a transient µs-scale state — back off briefly instead
          // of burning the takeover budget in a spin (a throw here
          // would tell the operator to inspect a healthy lock)
          if (!reapExpired(dir, f)) Thread.sleep(20)
      }
    }
    sys.error("unreachable")
  }

  /** Judge-then-delete of an expired lock inside the exclusive
    * section. Returns false when the section was contended (the
    * caller backs off and re-loops). */
  private def reapExpired(dir: String, f: java.io.File): Boolean = {
    if (!enterSection(dir)) return false
    try {
      deleteIfStillExpired(f)
      true
    } finally exitSection(dir)
  }

  /** The judged delete, SECTION-HELD by the caller: re-read, judge
    * expiry on the CURRENT bytes, re-read-and-byte-compare right
    * before the delete — a claim that swapped the bytes between
    * judgment and delete (only reachable through the stacked
    * stale-cleanup residue) is detected and left alone. */
  private def deleteIfStillExpired(f: java.io.File): Unit = {
    def readOrNull(): String =
      try new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      catch { case _: java.nio.file.NoSuchFileException => null }
    val body = readOrNull()
    if (body == null) return
    def fld(name: String): Option[Long] =
      ("\"" + name + "\":(\\d+)").r.findFirstMatchIn(body)
        .map(_.group(1).toLong)
    val expired = (fld("ts"), fld("ttlMs")) match {
      case (Some(t), Some(w)) => System.currentTimeMillis() - t > w
      case _ => true // unreadable = reclaimable, never a wedge
    }
    if (expired && readOrNull() == body) {
      java.nio.file.Files.deleteIfExists(f.toPath)
      ()
    }
  }

  /** Enter the reaper/release critical section: exclusive create of
    * `.reaper.lock`, with SINGLE-WINNER cleanup of a crashed
    * entrant's stale section (>10 s old — the section is µs-scale).
    * Cleanup is by atomic MOVE to a unique name, never delete-by-name
    * (two cleaners both judging staleness could otherwise delete a
    * section the faster one already re-created — the dual-entry
    * hazard); the mover re-verifies the moved inode's age and
    * restores it if it stole a live section. Returns false on any
    * contention — the caller yields and retries. */
  private def enterSection(dir: String): Boolean = {
    val section = new java.io.File(dir, sectionName)
    if (section.exists() &&
        System.currentTimeMillis() - section.lastModified() > 10000) {
      val trash = new java.io.File(dir,
        s".reaper-stale-${java.util.UUID.randomUUID()}.lock")
      try {
        java.nio.file.Files.move(section.toPath, trash.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        if (System.currentTimeMillis() - trash.lastModified() > 10000) {
          // genuinely stale — the crashed entrant's leftover retires
          java.nio.file.Files.deleteIfExists(trash.toPath)
          ()
        } else {
          // we stole a LIVE section (cleaned and re-entered between
          // our age check and our move) — put it back; if the vacancy
          // was already re-claimed, retire our copy and yield (this
          // round's reap just doesn't happen; the caller retries)
          try {
            java.nio.file.Files.move(trash.toPath, section.toPath)
            ()
          } catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              java.nio.file.Files.deleteIfExists(trash.toPath)
              ()
          }
          return false
        }
      } catch {
        // another cleaner won the stale inode — fall through and race
        // for the (now vacant) section name
        case _: java.nio.file.NoSuchFileException => ()
      }
    }
    try { java.nio.file.Files.createFile(section.toPath); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
  }

  private def exitSection(dir: String): Unit = {
    new java.io.File(dir, sectionName).delete()
    ()
  }

  /** The current lease, if any: (holder, acquiredAtMillis, ttlMillis,
    * expired) — the ops-visibility surface (`op=lease` over the wire:
    * an operator diagnosing a 409 needs to see WHO holds and whether
    * the TTL has already run out). Corrupt/unreadable bodies report as
    * expired, matching [[acquire]]'s reclaim judgment. */
  def status(dir: String): Option[(String, Long, Long, Boolean)] = {
    val f = new java.io.File(dir, lockName)
    if (!f.exists()) return None
    val body =
      try new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      catch { case _: java.nio.file.NoSuchFileException => return None }
    def fld(name: String): Option[String] =
      ("\"" + name + "\":\"?([^\",}]+)").r
        .findFirstMatchIn(body).map(_.group(1))
    val ts = fld("ts").flatMap(_.toLongOption).getOrElse(-1L)
    val ttl = fld("ttlMs").flatMap(_.toLongOption).getOrElse(-1L)
    val expired = ts < 0 || ttl < 0 ||
      System.currentTimeMillis() - ts > ttl
    Some((fld("holder").getOrElse("unknown"), ts, ttl, expired))
  }

  /** Delete only OUR claim — and do it INSIDE the section: a release
    * racing its own TTL expiry is a judge-then-delete like any other
    * (token read says "still mine", a reaper takes over and a new
    * claim lands, the pending delete destroys the successor's lease).
    * Serializing with the reapers closes that: while the section is
    * held, no reap can interleave between the token check and the
    * delete, and a claim cannot replace an existing lock. Section
    * contention backs off briefly; if it persists past 15 s
    * (impossible without a crashed entrant, which cleanup handles)
    * the release falls back to the bare token-checked delete — a
    * leaked lock would otherwise block maintenance for a full TTL.
    * Never throws (runs in `finally`). */
  private[graft] def release(dir: String, token: String): Unit =
    try {
      val f = new java.io.File(dir, lockName)
      def tokenDelete(): Unit =
        if (f.exists() && new String(
            java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
            .contains(token)) {
          java.nio.file.Files.deleteIfExists(f.toPath)
          ()
        }
      val deadline = System.currentTimeMillis() + 15000
      var entered = false
      while (!entered && System.currentTimeMillis() < deadline) {
        entered = enterSection(dir)
        if (!entered) Thread.sleep(10)
      }
      if (entered) try tokenDelete() finally exitSection(dir)
      else tokenDelete()
    } catch { case scala.util.control.NonFatal(_) => () }
}
