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
  *  - a CRASHED holder's lease expires after its TTL: the next
  *    contender deletes the stale lock and re-claims (two racing
  *    contenders may both delete; exactly one wins the re-create);
  *  - RELEASE deletes only the caller's own claim (token-checked), so
  *    a slow holder whose lease expired and was taken over cannot
  *    delete the new holder's lock.
  *
  * Ordinary reads and commits NEVER take the lease: snapshot isolation
  * and OCC already serialize them, and a lease on the write path would
  * put a lock in front of every streaming trigger. The one residue the
  * TTL leaves open — a holder that STALLS past its TTL mid-delete and
  * resumes after a takeover — is the standard lease tradeoff; the TTL
  * default is sized two orders above any measured sweep, and the r14
  * guards (head-advance abort, post-publish re-verify) remain in place
  * as defense in depth for exactly that residue. */
object Lease {

  /** Generous vs the measured cost of any maintenance op at sandbox
    * scale, small vs a wedged-table outage. */
  val DefaultTtlMillis: Long = 10L * 60 * 1000

  private val lockName = "_maintenance.lock"

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
          if (takeovers > 8) throw new java.util.ConcurrentModificationException(
            s"maintenance lease on $dir cannot be reclaimed (a fresh " +
              s"claim keeps appearing expired) — inspect $lockName")
          reapExpired(dir, f)
      }
    }
    sys.error("unreachable")
  }

  /** Take over an expired lock WITHOUT a judge-then-delete TOCTOU on
    * the shared name. A bare `deleteIfExists` after judging expiry is
    * wrong twice over: a faster reaper may have already deleted and
    * RE-CLAIMED the name (our delete destroys its fresh lease — two
    * holders), and any scheme that vacates the name to verify lets a
    * claimer slip in mid-verification (the storm spec caught exactly
    * that). So reaping runs inside a tiny EXCLUSIVE critical section
    * (`.reaper.lock`, O_CREAT|O_EXCL): judge and delete are atomic
    * with respect to other reapers, and a CLAIM can only land while
    * the name is vacant — which, inside a section, is only ever AFTER
    * a legitimately-expired delete. A fresh lock therefore can never
    * be judged expired: the judgment re-reads the CURRENT bytes at
    * the name, and nothing can swap them between that read and the
    * delete while the section is held. The section is µs-scale (one
    * read + one delete, no Spark work); a crashed reaper's stale
    * section older than 10 s is cleared — the residual dual-entry
    * window after such a cleanup still cannot misjudge a fresh lock,
    * because every entrant re-reads before deleting and the name
    * stays occupied (un-claimable) until a delete. On an object store
    * the whole dance is one conditional (if-match) delete. */
  private def reapExpired(dir: String, f: java.io.File): Unit = {
    val section = new java.io.File(dir, ".reaper.lock")
    if (section.exists() &&
        System.currentTimeMillis() - section.lastModified() > 10000)
      section.delete()
    try java.nio.file.Files.createFile(section.toPath)
    catch {
      // another reaper is in the section — yield and re-loop (the
      // caller re-reads whatever then sits at the name)
      case _: java.nio.file.FileAlreadyExistsException => return
    }
    try {
      val body =
        try new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        catch { case _: java.nio.file.NoSuchFileException => return }
      def fld(name: String): Option[Long] =
        ("\"" + name + "\":(\\d+)").r.findFirstMatchIn(body)
          .map(_.group(1).toLong)
      val expired = (fld("ts"), fld("ttlMs")) match {
        case (Some(t), Some(w)) => System.currentTimeMillis() - t > w
        case _ => true // unreadable = reclaimable, never a wedge
      }
      if (expired) { java.nio.file.Files.deleteIfExists(f.toPath); () }
    } finally { section.delete(); () }
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

  /** Delete only OUR claim: after a TTL takeover the lock belongs to
    * someone else and must survive this (slow) holder's release. */
  private[graft] def release(dir: String, token: String): Unit =
    try {
      val f = new java.io.File(dir, lockName)
      if (f.exists() && new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          .contains(token)) {
        java.nio.file.Files.deleteIfExists(f.toPath)
        ()
      }
    } catch { case scala.util.control.NonFatal(_) => () }
}
