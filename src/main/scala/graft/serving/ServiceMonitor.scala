package graft.serving

/** Pluggable request-lifecycle monitor — the analogue of the reference's
  * service monitor interface (service/.../MahaServiceMonitor.scala:15-18:
  * `start(reportingRequest)` / `stop(reportingRequest)` hooks an
  * application monitoring system implements; DefaultMahaServiceMonitor
  * is the no-op). Here the hooks carry the request id and a kind label
  * ("report" | "sql" | "job" | curator name) plus, at completion, the
  * outcome and wall millis — enough for a metrics backend to count,
  * time, and slice by route without the monitor ever touching the
  * DataFrame (monitoring must not force or retain plans).
  *
  * Contract: `begin` fires before planning; `complete` fires exactly
  * once per `begin`, after materialization or failure, on the serving
  * thread. Implementations must be thread-safe (the front door serves
  * from a pool; the coordinator fans curators onto worker threads) and
  * non-throwing — a monitor failure must never fail a request, so all
  * call sites guard with `ServiceMonitor.safely`.
  */
trait ServiceMonitor {
  def begin(requestId: String, kind: String): Unit
  def complete(requestId: String, kind: String, success: Boolean,
      millis: Long): Unit
}

object ServiceMonitor {
  /** Default: monitoring off. */
  object NoOp extends ServiceMonitor {
    def begin(requestId: String, kind: String): Unit = ()
    def complete(requestId: String, kind: String, success: Boolean,
        millis: Long): Unit = ()
  }

  /** A monitor throwing must never fail the request it observes. */
  def safely(f: => Unit): Unit =
    try f catch { case scala.util.control.NonFatal(_) => () }

  /** Counting test double / minimal in-process metrics: per-kind
    * started / succeeded / failed counters and total wall millis. */
  final class Counting extends ServiceMonitor {
    import java.util.concurrent.ConcurrentHashMap
    import java.util.concurrent.atomic.LongAdder
    private def bump(m: ConcurrentHashMap[String, LongAdder], k: String,
        by: Long = 1L): Unit =
      m.computeIfAbsent(k, _ => new LongAdder).add(by)
    private val began = new ConcurrentHashMap[String, LongAdder]
    private val ok = new ConcurrentHashMap[String, LongAdder]
    private val failed = new ConcurrentHashMap[String, LongAdder]
    private val wall = new ConcurrentHashMap[String, LongAdder]
    def begin(requestId: String, kind: String): Unit = bump(began, kind)
    def complete(requestId: String, kind: String, success: Boolean,
        millis: Long): Unit = {
      bump(if (success) ok else failed, kind)
      bump(wall, kind, millis)
    }
    private def get(m: ConcurrentHashMap[String, LongAdder], k: String): Long =
      Option(m.get(k)).map(_.sum).getOrElse(0L)
    def started(kind: String): Long = get(began, kind)
    def succeeded(kind: String): Long = get(ok, kind)
    def failures(kind: String): Long = get(failed, kind)
    def wallMillis(kind: String): Long = get(wall, kind)
  }
}
