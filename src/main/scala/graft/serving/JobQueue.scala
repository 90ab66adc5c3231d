package graft.serving

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.SemanticQueries

/** Async job queue — the thin in-process analogue of the reference's
  * worker / job service (worker/.../Worker.scala: async reporting
  * requests are enqueued, executed by workers, results stored and
  * fetched later by job id; sync requests never enter the queue).
  *
  * Submission accepts only `"async": true` requests — a sync request
  * executes inline through [[SemanticQueries.run]] with its own
  * (tighter) guards; the async path inherits `maxRowsAsync`
  * enforcement from the analyzer, exactly as the reference's worker
  * re-validates against the async cap.
  *
  * Results are written as parquet under `resultDir/<jobId>` — the
  * job-store shape: a fetch may happen much later (or from another
  * process), so results live outside the session, not in driver
  * memory. Workers are daemon threads over the SHARED session;
  * Spark's scheduler interleaves queued jobs with interactive ones.
  */
final class JobQueue(s: SparkSession, dir: String,
    resultDir: java.nio.file.Path, workers: Int = 2,
    monitor: ServiceMonitor = ServiceMonitor.NoOp,
    reg: graft.semantic.model.Registry =
      graft.operators.SemanticQueries.registry) {

  import JobQueue._

  private val state = new ConcurrentHashMap[String, JobStatus]()
  private val pool = Executors.newFixedThreadPool(workers,
    (r: Runnable) => { val t = new Thread(r, "graft-job-worker"); t.setDaemon(true); t })

  /** Enqueue an async request; Left for unparseable or sync requests. */
  def submit(json: String): Either[String, String] =
    graft.analyzer.request.parse(json).flatMap { req =>
      if (!req.async)
        Left("sync requests execute inline; the job queue accepts async=true only")
      else {
        val jobId = java.util.UUID.randomUUID().toString
        state.put(jobId, Queued)
        pool.execute(() => execute(jobId, json))
        Right(jobId)
      }
    }

  private def jobGroup(jobId: String) = s"graft-job-$jobId"

  private def execute(jobId: String, json: String): Unit =
    executeTask(jobId, "job-run",
      s0 => SemanticQueries.runLogged(json, s"job-$jobId", reg)(s0, dir))

  /** Submit an arbitrary FRAME-PRODUCING task under the same queue /
    * status / cancel / result-store machinery as reporting jobs — the
    * async surface of long maintenance ops (`op=bpeTrain`: a 32k-merge
    * training run is ~20 minutes; an HTTP caller submits, polls
    * GET /jobs/{id}, and fetches the artifact table when complete). */
  def submitTask(label: String)(body: SparkSession => DataFrame): String = {
    val jobId = java.util.UUID.randomUUID().toString
    state.put(jobId, Queued)
    pool.execute(() => executeTask(jobId, label, body))
    jobId
  }

  /** A stable scratch root for a NAMED resumable task's state (the
    * bpeTrain checkpoint dir): re-submitting under the same name
    * resumes instead of restarting. */
  def taskStateDir(name: String): String =
    resultDir.resolve(s"task-state-$name").toString

  private def executeTask(jobId: String, label: String,
      body: SparkSession => DataFrame): Unit = {
    // a job cancelled while still QUEUED never starts
    if (!state.replace(jobId, Queued, Running)) return
    // monitor bracket around the worker-side RUN (the front door's
    // "job" bracket only covers the submit): begin before planning,
    // complete with outcome + wall once the result is stored
    ServiceMonitor.safely(monitor.begin(jobId, label))
    val t0 = System.currentTimeMillis()
    var outcome = false
    try {
      // job group (thread-local) so cancel() can interrupt the
      // Spark jobs this worker launches, mid-stage
      s.sparkContext.setJobGroup(jobGroup(jobId),
        s"async job $jobId: $label", interruptOnCancel = true)
      if (state.get(jobId) == Cancelled) return // cancelled at begin()
      val df = body(s)
      val out = resultDir.resolve(jobId).toString
      df.write.mode("overwrite").parquet(out)
      val rows = s.read.parquet(out).count()
      outcome = state.replace(jobId, Running, Completed(rows))
    } catch {
      // a cancel() racing the run surfaces as a SparkException from
      // the killed job group — keep the Cancelled verdict, not Failed
      case e: Exception =>
        state.replace(jobId, Running, Failed(e.getMessage))
    } finally {
      s.sparkContext.clearJobGroup()
      ServiceMonitor.safely(monitor.complete(
        jobId, label, outcome, System.currentTimeMillis() - t0))
    }
  }

  /** Best-effort cancel (the reference worker's job-kill surface):
    * a QUEUED job is marked and never starts; a RUNNING job has its
    * Spark job group killed (interrupting executors mid-stage) and
    * reports Cancelled. Completed/Failed jobs are left alone. */
  def cancel(jobId: String): Boolean = status(jobId) match {
    case Some(Queued) =>
      state.replace(jobId, Queued, Cancelled) || cancel(jobId)
    case Some(Running) =>
      val flipped = state.replace(jobId, Running, Cancelled)
      if (flipped) s.sparkContext.cancelJobGroup(jobGroup(jobId))
      flipped || cancel(jobId)
    case _ => false
  }

  /** Poll surface. None = unknown job id. */
  def status(jobId: String): Option[JobStatus] = Option(state.get(jobId))

  /** Completed results, read back from the job store. */
  def fetch(jobId: String): Option[DataFrame] = status(jobId) match {
    case Some(Completed(_)) =>
      Some(s.read.parquet(resultDir.resolve(jobId).toString))
    case _ => None
  }

  /** Block until the job leaves the queue/running states (tests and
    * simple callers; a real client polls [[status]]). */
  def await(jobId: String, timeoutMs: Long = 120000L): Option[JobStatus] = {
    val deadline = System.nanoTime() + TimeUnit.MILLISECONDS.toNanos(timeoutMs)
    var st = status(jobId)
    while (st.exists(x => x == Queued || x == Running)
        && System.nanoTime() < deadline) {
      Thread.sleep(50)
      st = status(jobId)
    }
    st
  }

  def shutdown(): Unit = pool.shutdownNow()
}

object JobQueue {
  sealed trait JobStatus
  case object Queued extends JobStatus
  case object Running extends JobStatus
  case object Cancelled extends JobStatus
  final case class Completed(rows: Long) extends JobStatus
  final case class Failed(error: String) extends JobStatus
}
