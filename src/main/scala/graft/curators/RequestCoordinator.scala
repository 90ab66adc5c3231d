package graft.curators

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.{Duration, DurationInt}
import scala.util.control.NonFatal
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.semantic.model.Registry

/** Parallel curator execution — the analogue of the reference's request
  * coordinator (service/.../RequestCoordinator.scala:83-173 fanning the
  * default request and each requested curator onto a parallel executor,
  * par-request-2 ParallelServiceExecutor.java).
  *
  * The default request and every curator are planned AND materialized
  * concurrently on a shared daemon pool over ONE SparkSession — Spark's
  * scheduler accepts jobs from many threads, so a dashboard request for
  * default + timeshift + rowcount runs three overlapping Spark jobs
  * instead of serializing them. Each future persists its result and
  * forces it (count) so the returned DataFrames serve from cache.
  *
  * Failure semantics per the reference: a curator failure is isolated
  * into its own `Left` (curators are best-effort riders on the
  * response); the DEFAULT request failing fails the whole request.
  */
object RequestCoordinator {

  sealed trait CuratorSpec { def name: String }
  case object Default extends CuratorSpec { val name = "default" }
  case object TimeShift extends CuratorSpec { val name = "timeshift" }
  case object TotalMetrics extends CuratorSpec { val name = "totalmetrics" }
  case object RowCount extends CuratorSpec { val name = "rowcount" }
  final case class DrillDown(field: String, topN: Int = 10) extends CuratorSpec {
    val name = "drilldown"
  }

  /** Small fixed pool: curator fan-out is per-request parallelism, not
    * data parallelism — the data-level work still runs on Spark's own
    * scheduler; this pool only needs one thread per in-flight curator. */
  private lazy val pool: ExecutionContext = ExecutionContext.fromExecutor(
    java.util.concurrent.Executors.newFixedThreadPool(8,
      (r: Runnable) => {
        val t = new Thread(r, "graft-curator")
        t.setDaemon(true); t
      }))

  /** Run the default request plus `curators` concurrently; results are
    * keyed by curator name. `preExecute` is a test seam invoked on the
    * worker thread before planning (lets a spec barrier-prove that all
    * curators really run concurrently). */
  def run(json: String, reg: Registry, curators: Seq[CuratorSpec],
      s: SparkSession, dir: String,
      timeout: Duration = 120.seconds,
      preExecute: CuratorSpec => Unit = _ => (),
      monitor: graft.serving.ServiceMonitor =
        graft.serving.ServiceMonitor.NoOp,
      requestId: String = ""): Map[String, Either[String, DataFrame]] = {
    import graft.serving.ServiceMonitor.safely
    val specs = Default +: curators.filterNot(_ == Default)
    require(specs.map(_.name).distinct.sizeIs == specs.size,
      "duplicate curator names in one request")
    val fs = specs.map { spec =>
      spec.name -> Future {
        // job-group tag is an inheritable thread-local: jobs submitted
        // from this future are attributable to their curator in the UI
        // and in listener events
        s.sparkContext.setJobGroup(s"curator-${spec.name}",
          s"curator ${spec.name}", interruptOnCancel = false)
        // per-curator monitor bracket on the worker thread: begin
        // before planning, complete with outcome + wall after
        // materialization (a throwing monitor never fails a curator)
        safely(monitor.begin(requestId, spec.name))
        val t0 = System.currentTimeMillis()
        var outcome = false
        try {
          preExecute(spec)
          val df = spec match {
            case Default => Curators.default(json, reg)(s, dir)
            case TimeShift => Curators.timeShift(json, reg)(s, dir)
            case TotalMetrics => Curators.totalMetrics(json, reg)(s, dir)
            case RowCount => Curators.rowCount(json, reg)(s, dir)
            case DrillDown(f, n) => Curators.drillDown(json, f, n, reg)(s, dir)
          }
          val cached = df.persist()
          cached.count() // materialize inside the future, not at merge
          outcome = true
          Right(cached): Either[String, DataFrame]
        } finally {
          s.sparkContext.clearJobGroup()
          safely(monitor.complete(requestId, spec.name, outcome,
            System.currentTimeMillis() - t0))
        }
      }(pool).recover { case NonFatal(e) => Left(e.getMessage) }(pool)
    }
    val done = fs.map { case (n, f) => n -> Await.result(f, timeout) }.toMap
    done("default").left.foreach { e =>
      // default failed: release the riders' caches, fail the request
      done.valuesIterator.foreach {
        case Right(df) => df.unpersist(); case _ => ()
      }
      throw new IllegalArgumentException(s"default request failed: $e")
    }
    done
  }

  /** Release every cached result of a coordinator response. */
  def release(results: Map[String, Either[String, DataFrame]]): Unit =
    results.valuesIterator.foreach {
      case Right(df) => df.unpersist(); case _ => ()
    }
}
