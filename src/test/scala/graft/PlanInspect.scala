package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Test helper: find physical nodes through AQE wrappers (plain
  * collectLeaves stops at AdaptiveSparkPlanExec / query-stage
  * boundaries). */
object PlanInspect {
  def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case s: QueryStageExec        => scans(s.plan)
    case f: FileSourceScanExec    => Seq(f)
    case other => other.children.flatMap(scans) ++
      other.subqueries.flatMap(scans)
  }
}
