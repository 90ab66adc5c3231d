package graft.curators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analyzer.{request, RequestModel}
import graft.analyzer.request._
import graft.semantic.model._
import graft.planner.Planner

/** Curators: second-pass request programs over the semantic pipeline —
  * the Spark-native analogue of the reference's curator framework
  * (service RequestCoordinator running TimeShift / Drilldown /
  * TotalMetrics / RowCount curators in parallel,
  * reference service/.../curators/Curator.scala,
  * TimeShiftCurator.scala:49-58, DrilldownCurator.scala,
  * TotalMetricsCurator.scala).
  *
  * Each curator derives a NEW ReportingRequest from the incoming one,
  * plans it through the same analyzer/planner, and composes the two
  * DataFrames inside one Spark plan — so what the reference does with
  * serving-JVM row merges (IN-list shipping, IndexedRowList) is here a
  * join/semi-join Catalyst can optimize (broadcast the small side, no
  * driver collect).
  */
object Curators {

  private def planned(req: ReportingRequest, reg: Registry,
      s: SparkSession, dir: String): DataFrame =
    (for {
      m <- RequestModel.from(req, reg)
      p <- Planner.plan(m, s, dir)
    } yield p.df).fold(e => throw new IllegalArgumentException(e), identity)

  /** Like [[planned]], but also surfaces the winning variant's
    * request-aware ROW estimate when that variant declares a
    * CostModel (static costs are abstract rank units, not rows — they
    * never leave the ranking). This is the fact-size signal KeyShip's
    * bloom decision consumes: with it, an oversized parent restriction
    * sizes its bitset against the actual drill scan. */
  private[graft] def plannedWithEstimate(req: ReportingRequest,
      reg: Registry, s: SparkSession, dir: String)
      : (DataFrame, Option[Long]) =
    (for {
      m <- RequestModel.from(req, reg)
      r <- Planner.explain(m, s, dir)
    } yield {
      val (choices, p) = r
      // rowEstimate, NOT estCost: the ranking figure carries the
      // multiplier penalty, which is not a row count — feeding it to
      // KeyShip would size the bitset for rows the scan never reads
      val est = for {
        w <- choices.find(_.chosen)
        cube <- reg.cube(req.cube).toOption
        v <- cube.variants.find(_.name == w.name)
        rows <- v.costModel.map(_.rowEstimate(m.numDays)).orElse(
          // REGISTRY-AUTO channel: even without a declared CostModel,
          // a plain parquet variant's cardinality is footer metadata
          // (memoized per session, zero Spark jobs) — so every served
          // request's key-ship decision amortizes like the hand-wired
          // q22, not just cubes whose author remembered to model
          // costs. An upper bound is safe here: only carrier choice
          // can drift, never semantics. view-backed variants skip it
          // (their scan is not the raw table).
          if (v.view.isEmpty)
            scala.util.Try(
              graft.core.Tables.tableRows(s, dir, v.table)).toOption
          else None)
      } yield rows
      (p.df, est)
    }).fold(e => throw new IllegalArgumentException(e), identity)

  private def parsed(json: String): ReportingRequest =
    request.parse(json).fold(e => throw new IllegalArgumentException(e), identity)

  private def metricAliases(reg: Registry, cube: String): Set[String] =
    reg.cube(cube).toOption.get.variants
      .flatMap(v => v.metrics.map(_.alias) ++ v.derived.map(_.alias)).toSet

  private def pubCols(reg: Registry, cube: String): Map[String, PubCol] = {
    val c = reg.cube(cube).toOption.get
    (c.variants.flatMap(_.dimCols) ++ c.dims.flatMap(_.cols))
      .map(pc => pc.alias -> pc).toMap
  }

  /** The default (un-curated) pass: the request itself through the
    * analyzer/planner — what RequestCoordinator runs alongside the
    * curators. */
  def default(json: String, reg: Registry)(s: SparkSession, dir: String): DataFrame =
    planned(parsed(json), reg, s, dir)

  /** TimeShift: re-plan the request for the immediately preceding
    * period of the same length ([from - len, from - 1], reference
    * TimeShiftCurator period computation), left-join prev onto current
    * on every non-metric column, append "<m> Prev" and
    * "<m> Pct Change" per metric.
    *
    * The shifted window comes from the Between filter on a DAY-GRAIN
    * column (a Between on any other dim is not a time window). When the
    * day column is itself selected, prev rows are aligned to current
    * rows at the same offset within the period (prev day + len = cur
    * day) so the join keys match instead of comparing disjoint dates.
    *
    * `cfg.daysOffset` shifts the comparison window a further N days
    * back (reference TimeShiftCurator.scala:83-89: offset = 1 +
    * daysOffset, prev = [from − len − offset + 1 … from − offset] in
    * our inclusive-bounds terms); `cfg.sortBy` orders the merged
    * result (reference TimeShiftCurator sortBy config) instead of the
    * default dim ordering. */
  def timeShift(json: String, reg: Registry,
      cfg: TimeShiftConfig = TimeShiftConfig())(
      s: SparkSession, dir: String): DataFrame = {
    val req = parsed(json)
    val mets = metricAliases(reg, req.cube)
    val pubs = pubCols(reg, req.cube)
    val dayF = req.filters.collectFirst {
      case BetweenFilter(f, from, to) if pubs.get(f).exists(_.isDayGrain) =>
        BetweenFilter(f, from, to)
    }.getOrElse(throw new IllegalArgumentException(
      "timeshift requires a Between filter on a day-grain column"))
    val from = java.time.LocalDate.parse(dayF.from)
    val to = java.time.LocalDate.parse(dayF.to)
    val len = java.time.temporal.ChronoUnit.DAYS.between(from, to) + 1
    val shift = len + cfg.daysOffset
    val prevF = BetweenFilter(dayF.field,
      from.minusDays(shift).toString,
      from.minusDays(1 + cfg.daysOffset).toString)
    val prevReq = req.copy(filters = req.filters.map {
      case f if f == (dayF: QFilter) => prevF
      case f => f
    })
    val dims = req.selectFields.filterNot(mets)
    val metsSel = req.selectFields.filter(mets)
    val cur = planned(req, reg, s, dir)
    val dayGrainSel: Set[String] =
      dims.filter(a => pubs.get(a).exists(_.isDayGrain)).toSet
    val prev = planned(prevReq, reg, s, dir)
      .select((dims.map { a =>
        if (dayGrainSel(a))
          date_format(date_add(to_date(col(a)), shift.toInt), "yyyy-MM-dd").as(a)
        else col(a)
      } ++ metsSel.map(a => col(a).as(s"$a Prev"))): _*)
    val joined = cur.join(prev, dims, "left_outer")
    val withPct = metsSel.foldLeft(joined) { (df, a) =>
      df.withColumn(s"$a Pct Change",
        when(col(s"$a Prev").isNotNull && col(s"$a Prev") =!= 0,
          round((col(a) - col(s"$a Prev")) / col(s"$a Prev") * 100, 4)))
    }
    cfg.sortBy match {
      case Some(sb) =>
        withPct.orderBy(
          (if (sb.descending) desc(sb.field) else asc(sb.field)) +:
            dims.map(col): _*)
      case None => withPct.orderBy(dims.map(col): _*)
    }
  }

  /** TotalMetrics: grand totals of the requested metrics under the same
    * filters — the request re-planned with its dims dropped. */
  def totalMetrics(json: String, reg: Registry)(s: SparkSession, dir: String): DataFrame = {
    val req = parsed(json)
    val mets = metricAliases(reg, req.cube)
    // curator-internal second passes are async-style requests: exempt
    // from the sync pagination requirement (maxRowsSync) that would
    // otherwise reject rowsPerPage = -1
    val totalsReq = req.copy(
      selectFields = req.selectFields.filter(mets),
      sortBy = Nil, paginationStartIndex = 0, rowsPerPage = -1, async = true)
    planned(totalsReq, reg, s, dir)
  }

  /** RowCount: total (unpaginated) row count of the request's result
    * grain — Count(*) OVER() TOTALROWS as a scalar aggregate
    * (reference RowCountCurator, Curator.scala:211-238). */
  def rowCount(json: String, reg: Registry)(s: SparkSession, dir: String): DataFrame = {
    val req = parsed(json)
    val unpaged = req.copy(sortBy = Nil, paginationStartIndex = 0,
      rowsPerPage = -1, async = true)
    planned(unpaged, reg, s, dir).agg(count(lit(1)).as("totalrows"))
  }

  /** Parallel dashboard merge — RequestCoordinator end-to-end: the
    * default request plus TotalMetrics and RowCount execute
    * CONCURRENTLY (three overlapping Spark jobs over one session), then
    * merge into one response frame: each scalar rider broadcast-joins
    * onto the default rows — the in-plan analogue of the reference
    * coordinator's curator-result envelope merge
    * (service/.../RequestCoordinator.scala:83-173). */
  def parallelMerge(json: String, reg: Registry)(s: SparkSession, dir: String): DataFrame = {
    import RequestCoordinator._
    val res = RequestCoordinator.run(json, reg, Seq(TotalMetrics, RowCount), s, dir)
    // hand the coordinator's persisted frames to the session cache
    // registry so Caches.release owns their unpersist
    res.foreach { case (n, e) =>
      e.foreach(df => graft.core.Caches.track(s, s"curator-merge:$n", df))
    }
    val req = parsed(json)
    val mets = metricAliases(reg, req.cube)
    val dims = req.selectFields.filterNot(mets)
    val totals = mets.foldLeft(res("totalmetrics").toOption.get) { (df, m) =>
      if (df.columns.contains(m)) df.withColumnRenamed(m, s"$m Total") else df
    }
    res("default").toOption.get
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(res("rowcount").toOption.get
        .withColumnRenamed("totalrows", "Result Rows")))
      .orderBy(dims.map(col): _*)
  }

  /** Drilldown: take the top-N parent rows of the base request (by its
    * first sort), then re-request at (parent dims + drill dim) grain
    * restricted to those parents — the reference's injected-IN-filter
    * re-request (DrilldownCurator) expressed as a broadcast left-semi
    * join instead of a driver-side collect. */
  def drillDown(json: String, drillField: String, topN: Int, reg: Registry)(
      s: SparkSession, dir: String): DataFrame =
    drillDownConfigured(json,
      DrilldownRequest(dimensions = Seq(drillField), maxRows = Int.MaxValue),
      topN, reg)(s, dir)

  /** Drilldown under a full reference-shaped [[DrilldownRequest]]
    * config (DrilldownConfig.scala:35-120 JSON grammar): multiple
    * drill dimensions, a cube override (empty = same cube,
    * DrilldownCurator.scala:52), `enforceFilters` (false drops the
    * base request's non-time filters but always retains the day-grain
    * window — the reference keeps `dayFilter` outside
    * `filterExpressions`), extra config filters ANDed in, facts
    * replacing or (additiveFacts) extending the base metrics
    * (DrilldownCurator.scala:69-74), a configured ordering, and a
    * `maxRows` cap (DrilldownCurator.scala:82-83). */
  def drillDownConfigured(json: String, cfg: DrilldownRequest, topN: Int,
      reg: Registry)(s: SparkSession, dir: String): DataFrame = {
    val req = parsed(json)
    val baseMets = metricAliases(reg, req.cube)
    val parentDims = req.selectFields.filterNot(baseMets)
    // cache the page ONCE (topN rows — bounded by the page size at
    // any corpus scale): the key-ship below evaluates the parent set
    // up to three times (size probe, bloom build, exact join), and
    // each evaluation would otherwise re-run the whole base request's
    // plan. persist(), NOT localCheckpoint: a checkpoint truncates
    // lineage, so a lost executor/cached block on a cluster would
    // FAIL the drilldown instead of recomputing the page (the same
    // tradeoff mergeFrame's compaction cache documents). The entry
    // rides the session cache registry so the normal release
    // lifecycle (and re-drills of the same request) own its
    // unpersist instead of stacking page caches forever.
    // keyed on the FULL request json, never its hashCode: two distinct
    // in-flight requests colliding on a 32-bit hash would have track()
    // unpersist each other's live parents frame mid-use
    val parents = graft.core.Caches.track(s, s"drill|$dir|$json",
      planned(req.copy(rowsPerPage = topN, paginationStartIndex = 0),
        reg, s, dir).select(parentDims.map(col): _*).persist())
    val cube = if (cfg.cube.nonEmpty) cfg.cube else req.cube
    val pubs = pubCols(reg, req.cube)
    val baseFacts = req.selectFields.filter(baseMets)
    val facts =
      if (cfg.facts.isEmpty) baseFacts
      else if (cfg.additiveFacts) (baseFacts ++ cfg.facts).distinct
      else cfg.facts
    val keptFilters =
      if (cfg.enforceFilters) req.filters
      else req.filters.filter {
        case BetweenFilter(f, _, _) if pubs.get(f).exists(_.isDayGrain) => true
        case _ => false
      }
    // with a cube OVERRIDE, re-validate the carried fields and filters
    // against the TARGET cube's public surface up front (the reference
    // validates the drilldown request against the target cube,
    // DrilldownCurator.scala:52-66) — otherwise a base filter or fact
    // absent from the override cube surfaces as a downstream planner
    // error instead of a config-validation error
    if (cube != req.cube) {
      val tgt = reg.cube(cube).fold(e =>
        throw new IllegalArgumentException(s"drilldown config: $e"), identity)
      val known = tgt.variants.flatMap(v => v.dimCols.map(_.alias) ++
        v.metrics.map(_.alias) ++ v.derived.map(_.alias)).toSet ++
        tgt.dims.flatMap(_.cols.map(_.alias))
      val carried = (parentDims ++ cfg.dimensions ++ facts ++
        (keptFilters ++ cfg.filters).flatMap(request.leaves).map(_.field))
        .distinct
      val missing = carried.filterNot(known)
      if (missing.nonEmpty) throw new IllegalArgumentException(
        s"drilldown config: field(s) ${missing.sorted.mkString("[", ", ", "]")} " +
          s"not present on override cube '$cube'")
    }
    val drillReq = req.copy(
      cube = cube,
      selectFields = (parentDims ++ cfg.dimensions).distinct ++ facts,
      filters = keptFilters ++ cfg.filters,
      sortBy = Nil, paginationStartIndex = 0, rowsPerPage = -1, async = true)
    // the reference ships the parent keys as an injected IN filter
    // (DrilldownCurator.insertValuesIntoDrilldownRequestFilter) — here
    // the carrier is KeyShip's size-based decision: a page-sized
    // parent set broadcasts into the exact semi, a past-broadcast one
    // ships as the Bloom tuple-hash probe + exact semi instead of a
    // multi-megabyte broadcast literal. The drill variant's CostModel
    // row estimate (when declared) feeds the bitset sizing and the
    // build-vs-savings decline.
    val (drillDf, drillRows) = plannedWithEstimate(drillReq, reg, s, dir)
    // a cube OVERRIDE may publish a shared parent dim under a
    // different physical type; the tuple carrier refuses mismatched
    // types (xxhash64 is type-sensitive — see KeyShip.shipColsPrep),
    // so that case keeps the coercing broadcast semi the page-sized
    // parent set is fine with
    val typesMatch = parentDims.forall(a =>
      drillDf.schema(a).dataType == parents.schema(a).dataType)
    val drilled =
      if (typesMatch)
        graft.operators.KeyShip.semiShipCols(
          drillDf, parentDims, parents, parentDims, factRows = drillRows,
          // the parent side is a PAGE — topN is its a-priori upper
          // bound, known with zero jobs
          keyRows = Some(topN.toLong))
      else drillDf.join(broadcast(parents), parentDims, "left_semi")
    val ordered =
      if (cfg.ordering.isEmpty)
        drilled.orderBy((parentDims ++ cfg.dimensions).distinct.map(col): _*)
      else drilled.orderBy(cfg.ordering.map(sb =>
        if (sb.descending) desc(sb.field) else asc(sb.field)) ++
        (parentDims ++ cfg.dimensions).distinct.map(col): _*)
    if (cfg.maxRows == Int.MaxValue) ordered else ordered.limit(cfg.maxRows)
  }

  /** Parse a reference-shaped drilldown config (object or array) and
    * run every request in it — the multi-request form of
    * DrilldownConfig (one curator result per request). */
  def drillDownAll(json: String, configJson: String, topN: Int,
      reg: Registry)(s: SparkSession, dir: String): Seq[DataFrame] =
    DrilldownConfig.parse(configJson)
      .fold(e => throw new IllegalArgumentException(e), identity)
      .map(cfg => drillDownConfigured(json, cfg, topN, reg)(s, dir))
}
