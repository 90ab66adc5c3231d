package graft.analyzer

import graft.semantic.model._
import graft.analyzer.request._

/** Request analysis: alias resolution + validation against the cube,
  * driven-ness and join-type decision — the Spark-native analogue of
  * maha's RequestModel.from (reference RequestModel.scala:318, join
  * matrix :180-228).
  */
object RequestModel {

  sealed trait ColKind
  case object FactDimCol extends ColKind
  final case class DimAttrCol(dim: String) extends ColKind
  case object MetricCol extends ColKind

  final case class Resolved(alias: String, kind: ColKind)

  /** Join type decided per maha's publicDimToJoinTypeMap matrix
    * (reference RequestModel.scala:180-228), PER DIMENSION:
    *  - dim-driven + metric filters → InnerJoin for every dim (a HAVING
    *    on a fact metric can never keep a null-extended row);
    *  - dim-driven otherwise → RightOuterJoin for the DRIVING dim only
    *    (the most granular requested dim — all its rows are kept);
    *    parent dims pulled in for snowflake reachability are InnerJoin
    *    (they are attributes of the driving dim, and ROJ-ing them would
    *    fabricate rows for parent values with no child/fact);
    *  - fact-driven with a filter on any dim attribute → InnerJoin;
    *  - fact-driven otherwise → LeftOuterJoin. */
  sealed trait JoinKind
  case object InnerJoin extends JoinKind
  case object LeftOuterJoin extends JoinKind
  case object RightOuterJoin extends JoinKind

  final case class Model(
      req: ReportingRequest,
      cube: CubeDef,
      selects: Seq[Resolved],
      dimFilters: Seq[QFilter],      // on fact-level dim cols or dim attrs
      metricFilters: Seq[QFilter],   // HAVING
      outerFilters: Seq[QFilter],    // applied on the final rendered result
      joinDims: Seq[String],         // dims (in join order) that must be joined
      joinKinds: Map[String, JoinKind],
      isDimDriven: Boolean,
      /** true when the fact scan can be eliminated entirely: no
        * metrics, no fact-level selects or filter leaves, no cube
        * forced filters — the SINGLE source of truth; the planner must
        * not re-derive this. */
      isFactless: Boolean = false,
      /** calendar days (inclusive) covered by the request's grain
        * Between, 1 when absent (reference ReportingRequest numDays,
        * core RequestModel.scala:150-173) — feeds CostModel.estimate. */
      numDays: Int = 1) {
    def selectedMetrics: Seq[String] =
      selects.collect { case Resolved(a, MetricCol) => a }
    def selectedNonMetrics: Seq[String] =
      selects.collect { case r if r.kind != MetricCol => r.alias }
  }

  private val opOf: QFilter => FilterOp = {
    case _: InFilter => InOp
    case _: NotInFilter => NotInOp
    case _: EqFilter => EqOp
    case _: NeqFilter => NeqOp
    case _: BetweenFilter => BetweenOp
    case _: GtFilter => GtOp
    case _: LtFilter => LtOp
    case _: LikeFilter => LikeOp
    case _: NotLikeFilter => NotLikeOp
    case _: IsNullFilter => IsNullOp
    case _: IsNotNullFilter => IsNotNullOp
  }

  def from(req: ReportingRequest, registry: Registry): Either[String, Model] =
    from(req, registry, None)

  /** Revision-aware entry: `revision` (from a BucketSelector decision
    * or an explicit request pin) picks among the registry's revisions
    * of the cube; None resolves the default. */
  def from(req: ReportingRequest, registry: Registry,
      revision: Option[Int]): Either[String, Model] =
    for {
      cube <- registry.cube(req.cube, revision)
      model <- resolve(req, cube)
    } yield model

  private def resolve(req: ReportingRequest, cube: CubeDef): Either[String, Model] = {
    // alias → kind over the union of variant dim cols, dim attrs, metrics
    val factDimAliases = cube.variants.flatMap(_.dimCols).map(_.alias).toSet
    val metricAliases = (cube.variants.flatMap(_.metrics).map(_.alias) ++
      cube.variants.flatMap(_.derived).map(_.alias)).toSet
    val dimAttr: Map[String, String] =
      cube.dims.flatMap(d => d.cols.map(c => c.alias -> d.name)).toMap

    def kindOf(alias: String): Either[String, Resolved] =
      if (metricAliases(alias)) Right(Resolved(alias, MetricCol))
      else if (factDimAliases(alias)) Right(Resolved(alias, FactDimCol))
      else dimAttr.get(alias).map(d => Resolved(alias, DimAttrCol(d)))
        .toRight(s"unknown field '$alias' on cube '${cube.name}'")

    val resolvedE = req.selectFields.map(kindOf)
    resolvedE.collectFirst { case Left(e) => e } match {
      case Some(err) => Left(err)
      case None =>
        val selects = resolvedE.collect { case Right(r) => r }
        // filters: resolve + filter-operation legality per public column
        val pubColOf: Map[String, PubCol] =
          (cube.variants.flatMap(_.dimCols) ++ cube.dims.flatMap(_.cols))
            .map(c => c.alias -> c).toMap
        val allLeaves = req.filters.flatMap(request.leaves)
        val filterErrs = allLeaves.flatMap { f =>
          kindOf(f.field) match {
            case Left(e) => Some(e)
            case Right(Resolved(_, MetricCol)) => None // HAVING: always legal
            case Right(_) =>
              val pc = pubColOf(f.field)
              if (pc.allowedOps.contains(opOf(f))) None
              else Some(s"operator ${opOf(f)} not allowed on '${f.field}'")
          }
        } ++ req.filters.collect {
          // boolean trees must not mix metric and non-metric leaves
          case f if {
            val ls = request.leaves(f).map(_.field)
            ls.exists(metricAliases) && ls.exists(!metricAliases(_))
          } => s"filter tree on '${f.field}' mixes metric and dimension fields"
        }
        // schema-based access control (PublicColumn.restrictedSchemas)
        // — every LEAF of every filter tree, not just head fields
        val aclErrs = (req.selectFields ++ allLeaves.map(_.field)).distinct
          .flatMap { a =>
            pubColOf.get(a).flatMap(_.restrictedTo).collect {
              case allowed if !req.schema.exists(allowed.contains) =>
                s"field '$a' is restricted to schemas " +
                  allowed.toSeq.sorted.mkString("[", ", ", "]")
            }
          }
        if (filterErrs.nonEmpty) Left(filterErrs.mkString("; "))
        else if (aclErrs.nonEmpty) Left(aclErrs.mkString("; "))
        else {
          val (outerWrapped, pushable) =
            req.filters.partition(_.isInstanceOf[OuterFilter])
          val outerFs = outerWrapped.map(_.asInstanceOf[OuterFilter].inner)
          val (metricFs, dimFs) = pushable.partition(f =>
            request.leaves(f).forall(l => metricAliases(l.field)))
          // sorts must reference selected fields
          val badSort = req.sortBy.find(s => !req.selectFields.contains(s.field))
          val badHaving = metricFs.flatMap(request.leaves)
            .find(f => !req.selectFields.contains(f.field))
          // outer filters see only the rendered result columns
          val badOuter = outerFs.flatMap(request.leaves)
            .find(f => !req.selectFields.contains(f.field))
          (badSort, badHaving, badOuter) match {
            case (Some(s), _, _) => Left(s"sortBy field '${s.field}' not in selectFields")
            case (_, Some(f), _) => Left(s"metric filter on unselected field '${f.field}'")
            case (_, _, Some(f)) => Left(s"outer filter on unselected field '${f.field}'")
            case _ =>
              // dims needed: selected dim attrs + dim-attr filters, plus parents
              val directDims = (selects.collect { case Resolved(_, DimAttrCol(d)) => d } ++
                dimFs.flatMap(request.leaves).flatMap(f => dimAttr.get(f.field))).distinct
              // a dimension-only request (no metrics, no fact-level
              // fields) never touches the fact: trim the chain to start
              // at the most granular REQUESTED dim (maha's dim-driven
              // dimension-listing queries run on the dim tables alone)
              val factless =
                selects.forall(_.kind.isInstanceOf[DimAttrCol]) &&
                  dimFs.flatMap(request.leaves).forall(f => dimAttr.contains(f.field)) &&
                  outerFs.flatMap(request.leaves).forall(f => dimAttr.contains(f.field)) &&
                  metricFs.isEmpty && cube.forced.isEmpty
              val fullChain = expandParents(cube, directDims)
              val withParents =
                if (factless) fullChain.dropWhile(d => !directDims.contains(d))
                else fullChain
              val hasDimAttrFilter =
                dimFs.flatMap(request.leaves).exists(f => dimAttr.contains(f.field))
              // driving dim = the directly-requested dim closest to the
              // fact in the join chain (most granular)
              val driving = withParents.find(directDims.contains)
              val joinKinds: Map[String, JoinKind] = withParents.map { dname =>
                val kind =
                  if (req.dimensionDriven)
                    if (metricFs.nonEmpty) InnerJoin
                    else if (driving.contains(dname)) RightOuterJoin
                    else InnerJoin
                  else if (hasDimAttrFilter) InnerJoin
                  else LeftOuterJoin
                dname -> kind
              }.toMap
              // sync requests must paginate within maxRowsSync; async
              // (curator-internal / job-queue) requests need not
              // paginate but an explicit page is capped by maxRowsAsync
              // (reference sync 5,000 vs async 100,000 row guards,
              // DruidQueryGenerator.scala:159-166)
              val rowsGuard =
                if (req.async) cube.maxRowsAsync.collect {
                  case max if req.rowsPerPage > max =>
                    s"rowsPerPage ${req.rowsPerPage} exceeds cube " +
                      s"'${cube.name}' maxRowsAsync=$max"
                }
                else cube.maxRowsSync.collect {
                  case max if req.rowsPerPage <= 0 =>
                    s"cube '${cube.name}' requires pagination " +
                      s"(rowsPerPage 1..$max)"
                  case max if req.rowsPerPage > max =>
                    s"rowsPerPage ${req.rowsPerPage} exceeds cube " +
                      s"'${cube.name}' maxRowsSync=$max"
                }
              rowsGuard.orElse(windowCheck(cube, pubColOf, dimFs))
                .orElse(lookBackCheck(req, cube, pubColOf, dimFs))
                .toLeft(()).map { _ =>
                  Model(req, cube, selects, dimFs, metricFs, outerFs,
                    withParents, joinKinds, req.dimensionDriven,
                    isFactless = factless && withParents.nonEmpty,
                    numDays = requestNumDays(pubColOf, dimFs))
                }
          }
        }
    }
  }

  /** maxDaysWindow enforcement (reference RequestModel maxDaysWindow
    * checks; Fact.scala:438): when the cube declares a window cap, the
    * request must carry a Between filter on a time-grain column
    * (Day/Hour/Minute — the reference counts requested days from
    * whichever grain the request filters at, Grain.scala:102,143) and
    * its width in calendar days (inclusive) must not exceed the cap.
    * Returns an error, or None when valid. */
  /** The request's conjunctive Between on a time-grain column, if any
    * (a Between inside a top-level AND is still conjunctive and
    * satisfies the day-window requirement; OR-nested ones do not). */
  private def grainBetween(pubColOf: Map[String, PubCol],
      dimFs: Seq[QFilter]): Option[(String, Grain, String, String)] = {
    def conjunctive(f: QFilter): Seq[QFilter] = f match {
      case AndFilter(fs) => fs.flatMap(conjunctive)
      case leaf => Seq(leaf)
    }
    dimFs.flatMap(conjunctive).collectFirst {
      case BetweenFilter(field, from, to)
          if pubColOf.get(field).exists(_.grain.isDefined) =>
        (field, pubColOf(field).grain.get, from, to)
    }
  }

  /** Calendar days (inclusive) spanned by the grain Between; 1 when
    * absent or unparseable (windowCheck rejects those cases on cubes
    * that care). Reference ReportingRequest numDays via
    * DailyGrain.validateFilterAndGetNumDays (RequestModel.scala:150-173). */
  private def requestNumDays(pubColOf: Map[String, PubCol],
      dimFs: Seq[QFilter]): Int =
    grainBetween(pubColOf, dimFs).flatMap { case (_, grain, from, to) =>
      try {
        val days = java.time.temporal.ChronoUnit.DAYS.between(
          grain.parseLocal(from).toLocalDate,
          grain.parseLocal(to).toLocalDate) + 1
        if (days >= 1 && days <= Int.MaxValue) Some(days.toInt) else None
      } catch { case _: java.time.format.DateTimeParseException => None }
    }.getOrElse(1)

  /** maxDaysLookBack enforcement (reference validateMaxLookBackWindow,
    * RequestModel.scala:1300-1319: requestedDaysLookBack = days from
    * now to the window's FROM bound, must not exceed the cap). The
    * evaluation date is the request's asOfDate when pinned (replays,
    * tests), else today. Like maxDaysWindow, declaring the cap makes
    * the grain Between REQUIRED — a request without one (or with
    * unparseable bounds) is rejected, never silently unbounded. */
  private def lookBackCheck(req: ReportingRequest, cube: CubeDef,
      pubColOf: Map[String, PubCol], dimFs: Seq[QFilter]): Option[String] =
    cube.maxDaysLookBack.flatMap { maxBack =>
      grainBetween(pubColOf, dimFs) match {
        case None =>
          Some(s"cube '${cube.name}' requires a Between filter on its " +
            s"time-grain column (maxDaysLookBack=$maxBack)")
        case Some((field, grain, from, _)) =>
          try {
            val asOf = req.asOfDate.fold(java.time.LocalDate.now())(
              java.time.LocalDate.parse)
            val back = java.time.temporal.ChronoUnit.DAYS.between(
              grain.parseLocal(from).toLocalDate, asOf)
            if (back > maxBack)
              Some(s"'$field' window starts $back days back, exceeding " +
                s"maxDaysLookBack=$maxBack on cube '${cube.name}'")
            else None
          } catch {
            case _: java.time.format.DateTimeParseException =>
              Some(s"'$field' Between bounds (or asOfDate) must match the " +
                s"column's grain format (${grain.format}) / yyyy-MM-dd")
          }
      }
    }

  private def windowCheck(cube: CubeDef, pubColOf: Map[String, PubCol],
      dimFs: Seq[QFilter]): Option[String] =
    cube.maxDaysWindow.flatMap { maxDays =>
      grainBetween(pubColOf, dimFs) match {
        case None =>
          Some(s"cube '${cube.name}' requires a Between filter on its " +
            s"time-grain column (maxDaysWindow=$maxDays)")
        case Some((field, grain, from, to)) =>
          try {
            val days = java.time.temporal.ChronoUnit.DAYS.between(
              grain.parseLocal(from).toLocalDate,
              grain.parseLocal(to).toLocalDate) + 1
            if (days < 1) Some(s"'$field' Between window is empty ($from > $to)")
            else if (days > maxDays)
              Some(s"'$field' window of $days days exceeds maxDaysWindow=$maxDays " +
                s"on cube '${cube.name}'")
            else None
          } catch {
            case _: java.time.format.DateTimeParseException =>
              Some(s"'$field' Between bounds must match the column's " +
                s"grain format (${grain.format})")
          }
      }
    }

  /** Order dims so parents are joined before children, including
    * transitive parents of requested dims (snowflake chains). */
  private def expandParents(cube: CubeDef, dims: Seq[String]): Seq[String] = {
    def chain(d: String): Seq[String] = cube.dimByName.get(d) match {
      case Some(dd) => dd.parent.toSeq.flatMap(chain) :+ d
      case None     => Seq(d)
    }
    dims.flatMap(chain).distinct
  }
}
