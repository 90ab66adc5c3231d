package graft.analyzer

import graft.semantic.model._
import graft.analyzer.request._

/** Request analysis: alias resolution + validation against the cube,
  * driven-ness and join-type decision — the Spark-native analogue of
  * maha's RequestModel.from (reference RequestModel.scala:318, join
  * matrix :180-228).
  */
object RequestModel {

  /** Upper bound on IN/NOT-IN filter value-list size: past this a key
    * set is data, not request metadata (see the validation message). */
  val MaxInFilterValues = 100000


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
      /** calendar days (inclusive) covered by the request's effective
        * time window; None = no window (unbounded scan). Reference
        * ReportingRequest numDays, core RequestModel.scala:150-173 —
        * feeds CostModel.estimate. */
      numDays: Option[Int] = None) {
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
    case boolean => // And/Or/Outer recurse before reaching here
      sys.error(s"opOf is leaf-only, got boolean node $boolean")
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
              if (pc.effectiveOps.contains(opOf(f))) None
              else if (pc.passthrough)
                Some(s"'${f.field}' is a passthrough column and cannot be filtered")
              else Some(s"operator ${opOf(f)} not allowed on '${f.field}'")
          }
        } ++ allLeaves.flatMap {
          // IN/NOT-IN value lists are DRIVER-SIDE request metadata:
          // each value becomes a literal in the plan, so an unbounded
          // list is an unbounded expression tree (minutes of plan
          // churn at 10⁶ values — the exact cliff KeyShip's frame
          // carrier exists to avoid). A key set that size is DATA,
          // not a filter: it should arrive as a table and ship via
          // the semi-join, so the request is rejected loudly with
          // that steer (the reference's engines impose the same kind
          // of bound, e.g. Oracle's IN-list limits).
          case InFilter(fld, vs) if vs.size > MaxInFilterValues =>
            Some(s"'$fld' IN list has ${vs.size} values (max " +
              s"$MaxInFilterValues): ship key sets this large as data " +
              "via a semi-join, not as request literals")
          case NotInFilter(fld, vs) if vs.size > MaxInFilterValues =>
            Some(s"'$fld' NOT IN list has ${vs.size} values (max " +
              s"$MaxInFilterValues): ship key sets this large as data " +
              "via an anti-join, not as request literals")
          case _ => None
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
        // PublicColumn guard rails (reference RequestModel.scala
        // :445-448 required, :451-457 dependsOnColumns, :532-535
        // incompatibleColumns, :592-595 filteringRequired), with the
        // reference's error message shapes; alias-sorted so a request
        // violating several reports deterministically
        val selectedSet = req.selectFields.toSet
        // filteringRequired must be satisfied by a PUSHABLE filter:
        // an OuterFilter applies to rendered rows after aggregation,
        // so it would leave the guarded column's scan unfiltered —
        // exactly what the knob forbids
        val filteredSet = req.filters.filterNot(_.isInstanceOf[OuterFilter])
          .flatMap(request.leaves).map(_.field).toSet
        // knobs MERGED across variants: an alias often repeats per
        // variant, and a last-wins map would silently drop a knob
        // declared on only one of them — the reference's knobs are
        // cube-level (PublicFact.requiredAliases etc. union over the
        // public columns), so OR the flags and union the sets
        val knobCols: Seq[(String, PubCol)] =
          (cube.variants.flatMap(_.dimCols) ++ cube.dims.flatMap(_.cols))
            .groupBy(_.alias).toSeq.sortBy(_._1).map { case (a, cs) =>
              a -> cs.reduce((x, y) => x.copy(
                required = x.required || y.required,
                dependsOn = x.dependsOn ++ y.dependsOn,
                incompatibleWith = x.incompatibleWith ++ y.incompatibleWith,
                filteringRequired = x.filteringRequired || y.filteringRequired))
            }
        val knobErrs = knobCols.flatMap { case (alias, pc) =>
          val requiredErr =
            if (pc.required && !selectedSet(alias))
              Seq(s"Missing required field: cube=${cube.name}, field=$alias")
            else Nil
          val dependsErrs =
            if (selectedSet(alias))
              pc.dependsOn.toSeq.sorted.collect {
                case dep if !selectedSet(dep) =>
                  s"Missing dependent column: cube=${cube.name}, " +
                    s"field=$alias, dependsOnColumn=$dep"
              }
            else Nil
          val clash = pc.incompatibleWith.intersect(selectedSet)
          val incompatErr =
            if (selectedSet(alias) && clash.nonEmpty)
              Seq(s"Incompatible columns found in request, $alias is not " +
                s"compatible with ${clash.toSeq.sorted.mkString("[", ", ", "]")}")
            else Nil
          val filteringErr =
            if (pc.filteringRequired && !filteredSet(alias))
              Seq(s"Missing required filter: cube=${cube.name}, field=$alias")
            else Nil
          requiredErr ++ dependsErrs ++ incompatErr ++ filteringErr
        }
        if (filterErrs.nonEmpty) Left(filterErrs.mkString("; "))
        else if (aclErrs.nonEmpty) Left(aclErrs.mkString("; "))
        else if (knobErrs.nonEmpty) Left(knobErrs.mkString("; "))
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
              grainWindows(pubColOf, dimFs).flatMap { wins =>
                rowsGuard.orElse(windowCheck(cube, wins))
                  .orElse(lookBackCheck(req, cube, wins))
                  .toLeft(()).map { _ =>
                    Model(req, cube, selects, dimFs, metricFs, outerFs,
                      withParents, joinKinds, req.dimensionDriven,
                      isFactless = factless && withParents.nonEmpty,
                      numDays = requestNumDays(wins))
                  }
              }
          }
        }
    }
  }

  /** A parsed conjunctive time window (Between on a grain column). */
  final case class GrainWindow(field: String, grain: Grain,
      from: java.time.LocalDateTime, to: java.time.LocalDateTime) {
    /** Calendar days covered, inclusive. */
    def days: Long = java.time.temporal.ChronoUnit.DAYS.between(
      from.toLocalDate, to.toLocalDate) + 1
  }

  /** Every conjunctive Between on a time-grain column (a Between inside
    * a top-level AND is still conjunctive; OR-nested ones are not),
    * parsed and validated ONCE for all consumers (windowCheck,
    * lookBackCheck, numDays — they previously re-scanned and re-parsed
    * independently and disagreed on error handling). A grain column's
    * Between with unparseable bounds, or an inverted window — at the
    * grain's OWN precision, so an Hour Between inverted within one
    * calendar day is caught too — is a malformed request, cap or no
    * cap: erroring beats a silently empty result. */
  private def grainWindows(pubColOf: Map[String, PubCol],
      dimFs: Seq[QFilter]): Either[String, Seq[GrainWindow]] = {
    val raw = dimFs.flatMap(request.conjunctive).collect {
      case BetweenFilter(field, from, to)
          if pubColOf.get(field).exists(_.grain.isDefined) =>
        (field, pubColOf(field).grain.get, from, to)
    }
    val parsed = raw.map { case (field, grain, from, to) =>
      try {
        val lf = grain.parseLocal(from); val lt = grain.parseLocal(to)
        if (lf.isAfter(lt))
          Left(s"'$field' Between window is empty ($from > $to)")
        else Right(GrainWindow(field, grain, lf, lt))
      } catch {
        case _: java.time.format.DateTimeParseException =>
          Left(s"'$field' Between bounds must match the column's " +
            s"grain format (${grain.format})")
      }
    }
    parsed.collectFirst { case Left(e) => Left(e) }
      .getOrElse(Right(parsed.collect { case Right(w) => w }))
  }

  /** Requested window width in calendar days; None = the request
    * carries no time window at all (an unbounded scan — the cost model
    * prices it at the retention horizon, not as one day). With windows
    * on SEVERAL grain columns every predicate applies, so the
    * effective scan is their intersection: take the minimum — also
    * making validation independent of filter ordering. Reference
    * numDays: core RequestModel.scala:150-173. */
  private def requestNumDays(wins: Seq[GrainWindow]): Option[Int] =
    wins.map(_.days).minOption.map(d => math.min(d, Int.MaxValue.toLong).toInt)

  /** maxDaysLookBack enforcement (reference validateMaxLookBackWindow,
    * RequestModel.scala:1300-1319: requestedDaysLookBack = days from
    * now to the window's FROM bound, must not exceed the cap). The
    * evaluation date is the request's asOfDate when pinned (replays,
    * tests), else today in the REQUEST's timezone (UTC when absent) —
    * never the server's default zone, which would make edge-of-cap
    * acceptance flip with server locale. Declaring the cap makes the
    * time filter REQUIRED — never silently unbounded. The effective
    * scan start with several windows is the latest FROM (intersection),
    * so the look-back distance is the minimum. */
  private def lookBackCheck(req: ReportingRequest, cube: CubeDef,
      wins: Seq[GrainWindow]): Option[String] =
    cube.maxDaysLookBack.flatMap { maxBack =>
      if (wins.isEmpty)
        Some(s"cube '${cube.name}' requires a Between filter on its " +
          s"time-grain column (maxDaysLookBack=$maxBack)")
      else try {
        val zone = req.timezone.map(java.time.ZoneId.of)
          .getOrElse(java.time.ZoneOffset.UTC)
        val asOf = req.asOfDate.fold(java.time.LocalDate.now(zone))(
          java.time.LocalDate.parse)
        val (field, back) = wins.map(w => w.field ->
          java.time.temporal.ChronoUnit.DAYS.between(w.from.toLocalDate, asOf))
          .minBy(_._2)
        if (back > maxBack)
          Some(s"'$field' window starts $back days back, exceeding " +
            s"maxDaysLookBack=$maxBack on cube '${cube.name}'")
        else None
      } catch {
        // DateTimeException covers both DateTimeParseException (bad
        // asOfDate) and ZoneRulesException (bad request timezone) — an
        // invalid zone must surface as a validation error, not escape
        // the Either contract as an uncaught exception
        case _: java.time.format.DateTimeParseException =>
          Some("asOfDate must be a yyyy-MM-dd date")
        case _: java.time.DateTimeException =>
          Some(s"unknown request timezone '${req.timezone.getOrElse("")}'")
      }
    }

  /** maxDaysWindow enforcement (reference RequestModel maxDaysWindow
    * checks; Fact.scala:438): when the cube declares a window cap, the
    * request must carry a Between on a time-grain column and the
    * EFFECTIVE window (intersection when several apply — the minimum
    * width) must not exceed the cap in calendar days. */
  private def windowCheck(cube: CubeDef,
      wins: Seq[GrainWindow]): Option[String] =
    cube.maxDaysWindow.flatMap { maxDays =>
      if (wins.isEmpty)
        Some(s"cube '${cube.name}' requires a Between filter on its " +
          s"time-grain column (maxDaysWindow=$maxDays)")
      else {
        val w = wins.minBy(_.days)
        if (w.days > maxDays)
          Some(s"'${w.field}' window of ${w.days} days exceeds " +
            s"maxDaysWindow=$maxDays on cube '${cube.name}'")
        else None
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
