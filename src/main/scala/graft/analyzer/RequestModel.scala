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

  /** Join type decided per maha's publicDimToJoinTypeMap semantics:
    * dim-driven → fact right-outer-joins the dim (all dim rows kept);
    * fact-driven with a filter on a dim attribute → inner;
    * fact-driven otherwise → left outer. */
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
      joinDims: Seq[String],         // dims (in join order) that must be joined
      joinKind: JoinKind,
      isDimDriven: Boolean) {
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
    for {
      cube <- registry.cube(req.cube)
      model <- resolve(req, cube)
    } yield model

  private def resolve(req: ReportingRequest, cube: CubeDef): Either[String, Model] = {
    // alias → kind over the union of variant dim cols, dim attrs, metrics
    val factDimAliases = cube.variants.flatMap(_.dimCols).map(_.alias).toSet
    val metricAliases = cube.variants.flatMap(_.metrics).map(_.alias).toSet
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
        val filterErrs = req.filters.flatMap { f =>
          kindOf(f.field) match {
            case Left(e) => Some(e)
            case Right(Resolved(_, MetricCol)) => None // HAVING: always legal
            case Right(_) =>
              val pc = pubColOf(f.field)
              if (pc.allowedOps.contains(opOf(f))) None
              else Some(s"operator ${opOf(f)} not allowed on '${f.field}'")
          }
        }
        if (filterErrs.nonEmpty) Left(filterErrs.mkString("; "))
        else {
          val (metricFs, dimFs) = req.filters.partition(f =>
            metricAliases(f.field))
          // sorts must reference selected fields
          val badSort = req.sortBy.find(s => !req.selectFields.contains(s.field))
          val badHaving = metricFs.find(f => !req.selectFields.contains(f.field))
          (badSort, badHaving) match {
            case (Some(s), _) => Left(s"sortBy field '${s.field}' not in selectFields")
            case (_, Some(f)) => Left(s"metric filter on unselected field '${f.field}'")
            case _ =>
              // dims needed: selected dim attrs + dim-attr filters, plus parents
              val directDims = (selects.collect { case Resolved(_, DimAttrCol(d)) => d } ++
                dimFs.flatMap(f => dimAttr.get(f.field))).distinct
              val withParents = expandParents(cube, directDims)
              val hasDimAttrFilter = dimFs.exists(f => dimAttr.contains(f.field))
              val joinKind =
                if (req.dimensionDriven) RightOuterJoin
                else if (hasDimAttrFilter) InnerJoin
                else LeftOuterJoin
              Right(Model(req, cube, selects, dimFs, metricFs,
                withParents, joinKind, req.dimensionDriven))
          }
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
