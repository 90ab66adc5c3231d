package graft.analyzer

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias => CAlias, And, Descending,
  EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull,
  LessThan, LessThanOrEqual, Like, Literal, Not, Or, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical._
import graft.analyzer.request._
import graft.semantic.model.Registry
import graft.planner.Planner

/** SQL front door over the CUBE REGISTRY — the Spark-native analogue
  * of maha's Calcite layer (reference
  * service/.../calcite/MahaCalciteSqlParser.scala:21-330: SQL SELECT on
  * a cube → ReportingRequest → the same analyze/plan path as JSON).
  *
  * Catalyst's own parser produces the unresolved logical plan; this
  * walks the restricted grammar
  *
  * {{{
  * SELECT <alias>[, ...] FROM <cube>
  *   [WHERE <pred> [AND <pred>]...]         -- =, <>, >, <, BETWEEN,
  *                                          -- IN, NOT IN, LIKE,
  *                                          -- IS [NOT] NULL, OR-trees
  *   [ORDER BY <alias> [ASC|DESC], ...]
  *   [LIMIT n]
  * }}}
  *
  * and emits a ReportingRequest. Aggregation is implicit (the semantic
  * layer decides grouping from the selected aliases), exactly as in
  * the reference's SQL surface. Explicit GROUP BY / joins / subqueries
  * are rejected: cubes are the join/aggregation abstraction.
  */
object SqlFrontDoor {

  def toRequest(spark: SparkSession, sql: String): Either[String, ReportingRequest] =
    try walk(GraftBridge.parseSql(spark, sql))
    catch { case e: Exception => Left(s"unparseable SQL: ${e.getMessage}") }

  def run(sql: String, reg: Registry)(spark: SparkSession, dir: String): DataFrame =
    (for {
      req <- toRequest(spark, sql)
      m <- RequestModel.from(req, reg)
      p <- Planner.plan(m, spark, dir)
    } yield p.df).fold(e => throw new IllegalArgumentException(e), identity)

  private def walk(plan: LogicalPlan): Either[String, ReportingRequest] = {
    var limit = -1
    var sorts = Seq.empty[SortBy]
    var node = plan
    node match {
      case GlobalLimit(IntegerLiteral(n), LocalLimit(_, child)) =>
        limit = n; node = child
      case _ =>
    }
    node match {
      case Sort(order, true, child, _) =>
        val sbE = order.map {
          case SortOrder(a: UnresolvedAttribute, dir, _, _) =>
            Right(SortBy(a.name, dir == Descending))
          case other => Left(s"unsupported ORDER BY expression: ${other.sql}")
        }
        sbE.collectFirst { case Left(e) => return Left(e) }
        sorts = sbE.collect { case Right(s) => s }
        node = child
      case _ =>
    }
    node match {
      case Project(projs, child) =>
        val fieldsE = projs.map {
          case a: UnresolvedAttribute => Right(a.name)
          case CAlias(a: UnresolvedAttribute, name) if name == a.name => Right(a.name)
          case other => Left(s"only plain cube aliases can be selected " +
            s"(aggregation is implicit), got: ${other.sql}")
        }
        fieldsE.collectFirst { case Left(e) => return Left(e) }
        val fields = fieldsE.collect { case Right(f) => f }
        val (filtersE, rel) = child match {
          case Filter(cond, r) => (translateTop(cond), r)
          case r => (Right(Nil), r)
        }
        filtersE.flatMap { filters =>
          rel match {
            case r: UnresolvedRelation =>
              Right(ReportingRequest(r.multipartIdentifier.mkString("."),
                fields, filters, sorts, 0, limit, dimensionDriven = false))
            case other => Left(s"FROM must name a registered cube, got: $other")
          }
        }
      case other => Left(s"unsupported query shape at: ${other.nodeName} " +
        "(expected SELECT aliases FROM cube [WHERE] [ORDER BY] [LIMIT])")
    }
  }

  /** Top-level AND splits into separate request filters; >=/<= pairs on
    * the same field merge into Between (the parser lowers BETWEEN to
    * exactly that pair). */
  private def translateTop(cond: Expression): Either[String, Seq[QFilter]] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val parts = conjuncts(cond)
    val (geq, rest0) = parts.partition {
      case GreaterThanOrEqual(_: UnresolvedAttribute, Literal(_, _)) => true
      case _ => false
    }
    val (leq, rest) = rest0.partition {
      case LessThanOrEqual(_: UnresolvedAttribute, Literal(_, _)) => true
      case _ => false
    }
    val geqBy = geq.map { case GreaterThanOrEqual(a: UnresolvedAttribute, l: Literal) =>
      a.name -> litStr(l) }.toMap
    val leqBy = leq.map { case LessThanOrEqual(a: UnresolvedAttribute, l: Literal) =>
      a.name -> litStr(l) }.toMap
    val unmatched = (geqBy.keySet diff leqBy.keySet) ++ (leqBy.keySet diff geqBy.keySet)
    if (unmatched.nonEmpty)
      return Left(s"range on ${unmatched.mkString(", ")} must be a full BETWEEN")
    val betweens = geqBy.keys.toSeq.sorted.map(f =>
      BetweenFilter(f, geqBy(f), leqBy(f)): QFilter)
    val restE = rest.map(translate)
    restE.collectFirst { case Left(e) => Left(e) }
      .getOrElse(Right(betweens ++ restE.collect { case Right(f) => f }))
  }

  private def translate(e: Expression): Either[String, QFilter] = e match {
    // Spark's parser keeps BETWEEN as an unresolved function call
    case f: UnresolvedFunction
        if f.nameParts.map(_.toLowerCase) == Seq("between") =>
      f.arguments match {
        case Seq(a: UnresolvedAttribute, lo: Literal, hi: Literal) =>
          Right(BetweenFilter(a.name, litStr(lo), litStr(hi)))
        case _ => Left(s"unsupported BETWEEN shape: ${e.sql}")
      }
    case EqualTo(a: UnresolvedAttribute, l: Literal) => Right(EqFilter(a.name, litStr(l)))
    case Not(EqualTo(a: UnresolvedAttribute, l: Literal)) => Right(NeqFilter(a.name, litStr(l)))
    case GreaterThan(a: UnresolvedAttribute, l: Literal) => Right(GtFilter(a.name, litStr(l)))
    case LessThan(a: UnresolvedAttribute, l: Literal) => Right(LtFilter(a.name, litStr(l)))
    case In(a: UnresolvedAttribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      Right(InFilter(a.name, vs.map(v => litStr(v.asInstanceOf[Literal]))))
    case Not(In(a: UnresolvedAttribute, vs)) if vs.forall(_.isInstanceOf[Literal]) =>
      Right(NotInFilter(a.name, vs.map(v => litStr(v.asInstanceOf[Literal]))))
    case Like(a: UnresolvedAttribute, l: Literal, _) => Right(LikeFilter(a.name, litStr(l)))
    case Not(Like(a: UnresolvedAttribute, l: Literal, _)) => Right(NotLikeFilter(a.name, litStr(l)))
    case IsNull(a: UnresolvedAttribute) => Right(IsNullFilter(a.name))
    case IsNotNull(a: UnresolvedAttribute) => Right(IsNotNullFilter(a.name))
    case Or(l, r) =>
      for { lf <- translate(l); rf <- translate(r) } yield OrFilter(Seq(lf, rf))
    case And(l, r) =>
      for { lf <- translate(l); rf <- translate(r) } yield AndFilter(Seq(lf, rf))
    case other => Left(s"unsupported WHERE predicate: ${other.sql}")
  }

  private def litStr(l: Literal): String = l.value match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case null => ""
    case v => v.toString
  }

  private object IntegerLiteral {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case _ => None
    }
  }
}
