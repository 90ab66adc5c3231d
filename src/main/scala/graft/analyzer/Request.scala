package graft.analyzer

import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON reporting request — the Spark-native analogue of maha's
  * ReportingRequest grammar (reference request/ReportingRequest.scala:
  * 54-74, deserializers :101-141). Example:
  *
  * {{{
  * {"cube": "order_stats",
  *  "selectFields": [{"field": "Order Priority"}, {"field": "Total Spend"}],
  *  "filterExpressions": [
  *    {"field": "Order Date", "operator": "between",
  *     "from": "1995-01-01", "to": "1996-12-31"},
  *    {"field": "Order Status", "operator": "in", "values": ["Open"]}],
  *  "sortBy": [{"field": "Total Spend", "order": "Desc"}],
  *  "paginationStartIndex": 0, "rowsPerPage": 100,
  *  "dimensionDriven": false}
  * }}}
  */
object request {

  sealed trait QFilter { def field: String }
  final case class InFilter(field: String, values: Seq[String]) extends QFilter
  final case class NotInFilter(field: String, values: Seq[String]) extends QFilter
  final case class EqFilter(field: String, value: String) extends QFilter
  final case class NeqFilter(field: String, value: String) extends QFilter
  final case class BetweenFilter(field: String, from: String, to: String) extends QFilter
  final case class GtFilter(field: String, value: String) extends QFilter
  final case class LtFilter(field: String, value: String) extends QFilter
  final case class LikeFilter(field: String, value: String) extends QFilter
  final case class NotLikeFilter(field: String, value: String) extends QFilter
  final case class IsNullFilter(field: String) extends QFilter
  final case class IsNotNullFilter(field: String) extends QFilter
  /** Boolean filter trees (reference OrFilter/AndFilter,
    * FilterOperation.scala:355-368). `field` routes the tree: all
    * leaves must live on the same side (validated at analysis). */
  final case class OrFilter(filters: Seq[QFilter]) extends QFilter {
    def field: String = filters.head.field
  }
  final case class AndFilter(filters: Seq[QFilter]) extends QFilter {
    def field: String = filters.head.field
  }
  /** Applied on the final (joined, aggregated, rendered) result rather
    * than pushed into a scan (reference OuterFilter,
    * FilterOperation.scala:141). */
  final case class OuterFilter(inner: QFilter) extends QFilter {
    def field: String = inner.field
  }

  final case class SortBy(field: String, descending: Boolean)

  /** All leaf predicates of a filter tree. */
  def leaves(f: QFilter): Seq[QFilter] = f match {
    case OrFilter(fs)   => fs.flatMap(leaves)
    case AndFilter(fs)  => fs.flatMap(leaves)
    case OuterFilter(i) => leaves(i)
    case leaf           => Seq(leaf)
  }

  /** Flatten top-level AND nesting: the CONJUNCTIVE leaves (an
    * OR-nested leaf is not conjunctive and is not returned). */
  def conjunctive(f: QFilter): Seq[QFilter] = f match {
    case AndFilter(fs) => fs.flatMap(conjunctive)
    case leaf          => Seq(leaf)
  }

  /** Replace leaves matched by `pf` anywhere in the tree, preserving
    * the boolean structure. */
  def transformLeaves(f: QFilter)(pf: PartialFunction[QFilter, QFilter]): QFilter =
    f match {
      case AndFilter(fs)  => AndFilter(fs.map(transformLeaves(_)(pf)))
      case OrFilter(fs)   => OrFilter(fs.map(transformLeaves(_)(pf)))
      case OuterFilter(i) => OuterFilter(transformLeaves(i)(pf))
      case leaf           => pf.applyOrElse(leaf, identity[QFilter])
    }

  final case class ReportingRequest(
      cube: String,
      selectFields: Seq[String],
      filters: Seq[QFilter],
      sortBy: Seq[SortBy],
      paginationStartIndex: Int,
      rowsPerPage: Int,
      dimensionDriven: Boolean,
      timezone: Option[String] = None,
      schema: Option[String] = None,
      /** Async (job-queue / curator-internal) requests are exempt from
        * the sync pagination requirement and capped by maxRowsAsync
        * instead of maxRowsSync (reference SyncRequest/AsyncRequest,
        * ReportingRequest.scala:54-74; sync 5,000 vs async 100,000 row
        * caps, DruidQueryGenerator.scala:159-166). */
      async: Boolean = false,
      /** Evaluation date (yyyy-MM-dd) for lookback validation —
        * "today" unless pinned (replays, tests). The reference's
        * DailyGrain.getDaysFromNow measures against the wall clock. */
      asOfDate: Option[String] = None)

  /** Parse + structural validation. Unknown operators and malformed
    * fields are errors, mirroring maha's strict deserialization. */
  def parse(json: String): Either[String, ReportingRequest] = {
    def str(v: JValue, what: String): Either[String, String] = v match {
      case JString(s) => Right(s)
      case JNothing   => Left(s"missing $what")
      case other      => Left(s"$what must be a string, got $other")
    }
    try {
      val root = JsonMethods.parse(json)
      for {
        cube <- str(root \ "cube", "cube")
        fields <- (root \ "selectFields") match {
          case JArray(arr) if arr.nonEmpty =>
            val fs = arr.map(f => str(f \ "field", "selectFields[].field"))
            fs.collectFirst { case Left(e) => Left(e) }
              .getOrElse(Right(fs.collect { case Right(s) => s }))
          case _ => Left("selectFields must be a non-empty array")
        }
        filters <- (root \ "filterExpressions") match {
          case JArray(arr) =>
            val fs = arr.map(parseFilterTree)
            fs.collectFirst { case Left(e) => Left(e) }
              .getOrElse(Right(fs.collect { case Right(f) => f }))
          case JNothing => Right(Nil)
          case _        => Left("filterExpressions must be an array")
        }
        sorts <- (root \ "sortBy") match {
          case JArray(arr) =>
            val ss = arr.map { s =>
              for {
                f <- str(s \ "field", "sortBy[].field")
                o <- str(s \ "order", "sortBy[].order")
                d <- o.toLowerCase match {
                  case "asc" => Right(false); case "desc" => Right(true)
                  case other => Left(s"sortBy[].order must be Asc|Desc, got '$other'")
                }
              } yield SortBy(f, d)
            }
            ss.collectFirst { case Left(e) => Left(e) }
              .getOrElse(Right(ss.collect { case Right(s) => s }))
          case JNothing => Right(Nil)
          case _        => Left("sortBy must be an array")
        }
      } yield {
        val start = (root \ "paginationStartIndex") match {
          case JInt(i) => i.toInt; case _ => 0
        }
        val rows = (root \ "rowsPerPage") match {
          case JInt(i) => i.toInt; case _ => -1
        }
        val dimDriven = (root \ "dimensionDriven") match {
          case JBool(b) => b; case _ => false
        }
        val tz = (root \ "timezone") match {
          case JString(z) => Some(z); case _ => None
        }
        val schema = (root \ "schema") match {
          case JString(z) => Some(z); case _ => None
        }
        val async = (root \ "requestType") match {
          case JString(t) => t.equalsIgnoreCase("async"); case _ => false
        }
        val asOf = (root \ "asOfDate") match {
          case JString(dd) => Some(dd); case _ => None
        }
        ReportingRequest(cube, fields, filters, sorts, start, rows, dimDriven,
          tz, schema, async, asOf)
      }
    } catch {
      case e: Exception => Left(s"malformed request json: ${e.getMessage}")
    }
  }

  private def parseFilter(v: JValue): Either[String, QFilter] = {
    def s(path: String): Either[String, String] = (v \ path) match {
      case JString(x) => Right(x)
      case _          => Left(s"filter missing '$path'")
    }
    def vals: Either[String, Seq[String]] = (v \ "values") match {
      case JArray(a) if a.nonEmpty && a.forall(_.isInstanceOf[JString]) =>
        Right(a.collect { case JString(x) => x })
      case _ => Left("filter missing non-empty string 'values'")
    }
    for {
      field <- s("field")
      op <- s("operator")
      f <- op.toLowerCase match {
        case "in"          => vals.map(InFilter(field, _))
        case "not in"      => vals.map(NotInFilter(field, _))
        case "=" | "equals" => s("value").map(EqFilter(field, _))
        case "<>" | "not equal to" => s("value").map(NeqFilter(field, _))
        case "between" => for { a <- s("from"); b <- s("to") } yield BetweenFilter(field, a, b)
        case ">"  => s("value").map(GtFilter(field, _))
        case "<"  => s("value").map(LtFilter(field, _))
        case "like"     => s("value").map(LikeFilter(field, _))
        case "not like" => s("value").map(NotLikeFilter(field, _))
        case "isnull" | "is null"        => Right(IsNullFilter(field))
        case "isnotnull" | "is not null" => Right(IsNotNullFilter(field))
        case other => Left(s"unknown filter operator '$other'")
      }
    } yield f
  }

  private def children(v: JValue): Either[String, Seq[QFilter]] =
    (v \ "filterExpressions") match {
      case JArray(arr) if arr.size >= 2 =>
        val fs = arr.map(parseFilterTree)
        fs.collectFirst { case Left(e) => Left(e) }
          .getOrElse(Right(fs.collect { case Right(f) => f }))
      case _ => Left("or/and filter requires 'filterExpressions' with >= 2 entries")
    }

  /** Recursive filter grammar: leaves plus or / and / outer nodes. */
  def parseFilterTree(v: JValue): Either[String, QFilter] =
    (v \ "operator") match {
      case JString(op) if op.equalsIgnoreCase("or") => children(v).map(OrFilter(_))
      case JString(op) if op.equalsIgnoreCase("and") => children(v).map(AndFilter(_))
      case JString(op) if op.equalsIgnoreCase("outer") =>
        (v \ "filter") match {
          case JNothing => Left("outer filter requires a nested 'filter'")
          case inner    => parseFilterTree(inner).map(OuterFilter(_))
        }
      case _ => parseFilter(v)
    }
}
