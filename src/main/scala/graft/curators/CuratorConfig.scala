package graft.curators

import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.analyzer.request
import graft.analyzer.request.{QFilter, SortBy}

/** Curator JSON configs — the reference's per-curator config grammar
  * (service/.../curators/TimeShiftCurator.scala:23-47,
  * DrilldownConfig.scala:35-120) parsed into plain case classes with
  * the same field names and defaults, so a maha user's curator config
  * blocks work unchanged.
  */

/** "timeshift" config: optional result ordering plus an extra backward
  * day offset for the comparison window (reference
  * TimeShiftCurator.scala:47 `TimeShiftConfig(sortBy, daysOffset)`;
  * the previous window is shifted by `1 + daysOffset` days before the
  * current one, TimeShiftCurator.scala:83-89). */
final case class TimeShiftConfig(sortBy: Option[SortBy] = None,
    daysOffset: Int = 0)

object TimeShiftConfig {

  /** Accepts the reference's JSON shape:
    * `{"sortBy": {"field": "...", "order": "Asc|Desc"}, "daysOffset": 7}`
    * — both fields optional. */
  def parse(json: String): Either[String, TimeShiftConfig] = try {
    val root = JsonMethods.parse(json)
    for {
      sort <- parseSortBy(root \ "sortBy")
      off <- (root \ "daysOffset") match {
        // non-negative only: a negative offset would invert the
        // comparison window (prev-from > prev-to) or align it over
        // FUTURE days, silently nulling every "* Prev" column
        case JInt(i) if i >= 0 => Right(i.toInt)
        case JInt(i)  => Left(s"daysOffset must be >= 0, got $i")
        case JNothing => Right(0)
        case other    => Left(s"daysOffset must be an int, got $other")
      }
    } yield TimeShiftConfig(sort, off)
  } catch {
    case e: Exception => Left(s"malformed timeshift config: ${e.getMessage}")
  }

  private[curators] def parseSortBy(v: JValue): Either[String, Option[SortBy]] =
    v match {
      case JNothing => Right(None)
      case o: JObject =>
        ((o \ "field"), (o \ "order")) match {
          case (JString(f), JString(ord))
              if ord.equalsIgnoreCase("asc") || ord.equalsIgnoreCase("desc") =>
            Right(Some(SortBy(f, ord.equalsIgnoreCase("desc"))))
          case _ => Left("sortBy must be {field, order: Asc|Desc}")
        }
      case other => Left(s"sortBy must be an object, got $other")
    }
}

/** One drilldown re-request (reference DrilldownRequest,
  * DrilldownConfig.scala:35-120) — JSON grammar and defaults match the
  * reference exactly: `"dimension"` (string) or `"dimensions"` (list),
  * `"mr"` (max rows, default 1000), `"enforceFilters"` (default true),
  * `"additiveFacts"` (default true), `"cube"` (empty = same cube),
  * `"ordering"`, `"facts"`, `"filters"`. */
final case class DrilldownRequest(
    dimensions: Seq[String],
    cube: String = "",
    enforceFilters: Boolean = true,
    ordering: Seq[SortBy] = Nil,
    maxRows: Int = 1000,
    facts: Seq[String] = Nil,
    additiveFacts: Boolean = true,
    filters: Seq[QFilter] = Nil)

object DrilldownConfig {

  /** A config is one request object or an array of them (reference
    * DrilldownConfig.parse handles JObject | JArray). */
  def parse(json: String): Either[String, Seq[DrilldownRequest]] = try {
    JsonMethods.parse(json) match {
      case JArray(arr) =>
        val parsed = arr.map(parseOne)
        parsed.collectFirst { case Left(e) => Left(e) }
          .getOrElse(Right(parsed.collect { case Right(r) => r }))
      case o: JObject => parseOne(o).map(Seq(_))
      case other => Left(s"drilldown config must be an object or array, got $other")
    }
  } catch {
    case e: Exception => Left(s"malformed drilldown config: ${e.getMessage}")
  }

  private def parseOne(v: JValue): Either[String, DrilldownRequest] = {
    def strings(j: JValue, what: String): Either[String, Seq[String]] = j match {
      case JArray(arr) =>
        val ss = arr.map {
          case JString(s) => Right(s)
          // the reference's Field objects: {"field": "..."}
          case o: JObject => (o \ "field") match {
            case JString(s) => Right(s)
            case _          => Left(s"$what[] object needs a field")
          }
          case other => Left(s"$what[] must be strings or {field}, got $other")
        }
        ss.collectFirst { case Left(e) => Left(e) }
          .getOrElse(Right(ss.collect { case Right(s) => s }))
      case JNothing => Right(Nil)
      case other    => Left(s"$what must be an array, got $other")
    }
    for {
      dims <- (v \ "dimensions") match {
        case JNothing => (v \ "dimension") match {
          case JString(s) => Right(Seq(s))
          case _ => Left("drilldown requires \"dimension\" or \"dimensions\"")
        }
        case arr => strings(arr, "dimensions").filterOrElse(_.nonEmpty,
          "drilldown \"dimensions\" must be non-empty")
      }
      cube <- (v \ "cube") match {
        case JString(c) => Right(c); case JNothing => Right("")
        case other      => Left(s"cube must be a string, got $other")
      }
      enforce <- (v \ "enforceFilters") match {
        case JBool(b) => Right(b); case JNothing => Right(true)
        case other    => Left(s"enforceFilters must be a boolean, got $other")
      }
      additive <- (v \ "additiveFacts") match {
        case JBool(b) => Right(b); case JNothing => Right(true)
        case other    => Left(s"additiveFacts must be a boolean, got $other")
      }
      mr <- (v \ "mr") match {
        case JInt(i) => Right(i.toInt); case JNothing => Right(1000)
        case other   => Left(s"mr must be an int, got $other")
      }
      ordering <- (v \ "ordering") match {
        case JArray(arr) =>
          val ss = arr.map(TimeShiftConfig.parseSortBy)
          ss.collectFirst { case Left(e) => Left(e) }
            .getOrElse(Right(ss.collect { case Right(Some(s)) => s }))
        case JNothing => Right(Nil)
        case other    => Left(s"ordering must be an array, got $other")
      }
      facts <- strings(v \ "facts", "facts")
      filters <- (v \ "filters") match {
        case JArray(arr) =>
          val fs = arr.map(request.parseFilterTree)
          fs.collectFirst { case Left(e) => Left(e) }
            .getOrElse(Right(fs.collect { case Right(f) => f }))
        case JNothing => Right(Nil)
        case other    => Left(s"filters must be an array, got $other")
      }
    } yield DrilldownRequest(dims, cube, enforce, ordering, mr, facts,
      additive, filters)
  }
}
