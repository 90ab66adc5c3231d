package graft.semantic

import graft.semantic.model._

/** Registry/domain introspection (reference registry/Registry.scala:
  * 685-737 `domainJsonAsString` / `getCubeJsonAsStringForCube`, field
  * shape per getCubeJsonByName :422-459): a JSON description of every
  * cube — fields, kinds, data types, allowed filter operations, schema
  * restrictions, window/row caps — for UIs and API clients ("what
  * fields does this cube have?"), plus the flat field listing backing
  * the SQL front door's DESCRIBE. Pure config metadata: no Spark
  * session, no scans.
  */
object Domain {

  /** One public field of a cube, flattened across fact variants and
    * dimensions. `kind` is Dimension|Fact (reference "type"); `rollup`
    * is set for facts (Derived for post-result columns); `dimension`
    * names the owning snowflake dim for dim attributes (reference
    * "dimensionName"), None for fact-level columns. */
  final case class FieldDesc(
      field: String,
      kind: String,
      dataType: String,
      dimension: Option[String],
      filterOps: String,
      rollup: Option[String],
      restrictedTo: Option[String])

  def opToken(op: FilterOp): String = op match {
    case InOp => "IN";           case NotInOp => "NOT IN"
    case EqOp => "=";            case NeqOp => "<>"
    case BetweenOp => "BETWEEN"; case GtOp => ">"
    case LtOp => "<";            case LikeOp => "LIKE"
    case NotLikeOp => "NOT LIKE"
    case IsNullOp => "IS NULL";  case IsNotNullOp => "IS NOT NULL"
  }

  private def opsOf(ops: Set[FilterOp]): String =
    ops.map(opToken).toSeq.sorted.mkString(",")

  /** The HAVING vocabulary advertised for metrics. */
  private val MetricOps = opsOf(Set(EqOp, GtOp, LtOp))

  private def dataTypeOf(pc: PubCol): String =
    if (pc.constVal.isDefined) "Const"
    else pc.staticMapping match {
      case Some(sm) => if (sm.numericKeys) "Enum(Int)" else "Enum"
      case None => pc.grain match {
        case Some(DayGrain) => "Date"
        case Some(_) => "Timestamp"
        case None => "String"
      }
    }

  private def dimColDesc(pc: PubCol, dim: Option[String]): FieldDesc =
    // effectiveOps, not allowedOps: a passthrough column rejects every
    // filter at request-model time, and the introspection contract must
    // advertise what the analyzer will actually accept
    FieldDesc(pc.alias, "Dimension", dataTypeOf(pc), dim,
      opsOf(pc.effectiveOps), None, pc.restrictedTo.map(_.toSeq.sorted.mkString(",")))

  private val rollupName: Rollup => String = {
    case SumRollup => "Sum";   case MinRollup => "Min"
    case MaxRollup => "Max";   case AvgRollup => "Avg"
    case CountRollup => "Count"
    case CountDistinctRollup => "CountDistinct"
  }

  /** Flat public field list of a cube: fact-level dim columns and
    * metrics unioned across variants (first declaration wins), then
    * snowflake dim attributes. Sorted by field name. */
  def fields(cube: CubeDef): Seq[FieldDesc] = {
    // hiddenFromJson columns stay requestable but are not advertised
    // (reference PublicColumn.hiddenFromJson, Column.scala:20)
    val factLevel = cube.variants.flatMap(_.dimCols)
      .filterNot(_.hiddenFromJson).map(pc => pc.alias -> pc)
    val metrics = cube.variants.flatMap(_.metrics).map(m => m.alias ->
      FieldDesc(m.alias, "Fact", "Number", None, MetricOps,
        Some(rollupName(m.rollup)), None))
    val derived = cube.variants.flatMap(_.derived).map(d => d.alias ->
      FieldDesc(d.alias, "Fact", "Number", None, MetricOps, Some("Derived"), None))
    val dimAttrs = cube.dims.flatMap(d =>
      d.cols.filterNot(_.hiddenFromJson)
        .map(pc => pc.alias -> dimColDesc(pc, Some(d.name))))
    val all = factLevel.map { case (a, pc) => a -> dimColDesc(pc, None) } ++
      metrics ++ derived ++ dimAttrs
    all.foldLeft(Vector.empty[(String, FieldDesc)]) {
      case (acc, kv) if acc.exists(_._1 == kv._1) => acc
      case (acc, kv) => acc :+ kv
    }.map(_._2).sortBy(_.field)
  }

  // --- JSON rendering (hand-rolled; no external dependencies) ---

  private[graft] def jStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jOpt(o: Option[String]): String = o.fold("null")(jStr)

  private def jArr(vs: Seq[String]): String = vs.map(jStr).mkString("[", ",", "]")

  private def fieldJson(f: FieldDesc): String = {
    // empty op set (passthrough columns): filterable:false with [] —
    // "".split(",") is Array(""), which would render as [""]
    val ops = f.filterOps.split(",").toSeq.filter(_.nonEmpty)
    s"""{"field":${jStr(f.field)},"type":${jStr(f.kind)},""" +
      s""""dataType":${jStr(f.dataType)},"dimensionName":${jOpt(f.dimension)},""" +
      s""""filterable":${ops.nonEmpty},"filterOperations":${jArr(ops)},""" +
      s""""rollup":${jOpt(f.rollup)},"allowedSchemas":${
        f.restrictedTo.fold("null")(r => jArr(r.split(",").toSeq))}}"""
  }

  /** Single-cube JSON (getCubeJsonAsStringForCube analogue).
    * `fresh` (when provided — see [[Freshness]]) adds the per-table
    * "data as of" block the reference's IngestionTimeUpdater surfaces
    * next to the domain. */
  def cubeJson(cube: CubeDef,
      fresh: Seq[Freshness.TableFreshness] = Nil): String = {
    def jNum(o: Option[Int]) = o.fold("null")(_.toString)
    val freshJson =
      if (fresh.isEmpty) "null"
      else fresh.map(t =>
        s"""{"table":${jStr(t.table)},"dataAsOf":${jStr(t.asOf)},""" +
          s""""source":${jStr(t.source)}}""").mkString("[", ",", "]")
    s"""{"name":${jStr(cube.name)},""" +
      s""""variants":${jArr(cube.variants.map(_.name))},""" +
      s""""maxDaysWindow":${jNum(cube.maxDaysWindow)},""" +
      s""""maxRowsSync":${jNum(cube.maxRowsSync)},""" +
      s""""maxRowsAsync":${jNum(cube.maxRowsAsync)},""" +
      s""""dataAsOf":$freshJson,""" +
      s""""fields":[${fields(cube).map(fieldJson).mkString(",")}]}"""
  }

  /** Whole-registry domain JSON (domainJsonAsString analogue):
    * dimensions with their field lists, then cubes — each carrying its
    * freshness block when a freshness map is supplied. */
  def domainJson(reg: Registry,
      freshness: Map[String, Seq[Freshness.TableFreshness]] = Map.empty): String = {
    val cubes = reg.cubes.values.toSeq.sortBy(_.name)
    val dims = cubes.flatMap(_.dims).groupBy(_.name).toSeq.sortBy(_._1).map {
      case (name, ds) =>
        s"""{"name":${jStr(name)},"fields":${
          jArr(ds.flatMap(_.cols.map(_.alias)).distinct.sorted)}}"""
    }
    s"""{"dimensions":[${dims.mkString(",")}],""" +
      s""""cubes":[${cubes.map(c =>
        cubeJson(c, freshness.getOrElse(c.name, Nil))).mkString(",")}]}"""
  }
}
