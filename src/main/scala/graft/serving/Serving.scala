package graft.serving

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Result serving: the thin serialization layer over a finished plan —
  * the Spark-native analogue of the reference's RowList family
  * (JsonRowList, reference report/JsonRowList.scala; CSVRowList,
  * RowList.scala:707) and ResultSetTransformer (:55 DateTransformer,
  * :83 NumberTransformer).
  *
  * Serving always operates on a bounded page (the engine paginates
  * before serving — maha maxRows guards, SURVEY §2.6), so a driver-side
  * iteration over the page is correct; the unbounded path is
  * `df.write` (distributed sink), never collect.
  */
object Serving {

  /** JSON API envelope for one result page:
    * {"fields":[{"fieldName":…,"fieldType":…}],"rows":[[…]],"rowCount":n}
    * — the JsonRowList wire shape: rows are POSITIONAL arrays aligned
    * with the fields list, nulls emitted explicitly (df.toJSON would
    * drop null-valued keys and emit objects, breaking positional
    * consumers). Streams the page through toLocalIterator. */
  def jsonEnvelope(page: DataFrame): String = {
    val fields = page.schema.fields.map { f =>
      s"""{"fieldName":${q(f.name)},"fieldType":${q(typeName(f.dataType))}}"""
    }.mkString("[", ",", "]")
    val width = page.schema.length
    val rows = new StringBuilder("[")
    var n = 0L
    val it = page.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      if (n > 0) rows.append(',')
      rows.append('[')
      var i = 0
      while (i < width) {
        if (i > 0) rows.append(',')
        rows.append(jsonVal(row.get(i)))
        i += 1
      }
      rows.append(']')
      n += 1
    }
    rows.append(']')
    s"""{"fields":$fields,"rows":${rows.result()},"rowCount":$n}"""
  }

  private def jsonVal(v: Any): String = v match {
    case null => "null"
    case s: String => q(s)
    case b: Boolean => b.toString
    case d: Double =>
      if (d.isNaN || d.isInfinite) q(d.toString) else d.toString
    case f: Float =>
      if (f.isNaN || f.isInfinite) q(f.toString) else f.toString
    case n @ (_: Long | _: Int | _: Short | _: Byte) => n.toString
    case bd: java.math.BigDecimal => bd.toPlainString
    case other => q(other.toString) // timestamps, dates, binary, …
  }

  private def typeName(dt: DataType): String = dt match {
    case _: StringType => "STR"
    case _: LongType | _: IntegerType | _: ShortType => "NUMBER"
    case _: DoubleType | _: FloatType | _: DecimalType => "NUMBER"
    case _: DateType | _: TimestampType => "DATE"
    case _: BooleanType => "BOOL"
    case other => other.simpleString.toUpperCase
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** CSV sink (CSVRowList analogue): distributed write with header. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** JSON-lines sink for async/large results. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** DateTransformer analogue: render date/timestamp columns at the
    * requested grain (reference ResultSetTransformer.scala:55). */
  def dateTransform(c: Column, grain: String): Column = grain match {
    case "day"   => date_format(c, "yyyy-MM-dd")
    case "hour"  => date_format(c, "yyyy-MM-dd HH:00")
    case "month" => date_format(c, "yyyy-MM")
    case other   => throw new IllegalArgumentException(s"unknown grain '$other'")
  }

  /** NumberTransformer analogue: fixed-scale decimal rendering
    * (reference ResultSetTransformer.scala:83). */
  def scaleTransform(c: Column, scale: Int): Column =
    c.cast(DecimalType(38, scale))
}
