package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** Parquet table loaders + numeric-determinism helpers.
  *
  * Determinism contract with the DuckDB oracle: every aggregated money
  * column is cast to an exact DECIMAL before SUM (decimal addition is
  * associative, so Spark's partial/final aggregation order cannot change
  * the result) and cast to DOUBLE only at the very end (a single exact
  * decimal → double conversion is identical across engines). Keep the
  * declared precisions small enough that products stay under DECIMAL(38)
  * in both Spark and DuckDB, so no intermediate rounding ever occurs.
  */
object Tables {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = tbl(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = tbl(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = tbl(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = tbl(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = tbl(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = tbl(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = tbl(s, d, "lineitem")

  /** Exact row count of a raw parquet table from its FOOTERS — one
    * driver-side metadata read per file, memoized per session, no
    * Spark job. The raw-table analogue of [[TxnTable.rowCount]]'s
    * manifest channel: it feeds cardinality-aware decisions
    * ([[graft.operators.KeyShip]]'s `keyRows`, CostModel fixedRows)
    * for tables that are plain directories rather than manifest
    * logs. */
  def tableRows(s: SparkSession, dir: String, name: String): Long =
    Caches.memoObj(s, s"tablerows|$dir|$name") {
      val f = new java.io.File(s"$dir/$name.parquet")
      val paths =
        if (f.isDirectory)
          f.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(_.getPath).toSeq
        else Seq(f.getPath)
      java.lang.Long.valueOf(
        Layout.multiStatsWithRows(s, paths, Nil).map(_._2).sum)
    }.longValue()
  /** events.ts arrives in either of two parquet encodings depending on
    * the data generation: TIMESTAMP(MICROS) (native Spark TimestampType
    * — nothing to do, time predicates push down as-is) or
    * TIMESTAMP(NANOS), which Spark 4 rejects by default; for the latter
    * read nanos as long and floor-truncate to microseconds (identical
    * to DuckDB's ns→µs truncation). The truncation makes time
    * predicates opaque to scan pushdown, so the
    * [[graft.functions.MicrosTruncationPushdown]] rule (installed here;
    * also available via GraftExtensions) rewrites them back onto the
    * raw nanos column. Both encodings yield the same µs TimestampType
    * `ts` column, so every consumer is encoding-agnostic. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = rawEvents(s, d)
    if (eventsTsIsNanosLong(raw)) {
      // synchronized: concurrent first use would otherwise race the
      // contains/append check and install the rule twice (harmless — the
      // rewrite is idempotent — but noisy); the narrow pattern keeps an
      // accidental double install inert for non-events queries too
      s.experimental.synchronized {
        if (!s.experimental.extraOptimizations.contains(
            graft.functions.MicrosTruncationPushdown))
          s.experimental.extraOptimizations =
            s.experimental.extraOptimizations :+ graft.functions.MicrosTruncationPushdown
      }
    }
    normalizeEventsTs(raw)
  }

  /** events.parquet exactly as the file decodes (nanos files → ts as
    * raw LONG under the nanosAsLong legacy flag; µs files → ts as
    * TimestampType). Naive (isAdjustedToUTC=false) µs columns must
    * decode as TimestampType, not TIMESTAMP_NTZ — NTZ is rejected by
    * streaming watermarks / unix_micros, and an NTZ→LTZ cast after the
    * scan would block predicate pushdown; disabling NTZ inference keeps
    * the instant semantics (raw µs since epoch, UTC session) AND the
    * pushdown at the scan. */
  def rawEvents(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    tbl(s, d, "events")
  }

  /** The raw (pre-normalization) file schema of events.parquet in `d`
    * — what `readStream.schema(...)` must declare. Footer-only read. */
  def eventsRawSchema(s: SparkSession, d: String)
      : org.apache.spark.sql.types.StructType = rawEvents(s, d).schema

  private def eventsTsIsNanosLong(df: DataFrame): Boolean =
    df.schema("ts").dataType == org.apache.spark.sql.types.LongType

  /** Normalize a raw events frame (batch or stream) so `tsCol` is a µs
    * TimestampType regardless of the file encoding: raw-nanos LONG →
    * `timestamp_micros(ts div 1000)` (integral div — a double division
    * would lose precision above 2^53 ns); TIMESTAMP_NTZ (a read that
    * bypassed [[rawEvents]]'s NTZ-inference toggle) → cast to
    * TimestampType (value-preserving under the UTC session timezone);
    * already-timestamp → as-is. */
  def normalizeEventsTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(tsCol,
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr(s"`$tsCol` div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol, org.apache.spark.sql.functions.col(tsCol)
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  def documents(s: SparkSession, d: String): DataFrame = tbl(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = tbl(s, d, "embeddings")

  /** Money-ish columns (price, quantity, acctbal): 2 decimal places. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Rate columns (discount, tax): small magnitude, 2 decimal places. */
  def rate(c: Column): Column = c.cast(DecimalType(8, 2))
  /** High-fidelity measure columns (events.value): 6 decimal places. */
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))
}
