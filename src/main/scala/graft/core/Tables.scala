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
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
    * default; read nanos as long and floor-truncate to microseconds
    * (identical to DuckDB's ns→µs truncation). The truncation makes
    * time predicates opaque to scan pushdown, so the
    * [[graft.functions.MicrosTruncationPushdown]] rule (installed here;
    * also available via GraftExtensions) rewrites them back onto the
    * raw nanos column. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
    tbl(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
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
