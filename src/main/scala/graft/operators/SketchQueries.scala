package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Sketch-based distinct aggregation (DruidThetaSketchRollup /
  * DruidHyperUniqueRollup analogues, reference
  * RollupExpression.scala:83-93), using Spark 4.1's native DataSketches
  * theta/HLL aggregates — mergeable across partitions, so map-side
  * partials shuffle only kilobyte compact sketches.
  *
  * Theta sketches are exact below their nominal capacity (2^lgK
  * uniques); the test scale factors stay below lgK=14's 16384-entry
  * capacity, so sk01/sk02 are oracle-checked against exact COUNT
  * DISTINCT. At 100 TB the same plans degrade gracefully to ~1.6%
  * relative error while shuffling only kilobyte compact sketches.
  */
object SketchQueries {

  /** Per-priority distinct customers via theta sketch (exact at test
    * scale), alongside the raw count. */
  def sk01(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        theta_sketch_estimate(theta_sketch_agg(col("o_custkey"), 14)).cast("bigint")
          .as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** Retained customers: sketch per (priority, year), then sketch
    * INTERSECTION across years per priority — the set operation that
    * motivates theta over HLL. */
  def sk02(s: SparkSession, d: String): DataFrame = {
    val byYear = orders(s, d)
      .filter(col("o_orderdate") >= lit("1995-01-01")
        && col("o_orderdate") < lit("1997-01-01"))
      .withColumn("yr", year(col("o_orderdate")))
      .groupBy("o_orderpriority", "yr")
      .agg(theta_sketch_agg(col("o_custkey"), 14).as("sk"))
    byYear.groupBy("o_orderpriority")
      .agg(theta_sketch_estimate(theta_intersection_agg(col("sk"))).cast("bigint")
        .as("n_retained"))
      .filter(col("n_retained") > 0)
      .orderBy("o_orderpriority")
  }

  /** Mergeable-sketch pipeline with Spark's native HLL: per-month HLL
    * sketches unioned to quarters. The estimates are approximate but
    * DETERMINISTIC for a fixed input and the pinned engine (Spark
    * 4.1.2 DataSketches), so the oracle is a GOLDEN REGRESSION PIN of
    * the sf0.01 output — the driver's correctness scale; checking at
    * any other scale (or after a sketch-config / engine change) must
    * expect and refresh the pin. Exact-below-capacity sketch behavior
    * is scale-independently oracle-checked via sk01/sk02/sk04. */
  def sk03(s: SparkSession, d: String): DataFrame = {
    val monthly = orders(s, d)
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
        .as("month"),
        date_format(date_trunc("quarter", col("o_orderdate")), "yyyy-MM-dd")
          .as("quarter"))
      .agg(hll_sketch_agg(col("o_custkey")).as("hll"))
    monthly.groupBy("quarter")
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("approx_customers"),
        count(lit(1)).as("n_months"))
      .orderBy("quarter")
  }

  /** Churned customers: theta A-NOT-B set difference across years per
    * priority (ThetaSketchSetOp NOT analogue, reference
    * DerivedExpression.scala:1384) — exact below sketch capacity. */
  def sk04(s: SparkSession, d: String): DataFrame = {
    // one pass: both years' sketches as filtered aggregates (nulls are
    // skipped by the sketch), so a priority active only in 1995 still
    // appears (its 1996 sketch is empty) and the fact is scanned once
    val yr = year(col("o_orderdate"))
    orders(s, d)
      .filter(col("o_orderdate") >= lit("1995-01-01")
        && col("o_orderdate") < lit("1997-01-01"))
      .groupBy("o_orderpriority")
      .agg(
        theta_sketch_agg(when(yr === 1995, col("o_custkey")), 14).as("sk95"),
        theta_sketch_agg(when(yr === 1996, col("o_custkey")), 14).as("sk96"))
      .select(col("o_orderpriority"),
        theta_sketch_estimate(theta_difference(col("sk95"), col("sk96")))
          .cast("bigint").as("n_churned"))
      .filter(col("n_churned") > 0)
      .orderBy("o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk01_theta_distinct" -> (sk01 _),
    "sk02_theta_intersection" -> (sk02 _),
    "sk03_hll_union" -> (sk03 _),
    "sk04_theta_difference" -> (sk04 _),
  )

  val oracle: Map[String, String] = Map(
    // GOLDEN REGRESSION PIN: the HLL estimates are a deterministic
    // function of the input and the engine's pinned sketch
    // implementation (Spark 4.1.2 DataSketches) — the sf0.01 output is
    // a fixed fact, so any drift in sketch config, union or
    // estimation fails the hash. (Exact-below-capacity behavior is
    // separately oracle-checked via the theta family sk01/sk02/sk04.)
    "sk03_hll_union" ->
      """SELECT * FROM (VALUES
        | ('1995-01-01', CAST(465 AS BIGINT), CAST(3 AS BIGINT)),
        | ('1995-04-01', 454, 3),
        | ('1995-07-01', 502, 3),
        | ('1995-10-01', 480, 3),
        | ('1996-01-01', 473, 3),
        | ('1996-04-01', 439, 3),
        | ('1996-07-01', 502, 3),
        | ('1996-10-01', 464, 3),
        | ('1997-01-01', 465, 3),
        | ('1997-04-01', 488, 3),
        | ('1997-07-01', 474, 3),
        | ('1997-10-01', 463, 3),
        | ('1998-01-01', 451, 3),
        | ('1998-04-01', 457, 3),
        | ('1998-07-01', 449, 3),
        | ('1998-10-01', 488, 3),
        | ('1999-01-01', 495, 3),
        | ('1999-04-01', 447, 3),
        | ('1999-07-01', 478, 3),
        | ('1999-10-01', 496, 3),
        | ('2000-01-01', 488, 3),
        | ('2000-04-01', 485, 3),
        | ('2000-07-01', 461, 3),
        | ('2000-10-01', 505, 3),
        | ('2001-01-01', 457, 3),
        | ('2001-04-01', 459, 3),
        | ('2001-07-01', 190, 2)
        |) AS t(quarter, approx_customers, n_months)
        |ORDER BY quarter""".stripMargin,
    "sk01_theta_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers,
        | COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "sk04_theta_difference" ->
      """SELECT o_orderpriority, COUNT(*) AS n_churned FROM (
        | SELECT DISTINCT o_orderpriority, o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        | EXCEPT
        | SELECT DISTINCT o_orderpriority, o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01') t
        |GROUP BY 1 HAVING COUNT(*) > 0 ORDER BY o_orderpriority""".stripMargin,
    "sk02_theta_intersection" ->
      """SELECT o_orderpriority, COUNT(*) AS n_retained FROM (
        | SELECT DISTINCT o_orderpriority, o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        | INTERSECT
        | SELECT DISTINCT o_orderpriority, o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01') t
        |GROUP BY 1 HAVING COUNT(*) > 0 ORDER BY o_orderpriority""".stripMargin,
  )
}
