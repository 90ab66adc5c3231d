package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Native theta sketch aggregate correctness: exactness below nominal
  * capacity, distributivity across partitions (serialize/merge path),
  * and set-operation semantics. */
class ThetaSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("theta estimate is exact below capacity and partition-invariant") {
    val o = Tables.orders(spark, sf)
    val exact = o.select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    // 13 partitions forces partial buffers + serialize/merge across tasks
    val est = o.repartition(13)
      .select(theta_sketch_estimate(theta_sketch_agg(col("o_custkey"), 14)))
      .collect()(0).getLong(0)
    assert(est == exact)
  }

  test("union of per-group sketches equals global distinct") {
    val o = Tables.orders(spark, sf)
    val exact = o.select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    val perPriority = o.groupBy("o_orderpriority")
      .agg(theta_sketch_agg(col("o_custkey"), 14).as("sk"))
    val unioned = perPriority
      .select(theta_sketch_estimate(theta_union_agg(col("sk"))))
      .collect()(0).getLong(0)
    assert(unioned == exact)
  }

  test("intersection matches exact set intersection") {
    val o = Tables.orders(spark, sf)
    val a = o.filter(col("o_orderstatus") === "O")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val b = o.filter(col("o_orderstatus") === "F")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val expected = (a & b).size
    val sketches = o.filter(col("o_orderstatus").isin("O", "F"))
      .groupBy("o_orderstatus")
      .agg(theta_sketch_agg(col("o_custkey"), 14).as("sk"))
    val est = sketches
      .select(theta_sketch_estimate(theta_intersection_agg(col("sk"))))
      .collect()(0).getLong(0)
    assert(est == expected)
  }

  test("sk07 bloom pre-filter: no false negatives, pass ⊇ exact, partition-invariant") {
    val r = graft.operators.SketchQueries.sk07(spark, sf).collect()(0)
    val nOrders = Tables.orders(spark, sf).count()
    assert(r.getAs[Long]("false_neg_rows") == 0L,
      "a Bloom filter must never drop a member row")
    assert(r.getAs[Long]("rows_bloom_pass") >= r.getAs[Long]("rows_exact"))
    assert(r.getAs[Long]("false_pos_rows") ==
      r.getAs[Long]("rows_bloom_pass") - r.getAs[Long]("rows_exact"))
    assert(r.getAs[Long]("n_probe_rows") == nOrders)
    // bit_or idempotence: the bitset (hence every verdict) must be
    // independent of the build side's partitioning
    val again = graft.operators.SketchQueries.sk07(spark, sf).collect()(0)
    assert(r == again)
  }

  test("string and long updates hash consistently across groups") {
    val docs = Tables.documents(spark, sf)
    val exact = docs.select(countDistinct(col("lang"))).collect()(0).getLong(0)
    val est = docs.repartition(7)
      .select(theta_sketch_estimate(theta_sketch_agg(col("lang"), 14)))
      .collect()(0).getLong(0)
    assert(est == exact)
  }
}
