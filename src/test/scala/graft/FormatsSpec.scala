package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Source-format breadth beyond parquet (SURVEY §2.1: the reference's
  * engines read Hive/Presto tables — ORC is the Hive-native columnar
  * format — and ingest CSV/TSV extracts). Each format must round-trip
  * the same rows AND keep the scan predicates pushed: a format whose
  * scan can't prune is not a 100 TB source.
  */
class FormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("ORC round-trips orders and pushes filters to the scan") {
    val loc = "target/test-formats/orders_orc"
    val src = graft.core.Tables.orders(spark, sf)
    src.write.mode("overwrite").orc(loc)
    val back = spark.read.orc(loc)
    assert(back.count() == src.count())
    val q = back.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_totalprice")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderpriority), " +
      "EqualTo(o_orderpriority,1-URGENT)]"), s"ORC filter not pushed:\n$plan")
    // column pruning: the ORC reader must request only the 3 referenced
    // columns, not the full 9-column schema
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice"),
      s"ORC scan not pruned:\n$plan")
    val expected = src.filter(col("o_orderpriority") === "1-URGENT").count()
    assert(q.count() == expected)
  }

  test("CSV round-trips a dim with header+schema and filters correctly") {
    val loc = "target/test-formats/nation_csv"
    val src = graft.core.Tables.nation(spark, sf)
    src.write.mode("overwrite").option("header", "true").csv(loc)
    val back = spark.read.option("header", "true").schema(src.schema).csv(loc)
    assert(back.count() == src.count())
    val got = back.filter(col("n_regionkey") === 1)
      .select("n_name").collect().map(_.getString(0)).sorted
    val want = src.filter(col("n_regionkey") === 1)
      .select("n_name").collect().map(_.getString(0)).sorted
    assert(got.sameElements(want))
  }

  test("JSON-lines round-trips typed rows") {
    val loc = "target/test-formats/region_json"
    val src = graft.core.Tables.region(spark, sf)
    src.write.mode("overwrite").json(loc)
    val back = spark.read.schema(src.schema).json(loc)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      src.orderBy("r_regionkey").collect().toSeq)
  }
}
