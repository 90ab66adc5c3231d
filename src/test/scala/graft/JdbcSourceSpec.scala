package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.JdbcSource

/** The JDBC source path exercised against a real database — embedded
  * Derby (shipped with Spark) stands in for the reference's
  * Oracle/Postgres/Presto engines: same `spark.read.jdbc` call, same
  * DataFrame downstream as the parquet loaders.
  */
class JdbcSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private lazy val url: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby")
    val u = s"jdbc:derby:${dir.resolve("dimdb")};create=true"
    val conn = java.sql.DriverManager.getConnection(u)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE priority_dim (priority VARCHAR(20) PRIMARY KEY, " +
          "tier VARCHAR(10), urgency INT)")
      Seq(("1-URGENT", "gold", 1), ("2-HIGH", "gold", 2),
        ("3-MEDIUM", "silver", 3), ("4-NOT SPECIFIED", "bronze", 4),
        ("5-LOW", "bronze", 5)).foreach { case (p, t, u0) =>
        st.execute(s"INSERT INTO priority_dim VALUES ('$p', '$t', $u0)")
      }
      st.execute("CREATE TABLE big_fact (id INT PRIMARY KEY, v INT)")
      (1 to 100).foreach(i => st.execute(s"INSERT INTO big_fact VALUES ($i, ${i * 10})"))
    } finally conn.close()
    u
  }

  test("a JDBC dimension reads and broadcast-joins against the parquet fact") {
    val dim = JdbcSource.dim(spark, url, "priority_dim")
    assert(dim.count() == 5)
    val joined = graft.core.Tables.orders(spark, sf)
      .join(broadcast(dim), col("o_orderpriority") === col("PRIORITY"))
      .groupBy("TIER").agg(count(lit(1)).as("n"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), s"dim not broadcast:\n$physical")
    // every order has a priority in the dim: totals must match
    assert(joined.agg(sum("n")).collect()(0).getLong(0) ==
      graft.core.Tables.orders(spark, sf).count())
  }

  test("JDBC filters and pruning push into the remote engine") {
    val df = JdbcSource.dim(spark, url, "priority_dim")
      .filter(col("URGENCY") <= 2).select("PRIORITY")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("URGENCY"),
      s"filter not pushed to JDBC:\n$physical")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("1-URGENT", "2-HIGH"))
  }

  test("a large JDBC table reads range-partitioned") {
    val df = JdbcSource.partitioned(spark, url, "big_fact",
      partitionColumn = "id", lowerBound = 1L, upperBound = 101L,
      numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4,
      "parallel read must split the key range across executors")
    assert(df.count() == 100 &&
      df.agg(sum("V")).collect()(0).getLong(0) == (1 to 100).map(_ * 10L).sum)
  }

  test("a result writes back over JDBC and reads identically (sink path)") {
    // the export half of the JDBC story (reference: Oracle/Postgres
    // result tables): a computed rollup lands in the database via the
    // same partitioned writer a 100 TB export would use, one
    // connection per partition
    val rollup = graft.core.Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
    rollup.coalesce(2).write.mode("overwrite")
      .jdbc(url, "priority_rollup", new java.util.Properties)
    val back = spark.read.jdbc(url, "priority_rollup", new java.util.Properties)
    assert(back.orderBy("o_orderpriority").collect().toSeq ==
      rollup.orderBy("o_orderpriority").collect().toSeq)
  }
}
