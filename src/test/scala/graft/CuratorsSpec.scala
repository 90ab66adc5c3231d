package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.curators.Curators
import graft.operators.SemanticQueries.{registry, cur01Json, cur04Json, sem04Json}

/** Curator edge cases beyond the oracle-checked cur01–cur04. */
class CuratorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("coordinator runs default + curators concurrently with identical results") {
    import graft.curators.RequestCoordinator
    import graft.curators.RequestCoordinator._
    // barrier with one party per curator: run() passes only if EVERY
    // curator's future reaches preExecute before ANY proceeds — i.e.
    // they genuinely execute concurrently, not serialized on the
    // caller's thread (a sequential coordinator deadlocks here and the
    // await below times out)
    val specs = Seq(TimeShift, TotalMetrics, RowCount)
    val barrier = new java.util.concurrent.CyclicBarrier(specs.size + 1)
    val results = RequestCoordinator.run(cur01Json, registry, specs, spark, sf,
      preExecute = _ => barrier.await(30, java.util.concurrent.TimeUnit.SECONDS))
    assert(results.keySet ==
      Set("default", "timeshift", "totalmetrics", "rowcount"))
    assert(results.valuesIterator.forall(_.isRight), results.filter(_._2.isLeft))
    // results identical to the sequential single-curator paths
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
    assert(rows(results("default").toOption.get) ==
      rows(Curators.default(cur01Json, registry)(spark, sf)))
    assert(rows(results("timeshift").toOption.get) ==
      rows(Curators.timeShift(cur01Json, registry)(spark, sf)))
    assert(rows(results("rowcount").toOption.get) ==
      rows(Curators.rowCount(cur01Json, registry)(spark, sf)))
    RequestCoordinator.release(results)
  }

  test("coordinator isolates curator failures; default failure throws") {
    import graft.curators.RequestCoordinator
    import graft.curators.RequestCoordinator._
    // user_events has no day-grain Between in this request → timeshift
    // fails, but the default and rowcount still serve
    val noDay =
      """{"cube": "order_stats",
        | "selectFields": [{"field": "Order Priority"}, {"field": "Total Spend"}]}""".stripMargin
    val results = RequestCoordinator.run(noDay, registry,
      Seq(TimeShift, RowCount), spark, sf)
    assert(results("default").isRight && results("rowcount").isRight)
    assert(results("timeshift").swap.toOption.get.contains("Between"))
    RequestCoordinator.release(results)
    val bad = intercept[IllegalArgumentException] {
      RequestCoordinator.run("""{"cube": "nope", "selectFields": []}""",
        registry, Seq(RowCount), spark, sf)
    }
    assert(bad.getMessage.contains("default request failed"))
  }

  test("timeshift requires a day Between filter") {
    val noDay =
      """{"cube": "order_stats",
        | "selectFields": [{"field": "Order Priority"}, {"field": "Total Spend"}]}""".stripMargin
    val ex = intercept[IllegalArgumentException] {
      Curators.timeShift(noDay, registry)(spark, sf).collect()
    }
    assert(ex.getMessage.contains("Between"))
  }

  test("timeshift works on the tz-grain events cube") {
    val json =
      """{"cube": "user_events",
        | "selectFields": [{"field": "Event Type"}, {"field": "Total Value"}],
        | "filterExpressions": [{"field": "Day", "operator": "between", "from": "2024-01-16", "to": "2024-01-30"}],
        | "timezone": "America/Los_Angeles"}""".stripMargin
    val df = Curators.timeShift(json, registry)(spark, sf)
    assert(df.columns.toSeq == Seq("Event Type", "Total Value",
      "Total Value Prev", "Total Value Pct Change"))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(!_.isNullAt(1)))
  }

  test("rowCount ignores pagination") {
    val n = Curators.rowCount(sem04Json, registry)(spark, sf)
      .collect()(0).getLong(0)
    val customers = graft.core.Tables.customer(spark, sf).count()
    assert(n == customers)
  }

  test("drilldown with topN larger than the parent set keeps all parents") {
    val df = Curators.drillDown(cur04Json, "Order Status", 100, registry)(spark, sf)
    val parents = df.select("Order Priority").distinct().count()
    assert(parents == 5) // all five priorities survive
  }

  test("timeshift picks the DAY-grain Between, not the first Between") {
    // a Between on a non-date dim precedes the day filter; selecting it
    // would crash LocalDate.parse on '1-URGENT'
    val json =
      """{"cube": "order_stats",
        | "selectFields": [{"field": "Order Priority"}, {"field": "Total Spend"}],
        | "filterExpressions": [
        |   {"field": "Order Priority", "operator": "between", "from": "1-URGENT", "to": "3-MEDIUM"},
        |   {"field": "Order Date", "operator": "between", "from": "1996-02-01", "to": "1996-07-31"}]}""".stripMargin
    val rows = Curators.timeShift(json, registry)(spark, sf).collect()
    assert(rows.nonEmpty && rows.exists(!_.isNullAt(2)),
      "prev period should produce non-null Prev values")
  }

  test("timeshift aligns prev rows when the day column is selected") {
    val json =
      """{"cube": "order_stats",
        | "selectFields": [{"field": "Order Date"}, {"field": "Total Spend"}],
        | "filterExpressions": [
        |   {"field": "Order Date", "operator": "between", "from": "1996-02-01", "to": "1996-07-31"}]}""".stripMargin
    val df = Curators.timeShift(json, registry)(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.exists(!_.isNullAt(2)),
      "day-aligned join must match prev-period rows, not produce all nulls")
    // prev of day d must equal the spend aggregated directly on d - 182
    val direct = graft.core.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1995-08-03")
        && col("o_orderdate") <= lit("1996-01-31"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
      .agg(sum(graft.core.Tables.dec2(col("o_totalprice"))).cast("double").as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val day = r.getString(0)
      val prevDay = java.time.LocalDate.parse(day).minusDays(182).toString
      direct.get(prevDay) match {
        case Some(v) => assert(!r.isNullAt(2) && math.abs(r.getDouble(2) - v) < 1e-6,
          s"prev($day) should be spend($prevDay)")
        case None => assert(r.isNullAt(2), s"prev($day) should be null")
      }
    }
  }

  test("curators run against a cube that requires sync pagination") {
    // curator-internal second passes are async-style; maxRowsSync used
    // to reject their rowsPerPage = -1 inner requests
    import graft.semantic.model.Registry
    val capped = Registry(
      graft.operators.SemanticQueries.orderCube.copy(maxRowsSync = Some(100)),
      graft.operators.SemanticQueries.eventsCube)
    val n = Curators.rowCount(sem04Json, capped)(spark, sf).collect()(0).getLong(0)
    assert(n == graft.core.Tables.customer(spark, sf).count())
    val totals = Curators.totalMetrics(cur01Json, capped)(spark, sf)
    assert(totals.count() == 1)
    val drill = Curators.drillDown(cur04Json, "Order Status", 3, capped)(spark, sf)
    assert(drill.count() > 0)
  }

  test("totalmetrics returns exactly one row with the filters applied") {
    val df = Curators.totalMetrics(cur01Json, registry)(spark, sf)
    assert(df.count() == 1)
    val total = df.collect()(0).getDouble(df.columns.indexOf("Total Spend"))
    val want = graft.core.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1996-02-01")
        && col("o_orderdate") <= lit("1996-07-31"))
      .agg(sum(graft.core.Tables.dec2(col("o_totalprice"))).cast("double"))
      .collect()(0).getDouble(0)
    assert(math.abs(total - want) < 1e-6)
  }
}
