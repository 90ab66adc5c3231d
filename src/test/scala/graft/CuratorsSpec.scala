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

  test("coordinator monitor brackets every curator with outcome + wall") {
    import graft.curators.RequestCoordinator
    import graft.curators.RequestCoordinator._
    val mon = new graft.serving.ServiceMonitor.Counting
    // mixed outcome: no day Between → timeshift fails, others succeed
    val noDay =
      """{"cube": "order_stats",
        | "selectFields": [{"field": "Order Priority"}, {"field": "Total Spend"}]}""".stripMargin
    val results = RequestCoordinator.run(noDay, registry,
      Seq(TimeShift, RowCount), spark, sf,
      monitor = mon, requestId = "mon-req-1")
    assert(mon.started("default") == 1 && mon.succeeded("default") == 1)
    assert(mon.started("rowcount") == 1 && mon.succeeded("rowcount") == 1)
    assert(mon.started("timeshift") == 1 && mon.failures("timeshift") == 1
      && mon.succeeded("timeshift") == 0)
    assert(mon.wallMillis("default") >= 0)
    RequestCoordinator.release(results)
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

  test("oversized drilldown parent set ships as a Bloom tuple probe, results exact") {
    import graft.curators.RequestCoordinator
    // at sf0.01 the parent page is 2870 (Customer Key, Order Status)
    // TUPLES, past KeyShip's literal threshold, and
    // multi-column: the injected parent restriction must plan as the
    // bloom_might_contain tuple-hash probe + exact semi, never a
    // 2000-tuple broadcast literal — and stay exact
    val json =
      """{"cube": "order_stats",
        | "selectFields": [{"field": "Customer Key"}, {"field": "Order Status"}, {"field": "Total Spend"}],
        | "filterExpressions": [{"field": "Order Date", "operator": "between", "from": "1995-01-01", "to": "1996-12-31"}],
        | "sortBy": [{"field": "Total Spend", "order": "Desc"}]}""".stripMargin
    val sf01 = "/root/testdata/sf0.01"
    val drill = Curators.drillDown(json, "Order Priority", 50000, registry)(spark, sf01)
    val plan = drill.queryExecution.executedPlan.toString
    // 2870 tuples are past the LITERAL threshold but inside the
    // broadcast budget: the decision ships a broadcast exact semi —
    // no bloom overhead, no multi-thousand-node literal tree. (The
    // bloom regime needs a key side too big to broadcast; its tuple
    // plan shape is pinned below with the threshold forced.)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"oversized-literal parent set must broadcast the exact semi:\n${plan.take(4000)}")
    assert(!plan.contains("bloom_might_contain"),
      "a broadcastable parent set must not pay the bloom build")
    // topN covers every parent, so the parent restriction is a no-op:
    // the result must equal the plain (key, status, priority) agg
    // (Order Status renders through its display mapping)
    val disp = Map("O" -> "Open", "F" -> "Fulfilled", "P" -> "Pending")
    val expected = graft.core.Tables.orders(spark, sf01)
      .filter(col("o_orderdate").between("1995-01-01", "1996-12-31"))
      .groupBy(col("o_custkey"), col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(graft.core.Tables.dec2(col("o_totalprice")))
        .cast("double").as("ts"))
      .collect().map(r => (r.getLong(0), disp(r.getString(1)), r.getString(2),
        math.round(r.getDouble(3) * 100))).toSet
    def asSet(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getString(1), r.getString(2),
        math.round(r.getDouble(3) * 100))).toSet
    assert(asSet(drill.collect()) == expected,
      s"bloom-shipped drilldown diverged (${expected.size} expected rows)")
    // and through the front-door coordinator: same result set
    val res = RequestCoordinator.run(json, registry,
      Seq(RequestCoordinator.DrillDown("Order Priority", 50000)), spark, sf01)
    val viaCoord = asSet(res("drilldown").toOption.get.collect())
    RequestCoordinator.release(res)
    assert(viaCoord == expected, "coordinator drilldown must match")
    // the past-broadcast regime, forced (bloomMinKeys=0): the tuple
    // carrier plans the xxhash bloom probe + exact semi, results equal
    val facts = graft.core.Tables.orders(spark, sf01)
      .select("o_custkey", "o_orderstatus", "o_orderpriority")
    val parents = facts.select("o_custkey", "o_orderstatus").distinct()
    val shipped = graft.operators.KeyShip.semiShipCols(
      facts, Seq("o_custkey", "o_orderstatus"),
      parents, Seq("o_custkey", "o_orderstatus"),
      maxLiterals = 100, bloomMinKeys = 0)
    val p2 = shipped.queryExecution.executedPlan.toString
    assert(p2.contains("bloom_might_contain") && p2.contains("LeftSemi"),
      s"forced tuple bloom shape missing:\n${p2.take(3000)}")
    assert(shipped.count() == facts.count(),
      "self-parent tuple semi must keep every fact row")
    // ANTI complement (the exclusion-list shape): drop every
    // (custkey, status) pair of urgent orders; miss-bypass result
    // must equal the plain anti-join exactly
    val exclude = facts.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey", "o_orderstatus").distinct()
    val anti = graft.operators.KeyShip.antiShipCols(
      facts, Seq("o_custkey", "o_orderstatus"),
      exclude, Seq("o_custkey", "o_orderstatus"),
      maxLiterals = 50, bloomMinKeys = 0)
    val p3 = anti.queryExecution.executedPlan.toString
    assert(p3.contains("bloom_might_contain") && p3.contains("LeftAnti") &&
      p3.contains("Union"), s"tuple anti miss-bypass shape:\n${p3.take(3000)}")
    val exactAnti = facts.join(
      exclude.withColumnRenamed("o_custkey", "xk")
        .withColumnRenamed("o_orderstatus", "xs"),
      col("o_custkey") === col("xk") && col("o_orderstatus") === col("xs"),
      "left_anti")
    assert(anti.count() == exactAnti.count() && anti.count() > 0,
      s"tuple anti diverged: ${anti.count()} vs ${exactAnti.count()}")
    // the TYPE guard: xxhash64 is type-sensitive, so mismatched sides
    // would silently drop true matches — rejected up front instead
    val intKeys = exclude.select(col("o_custkey").cast("int").as("o_custkey"),
      col("o_orderstatus"))
    val ex = intercept[IllegalArgumentException] {
      graft.operators.KeyShip.semiShipCols(
        facts, Seq("o_custkey", "o_orderstatus"),
        intKeys, Seq("o_custkey", "o_orderstatus"))
    }
    assert(ex.getMessage.contains("type"), ex.getMessage)
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

  test("timeshift config: reference JSON parses; daysOffset shifts the window") {
    import graft.curators.TimeShiftConfig
    import graft.analyzer.request.SortBy
    val cfg = TimeShiftConfig.parse(
      """{"sortBy": {"field": "Total Spend", "order": "Desc"}, "daysOffset": 7}""")
      .fold(e => fail(e), identity)
    assert(cfg == TimeShiftConfig(Some(SortBy("Total Spend", descending = true)), 7))
    assert(TimeShiftConfig.parse("{}") == Right(TimeShiftConfig(None, 0)))
    assert(TimeShiftConfig.parse("""{"daysOffset": "x"}""").isLeft)
    // negative offset would invert the prev window (from > to) or align
    // it over future days — rejected at parse, not silently nulled
    assert(TimeShiftConfig.parse("""{"daysOffset": -7}""").isLeft)
    val json =
      """{"cube": "order_stats",
        | "selectFields": [{"field": "Order Date"}, {"field": "Total Spend"}],
        | "filterExpressions": [
        |   {"field": "Order Date", "operator": "between", "from": "1996-02-01", "to": "1996-07-31"}]}""".stripMargin
    val rows = Curators.timeShift(json, registry,
      TimeShiftConfig(None, 7))(spark, sf).collect()
    assert(rows.nonEmpty && rows.exists(!_.isNullAt(2)),
      "offset window should still match prev-period rows")
    // window length 182; daysOffset 7 ⇒ prev of day d aggregates d − 189
    val direct = graft.core.Tables.orders(spark, sf)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
      .agg(sum(graft.core.Tables.dec2(col("o_totalprice"))).cast("double").as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val day = r.getString(0)
      val prevDay = java.time.LocalDate.parse(day).minusDays(189).toString
      direct.get(prevDay) match {
        case Some(v) => assert(!r.isNullAt(2) && math.abs(r.getDouble(2) - v) < 1e-6,
          s"prev($day) should be spend($prevDay)")
        case None => assert(r.isNullAt(2), s"prev($day) should be null")
      }
    }
  }

  test("timeshift config sortBy orders the merged result") {
    import graft.curators.TimeShiftConfig
    import graft.analyzer.request.SortBy
    val df = Curators.timeShift(cur01Json, registry,
      TimeShiftConfig(Some(SortBy("Total Spend", descending = true)), 0))(spark, sf)
    val spends = df.collect().map(_.getDouble(1)).toSeq
    assert(spends.nonEmpty && spends == spends.sortBy(-_),
      s"rows must be in Total Spend desc order: $spends")
  }

  test("drilldown config: reference JSON grammar, object and array forms") {
    import graft.curators.{DrilldownConfig, DrilldownRequest}
    import graft.analyzer.request.{EqFilter, SortBy}
    // the reference's documented single-request shape
    val one = DrilldownConfig.parse(
      """{"enforceFilters": true, "dimension": "Order Status", "mr": 1000}""")
      .fold(e => fail(e), identity)
    assert(one == Seq(DrilldownRequest(dimensions = Seq("Order Status"))))
    // multi-request array with every knob exercised
    val many = DrilldownConfig.parse(
      """[{"dimensions": ["Order Status"], "cube": "order_stats",
        |  "ordering": [{"field": "Total Spend", "order": "Desc"}], "mr": 2,
        |  "facts": [{"field": "Order Count"}], "additiveFacts": true},
        | {"dimension": "Market Segment", "enforceFilters": false,
        |  "filters": [{"field": "Order Status", "operator": "=", "value": "Open"}]}]""".stripMargin)
      .fold(e => fail(e), identity)
    assert(many.size == 2)
    assert(many(0) == DrilldownRequest(Seq("Order Status"), cube = "order_stats",
      ordering = Seq(SortBy("Total Spend", descending = true)), maxRows = 2,
      facts = Seq("Order Count")))
    assert(many(1) == DrilldownRequest(Seq("Market Segment"),
      enforceFilters = false, filters = Seq(EqFilter("Order Status", "Open"))))
    assert(DrilldownConfig.parse("""{"mr": 5}""").isLeft,
      "a config without dimension(s) must be rejected")
  }

  test("configured drilldown: cube override + defaults ≡ the classic path") {
    import graft.curators.DrilldownRequest
    val classic = Curators.drillDown(cur04Json, "Order Status", 3, registry)(spark, sf)
      .collect().map(_.toSeq).toSeq
    // explicit same-cube override exercises the override branch
    val configured = Curators.drillDownConfigured(cur04Json,
      DrilldownRequest(Seq("Order Status"), cube = "order_stats",
        maxRows = Int.MaxValue), 3, registry)(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(configured == classic)
  }

  test("configured drilldown: override cube is validated up front") {
    import graft.curators.DrilldownRequest
    // user_events carries none of the orders fields: the config must
    // fail as a validation error NAMING the missing fields, not as a
    // downstream planner error from the drill re-request
    val ex = intercept[IllegalArgumentException] {
      Curators.drillDownConfigured(cur04Json,
        DrilldownRequest(Seq("Event Type"), cube = "user_events",
          maxRows = Int.MaxValue), 3, registry)(spark, sf)
    }
    assert(ex.getMessage.contains("not present on override cube 'user_events'"),
      ex.getMessage)
    // an unknown override cube name is a config error too
    val ex2 = intercept[IllegalArgumentException] {
      Curators.drillDownConfigured(cur04Json,
        DrilldownRequest(Seq("Event Type"), cube = "no_such_cube",
          maxRows = Int.MaxValue), 3, registry)(spark, sf)
    }
    assert(ex2.getMessage.startsWith("drilldown config:"), ex2.getMessage)
    // CONFIG filters are validated against the override cube too.
    // order_stats_guarded shares every alias with cur04Json's base
    // cube, so the parent dims/facts/kept filters all resolve — ONLY
    // the config's own extra filter (Event Type, foreign to the
    // target) can trip the check
    val ex3 = intercept[IllegalArgumentException] {
      Curators.drillDownConfigured(cur04Json,
        DrilldownRequest(Seq("Order Status"), cube = "order_stats_guarded",
          filters = Seq(graft.analyzer.request.EqFilter("Event Type", "click")),
          maxRows = Int.MaxValue), 3, registry)(spark, sf)
    }
    assert(ex3.getMessage.contains("not present on override cube 'order_stats_guarded'")
      && ex3.getMessage.contains("Event Type"), ex3.getMessage)
  }

  test("configured drilldown: enforceFilters=false keeps only the time window") {
    import graft.curators.DrilldownRequest
    val json =
      """{"cube": "order_stats",
        | "selectFields": [{"field": "Order Priority"}, {"field": "Total Spend"}],
        | "filterExpressions": [
        |   {"field": "Order Date", "operator": "between", "from": "1995-01-01", "to": "1996-12-31"},
        |   {"field": "Market Segment", "operator": "=", "value": "BUILDING"}],
        | "sortBy": [{"field": "Total Spend", "order": "Desc"}]}""".stripMargin
    def total(enforce: Boolean): Double =
      Curators.drillDownConfigured(json,
        DrilldownRequest(Seq("Order Status"), enforceFilters = enforce,
          maxRows = Int.MaxValue), 5, registry)(spark, sf)
        .agg(sum(col("Total Spend"))).collect()(0).getDouble(0)
    val enforced = total(enforce = true)
    val unenforced = total(enforce = false)
    // dropping the segment filter (but keeping the day window) can only
    // widen the totals
    assert(unenforced > enforced,
      s"unenforced=$unenforced should exceed enforced=$enforced")
  }

  test("configured drilldown: ordering + maxRows + additive facts") {
    import graft.curators.DrilldownRequest
    import graft.analyzer.request.SortBy
    val df = Curators.drillDownConfigured(cur04Json,
      DrilldownRequest(Seq("Order Status"),
        ordering = Seq(SortBy("Total Spend", descending = true)), maxRows = 4,
        facts = Seq("Order Count"), additiveFacts = true), 3, registry)(spark, sf)
    assert(df.columns.toSeq ==
      Seq("Order Priority", "Order Status", "Total Spend", "Order Count"))
    val rows = df.collect()
    assert(rows.length == 4, s"maxRows=4 must cap the result, got ${rows.length}")
    val spends = rows.map(_.getDouble(2)).toSeq
    assert(spends == spends.sortBy(-_), s"ordering not applied: $spends")
    // non-additive facts REPLACE the base metrics
    val replaced = Curators.drillDownConfigured(cur04Json,
      DrilldownRequest(Seq("Order Status"), facts = Seq("Order Count"),
        additiveFacts = false, maxRows = Int.MaxValue), 3, registry)(spark, sf)
    assert(replaced.columns.toSeq ==
      Seq("Order Priority", "Order Status", "Order Count"))
  }

  test("drillDownAll runs every request of a multi-request config") {
    val dfs = Curators.drillDownAll(cur04Json,
      """[{"dimension": "Order Status", "mr": 3},
        | {"dimension": "Market Segment", "mr": 2}]""".stripMargin,
      3, registry)(spark, sf)
    assert(dfs.size == 2)
    assert(dfs(0).columns.contains("Order Status") && dfs(0).count() == 3)
    assert(dfs(1).columns.contains("Market Segment") && dfs(1).count() == 2)
  }

  test("registry-auto cardinality: a costModel-less cube feeds the served " +
      "carrier decision; a known key side decides with ZERO driver jobs") {
    import graft.core.Tables
    import graft.operators.KeyShip
    // (a) the auto channel: order_stats declares NO CostModel, yet the
    // served planner surfaces the chosen variant's footer count — the
    // signal the drill's key-ship sizing consumes
    // "Order Status" forces the raw-parquet base variant (the rollup
    // lacks it); a view-backed winner correctly yields no estimate
    val json =
      """{"cube": "order_stats",
        | "selectFields": [{"field": "Order Priority"},
        |   {"field": "Order Status"}, {"field": "Total Spend"}],
        | "filterExpressions": [{"field": "Order Date",
        |   "operator": "between", "from": "1995-01-01", "to": "1996-12-31"}]}"""
        .stripMargin
    val req = graft.analyzer.request.parse(json)
      .fold(e => fail(e), identity)
    val (_, est) = Curators.plannedWithEstimate(req, registry, spark, sf)
    assert(est.contains(Tables.tableRows(spark, sf, "orders")),
      s"expected the auto-resolved footer count, got $est")
    val reqRollup = graft.analyzer.request.parse(cur04Json)
      .fold(e => fail(e), identity)
    assert(Curators.plannedWithEstimate(reqRollup, registry, spark, sf)
      ._2.isEmpty, "a view-backed winner must not claim the raw table's count")
    // (b) ZERO-JOB decision: with keyRows known (footer metadata) and
    // the key set provably oversized for literals, building the
    // shipped plan runs NO Spark job — no limit-probe, no distinct
    // count. Protocol: a FIFO job listener bracketed by dummy jobs.
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    def settle(): Unit = { // flush the async bus via a sentinel job
      val before = counter.get()
      // a raw RDD count is EXACTLY one job (an SQL count can split
      // into several under AQE and poison the bracket)
      spark.sparkContext.parallelize(Seq(1), 1).count()
      val deadline = System.nanoTime() + 10000000000L
      while (counter.get() <= before && System.nanoTime() < deadline)
        Thread.sleep(5)
    }
    val fact = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val keys = Tables.orders(spark, sf).select("o_orderkey")
    val known = Tables.tableRows(spark, sf, "orders") // memoized, no job
    spark.sparkContext.addSparkListener(listener)
    try {
      settle(); counter.set(0)
      val shipped = KeyShip.semiShip(fact, "l_orderkey", keys,
        "o_orderkey", maxLiterals = 100, keyRows = Some(known))
      assert(shipped != null)
      settle()
      assert(counter.get() == 1, // exactly the sentinel
        s"carrier decision ran ${counter.get() - 1} extra jobs with a " +
          "registry-known key cardinality")
      // the probed fallback stays intact: without the estimate the
      // decision pays its limit-probe job(s)
      counter.set(0)
      KeyShip.semiShip(fact, "l_orderkey", keys, "o_orderkey",
        maxLiterals = 100)
      settle()
      assert(counter.get() > 1,
        "the estimate-free path should still probe (fallback intact)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
