package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Tables.{dec2, dec6}
import graft.semantic.model._
import graft.analyzer.{request, RequestModel}
import graft.planner.Planner

/** The full request→plan pipeline exercised end-to-end: JSON reporting
  * requests (maha's primary entry point, §3.1 of SURVEY.md) against a
  * cube registry over the TPC-H-ish test tables, planned into single
  * Spark plans and oracle-checked against DuckDB.
  */
object SemanticQueries {

  /** Order Status static mapping (storage → display). */
  private val statusMapping = StaticMapping(
    Map("O" -> "Open", "F" -> "Fulfilled", "P" -> "Pending"), "Unknown")

  private def spendMetric = PubMetric("Total Spend", SumRollup,
    df => dec2(df.col("o_totalprice")), _.cast("double"))
  private def countMetric = PubMetric("Order Count", CountRollup, _ => lit(1))
  private def maxPriceMetric = PubMetric("Max Price", MaxRollup,
    df => dec2(df.col("o_totalprice")), _.cast("double"))
  private def avgPriceMetric = PubMetric("Avg Price", AvgRollup,
    df => dec2(df.col("o_totalprice")))
  private def distinctCustomersMetric = PubMetric("Distinct Customers",
    CountDistinctRollup, df => df.col("o_custkey"))
  /** FILTERED rollup metric (reference Fact.scala filtered fact
    * columns / FilteredRollup): the pre-aggregation input is gated by
    * a row predicate — SUM over `when(pred, x)` skips non-matching
    * rows exactly like SQL's `FILTER (WHERE …)`, and the two-stage
    * agg-before-join path sums the same NULL-skipping partials. */
  private def urgentSpendMetric = PubMetric("Urgent Spend", SumRollup,
    df => when(df.col("o_orderpriority") === "1-URGENT",
      dec2(df.col("o_totalprice"))), _.cast("double"))

  /** Pre-aggregated rollup standing in for a materialized table
    * (FactBuilder.newRollUp analogue): orders at (priority, day) grain.
    * Its metrics re-aggregate the stored partials (count → sum) —
    * including the FILTERED partial `__uspend`, precomputed per group
    * so the filtered metric stays servable from the rollup. */
  private def rollupView(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_orderdate"))
      .agg(count(lit(1)).as("__cnt"), sum(dec2(col("o_totalprice"))).as("__spend"),
        sum(when(col("o_orderpriority") === "1-URGENT",
          dec2(col("o_totalprice")))).as("__uspend"))

  /** UnionView variant (reference fact/View.scala:24-80): the fact is a
    * UNION ALL of per-stage sub-facts, each stage injecting a constant
    * stage column (ConstDimCol / QueryPipeline nextStage analogue). */
  private def unionView(s: SparkSession, d: String): DataFrame = {
    def stage(status: String, label: String): DataFrame =
      Tables.orders(s, d).filter(col("o_orderstatus") === status)
        .withColumn("__stage", lit(label))
    stage("O", "open").unionByName(stage("F", "closed"))
  }

  val orderCube: CubeDef = CubeDef(
    name = "order_stats",
    variants = Seq(
      FactDef(
        name = "orders_base",
        table = "orders",
        dimCols = Seq(
          PubCol("Order Date", "o_orderdate",
            allowedOps = Set(BetweenOp, EqOp, InOp), grain = Some(DayGrain)),
          PubCol("Order Status", "o_orderstatus", staticMapping = Some(statusMapping)),
          PubCol("Order Priority", "o_orderpriority"),
          PubCol("Customer Key", "o_custkey")),
        metrics = Seq(spendMetric, countMetric, maxPriceMetric,
          avgPriceMetric, distinctCustomersMetric, urgentSpendMetric),
        cost = 100,
        derived = Seq(
          // PostResultColumn analogue: computed after the final agg
          // from other metric aliases (inputs aggregated even when
          // not selected).
          PubDerived("Avg Order Value", Seq("Total Spend", "Order Count"),
            df => col("Total Spend") / col("Order Count")))),
      FactDef(
        name = "orders_by_priority_day_rollup",
        table = "orders",
        dimCols = Seq(
          PubCol("Order Date", "o_orderdate",
            allowedOps = Set(BetweenOp, EqOp, InOp), grain = Some(DayGrain)),
          PubCol("Order Priority", "o_orderpriority")),
        metrics = Seq(
          PubMetric("Total Spend", SumRollup, df => df.col("__spend"), _.cast("double")),
          PubMetric("Order Count", SumRollup, df => df.col("__cnt"),
            countSemantics = true),
          PubMetric("Urgent Spend", SumRollup, df => df.col("__uspend"),
            _.cast("double"))),
        cost = 10,
        view = Some(rollupView),
        availableDims = Some(Set.empty)),
      FactDef(
        name = "orders_union_view",
        table = "orders",
        dimCols = Seq(
          PubCol("Source Stage", "__stage"),
          PubCol("Order Date", "o_orderdate",
            allowedOps = Set(BetweenOp, EqOp, InOp), grain = Some(DayGrain)),
          PubCol("Order Priority", "o_orderpriority")),
        metrics = Seq(spendMetric, countMetric),
        cost = 20,
        view = Some(unionView),
        availableDims = Some(Set.empty))),
    dims = Seq(
      DimDef("customer", "customer", "c_custkey", "o_custkey", None, Seq(
        PubCol("Customer Name", "c_name"),
        PubCol("Market Segment", "c_mktsegment"),
        PubCol("Nation Key", "c_nationkey")), small = false,
        uniqueCols = Set("Customer Name")),
      DimDef("nation", "nation", "n_nationkey", "c_nationkey", Some("customer"),
        Seq(PubCol("Nation Name", "n_name")), small = true),
      DimDef("region", "region", "r_regionkey", "n_regionkey",
        Some("nation"), Seq(PubCol("Region Name", "r_name")), small = true)))

  /** Hourly pre-aggregation of the events fact (the 100 TB shape: an
    * hourly rollup is ~3600× smaller than the raw stream, and almost
    * every dashboard window is hour- or day-grained). ts is TRUNCATED
    * to the hour, so the variant declares `storageGrain = HourGrain`:
    * the planner serves Day/Hour requests from it only in timezones
    * whose UTC offsets are whole hours — Asia/Kolkata (+05:30) and
    * Minute-grain requests fall back to the raw variant (see
    * [[graft.semantic.Cube.FactDef.storageGrain]]). */
  private def eventsHourRollupView(s: SparkSession, d: String): DataFrame = {
    // date_trunc truncates in the SESSION timezone, while the planner's
    // storage-grain gate (wholeOffsets) checks only the REQUEST zone —
    // with a non-whole-hour session tz (e.g. Asia/Kolkata +05:30) this
    // view would materialize :30-offset buckets and every request
    // routed to it would silently aggregate wrong (r19 ADVICE). All
    // entry points pin UTC; refuse loudly if one ever stops.
    val tz = s.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC" || tz == "Etc/UTC" || tz == "Z",
      s"events_by_hour_rollup requires spark.sql.session.timeZone=UTC " +
        s"(got '$tz'): hour truncation in a non-whole-offset session " +
        "zone would shift the rollup's storage buckets")
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("ts"), col("event_type"))
      .agg(count(lit(1)).as("__cnt"), sum(dec6(col("value"))).as("__val"))
  }

  /** Cube over the events stream table: a tz-point Day grain (requests
    * carry a local timezone; the planner converts day-filter bounds
    * local→UTC and renders Day in local time — BaseUTCTimeProvider
    * analogue) and a schema-restricted column (PublicColumn
    * restrictedSchemas analogue). Two variants: the raw stream and the
    * hourly rollup (grain-gated — variant selection must stay
    * answer-transparent across zones, which the relational-corpus fuzz
    * pins on generated data incl. DST transitions). */
  val eventsCube: CubeDef = CubeDef(
    name = "user_events",
    variants = Seq(FactDef(
      name = "events_base",
      table = "events",
      dimCols = Seq(
        PubCol("Day", "ts", allowedOps = Set(BetweenOp),
          grain = Some(DayGrain), tzPoint = true),
        // the same physical instant exposed at finer grains (reference
        // HourlyGrain/MinuteGrain, Grain.scala:102,143: requests carry
        // Hour/Minute fields next to Day over one timestamp column)
        PubCol("Hour", "ts", allowedOps = Set(BetweenOp),
          grain = Some(HourGrain), tzPoint = true),
        PubCol("Minute", "ts", allowedOps = Set(BetweenOp),
          grain = Some(MinuteGrain), tzPoint = true),
        PubCol("Event Type", "event_type"),
        PubCol("User ID", "user_id", restrictedTo = Some(Set("internal")))),
      metrics = Seq(
        PubMetric("Event Count", CountRollup, _ => lit(1)),
        PubMetric("Total Value", SumRollup,
          df => dec6(df.col("value")), _.cast("double"))),
      cost = 100,
      view = Some((s, d) => Tables.events(s, d))),
      FactDef(
        name = "events_by_hour_rollup",
        table = "events",
        dimCols = Seq(
          PubCol("Day", "ts", allowedOps = Set(BetweenOp),
            grain = Some(DayGrain), tzPoint = true),
          PubCol("Hour", "ts", allowedOps = Set(BetweenOp),
            grain = Some(HourGrain), tzPoint = true),
          // no Minute (finer than storage), no User ID (not stored)
          PubCol("Event Type", "event_type")),
        metrics = Seq(
          PubMetric("Event Count", SumRollup, df => df.col("__cnt"),
            countSemantics = true),
          PubMetric("Total Value", SumRollup, df => df.col("__val"),
            _.cast("double"))),
        cost = 10,
        view = Some(eventsHourRollupView),
        availableDims = Some(Set.empty),
        storageGrain = Some(HourGrain))),
    dims = Nil)

  /** Int-keyed static mapping (reference IntType(length, staticMapping),
    * DataType.scala:66-86): an int-coded storage column decoded to
    * display values through the cube, with reverse filters comparing
    * numeric literals so pushdown survives. */
  private val lineRoleMapping = StaticMapping.int(
    Map(1 -> "Primary", 2 -> "Secondary"), "Additional")

  val lineitemCube: CubeDef = CubeDef(
    name = "line_stats",
    variants = Seq(FactDef(
      name = "lineitem_base",
      table = "lineitem",
      dimCols = Seq(
        PubCol("Line Role", "l_linenumber", staticMapping = Some(lineRoleMapping)),
        PubCol("Return Flag", "l_returnflag")),
      metrics = Seq(
        PubMetric("Line Count", CountRollup, _ => lit(1)),
        PubMetric("Total Qty", SumRollup,
          df => dec2(df.col("l_quantity")), _.cast("double"))),
      cost = 100)),
    dims = Nil)

  /** Guarded revision of the orders cube for sem18 — its own cube
    * name, because `filteringRequired` binds EVERY request on a cube
    * and the unguarded order_stats keeps serving sem01-sem13. Customer
    * Key (high-cardinality) may never be queried unfiltered: the
    * reference's requiredFilterAliases guard rail (Fact.scala:1888,
    * RequestModel.scala:592-595). */
  val guardedOrderCube: CubeDef = orderCube.copy(
    name = "order_stats_guarded",
    variants = Seq(orderCube.base.copy(
      name = "orders_base_guarded",
      dimCols = orderCube.base.dimCols.map(c =>
        if (c.alias == "Customer Key") c.copy(filteringRequired = true) else c))))

  val registry: Registry =
    Registry(orderCube, eventsCube, lineitemCube, guardedOrderCube)

  /** Session-global request-log writer (reference
    * MahaRequestLogWriter): Noop by default; a server installs a
    * JSON-lines/Kafka backend. Every request through [[run]] emits one
    * envelope — success or failure — keyed by request id. */
  @volatile var requestLogWriter: graft.serving.RequestLog.RequestLogWriter =
    graft.serving.RequestLog.NoopWriter

  /** Run a JSON request through parse → analyze → plan. */
  def run(json: String)(s: SparkSession, dir: String): DataFrame =
    runLogged(json, java.util.UUID.randomUUID().toString)(s, dir)

  /** Like [[run]] but with a caller-supplied request id (what an HTTP
    * front door propagates from its request header). The envelope's end
    * time stamps PLAN completion — execution is lazy; a serving layer
    * that materializes the result logs a second, completion-time
    * envelope (see [[graft.serving]]). */
  def runLogged(json: String, requestId: String,
      reg: Registry = registry)(s: SparkSession, dir: String): DataFrame = {
    import graft.serving.RequestLog
    val start = System.currentTimeMillis()
    val parsed = request.parse(json)
    val planned = for {
      req <- parsed
      model <- RequestModel.from(req, reg)
      p <- Planner.plan(model, s, dir)
    } yield (model, p)
    planned match {
      case Right((model, p)) =>
        requestLogWriter.write(RequestLog.record(requestId, model, p,
          start, System.currentTimeMillis()))
        p.df
      case Left(err) =>
        requestLogWriter.write(RequestLog.failure(requestId,
          parsed.map(_.cube).getOrElse(""), err,
          start, System.currentTimeMillis()))
        throw new IllegalArgumentException(err)
    }
  }

  /** EXPLAIN for a reporting request (the `debug` request-parameter
    * analogue, reference Request.scala:156): one row per covering
    * variant with the request-aware and static costs the ranking used,
    * the winner flagged, and the chosen plan's shape flags on the
    * winning row. Deterministic config+cost metadata, so the oracle is
    * a golden VALUES listing (like DESCRIBE): any drift in variant
    * ranking or plan shape fails the hash. */
  def explainRequest(json: String)(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = for {
      req <- request.parse(json)
      model <- RequestModel.from(req, registry)
      r <- Planner.explain(model, s, dir)
    } yield r
    out match {
      case Right((choices, p)) =>
        choices.map(c => (c.name, c.estCost, c.staticCost, c.chosen,
          if (c.chosen) Some(p.twoStage) else None,
          if (c.chosen) Some(p.dimPaged) else None))
          .toDF("variant", "est_cost", "static_cost", "chosen",
            "two_stage", "dim_paged")
          .orderBy("est_cost", "static_cost", "variant")
      case Left(err) => throw new IllegalArgumentException(err)
    }
  }

  /** Same but exposing the planner decision (for tests). */
  def planFor(json: String, s: SparkSession, dir: String): Either[String, Planner.Planned] =
    for {
      req <- request.parse(json)
      model <- RequestModel.from(req, registry)
      p <- Planner.plan(model, s, dir)
    } yield p

  val sem01Json: String =
    """{"cube": "order_stats",
      | "selectFields": [{"field": "Order Priority"}, {"field": "Order Count"}, {"field": "Total Spend"}],
      | "filterExpressions": [{"field": "Order Date", "operator": "between", "from": "1995-01-01", "to": "1996-12-31"}],
      | "sortBy": [{"field": "Total Spend", "order": "Desc"}]}""".stripMargin

  val sem02Json: String =
    """{"cube": "order_stats",
      | "selectFields": [{"field": "Market Segment"}, {"field": "Region Name"}, {"field": "Order Count"}, {"field": "Total Spend"}],
      | "filterExpressions": [{"field": "Region Name", "operator": "=", "value": "ASIA"}]}""".stripMargin

  val sem03Json: String =
    """{"cube": "order_stats",
      | "selectFields": [{"field": "Order Status"}, {"field": "Order Count"}, {"field": "Max Price"}],
      | "filterExpressions": [{"field": "Order Status", "operator": "in", "values": ["Open", "Fulfilled"]}]}""".stripMargin

  val sem04Json: String =
    """{"cube": "order_stats",
      | "selectFields": [{"field": "Customer Name"}, {"field": "Order Count"}, {"field": "Total Spend"}],
      | "dimensionDriven": true,
      | "rowsPerPage": 50}""".stripMargin

  val sem05Json: String =
    """{"cube": "order_stats",
      | "selectFields": [{"field": "Customer Key"}, {"field": "Order Count"}, {"field": "Distinct Customers"}],
      | "filterExpressions": [{"field": "Order Count", "operator": ">", "value": "3"}]}""".stripMargin

  val sem06Json: String =
    """{"cube": "order_stats",
      | "selectFields": [{"field": "Order Priority"}, {"field": "Order Count"}, {"field": "Total Spend"}, {"field": "Avg Order Value"}],
      | "filterExpressions": [{"field": "Order Date", "operator": "between", "from": "1995-01-01", "to": "1996-12-31"}],
      | "sortBy": [{"field": "Avg Order Value", "order": "Desc"}]}""".stripMargin

  val sem07Json: String =
    """{"cube": "order_stats",
      | "selectFields": [{"field": "Order Status"}, {"field": "Avg Order Value"}]}""".stripMargin

  val cur01Json: String =
    """{"cube": "order_stats",
      | "selectFields": [{"field": "Order Priority"}, {"field": "Total Spend"}],
      | "filterExpressions": [{"field": "Order Date", "operator": "between", "from": "1996-02-01", "to": "1996-07-31"}]}""".stripMargin

  val cur04Json: String =
    """{"cube": "order_stats",
      | "selectFields": [{"field": "Order Priority"}, {"field": "Total Spend"}],
      | "filterExpressions": [{"field": "Order Date", "operator": "between", "from": "1995-01-01", "to": "1996-12-31"}],
      | "sortBy": [{"field": "Total Spend", "order": "Desc"}]}""".stripMargin

  val sem08Json: String =
    """{"cube": "user_events",
      | "selectFields": [{"field": "Day"}, {"field": "Event Type"}, {"field": "Event Count"}, {"field": "Total Value"}],
      | "filterExpressions": [{"field": "Day", "operator": "between", "from": "2024-01-05", "to": "2024-01-15"}],
      | "timezone": "America/Los_Angeles"}""".stripMargin

  /** OR tree mixing a dim attribute and a fact-level (static-mapped)
    * column — unpushable by construction, evaluated post-join. */
  val sem09Json: String =
    """{"cube": "order_stats",
      | "selectFields": [{"field": "Market Segment"}, {"field": "Order Status"}, {"field": "Order Count"}, {"field": "Total Spend"}],
      | "filterExpressions": [{"operator": "or", "filterExpressions": [
      |   {"field": "Market Segment", "operator": "=", "value": "BUILDING"},
      |   {"field": "Order Status", "operator": "=", "value": "Pending"}]}]}""".stripMargin

  /** OuterFilter: applied on the final rendered result (display
    * values), not pushed into any scan. */
  val sem10Json: String =
    """{"cube": "order_stats",
      | "selectFields": [{"field": "Order Status"}, {"field": "Order Count"}],
      | "filterExpressions": [{"operator": "outer", "filter":
      |   {"field": "Order Status", "operator": "in", "values": ["Open", "Fulfilled"]}}]}""".stripMargin

  /** Union-view variant selection: Source Stage only exists on the
    * UNION ALL view, so the planner must pick it. */
  val sem11Json: String =
    """{"cube": "order_stats",
      | "selectFields": [{"field": "Source Stage"}, {"field": "Order Priority"}, {"field": "Order Count"}, {"field": "Total Spend"}]}""".stripMargin

  /** AverageRollup through the planner (single-stage: avg is not
    * re-aggregable). */
  val sem12Json: String =
    """{"cube": "order_stats",
      | "selectFields": [{"field": "Order Priority"}, {"field": "Avg Price"}, {"field": "Order Count"}],
      | "filterExpressions": [{"field": "Order Date", "operator": "between", "from": "1995-01-01", "to": "1996-12-31"}]}""".stripMargin

  /** SQL front door over the cube registry (MahaCalciteSqlParser
    * analogue): Catalyst parses the SQL, SqlFrontDoor translates the
    * restricted grammar to a ReportingRequest, and the normal
    * analyze/plan path runs it — aggregation implicit, display-value
    * filters reverse-mapped, same as the JSON door. */
  val sql02Text: String =
    """SELECT `Order Priority`, `Order Count`, `Total Spend`
      |FROM order_stats
      |WHERE `Order Date` BETWEEN '1995-01-01' AND '1996-12-31'
      |  AND `Order Status` IN ('Open', 'Fulfilled')
      |ORDER BY `Total Spend` DESC
      |LIMIT 3""".stripMargin

  /** Dimension-only listing (no metrics): the planner must eliminate
    * the fact scan and query the dim chain alone. */
  val sem13Json: String =
    """{"cube": "order_stats",
      | "selectFields": [{"field": "Market Segment"}, {"field": "Region Name"}]}""".stripMargin

  /** Hourly grain through the cube layer with a local timezone: the
    * Between bounds are local hours, converted to an exact half-open
    * UTC instant range; the rendered Hour is local-of-UTC. */
  val sem14Json: String =
    """{"cube": "user_events",
      | "selectFields": [{"field": "Hour"}, {"field": "Event Type"}, {"field": "Event Count"}],
      | "filterExpressions": [{"field": "Hour", "operator": "between", "from": "2024-01-05 00", "to": "2024-01-06 23"}],
      | "timezone": "America/Los_Angeles"}""".stripMargin

  /** Int-keyed static mapping: decode l_linenumber codes to display
    * values and reverse-filter on a named value AND the default (the
    * default matches every storage value outside the map). */
  val sem16Json: String =
    """{"cube": "line_stats",
      | "selectFields": [{"field": "Line Role"}, {"field": "Line Count"}, {"field": "Total Qty"}],
      | "filterExpressions": [{"field": "Line Role", "operator": "in", "values": ["Primary", "Additional"]}]}""".stripMargin

  /** filteringRequired exercised end-to-end: the guarded cube refuses
    * any request without a Customer Key filter (SemanticLayerSpec
    * covers the reject path); this green path carries the mandated IN
    * filter, which also forces the base variant and ships the IN list
    * into the fact scan. */
  val sem18Json: String =
    """{"cube": "order_stats_guarded",
      | "selectFields": [{"field": "Order Priority"}, {"field": "Order Count"}, {"field": "Total Spend"}],
      | "filterExpressions": [{"field": "Customer Key", "operator": "in",
      |   "values": ["1", "2", "5", "10", "20", "30", "40", "50"]}],
      | "sortBy": [{"field": "Order Priority", "order": "Asc"}]}""".stripMargin

  /** Minute grain, same shape. */
  val sem15Json: String =
    """{"cube": "user_events",
      | "selectFields": [{"field": "Minute"}, {"field": "Event Count"}, {"field": "Total Value"}],
      | "filterExpressions": [{"field": "Minute", "operator": "between", "from": "2024-01-05 10:00", "to": "2024-01-05 13:30"}],
      | "timezone": "America/Los_Angeles"}""".stripMargin

  import graft.curators.Curators

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sem01_rollup_select" -> (run(sem01Json) _),
    "sem02_snowflake_join" -> (run(sem02Json) _),
    "sem03_decode_reverse_filter" -> (run(sem03Json) _),
    "sem04_dim_driven_roj" -> (run(sem04Json) _),
    "sem05_fk_join_elimination" -> (run(sem05Json) _),
    "sem06_derived_metric" -> (run(sem06Json) _),
    "sem07_derived_hidden_inputs" -> (run(sem07Json) _),
    "sem08_utc_timezone" -> (run(sem08Json) _),
    "sem09_or_filter_tree" -> (run(sem09Json) _),
    "sem10_outer_filter" -> (run(sem10Json) _),
    "sem11_union_view" -> (run(sem11Json) _),
    "sem12_avg_rollup" -> (run(sem12Json) _),
    "sql02_cube_sql" -> (graft.analyzer.SqlFrontDoor.run(sql02Text, registry) _),
    "sql03_describe" -> (graft.analyzer.SqlFrontDoor.run("DESCRIBE order_stats", registry) _),
    "sem13_dim_only_listing" -> (run(sem13Json) _),
    "sem14_hourly_grain" -> (run(sem14Json) _),
    "sem15_minute_grain" -> (run(sem15Json) _),
    "sem16_int_decode" -> (run(sem16Json) _),
    "sem17_explain" -> (explainRequest(sem01Json) _),
    "sem18_filtering_required" -> (run(sem18Json) _),
    "cur01_timeshift" -> (Curators.timeShift(cur01Json, registry) _),
    "cur02_totalmetrics" -> (Curators.totalMetrics(sem01Json, registry) _),
    "cur03_rowcount" -> (Curators.rowCount(sem04Json, registry) _),
    "cur04_drilldown" -> (Curators.drillDown(cur04Json, "Order Status", 3, registry) _),
    "cur05_parallel_merge" -> (Curators.parallelMerge(cur01Json, registry) _),
  )

  val oracle: Map[String, String] = Map(
    "sem01_rollup_select" ->
      """SELECT o_orderpriority AS "Order Priority", COUNT(*) AS "Order Count",
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS "Total Spend"
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate <= TIMESTAMP '1996-12-31'
        |GROUP BY 1 ORDER BY "Total Spend" DESC, "Order Priority"""".stripMargin,
    "sem02_snowflake_join" ->
      """SELECT c_mktsegment AS "Market Segment", r_name AS "Region Name",
        | COUNT(*) AS "Order Count",
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS "Total Spend"
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1, 2 ORDER BY "Market Segment", "Region Name"""".stripMargin,
    "sem03_decode_reverse_filter" ->
      """SELECT CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Fulfilled'
        |  WHEN 'P' THEN 'Pending' ELSE 'Unknown' END AS "Order Status",
        | COUNT(*) AS "Order Count",
        | CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS "Max Price"
        |FROM orders WHERE o_orderstatus IN ('O', 'F')
        |GROUP BY 1 ORDER BY "Order Status"""".stripMargin,
    "sem04_dim_driven_roj" ->
      """SELECT c_name AS "Customer Name", f.cnt AS "Order Count", f.spend AS "Total Spend"
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, COUNT(*) AS cnt,
        |   CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
        |  FROM orders GROUP BY 1) f ON c_custkey = o_custkey
        |ORDER BY "Customer Name" LIMIT 50""".stripMargin,
    "sem05_fk_join_elimination" ->
      """SELECT o_custkey AS "Customer Key", COUNT(*) AS "Order Count",
        | COUNT(DISTINCT o_custkey) AS "Distinct Customers"
        |FROM orders GROUP BY 1 HAVING COUNT(*) > 3
        |ORDER BY "Customer Key"""".stripMargin,
    "sem06_derived_metric" ->
      """SELECT o_orderpriority AS "Order Priority", COUNT(*) AS "Order Count",
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS "Total Spend",
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS "Avg Order Value"
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate <= TIMESTAMP '1996-12-31'
        |GROUP BY 1 ORDER BY "Avg Order Value" DESC, "Order Priority"""".stripMargin,
    "sem07_derived_hidden_inputs" ->
      """SELECT CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Fulfilled'
        |  WHEN 'P' THEN 'Pending' ELSE 'Unknown' END AS "Order Status",
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS "Avg Order Value"
        |FROM orders GROUP BY 1 ORDER BY "Order Status"""".stripMargin,
    "sem08_utc_timezone" ->
      """SELECT strftime(date_trunc('day', ts - INTERVAL 8 HOUR), '%Y-%m-%d') AS "Day",
        | event_type AS "Event Type", COUNT(*) AS "Event Count",
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS "Total Value"
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 08:00:00' AND ts < TIMESTAMP '2024-01-16 08:00:00'
        |GROUP BY 1, 2 ORDER BY "Day", "Event Type"""".stripMargin,
    "sem09_or_filter_tree" ->
      """SELECT c_mktsegment AS "Market Segment",
        | CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Fulfilled'
        |  WHEN 'P' THEN 'Pending' ELSE 'Unknown' END AS "Order Status",
        | COUNT(*) AS "Order Count",
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS "Total Spend"
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' OR o_orderstatus = 'P'
        |GROUP BY 1, 2 ORDER BY "Market Segment", "Order Status"""".stripMargin,
    "sem10_outer_filter" ->
      """SELECT * FROM (
        | SELECT CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Fulfilled'
        |   WHEN 'P' THEN 'Pending' ELSE 'Unknown' END AS "Order Status",
        |  COUNT(*) AS "Order Count"
        | FROM orders GROUP BY 1) t
        |WHERE "Order Status" IN ('Open', 'Fulfilled')
        |ORDER BY "Order Status"""".stripMargin,
    "sem11_union_view" ->
      """SELECT stage AS "Source Stage", o_orderpriority AS "Order Priority",
        | COUNT(*) AS "Order Count",
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS "Total Spend"
        |FROM (
        | SELECT 'open' AS stage, o_orderpriority, o_totalprice FROM orders WHERE o_orderstatus = 'O'
        | UNION ALL
        | SELECT 'closed' AS stage, o_orderpriority, o_totalprice FROM orders WHERE o_orderstatus = 'F') t
        |GROUP BY 1, 2 ORDER BY "Source Stage", "Order Priority"""".stripMargin,
    "sem12_avg_rollup" ->
      """SELECT o_orderpriority AS "Order Priority",
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(o_totalprice) AS "Avg Price",
        | COUNT(*) AS "Order Count"
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate <= TIMESTAMP '1996-12-31'
        |GROUP BY 1 ORDER BY "Order Priority"""".stripMargin,
    "sem13_dim_only_listing" ->
      """SELECT DISTINCT c_mktsegment AS "Market Segment", r_name AS "Region Name"
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY "Market Segment", "Region Name"""".stripMargin,
    // America/Los_Angeles is UTC-8 (PST) throughout January: local
    // [2024-01-05 00, 2024-01-06 23] hours → UTC [05 08:00, 07 08:00)
    "sem14_hourly_grain" ->
      """SELECT strftime(date_trunc('hour', ts - INTERVAL 8 HOUR), '%Y-%m-%d %H') AS "Hour",
        | event_type AS "Event Type", COUNT(*) AS "Event Count"
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 08:00:00' AND ts < TIMESTAMP '2024-01-07 08:00:00'
        |GROUP BY 1, 2 ORDER BY "Hour", "Event Type"""".stripMargin,
    "sem15_minute_grain" ->
      """SELECT strftime(date_trunc('minute', ts - INTERVAL 8 HOUR), '%Y-%m-%d %H:%M') AS "Minute",
        | COUNT(*) AS "Event Count",
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS "Total Value"
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 18:00:00' AND ts < TIMESTAMP '2024-01-05 21:31:00'
        |GROUP BY 1 ORDER BY "Minute"""".stripMargin,
    "sem16_int_decode" ->
      """SELECT CASE l_linenumber WHEN 1 THEN 'Primary' WHEN 2 THEN 'Secondary'
        |  ELSE 'Additional' END AS "Line Role",
        | COUNT(*) AS "Line Count",
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS "Total Qty"
        |FROM lineitem
        |WHERE l_linenumber = 1 OR l_linenumber NOT IN (1, 2)
        |GROUP BY 1 ORDER BY "Line Role"""".stripMargin,
    "sem18_filtering_required" ->
      """SELECT o_orderpriority AS "Order Priority", COUNT(*) AS "Order Count",
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS "Total Spend"
        |FROM orders
        |WHERE o_custkey IN (1, 2, 5, 10, 20, 30, 40, 50)
        |GROUP BY 1 ORDER BY "Order Priority"""".stripMargin,
    "sql02_cube_sql" ->
      """SELECT o_orderpriority AS "Order Priority", COUNT(*) AS "Order Count",
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS "Total Spend"
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate <= TIMESTAMP '1996-12-31'
        | AND o_orderstatus IN ('O', 'F')
        |GROUP BY 1 ORDER BY "Total Spend" DESC, "Order Priority" LIMIT 3""".stripMargin,
    // EXPLAIN is planner metadata, so its oracle is the golden
    // decision record — any drift in variant ranking, costs, or the
    // chosen plan's shape flags fails the hash.
    "sem17_explain" ->
      """SELECT * FROM (VALUES
        | ('orders_by_priority_day_rollup', CAST(10 AS BIGINT), CAST(10 AS BIGINT), TRUE, FALSE, FALSE),
        | ('orders_union_view', 20, 20, FALSE, CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN)),
        | ('orders_base', 100, 100, FALSE, NULL, NULL)
        |) AS t(variant, est_cost, static_cost, chosen, two_stage, dim_paged)
        |ORDER BY est_cost, static_cost, variant""".stripMargin,
    // DESCRIBE is config metadata, so its oracle is the golden field
    // listing itself — any drift in the cube's public surface (fields,
    // kinds, data types, allowed ops) fails the hash.
    "sql03_describe" ->
      """SELECT * FROM (VALUES
        | ('Avg Order Value','Fact','Number',NULL,'<,=,>','Derived',CAST(NULL AS VARCHAR)),
        | ('Avg Price','Fact','Number',NULL,'<,=,>','Avg',NULL),
        | ('Customer Key','Dimension','String',NULL,'<,<>,=,>,BETWEEN,IN,IS NOT NULL,IS NULL,LIKE,NOT IN,NOT LIKE',NULL,NULL),
        | ('Customer Name','Dimension','String','customer','<,<>,=,>,BETWEEN,IN,IS NOT NULL,IS NULL,LIKE,NOT IN,NOT LIKE',NULL,NULL),
        | ('Distinct Customers','Fact','Number',NULL,'<,=,>','CountDistinct',NULL),
        | ('Market Segment','Dimension','String','customer','<,<>,=,>,BETWEEN,IN,IS NOT NULL,IS NULL,LIKE,NOT IN,NOT LIKE',NULL,NULL),
        | ('Max Price','Fact','Number',NULL,'<,=,>','Max',NULL),
        | ('Nation Key','Dimension','String','customer','<,<>,=,>,BETWEEN,IN,IS NOT NULL,IS NULL,LIKE,NOT IN,NOT LIKE',NULL,NULL),
        | ('Nation Name','Dimension','String','nation','<,<>,=,>,BETWEEN,IN,IS NOT NULL,IS NULL,LIKE,NOT IN,NOT LIKE',NULL,NULL),
        | ('Order Count','Fact','Number',NULL,'<,=,>','Count',NULL),
        | ('Order Date','Dimension','Date',NULL,'=,BETWEEN,IN',NULL,NULL),
        | ('Order Priority','Dimension','String',NULL,'<,<>,=,>,BETWEEN,IN,IS NOT NULL,IS NULL,LIKE,NOT IN,NOT LIKE',NULL,NULL),
        | ('Order Status','Dimension','Enum',NULL,'<,<>,=,>,BETWEEN,IN,IS NOT NULL,IS NULL,LIKE,NOT IN,NOT LIKE',NULL,NULL),
        | ('Region Name','Dimension','String','region','<,<>,=,>,BETWEEN,IN,IS NOT NULL,IS NULL,LIKE,NOT IN,NOT LIKE',NULL,NULL),
        | ('Source Stage','Dimension','String',NULL,'<,<>,=,>,BETWEEN,IN,IS NOT NULL,IS NULL,LIKE,NOT IN,NOT LIKE',NULL,NULL),
        | ('Total Spend','Fact','Number',NULL,'<,=,>','Sum',NULL),
        | ('Urgent Spend','Fact','Number',NULL,'<,=,>','Sum',NULL)
        |) AS t(field, kind, "dataType", dimension, "filterOps", rollup, "restrictedTo")
        |ORDER BY field""".stripMargin,
    "cur05_parallel_merge" ->
      """WITH cur AS (
        | SELECT o_orderpriority AS "Order Priority",
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS "Total Spend"
        | FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1996-02-01' AND o_orderdate <= TIMESTAMP '1996-07-31'
        | GROUP BY 1),
        |tot AS (
        | SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS "Total Spend Total"
        | FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1996-02-01' AND o_orderdate <= TIMESTAMP '1996-07-31'),
        |rc AS (SELECT COUNT(*) AS "Result Rows" FROM cur)
        |SELECT cur."Order Priority", cur."Total Spend",
        | tot."Total Spend Total", rc."Result Rows"
        |FROM cur, tot, rc ORDER BY "Order Priority"""".stripMargin,
    "cur01_timeshift" ->
      """WITH cur AS (
        | SELECT o_orderpriority AS p, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS v
        | FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1996-02-01' AND o_orderdate <= TIMESTAMP '1996-07-31'
        | GROUP BY 1),
        |prev AS (
        | SELECT o_orderpriority AS p, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS v
        | FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1995-08-03' AND o_orderdate <= TIMESTAMP '1996-01-31'
        | GROUP BY 1)
        |SELECT cur.p AS "Order Priority", cur.v AS "Total Spend",
        | prev.v AS "Total Spend Prev",
        | CASE WHEN prev.v IS NOT NULL AND prev.v <> 0
        |   THEN round((cur.v - prev.v) / prev.v * 100, 4) END AS "Total Spend Pct Change"
        |FROM cur LEFT JOIN prev ON cur.p = prev.p
        |ORDER BY "Order Priority"""".stripMargin,
    "cur02_totalmetrics" ->
      """SELECT COUNT(*) AS "Order Count",
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS "Total Spend"
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate <= TIMESTAMP '1996-12-31'""".stripMargin,
    "cur03_rowcount" ->
      """SELECT COUNT(*) AS totalrows FROM customer""".stripMargin,
    "cur04_drilldown" ->
      """WITH agg AS (
        | SELECT o_orderpriority AS p, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS v
        | FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate <= TIMESTAMP '1996-12-31'
        | GROUP BY 1),
        |top3 AS (SELECT p FROM agg ORDER BY v DESC, p LIMIT 3)
        |SELECT o_orderpriority AS "Order Priority",
        | CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Fulfilled'
        |  WHEN 'P' THEN 'Pending' ELSE 'Unknown' END AS "Order Status",
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS "Total Spend"
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate <= TIMESTAMP '1996-12-31'
        | AND o_orderpriority IN (SELECT p FROM top3)
        |GROUP BY 1, 2 ORDER BY "Order Priority", "Order Status"""".stripMargin,
  )
}
