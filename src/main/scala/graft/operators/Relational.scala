package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables._

/** Core relational operator inventory (SURVEY.md §2), Spark-first.
  *
  * Each query re-expresses a capability of the reference engine
  * (yahoo/maha) as a declarative Spark plan; citations point into
  * /root/reference. Every query has a DuckDB oracle in [[oracle]] with
  * identical column names and identical (decimal-exact) arithmetic.
  *
  * Scale notes (100 TB design intent, verified via .explain on sf0.1):
  *  - dimension tables (region/nation/supplier, static-mapping decodes)
  *    are broadcast; fact⋈fact joins shuffle on join keys and rely on
  *    AQE for skew splitting.
  *  - aggregates are declared on top of the scan so Catalyst performs
  *    map-side partial aggregation before any shuffle.
  *  - the agg-before-join ("outer group by" of
  *    OracleOuterGroupByQueryGenerator.scala:36) shape is built
  *    explicitly: aggregate the fact to the join key's grain FIRST,
  *    then join dimensions — the join input is |groups|, not |fact|.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-shaped pricing summary: grouped rollups with
    * Sum/Avg/Count (RollupExpression.scala:29-33) and a pushed-down
    * date filter. Filter + column pruning reach the parquet scan. */
  def q01(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
          * (lit(1) + rate(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(rate(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Full filter-operation vocabulary on one scan: In / Not In /
    * Between / Like / Not Like / <> / > / < (FilterOperation.scala:37-54).
    * All predicates are Catalyst `Column` ops → pushed to parquet. */
  def q02(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderstatus").isin("O", "F")
        && !col("o_orderpriority").isin("5-LOW")
        && col("o_orderpriority") =!= "4-NOT SPECIFIED"
        && col("o_totalprice") > 1000 && col("o_totalprice") < 400000
        && col("o_orderdate").between(lit("1995-01-01"), lit("1996-12-31"))
        && col("o_orderpriority").like("%-%")
        && !col("o_orderpriority").like("%URGENT%"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy("o_orderkey")

  /** Star join (cube = fact + FK'd dims, Fact.scala:438): lineitem ⋈
    * orders ⋈ customer ⋈ nation ⋈ region, revenue per nation.
    * nation/region broadcast (tiny); customer/orders shuffle-join at
    * scale. Equivalent of maha's fact-dim SQL join + MultiEngineQuery
    * API join collapsed into one plan (QueryPipeline.scala:282-348). */
  def q03(s: SparkSession, d: String): DataFrame = {
    val rev = (dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
    lineitem(s, d)
      .join(orders(s, d).filter(col("o_orderdate") >= lit("1995-01-01")
          && col("o_orderdate") < lit("1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  /** Agg-before-join ("outer group by",
    * OracleOuterGroupByQueryGenerator.scala:36): the fact is aggregated
    * to the FK grain before the dimension join, then re-grouped on the
    * dim attribute. At 100 TB the join input shrinks from |lineitem| to
    * |orders|. */
  def q04(s: SparkSession, d: String): DataFrame = {
    val lineAgg = lineitem(s, d).groupBy("l_orderkey")
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
        .as("order_rev_dec"))
    lineAgg
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(sum(col("order_rev_dec")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  /** Top-K (Druid TopN strength reduction,
    * DruidQueryGenerator.scala:418-463) → Spark TakeOrderedAndProject
    * via orderBy+limit; deterministic tie-break on the key. */
  def q05(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_orderkey")
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
        .cast("double").as("revenue"),
        sum(dec2(col("l_quantity"))).cast("double").as("total_qty"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)

  /** Time-series query (Druid Timeseries,
    * DruidQueryGenerator.scala:465-490; grain model Grain.scala:30):
    * monthly grain via date_trunc. */
  def q06(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
        .as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy("month")

  /** Pagination with stable total row count: ROW_NUMBER page +
    * Count(*) OVER() TOTALROWS (OracleQueryCommon.scala:35-41).
    *
    * Scale shape: a naive global ROW_NUMBER window moves the whole
    * table to one partition. Instead the top (start+pageSize) rows are
    * fetched distributed (orderBy+limit → TakeOrderedAndProject), the
    * window numbers only those ≤20 rows, and TOTALROWS is a separate
    * scalar count aggregate (fully map-side combined) broadcast onto
    * the page — both sides scan-prunable and partition-parallel. */
  def q07(s: SparkSession, d: String): DataFrame = {
    val startIndex = 10; val pageSize = 10
    val total = customer(s, d).agg(count(lit(1)).as("totalrows"))
    val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer(s, d)
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(startIndex + pageSize)
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") > startIndex)
      .crossJoin(broadcast(total))
      .select("c_custkey", "c_name", "c_acctbal", "rn", "totalrows")
      .orderBy("rn")
  }

  /** UnionView (fact/View.scala:24-80): UNION ALL of per-stage
    * sub-facts with injected constant stage columns
    * (QueryPipeline.scala:389 nextStage). */
  def q08(s: SparkSession, d: String): DataFrame = {
    def stage(status: String, label: String): DataFrame =
      orders(s, d).filter(col("o_orderstatus") === status)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("o_totalprice"))).cast("double").as("total"))
        .withColumn("stage", lit(label))
        .select("stage", "o_orderpriority", "n", "total")
    stage("O", "open").unionByName(stage("F", "closed"))
      .orderBy("stage", "o_orderpriority")
  }

  /** DISTINCT dim-only query (RequestModel.scala:155
    * isRequestingDistict). */
  def q09(s: SparkSession, d: String): DataFrame =
    customer(s, d).select("c_mktsegment", "c_nationkey").distinct()
      .orderBy("c_mktsegment", "c_nationkey")

  /** Filtered rollups (DruidFilteredRollup,
    * RollupExpression.scala:71-81): sum/count over a predicate via
    * sum(CASE WHEN …). */
  def q10(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_linestatus")
      .agg(
        sum(when(col("l_returnflag") === "R", dec2(col("l_quantity"))))
          .cast("double").as("returned_qty"),
        sum(when(col("l_returnflag") === "A", dec2(col("l_quantity"))))
          .cast("double").as("ack_qty"),
        count(when(col("l_discount") > 0.05, lit(1))).as("n_discounted"),
        count(lit(1)).as("n_total"))
      .orderBy("l_linestatus")

  /** Exact COUNT DISTINCT rollup (CountRollup + distinct;
    * DerivedExpression COUNT_DISTINCT, e.g. Hive :536-571). */
  def q11(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_suppkey")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_suppkey")

  /** Static-mapping DECODE (DataType.scala:43-64 StaticMapping;
    * DECODE_DIM DerivedExpression Oracle :794-812): display values
    * projected, filter reverse-mapped to storage values
    * (hasUniqueStaticMapping DataType.scala:45). */
  def q12(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderstatus").isin("O", "F"))
      .groupBy(when(col("o_orderstatus") === "O", "Open")
        .when(col("o_orderstatus") === "F", "Fulfilled")
        .when(col("o_orderstatus") === "P", "Pending")
        .otherwise("Unknown").as("status_display"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total"))
      .orderBy("status_display")

  /** Scalar-function vocabulary (§2.8: ROUND/NVL/TRIM/REGEX/DECODE/
    * TO_CHAR analogues, DerivedExpression.scala) as codegen'd native
    * functions — no UDFs. */
  def q13(s: SparkSession, d: String): DataFrame =
    part(s, d).select(
      col("p_partkey"),
      upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
      lower(col("p_brand")).as("brand_lower"),
      length(col("p_type")).cast("bigint").as("type_len"),
      regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_first_word"),
      coalesce(nullif(col("p_brand"), lit("Brand#1")), lit("other")).as("brand_nvl"),
      concat_ws("-", col("p_brand"), col("p_size")).as("brand_size"),
      (dec2(col("p_retailprice")) * rate(lit(0.9))).cast("double").as("discounted_price"))
      .orderBy("p_partkey")

  /** HAVING on aggregates (Druid HavingSpec
    * DruidQueryGenerator.scala:503-508; OGB having
    * OracleOuterGroupByQueryGenerator.scala:77). */
  def q14(s: SparkSession, d: String): DataFrame =
    orders(s, d).groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total"))
      .filter(col("n_orders") >= 4 && col("total") > 100000)
      .orderBy("o_custkey")

  /** TimeShift curator (TimeShiftCurator.scala:49): current vs
    * previous period per dim with Pct Change — one scan, two filtered
    * rollups (no self-join needed in Spark). */
  def q15(s: SparkSession, d: String): DataFrame = {
    val cur = sum(when(col("o_orderdate") >= lit("1996-01-01")
      && col("o_orderdate") < lit("1997-01-01"), dec2(col("o_totalprice"))))
    val prev = sum(when(col("o_orderdate") >= lit("1995-01-01")
      && col("o_orderdate") < lit("1996-01-01"), dec2(col("o_totalprice"))))
    orders(s, d).groupBy("o_orderpriority")
      .agg(coalesce(cur, lit(0)).cast("double").as("total_cur"),
        coalesce(prev, lit(0)).cast("double").as("total_prev"))
      .withColumn("pct_change",
        when(col("total_prev") =!= 0,
          round((col("total_cur") - col("total_prev")) / col("total_prev") * 100, 4)))
      .orderBy("o_orderpriority")
  }

  /** TotalMetrics curator (TotalMetricsCurator.scala): grand totals,
    * no group-by. */
  def q16(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
      sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"),
      count(lit(1)).as("n_lines"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("first_ship"),
      date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("last_ship"))

  /** Drilldown curator (DrilldownCurator.scala): finer-grain re-group
    * with parent share via a window aggregate over the coarse dim.
    * Window-SUM runs on exact decimals (order-insensitive). */
  def q17(s: SparkSession, d: String): DataFrame = {
    val agg = orders(s, d).groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"), sum(dec2(col("o_totalprice"))).as("tot_dec"))
    val w = Window.partitionBy("o_orderpriority")
    agg.withColumn("parent_dec", sum(col("tot_dec")).over(w))
      .select(col("o_orderpriority"), col("o_orderstatus"), col("n"),
        col("tot_dec").cast("double").as("total"),
        (col("tot_dec").cast("double") / col("parent_dec").cast("double"))
          .as("share_of_priority"))
      .orderBy("o_orderpriority", "o_orderstatus")
  }

  /** Field-to-field comparison predicate (FieldEqualityFilter
    * FilterOperation.scala:287, generalized to >): join + cross-column
    * compare l_quantity > p_size. */
  def q18(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(col("l_quantity") > col("p_size"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"),
        sum(dec2(col("l_quantity"))).cast("double").as("qty"))
      .orderBy("p_brand")

  /** Pagination via offset/limit (paginationStartIndex + rowsPerPage,
    * ReportingRequest.scala:68-69; ROWNUM wrappers
    * OracleQueryCommon.scala:38-41). */
  def q19(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .offset(20).limit(10)

  /** OuterFilter (FilterOperation.scala:141): predicate applied on the
    * final joined result rather than pushed into either side. */
  def q20(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"), "left_outer")
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 0)
      .select(col("o_orderkey"), col("o_totalprice"), col("c_name"),
        col("c_mktsegment"))
      .orderBy("o_orderkey")

  /** DateTimeBetween filter (FilterOperation.scala:161) + hourly/daily
    * grain bucketing on the events table (HourlyGrain Grain.scala:102). */
  def q21(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("ts") >= lit("2024-01-05 06:30:00")
        && col("ts") < lit("2024-01-20 18:45:00"))
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec6(col("value"))).cast("double").as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("day", "event_type")

  /** IN-subquery / semi-join — maha's MultiEngineQuery IN-list shipping
    * (QueryPipeline.scala:921-932), routed through [[KeyShip]]'s
    * size-based carrier decision: below the literal threshold the key
    * set ships as a pushed `In` at the scan, above it as the Bloom
    * probe + exact semi — the oversized regime is automatic wherever
    * the engine ships keys, not just in q46's dedicated query. */
  def q22(s: SparkSession, d: String): DataFrame = {
    val bigOrders = orders(s, d).filter(col("o_totalprice") > 300000)
      .select("o_orderkey")
    // the served-engine shape: the key side's table cardinality is
    // already known (footer/manifest metadata), so the carrier
    // decision costs ZERO driver jobs — no limit-probe, no
    // distinct-count — and lands directly on the broadcast-semi /
    // bloom choice bloomDecision makes from the estimate
    KeyShip.semiShip(lineitem(s, d), "l_orderkey", bigOrders, "o_orderkey",
      keyRows = Some(graft.core.Tables.tableRows(s, d, "orders")))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("price_sum"))
      .orderBy("l_returnflag")
  }

  /** Dim-driven right-outer join (publicDimToJoinTypeMap
    * RequestModel.scala:180-228: dim-driven → fact ROJ dim) with
    * IsNull/IsNotNull on the outer side + NVL defaults. */
  def q23(s: SparkSession, d: String): DataFrame = {
    val factAgg = orders(s, d).groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total"))
    factAgg
      .join(customer(s, d).filter(col("c_nationkey") < 10),
        col("o_custkey") === col("c_custkey"), "right_outer")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        coalesce(col("total"), lit(0.0)).as("total"),
        col("n").isNotNull.as("has_orders"))
      .orderBy("c_custkey")
  }

  /** As-of join (point-in-time correctness for feature/label joins —
    * the operator TPC-style engines bolt on for time-series work):
    * each purchase event is joined to the SAME USER's most recent
    * click at-or-before the purchase time.
    *
    * Spark-first shape: instead of a per-row range probe (quadratic)
    * or an interval join (state proportional to the band width), both
    * sides are UNIONed with a side tag and a single
    * partitionBy(user).orderBy(time, side, id) running
    * `last(_, ignoreNulls)` window carries the latest click forward
    * onto every purchase row. One shuffle-sort on the join key, zero
    * joins, bounded state — the plan survives any corpus size and any
    * click/purchase ratio. Ties: a click at exactly the purchase
    * timestamp qualifies (side 0 sorts first); among same-µs clicks
    * the highest event_id wins (window order is ascending, `last`
    * takes the latest). */
  def q30(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
    // the click's (id, value) travel as ONE struct (null only on
    // purchase rows): a single last(_, ignoreNulls) then can never
    // pair one click's id with an earlier click's value when the
    // latest click carries a NULL value — two independent ignoreNulls
    // windows would
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), lit(0).as("side"),
        struct(col("event_id").as("cid"), col("value").as("cval")).as("click"),
        lit(null).cast("bigint").as("purchase_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), lit(1).as("side"),
        lit(null).cast("struct<cid:bigint,cval:double>").as("click"),
        col("event_id").as("purchase_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("side"), col("click").getField("cid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("asof", last(col("click"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("purchase_id"), col("user_id"), col("us").as("purchase_us"),
        col("asof").getField("cid").as("asof_click_id"),
        col("asof").getField("cval").as("asof_click_value"))
      .orderBy("purchase_id")
  }

  /** One-pass hierarchical totals via ROLLUP grouping sets (the
    * reference computes grand totals with a SECOND query through the
    * TotalMetricsCurator, TotalMetricsCurator.scala — grouping sets
    * fold subtotal + total grains into the SAME scan and shuffle,
    * which at 100 TB halves the fact reads). grouping_id()
    * disambiguates subtotal rows from genuine NULL keys. */
  def q31(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).join(customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn("yr", year(col("o_orderdate")))
    o.rollup(col("n_name"), col("yr"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast("double").as("revenue"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("n_name"), col("yr"))
  }

  /** CUBE grouping sets (all four grains of priority × status in ONE
    * scan + shuffle — q31's ROLLUP covers the hierarchical subset;
    * CUBE adds the cross-grain subtotals a pivot-style dashboard asks
    * for). grouping() flags distinguish subtotal rows from genuine
    * NULL keys, exactly as GROUPING does cross-engine. */
  def q38(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast("double").as("revenue"),
        grouping(col("o_orderpriority")).cast("bigint").as("g_priority"),
        grouping(col("o_orderstatus")).cast("bigint").as("g_status"))
      .orderBy(col("g_priority"), col("g_status"),
        col("o_orderpriority"), col("o_orderstatus"))

  /** Explicit GROUPING SETS — the hand-picked lattice next to q31's
    * ROLLUP and q38's CUBE: ((priority, status), (priority), ()) skips
    * the (status)-only slice a CUBE would compute, which is exactly
    * what a serving layer does when one rollup axis is never queried
    * alone. Still ONE pass with per-set partial aggregation (Spark
    * expands sets before the exchange — no per-set rescans). */
  def q40(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderpriority")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast("double").as("revenue"),
        grouping(col("o_orderpriority")).cast("bigint").as("g_priority"),
        grouping(col("o_orderstatus")).cast("bigint").as("g_status"))
      .orderBy(col("g_priority"), col("g_status"),
        col("o_orderpriority"), col("o_orderstatus"))

  /** Analytic-window battery over a day-grain pre-aggregate: lag,
    * running total, 7-day moving average (reference's analytic columns
    * ride ROW_NUMBER only; lead/lag/frames round out §2.5).
    *
    * Scale shape: aggregate to date grain FIRST (one partial-agg
    * shuffle, output ≤ 365 rows here and bounded by the calendar at
    * any corpus size), then run the unpartitioned window over the tiny
    * aggregate — the single-partition sort everyone fears in a global
    * window is over days, not raw rows. The moving average divides the
    * exact decimal frame sum by the frame count in DOUBLE at the end,
    * so both engines compute bit-identical values. */
  def q32(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(dec2(col("o_totalprice"))).as("rev"))
    val w = Window.orderBy("day")
    val w7 = w.rowsBetween(-6, Window.currentRow)
    daily.select(col("day"),
      col("rev").cast("double").as("revenue"),
      lag(col("rev"), 1).over(w).cast("double").as("prev_revenue"),
      sum(col("rev")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("running_total"),
      (sum(col("rev")).over(w7).cast("double") / count(lit(1)).over(w7)).as("ma7"))
      .orderBy("day")
  }

  /** RANGE-frame window over event TIME (q32's frames are ROWS-based):
    * 7-day moving revenue per order priority, where the frame is
    * `RANGE BETWEEN 6 PRECEDING AND CURRENT ROW` on the day number —
    * on a daily series with gaps, a rows-frame silently widens the
    * window to whatever 7 rows span, while the range-frame stays a
    * true calendar week (this corpus has gap days per priority, so the
    * two genuinely differ). Scale discipline: the window runs over the
    * pre-aggregated per-(priority, day) series — thousands of rows
    * regardless of fact size — never over the order stream, and
    * partitioning by priority keeps even that series off a single
    * task. */
  def q39(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1995-07-01")
      .groupBy(col("o_orderpriority").as("pri"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("day"))
      .agg(sum(dec2(col("o_totalprice"))).as("rev"))
    val w = Window.partitionBy("pri").orderBy("day").rangeBetween(-6, 0)
    daily.select(col("pri"), col("day").cast("bigint").as("day"),
      col("rev").cast("double").as("revenue"),
      sum(col("rev")).over(w).cast("double").as("rev7"),
      count(lit(1)).over(w).cast("bigint").as("days_present7"))
      .orderBy("pri", "day")
  }

  /** Anti join (NOT EXISTS): customers with no 1995 order, by market
    * segment — the complement of q22's semi join. Plans as a broadcast
    * or shuffled hash LEFT ANTI on the key (never a nested loop): the
    * order-key side aggregates away dupes in the join itself, and the
    * customer scan prunes to the three output-feeding columns. */
  def q33(s: SparkSession, d: String): DataFrame = {
    val active = orders(s, d)
      .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01")
      .select("o_custkey")
    customer(s, d)
      .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("mktsegment"))
      .agg(count(lit(1)).as("n_inactive"),
        sum(dec2(col("c_acctbal"))).cast("double").as("acctbal_sum"))
      .orderBy("mktsegment")
  }

  /** PIVOT / crosstab (the report layout every BI front end renders):
    * monthly order counts and spend pivoted by order status. The
    * pivoted statuses are DECLARED (`Seq("O","F","P")`), not
    * discovered, so the plan is a single partial-aggregated groupBy
    * with conditional aggregates — no second pass to collect the pivot
    * domain, no wide-row skew; exactly what the oracle expresses as
    * CASE sums. */
  def q36(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("month",
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd"))
      .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01")
      .groupBy("month")
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("spend"))
      .na.fill(0L, Seq("O_n", "F_n", "P_n"))
      .orderBy("month")

  /** Correlated scalar subquery: customers whose account balance beats
    * their NATION's average — the remaining §2.2 predicate surface
    * after semi (q22) and anti (q33) joins. Expressed through the SQL
    * front door so Catalyst's subquery decorrelation runs: it rewrites
    * the per-row subquery into ONE aggregate of customer by nation
    * joined back — no per-row re-execution, the shape you want when
    * the outer side is 100 TB. */
  def q35(s: SparkSession, d: String): DataFrame = {
    // view name keyed by the data dir: temp views are session-global, so
    // concurrent q35 calls against different dirs (the parallel request
    // coordinator does this) must not race on one shared name — md5 of
    // the path, since 32-bit String.hashCode collisions would put two
    // dirs back on one name
    val view = "q35_customer_" + java.security.MessageDigest
      .getInstance("MD5").digest(d.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    customer(s, d).createOrReplaceTempView(view)
    s.sql(
      s"""SELECT c_custkey, c_nationkey, c_acctbal,
         |  (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
         |   FROM $view c2 WHERE c2.c_nationkey = c1.c_nationkey) AS nation_avg
         |FROM $view c1
         |WHERE c_acctbal > 2 * (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
         |                       FROM $view c2 WHERE c2.c_nationkey = c1.c_nationkey)
         |ORDER BY c_custkey""".stripMargin)
  }

  /** INTERSECT / EXCEPT (§2.7 beyond the reference's UNION-only set
    * ops): customers ordering in both 1995 and 1996, and in 1995 only.
    * Both set ops hash-aggregate on the key — one shuffle each, no
    * sort — and the two branches reuse the same scan (Catalyst reuses
    * the exchange). */
  def q34(s: SparkSession, d: String): DataFrame = {
    def custsIn(year: Int) = orders(s, d)
      .filter(col("o_orderdate") >= s"$year-01-01" && col("o_orderdate") < s"${year + 1}-01-01")
      .select(col("o_custkey"))
    val both = custsIn(1995).intersect(custsIn(1996))
      .withColumn("segment", lit("both"))
    val only95 = custsIn(1995).except(custsIn(1996))
      .withColumn("segment", lit("only_1995"))
    both.unionByName(only95)
      .select(col("segment"), col("o_custkey"))
      .orderBy("segment", "o_custkey")
  }

  /** Rank-function battery (the remaining §2.5 window vocabulary after
    * q07's row_number pagination and q32's frames): quartile buckets,
    * percent_rank and cume_dist of customer balance within nation.
    * Fully deterministic — the window ORDER BY tie-breaks on the key,
    * and both rank fractions are one integer-ratio division, so the
    * doubles match bit-for-bit cross-engine. One shuffle on the
    * partition key; at 100 TB the per-nation sort is the partitioned
    * shuffle-sort Spark already does for any windowed agg. */
  def q37(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(desc("c_acctbal"), col("c_custkey"))
    customer(s, d)
      .filter(col("c_nationkey") < 5)
      .select(col("c_custkey"), col("c_nationkey"),
        col("c_acctbal").cast("double").as("acctbal"),
        ntile(4).over(w).cast("bigint").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("c_nationkey", "c_custkey")
  }

  /** Z-order layout round-trip (`core/Layout`): write a Z-ordered copy
    * of lineitem clustered on (l_partkey, l_suppkey) — bit-interleaved
    * 16-bit buckets, `repartitionByRange` + sort on the Z-value — then
    * answer a two-dimensional selective box query FROM THE COPY. The
    * oracle runs the identical predicate on the ORIGINAL table: a
    * physical-layout op must be invisible to results, and that
    * invariance is exactly what this row pins. The payoff is in the
    * footer stats: every file covers a small (partkey × suppkey)
    * rectangle, so the box scan prunes most files on EITHER dimension
    * (measured in LayoutSpec: ~4× fewer files read than a
    * single-column linear sort for the off-sort-axis predicate). At
    * 100 TB this is the one-time OPTIMIZE pass amortized over every
    * subsequent multi-dimension scan; here the copy is written once
    * per (session, dir) and the write cost is honestly inside the
    * benched query. */
  def q41(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.Caches.memoObj(s, s"zorder|$d") {
      val path = graft.core.TempDirs.scratchShared("zorder")
      graft.core.Layout.writeZOrdered(
        lineitem(s, d).select("l_orderkey", "l_partkey", "l_suppkey",
          "l_returnflag", "l_quantity", "l_extendedprice"),
        path, Seq("l_partkey", "l_suppkey"), numFiles = 32)
      path
    }
    s.read.parquet(dir)
      .filter(col("l_partkey").between(1, 50) &&
        col("l_suppkey").between(1, 5))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"))
      .orderBy("l_returnflag")
  }

  /** Copy-on-write mutation round-trip (`core/TxnTable`): a
    * key-addressed table (range-clustered on o_orderkey so footer
    * stats prune the rewrite set) takes a GDPR-style key DELETE and
    * an UPSERT (two replaced keys + one insert), each committed as a
    * new manifest version; the query aggregates the LATEST snapshot.
    * The oracle replays the same mutations relationally (anti-join
    * the deleted/replaced keys, union the upserts) on the original
    * table — so the hash gate covers delete completeness, upsert
    * atomicity (no duplicate keys, no lost rows) and snapshot
    * correctness in one row. Mutation cost is in the benched query:
    * at 100 TB a delete of k keys rewrites O(files-containing-k)
    * range-clustered files, never the table (TxnTableSpec pins the
    * strict-subset rewrite + by-reference carry-over). */
  /** The mutated copy-on-write table q42/q43 share: init (v1) →
    * GDPR-style key delete (v2) → upsert of two replacements + one
    * insert (v3). Built once per (session, dir). */
  private def cowTable(s: SparkSession, d: String): String =
    graft.core.Caches.memoObj(s, s"cow|$d") {
      val path = graft.core.TempDirs.scratchShared("cow")
      graft.core.TxnTable.init(s, path,
        orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
          .repartitionByRange(16, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"),
        numFiles = 0, // keep the range clustering — it IS the point
        statsCols = Seq("o_orderkey")) // manifest-carried rewrite pruning
      graft.core.TxnTable.deleteKeys(s, path, "o_orderkey",
        Seq(1L, 3L, 5L, 7L))
      import s.implicits._
      graft.core.TxnTable.upsert(s, path, "o_orderkey",
        Seq((2L, "X", 100.0), (4L, "X", 200.0), (10000000L, "X", 300.0))
          .toDF("o_orderkey", "o_orderstatus", "o_totalprice"))
      path
    }

  def q42(s: SparkSession, d: String): DataFrame = {
    val dir = cowTable(s, d)
    graft.core.TxnTable.read(s, dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey")).cast("bigint").as("key_sum"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy("o_orderstatus")
  }

  /** CDC read over the mutated table (`TxnTable.changes`, the
    * lakehouse `table_changes` surface): net row-level changes between
    * v1 (pre-mutation) and the latest snapshot, computed from the
    * MANIFEST FILE DIFF — only files added/removed across the commits
    * are opened, carried-by-reference files never are, and identical
    * rows inside rewritten files cancel via multiset difference (one
    * hash aggregate over the delta, no join). Net result: the four
    * deleted keys + the two replaced keys' old rows as 'delete', the
    * three upserted rows as 'insert'. The oracle replays the same
    * mutations relationally. At 100 TB this is how a downstream
    * consumer (serving-store sync, incremental index refresh) follows
    * a mutating table at O(commit delta), never O(table). */
  def q43(s: SparkSession, d: String): DataFrame = {
    val dir = cowTable(s, d)
    graft.core.TxnTable.changes(s, dir, fromV = 1)
      .groupBy("_change_type")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey")).cast("bigint").as("key_sum"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy("_change_type")
  }

  /** CDC FOLLOWER (`TxnTable.changes` + `applyCdcDelta`): a downstream
    * rollup follows a mutating table across THREE commits by applying
    * per-version change sets — never rescanning the table. The
    * version number is the stream offset (exactly the Delta CDF
    * consumer contract): the follower holds (lastApplied, rollup),
    * and each poll folds `changes(lastApplied, v)` into the rollup;
    * in production the pair is persisted together (the st05
    * `v<N>-b<bid>` sink discipline) so recovery is a manifest read.
    * Work per poll is O(commit delta) + a merge keyed on the small
    * rollup. The oracle replays all three mutations relationally and
    * aggregates the final state — so the row pins the whole follower
    * loop (delete, upsert-with-replacement, delete-of-an-upserted-row)
    * against an independent engine, while TxnTableSpec separately pins
    * delta-application ≡ recompute exactness. */
  def q44(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.Caches.memoObj(s, s"cdcfollow|$d") {
      val path = graft.core.TempDirs.scratchShared("cdcfollow")
      graft.core.TxnTable.init(s, path,
        orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
          .repartitionByRange(16, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"),
        numFiles = 0, statsCols = Seq("o_orderkey"))
      graft.core.TxnTable.deleteKeys(s, path, "o_orderkey",
        Seq(11L, 13L, 17L, 19L)) // v2
      import s.implicits._
      graft.core.TxnTable.upsert(s, path, "o_orderkey",
        Seq((12L, "Y", 55.5), (14L, "Y", 66.25), (20000000L, "Y", 77.75))
          .toDF("o_orderkey", "o_orderstatus", "o_totalprice")) // v3
      graft.core.TxnTable.deleteKeys(s, path, "o_orderkey",
        Seq(12L, 23L)) // v4 — removes an upserted row and a base row
      path
    }
    val keys = Seq("o_orderstatus")
    val sums = Seq("o_totalprice")
    val follower = (2 to graft.core.TxnTable.version(dir))
      .foldLeft(graft.core.TxnTable.rollupOf(
        graft.core.TxnTable.read(s, dir, v = 1), keys, sums)) { (roll, v) =>
        graft.core.TxnTable.applyCdcDelta(roll,
          graft.core.TxnTable.changes(s, dir, v - 1, v), keys, sums)
      }
    follower
      .select(col("o_orderstatus"), col("n"),
        col("sum_o_totalprice").cast("double").as("total_price"))
      .orderBy("o_orderstatus")
  }

  /** TIME TRAVEL: read version 1 of the q42 table — the PRE-mutation
    * snapshot — after the delete and upsert have committed. The oracle
    * aggregates the ORIGINAL orders table: a versioned read must see
    * exactly the data as of its manifest, no matter what later
    * commits did (the audit/reproducibility read every manifest-log
    * table format sells; a training run pins its data version this
    * way). Cost: the v1 manifest read + a scan of v1's files — old
    * versions stay readable at zero storage cost until [[vacuum]]
    * because copy-on-write never modifies a committed file. */
  def q45(s: SparkSession, d: String): DataFrame = {
    val dir = cowTable(s, d) // builds v1..v3; we read v1
    graft.core.TxnTable.read(s, dir, v = 1)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey")).cast("bigint").as("key_sum"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy("o_orderstatus")
  }

  /** OVERSIZED IN-list ship ([[KeyShip.semiShip]]): q22's semi-join
    * semantics, but the key list (every order over 150k — thousands
    * of keys at sf0.01) is past the literal threshold, so the carrier
    * decision flips to the broadcast Bloom bitset probe fused into
    * the fact scan + the exact semi-join on the survivors (the
    * reference's MultiEngineQuery IN-list ship at the scale where a
    * literal tree stops being shippable). The oracle is the plain IN
    * subquery — the bitset's false positives must be invisible in the
    * result, pinning that the pre-filter is an optimization, never a
    * semantics change. PlanShapeSpec pins both carrier plan shapes. */
  def q46(s: SparkSession, d: String): DataFrame = {
    val bigOrders = orders(s, d).filter(col("o_totalprice") > 150000)
      .select("o_orderkey")
    KeyShip.semiShip(lineitem(s, d), "l_orderkey", bigOrders,
      "o_orderkey", maxLiterals = 100, bloomMinKeys = 0)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("price_sum"))
      .orderBy("l_returnflag")
  }

  /** OVERSIZED NOT-IN ship ([[KeyShip.antiShip]]): q33's anti-join
    * complement at a key count past the literal threshold. The Bloom
    * pays differently here — a bitset MISS is a PROOF of
    * non-membership, so ~the whole fact bypasses the join; only the
    * pass fraction (true members + false positives) pays the exact
    * anti. The oracle is the plain NOT-IN subquery: the miss-bypass
    * union and the FP handling must be result-invisible. */
  def q47(s: SparkSession, d: String): DataFrame = {
    val bigOrders = orders(s, d).filter(col("o_totalprice") > 150000)
      .select("o_orderkey")
    KeyShip.antiShip(lineitem(s, d), "l_orderkey", bigOrders,
      "o_orderkey", maxLiterals = 100, bloomMinKeys = 0)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("price_sum"))
      .orderBy("l_returnflag")
  }

  /** q48 — RESTORE (the lakehouse rollback): a bad batch lands (a
    * delete and an upsert), `restore(1)` rolls the table back AS A
    * NEW COMMIT — old files by reference, nothing rewritten, the bad
    * versions still time-travelable — and ordinary writes continue on
    * top of the restored state. The oracle replays only the
    * POST-restore history over the original data: everything the bad
    * batch did must be invisible, and the post-restore upsert fully
    * visible, via an independent engine. */
  def q48(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.Caches.memoObj(s, s"restoretab|$d") {
      val path = graft.core.TempDirs.scratchShared("restoretab")
      graft.core.TxnTable.init(s, path,
        orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
          .repartitionByRange(16, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"),
        numFiles = 0, statsCols = Seq("o_orderkey"))
      // the bad batch: v2 deletes, v3 upserts
      graft.core.TxnTable.deleteKeys(s, path, "o_orderkey",
        Seq(2L, 3L, 5L, 7L))
      import s.implicits._
      graft.core.TxnTable.upsert(s, path, "o_orderkey",
        Seq((4L, "X", 9.99)).toDF("o_orderkey", "o_orderstatus",
          "o_totalprice"))
      // the undo: v4 re-activates v1's entries by reference
      graft.core.TxnTable.restore(s, path, 1)
      // life goes on: v5 is an ordinary correction on the restored state
      graft.core.TxnTable.upsert(s, path, "o_orderkey",
        Seq((5L, "R", 123.25)).toDF("o_orderkey", "o_orderstatus",
          "o_totalprice"))
      path
    }
    graft.core.TxnTable.read(s, dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey")).cast("bigint").as("key_sum"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy("o_orderstatus")
  }

  val queries: Map[String, Q] = Map(
    "q48_restore" -> (q48 _),
    "q47_bloom_antiship" -> (q47 _),
    "q46_bloom_keyship" -> (q46 _),
    "q45_time_travel" -> (q45 _),
    "q44_cdc_follow" -> (q44 _),
    "q43_table_changes" -> (q43 _),
    "q42_cow_mutations" -> (q42 _),
    "q41_zorder_layout" -> (q41 _),
    "q38_cube_grouping" -> (q38 _),
    "q37_rank_functions" -> (q37 _),
    "q01_pricing_summary" -> (q01 _),
    "q02_filter_predicates" -> (q02 _),
    "q03_star_join_revenue" -> (q03 _),
    "q04_agg_before_join" -> (q04 _),
    "q05_topk_orders" -> (q05 _),
    "q06_timeseries_monthly" -> (q06 _),
    "q07_paginate_totalrows" -> (q07 _),
    "q08_union_view" -> (q08 _),
    "q09_distinct_dims" -> (q09 _),
    "q10_filtered_rollup" -> (q10 _),
    "q11_count_distinct" -> (q11 _),
    "q12_decode_mapping" -> (q12 _),
    "q13_scalar_funcs" -> (q13 _),
    "q14_having" -> (q14 _),
    "q15_timeshift" -> (q15 _),
    "q16_total_metrics" -> (q16 _),
    "q17_drilldown_share" -> (q17 _),
    "q18_field_compare_join" -> (q18 _),
    "q19_paginate_offset" -> (q19 _),
    "q20_outer_filter" -> (q20 _),
    "q21_events_datetime" -> (q21 _),
    "q22_in_subquery_semijoin" -> (q22 _),
    "q23_dim_driven_right_join" -> (q23 _),
    "q30_asof_join" -> (q30 _),
    "q31_grouping_rollup" -> (q31 _),
    "q32_window_analytics" -> (q32 _),
    "q39_range_frame" -> (q39 _),
    "q40_grouping_sets" -> (q40 _),
    "q33_anti_join" -> (q33 _),
    "q34_set_ops" -> (q34 _),
    "q35_scalar_subquery" -> (q35 _),
    "q36_pivot" -> (q36 _),
  )

  val oracle: Map[String, String] = Map(
    "q38_cube_grouping" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status
        |FROM orders
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY g_priority, g_status, o_orderpriority, o_orderstatus""".stripMargin,
    // ntile/percent_rank/cume_dist share semantics across engines; the
    // window order tie-breaks on the key so every rank is deterministic
    "q37_rank_functions" ->
      """SELECT c_custkey, c_nationkey,
        |  CAST(c_acctbal AS DOUBLE) AS acctbal,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM customer
        |WHERE c_nationkey < 5
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
    "q36_pivot" ->
      """SELECT strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS "O_n",
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS "O_spend",
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS "F_n",
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS "F_spend",
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS "P_n",
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS "P_spend"
        |FROM orders
        |WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q35_scalar_subquery" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        |   FROM customer c2 WHERE c2.c_nationkey = c1.c_nationkey) AS nation_avg
        |FROM customer c1
        |WHERE c_acctbal > 2 * (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        |                       FROM customer c2 WHERE c2.c_nationkey = c1.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
    // sum_disc_price/sum_charge go DECIMAL→VARCHAR→DOUBLE: DuckDB's
    // direct decimal→double converts the scaled int128 through a
    // double multiply (two roundings — off by one ULP once the scaled
    // value crosses 2^53, which the scale-6 charge sum does at sf1),
    // while the string parse is correctly rounded and matches Spark's
    // BigDecimal.doubleValue exactly (sf1 certification finding, r17)
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(8,2))) * (1 + CAST(l_tax AS DECIMAL(8,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        | CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_predicates" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders
        |WHERE o_orderstatus IN ('O','F')
        |  AND o_orderpriority NOT IN ('5-LOW')
        |  AND o_orderpriority <> '4-NOT SPECIFIED'
        |  AND o_totalprice > 1000 AND o_totalprice < 400000
        |  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        |  AND o_orderpriority LIKE '%-%'
        |  AND o_orderpriority NOT LIKE '%URGENT%'
        |ORDER BY o_orderkey""".stripMargin,
    "q03_star_join_revenue" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q04_agg_before_join" ->
      """WITH line_agg AS (
        | SELECT l_orderkey,
        |  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS order_rev_dec
        | FROM lineitem GROUP BY l_orderkey)
        |SELECT c_mktsegment,
        | CAST(SUM(order_rev_dec) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_orders
        |FROM line_agg
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q05_topk_orders" ->
      """SELECT l_orderkey,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        |FROM lineitem GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q06_timeseries_monthly" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        | COUNT(DISTINCT o_custkey) AS n_customers
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
    "q07_paginate_totalrows" ->
      """SELECT c_custkey, c_name, c_acctbal, rn, totalrows FROM (
        | SELECT c_custkey, c_name, c_acctbal,
        |  row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn,
        |  count(*) OVER () AS totalrows
        | FROM customer) t
        |WHERE rn BETWEEN 11 AND 20 ORDER BY rn""".stripMargin,
    "q08_union_view" ->
      """SELECT * FROM (
        | SELECT 'open' AS stage, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        | FROM orders WHERE o_orderstatus = 'O' GROUP BY o_orderpriority
        | UNION ALL
        | SELECT 'closed' AS stage, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        | FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority) t
        |ORDER BY stage, o_orderpriority""".stripMargin,
    "q09_distinct_dims" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    "q10_filtered_rollup" ->
      """SELECT l_linestatus,
        | CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS returned_qty,
        | CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS ack_qty,
        | COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted,
        | COUNT(*) AS n_total
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q11_count_distinct" ->
      """SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT l_orderkey) AS n_orders, COUNT(*) AS n_lines
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q12_decode_mapping" ->
      """SELECT CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Fulfilled'
        |  WHEN 'P' THEN 'Pending' ELSE 'Unknown' END AS status_display,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus IN ('O','F')
        |GROUP BY 1 ORDER BY status_display""".stripMargin,
    "q13_scalar_funcs" ->
      """SELECT p_partkey,
        | upper(substring(p_name, 1, 8)) AS name_prefix,
        | lower(p_brand) AS brand_lower,
        | length(p_type) AS type_len,
        | regexp_extract(p_type, '^(\w+)', 1) AS type_first_word,
        | coalesce(nullif(p_brand, 'Brand#1'), 'other') AS brand_nvl,
        | concat_ws('-', p_brand, p_size) AS brand_size,
        | CAST(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.9 AS DECIMAL(8,2)) AS DOUBLE) AS discounted_price
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q14_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) >= 4 AND CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) > 100000
        |ORDER BY o_custkey""".stripMargin,
    "q15_timeshift" ->
      """SELECT o_orderpriority,
        | CAST(COALESCE(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS total_cur,
        | CAST(COALESCE(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS total_prev,
        | CASE WHEN CAST(COALESCE(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 0) AS DOUBLE) <> 0
        |   THEN round((CAST(COALESCE(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 0) AS DOUBLE)
        |        - CAST(COALESCE(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 0) AS DOUBLE))
        |        / CAST(COALESCE(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 0) AS DOUBLE) * 100, 4)
        | END AS pct_change
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q16_total_metrics" ->
      """SELECT
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        | COUNT(*) AS n_lines,
        | COUNT(DISTINCT l_orderkey) AS n_orders,
        | strftime(MIN(l_shipdate), '%Y-%m-%d') AS first_ship,
        | strftime(MAX(l_shipdate), '%Y-%m-%d') AS last_ship
        |FROM lineitem""".stripMargin,
    "q17_drilldown_share" ->
      """WITH agg AS (
        | SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
        |  SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS tot_dec
        | FROM orders GROUP BY o_orderpriority, o_orderstatus)
        |SELECT o_orderpriority, o_orderstatus, n,
        | CAST(tot_dec AS DOUBLE) AS total,
        | CAST(tot_dec AS DOUBLE) / CAST(SUM(tot_dec) OVER (PARTITION BY o_orderpriority) AS DOUBLE) AS share_of_priority
        |FROM agg ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "q18_field_compare_join" ->
      """SELECT p_brand, COUNT(*) AS n_lines,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity > p_size
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q19_paginate_offset" ->
      """SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 20""".stripMargin,
    "q20_outer_filter" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 0
        |ORDER BY o_orderkey""".stripMargin,
    "q21_events_datetime" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
        | COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 06:30:00' AND ts < TIMESTAMP '2024-01-20 18:45:00'
        |GROUP BY 1, event_type ORDER BY day, event_type""".stripMargin,
    "q22_in_subquery_semijoin" ->
      """SELECT l_returnflag, COUNT(*) AS n_lines,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS price_sum
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // q46: same IN-subquery semantics at an OVERSIZED key count — the
    // engine's Bloom pre-filter + exact semi-join must be result-
    // identical to the plain subquery (false positives invisible)
    "q46_bloom_keyship" ->
      """SELECT l_returnflag, COUNT(*) AS n_lines,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS price_sum
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // q47: the NOT-IN complement — miss rows bypassed the anti-join
    // entirely, and the result must still be the plain subquery's
    "q47_bloom_antiship" ->
      """SELECT l_returnflag, COUNT(*) AS n_lines,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS price_sum
        |FROM lineitem
        |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q23_dim_driven_right_join" ->
      """SELECT c_custkey, c_name,
        | COALESCE(n, 0) AS n_orders, COALESCE(total, 0.0) AS total,
        | n IS NOT NULL AS has_orders
        |FROM customer LEFT JOIN (
        | SELECT o_custkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        | FROM orders GROUP BY o_custkey) f ON c_custkey = o_custkey
        |WHERE c_nationkey < 10
        |ORDER BY c_custkey""".stripMargin,
    // same union+window formulation as the Spark plan; epoch_us matches
    // Spark's ns→µs floor truncation, so tie handling is identical
    "q30_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) us FROM events),
        |u AS (
        |  SELECT user_id, us, 0 AS side,
        |    struct_pack(cid := event_id, cval := value) AS click,
        |    CAST(NULL AS BIGINT) AS purchase_id
        |  FROM e WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, us, 1,
        |    CAST(NULL AS STRUCT(cid BIGINT, cval DOUBLE)), event_id
        |  FROM e WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT *, last_value(click IGNORE NULLS) OVER win AS asofc
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id ORDER BY us, side, (click).cid
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT purchase_id, user_id, us AS purchase_us,
        |  (asofc).cid AS asof_click_id, (asofc).cval AS asof_click_value
        |FROM w WHERE side = 1 ORDER BY purchase_id""".stripMargin,
    "q31_grouping_rollup" ->
      """SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS yr,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        | GROUPING(n_name, yr) AS gid
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, yr)
        |ORDER BY gid, n_name, yr""".stripMargin,
    "q32_window_analytics" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        |  FROM orders
        |  WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
        |  GROUP BY 1)
        |SELECT day,
        |  CAST(rev AS DOUBLE) AS revenue,
        |  CAST(lag(rev) OVER (ORDER BY day) AS DOUBLE) AS prev_revenue,
        |  CAST(SUM(rev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
        |  CAST(SUM(rev) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / COUNT(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7
        |FROM daily ORDER BY day""".stripMargin,
    "q40_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_priority, g_status, o_orderpriority, o_orderstatus""".stripMargin,
    // q42's oracle replays the copy-on-write mutations relationally:
    // delete keys 1,3,5,7; replace keys 2,4; insert key 10000000 —
    // then aggregates, exactly what reading the final snapshot gives
    "q42_cow_mutations" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey NOT IN (1, 3, 5, 7)
        |    AND o_orderkey NOT IN (2, 4)),
        |up AS (SELECT * FROM (VALUES
        |  (CAST(2 AS BIGINT), 'X', 100.0),
        |  (CAST(4 AS BIGINT), 'X', 200.0),
        |  (CAST(10000000 AS BIGINT), 'X', 300.0))
        |  t(o_orderkey, o_orderstatus, o_totalprice)),
        |unioned AS (SELECT * FROM base UNION ALL SELECT * FROM up)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        |FROM unioned GROUP BY 1 ORDER BY 1""".stripMargin,
    // q45 reads the PRE-mutation version of the mutated table: the
    // oracle is simply the original data — later commits must be
    // invisible to a versioned read
    "q45_time_travel" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // q48's oracle replays only the POST-restore history: the restored
    // head equals the original data, plus the one later correction
    "q48_restore" ->
      """WITH final AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey <> 5
        |  UNION ALL
        |  SELECT CAST(5 AS BIGINT), 'R', 123.25)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        |FROM final GROUP BY 1 ORDER BY 1""".stripMargin,
    // q44's oracle replays the three-commit mutation history and
    // aggregates the FINAL state — the follower's delta-maintained
    // rollup must land exactly there
    "q44_cdc_follow" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey NOT IN (11, 13, 17, 19)
        |    AND o_orderkey NOT IN (12, 14)),
        |up AS (SELECT * FROM (VALUES
        |  (CAST(12 AS BIGINT), 'Y', 55.5),
        |  (CAST(14 AS BIGINT), 'Y', 66.25),
        |  (CAST(20000000 AS BIGINT), 'Y', 77.75))
        |  t(o_orderkey, o_orderstatus, o_totalprice)),
        |merged AS (SELECT * FROM base UNION ALL SELECT * FROM up),
        |final AS (SELECT * FROM merged WHERE o_orderkey NOT IN (12, 23))
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_price
        |FROM final GROUP BY 1 ORDER BY 1""".stripMargin,
    // q43's oracle replays the NET change set of the q42 mutations:
    // deletes = the four removed keys + the two replaced keys' OLD
    // rows (only where those keys exist in the base table — matching
    // the engine, which can only delete rows that were present);
    // inserts = the three upserted rows
    "q43_table_changes" ->
      """WITH del AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |    'delete' AS _change_type
        |  FROM orders WHERE o_orderkey IN (1, 3, 5, 7, 2, 4)),
        |ins AS (SELECT * FROM (VALUES
        |  (CAST(2 AS BIGINT), 'X', 100.0, 'insert'),
        |  (CAST(4 AS BIGINT), 'X', 200.0, 'insert'),
        |  (CAST(10000000 AS BIGINT), 'X', 300.0, 'insert'))
        |  t(o_orderkey, o_orderstatus, o_totalprice, _change_type)),
        |ch AS (SELECT * FROM del UNION ALL SELECT * FROM ins)
        |SELECT _change_type, COUNT(*) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        |FROM ch GROUP BY 1 ORDER BY 1""".stripMargin,
    // q41 reads a Z-ordered COPY of lineitem; the oracle reads the
    // original — the layout op must be result-invisible
    "q41_zorder_layout" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_partkey BETWEEN 1 AND 50 AND l_suppkey BETWEEN 1 AND 5
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q39_range_frame" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS pri,
        |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
        |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        |  FROM orders
        |  WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-07-01'
        |  GROUP BY 1, 2)
        |SELECT pri, CAST(day AS BIGINT) AS day,
        |  CAST(rev AS DOUBLE) AS revenue,
        |  CAST(SUM(rev) OVER (PARTITION BY pri ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev7,
        |  CAST(COUNT(*) OVER (PARTITION BY pri ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS days_present7
        |FROM daily ORDER BY pri, day""".stripMargin,
    "q33_anti_join" ->
      """SELECT c_mktsegment AS mktsegment, COUNT(*) AS n_inactive,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS acctbal_sum
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderdate >= '1995-01-01' AND o.o_orderdate < '1996-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q34_set_ops" ->
      """WITH c95 AS (SELECT o_custkey FROM orders
        |             WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'),
        |c96 AS (SELECT o_custkey FROM orders
        |        WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'),
        |sel AS (
        |  SELECT 'both' AS segment, o_custkey FROM (SELECT o_custkey FROM c95 INTERSECT SELECT o_custkey FROM c96)
        |  UNION ALL
        |  SELECT 'only_1995', o_custkey FROM (SELECT o_custkey FROM c95 EXCEPT SELECT o_custkey FROM c96))
        |SELECT segment, o_custkey FROM sel ORDER BY segment, o_custkey""".stripMargin,
  )
}
