package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.tools.RelCorpusGen

/** Relational-corpus differential fuzzing (r17 verdict, ranked task
  * #1 — the last uncovered axis of the differential program): 12
  * seeded adversarial star-schema corpora ([[RelCorpusGen]] —
  * Zipf-skewed + dangling foreign keys, NULL-dense columns, ±0 and
  * DECIMAL(12,2)-extreme money, request-window boundary dates with
  * intra-day times, local-midnight ±1s event instants per request
  * timezone, empty region/orders/lineitem profiles, duplicate
  * non-key dim attributes, unmapped enum storage values), each run
  * through the RequestFuzz battery ([[RelFuzzBattery]]: valid
  * requests, cube SQL, pagination, union views, grain×tz windows,
  * TimeShift / TotalMetrics / RowCount / Drilldown curators) against
  * the same independently-rendered raw-table duals.
  *
  * The request fuzzer (RequestFuzzSpec) proves query-space coverage
  * over ONE fixed dataset; this proves the DATA axis — the sf1
  * certification's q01 finding (DuckDB 2^53 double-rounding) showed
  * that axis bites even the relational family. Each corpus gets its
  * own seed-derived request stream, so 12 corpora × ~97 requests
  * also WIDENS query-space coverage beyond the fixed spec's draws. */
/** The seed loop, parameterized by corpus range so the two halves run
  * as separate suites in PARALLEL forked test JVMs (r21 — the verify
  * driver killed the single-JVM 719-test run on wall-clock; this suite
  * was its longest pole). Seeds, request streams and assertions are
  * IDENTICAL to the pre-split single loop: 1–6 here, 7–12 in
  * [[RelCorpusFuzzSpecB]]. */
abstract class RelCorpusFuzzHalf(seeds: Range) extends AnyFunSuite {

  protected lazy val spark: SparkSession = {
    val root = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // a dedicated session: tiny corpora want few shuffle partitions
    // regardless of which suite created the shared context first
    val s = root.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s
  }

  test(s"seeded adversarial star-schema corpora ${seeds.head}-${seeds.last} × " +
      "the relational request-fuzz battery ≡ the independently-rendered duals " +
      "(valid + SQL door + pagination + union + grain×tz + curators " +
      "+ DST-transition grain/TimeShift windows)") {
    var total = 0
    seeds.foreach { seed =>
      val dir = graft.core.TempDirs.scratchShared(s"relfuzz$seed")
      val profile = RelCorpusGen.writeCorpus(spark, seed, dir)
      info(profile.toString)
      RelFuzzBattery.registerViews(spark, dir)
      val rnd = new scala.util.Random(20260816L + seed)
      // per-corpus shape plan: every battery family, scaled to keep
      // 12 corpora inside a CI budget; distinct seeds per corpus mean
      // the 12 streams union to ~1,100 distinct request draws
      total += RelFuzzBattery.runValid(spark, dir, rnd,
        Seq.fill(20)(0) ++ Seq.fill(6)(1) ++ Seq.fill(4)(2) ++
          Seq.fill(4)(3) ++ Seq.fill(8)(4))
      total += RelFuzzBattery.runCubeSql(spark, dir, rnd, 15)
      total += RelFuzzBattery.runPagination(spark, dir, rnd, 8)
      total += RelFuzzBattery.runUnionView(spark, dir, rnd, 5)
      total += RelFuzzBattery.runGrainTz(spark, dir, rnd, 10)
      total += RelFuzzBattery.runTimeShift(spark, dir, rnd, 6)
      total += RelFuzzBattery.runTotalsRowCount(spark, dir, rnd, 5)
      total += RelFuzzBattery.runDrilldown(spark, dir, rnd, 5)
      // r19: windows straddling the 2024 DST switches of New York +
      // Sydney (events planted at the transition instants by
      // RelCorpusGen) — 23/25-hour local days through Day/Hour grains
      // and prev-window-spanning TimeShift
      total += RelFuzzBattery.runDstGrain(spark, dir, rnd, 8)
      total += RelFuzzBattery.runDstTimeShift(spark, dir, rnd, 4)
      // r19: variant-selection transparency — rollup-eligible requests
      // (incl. the filtered `Urgent Spend` partial) routing-asserted
      // onto the (priority, day) rollup, negative controls onto base
      total += RelFuzzBattery.runVariantRollup(spark, dir, rnd, 6)
    }
    info(s"$total request×corpus comparisons green")
    assert(total == seeds.size * (42 + 15 + 8 + 5 + 10 + 6 + 5 + 5 + 8 + 4 + 6))
  }
}

class RelCorpusFuzzSpec extends RelCorpusFuzzHalf(1 to 6) {

  test("named minimal fixture (r18 fuzz finding): a grand-total COUNT " +
      "over an EMPTY fact is 0, not NULL — the two-stage " +
      "sum-of-partials path must coalesce only the global (no-keys) " +
      "count; grouped and ROJ-null-extended counts stay NULL-faithful") {
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val dir = graft.core.TempDirs.scratchShared("relfix-emptycount")
    def write(name: String, schema: StructType, rows: Seq[R]): Unit = {
      val l = new java.util.ArrayList[R](rows.size)
      rows.foreach(l.add)
      spark.createDataFrame(l, schema).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    write("orders", StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType))), Seq.empty)
    write("customer", StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
      Seq(R(1L, "Customer#000000001", 0, 0.0, "AUTOMOBILE")))
    write("nation", StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))), Seq(R(0, "CHINA", 0)))
    write("region", StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType))), Seq(R(0, "ASIA")))
    // the shrunk r18 finding: metrics-only request, dim-attr filter
    // (two-stage agg-before-join), zero fact rows — Order Count must
    // come back 0 with Avg Order Value NULL
    val json =
      """{"cube":"order_stats","selectFields":[{"field":"Avg Order Value"},
        |{"field":"Order Count"}],"filterExpressions":[{"field":
        |"Market Segment","operator":"in","values":["AUTOMOBILE"]}]}"""
        .stripMargin.replace("\n", "")
    val row = operators.SemanticQueries.run(json)(spark, dir).collect()
    assert(row.length == 1, s"global aggregate must yield exactly one row")
    val r0 = row.head
    assert(r0.isNullAt(r0.fieldIndex("Avg Order Value")),
      "SUM/COUNT over empty input must be NULL")
    assert(!r0.isNullAt(r0.fieldIndex("Order Count")) &&
      r0.getLong(r0.fieldIndex("Order Count")) == 0L,
      s"ungrouped COUNT over an empty fact must be 0, got " +
        s"${r0.get(r0.fieldIndex("Order Count"))}")
    // the GROUPED shape over the same empty fact stays empty (no
    // fabricated zero-rows) — SQL GROUP BY semantics
    val grouped =
      """{"cube":"order_stats","selectFields":[{"field":"Order Priority"},
        |{"field":"Order Count"}]}""".stripMargin.replace("\n", "")
    assert(operators.SemanticQueries.run(grouped)(spark, dir).count() == 0L,
      "grouped aggregate over an empty fact must yield zero rows")
  }

  test("named minimal fixture (r18 wide-sweep finding): TotalMetrics " +
      "joins FILTER dims only — a selected-but-unfiltered dim whose " +
      "inner join drops rows (NULL FK) shapes the GRID, never the " +
      "totals (the reference TotalMetricsCurator re-issues " +
      "metrics+filters, dims dropped)") {
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val dir = graft.core.TempDirs.scratchShared("relfix-totalsjoin")
    def write(name: String, schema: StructType, rows: Seq[R]): Unit = {
      val l = new java.util.ArrayList[R](rows.size)
      rows.foreach(l.add)
      spark.createDataFrame(l, schema).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    val ts = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
    write("orders", StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType))),
      Seq(R(1L, 1L, "O", 100.0, ts, "1-URGENT"),
        R(2L, 2L, "O", 30.0, ts, "1-URGENT")))
    write("customer", StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
      // customer 2 has a NULL nationkey: the grid's nation join drops
      // its order; the totals must keep it
      Seq(R(1L, "Customer#000000001", 0, 0.0, "AUTOMOBILE"),
        R(2L, "Customer#000000002", null, 0.0, "AUTOMOBILE")))
    write("nation", StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))), Seq(R(0, "CHINA", 0)))
    write("region", StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType))), Seq(R(0, "ASIA")))
    val json =
      """{"cube":"order_stats","selectFields":[{"field":"Nation Name"},
        |{"field":"Total Spend"}],"filterExpressions":[{"field":
        |"Market Segment","operator":"in","values":["AUTOMOBILE"]}]}"""
        .stripMargin.replace("\n", "")
    // grid: nation inner-joined under the dim-attr filter → only
    // customer 1's order survives
    val grid = operators.SemanticQueries.run(json)(spark, dir).collect()
    assert(grid.map(r => r.getDouble(r.fieldIndex("Total Spend"))).sum
      == 100.0, s"grid must drop the NULL-nationkey customer's order")
    // totals: metrics + filters only — BOTH orders counted
    val totals = curators.Curators.totalMetrics(json,
      operators.SemanticQueries.registry)(spark, dir).collect().head
    assert(totals.getDouble(totals.fieldIndex("Total Spend")) == 130.0,
      s"TotalMetrics must keep the NULL-nationkey order: got " +
        s"${totals.getDouble(totals.fieldIndex("Total Spend"))}")
  }
}

class RelCorpusFuzzSpecB extends RelCorpusFuzzHalf(7 to 12)
