package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators._

/** Physical-plan shape regressions: the scale-critical properties the
  * 100 TB design intent depends on, asserted via explain output —
  * filters reach the parquet scan, column pruning reaches the reader,
  * small dims broadcast, top-k runs as TakeOrderedAndProject, semi
  * joins broadcast, aggregation is partial before shuffle.
  */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: date filter is pushed to the parquet scan") {
    val plan = physical(Relational.q01(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushed filter:\n$plan")
  }

  test("q41: the 2-D box reaches the z-ordered scan as pushed range filters") {
    // the layout's row-group pruning only engages if BOTH range
    // predicates are pushed to the parquet reader — a post-scan filter
    // would read every row group and the clustering would be pointless
    val df = Relational.q41(spark, sf)
    val scan = PlanInspect.scans(df.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("zorder")))
      .getOrElse(fail("no scan over the z-ordered copy"))
    // the plan's toString truncates PushedFilters — read the scan's
    // dataFilters (what the reader receives) directly
    val pushed = scan.dataFilters.map(_.toString.toLowerCase).mkString(";")
    for (c <- Seq("l_partkey", "l_suppkey"); op <- Seq(">=", "<="))
      assert(pushed.split(';').exists(f => f.contains(c) && f.contains(op)),
        s"missing pushed $c $op bound:\n$pushed")
  }

  test("q01: column pruning — scan reads only referenced lineitem columns") {
    val plan = physical(Relational.q01(spark, sf))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_suppkey"),
      s"scan reads unreferenced columns: $readSchema")
  }

  test("events: time window is pushed to the scan in either file encoding") {
    import org.apache.spark.sql.functions._
    // nanos files: ts is timestamp_micros(raw div 1000) — opaque to
    // pushdown until MicrosTruncationPushdown rewrites comparisons onto
    // the raw long. µs files: ts decodes as TimestampType directly and
    // the predicates push down natively. Either way the scan must carry
    // the range, never a post-scan-only filter.
    val df = graft.core.Tables.events(spark, sf)
      .filter(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-05 08:00:00")) &&
              col("ts") <  lit(java.sql.Timestamp.valueOf("2024-01-07 08:00:00")))
      .groupBy(col("event_type")).count()
    val pushed = physical(df).linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    val nanosPushed = pushed.contains("GreaterThanOrEqual(ts,1704441600000000000)") &&
      pushed.contains("LessThan(ts,1704614400000000000)")
    val microsPushed = pushed.contains("GreaterThanOrEqual(ts,2024-01-05 08:00:00") &&
      pushed.contains("LessThan(ts,2024-01-07 08:00:00")
    assert(nanosPushed || microsPushed, s"time range not pushed: $pushed")
    // value-correctness of the rewritten window is pinned by the
    // DuckDB oracles on the same filters (sem08/sem14/sem15, st01);
    // here just prove the pruned scan still returns the rows
    assert(df.agg(sum("count")).collect()(0).getLong(0) > 0)
  }

  test("q03: small dims join as broadcast hash joins") {
    val plan = physical(Relational.q03(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("q05: top-k runs as TakeOrderedAndProject, not a global sort") {
    val plan = physical(Relational.q05(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$plan")
  }

  test("q07: page fetch is TakeOrderedAndProject + scalar count (no global window over the table)") {
    val plan = physical(Relational.q07(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$plan")
  }

  test("sem18: the mandated filteringRequired IN list reaches the orders scan") {
    // the guarded cube's whole point is that the high-cardinality
    // column is never scanned unfiltered — so the request's IN list
    // must arrive at the parquet reader as a pushed filter, not as a
    // post-scan Filter node
    val plan = physical(
      SemanticQueries.run(SemanticQueries.sem18Json)(spark, sf))
    assert(plan.contains("In(o_custkey"),
      s"Customer Key IN list not pushed to the scan:\n$plan")
  }

  test("dd10: capped |A| is a map-side-combined aggregate, no window over the postings") {
    val plan = physical(Dedup.ddContainment(spark, sf))
    assert(!plan.contains("windowspecdefinition"),
      s"dd10 must not window the postings frame:\n$plan")
    assert(plan.contains("partial_count"),
      s"capped-size aggregate not map-side combined:\n$plan")
  }

  test("q22: IN-subquery key ship takes the literal carrier at this scale") {
    // the served semi rides KeyShip's size decision: at sf0.001 the
    // key set is under the literal threshold, so it ships as a pushed
    // In/INSET at the scan — no join operator at all, which beats the
    // broadcast semi the pre-r11 plan used (the oversized regime is
    // PlanShapeSpec's dedicated KeyShip tests)
    val plan = physical(Relational.q22(spark, sf))
    assert(plan.contains("INSET") || plan.contains(" IN ("),
      s"literal key carrier not pushed into the scan:\n$plan")
    assert(!plan.contains("Join"), s"small key set must not plan a join:\n$plan")
  }

  test("q35: correlated scalar subquery decorrelates to one aggregate + join") {
    val plan = physical(Relational.q35(spark, sf))
    // Catalyst must rewrite the per-row subquery into a grouped
    // aggregate joined back — a surviving scalar-subquery node would
    // mean per-row re-execution
    assert(!plan.contains("ScalarSubquery"), s"subquery not decorrelated:\n$plan")
    assert(plan.contains("HashAggregate") &&
      (plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin")),
      s"expected aggregate + hash join from decorrelation:\n$plan")
  }

  test("q33: NOT EXISTS is a hash LeftAnti, never a nested loop") {
    val plan = physical(Relational.q33(spark, sf))
    assert(plan.contains("LeftAnti"), s"anti join missing:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"anti join degenerated to a nested loop:\n$plan")
  }

  test("q04: aggregation is partial (map-side combine) before the shuffle") {
    val plan = physical(Relational.q04(spark, sf))
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate(keys=[l_orderkey"),
      s"no partial aggregation:\n$plan")
  }

  test("tx04: documents scan prunes to doc_id + text") {
    val plan = physical(TextOps.txFingerprint(spark, sf))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"scan reads unreferenced columns: $readSchema")
  }

  test("q30: as-of join plans as one window over a union — no join operator") {
    val plan = physical(Relational.q30(spark, sf))
    assert(!plan.contains("Join"), s"as-of should be join-free:\n$plan")
    assert(plan.contains("Window"), s"missing window:\n$plan")
    // exactly one shuffle on the join key feeds the window (the final
    // presentation sort is a range exchange, not a data shuffle)
    val hashExchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n$plan")
  }

  test("sp01: deterministic split is map-only — no exchange before the sort") {
    val plan = physical(Sampling.spSplit(spark, sf))
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(shuffles == 0, s"split should not shuffle:\n$plan")
  }

  test("tx08: benchmark gram set broadcasts; corpus side is not shuffled for the semi-join") {
    val plan = physical(TextOps.txContamination(spark, sf))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"contamination semi-join must broadcast the benchmark grams:\n$plan")
  }

  test("ev01: k-step funnel is one shuffle on user_id — no per-step self-joins") {
    val plan = physical(Events.evFunnel(spark, sf))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"funnel must not join:\n$plan")
    // one data shuffle for the user window; the per-user flags and the
    // 3-row step rollup ride AQE-coalesced exchanges of tiny data
    val userShuffles = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(user_id"))
    assert(userShuffles == 1, s"expected 1 user shuffle, got $userShuffles:\n$plan")
  }

  test("ev04: attribution range join stays an equi-join — no nested loop") {
    // the naive range-join plan is BroadcastNestedLoopJoin/Cartesian;
    // the time-bucketed formulation must hash-join on (user_id, bucket)
    // with the range predicate as a residual filter
    val plan = physical(Events.evAttribution(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin")
      || plan.contains("ShuffledHashJoin"), s"no equi-join found:\n$plan")
  }

  test("q40: grouping sets expand once and aggregate partially — one scan, 3 sets") {
    val plan = physical(Relational.q40(spark, sf))
    // Expand lists exactly the 3 declared sets (the (status)-only
    // slice a CUBE would add is absent), and the aggregate keeps its
    // map-side partial phase below the exchange
    assert(plan.contains("Expand"), s"no Expand:\n${plan.take(2000)}")
    assert(!plan.contains(", 2]"), // grouping_id 2 = the skipped (status) set
      s"skipped grouping set appeared:\n${plan.take(2000)}")
    assert(plan.contains("partial_count"), s"no partial agg:\n${plan.take(2000)}")
    assert(plan.split("FileScan").length == 2, "grouping sets must not rescan")
  }

  test("dd08/mm06: near-dup candidate generation is equi-join, never a nested loop") {
    // both ops confine the quadratic stage behind an equi-join key
    // (cluster id / hash chunk); a BNLJ or cartesian would be the
    // all-pairs blowup the designs exist to avoid
    for (df <- Seq(Similarity.semDedup(spark, sf), Extended.mm06(spark, sf))) {
      val plan = physical(df)
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"near-dup join degenerated to a nested loop:\n${plan.take(3000)}")
    }
  }

  test("ev02: retention aggregates partially before each shuffle") {
    val plan = physical(Events.evRetention(spark, sf))
    assert(plan.contains("HashAggregate"), s"no hash agg:\n$plan")
    // cohort join keys both sides on user_id — the join must not
    // introduce an extra exchange beyond the two keyed aggregations
    assert(plan.contains("Exchange hashpartitioning(user_id"),
      s"missing user_id exchange:\n$plan")
  }

  test("sim10: shortlist window shuffles scalar triples — no vectors ride the exchange") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.types.ArrayType
    // AQE hides operators inside query-stage leaves; the static plan
    // exposes the Window nodes and their child schemas directly
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val windows = try {
      Similarity.simMrlRerank(spark, sf).queryExecution.executedPlan.collect {
        case w: WindowExec => w }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(windows.nonEmpty, "no window operators found")
    // the stage-1 (pcos) window is the one whose input would carry
    // embeddings if the pre-window projection regressed; neither
    // window's CHILD schema may contain an array column
    windows.foreach { w =>
      val arrays = w.child.output.filter(_.dataType.isInstanceOf[ArrayType])
      assert(arrays.isEmpty,
        s"window input carries vectors through the shuffle: ${arrays.map(_.name)}")
    }
    // both stages join via broadcast — candidate generation and the
    // full-vector fetch must never shuffle the corpus side
    val plan = physical(Similarity.simMrlRerank(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("whole-stage codegen covers the scalar-function pipeline") {
    val df = Relational.q13(spark, sf)
    df.collect() // finalize the adaptive plan so codegen spans are visible
    val plan = physical(df)
    assert(plan.contains("*("), s"no WholeStageCodegen spans:\n$plan")
  }

  test("KeyShip.semiShip: literal carrier below the threshold, Bloom probe above") {
    import org.apache.spark.sql.functions._
    import graft.operators.KeyShip
    val fact = graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_returnflag", "l_extendedprice")
    val keysSmall = graft.core.Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 400000).select("o_orderkey")
    val keysBig = graft.core.Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 100000).select("o_orderkey")

    // SMALL key set: ships as literals — a pushed In(...) at the
    // parquet scan, no bitset machinery anywhere in the plan
    val small = KeyShip.semiShip(fact, "l_orderkey", keysSmall,
      "o_orderkey", maxLiterals = 1000)
    val pSmall = physical(small)
    assert(pSmall.contains("In(l_orderkey"),
      s"literal carrier must reach the scan as a pushed In:\n$pSmall")
    assert(!pSmall.contains("bloom_might_contain") && !pSmall.contains("LeftSemi"),
      s"small key set must not build a bitset or a join:\n$pSmall")

    // OVERSIZED key set: the bitset probe is FUSED INTO THE FACT SCAN
    // — a map-side native bloom_might_contain filter BELOW
    // the exact LeftSemi join; no literal IN tree
    val big = KeyShip.semiShip(fact, "l_orderkey", keysBig,
      "o_orderkey", maxLiterals = 100, bloomMinKeys = 0)
    val pBig = physical(big)
    assert(pBig.contains("LeftSemi"), s"exact semi-join missing:\n$pBig")
    assert(pBig.contains("bloom_might_contain"),
      s"bitset probe missing from the fact side:\n$pBig")
    assert(!pBig.contains("In(l_orderkey"),
      s"oversized key set must not ship literals:\n$pBig")
    val filterIdx = pBig.indexOf("bloom_might_contain")
    val joinIdx = pBig.indexOf("LeftSemi")
    assert(filterIdx > joinIdx, // plan prints top-down: probe BELOW join
      s"bloom probe must sit under (before) the semi-join:\n$pBig")

    // and the optimization is invisible in the result: both carriers
    // equal the plain semi-join
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactBig = fact.join(keysBig,
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(agg(big) == agg(exactBig),
      "bloom-shipped semi-join must equal the plain semi-join")
    val exactSmall = fact.join(keysSmall,
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(agg(small) == agg(exactSmall))
  }

  test("KeyShip keyRows estimate: zero-job decision matches the probed one") {
    import org.apache.spark.sql.functions._
    import graft.operators.KeyShip
    val fact = graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_returnflag")
    val keys = graft.core.Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 100000).select("o_orderkey")
    // oversized regime, bloom forced on both paths: the estimate-fed
    // decision must produce the same carrier SHAPE as the probed one
    val probed = KeyShip.semiShip(fact, "l_orderkey", keys,
      "o_orderkey", maxLiterals = 100, bloomMinKeys = 0)
    val est = KeyShip.semiShip(fact, "l_orderkey", keys,
      "o_orderkey", maxLiterals = 100, bloomMinKeys = 0,
      keyRows = Some(graft.core.Tables.tableRows(spark, sf, "orders")))
    val pE = physical(est)
    assert(pE.contains("LeftSemi") && pE.contains("bloom_might_contain"),
      s"estimate-driven oversized carrier must keep the probed shape:\n$pE")
    assert(!pE.contains("In(l_orderkey"),
      s"estimate past the threshold must not collect literals:\n$pE")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg(est) == agg(probed),
      "estimate-driven and probed carriers must agree on the result")
    // decline regime (session bloomMinKeys): estimate-fed decision
    // ships NO filter — the broadcastable exact semi, no bitset, no
    // literal — the q22-at-serve shape with zero decision jobs
    val declined = KeyShip.semiShip(fact, "l_orderkey", keys,
      "o_orderkey", keyRows = Some(
        graft.core.Tables.tableRows(spark, sf, "orders")))
    val pD = physical(declined)
    assert(pD.contains("LeftSemi") && !pD.contains("bloom_might_contain")
      && !pD.contains("In(l_orderkey"), s"decline regime shape:\n$pD")
    // an estimate NEAR the literal threshold still probes (the side
    // may dedup/filter under it — and the probe there is cheap)
    val near = KeyShip.semiShip(fact, "l_orderkey",
      keys.limit(50), "o_orderkey", maxLiterals = 1000,
      keyRows = Some(2000L))
    val pN = physical(near)
    assert(pN.contains("In(l_orderkey"),
      s"near-threshold estimate must fall back to the probe:\n$pN")
    // anti carrier: estimate path equals the plain anti
    val antiE = KeyShip.antiShip(fact, "l_orderkey", keys,
      "o_orderkey", maxLiterals = 100, bloomMinKeys = 0,
      keyRows = Some(graft.core.Tables.tableRows(spark, sf, "orders")))
    val plainAnti = fact.join(keys,
      col("l_orderkey") === col("o_orderkey"), "left_anti")
    assert(agg(antiE) == agg(plainAnti),
      "estimate-driven anti carrier must equal the plain anti-join")
  }

  test("KeyShip: past the fpp regime the probe is declined, not shipped") {
    import org.apache.spark.sql.functions._
    import graft.operators.KeyShip
    // ~4.3M distinct keys against the capped 12M-bit bitset predicts
    // fpp > 25%: a filter that passes most rows is pure per-row
    // overhead, so the third carrier decision is NO filter at all —
    // the plan must be the plain shuffle semi-join
    val keys = spark.range(4300000L).toDF("o_orderkey")
    val fact = graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_returnflag")
    val p = physical(KeyShip.semiShip(fact, "l_orderkey", keys,
      "o_orderkey", maxLiterals = 100, bloomMinKeys = 0))
    assert(p.contains("LeftSemi"), s"exact join missing:\n$p")
    assert(!p.contains("bloom_might_contain"),
      s"a >25%-fpp bitset must not ship:\n$p")
  }

  test("KeyShip.antiShip: bitset misses bypass the join; result = plain anti") {
    import org.apache.spark.sql.functions._
    import graft.operators.KeyShip
    val fact = graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_returnflag")
    val keysBig = graft.core.Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 100000).select("o_orderkey")
    val anti = KeyShip.antiShip(fact, "l_orderkey", keysBig,
      "o_orderkey", maxLiterals = 100, bloomMinKeys = 0)
    val p = physical(anti)
    // the union of (bit-miss rows, join-checked bit-pass rows): the
    // anti-join must sit on only ONE union branch — the other branch
    // is scan+filter straight through
    assert(p.contains("LeftAnti") && p.contains("Union"),
      s"miss-bypass union shape missing:\n$p")
    assert(p.contains("bloom_might_contain"), s"bitset probe missing:\n$p")
    val exact = fact.join(keysBig,
      col("l_orderkey") === col("o_orderkey"), "left_anti")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg(anti) == agg(exact),
      "bloom-shipped anti-join must equal the plain anti-join")
    // NULL keys are KEPT (SQL anti semantics), through both carriers
    import spark.implicits._
    val withNulls = Seq(Some(1L), None, Some(999999999L))
      .toDF("k")
    val keys3 = Seq(1L).toDF("o_orderkey")
    val small = KeyShip.antiShip(withNulls, "k", keys3, "o_orderkey",
      maxLiterals = 10)
    assert(small.collect().map(_.isNullAt(0)).count(identity) == 1 &&
      small.count() == 2)
    val manyKeys = spark.range(500).toDF("o_orderkey")
    val big = KeyShip.antiShip(withNulls, "k", manyKeys, "o_orderkey",
      maxLiterals = 10)
    assert(big.collect().map(_.isNullAt(0)).count(identity) == 1,
      "NULL-key rows must survive the bloom anti path")
    assert(big.count() == 2) // null + 999999999 kept; 1 dropped
  }

  test("bloomDecision: sizing scales with the fact estimate; decline moves with it") {
    import graft.operators.KeyShip.bloomDecision
    // broadcastable key sides never bloom: a broadcast hash semi
    // already pays one probe per fact row, so the bitset build is
    // pure overhead (measured on q22: 0.37 s broadcast vs 0.98 s
    // forced bloom at sf0.1)
    assert(bloomDecision(10000, 8, None).isEmpty &&
      bloomDecision(1000000, 8, Some(1000000000L)).isEmpty,
      "key sides inside the broadcast budget must decline the bloom")
    // forced past the broadcast term: the r10 sizing — 12M-bit cap
    val small = bloomDecision(10000, 8, None, bloomMinKeys = 0)
    assert(small.exists(p => p.m == 80000 && p.fpp < 0.05), s"$small")
    assert(bloomDecision(5000000, 8, None).isEmpty,
      "5M keys at the estimate-free 12M-bit cap predict fpp 32% — decline")
    // the same 5M keys against a declared 10^9-row fact: the cap
    // scales up, fpp collapses, the probe ships
    val big = bloomDecision(5000000, 8, Some(1000000000L))
    assert(big.exists(p => p.m == 40000000L && p.fpp < 0.05), s"$big")
    // build-vs-savings: a key side larger than the fact's best-case
    // pruning cannot pay for its own bitset build — decline even at
    // razor fpp
    assert(bloomDecision(2000000, 8, Some(1000000L)).isEmpty &&
      bloomDecision(2000000, 8, Some(100000000L)).nonEmpty,
      "2M keys (fpp 8%) pay against a 10^8-row fact but not a 10^6-row one")
  }

  // ---- PLAN-FINGERPRINT REGRESSION GATE (r17, verdict task #4) ----
  // Golden (#shuffle, #broadcast, #SMJ, #BHJ, #aggregates, #windows)
  // counts for the most expensive batch queries: a refactor that adds
  // a shuffle to a flagship query fails HERE instead of hiding inside
  // the 88-98 s ambient bench band. An INTENTIONAL plan improvement
  // updates the golden with a BENCH_NOTES A/B row justifying it.

  /** Operator counts by a TREE WALK over the executed plan, with each
    * cached subtree (InMemoryTableScan reference) counted ONCE per
    * distinct relation — the printed plan repeats the cached subplan
    * under every scan referencing it, so a string count inflates with
    * reference count and a real lost-cache double execution would be
    * indistinguishable from one more printed reference (r20 ADVICE). */
  private def fingerprint(df: org.apache.spark.sql.DataFrame)
      : Map[String, Int] = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.window.WindowExec
    val acc = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val seenCaches = scala.collection.mutable.Set.empty[Int]
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case t =>
        t match {
          case sc: InMemoryTableScanExec =>
            if (seenCaches.add(System.identityHashCode(sc.relation.cacheBuilder)))
              walk(sc.relation.cachedPlan)
          case _: ShuffleExchangeLike => acc("shuffle") += 1
          case _: BroadcastExchangeLike => acc("broadcast") += 1
          case _: SortMergeJoinExec => acc("smj") += 1
          case _: BroadcastHashJoinExec => acc("bhj") += 1
          case _: HashAggregateExec | _: ObjectHashAggregateExec |
               _: SortAggregateExec => acc("agg") += 1
          case _: WindowExec => acc("window") += 1
          case _: TakeOrderedAndProjectExec => acc("topk") += 1
          case _ => ()
        }
        (t.children ++ t.subqueries).foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    Seq("shuffle", "broadcast", "smj", "bhj", "agg", "window", "topk")
      .map(k => k -> acc(k)).toMap
  }

  test("plan fingerprints: the expensive batch queries' exchange/join/" +
      "agg shapes are pinned (intentional changes update the golden " +
      "with a BENCH_NOTES A/B row)") {
    def fp(sh: Int, bc: Int, smj: Int, bhj: Int, agg: Int, win: Int,
        topk: Int): Map[String, Int] =
      Map("shuffle" -> sh, "broadcast" -> bc, "smj" -> smj, "bhj" -> bhj,
        "agg" -> agg, "window" -> win, "topk" -> topk)
    // golden at the spec's sf0.001 (plan SHAPE, not timing): captured
    // r17; every broadcast here must stay a broadcast, and no query
    // may grow an exchange without an explicit golden update
    val golden: Map[String, Map[String, Int]] = Map(
      "dd02_ngram_jaccard" -> fp(4, 3, 0, 3, 6, 0, 0),
      "dd03_minhash_lsh" -> fp(4, 2, 0, 2, 6, 1, 0),
      "dd04_simhash" -> fp(3, 1, 0, 1, 4, 0, 0),
      "dd06_passage_dedup" -> fp(3, 1, 0, 1, 4, 0, 0),
      "dd08_semdedup" -> fp(3, 1, 0, 1, 4, 0, 0),
      "dd09_semdedup_hier" -> fp(3, 1, 0, 1, 4, 0, 0),
      "dd11_span_coverage" -> fp(4, 1, 0, 1, 6, 0, 0),
      "tx16_source_top_terms" -> fp(3, 0, 0, 0, 4, 0, 0),
      "tx17_quality_buckets" -> fp(5, 3, 0, 3, 8, 0, 0),
      // r21: the fingerprint walks the plan tree and counts each
      // cached subtree ONCE per relation — EXECUTED operators, so a
      // lost cache hit (subtree re-executed under every reference)
      // now fails this golden loudly instead of moving counts around
      "sp12_quality_curate" -> fp(5, 5, 0, 5, 8, 0, 0),
      "sim05_ivf_ann" -> fp(2, 1, 0, 1, 2, 0, 0),
      "q20_outer_filter" -> fp(1, 1, 0, 1, 0, 0, 0),
      "q33_anti_join" -> fp(2, 1, 0, 1, 2, 0, 0),
      "st02_sessionize" -> fp(2, 0, 0, 0, 2, 2, 0),
      "tx10_zipf_rank" -> fp(3, 2, 0, 2, 2, 1, 0))
    val names = Seq("dd02_ngram_jaccard", "dd03_minhash_lsh",
      "dd04_simhash", "dd06_passage_dedup", "dd08_semdedup",
      "dd09_semdedup_hier", "dd11_span_coverage", "tx16_source_top_terms",
      "tx17_quality_buckets", "sp12_quality_curate", "sim05_ivf_ann",
      "q20_outer_filter", "q33_anti_join", "st02_sessionize",
      "tx10_zipf_rank")
    val queries = SparkEntry.queries
    val got = names.map { nm =>
      graft.operators.Dedup.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
      nm -> fingerprint(queries(nm)(spark, sf))
    }.toMap
    val diffs = names.flatMap { nm =>
      golden.get(nm) match {
        case None => Seq(s"MISSING golden for $nm: ${got(nm)}")
        case Some(g) if g != got(nm) =>
          Seq(s"$nm: golden $g != actual ${got(nm)}")
        case _ => Nil
      }
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }

  // ---- AUTO-GOLDEN: the WHOLE batch battery (r18, verdict task #6) --
  // The 15 hand-pinned queries above prove the mechanism; this test
  // loads a committed JSON golden covering EVERY batch query, so any
  // query's shape drift fails with a named diff. Regenerate after an
  // INTENTIONAL plan change (with a BENCH_NOTES A/B row justifying it):
  //   GRAFT_REGEN_PLAN_GOLDENS=1 sbt 'testOnly graft.PlanShapeSpec -- -z auto-golden'
  // Streaming lifecycles (st*) are excluded: their final frame's shape
  // is dominated by ephemeral checkpoint/table state, not by the
  // operator plan this gate protects.

  private val goldensPath = "plan_goldens.json"

  private def fingerprintLine(m: Map[String, Int]): String =
    Seq("shuffle", "broadcast", "smj", "bhj", "agg", "window", "topk")
      .map(k => s""""$k":${m.getOrElse(k, 0)}""").mkString("{", ",", "}")

  private def parseGoldens(text: String): Map[String, Map[String, Int]] = {
    // the file is machine-written flat JSON: {"name":{"shuffle":N,...},...}
    val entry = """"([^"]+)":\{([^}]*)\}""".r
    val kv = """"([a-z]+)":(\d+)""".r
    entry.findAllMatchIn(text).map { m =>
      m.group(1) -> kv.findAllMatchIn(m.group(2))
        .map(x => x.group(1) -> x.group(2).toInt).toMap
    }.toMap
  }

  test("auto-golden plan fingerprints: EVERY batch query's exchange/" +
      "join/agg/window shape matches the committed plan_goldens.json " +
      "(regenerate with GRAFT_REGEN_PLAN_GOLDENS=1 + a BENCH_NOTES row)") {
    // cur05 is excluded: the parallel coordinator PERSISTS its rider
    // frames, so the merged plan's exchange count depends on what the
    // session already cached (InMemoryRelation swallowing subtrees) —
    // a session-history artifact, not an operator shape; its stable
    // components are pinned via cur01-04 and the hand-pinned goldens
    val names = SparkEntry.queries.keys.toSeq
      .filterNot(n => n.startsWith("st") || n == "cur05_parallel_merge")
      .sorted
    val queries = SparkEntry.queries
    val got = names.map { nm =>
      graft.operators.Dedup.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
      nm -> fingerprint(queries(nm)(spark, sf))
    }
    if (sys.env.contains("GRAFT_REGEN_PLAN_GOLDENS")) {
      val json = got.map { case (n, m) => s""""$n":${fingerprintLine(m)}""" }
        .mkString("{\n", ",\n", "\n}\n")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(goldensPath), json)
      info(s"REGENERATED $goldensPath with ${got.size} fingerprints")
    } else {
      val text = java.nio.file.Files.readString(
        java.nio.file.Paths.get(goldensPath))
      val golden = parseGoldens(text)
      val diffs = got.flatMap { case (nm, m) =>
        golden.get(nm) match {
          case None => Seq(s"MISSING golden for $nm: ${fingerprintLine(m)}")
          case Some(g) if g != m =>
            Seq(s"$nm: golden ${fingerprintLine(g)} != actual ${fingerprintLine(m)}")
          case _ => Nil
        }
      } ++ golden.keys.filterNot(names.contains).map(n =>
        s"STALE golden entry $n (query removed?) — regenerate")
      assert(diffs.isEmpty,
        s"${diffs.size} plan-shape drifts:\n${diffs.mkString("\n")}")
    }
  }
}

