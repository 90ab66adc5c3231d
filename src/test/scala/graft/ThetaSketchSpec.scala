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

  test("ABOVE nominal capacity (the sf1 regime): estimate within the " +
      "published RSE bound and partition-invariant — the adjudicated " +
      "sk01/sk02/sk04 sf1 behavior, pinned") {
    import spark.implicits._
    // 120k distinct keys >> lgK=14's 16384-entry capacity: the sketch
    // must ESTIMATE here — sk01's sf1 certification row legitimately
    // diverges from exact COUNT DISTINCT (observed 129397 vs 129200,
    // 0.15% — far inside the 1.04/sqrt(16384) ≈ 0.8% RSE; this test
    // pins the bound so a sketch regression cannot hide behind the
    // sf1 exception)
    val n = 120000L
    val df = spark.range(n).select((col("id") * 2654435761L % 1000000007L)
      .as("k"))
    val exact = df.select(countDistinct(col("k"))).collect()(0).getLong(0)
    def est(parts: Int): Long = df.repartition(parts)
      .select(theta_sketch_estimate(theta_sketch_agg(col("k"), 14)))
      .collect()(0).getLong(0)
    val e13 = est(13)
    assert(math.abs(e13 - exact).toDouble / exact < 0.03,
      s"estimate $e13 vs exact $exact breaches the ~3-sigma RSE bound")
    assert(est(4) == e13 && est(32) == e13,
      "above-capacity estimates must not depend on the partitioning")
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

  test("Misra-Gries: heavy-hitter membership survives every parallelism") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, udaf}
    // planted skew: two heavy items (30% + 20%) in a 5k-item stream of
    // 1k distinct tail tokens — k=64 counters, guarantee n/(k+1)≈77
    val rnd = new scala.util.Random(7)
    val items = new scala.util.Random(11).shuffle(
      (Seq.fill(1500)("alpha") ++ Seq.fill(1000)("beta") ++
        (0 until 2500).map(i => s"tail${rnd.nextInt(1000)}")).toList)
      .toDF("token")
    val k = 64
    val mg = udaf(graft.functions.Udafs.misraGries(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]())
    val n = items.count()
    val trueHeavy = items.groupBy("token").agg(count(lit(1)).as("c"))
      .filter(col("c") > n / (k + 1L))
      .collect().map(_.getString(0)).toSet
    assert(trueHeavy.contains("alpha") && trueHeavy.contains("beta"))
    for (p <- Seq(1, 4, 16)) {
      val cands = items.repartition(p).agg(mg(col("token")))
        .collect()(0).getMap[String, Long](0).keySet
      assert(cands.size <= k, s"p=$p: summary exceeded k")
      assert(trueHeavy.subsetOf(cands.toSet),
        s"p=$p: guarantee broken — missing ${trueHeavy -- cands.toSet}")
    }
  }

  test("Misra-Gries: null tokens are ignored, not an NPE") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, udaf}
    val mg = udaf(graft.functions.Udafs.misraGries(4),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]())
    val items = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("token")
    val m = items.agg(mg(col("token")))
      .collect()(0).getMap[String, Long](0)
    assert(m("a") == 2L && m("b") == 1L && m.size == 2,
      s"null tokens must carry no frequency: $m")
  }
}
