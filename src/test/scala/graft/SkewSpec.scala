package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted-join correctness: result must equal the plain join, and the
  * hot key's rows must actually spread across salt buckets. */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("salted equi-join equals the plain join on skewed data") {
    import spark.implicits._
    // fabricate skew: 90% of rows share customer key 1
    val skewed = graft.core.Tables.orders(spark, sf)
      .withColumn("o_custkey",
        when(col("o_orderkey") % 10 =!= 0, lit(1L)).otherwise(col("o_custkey")))
    val dim = graft.core.Tables.customer(spark, sf)
    val plain = skewed.join(dim, skewed("o_custkey") === dim("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedEquiJoin(skewed, "o_custkey",
        Seq("o_orderkey"), dim, "c_custkey", buckets = 8)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    val a = plain.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = salted.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("left_outer salted join preserves unmatched big-side rows") {
    import spark.implicits._
    val big = Seq((1L, 10L), (1L, 11L), (99L, 12L)).toDF("k", "v")
    val small = Seq((1L, "one")).toDF("sk", "name")
    val out = Skew.saltedEquiJoin(big, "k", Seq("v"), small, "sk", 4, "left_outer")
      .select("k", "v", "name").collect()
    assert(out.length == 3)
    assert(out.count(_.isNullAt(2)) == 1) // the k=99 row survives unmatched
  }

  test("the hot key's rows spread across salt buckets") {
    import spark.implicits._
    val big = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "v")
    // exercise the utility's own salt expression
    val buckets = big.withColumn("s", Skew.saltExpr(Seq(col("v")), 8))
      .groupBy("s").count().collect()
    assert(buckets.length == 8, s"expected 8 buckets, got ${buckets.length}")
    assert(buckets.map(_.getLong(1)).max < 1000, "no spreading happened")
  }

  test("right/full outer join types are rejected (would duplicate rows)") {
    import spark.implicits._
    val big = Seq((1L, 1L)).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("sk", "name")
    val ex = intercept[IllegalArgumentException] {
      Skew.saltedEquiJoin(big, "k", Seq("v"), small, "sk", 4, "right_outer")
    }
    assert(ex.getMessage.contains("duplicate"))
  }

  test("hot-key salted join equals the plain join, incl. unmatched rows") {
    import spark.implicits._
    // key 1 is hot (and present in dim), key 7 is cold-with-match,
    // key 99 is cold-unmatched, key 5 is HOT-unmatched (no dim row)
    val big = ((1 to 500).map(i => (1L, i.toLong)) ++
      (1 to 20).map(i => (5L, 1000L + i)) ++
      Seq((7L, 2000L), (99L, 3000L))).toDF("k", "v")
    val small = Seq((1L, "one"), (5L, "five"), (7L, "seven"))
      .toDF("sk", "name")
    for (jt <- Seq("inner", "left_outer")) {
      val plain = big.join(small, big("k") === small("sk"), jt)
        .select("k", "v", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
      val salted = Skew.saltedHotKeyJoin(big, "k", Seq("v"), small, "sk",
          hotKeys = Seq(1L, 5L), buckets = 8, joinType = jt)
        .select("k", "v", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
      assert(plain.toSeq == salted.toSeq, s"mismatch under $jt")
    }
  }

  test("findHotKeys surfaces the dominating key and nothing uniform") {
    import spark.implicits._
    val df = ((1 to 5000).map(i => (42L, i.toLong)) ++
      (1 to 5000).map(i => (i.toLong % 997, i.toLong))).toDF("k", "v")
    val hot = Skew.findHotKeys(df, "k", sampleFrac = 0.5, frac = 0.2)
    assert(hot == Seq(42L), s"expected Seq(42), got $hot")
  }

  test("autoJoin picks plain on uniform keys, hot-key salt on skew — same result") {
    import spark.implicits._
    val dim = (0L until 997L).map(k => (k, s"d$k")).toDF("sk", "name")
    // uniform keys: the decision must be NOT to salt (salting a
    // uniform key measurably loses — the r9 probe's whole point)
    val uniform = (1 to 8000).map(i => (i.toLong % 997, i.toLong))
      .toDF("k", "v")
    val (ju, du) = Skew.autoJoin(uniform, "k", Seq("v"), dim, "sk",
      sampleFrac = 0.5, frac = 0.2)
    assert(du == "plain", s"uniform keys must join plain, got $du")
    assert(ju.count() == 8000)
    // one key owns half the rows: the decision flips to hot-key salt
    val skewed = ((1 to 8000).map(i => (42L, i.toLong)) ++
      (1 to 8000).map(i => (i.toLong % 997, i.toLong))).toDF("k", "v")
    val (js, ds) = Skew.autoJoin(skewed, "k", Seq("v"), dim, "sk",
      sampleFrac = 0.5, frac = 0.2)
    assert(ds.startsWith("hotkey_salt:"), s"skew must salt, got $ds")
    val plain = skewed.join(dim, skewed("k") === dim("sk"))
    assert(js.count() == plain.count(),
      "the chosen plan must not change the result")
  }
}
