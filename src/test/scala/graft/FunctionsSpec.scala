package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Native-expression tests: the codegen'd FixedPointDot must agree
  * exactly with (a) the interpreted higher-order-function formulation
  * it replaced and (b) a driver-side Scala reference, and be callable
  * from SQL after registration.
  */
class FunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("fixdot matches the aggregate/zip_with fixed-point formulation") {
    val hof = expr(
      """aggregate(zip_with(embedding, embedding, (x, y) ->
        |    cast(floor(cast(x as double) * cast(y as double) * 1e12) as bigint)),
        |  0L, (acc, v) -> acc + v)""".stripMargin)
    val df = graft.core.Tables.embeddings(spark, sf)
      .select(GraftFunctions.fixdot(col("embedding"), col("embedding")).as("native"),
        hof.as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("intdot matches the aggregate/zip_with integer formulation") {
    import spark.implicits._
    val df = Seq(
      (Array(1, -2, 3), Array(4, 5, -6)),
      (Array(127, 127, 127), Array(127, 127, 127)),
      (Array(Int.MaxValue, 1), Array(2, 2))) // per-product long, no int overflow
      .toDF("a", "b")
      .select(GraftFunctions.intdot(col("a"), col("b")).as("native"),
        expr("""aggregate(zip_with(a, b, (x, y) -> cast(x as bigint) * y),
               |  0L, (acc, v) -> acc + v)""".stripMargin).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(4L - 10L - 18L, 3L * 127L * 127L, Int.MaxValue * 2L + 2L))
  }

  test("intdot pins the FixedPointDot element semantics: skip null slots, truncate to shorter") {
    import spark.implicits._
    val rows = Seq(
      (Array[java.lang.Integer](1, null, 3), Array[java.lang.Integer](10, 20, 30)),
      (Array[java.lang.Integer](2, 2, 2, 2), Array[java.lang.Integer](5, 5)))
      .toDF("a", "b")
      .select(GraftFunctions.intdot(col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(10L + 90L, 20L))
  }

  test("fixdot matches a driver-side reference on a known vector") {
    import spark.implicits._
    val a = Array(0.5f, -1.25f, 3.0f)
    val b = Array(2.0f, 0.5f, -1.0f)
    val expected = a.zip(b).map { case (x, y) =>
      math.floor(x.toDouble * y.toDouble * 1e12).toLong }.sum
    val got = Seq((a, b)).toDF("a", "b")
      .select(GraftFunctions.fixdot(col("a"), col("b")))
      .collect()(0).getLong(0)
    assert(got == expected)
  }

  test("null array yields null; null elements are skipped") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(GraftFunctions.fixdot(col("a"), col("b")).as("d"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("fixdot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    graft.core.Tables.embeddings(spark, sf).createOrReplaceTempView("emb")
    val n = spark.sql(
      "SELECT fixdot(embedding, embedding) AS d FROM emb WHERE vec_id < 3")
      .filter(col("d") > 0).count()
    assert(n == 3)
  }

  test("type mismatch is a clear analysis error") {
    val ex = intercept[Exception] {
      graft.core.Tables.orders(spark, sf)
        .select(GraftFunctions.fixdot(col("o_orderkey"), col("o_orderkey")))
        .collect()
    }
    assert(ex.getMessage.contains("fixdot") || ex.getMessage.contains("DATATYPE"))
  }

  test("topKByScore: any partitioning/merge order equals global sort-take-k") {
    import graft.functions.Udafs
    val rnd = new scala.util.Random(42)
    val agg = Udafs.topKByScore(5)
    for (trial <- 1 to 50) {
      val n = 1 + rnd.nextInt(60)
      // duplicate scores on purpose — ties must break by id
      val rows = Seq.fill(n)(Udafs.ScoredId(
        rnd.nextInt(8).toDouble, rnd.nextInt(1000).toLong))
      val expected = rows.sortBy(s => (-s.score, s.id)).take(5)
      val direct = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
      assert(direct.toList == expected.toList,
        s"trial $trial: sequential reduce disagrees with sort-take-k")
      // random partitioning into 1..6 slices, each reduced then merged
      // in shuffled order — the aggregate must not care
      val slices = rows.grouped(1 + rnd.nextInt(6)).toSeq
      val partials = rnd.shuffle(slices.map(_.foldLeft(agg.zero)(agg.reduce)))
      val merged = agg.finish(partials.foldLeft(agg.zero)(agg.merge))
      assert(merged.toList == expected.toList,
        s"trial $trial: merge order changed the result")
    }
  }

  test("Bloom builder (Column math) and prober (JVM math) agree: zero false negatives") {
    // the builder computes positions in Column arithmetic (xxhash64 +
    // shiftrightunsigned + pmod), the prober in JVM arithmetic inside
    // BloomMightContain — if either side's Kirsch-Mitzenmacher math
    // drifts (signed vs unsigned shift, floorMod vs %), members start
    // missing SILENTLY (a Bloom has no false-negative alarm). Random
    // key sets, including negatives and Long extremes, must all pass.
    import spark.implicits._
    import graft.operators.KeyShip
    import graft.functions.BloomProbe
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val keys = (Seq(Long.MaxValue, Long.MinValue + 1, -1L, 0L) ++
        Seq.fill(300)(rnd.nextLong())).distinct
      val m = 4096L
      val words = KeyShip.bloomWords(keys.toDF("k"), "k", m, hashes = 2)
      val misses = keys.filterNot(k => BloomProbe.test(words, m, 2, k))
      assert(misses.isEmpty,
        s"trial $trial: builder/prober hash mismatch — members missing: " +
          misses.take(5).mkString(", "))
    }
  }
}
