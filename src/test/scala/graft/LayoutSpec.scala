package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Layout

/** Z-order layout (`core/Layout`): bit-interleave correctness, write
  * round-trip invariance, and the property the op exists for — a
  * selective predicate on a non-leading clustered dimension prunes
  * most files from footer stats, where a single-column linear sort
  * prunes none. */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("interleaveBits matches the textbook Z-curve on known values") {
    import spark.implicits._
    // Morton order for 2 dims: z(x, y) with x in the high lane.
    // z(1,0)=2, z(0,1)=1, z(1,1)=3, z(2,3)=classic 14? Compute:
    // x=2 (b10), y=3 (b11): bits x1=1,x0=0,y1=1,y0=1 →
    // z = x1 y1 x0 y0 = 1 1 0 1 = 13.
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L),
      (65535L, 65535L)).toDF("x", "y")
    val got = df.select(Layout.interleaveBits(Seq(col("x"), col("y")))
      .as("z")).as[Long].collect().toSeq
    assert(got == Seq(0L, 2L, 1L, 3L, 13L, (1L << 32) - 1))
  }

  test("interleaveBits is monotone in each argument with others fixed") {
    import spark.implicits._
    val df = (0L until 64L).map(v => (v, 7L)).toDF("x", "y")
    val zs = df.select(Layout.interleaveBits(Seq(col("x"), col("y"))))
      .as[Long].collect().toSeq
    assert(zs == zs.sorted && zs.distinct.size == zs.size)
  }

  test("z-ordered write is result-invariant and prunes the off-axis dimension") {
    val base = graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val root = java.nio.file.Files.createTempDirectory("layout-spec").toString

    // linear baseline: range-sorted on l_partkey ONLY (the layout a
    // single ORDER BY write produces)
    base.repartitionByRange(32, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$root/linear")
    // Z-order on (l_partkey, l_suppkey)
    Layout.writeZOrdered(base, s"$root/zorder",
      Seq("l_partkey", "l_suppkey"), numFiles = 32)

    // 1) result invariance: identical multiset of rows
    val a = spark.read.parquet(s"$root/zorder")
      .orderBy("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      .collect().toSeq
    val b = base.orderBy("l_orderkey", "l_partkey", "l_suppkey",
      "l_quantity").collect().toSeq
    assert(a == b)

    // 2) pruning on the off-sort-axis dimension (l_suppkey ∈ [0, 1] —
    // 20% of the 0..9 domain at sf0.001): the linear layout's files
    // all span the full suppkey range; Z-order confines suppkey to
    // per-file rectangles. Footer-stat intersection counts are what a
    // scan's row-group pruning reads.
    val linN = Layout.filesIntersecting(spark, s"$root/linear",
      "l_suppkey", 0, 1)
    val zN = Layout.filesIntersecting(spark, s"$root/zorder",
      "l_suppkey", 0, 1)
    assert(linN == 32, s"linear layout should not prune suppkey: $linN")
    assert(zN * 2 <= linN,
      s"z-order should read at most half the files: $zN vs $linN")

    // 3) the leading dimension still prunes in BOTH layouts
    val linP = Layout.filesIntersecting(spark, s"$root/linear",
      "l_partkey", 0, 24)
    val zP = Layout.filesIntersecting(spark, s"$root/zorder",
      "l_partkey", 0, 24)
    assert(linP <= 8 && zP <= 16,
      s"leading-dim pruning regressed: linear $linP, zorder $zP")
    println(s"[layout] suppkey-box files: linear $linN zorder $zN; " +
      s"partkey-box: linear $linP zorder $zP")
  }

  test("rankBucket: unrolled binary search = count of boundaries <= value") {
    import spark.implicits._
    val bounds = Array(10.0, 20.0, 30.0)
    val got = Seq(5L, 10L, 15L, 20L, 25L, 30L, 35L).toDF("x")
      .select(col("x"), Layout.rankBucket(col("x"), bounds).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 0L, 10L -> 1L, 15L -> 1L, 20L -> 2L,
      25L -> 2L, 30L -> 3L, 35L -> 3L))
  }

  test("equi-depth z-buckets keep pruning on a skewed column; uniform collapse") {
    // 95% of rows live in [0, 1000) of a [0, 1e9) domain: uniform
    // 16-bit buckets map the whole dense region to bucket 0, the
    // interleave loses its a-lane there, and a selective dense-region
    // predicate reads ~every file. Equi-depth buckets give the dense
    // region ~243 of 256 buckets, so the same predicate prunes.
    val root = java.nio.file.Files.createTempDirectory("layout-rank").toString
    val base = spark.range(200000).toDF("id")
      .withColumn("a",
        when(pmod(hash(col("id")), lit(100)) < 95,
          pmod(hash(col("id") + 1), lit(1000)).cast("long"))
          .otherwise(pmod(hash(col("id") + 2), lit(1000000000)).cast("long")))
      .withColumn("a", abs(col("a")))
      .withColumn("b", abs(pmod(hash(col("id") + 3), lit(65536))).cast("long"))
    Layout.writeZOrdered(base, s"$root/uniform", Seq("a", "b"),
      numFiles = 32)
    Layout.writeZOrdered(base, s"$root/ranked", Seq("a", "b"),
      numFiles = 32, ranked = true)
    // result invariance: the layout is invisible to query semantics
    def sig(p: String) = spark.read.parquet(p)
      .agg(count(lit(1)), sum(col("a")), sum(col("b")), sum(col("id")))
      .first().toSeq
    assert(sig(s"$root/uniform") == sig(s"$root/ranked"))
    // a 20%-of-dense-mass box: [100, 300) of the [0, 1000) region
    val uN = Layout.filesIntersecting(spark, s"$root/uniform", "a", 100, 299)
    val rN = Layout.filesIntersecting(spark, s"$root/ranked", "a", 100, 299)
    assert(uN >= 24,
      s"fixture should collapse the uniform layout's a-lane: $uN of 32")
    assert(rN * 2 <= uN,
      s"equi-depth buckets should prune the dense box: $rN vs uniform $uN")
    println(s"[layout] skewed dense box: uniform $uN ranked $rN of 32 files")
  }

  test("writeZOrderedAuto picks uniform on even data, equi-depth under skew") {
    val root = java.nio.file.Files.createTempDirectory("layout-auto").toString
    val uniform = spark.range(50000).toDF("id")
      .withColumn("a", abs(pmod(hash(col("id")), lit(1000000))).cast("long"))
      .withColumn("b", abs(pmod(hash(col("id") + 1), lit(65536))).cast("long"))
    assert(!Layout.writeZOrderedAuto(uniform, s"$root/u", Seq("a", "b"), 8),
      "even data must keep uniform buckets (ranked costs a quantile pass)")
    val skewed = spark.range(50000).toDF("id")
      .withColumn("a",
        when(pmod(hash(col("id")), lit(100)) < 95,
          abs(pmod(hash(col("id") + 1), lit(1000))).cast("long"))
          .otherwise(abs(pmod(hash(col("id") + 2), lit(1000000000))).cast("long")))
      .withColumn("b", abs(pmod(hash(col("id") + 3), lit(65536))).cast("long"))
    assert(Layout.writeZOrderedAuto(skewed, s"$root/s", Seq("a", "b"), 8),
      "a heavy-tailed column must flip the layout to equi-depth buckets")
    // either way the write is a real z-ordered table
    assert(spark.read.parquet(s"$root/u").count() == 50000)
    assert(spark.read.parquet(s"$root/s").count() == 50000)
  }

  test("interleaveBits is a bijection on 16-bit pairs (property)") {
    // injectivity is what makes the Z-value a lossless clustering key:
    // two distinct (x, y) cells can never share a file boundary
    // decision by accident. Check engine-side (the same codegen'd
    // expression the writer uses), driver-replicated.
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    import spark.implicits._
    def zDriver(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
      }
    val pairGen = for {
      x <- Gen.choose(0L, 65535L); y <- Gen.choose(0L, 65535L)
    } yield (x, y)
    val prop = Prop.forAll(pairGen, pairGen) { (a, b) =>
      (zDriver(a._1, a._2) == zDriver(b._1, b._2)) == (a == b)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, s"injectivity property failed: ${res.status}")
    // the engine expression agrees with the driver replica on a batch
    val pairs = Gen.listOfN(200, pairGen).sample.get
    val got = pairs.toDF("x", "y")
      .select(Layout.interleaveBits(Seq(col("x"), col("y"))).as("z"))
      .as[Long].collect().toSeq
    assert(got == pairs.map { case (x, y) => zDriver(x, y) })
  }

  test("string z-columns cluster by hash bucket: equality groups co-locate") {
    // documents clustered on (lang, doc_id): every (file, lang) slice
    // must cover far fewer doc_ids than the whole table — i.e. equal
    // lang values are contiguous in z-order, so a lang = 'x' equality
    // scan reads a subset of files (range predicates on strings stay
    // unprunable by design — hash order is not lexicographic)
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars")
    val root = java.nio.file.Files.createTempDirectory("layout-str").toString
    Layout.writeZOrdered(docs, s"$root/z", Seq("lang", "doc_id"),
      numFiles = 16)
    val perFile = spark.read.parquet(s"$root/z")
      .withColumn("f", org.apache.spark.sql.functions.input_file_name())
      .groupBy("f").agg(countDistinct(col("lang")).as("nl"))
      .collect().map(_.getLong(1))
    val totalLangs = docs.select("lang").distinct().count()
    assert(totalLangs >= 4, s"fixture needs several langs: $totalLangs")
    // hash-bucketed leading lane → most files hold a small subset of
    // the languages (perfect clustering would be 1-2 per file)
    val avg = perFile.sum.toDouble / perFile.length
    assert(avg <= totalLangs / 2.0,
      s"string lane failed to cluster: avg $avg of $totalLangs langs per file")
  }
}
