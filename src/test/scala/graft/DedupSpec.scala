package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Dedup scale-hardening: the frequent-shingle document-frequency cap
  * (a shingle in k docs emits k·(k-1)/2 candidate pairs — hot
  * boilerplate shingles must be dropped before the inverted-index
  * self-join or candidate generation is quadratic in df at corpus
  * scale).
  */
class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hot-shingle df cap prunes boilerplate pairs, keeps cold pairs") {
    import spark.implicits._
    // five docs that are ONE identical hot shingle (df=5), plus two
    // docs sharing a cold shingle (df=2)
    val docs = (
      (1L to 5L).map(i => (i, "a b c d e")) ++
        Seq((10L, "p q r s t"), (11L, "p q r s t"))
      ).toDF("doc_id", "text")
    val sh = Dedup.shingle(docs).cache()
    try {
      // cap above every df: all 11 pairs (C(5,2) hot + 1 cold)
      val uncapped = Dedup.ddNgramJaccardFrom(sh, maxDf = 100).collect()
      assert(uncapped.length == 11, s"got ${uncapped.length}")
      // cap of 3: the df=5 boilerplate shingle is dropped BEFORE the
      // join; the df=2 cold pair must survive untouched
      val capped = Dedup.ddNgramJaccardFrom(sh, maxDf = 3).collect()
      assert(capped.length == 1, s"got ${capped.length}")
      assert(capped(0).getLong(0) == 10L && capped(0).getLong(1) == 11L)
      assert(capped(0).getAs[Double]("jaccard") == 1.0)
    } finally { sh.unpersist(); () }
  }

  test("connected components: star contraction matches ground truth on adversarial graphs") {
    import spark.implicits._
    // worst cases for star contraction: a long chain (max diameter —
    // plain min-propagation would need 30 rounds, the star alternation
    // must finish in O(log n)), a cycle, a pre-made star, an isolated
    // edge, and a component whose min arrives via the LARGEST id
    val chain = (1L until 30L).map(i => (i, i + 1))            // comp 1
    val cycle = Seq((100L, 101L), (101L, 102L), (102L, 103L), (100L, 103L))
    val star = Seq((200L, 201L), (200L, 202L), (200L, 203L))
    val lone = Seq((300L, 301L))
    val viaMax = Seq((400L, 999L), (999L, 401L))               // 400~401 only through 999
    val pairs = (chain ++ cycle ++ star ++ lone ++ viaMax)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("x", "y")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want =
      (1L to 30L).map(_ -> 1L).toMap ++
        (100L to 103L).map(_ -> 100L) ++
        (200L to 203L).map(_ -> 200L) ++
        Seq(300L -> 300L, 301L -> 300L) ++
        Seq(400L -> 400L, 401L -> 400L, 999L -> 400L)
    assert(got == want,
      s"wrong labels: ${got.toSet -- want.toSet} vs missing ${want.toSet -- got.toSet}")
    // star contraction must be O(log n): the 30-node chain (diameter
    // 29) has to collapse in ~log2 rounds + 1 convergence-detect round,
    // not the ~30 rounds plain min-propagation would take
    assert(Dedup.lastCcRounds <= 8,
      s"contraction took ${Dedup.lastCcRounds} rounds — not logarithmic")
  }

  test("dd04 simhash: blocked join equals brute-force Hamming ≤ 3 ground truth") {
    // dd04 is oracle-checked (md5-derived signatures are reproducible
    // in DuckDB), and this spec additionally pins the BLOCKING: the
    // 16-bit band scheme is LOSSLESS for Hamming ≤ 3 (pigeonhole:
    // 3 flipped bits touch at most 3 of 4 bands, so one band always
    // matches) and the verify filter admits nothing above 3 — the
    // emitted pair set must therefore EQUAL the brute-force all-pairs
    // set over the same signatures, with correct distances.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = Dedup.queries("dd04_simhash")(spark, dir).cache()
    try {
      val rows = out.collect()
      assert(rows.nonEmpty, "dd04 found no pairs on the seeded corpus")
      assert(rows.forall(r => r.getLong(0) < r.getLong(1)), "non-canonical pair")
      assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
      val sig = Dedup.simhashSignatures(spark, dir)
      val ham = (bit_count(col("hx").bitwiseXOR(col("hy")))
        + bit_count(col("lx").bitwiseXOR(col("ly"))))
      val truth = sig.select(col("doc_id").as("x"), col("hi_sig").as("hx"), col("lo_sig").as("lx"))
        .crossJoin(sig.select(col("doc_id").as("y"), col("hi_sig").as("hy"), col("lo_sig").as("ly")))
        .filter(col("x") < col("y") && ham <= 3)
        .select(col("x"), col("y"), ham.cast("bigint").as("hamming"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(truth.nonEmpty, "corpus seeded no Hamming ≤ 3 signature pairs")
      val emitted = rows.map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("hamming"))).toSet
      assert(emitted == truth,
        s"blocked join diverged from brute force: missed=${truth -- emitted} extra=${emitted -- truth}")
    } finally { out.unpersist(); () }
  }

  test("default cap exceeds the test corpus's max shingle df") {
    // guards the dd02 oracle: with the default cap the result set on
    // the driver's test data must be identical to the uncapped run
    val dir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.documents(spark, dir)
    val sh = Dedup.shingle(docs).cache()
    try {
      import org.apache.spark.sql.functions._
      val maxDf = sh.select(explode(col("shingles")).as("s"))
        .groupBy("s").count().agg(max("count")).collect()(0).getLong(0)
      assert(maxDf <= Dedup.DefaultMaxShingleDf,
        s"test-corpus max shingle df $maxDf exceeds the default cap — " +
          "dd02's oracle hash would change")
    } finally { sh.unpersist(); () }
  }
}
