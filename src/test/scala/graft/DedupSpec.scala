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
    // the r21 pairsDistinct fast path (callers prove the input is
    // duplicate-free, the initial dedup exchange is skipped) must be
    // label-for-label identical on a unique pair set
    val gotFast = Dedup.connectedComponents(pairs.distinct(),
        pairsDistinct = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotFast == got,
      s"pairsDistinct path diverged: ${gotFast.toSet.diff(got.toSet)}")
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

  test("dd10 containment catches an embedded doc that Jaccard misses") {
    import spark.implicits._
    // small doc fully embedded at the head of a much larger doc: every
    // one of its shingles is in the big doc's set, so containment = 1.0
    // while Jaccard ≈ 6/202 ≈ 0.03 — far below dd02's 0.2 floor
    val small = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    val bigTail = (1 to 200).map(i => s"z$i").mkString(" ")
    val docs = Seq(
      (1L, small),
      (2L, s"$small $bigTail"),
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8")).toDF("doc_id", "text")
    val sh = Dedup.shingle(docs).cache()
    try {
      val jac = Dedup.ddNgramJaccardFrom(sh, Dedup.DefaultMaxShingleDf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!jac.contains((1L, 2L)),
        "resemblance must NOT flag the embedded pair (that is the gap)")
      val cont = Dedup.ddContainmentFrom(sh, Dedup.DefaultMaxShingleDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
      assert(cont.exists(c => c._1 == 1L && c._2 == 2L && c._3 == 1.0),
        s"doc 1 must be fully contained in doc 2: ${cont.toSeq}")
      assert(!cont.exists(c => c._1 == 2L && c._2 == 1L),
        "the big doc is NOT contained in the small one")
      assert(!cont.exists(c => c._1 == 3L || c._2 == 3L),
        "unrelated doc stays clear")
    } finally { sh.unpersist(); () }
  }

  test("dd11 span coverage: planted cross-doc span counts exactly its interior windows") {
    import spark.implicits._
    // A and B share an exact 25-token span wrapped in unique context;
    // with w=20 exactly the 6 fully-interior windows (25-20+1) of each
    // doc are duplicated — boundary-crossing windows mix in unique
    // context tokens and must NOT count. C has no shared span; D is
    // shorter than one window and yields no row at all.
    val span = (0 until 25).map(i => s"s$i").mkString(" ")
    def uniq(p: String, n: Int, from: Int = 0) =
      (from until from + n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, s"${uniq("a", 10)} $span ${uniq("a", 10, 10)}"),
      (2L, s"${uniq("b", 10)} $span ${uniq("b", 10, 10)}"),
      (3L, uniq("c", 45)),
      (4L, uniq("d", 10))
    ).toDF("doc_id", "text")
    val out = Dedup.ddSpanCoverageFrom(docs, w = 20).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> ((26L, 6L)), 2L -> ((26L, 6L)), 3L -> ((26L, 0L))),
      s"unexpected coverage: $out")
  }

  test("dd11: a corpus-wide boilerplate gram flags every doc, exactly once each") {
    import spark.implicits._
    // 300 docs share one 20-token boilerplate span (gram df = 300 — the
    // hot-key shape) followed by 10 unique tokens: every doc has 11
    // windows, and EXACTLY the one fully-interior boilerplate window is
    // duplicated — the hot gram must neither explode the plan (df is an
    // aggregate, no pair stage) nor leak into the unique-tail windows
    val span = (0 until 20).map(i => s"b$i").mkString(" ")
    val docs = (1 to 300).map(i =>
      (i.toLong, s"$span " + (0 until 10).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.ddSpanCoverageFrom(docs, w = 20).collect()
    assert(out.length == 300)
    out.foreach { r =>
      assert(r.getLong(1) == 11L && r.getLong(2) == 1L,
        s"doc ${r.getLong(0)}: got (${r.getLong(1)}, ${r.getLong(2)}), want (11, 1)")
    }
  }

  test("dd12 incremental: delta verdicts against the history index only") {
    import spark.implicits._
    // history: docs 1 and 2 are identical copies of a 12-token text,
    // doc 3 is unrelated. Delta (doc_id % 10 == 9): 19 is another
    // identical copy → flagged with best_match = 1 (jaccard ties →
    // lowest history id); 29 is novel → clean; 39 and 49 are copies of
    // EACH OTHER but match nothing in history → both clean (within-
    // batch dups are the NEXT batch's history lookups, not this
    // operator's output — the index is strictly pre-batch).
    val hit = (0 until 12).map(i => s"h$i").mkString(" ")
    val batchDup = (0 until 12).map(i => s"z$i").mkString(" ")
    val docs = Seq(
      (1L, hit), (2L, hit), (3L, (0 until 12).map(i => s"c$i").mkString(" ")),
      (19L, hit), (29L, (0 until 12).map(i => s"n$i").mkString(" ")),
      (39L, batchDup), (49L, batchDup)
    ).toDF("doc_id", "text")
    val out = Dedup.ddIncrementalFrom(docs, Dedup.shingle(docs), maxDf = 100)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(out == Map(19L -> ((true, 1L)), 29L -> ((false, -1L)),
      39L -> ((false, -1L)), 49L -> ((false, -1L))), s"unexpected: $out")
  }

  test("dd12: the df cap is an index-build-time stat — history-only df") {
    import spark.implicits._
    // one shingle is hot in HISTORY (df=4 across history docs) and a
    // delta doc is made of exactly that text: with cap=3 the index
    // drops the hot postings, so the delta doc comes back clean —
    // the one-sided cap bound (drops borderline matches, never admits
    // false ones). A cold history match in the same batch survives.
    val hot = (0 until 8).map(i => s"w$i").mkString(" ")
    val cold = (0 until 8).map(i => s"k$i").mkString(" ")
    val docs = Seq(
      (1L, hot), (2L, hot), (3L, hot), (4L, hot), (5L, cold),
      (19L, hot), (29L, cold)
    ).toDF("doc_id", "text")
    val out = Dedup.ddIncrementalFrom(docs, Dedup.shingle(docs), maxDf = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(19L -> false, 29L -> true), s"unexpected: $out")
  }

  test("dd03 LSH: band-bucket cap drops a planted degenerate band, keeps cold pairs") {
    import spark.implicits._
    // 5,000 identical docs: every band bucket they form holds 5,000
    // ids → 12.5M candidate pairs per band uncapped. With the cap the
    // buckets are dropped BEFORE the collect_set/pair explode, so the
    // run stays sub-quadratic; a cold near-dup pair outside the hot
    // set must survive untouched.
    val hotDocs = (1L to 5000L).map(i => (i, "w1 w2 w3 w4 w5 w6 w7 w8"))
    val coldPair = Seq(
      (100001L, "p q r s t u v x y z"),
      (100002L, "p q r s t u v x y z"))
    val sh = Dedup.shingle((hotDocs ++ coldPair).toDF("doc_id", "text")).cache()
    try {
      val capped = Dedup.ddMinhashLshFrom(sh, maxBucket = 100).collect()
      assert(capped.length == 1, s"only the cold pair should survive: ${capped.length}")
      assert(capped(0).getLong(0) == 100001L && capped(0).getLong(1) == 100002L)
      // the SAME hot-band shape under the cap threshold is still found:
      // a 50-doc identical cluster emits all C(50,2) pairs
      val small = Dedup.shingle(
        ((1L to 50L).map(i => (i, "w1 w2 w3 w4 w5 w6 w7 w8")) ++ coldPair)
          .toDF("doc_id", "text")).cache()
      try {
        val found = Dedup.ddMinhashLshFrom(small, maxBucket = 100).count()
        assert(found == 50L * 49 / 2 + 1, s"under-cap cluster must be complete: $found")
      } finally { small.unpersist(); () }
    } finally { sh.unpersist(); () }
  }

  test("dd03 default LSH bucket cap exceeds the test corpus's max bucket") {
    // guards the dd03 oracle: with the default cap the result on the
    // driver's test data is identical to the uncapped run
    val dir = "/root/testdata/sf0.001"
    val sh = Dedup.shingle(graft.core.Tables.documents(spark, dir)).cache()
    try {
      import org.apache.spark.sql.functions._
      val mh = Dedup.minhashedFrom(sh, 32)
      val bandCols = (0 until 8).map { b =>
        val slots = (0 until 4).map(r => col(s"m${b * 4 + r}"))
        xxhash64((lit(b.toLong) +: slots): _*)
      }
      val maxBucket = mh.select(col("doc_id"),
          posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_hash")))
        .groupBy("band_idx", "band_hash").count()
        .agg(max("count")).collect()(0).getLong(0)
      assert(maxBucket <= Dedup.DefaultMaxLshBucket,
        s"test-corpus max LSH bucket $maxBucket exceeds the default cap — " +
          "dd03's oracle hash would change")
    } finally { sh.unpersist(); () }
  }

  test("dd13 symmetric-delete blocking: complete recall at d<=1, equals brute force") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, levenshtein, lower, expr,
      explode, concat, array, lit}
    // planted neighborhood around "throttle valve": one substitution,
    // one insertion, one deletion (all d=1), one d=2, one unrelated
    val rows = Seq(
      (1L, "throttle valve"),
      (2L, "throttle velve"),  // substitution      d=1
      (3L, "throttle valves"), // insertion         d=1
      (4L, "throttl valve"),   // deletion          d=1
      (5L, "thrott1e v4lve"),  // two substitutions d=2 — must NOT match 1
      (6L, "completely other"))
    val names = rows.toDF("id", "name")
    val variants = expr(
      """transform(sequence(1, length(name)),
        |  i -> concat(substring(name, 1, i - 1),
        |              substring(name, i + 1, length(name))))""".stripMargin)
    val keys = names.select(col("id"), col("name"),
      explode(concat(array(col("name")), variants)).as("key"))
    val blocked = keys.as("a").join(keys.as("b"),
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("x"), col("a.name").as("nx"),
        col("b.id").as("y"), col("b.name").as("ny"))
      .distinct()
      .filter(levenshtein(col("nx"), col("ny")) <= 1)
      .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over ALL pairs is the ground truth the blocking must equal
    val brute = (for {
      (i, a) <- rows; (j, b) <- rows if i < j
      if levenshteinDriver(a, b) <= 1
    } yield (i, j)).toSet
    assert(blocked == brute, s"blocked=$blocked brute=$brute")
    assert(brute.contains((1L, 2L)) && brute.contains((1L, 3L)) &&
      brute.contains((1L, 4L)), "all three d=1 edit kinds must be found")
    assert(!blocked.exists(p => p == ((1L, 5L))), "d=2 must not match")
  }

  /** Classic DP levenshtein, driver-side ground truth for dd13. */
  private def levenshteinDriver(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
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
