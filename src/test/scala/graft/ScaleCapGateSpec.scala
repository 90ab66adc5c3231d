package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** SCALE-SENSITIVE CAP GATE (r17 verdict, ranked task #4): the caps
  * that change behavior with scale used to be verified only by the
  * one-shot offline sf1/skew certifications — a silent-regression
  * hole between rounds. This spec runs the cap-engaging regimes
  * IN-CI at the smallest scale that engages each cap:
  *
  *  - dd02/dd10 hot-shingle df-cap (DefaultMaxShingleDf=1000): a
  *    1,250-doc corpus whose every doc carries one shared boilerplate
  *    run — the interior boilerplate shingles exceed the cap and must
  *    be dropped, leaving EXACTLY the planted unique-token pairs
  *    (capped intersections, dd02's uncapped / dd10's capped sizes),
  *    and a boilerplate-only pair must NOT be emitted (the documented
  *    one-sided bound);
  *  - dd08 cluster routing under a genuinely HOT cluster (300
  *    near-identical vectors → one cluster holds a quadratic pair
  *    group): engine ≡ the independent plain-Scala dual
  *    (CorpusDuals.dd08) row-for-row.
  *
  * The other scale-engaging heuristics are gated by their own specs:
  * theta above-capacity regime (ThetaSketchSpec), bloomDecision
  * crossover + bloom-shipped plans (PlanShapeSpec), MinHash banding
  * recall floors (Dd03RecallGateSpec). COVERAGE.md carries the full
  * cap matrix and the release ritual: any cap-touching change also
  * refreshes the offline CORRECTNESS_SF1/skew certification. */
class ScaleCapGateSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("dd02/dd10 df-cap ENGAGES at df>1000: hot interior shingles " +
      "dropped (boilerplate-only pair suppressed), planted unique-token " +
      "pairs kept with capped intersections and the documented size " +
      "semantics (dd02 uncapped, dd10 capped)") {
    import spark.implicits._
    val boiler = (0 until 9).map(i => s"hot$i") // 5 interior shingles, df=1252
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    // 1,250 carriers: unique filler + the shared boilerplate tail
    for (i <- 0 until 1250)
      docs += ((i.toLong,
        ((0 until 6).map(j => s"f${i}x$j") ++ boiler).mkString(" ")))
    // planted dd02 pairs at exact J=0.8 (m=32 shared shingles, p=4):
    // unique tokens, untouched by the cap
    var id = 10000L
    val plantedDd02 = (0 until 15).map { r =>
      val shared = (0 until 36).map(i => s"p${r}s$i")
      docs += ((id, ((0 until 4).map(i => s"p${r}a$i") ++ shared).mkString(" ")))
      docs += ((id + 1, ((0 until 4).map(i => s"p${r}b$i") ++ shared).mkString(" ")))
      val pair = (id, id + 1); id += 2; pair
    }
    // a BOILERPLATE-ONLY pair: true Jaccard 1.0, but every shingle is
    // over-cap — the one-sided cap must suppress it, not admit it
    val hotOnly = (id, id + 1)
    docs += ((id, boiler.mkString(" ")))
    docs += ((id + 1, boiler.mkString(" ")))
    id += 2
    // dd10 containment plant: C (10 unique tokens) fully inside D
    val (cId, dId) = (id, id + 1)
    val cToks = (0 until 10).map(i => s"c${i}tok")
    docs += ((cId, cToks.mkString(" ")))
    docs += ((dId, (cToks ++ (0 until 5).map(i => s"d${i}tok")).mkString(" ")))
    val sh = Dedup.shingle(docs.toSeq.toDF("doc_id", "text")).cache()
    try {
      val dd02 = Dedup.ddNgramJaccardFrom(sh, Dedup.DefaultMaxShingleDf)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
        .toMap
      // exactly the planted pairs plus the containment plant (C⊂D also
      // resembles at J=6/11 ≥ 0.2) — no carrier pair (their only
      // shared shingles are over-cap), and NOT the boilerplate-only pair
      assert(dd02.keySet == plantedDd02.toSet + ((cId, dId)),
        s"dd02 under the engaged cap: expected the 15 planted pairs + " +
          s"the containment plant, got ${dd02.keySet.size} incl. " +
          s"${(dd02.keySet -- plantedDd02 - ((cId, dId))).take(3)}")
      assert(dd02((cId, dId)) == ((6L, 6L, 11L, 6.0 / 11)),
        s"containment plant's dd02 row: ${dd02((cId, dId))}")
      assert(!dd02.contains(hotOnly),
        "the boilerplate-only pair survived the df-cap — the cap did " +
          "not engage")
      plantedDd02.foreach { pair =>
        // inter = 32 capped shingles; sizes UNCAPPED (4+36-4=36)
        assert(dd02(pair) == ((32L, 36L, 36L, 0.8)),
          s"dd02 $pair: ${dd02(pair)} != (32, 36, 36, 0.8)")
      }
      val dd10 = Dedup.ddContainmentFrom(sh, Dedup.DefaultMaxShingleDf)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      // C ⊂ D at containment 1.0 with CAPPED |C| = 6 (no hot shingles
      // in C, so capped == uncapped here); boilerplate-only docs have
      // ZERO capped postings and cannot appear on either side
      assert(dd10.contains((cId, dId)) &&
        dd10((cId, dId)) == ((6L, 6L, 1.0)), s"${dd10.get((cId, dId))}")
      assert(!dd10.keys.exists(k =>
        k._1 == hotOnly._1 || k._1 == hotOnly._2 ||
          k._2 == hotOnly._1 || k._2 == hotOnly._2),
        "a boilerplate-only doc appeared in dd10 output — its capped " +
          "posting set is empty and it must be invisible to the join")
      // the planted J=0.8 pairs also contain each other at 32/36 ≈
      // 0.889 ≥ 0.8 — emitted BOTH directions with the capped-universe
      // divisor (their shingles are all below the cap, so capped ==
      // uncapped = 36 here)
      assert(dd10(plantedDd02.head) == ((32L, 36L, 32.0 / 36)),
        s"planted pair's containment row: ${dd10.get(plantedDd02.head)}")
      assert(dd10.contains(plantedDd02.head.swap),
        "mutual containment must emit both directions")
    } finally { sh.unpersist(); () }
  }

  test("dd08 under a HOT cluster (300 near-identical vectors): the " +
      "cluster-keyed pair join + closure + keep pick equal the " +
      "independent plain-Scala dual row-for-row") {
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val r = new scala.util.Random(991)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(r.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val base = unit()
    val embs = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[Float], Int)]
    // background: 900 random unit vectors (the first 8 seed the
    // clusters — keep them random so the hot cluster has one centroid)
    for (i <- 0 until 900) embs += ((i.toLong, unit(), r.nextInt(10)))
    // hot cluster: 300 tiny perturbations of one vector — pairwise
    // cosine ≈ 0.999, far above τ=0.3, all routed to one cid → the
    // pair group is quadratic in the cluster, exactly the regime the
    // cluster-keyed join must bound
    for (i <- 900 until 1200)
      embs += ((i.toLong,
        base.zipWithIndex.map { case (x, j) =>
          (x + 0.01 * math.sin(i * 64 + j)).toFloat }, r.nextInt(10)))
    val dir = graft.core.TempDirs.scratchShared("scalecapdd08")
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows = new java.util.ArrayList[R](embs.size)
    embs.foreach { case (id, v, l) => rows.add(R(id, v.toSeq, l)) }
    spark.createDataFrame(rows, schema).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("dd08_semdedup")(spark, dir)
      .collect().toSeq.map(r2 => r2.schema.fieldNames.toSeq.map(f =>
        f -> r2.get(r2.fieldIndex(f))))
    val want = CorpusDuals.dd08(embs.toSeq)
    assert(got.length == want.length,
      s"dd08 hot-cluster: ${got.length} rows != dual ${want.length}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      val gs = g.sortBy(_._1); val ws = w.sortBy(_._1)
      assert(gs.map(_._1) == ws.map(_._1), s"row $i cols differ")
      gs.zip(ws).foreach { case ((c, gv), (_, wv)) =>
        val same = (gv, wv) match {
          case (x: Double, y: Double) => x == y ||
            math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y))
          case (x, y) => x == y
        }
        assert(same, s"dd08 hot-cluster row $i col $c: engine=$gv dual=$wv")
      }
    }
    // the hot regime actually engaged: one dedup group holds ≥ 300
    // members (the 300 plants plus any background that lands nearby)
    val sizes = want.flatMap(_.collectFirst { case ("sz", v: Long) => v })
    assert(sizes.exists(_ >= 300),
      s"hot cluster did not form a ≥300-member dedup group: " +
        s"max group ${if (sizes.isEmpty) 0L else sizes.max}")
  }
}
