package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextOps}

/** Degenerate-input hardening the sf corpora cannot exercise (no
  * 1-token documents, no all-zero embeddings): these inputs crashed or
  * mis-ranked before the guards and must stay pinned.
  */
class EdgeCaseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(tag: String): String = graft.core.TempDirs.scratch(tag)

  test("tx06: a single-token document neither crashes under ANSI nor skews fractions") {
    import spark.implicits._
    val dir = tmpDir("docs")
    Seq(
      (1L, "solo", "en", "web", 4L),
      (2L, "a b a b", "en", "web", 7L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.txRepetition(spark, dir).collect()
    val solo = rows.find(_.getLong(0) == 1L).get
    assert(solo.getAs[Long]("n_tokens") == 1L)
    assert(solo.getAs[Long]("dup_bigram_n") == 0L)
    assert(solo.getAs[Double]("dup_bigram_frac") == 0.0)
    val abab = rows.find(_.getLong(0) == 2L).get
    // bigrams: "a b","b a","a b" → 3 total, 2 distinct → 1 duplicate
    assert(abab.getAs[Long]("dup_bigram_n") == 1L)
  }

  test("sp03/tx11/dd06: 1-token and sub-chunk documents flow through packing, pair counting, passage dedup") {
    import spark.implicits._
    val dir = tmpDir("docs")
    Seq(
      (1L, "solo", "en", "web", 4L),              // 1 token: no pairs
      (2L, "a b c", "en", "web", 5L),             // sub-chunk passage
      (3L, "a b c", "en", "web", 5L),             // exact dup of 2
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // packing over L=4: start offsets 0,1,4 → doc 3 starts in seq 1
    val byId = operators.Sampling.spSequencePackFrom(
      spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("n_tok", size(split(trim(col("text")), "\\s+")).cast("bigint")),
      seqLen = 4, bucketWidth = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byId(1L) == (0L, 0L, 0L))
    assert(byId(2L) == (1L, 0L, 0L))
    assert(byId(3L) == (4L, 1L, 1L))
    // pair counting: doc 1 contributes nothing; (a,b) and (b,c) twice
    val pairs = TextOps.queries("tx11_bpe_merge_rank")(spark, dir)
      .collect().map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(pairs == Map(("a", "b") -> 2L, ("b", "c") -> 2L))
    // passage dedup: docs 2/3 are one identical sub-chunk passage each
    val dup = operators.Dedup.queries("dd06_passage_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(dup(1L) == (1L, 0L) && dup(2L) == (1L, 1L) && dup(3L) == (1L, 1L))
  }

  test("sim07: an all-zero embedding scores NULL cosine and never outranks real neighbors") {
    import spark.implicits._
    val dir = tmpDir("emb")
    val vecs = (0L until 12L).map { i =>
      val v = if (i == 11L) Array.fill(4)(0.0f)
              else Array.tabulate(4)(j => (1.0 + i + j).toFloat)
      (i, v)
    }
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.queries("sim07_int8_topk")(spark, dir).collect()
    assert(out.nonEmpty)
    // NaN would sort first under desc and make vec 11 everyone's top hit
    assert(!out.exists(r => !r.isNullAt(4) && r.getDouble(4).isNaN),
      "NaN cosine leaked into results")
    assert(!out.exists(r => r.getLong(1) == 11L && r.getLong(2) == 1L),
      "zero vector ranked as a top-1 neighbor")
  }

  test("q38-style CUBE: GROUPING() separates a genuinely NULL key from subtotal rows") {
    import spark.implicits._
    // the orders corpus has no NULL keys, so the oracle can't witness
    // this distinction — a synthetic frame must: a NULL category DATA
    // row keeps g_cat = 0, the subtotal row over categories has
    // g_cat = 1, and they must not merge
    val df = Seq((Some("a"), 1L), (None, 2L), (Some("a"), 4L))
      .toDF("cat", "v")
      .cube(col("cat"))
      .agg(sum("v").as("total"), grouping(col("cat")).as("g_cat"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getByte(2).toInt))
      .toSet
    assert(df == Set(
      (Some("a"), 5L, 0),  // real group
      (None, 2L, 0),       // genuine NULL key — data, not subtotal
      (None, 7L, 1)),      // grand total — subtotal, not data
      s"CUBE/GROUPING semantics broken: $df")
  }

  test("KeyShip: empty and all-NULL key sets degrade to the correct constants") {
    import spark.implicits._
    import graft.operators.KeyShip
    val fact = Seq(Some(1L), Some(2L), None).toDF("k")
    val empty = Seq.empty[Long].toDF("sk")
    // semi against nothing = nothing; anti against nothing = everything
    assert(KeyShip.semiShip(fact, "k", empty, "sk").count() == 0)
    assert(KeyShip.antiShip(fact, "k", empty, "sk").count() == 3,
      "NOT IN (empty) keeps every row, NULL keys included")
    // a key set of only NULLs is empty under join equality: a NULL
    // key matches nothing — the semi finds nothing, the anti keeps
    // everything (a NULL-poisoned isin literal would drop every row)
    val nulls = Seq(Option.empty[Long], Option.empty[Long]).toDF("sk")
    assert(KeyShip.semiShip(fact, "k", nulls, "sk").count() == 0,
      "NULL keys match nothing in a semi-join")
    assert(KeyShip.antiShip(fact, "k", nulls, "sk").count() == 3,
      "anti-join against only-NULL keys keeps every row")
  }

  test("KeyShip: fact keys that cast to NULL as LONG survive both bloom carriers") {
    import spark.implicits._
    import graft.operators.KeyShip
    // non-numeric strings cast to NULL as LONG: the bloom probe
    // (hashing the cast) cannot judge them, so they must route to the
    // exact join, not vanish — the result must equal the plain
    // raw-equality semi/anti either way
    val fact = (Seq("abc", "zzz", "7") ++ (100 to 110).map(_.toString))
      .toDF("k")
    // 502 distinct keys >> maxLiterals=10 forces the bloom carrier
    val keys = ((0 to 500).map(_.toString) :+ "abc").toDF("sk")
    def names(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getString(0)).toSet
    val semi = KeyShip.semiShip(fact, "k", keys, "sk", maxLiterals = 10, bloomMinKeys = 0)
    val exactSemi = fact.join(keys,
      org.apache.spark.sql.functions.col("k") ===
        org.apache.spark.sql.functions.col("sk"), "left_semi")
    assert(names(semi) == names(exactSemi) && names(semi).contains("abc"),
      s"cast-NULL fact key lost on the bloom semi path: ${names(semi)}")
    val anti = KeyShip.antiShip(fact, "k", keys, "sk", maxLiterals = 10, bloomMinKeys = 0)
    assert(names(anti) == Set("zzz"),
      s"bloom anti path diverged on cast-NULL keys: ${names(anti)}")
  }

  test("epoch channels on a virgin table: empty sets, identity mapping, clean first declare") {
    import spark.implicits._
    import graft.core.TxnTable
    val dir = graft.core.TempDirs.scratchShared("edgeepoch")
    TxnTable.init(spark, dir, Seq((1L, 2L)).toDF("k", "v"),
      numFiles = 1, statsCols = Seq("k"))
    // no epochs declared: empty constraint set, identity column map,
    // version kind 'data', mutations unaffected
    assert(TxnTable.constraints(dir).isEmpty)
    assert(TxnTable.colMapAt(dir, TxnTable.version(dir)).isEmpty)
    assert(TxnTable.versionKind(dir, 1) == "data")
    TxnTable.upsert(spark, dir, "k", Seq((2L, 4L)).toDF("k", "v"))
    assert(TxnTable.read(spark, dir).count() == 2)
    // dropping a nonexistent constraint is a TRUE no-op: no version
    // burned, no epoch file written
    val vBefore = TxnTable.version(dir)
    TxnTable.dropConstraint(dir, "ghost")
    assert(TxnTable.constraints(dir).isEmpty &&
      TxnTable.version(dir) == vBefore)
    // the first real declare lands as the next epoch
    TxnTable.addConstraint(spark, dir, "v_pos", "v > 0")
    assert(TxnTable.constraints(dir).map(_._1) == Seq("v_pos"))
  }

  test("ivfServe: unknown query ids yield empty results, not errors; nprobe clamps at k") {
    import spark.implicits._
    val lay = graft.core.TempDirs.scratchShared("edgeivf")
    (0L until 30L).map { i =>
      val e = Seq(math.cos(i * 0.2).toFloat, math.sin(i * 0.2).toFloat)
      (i % 4 + 1, i, e, math.sqrt(e.map(x => x.toDouble * x).sum))
    }.toDF("cid", "vec_id", "embedding", "nrm")
      .write.partitionBy("cid").mode("overwrite").parquet(s"$lay/seg=base")
    // a vec_id absent from the corpus: the probe side is empty — the
    // serve returns zero rows rather than failing
    assert(Similarity.ivfServe(spark, lay, Seq(9999L), nprobe = 2,
      topK = 3).count() == 0)
    // nprobe far beyond the list count clamps to k = full scan
    val full = Similarity.ivfServe(spark, lay, Seq(5L), nprobe = 1000,
      topK = 3).collect()
    assert(full.length == 3 && full.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L))
    // topK beyond the corpus returns every neighbor once, ranked
    val all = Similarity.ivfServe(spark, lay, Seq(5L), nprobe = 4,
      topK = 100).collect()
    assert(all.length == 29 &&
      all.map(_.getLong(1)).distinct.length == 29,
      s"expected all 29 non-self neighbors, got ${all.length}")
  }
}
