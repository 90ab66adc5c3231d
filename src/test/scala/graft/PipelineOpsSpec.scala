package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling}

/** Behavior + scale-shape checks for the round-5 pipeline operators:
  * passage-level dedup signal (dd06), concat-and-chunk sequence
  * packing (sp03), and mixture reweighting (sp04).
  */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("dd06: a copied passage is flagged in BOTH docs, unique text is clean") {
    import spark.implicits._
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ") // one 8-token passage
    val docs = Seq(
      (1L, boiler + " " + (1 to 8).map(i => s"x$i").mkString(" ")),
      (2L, boiler + " " + (1 to 8).map(i => s"y$i").mkString(" ")),
      (3L, (1 to 16).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.ddPassageDedupFrom(docs, chunk = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // docs 1/2: passages = [boiler, x*/y*] → 1 of 2 duplicated
    assert(out(1L) == (2L, 1L, 0.5))
    assert(out(2L) == (2L, 1L, 0.5))
    assert(out(3L) == (2L, 0L, 0.0))
  }

  test("tx15: garbled text scores the floor; common phrasing scores higher") {
    import spark.implicits._
    // ten docs share the same phrase (its bigrams reach corpus count 10
    // → log2-bucket 4); one garbled doc is all unique bigrams (count 1
    // → bucket 1, the floor)
    val phrase = "the quick brown fox jumps over the lazy dog"
    val docs = ((1L to 10L).map(i => (i, phrase)) :+
      (99L, (1 to 10).map(i => s"zq$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.operators.TextOps.txBigramFluencyFrom(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(99L) == 1.0, s"garbled doc must sit at the floor: ${out(99L)}")
    assert(out(1L) > 3.0 && out(1L) == out(10L),
      s"shared phrasing must score high and identically: ${out(1L)}")
  }

  test("dd06: intra-doc repetition counts as duplication (boilerplate within one doc)") {
    import spark.implicits._
    val p = (1 to 4).map(i => s"r$i").mkString(" ")
    val docs = Seq((7L, s"$p $p")).toDF("doc_id", "text") // same 4-token passage twice
    val Array(row) = Dedup.ddPassageDedupFrom(docs, chunk = 4).collect()
    assert((row.getLong(1), row.getLong(2), row.getDouble(3)) == (2L, 2L, 1.0))
  }

  test("sp03: two-phase prefix sum equals the single-window spec for any bucket width") {
    import spark.implicits._
    val docs = (0L until 97L).map(i => (i, (0 to (i % 7).toInt).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("n_tok", size(split(trim(col("text")), "\\s+")).cast("bigint"))
    // ground truth: sequential running sum on the driver
    val toks = docs.select("doc_id", "n_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var off = 0L
    val expect = toks.map { case (id, n) =>
      val row = (id, n, off, off / 16, (off + n - 1) / 16); off += n; row
    }.toSeq
    for (bw <- Seq(1, 7, 1000)) {
      val got = Sampling.spSequencePackFrom(docs, seqLen = 16, bucketWidth = bw)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      assert(got == expect, s"bucketWidth=$bw diverged from the running-sum spec")
    }
  }

  test("sp03: adaptive bucket width bounds the driver-side bucket collect") {
    import spark.implicits._
    // policy alone: at 10¹⁰ dense doc_ids a fixed width of 100 means
    // 10⁸ driver rows; the adaptive width keeps ⌈(maxId+1)/w⌉ ≤ 10⁵
    for (maxId <- Seq(0L, 99L, 10000000L - 1, 10000000000L)) {
      val w = Sampling.adaptiveBucketWidth(maxId)
      val buckets = (maxId + w) / w // ⌈(maxId+1)/w⌉
      assert(buckets <= Sampling.MaxPrefixBuckets,
        s"maxId=$maxId width=$w leaves $buckets buckets")
    }
    // end-to-end: a synthetic corpus with doc_ids spanning 10⁷ — the
    // adaptive width must bound the bucket count AND give the same
    // output as any fixed width (invariance is proven above; this
    // pins the adaptive entry path itself)
    val docs = (0L until 400L).map(i => (i * 25000L, "a b c"))
      .toDF("doc_id", "text")
      .withColumn("n_tok", size(split(trim(col("text")), "\\s+")).cast("bigint"))
    val w = Sampling.adaptiveWidthFor(docs)
    assert(w == 100L, s"10⁷ id span should yield width 100, got $w")
    val adaptive = Sampling.spSequencePackFrom(docs, seqLen = 16, bucketWidth = w)
      .collect().map(_.toSeq).toSeq
    val fixed = Sampling.spSequencePackFrom(docs, seqLen = 16, bucketWidth = 100)
      .collect().map(_.toSeq).toSeq
    assert(adaptive == fixed)
  }

  test("sp06: spans tile every sequence exactly and conserve every document") {
    val spans = Sampling.spPackSpansFrom(
      graft.core.Tables.documents(spark, sf).withColumn("n_tok",
        size(split(trim(col("text")), "\\s+")).cast("bigint")),
      seqLen = 64, bucketWidth = 50).collect()
    // per sequence: spans sum to exactly 64 tokens (except the last)
    val bySeq = spans.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(3)).sum).toMap
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, tot) =>
      if (seq != lastSeq) assert(tot == 64L, s"seq $seq holds $tot tokens")
      else assert(tot >= 1L && tot <= 64L)
    }
    // per doc: spans conserve the doc's token count, starts are contiguous
    val byDoc = spans.groupBy(_.getLong(1))
    val toks = Sampling.spSequencePackFrom(
      graft.core.Tables.documents(spark, sf).withColumn("n_tok",
        size(split(trim(col("text")), "\\s+")).cast("bigint")),
      seqLen = 64, bucketWidth = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (doc, rows) =>
      assert(rows.map(_.getLong(3)).sum == toks(doc), s"doc $doc lost tokens")
      val sorted = rows.sortBy(_.getLong(0))
      val starts = sorted.map(_.getLong(2))
      val lens = sorted.map(_.getLong(3))
      starts.zip(lens).zip(starts.tail).foreach { case ((st, ln), nxt) =>
        assert(st + ln == nxt, s"doc $doc spans not contiguous")
      }
      assert(starts.head == 0L)
    }
  }

  test("sp03: no global single-partition window in the plan (the 100 TB guard)") {
    val df = Sampling.queries("sp03_sequence_pack")(spark, sf)
    // every Window node must partition by something: an empty
    // partition spec would funnel the whole corpus into one task
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      "sequence packing fell back to a global running-sum window"))
  }

  test("tx11: top-pair slice is TakeOrdered over a partial aggregate — no pair-vocab sort") {
    import graft.operators.TextOps
    val df = TextOps.queries("tx11_bpe_merge_rank")(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      s"top-8 must not globally sort the pair vocabulary:\n$phys")
    // the ranking window may only see the 8 surviving rows: it must
    // sit ABOVE the TakeOrderedAndProject in the plan, never below
    val lines = phys.linesIterator.toSeq
    val winAt = lines.indexWhere(_.contains("Window"))
    val topAt = lines.indexWhere(_.contains("TakeOrderedAndProject"))
    assert(winAt >= 0 && topAt > winAt, "rank window must run on the top-8 rows only")
    // deterministic: rank 1 is the corpus's most frequent adjacent pair
    val rows = df.collect()
    assert(rows.length == 8 && rows.map(_.getLong(0)).toSeq == (1L to 8L))
    assert(rows.map(_.getLong(3)).toSeq.sliding(2).forall(p => p.head >= p.last))
  }

  test("dd06/ev05: hash joins only, every count aggregate keeps its partial phase") {
    import graft.operators.{Dedup, Events}
    for ((name, df) <- Seq(
        "dd06" -> Dedup.queries("dd06_passage_dedup")(spark, sf),
        "ev05" -> Events.queries("ev05_rolling_dau")(spark, sf))) {
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
        s"$name degenerated to a nested loop:\n$phys")
      // every final count/count-distinct aggregate must be preceded by
      // a map-side partial phase (merge_/final modes imply partials fed
      // them; a bare complete-mode count means the shuffle carries raw
      // rows)
      val finals = phys.linesIterator.count(l =>
        l.contains("HashAggregate") && (l.contains("functions=[count(") ||
          l.contains("functions=[finalmerge_count")))
      val partials = phys.linesIterator.count(l =>
        l.contains("HashAggregate") && (l.contains("partial_count") ||
          l.contains("merge_count")))
      assert(partials >= finals && partials > 0,
        s"$name lost map-side partial aggregation ($partials partial vs $finals final):\n$phys")
    }
  }

  test("dd07: the cluster keeps its highest-quality member, not its lowest id") {
    import spark.implicits._
    val dir = new java.io.File(graft.core.TempDirs.scratch("dd07"))
    // docs 10/11 share 4 of 8 distinct 5-gram shingles (Jaccard 0.5 →
    // one cluster); 10 is the min id but repeats tokens (uniq 8/11),
    // 11 is clean (uniq 1.0) and must be kept. 20 is a singleton.
    Seq(
      (10L, "w1 w2 w3 w4 w5 w6 w7 w8 w1 w1 w1", "en", "srcA", 0L),
      (11L, "w1 w2 w3 w4 w5 w6 w7 w8 x9", "en", "srcB", 0L),
      (20L, "u1 u2 u3 u4 u5 u6 u7 u8 u9", "en", "srcA", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val rows = Dedup.queries("dd07_canonical_pick")(spark, dir.getAbsolutePath)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    Dedup.releaseCaches()
    assert(rows.keySet == Set(10L, 11L), "only cluster members are scored")
    assert(rows(10L) == (10L, 11L, false), "the min-id copy loses on quality")
    assert(rows(11L) == (10L, 11L, true), "the clean copy is kept")
  }

  test("sp09: shards are contiguous, conserve every byte, and stay near target") {
    import spark.implicits._
    // 40 docs of 100 bytes, target 1000 → exactly 10 docs per shard
    val even = (1L to 40L).map(i => (i, "x" * 100)).toDF("doc_id", "text")
      .withColumn("n_bytes", octet_length(col("text")).cast("bigint"))
    val m1 = Sampling.spShardExportFrom(even, targetBytes = 1000L, bucketWidth = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(m1.length == 4 && m1.forall(s => s._2 == 10 && s._3 == 1000),
      s"even corpus must cut into exact shards: ${m1.toSeq}")
    // ragged sizes: conservation + contiguity + greedy bound (every
    // shard but the last ends because the NEXT doc started past the
    // boundary, so bytes-before-last-doc < target)
    val ragged = (1L to 30L).map(i => (i, "y" * (37 * i % 301 + 13).toInt))
      .toDF("doc_id", "text")
      .withColumn("n_bytes", octet_length(col("text")).cast("bigint"))
    val m2 = Sampling.spShardExportFrom(ragged, targetBytes = 512L, bucketWidth = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(m2.map(_._2).sum == 30, "every doc lands in exactly one shard")
    assert(m2.map(_._3).sum == ragged.agg(sum("n_bytes")).head.getLong(0),
      "bytes conserved")
    val sorted = m2.sortBy(_._1)
    assert(sorted.sliding(2).forall {
      case Array(a, b) => a._5 + 1 == b._4; case _ => true },
      s"shards must be contiguous in doc order: ${sorted.toSeq}")
  }

  test("sp05: deterministic shuffle is a valid sharded permutation, never ingestion order") {
    val a = Sampling.queries("sp05_corpus_shuffle")(spark, sf).collect()
    val b = Sampling.queries("sp05_corpus_shuffle")(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "the shuffle must be reproducible run-to-run")
    // every doc appears exactly once; per-shard ranks are 1..|shard|
    val n = a.length
    assert(a.map(_.getLong(0)).distinct.length == n)
    a.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard ranks not contiguous")
    }
    // the permutation must break ingestion order: within some shard,
    // consecutive ranks are non-consecutive doc_ids
    val broken = a.groupBy(_.getLong(1)).values.exists { rows =>
      val ids = rows.sortBy(_.getLong(2)).map(_.getLong(0))
      ids.zip(ids.tail).exists { case (x, y) => y != x + 1 }
    }
    assert(broken, "shuffle preserved ingestion order")
    // scale guard: the rank window partitions by shard, never globally
    val windows = Sampling.queries("sp05_corpus_shuffle")(spark, sf)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty))
  }

  test("sp04: rates cap at 1, over-represented sources shrink, totals conserved") {
    val rows = Sampling.queries("sp04_mixture_weights")(spark, sf).collect()
    val k = rows.length
    val total = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val (nTok, share, rate, exp) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(rate > 0 && rate <= 1.0)
      assert(math.abs(share - nTok.toDouble / total) < 1e-12)
      // over target share → downsampled to exactly the target budget
      if (nTok.toDouble > total.toDouble / k) {
        assert(rate < 1.0 && math.abs(exp - total.toDouble / k) < 1e-9)
      } else assert(rate == 1.0 && exp == nTok.toDouble)
    }
  }

  test("tx17: sketched quartile bounds bucket within sketch tolerance of exact") {
    // the 100 TB path (percentile_approx, no per-language sort) vs
    // the oracle path (exact percentile): at accuracy 10^4 the
    // boundary rank error is <= n/10^4, so per-bucket counts may
    // differ by at most that many boundary-adjacent docs — in
    // practice far fewer; 1% of the language's docs is a generous
    // ceiling that still fails on any real estimator bug. Run at
    // sf0.01 so every language has thousands of docs.
    import graft.operators.TextOps
    val d = "/root/testdata/sf0.01"
    def counts(exact: Boolean): Map[(String, String), Long] =
      TextOps.txQualityBucketsWith(spark, d, boundsExact = exact)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ex = counts(exact = true)
    val ap = counts(exact = false)
    assert(ex.keySet == ap.keySet,
      "both paths must produce the same (lang, bucket) cells")
    val perLang = ex.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    ex.foreach { case (cell @ (lang, _), n) =>
      val tol = math.max(2L, perLang(lang) / 100)
      assert(math.abs(ap(cell) - n) <= tol,
        s"$cell: exact=$n approx=${ap(cell)} tol=$tol")
    }
    // and the whole corpus is conserved either way
    assert(ex.values.sum == ap.values.sum)
  }
}
