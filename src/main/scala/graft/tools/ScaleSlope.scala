package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scale-slope probe for the dedup family: run dd02 (n-gram Jaccard),
  * dd04 (SimHash) and dd05 (connected components) on the sf0.1 corpus
  * at 1× and at 10×, and report the wall-time ratio. Their plans are
  * linear-ish (inverted-index / band equi-joins with hot-key caps, min-
  * aggregate star contraction), so the 10× corpus should cost ≈10× —
  * a superlinear jump would expose a hidden hot key.
  *
  * The 10× corpus is 10 disjoint copies of the documents table with
  * per-copy alphabet rotation (`translate`): each copy keeps the
  * original's INTERNAL duplicate structure while copies stay mutually
  * dissimilar, so duplicate DENSITY is constant — 10 identical
  * replicas would instead cross-match quadratically (45 pairs per
  * original dup pair), measuring blowup of the workload, not the
  * engine.
  */
object ScaleSlope {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SS_DIR", "/root/testdata/sf0.1")
    val base = graft.core.Tables.documents(spark, d).select("doc_id", "text")

    def corpus(copies: Int): DataFrame = {
      val lo = "abcdefghijklmnopqrstuvwxyz"
      val up = lo.toUpperCase
      val dig = "0123456789"
      // affine permutation j -> (a*j + b) mod n, a coprime to n: gives
      // 312 distinct letter maps / 40 digit maps, so EVERY pair of
      // copies differs on letters (plain rotation repeats every 26
      // copies, and copies sharing a letter map become near-dups —
      // measured as a 32× pair blowup at 100 copies)
      val coA26 = Array(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
      val coA10 = Array(1, 3, 7, 9)
      def affine(s: String, a: Int, b: Int): String =
        s.indices.map(j => s((a * j + b) % s.length)).mkString
      (0 until copies).map { i =>
        val mapped =
          affine(lo, coA26(i / 26 % 12), i % 26) +
            affine(up, coA26((i / 26 + 5) % 12), (i * 11 + 7) % 26) +
            affine(dig, coA10(i / 10 % 4), i % 10)
        base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          translate(col("text"), lo + up + dig, mapped).as("text"))
      }.reduce(_ unionByName _)
    }

    def timed(f: => Long): (Double, Long) = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    // SS_ONLY=dd08,dd09_hier reruns a subset of probes (comma list of
    // op prefixes) without paying for the whole battery
    val only: String => Boolean = sys.env.get("SS_ONLY") match {
      case Some(list) =>
        val ps = list.split(",").map(_.trim).filter(_.nonEmpty)
        op => ps.exists(op.startsWith)
      case None => _ => true
    }

    def run(docs: DataFrame): Map[String, (Double, Long)] = {
      val out = scala.collection.mutable.Map[String, (Double, Long)]()
      // dd02 end-to-end: shingle + persist (as the memoized production
      // path does) + inverted-index join
      if (only("dd02")) out("dd02") = timed {
        val sh = Dedup.shingle(docs).persist()
        try Dedup.ddNgramJaccardFrom(sh, Dedup.DefaultMaxShingleDf).count()
        finally { sh.unpersist(); () }
      }
      if (only("dd04")) out("dd04") = timed {
        val sig = Dedup.simhashSignaturesFrom(docs).persist()
        try Dedup.ddSimhashFrom(sig).count()
        finally { sig.unpersist(); () }
      }
      // dd05 timed on its own input (pairs precomputed and
      // checkpointed) so the slope isolates the star contraction
      if (only("dd05")) {
        val sh = Dedup.shingle(docs).persist()
        val pairs = Dedup.ddNgramJaccardFrom(sh, Dedup.DefaultMaxShingleDf)
          .select("x", "y").localCheckpoint()
        sh.unpersist()
        out("dd05") = timed(Dedup.connectedComponents(pairs).count())
      }
      // dd11 end-to-end: sliding-window explode + df + join-back,
      // gram frame persisted exactly as the memoized production path
      // runs it (the un-memoized From variant computes the dominant
      // explode twice — the same probe flaw the round-6 dd08 slope had)
      if (only("dd11")) out("dd11") = timed {
        val g = Dedup.spanGramsOf(docs, 20).persist()
        try Dedup.ddSpanCoverageGrams(g).count()
        finally { g.unpersist(); () }
      }
      out.toMap
    }

    // dd08 SemDeDup probe: embeddings replicated with per-copy
    // deterministic SIGN FLIPS — an orthogonal transform, so each
    // copy's internal cosine structure (and near-dup density) is
    // preserved EXACTLY while cross-copy cosines collapse toward 0
    // (pseudorandom ±1 sign products). k scales with the corpus
    // (SemDeDup's own regime: constant cluster size), so the
    // within-cluster quadratic stage should stay ~linear overall.
    val ebase = graft.core.Tables.embeddings(spark, d)
      .select("vec_id", "embedding")
    // idOffset: per-copy vec_id spacing — the default keeps copies in
    // disjoint id ranges; the assign probe passes the base corpus size
    // instead so re-ids are CONTIGUOUS (seedCents picks vec_id < k)
    def ecorpus(copies: Int, idOffset: Long = 10000000L): DataFrame =
      (0 until copies).map { i =>
        ebase.select((col("vec_id") + lit(i * idOffset)).as("vec_id"),
          expr(s"transform(embedding, (x, j) -> x * cast(1 - 2 * pmod(hash($i, j), 2) as float))")
            .as("embedding"))
      }.reduce(_ unionByName _)
        .withColumn("nrm", sqrt(graft.functions.GraftFunctions
          .fixdotD(col("embedding"), col("embedding"))))
    // PRODUCTION path: the assignment frame is memoized (Caches.memo,
    // exactly as the dd08_semdedup query does) so it is computed ONCE
    // per run instead of once per reference (pair-join side a, side b,
    // final scoring join = 3 recomputes un-memoized — the round-6
    // probe's admitted flaw). The tag is unique per (regime, scale)
    // point, so each timed run still pays its own full compute.
    def runDd08(tag: String, copies: Int, k: Int,
        hier: Boolean = false): (Double, Long) = timed {
      // seeds are vec_id < k: copy 0 holds ids 0..1999, so k ≤ 2000
      // seed ids always resolve; assignment stays the fused kernel
      val tagged = Some(s"semdedup-probe|$tag|c$copies|k$k")
      val df =
        if (hier) graft.operators.Similarity
          .semDedupHierFrom(spark, ecorpus(copies), k = k, tau = 0.3,
            memoTag = tagged)
        else graft.operators.Similarity
          .semDedupFrom(spark, ecorpus(copies), k = k, tau = 0.3,
            memoTag = tagged)
      df.count()
    }

    // 1× is fixed-cost-dominated at sf0.1; the informative slope is
    // 10× → 100× (500k docs), where data cost dominates
    val points =
      if (Seq("dd02", "dd04", "dd05", "dd11").exists(only))
        Seq(1, 10, 100).map(c => c -> run(corpus(c)))
      else Nil
    // three regimes, all memoized: the paper's own (constant cluster
    // size, k ∝ n — the within-cluster quadratic stays bounded but the
    // exact k×n assignment grows quadratically), IVF sizing (k ∝ √n —
    // clusters grow as √n so the WITHIN-CLUSTER stage goes quadratic
    // instead), and dd09's fix: k ∝ n with the two-level O(n·√k·dim)
    // hierarchical assignment — both scale walls removed
    val sqrtK = (c: Int) => math.max(8, math.round(8 * math.sqrt(c.toDouble)).toInt)
    for ((regime, kOf, hier) <- Seq(
        ("dd08", (c: Int) => 8 * c, false),
        ("dd08_sqrtk", sqrtK, false),
        ("dd09_hier", (c: Int) => 8 * c, true)) if only(regime)) {
      val pts = Seq(1, 10, 100).map(c => c -> runDd08(regime, c, kOf(c), hier))
      val cells = pts.map { case (c, (t, n)) =>
        f""""sec_${c}x":$t%.2f,"rows_${c}x":$n"""
      }.mkString(",")
      val slope = pts.last._2._1 / pts(1)._2._1
      println(f"""{"op":"$regime",$cells,"slope_10x_to_100x":$slope%.2f}""")
    }
    // ANN probes on the same sign-flip-replicated embedding corpus,
    // 100 queries per scale (at the oracle's 10 queries the ONE-TIME
    // index cost dominates — PQ encoding is ~205M mults at 100× vs the
    // brute scan's 128M, measured — so the amortized regime needs a
    // realistic query batch): brute-force exact top-k (query cost ∝ n
    // each — the linear baseline) vs IVF-PQ with constant lists (g=8:
    // candidates/query ∝ n/8 at nprobe=2) vs IVF sizing (g ∝ √n:
    // candidates/query ∝ √n, assignment n·√n — the standard
    // large-scale trade). In production the encode side runs once at
    // ingest; this probe still pays it in every run, so these numbers
    // UNDERSTATE the routed side's advantage.
    val simNq = 100
    // same √n sizing policy as the dd08_sqrtk regime (sqrtK above)
    val sqrtG = sqrtK
    // two timings per routed regime: end-to-end (encode + search every
    // run — what this bounded probe can't amortize) and SEARCH-ONLY
    // (coded corpus memoized before timing — production's steady
    // state, where codes are materialized once at ingest)
    def searchOnly(regime: String, c: Int, g: Int): (Double, Long) = {
      val tag = s"ivfpq-probe|$regime|c$c|g$g"
      val df = graft.operators.Similarity.simIvfPqFrom(spark,
        ecorpus(c).select("vec_id", "embedding"), g = g, nq = simNq,
        memoTag = Some(tag))
      df.count() // builds + caches the coded corpus (untimed)
      val t0 = System.nanoTime()
      val rows = df.count() // re-runs query side + join + rank only
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    for ((regime, run) <- Seq[(String, Int => (Double, Long))](
        ("sim01_brute", c => timed(graft.operators.Similarity
          .simCosineTopKFrom(ecorpus(c), nq = simNq).count())),
        // MRL funnel: prefix-dim coarse scan + shortlist rerank —
        // query cost ∝ n like brute force but at pdim/dim (¼) of the
        // per-row dot arithmetic; the shortlist rerank is O(nq·20)
        ("sim10_mrl", c => timed(graft.operators.Similarity
          .simMrlRerankFrom(ecorpus(c).select("vec_id", "embedding"),
            nq = simNq).count())),
        ("sim09_ivfpq_g8", c => timed(graft.operators.Similarity
          .simIvfPqFrom(spark, ecorpus(c).select("vec_id", "embedding"),
            g = 8, nq = simNq).count())),
        ("sim09_ivfpq_sqrtg", c => timed(graft.operators.Similarity
          .simIvfPqFrom(spark, ecorpus(c).select("vec_id", "embedding"),
            g = sqrtG(c), nq = simNq).count())),
        ("sim09_search_g8", c => searchOnly("g8", c, 8)),
        ("sim09_search_sqrtg", c => searchOnly("sqrtg", c, sqrtG(c)))
        ) if only(regime)) {
      val pts = Seq(1, 10, 100).map(c => c -> run(c))
      val cells = pts.map { case (c, (t, n)) =>
        f""""sec_${c}x":$t%.2f,"rows_${c}x":$n"""
      }.mkString(",")
      val slope = pts.last._2._1 / pts(1)._2._1
      println(f"""{"op":"$regime",$cells,"slope_10x_to_100x":$slope%.2f}""")
    }
    // Column-layout MRL probe: the sim10 deployment stores the 16-dim
    // prefix as its OWN column, so stage 1 never deserializes the wide
    // vector. Model that with two localCheckpointed frames (full +
    // prefix) and compare a brute full-dim scan against the funnel on
    // the same materialized inputs — generator cost excluded from both.
    if (only("sim10_cols")) {
      for (c <- Seq(10, 100)) {
        val full = ecorpus(c).select("vec_id", "embedding").localCheckpoint()
        val pref = full.select(col("vec_id"),
          slice(col("embedding"), 1, 16).as("pe")).localCheckpoint()
        val n = full.count()
        val (tb, _) = timed(graft.operators.Similarity
          .simCosineTopKFrom(full.withColumn("nrm",
            sqrt(graft.functions.GraftFunctions
              .fixdotD(col("embedding"), col("embedding")))),
            nq = simNq).count())
        val (tm, _) = timed(graft.operators.Similarity
          .simMrlRerankFrom(full, nq = simNq, preSliced = Some(pref))
          .count())
        println(f"""{"op":"sim10_cols_${c}x","rows":$n,"sec_brute":$tb%.2f,"sec_mrl":$tm%.2f,"brute_over_mrl":${tb / tm}%.2f}""")
      }
    }
    // High-dim MRL probe: production embedding dims are 768-4096, not
    // this corpus's 64 — and the funnel's economics depend on the dot
    // arithmetic dominating the per-pair machinery. Tile each vector
    // 12× to 768 dims with per-position sign decorrelation (orthogonal
    // per tile, so vectors stay non-degenerate), then compare the same
    // brute scan vs funnel on checkpointed column-layout frames.
    if (only("sim10_hidim")) {
      for (c <- Seq(10, 100)) {
        val full = ecorpus(c).select(col("vec_id"),
            expr("""transform(flatten(array_repeat(embedding, 12)),
                   |(x, j) -> x * cast(1 - 2 * pmod(hash('t', j), 2) as float))"""
              .stripMargin).as("embedding"))
          .localCheckpoint()
        val pref = full.select(col("vec_id"),
          slice(col("embedding"), 1, 16).as("pe")).localCheckpoint()
        val n = full.count()
        val (tb, _) = timed(graft.operators.Similarity
          .simCosineTopKFrom(full.withColumn("nrm",
            sqrt(graft.functions.GraftFunctions
              .fixdotD(col("embedding"), col("embedding")))),
            nq = simNq).count())
        val (tm, _) = timed(graft.operators.Similarity
          .simMrlRerankFrom(full, nq = simNq, preSliced = Some(pref))
          .count())
        println(f"""{"op":"sim10_hidim_${c}x","rows":$n,"dim":768,"sec_brute":$tb%.2f,"sec_mrl":$tm%.2f,"brute_over_mrl":${tb / tm}%.2f}""")
      }
    }
    // PRODUCTION-k assignment probe (assignment stage ONLY, on a
    // localCheckpointed corpus so plan/scan cost is excluded): exact
    // flat argmin O(n·k·dim) vs the two-level fused kernel
    // O(n·√k·dim) at k up to 10⁴ on the 100× corpus — the measured
    // number behind "the √k assignment win grows with k". Copies are
    // re-id'd CONTIGUOUSLY (offset = base corpus size, not 10⁷):
    // seedCents picks vec_id < k, so k = 10⁴ centers need ids 0..9999
    // present; the per-copy sign flips keep all seeds pairwise
    // distinct (dd09's oracle-parity precondition).
    if (only("assign")) {
      val contig = ecorpus(100, idOffset = ebase.count()).localCheckpoint()
      val nContig = contig.count()
      for (k <- Seq(800, 10000)) {
        // count() would PRUNE the assignment projection entirely —
        // aggregate over cid so the kernel runs for every row
        val (tf, _) = timed { graft.operators.Similarity
          .dbgAssignFlat(contig, k).agg(max("cid")).first(); nContig }
        val (th, _) = timed { graft.operators.Similarity
          .dbgAssignHier(contig, k).agg(max("cid")).first(); nContig }
        println(f"""{"op":"assign_k$k","rows":$nContig,"sec_flat":$tf%.2f,"sec_hier":$th%.2f,"flat_over_hier":${tf / th}%.2f}""")
      }
    }
    // Rank-stage A/B — the round-9 sweep moved every per-key top-k
    // (ANN ranking, per-source budgets, dedup best-match) from a
    // row_number window to the map-side-combining aggregate
    // (Udafs.topKByScore). Isolate the ranking machinery itself:
    // a synthetic scored candidate frame (qid, id, score) with NO dot
    // products, localCheckpointed so generation is excluded, top-5 of
    // nq=100 groups both ways. The structural claim under test: the
    // window ships and sorts every candidate row through the exchange
    // (cost ∝ corpus), the aggregate reduces each map partition to
    // ≤ k rows per key first (exchange cost ∝ nq·k·partitions,
    // corpus-independent) — so the gap must WIDEN with scale.
    if (only("rank_ab")) {
      import org.apache.spark.sql.expressions.Window
      // warmup: both formulations once on a tiny frame, so the 1×
      // point measures the operator, not janino compilation
      locally {
        val tiny = spark.range(1000).select((col("id") % 7).as("qid"),
          col("id"), rand(1).as("score")).localCheckpoint()
        val w0 = Window.partitionBy("qid").orderBy(desc("score"), col("id"))
        tiny.withColumn("rank", row_number().over(w0))
          .filter(col("rank") <= 5).count()
        tiny.groupBy("qid").agg(graft.operators.Similarity.topKAgg(5)(
            col("score"), col("id")).as("top"))
          .select(col("qid"), explode(col("top"))).count()
      }
      for (c <- Seq(1, 10, 100)) {
        val n = 500000L * c
        val cand = spark.range(n).select(
            (col("id") % 100).as("qid"), col("id"),
            (pmod(hash(col("id")), lit(1 << 20)).cast("double") /
              (1 << 20)).as("score"))
          .localCheckpoint()
        cand.count()
        val (tw, _) = timed {
          val w = Window.partitionBy("qid")
            .orderBy(desc("score"), col("id"))
          cand.withColumn("rank", row_number().over(w))
            .filter(col("rank") <= 5).count()
        }
        val (ta, _) = timed {
          cand.groupBy("qid")
            .agg(graft.operators.Similarity.topKAgg(5)(
              col("score"), col("id")).as("top"))
            .select(col("qid"), explode(col("top"))).count()
        }
        println(f"""{"op":"rank_ab_${c}x","rows":$n,"sec_window":$tw%.2f,"sec_topk_agg":$ta%.2f,"window_over_agg":${tw / ta}%.2f}""")
      }
    }
    // Z-order layout probe: sf0.1 lineitem (600k rows) written as 256
    // files linear-sorted on l_partkey vs Z-ordered on
    // (l_partkey, l_suppkey); measure (a) footer-stat file pruning
    // for a selective box on the OFF-sort-axis column, (b) wall time
    // of the corresponding scan+filter+agg on each layout. At 100 TB
    // the file count is what the driver lists and the row-group stats
    // are what the readers skip by — the footer counts are the
    // scale-invariant number, the wall times the local confirmation.
    if (only("zorder")) {
      val li = graft.core.Tables.lineitem(spark, d)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      val root = java.nio.file.Files
        .createTempDirectory("ss-zorder").toString
      li.repartitionByRange(256, col("l_partkey"))
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite").parquet(s"$root/linear")
      graft.core.Layout.writeZOrdered(li, s"$root/zorder",
        Seq("l_partkey", "l_suppkey"), numFiles = 256)
      // suppkey domain at sf0.1 is 0..999; box = 2% of it
      val (sLo, sHi) = (100L, 119L)
      val linN = graft.core.Layout.filesIntersecting(spark,
        s"$root/linear", "l_suppkey", sLo, sHi)
      val zN = graft.core.Layout.filesIntersecting(spark,
        s"$root/zorder", "l_suppkey", sLo, sHi)
      def scanAgg(dir: String): (Double, Long) = timed {
        spark.read.parquet(dir)
          .filter(col("l_suppkey").between(sLo, sHi))
          .agg(sum(col("l_quantity")).as("q")).collect()
        spark.read.parquet(dir)
          .filter(col("l_suppkey").between(sLo, sHi)).count()
      }
      val (tLin, nRows) = scanAgg(s"$root/linear")
      val (tZ, _) = scanAgg(s"$root/zorder")
      println(f"""{"op":"zorder_offaxis","rows_matched":$nRows,"files_linear":$linN,"files_zorder":$zN,"sec_scan_linear":$tLin%.2f,"sec_scan_zorder":$tZ%.2f}""")
    }
    // Copy-on-write delete at scale: the claim under test is that a
    // key delete costs O(files-containing-the-keys), NOT O(table).
    // Build range-clustered TxnTables at 1x/4x/16x the file count
    // (same per-file row count — the 100 TB axis is file count), then
    // delete the same 10-key contiguous range from each and measure
    // files rewritten + wall time. Both must stay ~FLAT as the table
    // grows 16x.
    // SS_ONLY=fuzzy — dd13 symmetric-delete fuzzy join at 1x/10x/50x
    // names: candidate keys are O(n·L) and true d<=1 pairs grow
    // linearly in this id-structured corpus, so wall time should stay
    // ~linear — a superlinear jump would expose a hot delete-variant
    // block
    if (only("fuzzy")) {
      for (bound <- Seq(300L, 3000L, 15000L)) {
        val names = graft.core.Tables.customer(spark, d)
          .filter(col("c_custkey") <= bound)
          .select(col("c_custkey").as("id"), lower(col("c_name")).as("name"))
        val variants = expr(
          """transform(sequence(1, length(name)),
            |  i -> concat(substring(name, 1, i - 1),
            |              substring(name, i + 1, length(name))))""".stripMargin)
        val keys = names.select(col("id"), col("name"),
          explode(concat(array(col("name")), variants)).as("key"))
        val (sec, pairs) = timed {
          keys.as("a").join(keys.as("b"),
              col("a.key") === col("b.key") && col("a.id") < col("b.id"))
            .select(col("a.id").as("x"), col("a.name").as("nx"),
              col("b.id").as("y"), col("b.name").as("ny"))
            .distinct()
            .filter(levenshtein(col("nx"), col("ny")) <= 1)
            .count()
        }
        println(f"""{"op":"fuzzy_join_${bound}","names":$bound,"pairs":$pairs,"sec":$sec%.2f}""")
      }
    }

    // SS_ONLY=bucket — co-located (bucketed) join: pay the bucketing
    // shuffle ONCE at write time, then every fact-fact join on the
    // bucket key plans shuffle-free SMJ. Measures the per-query win
    // (join with vs without the two exchanges) AND the honest one-time
    // write cost; BucketingSpec pins the no-Exchange plan shape.
    if (only("bucket")) {
      val n = 20000000L
      val warehouse = graft.core.TempDirs.scratchShared("ss-bucket")
      val a = spark.range(n).select(
        pmod(col("id") * 2654435761L, lit(n / 2)).as("k"),
        col("id").as("va"))
      val b = spark.range(n).select(
        pmod(col("id") * 1099511627L, lit(n / 2)).as("k"),
        col("id").as("vb"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (secPlain, _) = timed {
        a.join(b, "k").agg(sum(col("va") + col("vb"))).first(); n
      }
      println(f"""{"op":"bucket_join_plain","rows":$n,"sec":$secPlain%.2f}""")
      val (secWrite, _) = timed {
        spark.sql("DROP TABLE IF EXISTS ss_bucket_a")
        spark.sql("DROP TABLE IF EXISTS ss_bucket_b")
        // repartition on the SAME hash the bucketing uses → each task
        // holds exactly one bucket → one file per bucket → the sortBy
        // guarantee holds at read time and the SMJ skips its sorts
        a.repartition(32, col("k")).write.bucketBy(32, "k").sortBy("k")
          .option("path", s"$warehouse/a").saveAsTable("ss_bucket_a")
        b.repartition(32, col("k")).write.bucketBy(32, "k").sortBy("k")
          .option("path", s"$warehouse/b").saveAsTable("ss_bucket_b")
        n
      }
      println(f"""{"op":"bucket_write_once","rows":$n,"sec":$secWrite%.2f}""")
      val (secBucketed, _) = timed {
        spark.table("ss_bucket_a").join(spark.table("ss_bucket_b"), "k")
          .agg(sum(col("va") + col("vb"))).first(); n
      }
      val plan = spark.table("ss_bucket_a")
        .join(spark.table("ss_bucket_b"), "k")
        .agg(sum(col("va") + col("vb")))
        .queryExecution.executedPlan.toString
      val shuffleFree = !plan.split('\n')
        .exists(l => l.contains("Exchange hashpartitioning(k"))
      println(f"""{"op":"bucket_join_colocated","rows":$n,"sec":$secBucketed%.2f,"join_shuffle_free":$shuffleFree}""")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }

    // SS_ONLY=skew — skewed shuffle join: one key owns half the big
    // side, so a plain hash join funnels 50% of the rows through ONE
    // reducer (the straggler that sets wall-clock at 1000 executors).
    // Measure three plans on the same data: plain with AQE off (the
    // straggler), Skew.saltedEquiJoin with AQE off (explicit spread),
    // and plain with AQE's runtime skew split. All three must agree on
    // the checksum; the deltas are the mitigation's measured value.
    if (only("skew")) {
      val n = 20000000L
      val dimN = 1000000L
      val big = spark.range(n).select(
        when(col("id") % 2 === 0, lit(1L))
          .otherwise(pmod(col("id") * 2654435761L, lit(dimN))).as("k"),
        col("id").as("v"))
      val dim = spark.range(dimN).select(col("id").as("dk"),
        (col("id") * 7L).as("payload"))
      def run(name: String, aqe: Boolean)(join: => DataFrame): Unit = {
        spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
        // keep the dim side out of broadcast range so the probe
        // actually exercises the shuffle-join skew path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val (sec, rows) = timed {
          join.agg(sum(col("v") + col("payload"))).first(); n
        }
        println(f"""{"op":"skew_join_$name","rows":$rows,"sec":$sec%.2f}""")
      }
      run("plain_noaqe", aqe = false) {
        big.join(dim, big("k") === dim("dk")) }
      run("salted_full_noaqe", aqe = false) {
        graft.operators.Skew.saltedEquiJoin(
          big, "k", Seq("v"), dim, "dk", buckets = 32) }
      run("salted_hotkey_noaqe", aqe = false) {
        graft.operators.Skew.saltedHotKeyJoin(
          big, "k", Seq("v"), dim, "dk", hotKeys = Seq(1L), buckets = 32) }
      run("plain_aqe_skewsplit", aqe = true) {
        big.join(dim, big("k") === dim("dk")) }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }

    if (only("cow")) {
      // two planning modes per scale: "footer" = legacy manifest (the
      // mutation walks O(files) footers to find the rewrite set) vs
      // "manifest" = stats carried in the manifest at commit time
      // (one manifest read). The rewrite itself is identical.
      for (mult <- Seq(1, 4, 16); mode <- Seq("footer", "manifest")) {
        val nFiles = 16 * mult
        val rowsPerFile = 10000L
        val dir = graft.core.TempDirs.scratchShared("ss-cow")
        val n = nFiles * rowsPerFile
        graft.core.TxnTable.init(spark, dir,
          spark.range(n).select(col("id").as("k"),
              (col("id") * 2).as("payload"))
            .repartitionByRange(nFiles, col("k"))
            .sortWithinPartitions("k"),
          numFiles = 0,
          statsCols = if (mode == "manifest") Seq("k") else Nil)
        if (mode == "footer") {
          // strip to the legacy bare-path manifest format
          val legacy = graft.core.TxnTable.liveFiles(dir)
            .map("\"" + _ + "\"").mkString("[\n", ",\n", "\n]")
          java.nio.file.Files.write(
            new java.io.File(dir, "manifest-v1.json").toPath,
            legacy.getBytes("UTF-8"))
        }
        val f0 = graft.core.Layout.footerReads.get()
        val t0 = System.nanoTime()
        val rewrote = graft.core.TxnTable.deleteKeys(spark, dir, "k",
          (5000L until 5010L).toSeq)
        val sec = (System.nanoTime() - t0) / 1e9
        val reads = graft.core.Layout.footerReads.get() - f0
        // CDC read of the same mutation: must be O(commit delta) —
        // flat wall time and a flat input-file count as the TABLE
        // grows 16x under the identical 10-key delete
        val t1 = System.nanoTime()
        val ch = graft.core.TxnTable.changes(spark, dir, fromV = 1)
        val chRows = ch.count()
        val chSec = (System.nanoTime() - t1) / 1e9
        val chFiles = ch.inputFiles.length
        println(f"""{"op":"cow_delete_${mult}x_$mode","rows":$n,"files":$nFiles,"files_rewritten":$rewrote,"footer_reads":$reads,"sec_delete":$sec%.2f,"cdc_rows":$chRows,"cdc_input_files":$chFiles,"sec_cdc":$chSec%.2f}""")
      }
    }
    if (only("upsert")) {
      // round-10 distributed key carrier: a 10^6-key upsert batch
      // confined to a FIXED key range while the table grows 16x.
      // The keys never land on the driver (frame-planned rewrite set
      // + left_anti rewrite), so the cost must track the MATCHED
      // files (constant 4 here), not the table.
      for (mult <- Seq(1, 4, 16)) {
        val nFiles = 16 * mult
        val rowsPerFile = 250000L
        val dir = graft.core.TempDirs.scratchShared("ss-upsert")
        val n = nFiles * rowsPerFile
        graft.core.TxnTable.init(spark, dir,
          spark.range(n).select(col("id").as("k"),
              (col("id") * 2).as("payload"))
            .repartitionByRange(nFiles, col("k"))
            .sortWithinPartitions("k"),
          numFiles = 0, statsCols = Seq("k"))
        val updates = spark.range(1000000L)
          .select(col("id").as("k"), (-col("id")).as("payload"))
        val before = graft.core.TxnTable.liveFiles(dir).toSet
        val t0 = System.nanoTime()
        graft.core.TxnTable.upsert(spark, dir, "k", updates, numFiles = 4)
        val sec = (System.nanoTime() - t0) / 1e9
        val after = graft.core.TxnTable.liveFiles(dir).toSet
        val rewritten = before.size - (before & after).size
        println(f"""{"op":"cow_upsert1m_${mult}x","rows":$n,"files":$nFiles,"files_rewritten":$rewritten,"sec_upsert":$sec%.2f}""")
      }
    }
    if (only("bloomship")) {
      // where the Bloom ship pays: a key set too big to broadcast
      // forces the plain semi-join to SHUFFLE the whole fact; the
      // bitset probe (an array-literal filter in the scan's codegen
      // stage) cuts the shuffled rows to ~selectivity + fpp. Sweep
      // fact size at a fixed 2M-key set, 1% true selectivity.
      val nKeys = 2000000L
      // keys 0..2M-1 but only every 100th key appears in the fact →
      // 1% of fact rows are members
      for (mult <- Seq(10, 50)) {
        val nFact = 1000000L * mult
        val keys = spark.range(nKeys).select(col("id").as("o_orderkey"))
        val fact = spark.range(nFact).select(
          (when(pmod(col("id"), lit(100)) === 0,
            pmod(xxhash64(col("id")), lit(nKeys)))
            .otherwise(pmod(xxhash64(col("id")), lit(1000000L))
              + lit(10000000L))).as("k"),
          col("id").as("v"))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        def run(name: String)(body: => Long): (String, Double, Long) = {
          val t0 = System.nanoTime()
          val n = body
          (name, (System.nanoTime() - t0) / 1e9, n)
        }
        try {
          val plain = run("plain")(
            fact.join(keys, col("k") === col("o_orderkey"), "left_semi")
              .count())
          val bloom = run("bloom")(
            graft.operators.KeyShip.semiShip(fact, "k", keys,
              "o_orderkey", maxLiterals = 100).count())
          assert(plain._3 == bloom._3,
            s"result mismatch: ${plain._3} vs ${bloom._3}")
          println(f"""{"op":"bloomship_${mult}x","fact_rows":$nFact,"keys":$nKeys,"matched":${plain._3},"sec_plain_shuffle_semi":${plain._2}%.2f,"sec_bloom_ship":${bloom._2}%.2f,"bloom_over_plain":${plain._2 / bloom._2}%.2f}""")
        } finally
          spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    for (op <- Seq("dd02", "dd04", "dd05", "dd11") if only(op)) {
      val cells = points.map { case (c, m) =>
        val (t, n) = m(op); f""""sec_${c}x":$t%.2f,"rows_${c}x":$n"""
      }.mkString(",")
      val slope = points.last._2(op)._1 / points(1)._2(op)._1
      println(f"""{"op":"$op",$cells,"slope_10x_to_100x":$slope%.2f}""")
    }
    spark.stop()
  }
}
