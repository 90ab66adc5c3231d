package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.tools.{CorpusFuzz, CorpusGen}

/** Generated-corpus differential fuzzing, in-CI layer (the data-side
  * twin of RequestFuzzSpec): 20 seeded adversarial corpora
  * ([[CorpusGen]] — threshold-straddling near-dup plants, unicode
  * mixes, PII boundary plants, pathological lengths), each run
  * through the ENTIRE 46-query tx/dd/sp/mm battery and compared
  * row-for-row against the independent plain-Scala duals in
  * [[CorpusDuals]] (different substrate, no shared code with the
  * operators). Doubles compare with 1e-9 relative tolerance — the
  * bit-exact layer is the offline DuckDB re-render
  * (graft.tools.CorpusFuzz + tools/selfcheck.py, results recorded in
  * COVERAGE.md).
  *
  * dd03 (MinHash-LSH) is the battery's one PROBABILISTIC operator;
  * its dual replicates the 8×4 banding bit-for-bit through the same
  * catalyst XXH64 primitive, so even its corpus-dependent recall is
  * equality-checked, not just subset-checked.
  */
/** The seed loop, parameterized by corpus range so the two halves run
  * as separate suites in PARALLEL forked test JVMs (r21 verify-latency
  * split — see [[RelCorpusFuzzHalf]]): 1–10 here, 11–20 in
  * [[CorpusFuzzSpecB]]; seeds and assertions identical to the
  * pre-split single loop. */
abstract class CorpusFuzzHalf(seeds: Range) extends AnyFunSuite {

  protected lazy val spark: SparkSession = {
    val root = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // a dedicated session: tiny corpora want few shuffle partitions
    // regardless of which suite created the shared context first
    val s = root.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  private type Dual = (Seq[CorpusGen.Doc], Seq[(Long, String)],
    Seq[(Long, Array[Float], Int)]) => Seq[CorpusDuals.Row]

  private def docsOnly(f: Seq[CorpusGen.Doc] => Seq[CorpusDuals.Row]): Dual =
    (d, _, _) => f(d)

  private val duals: Seq[(String, Dual)] = Seq[(String, Dual)](
    "tx01_text_quality" -> docsOnly(CorpusDuals.tx01),
    "tx02_lang_id" -> docsOnly(CorpusDuals.tx02),
    "tx03_token_topk" -> docsOnly(CorpusDuals.tx03),
    "tx04_fingerprint" -> docsOnly(CorpusDuals.tx04),
    "tx05_bpe_pieces" -> docsOnly(CorpusDuals.tx05),
    "tx06_repetition" -> docsOnly(CorpusDuals.tx06),
    "tx07_pii_scrub" -> docsOnly(CorpusDuals.tx07),
    "tx08_contamination" -> docsOnly(CorpusDuals.tx08),
    "tx09_length_quantiles" -> docsOnly(CorpusDuals.tx09),
    "tx10_zipf_rank" -> docsOnly(CorpusDuals.tx10),
    "tx11_bpe_merge_rank" -> docsOnly(CorpusDuals.tx11),
    "tx12_vocab_stats" -> docsOnly(CorpusDuals.tx12),
    "tx13_quantile_sketch" -> docsOnly(CorpusDuals.tx13),
    "tx14_quality_model" -> docsOnly(CorpusDuals.tx14),
    "tx15_bigram_fluency" -> docsOnly(CorpusDuals.tx15),
    "tx16_source_top_terms" -> docsOnly(CorpusDuals.tx16),
    "tx17_quality_buckets" -> docsOnly(CorpusDuals.tx17),
    "tx18_bpe_apply" -> docsOnly(CorpusDuals.tx18),
    "tx19_token_ids" -> docsOnly(CorpusDuals.tx19),
    "dd01_dedup_exact" -> docsOnly(CorpusDuals.dd01),
    "dd02_ngram_jaccard" -> docsOnly(CorpusDuals.dd02),
    "dd03_minhash_lsh" -> docsOnly(CorpusDuals.dd03),
    "dd04_simhash" -> docsOnly(CorpusDuals.dd04),
    "dd05_components" -> docsOnly(CorpusDuals.dd05),
    "dd06_passage_dedup" -> docsOnly(CorpusDuals.dd06),
    "dd07_canonical_pick" -> docsOnly(CorpusDuals.dd07),
    "dd08_semdedup" -> ((_, _, e) => CorpusDuals.dd08(e)),
    "dd09_semdedup_hier" -> ((_, _, e) => CorpusDuals.dd09(e)),
    "dd10_containment" -> docsOnly(CorpusDuals.dd10),
    "dd11_span_coverage" -> docsOnly(CorpusDuals.dd11),
    "dd12_incremental" -> docsOnly(CorpusDuals.dd12),
    "dd13_fuzzy_join" -> ((_, c, _) => CorpusDuals.dd13(c)),
    "mm01_binary_meta" -> docsOnly(CorpusDuals.mm01),
    "mm05_chunk_dedup" -> docsOnly(CorpusDuals.mm05),
    "sp01_split_assign" -> docsOnly(CorpusDuals.sp01),
    "sp02_stratified_sample" -> docsOnly(CorpusDuals.sp02),
    "sp03_sequence_pack" -> docsOnly(CorpusDuals.sp03),
    "sp04_mixture_weights" -> docsOnly(CorpusDuals.sp04),
    "sp05_corpus_shuffle" -> docsOnly(CorpusDuals.sp05),
    "sp06_pack_spans" -> docsOnly(CorpusDuals.sp06),
    "sp07_temperature_mix" -> docsOnly(CorpusDuals.sp07),
    "sp08_source_budget" -> docsOnly(CorpusDuals.sp08),
    "sp09_shard_export" -> docsOnly(CorpusDuals.sp09),
    "sp10_priority_sample" -> docsOnly(CorpusDuals.sp10),
    "sp11_padding_manifest" -> docsOnly(CorpusDuals.sp11),
    "sp12_quality_curate" -> docsOnly(CorpusDuals.sp12))

  private def normalize(v: Any): Any = v match {
    case null => null
    case i: Int => i.toLong
    case i: java.lang.Integer => i.longValue()
    case s: Short => s.toLong
    case f: Float => f.toDouble
    case b: java.math.BigDecimal => b.doubleValue()
    case x => x
  }

  private def sameValue(a: Any, b: Any): Boolean =
    (normalize(a), normalize(b)) match {
      case (null, null) => true
      case (x: Double, y: Double) =>
        (x.isNaN && y.isNaN) || x == y ||
          math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(
            math.abs(x), math.abs(y)))
      case (x, y) => x == y
    }

  private def fmtRow(r: Seq[(String, Any)]): String =
    r.map { case (k, v) => s"$k=$v" }.mkString("{", ", ", "}")

  protected def check(name: String, seed: Int,
      got: Seq[Seq[(String, Any)]], want: Seq[CorpusDuals.Row]): Unit = {
    assert(got.length == want.length,
      s"[$name seed=$seed] rows ${got.length} != dual ${want.length}\n" +
        s"first spark: ${got.headOption.map(fmtRow)}\n" +
        s"first dual:  ${want.headOption.map(fmtRow)}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      val gs = g.sortBy(_._1); val ws = w.sortBy(_._1)
      assert(gs.map(_._1) == ws.map(_._1),
        s"[$name seed=$seed] row $i cols ${gs.map(_._1)} != ${ws.map(_._1)}")
      gs.zip(ws).foreach { case ((c, gv), (_, wv)) =>
        assert(sameValue(gv, wv),
          s"[$name seed=$seed] row $i col $c: spark=$gv dual=$wv\n" +
            s"spark row: ${fmtRow(gs)}\ndual row:  ${fmtRow(ws)}")
      }
    }
  }

  test(s"adversarial corpora ${seeds.head}-${seeds.last} × the full " +
      "46-query tx/dd/sp/mm battery ≡ the independent plain-Scala duals " +
      "(dd03's banding replicated bit-for-bit via catalyst XXH64)") {
    val queries = SparkEntry.queries
    var checked = 0
    seeds.foreach { seed =>
      val dir = graft.core.TempDirs.scratchShared(s"corpusfuzz$seed")
      CorpusFuzz.writeCorpus(spark, seed, dir, linkFixed = false)
      val docs = CorpusGen.documents(seed)
      val cust = CorpusGen.customer(seed)
      val embs = CorpusGen.embeddings(seed)
      duals.foreach { case (name, dual) =>
        val got = queries(name)(spark, dir).collect().toSeq
          .map(r => r.schema.fieldNames.toSeq.map(f =>
            f -> r.get(r.fieldIndex(f))))
        check(name, seed, got, dual(docs, cust, embs))
        checked += 1
      }
      graft.operators.Dedup.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
    }
    info(s"$checked query×corpus checks green")
    assert(checked == seeds.size * duals.size)
  }
}

class CorpusFuzzSpec extends CorpusFuzzHalf(1 to 10) {

  test("named minimal fixtures: each r17 cross-engine finding pinned " +
      "on a 6-row corpus (NBSP trim, VT tokenizer, empty-doc NULL " +
      "ratios, trailing-empty token, codepoint levenshtein)") {
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val dir = graft.core.TempDirs.scratchShared("corpusfix")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val docs = Seq(
      R(0L, "", "en", "s0", 0L), // empty doc: the ANSI div-by-zero crash
      R(1L, "\u00A0", "en", "s0", 1L), // NBSP: DuckDB trim strips it, Spark keeps
      R(2L, "a\u000Bb", "en", "s0", 3L), // VT: in Java \s, NOT in RE2 \s
      R(3L, "  x  ", "en", "s0", 5L), // ASCII-space trim on both sides
      R(4L, "x\ty\n", "en", "s0", 4L), // trailing \n: split keeps the empty token
      R(5L, "the a of", "en", "s0", 8L))
    val rows = new java.util.ArrayList[R](docs.size)
    docs.foreach(rows.add)
    spark.createDataFrame(rows, docSchema).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val tx01 = SparkEntry.queries("tx01_text_quality")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("n_tokens")),
          r.isNullAt(r.fieldIndex("punct_ratio")))).toMap
    // empty doc: ONE empty token (split of ''), punct_ratio NULL (not
    // a crash, not NaN) — the try_divide fix
    assert(tx01(0L) == ((1L, true)), s"${tx01(0L)}")
    // NBSP doc: trim(text, ' ') must NOT strip it — one 1-char token
    assert(tx01(1L) == ((1L, false)))
    // VT separates: 2 tokens in BOTH engines under the explicit class
    assert(tx01(2L)._1 == 2L)
    // ASCII spaces trim: one token
    assert(tx01(3L)._1 == 1L)
    // trailing newline: Spark split keeps the trailing empty token
    // (limit -1), matching DuckDB — 3 tokens (x, y, '')
    assert(tx01(4L)._1 == 3L)
    val fixDocs = docs.map(r => graft.tools.CorpusGen.Doc(
      r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
      r.getLong(4)))
    check("tx01_fixture", 0, SparkEntry.queries("tx01_text_quality")(
      spark, dir).collect().toSeq.map(r =>
        r.schema.fieldNames.toSeq.map(f => f -> r.get(r.fieldIndex(f)))),
      CorpusDuals.tx01(fixDocs))
    // codepoint levenshtein: cafe/café must PAIR at distance 1 (byte
    // distance is 2 — the dd13 finding); café/caff too; cafe/caff too
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType)))
    val cust = new java.util.ArrayList[R](3)
    Seq(R(1L, "cafe#1"), R(2L, "café#1"), R(3L, "caff#1")).foreach(cust.add)
    spark.createDataFrame(cust, custSchema).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val dd13 = SparkEntry.queries("dd13_fuzzy_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(dd13 == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)),
      s"codepoint-levenshtein pairs wrong: $dd13")
  }
}

class CorpusFuzzSpecB extends CorpusFuzzHalf(11 to 20)
