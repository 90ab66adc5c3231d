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
class CorpusFuzzSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
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

  private def check(name: String, seed: Int,
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

  test("20 adversarial corpora × the full 46-query tx/dd/sp/mm battery " +
      "≡ the independent plain-Scala duals (dd03's banding replicated " +
      "bit-for-bit via catalyst XXH64)") {
    val queries = SparkEntry.queries
    var checked = 0
    (1 to 20).foreach { seed =>
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
    assert(checked == 20 * duals.size)
  }
}
