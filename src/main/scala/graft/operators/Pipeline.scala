package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** End-to-end corpus-curation pipeline: the individual training-data
  * operators composed into the manifest a real data run produces. One
  * query chains
  *
  *   1. model-based quality gate      (tx14's hashed linear scorer)
  *   2. exact-duplicate canonical     (md5 group, keep min doc_id)
  *   3. per-source document budget    (sp08's top-K by length)
  *   4. deterministic split assign    (sp01's salted-md5 buckets)
  *
  * and emits one row per SURVIVING document with its split — the
  * output a trainer's data loader consumes. Everything is one linear
  * DataFrame flow, so Catalyst fuses the stages: the quality gate and
  * md5 fingerprint ride the same scan; dedup is one shuffle; the
  * budget is one partitioned window; the split is map-only. The
  * composed plan is exactly what the stages cost individually — no
  * materialization between them (contrast with a pipeline of separate
  * jobs writing intermediate corpora).
  */
object Pipeline {

  def ppCurate(s: SparkSession, d: String): DataFrame = {
    // stage 1: quality gate — reuse tx14's scorer verbatim (keep > 0)
    val kept = TextOps.txQualityModelScored(s, d)
      .filter(col("keep")).select("doc_id")
    val docs = documents(s, d)
      .join(kept, "doc_id")
      .select(col("doc_id"), col("source"), col("n_chars"),
        md5(encode(col("text"), "UTF-8")).as("fp"))
    // stage 2: exact-dup canonical — min doc_id per fingerprint
    // survives (map-side-combined aggregate, one shuffle on fp)
    val canon = docs.groupBy("fp")
      .agg(min(col("doc_id")).as("doc_id"))
      .join(docs, Seq("fp", "doc_id"))
    // stage 3: per-source budget — sp08's map-side-combined top-N
    // aggregate (never a corpus-wide partitioned window)
    val budgeted = Sampling.topNPerSource(canon, 40)
    // stage 4: sp01's salted split buckets (90/5/5 over 1000)
    val bucket = (conv(substring(
      md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("bigint") % 1000)
    budgeted
      .withColumn("split",
        when(bucket < 900, "train").when(bucket < 950, "val")
          .otherwise("test"))
      .select("doc_id", "source", "n_chars", "rank_in_source", "split")
      .orderBy("source", "rank_in_source")
  }

  /** pp02 — CROSS-SOURCE duplication matrix (corpus forensics: which
    * sources copy from which — mirror detection, licensing leakage,
    * mixture double-counting before sp04 reweighting): dd02's
    * verified near-dup pairs rolled up to unordered
    * (source_a, source_b) cells with the pair count, the exact
    * weighted-mean Jaccard (ratio of exact integer sums — no float
    * accumulation anywhere), and the max pair.
    *
    * Scale shape: the heavy lifting is dd02's capped inverted-index
    * join; this adds two equi-joins of the PAIRS frame (≪ corpus)
    * against a two-column doc→source projection — linear, and AQE
    * broadcasts the small side at any scale where one fits — plus an
    * aggregate whose result is ≤ sources², driver-trivial. */
  def ppSourceOverlap(s: SparkSession, d: String): DataFrame = {
    val src = documents(s, d).select(col("doc_id"), col("source"))
    Dedup.ddNgramJaccard(s, d)
      .join(src.as("sx"), col("x") === col("sx.doc_id"))
      .join(src.as("sy"), col("y") === col("sy.doc_id"))
      .select(least(col("sx.source"), col("sy.source")).as("source_a"),
        greatest(col("sx.source"), col("sy.source")).as("source_b"),
        col("inter"), col("nx"), col("ny"), col("jaccard"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("inter")).as("sum_inter"),
        sum(col("nx") + col("ny") - col("inter")).as("sum_union"),
        max(col("jaccard")).as("max_jaccard"))
      .withColumn("mean_jaccard",
        col("sum_inter").cast("double") / col("sum_union"))
      .select("source_a", "source_b", "n_pairs", "sum_inter", "sum_union",
        "mean_jaccard", "max_jaccard")
      .orderBy("source_a", "source_b")
  }

  /** pp03 — EFFECTIVE token budget per source (what a mixture planner
    * actually has to spend, not what `ls -l` suggests): total docs and
    * whitespace tokens per source, minus what exact dedup removes —
    * a doc contributes "effective" tokens only if it is the canonical
    * (min doc_id) occurrence of its md5 fingerprint CORPUS-WIDE, so a
    * source that mirrors another's content shows a high dup_ratio and
    * a deflated effective budget. Feeds sp04/sp07: mixture weights
    * computed from raw token counts double-count mirrored content.
    *
    * Scale shape: one scan computes (fp, source, n_tok); the canonical
    * pick is ONE map-side-combined aggregate on fp (same shuffle as
    * dd01); the per-source rollup aggregates ≤ |sources| rows.
    * No window, no join back against the corpus — the canonical
    * carries its own source/n_tok through min(struct(...)). */
  def ppTokenBudget(s: SparkSession, d: String): DataFrame = {
    // two rollups consume this frame (per-source totals + canonical
    // pick); memoize the NARROW projection so the text column is read
    // and fingerprinted/tokenized once, not once per consumer
    val docs = graft.core.Caches.memo(s, s"pp03|$d|docs")(
      documents(s, d)
        .select(col("doc_id"), col("source"),
          md5(encode(col("text"), "UTF-8")).as("fp"),
          size(expr(TextOps.tokensExpr)).cast("bigint").as("n_tok")))
    // per-fingerprint: who is canonical (min doc_id) and that doc's
    // (source, n_tok) — carried through the same struct-min, ONE
    // aggregate, no join back
    val canon = docs
      .groupBy("fp")
      .agg(min(struct(col("doc_id"), col("source"), col("n_tok"))).as("c"))
      .select(col("c.source").as("source"), col("c.n_tok").as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("eff_docs"),
        sum("n_tok").cast("bigint").as("eff_tokens"))
    docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").cast("bigint").as("n_tokens"))
      .join(canon, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        coalesce(col("eff_docs"), lit(0L)).as("eff_docs"),
        coalesce(col("eff_tokens"), lit(0L)).as("eff_tokens"),
        (lit(1.0) - coalesce(col("eff_tokens"), lit(0L)).cast("double")
          / col("n_tokens")).as("dup_ratio"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pp01_curation_manifest" -> (ppCurate _),
    "pp02_source_overlap" -> (ppSourceOverlap _),
    "pp03_token_budget" -> (ppTokenBudget _),
  )

  // each CTE replicates the corresponding stage's proven oracle
  // fragment (tx14 weights, md5 canonical, sp08 window, sp01 buckets)
  val oracle: Map[String, String] = Map(
    "pp01_curation_manifest" ->
      """WITH toks AS (
        |  SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT % 1024 AS bucket
        |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text, ' '), '[ \t\n\x0b\f\r]+')) t
        |        FROM documents)),
        |w AS (SELECT range AS bucket,
        |        ('0x' || substr(md5('w' || range), 1, 8))::BIGINT % 2001 - 1000 AS wt
        |      FROM range(1024)),
        |kept AS (SELECT doc_id FROM toks JOIN w USING (bucket)
        |         GROUP BY doc_id HAVING SUM(wt) > 0),
        |docs AS (SELECT d.doc_id, d.source, d.n_chars, md5(d.text) AS fp
        |         FROM documents d JOIN kept USING (doc_id)),
        |canon AS (SELECT docs.* FROM docs
        |          JOIN (SELECT fp, MIN(doc_id) doc_id FROM docs GROUP BY fp) c
        |            ON docs.fp = c.fp AND docs.doc_id = c.doc_id),
        |budgeted AS (SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id) AS rank_in_source
        |  FROM canon)
        |SELECT doc_id, source, n_chars, rank_in_source,
        |  CASE WHEN ('0x' || substr(md5('split:' || doc_id), 1, 15))::BIGINT % 1000 < 900 THEN 'train'
        |       WHEN ('0x' || substr(md5('split:' || doc_id), 1, 15))::BIGINT % 1000 < 950 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM budgeted WHERE rank_in_source <= 40
        |ORDER BY source, rank_in_source""".stripMargin,
    // pp02: dd02's proven pair oracle (same tokenization, shingles,
    // inverted-index candidates, ≥ 0.2 verify) rolled up by unordered
    // source pair; SUMs are HUGEINT in DuckDB — cast to BIGINT, and
    // mean_jaccard is a single division of the two exact sums
    "pp02_source_overlap" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(trim(text, ' '), '[ \t\n\x0b\f\r]+') t FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 4),
        |         i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))) shingles
        |       FROM tok WHERE len(t) >= 5),
        |ex AS (SELECT doc_id, unnest(shingles) s FROM sh),
        |hot AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) > __MAXDF__),
        |cap AS (SELECT doc_id, s FROM ex WHERE s NOT IN (SELECT s FROM hot)),
        |cand AS (SELECT a.doc_id x, b.doc_id y, COUNT(*) inter
        |         FROM cap a JOIN cap b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |p AS (SELECT x, y, inter, len(sa.shingles) nx, len(sb.shingles) ny,
        |        CAST(inter AS DOUBLE) / (len(sa.shingles) + len(sb.shingles) - inter) jaccard
        |      FROM cand JOIN sh sa ON cand.x = sa.doc_id JOIN sh sb ON cand.y = sb.doc_id
        |      WHERE CAST(inter AS DOUBLE) / (len(sa.shingles) + len(sb.shingles) - inter) >= 0.2)
        |SELECT least(dx.source, dy.source) AS source_a,
        |  greatest(dx.source, dy.source) AS source_b,
        |  COUNT(*) AS n_pairs,
        |  CAST(SUM(inter) AS BIGINT) AS sum_inter,
        |  CAST(SUM(nx + ny - inter) AS BIGINT) AS sum_union,
        |  CAST(CAST(SUM(inter) AS BIGINT) AS DOUBLE)
        |    / CAST(SUM(nx + ny - inter) AS BIGINT) AS mean_jaccard,
        |  MAX(jaccard) AS max_jaccard
        |FROM p JOIN documents dx ON p.x = dx.doc_id
        |       JOIN documents dy ON p.y = dy.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
        .replace("__MAXDF__",
          graft.operators.Dedup.DefaultMaxShingleDf.toString),
    // pp03: canonical = arg_min by doc_id per fingerprint (the SQL
    // spelling of Spark's min(struct(doc_id, source, n_tok)))
    "pp03_token_budget" ->
      """WITH docs AS (SELECT doc_id, source, md5(text) fp,
        |  CAST(len(string_split_regex(trim(text, ' '), '[ \t\n\x0b\f\r]+')) AS BIGINT) n_tok
        |  FROM documents),
        |canon AS (SELECT fp, arg_min(source, doc_id) src,
        |    arg_min(n_tok, doc_id) nt
        |  FROM docs GROUP BY fp),
        |eff AS (SELECT src AS source, COUNT(*) eff_docs,
        |    CAST(SUM(nt) AS BIGINT) eff_tokens
        |  FROM canon GROUP BY 1),
        |tot AS (SELECT source, COUNT(*) n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) n_tokens
        |  FROM docs GROUP BY 1)
        |SELECT t.source, n_docs, n_tokens,
        |  COALESCE(eff_docs, 0) AS eff_docs,
        |  COALESCE(eff_tokens, 0) AS eff_tokens,
        |  1.0 - CAST(COALESCE(eff_tokens, 0) AS DOUBLE) / n_tokens AS dup_ratio
        |FROM tot t LEFT JOIN eff USING (source)
        |ORDER BY t.source""".stripMargin,
  )
}
