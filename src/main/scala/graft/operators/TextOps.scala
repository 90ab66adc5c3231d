package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Text-analysis operators for large-scale training-data pipelines:
  * quality scoring, language ID, token statistics, fingerprinting.
  * All are single-pass, codegen-friendly column expressions (no UDFs),
  * so at 100 TB they run as a map-only stage over the parquet scan
  * (plus one shuffle for the global token histogram).
  */
object TextOps {

  private val tokensExpr = "split(trim(text), '\\\\s+')"

  /** Per-document quality metrics: token counts, uniq-token ratio,
    * punctuation ratio, mean token length, stopword ratio. */
  def txQuality(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("tokens", expr(tokensExpr))
      .select(
        col("doc_id"),
        col("n_chars"),
        length(col("text")).cast("bigint").as("len_actual"),
        size(col("tokens")).cast("bigint").as("n_tokens"),
        size(array_distinct(col("tokens"))).cast("bigint").as("n_uniq_tokens"),
        (size(array_distinct(col("tokens"))).cast("double")
          / size(col("tokens"))).as("uniq_ratio"),
        (expr("aggregate(transform(tokens, t -> length(t)), 0, (a, x) -> a + x)")
          .cast("double") / size(col("tokens"))).as("avg_token_len"),
        ((length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
          .cast("double") / length(col("text"))).as("punct_ratio"),
        (expr("size(filter(tokens, t -> t in ('the', 'a', 'of', 'and', 'to', 'in')))")
          .cast("double") / size(col("tokens"))).as("stopword_ratio"))
      .orderBy("doc_id")

  /** Language ID via stopword-list scoring (n-gram-heuristic style):
    * count marker tokens per language, argmax with fixed tie order,
    * reported as a confusion matrix against the labeled lang column. */
  def txLangId(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("tokens", expr(tokensExpr))
      .withColumn("s_en", expr("size(filter(tokens, t -> t in ('the', 'a', 'of', 'and', 'is')))"))
      .withColumn("s_fr", expr("size(filter(tokens, t -> t in ('le', 'la', 'et', 'est', 'un')))"))
      .withColumn("s_de", expr("size(filter(tokens, t -> t in ('der', 'die', 'und', 'ist', 'ein')))"))
      .withColumn("s_es", expr("size(filter(tokens, t -> t in ('el', 'los', 'es', 'una', 'que')))"))
      .withColumn("predicted_lang",
        when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_de")
          && col("s_en") >= col("s_es") && col("s_en") > 0, "en")
          .when(col("s_fr") >= col("s_de") && col("s_fr") >= col("s_es")
            && col("s_fr") > 0, "fr")
          .when(col("s_de") >= col("s_es") && col("s_de") > 0, "de")
          .when(col("s_es") > 0, "es")
          .otherwise("und"))
      .groupBy("lang", "predicted_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted_lang")

  /** Global token histogram (top 20): explode + count — the one
    * text-analysis op that shuffles (on token). */
  def txTokenTopK(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(expr(tokensExpr)).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token"))
      .limit(20)

  /** Document fingerprint: md5 over the normalized text (lowercase,
    * alnum+space only, collapsed whitespace) — the basis for
    * normalized exact dedup. */
  def txFingerprint(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        md5(trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")))
          .as("fingerprint"))
      .orderBy("doc_id")

  /** Exact deduplication via hash-groupBy on the normalized
    * fingerprint: one shuffle on the 128-bit hash; canonical doc =
    * min(doc_id) per group. */
  def ddExact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(md5(trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")))
        .as("fingerprint"))
      .agg(min(col("doc_id")).as("canonical_doc"), count(lit(1)).as("n_copies"))
      .orderBy("fingerprint")

  /** Multimodal column plumbing: opaque binary payload + typed
    * metadata. The payload here is the utf-8 encoding of text (the
    * container has no image/audio codecs); the schema, hashing and
    * byte-level ops are the real thing. */
  def mmBinaryMeta(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("bigint").as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        substring(hex(col("payload")), 1, 16).as("head_hex"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx01_text_quality" -> (txQuality _),
    "tx02_lang_id" -> (txLangId _),
    "tx03_token_topk" -> (txTokenTopK _),
    "tx04_fingerprint" -> (txFingerprint _),
    "dd01_dedup_exact" -> (ddExact _),
    "mm01_binary_meta" -> (mmBinaryMeta _),
  )

  val oracle: Map[String, String] = Map(
    "tx01_text_quality" ->
      """WITH tok AS (SELECT doc_id, n_chars, text, string_split_regex(trim(text), '\s+') AS tokens FROM documents)
        |SELECT doc_id, n_chars,
        | length(text) AS len_actual,
        | len(tokens) AS n_tokens,
        | len(list_distinct(tokens)) AS n_uniq_tokens,
        | CAST(len(list_distinct(tokens)) AS DOUBLE) / len(tokens) AS uniq_ratio,
        | CAST(list_sum(list_transform(tokens, t -> length(t))) AS DOUBLE) / len(tokens) AS avg_token_len,
        | CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
        | CAST(len(list_filter(tokens, t -> t in ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE) / len(tokens) AS stopword_ratio
        |FROM tok ORDER BY doc_id""".stripMargin,
    "tx02_lang_id" ->
      """WITH scored AS (
        | SELECT lang,
        |  len(list_filter(tokens, t -> t in ('the', 'a', 'of', 'and', 'is'))) s_en,
        |  len(list_filter(tokens, t -> t in ('le', 'la', 'et', 'est', 'un'))) s_fr,
        |  len(list_filter(tokens, t -> t in ('der', 'die', 'und', 'ist', 'ein'))) s_de,
        |  len(list_filter(tokens, t -> t in ('el', 'los', 'es', 'una', 'que'))) s_es
        | FROM (SELECT lang, string_split_regex(trim(text), '\s+') tokens FROM documents))
        |SELECT lang,
        | CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es AND s_en > 0 THEN 'en'
        |      WHEN s_fr >= s_de AND s_fr >= s_es AND s_fr > 0 THEN 'fr'
        |      WHEN s_de >= s_es AND s_de > 0 THEN 'de'
        |      WHEN s_es > 0 THEN 'es' ELSE 'und' END AS predicted_lang,
        | COUNT(*) AS n
        |FROM scored GROUP BY 1, 2 ORDER BY lang, predicted_lang""".stripMargin,
    "tx03_token_topk" ->
      """SELECT t AS token, COUNT(*) AS n
        |FROM documents, unnest(string_split_regex(trim(text), '\s+')) AS u(t)
        |GROUP BY t ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "tx04_fingerprint" ->
      """SELECT doc_id,
        | md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dd01_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint,
        | MIN(doc_id) AS canonical_doc, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin,
    "mm01_binary_meta" ->
      """SELECT doc_id,
        | octet_length(encode(text)) AS n_bytes,
        | md5(text) AS payload_md5,
        | substring(hex(encode(text)), 1, 16) AS head_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
