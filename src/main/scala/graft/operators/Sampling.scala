package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Both operators key every decision off a CONTENT-INDEPENDENT, salted
  * md5 of the stable row id — never `rand()` and never the raw id:
  *  - reproducible across engines, runs, partitionings and cluster
  *    sizes (a re-run of the 100 TB job assigns every row identically,
  *    so downstream caches and eval sets stay valid);
  *  - the salt ("split:" / "sample:") decorrelates the two decisions —
  *    the val set is not a biased slice of the sample;
  *  - raw ids are usually assigned by ingestion order, so `id % 100`
  *    would fold temporal drift into the split; md5 destroys that.
  *
  * Everything is a map-only stage over the scan (the stratified rate
  * table is a broadcast of a handful of rows) — at 100 TB the split
  * costs exactly one pass, no shuffle.
  */
object Sampling {

  /** 60-bit integer from the first 15 hex chars of a salted md5 —
    * exactly reproducible in any engine with md5 + hex parsing. */
  private def saltedBucket(salt: String, id: org.apache.spark.sql.Column,
      mod: Int) =
    (conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 15), 16, 10)
      .cast("bigint") % mod)

  /** Train/val/test split assignment (90/5/5 over 1000 buckets). */
  def spSplit(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("bucket", saltedBucket("split:", col("doc_id"), 1000))
      .withColumn("split",
        when(col("bucket") < 900, "train")
          .when(col("bucket") < 950, "val")
          .otherwise("test"))
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")

  /** Stratified downsampling: per-language keep rates (e.g. downsample
    * over-represented English 10%, keep 50% of the rest) via a
    * broadcast-joined rate table — the idiomatic shape when strata and
    * rates come from config, not code. */
  def spStratified(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rates = Seq(("en", 10), ("fr", 50), ("es", 50), ("de", 50), ("zh", 50))
      .toDF("lang", "rate")
    documents(s, d)
      .join(broadcast(rates), "lang")
      .filter(saltedBucket("sample:", col("doc_id"), 100) < col("rate"))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sp01_split_assign" -> (spSplit _),
    "sp02_stratified_sample" -> (spStratified _),
  )

  val oracle: Map[String, String] = Map(
    "sp01_split_assign" ->
      """SELECT doc_id, bucket,
        |  CASE WHEN bucket < 900 THEN 'train'
        |       WHEN bucket < 950 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        CAST(('0x' || substr(md5('split:' || doc_id), 1, 15)) AS BIGINT) % 1000 AS bucket
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "sp02_stratified_sample" ->
      """WITH rates(lang, rate) AS (VALUES ('en', 10), ('fr', 50), ('es', 50), ('de', 50), ('zh', 50))
        |SELECT doc_id, d.lang, source
        |FROM documents d JOIN rates r ON d.lang = r.lang
        |WHERE CAST(('0x' || substr(md5('sample:' || doc_id), 1, 15)) AS BIGINT) % 100 < rate
        |ORDER BY doc_id""".stripMargin,
  )
}
