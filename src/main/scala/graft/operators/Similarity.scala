package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables._

/** Similarity search over the embeddings table (Array[Float]).
  *
  * Numeric determinism: dot products are folded in exact fixed-point
  * (each float×float product is computed in double — identical IEEE
  * result in any engine — scaled by 1e12, floored, summed as BIGINT),
  * so results hash-match the DuckDB oracle despite Spark's
  * nondeterministic row order. Only the final sqrt/divide run in
  * double, on operands that are bit-identical across engines.
  *
  * Scale path: brute-force top-k broadcasts the (small) query set and
  * scans the corpus once — the right plan when queries ≪ corpus.
  * The LSH variant buckets by random-hyperplane signature so candidate
  * generation is an equi-join on bucket id instead of a cross join.
  */
object Similarity {

  /** Exact fixed-point dot: each float×float product is computed in
    * double (IEEE-identical in any engine), scaled by 1e12, floored,
    * and summed as BIGINT — an associative exact sum, so Spark's
    * partial-aggregation order can't perturb it. Runs as the native
    * codegen'd [[graft.functions.FixedPointDot]] expression (a tight
    * primitive loop; the aggregate/zip_with HOF form it replaces
    * allocated an array and ran interpreted per element). */
  private def dotFix = graft.functions.GraftFunctions.fixdotD(col("qe"), col("ce"))

  private def withNorm(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .withColumn("nrm", sqrt(
        graft.functions.GraftFunctions.fixdotD(col("embedding"), col("embedding"))))

  /** Brute-force cosine top-5 for query vectors vec_id < 10
    * (oracle-checked). Query side is broadcast; corpus side is a
    * single scan; ranking is a per-query window. */
  def simCosineTopK(s: SparkSession, d: String): DataFrame = {
    val v = withNorm(s, d)
    val q = broadcast(v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn")))
    val c = v.select(col("vec_id").as("nid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), col("nid"))
    c.join(q, col("qid") =!= col("nid"))
      .withColumn("cosine", dotFix / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 5)
      .select("qid", "nid", "rank", "cosine")
      .orderBy("qid", "rank")
  }

  /** Per-label corpus statistics on embedding norms (oracle-checked):
    * the norm is double but summed as exact decimal for the mean. */
  def simLabelStats(s: SparkSession, d: String): DataFrame =
    withNorm(s, d)
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        (sum(col("nrm").cast("decimal(18,9)")).cast("double") / count(lit(1)))
          .as("avg_norm"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"))
      .orderBy("label")

  /** LSH-bucketed ANN (no SQL oracle — hash-dependent): 6
    * random-hyperplane sign bits (coefficients ±1 derived from
    * xxhash64(plane, dim)) form the bucket id; neighbors are searched
    * within the query's bucket only, turning candidate generation into
    * an equi-join on bucket. */
  def simLshAnn(s: SparkSession, d: String): DataFrame = {
    val planes = 6
    val bucketExpr =
      s"""aggregate(sequence(0, ${planes - 1}), 0,
         |  (acc, p) -> acc + case when
         |    aggregate(zip_with(embedding, sequence(0, size(embedding) - 1),
         |        (x, i) -> cast(x as double) * (cast(pmod(xxhash64(p, i), 2) as double) * 2.0d - 1.0d)),
         |      cast(0.0 as double), (a, v) -> a + v) >= 0
         |    then cast(shiftleft(1, p) as int) else 0 end)""".stripMargin
    val v = withNorm(s, d).withColumn("bucket", expr(bucketExpr))
    val q = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("bucket"))
    val c = v.select(col("vec_id").as("nid"), col("embedding").as("ce"),
      col("nrm").as("cn"), col("bucket"))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), col("nid"))
    q.join(c, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cosine", dotFix / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 3)
      .select("qid", "nid", "rank", "cosine")
      .orderBy("qid", "rank")
  }

  /** Embedding-cosine high-similarity pairs (no SQL oracle): all pairs
    * within the same LSH bucket with cosine ≥ 0.3 — the embedding
    * analogue of MinHash dedup (this synthetic corpus has no true
    * embedding near-dups; max pairwise cosine ≈ 0.48). */
  def simNearDupPairs(s: SparkSession, d: String): DataFrame = {
    val planes = 8
    val bucketExpr =
      s"""aggregate(sequence(0, ${planes - 1}), 0,
         |  (acc, p) -> acc + case when
         |    aggregate(zip_with(embedding, sequence(0, size(embedding) - 1),
         |        (x, i) -> cast(x as double) * (cast(pmod(xxhash64(p, i), 2) as double) * 2.0d - 1.0d)),
         |      cast(0.0 as double), (a, v) -> a + v) >= 0
         |    then cast(shiftleft(1, p) as int) else 0 end)""".stripMargin
    val v = withNorm(s, d).withColumn("bucket", expr(bucketExpr))
    val a = v.select(col("vec_id").as("x"), col("embedding").as("qe"),
      col("nrm").as("qn"), col("bucket"))
    val b = v.select(col("vec_id").as("y"), col("embedding").as("ce"),
      col("nrm").as("cn"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("x") < col("y"))
      .withColumn("cosine", dotFix / (col("qn") * col("cn")))
      .filter(col("cosine") >= 0.3)
      .select("x", "y", "cosine")
      .orderBy("x", "y")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim01_cosine_topk" -> (simCosineTopK _),
    "sim02_label_stats" -> (simLabelStats _),
    "sim03_lsh_ann" -> (simLshAnn _),
    "sim04_embedding_near_dups" -> (simNearDupPairs _),
  )

  val oracle: Map[String, String] = Map(
    "sim01_cosine_topk" ->
      """WITH v AS (SELECT vec_id, embedding,
        |  sqrt(CAST(list_sum(list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12) AS BIGINT))) AS DOUBLE) / 1e12) nrm
        |  FROM embeddings),
        |p AS (SELECT q.vec_id qid, c.vec_id nid,
        |  (CAST(list_sum(list_transform(list_zip(q.embedding, c.embedding),
        |    z -> CAST(floor(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) * 1e12) AS BIGINT))) AS DOUBLE) / 1e12)
        |    / (q.nrm * c.nrm) AS cosine
        |  FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
        |SELECT qid, nid, rank, cosine FROM (
        |  SELECT qid, nid, cosine,
        |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
        |  FROM p) t
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "sim02_label_stats" ->
      """WITH v AS (SELECT label,
        |  sqrt(CAST(list_sum(list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12) AS BIGINT))) AS DOUBLE) / 1e12) nrm
        |  FROM embeddings)
        |SELECT label, COUNT(*) AS n,
        | CAST(SUM(CAST(nrm AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS avg_norm,
        | MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
        |FROM v GROUP BY label ORDER BY label""".stripMargin,
  )
}
