package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Similarity
import graft.functions.GraftFunctions

/** ANN RECALL REGRESSION GATE (the r13 recall-curve probe promoted
  * from tools/ into the suite): the oracle battery pins exact hashes
  * of each approximate path against ITS OWN definition, so a refactor
  * could degrade approximation QUALITY while every hash still
  * matches. This spec pins recall against brute force on a fixed
  * seeded clustered corpus — floors are set a healthy margin below
  * the measured values (IVF 1.0, LSH 1.0, MRL 0.884, IVF-PQ 0.875 at these
  * knobs) and far above chance (top-10 of 6,000 ≈ 0.002), so they
  * trip on a routing/banding/encoding collapse, not on noise — the
  * corpus, seeds, and every quantizer input are deterministic, so the
  * measured recall is exactly reproducible, not statistical. */
class AnnRecallGateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val n = 6000
  private val dim = 64 // = the PQ m(4) × sub(16) layout sim09 assumes
  private val clusters = 16
  private val subPerCluster = 8
  private val nq = 32

  /** Seeded HIERARCHICALLY clustered corpus: 16 coarse clusters × 8
    * subclusters × ~47 members (cluster offsets N(0,1), subcluster
    * offsets σ=0.5, member noise σ=0.02). A query's true cosine
    * neighbors are its ~46 subcluster mates, so the neighbor signal
    * lives at every scale the stack must preserve: coarse routing
    * (IVF lists track clusters), banding (mates share signatures),
    * and PQ codes (the residual signal is the σ=0.5 subcluster
    * offset — quantizable — not sub-code-rate noise; a corpus whose
    * neighbors differ only by σ-noise is unrecoverable for ANY
    * 2-byte code and gates nothing). Ids interleave (cluster =
    * i mod 16) so the corpus head — which the sim09 flat quantizers
    * are built from — is cluster-diverse. */
  private lazy val corpus: DataFrame = {
    val rnd = new scala.util.Random(20260816L)
    val centers = Array.fill(clusters, dim)(rnd.nextGaussian().toFloat)
    val subOff = Array.fill(clusters, subPerCluster, dim)(
      rnd.nextGaussian().toFloat * 0.5f)
    val rows = (0 until n).map { i =>
      val c = i % clusters
      val sc = (i / clusters) % subPerCluster
      (i.toLong, (0 until dim).map(j =>
        centers(c)(j) + subOff(c)(sc)(j) +
          rnd.nextGaussian().toFloat * 0.02f))
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("nrm", expr(
        "sqrt(aggregate(embedding, 0D, (a,x) -> a + cast(x as double)*x))"))
      .cache()
  }

  private def cosine(qe: String, ce: String) =
    GraftFunctions.fixdotD(col(qe), col(ce)) / (col("qn") * col("cn"))

  /** Brute-force cosine top-`k` per query (self excluded) — the
    * ground truth every approximate path is measured against. */
  private def bruteTop(k: Int): Map[Long, Set[Long]] = bruteTopRange(k, nq)

  private def bruteTopRange(k: Int, numQ: Int): Map[Long, Set[Long]] = {
    val q = broadcast(corpus.filter(col("vec_id") < numQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn")))
    val c = corpus.select(col("vec_id").as("nid"),
      col("embedding").as("ce"), col("nrm").as("cn"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("nid"))
    c.join(q, col("qid") =!= col("nid"))
      .withColumn("cos", cosine("qe", "ce"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid").collect()
      .groupBy(_.getLong(0)).map { case (q0, rs) =>
        q0 -> rs.map(_.getLong(1)).toSet }
  }

  private def recall(truth: Map[Long, Set[Long]],
      got: Map[Long, Set[Long]]): Double =
    truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / truth.size

  test("IVF recall@10 >= 0.80 at nprobe 4 of 16 lists (vs exact " +
      "nprobe=k serve on the same layout)") {
    val flat = graft.core.TempDirs.scratchShared("recallivf")
    corpus.select(lit(1).as("cid"), col("vec_id"), col("embedding"),
        col("nrm"))
      .repartition(4)
      .write.partitionBy("cid").mode("overwrite").parquet(flat)
    val k = 16
    val (layout, _) = Similarity.ivfRetrain(spark, flat, k, iters = 2)
    val queries = (0L until nq.toLong)
    def served(nprobe: Int): Map[Long, Set[Long]] =
      Similarity.ivfServe(spark, layout, queries, nprobe, topK = 10)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val truth = served(k) // every list scanned = exact
    val r = recall(truth, served(4))
    info(f"IVF recall@10 at nprobe=4/16: $r%.3f")
    assert(r >= 0.80,
      f"IVF recall@10 collapsed to $r%.3f — probe routing is broken")
  }

  test("LSH recall@10 >= 0.70 at 8 bands x 4 rows (vs brute-force " +
      "cosine top-10)") {
    val bands = 8; val rowsPerBand = 4; val seed = 42L
    val ex = corpus.select(col("vec_id"), col("embedding"), col("nrm"),
      posexplode(GraftFunctions.hyperplaneBands(
        col("embedding"), bands, rowsPerBand, seed))
        .as(Seq("band_idx", "band_sig")))
    val q = broadcast(ex.filter(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("band_idx"), col("band_sig")))
    val c = ex.select(col("vec_id").as("nid"), col("embedding").as("ce"),
      col("nrm").as("cn"), col("band_idx"), col("band_sig"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("nid"))
    val got = c.join(q, Seq("band_idx", "band_sig"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine("qe", "ce"))
      .select("qid", "nid", "cos").distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select("qid", "nid").collect()
      .groupBy(_.getLong(0)).map { case (q0, rs) =>
        q0 -> rs.map(_.getLong(1)).toSet }
    val r = recall(bruteTop(10), got)
    info(f"LSH recall@10 at $bands bands x $rowsPerBand rows: $r%.3f")
    assert(r >= 0.70,
      f"LSH recall@10 collapsed to $r%.3f — banding is broken")
  }

  test("MRL prefix-rerank recall@10 >= 0.80 at pdim 16 of 64, " +
      "shortlist 30 (vs brute-force cosine top-10)") {
    // the real sim10 path over the gate corpus: stage 1 ranks on the
    // 16-dim Matryoshka prefix, stage 2 reranks the shortlist on the
    // full vectors — recall collapses if the prefix slice, shortlist
    // aggregate, or rerank fetch breaks
    val got = Similarity.simMrlRerankFrom(
        corpus.select("vec_id", "embedding"),
        pdim = 16, shortlist = 30, k = 10, nq = nq)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val r = recall(bruteTop(10), got)
    info(f"MRL recall@10 at pdim=16/64, shortlist=30: $r%.3f")
    assert(r >= 0.80,
      f"MRL recall@10 collapsed to $r%.3f — prefix ranking or the " +
        "rerank fetch is broken")
  }

  test("IVF-PQ mate-recall@5 >= 0.80 at nprobe 2 of 16 lists, 4x16 " +
      "residual codebook (vs the planted near-duplicate sets)") {
    // sim09's exact path and knobs (flat quantizers off the corpus
    // head, residual ADC) — only the corpus and query count differ.
    // Recall is gated over queries DISJOINT from the quantizer heads
    // (ids 0..15 are the coarse centroids — their own-list residual
    // is exactly zero, a no-signal artifact of head-as-query, not of
    // the encoding; ids 16..31 are the codebook rows).
    val qlo = 32L
    val got = Similarity.simIvfPqFrom(spark, corpus, g = 16, nq = 48)
      .filter(col("qid") >= qlo)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    // GENERATIVE truth (got@5 vs the planted subcluster mate set): a
    // query's ~46 mates share one PQ code, so their ADC estimates TIE
    // exactly and the within-tie order is noise a 2-byte code cannot
    // see — a brute top-k truth would gate on tie-break luck, not on
    // encoding quality. What IS gated: every returned neighbor must
    // be a true planted near-duplicate of the query.
    def mates(q: Long): Set[Long] =
      (0L until n.toLong).filter(i =>
        i != q && i % (clusters * subPerCluster) ==
          q % (clusters * subPerCluster)).toSet
    val r = (qlo until 48L).map { q =>
      got.getOrElse(q, Set.empty).intersect(mates(q)).size.toDouble / 5
    }.sum / (48 - qlo)
    info(f"IVF-PQ mate-recall@5 at nprobe=2/16, m=4 k=16: $r%.3f")
    assert(r >= 0.80,
      f"IVF-PQ mate-recall@5 collapsed to $r%.3f — residual " +
        "encoding or ADC ranking is broken")
  }
}
