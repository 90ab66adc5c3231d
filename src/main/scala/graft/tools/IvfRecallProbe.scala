package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN serve-quality curve at scale (verdict-r11 #6): recall@10 and
  * per-batch latency of [[graft.operators.Similarity.ivfServe]] as a
  * function of the nprobe knob, at 8M vectors / 64 lists / dim 16 —
  * the size where the probe routing is load-bearing, not decorative.
  * Ground truth = the same serve path at nprobe = k (every list
  * scanned = exact flat search), so the curve isolates EXACTLY what
  * the knob trades: list coverage vs scan fraction. Output feeds the
  * SCALE_SLOPE record. */
object IvfRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = args.headOption.map(_.toLong).getOrElse(8000000L)
    val k = 64
    val topK = 10
    // same synthetic corpus as IvfRetrainProbe (hash-uniform dim 16)
    val v = spark.range(n).select(
      col("id").as("vec_id"),
      expr("transform(sequence(1,16), j -> " +
        "cast(pmod(xxhash64(id*16+j), 1000)/1000.0 as float))")
        .as("embedding"))
      .withColumn("nrm",
        expr("sqrt(aggregate(embedding, 0D, (a,x) -> a + x*x))"))
    val drifted = graft.core.TempDirs.scratchShared(s"ivfrecall$n")
    v.select(lit(1).as("cid"), col("vec_id"), col("embedding"),
        col("nrm"))
      .write.partitionBy("cid").mode("overwrite").parquet(drifted)
    val (layout, _) =
      graft.operators.Similarity.ivfRetrain(spark, drifted, k, iters = 2)
    val queries = (0L until 32L).map(_ * (n / 32) + 7L)
    def served(nprobe: Int): (Map[Long, Set[Long]], Double) = {
      val t0 = System.nanoTime()
      val rows = graft.operators.Similarity
        .ivfServe(spark, layout, queries, nprobe, topK).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      (rows.groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }, sec)
    }
    val (truth, exactSec) = served(k) // nprobe = k = exact flat search
    println(f"IVFRECALL n=$n k=$k queries=${queries.size} topK=$topK " +
      f"exact=${exactSec}%.2fs")
    for (np <- Seq(1, 2, 4, 8, 16, 32, 64)) {
      val (got, sec) = served(np)
      val recall = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
      println(f"IVFRECALL nprobe=$np%2d recall@10=${recall}%.3f " +
        f"sec=${sec}%.2f speedup=${exactSec / sec}%.1fx")
    }
    spark.stop()
  }
}
