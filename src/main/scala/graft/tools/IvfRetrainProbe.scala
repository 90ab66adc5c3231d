package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost slope of the IVF retrain maintenance op (verdict-r10 #4):
  * ivfRetrain is O(iters) distributed passes over the corpus plus one
  * cid-partitioned rewrite — the wall should scale ~linearly in n at
  * fixed (k, iters, dim). Synthetic corpus, dim=16, k=64. */
object IvfRetrainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 64
    for (n <- Seq(500000L, 2000000L, 8000000L)) {
      val v = spark.range(n).select(
        col("id").as("vec_id"),
        expr("transform(sequence(1,16), j -> " +
          "cast(pmod(xxhash64(id*16+j), 1000)/1000.0 as float))")
          .as("embedding"))
        .withColumn("nrm",
          expr("sqrt(aggregate(embedding, 0D, (a,x) -> a + x*x))"))
      val dir = graft.core.TempDirs.scratchShared(s"ivfprobe$n")
      // a deliberately DRIFTED layout: everything in one list, the
      // worst case retrain repairs
      v.select(lit(1).as("cid"), col("vec_id"), col("embedding"),
          col("nrm"))
        .write.partitionBy("cid").mode("overwrite").parquet(dir)
      val t0 = System.nanoTime()
      val (dir2, cents) =
        graft.operators.Similarity.ivfRetrain(spark, dir, k, iters = 2)
      val sec = (System.nanoTime() - t0) / 1e9
      val bal = graft.operators.Similarity.ivfBalance(spark, dir2, k)
      println(f"IVFRETRAIN n=$n%d k=$k sec=$sec%.1f " +
        f"factor=${bal.factor}%.2f lists=${cents.size}")
    }
    spark.stop()
  }
}
