package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway diagnostic for the dd09 100x regression: stage-level
  * timings of the SemDeDup pipeline under flat vs hierarchical
  * assignment on the ScaleSlope 100x corpus. */
object DbgHier {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val copies = sys.env.getOrElse("DH_COPIES", "100").toInt
    val k = sys.env.getOrElse("DH_K", "800").toInt
    val ebase = graft.core.Tables.embeddings(spark, d)
      .select("vec_id", "embedding")
    val v = (0 until copies).map { i =>
      ebase.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        expr(s"transform(embedding, (x, j) -> x * cast(1 - 2 * pmod(hash($i, j), 2) as float))")
          .as("embedding"))
    }.reduce(_ unionByName _)
      .withColumn("nrm", sqrt(graft.functions.GraftFunctions
        .fixdotD(col("embedding"), col("embedding"))))
      .localCheckpoint()

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"DBG $label rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    for (mode <- Seq("flat", "hier")) {
      val asg =
        if (mode == "flat") graft.operators.Similarity.dbgAssignFlat(v, k)
        else graft.operators.Similarity.dbgAssignHier(v, k)
      val m = asg.join(v, "vec_id").select("vec_id", "cid", "embedding", "nrm")
        .persist()
      timed(s"${mode}_m_materialize")(m.count())
      val a = m.select(col("cid"), col("vec_id").as("x"),
        col("embedding").as("qe"), col("nrm").as("qn"))
      val b = m.select(col("cid"), col("vec_id").as("y"),
        col("embedding").as("ce"), col("nrm").as("cn"))
      val dotFix = graft.functions.GraftFunctions.fixdotD(col("qe"), col("ce"))
      val pairs = a.join(b, Seq("cid"))
        .filter(col("x") < col("y"))
        .filter(dotFix / (col("qn") * col("cn")) >= 0.3)
        .select("x", "y").persist()
      timed(s"${mode}_pairs")(pairs.count())
      timed(s"${mode}_components")(
        graft.operators.Dedup.connectedComponents(pairs).count())
      m.unpersist(); pairs.unpersist()
    }
    spark.stop()
  }
}
