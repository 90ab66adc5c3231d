package graft.tools
import org.apache.spark.sql.SparkSession

/** Interleaved within-JVM A/B of the codegen fast-hash-map capacity
  * (dev tool): runs a set of agg-heavy queries alternating the
  * session conf, so host weather hits both sides equally. */
object FastMapAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir",
        graft.core.TempDirs.scratchShared("spark-local"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("QT_DIR", "/root/testdata/sf0.1")
    val qs = graft.SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q44_cdc_follow", "dd05_components", "dd02_ngram_jaccard",
        "q05_topk_orders", "dd04_simhash")
    val key = "spark.sql.codegen.aggregate.fastHashMap.capacityBit"
    // warm both codegen variants once
    for (bit <- Seq("16", "10"); n <- names) {
      spark.conf.set(key, bit)
      try qs(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    val acc = scala.collection.mutable.Map[(String, String), List[Double]]()
    for (round <- 1 to 4; bit <- Seq("16", "10"); n <- names) {
      spark.conf.set(key, bit)
      graft.operators.Dedup.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      try qs(n)(spark, d).count() catch { case e: Throwable => println(e) }
      val sec = (System.nanoTime() - t0) / 1e9
      acc((n, bit)) = sec :: acc.getOrElse((n, bit), Nil)
    }
    for (n <- names) {
      val a = acc((n, "16")).min; val b = acc((n, "10")).min
      println(f"$n%-28s bit16=$a%6.2f bit10=$b%6.2f ratio=${b / a}%5.2f")
    }
    spark.stop()
  }
}
