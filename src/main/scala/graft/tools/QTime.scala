package graft.tools
import org.apache.spark.sql.SparkSession
object QTime {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir",
        graft.core.TempDirs.scratchShared("spark-local"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("QT_DIR", "/root/testdata/sf0.1")
    val qs = graft.SparkEntry.queries
    for (name <- args) {
      // cold per query, like Bench's timed passes: drop memoized
      // intermediates so repeated names measure a fresh run
      graft.operators.Dedup.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = qs(name)(spark, d).count()
      println(s"QT $name rows=$n sec=${(System.nanoTime()-t0)/1e9} ccRounds=${graft.operators.Dedup.lastCcRounds}")
    }
    spark.stop()
  }
}
