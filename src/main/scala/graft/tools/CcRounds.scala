package graft.tools
import org.apache.spark.sql.SparkSession
object CcRounds {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.ddComponents(spark, d).count()
      println(s"CC $d rows=$n rounds=${graft.operators.Dedup.lastCcRounds} sec=${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
