package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke-runs SparkEntry.entry the way the driver does (rows > 0). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"entry rows=$n ${if (n > 0) "SMOKE_OK" else "SMOKE_EMPTY"}")
    spark.stop()
  }
}
