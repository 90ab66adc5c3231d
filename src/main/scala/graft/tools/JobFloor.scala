package graft.tools
import org.apache.spark.sql.SparkSession

/** Per-job fixed-latency floor (dev tool): time N trivial actions of
  * each shape — plain range count (no exchange), one-exchange groupBy,
  * cached-read count — to separate scheduler/job overhead from AQE
  * stage overhead and task overhead. */
object JobFloor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir",
        graft.core.TempDirs.scratchShared("spark-local"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time(name: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e6 / n}%8.1f ms/op")
    }
    val cached = Seq.tabulate(1000)(i => (i.toLong, i.toString))
      .toDF("k", "v").cache()
    cached.count()
    time("rdd-job (sc.range 1 part)", 50)(
      { spark.sparkContext.range(0, 32, 1, 1).count(); () })
    time("rdd-job (32 parts)", 50)(
      { spark.sparkContext.range(0, 32, 1, 32).count(); () })
    time("df count, no exchange", 50)(
      { spark.range(32).count(); () })
    time("df groupBy count (1 exchange, AQE)", 50)(
      { spark.range(32).selectExpr("id % 4 k").groupBy("k").count().count(); () })
    time("df 2-exchange (groupBy+orderBy, AQE)", 50)(
      { spark.range(32).selectExpr("id % 4 k").groupBy("k").count()
          .orderBy("k").count(); () })
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("df groupBy count (1 exchange, no AQE)", 50)(
      { spark.range(32).selectExpr("id % 4 k").groupBy("k").count().count(); () })
    time("df 2-exchange (no AQE)", 50)(
      { spark.range(32).selectExpr("id % 4 k").groupBy("k").count()
          .orderBy("k").count(); () })
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    time("cached df count", 50)({ cached.count(); () })
    time("cached df groupBy (AQE)", 50)(
      { cached.groupBy("k").count().count(); () })
    time("localCheckpoint of tiny df", 30)(
      { val d = spark.range(32).toDF("id").localCheckpoint(); () })
    spark.stop()
  }
}
