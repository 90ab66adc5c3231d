package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: uniform vs equi-depth (rank) Z-order buckets on a SKEWED
  * clustering column, at growing scale. Fixture: 95% of rows in
  * [0, 1000) of a [0, 1e9) domain on `a` (the heavy-tail shape of
  * user/doc activity keys), `b` uniform. Measures, per layout, the
  * footer-stat file count a 20%-of-dense-mass box predicate must
  * read, plus the write cost. Emits one JSON line per (rows, layout).
  */
object ZRankProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("zrank").toString
    sys.addShutdownHook(
      graft.core.TempDirs.rmTree(new java.io.File(root)))
    for (n <- Seq(2000000L, 20000000L)) {
      val base = spark.range(n).toDF("id")
        .withColumn("a",
          when(pmod(hash(col("id")), lit(100)) < 95,
            abs(pmod(hash(col("id") + 1), lit(1000))).cast("long"))
            .otherwise(abs(pmod(hash(col("id") + 2),
              lit(1000000000))).cast("long")))
        .withColumn("b", abs(pmod(hash(col("id") + 3), lit(65536)))
          .cast("long"))
      val files = 64
      for ((name, ranked) <- Seq(("uniform", false), ("ranked", true))) {
        val path = s"$root/$name-$n"
        val t0 = System.nanoTime()
        graft.core.Layout.writeZOrdered(base, path, Seq("a", "b"),
          numFiles = files, ranked = ranked)
        val wSec = (System.nanoTime() - t0) / 1e9
        val dense = graft.core.Layout.filesIntersecting(
          spark, path, "a", 100, 299) // 20% of the dense mass
        val off = graft.core.Layout.filesIntersecting(
          spark, path, "b", 0, 6553) // 10% box on the uniform lane
        println(f"""{"probe":"zrank","rows":$n,"layout":"$name",""" +
          f""""files":$files,"dense_box_files":$dense,""" +
          f""""offaxis_box_files":$off,"write_sec":$wSec%.1f}""")
      }
    }
    spark.stop()
  }
}
