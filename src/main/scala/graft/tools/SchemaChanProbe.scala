package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Read-PLANNING cost vs live-file count, manifest-carried schema vs
  * the legacy mergeSchema footer union (verdict r12 #2): builds one
  * TxnTable, compacts it to F files at several F, and times
  * `read().queryExecution.executedPlan` (plan only — no row read)
  * with the schema header present vs stripped. The footer union is a
  * distributed O(files) pass per READ; the schema channel is one
  * manifest line. Run: `runMain graft.tools.SchemaChanProbe`. */
object SchemaChanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (files <- Seq(16, 128, 512)) {
      val dir = graft.core.TempDirs.scratchShared(s"schprobe$files")
      graft.core.TxnTable.init(spark, dir,
        (0L until 200000L).map(k => (k, k * 3, s"v$k"))
          .toDF("k", "v", "tag"),
        numFiles = files, statsCols = Seq("k"))
      def planOnce(): Double = {
        val t0 = System.nanoTime()
        graft.core.TxnTable.read(spark, dir)
          .filter(col("k") < 10).queryExecution.executedPlan
        (System.nanoTime() - t0) / 1e9
      }
      // recorded-schema plan (warm + timed)
      planOnce()
      val withSchema = (1 to 3).map(_ => planOnce()).min
      // strip the header -> legacy footer-union path
      val m1 = new java.io.File(dir, "manifest-v1.json").toPath
      val stripped = new String(
        java.nio.file.Files.readAllBytes(m1), "UTF-8").split('\n')
        .filterNot(_.contains("\"schema\":")).mkString("\n")
      java.nio.file.Files.write(m1, stripped.getBytes("UTF-8"))
      graft.core.TxnTable.dropMetaCacheForTest(dir)
      planOnce()
      val legacy = (1 to 3).map(_ => planOnce()).min
      println(f"SCHPROBE files=$files%4d recordedSchema=$withSchema%6.3fs " +
        f"legacyFooterUnion=$legacy%6.3fs ratio=${legacy / withSchema}%5.1fx")
    }
    spark.stop()
  }
}
