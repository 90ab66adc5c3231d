package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-battery sf0.1 → ~sf1 slope (verdict-r10 #7): RelScale covers
  * the relational family at ~sf1, but the dedup/sim/streaming families
  * had isolated slopes only — this harness runs EVERY battery query at
  * both scales and prints the ratio, hunting quadratic tails the
  * per-family probes missed.
  *
  * The ~sf1 corpus is a 10× replication of the driver's sf0.1 tables
  * with per-replica key offsets (join keys shifted consistently, so
  * fact⋈fact joins keep their selectivity; dims stay single-copy —
  * scaling facts against fixed dims is the regime that exposes
  * fact-side blowups). Document text gets a per-replica suffix so the
  * near-dup operators see 10× corpora with CROSS-REPLICA near-dups —
  * harder than disjoint replicas, closer to a real crawl. A 240 s
  * per-query watchdog cancels runaways (job-group cancel) and records
  * TIMEOUT instead of hanging the harness. */
object SfSlope {
  private val K = 10
  private val Off = 100000000L

  private def build(s: SparkSession, src: String, dst: String): Unit = {
    def reps(f: Int => DataFrame): DataFrame =
      (0 until K).map(f).reduce(_ unionByName _)
    // the driver's layout is ONE FILE per table named <t>.parquet —
    // and the streaming queries depend on it (pathGlobFilter
    // "events.parquet" matches leaf FILES; a directory of part files
    // yields an empty stream, caught when st04/07/09 read 0 rows at
    // sf1) — so write a single part and move it into place
    def write(name: String, df: DataFrame): Unit = {
      val tmp = s"$dst/.build-$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = new java.io.File(s"$dst/$name.parquet")
      graft.core.TempDirs.rmTree(target) // may be a dir from an old build
      java.nio.file.Files.move(part.toPath, target.toPath)
      graft.core.TempDirs.rmTree(new java.io.File(tmp))
      println(s"SFBUILD $name rows=${s.read.parquet(target.getPath).count()}")
    }
    val li = s.read.parquet(s"$src/lineitem.parquet")
    write("lineitem", reps(i => li.withColumn("l_orderkey",
      col("l_orderkey") + lit(i * Off))))
    val or = s.read.parquet(s"$src/orders.parquet")
    write("orders", reps(i => or.withColumn("o_orderkey",
      col("o_orderkey") + lit(i * Off))))
    for (t <- Seq("customer", "supplier", "part", "nation", "region"))
      write(t, s.read.parquet(s"$src/$t.parquet"))
    val ev = graft.core.Tables.events(s, src) // normalized µs ts
    write("events", reps(i => ev
      .withColumn("event_id", col("event_id") + lit(i * Off))
      .withColumn("user_id", col("user_id") + lit(i * Off))))
    val doc = s.read.parquet(s"$src/documents.parquet")
    write("documents", reps(i => doc
      .withColumn("doc_id", col("doc_id") + lit(i * Off))
      .withColumn("text", concat(col("text"), lit(s" r$i")))))
    val em = s.read.parquet(s"$src/embeddings.parquet")
    write("embeddings", reps(i => em.withColumn("vec_id",
      col("vec_id") + lit(i * Off))))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val dst = sys.env.getOrElse("SFSLOPE_DIR", "/tmp/graft-sf1")
    if (!new java.io.File(s"$dst/lineitem.parquet").exists())
      build(spark, src, dst)
    val only = args.toSet
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only.contains(q._1))
    // warm codegen on the tiny corpus first, as Bench does
    qs.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    def timed(name: String, fn: (SparkSession, String) => DataFrame,
        dir: String, timeoutSec: Int): Double = {
      graft.operators.Dedup.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
      val group = s"sfslope-$name-${dir.hashCode}"
      val t0 = System.nanoTime()
      val fut = java.util.concurrent.CompletableFuture.supplyAsync { () =>
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
        try { fn(spark, dir).count(); (System.nanoTime() - t0) / 1e9 }
        finally spark.sparkContext.clearJobGroup()
      }
      try fut.get(timeoutSec.toLong, java.util.concurrent.TimeUnit.SECONDS)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(group)
          -1.0 // TIMEOUT sentinel
        case _: Throwable => -2.0 // ERROR sentinel
      }
    }
    qs.foreach { case (name, fn) =>
      val t01 = timed(name, fn, src, 240)
      val t1 = timed(name, fn, dst, 240)
      val ratio = if (t01 > 0 && t1 > 0) f"${t1 / t01}%.1f" else "n/a"
      println(f"SLOPE $name sf01=$t01%.2f sf1=$t1%.2f ratio=$ratio")
    }
    spark.stop()
  }
}
