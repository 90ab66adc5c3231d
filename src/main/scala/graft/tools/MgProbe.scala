package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-probe: per-op cost of the Misra-Gries buffer, mutable
  * open-addressing arrays (shipped, `Udafs.misraGries`) vs the
  * immutable-Map formulation it replaced (re-created inline here as
  * the baseline). Feeds the REAL sk08 token stream (documents at
  * $SPARK_GRAFT_SF_DIR, default sf0.1) through both reduce paths
  * driver-side, k=256 — isolating summary maintenance from Spark
  * plumbing. Result line recorded in BENCH_NOTES.md.
  */
object MgProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val toks = graft.core.Tables.documents(spark, sfDir)
      .select(explode(expr("split(trim(text), '\\\\s+')")).as("t"))
      .collect().map(_.getString(0))
    val k = 256

    // baseline: the pre-round-10 immutable-Map reduce (verbatim shape)
    def immutableRun(): (Long, Int) = {
      var b = Map.empty[String, Long]
      val t0 = System.nanoTime()
      toks.foreach { t =>
        b = b.get(t) match {
          case Some(c) => b.updated(t, c + 1)
          case None if b.size < k => b.updated(t, 1L)
          case None =>
            b.flatMap { case (s, c) =>
              if (c > 1) Some(s -> (c - 1)) else None }
        }
      }
      (System.nanoTime() - t0, b.size)
    }

    def mutableRun(): (Long, Int) = {
      val agg = graft.functions.Udafs.misraGries(k)
      var b = agg.zero
      val t0 = System.nanoTime()
      toks.foreach(t => b = agg.reduce(b, t))
      (System.nanoTime() - t0, agg.finish(b).size)
    }

    // warmup + min-of-3, interleaved so JIT/GC weather hits both
    immutableRun(); mutableRun()
    val (immNs, immSize) =
      (1 to 3).map(_ => immutableRun()).minBy(_._1)
    val (mutNs, mutSize) =
      (1 to 3).map(_ => mutableRun()).minBy(_._1)
    val n = toks.length
    println(f"""{"probe":"misra_gries_buffer","tokens":$n,"k":$k,""" +
      f""""immutable_ns_per_op":${immNs.toDouble / n}%.1f,""" +
      f""""mutable_ns_per_op":${mutNs.toDouble / n}%.1f,""" +
      f""""speedup":${immNs.toDouble / mutNs}%.2f,""" +
      f""""sizes":[$immSize,$mutSize]}""")
    spark.stop()
  }
}
