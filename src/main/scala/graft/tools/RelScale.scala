package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational-family scale probe: run every q-family query at sf0.1
  * (1×) and at a replicated ~sf1 corpus (10×), and report per-query
  * wall-time slopes. The dedup family has SCALE_SLOPE.md; this closes
  * the same evidence gap for the 40-query relational battery — a
  * superlinear q-row would expose a hidden sort/shuffle/blowup that
  * sf0.1 alone cannot see.
  *
  * The 10× corpus replicates each SCALING table (TPC-H's own contract:
  * customer/supplier/part/orders/lineitem/events grow with SF;
  * region/nation are fixed dims) with per-copy KEY OFFSETS on every
  * join key, so per-key join fan-out, group cardinality per key, and
  * date/predicate selectivity are all preserved — replicating without
  * offsetting keys would multiply per-key fan-out 10× and measure a
  * workload change, not the engine (the SCALE_SLOPE.md lesson).
  * Offsets are applied consistently on both sides of every FK
  * (o_custkey↔c_custkey, l_orderkey↔o_orderkey, l_partkey↔p_partkey,
  * l_suppkey↔s_suppkey), so referential integrity holds per copy.
  * documents/embeddings are copied unreplicated (the q-family does not
  * scan them; the dedup/sim probes own those).
  */
object RelScale {

  /** > max key at any replicated scale of sf0.1 (max l_orderkey at
    * sf0.1 is 6e5; sf1-via-10-copies stays < 1e8 per copy slot). */
  private val Off = 100000000L

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = sys.env.getOrElse("RS_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("RS_COPIES", "10").toInt
    val out = sys.env.getOrElse("RS_OUT", s"/tmp/graft_relscale_${copies}x")

    if (!new java.io.File(s"$out/_READY").exists()) {
      build(spark, src, out, copies)
      new java.io.File(s"$out/_READY").createNewFile()
    }

    val qs = graft.SparkEntry.queries.keys.filter(_.matches("q\\d+_.*"))
      .toSeq.sorted
    def timeAt(dir: String, name: String): Double = {
      // min of 2: first pass pays JIT/codegen; bench discipline
      val ts = (1 to 2).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }
    val rows = qs.map { q =>
      val t1 = timeAt(src, q)
      val tN = timeAt(out, q)
      println(f"""{"op":"$q","sec_1x":$t1%.2f,"sec_${copies}x":$tN%.2f,"slope":${tN / t1}%.2f}""")
      (q, t1, tN)
    }
    val tot1 = rows.map(_._2).sum; val totN = rows.map(_._3).sum
    val worst = rows.sortBy(-_._3).take(3)
      .map(r => f""""${r._1}":${r._3 / r._2}%.2f""").mkString(",")
    println(f"""{"op":"TOTAL","sec_1x":$tot1%.2f,"sec_${copies}x":$totN%.2f,"slope":${totN / tot1}%.2f,"worst_abs_slopes":{$worst},"queries":${rows.size}}""")
    spark.stop()
  }

  private def build(spark: SparkSession, src: String, out: String,
      copies: Int): Unit = {
    def tbl(n: String) = spark.read.parquet(s"$src/$n.parquet")
    /** Union `copies` copies, shifting every listed key column by a
      * disjoint per-copy offset; all other columns pass through. */
    def rep(n: String, keys: Seq[String]): Unit = {
      val base = tbl(n)
      (0 until copies).map { i =>
        keys.foldLeft(base)((df, k) =>
          df.withColumn(k, col(k) + lit(i * Off)))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
    def copyAsIs(n: String): Unit =
      tbl(n).write.mode("overwrite").parquet(s"$out/$n.parquet")
    rep("customer", Seq("c_custkey"))
    rep("supplier", Seq("s_suppkey"))
    rep("part", Seq("p_partkey"))
    rep("orders", Seq("o_orderkey", "o_custkey"))
    rep("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    // events.ts read as raw nanos LONG (nanosAsLong) and written back
    // as INT64 — Tables.events handles both encodings identically
    rep("events", Seq("event_id", "user_id"))
    Seq("region", "nation", "documents", "embeddings").foreach(copyAsIs)
  }
}
