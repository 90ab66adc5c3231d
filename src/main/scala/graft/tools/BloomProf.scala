package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate the Bloom ship's cost components at 50M fact rows. */
object BloomProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.KeyShip
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"BPROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val nKeys = 2000000L
    val keys = spark.range(nKeys).select(col("id").as("o_orderkey"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      // tiny fact at full m: plan-side overhead shows up here
      val tiny = spark.range(1000).select(col("id").as("k"))
      t("tiny_fact_bloom")(
        KeyShip.semiShip(tiny, "k", keys, "o_orderkey",
          maxLiterals = 100).count())
      val fact = spark.range(50000000L).select(
        (when(pmod(col("id"), lit(100)) === 0,
          pmod(xxhash64(col("id")), lit(nKeys)))
          .otherwise(pmod(xxhash64(col("id")), lit(1000000L))
            + lit(10000000L))).as("k"), col("id").as("v"))
      t("plain_shuffle_semi")(
        fact.join(keys, col("k") === col("o_orderkey"), "left_semi")
          .count())
      t("bloom_full")(
        KeyShip.semiShip(fact, "k", keys, "o_orderkey",
          maxLiterals = 100).count())
      // filter-only: no join after the probe
      val m = 12000000
      val words = t("bloom_build")(
        KeyShip.bloomWords(keys.select(col("o_orderkey").as("__sk")),
          "__sk", m, 2))
      println(s"  setBits=${words.map(java.lang.Long.bitCount).sum}")
    }
    spark.stop()
  }
}
