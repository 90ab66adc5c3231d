package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of q46's components at sf0.1. */
object Q46Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val bigOrders = graft.core.Tables.orders(spark, d)
        .filter(col("o_totalprice") > 150000).select("o_orderkey")
      val probe = t("probe")(
        bigOrders.select(col("o_orderkey").as("__sk")).distinct()
          .limit(101).collect())
      val keyF = t("checkpoint")(
        bigOrders.select(col("o_orderkey").as("__sk")).distinct()
          .localCheckpoint())
      val n = t("count")(keyF.count())
      println(s"  n=$n probe=${probe.length}")
      val m = math.max(240L, n * 8).min(60L * 200000).toInt
      val words = t("bloom")(
        graft.operators.KeyShip.bloomWords(keyF, "__sk", m, 2))
      println(s"  m=$m words=${words.length}")
      val out = t("mainquery") {
        graft.operators.KeyShip.semiShip(
          graft.core.Tables.lineitem(spark, d), "l_orderkey",
          bigOrders, "o_orderkey", maxLiterals = 100)
          .groupBy("l_returnflag").agg(count(lit(1))).count()
      }
      // xxhash64 probe (shipped): one lane over the whole fact
      t("probe_filter_xxhash") {
        val bs = typedlit(words)
        val fact = graft.core.Tables.lineitem(spark, d)
        val p = pmod(xxhash64(lit(0), col("l_orderkey")), lit(m.toLong))
        fact.filter(
          pmod(call_function("shiftright",
            call_function("element_at", bs,
              floor(p / lit(60)).cast("int") + lit(1)),
            pmod(p, lit(60)).cast("int")), lit(2)) === lit(1)).count()
      }
      // the md5-prefix hash it replaced (sk07's oracle-checkable
      // form), for the recorded per-row cost comparison
      t("probe_filter_md5") {
        val bs = typedlit(words)
        val fact = graft.core.Tables.lineitem(spark, d)
        fact.filter(
          pmod(call_function("shiftright",
            call_function("element_at", bs,
              floor(pmod(conv(substring(md5(concat(lit("0:"),
                col("l_orderkey").cast("string"))), 1, 15), 16, 10)
                .cast("bigint"), lit(m)) / lit(60)).cast("int") + lit(1)),
            pmod(pmod(conv(substring(md5(concat(lit("0:"),
              col("l_orderkey").cast("string"))), 1, 15), 16, 10)
              .cast("bigint"), lit(m)), lit(60)).cast("int")), lit(2))
            === lit(1)).count()
      }
      t("plain_semi") {
        graft.core.Tables.lineitem(spark, d)
          .join(bigOrders, col("l_orderkey") === col("o_orderkey"),
            "left_semi")
          .groupBy("l_returnflag").agg(count(lit(1))).count()
      }
    }
    spark.stop()
  }
}
