package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Locate the MEASURED bloom-ship crossover against the PREDICTED
  * decline boundary (KeyShip.bloomDecision), at two fact scales —
  * the verdict-r10 #5 A/B. For each (F, n): time the plain shuffle
  * semi-join vs the bloom carrier (forced, even in the decline
  * regime, so the decline's correctness is itself measured), print
  * the decision the sizing function would take. The decline is right
  * iff forced-bloom stops beating plain at ~the predicted n. */
object BloomCross {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import graft.operators.KeyShip
    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    val cases = Seq(
      5000000L -> Seq(100000L, 1000000L, 2500000L, 5000000L, 10000000L),
      50000000L -> Seq(1000000L, 2000000L, 5000000L, 8000000L,
        10000000L, 30000000L, 60000000L))
    for ((bigF, ns) <- cases; n <- ns; pass <- 1 to 2) {
      // 1% of fact rows hit the key set; the rest live far outside it
      val fact = spark.range(bigF).select(
        (when(pmod(col("id"), lit(100)) === 0,
          pmod(xxhash64(col("id")), lit(n)))
          .otherwise(pmod(xxhash64(col("id")), lit(1000000L))
            + lit(500000000L))).as("k"))
      val keys = spark.range(n).select(col("id").as("sk"))
      val decision = KeyShip.bloomDecision(n, 8, Some(bigF))
      val (tPlain, rPlain) = time(
        fact.join(keys, col("k") === col("sk"), "left_semi").count())
      // forced bloom: replicate semiShip's oversized path at the
      // decision's sizing (or the cap when it declined)
      val p = decision.getOrElse(
        KeyShip.BloomPlan(math.max(240L, n * 8).min(60L * 1600000), 2, -1))
      val (tBloom, rBloom) = time {
        val words = KeyShip.bloomWords(
          keys.select(col("sk").as("__sk")), "__sk", p.m, p.hashes)
        fact.filter(graft.functions.BloomProbe.mightContain(
            col("k"), words, p.m, p.hashes))
          .join(keys, col("k") === col("sk"), "left_semi").count()
      }
      require(rPlain == rBloom, s"result mismatch: $rPlain vs $rBloom")
      val verdict = decision.map(d => f"SHIP(fpp=${d.fpp}%.3f)")
        .getOrElse("DECLINE")
      println(f"XOVER F=$bigF%d n=$n%d pass=$pass plain=$tPlain%.2f " +
        f"bloom=$tBloom%.2f speedup=${tPlain / tBloom}%.2fx pred=$verdict")
    }
    spark.stop()
  }
}
