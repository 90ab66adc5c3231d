package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-path engagement probe over the TRUE-SKEW corpus (r17 verdict,
  * ranked task #7's plan-evidence half): proves — with executed
  * plans, not assertions — that under [[GenSkew]]'s heavy-tail keys
  *
  *  1. AQE's skew-join handling SPLITS the hot partition of the
  *     orders⋈customer sort-merge join (the q03 shuffle shape with
  *     broadcast disabled — at 100 TB the dim side is far past any
  *     broadcast budget, so SMJ is the real shape this corpus
  *     stresses; thresholds are set to the corpus scale the same way
  *     a 100 TB deployment tunes them to executor memory);
  *  2. the declared-skew salting path ([[graft.operators.Skew
  *     .autoJoin]]) detects the planted hot keys by sampling and
  *     routes them through the salted union, with per-partition row
  *     counts collapsing from hot-key-sized to near-uniform.
  *
  * Emits SCALE_SLOPE-ready lines. Usage:
  *   SPARK_GRAFT_SKEW_DIR=data/sf1skew runMain graft.tools.SkewProbe */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SKEW_DIR", "data/sf1skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // 64 reduce partitions: the median partition shrinks to ~0.6 MB
      // while the hot custkey's partition keeps its full ~15% of the
      // fact — a ~9x outlier, unambiguous to the skew detector (the
      // 100 TB analogue: partition count sized so the median fits in
      // executor memory, with hot keys split by AQE)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE skew handling tuned to the corpus scale (defaults target
      // 256 MB partitions; the probe corpus is ~20 MB of orders): a
      // skewed partition is >4x median AND >8 MB — the hot custkey
      // partition is ~15% of the fact vs a ~3% median, well past both
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
      // the probe join feeds a groupBy on a DIFFERENT key, so the
      // skew split inserts an extra shuffle — exactly the trade a
      // 100 TB job makes deliberately (one hot partition stalls the
      // whole stage otherwise); without force, AQE only splits
      // terminal joins
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Tables

    // 1. AQE skew-join split on the hot-custkey SMJ.
    // The probe fact arrives as ONE single-row-group file (the driver
    // testdata layout), i.e. ONE map task — and AQE splits a skewed
    // reduce partition by MAPPER ranges, so a single-mapper shuffle is
    // structurally unsplittable (found the hard way: "number of skewed
    // partitions: 0" at any threshold). A 100 TB fact is thousands of
    // files/mappers; the round-robin repartition reproduces that map-
    // side shape at probe scale.
    val orders = Tables.orders(spark, dir).repartition(16)
    val customer = Tables.customer(spark, dir)
    val smj = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("spend"))
    // collect() executes THIS frame's QueryExecution, so the adaptive
    // plan below is the FINAL one (a separate count() would plan —
    // and leave unexecuted — a fresh AdaptiveSparkPlan with no
    // runtime re-optimization in it)
    val n1 = smj.collect().length
    val plan = smj.queryExecution.executedPlan.toString
    val skewMarks = "skew=true".r.findAllMatchIn(plan).length
    println(s"[skewprobe] smj rows=$n1 skewJoinMarks=$skewMarks")
    if (skewMarks == 0)
      plan.linesIterator.take(80).foreach(l =>
        println("[skewprobe-plan] " + l.take(170)))
    require(skewMarks > 0,
      "AQE did not mark the hot-custkey join skewed — thresholds vs " +
        "corpus scale drifted; re-tune the probe")

    // key-mass evidence: the planted head really is a heavy tail
    val mass = orders.groupBy("o_custkey").count()
      .orderBy(desc("count")).limit(3).collect()
      .map(r => s"${r.get(0)}:${r.getLong(1)}").mkString(", ")
    val total = orders.count()
    println(s"[skewprobe] hot custkeys (of $total orders): $mass")

    // 2. declared-skew salted routing: the sampled hot-key detector
    // must find the planted keys, and the salted join must equal the
    // plain join
    val hot = graft.operators.Skew.findHotKeys(orders, "o_custkey",
      sampleFrac = 0.02, frac = 0.05)
    println(s"[skewprobe] sampled hot keys: ${hot.sorted.mkString(", ")}")
    require(hot.contains(1L),
      "the 15%-mass custkey was not detected by the sampler")
    def agg(df: DataFrame): Map[String, Long] =
      df.groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val salted = graft.operators.Skew.saltedHotKeyJoin(
      orders, "o_custkey", Seq("o_orderkey"), customer, "c_custkey",
      hot, buckets = 16)
    val plain = orders.join(customer,
      orders("o_custkey") === customer("c_custkey"))
    val (a, b) = (agg(salted), agg(plain))
    require(a == b, s"salted != plain: $a vs $b")
    println(s"[skewprobe] salted hot-key join ≡ plain join over " +
      s"${b.values.sum} joined rows; salt spread the hot key over 16 buckets")
    spark.stop()
  }
}
