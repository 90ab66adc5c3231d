package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Automated 100 TB plan-hygiene gate over the ENTIRE query surface:
  * every SparkEntry query's physical plan is scanned for shapes that
  * do not survive scale —
  *
  *  - `CartesianProduct`: an un-broadcast all-pairs join; always a
  *    design bug at corpus scale (broadcast nested loops over a tiny
  *    side are fine and common for `qid =!= nid` pair generation).
  *  - `Exchange SinglePartition`: every row through one task. Legal
  *    only when the input is provably bounded (a page of rows after a
  *    TakeOrdered/limit, a grand-total of one group) — each such query
  *    is whitelisted here WITH its justification, so a new
  *    single-partition funnel cannot creep in silently.
  *
  * Streaming queries are excluded (building them executes stateful
  * runs with checkpoints; their shapes are pinned by StreamingSpec and
  * the st* oracles instead).
  */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  /** Queries allowed to plan an Exchange SinglePartition, each with
    * the boundedness argument. */
  private val singlePartitionOk: Map[String, String] = Map(
    "q05_topk_orders" -> "global TakeOrdered merge of per-partition top-k",
    "q07_paginate_totalrows" -> "page window runs AFTER TakeOrdered(page)",
    "q16_total_metrics" -> "grand total: one output row",
    "q19_paginate_offset" -> "offset+limit page: bounded by page size",
    "cur02_totalmetrics" -> "grand total: one output row",
    "cur03_rowcount" -> "count(*): one output row",
    "tx03_token_topk" -> "global top-20 merge of per-partition top-k",
    "tx11_bpe_merge_rank" -> "rank window over the 8 rows a TakeOrdered kept",
    "sp10_priority_sample" -> "rank window over the 100 rows a TakeOrdered kept",
    "q31_grouping_rollup" -> "grand-total grouping set: one row per set",
    "q38_cube_grouping" -> "grand-total grouping set: one row per set",
    "q40_grouping_sets" -> "grand-total grouping set: one row per set",
    "q32_window_analytics" -> ("running/moving frames over the DAILY " +
      "rollup: input is one row per day — bounded by the calendar, " +
      "not the corpus"),
    "ev05_rolling_dau" -> "calendar min/max: one-row aggregate",
    "cur05_parallel_merge" -> ("merge of per-curator outputs: each is " +
      "a paged/total result, rows bounded by curator page sizes"),
    "sk07_bloom_filter" -> ("the m-bit filter aggregates to ONE row " +
      "(the bitset) before broadcast — that single row is the point"),
    "sp04_mixture_weights" -> "corpus total over ≤ |sources| rows",
    "sp07_temperature_mix" -> "normalizer over ≤ |languages| rows",
    "sp11_padding_manifest" -> "global max over ≤ |buckets| rows",
  )

  /** Queries allowed a BroadcastNestedLoopJoin, each with the
    * boundedness argument (a BNLJ is only sane when one side is a
    * broadcast HANDFUL of rows — a 1-row total, a query batch, a
    * codebook — so the "loop" is a constant factor on the scan, never
    * an all-pairs blowup). */
  private val bnljOk: Map[String, String] = Map(
    "q07_paginate_totalrows" -> "crossJoin of the ONE-row grand count",
    "cur05_parallel_merge" -> "crossJoin of 1-row curator totals",
    "sk07_bloom_filter" -> "crossJoin of the 1-row bitset + 1-row count",
    "sp04_mixture_weights" -> "crossJoin of the 1-row corpus total",
    "sp07_temperature_mix" -> "crossJoin of the 1-row normalizer",
    "sp11_padding_manifest" -> "crossJoin of the 1-row global max",
    "sim01_cosine_topk" -> ("brute-force baseline BY DESIGN: the " +
      "broadcast query batch (a handful of rows) loops over the " +
      "corpus scan once — the bucketed sim variants are the scale path"),
    "sim07_int8_topk" -> "broadcast query batch × corpus, as sim01",
    "sim08_pq_adc" -> ("broadcast query batch builds its ≤256-entry " +
      "LUT, then loops the code scan once"),
    "sim10_mrl_rerank" -> "broadcast query batch × prefix scan, as sim01",
  )

  private def audit(name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
    val plan = fn(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"$name plans a CartesianProduct:\n${plan.take(4000)}")
    if (!singlePartitionOk.contains(name))
      assert(!plan.contains("Exchange SinglePartition"),
        s"$name funnels through Exchange SinglePartition without a " +
          s"whitelist justification:\n${plan.take(4000)}")
    if (!bnljOk.contains(name))
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans a BroadcastNestedLoopJoin without a whitelist " +
          s"justification:\n${plan.take(4000)}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1)
    // st* (two-digit ids included) execute stateful streaming runs at
    // plan-build time; their shapes are pinned by StreamingSpec + the
    // st oracles instead
    .filterNot { case (name, _) => name.startsWith("st") }
    .foreach { case (name, fn) =>
      test(s"plan audit: $name") { audit(name, fn) }
    }
}
