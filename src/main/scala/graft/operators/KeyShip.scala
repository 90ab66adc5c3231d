package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-set shipping: the planner decision behind every "filter this
  * huge fact by that key list" step — the reference's MultiEngineQuery
  * IN-list ship (QueryPipeline.scala:921-932), generalized to key
  * sets of any size.
  *
  * A key list is REQUEST METADATA while it is small: shipping it as
  * an `isin` literal reaches the parquet scan as a pushed `In` filter
  * — the cheapest possible carrier. But the literal carrier has a
  * cliff: a 10⁶-key list is a 10⁶-node expression tree on the driver
  * (the same cliff TxnTable's mutations had, closed in round 10 by
  * the frame carrier). Past the threshold the right plan is the one
  * Spark's own `InjectRuntimeFilter` builds for selective joins:
  *  1. aggregate the key frame into an m-bit BLOOM BITSET (sk07's
  *     md5-derived deterministic replica — O(m) bytes of metadata);
  *  2. ship the bitset into the fact side as one array literal and
  *     test every row MAP-SIDE, inside the scan's whole-stage-codegen
  *     stage, before any shuffle — the probe prunes ~(1 − fpp) of
  *     non-matching rows at scan cost;
  *  3. run the exact semi-join on the survivors (false positives are
  *     eliminated here, so the result is exactly the semi-join — the
  *     bitset only cuts the rows that pay the join's shuffle).
  * [[semiShip]] makes the size-based choice; PlanShapeSpec pins both
  * plan shapes and the equality of their results.
  */
object KeyShip {

  /** `i`-th deterministic Bloom bit position of `key` in [0, m): the
    * sk07/pp01/dd11 md5-prefix discipline (engine-portable, no JVM
    * hash dependence). */
  private def pos(key: Column, i: Int, m: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$i:"), key.cast("string"))),
      1, 15), 16, 10).cast("bigint"), lit(m))

  /** One-row bitset frame (`w0..w{words-1}`, 60 bits per word — the
    * BIGINT sign bit is never touched) of the distinct keys. */
  private[graft] def bloomBitset(keys: DataFrame, keyCol: String,
      m: Int, hashes: Int): DataFrame = {
    val words = (m + 59) / 60
    val posD = keys.select(explode(array(
      (0 until hashes).map(i => pos(col(keyCol), i, m)): _*)).as("p"))
    val wordCols = (0 until words).map(w => expr(
      s"bit_or(CASE WHEN p div 60 = $w THEN " +
        s"shiftleft(1L, cast(p % 60 as int)) ELSE 0L END)").as(s"__w$w"))
    posD.agg(wordCols.head, wordCols.tail: _*)
  }

  /** Map-side membership test of the position column `pCol` against
    * the bitset array column `__bs` — pure column arithmetic,
    * codegen-friendly. */
  private def bitPass(pCol: String): Column =
    expr(s"shiftright(element_at(__bs, cast($pCol div 60 as int) + 1), " +
      s"cast($pCol % 60 as int)) % 2 = 1")

  /** Semi-join `fact` to the distinct keys of `keys(keyCol)` on
    * `fact(factKey)`, choosing the carrier by key count:
    * `<= maxLiterals` ships literals (pushed `In` at the scan);
    * above it, a broadcast Bloom bitset probe fused into the fact
    * scan pre-filters map-side, then the exact semi-join removes the
    * false positives. Result is the exact semi-join either way.
    * `bitsPerKey = 8` ⇒ fpp ≈ 2% at `hashes = 2`. */
  def semiShip(fact: DataFrame, factKey: String, keys: DataFrame,
      keyCol: String, maxLiterals: Int = 1000,
      bitsPerKey: Int = 8): DataFrame = {
    val keyF = keys.select(col(keyCol).as("__sk")).distinct()
    val n = keyF.count() // the decision input: one metadata aggregate
    if (n <= maxLiterals) {
      val lits = keyF.collect().map(_.get(0))
      fact.filter(col(factKey).isin(lits.toSeq: _*))
    } else {
      val hashes = 2
      val m = math.max(240L, n * bitsPerKey).min(60L * 200000).toInt
      val words = (m + 59) / 60
      // the bitset rides the plan as ONE array literal: O(m/8) bytes
      // of driver-held sketch metadata (the Skew.findHotKeys /
      // centroid discipline — never O(keys)), capped at ~1.5 MB.
      // A broadcast 1-row frame would be the no-collect alternative,
      // but Catalyst's PushDownLeftSemiAntiJoin pushes the exact
      // semi-join BELOW a bitset cross-join (the probe then filters
      // rows the join already processed — useless); a literal filter
      // sits under the join and fuses into the scan's codegen stage,
      // which is the entire point of the probe.
      val row = bloomBitset(keyF, "__sk", m, hashes).first()
      val wordVals = (0 until words).map(w =>
        if (row.isNullAt(w)) 0L else row.getLong(w)).toArray
      val probed = (0 until hashes).foldLeft(
        fact.withColumn("__bs", typedlit(wordVals))) { (d, i) =>
        d.withColumn(s"__p$i", pos(col(factKey), i, m))
      }
      (0 until hashes).map(i => bitPass(s"__p$i"))
        .foldLeft(probed)((d, c) => d.filter(c))
        .drop("__bs" +: (0 until hashes).map(i => s"__p$i"): _*)
        // unhinted: AQE broadcasts a small key frame at runtime; a
        // 10^7-key frame correctly falls back to a shuffled semi-join
        // over the (bloom-pruned) survivors
        .join(keyF, col(factKey) === col("__sk"), "left_semi")
    }
  }
}
