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

  /** `i`-th Bloom bit position of `key` in [0, m). Unlike sk07 —
    * whose RAW bitset is oracle-checked and therefore pays the
    * engine-portable md5-prefix hash — the bitset here is internal
    * plan machinery (only the exact join's result is observable), so
    * the position hash is the native codegen'd xxhash64: measured
    * ~6× cheaper per probe row than the md5→substring→conv chain,
    * and the probe runs once per fact row, which is exactly where a
    * 100 TB scan spends its time. The lane index rides as an extra
    * hashed column, giving independent functions per lane. */
  private def pos(key: Column, i: Int, m: Int): Column =
    pmod(xxhash64(lit(i), key), lit(m.toLong))

  /** The bitset words (60 bits per word — the BIGINT sign bit is
    * never touched) of the distinct keys, built as a GROUPED
    * aggregate over (word, bit) rows: one shuffle of ≤ `words` rows,
    * one `bit_or` per group. (A one-row aggregate with a column per
    * word — sk07's shape at its fixed 4 words — explodes at real
    * sizes: 10⁴ aggregate expressions stall planning and codegen;
    * this was caught live when q46's first sf0.1 bench pass hung in
    * exactly that plan.) The collected array is O(m/8) bytes of
    * sketch metadata. */
  private[graft] def bloomWords(keys: DataFrame, keyCol: String,
      m: Int, hashes: Int): Array[Long] = {
    val words = (m + 59) / 60
    val posD = keys.select(explode(array(
      (0 until hashes).map(i => pos(col(keyCol), i, m)): _*)).as("p"))
    val rows = posD
      .groupBy(expr("cast(p div 60 as int)").as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(p % 60 as int)))").as("bits"))
      .collect()
    val arr = new Array[Long](words)
    rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Map-side membership test of `key` (hash lane `i`) against the
    * bitset LITERAL `bs` — the array literal is referenced INSIDE the
    * expression, never projected into a column: a `withColumn` array
    * would be copied into every row by the Project's unsafe
    * projection (measured: a 10⁴-word bitset column cost ~80 KB of
    * array copying PER ROW), while a Literal is one shared object in
    * the codegen stage. `call_function` carries the column-typed
    * shift distance the Scala `shiftright` wrapper cannot. */
  private def bitPass(key: Column, i: Int, m: Int, bs: Column): Column = {
    val p = pos(key, i, m)
    pmod(call_function("shiftright",
      call_function("element_at", bs, floor(p / lit(60)).cast("int") + lit(1)),
      pmod(p, lit(60)).cast("int")), lit(2)) === lit(1)
  }

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
    // carrier decision by a LIMIT probe (partial distinct, early
    // exit): one cheap job either yields the complete literal set or
    // proves the set oversized
    val probe = keys.select(col(keyCol).as("__sk")).distinct()
      .limit(maxLiterals + 1).collect()
    if (probe.length <= maxLiterals) {
      fact.filter(col(factKey).isin(probe.map(_.get(0)).toSeq: _*))
    } else {
      // materialize the distinct key frame ONCE (block-backed local
      // checkpoint, lineage truncated): the count, the bitset build,
      // and the exact join all reuse the same blocks instead of each
      // re-running the scan + distinct shuffle
      val keyF = keys.select(col(keyCol).as("__sk")).distinct()
        .localCheckpoint()
      val n = keyF.count()
      val hashes = 2
      val m = math.max(240L, n * bitsPerKey).min(60L * 200000).toInt
      // the bitset rides the plan as ONE array literal: O(m/8) bytes
      // of driver-held sketch metadata (the Skew.findHotKeys /
      // centroid discipline — never O(keys)), capped at ~1.5 MB.
      // A broadcast 1-row frame would be the no-collect alternative,
      // but Catalyst's PushDownLeftSemiAntiJoin pushes the exact
      // semi-join BELOW a bitset cross-join (the probe then filters
      // rows the join already processed — useless); a literal filter
      // sits under the join and fuses into the scan's codegen stage,
      // which is the entire point of the probe.
      val bs = typedlit(bloomWords(keyF, "__sk", m, hashes))
      fact
        .filter((0 until hashes)
          .map(i => bitPass(col(factKey), i, m, bs)).reduce(_ && _))
        // unhinted: AQE broadcasts a small key frame at runtime; a
        // 10^7-key frame correctly falls back to a shuffled semi-join
        // over the (bloom-pruned) survivors
        .join(keyF, col(factKey) === col("__sk"), "left_semi")
    }
  }

  /** ANTI-join complement of [[semiShip]]: keep the fact rows whose
    * key is NOT in the key set. The Bloom pays differently here — a
    * bitset MISS is a PROOF of non-membership (Bloom has no false
    * negatives), so every miss row is emitted directly without ever
    * touching the join; only the ~(selectivity + fpp) fraction that
    * passes the bitset needs the exact anti-join to separate true
    * members (dropped) from false positives (kept). For a selective
    * key set against a huge fact that routes almost the whole scan
    * around the join's shuffle. NULL keys follow SQL anti-join
    * semantics (kept): NULL hashes to some bit pattern; if it misses
    * it is correctly kept outright, if it passes, the left_anti's
    * null-safe non-match keeps it. Result is exactly the plain
    * left_anti either way (PlanShapeSpec pins it). */
  def antiShip(fact: DataFrame, factKey: String, keys: DataFrame,
      keyCol: String, maxLiterals: Int = 1000,
      bitsPerKey: Int = 8): DataFrame = {
    val probe = keys.select(col(keyCol).as("__sk")).distinct()
      .limit(maxLiterals + 1).collect()
    if (probe.length <= maxLiterals) {
      // literal NOT IN with SQL three-valued semantics: NULL keys kept
      fact.filter(col(factKey).isNull ||
        !col(factKey).isin(probe.map(_.get(0)).toSeq: _*))
    } else {
      val keyF = keys.select(col(keyCol).as("__sk")).distinct()
        .localCheckpoint()
      val n = keyF.count()
      val hashes = 2
      val m = math.max(240L, n * bitsPerKey).min(60L * 200000).toInt
      val bs = typedlit(bloomWords(keyF, "__sk", m, hashes))
      val pass = (0 until hashes)
        .map(i => bitPass(col(factKey), i, m, bs)).reduce(_ && _)
      // misses bypass the join outright; passes pay the exact anti.
      // NULL keys make the bit test NULL (three-valued), which a bare
      // filter pair would drop from BOTH branches — route them into
      // the miss branch explicitly (anti-join semantics: NULL is kept)
      val misses = fact.filter(col(factKey).isNull || !pass)
      val passes = fact.filter(col(factKey).isNotNull && pass)
        .join(keyF, col(factKey) === col("__sk"), "left_anti")
      misses.unionByName(passes)
    }
  }
}
