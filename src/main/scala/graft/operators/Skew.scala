package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (prompt/SURVEY scale checklist:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join split handles most cases at runtime; explicit
  * salting remains the tool when a single join key dominates so heavily
  * that even split partitions bottleneck, or when AQE is unavailable
  * (e.g. inside a cached subtree). The big side gets a deterministic
  * per-row salt derived from a hash over salt-source columns (so the
  * same row always lands in the same bucket — no rand(), which would
  * break retries/speculation); the small side is replicated once per
  * bucket. The join key's rows spread across `buckets` reducers.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** The deterministic per-row salt expression (exposed for tests). */
  private[graft] def saltExpr(saltSource: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(saltSource: _*), lit(buckets.toLong))

  /** Join types where replicating the small side `buckets`× cannot
    * duplicate output rows (unmatched small-side replicas only survive
    * right/full outer joins). */
  private val safeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  /** Equi-join `big ⋈ small` on bigKey = smallKey with the big side's
    * hot keys spread over `buckets` partitions. `saltSource` columns of
    * the big side feed the per-row salt hash (pick columns that vary
    * within a key, e.g. the row's other ids). `small` is replicated
    * `buckets`×, so only big-side-preserving join types are allowed —
    * right/full outer would emit each unmatched small row once per
    * replica. */
  def saltedEquiJoin(big: DataFrame, bigKey: String, saltSource: Seq[String],
      small: DataFrame, smallKey: String, buckets: Int,
      joinType: String = "inner"): DataFrame =
    saltedEquiJoin(big, big.col(bigKey), saltSource.map(big.col), small,
      smallKey, buckets, joinType)

  /** Column-resolved variant: `bigKey`/`saltSource` arrive as ALREADY
    * RESOLVED columns (e.g. `parentDf.col(fk)` threaded through an
    * accumulated multi-join frame). Bare-name resolution on a frame
    * built by earlier joins is ambiguous the moment two inputs share a
    * column name — resolved attributes survive `withColumn`/`join`
    * lineage and dodge that entirely. */
  def saltedEquiJoin(big: DataFrame, bigKey: Column, saltSource: Seq[Column],
      small: DataFrame, smallKey: String, buckets: Int,
      joinType: String): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(safeJoinTypes(joinType.toLowerCase),
      s"join type '$joinType' would duplicate unmatched small-side rows " +
        s"across the $buckets salt replicas; use ${safeJoinTypes.mkString("/")}")
    require(!big.columns.contains(SaltCol) && !small.columns.contains(SaltCol),
      s"inputs must not already contain a '$SaltCol' column")
    val saltedBig = big.withColumn(SaltCol, saltExpr(saltSource, buckets))
    val replicatedSmall = small
      .withColumn(SaltCol, explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedBig
      .join(replicatedSmall,
        bigKey === replicatedSmall.col(smallKey)
          && saltedBig.col(SaltCol) === replicatedSmall.col(SaltCol),
        joinType)
      .drop(SaltCol)
  }

  /** Salt ONLY the hot keys — the production form when the dim side is
    * too large to replicate wholesale. [[saltedEquiJoin]] replicates
    * the ENTIRE small side `buckets`×, which the skew probe measured
    * as a net LOSS on a 1M-row dim (15.4 s vs 9.8 s plain at 20M rows
    * — the replication shuffle swamps the straggler win,
    * SCALE_SLOPE.md). Here the big side splits on membership in
    * `hotKeys` (request metadata — a handful of ids, rides the plan as
    * a literal IN): the cold partition joins plain (its keys are
    * uniform by construction), and only the hot partition is salted,
    * with ONLY the hot keys' dim rows — |hotKeys| × buckets rows, not
    * |dim| × buckets — replicated. One union of two shuffle joins;
    * each output row is produced by exactly one branch, so any
    * big-side-preserving join type is safe. */
  def saltedHotKeyJoin(big: DataFrame, bigKey: String,
      saltSource: Seq[String], small: DataFrame, smallKey: String,
      hotKeys: Seq[Long], buckets: Int,
      joinType: String = "inner"): DataFrame =
    saltedHotKeyJoin(big, big.col(bigKey), saltSource.map(big.col), small,
      smallKey, hotKeys, buckets, joinType)

  /** Column-resolved variant — see [[saltedEquiJoin]]'s Column
    * overload for why resolved attributes, not bare names, are the
    * safe currency on an accumulated join frame. */
  def saltedHotKeyJoin(big: DataFrame, bigKey: Column,
      saltSource: Seq[Column], small: DataFrame, smallKey: String,
      hotKeys: Seq[Long], buckets: Int,
      joinType: String): DataFrame = {
    require(hotKeys.nonEmpty, "no hot keys — use a plain join")
    require(safeJoinTypes(joinType.toLowerCase),
      s"join type '$joinType' is unsafe under salt replication")
    val hot = big.filter(bigKey.isin(hotKeys: _*))
    val cold = big.filter(!bigKey.isin(hotKeys: _*) || bigKey.isNull)
    val smallHot = small.filter(col(smallKey).isin(hotKeys: _*))
    // positional union, NOT unionByName: both branches emit big's
    // columns then small's, in declaration order, by construction —
    // and an accumulated multi-join frame may legitimately carry
    // DUPLICATE column names, which ResolveUnion's by-name matching
    // rejects outright
    saltedEquiJoin(hot, bigKey, saltSource, smallHot, smallKey, buckets,
        joinType)
      .union(cold.join(small, bigKey === small(smallKey), joinType))
  }

  /** The hot keys of `df.key`: keys owning more than `frac` of an
    * n-row uniform partition's fair share, found on a `sampleFrac`
    * sample (one cheap aggregate of index metadata — at 100 TB this is
    * the stats pass that decides whether to salt at all). */
  def findHotKeys(df: DataFrame, key: String, sampleFrac: Double = 0.01,
      frac: Double = 0.1, seed: Long = 42L): Seq[Long] = {
    val sampled = df.sample(withReplacement = false, sampleFrac, seed)
      .groupBy(col(key))
      .agg(count(lit(1)).as("c"))
    val total = sampled.agg(sum("c")).first().getLong(0).max(1L)
    sampled.filter(col("c") > lit(total * frac))
      .select(col(key).cast("long")).collect().map(_.getLong(0)).toSeq
  }

  /** THE PLAN DECISION, automated: one sampled stats pass
    * ([[findHotKeys]]) picks the join plan the round-9 head-to-head
    * measurements ranked (SCALE_SLOPE.md skew section):
    *  - no key above the hot threshold → PLAIN shuffle join — the
    *    measurements showed salting a uniform key is a net loss (the
    *    full-dim salt's replication shuffle cost 1.6× plain), so the
    *    default must be to NOT salt;
    *  - hot keys found → HOT-KEY-ONLY salt (the measured 3.3-4.6×
    *    win over plain at one-key-owns-half skew), which replicates
    *    only the hot keys' dim rows.
    * Returns the joined frame plus the decision taken, so specs and
    * operators can assert WHICH plan was chosen, not just that some
    * join ran. */
  def autoJoin(big: DataFrame, bigKey: String, saltSource: Seq[String],
      small: DataFrame, smallKey: String, buckets: Int = 16,
      joinType: String = "inner", sampleFrac: Double = 0.01,
      frac: Double = 0.1): (DataFrame, String) = {
    val hot = findHotKeys(big, bigKey, sampleFrac, frac)
    if (hot.isEmpty)
      (big.join(small, big.col(bigKey) === small.col(smallKey), joinType),
        "plain")
    else
      (saltedHotKeyJoin(big, bigKey, saltSource, small, smallKey, hot,
        buckets, joinType), s"hotkey_salt:${hot.size}")
  }
}
