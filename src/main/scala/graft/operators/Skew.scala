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

  /** Equi-join `big ⋈ small` on bigKey = smallKey with the big side's
    * hot keys spread over `buckets` partitions. `saltSource` columns of
    * the big side feed the per-row salt hash (pick columns that vary
    * within a key, e.g. the row's other ids). Inner and left_outer
    * semantics are preserved; `small` is replicated `buckets`×. */
  def saltedEquiJoin(big: DataFrame, bigKey: String, saltSource: Seq[String],
      small: DataFrame, smallKey: String, buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltCols: Seq[Column] = saltSource.map(big.col)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(saltCols: _*), lit(buckets.toLong)))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedBig
      .join(replicatedSmall,
        saltedBig.col(bigKey) === replicatedSmall.col(smallKey)
          && saltedBig.col("__salt") === replicatedSmall.col("__salt"),
        joinType)
      .drop("__salt")
  }
}
