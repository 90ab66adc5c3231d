package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (reference UDAF registration,
  * core/.../UDFRegistration.scala:10-28 — maha emits CREATE TEMPORARY
  * FUNCTION for Hive; Spark-native custom aggregation is an
  * `Aggregator[IN, BUF, OUT]`).
  *
  * SumOfSquares keeps the buffer in exact integer cents² (inputs are
  * money values with 2 decimals, so x·100 is integral and the sum of
  * products is exact in Long for test scales — overflow-free below
  * ~9e18 cents²), making the aggregate associative and
  * order-insensitive: identical results in Spark and the DuckDB
  * oracle's exact DECIMAL arithmetic.
  */
object Udafs {

  /** Buffer: (Σ x² as exact decimal dollars², count). BigDecimal, not
    * Long cents²: a Long buffer overflows near 9.2e18 — already at
    * sf0.1 a priority group's Σ cents² is ≈ 2.5e19. The decimal sum is
    * exact at scale 4 and converts to double once in finish, matching
    * the oracle's CAST(SUM(dec*dec) AS DOUBLE) single rounding. */
  case class SqBuf(sumSq: BigDecimal, n: Long)

  val sumOfSquares: Aggregator[Double, SqBuf, Double] =
    new Aggregator[Double, SqBuf, Double] {
      override def zero: SqBuf = SqBuf(BigDecimal(0), 0L)
      override def reduce(b: SqBuf, x: Double): SqBuf = {
        val cents = math.round(x * 100) // exact: inputs have 2 decimals
        val sq = (BigDecimal(cents) * BigDecimal(cents)) / 10000 // exact, scale 4
        SqBuf(b.sumSq + sq, b.n + 1)
      }
      override def merge(a: SqBuf, b: SqBuf): SqBuf =
        SqBuf(a.sumSq + b.sumSq, a.n + b.n)
      // DuckDB casts a (hugeint-backed) DECIMAL to DOUBLE as
      // double(upper 64 bits)·2⁶⁴ + double(lower 64 bits), then divides
      // by 10^scale — three roundings, none of them nearest-rounding
      // the full integer. Replicate bit-for-bit (verified at sf0.1,
      // where nearest-rounding the unscaled value differs by 1 ulp)
      // rather than using the correctly-rounded BigDecimal.toDouble.
      override def finish(b: SqBuf): Double = {
        val unscaled = (b.sumSq * 10000).toBigInt
        val upper = (unscaled >> 64).toDouble
        val lower = (unscaled & BigInt("ffffffffffffffff", 16)).toDouble
        (upper * 18446744073709551616.0 + lower) / 1e4
      }
      override def bufferEncoder: Encoder[SqBuf] = Encoders.product[SqBuf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** One (score, id) candidate for [[topKByScore]]. */
  case class ScoredId(score: Double, id: Long)

  /** Bounded top-k by (score DESC, id ASC) as a MAP-SIDE-COMBINING
    * aggregate — the scale-correct form of "top-k per key". A
    * row_number window ships every candidate row through the shuffle
    * (keys × corpus rows); this aggregate reduces each map partition
    * to ≤ k candidates per key first, so the shuffle carries
    * keys × k × partitions worst-case, independent of corpus size.
    * Total order (exact double compare, id tie-break) ⇒ associative
    * and order-insensitive ⇒ deterministic at any parallelism.
    *
    * The buffer is kept sorted; a non-qualifying row (score below the
    * current k-th) is rejected in O(1) — the common case once the
    * buffer saturates, so per-row cost is ~a compare, not a sort. */
  def topKByScore(k: Int): Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] =
    new Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
      private def lt(a: ScoredId, b: ScoredId): Boolean =
        a.score > b.score || (a.score == b.score && a.id < b.id)
      override def zero: Seq[ScoredId] = Vector.empty
      override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = {
        if (b.size >= k && !lt(a, b.last)) b
        else {
          val (before, after) = b.span(lt(_, a))
          (before :+ a) ++ after.take(k - before.size - 1)
        }
      }
      override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
        y.foldLeft(x)(reduce)
      override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
      override def bufferEncoder: Encoder[Seq[ScoredId]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      override def outputEncoder: Encoder[Seq[ScoredId]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  /** One (score, string key) candidate for [[topKByScoreKey]]. */
  case class ScoredKey(score: Double, key: String)

  /** [[topKByScore]] for STRING-keyed candidates (tokens, domains,
    * hostnames) — same bounded sorted buffer and map-side combining,
    * total order (score DESC, key ASC lexicographic). */
  def topKByScoreKey(k: Int)
      : Aggregator[ScoredKey, Seq[ScoredKey], Seq[ScoredKey]] =
    new Aggregator[ScoredKey, Seq[ScoredKey], Seq[ScoredKey]] {
      private def lt(a: ScoredKey, b: ScoredKey): Boolean =
        a.score > b.score || (a.score == b.score && a.key < b.key)
      override def zero: Seq[ScoredKey] = Vector.empty
      override def reduce(b: Seq[ScoredKey], a: ScoredKey): Seq[ScoredKey] = {
        if (b.size >= k && !lt(a, b.last)) b
        else {
          val (before, after) = b.span(lt(_, a))
          (before :+ a) ++ after.take(k - before.size - 1)
        }
      }
      override def merge(x: Seq[ScoredKey], y: Seq[ScoredKey]): Seq[ScoredKey] =
        y.foldLeft(x)(reduce)
      override def finish(r: Seq[ScoredKey]): Seq[ScoredKey] = r
      override def bufferEncoder: Encoder[Seq[ScoredKey]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      override def outputEncoder: Encoder[Seq[ScoredKey]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  /** Mergeable Misra-Gries heavy-hitters summary (Misra & Gries 1982;
    * mergeability per Agarwal et al. 2012 "Mergeable Summaries",
    * PODS): at most `k` (token → lower-bound count) counters. reduce:
    * increment a present key, insert while capacity remains,
    * otherwise decrement ALL counters (amortized O(1) — decrements
    * are charged against prior increments). merge: add counterparts,
    * then subtract the (k+1)-th largest count from everything and
    * drop non-positives. THE GUARANTEE (survives any merge order /
    * parallelism): every item with true frequency > n/(k+1) is
    * present in the summary — counts are approximate, MEMBERSHIP of
    * heavy items is certain, which is why sk08 uses the summary only
    * to nominate candidates and verifies them exactly. O(k) memory
    * per partition, the bounded path when the full (group, item)
    * count table is itself too big at 100 TB. */
  /** [[misraGries]]'s aggregation buffer: an open-addressing hash
    * table in flat arrays (linear probing; `keys(i) == null` = empty
    * slot; live-entry count in `meta(0)`), mutated IN PLACE across
    * reduce/merge calls — the hot path is one probe + one counter
    * bump with zero allocation, vs the immutable-Map version's
    * per-token HAMT rebuild (O(log k) node churn per op; the measured
    * gap is recorded in BENCH_NOTES.md). Arrays round-trip the
    * shuffle through the ordinary case-class encoder. */
  case class MgBuf(keys: Array[String], counts: Array[Long],
      meta: Array[Int])

  def misraGries(k: Int): Aggregator[String, MgBuf, Map[String, Long]] =
    new Aggregator[String, MgBuf, Map[String, Long]] {
      // capacity = smallest power of two >= 4k: load factor stays
      // <= 0.5 even mid-merge, when a buffer briefly holds 2k entries
      private val cap = {
        var c = 4
        while (c < k * 4) c <<= 1
        c
      }
      private def slotOf(b: MgBuf, t: String): Int = {
        var i = t.hashCode & (cap - 1)
        while (b.keys(i) != null && b.keys(i) != t) i = (i + 1) & (cap - 1)
        i
      }
      // removal under linear probing needs cluster repair, and every
      // caller is already on an O(k) pass — rebuild instead
      private def rebuild(b: MgBuf, ks: Array[String], cs: Array[Long],
          n: Int): Unit = {
        java.util.Arrays.fill(b.keys.asInstanceOf[Array[AnyRef]], null)
        var j = 0
        while (j < n) {
          val i = slotOf(b, ks(j))
          b.keys(i) = ks(j); b.counts(i) = cs(j)
          j += 1
        }
        b.meta(0) = n
      }
      override def zero: MgBuf = // fresh arrays per group — buffers mutate
        MgBuf(new Array[String](cap), new Array[Long](cap), new Array[Int](1))
      override def reduce(b: MgBuf, t: String): MgBuf = {
        // a null token carries no frequency information — and would
        // NPE in slotOf / collide with the empty-slot sentinel
        if (t == null) return b
        val i = slotOf(b, t)
        if (b.keys(i) != null) b.counts(i) += 1
        else if (b.meta(0) < k) {
          b.keys(i) = t; b.counts(i) = 1L; b.meta(0) += 1
        } else {
          // decrement-all, dropping exhausted counters (amortized
          // O(1) — each decrement is charged against an increment)
          val ks = new Array[String](b.meta(0))
          val cs = new Array[Long](b.meta(0))
          var n = 0; var j = 0
          while (j < cap) {
            if (b.keys(j) != null && b.counts(j) > 1) {
              ks(n) = b.keys(j); cs(n) = b.counts(j) - 1; n += 1
            }
            j += 1
          }
          rebuild(b, ks, cs, n)
        }
        b
      }
      override def merge(x: MgBuf, y: MgBuf): MgBuf = {
        var j = 0
        while (j < cap) { // add counterparts (x may grow to 2k)
          if (y.keys(j) != null) {
            val i = slotOf(x, y.keys(j))
            if (x.keys(i) == null) {
              x.keys(i) = y.keys(j); x.counts(i) = y.counts(j)
              x.meta(0) += 1
            } else x.counts(i) += y.counts(j)
          }
          j += 1
        }
        if (x.meta(0) > k) {
          // subtract the (k+1)-th largest count from everything and
          // drop non-positives (Agarwal et al. 2012 merge rule)
          val m = x.meta(0)
          val all = new Array[Long](m)
          var n = 0; var i = 0
          while (i < cap) {
            if (x.keys(i) != null) { all(n) = x.counts(i); n += 1 }
            i += 1
          }
          java.util.Arrays.sort(all)
          val cut = all(m - 1 - k)
          val ks = new Array[String](m)
          val cs = new Array[Long](m)
          n = 0; i = 0
          while (i < cap) {
            if (x.keys(i) != null && x.counts(i) > cut) {
              ks(n) = x.keys(i); cs(n) = x.counts(i) - cut; n += 1
            }
            i += 1
          }
          rebuild(x, ks, cs, n)
        }
        x
      }
      override def finish(r: MgBuf): Map[String, Long] = {
        val bld = Map.newBuilder[String, Long]
        var i = 0
        while (i < cap) {
          if (r.keys(i) != null) bld += (r.keys(i) -> r.counts(i))
          i += 1
        }
        bld.result()
      }
      override def bufferEncoder: Encoder[MgBuf] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      override def outputEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  /** [[topKByScore]] candidate carrying one extra integer column the
    * output needs but the ordering ignores (a PQ code, a quantized
    * dot, a routing list id) — saves a join-back after the top-k. */
  case class ScoredRow(score: Double, id: Long, payload: Long)

  /** [[topKByScore]] with a payload slot; identical (score DESC, id
    * ASC) total order and bounded-sorted-buffer mechanics. */
  def topKWithPayload(k: Int)
      : Aggregator[ScoredRow, Seq[ScoredRow], Seq[ScoredRow]] =
    new Aggregator[ScoredRow, Seq[ScoredRow], Seq[ScoredRow]] {
      private def lt(a: ScoredRow, b: ScoredRow): Boolean =
        a.score > b.score || (a.score == b.score && a.id < b.id)
      override def zero: Seq[ScoredRow] = Vector.empty
      override def reduce(b: Seq[ScoredRow], a: ScoredRow): Seq[ScoredRow] = {
        if (b.size >= k && !lt(a, b.last)) b
        else {
          val (before, after) = b.span(lt(_, a))
          (before :+ a) ++ after.take(k - before.size - 1)
        }
      }
      override def merge(x: Seq[ScoredRow], y: Seq[ScoredRow]): Seq[ScoredRow] =
        y.foldLeft(x)(reduce)
      override def finish(r: Seq[ScoredRow]): Seq[ScoredRow] = r
      override def bufferEncoder: Encoder[Seq[ScoredRow]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      override def outputEncoder: Encoder[Seq[ScoredRow]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
}
