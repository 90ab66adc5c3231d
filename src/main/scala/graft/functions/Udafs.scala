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

  /** Buffer: (Σ (100·x)², count). */
  case class SqBuf(sumSqCents: Long, n: Long)

  val sumOfSquares: Aggregator[Double, SqBuf, Double] =
    new Aggregator[Double, SqBuf, Double] {
      override def zero: SqBuf = SqBuf(0L, 0L)
      override def reduce(b: SqBuf, x: Double): SqBuf = {
        val cents = math.round(x * 100) // exact: inputs have 2 decimals
        SqBuf(b.sumSqCents + cents * cents, b.n + 1)
      }
      override def merge(a: SqBuf, b: SqBuf): SqBuf =
        SqBuf(a.sumSqCents + b.sumSqCents, a.n + b.n)
      override def finish(b: SqBuf): Double = b.sumSqCents.toDouble / 1e4
      override def bufferEncoder: Encoder[SqBuf] = Encoders.product[SqBuf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
