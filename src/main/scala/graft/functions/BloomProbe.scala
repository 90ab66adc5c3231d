package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Shared Bloom position math for [[graft.operators.KeyShip]]: ONE
  * xxhash64 per key, k positions via Kirsch-Mitzenmacher double
  * hashing (pos_i = h1 + i·h2 mod m, the two derived functions
  * preserving the Bloom fpp bound). The BUILDER computes the same
  * positions with plain Column arithmetic (`xxhash64` +
  * `shiftrightunsigned` — bit-identical to [[test]] by construction);
  * the PROBER is the native [[BloomMightContain]] expression below.
  */
object BloomProbe {

  /** Membership test of `key` against 60-bit-packed `words`. Shared
    * by interpreted eval and the generated code. */
  def test(words: Array[Long], m: Long, hashes: Int, key: Long): Boolean = {
    val h = XXH64.hashLong(key, 42L) // = functions.xxhash64 on a LONG
    val h1 = java.lang.Math.floorMod(h, m)
    val h2 = java.lang.Math.floorMod(h >>> 32, m) | 1L
    var i = 0
    while (i < hashes) {
      val p = (h1 + i * h2) % m
      if (((words((p / 60).toInt) >>> (p % 60).toInt) & 1L) == 0L)
        return false
      i += 1
    }
    true
  }

  /** The probe as a Column (key TRY_CAST to LONG to match the
    * builder's hash input width — try, not cast: under ANSI mode a
    * malformed string must probe as NULL, not throw). */
  def mightContain(key: Column, words: Array[Long], m: Long,
      hashes: Int): Column =
    GraftBridge.column(BloomMightContain(
      GraftBridge.expression(key.try_cast("long")), words, m, hashes))
}

/** Native Catalyst expression: Bloom membership probe against a
  * driver-built bitset. The words array rides the plan as a
  * REFERENCED OBJECT (`ctx.addReferenceObj`), not a Literal — an
  * ArrayType Literal of 2·10⁵ elements measured ~3.5 s of driver-side
  * overhead PER QUERY (boxed conversion + canonicalization/hashing
  * through every optimizer rule + plan stringification), all of which
  * a reference object skips; per row the generated code is one static
  * call (hash + k bit tests), inside whole-stage codegen. The
  * preference order of SURVEY §2: native Expression > composed
  * built-ins when the built-in carrier (the Literal) is the
  * bottleneck. */
case class BloomMightContain(child: Expression, words: Array[Long],
    m: Long, hashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a BIGINT key, got ${other.sql}")
  }
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(key: Any): Any =
    BloomProbe.test(words, m, hashes, key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
      s"${ev.value} = graft.functions.BloomProbe.test(" +
        s"$ref, ${m}L, $hashes, $c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}
