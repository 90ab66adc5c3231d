package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: multi-band random-hyperplane LSH
  * signatures of a float vector — `bands` independent signatures of
  * `rowsPerBand` sign bits each, returned as `array<int>`.
  *
  * Plane coefficients are ±1 derived from the parity of the first hex
  * digit of md5("seed:plane:dim"), materialized ONCE per
  * (plane, dimension) into a cached coefficient matrix and reused for
  * every row — the `aggregate(zip_with(...))` higher-order formulation
  * this replaces re-derived every coefficient per row per plane in
  * interpreted lambda evaluation (it was the flagged hot path of the
  * sim03/sim04 operators; the same preference order as
  * [[FixedPointDot]]: native expression > composed HOFs > UDF).
  *
  * One pass over the vector accumulates ALL planes. The per-plane
  * accumulator is EXACT fixed-point (coefᵖᵢ · ⌊xᵢ·10¹²⌋ summed as
  * long — the [[FixedPointDot]] discipline), so the sign bits are
  * order-independent and bit-reproducible by any engine: the DuckDB
  * oracle for sim03/sim04 recomputes the identical signatures from
  * md5() + floor() SQL, which is what upgrades those queries from
  * rows-only to full hash-checked rows. Each band packs its
  * `rowsPerBand` sign bits into an int. Multi-band AND-OR
  * amplification (as in the MinHash-LSH dedup operator,
  * operators/Dedup.scala): two vectors are candidates when ANY band
  * signature matches entirely, so candidate probability is
  * 1-(1-s^r)^b and expected bucket size is n/2^r per band — both
  * tunable, which is what makes the bucket math survive 100 TB.
  */
case class HyperplaneBands(child: Expression, bands: Int, rowsPerBand: Int,
    seed: Long) extends UnaryExpression {

  require(bands > 0 && rowsPerBand > 0 && rowsPerBand <= 31,
    "bands > 0 and 1 <= rowsPerBand <= 31 required")

  private def planes: Int = bands * rowsPerBand

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands requires array<float>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_bands"

  /** Coefficient matrix [plane][dim], built deterministically on first
    * use and grown if a longer vector appears. A benign init race just
    * recomputes identical values. */
  @transient private var coef: Array[Array[Byte]] = _

  private def coefFor(dims: Int): Array[Array[Byte]] = {
    val cur = coef
    if (cur != null && cur(0).length >= dims) cur
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val m = Array.tabulate(planes, dims) { (p, i) =>
        md.reset()
        val h = md.digest(
          s"$seed:$p:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first hex digit even → +1, odd → -1 (DuckDB: substr(md5(k),1,1)
        // IN ('0','2','4','6','8','a','c','e'))
        if ((((h(0) >> 4) & 0xf) & 1) == 0) 1.toByte else (-1).toByte
      }
      coef = m
      m
    }
  }

  /** Shared by the interpreted and codegen paths (the generated code
    * calls this via a plan reference): compiled JVM loops, no per-row
    * allocation beyond the accumulators and the output array. The
    * per-plane accumulator is the exact fixed-point long sum
    * Σ coefᵖᵢ·⌊xᵢ·10¹²⌋ — associative, so partial order can't flip a
    * sign bit, and replicable in engine-portable SQL. */
  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val m = coefFor(n)
    val acc = new Array[Long](planes)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = math.floor(v.getFloat(i).toDouble * 1e12).toLong
        var p = 0
        while (p < planes) { acc(p) += x * m(p)(i); p += 1 }
      }
      i += 1
    }
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var sig = 0
      var r = 0
      while (r < rowsPerBand) {
        if (acc(b * rowsPerBand + r) >= 0L) sig |= 1 << r
        r += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneBands", this,
      classOf[HyperplaneBands].getName)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}
