package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: exact fixed-point dot product of two
  * float vectors — Σ floor(aᵢ·bᵢ·1e12) as a BIGINT.
  *
  * This is the numeric-determinism primitive of the similarity
  * operators (each float×float product is IEEE-identical in any engine;
  * scaling+flooring to integers makes the SUM associative, so Spark's
  * partial-aggregation and row order cannot perturb results vs the
  * DuckDB oracle — see operators/Similarity.scala).
  *
  * Implemented as a BinaryExpression with `doGenCode` (a tight
  * primitive loop inside whole-stage codegen, no per-element boxing)
  * because the equivalent `aggregate(zip_with(...))` higher-order
  * expression allocates an intermediate array and evaluates lambdas
  * interpreted per element — the preference order of SURVEY §2:
  * native Expression > composed HOFs > UDF. Register per session via
  * [[GraftFunctions.fixdot]] or `GraftExtensions` (SparkSessionExtensions).
  */
case class FixedPointDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"fixdot requires two array<float> inputs, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fixdot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        acc += math.floor(
          a.getFloat(i).toDouble * b.getFloat(i).toDouble * 1e12).toLong
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (long) java.lang.Math.floor(
         |      (double) $a.getFloat($i) * (double) $b.getFloat($i) * 1.0E12D);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointDot =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: exact integer dot product of two
  * int vectors — Σ aᵢ·bᵢ as BIGINT. The int8-quantized analogue of
  * [[FixedPointDot]] (sim07's scale path): products and sums are
  * exact in long, so results are engine-portable by construction.
  * Same rationale as FixedPointDot — a tight codegen'd primitive
  * loop instead of an interpreted `aggregate(zip_with(...))` fold —
  * and the same element semantics: null SLOTS are skipped and a
  * length mismatch truncates to the shorter vector (the zip_with fold
  * it replaced instead nulled the whole sum; sim07's quantized arrays
  * are non-null fixed-dim transforms of the embedding column, so the
  * two agree there, and the skip-null convention keeps the whole dot
  * family consistent). */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intdot requires two array<int> inputs, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "intdot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        acc += a.getInt(i).toLong * b.getInt(i)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (long) $a.getInt($i) * (long) $b.getInt($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
}

/** Column-API wrappers for graft's native expressions. */
object GraftFunctions {
  /** Exact fixed-point dot product (scaled by 1e12) as BIGINT. */
  def fixdot(a: Column, b: Column): Column =
    GraftBridge.column(FixedPointDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Exact dot product as DOUBLE (unscaled). */
  def fixdotD(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    fixdot(a, b).cast("double") / lit(1e12)
  }

  /** Multi-band random-hyperplane LSH signatures (array<int>, one
    * packed sign-bit signature per band). */
  def hyperplaneBands(v: Column, bands: Int, rowsPerBand: Int,
      seed: Long): Column =
    GraftBridge.column(HyperplaneBands(
      GraftBridge.expression(v), bands, rowsPerBand, seed))

  /** Exact integer dot product of two array<int> columns as BIGINT. */
  def intdot(a: Column, b: Column): Column =
    GraftBridge.column(IntDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** `nprobe` nearest centroid ids (ascending (dist, cid)) as
    * array<int> — the fused IVF assignment / probe-routing kernel. */
  def centroidProbe(v: Column, centers: Seq[Seq[Float]], cids: Seq[Int],
      cn2s: Seq[Double], nprobe: Int): Column =
    GraftBridge.column(CentroidProbe(
      GraftBridge.expression(v), centers, cids, cn2s, nprobe))

  /** Fused two-level nearest-centroid assignment (route via supers,
    * exact argmin in the routed group) as INT cid — dd09's kernel. */
  def hierCentroidProbe(v: Column, supers: Seq[Seq[Float]],
      superCn2s: Seq[Double], centers: Seq[Seq[Float]], cids: Seq[Int],
      cn2s: Seq[Double], groupOf: Seq[Seq[Int]]): Column =
    GraftBridge.column(HierCentroidProbe(
      GraftBridge.expression(v), supers, superCn2s, centers, cids, cn2s,
      groupOf))

  /** Register graft's native expressions for SQL use in an existing
    * session (new sessions can instead set
    * spark.sql.extensions=graft.functions.GraftExtensions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftBridge.registerFunction(spark, "fixdot",
      exprs => FixedPointDot(exprs(0), exprs(1)))
}
