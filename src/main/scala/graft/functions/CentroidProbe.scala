package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the `nprobe` nearest coarse-quantizer
  * centroids of a float vector, as `array<int>` of centroid ids in
  * ascending (distance, cid) order.
  *
  * This is the fused kernel behind IVF assignment (`nprobe = 1` →
  * inverted-list id) and probe routing (`nprobe = p` → the lists a
  * query scans). The centroid matrix rides inside the expression as
  * k×dim index METADATA (the MLlib KMeans representation — a real
  * deployment broadcasts it), so both stages are MAP-ONLY projections:
  * one compiled loop over all k centers per row, no cross join, no
  * argmin shuffle, no join back onto the corpus. It replaces a
  * `least(struct(dist, cid), …)` / `array_sort(array(struct…))` tree
  * of k separate fixdot-vs-literal expressions, whose generated code
  * grew (and compiled) linearly in k — measurably slower end-to-end
  * even at k = 8.
  *
  * Distance arithmetic is EXACTLY the tree form it replaces (and the
  * sim06 DuckDB oracle): dist = ‖c‖² − 2·(fixdot(v,c)/10¹²) with the
  * [[FixedPointDot]] exact integer dot, ties on cid ascending — so
  * assignment and routing stay bit-identical across engines, row
  * orders, and this kernel swap.
  */
case class CentroidProbe(child: Expression, centers: Seq[Seq[Float]],
    cids: Seq[Int], cn2s: Seq[Double], nprobe: Int) extends UnaryExpression {

  require(centers.nonEmpty && centers.length == cids.length &&
    centers.length == cn2s.length, "centers/cids/cn2s must align")
  require(nprobe >= 1, "nprobe >= 1 required")

  /** Clamped like the slice() formulation this kernel replaced: a
    * quantizer can legitimately come back with fewer than nprobe
    * populated lists (duplicate seeds tie on assignment, a Lloyd step
    * can empty a cluster) — probe them all rather than crash. */
  private def probes: Int = math.min(nprobe, centers.length)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_probe requires array<float>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "centroid_probe"

  @transient private lazy val cMat: Array[Array[Float]] =
    centers.map(_.toArray).toArray
  @transient private lazy val cIds: Array[Int] = cids.toArray
  @transient private lazy val cN2: Array[Double] = cn2s.toArray

  /** One pass: exact fixed-point dot against every center, then a
    * k-element selection of the nprobe smallest (dist, cid) pairs —
    * k is tiny (the coarse-quantizer fanout), so selection sort beats
    * anything allocation-heavy. */
  def compute(v: ArrayData): ArrayData = {
    val k = cMat.length
    // copy the row ONCE into a primitive array (null → 0, identical to
    // skipping: floor(±0.0 · c) = 0): the k-center loop then runs on
    // plain float[] instead of paying an ArrayData virtual call per
    // (center, dim) element — k×dim reads collapse to dim
    val m = v.numElements()
    val row = new Array[Float](m)
    var p = 0
    while (p < m) {
      if (!v.isNullAt(p)) row(p) = v.getFloat(p)
      p += 1
    }
    val dist = new Array[Double](k)
    val idx = new Array[Int](k)
    var j = 0
    while (j < k) {
      val c = cMat(j)
      val n = math.min(m, c.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += math.floor(row(i).toDouble * c(i).toDouble * 1e12).toLong
        i += 1
      }
      dist(j) = cN2(j) - 2.0 * (acc.toDouble / 1e12)
      idx(j) = j
      j += 1
    }
    // partial selection sort on (dist, cid): nprobe smallest to front
    val np = probes
    var s = 0
    while (s < np) {
      var best = s
      var t = s + 1
      while (t < k) {
        val better = dist(idx(t)) < dist(idx(best)) ||
          (dist(idx(t)) == dist(idx(best)) && cIds(idx(t)) < cIds(idx(best)))
        if (better) best = t
        t += 1
      }
      val tmp = idx(s); idx(s) = idx(best); idx(best) = tmp
      s += 1
    }
    val out = new Array[Int](np)
    var o = 0
    while (o < np) { out(o) = cIds(idx(o)); o += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidProbe", this,
      classOf[CentroidProbe].getName)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidProbe =
    copy(child = newChild)
}
