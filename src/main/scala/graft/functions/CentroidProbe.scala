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

/** Native Catalyst expression: TWO-LEVEL (hierarchical) nearest-
  * centroid assignment — route to the nearest of `g` super-centers,
  * then exact (distance, cid)-argmin over only that super's center
  * group. Returns the chosen cid as INT.
  *
  * This is dd09's fused kernel: O(g + max-group) fixed-point dots per
  * row instead of O(k), as ONE expression holding the full two-level
  * index as metadata. The previous formulation — a CASE WHEN over g
  * branches, each its own [[CentroidProbe]] — had identical semantics
  * but a plan-shape failure mode: optimizer rules that duplicate
  * projections (e.g. PushProjectionThroughUnion over an n-way union)
  * replicate the whole g-branch tree per target, and generated-code
  * size grows with g — measured as a 7× end-to-end regression on a
  * 100-way-union corpus while this fused form stays flat.
  *
  * Arithmetic and tie-breaks are bit-identical to the flat kernel:
  * dist = ‖c‖² − 2·(fixdot(v,c)/10¹²), ties on cid ascending, at both
  * levels. `groupOf(s)` lists the center indices grouped under super
  * s; a vector routed to an EMPTY group falls back to the exact
  * argmin over all centers (reachable only through fixed-point
  * near-ties between duplicate seeds — documented oracle
  * precondition, dd09 scaladoc).
  */
case class HierCentroidProbe(child: Expression,
    supers: Seq[Seq[Float]], superCn2s: Seq[Double],
    centers: Seq[Seq[Float]], cids: Seq[Int], cn2s: Seq[Double],
    groupOf: Seq[Seq[Int]]) extends UnaryExpression {

  require(supers.nonEmpty && supers.length == superCn2s.length &&
    supers.length == groupOf.length, "supers/superCn2s/groupOf must align")
  require(centers.nonEmpty && centers.length == cids.length &&
    centers.length == cn2s.length, "centers/cids/cn2s must align")
  require(groupOf.flatten.forall(i => i >= 0 && i < centers.length),
    "groupOf indices must point into centers")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hier_centroid_probe requires array<float>, got ${other.sql}")
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hier_centroid_probe"

  @transient private lazy val sMat: Array[Array[Float]] =
    supers.map(_.toArray).toArray
  @transient private lazy val sN2: Array[Double] = superCn2s.toArray
  @transient private lazy val cMat: Array[Array[Float]] =
    centers.map(_.toArray).toArray
  @transient private lazy val cIds: Array[Int] = cids.toArray
  @transient private lazy val cN2: Array[Double] = cn2s.toArray
  @transient private lazy val grp: Array[Array[Int]] =
    groupOf.map(_.toArray).toArray
  @transient private lazy val allIdx: Array[Int] = cMat.indices.toArray

  def compute(v: ArrayData): Int = {
    val m = v.numElements()
    val row = new Array[Float](m)
    var p = 0
    while (p < m) {
      if (!v.isNullAt(p)) row(p) = v.getFloat(p)
      p += 1
    }
    @inline def dot(c: Array[Float]): Long = {
      val n = math.min(m, c.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += math.floor(row(i).toDouble * c(i).toDouble * 1e12).toLong
        i += 1
      }
      acc
    }
    // level 1: nearest super (ties on super index ascending — supers
    // are ordered by their cid, so index order IS cid order)
    var bestS = 0
    var bestSd = Double.MaxValue
    var s = 0
    while (s < sMat.length) {
      val dist = sN2(s) - 2.0 * (dot(sMat(s)).toDouble / 1e12)
      if (dist < bestSd) { bestSd = dist; bestS = s }
      s += 1
    }
    // level 2: exact (dist, cid)-argmin within the routed group; empty
    // group → exact argmin over ALL centers
    val pool = if (grp(bestS).length > 0) grp(bestS) else allIdx
    var bestC = -1
    var bestCd = Double.MaxValue
    var bestCid = Int.MaxValue
    var t = 0
    while (t < pool.length) {
      val j = pool(t)
      val dist = cN2(j) - 2.0 * (dot(cMat(j)).toDouble / 1e12)
      if (dist < bestCd || (dist == bestCd && cIds(j) < bestCid)) {
        bestCd = dist; bestC = j; bestCid = cIds(j)
      }
      t += 1
    }
    cIds(bestC)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hierCentroidProbe", this,
      classOf[HierCentroidProbe].getName)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): HierCentroidProbe =
    copy(child = newChild)
}
