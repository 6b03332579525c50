package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Top-k nearest centroids (by cosine) of a double vector — the IVF coarse
  * quantizer's assignment/probe kernel at SCALE-SAFE plan size.
  *
  * The round-3 shape baked every centroid into the plan as literal
  * dot-product subexpressions: O(nList·dim) expression NODES, so Catalyst
  * analysis/codegen blew up long before data did (a 100 TB corpus wants
  * 4k-64k lists). Here the centroid matrix rides as ONE codegen reference
  * object — constant plan size at any nList, zero joins, zero shuffles;
  * the per-row O(nList·dim) flop loop is the algorithmic cost of a flat
  * quantizer and runs as one generated tight loop over primitive arrays.
  *
  * IEEE op order matches the literal expression path EXACTLY (ascending
  * left-fold dot and norms, cos = dot/(vnorm·cnorm), precomputed centroid
  * norms) so small-k and large-k paths return identical assignments —
  * `AnnParitySpec` pins it.
  *
  * @param tieLargerIdx cosine ties prefer the LARGER list id when true —
  *   matching the literal probe path's `reverse(array_sort(...))`
  *   (descending (cos, li)); assignment uses false, matching
  *   `greatest(struct(cos, -li))` (ties → smaller li).
  */
case class NearestCentroids(
    child: Expression,
    centroids: Array[Array[Double]],
    norms: Array[Double],
    k: Int,
    tieLargerIdx: Boolean
) extends UnaryExpression {
  require(centroids.nonEmpty && centroids.length == norms.length && k >= 1)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"NearestCentroids needs array<double>, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    NearestCentroids.topK(v.asInstanceOf[ArrayData], centroids, norms, k, tieLargerIdx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("cnorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NearestCentroids.topK($c, $cRef, $nRef, $k, $tieLargerIdx);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

object NearestCentroids {

  /** SQL double ordering (NaN greatest, NaN = NaN, -0.0 = 0.0) with the
    * index tiebreak — mirrors how the literal struct-compare paths order.
    */
  private def better(a: Double, ai: Int, b: Double, bi: Int,
      tieLarger: Boolean): Boolean = {
    val aNaN = java.lang.Double.isNaN(a)
    val bNaN = java.lang.Double.isNaN(b)
    if (aNaN && bNaN || (!aNaN && !bNaN && a == b))
      (if (tieLarger) ai > bi else ai < bi)
    else if (aNaN) true
    else if (bNaN) false
    else a > b
  }

  def topK(v: ArrayData, cents: Array[Array[Double]], norms: Array[Double],
      k: Int, tieLarger: Boolean): ArrayData = {
    val dim = v.numElements()
    val x = new Array[Double](dim)
    var s2 = 0.0
    var i = 0
    while (i < dim) {
      val xi = v.getDouble(i); x(i) = xi; s2 += xi * xi; i += 1
    }
    val vnorm = math.sqrt(s2)
    val kk = math.min(k, cents.length)
    val bs = new Array[Double](kk)
    val bi = new Array[Int](kk)
    var n = 0
    var c = 0
    while (c < cents.length) {
      val ctr = cents(c)
      // ragged input fails LOUDLY: the literal path null-poisons mismatched
      // dims (assignment undefined), so a silently truncated dot here would
      // give the same dataset different bucketings depending on which path
      // nList selects
      if (ctr.length != dim)
        throw new IllegalArgumentException(
          s"vector dim $dim != centroid dim ${ctr.length} (list $c)")
      var d = 0.0
      var j = 0
      while (j < dim) { d += x(j) * ctr(j); j += 1 }
      val cos = d / (vnorm * norms(c))
      // insertion into the descending top-k
      if (n < kk || better(cos, c, bs(n - 1), bi(n - 1), tieLarger)) {
        var p = if (n < kk) n else n - 1
        while (p > 0 && better(cos, c, bs(p - 1), bi(p - 1), tieLarger)) {
          bs(p) = bs(p - 1); bi(p) = bi(p - 1); p -= 1
        }
        bs(p) = cos; bi(p) = c
        if (n < kk) n += 1
      }
      c += 1
    }
    val out = new Array[Int](n)
    System.arraycopy(bi, 0, out, 0, n)
    new GenericArrayData(out)
  }

  def apply(v: Column, centroids: Array[Array[Double]], k: Int,
      tieLargerIdx: Boolean): Column = {
    // centroid norms with the literal path's exact fold order (ascending sum)
    val norms = centroids.map(ctr => math.sqrt(ctr.map(x => x * x).sum))
    GraftBridge.column(NearestCentroids(
      GraftBridge.expression(v), centroids, norms, k, tieLargerIdx))
  }
}
