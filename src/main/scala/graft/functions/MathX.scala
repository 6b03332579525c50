package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Scalar math kernels missing from Spark's builtin function set, exposed as
  * native codegen expressions (no UDF, stays inside whole-stage codegen).
  */
object MathX {

  /** Error function via the Abramowitz–Stegun 7.1.26 rational approximation
    * (|ε| ≤ 1.5e-7 — within the tolerance the EGO acquisition comparisons
    * need; the JDK has no erf and the only library with one on the
    * classpath, breeze, is driver-side).
    */
  def erf(x: Double): Double = {
    val s = if (x < 0) -1.0 else 1.0
    val ax = math.abs(x)
    val t = 1.0 / (1.0 + 0.3275911 * ax)
    val poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t
    s * (1.0 - poly * math.exp(-ax * ax))
  }

  /** Standard normal CDF Φ(z). */
  def normCdf(z: Double): Double = 0.5 * (1.0 + erf(z / math.sqrt(2.0)))
}

/** erf(x) as a unary codegen expression. The input contract is enforced at
  * ANALYSIS time (checkInputDataTypes) rather than failing with a
  * ClassCastException mid-job in interpreted eval; the public `apply`
  * additionally casts, so any numeric Column works.
  */
case class Erf(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"erf requires a DOUBLE child, got ${child.dataType.catalogString}" +
        " (wrap with cast or use the Column apply)")
  override def dataType: DataType = DoubleType

  override def nullSafeEval(x: Any): Any = MathX.erf(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MathX.erf($c)")

  override protected def withNewChildInternal(newChild: Expression): Erf =
    copy(child = newChild)
}

object Erf {
  def apply(c: Column): Column =
    GraftBridge.column(Erf(GraftBridge.expression(c.cast("double"))))
}
