package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Round a DOUBLE exactly the way DuckDB's `ROUND(x, p)` does, so a
  * rounded double hashes identically in both engines.
  *
  * Spark's `round(double, p)` converts the double's EXACT binary value to
  * BigDecimal and rounds HALF_UP on its decimal expansion; DuckDB
  * computes `std::round(x * 10^p) / 10^p` in doubles (ties away from
  * zero). The two agree almost everywhere — but when a value's exact
  * binary expansion sits on (or within one ulp of) a decimal .5
  * boundary, they resolve it differently: `sql_recursive_chain` lost one
  * row of 11 274 at sf0.1 to exactly this (1160100.8306 vs .8307), a
  * lottery every double-rounding key replays whenever testdata
  * regenerates. This expression replicates the DuckDB computation
  * bit-for-bit (same scaled multiply, same ties-away-from-zero round on
  * the exact scaled double, same divide), removing the failure class for
  * every oracle whose Spark and DuckDB sides feed IDENTICAL doubles in.
  *
  * `std::round` semantics in Java: `|x| - floor(|x|)` is exact for
  * |x| < 2^52 (the subtraction is representable), so the frac >= 0.5
  * comparison reproduces ties-away-from-zero without the
  * `floor(x + 0.5)` FP-add pitfall. Above 2^52 doubles are already
  * integers and round() is the identity — both branches match C.
  *
  * Empirically validated against the in-process DuckDB the oracle runs
  * on: 60 000 (value, precision) pairs — random magnitudes plus
  * constructions dense around the 4dp/6dp .00005 boundaries —
  * bit-compare equal to DuckDB `round()` with zero mismatches
  * (round-11 session; the sweep is reproducible from the kernel's
  * python transliteration in the commit message's test).
  */
case class DuckRound(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, IntegerType) if right.foldable =>
        // the kernel implements only DuckDB's p >= 0 branch
        // (multiply-then-divide); DuckDB divides-then-multiplies for
        // p < 0, so a negative precision would silently diverge from the
        // oracle — reject it at analysis instead
        right.eval() match {
          case p: Integer if p >= 0 => TypeCheckResult.TypeCheckSuccess
          case p => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires precision >= 0 (DuckDB's p < 0 " +
              s"divide-then-multiply branch is not implemented), got $p")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, foldable int), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_round"

  override protected def nullSafeEval(v: Any, p: Any): Any =
    DuckRound.round(v.asInstanceOf[Double], p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p) => {
      s"${ev.value} = graft.expr.DuckRound.round($v, $p);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DuckRound =
    copy(left = newLeft, right = newRight)
}

object DuckRound {
  def apply(child: Expression, scale: Int): DuckRound =
    DuckRound(child, Literal(scale))

  /** Exact mirror of DuckDB RoundOperatorPrecision for p >= 0:
    * std::round(x * 10^p) / 10^p. Shared by eval and codegen. */
  def round(v: Double, p: Int): Double = {
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) return v
    val power = math.pow(10, p)
    val x = v * power
    if (java.lang.Double.isInfinite(x)) return v
    val a = math.abs(x)
    // doubles >= 2^52 are integers; std::round is the identity there
    val r0 =
      if (a >= 4503599627370496.0) a
      else {
        val f = math.floor(a)
        if (a - f >= 0.5) f + 1.0 else f
      }
    (if (x < 0 || (x == 0.0 && 1.0 / x < 0)) -r0 else r0) / power
  }
}
