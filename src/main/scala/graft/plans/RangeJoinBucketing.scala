package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a bounded-distance theta join
  *
  *   A JOIN B ON abs(a.x − b.y) <= W      (W a positive numeric literal)
  *
  * into a bucketed EQUI-join — the manual pattern `join_range_bucketed`
  * demonstrates, applied automatically so a user writing the naive
  * predicate gets the scale-safe plan. Both sides gain a
  * `floor(value / W)` bucket column; the right side is expanded (via a
  * 3-way union) to buckets b−1, b, b+1, so every pair satisfying the
  * distance bound meets in exactly one bucket (|Δvalue| ≤ W ⇒
  * |Δbucket| ≤ 1) and the planner sees an equality to hash on instead
  * of planning a BroadcastNestedLoopJoin/CartesianProduct. The original
  * predicate is kept, filtering exact matches after the bucket meet.
  *
  * Eligibility guards (each has a regression test in RangeJoinRuleSpec):
  *  - the condition must not already contain a cross-side equality —
  *    the planner can hash on that, and tripling the right side via the
  *    Union would only add cost;
  *  - both subtrees must be deterministic: the right side is duplicated
  *    into the Union, so a nondeterministic column (e.g. rand-derived)
  *    would be re-evaluated per branch and rows could meet in zero or
  *    multiple buckets;
  *  - when both operands are integral, buckets are computed with exact
  *    64-bit floor-division (a double `floor(v/W)` loses ulp precision
  *    at ns-epoch magnitudes ~1.7e18, silently dropping pairs).
  *
  * Registered through `GraftExtensions` (injectOptimizerRule). The rule
  * runs inside the operator-optimization fixpoint, so rewritten joins
  * are tagged via the bucket column name and skipped on re-entry.
  */
case class RangeJoinBucketing() extends Rule[LogicalPlan] {
  private val TAG = "__graft_rb"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved &&
          !left.output.exists(_.name.startsWith(TAG)) &&
          !right.output.exists(_.name.startsWith(TAG)) &&
          !hasCrossSideEquality(cond, left, right) &&
          planDeterministic(left) && planDeterministic(right) =>
      findBound(cond, left, right) match {
        case Some((lExpr, rExpr, w)) =>
          def isIntegral(t: DataType): Boolean = t match {
            case ByteType | ShortType | IntegerType | LongType => true
            case _ => false
          }
          val integral = isIntegral(lExpr.dataType) && isIntegral(rExpr.dataType)
          def bucket(e: Expression, off: Int): Expression = {
            val b =
              if (integral) {
                // Exact long-space floor-div: (x − pmod(x, W)) / W. The
                // subtraction makes the dividend an exact multiple of W,
                // so IntegralDivide's truncation IS floor, for negative
                // x too. For integer operands |Δ| ≤ w ⟺ |Δ| ≤ floor(w),
                // so a whole-number width loses nothing (min 1 keeps the
                // division defined when 0 < w < 1, where only Δ=0 pairs
                // qualify and same-bucket always holds).
                val wL = Literal(math.max(1L, math.floor(w).toLong), LongType)
                val x = Cast(e, LongType)
                IntegralDivide(Subtract(x, Pmod(x, wL)), wL)
              } else {
                Floor(Divide(Cast(e, DoubleType), Literal(w, DoubleType)))
              }
            if (off == 0) b else Add(b, Literal(off.toLong, LongType))
          }
          val lAlias = Alias(bucket(lExpr, 0), s"${TAG}_l")()
          val newLeft = Project(left.output :+ lAlias, left)
          val rProjs = Seq(-1, 0, 1).map { k =>
            Project(right.output :+ Alias(bucket(rExpr, k), s"${TAG}_r")(),
              right)
          }
          val newRight = Union(rProjs)
          val eq = EqualTo(lAlias.toAttribute, newRight.output.last)
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(And(cond, eq)), hint))
        case None => j
      }
  }

  /** True when every expression in the subtree is deterministic — the
    * right side gets duplicated 3×, which is only sound if each branch
    * evaluates to the same rows. */
  private def planDeterministic(p: LogicalPlan): Boolean =
    p.find(n => n.expressions.exists(e => !e.deterministic)).isEmpty

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  /** A conjunct `x = y` (or `<=>`) with x from one side and y from the
    * other already gives the planner a hash key; bucketing on top of it
    * would triple the right side for no planning benefit. */
  private def hasCrossSideEquality(cond: Expression, left: LogicalPlan,
                                   right: LogicalPlan): Boolean =
    conjuncts(cond).exists {
      case EqualTo(a, b) => splitsAcross(a, b, left, right)
      case EqualNullSafe(a, b) => splitsAcross(a, b, left, right)
      case _ => false
    }

  private def splitsAcross(a: Expression, b: Expression, left: LogicalPlan,
                           right: LogicalPlan): Boolean =
    a.references.nonEmpty && b.references.nonEmpty &&
      ((a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) ||
       (b.references.subsetOf(left.outputSet) &&
        a.references.subsetOf(right.outputSet)))

  /** Extract (leftValue, rightValue, width) from a conjunct of shape
    * `abs(x − y) <= w` where x references only one side and y only the
    * other; `None` if no such conjunct exists. */
  private def findBound(cond: Expression, left: LogicalPlan,
                        right: LogicalPlan)
      : Option[(Expression, Expression, Double)] = {
    conjuncts(cond).iterator.flatMap {
      case LessThanOrEqual(abs: Abs, lit: Literal)
          if lit.value != null && lit.dataType.isInstanceOf[NumericType] =>
        // Width via a foldable Cast — a direct .asInstanceOf[Number]
        // throws for DecimalType literals (SQL `0.25` parses as
        // DECIMAL, and Spark's Decimal is not a java.lang.Number).
        val w = Cast(lit, DoubleType).eval() match {
          case d: java.lang.Double => d.doubleValue()
          case _ => 0.0 // unreachable for NumericType; 0 disables rewrite
        }
        abs.child match {
          case s: Subtract if w > 0 && s.deterministic =>
            val (a, b) = (s.left, s.right)
            if (a.references.nonEmpty && b.references.nonEmpty &&
                a.references.subsetOf(left.outputSet) &&
                b.references.subsetOf(right.outputSet)) Some((a, b, w))
            else if (a.references.nonEmpty && b.references.nonEmpty &&
                b.references.subsetOf(left.outputSet) &&
                a.references.subsetOf(right.outputSet)) Some((b, a, w))
            else None
          case _ => None
        }
      case _ => None
    }.nextOption()
  }
}
