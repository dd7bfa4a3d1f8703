package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

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
          !right.output.exists(_.name.startsWith(TAG)) =>
      findBound(cond, left, right) match {
        case Some((lExpr, rExpr, w)) =>
          val wLit = Literal(w, DoubleType)
          def bucket(e: Expression, off: Int): Expression = {
            val b = Floor(Divide(Cast(e, DoubleType), wLit))
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

  /** Extract (leftValue, rightValue, width) from a conjunct of shape
    * `abs(x − y) <= w` where x references only one side and y only the
    * other; `None` if no such conjunct exists. */
  private def findBound(cond: Expression, left: LogicalPlan,
                        right: LogicalPlan)
      : Option[(Expression, Expression, Double)] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    conjuncts(cond).iterator.flatMap {
      case LessThanOrEqual(abs: Abs, lit: Literal)
          if lit.value != null && lit.dataType.isInstanceOf[
            org.apache.spark.sql.types.NumericType] =>
        val w = lit.eval().asInstanceOf[Number].doubleValue()
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
