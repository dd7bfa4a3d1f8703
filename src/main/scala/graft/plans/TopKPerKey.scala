package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan: per-key top-k — the k first rows of each
  * key group under `order`. Spark's native formulation
  * (`row_number().over(partitionBy(keys).orderBy(order)) <= k`) must
  * SORT every group completely and shuffle EVERY input row; this
  * operator keeps a bounded k-row heap per key and runs in two levels
  * like an aggregate — a map-side partial before the exchange, so the
  * shuffle carries at most k rows per (key, input partition) and
  * nothing is ever fully sorted. The missing-operator case the
  * LogicalPlan → Strategy → SparkPlan stack exists for (SURVEY §4.2
  * preference (c)); `Graft.topKPerKey` is the public surface and
  * injects [[TopKPerKeyStrategy]] through
  * `spark.experimental.extraStrategies` (the public per-session hook).
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial → (exchange via the final level's
  * required distribution) → final, exactly the two-phase aggregate
  * shape. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partial =
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Bounded per-key heap pass. `partial = true` runs on the child's
  * existing partitioning (map-side: ≤ k rows per key per partition
  * survive); `partial = false` declares `ClusteredDistribution(keys)`,
  * so the planner inserts the hash exchange and the same heap pass over
  * co-located keys yields the exact global answer.
  *
  * Memory contract: like a hash aggregate before spill support, state
  * is O(distinct keys per partition × k) on-heap — the right tool when
  * keys-per-partition × k fits task memory (grouping keys, the common
  * top-k-per-group case). For near-unique keys the `row_number ≤ k`
  * window (external sort, spills) is the safe formulation; a
  * spill-to-sorter fallback is the known follow-up. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortExprs = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = GenerateOrdering.generate(sortExprs, childOutput)
      // max-heap under the sort order: head = the worst row kept, so a
      // better incoming row evicts it in O(log k)
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[UnsafeRow]]()
      implicit val rowOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => ord.compare(a, b)
      rows.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[UnsafeRow]
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(row.copy().asInstanceOf[UnsafeRow])
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy().asInstanceOf[UnsafeRow])
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
