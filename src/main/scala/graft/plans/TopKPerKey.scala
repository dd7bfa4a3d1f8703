package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}

/** Whole-operator custom plan: per-key top-k — the k first rows of each
  * key group under `order`. Spark's native formulation
  * (`row_number().over(partitionBy(keys).orderBy(order)) <= k`) must
  * SORT every group completely and shuffle EVERY input row; this
  * operator keeps a bounded k-row heap per key and runs in two levels
  * like an aggregate — a map-side partial before the exchange. While
  * the partial's tracked keys fit the per-partition bound (the common
  * grouping-key case) the shuffle carries at most k rows per (key,
  * input partition) and nothing is ever fully sorted; past the bound
  * the partial epoch-flushes (≤ k rows per key PER EPOCH cross the
  * shuffle — degrading toward the window formulation's every-row
  * shuffle, never past it by more than the per-epoch duplicates). The
  * missing-operator case the
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
    case TopKPerKey(keys0, order, k, child) =>
      // Float/double keys: canonicalize -0.0/NaN exactly as the
      // optimizer's NormalizeFloatingNumbers rule does for built-in
      // grouping keys. This custom node sits outside that rule's
      // pattern match, and BOTH the hash exchange (ClusteredDistribution
      // over keys) and the heap/group-scan key comparisons use UnsafeRow
      // binary equality — without this, 0.0 vs -0.0 would land on
      // different reducers and split one logical group, unlike the
      // row_number window formulation. Applied here (not at node build)
      // because normalize needs resolved dataTypes; by strategy time the
      // plan is analyzed.
      val keys = keys0.map(
        org.apache.spark.sql.graft.GraftSqlBridge.normalizeFloats)
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
  * Memory contract: heap state is O(tracked keys per partition × k)
  * on-heap, BOUNDED at `spark.graft.topk.maxKeysPerPartition` tracked
  * keys (default 131072). Past the bound the stages degrade without
  * losing exactness:
  *  - partial: the full heap map is FLUSHED downstream and cleared
  *    (epoch flush). Always correct — partial output is merely a
  *    reduction; a row dropped by a heap had ≥ k better same-key rows
  *    retained in that epoch, all of which are emitted.
  *  - final: the retained heap rows plus the rest of the input move
  *    into Spark's spillable [[UnsafeExternalRowSorter]] ordered by
  *    (keys, order) — the same external sort the `row_number ≤ k`
  *    window would use — and a streaming group-scan keeps the first k
  *    rows per key in O(1) extra memory. */
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
    val isPartial = partial
    val maxKeys = math.max(1,
      conf.getConfString("spark.graft.topk.maxKeysPerPartition", "131072").toInt)
    child.execute().mapPartitions { rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = GenerateOrdering.generate(sortExprs, childOutput)
      // max-heap under the sort order: head = the worst row kept, so a
      // better incoming row evicts it in O(log k)
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[UnsafeRow]]()
      implicit val rowOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => ord.compare(a, b)
      def insert(row: InternalRow): Unit = {
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
      def drain(): Iterator[InternalRow] = {
        val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
        heaps.values().forEach(h => h.foreach(out += _))
        heaps.clear()
        out.iterator
      }

      if (isPartial) {
        // Bounded map-side pass: when the number of tracked keys
        // exceeds the bound, flush every retained row downstream and
        // start a fresh epoch. Lazy so a flush streams out before more
        // input is consumed.
        new Iterator[InternalRow] {
          private var out: Iterator[InternalRow] = Iterator.empty
          private def advance(): Unit = {
            while (!out.hasNext && (rows.hasNext || !heaps.isEmpty)) {
              var flushed = false
              while (rows.hasNext && !flushed) {
                insert(rows.next())
                if (heaps.size() > maxKeys) { out = drain(); flushed = true }
              }
              if (!flushed) out = drain() // input exhausted: final epoch
            }
          }
          override def hasNext: Boolean = { advance(); out.hasNext }
          override def next(): InternalRow = { advance(); out.next() }
        }
      } else {
        // Exact final pass: heap map while it fits; past the bound,
        // hand everything to the spillable external sorter keyed by
        // (keys, order) and stream the first k rows of each key group.
        var sorter: UnsafeExternalRowSorter = null
        while (rows.hasNext && sorter == null) {
          insert(rows.next())
          if (heaps.size() > maxKeys) {
            // SortExec's sorter recipe (real leading-column prefix, not
            // a constant — a constant would send every comparison
            // through the full row ordering), via the sql-internal
            // bridge
            sorter = org.apache.spark.sql.graft.GraftSqlBridge
              .externalRowSorter(childOutput,
                keyExprs.map(SortOrder(_, Ascending)) ++ sortExprs)
            heaps.values().forEach(h => h.foreach(sorter.insertRow))
            heaps.clear()
          }
        }
        if (sorter == null) drain()
        else {
          while (rows.hasNext) {
            sorter.insertRow(rows.next().asInstanceOf[UnsafeRow])
          }
          // sorted by (keys, order): each key is one contiguous run,
          // already best-first — keep the first k of each run
          var curKey: UnsafeRow = null
          var kept = 0
          sorter.sort().filter { r =>
            val key = keyProj(r)
            if (curKey == null || curKey != key) { curKey = key.copy(); kept = 0 }
            kept += 1
            kept <= limit
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
