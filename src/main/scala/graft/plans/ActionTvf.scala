package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Deferred-action relation for the MUTATING TVFs (graft_optimize /
  * graft_vacuum / graft_expire / graft_maintain / graft_restore /
  * graft_clone): the TVF builder returns this leaf carrying a thunk,
  * and the action runs when the plan EXECUTES — so `EXPLAIN SELECT *
  * FROM graft_optimize(…)` (or any other analysis-only pass over the
  * statement) no longer performs the mutation, which the former eager
  * plan-build-time execution did. The thunk runs ON THE DRIVER inside
  * `doExecute` (the actions are themselves Spark-job-running
  * maintenance commands and cannot nest in a task), once per execution;
  * its report rows become a one-partition RDD. Re-executing the
  * DataFrame re-runs the action — the honest semantics of re-running
  * the SQL statement. */
case class GraftActionPlan(name: String, output: Seq[Attribute],
    thunk: () => Seq[Row]) extends LeafNode {
  // a fixed tiny size: the report is O(1) rows, and a leaf without
  // computeStats would crash any CBO pass over the statement
  override def computeStats(): Statistics = Statistics(sizeInBytes = 64)
}

case class GraftActionExec(name: String, output: Seq[Attribute],
    thunk: () => Seq[Row]) extends LeafExecNode {
  override protected def doExecute(): RDD[InternalRow] = {
    val schema = StructType(output.map(a =>
      org.apache.spark.sql.types.StructField(a.name, a.dataType,
        a.nullable)))
    val conv = CatalystTypeConverters.createToCatalystConverter(schema)
    val proj = org.apache.spark.sql.catalyst.expressions
      .UnsafeProjection.create(schema)
    // the action runs HERE — driver-side, at execution time — and the
    // already-computed report parallelizes (as UnsafeRows — the
    // contract of every exec leaf), so an RDD recompute never re-runs
    // the mutation within one execution
    val rows = thunk()
      .map(r => proj(conv(r).asInstanceOf[InternalRow]).copy())
    sparkContext.parallelize(rows, 1)
  }
}

/** Planner strategy for the deferred-action leaf — injected cluster-wide
  * by `GraftExtensions` and per-session (idempotently, via
  * `experimental.extraStrategies`) by `Graft.registerFunctions`. */
object GraftActionStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GraftActionPlan(n, out, th) => GraftActionExec(n, out, th) :: Nil
    case _ => Nil
  }
}

object GraftActionPlan {
  /** Build the leaf from a plain schema + row thunk (the TVF builders'
    * entry point — they declare their report shape statically). */
  def apply(name: String, schema: StructType, thunk: () => Seq[Row])
      : LogicalPlan =
    new GraftActionPlan(name,
      schema.fields.toSeq.map(f =>
        AttributeReference(f.name, f.dataType, f.nullable)()),
      thunk)

  /** Ensure the strategy is present on a session built without the
    * extensions conf (the `Graft.registerFunctions` door). */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GraftActionStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftActionStrategy
}
