package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal `private[sql]` escape hatch (the standard pattern for Spark
  * extension libraries: a bridge object inside the `org.apache.spark.sql`
  * namespace so session-cloning and plan-rebinding internals are reachable
  * without reflection).
  *
  * Used by iterative operators (connected components, MinHash label
  * propagation) to run their loops under a CLONED session — the clone
  * shares the SparkContext, shuffle service and cache manager but has its
  * own SQLConf, so loop-scoped settings (`spark.sql.shuffle.partitions`,
  * AQE toggles) can never leak into plans a concurrent caller compiles on
  * the original session.
  */
object GraftSqlBridge {

  /** Clone `spark` with a COPY of its current session state (conf, temp
    * views, registered functions) — unlike `newSession()`, runtime conf
    * already set by the caller (e.g. the nanos-as-long parquet flag) is
    * preserved, so plans compiled on the clone behave identically modulo
    * the explicitly overridden keys. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** Rebind a DataFrame's (unanalyzed) logical plan to another session of
    * the same SparkContext. No data movement: re-analysis under `to`'s
    * conf; persisted subtrees are still picked up from the shared cache
    * manager. */
  def ofRows(to: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(to.asInstanceOf[classic.SparkSession], plan)

  /** Catalyst Expression behind a Column (classic sessions only). */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Catalyst Expression behind a Column, FULLY CONVERTED through the
    * session's node converter (plain UnresolvedAttribute etc., no lazy
    * ColumnNodeExpression wrapper) — required when the expression is
    * placed into a CUSTOM logical node, where only the analyzer's
    * generic reference resolution will ever visit it. */
  def sessionExpression(spark: SparkSession, c: Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** Column over a raw Catalyst Expression. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Canonicalize floating-point subexpressions (-0.0 → 0.0, NaN bit
    * patterns → the canonical NaN) exactly as the optimizer's
    * NormalizeFloatingNumbers rule does for built-in grouping/join
    * keys. Custom logical nodes (TopKPerKey) sit outside that rule's
    * pattern match, so they normalize their own keys at construction —
    * without this, UnsafeRow binary equality would split 0.0 vs -0.0
    * into two groups, unlike a groupBy/window on the same keys. */
  def normalizeFloats(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** Catalyst predicate → V1 `sources.Filter` translation (the
    * `protected[sql]` helper every file source uses) — lets the graft
    * DSv2 scan builder turn its pushed expressions into the manifest
    * verdict's vocabulary without re-implementing the translation. */
  def translateFilter(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)

  /** Memory-manager page size for external sorters — what SortExec
    * passes to UnsafeExternalRowSorter; `private[spark]`, hence
    * bridged. */
  def pageSizeBytes: Long =
    org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes

  /** Spillable external row sorter over `output` rows ordered by
    * `sortOrder`, with the REAL 8-byte sort prefix on the leading sort
    * column — the exact recipe of SortExec.createSorter (prefix
    * generator + comparator from the `private[sql]` SortPrefixUtils,
    * null-prefix handling, radix only when the prefix alone fully
    * sorts). A constant prefix would force every comparison through the
    * full generated row ordering. Must be called on an executor within
    * a task (the sorter binds to the running task's memory manager). */
  def externalRowSorter(
      output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      sortOrder: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder])
      : org.apache.spark.sql.execution.UnsafeExternalRowSorter = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BindReferences, SortPrefix, UnsafeProjection}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
    import org.apache.spark.sql.execution.{SortPrefixUtils, UnsafeExternalRowSorter}
    import org.apache.spark.sql.internal.SQLConf
    import org.apache.spark.sql.types.{StructField, StructType}
    val ordering = GenerateOrdering.generate(sortOrder, output)
    val boundSortExpression = BindReferences.bindReference(sortOrder.head, output)
    val prefixComparator = SortPrefixUtils.getPrefixComparator(boundSortExpression)
    val prefixExpr = SortPrefix(boundSortExpression)
    val prefixProjection = UnsafeProjection.create(Seq(prefixExpr))
    val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
      private val result = new UnsafeExternalRowSorter.PrefixComputer.Prefix
      override def computePrefix(row: InternalRow)
          : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
        val prefix = prefixProjection.apply(row)
        result.isNull = prefix.isNullAt(0)
        result.value = if (result.isNull) prefixExpr.nullValue else prefix.getLong(0)
        result
      }
    }
    val canUseRadixSort = SQLConf.get.enableRadixSort && sortOrder.length == 1 &&
      SortPrefixUtils.canSortFullyWithPrefix(boundSortExpression)
    UnsafeExternalRowSorter.create(
      StructType(output.map(a => StructField(a.name, a.dataType, a.nullable, a.metadata))),
      ordering, prefixComparator, prefixComputer, pageSizeBytes, canUseRadixSort)
  }

  /** (key, isDescending) behind a Column produced by `.desc`/`.asc`; a
    * bare column reads as ascending. Works on the column-node tree (the
    * Spark 4 public Column representation). */
  def sortKey(c: Column): (Column, Boolean) = c.node match {
    case s: org.apache.spark.sql.internal.SortOrder =>
      (new Column(s.child),
        s.sortDirection == org.apache.spark.sql.internal.SortOrder.Descending)
    case _ => (c, false)
  }
}
