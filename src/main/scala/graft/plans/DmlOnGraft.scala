package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.GraftSqlBridge

import graft.sources.{GraftSparkTable, GraftTable}

/** SQL `UPDATE` / `DELETE` for graft tables — the same analyzer-rewrite
  * recipe as `MergeIntoGraftRule`: a RESOLVED `UpdateTable` /
  * `DeleteFromTable` whose target is a graft DSv2 relation becomes a
  * runnable command before Spark's row-level-operation machinery would
  * refuse the non-SupportsRowLevelOperations table. Both route through
  * the MERGE-ON-READ engines (`commitUpdateImpl` / `commitDeleteVector`)
  * — no base file is rewritten; the commit mints dir-scoped tombstones
  * (plus a replacement dir for UPDATE), which is exactly the fast path
  * a lake user expects from a point DML statement at 100 TB.
  *
  * Identity: SQL statements carry no key declaration, so both commands
  * use FULL-ROW identity — the tombstone keys every column, killing the
  * matched rows by exact value within their chain dir. This is
  * semantically exact with no uniqueness contract: any row value-equal
  * to a matched row satisfies the same deterministic condition, so it
  * is itself matched (and, for UPDATE, contributes its own replacement
  * row — duplicates preserve their multiplicity). The trade (full-row
  * DV probes force the scan to read every column until the DV is
  * purged) is documented at `commitUpdateImpl`; declared-key API calls
  * remain the narrow-probe path. */
object GraftDml {

  private[plans] def graftTarget(plan: LogicalPlan)
      : Option[(LogicalPlan, String)] =
    plan match {
      case SubqueryAlias(_, child) => graftTarget(child)
      case r: DataSourceV2Relation => r.table match {
        case g: GraftSparkTable => Some((plan, g.dir))
        case _ => None
      }
      case _ => None
    }

  /** A resolved condition/assignment expression, re-expressed so it
    * binds BY NAME against the snapshot frames the MoR engines read
    * (their attributes carry different exprIds than the DSv2
    * relation's). Subqueries are refused — their plans reference the
    * pre-DML snapshot and cannot travel through a by-name rebind; and a
    * non-deterministic condition is refused because full-row identity
    * stands on "value-equal rows agree on the condition". */
  private[plans] def portable(e: Expression): Column = {
    require(e.deterministic,
      "UPDATE/DELETE conditions on graft tables must be deterministic " +
        "(full-row MoR identity requires value-equal rows to agree on " +
        s"the condition): $e")
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      "subqueries in UPDATE/DELETE conditions are not supported on " +
        "graft tables — materialize the subquery and MERGE instead")
    GraftSqlBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    })
  }
}

/** The analyzer rule: injected via `GraftExtensions`, fires inside the
  * resolution fixed-point once the statement is resolved. */
case class UpdateDeleteGraftRule(spark: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u: UpdateTable if u.resolved && u.childrenResolved =>
        GraftDml.graftTarget(u.table) match {
          case Some((_, d)) => GraftUpdateCommand(u, d)
          case None => u
        }
      case d: DeleteFromTable if d.resolved && d.childrenResolved =>
        GraftDml.graftTarget(d.table) match {
          case Some((_, t)) => GraftDeleteCommand(d, t)
          case None => d
        }
    }
}

/** `UPDATE gt.t SET c = expr[, …] [WHERE cond]` → one MoR commit:
  * dir-scoped full-row tombstones for the matched rows plus a
  * replacement dir carrying their updated images. Layout/index
  * refusals (partitionBy, pmap, stats=/bloom=) surface from the engine
  * with the same messages as the API door. */
case class GraftUpdateCommand(update: UpdateTable, dir: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val sets: Seq[(String, Column)] = update.assignments.map { as =>
      val name = as.key match {
        case a: AttributeReference => a.name
        case other => sys.error(
          s"UPDATE assignment key must be a plain column (got $other) — " +
            "nested-field assignment is not supported on graft tables")
      }
      name -> GraftDml.portable(as.value)
    }
    require(sets.map(_._1).distinct.size == sets.size,
      s"UPDATE assigns a column twice: ${sets.map(_._1)}")
    val cond = update.condition.map(GraftDml.portable).getOrElse(lit(true))
    GraftTable.commitUpdateImpl(spark, dir, keyColsOpt = None, cond, sets,
      "UPDATE (SQL)")
    Seq.empty
  }
}

/** `DELETE FROM gt.t [WHERE cond]` → one MoR commit: the matched live
  * rows (current deletion vector applied first) become full-row
  * tombstones; no base file is listed, opened or rewritten beyond the
  * match scan. */
case class GraftDeleteCommand(delete: DeleteFromTable, dir: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    // same loud posture as the SQL UPDATE door: a MoR delete cannot
    // carry the skipping index (the dv invalidates per-file row counts
    // and commitDeleteVector drops stats=/bloom= by design), and SQL
    // text must never strip an index silently
    val fs = GraftTable.fsOf(spark, dir)
    val hdrs = GraftTable.currentVersion(fs, dir)
      .map(v => GraftTable.headersOf(fs, dir, v)).getOrElse(Map.empty)
    if (hdrs.contains("stats") || hdrs.contains("bloom"))
      throw new GraftTable.IndexRedeclarationRequired(
        "DELETE would silently drop this table's skipping index (a " +
          "merge-on-read deletion vector invalidates the per-file " +
          "statistics) — drop the index deliberately via " +
          "commitNextIsolated and re-OPTIMIZE after the delete, or " +
          "delete through the API knowingly")
    val cond = GraftDml.portable(delete.condition)
    val snapshot = GraftTable.read(spark, dir)
    GraftTable.commitDeleteVector(spark, dir, snapshot.where(cond),
      snapshot.columns.toSeq, "DELETE (SQL)")
    Seq.empty
  }
}
