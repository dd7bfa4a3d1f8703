package graft.expr

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** TRUE when row `pos` of data file `file` (basename) is tombstoned by
  * the POSITIONAL deletion-vector sidecar at `sidecar`.
  *
  * This is the read-side merge of `GraftTable.commitPositionalDelete`:
  * the scan keeps every file's rows flowing and this predicate — a
  * static probe into a lazily-loaded, executor-cached sorted position
  * array — drops the tombstoned ones IN the scan stage. No join node of
  * any kind enters the plan (Round19Spec pins that), no shuffle, no
  * driver materialization: each executor loads only the sidecars of the
  * files it actually reads (one bounded parquet read per file, cached
  * for the JVM's lifetime under the version-unique sidecar dir), which
  * is exactly how Iceberg v2 / Delta DV readers merge position deletes.
  * Codegen is a static method call, so the filter stays inside
  * WholeStageCodegen. */
case class PosDvProbe(left: Expression, right: Expression, sidecar: String)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string file, long pos), got $other")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_pos_deleted"

  override protected def nullSafeEval(f: Any, p: Any): Any =
    PosDvSidecar.deleted(sidecar, f.asInstanceOf[UTF8String].toString,
      p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val side = ctx.addReferenceObj("sidecar", sidecar,
      classOf[String].getName)
    nullSafeCodeGen(ctx, ev, (f, p) =>
      s"${ev.value} = graft.expr.PosDvSidecar.deleted($side, " +
        s"$f.toString(), $p);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Executor-side sidecar store for positional deletion vectors.
  *
  * Layout (written by `GraftTable.commitPositionalDelete`):
  * `<sidecar>/__file=<dataFileBasename>/part-*.parquet`, each row one
  * tombstoned `__pos` (long, the parquet row index within that file);
  * plus `<sidecar>/_skips`, a newline list of data-file basenames whose
  * EVERY row is tombstoned (the read path drops those from the file
  * list without opening them).
  *
  * `deleted` loads a file's position set once per JVM (keyed by the
  * version-unique sidecar dir + basename — sidecars are immutable, so
  * the cache can never serve a stale set) into a sorted long array and
  * binary-searches it per row. Loading uses parquet-hadoop's example
  * Group reader directly: the sidecar of ONE data file is bounded by
  * that file's row count, and the read happens on whichever executor
  * scans the file — never on the driver. */
object PosDvSidecar {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
  private val EMPTY = Array.empty[Long]

  def deleted(sidecar: String, file: String, pos: Long): Boolean = {
    val arr = cache.computeIfAbsent(s"$sidecar/__file=$file",
      p => load(new Path(p)))
    java.util.Arrays.binarySearch(arr, pos) >= 0
  }

  private def load(dir: Path): Array[Long] = {
    // executor-side: default Configuration resolves the cluster's FS
    // from the path URI (the qualified sidecar path carries the scheme)
    val conf = new Configuration()
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) EMPTY
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      fs.listStatus(dir)
        .filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        .foreach { st =>
          val rdr = org.apache.parquet.hadoop.ParquetReader
            .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
              st.getPath)
            .withConf(conf).build()
          try {
            var g = rdr.read()
            while (g != null) {
              out += g.getLong("__pos", 0)
              g = rdr.read()
            }
          } finally rdr.close()
        }
      val arr = out.toArray
      java.util.Arrays.sort(arr)
      arr
    }
  }

  /** Test-visible: whether a file's position set is cached. */
  private[graft] def cached(sidecar: String, file: String): Boolean =
    cache.containsKey(s"$sidecar/__file=$file")
}
