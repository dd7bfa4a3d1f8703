package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Generator expression (SURVEY §4.3, UDTF surface §2.10): emits
  * one (pos, ngram) row per n-token window of a string-array column —
  * usable from SQL via LATERAL VIEW once registered. Generators sit
  * outside codegen by design (CodegenFallback), matching Spark's own
  * explode/inline. */
case class NGrams(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def prettyName: String = "graft_ngrams"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) Nil
    else {
      val data = arr.asInstanceOf[ArrayData]
      val m = data.numElements()
      if (m < n) Nil
      else (0 to m - n).iterator.map { i =>
        val sb = new StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(data.getUTF8String(i + j).toString)
          j += 1
        }
        InternalRow(i + 1, UTF8String.fromString(sb.toString))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGrams =
    copy(child = newChild)
}
