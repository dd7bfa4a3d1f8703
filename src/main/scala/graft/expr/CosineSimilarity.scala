package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression (SURVEY §4.3): cosine similarity of two
  * float-array columns, with whole-stage codegen (`doGenCode`) — one fused
  * loop per row, no higher-order-function lambda dispatch and no UDF
  * serialization. Arithmetic: widen each float to double, sequential
  * accumulation — identical results to the zip_with/aggregate formulation
  * and the DuckDB DOUBLE[] oracle.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData].toFloatArray()
    val xb = b.asInstanceOf[ArrayData].toFloatArray()
    var dp = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(xa.length, xb.length)
    while (i < n) {
      val x = xa(i).toDouble; val y = xb(i).toDouble
      dp += x * y; na += x * x; nb += y * y
      i += 1
    }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xa = ctx.freshName("xa")
      val xb = ctx.freshName("xb")
      val dp = ctx.freshName("dp")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        float[] $xa = $a.toFloatArray();
        float[] $xb = $b.toFloatArray();
        double $dp = 0.0; double $na = 0.0; double $nb = 0.0;
        int $n = Math.min($xa.length, $xb.length);
        for (int $i = 0; $i < $n; $i++) {
          double $x = (double) $xa[$i];
          double $y = (double) $xb[$i];
          $dp += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        ${ev.value} = $dp / (Math.sqrt($na) * Math.sqrt($nb));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
