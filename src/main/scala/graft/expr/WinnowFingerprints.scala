package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd winnowing fingerprinter (SURVEY §4.3 preference
  * ladder: custom Expression over built-in composition when the built-in
  * plan allocates per element).
  *
  * Semantics — EXACTLY the built-in array formulation it replaces in
  * `text_winnow_neardup` (and exactly the DuckDB oracle): over the
  * sequence of Unicode code points `c[1..n]` of the input, every 16-point
  * window `i = 1..n-15` hashes to the 20-bit polynomial
  * `fp(i) = (Σ_{k=0..15} c[i+15-k] · 31^k mod 1000003) mod 1000003`
  * (exact 64-bit integer arithmetic: max term ≈ 1.1e6·1e6, 16 terms
  * ≪ 2^63), and the result array carries — in window order, duplicates
  * preserved — the fingerprints with `fp % 32 == 0` (Manber-style mod-p
  * selection, ≈1/32 of windows). Inputs shorter than one window yield an
  * empty array.
  *
  * The built-in version (`filter(transform(sequence(...), ...))` over a
  * `transform(split(text,''), c -> ascii(c))` array) computes the same
  * values but allocates a single-char UTF8String per character plus two
  * intermediate arrays per document, and dispatches a lambda per window
  * term; this expression does one pass over a primitive int[] of code
  * points inside whole-stage codegen. ExprSpec pins value equality
  * against the built-in formulation.
  */
case class WinnowFingerprints(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(WinnowFingerprints.fingerprints(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expr.WinnowFingerprints.fingerprints($in.toString()));"
    })

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)
}

object WinnowFingerprints {
  private val W = 16
  private val P = 1000003L
  private val SEL = 32L
  // weights[k] = 31^k mod P, applied to the window position 15-k
  private val weights: Array[Long] = {
    val w = new Array[Long](W)
    w(0) = 1L
    var k = 1
    while (k < W) { w(k) = w(k - 1) * 31L % P; k += 1 }
    w
  }

  /** Shared by interpreted eval and generated code — one deterministic
    * kernel, zero divergence between paths. */
  def fingerprints(s: String): Array[Long] = {
    val len = s.length
    // one pass: code points (NOT UTF-16 units — ascii()/DuckDB ascii are
    // code-point functions, and surrogate pairs must count as one)
    var n = 0
    var off = 0
    val cps = new Array[Int](len)
    while (off < len) {
      val cp = s.codePointAt(off)
      cps(n) = cp
      n += 1
      off += Character.charCount(cp)
    }
    if (n < W) return Array.emptyLongArray
    val buf = new Array[Long](n - W + 1)
    var m = 0
    var i = 0
    while (i + W <= n) {
      var h = 0L
      var k = 0
      while (k < W) { h += cps(i + W - 1 - k).toLong * weights(k); k += 1 }
      val fp = h % P
      if (fp % SEL == 0L) { buf(m) = fp; m += 1 }
      i += 1
    }
    if (m == buf.length) buf else java.util.Arrays.copyOf(buf, m)
  }
}
