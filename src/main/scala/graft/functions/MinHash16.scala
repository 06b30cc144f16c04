package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** 16-function MinHash signature of a token array as one per-row expression.
  *
  * Hash family: `h_i(w) = (a_i · (H(w) mod p) + b_i) mod p` with
  * `p = 2^31 − 1`, `a_i = 2i + 3`, `b_i = (104729 · (i+1)) mod p`, and
  * `H(w)` the shared 60-bit md5-prefix token hash — every term is exactly
  * reproducible in portable SQL (the DuckDB oracle computes identical
  * signatures), and all intermediates stay under 2^63 (a_i ≤ 33,
  * H mod p < 2^31 ⇒ product < 2^36).
  *
  * Like [[SimHash60]], this replaces an explode × 16 shuffle-aggregate
  * formulation with one fused per-row pass inside whole-stage codegen.
  *
  * An empty (or all-null) token array yields NULL — the same value the SQL
  * twin's per-function `min()` over zero rows produces.
  */
case class MinHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Null even for a non-null child: an all-null / empty token array hashes
  // nothing, matching the SQL twin where min() over zero rows is NULL.
  override def nullable: Boolean = true

  override def prettyName: String = "minhash16"

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.requireStringArray(prettyName, child)

  override def nullSafeEval(input: Any): Any =
    MinHash16.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.MinHash16.compute($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash16 {
  val K = 16
  val P = 2147483647L // 2^31 - 1 (Mersenne prime)

  def a(i: Int): Long = 2L * i + 3
  def b(i: Int): Long = (104729L * (i + 1)) % P

  /** Called from both interpreted eval and generated code. Null tokens are
    * skipped — in the SQL twin `md5(NULL)` is NULL and drops out of the
    * per-function `min()` the same way. When NO non-null token was hashed
    * the result is null, matching min() over zero rows yielding NULL
    * (rather than a silent all-Long.MaxValue sentinel signature).
    */
  def compute(tokens: ArrayData): ArrayData = {
    val mins = Array.fill(K)(Long.MaxValue)
    val n = tokens.numElements()
    var any = false
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        any = true
        val h = TokenHash.hash60(tokens.getUTF8String(t)) % P
        var i = 0
        while (i < K) {
          val v = (a(i) * h + b(i)) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      t += 1
    }
    if (!any) return null
    new GenericArrayData(mins)
  }
}
