package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash of a token array as one per-row expression.
  *
  * Why custom (SURVEY §4.3): the declarative formulation explodes every
  * (token, bit) pair — 60× the token count — through two shuffled
  * aggregations. This expression computes the same fingerprint in a single
  * pass per row: per-token 60-bit hash from the md5 hex prefix (identical
  * to `conv(substr(md5(w),1,15),16,10)`, so the DuckDB oracle still
  * hash-matches bit-for-bit), ±1 bit votes accumulated in a local array,
  * majority sign packed into a long. No shuffle, no row explosion.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  // Null even for a non-null child: an all-null / empty token array has no
  // votes, matching the SQL twin where the per-bit aggregate over zero rows
  // is NULL (md5(NULL) drops every token out).
  override def nullable: Boolean = true

  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.requireStringArray(prettyName, child)

  override def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sim")
      s"""
         |java.lang.Long $tmp = graft.functions.SimHash60.compute($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Portable 60-bit token hash shared by the hashing expressions: first 15
  * hex chars of md5, parsed base-16 — byte-for-byte the SQL formulation
  * `conv(substr(md5(w),1,15),16,10)` / `('0x'||substr(md5(w),1,15))::BIGINT`
  * so every engine derives identical values.
  */
/** Shared analysis-time input checks for the token-hashing expressions. */
private[functions] object GraftTypeChecks {
  def requireStringArray(name: String, child: Expression): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$name requires an array<string> argument, got ${other.catalogString}"
        )
    }
}

private[functions] object TokenHash {
  def hash60(s: UTF8String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val digest = md.digest(s.getBytes)
    // First 15 hex chars = 7 full bytes + the high nibble of byte 8.
    var h = 0L
    var i = 0
    while (i < 7) {
      h = (h << 8) | (digest(i) & 0xffL)
      i += 1
    }
    (h << 4) | ((digest(7) & 0xf0L) >> 4)
  }
}

object SimHash60 {

  /** Called from both interpreted eval and generated code. Null tokens are
    * skipped — in the SQL twin `md5(NULL)` is NULL and drops out of the
    * per-bit vote aggregate the same way. When NO non-null token remains
    * the result is null (boxed), matching the SQL aggregate over zero rows
    * yielding NULL rather than an arbitrary all-zero fingerprint.
    */
  def compute(tokens: ArrayData): java.lang.Long = {
    val votes = new Array[Int](60)
    val n = tokens.numElements()
    var any = false
    var t = 0
    while (t < n) {
      if (tokens.isNullAt(t)) { t += 1 }
      else {
      any = true
      val h = TokenHash.hash60(tokens.getUTF8String(t))
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
      }
    }
    if (!any) return null
    var sim = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sim |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(sim)
  }
}
