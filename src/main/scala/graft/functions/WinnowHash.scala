package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (MOSS) over Rabin-Karp rolling hashes of
  * character `K`-grams, as one per-row native pass.
  *
  * Why custom (SURVEY §4.3): the declarative formulation — a
  * `transform(sequence(...))` whose lambda runs a `K`-step `aggregate`
  * fold per position — executes interpreted (higher-order functions are
  * not codegen'd), costing minutes per 10⁵ documents; this expression does
  * the same arithmetic in one native loop.
  *
  * Exact SQL equivalence (the DuckDB oracle keeps hash-matching): the hash
  * of the window at code-point position i is the left fold
  * `((acc * 256 + codepoint) mod p)` over the `K` code points — identical
  * to `aggregate(sequence(...), 0L, (acc, j) -> (acc*256 + ascii(...)) % p)`
  * because each window is recomputed from zero (an incremental
  * subtract-and-shift rolling update would produce a different mod
  * sequence). Returns the length-(n−W+1) array of per-window minima over
  * `W` consecutive hashes (callers dedupe); null input → null; strings
  * shorter than K+W−1 code points → empty array.
  */
case class WinnowHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.catalogString}"
        )
    }

  override def nullSafeEval(input: Any): Any =
    WinnowHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowHash {
  val K = 8
  val W = 4
  val P = 2147483647L // 2^31 - 1, same modulus as the MinHash family

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String): GenericArrayData = {
    // Code points, not UTF-16 chars: `ascii(substring(t, i, 1))` in the SQL
    // twin addresses the i-th code point and returns its code point value.
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < K + W - 1) return new GenericArrayData(Array.emptyLongArray)
    val nh = n - K + 1
    val hashes = new Array[Long](nh)
    var i = 0
    while (i < nh) {
      var acc = 0L
      var j = 0
      while (j < K) {
        acc = (acc * 256 + cps(i + j)) % P
        j += 1
      }
      hashes(i) = acc
      i += 1
    }
    val out = new Array[Long](nh - W + 1)
    var p = 0
    while (p <= nh - W) {
      var m = hashes(p)
      var q = 1
      while (q < W) {
        if (hashes(p + q) < m) m = hashes(p + q)
        q += 1
      }
      out(p) = m
      p += 1
    }
    new GenericArrayData(out)
  }
}
