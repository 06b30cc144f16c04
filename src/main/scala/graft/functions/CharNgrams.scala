package graft.functions

import java.util.{LinkedHashSet => JLinkedHashSet}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT character trigrams of a string, as one per-row native pass.
  *
  * Why custom (SURVEY §4.3, same argument as [[WinnowHash]]): the
  * declarative formulation —
  * `array_distinct(transform(sequence(1, greatest(length(t)-2, 1)),
  * i -> substring(t, i, 3)))` — pays twice. The higher-order lambda runs
  * INTERPRETED per element (transform/aggregate have no codegen), and
  * `array_distinct` over a ~600-element string array is an O(len²)
  * equality scan per row; both re-run on every corpus pass of the dedup
  * pipeline (strategy probe, vocabulary build, signature build). Measured
  * on the Zipf soak corpus this tokenize step was 4× the cost of the
  * pair join it feeds. Here: one tight loop over the code points with a
  * hash-set dedup, O(len), called once per row from generated code.
  *
  * Exact SQL equivalence (the DuckDB oracle keeps hash-matching modulo
  * order, which the set-oriented consumers erase): windows are code-point
  * positions 1..greatest(len-2, 1), each `substring(t, i, 3)` — so a
  * string shorter than 3 code points yields the whole string (possibly
  * empty), exactly like the SQL twin. Null input → null.
  */
case class CharNgrams(child: Expression, n: Int = CharNgrams.N) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _ if n < 1 =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.catalogString}"
        )
    }

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgrams {
  val N = 3

  /** Builder for FunctionRegistry: 1-arg trigram form, or 2-arg with a
    * foldable integer n — `char_ngrams(text, 5)`.
    */
  def fromArgs(args: Seq[Expression]): Expression = args match {
    case Seq(text) => CharNgrams(text)
    case Seq(text, nExpr) =>
      val n = nExpr match {
        case e if e.foldable && e.dataType == IntegerType =>
          val v = e.eval()
          if (v == null) throw new IllegalArgumentException("char_ngrams: n must not be null")
          v.asInstanceOf[Int]
        case _ =>
          throw new IllegalArgumentException("char_ngrams: n must be an integer literal")
      }
      CharNgrams(text, n)
    case _ =>
      throw new IllegalArgumentException(
        s"char_ngrams requires 1 or 2 arguments, got ${args.length}")
  }

  /** Called from both interpreted eval and generated code. One pass
    * records each code point's char offset (SQL substring positions are
    * CODE POINTS, so surrogate pairs count once); windows then slice the
    * (copied) String directly — no per-window re-walk, no sharing of the
    * input row buffer.
    */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val str = s.toString // defensive copy off the (reusable) row buffer
    val starts = new Array[Int](str.length + 1)
    var ci = 0
    var len = 0
    while (ci < str.length) {
      starts(len) = ci
      ci += Character.charCount(str.codePointAt(ci))
      len += 1
    }
    starts(len) = str.length
    if (len <= n) {
      // sequence(1, greatest(len-n+1, 1)) = [1] → one window = whole string.
      return new GenericArrayData(Array[Any](UTF8String.fromString(str)))
    }
    // First-occurrence order (deterministic; consumers are set-oriented).
    val seen = new JLinkedHashSet[String]()
    var i = 0
    val nWindows = len - n + 1
    while (i < nWindows) {
      seen.add(str.substring(starts(i), starts(i + n)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
