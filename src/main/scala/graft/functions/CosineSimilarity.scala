package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two vector columns
  * (`array<float>` or `array<double>`).
  *
  * Why a custom Catalyst Expression (SURVEY §4.3 preference order b): the
  * built-in composition `aggregate(zip_with(a, b, *), 0d, +)` allocates an
  * intermediate array and runs interpreted lambdas per element — per
  * candidate pair in a kNN join that is the hot path. This expression
  * generates one fused loop (dot product + both squared norms in a single
  * pass, no allocation) inside whole-stage codegen.
  *
  * Accumulation is a left-to-right double fold, so results are bit-identical
  * to the built-in composition and to DuckDB's `list_dot_product` on
  * `DOUBLE[]` — the correctness oracle keeps hash-matching.
  *
  * Semantics: null if either array is null, the dimensions differ, OR any
  * element is null (a corrupt vector must surface as missing data, not a
  * plausible score computed over a truncated prefix — matching `zip_with`'s
  * behavior, where a null element nulls the product and the whole
  * `aggregate` fold); NaN on zero-norm inputs (0/0 — same as the built-in
  * formula). Non-`array<float|double>` inputs are rejected at analysis time
  * via [[checkInputDataTypes]].
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Nullable regardless of input nullability: dimension mismatch yields
  // null, and Spark would otherwise optimize the null slot away for
  // non-null inputs (turning our null into 0.0).
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_similarity"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}"
      )
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def mayHaveNullElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    val checkNulls = mayHaveNullElems
    val n = x.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rightGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xi = ctx.freshName("xi")
        val yi = ctx.freshName("yi")
        // Only pay the per-element null check when the input type says null
        // elements are possible; the common containsNull=false path keeps
        // the branch-free fused loop.
        val nullElemCheck =
          if (mayHaveNullElems)
            s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
          else ""
        s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $nullElemCheck
            double $xi = (double) $a.$leftGet($i);
            double $yi = (double) $b.$rightGet($i);
            $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
          }
          if (!${ev.isNull}) {
            ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
          }
        }
        """
      }
    )
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}
