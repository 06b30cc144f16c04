package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for graft's native Catalyst expressions.
  *
  * Two entry points:
  *   - `GraftFunctions.register(spark)` — imperative, for an existing
  *     session (idempotent);
  *   - `spark.sql.extensions=graft.functions.GraftExtensions` — declarative,
  *     injected at session build (the SparkSessionExtensions path,
  *     SURVEY §4.3's optional extension hook).
  *
  * After either, the functions are plain SQL/`expr(...)` names, fully
  * inside whole-stage codegen:
  * {{{
  *   SELECT cosine_similarity(a.embedding, b.embedding) FROM ...
  *   SELECT simhash60(split(lower(text), ' ')) FROM documents
  * }}}
  */
object GraftFunctions {

  private def arity(name: String, n: Int)(f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args =>
      if (args.length == n) f(args)
      else
        throw new IllegalArgumentException(
          s"$name requires exactly $n argument(s), got ${args.length}"
        )

  private[functions] val registry: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    (
      "cosine_similarity",
      "cosine_similarity(a, b) - cosine similarity of two float/double vectors",
      arity("cosine_similarity", 2)(args => CosineSimilarity(args(0), args(1)))
    ),
    (
      "simhash60",
      "simhash60(tokens) - 60-bit SimHash fingerprint of a token array",
      arity("simhash60", 1)(args => SimHash60(args(0)))
    ),
    (
      "minhash16",
      "minhash16(tokens) - 16-function MinHash signature of a token array",
      arity("minhash16", 1)(args => MinHash16(args(0)))
    ),
    (
      "winnow_hashes",
      "winnow_hashes(text) - winnowed Rabin-Karp 8-gram fingerprints (window 4)",
      arity("winnow_hashes", 1)(args => WinnowHash(args(0)))
    ),
    (
      "char_ngrams",
      "char_ngrams(text[, n]) - distinct character n-grams (default trigrams; whole string when shorter than n)",
      args => CharNgrams.fromArgs(args)
    )
  )

  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    registry.foreach { case (name, usage, builder) =>
      fr.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage),
        builder
      )
    }
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registry.foreach { case (name, usage, builder) =>
      ext.injectFunction(
        (
          FunctionIdentifier(name),
          new ExpressionInfo("graft.functions", name, usage),
          builder
        )
      )
    }
}
