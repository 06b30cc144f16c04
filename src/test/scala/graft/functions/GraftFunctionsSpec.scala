package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cosine_similarity matches the built-in fold bit-for-bit") {
    GraftFunctions.register(spark)
    val df = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val pairs = df
      .select(col("vec_id").as("i"), col("v").as("a"))
      .crossJoin(df.select(col("vec_id").as("j"), col("v").as("b")))
      .filter(col("i") < col("j"))
      .limit(500)
      .withColumn("native", expr("cosine_similarity(a, b)"))
      .withColumn(
        "builtin",
        expr("""aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x) /
                sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x) *
                     aggregate(zip_with(b, b, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x))""")
      )
    // exact double equality: same left-to-right accumulation order
    assert(pairs.filter(col("native") =!= col("builtin")).count() == 0)
    assert(pairs.count() > 0)
  }

  test("cosine_similarity handles float arrays and self-similarity") {
    GraftFunctions.register(spark)
    val row = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("cosine_similarity(embedding, embedding) as c")
      .agg(min("c"), max("c"))
      .head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-6)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-6)
  }

  test("simhash60 matches the explode/conv SQL formulation exactly") {
    GraftFunctions.register(spark)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(25)
      .select(col("doc_id"), expr("array_distinct(split(lower(trim(text)), ' '))").as("words"))
      .cache()
    val native = docs.selectExpr("doc_id", "simhash60(words) as h")
    val declarative = docs
      .select(col("doc_id"), explode(col("words")).as("word"))
      .withColumn("wh", conv(substring(md5(col("word")), 1, 15), 16, 10).cast("bigint"))
      .withColumn("b", explode(sequence(lit(0), lit(59))))
      .withColumn("v", when(expr("shiftright(wh, b) & CAST(1 AS BIGINT)") === 1L, 1).otherwise(-1))
      .groupBy("doc_id", "b")
      .agg(sum(col("v")).as("vote"))
      .groupBy("doc_id")
      .agg(sum(when(col("vote") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(lit(0L))).as("h"))
    val joined = native.as("n").join(declarative.as("d"), "doc_id")
    assert(joined.filter(expr("n.h <> d.h")).count() == 0)
    assert(joined.count() == 25)
  }

  test("cosine_similarity returns null on dimension mismatch (no silent truncation)") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT cosine_similarity(array(1.0d,2.0d), array(1.0d,2.0d,3.0d))").head().isNullAt(0))
    // and via the interpreted path too
    val r = spark.sql("SELECT cosine_similarity(a, b) FROM VALUES (array(1.0d), array(1.0d,2.0d)) t(a, b)")
    assert(r.head().isNullAt(0))
  }

  test("wrong input types are rejected at analysis time, not at runtime") {
    GraftFunctions.register(spark)
    def analysisFails(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).queryExecution.analyzed)
      assert(
        e.getMessage.contains("requires a") && e.getMessage.contains("array"),
        s"expected our type-check message, got: ${e.getMessage.take(300)}"
      )
    }
    analysisFails("SELECT cosine_similarity(array(1, 2), array(1, 2))") // int elems
    analysisFails("SELECT cosine_similarity('abc', array(1.0d))")
    analysisFails("SELECT simhash60('not an array')")
    analysisFails("SELECT minhash16(array(1, 2, 3))")
  }

  test("null array elements: cosine nulls the result, hashes skip the token") {
    GraftFunctions.register(spark)
    // zip_with-equivalence: a null element nulls the whole fold.
    val c = spark.sql(
      "SELECT cosine_similarity(array(1.0d, cast(null as double)), array(1.0d, 2.0d))"
    )
    assert(c.head().isNullAt(0))
    // Interpreted path (eval) agrees with codegen.
    val ci = spark.sql(
      "SELECT cosine_similarity(a, b) FROM VALUES (array(1.0d, cast(null as double)), array(1.0d, 2.0d)) t(a, b)"
    )
    assert(ci.head().isNullAt(0))
    // Hash expressions: null token drops out (md5(NULL) is NULL in the SQL twin).
    val h = spark
      .sql("""SELECT simhash60(array('a', cast(null as string), 'b')) = simhash60(array('a', 'b')),
                     minhash16(array('a', cast(null as string), 'b')) = minhash16(array('a', 'b'))""")
      .head()
    assert(h.getBoolean(0) && h.getBoolean(1))
  }

  test("winnow_hashes matches the declarative transform/aggregate formulation") {
    GraftFunctions.register(spark)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(20)
      .selectExpr("doc_id", "lower(trim(text)) AS t")
      .filter("length(t) >= 11")
      .cache()
    val native = docs.selectExpr("doc_id", "winnow_hashes(t) AS fps")
    val declarative = docs.selectExpr(
      "doc_id",
      """transform(sequence(0, length(t) - 11),
           p -> array_min(transform(sequence(p + 1, p + 4),
                  i -> aggregate(sequence(0, 7), CAST(0 AS BIGINT),
                         (acc, j) -> (acc * 256 + ascii(substring(t, i + j, 1))) % 2147483647))))
         AS fps"""
    )
    val joined = native.as("n").join(declarative.as("d"), "doc_id")
    assert(joined.filter(expr("n.fps <> d.fps")).count() == 0)
    assert(joined.count() == 20)
    // Short strings: empty array, not an error; null stays null.
    assert(spark.sql("SELECT size(winnow_hashes('tiny'))").head().getInt(0) == 0)
    assert(spark.sql("SELECT winnow_hashes(cast(null as string))").head().isNullAt(0))
  }

  test("char_ngrams matches the declarative transform/substring formulation as a set") {
    GraftFunctions.register(spark)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
      .selectExpr("doc_id", "lower(trim(text)) AS t")
    val native = docs.selectExpr("doc_id", "array_sort(char_ngrams(t)) AS g")
    val declarative = docs.selectExpr(
      "doc_id",
      """array_sort(array_distinct(transform(
           sequence(1, greatest(length(t) - 2, 1)), i -> substring(t, i, 3)))) AS g"""
    )
    val joined = native.as("n").join(declarative.as("d"), "doc_id")
    assert(joined.filter(expr("n.g <> d.g")).count() == 0)
    assert(joined.count() == 50)
    // Edges: short strings yield the whole string, empty yields [""],
    // duplicates collapse, surrogate pairs count as ONE code point
    // (SQL substring semantics), null stays null.
    assert(spark.sql("SELECT char_ngrams('ab')").head().getSeq[String](0) == Seq("ab"))
    assert(spark.sql("SELECT char_ngrams('')").head().getSeq[String](0) == Seq(""))
    assert(spark.sql("SELECT char_ngrams('aaaa')").head().getSeq[String](0) == Seq("aaa"))
    assert(
      spark.sql("SELECT array_sort(char_ngrams('a😀bc'))").head().getSeq[String](0) ==
        spark.sql("""SELECT array_sort(array_distinct(transform(
                       sequence(1, greatest(length('a😀bc') - 2, 1)),
                       i -> substring('a😀bc', i, 3))))""").head().getSeq[String](0)
    )
    assert(spark.sql("SELECT char_ngrams(cast(null as string))").head().isNullAt(0))
    // 2-arg form: literal n. 5-grams of 'abcdefg' = 3 windows; n larger
    // than the string falls back to the whole string.
    assert(spark.sql("SELECT char_ngrams('abcdefg', 5)").head().getSeq[String](0) ==
      Seq("abcde", "bcdef", "cdefg"))
    assert(spark.sql("SELECT char_ngrams('ab', 9)").head().getSeq[String](0) == Seq("ab"))
    // Non-literal n is rejected at analysis time.
    intercept[Exception] {
      spark.sql("SELECT char_ngrams(t, n) FROM (SELECT 'abc' AS t, 3 AS n)").collect()
    }
  }

  test("expressions run inside whole-stage codegen (no fallback)") {
    GraftFunctions.register(spark)
    val df = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("cosine_similarity(embedding, embedding) as c")
    // The `*(n)` prefix marks operators fused into WholeStageCodegen; a
    // CodegenFallback expression would force a plain (unstarred) Project.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [cosine_similarity"), s"expected codegen'd Project in plan:\n$plan")
    val ngramPlan = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("char_ngrams(text) as g")
      .queryExecution.executedPlan.toString
    assert(ngramPlan.contains("*(1) Project [char_ngrams"),
      s"expected codegen'd char_ngrams Project in plan:\n$ngramPlan")
  }
}
