package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One named query: a Spark builder plus (when SQL-expressible) the ANSI SQL
  * a DuckDB oracle runs over the same parquet tables. Column names/order and
  * row order MUST agree between the two — the driver hash-compares values
  * with columns sorted by name.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Q {

  /** Metadata-only fingerprint of a dir's documents.parquet listing
    * (names + lengths + mtimes — one `listStatus`, no data pass). The
    * change detector behind [[Tokenizer.ensureFor]]'s rebuild guard and
    * [[RepeatStream]]'s corpus-version pin.
    */
  private[graft] def docsFingerprint(spark: SparkSession, docsOrSfDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$docsOrSfDir/documents.parquet")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = f
      .listStatus(p)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      .sortBy(_.getPath.getName)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(entries.mkString(";").getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
  }

  /** Load one testdata table (TESTDATA.md: `<dir>/<name>.parquet`). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` column has shipped as both TIMESTAMP(NANOS)
    * (which Spark 4 refuses to read natively — PARQUET_TYPE_ILLEGAL — so we
    * read it as a raw long via `nanosAsLong` and convert with exact integer
    * division) and plain `timestamp[us]` (which Spark reads directly).
    * Detect which one is on disk from the *inferred schema*, not an assumed
    * physical type: with `nanosAsLong=true` a NANOS column surfaces as
    * LongType and a MICROS column still surfaces as a timestamp. Normalise
    * both paths to TIMESTAMP_NTZ so every downstream query (and the DuckDB
    * oracle, which reads naive timestamps) sees one stable type regardless
    * of which testdata generation produced the file.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // int64 nanos: `ts div 1000` stays exact where a double division
        // would lose precision above 2^53 ns.
        raw.withColumn("ts", expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw
      case _ =>
        // isAdjustedToUTC=true micros arrive as TimestampType; a bare NTZ
        // cast would render SESSION-LOCAL wall-clock times (machine-tz-
        // dependent, silently diverging from DuckDB's naive-UTC read on
        // any non-UTC JVM). Convert per-expression instead of mutating the
        // session timezone (a hidden global that would retroactively change
        // timestamp semantics of unrelated queries on the same session):
        // cast renders session-local wall clock, convert_timezone rebases
        // that wall clock from the session zone to UTC — deterministic
        // under any caller, no session state touched.
        raw.withColumn(
          "ts",
          expr("convert_timezone(current_timezone(), 'UTC', CAST(ts AS TIMESTAMP_NTZ))")
        )
    }
  }

  /** Scale-adaptive widen for a frame about to be eagerly materialized
    * and fanned out to many consumers (optimization guide §2.5 "input
    * skew: one huge unsplittable file — repartition immediately after
    * the read"). The gate corpora are ONE single-row-group parquet file
    * per table, so a scan plans one task and every downstream stage that
    * meets it through broadcast joins inherits that single partition —
    * profiled at sf0.1, knn_recall ran its entire 3 s of scoring on one
    * core. Only repartitions when the planned partition count is below
    * the session's parallelism: at production scale the scan is already
    * wide and this is the identity (never a local[32] constant). Use
    * SELECTIVELY, on checkpointed bases with CPU-heavy fan-out — a
    * blanket version measured net-negative (the exchange + 32-task
    * stage overhead outweighs parallelism on cheap single-pass queries).
    */
  def widen(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val p = sc.defaultParallelism
    val cur =
      try df.rdd.getNumPartitions
      catch { case _: Exception => p }
    if (cur < p) df.repartition(p) else df
  }

  /** Order-insensitive exact money sum: round to cents in DECIMAL (exact
    * arithmetic in both Spark and DuckDB, immune to partition-order FP
    * drift), surface as DOUBLE (identical final rounding in both engines).
    * Oracle twin: `CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** dsum over a window spec. */
  def dsumOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DecimalType(18, 2))).over(w).cast(DoubleType)

  /** Engine-independent 6-dp average of a micro-unit integer sum: half-up
    * on EXACT integers ((2|m|+n) div 2n, sign restored), then one
    * correctly-rounded /1e6. `round(decimal_sum/n, 6)` is NOT safe here —
    * a 6-dp decimal over a small count lands on exact x.xxxxxx5
    * boundaries where Spark and DuckDB round different ways (the sf0.1
    * corpus_lm_quality lesson). `mName`/`nName` are column names (the
    * integer micro sum and the count). SQL twin: the same CASE with `//`.
    */
  def halfUpMicroAvg(mName: String, nName: String): Column =
    expr(s"""CAST(CASE WHEN $mName >= 0 THEN (2 * $mName + $nName) div (2 * $nName)
                       ELSE -((2 * (-$mName) + $nName) div (2 * $nName)) END AS DOUBLE)
             / 1000000.0""")

  /** Money column as exact cents. Inputs are cast to DECIMAL *before* any
    * arithmetic: rounding a double PRODUCT to cents differs between engines
    * (binary-expansion vs scaled rounding) by one ulp-cent often enough to
    * shift a 60k-row sum by ~0.2 — rounding the raw 2-decimal inputs never
    * does. Oracle twin: `CAST(x AS DECIMAL(12,2))`.
    */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Discount/tax rate as exact 4-decimal fraction (`DECIMAL(6,4)` twin). */
  def rate(c: Column): Column = c.cast(DecimalType(6, 4))

  /** Closed-form OLS fit over a (x DOUBLE, y DOUBLE) frame with the shared
    * cross-engine discipline (`text_zipf_slope` and `q_activity_power_law`
    * both route here): each input rounds to 6 dp in ISOLATION (callers do
    * this for libm values like ln), then lifts to DECIMAL(18,6) so the
    * four moment sums accumulate exactly — partition-order independent —
    * and slope/intercept are one identical IEEE chain over exactly-cast
    * doubles, rounded at 6 dp. Output: (n_points, slope, intercept).
    */
  def olsFitOver(points: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val moments = points
      .select(
        col("x").cast(DecimalType(18, 6)).as("x"),
        col("y").cast(DecimalType(18, 6)).as("y")
      )
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("x")).cast(DecimalType(38, 6)).as("sx"),
        sum(col("y")).cast(DecimalType(38, 6)).as("sy"),
        sum(col("x") * col("y")).cast(DecimalType(38, 12)).as("sxy"),
        sum(col("x") * col("x")).cast(DecimalType(38, 12)).as("sxx")
      )
    val n = col("n_points").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double")
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    moments.select(
      col("n_points"),
      round(slope, 6).as("slope"),
      round((sy - slope * sx) / n, 6).as("intercept")
    )
  }
}
