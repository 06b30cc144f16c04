package graft.queries

import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.MessageTypeParser
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The events `ts` column has shipped in two physical encodings across
  * driver testdata generations: TIMESTAMP(NANOS) int64 (which Spark 4 only
  * reads through the `nanosAsLong` legacy flag) and plain `timestamp[us]`.
  * Current testdata exercises only the micros branch of `Q.events`, so
  * without this spec the nanos branch would be dead code until the NEXT
  * schema flip — exactly how the round-5 breakage shipped. Synthesize both
  * encodings with parquet-java and assert the adapter converges them to
  * identical TIMESTAMP_NTZ values.
  */
class EventsEncodingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // 2023-11-14T22:13:20.123456789 UTC in nanos; micros truncate the 789.
  private val nanos = Seq(1700000000123456789L, 1700000086400000000L, 1L)
  private val micros = nanos.map(_ / 1000L)

  private def writeEvents(dir: String, tsAnnotation: String, values: Seq[Long]): Unit = {
    val schema = MessageTypeParser.parseMessageType(
      s"""message events {
         |  required int64 ts ($tsAnnotation);
         |  required int64 user_id;
         |}""".stripMargin
    )
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(graft.log.LogFs.forPath(dir).outputFile(s"$dir/events.parquet"))
      .withConf(conf)
      .build()
    try values.zipWithIndex.foreach { case (v, i) =>
      val g = new SimpleGroup(schema)
      g.add("ts", v)
      g.add("user_id", i.toLong)
      writer.write(g)
    } finally writer.close()
  }

  test("nanos and micros events encodings converge to the same TIMESTAMP_NTZ values") {
    val nanosDir = TestSpark.tempDir("events-nanos")
    val microsDir = TestSpark.tempDir("events-micros")
    writeEvents(nanosDir, "TIMESTAMP(NANOS,false)", nanos)
    writeEvents(microsDir, "TIMESTAMP(MICROS,false)", micros)

    val fromNanos = Q.events(spark, nanosDir)
    val fromMicros = Q.events(spark, microsDir)
    // Both branches must surface one stable type...
    assert(fromNanos.schema("ts").dataType.typeName == "timestamp_ntz",
      s"nanos branch surfaced ${fromNanos.schema("ts").dataType}")
    assert(fromMicros.schema("ts").dataType.typeName == "timestamp_ntz",
      s"micros branch surfaced ${fromMicros.schema("ts").dataType}")
    // ...and bit-identical values (nanos truncate toward micros exactly).
    val a = fromNanos.orderBy("user_id").selectExpr("CAST(ts AS STRING)")
      .collect().map(_.getString(0)).toSeq
    val b = fromMicros.orderBy("user_id").selectExpr("CAST(ts AS STRING)")
      .collect().map(_.getString(0)).toSeq
    assert(a == b, s"encodings diverged:\n nanos: $a\n micros: $b")
    assert(a.head == "2023-11-14 22:13:20.123456", s"absolute value drifted: ${a.head}")
  }
}
