package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** `Q.normalizeEventTs` dispatch, exercised against REAL parquet files in
  * every encoding a producer has shipped so far: a genuine parquet
  * `TIMESTAMP(NANOS)` column (rounds 1–4's physical shape, written via
  * parquet-mr because Spark itself cannot produce the annotation — read
  * back as INT64 under the `nanosAsLong` legacy conf, the exact scan
  * path the loader relies on), TIMESTAMP_NTZ (`timestamp[us]`,
  * isAdjustedToUTC=false — the current testdata), and session-zoned
  * TIMESTAMP. All three must produce the identical normalized
  * microsecond value, batch AND streaming — this is the spec that keeps
  * the round-5 breakage from returning in either direction when the
  * driver regenerates testdata again.
  */
class EventTsEncodingSpec extends AnyFunSuite with SparkTestBase {

  // 2024-03-01T12:34:56.789012Z (micros) — exercises sub-second precision
  private val micros = 1709296496789012L

  private def writeVariant(dir: java.nio.file.Path, enc: String): String = {
    val s = spark
    val out = dir.resolve(enc).toString
    val base = Seq(
      (1L, micros, 10L, "view", 1.5, """{"k":1}"""),
      (2L, micros + 60L * 1000000L, 10L, "purchase", 2.5, """{"k":2}"""))
    if (enc == "nanos_int64") { writeNanosParquet(out, base); return out }
    val schemaFor = (tsType: DataType) => StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val rows = base.map { case (id, us, uid, et, v, p) =>
      enc match {
        case "timestamp_ntz" =>
          Row(id, java.time.LocalDateTime.ofEpochSecond(
            us / 1000000L, (us % 1000000L).toInt * 1000,
            java.time.ZoneOffset.UTC), uid, et, v, p)
        case "timestamp" =>
          Row(id, java.sql.Timestamp.from(
            java.time.Instant.ofEpochSecond(us / 1000000L,
              (us % 1000000L) * 1000L)), uid, et, v, p)
      }
    }
    val tsType = enc match {
      case "timestamp_ntz" => TimestampNTZType
      case "timestamp"     => TimestampType
    }
    s.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schemaFor(tsType))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    out
  }

  /** The rounds-1-4 physical encoding, for real: a parquet file whose `ts`
    * column is annotated `TIMESTAMP(NANOS, adjustedToUTC=true)`. Spark's
    * writer cannot emit this annotation, so the fixture goes through
    * parquet-mr's Group API directly — only then does `Q.events`'s
    * `nanosAsLong` conf actually take the nanos-at-scan branch instead of
    * reading a column that was plain INT64 all along.
    */
  private def writeNanosParquet(
      out: String,
      base: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.MessageTypeParser
    val msg = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,true));
        |  required int64 user_id;
        |  required binary event_type (STRING);
        |  required double value;
        |  required binary props (STRING);
        |}""".stripMargin)
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(msg, conf)
    val writer = ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$out/events.parquet"), conf))
      .withConf(conf).build()
    try {
      val gf = new SimpleGroupFactory(msg)
      base.foreach { case (id, us, uid, et, v, p) =>
        val g = gf.newGroup()
        g.add("event_id", id)
        g.add("ts", us * 1000L)
        g.add("user_id", uid)
        g.add("event_type", et)
        g.add("value", v)
        g.add("props", p)
        writer.write(g)
      }
    } finally writer.close()
  }

  test("batch: all three ts encodings normalize to the same micros") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ts_enc")
    try {
      val got = Seq("nanos_int64", "timestamp_ntz", "timestamp").map { enc =>
        val dir = writeVariant(tmp, enc)
        val df = Q.events(spark, dir)
        assert(df.schema("ts").dataType == TimestampType,
          s"$enc: expected normalized TIMESTAMP")
        enc -> df.select(col("event_id"), unix_micros(col("ts")))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      }.toMap
      val want = Seq((1L, micros), (2L, micros + 60L * 1000000L))
      got.foreach { case (enc, vals) =>
        assert(vals == want, s"$enc read back $vals, expected $want")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }

  test("streaming: eventsStream normalizes ts and drains identically") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ts_enc_s")
    try {
      Seq("nanos_int64", "timestamp_ntz").foreach { enc =>
        val dir = writeVariant(tmp, enc)
        val stream = Q.eventsStream(spark, dir)
        assert(stream.isStreaming)
        assert(stream.schema("ts").dataType == TimestampType)
        val name = "ts_enc_" + enc
        val q = stream
          .select(col("event_id"), unix_micros(col("ts")).as("us"))
          .writeStream.format("memory").queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val got = spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
        assert(got == Seq((1L, micros), (2L, micros + 60L * 1000000L)),
          s"$enc streamed back $got")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }
}
