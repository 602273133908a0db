package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The events table has shipped in two physical timestamp layouts across
  * testdata generations (TIMESTAMP(NANOS) — read as raw longs under
  * legacy mode — and TIMESTAMP(MICROS)/NTZ). `Tables.events` and
  * `EventStream.readEvents` sniff the file schema and normalize either
  * layout to the same TimestampType micros column; this spec forges both
  * layouts from the same logical rows and pins that the loaders agree —
  * the regression here was every event query failing analysis
  * (TIMESTAMP_NTZ div BIGINT) the day the generator switched layouts. */
class EventsLayoutSpec extends SparkSpecBase {

  private def forge(variant: String): String = {
    val base = Tables.events(spark, sf()).limit(200)
    val d = Files.createTempDirectory(s"graft-evlayout-$variant").toString
    val ts = variant match {
      // A raw int64 column is exactly what a TIMESTAMP(NANOS) file
      // presents under spark.sql.legacy.parquet.nanosAsLong=true.
      case "nanos" => (unix_micros(col("ts")) * 1000L).as("ts")
      case "ntz" => col("ts").cast("timestamp_ntz").as("ts")
    }
    base.select(col("event_id"), ts, col("user_id"),
      col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("batch loader normalizes nanos-long and micros-NTZ layouts identically") {
    val nanosDir = forge("nanos")
    val ntzDir = forge("ntz")
    def rows(d: String) = Tables.events(spark, d)
      .orderBy("event_id").collect().map(_.toString).toSeq
    val a = rows(nanosDir)
    val b = rows(ntzDir)
    assert(a.nonEmpty)
    assert(a == b, "layouts must load to identical TimestampType rows")
    // And the normalized column is usable by the micros-based consumers.
    val t = Tables.events(spark, ntzDir).select(unix_micros(col("ts"))).first().getLong(0)
    assert(t > 0L)
  }

  test("streaming reader starts against an empty directory (schema fallback)") {
    val d = Files.createTempDirectory("graft-evlayout-empty").toString
    val stream = streaming.EventStream.readEvents(spark, d)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("streaming reader starts before the events directory is created (path fallback)") {
    val d = Files.createTempDirectory("graft-evlayout-pre").toString + "/not-yet-created"
    val stream = streaming.EventStream.readEvents(spark, d)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("NTZ layout refuses a non-UTC session instead of skewing instants") {
    val d = forge("ntz")
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Sao_Paulo")
      val e = intercept[IllegalArgumentException] { Tables.events(spark, d) }
      assert(e.getMessage.contains("timeZone"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("streaming reader matches the batch loader on both layouts") {
    Seq("nanos", "ntz").foreach { v =>
      val d = forge(v)
      val stream = streaming.EventStream.readEvents(spark, s"$d/events.parquet")
      assert(stream.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType, s"variant $v")
      val got = streaming.EventStream.runToMemory(
        spark, stream.select("event_id", "ts"), s"evlayout_$v",
        org.apache.spark.sql.streaming.OutputMode.Append)
        .orderBy("event_id").collect().map(_.toString).toSeq
      val want = Tables.events(spark, d).select("event_id", "ts")
        .orderBy("event_id").collect().map(_.toString).toSeq
      assert(got == want, s"variant $v: stream rows must equal batch rows")
    }
  }
}
