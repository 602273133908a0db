package graft

import graft.streaming.EventStream
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Streaming twins must agree with their oracle-checked batch queries:
  * hourlyWindows ≡ q17, sessionize ≡ q18 (same events, same results). */
class StreamingSpec extends SparkSpecBase {

  /** readStream needs a directory of a single schema; link events.parquet
    * into a temp dir. */
  private lazy val eventsDir: String = {
    val d = Files.createTempDirectory("graft-events")
    Files.createSymbolicLink(
      d.resolve("events.parquet"), Paths.get(s"${sf()}/events.parquet"))
    d.toString
  }

  test("streaming hourly windows match batch q17 aggregates") {
    // Complete mode so end-of-stream windows (still inside the watermark)
    // are emitted too; Append would hold the final 2 hours back.
    val stream = EventStream.hourlyWindows(EventStream.readEvents(spark, eventsDir))
    val got = EventStream.runToMemory(
      spark, stream, "hourly_test",
      org.apache.spark.sql.streaming.OutputMode.Complete)
      .select("hour_start", "event_type", "n_events", "total_value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = SparkEntry.queries("q17_hourly_window")(spark, sf())
      .select("hour_start", "event_type", "n_events", "total_value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == want)
  }

  test("streaming sliding windows match batch q24 aggregates") {
    val stream = EventStream.slidingWindows(EventStream.readEvents(spark, eventsDir))
    val got = EventStream.runToMemory(
      spark, stream, "sliding_test",
      org.apache.spark.sql.streaming.OutputMode.Complete)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = SparkEntry.queries("q24_sliding_window")(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("streaming watermark dedup keeps one row per key (single-batch ≡ global dedup)") {
    val stream = EventStream.dedupStream(EventStream.readEvents(spark, eventsDir))
    val got = EventStream.runToMemory(spark, stream, "dedup_test")
      .select("user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = Tables.events(spark, sf())
      .select("user_id", "event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == got.toSet.size, "streaming dedup emitted duplicate keys")
    assert(got.toSet == want.toSet)
  }

  test("stream-stream interval join matches the batch join") {
    val stream = EventStream.purchaseAttribution(EventStream.readEvents(spark, eventsDir))
    val got = EventStream.runToMemory(spark, stream, "attrib_test")
      .select("purchase_id", "signup_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Batch twin: the oracle-checked q33 operator.
    val want = SparkEntry.queries("q33_purchase_attribution")(spark, sf())
      .select("purchase_id", "signup_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming latest-wins snapshot matches batch q30 across micro-batches") {
    import spark.implicits._
    // Split the log into 4 files and feed ONE file per trigger, so the
    // per-user state genuinely merges across micro-batches (a single
    // batch would never exercise the stored-state path).
    val d = Files.createTempDirectory("graft-ev-split")
    val proj = Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros"), col("event_type"), col("value"))
    proj.repartition(4).write.mode("overwrite").parquet(s"$d/events")
    val stream = spark.readStream
      .schema(proj.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$d/events")
      .as[EventStream.UpEv]
    val updates = EventStream.runToMemory(
      spark, EventStream.latestSnapshot(stream).toDF(), "snap_test",
      org.apache.spark.sql.streaming.OutputMode.Update)
    // Update mode emits one refreshed row per touched key per batch; the
    // converged snapshot is the max-count update per user.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    val got = updates
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "last_ts_us", "last_type", "last_value", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
      .toSet
    val want = SparkEntry.queries("q30_latest_snapshot")(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("stateful sessionizer matches batch q18 session structure") {
    import spark.implicits._
    val evs = Tables.events(spark, sf())
      .select(
        col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros"), col("value"))
      .as[EventStream.Ev]
    // Run the same state machine in batch form (single group pass) — the
    // flatMapGroupsWithState body is engine-agnostic logic.
    val streamed = EventStream.sessionize(evs)
      .collect().map(s => (s.user_id, s.session_seq, s.n_events)).toSet
    val batch = SparkEntry.queries("q18_sessionize")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt + 1, r.getLong(2).toInt)).toSet // batch ids are 0-based
    // Streaming Append mode only emits CLOSED sessions; every emitted
    // session must exist in the batch result with identical counts.
    assert(streamed.subsetOf(batch), s"extra sessions: ${streamed -- batch}")
    assert(streamed.size >= batch.size / 2) // most sessions close
  }
}
