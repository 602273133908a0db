package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming surface of the engine.
  *
  * The reference is batch-only (SURVEY.md §2.9: its "incremental" axis is
  * a daily partition loop); this module re-expresses that ingest as
  * streams: watermarked tumbling-window aggregation (the streaming twin of
  * the oracle-checked `q17_hourly_window` batch query) and a stateful
  * per-user sessionizer via `flatMapGroupsWithState` (twin of
  * `q18_sessionize`).
  *
  * Scale: state is keyed by (window × type) / user — both partition
  * cleanly across executors; watermarks bound state size; file sources at
  * 100 TB would be a partitioned directory with `Trigger.AvailableNow`
  * for catch-up processing.
  */
object EventStream {

  /** events schema assumed when the directory has no files yet to sniff
    * (a watcher started before the first drop): the CURRENT generator
    * layout, micros/NTZ. */
  private val defaultSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based streaming read of an events directory.
    *
    * Streaming sources need the schema up front, and events.ts has
    * shipped in two physical layouts (TIMESTAMP(NANOS) read as raw
    * longs under legacy mode, and TIMESTAMP(MICROS)/NTZ) — so take the
    * schema from a one-footer batch read of the same directory (falling
    * back to the current generator layout when the directory is still
    * empty) and normalize ts through the same single match batch uses
    * ([[graft.Tables.normalizeEventTs]]). A directory mixing files from
    * BOTH generations is not supported — one sniffed schema applies to
    * every file, as with any fixed-schema streaming source. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Fall back to the current generator layout both when the directory
    // exists but is empty (UNABLE_TO_INFER_SCHEMA) and when it does not
    // exist yet (PATH_NOT_FOUND) — a watcher may legitimately start
    // before the first drop. The streaming source itself also refuses a
    // missing path at construction, so materialize the landing directory
    // (what any watcher agent does on first watch; works for object
    // stores via the path's own FileSystem). Contract note: this means a
    // MISTYPED path is created and watched forever-empty rather than
    // failing — the cost of supporting watch-before-first-drop; callers
    // that want strictness should pre-create their landing dirs and
    // treat an unexpectedly-created one as the misconfiguration signal.
    val fileSchema =
      try spark.read.parquet(dir).schema
      catch { case e: org.apache.spark.sql.AnalysisException
        if e.getCondition != null &&
          (e.getCondition.startsWith("UNABLE_TO_INFER_SCHEMA") ||
           e.getCondition.startsWith("PATH_NOT_FOUND")) =>
        if (e.getCondition.startsWith("PATH_NOT_FOUND")) {
          val p = new org.apache.hadoop.fs.Path(dir)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
        }
        defaultSchema }
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(fileSchema).parquet(dir))
  }

  /** Tumbling 1-hour windows × event_type with a 2-hour watermark.
    * Output schema matches the batch q17 (hour_start string key). */
  def hourlyWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))

  final case class Ev(user_id: Long, event_id: Long, tsMicros: Long, value: Double)
  final case class SessionState(
      sessionSeq: Int, startMicros: Long, lastMicros: Long, n: Int, sumValue: Double)
  final case class SessionOut(
      user_id: Long, session_seq: Int, n_events: Int, session_value: Double,
      start_micros: Long, end_micros: Long)

  private val GapMicros = 30L * 60 * 1000000

  /** Stateful sessionizer: emits a session when a user is idle past the
    * 30-minute gap (same semantics as batch q18; event-time timeout keeps
    * state bounded by the watermark). */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          // Within a micro-batch events may arrive unordered; sort locally.
          val sorted = evs.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0, -1, -1, 0, 0.0))
          val out = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            if (st.n == 0) {
              st = SessionState(st.sessionSeq + 1, e.tsMicros, e.tsMicros, 1, e.value)
            } else if (e.tsMicros - st.lastMicros > GapMicros) {
              out += SessionOut(user, st.sessionSeq, st.n, st.sumValue, st.startMicros, st.lastMicros)
              st = SessionState(st.sessionSeq + 1, e.tsMicros, e.tsMicros, 1, e.value)
            } else {
              st = st.copy(lastMicros = e.tsMicros, n = st.n + 1, sumValue = st.sumValue + e.value)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  final case class UpEv(
      user_id: Long, event_id: Long, tsMicros: Long, event_type: String, value: Double)
  final case class SnapState(
      tsMicros: Long, eventId: Long, eventType: String, value: Double, n: Long)
  final case class SnapOut(
      user_id: Long, last_ts_us: Long, last_type: String, last_value: Double, n_events: Long)

  /** Latest-wins snapshot state machine — the streaming twin of batch
    * q30 (CDC compaction): per user, keep the (ts, event_id)-max change
    * and a lifetime count, emitting the refreshed snapshot row each
    * micro-batch (Update mode). The fold is ORDER-INSENSITIVE — newest =
    * max of a total order, count = additive — so arrival order across
    * and within micro-batches cannot change the converged state, which
    * is what makes the batch and streaming forms provably equal. State
    * is one small struct per user (no timeout: a snapshot table's keys
    * are live forever; a TTL'd variant would set event-time timeout). */
  def latestSnapshot(events: Dataset[UpEv]): Dataset[SnapOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SnapState, SnapOut](GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[UpEv], state: GroupState[SnapState]) =>
          var st = state.getOption.getOrElse(
            SnapState(Long.MinValue, Long.MinValue, null, 0.0, 0L))
          evs.foreach { e =>
            st =
              if (e.tsMicros > st.tsMicros ||
                (e.tsMicros == st.tsMicros && e.event_id > st.eventId))
                SnapState(e.tsMicros, e.event_id, e.event_type, e.value, st.n + 1)
              else st.copy(n = st.n + 1)
          }
          state.update(st)
          SnapOut(user, st.tsMicros, st.eventType, st.value, st.n)
      }
  }

  /** Sliding 1-hour windows every 15 minutes — the streaming twin of
    * batch q24 (which materializes the 4 covering windows per event via
    * explode); streaming uses the native sliding `window()` so state is
    * per-(window) and watermark-evicted. */
  def slidingWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "60 minutes", "15 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup: keeps the first (user_id, event_type)
    * occurrence, with state bounded by the watermark —
    * dropDuplicatesWithinWatermark is the streaming form of d1-style
    * exact dedup (state for a key is dropped once the watermark passes
    * it, so an infinite stream runs in finite memory at the cost of
    * possibly re-admitting a duplicate older than the watermark). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stream-stream self-join: each purchase matched to the same user's
    * signups within the preceding 7 days. Both sides carry watermarks
    * and the join condition bounds event-time distance — exactly what
    * Spark needs to evict join state and run with finite memory; an
    * unbounded stream-stream join would otherwise buffer both streams
    * forever. State is keyed by user, so it partitions cleanly. */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("signup_id"),
        col("ts").as("signup_ts"))
      .withWatermark("signup_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(signups, expr(
      """p_user = s_user AND
         purchase_ts >= signup_ts AND
         purchase_ts <= signup_ts + INTERVAL 7 DAYS"""))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("signup_id"),
        col("purchase_ts"), col("signup_ts"), col("value"))
  }

  /** Run a streaming query over a static directory to completion using
    * the memory sink; returns the collected result table. Used by tests
    * and as the local "catch-up" entry point (Trigger.AvailableNow
    * semantics via processAllAvailable). */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
