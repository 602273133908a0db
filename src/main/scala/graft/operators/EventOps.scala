package graft.operators

import graft.{Exact, Op, OpModule, Tables}
import org.apache.spark.sql.functions._

/** Event-stream analytics in batch form (the streaming twin lives in
  * graft.streaming and is exercised by ScalaTest; this batch version is
  * the oracle-checked semantics). Tumbling-window aggregation = the
  * canonical watermarked groupBy(window(ts)) shape.
  */
object EventOps extends OpModule {

  /** Tumbling 1-hour windows × event_type: count + exact value sum.
    * Window key emitted as a formatted string so both engines agree on
    * type (timestamp precision differs: parquet nanos vs Spark micros). */
  val q17Hourly: Op = Op(
    "q17_hourly_window",
    Some("""
      SELECT STRFTIME(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
             event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY hour_start, event_type
      ORDER BY hour_start, event_type
    """))((spark, dir) => {
    Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Exact.dsum(col("value")).as("total_value"))
      .orderBy("hour_start", "event_type")
  })

  override def ops: Seq[Op] = Seq(q17Hourly)
}
